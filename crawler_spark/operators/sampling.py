"""Corpus sampling for training-data mixtures.

Deterministic selection operators a pre-training pipeline runs after
filtering/dedup:

* `token_budget_select` — per-stratum (usually per-language) quality-ranked
  selection up to a token budget: the data-mixing step that turns "all
  surviving documents" into "the corpus with the target language/domain
  token proportions".
* `hash_split` — deterministic train/validation assignment by content-stable
  hash, so the split is reproducible across runs and engines and never
  depends on row order or partitioning.
* `temperature_sampling` — XLM-R/mT5-style (n_l/N)^alpha language mixing
  with content-stable accept coins.
* `weighted_sample` / `pack_sequences` — see their docstrings.

All are pure column algebra with exact ANSI-SQL twins (queries.py
tx8/tx9/px4/px5/px3).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def token_budget_select(df: DataFrame, strata_col: str, tokens_col: str,
                        frac: float, order_cols: list[Column]) -> DataFrame:
    """Keep the best rows of each stratum until the stratum's running token
    total reaches `frac` of its full token mass.

    Rows are ranked by `order_cols` (make the last key unique — ties in a
    running-sum cutoff are engine-order-dependent otherwise). Adds
    `cum_tokens` (running total including the current row, in rank order).

    Scale shape: the running sum and the stratum total are two window
    functions over the SAME partition key, so Catalyst plans ONE exchange;
    within-stratum sort is the cost driver. At 100 TB with few large strata,
    replace the full sort with a two-pass threshold: percentile_approx over
    the order key to find the quality cutoff whose expected token mass hits
    the budget, then filter map-side — same selection up to boundary ties,
    no global sort. This exact-window formulation is the oracle-checkable
    reference semantics.
    """
    w_cum = (Window.partitionBy(strata_col).orderBy(*order_cols)
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    w_tot = Window.partitionBy(strata_col)
    out = (df.withColumn("cum_tokens", F.sum(tokens_col).over(w_cum))
           .withColumn("_tot", F.sum(tokens_col).over(w_tot)))
    return (out.where(F.col("cum_tokens")
                      <= F.floor(F.lit(frac) * F.col("_tot")).cast("long"))
            .drop("_tot"))


def hash_split(key: Column, val_permille: int) -> Column:
    """'val' for keys whose md5-derived permille < `val_permille`, else
    'train'. Content-stable: the same key lands in the same split in every
    run, engine, and partitioning (md5 first 8 hex chars -> int, mod 1000 —
    bit-identical in Spark and DuckDB). Map-side, zero shuffle."""
    bucket = F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("long") % 1000
    return F.when(bucket < val_permille, F.lit("val")).otherwise(F.lit("train"))


def token_budget_threshold(df: DataFrame, strata_col: str, tokens_col: str,
                           frac: float, quality_col: str) -> DataFrame:
    """The 100 TB formulation of `token_budget_select`: no per-stratum sort
    of documents. Aggregate token mass per (stratum, quality bucket) — a
    tiny table when quality is a bounded-precision score — run the budget
    cutoff over THAT, and broadcast the resulting per-stratum quality
    threshold back as a map-side filter.

    Selection differs from the exact window version only at the boundary
    bucket: whole buckets are kept while their cumulative mass fits the
    budget, so kept(threshold) ⊆ kept(exact) and the token shortfall is
    bounded by one bucket's mass (property-tested). Strata whose single
    best bucket already exceeds the budget select nothing — at that point
    the budget is below the quantization floor and the caller should bucket
    finer. Shuffles: ONE partial-agg at (stratum × quality) cardinality;
    the document-level pass is a broadcast join + filter, no sort, no
    window over documents.
    """
    hist = (df.groupBy(strata_col, quality_col)
            .agg(F.sum(tokens_col).alias("_bt")))
    w_cum = (Window.partitionBy(strata_col).orderBy(F.desc(quality_col))
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    w_tot = Window.partitionBy(strata_col)
    cut = (hist.withColumn("_cum", F.sum("_bt").over(w_cum))
           .withColumn("_tot", F.sum("_bt").over(w_tot))
           .where(F.col("_cum")
                  <= F.floor(F.lit(frac) * F.col("_tot")).cast("long"))
           .groupBy(strata_col).agg(F.min(quality_col).alias("_qmin")))
    return (df.join(F.broadcast(cut), strata_col)
            .where(F.col(quality_col) >= F.col("_qmin"))
            .drop("_qmin"))


def _directed_leq(bvals: tuple, kcols: list[Column], descs: list[bool],
                  ftypes: list) -> Column:
    """bound ≼ key under the per-column directed lexicographic order
    (asc: Spark `<`; desc: Spark `>`), built innermost-out:
    leq = lt1 | (eq1 & (lt2 | (eq2 & ... (ltm | eqm)))). Bound values are
    non-null literals cast to the exact key types. A NULL key field takes
    Spark's default placement (asc nulls-first → bound after it → False;
    desc nulls-last → bound before it → True)."""
    expr: Column = F.lit(True)
    for b, k, d, t in reversed(list(zip(bvals, kcols, descs, ftypes))):
        bl = F.lit(b).cast(t)
        if d:
            lt = F.when(k.isNull(), F.lit(True)).otherwise(bl > k)
        else:
            lt = F.when(k.isNull(), F.lit(False)).otherwise(bl < k)
        expr = lt | (bl.eqNullSafe(k) & expr)
    return expr


def _det_block_expr(df: DataFrame, order_cols: list[Column],
                    n_blocks: int, descs: list[bool] | None = None,
                    sample_per_block: int = 200) -> Column:
    """PURE deterministic monotone blocking for the two-phase prefix-sum /
    global-rank operators: returns a Column assigning each row a block id
    that is non-decreasing in the directed total order of `order_cols`
    (per-column ascending unless descs[i]).

    Why not `repartitionByRange + spark_partition_id`: the range
    partitioner derives its boundaries from a runtime SAMPLE of the input,
    and a plan with two consumers of that blocking (local cumsum + block
    offsets) instantiates the subtree twice — under AQE / differing session
    shapes the two instantiations can observe DIFFERENT blockings, silently
    corrupting the prefix (the exact environment-sensitive hash divergence
    the round-3 driver gate caught on px3/mm4). A lazily-checkpointed
    barrier narrows but does not close the race.

    Here the boundaries are FROZEN on the driver once (a <= n_blocks-1
    value collect from a content-stable sample job) and re-embedded as
    literals, so the block id is a pure map-side expression — identical in
    every branch, recomputation, retry, and AQE re-plan, with zero
    checkpoint/caching requirement.

    Correctness does not depend on boundary quality: for ANY frozen
    boundary multiset, blk(row) = |{b : b ≼ key(row)}| is monotone
    non-decreasing in the directed key order, which is all the offset
    algebra needs; boundary placement only affects balance. Cost: one
    map-side count job + one ~n_blocks*sample_per_block-row sample collect
    over the pruned key columns — O(cores) driver memory, no extra shuffle
    of the corpus, scale-safe at 10^10 rows."""
    if descs is None:
        descs = [False] * len(order_cols)
    if n_blocks <= 1:
        return F.lit(0)
    keyed = df.select(*[c.alias(f"_k{i}")
                        for i, c in enumerate(order_cols)])
    n = keyed.count()
    if n == 0:
        return F.lit(0)
    frac = min(1.0, (n_blocks * sample_per_block) / n)
    rows = keyed.sample(withReplacement=False, fraction=frac, seed=42) \
                .collect()
    # Boundaries containing NULL are dropped (null-keyed rows collapse
    # into the edge block — balance-only effect). Python's per-field sort
    # can disagree with Spark collation on exotic strings; harmless — see
    # the monotonicity note above (sort order affects balance only).
    import functools
    vals = {tuple(r) for r in rows if all(x is not None for x in r)}

    def _cmp(a, b):
        for x, y, d in zip(a, b, descs):
            if x == y:
                continue
            lt = x < y
            return (-1 if lt else 1) * (-1 if d else 1)
        return 0

    svals = sorted(vals, key=functools.cmp_to_key(_cmp))
    if len(svals) < 2:
        return F.lit(0)
    step = len(svals) / n_blocks
    bounds: list[tuple] = []
    for b in range(1, n_blocks):
        v = svals[min(int(b * step), len(svals) - 1)]
        if not bounds or v != bounds[-1]:
            bounds.append(v)
    if not bounds:
        return F.lit(0)
    ftypes = [f.dataType for f in keyed.schema.fields]
    blk = functools.reduce(
        lambda acc, v: acc + _directed_leq(v, order_cols, descs,
                                           ftypes).cast("int"),
        bounds, F.lit(0))
    return blk.cast("int")


def pack_sequences(df: DataFrame, tokens_col: str, order_col: str = "doc_id",
                   budget: int = 1024, n_blocks: int = 32) -> DataFrame:
    """GPT-style concat-then-chunk sequence packing: documents are laid out
    in deterministic corpus order (`order_col`), token counts are prefix-
    summed, and each document is assigned to the training sequence its
    START offset falls in (seq_id = prev_tokens // budget, seq_offset =
    prev_tokens % budget) — documents may straddle a boundary, exactly as
    a packed pre-training corpus does.

    Adds (seq_id, seq_offset) alongside the input columns plus the
    exclusive prefix `prev_tokens`.

    Scale shape — distributed prefix sum, NOT a global window. The naive
    formulation (SUM() OVER (ORDER BY order_col) with no partition key)
    collapses the whole corpus into ONE task; at 10^10 rows that is the
    canonical window-function scale bug. Instead, two phases:

      1. assign each row a block id that is monotone in `order_col` —
         a PURE map-side expression against driver-frozen boundary
         literals (`_det_block_expr`; no repartitionByRange, whose sampled
         boundaries are not stable across plan branches); block-LOCAL
         exclusive cumsum — a window over the block key, fully parallel;
      2. per-block token totals (n_blocks rows) get their own exclusive
         cumsum on a single tiny task and are broadcast back as block
         offsets. prev = block_offset + local_prev.

    Output values are independent of where the boundaries land (any
    monotone blocking yields the same global prefix), and because the
    block id is a pure expression both consumers agree under every
    session shape / AQE re-plan — no checkpoint barrier needed.
    Set n_blocks ~ cluster cores; the only global structure that ever sits
    in one place is the n_blocks-row offset table.
    """
    blocked = df.withColumn(
        "_blk", _det_block_expr(df, [F.col(order_col)], n_blocks))
    w_loc = (Window.partitionBy("_blk").orderBy(order_col)
             .rowsBetween(Window.unboundedPreceding, -1))
    local = blocked.withColumn(
        "_lprev", F.coalesce(F.sum(tokens_col).over(w_loc),
                             F.lit(0)).cast("long"))
    # n_blocks rows: the single-partition window here is the DESIGN — the
    # global sequential dependency is reduced to one tiny offset table.
    w_blk = (Window.orderBy("_blk")
             .rowsBetween(Window.unboundedPreceding, -1))
    offsets = (blocked.groupBy("_blk")
               .agg(F.sum(tokens_col).cast("long").alias("_btot"))
               .withColumn("_boff", F.coalesce(F.sum("_btot").over(w_blk),
                                               F.lit(0)).cast("long"))
               .select("_blk", "_boff"))
    out = (local.join(F.broadcast(offsets), "_blk")
           .withColumn("prev_tokens", (F.col("_boff") + F.col("_lprev"))
                       .cast("long"))
           .drop("_blk", "_lprev", "_boff"))
    return (out
            .withColumn("seq_id",
                        F.floor(F.col("prev_tokens") / budget).cast("long"))
            .withColumn("seq_offset",
                        (F.col("prev_tokens") % budget).cast("long")))


def temperature_sampling(df: DataFrame, strata_col: str, key: Column,
                         alpha: float = 0.3, budget: int = 10_000,
                         salt: str = "ts/") -> DataFrame:
    """Multilingual temperature sampling (the XLM-R / mT5 mixing rule):
    draw ~`budget` rows whose stratum proportions follow
    p_l ∝ (n_l/N)^alpha — upsampling tail strata relative to their natural
    share (alpha=1 natural, alpha->0 uniform). Nothing is random: each
    row's accept test is a content-stable md5 coin on `key` (the hash_split
    discipline), so the drawn corpus is reproducible across runs, engines,
    and partitionings.

    Keeps surviving input rows and adds the per-stratum columns `n_docs`,
    `p_sample` (round 6) and `rate` (round 6; min(1, budget*p/n)).

    Scale shape: ONE partial-agg shuffle at stratum cardinality (tiny),
    two broadcast one-row scalars (N, Z), then the rate table broadcast
    back onto the corpus with a map-side integer compare — the corpus
    itself NEVER shuffles. The accept boundary is integerized
    (h32 < floor(rate_6 * 2^32), both BIGINT) so engines agree
    bit-for-bit; `rate` is rounded to 6 places before integerizing to keep
    the pow/divide ulp noise away from the boundary.
    """
    counts = df.groupBy(strata_col).agg(F.count("*").alias("n_docs"))
    tot = counts.agg(F.sum("n_docs").cast("double").alias("_n"))
    q = (counts.crossJoin(F.broadcast(tot))
         .withColumn("_q", F.pow(F.col("n_docs") / F.col("_n"), alpha)))
    z = q.agg(F.sum("_q").alias("_z"))
    rates = (q.crossJoin(F.broadcast(z))
             .withColumn("p_sample", F.round(F.col("_q") / F.col("_z"), 6))
             .withColumn("rate",
                         F.round(F.least(
                             F.lit(1.0),
                             F.lit(float(budget)) * (F.col("_q") / F.col("_z"))
                             / F.col("n_docs")), 6))
             .select(strata_col, "n_docs", "p_sample", "rate"))
    h = F.conv(F.substring(F.md5(F.concat(F.lit(salt), key.cast("string"))),
                           1, 8), 16, 10).cast("long")
    cut = F.floor(F.col("rate") * F.lit(4294967296.0)).cast("long")
    return (df.join(F.broadcast(rates), strata_col)
            .where(h < cut))


def weighted_sample(df: DataFrame, weight_col: str, k: int,
                    key: Column, salt: str = "ws/") -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement (px4): keep the
    k rows winning the exponential race e_i = -ln(u_i) / w_i (smallest k),
    the Efraimidis-Spirakis A-ES scheme — inclusion probability
    proportional to weight, no replacement, single pass.

    u_i is content-stable, not random: (md5_32(salt || key) + 1) / 2^32,
    so the sample is reproducible across runs/engines/partitionings (same
    discipline as hash_split). (h+1)/2^32 is an EXACT binary division, and
    -ln(u)/w is the same IEEE arithmetic in Spark and DuckDB, so the race
    order is cross-engine stable.

    Adds `es_key` (rounded). Scale: map-side key derivation + global top-k
    — Catalyst plans TakeOrderedAndProject (per-partition heaps, no full
    sort, no shuffle of non-winners); at any corpus size the moving set is
    k rows per partition.
    """
    h = F.conv(F.substring(F.md5(F.concat(F.lit(salt),
                                          key.cast("string"))), 1, 8),
               16, 10).cast("long")
    u = (h + F.lit(1)) / F.lit(4294967296.0)
    w = F.greatest(F.col(weight_col).cast("double"), F.lit(1.0))
    ek = -F.log(u) / w
    return (df.withColumn("es_key", F.round(ek, 4))
            .withColumn("_ek", ek)
            .orderBy("_ek").limit(k)
            .drop("_ek"))


def stratified_sample(df: DataFrame, strata_col: str, key: Column,
                      frac: float) -> DataFrame:
    """Exact-quota stratified sampling: ceil(frac * n_s) rows from every
    stratum s, chosen by a content-stable md5 rank — the zero-variance
    holdout/eval split (tx9's Bernoulli hash_split has binomial quota
    noise; temperature_sampling reweights across strata; this one hits
    each stratum's quota EXACTLY and reproducibly across runs, engines,
    and partitionings).

    Adds `_rk` (the 1-based within-stratum rank) so callers can take
    nested subsamples (rank <= m for any m <= quota is itself the
    m-quota sample — samples are monotone in frac).

    Scale shape: one shuffle on the stratum key; the per-stratum sort is
    at stratum cardinality. Strata here are language/source-grade keys
    (dozens to thousands of groups) — for a HUGE stratum, swap the window
    for the two-phase threshold trick used by token_budget_threshold:
    find the quota-th smallest hash per stratum from per-partition
    partial minima, then keep rows below it map-side."""
    # hex md5 lexicographic order == numeric order (NOTES fact #3): rank
    # by the hex string directly, no 64-bit integerization needed.
    h = F.md5(F.concat(F.lit("strat/"), key.cast("string")))
    w = Window.partitionBy(strata_col).orderBy(h.asc(), key.asc())
    n = Window.partitionBy(strata_col)
    r = (df.withColumn("_rk", F.row_number().over(w).cast("long"))
         .withColumn("_quota",
                     F.ceil(F.lit(frac) * F.count("*").over(n))
                     .cast("long")))
    return r.where(F.col("_rk") <= F.col("_quota")).drop("_quota")


def global_rank(df: DataFrame, order_by: list[Column],
                n_blocks: int = 32, out_col: str = "_rn",
                desc: list[bool] | None = None) -> DataFrame:
    """DISTRIBUTED global row_number over a total order — the prefix-sum
    shape (pack_sequences) applied to ranking: the naive
    `row_number() OVER (ORDER BY ...)` with no partition key collapses
    the corpus into ONE task; instead (1) assign a pure monotone block id
    from driver-frozen boundaries (`_det_block_expr` — not
    repartitionByRange, whose sampled boundaries aren't stable across
    plan branches) and rank block-locally (parallel), (2) exclusive-cumsum
    the n_blocks per-block counts on one tiny task and broadcast them back
    as offsets. The caller's order must be TOTAL (add a unique
    tiebreaker) — then the result is deterministic and independent of
    where the boundaries land. `order_by` takes PLAIN columns; per-column
    descending order is requested via the parallel `desc` flag list (the
    blocking comparator needs explicit directions)."""
    descs = list(desc) if desc is not None else [False] * len(order_by)
    sort_cols = [c.desc() if d else c.asc()
                 for c, d in zip(order_by, descs)]
    blocked = df.withColumn(
        "_blk", _det_block_expr(df, list(order_by), n_blocks, descs))
    w_loc = Window.partitionBy("_blk").orderBy(*sort_cols)
    local = blocked.withColumn("_lrn",
                               F.row_number().over(w_loc).cast("long"))
    w_blk = (Window.orderBy("_blk")
             .rowsBetween(Window.unboundedPreceding, -1))
    offsets = (blocked.groupBy("_blk").agg(F.count("*").alias("_bn"))
               .withColumn("_boff", F.coalesce(F.sum("_bn").over(w_blk),
                                               F.lit(0)).cast("long"))
               .select("_blk", "_boff"))
    return (local.join(F.broadcast(offsets), "_blk")
            .withColumn(out_col, F.col("_boff") + F.col("_lrn"))
            .drop("_blk", "_lrn", "_boff"))


def keyed_global_rank(df: DataFrame, key_cols: list[str],
                      order_by: list[Column], n_blocks: int = 32,
                      out_col: str = "_rn",
                      desc: list[bool] | None = None) -> DataFrame:
    """Per-KEY global row_number, distributed — `global_rank`
    generalized with a partition key. The naive
    `row_number() OVER (PARTITION BY key ORDER BY ...)` is one task per
    key: fine at host cardinality, a scale bug when keys are few and
    huge (e.g. K=8 scheduler queues over a 10^10-row frontier). Here the
    pure block id (`_det_block_expr` over (key, order) — driver-frozen
    boundaries, stable across plan branches) is monotone in (key, order)
    so each key's rows span contiguous ascending blocks; ranks are
    block-local (parallel) and each key's per-block counts get their own
    tiny exclusive-cumsum window (partitioned BY KEY over <= n_blocks
    rows — never one global task). Order must be total within a key.
    `order_by` takes PLAIN columns; descending order per column via the
    parallel `desc` flag list (as in `global_rank`)."""
    descs = list(desc) if desc is not None else [False] * len(order_by)
    sort_cols = [c.desc() if d else c.asc()
                 for c, d in zip(order_by, descs)]
    blocked = df.withColumn(
        "_blk", _det_block_expr(
            df, [F.col(k) for k in key_cols] + list(order_by), n_blocks,
            [False] * len(key_cols) + descs))
    w_loc = Window.partitionBy(*key_cols, "_blk").orderBy(*sort_cols)
    local = blocked.withColumn("_lrn",
                               F.row_number().over(w_loc).cast("long"))
    w_blk = (Window.partitionBy(*key_cols).orderBy("_blk")
             .rowsBetween(Window.unboundedPreceding, -1))
    offsets = (blocked.groupBy(*key_cols, "_blk")
               .agg(F.count("*").alias("_bn"))
               .withColumn("_boff", F.coalesce(F.sum("_bn").over(w_blk),
                                               F.lit(0)).cast("long"))
               .select(*key_cols, "_blk", "_boff"))
    return (local.join(F.broadcast(offsets), [*key_cols, "_blk"])
            .withColumn(out_col, F.col("_boff") + F.col("_lrn"))
            .drop("_blk", "_lrn", "_boff"))


def _md5_coin(key: Column) -> Column:
    """Content-stable 32-bit uniform integer (the px5 coin)."""
    return F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("long")


def fim_transform(df: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id", fim_rate_pct: int = 50,
                  min_chars: int = 16) -> DataFrame:
    """Fill-in-the-middle transformation (Bavarian et al. 2022, "Efficient
    Training of Language Models to Fill in the Middle"): rewrite a
    deterministic fraction of documents from autoregressive order into
    PSM (prefix-suffix-middle) or SPM (suffix-prefix-middle) order with
    sentinel tokens, so the model learns infilling "for free". The
    document is cut at two content-stable points 0 <= c1 <= c2 <= n;
    segments are re-concatenated as
      PSM:  <PRE> prefix <SUF> suffix <MID> middle
      SPM:  <PRE> <SUF> suffix <MID> prefix middle
    Documents below `min_chars` or losing the rate coin stay 'ar'.

    All randomness is integerized md5 coins keyed on the doc id (the
    px5/tx9 discipline): the FIM/AR gate compares a 32-bit coin against
    fim_rate_pct * 2^32 / 100 in exact integer arithmetic; cut points
    are independent coins reduced mod the valid span. Reproducible
    across engines, partitionings, and runs — resharding the corpus
    cannot change which documents are transformed (the property that
    makes mid-training FIM-rate changes auditable).

    Scale shape: pure map-side string algebra, zero shuffle, zero
    Python; output carries segment lengths + the md5 of the transformed
    string so downstream equality gates never move the payload twice.
    """
    n = F.length(text_col)
    gate = _md5_coin(F.concat(F.lit("fim/"), F.col(id_col).cast("string")))
    c1_coin = _md5_coin(F.concat(F.lit("fimc1/"),
                                 F.col(id_col).cast("string")))
    c2_coin = _md5_coin(F.concat(F.lit("fimc2/"),
                                 F.col(id_col).cast("string")))
    spm_coin = _md5_coin(F.concat(F.lit("fimspm/"),
                                  F.col(id_col).cast("string")))
    threshold = F.lit((fim_rate_pct * (1 << 32)) // 100).cast("long")
    is_fim = (n >= min_chars) & (gate < threshold)
    c1 = F.when(is_fim, c1_coin % (n.cast("long") + 1)) \
          .otherwise(F.lit(0)).cast("long")
    c2 = F.when(is_fim, c1 + c2_coin % (n.cast("long") - c1 + 1)) \
          .otherwise(F.lit(0)).cast("long")
    pre = F.substring(F.col(text_col), F.lit(1), c1.cast("int"))
    mid = F.substring(F.col(text_col), (c1 + 1).cast("int"),
                      (c2 - c1).cast("int"))
    suf = F.substring(F.col(text_col), (c2 + 1).cast("int"),
                      (n.cast("long") - c2).cast("int"))
    mode = F.when(~is_fim, F.lit("ar")) \
            .when(spm_coin % 2 == 0, F.lit("psm")) \
            .otherwise(F.lit("spm"))
    out = (F.when(mode == "ar", F.col(text_col))
           .when(mode == "psm",
                 F.concat(F.lit("<PRE>"), pre, F.lit("<SUF>"), suf,
                          F.lit("<MID>"), mid))
           .otherwise(
               F.concat(F.lit("<PRE>"), F.lit("<SUF>"), suf,
                        F.lit("<MID>"), pre, mid)))
    return df.select(
        F.col(id_col), mode.alias("mode"),
        n.cast("long").alias("n_chars"), c1.alias("c1"), c2.alias("c2"),
        F.length(pre).cast("long").alias("len_prefix"),
        F.length(mid).cast("long").alias("len_middle"),
        F.length(suf).cast("long").alias("len_suffix"),
        F.md5(F.encode(out, "UTF-8")).alias("out_md5"))


def curriculum_order(df: DataFrame, phase: Column, key: Column,
                     id_col: str = "doc_id",
                     n_blocks: int = 32) -> DataFrame:
    """Curriculum training order: a GLOBAL sample position for every
    row such that phases come out in ascending order (easy -> hard, the
    curriculum-learning schedule of Bengio et al., ICML 2009) while
    rows WITHIN a phase stream in content-stable shuffled order (the
    px8 md5-coin discipline — correlated neighbors from crawl locality
    must not land adjacent in the training stream).

    Output: df + (phase INT, pos BIGINT), pos a dense 1-based global
    rank over (phase, md5(key), id).

    Scale shape: this is exactly ONE `global_rank` — range-partition by
    (phase, coin) into ordered blocks, rank block-locally in parallel,
    broadcast the n_blocks-row exclusive-cumsum offsets back. No
    single-task window, no driver materialization; the phase column
    rides along as the leading sort key, so phase boundaries fall
    wherever the sampled range boundaries land — correctness never
    depends on phases being partition-aligned."""
    z = (df.withColumn("phase", phase.cast("int"))
         .withColumn("_mk", F.md5(key)))
    out = global_rank(z, [F.col("phase"), F.col("_mk"), F.col(id_col)],
                      n_blocks=n_blocks, out_col="pos")
    return out.drop("_mk")


def rag_chunk_spans(docs: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id", chunk: int = 64,
                    stride: int = 48) -> DataFrame:
    """Sliding-window document chunking — the retrieval/RAG corpus prep
    step (and the long-document training splitter): fixed `chunk`-word
    windows advancing by `stride` words (overlap = chunk - stride), the
    last window short, every word covered by >= 1 chunk. Chunk identity
    is the md5 of the space-joined window over the \\s+ word split, so
    chunk-level exact dedup (dd1 on chunk_md5) composes downstream and
    the ids are reproducible across runs, engines, and partitionings.

    Output: (id, chunk_idx INT 0-based, start_word INT, n_words INT,
    chunk_md5 STRING) — one row per window.

    Scale shape: pure map-side column algebra — split once (let-bound),
    starts from F.sequence(0, n-1, stride), posexplode, F.slice. ZERO
    shuffle; fan-out ~n/stride rows per doc with the source partitioning
    preserved. At 10^10 docs this is exactly the shape you want: the
    only wide ops are whatever the caller does with the chunks."""
    w = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    d = (docs.select(id_col, w.alias("_w"))
         .withColumn("_n", F.size("_w"))
         .where(F.col("_n") >= 1))
    e = d.select(
        id_col, "_w",
        F.posexplode(F.sequence(F.lit(0), F.col("_n") - 1,
                                F.lit(stride))).alias("chunk_idx", "_st"))
    sl = F.slice(F.col("_w"), F.col("_st") + 1, chunk)
    return e.select(
        id_col,
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        F.col("_st").cast("int").alias("start_word"),
        F.size(sl).cast("int").alias("n_words"),
        F.md5(F.array_join(sl, " ")).alias("chunk_md5"))


def dataset_card(docs: DataFrame, score, fp,
                 dims: tuple[str, str] = ("source", "lang"),
                 text_col: str = "text", scale: int = 1000) -> DataFrame:
    """Materialized "dataset card": the per-slice statistics table every
    training-data release ships (docs, word/token volume, exact-dup
    rate, mean quality) at EVERY granularity of the dims hierarchy —
    (source, lang), (source), corpus total — in ONE pass via GROUP BY
    ROLLUP (one Expand + partial/final agg, one shuffle; three separate
    scans is the anti-pattern at 100 TB).

    `score` is the quality column expression (integerized once to
    floor(score*scale) so slice means are exact-BIGINT sums down to one
    division); `fp` the exact-dup fingerprint expression (dd1/dd2's
    md5-of-normalized-text) — dup flags come from ONE
    fingerprint-cardinality groupBy joined back, so a document counts
    as duplicated in every slice containing it. Null grouping keys are
    sentineled '(all)' (the st5 convention: the driver's comparator
    cannot sort None against str)."""
    d = docs.select(
        *dims,
        F.size(F.split(F.trim(F.col(text_col)), r"\s+"))
        .cast("long").alias("_nw"),
        F.length(F.col(text_col)).cast("long").alias("_nc"),
        F.floor(score * scale).cast("long").alias("_sm"),
        fp.alias("_fp"))
    fpc = (d.groupBy("_fp").agg(F.count(F.lit(1)).alias("_fn")))
    j = d.join(fpc, "_fp").withColumn(
        "_dup", F.when(F.col("_fn") > 1, 1).otherwise(0))
    return (j.rollup(*dims)
            .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
                 F.sum("_nw").cast("long").alias("n_words"),
                 F.sum("_nc").cast("long").alias("n_chars"),
                 F.sum("_dup").cast("long").alias("n_dup_docs"),
                 F.round(F.sum("_sm") / (F.count(F.lit(1))
                                         * float(scale)), 4)
                 .alias("mean_quality"))
            .select(*[F.coalesce(F.col(c), F.lit("(all)")).alias(c)
                      for c in dims],
                    "n_docs", "n_words", "n_chars", "n_dup_docs",
                    "mean_quality"))
