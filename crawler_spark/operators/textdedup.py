"""Document deduplication family for training-data pipelines.

Exact, fingerprint, MinHash+LSH, SimHash, and n-gram-Jaccard dedup over a
`documents(doc_id, text)`-shaped table. All formulations are pure
`pyspark.sql.functions` column algebra (no UDFs, whole-stage codegen) so each
has an exact ANSI-SQL oracle twin in crawler_spark/queries.py.

Design notes for 100 TB:
  * Shingling/minhashing is per-row (map-side, no shuffle). The only shuffles
    are the LSH band groupBy and the pair self-join — both keyed on band
    buckets whose cardinality we control via (n_perm, band_size).
  * Hash = md5 (bit-identical in Spark and DuckDB — the oracle needs
    cross-engine equality; xxhash64 is Spark-only). md5 costs more than
    xxhash64 per call; swap `_hash_str` for xxhash64 when oracle parity is
    not needed.
  * The LSH self-join explodes quadratically inside a hot bucket; cap bucket
    width upstream (drop buckets with > max_bucket docs — standard practice,
    they are near-certain template clusters anyway).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

WORD_SPLIT_RE = r"\s+"


def words_col(text: Column) -> Column:
    return F.split(F.trim(text), WORD_SPLIT_RE)


def normalize_text(text: Column) -> Column:
    """Casefold + whitespace-collapse + trim: the exact-dedup key."""
    return F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))


def fingerprint_col(text: Column) -> Column:
    """Document fingerprint: md5 of normalized text (P-hashable everywhere)."""
    return F.md5(normalize_text(text))


def shingles_from_words(w: Column, n: int = 3) -> Column:
    """Word n-gram shingle array (distinct) from an already-evaluated word
    array (a projected column or HOF lambda variable). Uses slice+array_join
    so the word array is read, not recomputed, per gram.
    Contract (mirrored by the SQL oracle): docs shorter than n words get a
    single whole-text shingle — never partial/NULL-padded grams."""
    gram = F.transform(F.sequence(F.lit(0), F.size(w) - n),
                       lambda j: F.array_join(F.slice(w, j + 1, n), " "))
    return F.when(F.size(w) >= n, F.array_distinct(gram)) \
            .otherwise(F.array(F.array_join(w, " ")))


def shingles_col(text: Column, n: int = 3) -> Column:
    """Shingles straight from a text column. The word split is let-bound via
    a single-element transform() lambda so it evaluates ONCE per row —
    referencing the split expression inside each gram (e.g. via element_at)
    re-runs the split per access, measured 16x slower on sf0.1."""
    bound = F.transform(F.array(words_col(text)),
                        lambda warr: shingles_from_words(warr, n))
    return F.element_at(bound, 1)


def minhash_sig_cols(shingles: Column, n_perm: int) -> list[Column]:
    """MinHash signature: per permutation i, min over shingles of
    md5(i || ':' || shingle). Lexicographic min of hex == min of the 128-bit
    value, so no int conversion is needed (and DuckDB agrees bit-for-bit)."""
    def perm(i):
        # one-arg lambda: a 2-arg HOF callable would make pyspark pass the
        # array index as the second argument, shadowing the closure
        return lambda s: F.md5(F.concat(F.lit(f"{i}:"), s))

    return [F.array_min(F.transform(shingles, perm(i))).alias(f"mh{i}")
            for i in range(n_perm)]


def _in_bucket_pairs(ids: Column) -> Column:
    """Ordered (doc_a < doc_b) pair combinations from a bucket's id array —
    the i<j slice trick shared by every bucketed candidate generator
    (LSH bands, shingle df, containment). One definition: an off-by-one
    here would otherwise have to be fixed in three places."""
    return F.flatten(F.transform(
        ids,
        lambda x, i: F.transform(
            F.slice(ids, i + 2, F.size(ids)),
            lambda y: F.struct(F.least(x, y).alias("doc_a"),
                               F.greatest(x, y).alias("doc_b")))))


def _shingle_projection(docs: DataFrame, id_col: str, text_col: str,
                        shingle_n: int) -> DataFrame:
    """Checkpointed (doc_id, sh) projection — computed ONCE per operator
    call even when it feeds candidate generation plus verify joins
    (Catalyst re-derives map projections per branch, NOTES fact #1)."""
    return docs.select(F.col(id_col).alias("doc_id"),
                       shingles_col(F.col(text_col), shingle_n).alias("sh")) \
               .localCheckpoint(eager=False)


def _shingle_candidates(sh: DataFrame, max_df: int | None) -> DataFrame:
    """Distinct (doc_a, doc_b) pairs sharing >= 1 shingle, generated inside
    per-shingle buckets (== the explode self-join on shingle, but one
    shingle evaluation and one shuffle). `max_df` is the hot-bucket
    quadratic guard: grams in more than max_df docs carry no dedup signal
    and alone turn one bucket into O(corpus^2) pairs at 100x scale."""
    ex = sh.select("doc_id", F.explode("sh").alias("s"))
    buckets = (ex.groupBy("s").agg(F.collect_list("doc_id").alias("ids"))
               .where(F.size("ids") >= 2))
    if max_df is not None:
        buckets = buckets.where(F.size("ids") <= max_df)
    return (buckets.select(F.explode(_in_bucket_pairs(F.col("ids")))
                           .alias("p"))
            .select(F.col("p.doc_a").alias("doc_a"),
                    F.col("p.doc_b").alias("doc_b"))
            .distinct())


def lsh_band_pairs(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
                   n_perm: int = 8, band_size: int = 2, shingle_n: int = 3,
                   max_bucket: int = 64, sh: DataFrame | None = None) -> DataFrame:
    """Candidate near-dup pairs via banded MinHash-LSH.

    Returns (doc_a, doc_b, n_shared_bands), doc_a < doc_b. Two docs are
    candidates when >= 1 band (concatenation of `band_size` minhashes)
    collides. Buckets wider than `max_bucket` are dropped (template guard —
    the quadratic-pair cap at scale).

    Pass a precomputed (doc_id, sh) frame via `sh` when the caller already
    holds the shingle projection (dd13/dd14 reuse one checkpoint across
    the LSH, truth, and signature paths — otherwise this function would
    re-derive the full shingle pass).
    """
    if n_perm % band_size:
        # not an assert: -O strips asserts and a bad band_size would
        # then silently build malformed band keys.
        raise ValueError("n_perm must be divisible by band_size")
    n_bands = n_perm // band_size
    # Materialize the shingle array in its OWN projection: Catalyst does not
    # common-subexpression-eliminate the (large) gram-builder expression
    # across the n_perm signature columns — inlining it per column measured
    # 7x slower on the same input.
    if sh is None:
        sh = docs.select(F.col(id_col).alias("doc_id"),
                         shingles_col(F.col(text_col), shingle_n).alias("sh"))
    sig = sh.select("doc_id", *minhash_sig_cols(F.col("sh"), n_perm))
    bands = sig.select(
        "doc_id",
        F.explode(F.array(*[
            F.struct(F.lit(b).alias("band"),
                     F.concat_ws("|", *[F.col(f"mh{b * band_size + k}")
                                        for k in range(band_size)]).alias("key"))
            for b in range(n_bands)])).alias("bk"),
    ).select("doc_id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    # One shuffle: bucket docs per (band, key). The template guard (drop
    # buckets wider than max_bucket — near-certain boilerplate clusters) caps
    # the quadratic pair fan-out; pairs are then generated inside each bucket
    # with array algebra (i<j combinations), avoiding the bands-side
    # self-join, which would recompute the whole signature a second time.
    buckets = (bands.groupBy("band", "key")
               .agg(F.collect_list("doc_id").alias("ids"))
               .where((F.size("ids") >= 2) & (F.size("ids") <= max_bucket)))
    pairs = (buckets.select(F.explode(_in_bucket_pairs(F.col("ids"))).alias("p"))
             .groupBy(F.col("p.doc_a").alias("doc_a"),
                      F.col("p.doc_b").alias("doc_b"))
             .agg(F.count("*").alias("n_shared_bands")))
    return pairs


def ngram_jaccard_pairs(docs: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text", shingle_n: int = 3,
                        threshold: float = 0.8,
                        max_df: int | None = 64,
                        sh: DataFrame | None = None,
                        prune_verify: bool = False) -> DataFrame:
    """N-gram Jaccard similarity pairs >= threshold, two-stage:

    1. CANDIDATES: explode(shingles) -> groupBy(shingle) -> in-bucket pair
       gen. `max_df` is the hot-bucket quadratic guard (same role as dd3's
       `max_bucket`): shingles appearing in more than `max_df` docs cannot
       *create* a candidate pair — "terms of service"-grade grams carry no
       dedup signal and alone turn one bucket into O(corpus²) pairs at
       100x scale.
    2. VERIFY: join each candidate pair back to the full shingle arrays
       and compute the TRUE Jaccard |A∩B| / |A∪B| over the UNFILTERED
       sets. The cap therefore bounds fan-out without ever inflating
       similarity (a df-filtered Jaccard would report 1.0 for two
       unrelated boilerplate-heavy docs sharing one rare gram); the only
       loss is pairs ALL of whose shared shingles are hot — inherent to
       any df cap, and the accepted trade.

    Pass max_df=None for exhaustive candidates (exact all-pairs recall —
    quadratic on hot shingles, never safe as a direct method at scale).

    `prune_verify=True` semi-joins the shingle projection down to the
    candidate id set before the verify joins (behind an eager candidate
    checkpoint so candidate generation is not recomputed). Only worth it
    when |candidate docs| ≪ |corpus| — the 10^12-doc sharded-dedup
    regime; measured at sf0.1 every doc is a candidate (5000/5000 ids over
    1.13M pairs) and the prune is pure overhead, hence default off.
    """
    if sh is None:
        sh = _shingle_projection(docs, id_col, text_col, shingle_n)
    cands = _shingle_candidates(sh, max_df)
    # Per-doc distinct arrays + set sizes ONCE, so the per-pair verify is a
    # single array_intersect: |A∪B| = na + nb - |A∩B| (the same integers
    # the oracle's list_distinct(concat) yields — identical division,
    # identical round) — drops the per-pair array_union hash-set build,
    # measured 8.2s -> ~5s warm at sf0.1.
    shd = sh.select("doc_id", F.array_distinct("sh").alias("shd")) \
            .withColumn("n", F.size("shd"))
    if prune_verify:
        cands = cands.localCheckpoint(eager=True)
        ids = (cands.select(F.col("doc_a").alias("doc_id"))
               .union(cands.select(F.col("doc_b").alias("doc_id")))
               .distinct())
        shd = shd.join(ids, "doc_id", "left_semi")
    # Verification joins ship shingle arrays only for docs that appear
    # in a candidate pair — volume ∝ candidates (cap-bounded), not corpus.
    # The per-pair |A∩B| is LET-BOUND through a single-element transform
    # lambda (NOTES fact #1): jaccard references it twice (numerator and
    # the |A∪B| identity) and Catalyst does no cross-expression CSE, so
    # the inlined form built the intersect hash set twice per candidate
    # pair inside the join condition — measured 2x verify-stage wall at
    # sf0.1 (1.13M pairs).
    jac = F.element_at(
        F.transform(F.array(F.size(F.array_intersect("sha", "shb"))),
                    lambda i: F.round(
                        i / (F.col("na") + F.col("nb") - i), 4)), 1)
    j = (cands
         .join(shd.select(F.col("doc_id").alias("doc_a"),
                          F.col("shd").alias("sha"),
                          F.col("n").alias("na")), "doc_a")
         .join(shd.select(F.col("doc_id").alias("doc_b"),
                          F.col("shd").alias("shb"),
                          F.col("n").alias("nb")), "doc_b")
         .withColumn("jaccard", jac)
         .where(F.col("jaccard") >= threshold)
         .select("doc_a", "doc_b", "jaccard"))
    return j


ROLL_B = 69069               # LCG multiplier; acc*B + w stays < 2^63
ROLL_M = 2147483647          # 2^31 - 1


def rolling_hashes_col(h: Column, k: int = 4) -> Column:
    """Rolling (Rabin-Karp/Horner) window hashes over a pre-projected word-
    hash array `h`: window i = fold(0, h[i..i+k-1], acc -> (acc*B + w) % M).
    Docs shorter than k words get one whole-doc window. Sequential fold in
    both engines -> bit-identical values (DuckDB twin uses list_reduce with
    a prepended 0 seed)."""
    def win(i):
        return F.aggregate(
            F.slice(h, i + 1, k), F.lit(0).cast("long"),
            lambda acc, x: (acc * ROLL_B + x) % ROLL_M)

    windows = F.transform(F.sequence(F.lit(0), F.size(h) - k), win)
    whole = F.array(F.aggregate(h, F.lit(0).cast("long"),
                                lambda acc, x: (acc * ROLL_B + x) % ROLL_M))
    return F.when(F.size(h) >= k, windows).otherwise(whole)


def rolling_hashes_incremental(docs: DataFrame, k: int = 4,
                               h_col: str = "h",
                               out_col: str = "rolls",
                               cell_budget: int = 16_000_000) -> DataFrame:
    """True O(n)-per-doc incremental Rabin-Karp over a pre-projected word-
    hash array column — bit-identical values to `rolling_hashes_col` (the
    recurrence W[i+1] = (W[i]*B - h[i]*(B^k mod M) + h[i+k]) mod M computes
    the same polynomial mod M as the per-window Horner re-fold).

    Bit-identity holds for inputs in [0, 2^32) — what `word_hashes_col`
    produces (both paths feed from it). Outside that domain the two mod
    conventions diverge: this path floor-mods inputs up front (numpy %,
    always non-negative) while the column path folds raw values through
    Spark's sign-preserving %, so e.g. a negative xxhash64 yields different
    (not wrong, but non-interchangeable) fingerprints. If xxhash64 is ever
    swapped in (see module notes), pmod it into [0, ROLL_M) on BOTH paths
    first — mixing the paths over raw signed hashes silently partitions
    the corpus into two incompatible fingerprint spaces.

    This is the large-k scale path: the column-algebra form re-folds k
    elements per window (O(n*k) work inside codegen — fine at k=4, the
    wrong asymptotics at winnowing-grade k≈50). A modular prefix scan is
    not expressible in Spark's HOFs without an O(n^2) array-append
    accumulator, so the scan runs in ONE mapInPandas stage, numpy-
    vectorized across the Arrow batch: documents are padded into a dense
    (rows, max_len) matrix and the sequential position loop advances ALL
    rows per step — per-element Python cost is amortized to ~1/rows.

    Skew guard: padding the WHOLE batch to its longest doc lets one
    million-word outlier inflate 10k typical rows to an
    O(rows * max_len) ≈ 80 GB matrix. Rows are therefore length-sorted
    and chunked so each dense matrix stays under `cell_budget` cells
    (default 16M ≈ 128 MB of int64, ~2x that with the window output) —
    memory is bounded by ~2*cell_budget regardless of skew, an outlier
    doc pads only its own near-homogeneous chunk, and the vectorization
    win is preserved (chunks are thousands of rows for typical lengths).

    Contract matches rolling_hashes_col: docs shorter than k words get one
    whole-doc Horner window.
    """
    import numpy as np
    from pyspark.sql.types import ArrayType, LongType, StructField, StructType

    out_schema = StructType(list(docs.schema.fields)
                            + [StructField(out_col, ArrayType(LongType()))])
    bk = pow(ROLL_B, k, ROLL_M)          # B^k mod M, python-int precomputed

    def _scan(batches):
        for pdf in batches:
            arrs = [np.asarray(a, dtype=np.int64) % ROLL_M for a in pdf[h_col]]
            res: list = [None] * len(arrs)

            def dense(idx: list[int]) -> None:
                sub = [arrs[i] for i in idx]
                max_len = max(len(a) for a in sub)
                H = np.zeros((len(sub), max_len), dtype=np.int64)
                for r, a in enumerate(sub):
                    H[r, :len(a)] = a
                # W[:,0]: Horner over the first k columns (k vectorized steps)
                w = np.zeros(len(sub), dtype=np.int64)
                for j in range(min(k, max_len)):
                    w = (w * ROLL_B + H[:, j]) % ROLL_M
                wins = [w.copy()]
                # the scan: one whole-chunk vectorized step per position.
                # magnitudes stay in int64: w*B < 2^31*69069 ≈ 2^47;
                # H*bk < 2^31 * 2^31 = 2^62 (H reduced mod M above).
                for t in range(1, max_len - k + 1):
                    w = (w * ROLL_B - H[:, t - 1] * bk + H[:, t + k - 1]) % ROLL_M
                    wins.append(w.copy())
                W = np.stack(wins, axis=1)
                for r, i in enumerate(idx):
                    n = len(arrs[i])
                    if n >= k:
                        res[i] = W[r, : n - k + 1].tolist()
                    else:             # whole-doc window (short-doc contract)
                        acc = 0
                        for x in arrs[i].tolist():
                            acc = (acc * ROLL_B + x) % ROLL_M
                        res[i] = [acc]

            order = sorted(range(len(arrs)), key=lambda i: len(arrs[i]))
            chunk: list[int] = []
            for i in order:
                width = max(len(arrs[i]), 1)     # ascending => chunk max
                if chunk and (len(chunk) + 1) * width > cell_budget:
                    dense(chunk)
                    chunk = []
                chunk.append(i)
            if chunk:
                dense(chunk)
            out = pdf.copy()
            out[out_col] = res
            yield out

    return docs.mapInPandas(_scan, out_schema)


def rolling_fingerprint_cols(h: Column, k: int = 4,
                             sample_mod: int = 8) -> list[Column]:
    """Winnowing-style document fingerprint summary from rolling hashes:
    (n_windows, min_rh, n_sampled) where sampled = windows with rh % P == 0
    (content-defined sampling — the same positions are picked no matter how
    the document is split or shifted, which is the property that makes
    rolling fingerprints robust to insertions for near-dup detection)."""
    rolls = rolling_hashes_col(h, k)
    bound = F.transform(F.array(rolls), lambda r: F.struct(
        F.size(r).cast("long").alias("n_windows"),
        F.array_min(r).alias("min_rh"),
        F.size(F.filter(r, lambda x: x % sample_mod == 0))
        .cast("long").alias("n_sampled")))
    s = F.element_at(bound, 1)
    return [s["n_windows"].alias("n_windows"), s["min_rh"].alias("min_rh"),
            s["n_sampled"].alias("n_sampled")]


def word_hashes_col(text: Column) -> Column:
    """Per-word 32-bit hashes (md5-derived, cross-engine reproducible).
    Project this into its own column BEFORE fanning out per-bit aggregates:
    Catalyst does not CSE the md5 transform across sibling expressions."""
    return F.transform(
        words_col(text),
        lambda x: F.conv(F.substring(F.md5(x), 1, 8), 16, 10).cast("long"))


def simhash_col(text: Column, bits: int = 16) -> Column:
    """SimHash over words: bit b of md5-int(word) votes ±1; sign of the vote
    sum sets bit b of the fingerprint. Pure column algebra (aggregate over
    the word array), cross-engine reproducible via md5/conv."""
    return simhash_from_hashes(word_hashes_col(text), bits)


def simhash_from_hashes(h: Column, bits: int = 16) -> Column:
    """SimHash from a pre-projected word-hash array column.

    ONE traversal of `h` with an array-of-votes accumulator — the naive
    form (one F.aggregate per bit) re-inlines the full word-hash expression
    `bits` times because Catalyst does no CSE across sibling aggregates
    (NOTES.md hard-won fact #1); measured 13x slower at bits=16. Here `h`
    appears exactly once (the vote fold) and the votes array exactly once
    (the packing zip_with), so each is evaluated once per row regardless of
    what expression the caller passes."""
    # F.shiftright/shiftleft only take literal shift amounts in the Python
    # API; call_function passes the per-element index column through to the
    # SQL builtin
    votes = F.aggregate(
        h, F.array_repeat(F.lit(0).cast("long"), bits),
        lambda acc, v: F.transform(
            acc, lambda a, i: a + F.when(
                F.call_function("shiftright", v, i)
                 .bitwiseAND(F.lit(1)) == 1,
                F.lit(1)).otherwise(F.lit(-1))))
    packed = F.zip_with(
        votes, F.sequence(F.lit(0), F.lit(bits - 1)),
        lambda vote, b: F.when(
            vote > 0,
            F.call_function("shiftleft", F.lit(1).cast("long"), b))
         .otherwise(F.lit(0).cast("long")))
    return F.aggregate(packed, F.lit(0).cast("long"), lambda acc, x: acc + x)


# --- Line-level dedup (CCNet/C4 style) -----------------------------------
def doc_lines_col(text: Column, words_per_line: int = 8) -> Column:
    """Split a document into fixed-width word "lines" (the corpus has no
    newlines; real HTML text would split on '\\n'). Casefolded so the dup
    key is normalization-invariant. Empty docs yield an empty array."""
    def chunks(w: Column) -> Column:
        n = F.ceil(F.size(w) / float(words_per_line)).cast("int")
        return F.transform(
            F.sequence(F.lit(0), n - 1),
            lambda i: F.array_join(
                F.slice(w, i * words_per_line + 1, words_per_line), " "))

    bound = F.transform(F.array(words_col(F.lower(text))), chunks)
    return F.when(F.length(F.trim(text)) > 0, F.element_at(bound, 1)) \
            .otherwise(F.array().cast("array<string>"))


def line_dedup(docs: DataFrame, id_col: str = "doc_id",
               lines_col_name: str = "lines",
               max_docs: int = 1) -> DataFrame:
    """CCNet/C4-style line-level dedup: drop every line that appears in more
    than `max_docs` DISTINCT documents (boilerplate: nav bars, cookie
    banners, footers), keep the rest in original order.

    Input: (id_col, lines: array<string>). Output: (id_col, n_lines,
    n_kept, clean_md5) — md5 of the surviving lines re-joined, so the row
    stays flat/hashable for the driver gate.

    Scale shape (100 TB): explode is map-side; the corpus-wide line count
    is ONE partial-agg shuffle keyed on the line string (at scale key on
    xxhash64(line) instead — 8-byte shuffle keys; the string key here keeps
    the DuckDB oracle bit-identical). The dup set (only lines with >max_docs
    docs) is far smaller than the corpus and lands in an AQE-elected
    broadcast for the anti-join at our sizes; reassembly is a second
    partial-agg shuffle on doc id, even keys. No step is quadratic and no
    driver-side collection occurs.
    """
    ln = (docs.select(id_col, F.posexplode(lines_col_name)
                      .alias("pos", "line")))
    dup = (ln.groupBy("line")
           .agg(F.count_distinct(F.col(id_col)).alias("nd"))
           .where(F.col("nd") > max_docs)
           .select("line"))
    kept = ln.join(dup, "line", "left_anti")
    agg = (kept.groupBy(id_col)
           .agg(F.count("*").alias("n_kept"),
                F.md5(F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(
                            F.struct("pos", "line"))),
                        lambda s: s.line), "\n")).alias("clean_md5")))
    base = docs.select(id_col, F.size(lines_col_name).alias("n_lines"))
    return (base.join(agg, id_col, "left")
            .select(id_col, "n_lines",
                    F.coalesce("n_kept", F.lit(0)).cast("long")
                     .alias("n_kept"),
                    F.coalesce("clean_md5", F.md5(F.lit("")))
                     .alias("clean_md5")))


# --- Cross-document repeated-substring detection (Lee et al. 2022 style) --
def cross_doc_repeats(docs: DataFrame, k: int = 8, id_col: str = "doc_id",
                      h_col: str = "h", sample_mod: int = 1,
                      incremental: bool = True) -> DataFrame:
    """Exact-substring dedup signal ("Deduplicating Training Data Makes
    Language Models Better", Lee et al., ACL 2022 — suffix-array repeats),
    re-expressed Spark-first at word granularity: a k-word window whose
    rolling hash occurs in >= 2 DISTINCT documents is a cross-doc repeated
    passage; per doc we report how much of it is covered by such windows.

    Input: (id_col, h_col: array<long> word hashes). Output: (id_col,
    n_windows, n_rep_windows, rep_frac) — flat/hashable.

    Dataflow: rolling_hashes_col (Rabin-Karp windows, shared with tx4) ->
    posexplode -> partial-agg shuffle on (rh, doc) then rh (two-phase
    count_distinct absorbs hot-window skew) -> the much smaller repeated-
    hash set joins back against the exploded windows (AQE elects broadcast
    at our sizes, sort-merge on rh at corpus scale) -> per-doc rollup on
    even doc keys. The exploded (doc, rh) view is checkpointed so the
    Rabin-Karp fold runs ONCE (Catalyst recomputes map projections per
    shuffle branch), and the per-doc window count comes straight from the
    array length — no fold at all on that branch (was 3 folds, ~2x wall).

    Scale (100 TB): the explode is map-side but shuffles O(total windows)
    rows. `sample_mod` > 1 switches to content-defined sampling (keep
    windows with rh % P == 0, the winnowing trick): shuffle volume drops
    ~P-fold and rep_frac becomes an unbiased estimate over sampled
    positions — the knob a 10^12-word corpus runs with. Default 1 = exact
    (the oracle contract). Hash collisions (mod 2^31-1) affect both
    engines identically; at corpus scale use a 63-bit modulus.

    `incremental=True` (default) computes the windows via
    `rolling_hashes_incremental` — the O(n)-per-doc Arrow scan, proven
    bit-identical to the per-window re-fold
    (test_incremental_rolling_equals_refold) — instead of the
    interpreted O(n*k) HOF fold.
    """
    if incremental:
        rolls = rolling_hashes_incremental(
            docs.select(id_col, h_col), k=k, h_col=h_col, out_col="rolls")
    else:
        rolls = docs.select(id_col, rolling_hashes_col(F.col(h_col), k)
                            .alias("rolls"))
    # The Rabin-Karp fold is the dominant map cost; materialize the
    # exploded view ONCE so the rep and cnt branches don't each re-derive
    # it (Catalyst recomputes map-side projections per shuffle branch —
    # NOTES fact #1). Measured 30.1s -> single-fold at sf0.1.
    e = (rolls.select(id_col, F.posexplode("rolls").alias("pos", "rh"))
         .localCheckpoint(eager=False))
    if sample_mod > 1:
        e = e.where(F.col("rh") % sample_mod == 0)
    rep = (e.groupBy("rh")
           .agg(F.count_distinct(F.col(id_col)).alias("nd"))
           .where(F.col("nd") >= 2)
           .select("rh"))
    cnt = (e.join(rep, "rh")
           .groupBy(id_col).agg(F.count("*").alias("n_rep")))
    # window count needs no fold at all: len-k+1, or the single whole-doc
    # window rolling_hashes_col emits for docs shorter than k
    base = docs.select(id_col,
                       F.when(F.size(F.col(h_col)) >= k,
                              F.size(F.col(h_col)) - (k - 1))
                       .otherwise(F.lit(1))
                       .cast("long").alias("n_windows"))
    return (base.join(cnt, id_col, "left")
            .select(id_col, "n_windows",
                    F.coalesce("n_rep", F.lit(0)).cast("long")
                     .alias("n_rep_windows"),
                    F.round(F.coalesce("n_rep", F.lit(0))
                            / F.col("n_windows"), 4).alias("rep_frac")))


def containment_pairs(docs: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text", shingle_n: int = 3,
                      threshold: float = 0.8,
                      max_df: int | None = 64) -> DataFrame:
    """Asymmetric shingle CONTAINMENT pairs (Broder's resemblance
    companion): c(A in B) = |A∩B| / |A|. Jaccard (dd4) misses the
    quote-inside-article / page-inside-mirror case — a 50-word doc fully
    embedded in a 5000-word doc has Jaccard ~0.01 but containment 1.0,
    and exactly that asymmetry is what leaks eval sets and duplicates
    boilerplate-wrapped content into training corpora.

    Same two-stage shape as ngram_jaccard_pairs (one candidate shuffle
    with the max_df hot-shingle quadratic guard, then TRUE containment
    over the UNFILTERED sets for candidate pairs only). Emits one row per
    unordered pair with BOTH directions, kept when either side reaches
    `threshold`: (doc_a, doc_b, c_ab, c_ba) where c_ab = |A∩B|/|A|."""
    sh = _shingle_projection(docs, id_col, text_col, shingle_n)
    cands = _shingle_candidates(sh, max_df)
    # dd4 discipline: per-doc distinct arrays + RAW sizes once, so the
    # per-pair work is one array_intersect over the smaller distinct
    # sets (array_intersect dedupes either way — identical integers) and
    # the divisors are carried columns, not per-pair size() calls.
    shd = sh.select("doc_id", F.array_distinct("sh").alias("shd"),
                    F.size("sh").alias("n"))
    # |A∩B| let-bound once per pair (NOTES fact #1): the inlined form
    # rebuilt the intersect hash set FOUR times per candidate pair (twice
    # in the pushed-down OR condition, twice in the surviving project).
    # The keep-predicate is bound as ONE lambda so the filter — which runs
    # on every candidate pair — costs exactly one intersect; the output
    # columns recompute it only for the (tiny) surviving set.
    inter = F.size(F.array_intersect("sha", "shb"))
    keep = F.element_at(
        F.transform(F.array(inter),
                    lambda i: (F.round(i / F.col("na"), 4) >= threshold)
                    | (F.round(i / F.col("nb"), 4) >= threshold)), 1)
    j = (cands
         .join(shd.select(F.col("doc_id").alias("doc_a"),
                          F.col("shd").alias("sha"),
                          F.col("n").alias("na")), "doc_a")
         .join(shd.select(F.col("doc_id").alias("doc_b"),
                          F.col("shd").alias("shb"),
                          F.col("n").alias("nb")), "doc_b")
         .where(keep)
         .select("doc_a", "doc_b",
                 F.round(inter / F.col("na"), 4).alias("c_ab"),
                 F.round(inter / F.col("nb"), 4).alias("c_ba")))
    return j


def cdc_chunk_hashes(wh: Column, k: int = 4, mask: int = 16) -> Column:
    """Content-defined chunking (Rabin-style CDC, the FastCDC/LBFS cut
    rule at word granularity): scan the k-word rolling hashes and cut a
    chunk boundary after every window whose hash is 0 mod `mask`; each
    chunk's id is the Horner fold of its word hashes. Returns the BIGINT
    chunk-hash array for one document.

    Content-defined means INSERT-STABLE: editing one sentence only
    re-chunks the window(s) it touches — every downstream chunk boundary
    re-synchronizes, unlike fixed-size chunking where one insertion
    shifts every later chunk. That is what makes chunk-level dedup catch
    quoted/patched near-copies that document-hash dedup (dd1) misses.

    Cut positions derive from `rolling_hashes_col` values (bit-identical
    in the DuckDB twin), so the chunking — not just the hashing — is
    cross-engine exact. Expected chunk length ~ mask + k - 1 words.
    Short docs (< k words) yield one whole-doc chunk.

    Every intermediate (word array, rolls, ends) is LET-BOUND through
    single-element transform lambdas (NOTES fact #1): the first cut of
    this function referenced `rolls` inside a filter lambda, which made
    Catalyst re-evaluate the whole O(n*k) rolling-hash expression PER
    WINDOW — O(n^2 k) per document, 106s for the sf0.1 suite query vs
    ~3s let-bound."""
    B, M = F.lit(ROLL_B), F.lit(ROLL_M)

    def fold_slice(w: Column, start: Column, ln: Column) -> Column:
        return F.aggregate(F.slice(w, start + 1, ln),
                           F.lit(0).cast("long"),
                           lambda acc, x: (acc * B + x) % M)

    def chunks_from(w: Column, e: Column) -> Column:
        def one(j: Column) -> Column:
            start = F.when(j == 1, F.lit(0)) \
                     .otherwise(F.element_at(e, (j - 1).cast("int")))
            ln = F.element_at(e, j.cast("int")) - start
            return fold_slice(w, start, ln)
        return F.transform(F.sequence(F.lit(1), F.size(e)), one)

    def ends_from(w: Column, rolls: Column) -> Column:
        n = F.size(w)
        cuts = F.filter(F.sequence(F.lit(0), F.size(rolls) - 1),
                        lambda i: F.element_at(rolls, i + 1) % mask == 0)
        ends0 = F.transform(cuts, lambda i: F.least(i + k, n))
        return F.when(
            (F.size(ends0) > 0)
            & (F.element_at(ends0, F.size(ends0)) == n),
            ends0).otherwise(F.concat(ends0, F.array(n)))

    def body(w: Column) -> Column:
        return F.element_at(F.transform(
            F.array(rolling_hashes_col(w, k=k)),
            lambda rolls: F.element_at(F.transform(
                F.array(ends_from(w, rolls)),
                lambda e: chunks_from(w, e)), 1)), 1)

    return F.element_at(F.transform(F.array(wh), body), 1)


def edit_distance_pairs(docs: DataFrame, k: int = 3, prefix_len: int = 8,
                        cap_len: int = 64, id_col: str = "doc_id",
                        text_col: str = "text") -> DataFrame:
    """Bounded-edit-distance near-dup pairs: the character-level dedup
    signal MinHash misses (single-typo mirrors, OCR one-off variants,
    boilerplate with one token swapped). Classic blocked ED-join shape
    (Gravano et al., VLDB 2001): candidates must share the normalized
    `prefix_len`-char prefix AND differ in length by <= k (both are
    NECESSARY conditions for edit distance <= k when edits sit past the
    prefix), then the O(len^2) Levenshtein verify runs ONLY on the
    blocked candidates, over the `cap_len`-char normalized prefix.

    Scale shape: blocking is one equi-join on the prefix key (hot
    prefixes are template clusters — cap upstream like dd3's
    max_bucket); the quadratic verify never sees unblocked pairs, and
    `cap_len` bounds the per-pair cost constant. Emits
    (id_a, id_b, dist) for dist <= k, id_a < id_b."""
    n = F.substring(normalize_text(F.col(text_col)), 1, cap_len)
    d = docs.select(F.col(id_col).alias("id"), n.alias("norm"),
                    F.length(n).alias("len"),
                    F.substring(n, 1, prefix_len).alias("blk"))
    a = d.select(F.col("id").alias("id_a"), F.col("norm").alias("norm_a"),
                 F.col("len").alias("len_a"), "blk")
    b = d.select(F.col("id").alias("id_b"), F.col("norm").alias("norm_b"),
                 F.col("len").alias("len_b"), "blk")
    cand = (a.join(b, "blk")
            .where((F.col("id_a") < F.col("id_b"))
                   & (F.abs(F.col("len_a") - F.col("len_b")) <= k)))
    return (cand.select("id_a", "id_b",
                        F.levenshtein("norm_a", "norm_b").cast("int")
                        .alias("dist"))
            .where(F.col("dist") <= k))


def dup_gram_mass(docs: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text", strata_col: str = "source",
                  shingle_n: int = 3) -> DataFrame:
    """Corpus-slice duplicate n-gram MASS — the aggregate the per-pair
    dedup operators (dd3/dd4/dd11) roll up to for pipeline monitoring:
    per stratum (source/crawl/snapshot), what fraction of all n-gram
    OCCURRENCES are repeats of an already-seen gram
    (dup_frac = (occurrences - distinct) / occurrences). Rising dup mass
    in a crawl slice is the canary for template explosions and crawler
    traps before any pair-level dedup runs.

    Exact integers until one final division (cross-engine determinism
    free). Scale shape: gram occurrences aggregate FIRST at
    (stratum, gram) with map-side combine — the classic two-phase
    count-distinct that absorbs hot-gram skew — then a stratum-cardinality
    rollup; the corpus is touched once, map-side."""
    g = docs.select(F.col(strata_col).alias("stratum"),
                    F.explode(shingles_col(F.col(text_col), shingle_n))
                    .alias("gram"))
    per_gram = g.groupBy("stratum", "gram").agg(
        F.count(F.lit(1)).alias("occ"))
    return (per_gram.groupBy("stratum")
            .agg(F.sum("occ").alias("n_occurrences"),
                 F.count(F.lit(1)).alias("n_distinct"))
            .select("stratum",
                    F.col("n_occurrences").cast("long")
                    .alias("n_occurrences"),
                    F.col("n_distinct").cast("long").alias("n_distinct"),
                    F.round((F.col("n_occurrences") - F.col("n_distinct"))
                            / F.col("n_occurrences"), 4)
                    .alias("dup_frac")))


def fuzzy_decontaminate(docs: DataFrame, is_eval: Column,
                        id_col: str = "doc_id", text_col: str = "text",
                        n_perm: int = 8, band_size: int = 2,
                        shingle_n: int = 3,
                        min_jaccard: float = 0.5) -> DataFrame:
    """Fuzzy benchmark decontamination: corpus documents NEAR-duplicating
    an eval-set document (MinHash-LSH candidates verified by true n-gram
    Jaccard >= min_jaccard) — the LSH analog of tx5's exact-gram overlap,
    and the form actually used on frontier-model corpora (a test item
    lightly paraphrased or truncated inside a crawl page slips an exact
    13-gram check; it does not slip a 0.5-Jaccard gate). Output:
    (doc_id, n_matches BIGINT, max_jaccard) per contaminated corpus doc.

    Scale shape (100 TB): this is NOT dd3's self-join — the eval set is
    tiny next to the corpus, so its banded signature table broadcasts
    and the corpus side streams through ONE map-side band projection +
    broadcast-hash probe; corpus docs never pair with each other and
    never shuffle. Verify volume is |hits| (eval-bounded), shipping full
    shingle arrays only for docs that hit. Same minhash family as dd3
    (md5 hex-min), so signatures are cross-engine bit-exact."""
    if n_perm % band_size:
        # not an assert: -O strips asserts and a bad band_size would
        # then silently build malformed band keys.
        raise ValueError("n_perm must be divisible by band_size")
    n_bands = n_perm // band_size
    sh = docs.select(F.col(id_col).alias("doc_id"), is_eval.alias("_ev"),
                     shingles_col(F.col(text_col), shingle_n).alias("sh")) \
             .localCheckpoint(eager=False)
    sig = sh.select("doc_id", "_ev", *minhash_sig_cols(F.col("sh"), n_perm))
    bands = sig.select(
        "doc_id", "_ev",
        F.explode(F.array(*[
            F.struct(F.lit(b).alias("band"),
                     F.concat_ws("|", *[F.col(f"mh{b * band_size + k}")
                                        for k in range(band_size)])
                     .alias("key"))
            for b in range(n_bands)])).alias("bk")) \
        .select("doc_id", "_ev", "bk.band", "bk.key")
    ev = bands.where(F.col("_ev")) \
              .select("band", "key", F.col("doc_id").alias("eval_id"))
    hits = (bands.where(~F.col("_ev"))
            .join(F.broadcast(ev), ["band", "key"])
            .select("doc_id", "eval_id").distinct())
    shd = sh.select("doc_id", F.array_distinct("sh").alias("shd")) \
            .withColumn("n", F.size("shd"))
    # let-bound |A∩B| (NOTES fact #1), same discipline as
    # ngram_jaccard_pairs: one hash-set build per (doc, eval) hit.
    jac = F.element_at(
        F.transform(F.array(F.size(F.array_intersect("sha", "shb"))),
                    lambda i: F.round(
                        i / (F.col("na") + F.col("nb") - i), 4)), 1)
    j = (hits
         .join(shd.select(F.col("doc_id"), F.col("shd").alias("sha"),
                          F.col("n").alias("na")), "doc_id")
         .join(shd.select(F.col("doc_id").alias("eval_id"),
                          F.col("shd").alias("shb"),
                          F.col("n").alias("nb")), "eval_id")
         .withColumn("jac", jac)
         .where(F.col("jac") >= min_jaccard))
    return (j.groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_matches"),
                 F.max("jac").alias("max_jaccard")))


def prefix_filter_pairs(docs: DataFrame, threshold: float = 0.5,
                        shingle_n: int = 3, id_col: str = "doc_id",
                        text_col: str = "text") -> DataFrame:
    """EXACT set-similarity self-join via prefix filtering (Chaudhuri et
    al. ICDE 2006 SSJoin; Xiao et al. WWW 2008 PPJoin): all pairs with
    true n-gram Jaccard >= threshold — same output as brute-force
    all-pairs, provably, but candidates come from a rarest-token prefix
    index instead of O(n²) comparisons or dd3's probabilistic LSH (which
    can MISS pairs; this cannot).

    The filter: order every doc's distinct shingles by global rarity
    (df asc, gram asc — one total order both for index and probe). If
    J(x,y) >= t then |x∩y| >= ceil(t·|x|), so the first
    |x| - ceil(t·|x|) + 1 grams of x and the corresponding prefix of y
    must share a gram (the shared-prefix lemma); indexing ONLY prefixes
    is therefore lossless. Generation runs at t - 1e-4 so pairs whose
    ROUNDED Jaccard crosses the threshold (the verify filter is
    round(j,4) >= t, dd4's contract) are still covered.

    Scale shape (100 TB): df ranking is one partial-agged gram rollup +
    a per-doc window; the candidate index holds only prefix grams
    (~(1-t)·corpus grams), and buckets are keyed by the RAREST grams by
    construction — the df-ordered prefix is the organic hot-bucket
    guard dd4's max_df cap approximates lossily (a stop-gram never
    lands in a prefix unless the doc is almost all stop-grams). Verify
    is the dd4 carried-size shape, volume ∝ candidates."""
    sh = _shingle_projection(docs, id_col, text_col, shingle_n)
    ex = sh.select("doc_id", F.explode("sh").alias("s"))
    dft = ex.groupBy("s").agg(F.count(F.lit(1)).alias("df"))
    from pyspark.sql import Window
    w = Window.partitionBy("doc_id").orderBy("df", "s")
    t_gen = threshold - 1e-4
    ranked = (ex.join(dft, "s")
              .withColumn("rk", F.row_number().over(w)))
    sizes = sh.select("doc_id", F.size("sh").alias("n"))
    prefix = (ranked.join(sizes, "doc_id")
              .where(F.col("rk") <=
                     F.col("n") - F.ceil(F.lit(t_gen) * F.col("n")) + 1)
              .select("doc_id", "s"))
    buckets = (prefix.groupBy("s")
               .agg(F.collect_list("doc_id").alias("ids"))
               .where(F.size("ids") >= 2))
    cands = (buckets.select(F.explode(_in_bucket_pairs(F.col("ids")))
                            .alias("p"))
             .select(F.col("p.doc_a").alias("doc_a"),
                     F.col("p.doc_b").alias("doc_b"))
             .distinct())
    shd = sh.select("doc_id", F.col("sh").alias("shd"),
                    F.size("sh").alias("n"))
    # |A∩B| let-bound once per pair (NOTES fact #1) — same fix as
    # ngram_jaccard_pairs: inlined, the pushed-down condition built the
    # intersect hash set twice per candidate pair.
    jac = F.element_at(
        F.transform(F.array(F.size(F.array_intersect("sha", "shb"))),
                    lambda i: F.round(
                        i / (F.col("na") + F.col("nb") - i), 4)), 1)
    return (cands
            .join(shd.select(F.col("doc_id").alias("doc_a"),
                             F.col("shd").alias("sha"),
                             F.col("n").alias("na")), "doc_a")
            .join(shd.select(F.col("doc_id").alias("doc_b"),
                             F.col("shd").alias("shb"),
                             F.col("n").alias("nb")), "doc_b")
            .withColumn("jaccard", jac)
            .where(F.col("jaccard") >= threshold)
            .select("doc_a", "doc_b", "jaccard"))


def dup_substring_runs(docs: DataFrame, k: int = 8, id_col: str = "doc_id",
                       h_col: str = "h") -> DataFrame:
    """Maximal cross-document repeated-substring RUNS per document — the
    interval-merge layer of exact-substring dedup (Lee et al. ACL 2022)
    on top of cross_doc_repeats' per-window signal: dd11 counts repeated
    k-word windows; this merges their [i, i+k-1] word intervals into
    maximal runs, which is what a dedup policy actually acts on ("drop
    documents whose longest shared passage exceeds 50 tokens", "cut the
    covered spans"). Output per doc: n_words, n_runs, covered_words
    (union of repeated-window intervals), longest_run_words, and
    dup_word_frac = covered / n_words.

    Two positions i < j belong to one run iff j <= i + k (their word
    intervals overlap or touch); the merge is a single left-to-right
    integer fold over the doc's SORTED repeated positions carrying
    (prev, n_runs, covered, run_len, max_run) — O(|positions|) per doc,
    exact BIGINT algebra, written as the identical 5-slot list fold in
    the DuckDB twin (list_reduce with a prepended init list, the dd15
    seeding trick). Coverage and longest run are capped at n_words for
    the short-doc whole-document window (dd11 semantics).

    Scale shape inherits cross_doc_repeats: one posexplode shuffle on the
    window hash with two-phase count_distinct, the (small) repeated-hash
    set joins back, then ONE per-doc rollup collecting only REPEATED
    positions (bounded by the doc's window count; collect_list here is a
    per-doc array of ints, not a corpus structure). The fold is map-side
    on the rolled-up row."""
    rolls = rolling_hashes_incremental(
        docs.select(id_col, h_col), k=k, h_col=h_col, out_col="rolls")
    e = (rolls.select(id_col, F.posexplode("rolls").alias("pos", "rh"))
         .localCheckpoint(eager=False))
    rep = (e.groupBy("rh")
           .agg(F.count_distinct(F.col(id_col)).alias("nd"))
           .where(F.col("nd") >= 2)
           .select("rh"))
    ps = (e.join(rep, "rh")
          .groupBy(id_col)
          .agg(F.sort_array(F.collect_list(F.col("pos").cast("long")))
               .alias("ps")))
    kl = F.lit(k).cast("long")
    init = F.array(F.lit(-(k + 1)).cast("long"), F.lit(0).cast("long"),
                   F.lit(0).cast("long"), F.lit(0).cast("long"),
                   F.lit(0).cast("long"))

    def step(acc, x):
        prev, runs = F.element_at(acc, 1), F.element_at(acc, 2)
        cov, rl = F.element_at(acc, 3), F.element_at(acc, 4)
        mx = F.element_at(acc, 5)
        new_run = x > prev + kl
        rl2 = F.when(new_run, kl).otherwise(rl + (x - prev))
        return F.array(x,
                       F.when(new_run, runs + 1).otherwise(runs),
                       F.when(new_run, cov + kl).otherwise(cov + (x - prev)),
                       rl2,
                       F.greatest(mx, rl2))

    folded = ps.select(id_col, F.aggregate("ps", init, step).alias("a"))
    base = docs.select(id_col,
                       F.size(F.col(h_col)).cast("long").alias("n_words"))
    j = base.join(folded, id_col, "left")
    runs = F.coalesce(F.element_at("a", 2), F.lit(0)).cast("long")
    cov = F.least(F.coalesce(F.element_at("a", 3), F.lit(0)).cast("long"),
                  F.col("n_words"))
    mx = F.least(F.coalesce(F.element_at("a", 5), F.lit(0)).cast("long"),
                 F.col("n_words"))
    return j.select(
        id_col, "n_words", runs.alias("n_runs"),
        cov.alias("covered_words"), mx.alias("longest_run_words"),
        F.round(cov / F.col("n_words"), 4).alias("dup_word_frac"))
