"""Corpus-statistics language-model quality scoring (tx10 unigram,
tx12 bigram conditional).

CCNet (Wenzek et al., LREC 2020) ranks crawl documents by KenLM perplexity;
the deterministic, dependency-free analog over the corpus's OWN statistics
is the unigram negative log-probability: score(d) = mean over word
instances w∈d of -ln(c(w) / N), where c(w) is the corpus-wide count and N
the corpus word total. Low = stereotypical text, high = rare/garbled —
the same filtering axis CCNet's head/middle/tail buckets cut on.

Scale shape (100 TB): the frequency table is ONE partial-agg shuffle on
word (map-side combine absorbs Zipf head words); scoring is a second
shuffle joining word instances to their counts, then an even-keyed per-doc
rollup. At 10^12 words, broadcast the top-V head of the frequency table
(it covers ~95% of instances) and fold it map-side, shuffling only the
tail — the exact two-shuffle form here is the oracle contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def bigram_logprob(docs: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """(id, text) -> (id, n_bigrams, neg_logprob): the word-ORDER axis tx10
    cannot see. neg_logprob = round(mean -ln(P(w2|w1)), 4) over the doc's
    bigram instances, with P(w2|w1) = c(w1 w2) / c(w1·) from this corpus
    (c(w1·) counts w1 as a bigram head, so rows sum to a proper conditional).
    Shuffled text keeps its tx10 score but spikes here — the n-gram LM
    fluency signal (CCNet's KenLM axis, order 2). Docs with < 2 words have
    no bigram instances and drop out (score undefined), as in the oracle.

    Scale shape: bigram generation is a map-side HOF (one sequence/transform
    per row, no Python); then two partial-agg shuffles (bigram counts, head
    counts) and two joins back. The bigram vocabulary is ~10x unigram's but
    Zipf-headed the same way — at 10^12 words broadcast the head table and
    shuffle only the tail, exactly as tx10's docstring prescribes."""
    w = docs.select(id_col,
                    F.split(F.trim(F.col(text_col)), r"\s+").alias("w"))
    # sequence(1, 0) would be DESCENDING [1, 0] — guard short docs to [].
    idx = F.when(F.size("w") >= 2,
                 F.sequence(F.lit(1), F.size("w") - 1)
                 ).otherwise(F.array().cast("array<int>"))
    bigram = F.transform(
        idx, lambda i: F.concat(F.element_at(F.col("w"), i), F.lit(" "),
                                F.element_at(F.col("w"), i + 1)))
    bg = w.select(id_col, F.explode(bigram).alias("bigram"))
    c12 = bg.groupBy("bigram").agg(F.count("*").alias("c12"))
    heads = (bg.select(F.substring_index("bigram", " ", 1).alias("w1"))
             .groupBy("w1").agg(F.count("*").alias("c1")))
    scored = (bg.join(c12, "bigram")
              .withColumn("w1", F.substring_index("bigram", " ", 1))
              .join(heads, "w1"))
    return (scored.groupBy(id_col)
            .agg(F.count("*").alias("n_bigrams"),
                 F.round(F.avg(F.log("c1") - F.log("c12")), 4)
                  .alias("neg_logprob")))


def kneser_ney_logprob(docs: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text",
                       discount: float = 0.75) -> DataFrame:
    """Interpolated Kneser-Ney bigram scoring (Kneser & Ney 1995; Chen &
    Goodman 1999 eq. 4.24, the standard smoothing for n-gram LMs):
    (id, text) -> (id, n_bigrams, kn_neg_logprob) with

        P(w2|w1) = (c(w1 w2) - D) / c(w1·)
                 + (D · N1+(w1 ·) / c(w1·)) · (N1+(· w2) / T)

    where N1+(w1 ·) = distinct continuations of w1, N1+(· w2) = distinct
    predecessors of w2, and T = distinct bigram types. The continuation
    probability is KN's insight over tx12's raw conditional: "Francisco"
    has high unigram count but follows almost nothing except "San" — its
    continuation mass is tiny, so novel contexts back off toward words
    that appear in MANY contexts, not merely frequent ones. Every scored
    bigram is observed (the corpus scores itself) so c12 >= 1 > D and
    the max(·,0) clip is vacuous — written without it, identically in
    the DuckDB twin.

    Scale shape (tx12's, plus two distinct-count rollups): map-side HOF
    bigram generation; c12/heads/predecessor tables are partial-agged
    shuffles at bigram-type cardinality; T is ONE broadcast scalar. The
    count-distinct aggs are two-phase (Expand + partial) — never a
    corpus-wide distinct(). All inputs to the per-instance double
    expression are exact BIGINTs, and the expression tree is written
    identically in both engines (IEEE ops on identical doubles), so only
    the avg's summation order floats — absorbed by round-4, the tx12
    precedent."""
    w = docs.select(id_col,
                    F.split(F.trim(F.col(text_col)), r"\s+").alias("w"))
    idx = F.when(F.size("w") >= 2,
                 F.sequence(F.lit(1), F.size("w") - 1)
                 ).otherwise(F.array().cast("array<int>"))
    bigram = F.transform(
        idx, lambda i: F.concat(F.element_at(F.col("w"), i), F.lit(" "),
                                F.element_at(F.col("w"), i + 1)))
    bg = w.select(id_col, F.explode(bigram).alias("bigram"))
    w1 = F.substring_index("bigram", " ", 1)
    w2 = F.substring_index("bigram", " ", -1)
    c12 = bg.groupBy("bigram").agg(F.count("*").cast("long").alias("c12"))
    heads = (bg.select(w1.alias("w1"), w2.alias("_w2"))
             .groupBy("w1")
             .agg(F.count("*").cast("long").alias("c1"),
                  F.countDistinct("_w2").cast("long").alias("n1f")))
    preds = (bg.select(w2.alias("w2"), w1.alias("_w1"))
             .groupBy("w2")
             .agg(F.countDistinct("_w1").cast("long").alias("n1b")))
    types = c12.agg(F.count(F.lit(1)).cast("long").alias("t"))
    d = F.lit(float(discount))
    p = ((F.col("c12") - d) / F.col("c1")
         + (d * F.col("n1f") / F.col("c1"))
         * (F.col("n1b") / F.col("t").cast("double")))
    scored = (bg.join(c12, "bigram")
              .withColumn("w1", w1).withColumn("w2", w2)
              .join(heads, "w1").join(preds, "w2")
              .crossJoin(F.broadcast(types)))
    return (scored.groupBy(id_col)
            .agg(F.count("*").cast("long").alias("n_bigrams"),
                 F.round(F.avg(-F.log(p)), 4).alias("kn_neg_logprob")))


def unigram_logprob(docs: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """(id, text) -> (id, n_words, neg_logprob) where neg_logprob =
    round(mean -ln(c(w)/N), 4) over the doc's word instances, with c/N from
    this corpus. Whitespace word split — same convention as tx1-tx3."""
    w = docs.select(id_col,
                    F.explode(F.split(F.trim(F.col(text_col)), r"\s+"))
                    .alias("word"))
    freq = w.groupBy("word").agg(F.count("*").alias("c"))
    tot = freq.agg(F.sum("c").cast("double").alias("n_total"))
    scored = w.join(freq, "word").crossJoin(F.broadcast(tot))
    return (scored.groupBy(id_col)
            .agg(F.count("*").alias("n_words"),
                 F.round(F.avg(F.log("n_total") - F.log("c")), 4)
                  .alias("neg_logprob")))


def dsir_logweights(docs: DataFrame, is_target, id_col: str = "doc_id",
                    text_col: str = "text", buckets: int = 64) -> DataFrame:
    """DSIR importance weights (Xie et al., NeurIPS 2023 — Data Selection
    via Importance Resampling): score every raw document by how much more
    likely its hashed-unigram bag is under the TARGET domain's word
    distribution than under the raw corpus's own:

        logweight(d) = Σ_{word w ∈ d} ln p_tgt(b(w)) - ln p_raw(b(w))

    with b(w) = md5-derived bucket (hashed n-gram features, the paper's
    trick to keep the feature space fixed at `buckets` regardless of
    vocabulary), Laplace +1 smoothing, p = (c+1)/(N+B). `is_target` is a
    boolean Column marking the in-domain exemplar slice (e.g. wiki-like
    pages); the raw distribution is the whole input. Positive = more
    target-like. Feed the weights to px4's Gumbel top-k
    (operators/sampling.weighted_sample) for the actual resample —
    this operator is the weight model.

    Scale shape (100 TB): word explode is map-side; bucket counts for BOTH
    distributions come out of ONE partial-agged shuffle (conditional agg,
    B rows out); the B-row log-ratio dim broadcasts back onto the exploded
    words; per-doc sum is one even-keyed doc shuffle. Two shuffles total,
    no driver materialization.
    """
    b = float(buckets)
    w = docs.select(id_col, is_target.alias("_tgt"),
                    F.explode(F.split(F.trim(F.col(text_col)), r"\s+"))
                     .alias("word"))
    bkt = F.pmod(F.conv(F.substring(F.md5("word"), 1, 8), 16, 10)
                  .cast("long"), F.lit(buckets))
    wb = w.select(id_col, "_tgt", bkt.alias("bkt"))
    cnt = (wb.groupBy("bkt")
           .agg(F.count("*").alias("c_raw"),
                F.sum(F.when(F.col("_tgt"), 1).otherwise(0)).alias("c_tgt")))
    tot = cnt.agg(F.sum("c_raw").cast("double").alias("n_raw"),
                  F.sum("c_tgt").cast("double").alias("n_tgt"))
    lr = (cnt.crossJoin(F.broadcast(tot))
          .select("bkt",
                  (F.log((F.col("c_tgt") + 1) / (F.col("n_tgt") + b))
                   - F.log((F.col("c_raw") + 1) / (F.col("n_raw") + b)))
                  .alias("lr")))
    return (wb.join(F.broadcast(lr), "bkt")
            .groupBy(id_col)
            .agg(F.count("*").cast("long").alias("n_words"),
                 F.round(F.sum("lr"), 4).alias("logweight")))


def ngram_novelty(docs: DataFrame, n: int = 3, id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """Per-document n-gram novelty: what fraction of a document's
    distinct word n-grams appear in NO other document — the
    memorization/boilerplate axis (Lee et al. 2022 "Deduplicating
    Training Data Makes Language Models Better" measure near-dup damage
    through exactly this repeated-n-gram lens; Carlini et al. 2023 use
    corpus n-gram frequency as the memorization-risk proxy). Low
    novelty = templated/duplicated text that inflates memorization;
    the px1-style gates compose it as a keep predicate.

    Output: (id, n_grams, n_novel, novelty) where n_grams counts the
    doc's DISTINCT n-grams, n_novel those with corpus df == 1, and
    novelty = round(n_novel / n_grams, 4). Docs shorter than n words
    contribute their whole text as one gram (the shingles_from_words
    contract, shared with dd3/dd4).

    Scale shape (100 TB): grams are per-doc DISTINCT before they ever
    hit the wire (array_distinct map-side — a boilerplate line repeated
    1000x inside one doc is one row); df is ONE partial-agged shuffle
    on gram; the join back to (doc, gram) is the same equi-shuffle
    reused by Catalyst (both sides hash on gram). Per-doc rollup is an
    even doc_id-keyed agg. No driver state, no window, no skew hazard
    beyond the Zipf gram head that map-side combine absorbs.
    See textdedup.shingles_from_words for the gram contract."""
    from crawler_spark.operators.textdedup import words_col, \
        shingles_from_words
    bound = F.transform(F.array(words_col(F.col(text_col))),
                        lambda w: shingles_from_words(w, n))
    grams = docs.select(F.col(id_col).alias("_id"),
                        F.explode(F.element_at(bound, 1)).alias("gram"))
    df = grams.groupBy("gram").agg(F.count(F.lit(1)).alias("_df"))
    return (grams.join(df, "gram")
            .groupBy("_id")
            .agg(F.count(F.lit(1)).cast("long").alias("n_grams"),
                 F.sum((F.col("_df") == 1).cast("long")).cast("long")
                  .alias("n_novel"))
            .select(F.col("_id").alias(id_col), "n_grams", "n_novel",
                    F.round(F.col("n_novel") / F.col("n_grams"), 4)
                     .alias("novelty")))


def calibration_buckets(df: DataFrame, score: Column, label: Column,
                        n_buckets: int = 10,
                        scale: int = 1000) -> DataFrame:
    """Reliability diagram for a quality classifier — the calibration
    check an ML-ops pipeline runs before trusting a score as a keep
    probability: scores bucketed into `n_buckets` equal bins, each
    reporting its size, mean predicted score, and observed positive
    rate. A calibrated scorer has mean_score ~ frac_pos per bucket.

    Hash-gate discipline: the score is integerized ONCE
    (floor(score*scale) — both engines compute it on the identical
    double, so the bucket assignment is consistent even at binary-
    representation edges), per-bucket sums are exact BIGINTs, and each
    output double is one division + round(4). Scale shape: one map-side
    projection + ONE partial-agged rollup at bucket cardinality."""
    sm = F.floor(score * scale).cast("long")
    b = F.least(F.lit(n_buckets - 1),
                F.floor((sm * n_buckets) / F.lit(float(scale)))) \
         .cast("int")
    return (df.select(b.alias("bucket"), sm.alias("_sm"),
                      label.cast("int").alias("_y"))
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum("_sm").alias("_ssm"),
                 F.sum("_y").alias("_sy"))
            .select("bucket", "n",
                    F.round(F.col("_ssm") / (F.col("n") * float(scale)), 4)
                    .alias("mean_score"),
                    F.round(F.col("_sy") / F.col("n"), 4)
                    .alias("frac_pos")))


def auc_ranksum(df: DataFrame, score: Column, label: Column,
                scale: int = 1000) -> DataFrame:
    """ROC-AUC of a classifier score against a boolean label, computed
    distributively via the Mann-Whitney rank-sum identity:

        AUC = (R_pos - n_pos(n_pos+1)/2) / (n_pos * n_neg)

    where R_pos is the sum of the positives' ranks under midrank tie
    handling. The discrimination twin of calibration_buckets: calibration
    asks "does 0.7 mean 70%?", AUC asks "do positives outrank negatives
    at all?" — the ML-ops pair every quality scorer (tx2/tx17) passes
    before it gates corpus admission.

    Hash-gate discipline: the score is integerized once
    (floor(score*scale)); with ties at score s (count c, cumulative count
    below f) the midrank is f + (c+1)/2, so 2*R_pos = sum cp*(2f + c + 1)
    is an exact BIGINT; AUC is a single integer-ratio division + round(4).

    Scale shape (100 TB): one partial-agged rollup to DISTINCT-SCORE
    cardinality (<= scale+1 rows by construction — resolution-bounded,
    not data-bounded), then a window + final agg over that tiny table.
    The single-partition window is by design: its input can never exceed
    scale+1 rows regardless of corpus size."""
    sm = F.floor(score * scale).cast("long")
    # coalesce pins the NULL-label convention to the oracle's CASE
    # semantics (NULL -> 0 = negative): without it a group of all-NULL
    # labels yields cp=NULL and sum(c-cp) silently drops its rows from
    # n_neg while DuckDB counts them.
    g = (df.select(sm.alias("sm"),
                   F.coalesce(label.cast("long"), F.lit(0)).alias("_y"))
         .groupBy("sm")
         .agg(F.count(F.lit(1)).alias("c"), F.sum("_y").alias("cp")))
    w = Window.orderBy("sm").rowsBetween(Window.unboundedPreceding, -1)
    r = g.withColumn("f", F.coalesce(F.sum("c").over(w), F.lit(0)))
    agg = r.agg(
        F.sum(F.col("cp") * (2 * F.col("f") + F.col("c") + 1)).alias("r2"),
        F.sum("cp").alias("npos"),
        F.sum(F.col("c") - F.col("cp")).alias("nneg"))
    return agg.select(
        F.col("npos").cast("long").alias("n_pos"),
        F.col("nneg").cast("long").alias("n_neg"),
        F.round((F.col("r2") - F.col("npos") * (F.col("npos") + 1))
                / (2.0 * F.col("npos") * F.col("nneg")), 4).alias("auc"))


def average_precision(df: DataFrame, score: Column, label: Column,
                      id_col: str = "doc_id", scale: int = 1000,
                      n_blocks: int = 32) -> DataFrame:
    """Average precision (the area under the precision-recall curve a
    retrieval/filtering stack actually reports when positives are rare
    — AUC (a11) saturates near 1.0 on imbalanced corpora, AP does not):

        AP = (1/P) Σ_{positives i}  (rank_among_positives_i / rank_i)

    under the DETERMINISTIC total order (score desc, id asc) — ties
    resolved by id on both engines, so the value is a pure function of
    the data (no midrank convention needed).

    Scale shape (100 TB): both ranks are `global_rank`'s distributed
    block-prefix shape (block-local windows + one n_blocks-row offset
    table broadcast back) — NEVER the single-task unpartitioned
    `row_number() OVER (ORDER BY score)`; the final rollup is one
    scalar agg. Output: (n_pos BIGINT, avg_precision)."""
    from crawler_spark.operators.sampling import global_rank

    sm = F.floor(score * scale).cast("long")
    # Materialize the 3-column projection ONCE: global_rank fans its
    # input into several plan branches (block sampling, local rank,
    # offset counts), and Catalyst re-evaluates the caller's `score`
    # expression — often a heavy let-bound fold — in every branch
    # (NOTES fact #1). Measured 12.7s -> ~2s at sf0.1 on the tx2 score.
    base = df.select(F.col(id_col).alias("_id"), sm.alias("_sm"),
                     label.cast("int").alias("_y")) \
             .localCheckpoint(eager=True)
    g = global_rank(base, [F.col("_sm"), F.col("_id")],
                    n_blocks=n_blocks, out_col="_gr",
                    desc=[True, False])
    pos = g.where(F.col("_y") == 1)
    p = global_rank(pos, [F.col("_gr")], n_blocks=n_blocks,
                    out_col="_pr")
    return p.agg(
        F.count(F.lit(1)).cast("long").alias("n_pos"),
        F.round(F.sum(F.col("_pr") / F.col("_gr")) / F.count(F.lit(1)), 4)
        .alias("avg_precision"))


def brier_decomposition(df: DataFrame, score: Column, label: Column,
                        n_buckets: int = 10,
                        scale: int = 1000) -> DataFrame:
    """Brier score with the Murphy (1973) decomposition — the third leg
    of the classifier-eval suite (a10 calibration / a11 discrimination /
    a12 ranking): brier = reliability - resolution + uncertainty +
    within-bucket variance, over the same `n_buckets` score bins as the
    a10 reliability diagram. Reliability isolates miscalibration (how
    far each bin's mean score sits from its observed positive rate),
    resolution rewards bins that separate from the base rate, and
    uncertainty is the irreducible base-rate term — the triage a quality
    scorer needs before px4/tx8 trust it as a keep-probability (a bad
    Brier from reliability is fixable by recalibration; one from
    resolution is not). Classic Murphy assumes the score is constant
    within a bin; with real (continuous) scores two correction terms
    make the identity EXACT: the within-bucket score variance and twice
    the within-bucket score-label covariance —

        brier = reliability - resolution + uncertainty
                + within_var - within_cov

    (tests assert it to rounding tolerance on a fixture with non-trivial
    within-bucket structure).

    Hash-gate discipline: the score integerizes once (floor(score*scale),
    the a10 bucket contract; NULL labels pin to 0 per the a11
    convention); per-bucket (n, ssm, sy, ssq, sbr) are exact BIGINTs.
    The cross-bucket reductions are sums of <= n_buckets doubles folded
    in EXPLICIT bucket-ascending order (array_sort + aggregate here,
    list(... ORDER BY) + list_reduce in the twin; IEEE left-folds from
    identical per-bucket doubles are bit-identical, and 0.0 + x == x
    seeds the two folds equally), so round(4) sits on bit-equal values.

    Scale shape (100 TB): ONE partial-agged rollup at bucket cardinality
    (<= n_buckets rows regardless of corpus size), a broadcast 1-row
    scalar join onto that tiny table, and a <= n_buckets-element fold.
    The corpus is touched exactly once, map-side."""
    sm = F.floor(score * scale).cast("long")
    y = F.coalesce(label.cast("long"), F.lit(0))
    b = F.least(F.lit(n_buckets - 1),
                F.floor((sm * n_buckets) / F.lit(float(scale)))) \
         .cast("int")
    bk = (df.select(b.alias("bucket"), sm.alias("_sm"), y.alias("_y"))
          .groupBy("bucket")
          .agg(F.count(F.lit(1)).alias("n"),
               F.sum("_sm").alias("ssm"),
               F.sum("_y").alias("sy"),
               F.sum(F.col("_sm") * F.col("_sm")).alias("ssq"),
               F.sum((F.col("_sm") - scale * F.col("_y"))
                     * (F.col("_sm") - scale * F.col("_y"))).alias("sbr"),
               F.sum(F.col("_sm") * F.col("_y")).alias("ssmy")))
    # global aliases avoid bk's per-bucket "n": Spark resolves column
    # names case-insensitively, so "N" vs "n" would be AMBIGUOUS_REFERENCE
    g = bk.agg(F.sum("n").alias("gn"), F.sum("sy").alias("gsy"),
               F.sum("sbr").alias("gsbr"))
    dd = (F.col("ssm") - scale * F.col("sy")).cast("double")
    e = F.col("sy") / F.col("n") - F.col("gsy") / F.col("gn")
    terms = (bk.crossJoin(F.broadcast(g))
             .select("bucket", "gn", "gsy", "gsbr",
                     (dd * dd / F.col("n")).alias("tk"),
                     (e * e * F.col("n")).alias("rk"),
                     (F.col("ssq")
                      - F.col("ssm").cast("double") * F.col("ssm")
                      / F.col("n")).alias("wk"),
                     (F.col("ssmy")
                      - F.col("ssm").cast("double") * F.col("sy")
                      / F.col("n")).alias("ck")))

    def _fold(col):
        return F.aggregate(
            F.array_sort(F.collect_list(F.struct("bucket", col))),
            F.lit(0.0), lambda acc, x: acc + x.getField(col))

    agg = terms.groupBy("gn", "gsy", "gsbr").agg(
        _fold("tk").alias("tt"), _fold("rk").alias("rr"),
        _fold("wk").alias("ww"), _fold("ck").alias("cc"))
    s2 = float(scale) * scale
    return agg.select(
        F.col("gn").cast("long").alias("n_docs"),
        F.round(F.col("gsbr") / (F.col("gn") * s2), 4).alias("brier"),
        F.round(F.col("tt") / (F.col("gn") * s2), 4).alias("reliability"),
        F.round(F.col("rr") / F.col("gn"), 4).alias("resolution"),
        F.round((F.col("gsy") / F.col("gn"))
                * ((F.col("gn") - F.col("gsy")) / F.col("gn")), 4)
        .alias("uncertainty"),
        F.round(F.col("ww") / (F.col("gn") * s2), 4).alias("within_var"),
        # covariance denominator is N*scale (one factor of p, one of y)
        F.round(2.0 * F.col("cc") / (F.col("gn") * float(scale)), 4)
        .alias("within_cov"))


GOPHER_STOPS = ("the", "a", "of", "to", "and")


def gopher_gates(docs: DataFrame, by_col: str = "source",
                 text_col: str = "text") -> DataFrame:
    """Gopher rule-based quality filter breakdown (Rae et al. 2021,
    App. A — the rule set MassiveText shipped and every crawl pipeline
    since has copied): per `by_col` slice, how many documents each rule
    kills and how many survive all of them. tx2 gives one blended score;
    a pipeline operator needs the PER-RULE kill rates to tune thresholds
    (a source where the word-length band kills 40% is OCR garbage; one
    where the stop-word rule kills 40% is non-English leakage).

    Rules (the fixture-computable core of the paper's list):
      len:    50 <= word count <= 100,000
      wlen:   mean word length in [3, 10] — integerized as
              3n <= sum(len(word)) <= 10n over the word array itself
              (NOT inferred from length(trim(text)), which inflates
              under whitespace runs), exact on both engines
      alpha:  >= 80% of words contain only alphabetic chars
              (10*n_alpha >= 8*n — no division)
      stop:   >= 2 distinct stop words present

    All-integer outputs (counts only), so the hash gate is exact with
    no rounding discipline at all. Scale shape: ONE let-bound fold per
    row (split evaluated once — sibling columns would re-split per
    rule, NOTES fact #1) + one group-cardinality partial-agged rollup."""
    w = F.filter(F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
                 lambda t: t != "")
    nc = F.length(F.trim(F.col(text_col)))

    def gates(wa):
        return F.struct(
            F.size(wa).alias("n"),
            F.size(F.filter(wa, lambda x: x.rlike("^[a-z]+$")))
            .alias("na"),
            F.size(F.array_intersect(
                F.array_distinct(wa),
                F.array(*[F.lit(s) for s in GOPHER_STOPS]))).alias("ns"),
            # summed word lengths from the word array itself — NOT
            # length(trim(text)) - (n-1), which over-counts whenever
            # words are separated by runs of spaces/newlines/tabs
            # (ubiquitous in crawl text) and misclassifies docs against
            # Rae et al.'s mean-word-length band (r4 ADVICE).
            F.aggregate(wa, F.lit(0).cast("long"),
                        lambda a, x: a + F.length(x).cast("long"))
            .alias("wl"))

    st = F.element_at(F.transform(F.array(w), gates), 1)
    d = docs.select(F.col(by_col).alias("grp"), nc.alias("nc"),
                    st.alias("g"))
    n, na, ns = F.col("g.n"), F.col("g.na"), F.col("g.ns")
    chars = F.col("g.wl")
    fail_len = ~((n >= 50) & (n <= 100000))
    fail_wl = ~((chars >= 3 * n) & (chars <= 10 * n))
    fail_alpha = ~(10 * na >= 8 * n)
    fail_stop = ~(ns >= 2)
    one = lambda c: F.sum(F.when(c, 1).otherwise(0)).cast("long")  # noqa: E731
    return (d.groupBy("grp")
            .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
                 one(fail_len).alias("n_fail_len"),
                 one(fail_wl).alias("n_fail_wordlen"),
                 one(fail_alpha).alias("n_fail_alpha"),
                 one(fail_stop).alias("n_fail_stop"),
                 one(~(fail_len | fail_wl | fail_alpha | fail_stop))
                 .alias("n_keep"))
            .withColumnRenamed("grp", by_col))
