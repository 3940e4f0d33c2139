"""Byte-pair-encoding tokenizer training + encoding (tk1/tk2) — the
vocabulary-LEARNING step of an LLM data pipeline (ix4 assigns ids to a
fixed vocabulary; BPE derives the vocabulary from the corpus itself,
Sennrich et al. 2016).

Reference parity: the reference engine streams page text to downstream
consumers (scan.rs:40-62) and tokenizer training is the first job a
training-data consumer runs over that stream; at 100 TB the engine owns
it here, like the ix* index family.

Cross-engine exactness (the part that makes BPE hash-gateable): a
word's symbol sequence is rendered as a STRING with single-space ends
and double-space interior separators —

    "cat" -> " c  a  t "

and one merge step for pair (A, B) is the plain, left-to-right,
non-overlapping substring replace

    " A  B "  ->  " AB "

which consumes one space of each flanking separator and restores it, so
the format is self-preserving AND back-to-back merges in one pass are
exactly greedy BPE ("a a a a" -> "aa aa": the trailing single space of
one replacement is the leading space of the next candidate). Both Spark
`replace` and DuckDB `replace` share these substring semantics, so the
whole iterative training run is bit-identical across engines — no
regex, no lookaround (RE2 has none), no UDF. Symbol boundaries are
sound because pairs are matched with BOTH flanking spaces and words are
restricted to ^[a-z0-9]+$ (no spaces inside symbols).

Scale shape (the standard two-tier BPE layout): training never touches
the corpus after ONE (word -> frequency) shuffle — the k merge rounds
iterate over the word-VOCABULARY table (orders of magnitude below
corpus cardinality; ~10^6 rows at the 10^10-doc design point) with a
broadcast 1-row argmax joined per round and a lineage cut per
iteration. Encoding is map-side only: the k learned merges are a
k-row bounded collect embedded as literal chained replaces.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from crawler_spark.operators.invindex import tokens_col

WORD_RE = "^[a-z0-9]+$"


def symbolize_col(word):
    """word -> " c  h  a  r  s " (single-space ends, double-space
    interior) — the self-preserving merge format documented above."""
    return F.concat(F.lit(" "),
                    F.array_join(F.split(word, ""), "  "),
                    F.lit(" "))


def word_counts(docs: DataFrame, doc_id: str = "doc_id",
                text: str = "text") -> DataFrame:
    """(word, wcount, syms) over the corpus — the ONE corpus-wide
    shuffle of BPE training; everything after iterates on vocabulary
    cardinality."""
    return (docs.select(F.explode(tokens_col(F.col(text))).alias("word"))
            .where(F.col("word").rlike(WORD_RE))
            .groupBy("word")
            .agg(F.count(F.lit(1)).alias("wcount"))
            .withColumn("syms", symbolize_col(F.col("word"))))


def _pair_counts(vocab: DataFrame) -> DataFrame:
    """Weighted adjacent-pair counts over the symbolized vocabulary.
    Overlapping pairs count per occurrence (classic BPE), weight =
    corpus word frequency; partial-agged groupBy on (left, right)."""
    sl = F.split(F.trim(F.col("syms")), "  ")
    pairs = F.zip_with(F.slice(sl, 1, F.greatest(F.size(sl) - 1, F.lit(0))),
                       F.slice(sl, 2, F.greatest(F.size(sl) - 1, F.lit(0))),
                       lambda a, b: F.struct(a.alias("l"), b.alias("r")))
    return (vocab.select("wcount", F.explode(pairs).alias("p"))
            .groupBy(F.col("p.l").alias("left_sym"),
                     F.col("p.r").alias("right_sym"))
            .agg(F.sum("wcount").alias("pair_count")))


def _top1(pair_counts: DataFrame) -> DataFrame:
    """Deterministic argmax: count desc, (left, right) asc tie-break —
    a TakeOrdered over the pair table, never a global sort."""
    return (pair_counts
            .orderBy(F.desc("pair_count"), "left_sym", "right_sym")
            .limit(1))


def train_merges(docs: DataFrame, k: int = 6, doc_id: str = "doc_id",
                 text: str = "text") -> DataFrame:
    """Learn the top-k BPE merges: (merge_rank, left_sym, right_sym,
    pair_count), rank 0 first. Each round: pair count -> 1-row argmax
    broadcast -> self-preserving replace; localCheckpoint cuts the
    k-deep lineage (the iterative-algorithm idiom shared with dd7/g1).
    Requires a corpus rich enough that every round has >= 1 pair (a
    merge that empties the pair table would vanish from the output).

    Only the 1-row argmax is checkpointed per round (pinning it makes
    the whole lineage deterministic); the vocabulary itself is left
    lazy — re-deriving a vocab-cardinality chain of broadcast-join +
    replace from the single w0 checkpoint is cheaper than k
    materialization jobs."""
    vocab = word_counts(docs, doc_id, text).localCheckpoint(eager=True)
    out = []
    for rank in range(k):
        top = _top1(_pair_counts(vocab)).localCheckpoint(eager=True)
        out.append(top.withColumn("merge_rank",
                                  F.lit(rank).cast("long")))
        pat = F.concat(F.lit(" "), F.col("left_sym"), F.lit("  "),
                       F.col("right_sym"), F.lit(" "))
        rep = F.concat(F.lit(" "), F.col("left_sym"),
                       F.col("right_sym"), F.lit(" "))
        vocab = (vocab.crossJoin(F.broadcast(
                    top.select("left_sym", "right_sym")))
                 .withColumn("syms", F.replace("syms", pat, rep))
                 .select("word", "wcount", "syms"))
    merged = out[0]
    for t in out[1:]:
        merged = merged.unionByName(t)
    return merged.select("merge_rank", "left_sym", "right_sym",
                         "pair_count")


def n_syms_col(syms):
    """Symbol count from the format's space arithmetic: spaces = 2n
    (2 end singles + 2(n-1) interior doubles) -> n = spaces / 2, always
    exact — identical integer result cross-engine."""
    spaces = (F.length(syms)
              - F.length(F.replace(syms, F.lit(" "), F.lit(""))))
    return (spaces / 2).cast("long")


def encode_token_counts(docs: DataFrame, k: int = 6,
                        doc_id: str = "doc_id",
                        text: str = "text") -> DataFrame:
    """(doc_id, n_bpe_tokens): corpus encoded with the k merges learned
    from the SAME corpus. The merges are a k-row bounded collect (k is
    a constant, never data-proportional) embedded as literal chained
    replaces — the encode pass is pure map-side column algebra plus one
    partial-agged per-doc sum."""
    merges = sorted(
        ((r.merge_rank, r.left_sym, r.right_sym)
         for r in train_merges(docs, k, doc_id, text).collect()))
    words = (docs.select(F.col(doc_id).alias("doc_id"),
                         F.explode(tokens_col(F.col(text))).alias("word"))
             .where(F.col("word").rlike(WORD_RE)))
    syms = symbolize_col(F.col("word"))
    for _, l, r in merges:
        syms = F.replace(syms, F.lit(f" {l}  {r} "), F.lit(f" {l}{r} "))
    return (words.select("doc_id", n_syms_col(syms).alias("n"))
            .groupBy("doc_id")
            .agg(F.sum("n").alias("n_bpe_tokens")))


def encode_word_stats(docs: DataFrame, k: int = 6,
                      doc_id: str = "doc_id",
                      text: str = "text") -> DataFrame:
    """(doc_id, n_bpe_tokens, n_words, n_chars) over the alnum words —
    the per-doc raw sums tokenizer-fertility evaluation needs (tk3).
    Same merge embedding as `encode_token_counts`: k literal chained
    replaces, map-side, one partial-agged per-doc aggregate."""
    merges = sorted(
        ((r.merge_rank, r.left_sym, r.right_sym)
         for r in train_merges(docs, k, doc_id, text).collect()))
    words = (docs.select(F.col(doc_id).alias("doc_id"),
                         F.explode(tokens_col(F.col(text))).alias("word"))
             .where(F.col("word").rlike(WORD_RE)))
    syms = symbolize_col(F.col("word"))
    for _, l, r in merges:
        syms = F.replace(syms, F.lit(f" {l}  {r} "), F.lit(f" {l}{r} "))
    return (words.select("doc_id", F.length("word").alias("wl"),
                         n_syms_col(syms).alias("n"))
            .groupBy("doc_id")
            .agg(F.sum("n").alias("n_bpe_tokens"),
                 F.count(F.lit(1)).cast("long").alias("n_words"),
                 F.sum("wl").cast("long").alias("n_chars")))


def oov_rate(docs: DataFrame, v: int = 16, holdout_permille: int = 50,
             doc_id: str = "doc_id", text_col: str = "text",
             by_col: str = "lang") -> DataFrame:
    """Held-out OOV rate of a frequency-capped word vocabulary — the
    coverage audit run before fixing a tokenizer's vocab size (the
    word-level complement to tk3's fertility: fertility says how many
    subwords a word costs, OOV says how many word OCCURRENCES a top-`v`
    vocab misses entirely). Per `by_col` group on the held-out slice:
    (n_words BIGINT, n_oov BIGINT, oov_rate).

    Methodology matters and is pinned: the vocabulary is fit on the
    TRAIN slice only (tx9's content-stable md5 coin, `holdout_permille`
    out of 1000 held out), ranked by (count desc, word asc) — measuring
    OOV on the same data that chose the vocab would bias the rate down.

    Scale shape (100 TB): the split coin is map-side; train word counts
    are ONE partial-agged shuffle; top-v is TakeOrderedAndProject over
    the word-cardinality table (never a global sort of the corpus); the
    v-row vocab broadcasts onto the held-out word stream, so the
    measurement side never shuffles words at all — one group-cardinality
    rollup ends it."""
    key = F.concat(F.col("source"), F.lit("/"),
                   F.col(doc_id).cast("string"))
    coin = (F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("long")
            % 1000 < holdout_permille)
    w = docs.select(F.col(by_col).alias("grp"), coin.alias("_val"),
                    F.explode(F.filter(
                        F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
                        lambda t: t != "")).alias("word"))
    vocab = (w.where(~F.col("_val"))
             .groupBy("word").agg(F.count(F.lit(1)).alias("c"))
             .orderBy(F.desc("c"), "word").limit(v)
             .select("word", F.lit(1).alias("_in")))
    return (w.where(F.col("_val"))
            .join(F.broadcast(vocab), "word", "left")
            .groupBy("grp")
            .agg(F.count(F.lit(1)).cast("long").alias("n_words"),
                 F.sum(F.when(F.col("_in").isNull(), 1).otherwise(0))
                 .cast("long").alias("n_oov"))
            .select(F.col("grp").alias(by_col), "n_words", "n_oov",
                    F.round(F.col("n_oov") / F.col("n_words"), 4)
                    .alias("oov_rate")))
