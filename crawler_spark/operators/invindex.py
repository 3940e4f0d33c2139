"""Distributed inverted-index build + conjunctive retrieval (ix1/ix2).

The search-index layer a crawl corpus feeds (reference parity: the
reference engine hands pages to downstream indexers via gRPC streaming —
scan.rs:40-62 — and never builds the index itself; at 100 TB the index
build IS the dominant downstream job, so the engine owns it here).

Build shape (the textbook two-phase MapReduce index, expressed
declaratively so Catalyst keeps both aggregations partial):

  explode(tokens)                       -- map-side, narrow
  -> groupBy(term, doc_id).count()      -- shuffle 1: tf, partial-agged
  -> groupBy(term).agg(df, postings)    -- shuffle 2: term-cardinality

Both shuffles carry partial aggregation (map-side combine absorbs the
Zipf term skew before the wire: a stop-word's per-partition counts
collapse to one row per task per term). Postings are kept VERIFIABLE,
not opaque: the per-term digest is md5 over the doc_id-sorted
"doc:tf" string, which DuckDB reproduces exactly — so the driver's hash
gate pins the full postings content, not just the term stats.

At the 10^10-doc design point the term dictionary is Zipf: the groupBy
keys are (term, doc_id) first — no single reducer sees a stop-word's
full posting list until it has been combined to one row per doc — and
the final term-level agg handles the head terms with AQE skew splitting.
Output is term-cardinality (~millions), 4-5 orders below corpus rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def tokens_col(text):
    """Lowercased whitespace tokens, empties dropped — the shared
    tokenizer contract with the DuckDB twin (split on \\s+ over trimmed
    text, lower). Punctuation stays attached: normalization choices are
    an index consumer's policy, determinism is the gate's requirement."""
    return F.filter(F.split(F.lower(F.trim(text)), r"\s+"),
                    lambda t: t != "")


def build_index(docs: DataFrame, doc_id: str = "doc_id",
                text: str = "text") -> DataFrame:
    """(doc_id, text) -> (term, df, total_tf, max_tf, postings_md5):
    one row per vocabulary term with document frequency, corpus term
    frequency, the max single-document tf, and the md5 digest of the
    doc_id-ascending "doc:tf doc:tf ..." postings string."""
    tf = (docs.select(F.col(doc_id).alias("doc_id"),
                      F.explode(tokens_col(F.col(text))).alias("term"))
          .groupBy("term", "doc_id")
          .agg(F.count(F.lit(1)).alias("tf")))
    posting = F.array_join(
        F.transform(
            F.array_sort(F.collect_list(F.struct("doc_id", "tf"))),
            lambda s: F.concat(s.getField("doc_id").cast("string"),
                               F.lit(":"),
                               s.getField("tf").cast("string"))), " ")
    return (tf.groupBy("term")
            .agg(F.count(F.lit(1)).alias("df"),
                 F.sum("tf").alias("total_tf"),
                 F.max("tf").alias("max_tf"),
                 F.md5(posting).alias("postings_md5")))


def conjunctive_search(docs: DataFrame, terms: list[str],
                       doc_id: str = "doc_id",
                       text: str = "text") -> DataFrame:
    """Boolean AND retrieval over the index: documents containing ALL
    query terms, ranked by summed tf (desc, doc_id asc tie-break).
    Returns (doc_id, score, n_terms).

    Scale shape: the postings fragments for the |q| query terms are
    selected FIRST (an IN filter the scan pushes down after the explode
    — at index-serving time this is a key lookup, not a corpus scan),
    then one partial-agged groupBy(doc_id) counts matched terms; the
    HAVING count = |q| is the intersection. No join against the query
    set is needed at all — the literal IN list ships with the task."""
    q = [t.lower() for t in terms]
    tf = (docs.select(F.col(doc_id).alias("doc_id"),
                      F.explode(tokens_col(F.col(text))).alias("term"))
          .where(F.col("term").isin(q))
          .groupBy("doc_id", "term")
          .agg(F.count(F.lit(1)).alias("tf")))
    return (tf.groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_terms"),
                 F.sum("tf").alias("score"))
            .where(F.col("n_terms") == len(q))
            .select("doc_id", "score", "n_terms"))
