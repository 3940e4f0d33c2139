"""Corpus-statistics language-model quality scoring (tx10).

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

from pyspark.sql import DataFrame, functions as F


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
