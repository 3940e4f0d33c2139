"""Corpus-statistics LM scoring (operators/langmodel.py, tx10/tx12) —
hand-computed goldens on a corpus small enough to do the arithmetic."""

from __future__ import annotations

import math

from crawler_spark.operators.langmodel import bigram_logprob, unigram_logprob


def _docs(spark):
    return spark.createDataFrame(
        [(1, "a b c"), (2, "a c"), (3, "x")],
        "doc_id long, text string")


def test_unigram_logprob_golden(spark):
    # counts: a=2, b=1, c=2, x=1; N=6
    got = {r.doc_id: r for r in unigram_logprob(_docs(spark)).collect()}
    ln = math.log
    want1 = (ln(6 / 2) + ln(6 / 1) + ln(6 / 2)) / 3
    want2 = (ln(6 / 2) + ln(6 / 2)) / 2
    want3 = ln(6 / 1)
    assert got[1].n_words == 3 and abs(got[1].neg_logprob - want1) < 5e-5
    assert got[2].n_words == 2 and abs(got[2].neg_logprob - want2) < 5e-5
    assert got[3].n_words == 1 and abs(got[3].neg_logprob - want3) < 5e-5


def test_bigram_logprob_golden(spark):
    # bigram instances: d1 -> "a b", "b c"; d2 -> "a c".
    # c12: each 1. heads: a=2, b=1.
    # d1: [-ln(1/2), -ln(1/1)] -> avg ln2/2; d2: [-ln(1/2)] -> ln2.
    got = {r.doc_id: r for r in bigram_logprob(_docs(spark)).collect()}
    assert set(got) == {1, 2}  # single-word doc 3 has no bigrams
    assert got[1].n_bigrams == 2
    assert abs(got[1].neg_logprob - math.log(2) / 2) < 5e-5
    assert got[2].n_bigrams == 1
    assert abs(got[2].neg_logprob - math.log(2)) < 5e-5


def test_bigram_sees_word_order_unigram_cannot(spark):
    """The tx12 design claim: scrambling word order preserves the unigram
    score but raises the bigram score (rarer transitions)."""
    fluent = " ".join(["the cat sat on the mat"] * 8)
    words = fluent.split()
    # deterministic scramble that breaks every original adjacency pattern
    scrambled = " ".join(words[::2] + words[1::2])
    df = spark.createDataFrame(
        [(1, fluent), (2, scrambled)], "doc_id long, text string")
    uni = {r.doc_id: r.neg_logprob for r in unigram_logprob(df).collect()}
    big = {r.doc_id: r.neg_logprob for r in bigram_logprob(df).collect()}
    assert abs(uni[1] - uni[2]) < 5e-4          # same bag of words
    assert big[2] > big[1]                       # order damage visible
