"""Inverted index build + conjunctive retrieval (operators/invindex.py,
driver queries ix1/ix2): postings pinned against a hand-computed corpus,
retrieval pinned against a per-document recount."""

from __future__ import annotations

import hashlib
from collections import Counter

from pyspark.sql import functions as F  # noqa: F401  (session fixture import parity)

from crawler_spark.operators.invindex import build_index, conjunctive_search

CORPUS = [
    (1, "the cat sat on the mat"),
    (2, "the dog ate the cat food"),
    (3, "CAT Cat cat"),                      # casefolding + tf 3
    (4, "  leading   and trailing   "),      # ragged whitespace
    (5, "unique"),
]


def _df(spark):
    return spark.createDataFrame(CORPUS, "doc_id long, text string")


def _expected_index():
    tf: dict[str, Counter] = {}
    for doc_id, text in CORPUS:
        for tok in text.lower().split():
            tf.setdefault(tok, Counter())[doc_id] += 1
    out = {}
    for term, c in tf.items():
        postings = " ".join(f"{d}:{c[d]}" for d in sorted(c))
        out[term] = (len(c), sum(c.values()), max(c.values()),
                     hashlib.md5(postings.encode()).hexdigest())
    return out


def test_build_index_matches_hand_count(spark):
    got = {r.term: (r.df, r.total_tf, r.max_tf, r.postings_md5)
           for r in build_index(_df(spark)).collect()}
    assert got == _expected_index()


def test_conjunctive_search_is_exact_intersection(spark):
    got = {r.doc_id: (r.score, r.n_terms)
           for r in conjunctive_search(_df(spark), ["the", "CAT"]).collect()}
    # docs containing BOTH "the" and "cat": 1 and 2 (doc 3 lacks "the")
    assert got == {1: (3, 2), 2: (3, 2)}   # doc1: the*2+cat, doc2: the*2+cat


def test_conjunctive_search_empty_when_any_term_missing(spark):
    assert conjunctive_search(_df(spark), ["cat", "nosuchterm"]) \
        .count() == 0
