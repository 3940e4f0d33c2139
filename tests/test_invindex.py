"""Inverted index build + conjunctive retrieval (operators/invindex.py,
driver queries ix1/ix2): postings pinned against a hand-computed corpus,
retrieval pinned against a per-document recount."""

from __future__ import annotations

import hashlib
from collections import Counter

from pyspark.sql import functions as F  # noqa: F401  (session fixture import parity)

from crawler_spark.operators.invindex import (
    build_index, conjunctive_search, phrase_search, vocab_ids,
)

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


def _phrase(spark, corpus, phrase):
    df = spark.createDataFrame(corpus, "doc_id long, text string")
    return {r.doc_id: r.n_occurrences
            for r in phrase_search(df, phrase).collect()}


def test_phrase_search_order_matters(spark):
    got = _phrase(spark, [(1, "new york city"), (2, "york new haven"),
                          (3, "brand New  YORK")],
                  ["new", "york"])
    # conjunctive AND would admit doc 2; phrase search must not
    assert got == {1: 1, 3: 1}


def test_phrase_search_counts_overlapping_occurrences(spark):
    # "a b a" at starts 0 and 2 of doc 1 share the middle "a"
    got = _phrase(spark, [(1, "a b a b a"), (2, "a b b a")],
                  ["a", "b", "a"])
    assert got == {1: 2}


def test_phrase_search_duplicate_token_phrase(spark):
    # the coverage count must not double-credit a position that matches
    # two phrase offsets of the same token
    got = _phrase(spark, [(1, "x x x"), (2, "x y x"), (3, "x")],
                  ["x", "x"])
    assert got == {1: 2}


def test_vocab_ids_dense_df_ordered(spark):
    idx = build_index(_df(spark))
    got = {r.term: (r.df, r.term_id)
           for r in vocab_ids(idx, n_parts=3).collect()}
    order = sorted(_expected_index().items(),
                   key=lambda kv: (-kv[1][0], kv[0]))
    expected = {term: (v[0], i) for i, (term, v) in enumerate(order)}
    assert got == expected


def test_vocab_ids_partition_count_invariant(spark):
    idx = build_index(_df(spark))
    a = {(r.term, r.term_id) for r in vocab_ids(idx, n_parts=1).collect()}
    b = {(r.term, r.term_id) for r in vocab_ids(idx, n_parts=7).collect()}
    assert a == b


def test_postings_gap_stats_hand_counts(spark):
    """Gaps/varint bytes pinned by hand: term 'a' in docs 0,3,10 ->
    gaps (1,3,7) = 1 varint byte each; raw = 3*8."""
    from crawler_spark.operators.invindex import postings_gap_stats
    rows = [(0, "a b"), (3, "a"), (10, "a"), (200, "c " * 40)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["term"]: r for r in postings_gap_stats(df).collect()}
    a = got["a"]
    assert (a["df"], a["max_gap"], a["varint_bytes"], a["raw_bytes"]) \
        == (3, 7, 3, 24)
    assert a["ratio"] == 0.125
    b = got["b"]
    assert (b["df"], b["max_gap"], b["varint_bytes"]) == (1, 1, 1)
    # 'c' repeats 40x in ONE doc: df counts documents, not occurrences,
    # and the first-gap encoding is doc_id + 1 = 201 -> 8 bits -> 2 bytes
    c = got["c"]
    assert (c["df"], c["max_gap"], c["varint_bytes"], c["raw_bytes"]) \
        == (1, 201, 2, 8)


def test_proximity_rank_known_spans(spark):
    from crawler_spark.operators.invindex import proximity_rank
    docs = spark.createDataFrame(
        [(1, "a b x c"),            # cover a..c = 4 (b at 1)
         (2, "a x x b c x a b"),    # best window: a b c? positions a0 b3 c4 -> 5; a6 b7 c4 -> c4..b7=4
         (3, "c b a"),              # adjacent any order -> 3
         (4, "a b a b"),            # no c -> excluded
         (5, "x y z")],             # no hits -> excluded
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           proximity_rank(docs, ["a", "b", "c"]).collect()}
    assert set(out) == {1, 2, 3}
    assert out[1]["best_window"] == 4
    assert out[2]["best_window"] == 4
    assert out[3]["best_window"] == 3
    assert out[3]["n_hits"] == 3
    assert out[2]["n_hits"] == 5


def test_proximity_rank_duplicate_query_terms_collapse(spark):
    from crawler_spark.operators.invindex import proximity_rank
    docs = spark.createDataFrame([(1, "a x a")], "doc_id long, text string")
    out = proximity_rank(docs, ["a", "A", "a"]).collect()
    assert len(out) == 1 and out[0]["best_window"] == 1


def test_rrf_fusion_hand_ranks(spark):
    from crawler_spark.operators.invindex import rrf_fusion
    lex = spark.createDataFrame(
        [(1, 9.0), (2, 7.0), (3, 5.0)], "doc_id long, score double")
    den = spark.createDataFrame(
        [(2, 0.9), (4, 0.8)], "doc_id long, score double")
    out = {r["doc_id"]: r for r in
           rrf_fusion([lex, den], k_list=2).collect()}
    # k_list=2 truncates doc 3 out of the lexical run entirely
    assert set(out) == {1, 2, 4}
    assert (out[1]["r0"], out[1]["r1"]) == (1, -1)
    assert (out[2]["r0"], out[2]["r1"]) == (2, 1)
    assert (out[4]["r0"], out[4]["r1"]) == (-1, 2)
    assert out[2]["rrf"] == round(1.0 / 62 + 1.0 / 61, 6)
    assert out[1]["rrf"] == round(1.0 / 61, 6)


def test_rrf_fusion_tie_breaks_on_id(spark):
    from crawler_spark.operators.invindex import rrf_fusion
    run = spark.createDataFrame(
        [(5, 1.0), (3, 1.0), (4, 1.0)], "doc_id long, score double")
    out = {r["doc_id"]: r["r0"] for r in
           rrf_fusion([run], k_list=3).collect()}
    assert out == {3: 1, 4: 2, 5: 3}


def test_champion_search_salted_equals_unsalted(spark):
    """The salted two-phase top-r selects exactly the unsalted per-term
    top-r (containment argument), across partitionings."""
    from crawler_spark.operators.invindex import champion_search
    rows = [(i, ("hot " * (i % 7 + 1)) + ("cold " * (1 if i % 3 else 2)))
            for i in range(60)]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    a = sorted((r["doc_id"], r["score"], r["n_champ"]) for r in
               champion_search(d, ["hot", "cold"], r=5,
                               n_salt=1).collect())
    b = sorted((r["doc_id"], r["score"], r["n_champ"]) for r in
               champion_search(d.repartition(7), ["hot", "cold"], r=5,
                               n_salt=16).collect())
    assert a == b and len(a) > 0


def test_champion_search_r_bounds_and_ties(spark):
    """r=2, three docs tied on tf -> the two smallest doc_ids win."""
    from crawler_spark.operators.invindex import champion_search
    d = spark.createDataFrame(
        [(3, "z z"), (1, "z z"), (2, "z z"), (4, "z")],
        "doc_id long, text string")
    out = sorted((r["doc_id"], r["score"]) for r in
                 champion_search(d, ["z"], r=2).collect())
    assert out == [(1, 2), (2, 2)]


def test_proximity_search_semantics(spark):
    """NEAR/k goldens: counts every qualifying (pa, pb) pair once
    (bucket expansion must not double-count), min distance exact,
    docs with only one of the terms excluded, k boundary inclusive."""
    from crawler_spark.operators.invindex import proximity_search
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma alpha delta beta"),   # a@0,3  b@1,5
         (2, "alpha x x x x x x x x x beta"),        # dist 10 > k
         (3, "alpha only here"),
         (4, "beta alone"),
         (5, "alpha beta alpha beta")],              # dense overlaps
        "doc_id long, text string")
    out = {r["doc_id"]: (r["n_pairs"], r["min_dist"]) for r in
           proximity_search(docs, "alpha", "beta", k=3).collect()}
    # doc1 pairs within 3: (0,1) d1, (3,1) d2, (3,5) d2 -> 3 pairs, min 1
    assert out[1] == (3, 1)
    assert 2 not in out and 3 not in out and 4 not in out
    # doc5 a@0,2 b@1,3: pairs d1,d3,d1,d1 all <=3 -> 4 pairs min 1
    assert out[5] == (4, 1)
    # boundary: distance exactly k is included
    d = spark.createDataFrame([(9, "alpha x x beta")],
                              "doc_id long, text string")
    r = proximity_search(d, "alpha", "beta", k=3).collect()[0]
    assert (r["n_pairs"], r["min_dist"]) == (1, 3)


def test_vsm_cosine_matches_hand_computation(spark):
    """Cosine equals the direct tf-idf computation (smooth idf) on a
    3-doc corpus, and docs without any query term are absent."""
    import math
    from crawler_spark.operators.invindex import vsm_cosine
    corpus = {1: "a b a c", 2: "b b d", 3: "e e e"}
    rows = [(k, v) for k, v in corpus.items()]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["cosine"]
           for r in vsm_cosine(d, ["a", "b"]).collect()}
    n = len(corpus)
    tf = {k: {} for k in corpus}
    for k, v in corpus.items():
        for w in v.split():
            tf[k][w] = tf[k].get(w, 0) + 1
    df = {}
    for k in corpus:
        for w in tf[k]:
            df[w] = df.get(w, 0) + 1
    idf = {w: math.log((n + 1) / (c + 1)) + 1 for w, c in df.items()}
    qn = math.sqrt(idf["a"] ** 2 + idf["b"] ** 2)
    want = {}
    for k in corpus:
        wts = {w: tf[k][w] * idf[w] for w in tf[k]}
        dot = sum(wts.get(w, 0.0) * idf[w] for w in ("a", "b"))
        if dot > 0:
            dn = math.sqrt(sum(x * x for x in wts.values()))
            want[k] = round(dot / (dn * qn), 4)
    assert got == want and 3 not in got


def test_vsm_cosine_self_similarity_tops(spark):
    """A doc that IS the query ranks above docs that merely contain
    the query terms among others."""
    from crawler_spark.operators.invindex import vsm_cosine
    d = spark.createDataFrame(
        [(1, "x y"), (2, "x y p q r s t u v w"), (3, "x p p p")],
        "doc_id long, text string")
    got = {r["doc_id"]: r["cosine"] for r in vsm_cosine(d, ["x", "y"]).collect()}
    assert got[1] > got[2] > got[3]


def test_wand_bounds_dominate_every_posting(spark):
    """The defining WAND property: every posting's actual BM25
    contribution is <= its term's precomputed upper bound, and the
    bound is attained by some posting."""
    import math
    from crawler_spark.operators.invindex import wand_upper_bounds
    docs = [(1, "a b a c"), (2, "a a a a a b"), (3, "c d d"),
            (4, "b c d a")]
    d = spark.createDataFrame(docs, "doc_id long, text string")
    ub = {r["term"]: r for r in wand_upper_bounds(d).collect()}

    toks = {i: t.split() for i, t in docs}
    n = len(docs)
    avgdl = sum(len(w) for w in toks.values()) / n
    contrib = {}
    for i, ws in toks.items():
        for t in set(ws):
            tf = ws.count(t)
            c = tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * len(ws) / avgdl))
            dfc = sum(1 for w in toks.values() if t in w)
            idf = math.log(1.0 + (n - dfc + 0.5) / (dfc + 0.5))
            contrib.setdefault(t, []).append(idf * c)
    for t, cs in contrib.items():
        assert ub[t]["df"] == len(cs)
        # ub is round(·, 4): dominance and attainment hold to half an ulp
        # of the rounding grid (Spark's HALF_UP vs Python's bankers can
        # differ exactly on the grid, NOTES round-4 gotcha #1)
        assert abs(max(cs) - ub[t]["ub_bm25"]) <= 5e-5, t
        assert all(c <= ub[t]["ub_bm25"] + 5e-5 for c in cs)


def test_ndcg_uniform_relevance_is_one(spark):
    """When every candidate has the same relevance grade, any ranking is
    ideal: NDCG@r must be exactly 1.0 at every rank."""
    from crawler_spark.operators.invindex import ndcg_at_k
    rows = [(i, "spark " + " ".join(f"w{i}x{j}" for j in range(i + 1)))
            for i in range(8)]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    out = ndcg_at_k(d, ("spark", "merge"), k=5).collect()
    assert len(out) == 5
    assert all(r.ndcg == 1.0 for r in out)
    assert all(r.rel == 1 for r in out)
    dcgs = [r.dcg for r in sorted(out, key=lambda r: r.rnk)]
    assert dcgs == sorted(dcgs)  # running DCG is non-decreasing


def test_ndcg_matches_python_reference(spark):
    """Mixed-relevance corpus: replicate the full DCG/IDCG arithmetic in
    Python over the operator's own BM25 ordering and compare every rank
    (tests the NDCG math independent of what order BM25 happens to
    produce)."""
    import math
    from pyspark.sql import functions as F
    from crawler_spark.functions.text import bm25_scores
    from crawler_spark.operators.invindex import ndcg_at_k
    terms = ("spark", "merge")
    rows = [(0, "spark merge " + " ".join(f"f{j}" for j in range(80)))]
    rows += [(i, f"spark s{i}a s{i}b") for i in (1, 2, 3)]
    rows += [(9, "merge merge merge merge merge m9a")]  # rel 1, tf-saturated
    d = spark.createDataFrame(rows, "doc_id long, text string")
    bm = {r.doc_id: r.bm25
          for r in bm25_scores(d, F.col("text"), terms).collect()}
    rel = {i: len(set(t.split()) & set(terms)) for i, t in rows}
    order = sorted(bm, key=lambda i: (-bm[i], i))
    ideal = sorted(bm, key=lambda i: (-rel[i], i))
    gain = lambda i: (1 << rel[i]) - 1  # noqa: E731
    want = {}
    dcg = idcg = 0.0
    for r, (a, b) in enumerate(zip(order, ideal), start=1):
        dcg += gain(a) / math.log2(r + 1)
        idcg += gain(b) / math.log2(r + 1)
        want[r] = (a, rel[a], round(dcg, 4), round(dcg / idcg, 4))
    got = {r.rnk: (r.doc_id, r.rel, r.dcg, r.ndcg)
           for r in ndcg_at_k(d, terms, k=5).collect()}
    assert set(got) == set(range(1, 6))
    for r in got:
        assert got[r][:2] == want[r][:2], r
        assert abs(got[r][2] - want[r][2]) < 2e-4, r
        assert abs(got[r][3] - want[r][3]) < 2e-4, r
    # the mixed grades must actually exercise a non-trivial NDCG < 1
    assert any(got[r][3] < 1.0 for r in got)
