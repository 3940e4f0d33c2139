"""Unit/property tests for the text-dedup primitives (the oracle-gate
queries check cross-engine value equality; these pin the *semantic*
properties the operators are chosen for)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crawler_spark.operators.textdedup import (
    rolling_hashes_col, shingles_col, word_hashes_col,
)


def _rolls(spark, texts, k=4):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "id long, text string")
    h = df.select("id", word_hashes_col(F.col("text")).alias("h"))
    out = h.select("id", rolling_hashes_col(F.col("h"), k).alias("r")).collect()
    return {r["id"]: list(r["r"]) for r in out}


def test_rolling_hash_shift_robustness(spark):
    """The winnowing property: prepending words only ADDS windows — every
    window of the original text survives verbatim (contrast a whole-doc
    hash, which changes completely). This is what makes rolling fingerprints
    usable for near-dup detection under insertions."""
    base = "the quick brown fox jumps over the lazy dog again and again"
    shifted = "breaking news today " + base
    r = _rolls(spark, [base, shifted])
    assert set(r[0]) <= set(r[1])
    assert len(set(r[1]) - set(r[0])) <= 4      # only windows crossing the seam


def test_rolling_hash_short_doc_single_window(spark):
    r = _rolls(spark, ["one two three"], k=4)   # < k words
    assert len(r[0]) == 1


def test_incremental_rolling_equals_refold(spark):
    """The O(n)-per-doc incremental Rabin-Karp scan (mapInPandas, the
    large-k scale path) is bit-identical to the column-algebra per-window
    re-fold across k values and edge shapes: short docs (< k words), docs
    of exactly k words, empty text, and a mixed batch — same recurrence
    mod M, so same values, and the tx4 oracle stays valid for either."""
    from crawler_spark.operators.textdedup import rolling_hashes_incremental

    texts = [
        "the quick brown fox jumps over the lazy dog again and again",
        "one two three",                       # < k for k >= 4
        "a b c d",                             # exactly 4 words
        "",                                    # empty text
        " ".join(f"w{i % 7}" for i in range(200)),   # long, repetitive
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "id long, text string")
    h = df.select("id", word_hashes_col(F.col("text")).alias("h"))
    for k in (2, 4, 16, 50):
        col = {r["id"]: list(r["r"]) for r in
               h.select("id", rolling_hashes_col(F.col("h"), k).alias("r"))
               .collect()}
        inc = {r["rid"]: list(r["rolls"]) for r in
               rolling_hashes_incremental(
                   h.select(F.col("id").alias("rid"), "h"), k=k).collect()}
        assert inc == col, f"k={k}"


def test_incremental_rolling_chunked_equals_unchunked(spark):
    """The skew guard (length-sorted chunking under cell_budget) must not
    change values: a tiny budget that forces one-row chunks — including a
    long outlier among short docs, the scenario the guard exists for —
    yields bit-identical output to the whole-batch dense path."""
    from crawler_spark.operators.textdedup import rolling_hashes_incremental

    texts = ["a b c d e", "x y", " ".join(f"w{i}" for i in range(500)),
             "", "p q r s t u v"]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "id long, text string")
    h = df.select("id", word_hashes_col(F.col("text")).alias("h"))
    big = {r["id"]: list(r["rolls"]) for r in
           rolling_hashes_incremental(h, k=4).collect()}
    tiny = {r["id"]: list(r["rolls"]) for r in
            rolling_hashes_incremental(h, k=4, cell_budget=8).collect()}
    assert tiny == big


def test_shingles_contract(spark):
    df = spark.createDataFrame([(0, "a b c d"), (1, "a b")],
                               "id long, text string")
    got = {r["id"]: list(r["s"]) for r in
           df.select("id", shingles_col(F.col("text"), 3).alias("s")).collect()}
    assert got[0] == ["a b c", "b c d"]
    assert got[1] == ["a b"]                    # short doc: whole-text shingle


def _jacc_py(a_grams, b_grams):
    i = len(a_grams & b_grams)
    return round(i / (len(a_grams) + len(b_grams) - i), 4)


def test_ngram_jaccard_hot_shingle_cap(spark):
    """The max_df guard: a boilerplate sentence shared by every doc must not
    turn the corpus into all-pairs candidates. With threshold=0 the operator
    returns every co-bucketed pair, so the pair count IS the fan-out."""
    from crawler_spark.operators.textdedup import ngram_jaccard_pairs

    boiler = "all rights reserved terms of service apply to this site"
    rows = [(f"d{i:02d}", f"{boiler} unique{i}a unique{i}b unique{i}c")
            for i in range(30)]
    # one engineered near-dup pair sharing non-boilerplate grams
    rows.append(("nd1", "alpha beta gamma delta epsilon zeta eta"))
    rows.append(("nd2", "alpha beta gamma delta epsilon zeta theta"))
    docs = spark.createDataFrame(rows, "doc_id string, text string")

    uncapped = ngram_jaccard_pairs(docs, threshold=0.0, max_df=None).count()
    capped = ngram_jaccard_pairs(docs, threshold=0.0, max_df=8)
    got = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in capped.collect()}

    # 30 boilerplate docs are all-pairs without the cap (plus the nd pair)
    assert uncapped >= 30 * 29 // 2
    # with df cap 8 the hot grams vanish; only the engineered pair survives
    assert set(got) == {("nd1", "nd2")}
    # and its value is the TRUE Jaccard over the full shingle sets
    # (verification ignores the df cap; candidates found via rare grams)
    a = {"alpha beta gamma", "beta gamma delta", "gamma delta epsilon",
         "delta epsilon zeta", "epsilon zeta eta"}
    b = {"alpha beta gamma", "beta gamma delta", "gamma delta epsilon",
         "delta epsilon zeta", "epsilon zeta theta"}
    assert got[("nd1", "nd2")] == _jacc_py(a, b)


def test_ngram_jaccard_cap_never_inflates(spark):
    """Regression: under a df-filtered Jaccard, two mostly-boilerplate docs
    sharing ONE rare gram scored 1/1 = 1.0. With two-stage semantics the
    rare gram only nominates the candidate; the verified value is the true
    Jaccard over the full sets — far below any dedup threshold."""
    from crawler_spark.operators.textdedup import ngram_jaccard_pairs

    boiler = " ".join(f"w{i}" for i in range(40))       # 38 hot 3-grams
    rows = [(f"b{i:02d}", f"{boiler} rare_shared_gram_a gram_b gram_c")
            if i < 2 else (f"b{i:02d}", boiler)
            for i in range(10)]
    docs = spark.createDataFrame(rows, "doc_id string, text string")

    out = {(r["doc_a"], r["doc_b"]): r["jaccard"]
           for r in ngram_jaccard_pairs(docs, threshold=0.0,
                                        max_df=5).collect()}
    # b00/b01 share the rare tail -> candidate; but their true overlap is
    # dominated by boilerplate, so jaccard must be high ONLY because the
    # docs genuinely are near-identical (they are: same 43-gram set)
    assert ("b00", "b01") in out and out[("b00", "b01")] == 1.0
    # now make the two rare-tailed docs otherwise DIFFERENT: the pair must
    # score its true (low) similarity, not 1.0
    rows2 = [("x1", " ".join(f"u{i}" for i in range(40))
              + " rare_shared gram_p gram_q"),
             ("x2", " ".join(f"v{i}" for i in range(40))
              + " rare_shared gram_p gram_q")]
    # make each doc's unique grams hot via 5 clones so only the shared
    # tail grams stay under the df cap
    for c in range(6):
        rows2 += [(f"x1c{c}", " ".join(f"u{i}" for i in range(40))),
                  (f"x2c{c}", " ".join(f"v{i}" for i in range(40)))]
    docs2 = spark.createDataFrame(rows2, "doc_id string, text string")
    out2 = {(r["doc_a"], r["doc_b"]): r["jaccard"]
            for r in ngram_jaccard_pairs(docs2, threshold=0.0,
                                         max_df=5).collect()}
    assert ("x1", "x2") in out2
    assert out2[("x1", "x2")] < 0.2, \
        f"df-filtered inflation returned {out2[('x1', 'x2')]}"


def test_line_dedup_removes_cross_doc_boilerplate(spark):
    """dd9 semantics on a hand-built corpus: a line shared by 2+ docs is
    removed from EVERY doc (including all its copies), unique lines survive
    in original order, and a doc reduced to nothing still emits a row."""
    import hashlib
    from crawler_spark.operators.textdedup import line_dedup

    rows = [
        (0, ["alpha beta", "cookie banner", "gamma delta"]),
        (1, ["cookie banner", "epsilon zeta"]),
        (2, ["cookie banner"]),              # fully scrubbed
        (3, ["unique only line"]),
    ]
    df = spark.createDataFrame(rows, "doc_id long, lines array<string>")
    out = {r["doc_id"]: r for r in line_dedup(df).collect()}

    assert [out[i]["n_lines"] for i in range(4)] == [3, 2, 1, 1]
    assert [out[i]["n_kept"] for i in range(4)] == [2, 1, 0, 1]
    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()
    assert out[0]["clean_md5"] == md5("alpha beta\ngamma delta")  # order kept
    assert out[1]["clean_md5"] == md5("epsilon zeta")
    assert out[2]["clean_md5"] == md5("")
    assert out[3]["clean_md5"] == md5("unique only line")


def test_line_dedup_threshold(spark):
    """max_docs=2 keeps lines shared by exactly 2 docs."""
    from crawler_spark.operators.textdedup import line_dedup
    rows = [(0, ["shared two", "a"]), (1, ["shared two", "b"]),
            (2, ["tri"]), (3, ["tri"]), (4, ["tri"])]
    df = spark.createDataFrame(rows, "doc_id long, lines array<string>")
    out = {r["doc_id"]: r["n_kept"]
           for r in line_dedup(df, max_docs=2).collect()}
    assert out == {0: 2, 1: 2, 2: 0, 3: 0, 4: 0}


def test_doc_lines_col_chunking(spark):
    """8-word chunks, casefolded, whitespace-robust; empty text -> []."""
    from crawler_spark.operators.textdedup import doc_lines_col
    w17 = " ".join(f"W{i}" for i in range(17))
    df = spark.createDataFrame([(0, w17), (1, "  "), (2, "one two")],
                               "doc_id long, text string")
    out = {r["doc_id"]: r["l"]
           for r in df.select("doc_id",
                              doc_lines_col(F.col("text")).alias("l"))
                      .collect()}
    assert out[0] == [" ".join(f"w{i}" for i in range(8)),
                      " ".join(f"w{i}" for i in range(8, 16)), "w16"]
    assert out[1] == []
    assert out[2] == ["one two"]


def test_cross_doc_repeats_short_doc_whole_window(spark):
    """Docs shorter than k get ONE whole-doc window (the rolling_hashes_col
    contract) — and two identical short docs flag each other as repeats.
    Pins the n_windows fast path against the fold semantics."""
    from crawler_spark.operators.textdedup import cross_doc_repeats
    import pyspark.sql.functions as F
    df = spark.createDataFrame(
        [(1, [5, 6, 7]), (2, [5, 6, 7]), (3, list(range(20)))],
        "doc_id long, h array<long>")
    got = {r.doc_id: r for r in cross_doc_repeats(df, k=8).collect()}
    assert (got[1].n_windows, got[1].n_rep_windows, got[1].rep_frac) \
        == (1, 1, 1.0)
    assert (got[2].n_windows, got[2].n_rep_windows) == (1, 1)
    assert (got[3].n_windows, got[3].n_rep_windows, got[3].rep_frac) \
        == (13, 0, 0.0)


def test_containment_asymmetric_prefix_embedding(spark):
    """A doc that is a strict prefix of a longer doc has c_ab = 1.0 (all of
    A's shingles appear in B) while c_ba < 1 — the asymmetric pair Jaccard
    misses; unrelated docs produce no pair."""
    from crawler_spark.operators.textdedup import containment_pairs
    a = " ".join(f"w{i}" for i in range(20))
    b = a + " " + " ".join(f"x{i}" for i in range(40))
    c = " ".join(f"z{i}" for i in range(30))
    docs = spark.createDataFrame(
        [(1, a), (2, b), (3, c)], "doc_id long, text string")
    got = {(r.doc_a, r.doc_b): (r.c_ab, r.c_ba)
           for r in containment_pairs(docs, threshold=0.8).collect()}
    assert set(got) == {(1, 2)}
    c_ab, c_ba = got[(1, 2)]
    assert c_ab == 1.0          # A fully contained in B
    assert c_ba < 0.5           # but B is mostly not A


def test_containment_identical_docs_symmetric(spark):
    from crawler_spark.operators.textdedup import containment_pairs
    t = " ".join(f"w{i}" for i in range(15))
    docs = spark.createDataFrame(
        [(1, t), (2, t)], "doc_id long, text string")
    r = containment_pairs(docs, threshold=0.8).collect()
    assert len(r) == 1 and r[0].c_ab == 1.0 and r[0].c_ba == 1.0


def _cdc_reference(wh: list[int], k: int = 4, mask: int = 16) -> list[int]:
    """Brute-force CDC chunker matching cdc_chunk_hashes' contract."""
    B, M = 69069, 2147483647

    def fold(xs):
        acc = 0
        for x in xs:
            acc = (acc * B + x) % M
        return acc

    n = len(wh)
    rolls = ([fold(wh[i:i + k]) for i in range(n - k + 1)]
             if n >= k else [fold(wh)])
    ends = [min(i + k, n) for i, r in enumerate(rolls) if r % mask == 0]
    if not ends or ends[-1] != n:
        ends.append(n)
    out, prev = [], 0
    for e in ends:
        out.append(fold(wh[prev:e]))
        prev = e
    return out


def test_cdc_chunks_match_reference(spark):
    import random
    from pyspark.sql import functions as F
    from crawler_spark.operators.textdedup import cdc_chunk_hashes

    rng = random.Random(7)
    rows = [(i, [rng.randrange(0, 1 << 32) for _ in
                 range(rng.choice([1, 2, 3, 4, 5, 30, 120]))])
            for i in range(40)]
    df = spark.createDataFrame(rows, ["doc_id", "wh"]) \
              .withColumn("wh", F.col("wh").cast("array<long>"))
    got = {r["doc_id"]: r["chs"] for r in
           df.select("doc_id", cdc_chunk_hashes(F.col("wh")).alias("chs"))
             .collect()}
    for doc_id, wh in rows:
        assert got[doc_id] == _cdc_reference(wh), doc_id


def test_cdc_chunks_are_insert_stable(spark):
    """Content-defined property: appending a suffix leaves every chunk
    except the final (re-opened) one unchanged — the reason edit-heavy
    corpora dedup at chunk level at all."""
    import random
    from pyspark.sql import functions as F
    from crawler_spark.operators.textdedup import cdc_chunk_hashes

    rng = random.Random(11)
    base = [rng.randrange(0, 1 << 32) for _ in range(300)]
    suffix = [rng.randrange(0, 1 << 32) for _ in range(50)]
    df = spark.createDataFrame(
        [(0, base), (1, base + suffix)], ["doc_id", "wh"]) \
        .withColumn("wh", F.col("wh").cast("array<long>"))
    got = {r["doc_id"]: r["chs"] for r in
           df.select("doc_id", cdc_chunk_hashes(F.col("wh")).alias("chs"))
             .collect()}
    shared = got[0][:-1]          # all closed chunks of the original
    assert got[1][:len(shared)] == shared


def test_edit_distance_pairs_blocking_is_lossless_for_small_k(spark):
    # every true dist<=k pair whose edits sit past the prefix must
    # survive blocking; far pairs and long-prefix-divergent pairs drop.
    from crawler_spark.operators.textdedup import edit_distance_pairs
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy cat"),   # dist 3 to 1
        (3, "the quick brown fox jumps over a lazy dog"),     # 1-word swap
        (4, "completely unrelated text that shares nothing"),
        (5, "the quick brown fox jumps over the lazy dog"),   # exact dup of 1
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r["id_a"], r["id_b"]): r["dist"]
           for r in edit_distance_pairs(df, k=3).collect()}
    assert got[(1, 5)] == 0
    assert got[(1, 2)] == 3
    assert (1, 4) not in got and (2, 4) not in got
    # dist values are true Levenshtein (python reference)
    def lev(a, b):
        import numpy as np
        m = np.arange(len(b) + 1)
        for i, ca in enumerate(a, 1):
            prev, m[0] = m[0], i
            for j, cb in enumerate(b, 1):
                prev, m[j] = m[j], min(m[j] + 1, m[j - 1] + 1,
                                       prev + (ca != cb))
        return int(m[-1])
    texts = {i: t for i, t in rows}
    for (ia, ib), d in got.items():
        assert d == lev(texts[ia][:64], texts[ib][:64])


def test_edit_distance_pairs_normalization_and_cap(spark):
    # case/whitespace variants are dist 0 after normalization; edits
    # beyond cap_len are invisible by design.
    from crawler_spark.operators.textdedup import edit_distance_pairs
    long_a = "prefix shared " + "x" * 80
    long_b = "prefix shared " + "x" * 60 + "y" * 40   # differs past cap 64
    rows = [(1, "Hello   World"), (2, "hello world"),
            (3, long_a), (4, long_b)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r["id_a"], r["id_b"]): r["dist"]
           for r in edit_distance_pairs(df, k=2, cap_len=64).collect()}
    assert got[(1, 2)] == 0
    assert got[(3, 4)] == 0


def test_ngram_jaccard_prune_verify_identical(spark):
    """prune_verify=True (the 10^12-scale verify-side semi-join prune) must
    return the identical pair set and jaccard values as the unpruned path,
    including when the candidate id set is a strict subset of the corpus."""
    from crawler_spark.operators.textdedup import ngram_jaccard_pairs
    docs = [(f"d{i}", "alpha beta gamma delta epsilon zeta " + ("x " * i))
            for i in range(4)]
    # two isolated docs sharing nothing with anyone (never candidates)
    docs += [("iso1", "qq ww ee rr tt yy uu"), ("iso2", "zz xx cc vv bb nn")]
    df = spark.createDataFrame(docs, "doc_id string, text string")
    base = sorted(map(tuple, ngram_jaccard_pairs(
        df, threshold=0.1, max_df=64).collect()))
    pruned = sorted(map(tuple, ngram_jaccard_pairs(
        df, threshold=0.1, max_df=64, prune_verify=True).collect()))
    assert base == pruned and len(base) > 0


def test_fuzzy_decontaminate_catches_near_and_exact(spark):
    """An exact copy and a lightly-edited copy of an eval doc are both
    flagged; an unrelated doc and the eval docs themselves are not."""
    from crawler_spark.operators.textdedup import fuzzy_decontaminate
    base = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        (1, base, "eval"),
        (2, base, "web"),                               # exact copy
        # truncated copy: Jaccard 0.9, band-collides with the eval doc
        # under this md5 minhash family (verified deterministically)
        (3, " ".join(base.split()[:-1]), "web"),
        (4, "completely different words about spark shuffles", "web"),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string, src string")
    out = {r["doc_id"]: r for r in fuzzy_decontaminate(
        d, is_eval=(F.col("src") == "eval"), min_jaccard=0.5).collect()}
    assert set(out) == {2, 3}
    assert out[2]["max_jaccard"] == 1.0
    assert 0.5 <= out[3]["max_jaccard"] < 1.0
    assert out[2]["n_matches"] == 1 and out[3]["n_matches"] == 1


def test_fuzzy_decontaminate_threshold_gates(spark):
    """A doc sharing a band but below the Jaccard floor is dropped —
    the verify stage, not the LSH recall, decides membership."""
    from crawler_spark.operators.textdedup import fuzzy_decontaminate
    base = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [(1, base, "eval"), (2, base, "web")]
    d = spark.createDataFrame(rows, "doc_id long, text string, src string")
    hi = fuzzy_decontaminate(d, is_eval=(F.col("src") == "eval"),
                             min_jaccard=0.5).collect()
    impossible = fuzzy_decontaminate(d, is_eval=(F.col("src") == "eval"),
                                     min_jaccard=1.01).collect()
    assert len(hi) == 1 and len(impossible) == 0


def test_prefix_filter_join_equals_exhaustive(spark):
    """The prefix-filtered join returns EXACTLY the brute-force pair set
    (losslessness is the operator's whole claim), across thresholds."""
    from crawler_spark.operators.textdedup import (
        ngram_jaccard_pairs, prefix_filter_pairs)
    import random
    rng = random.Random(3)
    vocab = [f"w{i}" for i in range(30)]
    rows = []
    for i in range(24):
        words = [vocab[rng.randrange(len(vocab))] for _ in range(12)]
        rows.append((i, " ".join(words)))
    rows.append((100, rows[0][1]))                       # exact dup
    rows.append((101, rows[1][1] + " extra tail words")) # near dup
    d = spark.createDataFrame(rows, "doc_id long, text string")
    for t in (0.3, 0.5, 0.8):
        exhaustive = {(r["doc_a"], r["doc_b"], r["jaccard"]) for r in
                      ngram_jaccard_pairs(d, threshold=t,
                                          max_df=None).collect()}
        pruned = {(r["doc_a"], r["doc_b"], r["jaccard"]) for r in
                  prefix_filter_pairs(d, threshold=t).collect()}
        assert pruned == exhaustive, t
    # sanity: the fixture actually exercises the paths (dup pair present)
    assert any(a == 0 and b == 100 for a, b, _ in exhaustive)


def test_prefix_filter_join_boundary_pair_survives(spark):
    """A pair sitting exactly AT the threshold is kept: the generation
    slack (t - 1e-4) covers pairs whose rounded Jaccard equals t."""
    from crawler_spark.operators.textdedup import prefix_filter_pairs
    # doc 1: grams {a b c, b c d} ; doc 2 shares exactly one of two
    # grams each -> J = 1/3 with these: craft J = 0.5: x={g1,g2}, y={g1,g2,g3}?
    # J = 2/3. Simplest exact 0.5: x = {g1}, y = {g1, g2} -> 1/2.
    d = spark.createDataFrame(
        [(1, "a b c"),              # single whole gram 'a b c'
         (2, "a b c d")],           # grams {'a b c', 'b c d'}
        "doc_id long, text string")
    out = prefix_filter_pairs(d, threshold=0.5).collect()
    assert len(out) == 1 and out[0]["jaccard"] == 0.5


# ---------------------------------------------------- dd20 substring runs


def test_dup_substring_runs_golden(spark):
    """Hand-built corpus, k=8: one shared 10-word passage P (3 repeated
    windows -> ONE merged run of 10 words), a second shared 8-word
    passage Q, a doc carrying both (two runs split by a unique gap), and
    a clean doc."""
    from crawler_spark.operators.textdedup import (
        dup_substring_runs, word_hashes_col,
    )
    from pyspark.sql import functions as F
    P = " ".join(f"p{i}" for i in range(10))
    Q = " ".join(f"q{i}" for i in range(8))
    rows = [
        (1, P + " " + " ".join(f"ax{i}" for i in range(5))),     # 15 words
        (2, " ".join(f"bx{i}" for i in range(3)) + " " + P),     # 13 words
        (3, " ".join(f"cx{i}" for i in range(9))),               # clean
        (4, P + " " + " ".join(f"dz{i}" for i in range(9))
            + " " + Q),                                           # 27 words
        (5, Q + " " + " ".join(f"ez{i}" for i in range(4))),     # 12 words
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    h = d.select("doc_id", word_hashes_col(F.col("text")).alias("h"))
    got = {r.doc_id: r for r in dup_substring_runs(h, k=8).collect()}
    r1 = got[1]
    assert (r1.n_words, r1.n_runs, r1.covered_words,
            r1.longest_run_words) == (15, 1, 10, 10)
    assert abs(r1.dup_word_frac - round(10 / 15, 4)) < 1e-9
    r2 = got[2]
    assert (r2.n_runs, r2.covered_words, r2.longest_run_words) == (1, 10, 10)
    r3 = got[3]
    assert (r3.n_runs, r3.covered_words, r3.dup_word_frac) == (0, 0, 0.0)
    r4 = got[4]
    assert (r4.n_words, r4.n_runs, r4.covered_words,
            r4.longest_run_words) == (27, 2, 18, 10)
    r5 = got[5]
    assert (r5.n_runs, r5.covered_words, r5.longest_run_words) == (1, 8, 8)


def test_dup_substring_runs_short_doc_cap(spark):
    """Docs shorter than k share one whole-doc window; coverage and
    longest run are capped at the doc's actual word count."""
    from crawler_spark.operators.textdedup import (
        dup_substring_runs, word_hashes_col,
    )
    from pyspark.sql import functions as F
    d = spark.createDataFrame(
        [(1, "s1 s2 s3"), (2, "s1 s2 s3"), (3, "u1 u2")],
        "doc_id long, text string")
    h = d.select("doc_id", word_hashes_col(F.col("text")).alias("h"))
    got = {r.doc_id: r for r in dup_substring_runs(h, k=8).collect()}
    assert (got[1].covered_words, got[1].longest_run_words,
            got[1].dup_word_frac) == (3, 3, 1.0)
    assert got[3].n_runs == 0
