"""As-of and banded range joins (operators/joins.py, j6/j7)."""

from __future__ import annotations

from pyspark.sql import functions as F

from crawler_spark.operators.joins import asof_join, range_join


def test_asof_semantics(spark):
    """>= tie matches, pre-first-version nulls, latest-version fill."""
    left = spark.createDataFrame(
        [(1, "k1", 4), (2, "k1", 5), (3, "k1", 9), (4, "k1", 100),
         (5, "k2", 50)],
        "event_id long, k string, t long")
    right = spark.createDataFrame(
        [("k1", 5, "a"), ("k1", 9, "b"), ("k3", 1, "z")],
        "k string, v_from long, v string")
    got = {r.event_id: (r.v, r.v_from)
           for r in asof_join(left, right, "k", "t", "v_from").collect()}
    assert got == {
        1: (None, None),      # before any version
        2: ("a", 5),          # tie: t == v_from matches
        3: ("b", 9),          # newer version supersedes
        4: ("b", 9),
        5: (None, None),      # key with no versions at all
    }


def test_asof_equals_naive_inequality_topk(spark):
    """Union-and-window == the naive inequality-join + row_number oracle
    on a deterministic mixed fixture."""
    left = spark.createDataFrame(
        [(i, f"k{i % 7}", (i * 13) % 50) for i in range(200)],
        "event_id long, k string, t long")
    right = spark.createDataFrame(
        [(f"k{j % 7}", j * 3 + (j % 7), f"v{j}") for j in range(20)],
        "k string, v_from long, v string")
    got = asof_join(left, right, "k", "t", "v_from") \
        .select("event_id", "v", "v_from")
    from pyspark.sql import Window
    w = Window.partitionBy("event_id").orderBy(F.desc("v_from"))
    naive = (left.join(right, "k", "left")
             .where(F.col("v_from").isNull() | (F.col("t") >= F.col("v_from")))
             .withColumn("rn", F.row_number().over(w)).where(F.col("rn") == 1)
             .select("event_id", "v", "v_from"))
    # left rows whose only join partners were filtered out vanish from the
    # naive inner-ish form; re-add them as null matches
    missing = left.join(naive.select("event_id"), "event_id", "left_anti") \
        .select("event_id", F.lit(None).cast("string").alias("v"),
                F.lit(None).cast("long").alias("v_from"))
    assert sorted(map(tuple, got.collect())) \
        == sorted(map(tuple, naive.unionByName(missing).collect()))


def test_range_join_equals_naive_and_boundaries(spark):
    facts = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(
            [0.0, 9.99, 10.0, 15.5, 29.9, 30.0, 55.0, 100.0])],
        "fid long, value double")
    bands = spark.createDataFrame(
        [(0, 0.0, 10.0), (1, 10.0, 30.0), (2, 5.0, 55.0),
         (3, 55.0, 55.0),                       # empty band: dropped
         (4, 90.0, 200.0)],
        "band_id int, lo double, hi double")
    for width in (4.0, 10.0, 64.0):              # result width-independent
        got = sorted((r.fid, r.band_id) for r in
                     range_join(facts, bands, "value", "lo", "hi",
                                width).collect())
        naive = sorted((r.fid, r.band_id) for r in
                       facts.crossJoin(bands)
                       .where((F.col("value") >= F.col("lo"))
                              & (F.col("value") < F.col("hi"))).collect())
        assert got == naive
    # explicit boundary reading: lo inclusive, hi exclusive
    pairs = dict()
    for fid, band_id in naive:
        pairs.setdefault(fid, set()).add(band_id)
    assert pairs[0] == {0}            # 0.0: in [0,10) only
    assert pairs[2] == {1, 2}         # 10.0: excluded from [0,10)
    assert 6 not in pairs             # 55.0: excluded from [5,55), hi-side
    assert 3 not in {b for s in pairs.values() for b in s}  # empty band


def test_range_join_plan_has_no_nested_loop(spark):
    facts = spark.range(100).select(
        F.col("id").alias("fid"), (F.col("id") % 37).cast("double")
        .alias("value"))
    bands = spark.createDataFrame([(0, 0.0, 20.0), (1, 10.0, 37.0)],
                                  "band_id int, lo double, hi double")
    import io
    from contextlib import redirect_stdout
    buf = io.StringIO()
    with redirect_stdout(buf):
        range_join(facts, bands, "value", "lo", "hi", 8.0) \
            .explain("formatted")
    txt = buf.getvalue()
    assert "BroadcastHashJoin" in txt
    assert "NestedLoop" not in txt and "CartesianProduct" not in txt


def test_time_window_join_equals_naive_and_boundaries(spark):
    from crawler_spark.operators.joins import time_window_join
    left = spark.createDataFrame(
        [(i, f"u{i % 3}", i * 97 % 1000) for i in range(60)],
        "lid long, k string, t long")
    right = spark.createDataFrame(
        [(j, f"u{j % 3}", j * 53 % 1000) for j in range(80)],
        "rid long, k string, rt long")
    got = sorted((r.lid, r.rid) for r in
                 time_window_join(left, right, "k", "t", "rt", 100)
                 .collect())
    naive = sorted((r.lid, r.rid) for r in
                   left.join(right, "k")
                   .where((F.col("t") >= F.col("rt"))
                          & (F.col("t") - F.col("rt") < 100)).collect())
    assert got == naive and len(got) > 0
    # boundary: lag exactly == lag_max is EXCLUDED, 0 lag included
    l2 = spark.createDataFrame([(1, "k", 1000)], "lid long, k string, t long")
    r2 = spark.createDataFrame(
        [(10, "k", 1000), (11, "k", 901), (12, "k", 900), (13, "k", 1001)],
        "rid long, k string, rt long")
    ids = sorted(r.rid for r in
                 time_window_join(l2, r2, "k", "t", "rt", 100).collect())
    assert ids == [10, 11]  # rt=900 is t-100 (excluded); rt=1001 is future


def test_scd2_collapses_runs_and_chains_intervals(spark):
    from crawler_spark.operators.joins import scd2_intervals
    rows = [(1, "A", 10, 1), (1, "A", 20, 2), (1, "B", 30, 3),
            (1, "B", 40, 4), (1, "A", 50, 5),
            (2, "X", 15, 6)]
    d = spark.createDataFrame(
        rows, "uid long, attr string, t long, eid long")
    out = sorted(scd2_intervals(d, "uid", "attr", "t", "eid").collect(),
                 key=lambda r: (r["uid"], r["version"]))
    u1 = [r for r in out if r["uid"] == 1]
    assert [(r["attr"], r["valid_from"], r["valid_to"], r["version"],
             r["is_current"]) for r in u1] == \
        [("A", 10, 30, 1, 0), ("B", 30, 50, 2, 0), ("A", 50, None, 3, 1)]
    u2 = [r for r in out if r["uid"] == 2]
    assert [(r["attr"], r["valid_from"], r["valid_to"],
             r["is_current"]) for r in u2] == [("X", 15, None, 1)]


def test_scd2_tiebreak_on_equal_timestamps(spark):
    """Two changes at the same ts order by the tie column — versions and
    intervals stay deterministic."""
    from crawler_spark.operators.joins import scd2_intervals
    rows = [(1, "A", 10, 1), (1, "B", 10, 2), (1, "C", 10, 3)]
    d = spark.createDataFrame(
        rows, "uid long, attr string, t long, eid long")
    out = sorted(scd2_intervals(d, "uid", "attr", "t", "eid").collect(),
                 key=lambda r: r["version"])
    assert [r["attr"] for r in out] == ["A", "B", "C"]
    assert out[-1]["is_current"] == 1 and out[0]["valid_to"] == 10


def test_interval_overlap_matches_bruteforce(spark):
    """Bucketed candidates + first-shared-bucket dedup == the O(n*m)
    inequality join, across boundary-touching, nested, and multi-bucket
    spans."""
    import itertools
    from crawler_spark.operators.joins import interval_overlap_join
    a_rows = [(1, 1, 0, 100), (1, 2, 50, 250), (1, 3, 300, 301),
              (2, 4, 0, 1000)]
    b_rows = [(1, 10, 90, 110), (1, 11, 100, 200), (1, 12, 250, 260),
              (1, 13, 301, 400), (2, 14, 999, 2500), (3, 15, 0, 10)]
    a = spark.createDataFrame(a_rows, "k long, a_id long, lo_a long, hi_a long")
    b = spark.createDataFrame(b_rows, "k long, b_id long, lo_b long, hi_b long")
    got = sorted((r["a_id"], r["b_id"]) for r in
                 interval_overlap_join(a, b, "k",
                                       bucket_width=64.0).collect())
    want = sorted(
        (ai, bi)
        for (ka, ai, la, ha), (kb, bi, lb, hb)
        in itertools.product(a_rows, b_rows)
        if ka == kb and la < hb and lb < ha)
    assert got == want
    # half-open: a3 [300,301) does not meet b13 [301,400)
    assert (3, 13) not in got


def test_interval_overlap_no_duplicate_pairs_across_buckets(spark):
    """A pair sharing many buckets still emits exactly one row."""
    from crawler_spark.operators.joins import interval_overlap_join
    a = spark.createDataFrame([(1, 1, 0, 10_000)],
                              "k long, a_id long, lo_a long, hi_a long")
    b = spark.createDataFrame([(1, 2, 5, 9_999)],
                              "k long, b_id long, lo_b long, hi_b long")
    out = interval_overlap_join(a, b, "k", bucket_width=16.0).collect()
    assert len(out) == 1


def test_bloom_prune_no_false_negatives_and_prunes(spark):
    """Every fact key present in the dim survives the prune (Bloom
    soundness), and a sparse dim prunes most of a wide fact."""
    from crawler_spark.operators.joins import bloom_prune_join
    fact = spark.createDataFrame([(i,) for i in range(500)], "key long")
    dim = spark.createDataFrame([(i,) for i in range(0, 500, 50)],
                                "key long")
    got = {r["key"] for r in
           bloom_prune_join(fact, dim, "key", m=1024, k=4).collect()}
    assert {i for i in range(0, 500, 50)} <= got
    assert len(got) < 500  # the prune actually pruned


def test_bloom_prune_exact_join_equals_plain_join(spark):
    """Prune-then-join == plain join: false positives are dropped by
    the exact join, false negatives cannot exist."""
    from crawler_spark.operators.joins import bloom_prune_join
    fact = spark.createDataFrame([(i, i % 7) for i in range(300)],
                                 "key long, v int")
    dim = spark.createDataFrame([(i, f"d{i}") for i in range(0, 300, 13)],
                                "key long, attr string")
    pruned = bloom_prune_join(fact, dim, "key", m=64, k=2).drop("maybe")
    via_prune = sorted((r["key"], r["v"], r["attr"]) for r in
                       pruned.join(dim, "key").collect())
    plain = sorted((r["key"], r["v"], r["attr"]) for r in
                   fact.join(dim, "key").collect())
    assert via_prune == plain


def test_changelog_merge_semantics(spark):
    """Update, delete, insert, pass-through, and the same-version
    update+delete tie (delete wins)."""
    from crawler_spark.operators.joins import changelog_merge
    base = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 30), (4, 40), (5, 50)],
        "k long, val long")
    ch = spark.createDataFrame(
        [(1, "u", 11, 5), (1, "u", 12, 7),      # latest update wins
         (2, "d", None, 3),                      # delete
         (3, "u", 33, 4), (3, "d", None, 4),     # tie: delete wins
         (6, "u", 60, 1),                        # insert
         (4, "d", None, 2), (4, "u", 44, 9)],    # resurrect: upd newer
        "k long, op string, val long, ver long")
    out = {r["k"]: (r["val"], r["src"]) for r in
           changelog_merge(base, ch, "k", "val", "ver", "op").collect()}
    assert out == {1: (12, "upsert"), 4: (44, "upsert"),
                   5: (50, "base"), 6: (60, "upsert")}
    assert 2 not in out and 3 not in out


def test_bloom_prune_null_dim_key(spark):
    """A NULL key on the dim side must not crash mask assembly (it can
    never equi-join a fact row); NULL fact keys are dropped by the probe."""
    from crawler_spark.operators.joins import bloom_prune_join
    dim = spark.createDataFrame([("a",), (None,), ("b",)], "k string")
    fact = spark.createDataFrame(
        [("a", 1), ("zz", 2), (None, 3)], "k string, v int")
    out = bloom_prune_join(fact, dim, "k")
    kept = {r["k"] for r in out.collect()}
    assert "a" in kept and None not in kept


def test_nearest_join_direction_and_ties(spark):
    """Nearest-in-time semantics: backward when closer, forward when
    closer, BACKWARD on equal distance, pure-forward before the first
    version, nulls with no versions at all."""
    from crawler_spark.operators.joins import nearest_join
    left = spark.createDataFrame(
        [("u", 1, 95), ("u", 2, 130), ("u", 3, 150), ("u", 4, 10),
         ("v", 5, 50)],
        "k string, eid long, t long")
    right = spark.createDataFrame(
        [("u", 100, "a"), ("u", 200, "b")],
        "k string, vt long, tag string")
    out = {r["eid"]: (r["tag"], r["vt"]) for r in
           nearest_join(left, right, on="k", left_ts="t",
                        right_ts="vt").collect()}
    assert out[1] == ("a", 100)        # 95: forward 100 (d5) beats none-back
    assert out[2] == ("a", 100)        # 130: back d30 < fwd d70
    assert out[3] == ("a", 100)        # 150: TIE d50/d50 -> backward
    assert out[4] == ("a", 100)        # 10: only forward exists
    assert out[5] == (None, None)      # key with no right rows
    # equal-t right row matches at distance 0 via the backward fill
    l2 = spark.createDataFrame([("u", 9, 200)], "k string, eid long, t long")
    r9 = {r["eid"]: (r["tag"], r["vt"]) for r in
          nearest_join(l2, right, on="k", left_ts="t",
                       right_ts="vt").collect()}
    assert r9[9] == ("b", 200)
