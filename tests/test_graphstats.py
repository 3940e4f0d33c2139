"""Graph statistics added in round 3 (operators/hostrank.py): SALSA vs a
pure-Python mirror, harmonic centrality ordering, effective diameter on
known topologies."""

from __future__ import annotations

from crawler_spark.operators.hostrank import (
    effective_diameter, harmonic_centrality, salsa_hosts,
)

EDGES = [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c"),
         ("b", "e"), ("c", "e"), ("f", "g")]


def _pure_salsa(edges, iters=3):
    es = sorted(set(edges))
    hosts = sorted({u for e in es for u in e})
    outd: dict[str, int] = {}
    ind: dict[str, int] = {}
    for s, t in es:
        outd[s] = outd.get(s, 0) + 1
        ind[t] = ind.get(t, 0) + 1
    hub = {h: 1.0 for h in hosts}
    auth = {h: 0.0 for h in hosts}
    for _ in range(iters):
        m = {h: 0.0 for h in hosts}
        for s, t in es:
            m[t] += hub[s] / outd[s]
        tot = sum(m.values())
        auth = {h: m[h] / tot for h in hosts}
        m = {h: 0.0 for h in hosts}
        for s, t in es:
            m[s] += auth[t] / ind[t]
        tot = sum(m.values())
        hub = {h: m[h] / tot for h in hosts}
    return auth, hub


def test_salsa_matches_pure_python(spark):
    e = spark.createDataFrame(EDGES, "src string, dst string")
    got = {r["host"]: (r["auth"], r["hub"])
           for r in salsa_hosts(e, iters=3).collect()}
    wa, wh = _pure_salsa(EDGES)
    assert set(got) == set(wa)
    for h in wa:
        assert abs(got[h][0] - wa[h]) < 1e-9, h
        assert abs(got[h][1] - wh[h]) < 1e-9, h


def test_salsa_normalized_and_degree_sensitive(spark):
    """Sum-normalization holds, and SALSA differs from raw HITS where
    degrees are skewed: a node cited by a profligate hub gains less
    authority than one cited by a selective hub."""
    edges = [("hub_many", f"t{i}") for i in range(5)] \
        + [("hub_one", "t_sel")]
    e = spark.createDataFrame(edges, "src string, dst string")
    rows = salsa_hosts(e, iters=1).collect()
    auth = {r["host"]: r["auth"] for r in rows}
    assert abs(sum(auth.values()) - 1.0) < 1e-9
    # hub_one's single target absorbs its full unit mass; hub_many's
    # targets split theirs five ways
    assert auth["t_sel"] > auth["t0"]


def test_harmonic_centrality_orders_reachability(spark):
    """Star pointing at a center: the center is reachable from every
    leaf in one hop and must dominate; leaves (unreachable from
    anywhere) get harmonic 0."""
    edges = [(f"l{i}", "center") for i in range(6)]
    e = spark.createDataFrame(edges, "src string, dst string")
    h = {r["host"]: r["harmonic"]
         for r in harmonic_centrality(e, max_hops=3).collect()}
    assert h["center"] > h["l0"]
    assert abs(h["l0"]) < 0.5          # HLL noise only, true value 0


def test_effective_diameter_path_graph(spark):
    """Directed 5-path: every prefix ball keeps growing to hop 4, so the
    90th-percentile interpolated diameter must land in (0, 4] and the
    integer-scaled neighborhood function must be non-decreasing."""
    edges = [(f"n{i}", f"n{i+1}") for i in range(5)]
    e = spark.createDataFrame(edges, "src string, dst string")
    row = effective_diameter(e, max_hops=4).collect()[0]
    nf = [row[f"nf{t}"] for t in range(5)]
    assert all(b >= a for a, b in zip(nf, nf[1:]))
    assert 0.0 < row["eff_diameter"] <= 4.0


def test_spam_mass_separates_farm_from_trusted(spark):
    """A link farm with no path from the trusted core carries tr = 0,
    so its spam mass is ~1; the trusted seed and hosts it links carry
    substantially lower mass."""
    from pyspark.sql import functions as F

    from crawler_spark.operators.hostrank import pagerank_hosts
    edges = [("t0", "a"), ("a", "t0"), ("t0", "b"),
             ("f1", "f2"), ("f2", "f1"), ("f3", "f1"), ("f3", "f2")]
    e = spark.createDataFrame(edges, "src string, dst string")
    trusted = spark.createDataFrame([("t0",)], "host string")
    pr = (pagerank_hosts(e, iters=5, damping=0.85)
          .select("host", F.round("rank", 4).alias("pr")))
    tr = (pagerank_hosts(e, iters=5, damping=0.85, teleport=trusted)
          .select("host", F.round("rank", 4).alias("tr")))
    j = pr.join(tr, "host")
    tot = j.agg(F.sum("pr").alias("sp"), F.sum("tr").alias("st"))
    out = {r["host"]: r["sm"] for r in
           j.crossJoin(F.broadcast(tot))
            .select("host",
                    F.round((F.col("pr")
                             - F.col("tr") * F.col("sp") / F.col("st"))
                            / F.col("pr"), 4).alias("sm")).collect()}
    for farm in ("f1", "f2"):
        assert out[farm] == 1.0, farm        # zero trust reaches the farm
    assert out["t0"] < 0.5
    assert out["a"] < out["f1"]


def test_assortativity_signs_on_known_topologies(spark):
    """Operator-level sign anchors: the disjoint union of K4 (every
    edge joins out-deg-3 to in-deg-3) and a 3-ring (1 -> 1) has x == y
    on EVERY edge -> r = 1.0 exactly; a hub feeding a chain of leaves
    is disassortative (r < 0)."""
    from crawler_spark.operators.hostrank import assortativity

    def r_of(edges):
        e = spark.createDataFrame(edges, "src string, dst string")
        return assortativity(e).collect()[0]

    k4_ring = [(f"a{i}", f"a{j}") for i in range(4) for j in range(4)
               if i != j] + [(f"b{i}", f"b{(i + 1) % 3}") for i in range(3)]
    row = r_of(k4_ring)
    assert row["assortativity"] == 1.0
    assert row["n"] == 15 and row["sx"] == row["sy"]

    hub = [("h", f"l{i}") for i in range(6)] + \
          [(f"l{i}", f"l{i+1}") for i in range(5)]
    assert r_of(hub)["assortativity"] < 0


def test_clustering_coefficients_known_graph(spark):
    """Triangle a-b-c with pendant b-e: triangle corners of degree 2 get
    c=1.0, the degree-3 corner 1/3, the pendant 0.0."""
    from crawler_spark.operators.hostrank import clustering_coefficients
    e = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"), ("b", "e")],
        "src string, dst string")
    got = {r["host"]: r for r in clustering_coefficients(e).collect()}
    assert got["a"]["degree"] == 2 and got["a"]["clustering"] == 1.0
    assert got["b"]["degree"] == 3 and got["b"]["clustering"] == 0.3333
    assert got["c"]["clustering"] == 1.0
    assert got["e"]["degree"] == 1 and got["e"]["clustering"] == 0.0
    assert got["b"]["n_triangles"] == 1


def test_clustering_direction_and_duplicates_erased(spark):
    """Reversed and duplicated edges yield the identical coefficients."""
    from crawler_spark.operators.hostrank import clustering_coefficients
    base = [("a", "b"), ("b", "c"), ("c", "a")]
    noisy = base + [("b", "a"), ("c", "b"), ("a", "c"), ("a", "b")]
    e1 = spark.createDataFrame(base, "src string, dst string")
    e2 = spark.createDataFrame(noisy, "src string, dst string")
    r1 = sorted(map(tuple, clustering_coefficients(e1).collect()))
    r2 = sorted(map(tuple, clustering_coefficients(e2).collect()))
    assert r1 == r2


def test_mirror_hosts_exact_and_partial(spark):
    """A/B share all 3 outlinks (jaccard 1.0); C overlaps 2 of 3 with each
    (0.5); D shares nothing and pairs with nobody."""
    from crawler_spark.operators.hostrank import mirror_hosts
    edges = [("A", t) for t in ("x", "y", "z")] \
        + [("B", t) for t in ("x", "y", "z")] \
        + [("C", t) for t in ("x", "y", "w")] \
        + [("D", "p")]
    e = spark.createDataFrame(edges, "src string, dst string")
    got = {(r["host_a"], r["host_b"]): r
           for r in mirror_hosts(e, min_jaccard=0.25).collect()}
    assert got[("A", "B")]["jaccard"] == 1.0
    assert got[("A", "B")]["n_inter"] == 3
    assert got[("A", "C")]["jaccard"] == 0.5
    assert got[("B", "C")]["jaccard"] == 0.5
    assert not any("D" in k for k in got)


def test_mirror_hosts_df_cap_blocks_pairgen_not_verify(spark):
    """Hosts sharing ONLY a high-df target generate no pair under the cap;
    but for pairs that DO qualify, similarity is verified against the
    FULL outlink sets including capped targets."""
    from crawler_spark.operators.hostrank import mirror_hosts
    # 'hub' is linked by everyone (df 4 > max_df 3).
    edges = [(h, "hub") for h in ("A", "B", "C", "D")] \
        + [("A", "u1"), ("B", "u1"), ("A", "u2"), ("B", "u2")]
    e = spark.createDataFrame(edges, "src string, dst string")
    got = {(r["host_a"], r["host_b"]): r
           for r in mirror_hosts(e, min_jaccard=0.25, max_df=3).collect()}
    # Only (A, B) share an uncapped target; C/D pair with nobody.
    assert set(got) == {("A", "B")}
    # Verify uses full sets: |A∩B| = {hub, u1, u2} = 3 of 3 -> 1.0.
    assert got[("A", "B")]["n_inter"] == 3
    assert got[("A", "B")]["jaccard"] == 1.0


def test_mirror_containment_asymmetry(spark):
    """A ⊂ B (partial replica): containment |A∩B|/|A| = 1.0 while
    jaccard dilutes to |A|/|B|."""
    from crawler_spark.operators.hostrank import mirror_hosts
    edges = [("A", "x"), ("A", "y")] \
        + [("B", t) for t in ("x", "y", "z", "w")]
    e = spark.createDataFrame(edges, "src string, dst string")
    r = mirror_hosts(e, min_jaccard=0.25).collect()
    assert len(r) == 1
    assert r[0]["containment"] == 1.0
    assert r[0]["jaccard"] == 0.5


def _pure_simrank(edges, iters=3, c=0.8):
    es = sorted(set(edges))
    nodes = sorted({u for e in es for u in e})
    ine = {}
    for s, t in es:
        ine.setdefault(t, set()).add(s)
    s = {(a, a): 1.0 for a in nodes}
    for _ in range(iters):
        nxt = {(a, a): 1.0 for a in nodes}
        for a in nodes:
            for b in nodes:
                if a == b or a not in ine or b not in ine:
                    continue
                tot = sum(s.get((u, v), 0.0)
                          for u in ine[a] for v in ine[b])
                if tot:
                    nxt[(a, b)] = c * tot / (len(ine[a]) * len(ine[b]))
        s = nxt
    return s


def test_simrank_matches_pure_python(spark):
    from crawler_spark.operators.hostrank import simrank
    edges = [("u", "a"), ("u", "b"), ("v", "a"), ("v", "b"),
             ("w", "c"), ("u", "c"), ("a", "d"), ("b", "d")]
    e = spark.createDataFrame(edges, "src string, dst string")
    got = {(r["host_a"], r["host_b"]): r["simrank"]
           for r in simrank(e, iters=3).collect()}
    want = _pure_simrank(edges, iters=3)
    for (a, b), v in want.items():
        if a < b and v > 0:
            assert abs(got[(a, b)] - round(v, 4)) <= 1e-4, (a, b)
    assert set(got) == {(a, b) for (a, b), v in want.items()
                        if a < b and v > 0}


def test_simrank_cocited_pair_scores_high(spark):
    """Two hosts cited by identical in-neighbor sets converge to the
    max off-diagonal score."""
    from crawler_spark.operators.hostrank import simrank
    edges = [("u", "a"), ("u", "b"), ("v", "a"), ("v", "b"), ("x", "y")]
    e = spark.createDataFrame(edges, "src string, dst string")
    got = {(r["host_a"], r["host_b"]): r["simrank"]
           for r in simrank(e, iters=2).collect()}
    top = max(got.values())
    assert got[("a", "b")] == top


def test_katz_matches_pure_python_and_beats_pagerank_on_farms(spark):
    from crawler_spark.operators.hostrank import katz_hosts
    edges = [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c"),
             ("d", "c"), ("e", "c")]
    e = spark.createDataFrame(edges, "src string, dst string")
    got = {r["host"]: r["katz"] for r in katz_hosts(e, iters=3,
                                                    alpha=0.1).collect()}
    es = sorted(set(edges))
    nodes = sorted({u for t in es for u in t})
    x = {v: 1.0 for v in nodes}
    for _ in range(3):
        nxt = {}
        for v in nodes:
            nxt[v] = 1.0 + 0.1 * sum(x[u] for u, w in es if w == v)
        x = nxt
    for v in nodes:
        assert abs(got[v] - round(x[v], 4)) <= 1e-4, v
    # c has the most inbound walk mass
    assert max(got, key=got.get) == "c"
