"""Dup-cluster resolution: connected components (large-star/small-star)
verified against a driver-side union-find ground truth, plus the
dup_clusters / canonical_docs composition contracts."""

import random

import pytest
from pyspark.sql import functions as F

from crawler_spark.operators.clusters import (
    canonical_docs, connected_components, dup_clusters,
)


def _union_find(n_nodes, edges):
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical min-label per component, only for nodes incident to an edge
    touched = {x for e in edges for x in e}
    comp = {}
    for x in touched:
        comp.setdefault(find(x), []).append(x)
    return {x: min(mem) for mem in comp.values() for x in mem}


def _cc_spark(spark, edges):
    df = spark.createDataFrame([(a, b) for a, b in edges],
                               "doc_a long, doc_b long")
    return {r["node"]: r["cluster"]
            for r in connected_components(df).collect()}


@pytest.mark.parametrize("shape", ["path", "clique", "star_max", "two_comps"])
def test_cc_known_shapes(spark, shape):
    """Deterministic shapes exercising the algorithm's edge cases: a long
    path (worst case for naive label propagation), a clique, a star rooted
    at the LARGEST id (forces re-rooting to the min), two components."""
    if shape == "path":
        edges = [(i, i + 1) for i in range(40)]
    elif shape == "clique":
        edges = [(i, j) for i in range(8) for j in range(i + 1, 8)]
    elif shape == "star_max":
        edges = [(99, i) for i in range(7)]
    else:
        edges = [(0, 1), (1, 2), (10, 11), (12, 11)]
    want = _union_find(200, edges)
    assert _cc_spark(spark, edges) == want


def test_cc_random_graphs(spark):
    """Randomized Erdős–Rényi graphs (seeded) vs union-find: exact
    component-min labels on every incident node, no extra nodes."""
    rng = random.Random(7)
    for trial in range(4):
        n = 60
        edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(70)]
        edges = [(a, b) for a, b in edges if a != b]
        want = _union_find(n, edges)
        assert _cc_spark(spark, edges) == want, f"trial {trial}"


def test_cc_string_ids(spark):
    """Orderable-id genericity: string node ids cluster by lexicographic
    min (url-keyed dedup graphs use string keys)."""
    df = spark.createDataFrame(
        [("b", "c"), ("c", "d"), ("x", "z")], "doc_a string, doc_b string")
    got = {r["node"]: r["cluster"]
           for r in connected_components(df).collect()}
    assert got == {"b": "b", "c": "b", "d": "b", "x": "x", "z": "x"}


def test_cc_empty_edges(spark):
    df = spark.createDataFrame([], "doc_a long, doc_b long")
    assert connected_components(df).count() == 0


def test_dup_clusters_singletons(spark):
    """Every doc appears exactly once; docs untouched by any pair map to
    themselves."""
    docs = spark.createDataFrame([(i,) for i in range(6)], "doc_id long")
    pairs = spark.createDataFrame([(1, 4), (4, 5)], "doc_a long, doc_b long")
    got = {r["doc_id"]: r["cluster"]
           for r in dup_clusters(docs, pairs).collect()}
    assert got == {0: 0, 1: 1, 2: 2, 3: 3, 4: 1, 5: 1}


def test_canonical_docs_keep_contract(spark):
    """Exactly one keep per cluster: max quality wins, min doc_id breaks
    ties; singletons keep themselves."""
    clustered = spark.createDataFrame(
        [(1, 1), (4, 1), (5, 1), (7, 7), (8, 7), (9, 9)],
        "doc_id long, cluster long")
    quality = spark.createDataFrame(
        [(1, 0.5), (4, 0.9), (5, 0.9), (7, 0.3), (8, 0.3), (9, 0.2)],
        "doc_id long, quality double")
    rows = canonical_docs(clustered, quality).collect()
    keeps = {r["cluster"]: r["doc_id"] for r in rows if r["keep"]}
    assert keeps == {1: 4, 7: 7, 9: 9}          # 4 beats 5 on tie (min id)
    assert sum(r["keep"] for r in rows) == 3    # exactly one per cluster
    assert len(rows) == 6                       # every doc still present


def test_kcore_known_graph(spark):
    """K4 plus a pendant path: the 3-core is exactly the K4; the path
    peels away. Result degrees are the in-core degrees."""
    from crawler_spark.operators.clusters import kcore_peel

    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    path = [(3, 10), (10, 11), (11, 12)]
    e = spark.createDataFrame(k4 + path, ["src", "dst"])
    got = {(r["node"], r["deg"])
           for r in kcore_peel(e, k=3, rounds=4).collect()}
    assert got == {(0, 3), (1, 3), (2, 3), (3, 3)}


def test_kcore_converges_on_fixture(spark):
    """The g9 fixture's 8-core is a fixpoint well inside 5 rounds: one
    extra round changes nothing (the oracle-parity guarantee), and every
    surviving node meets the degree bound."""
    from pyspark.sql import functions as F
    from crawler_spark.operators.clusters import kcore_peel

    d = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    h = F.substring("source", 4, 10).cast("int")
    dst = F.concat(F.lit("src"),
                   ((F.col("doc_id") * 7 + 3) % (1 + (h % 20)))
                   .cast("string"))
    e = (d.select(F.col("source").alias("src"), dst.alias("dst"))
         .where(F.col("src") != F.col("dst")).distinct())
    r5 = {(r["node"], r["deg"])
          for r in kcore_peel(e, k=8, rounds=5).collect()}
    r6 = {(r["node"], r["deg"])
          for r in kcore_peel(e, k=8, rounds=6).collect()}
    assert r5 == r6 and r5
    assert all(deg >= 8 for _, deg in r5)


def test_kcore_fully_peels_sparse_graph(spark):
    from crawler_spark.operators.clusters import kcore_peel

    e = spark.createDataFrame([(0, 1), (1, 2), (2, 3)], ["src", "dst"])
    assert kcore_peel(e, k=2, rounds=3).count() == 0


def test_ktruss_golden_clique_plus_tail(spark):
    """K5 plus a pendant tail: every K5 edge has support 3 (4-truss at
    k=5), the tail edge has support 0 and is peeled in round 1; the K5
    survives a 5-truss (support >= 3) with support 3 reported."""
    from crawler_spark.operators.clusters import ktruss_peel
    k5 = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    edges = k5 + [(4, 9)]
    df = spark.createDataFrame([(f"n{a}", f"n{b}") for a, b in edges],
                               "src string, dst string")
    out = {(r["u"], r["v"]): r["support"]
           for r in ktruss_peel(df, k=5, rounds=2).collect()}
    assert len(out) == 10 and all(s == 3 for s in out.values())
    assert ("n4", "n9") not in out


def test_ktruss_star_hub_has_no_truss(spark):
    """A star (hub + 8 leaves) has k-core degree 8 at the hub but ZERO
    triangles: every edge peels at k=4 — the degree-vs-support
    distinction that motivates the operator."""
    from crawler_spark.operators.clusters import ktruss_peel
    df = spark.createDataFrame([("hub", f"leaf{i}") for i in range(8)],
                               "src string, dst string")
    assert ktruss_peel(df, k=4, rounds=1).count() == 0


def test_ktruss_cascade_needs_second_round(spark):
    """Peeling cascades: two triangles sharing edge (a,b), where the
    outer edges have support 1. At k=4 (support >= 2) round 1 drops the
    four outer edges; round 2 then drops (a,b), whose support fell to 0
    — a 1-round peel would wrongly keep it."""
    from crawler_spark.operators.clusters import ktruss_peel
    edges = [("a", "b"), ("a", "c"), ("b", "c"), ("a", "d"), ("b", "d")]
    df = spark.createDataFrame(edges, "src string, dst string")
    one = ktruss_peel(df, k=4, rounds=1)
    two = ktruss_peel(df, k=4, rounds=2)
    assert one.count() == 1 and two.count() == 0


def test_ktruss_fixture_converges_inside_registry_rounds(spark):
    """The g30 registry query runs 2 rounds on the host-graph fixture;
    assert the peel is a fixpoint there (round 3 changes nothing), so
    the fixed unroll equals the true 8-truss."""
    from crawler_spark.operators.clusters import ktruss_peel
    d = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    h = F.substring("source", 4, 10).cast("int")
    dst = F.concat(F.lit("src"),
                   ((F.col("doc_id") * 7 + 3) % (1 + (h % 20)))
                   .cast("string"))
    e0 = (d.select(F.col("source").alias("src"), dst.alias("dst"))
          .where(F.col("src") != F.col("dst")).distinct())
    two = {(r["u"], r["v"]) for r in
           ktruss_peel(e0, k=8, rounds=2).select("u", "v").collect()}
    three = {(r["u"], r["v"]) for r in
             ktruss_peel(e0, k=8, rounds=3).select("u", "v").collect()}
    assert two == three and len(two) > 0


# ------------------------------------------------------------- SCC (g33)


def _scc_py(edges):
    """Iterative Tarjan reference (recursion-free) for small graphs:
    returns {node: min-member-of-its-SCC}."""
    from collections import defaultdict
    adj = defaultdict(list)
    nodes = set()
    for u, v in edges:
        nodes.update((u, v))
        if u != v:
            adj[u].append(v)
    index, low, onstk = {}, {}, set()
    stack, out, ctr = [], {}, [0]
    for root in sorted(nodes):
        if root in index:
            continue
        work = [(root, iter(adj[root]))]
        index[root] = low[root] = ctr[0]; ctr[0] += 1
        stack.append(root); onstk.add(root)
        while work:
            node, it = work[-1]
            advanced = False
            for w in it:
                if w not in index:
                    index[w] = low[w] = ctr[0]; ctr[0] += 1
                    stack.append(w); onstk.add(w)
                    work.append((w, iter(adj[w])))
                    advanced = True
                    break
                if w in onstk:
                    low[node] = min(low[node], index[w])
            if advanced:
                continue
            work.pop()
            if work:
                p = work[-1][0]
                low[p] = min(low[p], low[node])
            if low[node] == index[node]:
                comp = []
                while True:
                    w = stack.pop(); onstk.discard(w)
                    comp.append(w)
                    if w == node:
                        break
                cid = min(comp)
                for w in comp:
                    out[w] = cid
    return out


def test_scc_golden_cycle_tail_and_dag(spark):
    """3-cycle {a,b,c}; d feeds it; e->f pure DAG pair: 4 SCCs."""
    from crawler_spark.operators.clusters import scc_decomposition
    e = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"), ("d", "a"), ("e", "f")],
        "src string, dst string")
    got = {r.host: (r.scc_id, r.scc_size)
           for r in scc_decomposition(e).collect()}
    assert got == {"a": ("a", 3), "b": ("a", 3), "c": ("a", 3),
                   "d": ("d", 1), "e": ("e", 1), "f": ("f", 1)}


def test_scc_two_components_linked(spark):
    """Two 2-cycles joined by a one-way bridge stay separate SCCs."""
    from crawler_spark.operators.clusters import scc_decomposition
    e = spark.createDataFrame(
        [("a", "b"), ("b", "a"), ("c", "d"), ("d", "c"), ("a", "c")],
        "src string, dst string")
    got = {r.host: r.scc_id for r in scc_decomposition(e).collect()}
    assert got == {"a": "a", "b": "a", "c": "c", "d": "c"}


def test_scc_random_graphs_match_tarjan(spark):
    """Deterministic pseudo-random digraphs vs the Tarjan reference —
    including shapes where trim leaves work for the closure phase."""
    from crawler_spark.operators.clusters import scc_decomposition
    rnd = random.Random(733)
    for trial in range(3):
        n = 14 + trial * 5
        edges = sorted({(f"n{rnd.randrange(n):02d}",
                         f"n{rnd.randrange(n):02d}")
                        for _ in range(2 * n)})
        edges = [(u, v) for u, v in edges if u != v]
        want = _scc_py(edges)
        df = spark.createDataFrame(edges, "src string, dst string")
        got = {r.host: r.scc_id for r in scc_decomposition(df).collect()}
        assert got == want, f"trial {trial}"
        sizes = {}
        for cid in want.values():
            sizes[cid] = sizes.get(cid, 0) + 1
        got_sz = {r.scc_id: r.scc_size
                  for r in scc_decomposition(df).collect()}
        assert got_sz == sizes, f"trial {trial} sizes"


def test_scc_condensation_golden(spark):
    """Cycle {a,b,c} + feeder d + DAG pair e->f: exactly the two
    cross-component edges survive contraction, weighted 1."""
    from crawler_spark.operators.clusters import scc_condensation
    e = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"), ("d", "a"), ("e", "f")],
        "src string, dst string")
    got = {(r.scc_src, r.scc_dst): r.n_links
           for r in scc_condensation(e).collect()}
    assert got == {("d", "a"): 1, ("e", "f"): 1}


def test_scc_condensation_is_acyclic_and_weighted(spark):
    """Random digraph: the condensation must be a DAG (verified by full
    Python reachability) and its weights must sum to the number of
    distinct cross-component base edges."""
    from crawler_spark.operators.clusters import scc_condensation
    rnd = random.Random(97)
    n = 16
    edges = sorted({(f"n{rnd.randrange(n):02d}", f"n{rnd.randrange(n):02d}")
                    for _ in range(40)})
    edges = [(u, v) for u, v in edges if u != v]
    df = spark.createDataFrame(edges, "src string, dst string")
    rows = scc_condensation(df).collect()
    cedges = [(r.scc_src, r.scc_dst) for r in rows]
    # acyclicity: python transitive closure of the condensation
    adj = {}
    for u, v in cedges:
        adj.setdefault(u, set()).add(v)
    def reach(u, seen):
        for v in adj.get(u, ()):  # noqa: E306
            if v not in seen:
                seen.add(v)
                reach(v, seen)
        return seen
    for u, _ in cedges:
        assert u not in reach(u, set()), "condensation has a cycle"
    # weight conservation against the Tarjan labels
    lab = _scc_py(edges)
    want = {}
    for u, v in edges:
        if lab[u] != lab[v]:
            want[(lab[u], lab[v])] = want.get((lab[u], lab[v]), 0) + 1
    got = {(r.scc_src, r.scc_dst): r.n_links for r in rows}
    assert got == want


def test_scc_condensation_levels_golden(spark):
    """Chain of three SCCs {a,b} -> {c} -> {d,e}, plus isolated pair
    f->g (f source level 0, g level 1): longest-path layering."""
    from crawler_spark.operators.clusters import scc_condensation_levels
    e = spark.createDataFrame(
        [("a", "b"), ("b", "a"), ("b", "c"), ("c", "d"),
         ("d", "e"), ("e", "d"), ("a", "d"),  # shortcut must NOT lower d
         ("f", "g")],
        "src string, dst string")
    got = {r.scc_id: r.level
           for r in scc_condensation_levels(e).collect()}
    assert got == {"a": 0, "c": 1, "d": 2, "f": 0, "g": 1}
