"""Driver-contract query registry (SURVEY.md §2 coverage + training-data ops).

Each entry binds one implemented operator to the driver's testdata tables:
a Spark callable `(spark, sf_dir) -> DataFrame` and (where SQL-expressible)
an exactly-equivalent ANSI-SQL oracle string for DuckDB. Column names AND
value semantics are aligned pairwise: the driver compares row count, schema,
and an order-insensitive value hash at sf=0.01.

Numeric discipline: every float column is round(x, 4) on BOTH sides; every
timestamp is reduced to epoch seconds under an explicitly-UTC session, so
cross-engine hashing is bit-stable.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from crawler_spark.functions.text import (
    lang_id_col, quality_score_col, token_count_col,
)
from crawler_spark.operators.similarity import brute_force_topk, ivf_topk
from crawler_spark.operators.textdedup import (
    fingerprint_col, lsh_band_pairs, ngram_jaccard_pairs, normalize_text,
    simhash_col,
)

QueryFn = Callable[[SparkSession, str], DataFrame]


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def q(name: str, sql: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        _QUERIES[name] = fn
        if sql is not None:
            _ORACLES[name] = sql
        return fn
    return deco


# Query names pinned to the FRONT of the export order. Round 5: the whole
# pack/prefix family that was hash-red in CORRECTNESS_r03/r04 — root cause
# found this round (the ORACLE side: DuckDB SUM(BIGINT) returns HUGEINT,
# whose fetchdf()/arrow() materializations are float64/decimal128 and
# hash-diverge from Spark's int64 under a type-sensitive canonicalization;
# fixed with ::BIGINT casts, regression-gated by tests/test_oracle_types.py)
# — plus st7 (whose late_data_flags carried the genuine plan-branch
# blocking race, ported to _det_block_expr this round) and two
# decomposition probes that localize any residual divergence:
# px3a (in-SQL integer checksum — removes the driver's hasher from the
# equation entirely) and px3c (same oracle as px3, Spark side the naive
# single-window prefix — distinguishes pack_sequences vs window semantics).
_DRIVER_PRIORITY = ("px3_sequence_pack", "mm4_multimodal_pack",
                    "px9_bpe_pack", "px10_loss_mask",
                    "st7_arrival_lag_quantiles",
                    "px3a_pack_checksum", "px3c_pack_naive_window")

# Query names that already carry a committed driver-correctness row
# (CORRECTNESS_r02.json + the 48 green rows of CORRECTNESS_r03.json). The
# driver's per-round snapshot records only the FIRST ~50 registry entries,
# so the export order below puts queries that have NEVER had a driver row
# first — maximizing cumulative driver-gate coverage across rounds.
# Previously-covered queries keep their committed evidence and fill the
# remaining slots in definition order. Refresh this set EVERY round close
# (round-3 verdict item 2: a stale set makes the driver re-sample the same
# 50 and cumulative coverage stops growing).
_DRIVER_COVERED_R03 = frozenset({
    "st4_sliding_window", "mm5_decode_algebra", "tx7_repetition",
    "dd9_line_dedup", "dd11_substring_repeats", "g2_anchor_agg",
    "rc2_adaptive_ttl", "tx8_token_budget_mix", "tx9_hash_split",
    "an6_sq_rerank", "g3_domain_cc", "g4_hits", "px4_weighted_sample",
    "tx10_unigram_logprob", "tx11_bm25", "an5_ivf_recall",
    "px1_corpus_pipeline", "px2_interleave_stats", "tx12_bigram_logprob",
    "px5_temperature_mix", "rc3_snapshot_diff", "wc1_warc_roundtrip",
    "g5_hop_distance", "g16_hyperanf", "ex1_boilerplate_strip",
    "j6_asof_join", "j7_range_join", "ks1_kmv_distinct",
    "st5_hypertable_rollup", "g6_redirect_resolve", "j8_time_window_join",
    "ks2_countmin", "mm6_span_stats", "mm7_media_dedup",
    "ks3_exact_quantile", "g7_triangle_count", "px6_stratified_split",
    "dd12_containment", "st6_late_data_policy", "g8_degree_histogram",
    "f9_url_template_mining", "dd13_lsh_recall", "mm8_frame_algebra",
    "so4_intersect", "a7_metrics_pivot", "w5_frontier_sharding",
    "w6_mercator_queues", "rc4_crawl_delay_budget",
})

_DRIVER_COVERED_R02 = frozenset({
    "j1_seen_anti_join", "f2_scope_same_source", "f3_scope_prefix",
    "f4_tld_scope", "f5_robots_gate", "p3_ua_assignment",
    "f6_blacklist_regex", "f8_asset_filter", "w1_priority_window",
    "w2_per_key_topk", "w3_global_topk", "w4_wave_admission",
    "a2_distinct_dedup", "a3_union_seen", "so1_except", "a4_metrics_rollup",
    "j2_dim_join", "j3_left_outer", "p1_url_canon", "p5_url_parts",
    "p2_span_derive", "p2_span_explode_media", "rc1_recrawl_due",
    "st1_tumbling_window", "st2_sessionize", "st3_event_dedup",
    "dd1_exact_dedup", "dd2_fingerprint", "dd3_minhash_lsh",
    "dd4_ngram_jaccard", "dd5_simhash", "tx1_lang_id", "tx2_quality_score",
    "tx3_token_count", "tx4_rolling_fingerprint", "an1_cosine_topk",
    "an2_ivf_topk", "an4_lsh_ann", "dd6_embedding_neardup",
    "dd10_semantic_keep", "an3_embedding_stats", "crawl_bfs",
    "mm1_multimodal_decode", "mm2_image_resize", "mm3_frame_sample",
    "dd7_dup_clusters", "dd8_canonical_keep", "tx5_decontaminate",
    "g1_hostrank", "tx6_pii_scrub",
})


# CORRECTNESS_r04's 45 green rows (standing rotation rule: refresh each
# round so the driver's ~50-row snapshot keeps sampling never-checked
# names and cumulative driver coverage grows).
_DRIVER_COVERED_R04 = frozenset({
    "a8_cohort_retention", "an7_pq_encode", "an8_adc_search",
    "dd14_minhash_estimate", "dd15_cdc_chunks", "dd16_lsh_band_planner",
    "f10_url_alias_rules", "g10_reciprocal_links", "g11_opic",
    "g12_personalized_pagerank", "g13_bowtie", "g14_lpa_communities",
    "g17_salsa", "g18_harmonic_centrality", "g19_effective_diameter",
    "g20_cocitation", "g9_kcore", "ix1_inverted_index",
    "ix2_conjunctive_search", "ix3_phrase_search", "ix4_vocab_ids",
    "km1_ivf_codebook", "ks4_hll_distinct", "ks5_theta_setops",
    "ks6_bloom_membership", "mm9_clip_gate", "p6_json_props",
    "px8_epoch_shuffle", "rc5_lastmod_priority", "rc6_adaptive_delay",
    "rc7_revalidation", "st8_ewma_rate", "st9_funnel", "tk1_bpe_train",
    "tk2_bpe_encode", "tk3_fertility", "tx13_ttr_hapax",
    "tx15_perplexity_buckets", "tx16_dsir", "tx17_perceptron_quality",
    "tx19_zipf_slope", "tx20_vocab_growth", "wc2_cdx_index",
    "wc3_warc_revisit", "wc4_wet_extract",
})


def _export_order(names) -> list[str]:
    covered = (_DRIVER_COVERED_R02 | _DRIVER_COVERED_R03
               | _DRIVER_COVERED_R04)
    pri = [n for n in _DRIVER_PRIORITY if n in names]
    new = [n for n in names
           if n not in covered and n not in _DRIVER_PRIORITY]
    old = [n for n in names if n in covered]
    return pri + new + old


def queries() -> dict[str, QueryFn]:
    return {n: _QUERIES[n] for n in _export_order(_QUERIES)}


def oracle_sql() -> dict[str, str]:
    return {n: _ORACLES[n] for n in _export_order(_QUERIES) if n in _ORACLES}


# =====================================================================
# Crawl-operator analogs over the driver tables (SURVEY.md §2 ids)
# =====================================================================

@q("j1_seen_anti_join", """
SELECT d.doc_id FROM documents d
WHERE d.lang = 'en' AND NOT EXISTS (
  SELECT 1 FROM documents s
  WHERE s.source IN ('src0','src1') AND s.n_chars > 200 AND s.doc_id = d.doc_id)
""")
def j1_seen_anti_join(spark, sf_dir):
    """F1/J1: frontier-minus-seen as a left anti-join (dedup admission)."""
    d = _t(spark, sf_dir, "documents")
    seen = d.where((F.col("source").isin("src0", "src1"))
                   & (F.col("n_chars") > 200)).select("doc_id")
    return d.where(F.col("lang") == "en").join(seen, "doc_id", "left_anti") \
            .select("doc_id")


@q("f2_scope_same_source", """
SELECT doc_id, source, lang FROM documents
WHERE source = 'src3' AND lang = 'en'
""")
def f2_scope_same_source(spark, sf_dir):
    """F2: same-domain scope filter analog (equality predicate)."""
    return (_t(spark, sf_dir, "documents")
            .where((F.col("source") == "src3") & (F.col("lang") == "en"))
            .select("doc_id", "source", "lang"))


@q("f3_scope_prefix", """
SELECT doc_id, source FROM documents WHERE source LIKE 'src1%'
""")
def f3_scope_prefix(spark, sf_dir):
    """F3: subdomain scope analog (prefix admission)."""
    return (_t(spark, sf_dir, "documents")
            .where(F.col("source").startswith("src1"))
            .select("doc_id", "source"))


@q("f4_tld_scope", """
SELECT doc_id, host FROM (
  SELECT doc_id,
         source || '.example.' || (CASE WHEN doc_id % 2 = 0 THEN 'com'
                                        ELSE 'org' END) AS host
  FROM documents)
WHERE regexp_replace(host, '\\.[a-z]+$', '') = 'src1.example'
""")
def f4_tld_scope(spark, sf_dir):
    """F4: TLD scope — admit the seed's registrable domain across any TLD
    (example.com and example.org both pass for seed src1.example.com)."""
    d = _t(spark, sf_dir, "documents")
    host = F.concat(F.col("source"), F.lit(".example."),
                    F.when(F.col("doc_id") % 2 == 0, "com").otherwise("org"))
    u = d.select("doc_id", host.alias("host"))
    return u.where(
        F.regexp_replace("host", r"\.[a-z]+$", "") == "src1.example")


@q("f5_robots_gate", """
SELECT doc_id, path FROM (
  SELECT doc_id, '/p' || CAST(doc_id % 13 AS VARCHAR) AS path,
         '/p' || substr(source, 4) AS deny,
         '/p' || substr(source, 4) || '0' AS allow
  FROM documents)
WHERE NOT starts_with(path, deny) OR starts_with(path, allow)
""")
def f5_robots_gate(spark, sf_dir):
    """F5 (SQL-expressible shape): robots allow/deny prefix gate with
    longest-match-wins — the allow rule is a strict extension of the deny
    rule, so 'denied unless the longer allow matches'. Full wildcard/$ rule
    semantics live in operators/robots.py (pytest-golden-tested)."""
    d = _t(spark, sf_dir, "documents")
    u = d.select(
        "doc_id",
        F.concat(F.lit("/p"), (F.col("doc_id") % 13).cast("string")).alias("path"),
        F.concat(F.lit("/p"), F.substring("source", 4, 10)).alias("deny"),
        F.concat(F.lit("/p"), F.substring("source", 4, 10), F.lit("0")).alias("allow"))
    return (u.where(~F.col("path").startswith(F.col("deny"))
                    | F.col("path").startswith(F.col("allow")))
            .select("doc_id", "path"))


_UA_LIST = ("UA-linux", "UA-windows", "UA-mac", "UA-firefox")

@q("p3_ua_assignment", f"""
SELECT doc_id, host,
       list_extract({list(_UA_LIST)!r},
                    CAST(('0x' || substr(md5(host), 1, 8))::BIGINT % 4 + 1 AS INT))
       AS agent
FROM (SELECT doc_id, source || '.example.com' AS host FROM documents)
""")
def p3_ua_assignment(spark, sf_dir):
    """P3: deterministic per-host user-agent pick (md5-keyed so the DuckDB
    twin agrees bit-for-bit; the engine path uses xxhash64 — fetch.ua_col)."""
    d = _t(spark, sf_dir, "documents")
    host = F.concat(F.col("source"), F.lit(".example.com"))
    u = d.select("doc_id", host.alias("host"))
    idx = (F.pmod(F.conv(F.substring(F.md5("host"), 1, 8), 16, 10).cast("long"),
                  F.lit(4)) + 1).cast("int")
    ua = F.element_at(F.array(*[F.lit(x) for x in _UA_LIST]), idx)
    return u.select("doc_id", "host", ua.alias("agent"))


@q("f6_blacklist_regex", """
SELECT doc_id FROM documents
WHERE NOT regexp_matches(text, '\\bslow\\b') AND lang <> 'zh'
""")
def f6_blacklist_regex(spark, sf_dir):
    """F6: regex blacklist — drop rows matching the deny pattern."""
    return (_t(spark, sf_dir, "documents")
            .where(~F.col("text").rlike(r"\bslow\b") & (F.col("lang") != "zh"))
            .select("doc_id"))


@q("f8_asset_filter", """
SELECT doc_id, url FROM (
  SELECT doc_id,
         source || '/' || doc_id ||
           (CASE WHEN doc_id % 5 = 0 THEN '.png'
                 WHEN doc_id % 5 = 1 THEN '.mp4' ELSE '.html' END) AS url
  FROM documents)
WHERE NOT (url LIKE '%.png' OR url LIKE '%.mp4')
""")
def f8_asset_filter(spark, sf_dir):
    """F8: asset-extension filter — media captured as spans, never crawled."""
    d = _t(spark, sf_dir, "documents")
    url = F.concat(F.col("source"), F.lit("/"), F.col("doc_id"),
                   F.when(F.col("doc_id") % 5 == 0, ".png")
                    .when(F.col("doc_id") % 5 == 1, ".mp4")
                    .otherwise(".html"))
    return (d.select("doc_id", url.alias("url"))
            .where(~(F.col("url").endswith(".png") | F.col("url").endswith(".mp4"))))


@q("w1_priority_window", """
SELECT doc_id, source, rnk FROM (
  SELECT doc_id, source,
         row_number() OVER (PARTITION BY source
                            ORDER BY n_chars DESC, doc_id) AS rnk
  FROM documents)
WHERE rnk <= 5
""")
def w1_priority_window(spark, sf_dir):
    """W1: frontier priority window — per-host rank, top-5 per host."""
    d = _t(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(F.desc("n_chars"), F.col("doc_id"))
    return (d.withColumn("rnk", F.row_number().over(w))
            .where(F.col("rnk") <= 5).select("doc_id", "source", "rnk"))


@q("w2_per_key_topk", """
SELECT event_id, user_id, rn FROM (
  SELECT event_id, user_id,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn
  FROM events)
WHERE rn <= 3
""")
def w2_per_key_topk(spark, sf_dir):
    """W2: per-host politeness batch = top-k per key in arrival order."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (e.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= 3).select("event_id", "user_id", "rn"))


@q("w3_global_topk", """
SELECT doc_id, n_chars FROM documents
ORDER BY n_chars DESC, doc_id LIMIT 10
""")
def w3_global_topk(spark, sf_dir):
    """W3: global budget cap — ORDER BY .. LIMIT (TakeOrderedAndProject)."""
    return (_t(spark, sf_dir, "documents")
            .orderBy(F.desc("n_chars"), F.col("doc_id"))
            .limit(10).select("doc_id", "n_chars"))


# =====================================================================
# W4: the wave-admission loop itself under the hash gate
# =====================================================================
#
# crawl_bfs (below) exercises the full engine but its substrate (blake2b
# synthetic web) is not SQL-derivable, so the driver can only rows-check it.
# w4 closes that gap: the SAME per-wave admission primitives the engine runs
# (dedup.anti_join_seen exact path + politeness.select_by_window with
# leftover carry-over, frontier.py:356-413) looped over three unrolled
# waves on an edge graph derived arithmetically from `documents` — which a
# DuckDB twin reproduces as unrolled CTEs. This puts the north-rule
# invariant (crawl ordering + URL-seen set under a per-host politeness
# budget, same seed list) under the driver's value-hash gate.
# Reference semantics: the crawl loop of /root/reference/src/scanner/
# scan.rs:73-78 with per-host delay (scan.rs:27) — wave = one politeness
# time-slice.

_W4_WAVES = 3
_W4_TOKENS = 7          # per-host budget per wave
_W4_SEED_MOD = 10       # doc_id % 10 == 0 → ~25 seeds/host: budget binds
_W4_EDGE_K = 3          # out-degree of the arithmetic link graph
_W4_PRI_MULT = 2654435761  # Knuth hash step; doc_id*mult fits int64 ≤ sf1


def _w4_oracle() -> str:
    sql = """docs AS (SELECT doc_id, source AS host FROM documents),
edges AS (SELECT d.doc_id AS src,
                 (d.doc_id * 31 + k.k * 97) % (SELECT count(*) FROM docs) AS dst
          FROM docs d CROSS JOIN (VALUES (1),(2),(3)) k(k)),
disc0 AS (SELECT doc_id FROM docs WHERE doc_id % 10 = 0),
pend1 AS (SELECT doc_id, host, 0 AS depth FROM docs WHERE doc_id % 10 = 0)"""
    for w in range(1, _W4_WAVES + 1):
        sql += f""",
sel{w} AS (SELECT doc_id, host, depth,
                  row_number() OVER (PARTITION BY host
                      ORDER BY (doc_id * {_W4_PRI_MULT}) % 1000, depth, doc_id
                  ) AS rn
           FROM pend{w}),
adm{w} AS (SELECT doc_id, host, {w} AS wave FROM sel{w} WHERE rn <= {_W4_TOKENS})"""
        if w < _W4_WAVES:
            sql += f""",
left{w} AS (SELECT doc_id, host, depth FROM sel{w} WHERE rn > {_W4_TOKENS}),
cand{w} AS (SELECT DISTINCT e.dst AS doc_id FROM edges e
            JOIN adm{w} a ON e.src = a.doc_id
            WHERE e.dst NOT IN (SELECT doc_id FROM disc{w - 1})),
disc{w} AS (SELECT doc_id FROM disc{w - 1} UNION ALL SELECT doc_id FROM cand{w}),
pend{w + 1} AS (SELECT c.doc_id, d.host, {w} AS depth
                FROM cand{w} c JOIN docs d USING (doc_id)
                UNION ALL SELECT doc_id, host, depth FROM left{w})"""
    unions = " UNION ALL ".join(
        f"SELECT doc_id, host, wave FROM adm{w}"
        for w in range(1, _W4_WAVES + 1))
    return "WITH " + sql + "\n" + unions


@q("w4_wave_admission", _w4_oracle())
def w4_wave_admission(spark, sf_dir):
    """W4: three politeness-gated crawl waves — seeds enter pending, each
    wave ranks pending per host (priority, depth, url) and admits the
    per-host token budget, unselected rows stay pending, admitted rows'
    outlinks are deduped against everything ever discovered and join the
    next wave's pending. Runs the engine's own operators; see block comment
    above for the oracle construction."""
    from crawler_spark.operators import politeness
    from crawler_spark.operators.dedup import anti_join_seen

    docs = (_t(spark, sf_dir, "documents")
            .select("doc_id", F.col("source").alias("host")))
    n_docs = docs.count()
    edges = (docs.select(
        F.col("doc_id").alias("src"),
        F.explode(F.array(*[F.lit(k) for k in range(1, _W4_EDGE_K + 1)]))
         .alias("k"))
        .select("src", ((F.col("src") * 31 + F.col("k") * 97) % n_docs)
                .alias("dst")))
    tokens = docs.select("host").distinct().select(
        "host", F.lit(float(_W4_TOKENS)).alias("tokens"))

    def as_pending(ids_with_host, depth_col):
        # select_by_window's contract columns; lpad makes the string sort
        # agree with the oracle's numeric doc_id sort
        return ids_with_host.select(
            "doc_id", "host",
            ((F.col("doc_id") * _W4_PRI_MULT) % 1000).alias("priority"),
            depth_col.alias("depth"),
            F.lpad(F.col("doc_id").cast("string"), 8, "0").alias("url_canon"))

    seeds = docs.where(F.col("doc_id") % _W4_SEED_MOD == 0)
    pending = as_pending(seeds, F.lit(0))
    discovered = seeds.select(F.col("doc_id").alias("url_hash"))
    admitted_waves = []
    for w in range(1, _W4_WAVES + 1):
        # eager wave barrier, exactly as run_crawl's loop: without it the
        # unrolled plan nests 3 waves of windows/anti-joins/unions into one
        # DAG and Catalyst planning dominates the (tiny-data) runtime
        pending = pending.localCheckpoint(eager=True)
        flagged = politeness.select_by_window(pending, tokens)
        adm = flagged.where("selected")
        admitted_waves.append(
            adm.select("doc_id", "host", F.lit(w).alias("wave")))
        if w == _W4_WAVES:
            break
        leftover = flagged.where(~F.col("selected")).drop("selected")
        cand = (edges.join(adm.select(F.col("doc_id").alias("src")), "src")
                .select(F.col("dst").alias("url_hash")).distinct())
        fresh = anti_join_seen(cand, discovered, None, spark)
        discovered = discovered.unionByName(fresh)
        new_pending = as_pending(
            fresh.select(F.col("url_hash").alias("doc_id"))
                 .join(docs, "doc_id"), F.lit(w))
        pending = new_pending.unionByName(leftover)
    out = admitted_waves[0]
    for a in admitted_waves[1:]:
        out = out.unionByName(a)
    return out.select("doc_id", "host", F.col("wave").cast("int").alias("wave"))


@q("a2_distinct_dedup", """
SELECT DISTINCT lang, source FROM documents
""")
def a2_distinct_dedup(spark, sf_dir):
    """A2: in-wave dedup = DISTINCT (hash aggregate, partial+final)."""
    return _t(spark, sf_dir, "documents").select("lang", "source").distinct()


@q("a3_union_seen", """
SELECT doc_id FROM documents WHERE doc_id % 3 = 0
UNION
SELECT doc_id FROM documents WHERE doc_id % 5 = 0
""")
def a3_union_seen(spark, sf_dir):
    """A3/SO2: seen-set union across phases (sitemap ∪ crawl)."""
    d = _t(spark, sf_dir, "documents")
    return (d.where(F.col("doc_id") % 3 == 0).select("doc_id")
            .union(d.where(F.col("doc_id") % 5 == 0).select("doc_id"))
            .distinct())


@q("so1_except", """
SELECT doc_id FROM documents WHERE doc_id % 3 = 0
EXCEPT
SELECT doc_id FROM documents WHERE doc_id % 5 = 0
""")
def so1_except(spark, sf_dir):
    """SO1: frontier ∖ seen as a set EXCEPT."""
    d = _t(spark, sf_dir, "documents")
    return (d.where(F.col("doc_id") % 3 == 0).select("doc_id")
            .exceptAll(d.where(F.col("doc_id") % 5 == 0).select("doc_id"))
            .distinct())


@q("a4_metrics_rollup", """
SELECT lang, source, count(*) AS fetched,
       CAST(sum(n_chars) AS BIGINT) AS bytes,
       CAST(sum(CASE WHEN n_chars < 100 THEN 1 ELSE 0 END) AS BIGINT) AS errors
FROM documents GROUP BY ROLLUP (lang, source)
""")
def a4_metrics_rollup(spark, sf_dir):
    """A4: per-wave/partition fetch metrics — grouped agg with ROLLUP."""
    d = _t(spark, sf_dir, "documents")
    return (d.rollup("lang", "source")
            .agg(F.count("*").alias("fetched"),
                 F.sum("n_chars").alias("bytes"),
                 F.sum(F.when(F.col("n_chars") < 100, 1).otherwise(0))
                 .alias("errors")))


@q("j2_dim_join", """
SELECT r.r_name, n.n_name, count(*) AS n_orders,
       round(sum(o.o_totalprice), 2) AS revenue
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name, n.n_name
""")
def j2_dim_join(spark, sf_dir):
    """J2-analog: fact ⋈ small dims — dims explicitly broadcast."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
            .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
            .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
            .groupBy("r_name", "n_name")
            .agg(F.count("*").alias("n_orders"),
                 F.round(F.sum("o_totalprice"), 2).alias("revenue")))


@q("j3_left_outer", """
SELECT c.c_custkey, c.c_mktsegment, count(o.o_orderkey) AS n_orders
FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
GROUP BY c.c_custkey, c.c_mktsegment
""")
def j3_left_outer(spark, sf_dir):
    """J3-analog: left outer join preserving zero-match keys (robots miss)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (c.join(o, o.o_custkey == c.c_custkey, "left_outer")
            .groupBy("c_custkey", "c_mktsegment")
            .agg(F.count("o_orderkey").alias("n_orders")))


@q("p1_url_canon", """
SELECT doc_id,
       lower(regexp_extract(url, '^([a-zA-Z]+)://', 1)) || '://' ||
       lower(regexp_extract(url, '^[a-zA-Z]+://([^/:?#]+)', 1)) ||
       regexp_replace(regexp_extract(url, '^[a-zA-Z]+://[^/]*(/[^#]*)', 1),
                      ':80/', '/') AS url_canon
FROM (SELECT doc_id,
             'HTTP://' || upper(source) || '.Example.COM:80/Path/' ||
             doc_id || '?q=' || lang || '#Frag' AS url
      FROM documents)
""")
def p1_url_canon(spark, sf_dir):
    """P1 (SQL-expressible subset): scheme/host lowercase, :80 strip,
    fragment strip. Full UDF canonicalizer is pytest-golden-tested."""
    d = _t(spark, sf_dir, "documents")
    url = F.concat(F.lit("HTTP://"), F.upper(F.col("source")),
                   F.lit(".Example.COM:80/Path/"), F.col("doc_id"),
                   F.lit("?q="), F.col("lang"), F.lit("#Frag"))
    with_url = d.select("doc_id", url.alias("url"))
    canon = F.concat(
        F.lower(F.regexp_extract("url", r"^([a-zA-Z]+)://", 1)), F.lit("://"),
        F.lower(F.regexp_extract("url", r"^[a-zA-Z]+://([^/:?#]+)", 1)),
        F.regexp_replace(
            F.regexp_extract("url", r"^[a-zA-Z]+://[^/]*(/[^#]*)", 1),
            ":80/", "/"))
    return with_url.select("doc_id", canon.alias("url_canon"))


@q("p5_url_parts", """
SELECT doc_id,
       regexp_extract(url, '^[a-z]+://([^/:?#]+)', 1) AS host,
       regexp_extract(url, '^[a-z]+://[^/]*(/[^?#]*)', 1) AS path
FROM (SELECT doc_id, 'http://' || source || '.example.com/p/' || doc_id ||
             '?x=1' AS url FROM documents)
""")
def p5_url_parts(spark, sf_dir):
    """P5: host/path derivation from canonical URLs (native regex)."""
    d = _t(spark, sf_dir, "documents")
    url = F.concat(F.lit("http://"), F.col("source"),
                   F.lit(".example.com/p/"), F.col("doc_id"), F.lit("?x=1"))
    u = d.select("doc_id", url.alias("url"))
    return u.select(
        "doc_id",
        F.regexp_extract("url", r"^[a-z]+://([^/:?#]+)", 1).alias("host"),
        F.regexp_extract("url", r"^[a-z]+://[^/]*(/[^?#]*)", 1).alias("path"))


# =====================================================================
# Interleaved-span payload (input_hint shape) derived from the flat table
# =====================================================================

_SPAN_SQL = """
SELECT doc_id,
  flatten(list_transform(range(0, n_chunks), i -> CASE WHEN (i % 3) = 2 THEN
    [struct_pack(kind := 'text',
                 text := array_to_string(list_slice(words, i*8+1, i*8+8), ' '),
                 media_ref := '', "offset" := (i*10)::INT),
     struct_pack(kind := 'media', text := '',
                 media_ref := source || '/' || doc_id || '/m' || i,
                 "offset" := (i*10+9)::INT)]
  ELSE
    [struct_pack(kind := 'text',
                 text := array_to_string(list_slice(words, i*8+1, i*8+8), ' '),
                 media_ref := '', "offset" := (i*10)::INT)]
  END)) AS spans
FROM (SELECT doc_id, source, regexp_split_to_array(trim(text), '\\s+') AS words,
             ((len(regexp_split_to_array(trim(text), '\\s+')) + 7) // 8) AS n_chunks
      FROM documents)
"""


def _spans_df(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    words = F.split(F.trim(F.col("text")), r"\s+")
    base = d.select("doc_id", "source", words.alias("words"),
                    F.ceil(F.size(words) / 8.0).cast("int").alias("n_chunks"))

    def chunk_text(i):
        return F.array_join(F.slice(F.col("words"), i * 8 + 1, 8), " ")

    def text_span(i):
        return F.struct(F.lit("text").alias("kind"),
                        chunk_text(i).alias("text"),
                        F.lit("").alias("media_ref"),
                        (i * 10).cast("int").alias("offset"))

    def media_span(i):
        return F.struct(
            F.lit("media").alias("kind"), F.lit("").alias("text"),
            F.concat(F.col("source"), F.lit("/"), F.col("doc_id"),
                     F.lit("/m"), i).alias("media_ref"),
            (i * 10 + 9).cast("int").alias("offset"))

    spans = F.flatten(F.transform(
        F.sequence(F.lit(0), F.col("n_chunks") - 1),
        lambda i: F.when((i % 3) == 2, F.array(text_span(i), media_span(i)))
                   .otherwise(F.array(text_span(i)))))
    return base.select("doc_id", spans.alias("spans"))


@q("p2_span_derive", """
WITH spans AS (""" + _SPAN_SQL + """)
SELECT doc_id,
       array_to_string(list_transform(spans, s ->
           s.kind || chr(31) || s.text || chr(31) || s.media_ref
                  || chr(31) || s."offset"), chr(30)) AS spans_flat
FROM spans
""")
def p2_span_derive(spark, sf_dir):
    """P2: interleaved text+media span arrays (the input_hint payload),
    derived deterministically from the flat documents table.

    Driver-gate projection note: the driver's comparator hashes via pandas
    sort_values, and array<struct> is unhashable there — so this query emits
    a hash-stable flat serialization (one string per doc: spans joined by
    \\x1e, fields by \\x1f — deterministic on both engines, no JSON-encoder
    variance). The typed array<struct> shape itself is covered by
    p2_span_explode_media below plus tests/test_parse.py byte-offset goldens
    and the e2e span-sequence equality."""
    s = _spans_df(spark, sf_dir)
    flat = F.array_join(
        F.transform("spans", lambda sp: F.concat_ws(
            "\x1f", sp.kind, sp.text, sp.media_ref,
            sp.offset.cast("string"))),
        "\x1e")
    return s.select("doc_id", flat.alias("spans_flat"))


@q("p2_span_explode_media", """
WITH spans AS (""" + _SPAN_SQL + """)
SELECT doc_id, s.media_ref AS media_ref, s."offset" AS span_offset
FROM (SELECT doc_id, unnest(spans) AS s FROM spans)
WHERE s.kind = 'media'
""")
def p2_span_explode_media(spark, sf_dir):
    """P2-explode: media outlink extraction from span arrays (the engine's
    outlink stage shape: explode + kind filter)."""
    s = _spans_df(spark, sf_dir)
    return (s.select("doc_id", F.explode("spans").alias("s"))
            .where(F.col("s.kind") == "media")
            .select("doc_id", F.col("s.media_ref").alias("media_ref"),
                    F.col("s.offset").alias("span_offset")))

@q("rc1_recrawl_due", """
WITH last AS (
  SELECT user_id, max(ts) AS last_ts FROM events GROUP BY user_id
), mx AS (SELECT max(ts) AS mx FROM events)
SELECT l.user_id, CAST(floor(epoch(l.last_ts)) AS BIGINT) AS last_seen,
       CAST(floor((floor(epoch(m.mx)) - floor(epoch(l.last_ts))) / 3600)
            AS BIGINT) AS age_hours
FROM last l, mx m
WHERE l.last_ts <= m.mx - INTERVAL 12 HOUR
""")
def rc1_recrawl_due(spark, sf_dir):
    """Recrawl scheduling analog (operators/recrawl.py TTL rule): keys whose
    latest activity is >= 12h staler than the stream frontier, with
    staleness age — one hash aggregate + broadcast of the scalar frontier.
    floor() on both engines: DuckDB's double->BIGINT cast rounds, Spark's
    unix_timestamp truncates."""
    e = _t(spark, sf_dir, "events")
    last = e.groupBy("user_id").agg(F.max("ts").alias("last_ts"))
    mx = e.agg(F.max("ts").alias("mx"))
    return (last.crossJoin(F.broadcast(mx))
            .where(F.col("last_ts") <= F.col("mx") - F.expr("INTERVAL 12 HOURS"))
            .select("user_id",
                    F.unix_timestamp("last_ts").cast("long").alias("last_seen"),
                    F.floor((F.unix_timestamp("mx")
                             - F.unix_timestamp("last_ts")) / 3600)
                    .cast("long").alias("age_hours")))


# =====================================================================
# Streaming-analog queries (event time, sessions, late-data dedup)
# =====================================================================

@q("st1_tumbling_window", """
SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS win_start,
       count(*) AS n, round(sum(value), 2) AS sum_value
FROM events GROUP BY 1
""")
def st1_tumbling_window(spark, sf_dir):
    """Tumbling 1h event-time window agg (batch form of the streaming op)."""
    e = _t(spark, sf_dir, "events")
    return (e.groupBy(F.unix_timestamp(F.date_trunc("hour", "ts"))
                      .alias("win_start"))
            .agg(F.count("*").alias("n"),
                 F.round(F.sum("value"), 2).alias("sum_value")))


@q("st2_sessionize", """
WITH lagged AS (
  SELECT user_id, event_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
              OR CAST(epoch(ts) AS BIGINT) - CAST(epoch(lag(ts) OVER w) AS BIGINT) > 1800
              THEN 1 ELSE 0 END AS brk
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
SELECT user_id, CAST(sum(brk) AS BIGINT) AS n_sessions,
       count(*) AS n_events
FROM lagged GROUP BY user_id
""")
def st2_sessionize(spark, sf_dir):
    """Session windows (30-min gap) via lag + cumulative break counting —
    the batch twin of streaming session windows."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lagged = e.withColumn(
        "brk",
        F.when(F.lag("ts").over(w).isNull()
               | ((F.unix_timestamp("ts")
                   - F.unix_timestamp(F.lag("ts").over(w))) > 1800), 1)
        .otherwise(0))
    return (lagged.groupBy("user_id")
            .agg(F.sum("brk").cast("long").alias("n_sessions"),
                 F.count("*").alias("n_events")))


@q("st3_event_dedup", """
SELECT user_id, event_type, min(event_id) AS event_id
FROM events GROUP BY user_id, event_type
""")
def st3_event_dedup(spark, sf_dir):
    """Late-data dedup: keep first event per (user, type) — the idempotent
    re-discovery handling of the crawl (SURVEY.md §2.9)."""
    e = _t(spark, sf_dir, "events")
    return (e.groupBy("user_id", "event_type")
            .agg(F.min("event_id").alias("event_id")))


@q("st4_sliding_window", """
WITH x AS (SELECT CAST(floor(epoch(ts)) AS BIGINT) AS t, value FROM events),
e AS (SELECT (t // 900) * 900 - k * 900 AS win_start, value
      FROM x CROSS JOIN (SELECT unnest(range(0, 4)) AS k))
SELECT win_start, count(*) AS n, round(sum(value), 2) AS sum_value
FROM e GROUP BY win_start
""")
def st4_sliding_window(spark, sf_dir):
    """Sliding 1h/15min event-time window agg: each event contributes to 4
    overlapping windows (the oracle fans each event out to its 4 aligned
    window starts explicitly). The batch body IS the streaming twin
    (streaming/windows.sliding_counts) run on the batch frame — one plan,
    two execution modes; stream==batch asserted in test_streaming."""
    from crawler_spark.streaming.windows import sliding_counts
    return sliding_counts(_t(spark, sf_dir, "events"))


# =====================================================================
# Training-data dedup family (documents table)
# =====================================================================

@q("dd1_exact_dedup", """
SELECT min(doc_id) AS rep_id, count(*) AS n_dups
FROM documents
GROUP BY trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))
""")
def dd1_exact_dedup(spark, sf_dir):
    """Exact dedup on normalized text: representative = min(doc_id)."""
    d = _t(spark, sf_dir, "documents")
    return (d.groupBy(normalize_text(F.col("text")).alias("k"))
            .agg(F.min("doc_id").alias("rep_id"), F.count("*").alias("n_dups"))
            .select("rep_id", "n_dups"))


@q("dd2_fingerprint", """
SELECT doc_id, md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp
FROM documents
""")
def dd2_fingerprint(spark, sf_dir):
    """Document fingerprinting: md5 of casefolded whitespace-collapsed text."""
    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", fingerprint_col(F.col("text")).alias("fp"))


_SHINGLE_SQL = """
  SELECT doc_id, source, CASE WHEN len(words) >= 3 THEN
           list_distinct(list_transform(range(0, len(words) - 2),
             j -> words[j+1] || ' ' || words[j+2] || ' ' || words[j+3]))
         ELSE [array_to_string(words, ' ')] END AS sh
  FROM (SELECT doc_id, source,
               regexp_split_to_array(trim(text), '\\s+') AS words
        FROM documents)
"""

# dd3's CTE chain and final pair-select are factored out so dd7/dd8 can
# reuse the exact same candidate-pair SQL under a WITH RECURSIVE prefix —
# the oracle pair graph must be bit-identical to dd3's.
_LSH_CTES = """sh AS (""" + _SHINGLE_SQL + """),
sig AS (
  SELECT doc_id,
         list_min(list_transform(sh, s -> md5('0:' || s))) AS mh0,
         list_min(list_transform(sh, s -> md5('1:' || s))) AS mh1,
         list_min(list_transform(sh, s -> md5('2:' || s))) AS mh2,
         list_min(list_transform(sh, s -> md5('3:' || s))) AS mh3,
         list_min(list_transform(sh, s -> md5('4:' || s))) AS mh4,
         list_min(list_transform(sh, s -> md5('5:' || s))) AS mh5,
         list_min(list_transform(sh, s -> md5('6:' || s))) AS mh6,
         list_min(list_transform(sh, s -> md5('7:' || s))) AS mh7
  FROM sh),
bands AS (
  SELECT doc_id, band, key FROM (
    SELECT doc_id, unnest([
      struct_pack(band := 0, key := mh0 || '|' || mh1),
      struct_pack(band := 1, key := mh2 || '|' || mh3),
      struct_pack(band := 2, key := mh4 || '|' || mh5),
      struct_pack(band := 3, key := mh6 || '|' || mh7)]) AS bk
    FROM sig) t(doc_id, bk),
  LATERAL (SELECT bk.band AS band, bk.key AS key)),
sized AS (
  SELECT doc_id, band, key,
         count(*) OVER (PARTITION BY band, key) AS bucket_n
  FROM bands)"""

_LSH_PAIRS_SQL = """
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_shared_bands
FROM sized a JOIN sized b ON a.band = b.band AND a.key = b.key
WHERE a.doc_id < b.doc_id AND a.bucket_n <= 64 AND b.bucket_n <= 64
GROUP BY 1, 2
"""

@q("dd3_minhash_lsh", "WITH " + _LSH_CTES + _LSH_PAIRS_SQL)
def dd3_minhash_lsh(spark, sf_dir):
    """MinHash (8 perms, md5-keyed) + banded LSH (4 bands x 2) candidate
    near-dup pairs. Hex-min == value-min, so Spark and DuckDB agree
    bit-for-bit with zero UDFs on either side."""
    d = _t(spark, sf_dir, "documents")
    return lsh_band_pairs(d, n_perm=8, band_size=2, shingle_n=3, max_bucket=64)


@q("dd4_ngram_jaccard", """
WITH sh AS (""" + _SHINGLE_SQL + """),
ex AS (SELECT doc_id, unnest(sh) AS s FROM sh),
df AS (SELECT s, count(*) AS df FROM ex GROUP BY s),
fex AS (SELECT ex.doc_id, ex.s FROM ex JOIN df ON ex.s = df.s
        WHERE df.df <= 64),
cands AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM fex a JOIN fex b ON a.s = b.s AND a.doc_id < b.doc_id)
SELECT doc_a, doc_b,
       round(len(list_intersect(sa.sh, sb.sh)) * 1.0
             / len(list_distinct(sa.sh || sb.sh)), 4) AS jaccard
FROM cands
JOIN sh sa ON sa.doc_id = doc_a
JOIN sh sb ON sb.doc_id = doc_b
WHERE round(len(list_intersect(sa.sh, sb.sh)) * 1.0
            / len(list_distinct(sa.sh || sb.sh)), 4) >= 0.8
""")
def dd4_ngram_jaccard(spark, sf_dir):
    """Word-3-gram Jaccard >= 0.8 near-dup pairs, two-stage: candidates
    from df<=64 shingle buckets (max_df is the hot-bucket quadratic
    guard), TRUE Jaccard over the full shingle sets per candidate — see
    ngram_jaccard_pairs. At this corpus max df is ~7 so the cap is
    semantics-neutral here, but the plan carries the guard."""
    d = _t(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(d, shingle_n=3, threshold=0.8, max_df=64)


@q("dd5_simhash", """
SELECT doc_id, CAST(simhash AS BIGINT) AS simhash FROM (
  SELECT doc_id, (
    SELECT sum(CASE WHEN v > 0 THEN 1 << b ELSE 0 END)
    FROM (SELECT b, sum(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS v
          FROM (SELECT unnest(range(0, 16)) AS b),
               (SELECT unnest(list_transform(
                  regexp_split_to_array(trim(d.text), '\\s+'),
                  w -> ('0x' || substr(md5(w), 1, 8))::BIGINT)) AS h)
          GROUP BY b))
  AS simhash FROM documents d)
""")
def dd5_simhash(spark, sf_dir):
    """16-bit SimHash over words (md5-derived word hashes, +-1 bit votes).
    Word hashes are projected once, then the 16 per-bit vote aggregates run
    over the materialized array (no per-bit recompute of the md5 transform)."""
    from crawler_spark.operators.textdedup import (
        simhash_from_hashes, word_hashes_col,
    )
    d = _t(spark, sf_dir, "documents")
    h = d.select("doc_id", word_hashes_col(F.col("text")).alias("h"))
    return h.select("doc_id", simhash_from_hashes(F.col("h"), 16).alias("simhash"))


# =====================================================================
# Text analysis (documents table)
# =====================================================================

_NW = "len(regexp_split_to_array(trim(text), '\\s+'))"


def _hits(markers):  # DuckDB twin of marker_hits_col (whole-word equality)
    inlist = ", ".join(f"'{m}'" for m in markers)
    return (f"len(list_filter(regexp_split_to_array(trim(text), '\\s+'), "
            f"w -> w IN ({inlist})))")


from crawler_spark.functions.text import LANG_MARKERS as _LM

# the bare CASE is factored out so px1's corpus pipeline can reuse the
# exact argmax-with-threshold semantics tx1 is verified on, as a filter
_LANG_CASE = f"""CASE
    WHEN {_hits(_LM['es'])} * 1.0 / {_NW} > greatest(0.02,
         {_hits(_LM['en'])} * 1.0 / {_NW}, {_hits(_LM['fr'])} * 1.0 / {_NW},
         {_hits(_LM['de'])} * 1.0 / {_NW}) THEN 'es'
    WHEN {_hits(_LM['de'])} * 1.0 / {_NW} > greatest(0.02,
         {_hits(_LM['en'])} * 1.0 / {_NW}, {_hits(_LM['fr'])} * 1.0 / {_NW}) THEN 'de'
    WHEN {_hits(_LM['fr'])} * 1.0 / {_NW} > greatest(0.02,
         {_hits(_LM['en'])} * 1.0 / {_NW}) THEN 'fr'
    WHEN {_hits(_LM['en'])} * 1.0 / {_NW} > 0.02 THEN 'en'
    ELSE 'und'
  END"""

_LANG_SQL = f"""
SELECT doc_id, lang,
  {_LANG_CASE} AS lang_pred
FROM documents
"""

@q("tx1_lang_id", _LANG_SQL)
def tx1_lang_id(spark, sf_dir):
    """Heuristic language-ID: argmax marker-word density, 'und' below 2%.
    Ties broken by later-checked language winning only on strict >."""
    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", "lang",
                    lang_id_col(F.col("text")).alias("lang_pred"))


# quality expression factored so dd8's canonical-keep oracle scores with
# the exact same formula tx2 is gated on
_QUALITY_EXPR = f"""round(
  0.4 * (CASE WHEN {_NW} BETWEEN 20 AND 10000 THEN 1.0 ELSE 0.3 END)
+ 0.3 * (CASE WHEN (length(text) - ({_NW} - 1)) * 1.0 / {_NW} BETWEEN 2.5 AND 12.0
         THEN 1.0 ELSE 0.4 END)
+ 0.3 * (CASE WHEN {_hits(_LM['en'])} * 1.0 / {_NW} > 0.01 THEN 1.0 ELSE 0.5 END)
, 4)::DOUBLE"""

@q("tx2_quality_score",
   f"SELECT doc_id, {_QUALITY_EXPR} AS quality FROM documents")
def tx2_quality_score(spark, sf_dir):
    """Quality gate: length band + mean word length + stopword signal."""
    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", quality_score_col(F.col("text")).alias("quality"))


@q("tx3_token_count", f"""
SELECT doc_id, {_NW} AS n_words,
       CAST(list_sum(list_transform(regexp_split_to_array(trim(text), '\\s+'),
            w -> CAST(ceil(length(w) / 4.0) AS BIGINT))) AS BIGINT) AS n_tokens
FROM documents
""")
def tx3_token_count(spark, sf_dir):
    """Token counting: whitespace words + BPE-ish ceil(len/4) estimate."""
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(F.split(F.trim("text"), r"\s+")).alias("n_words"),
        token_count_col(F.col("text")).alias("n_tokens"))


_WH_SQL = ("list_transform(regexp_split_to_array(trim(text), '\\s+'), "
           "w -> ('0x' || substr(md5(w), 1, 8))::BIGINT)")

@q("tx4_rolling_fingerprint", f"""
WITH h AS (SELECT doc_id, {_WH_SQL} AS wh FROM documents),
r AS (
  SELECT doc_id, CASE WHEN len(wh) >= 4 THEN
    list_transform(range(0, len(wh) - 3), i ->
      list_reduce(list_prepend(0::BIGINT, list_slice(wh, i + 1, i + 4)),
                  (acc, x) -> (acc * 69069 + x) % 2147483647))
  ELSE
    [list_reduce(list_prepend(0::BIGINT, wh),
                 (acc, x) -> (acc * 69069 + x) % 2147483647)]
  END AS rolls FROM h)
SELECT doc_id, len(rolls)::BIGINT AS n_windows,
       list_min(rolls) AS min_rh,
       len(list_filter(rolls, x -> x % 8 = 0))::BIGINT AS n_sampled
FROM r
""")
def tx4_rolling_fingerprint(spark, sf_dir):
    """Rolling-hash (Rabin-Karp window) document fingerprinting with
    content-defined sampling (winnowing family): per doc, the number of
    4-word windows, the minimum rolling hash, and the count of mod-8-sampled
    windows — shift/insertion-robust near-dup signatures."""
    from crawler_spark.operators.textdedup import (
        rolling_fingerprint_cols, word_hashes_col,
    )
    d = _t(spark, sf_dir, "documents")
    h = d.select("doc_id", word_hashes_col(F.col("text")).alias("h"))
    return h.select("doc_id", *rolling_fingerprint_cols(F.col("h"), 4, 8))


# =====================================================================
# Similarity search (embeddings table)
# =====================================================================

@q("an1_cosine_topk", """
WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qvec
           FROM embeddings WHERE vec_id IN (0, 1, 2)),
scored AS (
  SELECT q.qid, e.vec_id,
         round(list_cosine_similarity(e.embedding::DOUBLE[], q.qvec), 4) AS cosine
  FROM embeddings e, q WHERE e.vec_id <> q.qid)
SELECT qid, vec_id, cosine, rnk FROM (
  SELECT *, row_number() OVER (PARTITION BY qid
                               ORDER BY cosine DESC, vec_id) AS rnk
  FROM scored)
WHERE rnk <= 10
""")
def an1_cosine_topk(spark, sf_dir):
    """Brute-force cosine top-10 for a 3-query batch (exact ANN baseline)."""
    e = _t(spark, sf_dir, "embeddings")
    qs = e.where(F.col("vec_id").isin(0, 1, 2))
    return brute_force_topk(e, qs, k=10).select("qid", "vec_id", "cosine", "rnk")


@q("an2_ivf_topk", """
WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qvec, label AS qcell
           FROM embeddings WHERE vec_id IN (0, 1, 2)),
scored AS (
  SELECT q.qid, e.vec_id,
         round(list_cosine_similarity(e.embedding::DOUBLE[], q.qvec), 4) AS cosine
  FROM embeddings e JOIN q ON e.label = q.qcell
  WHERE e.vec_id <> q.qid)
SELECT qid, vec_id, cosine, rnk FROM (
  SELECT *, row_number() OVER (PARTITION BY qid
                               ORDER BY cosine DESC, vec_id) AS rnk
  FROM scored)
WHERE rnk <= 10
""")
def an2_ivf_topk(spark, sf_dir):
    """IVF-1-probe ANN: scan only the query's coarse cell (label)."""
    e = _t(spark, sf_dir, "embeddings")
    qs = e.where(F.col("vec_id").isin(0, 1, 2))
    return ivf_topk(e, qs, k=10).select("qid", "vec_id", "cosine", "rnk")


from crawler_spark.operators.similarity import rh_planes as _rh_planes  # noqa: E402


def _plane_sql(p: list[float]) -> str:
    return "[" + ", ".join(repr(x) for x in p) + "]"


def _int_plane_dot_sql(vec_expr: str, p: list[float]) -> str:
    """DuckDB twin of similarity.plane_dot_int_col: quantize components to
    1e-6 BIGINTs and the 3-decimal plane coords to integers; the integer
    sum's sign is associativity-free, so it matches Spark's fold exactly
    even for near-orthogonal vectors (a raw FP dot could bucket the same
    row differently in the two engines)."""
    pint = "[" + ", ".join(str(int(round(x * 1000))) for x in p) + "]"
    return (f"list_sum(list_transform(range(1, {len(p) + 1}), i -> "
            f"CAST(round(({vec_expr})[i] * 1000000) AS BIGINT)"
            f" * ({pint})[i]))")


_PLANES = _rh_planes()
_SIG_SQL = " + ".join(
    f"(CASE WHEN {_int_plane_dot_sql('embedding::DOUBLE[]', p)} > 0 "
    f"THEN {1 << b} ELSE 0 END)"
    for b, p in enumerate(_PLANES))


@q("an4_lsh_ann", f"""
WITH sig AS (
  SELECT vec_id, embedding, ({_SIG_SQL}) AS bucket FROM embeddings),
q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qvec, bucket AS qbucket
      FROM sig WHERE vec_id IN (0, 1, 2)),
scored AS (
  SELECT q.qid, s.vec_id,
         round(list_cosine_similarity(s.embedding::DOUBLE[], q.qvec), 4) AS cosine
  FROM sig s JOIN q ON s.bucket = q.qbucket
  WHERE s.vec_id <> q.qid)
SELECT qid, vec_id, cosine, rnk FROM (
  SELECT *, row_number() OVER (PARTITION BY qid
                               ORDER BY cosine DESC, vec_id) AS rnk
  FROM scored)
WHERE rnk <= 10
""")
def an4_lsh_ann(spark, sf_dir):
    """Random-hyperplane LSH ANN: sign-pattern buckets (4 planes -> 16
    buckets), probe scans only the query's bucket — the scale path when no
    coarse quantizer exists (at 100 TB the corpus is partitioned by bucket)."""
    from crawler_spark.operators.similarity import lsh_topk
    e = _t(spark, sf_dir, "embeddings")
    qs = e.where(F.col("vec_id").isin(0, 1, 2))
    return lsh_topk(e, qs, _PLANES, k=10).select("qid", "vec_id", "cosine", "rnk")


def _band_sig_sql(vec_expr: str, band: int, band_size: int = 2) -> str:
    """DuckDB twin of similarity.rh_band_cols for one band (quantized
    integer plane dots — see _int_plane_dot_sql)."""
    terms = []
    for k in range(band_size):
        p = _PLANES[band * band_size + k]
        terms.append(
            f"(CASE WHEN {_int_plane_dot_sql(vec_expr, p)} > 0 "
            f"THEN {1 << k} ELSE 0 END)")
    return " + ".join(terms)


@q("dd6_embedding_neardup", f"""
WITH nrm AS (
  SELECT vec_id, label, embedding::DOUBLE[] AS ev,
         sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS n
  FROM embeddings),
nv AS (
  SELECT vec_id, label, list_transform(ev, x -> x / n) AS v FROM nrm),
cn AS (SELECT label, count(*) AS cn FROM embeddings GROUP BY label),
blocked AS (
  SELECT vec_id, label, v, bk.band AS band, bk.sub AS sub FROM (
    SELECT nv.vec_id, nv.label, nv.v,
           unnest(CASE WHEN cn.cn > 64 THEN
             [struct_pack(band := 0, sub := {{B0}}),
              struct_pack(band := 1, sub := {{B1}})]
           ELSE [struct_pack(band := 0, sub := 0)] END) AS bk
    FROM nv JOIN cn ON nv.label = cn.label) t(vec_id, label, v, bk),
  LATERAL (SELECT bk.band AS band, bk.sub AS sub))
SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b,
       round(list_dot_product(a.v, b.v), 4) AS cosine
FROM blocked a JOIN blocked b
  ON a.label = b.label AND a.band = b.band AND a.sub = b.sub
 AND a.vec_id < b.vec_id
WHERE round(list_dot_product(a.v, b.v), 4) >= 0.4
""".replace("{B0}", _band_sig_sql("nv.v", 0))
   .replace("{B1}", _band_sig_sql("nv.v", 1)))
def dd6_embedding_neardup(spark, sf_dir):
    """Embedding-cosine near-dup pairs, blocked by coarse cell, with hot
    cells (> max_cell=64 rows) sub-blocked by 2 bands of 2-plane RH-LSH
    signatures (the quadratic guard — see embedding_neardup_pairs). At
    sf0.01 every cell is <= 64 wide so the guard is semantics-neutral for
    the gate; at sf0.1+ it activates and bounds the pair fan-out. Threshold
    0.4 sits at this synthetic corpus's similarity ceiling (max in-cell
    cosine ~0.47) so the operator produces verifiable pairs; production
    near-dup thresholds are ~0.95 on real embeddings."""
    from crawler_spark.operators.similarity import embedding_neardup_pairs
    e = _t(spark, sf_dir, "embeddings")
    return embedding_neardup_pairs(e, threshold=0.4, max_cell=64,
                                   planes=_PLANES, band_size=2)


# SemDeDup (semantic dedup): connected components over the EMBEDDING
# near-dup pair graph (dd6), keep the component-minimum vector, drop the
# rest — the embedding-space analog of dd7/dd8's text-pair clustering. The
# oracle nests dd6's full pair SQL as a CTE and closes it transitively
# with the same recursive-CTE idiom as dd7.
def _dd10_oracle() -> str:
    return f"""WITH RECURSIVE pairs AS ({_ORACLES['dd6_embedding_neardup']}),
edges AS (SELECT vec_a AS u, vec_b AS v FROM pairs
          UNION SELECT vec_b, vec_a FROM pairs),
cc(node, lbl) AS (
  SELECT u, u FROM (SELECT DISTINCT u FROM edges) t(u)
  UNION
  SELECT e.v, cc.lbl FROM cc JOIN edges e ON e.u = cc.node),
lab AS (SELECT node, min(lbl) AS cluster FROM cc GROUP BY node)
SELECT e.vec_id, coalesce(l.cluster, e.vec_id) AS cluster,
       (coalesce(l.cluster, e.vec_id) = e.vec_id) AS keep
FROM embeddings e LEFT JOIN lab l ON l.node = e.vec_id
"""


@q("dd10_semantic_keep", _dd10_oracle())
def dd10_semantic_keep(spark, sf_dir):
    """SemDeDup: semantic near-duplicate pruning over the embedding
    column — dd6's cell-blocked cosine pair graph, transitively closed by
    the shuffle-native large-star/small-star CC (operators/clusters.py),
    keeping exactly one vector (the component minimum) per semantic
    cluster and every singleton. Same keep-one-per-cluster contract as
    dd8, driven by embedding geometry instead of text shingles."""
    from crawler_spark.operators.clusters import dup_clusters
    from crawler_spark.operators.similarity import embedding_neardup_pairs

    e = _t(spark, sf_dir, "embeddings")
    pairs = embedding_neardup_pairs(e, threshold=0.4, max_cell=64,
                                    planes=_PLANES, band_size=2)
    clustered = dup_clusters(e.select("vec_id"), pairs, id_col="vec_id",
                             src="vec_a", dst="vec_b")
    return clustered.select(
        "vec_id", "cluster",
        (F.col("cluster") == F.col("vec_id")).alias("keep"))


@q("an3_embedding_stats", """
SELECT label, count(*) AS n,
       round(avg(sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))), 4) AS avg_norm
FROM embeddings GROUP BY label
""")
def an3_embedding_stats(spark, sf_dir):
    """Per-cell embedding stats (norm audit for the ANN index)."""
    from crawler_spark.operators.similarity import norm_col
    e = _t(spark, sf_dir, "embeddings")
    return (e.groupBy("label")
            .agg(F.count("*").alias("n"),
                 F.round(F.avg(norm_col(F.col("embedding").cast("array<double>"))), 4)
                 .alias("avg_norm")))


# =====================================================================
# Rows-only queries (non-SQL-expressible; pytest-oracled instead)
# =====================================================================

@q("crawl_bfs")
def crawl_bfs(spark, sf_dir):
    """The flagship crawl itself (wave loop over the deterministic synthetic
    web; sf_dir unused — the substrate is generated, not driver data).
    Oracle: tests/oracle.py single-threaded BFS (pytest e2e equality);
    not ANSI-SQL-expressible (iterative + stateful)."""
    from crawler_spark.plans.frontier import run_crawl
    from crawler_spark.sources.fetch import SimulatedFetcher
    from crawler_spark.sources.webgraph import (
        WebGraphConfig, gen_seeds, to_spark,
    )
    from crawler_spark.spec import CrawlJobSpec
    cfg = WebGraphConfig(n_hosts=6, max_pages_per_host=10, out_degree=4)
    pages_df, robots_df = to_spark(spark, cfg)
    spec = CrawlJobSpec(seeds=tuple(gen_seeds(cfg, 2)), max_waves=4)
    run = run_crawl(spark, spec, SimulatedFetcher(pages_df), robots_src=robots_df)
    return run.seen.select("url_canon", "host", "wave").orderBy("url_canon")


@q("mm1_multimodal_decode")
def mm1_multimodal_decode(spark, sf_dir):
    """Multimodal plumbing: binary payload column -> mapInPandas decode stub
    -> typed features. Python-side kernel => rows-only check."""
    from crawler_spark.operators.multimodal import attach_payload, decode_features
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    feats = decode_features(attach_payload(d))
    return feats.select("doc_id", "media_type", "n_bytes",
                        F.round(F.element_at("features", 1), 2).alias("feat0"))


@q("mm2_image_resize")
def mm2_image_resize(spark, sf_dir):
    """Multimodal resize: narrow mapInPandas over binary payloads; image rows
    get (width, height), others pass through untouched. Deterministic stand-in
    resampler (no codecs in sandbox) => rows-only check."""
    from crawler_spark.operators.multimodal import attach_payload, resize_images
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    out = resize_images(attach_payload(d), width=8, height=8)
    return out.select("doc_id", F.length("payload_bin").alias("n_out_bytes"),
                      "width", "height")


@q("mm3_frame_sample")
def mm3_frame_sample(spark, sf_dir):
    """Multimodal 1->N frame sampling (UDTF shape): one row per sampled video
    frame with per-frame features. Python kernel => rows-only check."""
    from crawler_spark.operators.multimodal import attach_payload, sample_frames
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    out = sample_frames(attach_payload(d), every_n=4, n_frames=16)
    return out.select("doc_id", "frame_idx", "frame_bytes",
                      F.round(F.element_at("features", 1), 2).alias("feat0"))


# mm5: the decode kernel's algebra under the hash gate. `_fake_decode`'s
# features are per-chunk byte means over np.array_split(payload, 8); the
# `decode_byte_sums` twin (same mapInPandas shape, same `_chunk_bytes`
# chunking) emits each chunk's exact integer sum and size instead, and the
# DuckDB oracle recomputes them from the code-point array (payload is the
# UTF-8 encoding of ASCII-projected text, so code point == byte). Integer
# equality — no float comparator hazard. np.array_split rule: chunk c
# starts at c*(n//8) + min(c, n%8) and has n//8 (+1 if c < n%8) bytes.
_MM5_CHUNK_COLS = ",\n       ".join(
    f"CAST(coalesce(list_sum("
    f"cps[({c}*(n//8) + least({c}, n%8) + 1):"
    f"({c}*(n//8) + least({c}, n%8) + (n//8)"
    f" + (CASE WHEN {c} < (n%8) THEN 1 ELSE 0 END))]), 0) AS BIGINT)"
    f" AS s{c},\n       "
    f"CAST((n//8) + (CASE WHEN {c} < (n%8) THEN 1 ELSE 0 END) AS BIGINT)"
    f" AS z{c}"
    for c in range(8))

_MM5_SQL = """
WITH a AS (SELECT doc_id,
                  regexp_replace(text, '[^\\x20-\\x7E]', '', 'g') AS s
           FROM documents),
     b AS (SELECT doc_id,
                  list_transform(split(s, ''), ch -> ascii(ch)) AS cps,
                  length(s) AS n
           FROM a)
SELECT doc_id, CAST(n AS BIGINT) AS n_bytes,
       """ + _MM5_CHUNK_COLS + """
FROM b
"""


@q("mm5_decode_algebra", _MM5_SQL)
def mm5_decode_algebra(spark, sf_dir):
    """Oracle-checkable multimodal decode: the real mapInPandas kernel path
    (multimodal.decode_byte_sums, sharing `_chunk_bytes` with
    `_fake_decode`) over ASCII-projected payload bytes, vs a DuckDB twin of
    the same chunk algebra over code points. Exact BIGINT columns."""
    from crawler_spark.operators.multimodal import decode_byte_sums
    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.regexp_replace(F.col("text"), r"[^\x20-\x7E]", "")
        .alias("ascii_text"))
    src = d.withColumn("payload_bin", F.encode("ascii_text", "UTF-8"))
    return decode_byte_sums(src)


# =====================================================================
# Dup-cluster resolution + decontamination (training-data pipeline ops)
# =====================================================================

# Transitive closure of the dd3 LSH pair graph as a recursive CTE: cc
# enumerates every (node, reaching-label) pair — UNION dedup terminates it —
# and min(label) per node is the component minimum, exactly what the
# large-star/small-star algorithm converges to on the Spark side.
_CC_CTES = _LSH_CTES + """,
pairs AS (""" + _LSH_PAIRS_SQL + """),
edges AS (SELECT doc_a AS u, doc_b AS v FROM pairs
          UNION SELECT doc_b, doc_a FROM pairs),
cc(node, label) AS (
  SELECT u, u FROM (SELECT DISTINCT u FROM edges) t(u)
  UNION
  SELECT e.v, cc.label FROM cc JOIN edges e ON e.u = cc.node),
lab AS (SELECT node, min(label) AS cluster FROM cc GROUP BY node)"""


@q("dd7_dup_clusters", "WITH RECURSIVE " + _CC_CTES + """
SELECT d.doc_id, coalesce(l.cluster, d.doc_id) AS cluster
FROM documents d LEFT JOIN lab l ON l.node = d.doc_id
""")
def dd7_dup_clusters(spark, sf_dir):
    """Duplicate clusters: connected components over dd3's candidate-pair
    graph (alternating large-star/small-star, operators/clusters.py — the
    shuffle-native O(log n)-round CC), every document mapped to its
    component-minimum cluster id, singletons to themselves. The oracle
    computes the same transitive closure with a recursive CTE."""
    from crawler_spark.operators.clusters import dup_clusters

    d = _t(spark, sf_dir, "documents")
    pairs = lsh_band_pairs(d, n_perm=8, band_size=2, shingle_n=3,
                           max_bucket=64)
    return dup_clusters(d, pairs)


@q("dd8_canonical_keep", "WITH RECURSIVE " + _CC_CTES + f""",
q AS (SELECT doc_id, {_QUALITY_EXPR} AS quality FROM documents),
j AS (SELECT d.doc_id, coalesce(l.cluster, d.doc_id) AS cluster, q.quality
      FROM documents d LEFT JOIN lab l ON l.node = d.doc_id
      JOIN q ON q.doc_id = d.doc_id)
SELECT doc_id, cluster,
       CAST(CASE WHEN row_number() OVER (PARTITION BY cluster
            ORDER BY quality DESC, doc_id) = 1 THEN 1 ELSE 0 END AS INT)
       AS keep
FROM j
""")
def dd8_canonical_keep(spark, sf_dir):
    """Canonical-document selection: within each dup cluster keep exactly
    the highest-quality member (tx2's score; ties broken by min doc_id —
    the deterministic tie-break keeps re-runs reproducible). Every document
    gets a row; keep=1 marks the survivor of its cluster."""
    from crawler_spark.operators.clusters import canonical_docs, dup_clusters

    d = _t(spark, sf_dir, "documents")
    pairs = lsh_band_pairs(d, n_perm=8, band_size=2, shingle_n=3,
                           max_bucket=64)
    quality = d.select("doc_id", quality_score_col(F.col("text")).alias("quality"))
    out = canonical_docs(dup_clusters(d, pairs), quality)
    return out.select("doc_id", "cluster",
                      F.col("keep").cast("int").alias("keep"))


@q("tx5_decontaminate", """
WITH sh AS (""" + _SHINGLE_SQL + """),
bench AS (SELECT DISTINCT unnest(sh) AS s FROM sh WHERE source = 'src0'),
corp AS (SELECT doc_id, unnest(sh) AS s FROM sh WHERE source <> 'src0')
SELECT c.doc_id, count(*) AS n_hits
FROM corp c JOIN bench b ON c.s = b.s
GROUP BY 1
""")
def tx5_decontaminate(spark, sf_dir):
    """Benchmark decontamination: corpus documents sharing >= 1 word-3-gram
    with the held-out 'benchmark' slice (source='src0' stands in for an
    eval set), with the count of distinct overlapping grams. Scale shape:
    the eval-set gram universe is tiny next to a 100 TB corpus, so it is
    DISTINCT-ed and broadcast — the corpus side never shuffles."""
    from crawler_spark.operators.textdedup import shingles_col

    d = _t(spark, sf_dir, "documents")
    sh = d.select("doc_id", "source",
                  shingles_col(F.col("text"), 3).alias("sh"))
    bench = (sh.where(F.col("source") == "src0")
             .select(F.explode("sh").alias("s")).distinct())
    corp = (sh.where(F.col("source") != "src0")
            .select("doc_id", F.explode("sh").alias("s")))
    return (corp.join(F.broadcast(bench), "s")
            .groupBy("doc_id").agg(F.count("*").alias("n_hits")))


# =====================================================================
# Host-rank priority (north-rule "depth/host-rank window") + more
# training-data ops: PII scrub, Gopher repetition signals
# =====================================================================

_G1_EDGES_SQL = (
    "SELECT DISTINCT source AS src, "
    "'src' || CAST((doc_id * 7 + 3) % 23 AS VARCHAR) AS dst FROM documents "
    "WHERE source <> 'src' || CAST((doc_id * 7 + 3) % 23 AS VARCHAR)")

from crawler_spark.operators.hostrank import (  # noqa: E402
    pagerank_hosts, pagerank_oracle_sql,
)


@q("g1_hostrank", pagerank_oracle_sql(_G1_EDGES_SQL, iters=5, damping=0.85))
def g1_hostrank(spark, sf_dir):
    """W1 host-rank dimension: 5-iteration damped PageRank over a host
    graph derived deterministically from `documents` (src = source host,
    dst = hashed synthetic target — includes dangling sink-only hosts).
    The engine path (operators/hostrank.py -> run_crawl(host_priorities=))
    ranks crawl hosts the same way; the oracle unrolls the iterations as
    chained CTEs. Per iteration: one join on src + one groupBy dst at host
    cardinality — 2-3 orders below URL cardinality at the design point."""
    d = _t(spark, sf_dir, "documents")
    dst = F.concat(F.lit("src"),
                   ((F.col("doc_id") * 7 + 3) % 23).cast("string"))
    edges = (d.select(F.col("source").alias("src"), dst.alias("dst"))
             .where(F.col("src") != F.col("dst"))
             .distinct())
    ranks = pagerank_hosts(edges, iters=5, damping=0.85)
    return ranks.select("host", F.round("rank", 4).alias("rank"))


_TX6_AUG_SQL = (
    "text || ' contact user' || CAST(doc_id % 50 AS VARCHAR) || '@ex' || "
    "CAST(doc_id % 7 AS VARCHAR) || '.org call +1-555-' || "
    "lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')")
_TX6_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_TX6_PHONE = r"\+[0-9]{1,3}-[0-9]{3}-[0-9]{4}"


@q("tx6_pii_scrub", f"""
SELECT doc_id,
       CAST(len(regexp_extract_all(aug, '{_TX6_EMAIL}')) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(aug, '{_TX6_PHONE}')) AS BIGINT) AS n_phones,
       md5(regexp_replace(regexp_replace(aug, '{_TX6_EMAIL}', '<EMAIL>', 'g'),
                          '{_TX6_PHONE}', '<PHONE>', 'g')) AS clean_md5
FROM (SELECT doc_id, {_TX6_AUG_SQL} AS aug FROM documents)
""")
def tx6_pii_scrub(spark, sf_dir):
    """PII scrubbing: redact emails/phones with typed placeholders and
    count redactions. PII is injected deterministically (the synthetic
    corpus has none) so the scrub provably fires on every row; map-side
    regexp chain, zero shuffles — embarrassingly parallel at 100 TB."""
    from crawler_spark.functions.text import (
        PII_EMAIL_RE, PII_PHONE_RE, pii_count_col, pii_scrub_col,
    )
    d = _t(spark, sf_dir, "documents")
    aug = F.concat(
        F.col("text"), F.lit(" contact user"),
        (F.col("doc_id") % 50).cast("string"), F.lit("@ex"),
        (F.col("doc_id") % 7).cast("string"), F.lit(".org call +1-555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"))
    return (d.select("doc_id", aug.alias("aug"))
            .select("doc_id",
                    pii_count_col(F.col("aug"), PII_EMAIL_RE).alias("n_emails"),
                    pii_count_col(F.col("aug"), PII_PHONE_RE).alias("n_phones"),
                    F.md5(pii_scrub_col(F.col("aug"))).alias("clean_md5")))


@q("tx7_repetition", """
WITH w AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS ws
           FROM documents),
per AS (
  SELECT doc_id, len(ws) AS n_words,
         round(1.0 - len(list_distinct(ws)) * 1.0 / len(ws), 4)
           AS dup_tok_frac,
         CASE WHEN len(bi) > 0
              THEN round(1.0 - len(list_distinct(bi)) * 1.0 / len(bi), 4)
              ELSE 0.0 END AS dup_2gram_frac
  FROM (SELECT doc_id, ws,
               CASE WHEN len(ws) >= 2 THEN
                 list_transform(range(0, len(ws) - 1),
                                j -> ws[j+1] || ' ' || ws[j+2])
               ELSE [] END AS bi
        FROM w)),
cnt AS (SELECT doc_id, tk, count(*) AS c
        FROM (SELECT doc_id, unnest(ws) AS tk FROM w) GROUP BY 1, 2),
top AS (SELECT doc_id, round(max(c) * 1.0 / sum(c), 4) AS top_tok_frac
        FROM cnt GROUP BY 1)
SELECT p.doc_id, p.n_words, p.dup_tok_frac, p.dup_2gram_frac, t.top_tok_frac
FROM per p JOIN top t USING (doc_id)
""")
def tx7_repetition(spark, sf_dir):
    """Gopher-style repetition filters: duplicate-token fraction and
    duplicate-bigram fraction (per-row array algebra, NO shuffle) plus
    top-token fraction (two-level partial agg on doc_id — even keys, no
    skew). The per-row signals would filter 100 TB map-side; only the
    mode computation shuffles, at one row per (doc, distinct token)."""
    from crawler_spark.functions.text import repetition_signals_col
    d = _t(spark, sf_dir, "documents")
    per = d.select("doc_id",
                   repetition_signals_col(F.col("text")).alias("r")) \
           .select("doc_id", "r.n_words", "r.dup_tok_frac", "r.dup_2gram_frac")
    toks = d.select("doc_id",
                    F.explode(F.split(F.trim("text"), r"\s+")).alias("tk"))
    cnt = toks.groupBy("doc_id", "tk").agg(F.count("*").alias("c"))
    top = cnt.groupBy("doc_id").agg(
        F.round(F.max("c") / F.sum("c"), 4).alias("top_tok_frac"))
    return per.join(top, "doc_id")


_DD9_BP = "'subscribe to channel ' || CAST(doc_id % 5 AS VARCHAR)"


@q("dd9_line_dedup", f"""
WITH w AS (SELECT doc_id,
                  regexp_split_to_array(trim(lower(text)), '\\s+') AS ws,
                  len(trim(text)) AS lt
           FROM documents),
base AS (SELECT doc_id,
  list_append(
    CASE WHEN lt > 0 THEN
      list_transform(range(0, (len(ws) + 7) // 8),
                     i -> array_to_string(list_slice(ws, i*8+1, i*8+8), ' '))
    ELSE [] END,
    {_DD9_BP}) AS lines
  FROM w),
ln0 AS (SELECT doc_id,
               unnest(list_transform(range(0, len(lines)),
                      i -> struct_pack(pos := i, line := lines[i+1]))) AS s
        FROM base),
ln AS (SELECT doc_id, s.pos AS pos, s.line AS line FROM ln0),
dup AS (SELECT line FROM ln GROUP BY line
        HAVING count(DISTINCT doc_id) > 1),
kept AS (SELECT * FROM ln WHERE line NOT IN (SELECT line FROM dup)),
agg AS (SELECT doc_id, count(*) AS n_kept,
               md5(string_agg(line, chr(10) ORDER BY pos)) AS clean_md5
        FROM kept GROUP BY doc_id)
SELECT b.doc_id, CAST(len(b.lines) AS BIGINT) AS n_lines,
       CAST(COALESCE(a.n_kept, 0) AS BIGINT) AS n_kept,
       COALESCE(a.clean_md5, md5('')) AS clean_md5
FROM base b LEFT JOIN agg a USING (doc_id)
""")
def dd9_line_dedup(spark, sf_dir):
    """CCNet/C4-style line-level dedup: any fixed-width word "line" present
    in >1 distinct documents is boilerplate and removed corpus-wide; docs
    are reassembled in original line order. A deterministic boilerplate
    line (shared by each doc_id%5 cohort) is appended so the removal
    provably fires on every row of the synthetic corpus.

    Scale: explode map-side; ONE partial-agg shuffle keyed on the line
    (xxhash64(line) at 100 TB), anti-join against the much-smaller dup set
    (AQE-broadcast at our sizes), one even-keyed reassembly shuffle —
    nothing quadratic, nothing driver-side. See textdedup.line_dedup."""
    from crawler_spark.operators.textdedup import doc_lines_col, line_dedup
    d = _t(spark, sf_dir, "documents")
    bp = F.concat(F.lit("subscribe to channel "),
                  (F.col("doc_id") % 5).cast("string"))
    d2 = d.select("doc_id",
                  F.array_append(doc_lines_col(F.col("text")), bp)
                   .alias("lines"))
    out = line_dedup(d2)
    return out.select("doc_id", F.col("n_lines").cast("long").alias("n_lines"),
                      "n_kept", "clean_md5")


@q("dd11_substring_repeats", f"""
WITH h AS (SELECT doc_id, {_WH_SQL} AS wh FROM documents),
r AS (SELECT doc_id, CASE WHEN len(wh) >= 8 THEN
    list_transform(range(0, len(wh) - 7), i ->
      list_reduce(list_prepend(0::BIGINT, list_slice(wh, i + 1, i + 8)),
                  (acc, x) -> (acc * 69069 + x) % 2147483647))
  ELSE [list_reduce(list_prepend(0::BIGINT, wh),
                    (acc, x) -> (acc * 69069 + x) % 2147483647)]
  END AS rolls FROM h),
e AS (SELECT doc_id, unnest(rolls) AS rh FROM r),
rep AS (SELECT rh FROM e GROUP BY rh HAVING count(DISTINCT doc_id) >= 2),
cnt AS (SELECT e.doc_id, count(*) AS n_rep
        FROM e JOIN rep USING (rh) GROUP BY e.doc_id)
SELECT r.doc_id, len(rolls)::BIGINT AS n_windows,
       coalesce(n_rep, 0)::BIGINT AS n_rep_windows,
       round(coalesce(n_rep, 0) * 1.0 / len(rolls), 4) AS rep_frac
FROM r LEFT JOIN cnt USING (doc_id)
""")
def dd11_substring_repeats(spark, sf_dir):
    """Cross-document repeated-passage detection (exact-substring dedup,
    Lee et al. ACL 2022, Spark-first at word granularity): an 8-word
    window whose Rabin-Karp rolling hash occurs in >= 2 distinct documents
    is a repeated passage; per doc, the covered-window count and fraction.

    Scale: posexplode map-side, two-phase count_distinct shuffle on the
    window hash (absorbs hot-window skew), repeated-set join back
    (broadcast here, sort-merge at corpus scale), even-keyed per-doc
    rollup. At 10^12 words the sample_mod knob (content-defined winnowing
    sampling) divides shuffle volume; exact here for the oracle.
    See textdedup.cross_doc_repeats."""
    from crawler_spark.operators.textdedup import (
        cross_doc_repeats, word_hashes_col,
    )
    d = _t(spark, sf_dir, "documents")
    h = d.select("doc_id", word_hashes_col(F.col("text")).alias("h"))
    return cross_doc_repeats(h, k=8)


@q("g2_anchor_agg", """
SELECT dst,
       CAST(count(*) AS BIGINT) AS n_inlinks,
       CAST(count(DISTINCT src) AS BIGINT) AS n_src_hosts,
       CAST(count(DISTINCT anchor) AS BIGINT) AS n_anchors,
       min(anchor) AS first_anchor
FROM (SELECT source AS src,
             'src' || CAST((doc_id * 7 + 3) % 23 AS VARCHAR) AS dst,
             array_to_string(list_slice(regexp_split_to_array(trim(text),
                             '\\s+'), 1, 5), ' ') AS anchor
      FROM documents
      WHERE source <> 'src' || CAST((doc_id * 7 + 3) % 23 AS VARCHAR))
GROUP BY dst
""")
def g2_anchor_agg(spark, sf_dir):
    """Anchor-text aggregation (the classic corpus-building join: what do
    OTHER pages say about this target?) over the same deterministic host
    graph as g1_hostrank, anchor = the linking doc's first 5 words.

    Scale: one partial-agg shuffle keyed on target host; count/min are
    algebraic so map-side combine absorbs mega-host skew, and the two
    count-distincts expand to the standard two-phase plan. At 100 TB the
    anchors themselves would be collected top-k-per-target (W2's window
    operator) rather than min() — the shuffle shape is identical."""
    d = _t(spark, sf_dir, "documents")
    dst = F.concat(F.lit("src"),
                   ((F.col("doc_id") * 7 + 3) % 23).cast("string"))
    anchor = F.array_join(
        F.slice(F.split(F.trim("text"), r"\s+"), 1, 5), " ")
    edges = (d.select(F.col("source").alias("src"), dst.alias("dst"),
                      anchor.alias("anchor"))
             .where(F.col("src") != F.col("dst")))
    return (edges.groupBy("dst")
            .agg(F.count("*").cast("long").alias("n_inlinks"),
                 F.count_distinct("src").alias("n_src_hosts"),
                 F.count_distinct("anchor").alias("n_anchors"),
                 F.min("anchor").alias("first_anchor")))


@q("rc2_adaptive_ttl", """
WITH o AS (SELECT user_id, event_id,
                  CAST(floor(epoch(ts)) AS BIGINT) AS t, event_type AS sig
           FROM events),
c AS (SELECT user_id, t,
             CASE WHEN sig <> lag(sig) OVER
                  (PARTITION BY user_id ORDER BY t, event_id)
                  THEN 1 ELSE 0 END AS chg
      FROM o),
a AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_obs,
             CAST(sum(chg) AS BIGINT) AS n_changes,
             max(t) AS mx, min(t) AS mn
      FROM c GROUP BY user_id),
e AS (SELECT *, (n_obs - 1) AS ncmp,
             (mx - mn) * 1.0 / (n_obs - 1) AS dt_bar
      FROM a WHERE n_obs >= 2 AND mx > mn)
SELECT user_id, n_obs, n_changes,
       round(-ln((ncmp - n_changes + 0.5) / (ncmp + 0.5))
             / dt_bar * 86400.0, 4) AS lambda_per_day,
       round(CASE WHEN n_changes = 0 THEN 365.0
             ELSE least(365.0, ln(2) /
                  (-ln((ncmp - n_changes + 0.5) / (ncmp + 0.5))
                   / dt_bar * 86400.0)) END, 4) AS ttl_days
FROM e
""")
def rc2_adaptive_ttl(spark, sf_dir):
    """Adaptive recrawl TTL: per-key Poisson change-rate estimate (Cho &
    Garcia-Molina's bias-corrected frequency estimator) over a revisit
    observation log, emitting the change half-life as the revisit TTL.
    Driver-table mapping: events = fetch observations (user_id = page key,
    event_type = content signature, ts = fetch time). The engine path is
    operators/recrawl.change_rate + due_for_recrawl_adaptive (per-host TTL
    joined broadcast into the due-set aggregate)."""
    from crawler_spark.operators.recrawl import change_rate
    e = _t(spark, sf_dir, "events")
    obs = e.select(F.col("user_id").alias("key"),
                   F.unix_timestamp("ts").alias("t"),
                   F.col("event_id").alias("obs_id"),
                   F.col("event_type").alias("sig"))
    out = change_rate(obs, key_col="key", ts_col="t", ord_col="obs_id",
                      sig_col="sig", max_ttl_days=365.0)
    return out.select(F.col("key").alias("user_id"),
                      F.col("n_obs").cast("long").alias("n_obs"),
                      F.col("n_changes").cast("long").alias("n_changes"),
                      "lambda_per_day", "ttl_days")


_TX3_TOKENS = ("CAST(list_sum(list_transform(regexp_split_to_array(trim(text),"
               " '\\s+'), w -> CAST(ceil(length(w) / 4.0) AS BIGINT)))"
               " AS BIGINT)")


@q("tx8_token_budget_mix", f"""
WITH s AS (SELECT doc_id, lang, {_QUALITY_EXPR} AS quality,
                  {_TX3_TOKENS} AS n_tokens
           FROM documents),
w AS (SELECT doc_id, lang, n_tokens,
             CAST(sum(n_tokens) OVER (PARTITION BY lang
                  ORDER BY quality DESC, doc_id
                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens,
             CAST(sum(n_tokens) OVER (PARTITION BY lang) AS BIGINT) AS tot
      FROM s)
SELECT doc_id, lang, n_tokens, cum_tokens
FROM w WHERE cum_tokens <= CAST(floor(0.4 * tot) AS BIGINT)
""")
def tx8_token_budget_mix(spark, sf_dir):
    """Data mixing: per-language, keep the highest-quality documents until
    40% of that language's token mass is selected (quality desc, doc_id as
    the deterministic tiebreak). operators/sampling.token_budget_select;
    both windows share one exchange — see its docstring for the
    threshold-pass variant that replaces the per-stratum sort at 100 TB."""
    from crawler_spark.operators.sampling import token_budget_select
    d = _t(spark, sf_dir, "documents")
    s = d.select("doc_id", "lang",
                 quality_score_col(F.col("text")).alias("quality"),
                 token_count_col(F.col("text")).alias("n_tokens"))
    out = token_budget_select(s, "lang", "n_tokens", 0.4,
                              [F.desc("quality"), F.col("doc_id")])
    return out.select("doc_id", "lang", "n_tokens", "cum_tokens")


@q("tx9_hash_split", """
SELECT doc_id,
       CASE WHEN ('0x' || substr(md5(source || '/' || doc_id), 1, 8))::BIGINT
                 % 1000 < 50
            THEN 'val' ELSE 'train' END AS split
FROM documents
""")
def tx9_hash_split(spark, sf_dir):
    """Deterministic train/val split (~5 percent validation) keyed on a
    content-stable id — reproducible across runs/engines/partitionings,
    map-side, zero shuffle. operators/sampling.hash_split."""
    from crawler_spark.operators.sampling import hash_split
    d = _t(spark, sf_dir, "documents")
    key = F.concat(F.col("source"), F.lit("/"), F.col("doc_id").cast("string"))
    return d.select("doc_id", hash_split(key, 50).alias("split"))


@q("an6_sq_rerank", """
WITH q0 AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qvec
            FROM embeddings WHERE vec_id IN (0, 1, 2)),
s AS (SELECT d, min(embedding[d]::DOUBLE) AS mn, max(embedding[d]::DOUBLE) AS mx
      FROM embeddings, range(1, 65) t(d) GROUP BY d),
sa AS (SELECT list(mn ORDER BY d) AS mns, list(mx ORDER BY d) AS mxs FROM s),
corp AS (SELECT vec_id, embedding::DOUBLE[] AS v,
                list_transform(range(1, 65), d -> CASE WHEN mxs[d] > mns[d]
                  THEN CAST(floor((embedding[d]::DOUBLE - mns[d])
                                  / (mxs[d] - mns[d]) * 255.0) AS BIGINT)
                  ELSE 0 END) AS qz
         FROM embeddings, sa),
qq AS (SELECT qid, qvec,
              list_transform(range(1, 65), d -> CASE WHEN mxs[d] > mns[d]
                THEN CAST(floor((qvec[d] - mns[d])
                                / (mxs[d] - mns[d]) * 255.0) AS BIGINT)
                ELSE 0 END) AS qzq
       FROM q0, sa),
cand AS (SELECT qq.qid, c.vec_id, c.v, qq.qvec,
                list_reduce(list_prepend(0::BIGINT,
                  list_transform(range(1, 65), d -> c.qz[d] * qq.qzq[d])),
                  (a, b) -> a + b) AS ad
         FROM corp c, qq WHERE c.vec_id <> qq.qid),
short AS (SELECT qid, vec_id, v, qvec FROM (
  SELECT *, row_number() OVER (PARTITION BY qid
                               ORDER BY ad DESC, vec_id) AS crnk
  FROM cand) WHERE crnk <= 50)
SELECT qid, vec_id, cosine, rnk FROM (
  SELECT qid, vec_id,
         round(list_cosine_similarity(v, qvec), 4) AS cosine,
         row_number() OVER (PARTITION BY qid
           ORDER BY round(list_cosine_similarity(v, qvec), 4) DESC, vec_id)
           AS rnk
  FROM short) WHERE rnk <= 10
""")
def an6_sq_rerank(spark, sf_dir):
    """Two-stage ANN, the FAISS-SQ production pattern: 8-bit scalar-
    quantized integer dot product shortlists 50 candidates per query
    (bit-stable across engines — the codes and scores are exact integers),
    then true cosine re-ranks the shortlist to top-10. At corpus scale the
    code table scans 4-32x less data than the float corpus and the exact
    pass touches only shortlist rows. See similarity.sq_rerank_topk."""
    from crawler_spark.operators.similarity import sq_rerank_topk
    e = _t(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id").isin(0, 1, 2))
    return sq_rerank_topk(e, q, k=10, shortlist=50)


@q("g3_domain_cc", """
WITH RECURSIVE
e0 AS (SELECT DISTINCT source AS src,
               'src' || CAST((doc_id * 7 + 3) % 23 AS VARCHAR) AS dst
       FROM documents
       WHERE source <> 'src' || CAST((doc_id * 7 + 3) % 23 AS VARCHAR)),
edges AS (SELECT src AS u, dst AS v FROM e0
          UNION SELECT dst, src FROM e0),
cc(node, label) AS (
  SELECT u, u FROM (SELECT DISTINCT u FROM edges) t(u)
  UNION
  SELECT e.v, cc.label FROM cc JOIN edges e ON e.u = cc.node),
lab AS (SELECT node, min(label) AS cluster FROM cc GROUP BY node)
SELECT node AS host, cluster AS domain_group FROM lab
""")
def g3_domain_cc(spark, sf_dir):
    """Site-family clustering: connected components over the host link
    graph (same deterministic edge derivation as g1) — the webgraph op
    behind mirror/alias detection and per-family crawl budgets. Reuses the
    shuffle-native large-star/small-star CC (operators/clusters.py, string
    node ids, lexicographic min label); oracle is the recursive min-label
    CTE. Host-cardinality data — orders below URL cardinality at scale."""
    from crawler_spark.operators.clusters import connected_components
    d = _t(spark, sf_dir, "documents")
    dst = F.concat(F.lit("src"),
                   ((F.col("doc_id") * 7 + 3) % 23).cast("string"))
    edges = (d.select(F.col("source").alias("src"), dst.alias("dst"))
             .where(F.col("src") != F.col("dst"))
             .distinct())
    cc = connected_components(edges, src="src", dst="dst")
    return cc.select(F.col("node").alias("host"),
                     F.col("cluster").alias("domain_group"))


from crawler_spark.operators.hostrank import hits_oracle_sql  # noqa: E402


@q("g4_hits", hits_oracle_sql(_G1_EDGES_SQL, iters=3))
def g4_hits(spark, sf_dir):
    """HITS hubs/authorities over the host graph (same deterministic edge
    derivation as g1): the link-analysis complement to PageRank — crawl
    schedulers fetch authorities and expand frontiers from hubs. 3 fixed
    sum-normalized iterations; oracle unrolls them as chained CTEs. Host
    cardinality throughout (2-3 orders below URLs at the design point)."""
    from crawler_spark.operators.hostrank import hits_hosts
    d = _t(spark, sf_dir, "documents")
    dst = F.concat(F.lit("src"),
                   ((F.col("doc_id") * 7 + 3) % 23).cast("string"))
    edges = (d.select(F.col("source").alias("src"), dst.alias("dst"))
             .where(F.col("src") != F.col("dst"))
             .distinct())
    out = hits_hosts(edges, iters=3)
    return out.select("host", F.round("auth", 4).alias("auth"),
                      F.round("hub", 4).alias("hub"))


@q("px4_weighted_sample", """
WITH s AS (SELECT doc_id, n_chars,
                  -ln((('0x' || substr(md5('ws/' || doc_id), 1, 8))::BIGINT
                       + 1) / 4294967296.0)
                  / greatest(CAST(n_chars AS DOUBLE), 1.0) AS ek
           FROM documents)
SELECT doc_id, n_chars, round(ek, 4) AS es_key
FROM s ORDER BY ek LIMIT 100
""")
def px4_weighted_sample(spark, sf_dir):
    """Deterministic weighted sampling without replacement (Efraimidis-
    Spirakis exponential race, content-stable u from md5): 100 documents
    drawn with probability proportional to length. Map-side key + global
    top-k (TakeOrderedAndProject: per-partition heaps, no full sort).
    See operators/sampling.weighted_sample."""
    from crawler_spark.operators.sampling import weighted_sample
    d = _t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    return weighted_sample(d, "n_chars", 100, F.col("doc_id"))


@q("tx10_unigram_logprob", """
WITH w AS (SELECT doc_id,
                  unnest(regexp_split_to_array(trim(text), '\\s+')) AS word
           FROM documents),
f AS (SELECT word, count(*) AS c FROM w GROUP BY word),
t AS (SELECT CAST(sum(c) AS DOUBLE) AS n_total FROM f)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
       round(avg(ln(t.n_total) - ln(f.c)), 4) AS neg_logprob
FROM w JOIN f USING (word) CROSS JOIN t
GROUP BY doc_id
""")
def tx10_unigram_logprob(spark, sf_dir):
    """CCNet-style LM quality scoring without the LM: per doc, the mean
    unigram negative log-probability under the corpus's own word
    distribution (low = stereotypical, high = rare/garbled — the
    perplexity filtering axis). Two partial-agg shuffles + a broadcast
    scalar; at 10^12 words broadcast the Zipf head of the frequency table
    and shuffle only the tail. See operators/langmodel.py."""
    from crawler_spark.operators.langmodel import unigram_logprob
    return unigram_logprob(_t(spark, sf_dir, "documents"))


_TX11_TERMS = ("spark", "merge", "window", "sort")


@q("tx11_bm25", f"""
WITH w AS (SELECT doc_id,
                  regexp_split_to_array(trim(lower(text)), '\\s+') AS w
           FROM documents),
g AS (SELECT count(*) AS n, avg(len(w)) AS avgdl FROM w),
t AS (SELECT doc_id, len(w) AS dl, unnest(w) AS term FROM w),
tf AS (SELECT doc_id, dl, term, count(*) AS tf FROM t
       WHERE term IN {_TX11_TERMS!r} GROUP BY 1, 2, 3),
df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tf GROUP BY 1)
SELECT tf.doc_id,
       round(SUM(ln(1.0 + (g.n - df.df + 0.5) / (df.df + 0.5))
                 * tf.tf * 2.2
                 / (tf.tf + 1.2 * (0.25 + 0.75 * tf.dl / g.avgdl))), 4)
         AS bm25
FROM tf JOIN df USING (term) CROSS JOIN g
GROUP BY tf.doc_id
""")
def tx11_bm25(spark, sf_dir):
    """Okapi BM25 relevance of every document against a fixed query-term
    set (k1=1.2, b=0.75, Lucene idf) — the retrieval primitive behind
    quality-targeted subcorpus selection. Corpus filtered to query terms
    before any shuffle; df/N/avgdl are broadcast-joined aggregates. See
    functions/text.bm25_scores."""
    from crawler_spark.functions.text import bm25_scores
    d = _t(spark, sf_dir, "documents")
    return bm25_scores(d, F.col("text"), _TX11_TERMS)


@q("an5_ivf_recall", """
WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qvec, label AS qcell
           FROM embeddings WHERE vec_id IN (0, 1, 2)),
ex0 AS (
  SELECT q.qid, e.vec_id,
         round(list_cosine_similarity(e.embedding::DOUBLE[], q.qvec), 4)
           AS cosine
  FROM embeddings e, q WHERE e.vec_id <> q.qid),
exact AS (SELECT qid, vec_id FROM (
  SELECT *, row_number() OVER (PARTITION BY qid
                               ORDER BY cosine DESC, vec_id) AS rnk
  FROM ex0) WHERE rnk <= 10),
ap0 AS (
  SELECT q.qid, e.vec_id,
         round(list_cosine_similarity(e.embedding::DOUBLE[], q.qvec), 4)
           AS cosine
  FROM embeddings e JOIN q ON e.label = q.qcell WHERE e.vec_id <> q.qid),
approx AS (SELECT qid, vec_id FROM (
  SELECT *, row_number() OVER (PARTITION BY qid
                               ORDER BY cosine DESC, vec_id) AS rnk
  FROM ap0) WHERE rnk <= 10)
SELECT e.qid, CAST(count(*) AS BIGINT) AS k,
       CAST(sum(CASE WHEN a.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_hit,
       round(sum(CASE WHEN a.vec_id IS NOT NULL THEN 1 ELSE 0 END) * 1.0
             / count(*), 4) AS recall
FROM exact e LEFT JOIN approx a ON a.qid = e.qid AND a.vec_id = e.vec_id
GROUP BY e.qid
""")
def an5_ivf_recall(spark, sf_dir):
    """ANN quality evaluation: recall@10 of the IVF 1-probe path (an2)
    against the brute-force baseline (an1), per query. The eval every
    approximate index ships with — run on a sampled slice at 100 TB (the
    brute-force side is the quadratic one; the sample bounds it), while
    the IVF side stays the production plan."""
    e = _t(spark, sf_dir, "embeddings")
    qs = e.where(F.col("vec_id").isin(0, 1, 2))
    exact = brute_force_topk(e, qs, k=10).select("qid", "vec_id")
    approx = (ivf_topk(e, qs, k=10)
              .select("qid", "vec_id", F.lit(1).alias("hit")))
    return (exact.join(approx, ["qid", "vec_id"], "left")
            .groupBy("qid")
            .agg(F.count("*").alias("k"),
                 F.coalesce(F.sum("hit"), F.lit(0)).cast("long")
                  .alias("n_hit"),
                 F.round(F.coalesce(F.sum("hit"), F.lit(0)) / F.count("*"), 4)
                  .alias("recall")))


# =====================================================================
# Composed training-data pipeline
# =====================================================================

_PX1_DUP_FRAC = (f"round(1.0 - len(list_distinct(regexp_split_to_array("
                 f"trim(text), '\\s+'))) * 1.0 / {_NW}, 4)")

# the same token-estimate formula tx3/tx8 are gated on (one constant: a
# divisor change must hit every oracle at once, or they desynchronize)
_PX1_TOKENS = _TX3_TOKENS

_PX1_SQL = f"""
WITH aug AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, replace(text, ' ', chr(9)) AS text
  FROM documents WHERE doc_id % 10 = 0
),
kept AS (
  SELECT doc_id, text FROM aug
  WHERE ({_LANG_CASE}) = 'en'
    AND {_QUALITY_EXPR} >= 0.7
    AND {_PX1_DUP_FRAC} <= 0.7
),
g AS (
  SELECT min(doc_id) AS doc_id, arg_min(text, doc_id) AS text,
         count(*) AS n_dups
  FROM kept
  GROUP BY trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))
)
SELECT doc_id, n_dups, {_NW} AS n_words, {_PX1_TOKENS} AS n_tokens,
       {_QUALITY_EXPR} AS quality
FROM g
"""


@q("px1_corpus_pipeline", _PX1_SQL)
def px1_corpus_pipeline(spark, sf_dir):
    """End-to-end C4/Gopher-style corpus cleaning chain, composed from the
    individually-verified stages: language gate (tx1's argmax) -> quality
    gate (tx2's score >= 0.7) -> repetition gate (tx7's dup-token fraction
    <= 0.7) -> exact dedup on normalized text keeping the min-doc_id
    representative (dd1) -> token accounting on the survivors (tx3).

    The synthetic corpus has no exact duplicates, so (the tx6/dd9 idiom)
    duplicates are injected deterministically: every 10th doc is re-emitted
    with doc_id+1e6 and spaces turned into tabs — a perturbation that
    normalizes away under the dedup key while leaving every filter signal
    bit-identical (tabs match the same \\s patterns and keep length(text)
    unchanged), so each injected copy survives exactly when its original
    does and collapses onto it.

    Scale shape: injection and all three gates are map-side codegen; the
    only shuffle is the dedup groupBy (partial-agg combine on the
    normalized-text key); the final accounting is map-side over one row
    per surviving group. At 100 TB this is one wide stage end-to-end."""
    from crawler_spark.functions.text import (
        lang_id_col, quality_score_col, repetition_signals_col,
        token_count_col,
    )
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    dup = (d.where(F.col("doc_id") % 10 == 0)
            .select((F.col("doc_id") + 1000000).alias("doc_id"),
                    F.regexp_replace("text", " ", "\t").alias("text")))
    aug = d.unionByName(dup)
    kept = aug.where(
        (lang_id_col(F.col("text")) == "en")
        & (quality_score_col(F.col("text")) >= 0.7)
        & (repetition_signals_col(F.col("text"))
           .getField("dup_tok_frac") <= 0.7))
    g = (kept.groupBy(normalize_text(F.col("text")).alias("k"))
         .agg(F.min("doc_id").alias("doc_id"),
              F.min_by("text", "doc_id").alias("text"),
              F.count("*").alias("n_dups")))
    return g.select(
        "doc_id", "n_dups",
        F.size(F.split(F.trim("text"), r"\s+")).alias("n_words"),
        token_count_col(F.col("text")).alias("n_tokens"),
        quality_score_col(F.col("text")).alias("quality"))


_PX2_RUN_REDUCE = """list_reduce(
  list_prepend(0::BIGINT,
    list_transform(spans, s -> CASE WHEN s.kind = 'media'
                               THEN 1::BIGINT ELSE 0::BIGINT END)),
  (acc, x) -> CASE WHEN x = 1
              THEN greatest(acc // 1000, acc % 1000 + 1) * 1000
                   + (acc % 1000 + 1)
              ELSE greatest(acc // 1000, 0) * 1000 END) // 1000"""

_PX2_SQL = f"""
WITH spans AS ({_SPAN_SQL}),
st AS (
  SELECT doc_id, len(spans)::BIGINT AS n_spans,
         len(list_filter(spans, s -> s.kind = 'media'))::BIGINT AS n_media,
         {_PX2_RUN_REDUCE} AS max_media_run
  FROM spans)
SELECT doc_id, n_spans, n_media,
       round(n_media * 1.0 / n_spans, 4) AS media_frac,
       max_media_run,
       (round(n_media * 1.0 / n_spans, 4) <= 0.5 AND max_media_run <= 2)
         AS keep
FROM st
"""


def max_media_run_col(spans) -> F.Column:
    """Longest run of consecutive kind='media' spans, as a fold over the
    span array with a single BIGINT accumulator encoding best*1000+current
    — the same integer algebra DuckDB's list_reduce computes in the px2
    twin (_PX2_RUN_REDUCE), so the two stay bit-identical."""
    is_media = F.transform(
        spans, lambda sp: F.when(sp.kind == "media", F.lit(1))
                           .otherwise(F.lit(0)).cast("long"))
    return (F.aggregate(
        is_media, F.lit(0).cast("long"),
        lambda acc, x: F.when(
            x == 1,
            F.greatest((acc / 1000).cast("long"), acc % 1000 + 1) * 1000
            + (acc % 1000 + 1))
         .otherwise((acc / 1000).cast("long") * 1000))
        / F.lit(1000)).cast("long")


@q("px2_interleave_stats", _PX2_SQL)
def px2_interleave_stats(spark, sf_dir):
    """Interleave-aware multimodal document filtering (the MMC4/OBELICS
    family): per interleaved text+media span sequence (the input_hint
    payload shape), the media-span count and fraction and the longest run
    of consecutive media spans, plus the keep decision (media_frac <= 0.5
    and no run longer than 2 — docs that are mostly images, or image
    walls, are poor interleaved training data).

    The run length folds over the span array with a single BIGINT
    accumulator encoding (best*1000 + current) — identical integer algebra
    in Spark's aggregate() and DuckDB's list_reduce (0-prepended; it seeds
    from the first element), so the twin is bit-identical. Pure per-row
    HOF algebra: zero shuffles, embarrassingly parallel at 100 TB."""
    s = _spans_df(spark, sf_dir)
    run = max_media_run_col("spans")
    st = s.select(
        "doc_id",
        F.size("spans").cast("long").alias("n_spans"),
        F.size(F.filter("spans", lambda sp: sp.kind == "media"))
         .cast("long").alias("n_media"),
        run.alias("max_media_run"))
    media_frac = F.round(F.col("n_media") / F.col("n_spans"), 4)
    return st.select(
        "doc_id", "n_spans", "n_media",
        media_frac.alias("media_frac"), "max_media_run",
        ((media_frac <= 0.5) & (F.col("max_media_run") <= 2)).alias("keep"))


_PX3_SQL = f"""
WITH t AS (SELECT doc_id, {_TX3_TOKENS} AS n_tokens FROM documents),
c AS (
  SELECT doc_id, n_tokens,
         -- ::BIGINT is load-bearing: DuckDB SUM(BIGINT) returns HUGEINT
         -- (int128), which materializes as float64 via fetchdf() and
         -- decimal128 via .arrow() — hash-divergent from Spark's int64
         -- under any type-sensitive canonicalization even though
         -- fetchall() happens to return Python int (the r3/r4
         -- driver-gate red on this family; NOTES round-5 log).
         COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  0)::BIGINT AS prev_tokens
  FROM t)
SELECT doc_id, n_tokens, prev_tokens,
       (prev_tokens // 1024)::BIGINT AS seq_id,
       (prev_tokens % 1024)::BIGINT AS seq_offset
FROM c
"""


@q("px3_sequence_pack", _PX3_SQL)
def px3_sequence_pack(spark, sf_dir):
    """Sequence packing for pre-training (concat-then-chunk): documents in
    deterministic corpus order are laid end-to-end and chunked into
    1024-token training sequences; each doc reports the sequence its start
    offset falls in. The oracle is the sequential single-window prefix
    sum; the Spark side is operators/sampling.pack_sequences — the
    DISTRIBUTED two-phase prefix sum (block-local cumsums + one tiny
    broadcast offset table), proving the scale formulation computes the
    same global prefix as the sequential semantics."""
    from crawler_spark.functions.text import token_count_col
    from crawler_spark.operators.sampling import pack_sequences
    d = _t(spark, sf_dir, "documents")
    t = d.select("doc_id", token_count_col(F.col("text")).alias("n_tokens"))
    return pack_sequences(t, "n_tokens", order_col="doc_id",
                          budget=1024, n_blocks=8)


_PX3A_SQL = f"""
WITH t AS (SELECT doc_id, {_TX3_TOKENS} AS n_tokens FROM documents),
c AS (
  SELECT doc_id, n_tokens,
         COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  0)::BIGINT AS prev_tokens
  FROM t),
p AS (SELECT doc_id, n_tokens, prev_tokens,
             (prev_tokens // 1024)::BIGINT AS seq_id,
             (prev_tokens % 1024)::BIGINT AS seq_offset
      FROM c)
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                 % 1000003)
                * ((prev_tokens % 1000003) + 31 * (seq_id % 1000003)
                   + 961 * seq_offset + n_tokens)) AS BIGINT) AS checksum
FROM p
"""


@q("px3a_pack_checksum", _PX3A_SQL)
def px3a_pack_checksum(spark, sf_dir):
    """Driver-gate decomposition probe for the pack family (round-5
    VERDICT item 1e): BOTH engines reduce the full px3 result to ONE
    all-BIGINT checksum row IN-SQL, so the driver's own row
    canonicalization/hashing machinery is removed from the comparison
    entirely. If px3 is red while this is green, the divergence is in
    result materialization/canonicalization, not in the computed values;
    if both are red, the values themselves diverge. The checksum is an
    order-independent content-keyed weighted sum in exact int64 range
    (coin < 2^20, inner < 2^25, 500 rows)."""
    from crawler_spark.functions.text import token_count_col
    from crawler_spark.operators.sampling import pack_sequences
    d = _t(spark, sf_dir, "documents")
    t = d.select("doc_id", token_count_col(F.col("text")).alias("n_tokens"))
    p = pack_sequences(t, "n_tokens", order_col="doc_id",
                       budget=1024, n_blocks=8)
    coin = (F.conv(F.substring(F.md5(F.col("doc_id").cast("string")),
                               1, 8), 16, 10)
            .cast("long") % 1000003)
    contrib = coin * ((F.col("prev_tokens") % 1000003)
                      + 31 * (F.col("seq_id") % 1000003)
                      + 961 * F.col("seq_offset") + F.col("n_tokens"))
    return p.agg(F.count(F.lit(1)).cast("long").alias("n_rows"),
                 F.sum(contrib).cast("long").alias("checksum"))


@q("px3c_pack_naive_window", _PX3_SQL)
def px3c_pack_naive_window(spark, sf_dir):
    """Driver-gate decomposition probe (round-5 VERDICT item 1c): the
    same oracle as px3, but the Spark side is the NAIVE single global
    window prefix sum — the correct-but-single-task twin of
    pack_sequences. If px3 is red while this is green, the divergence is
    inside the two-phase distributed prefix; if both share px3's fate,
    pack_sequences is exonerated and the divergence is in the shared
    token counting or the comparison layer. NOT a scale shape — probe
    only (the production path is pack_sequences)."""
    from crawler_spark.functions.text import token_count_col
    d = _t(spark, sf_dir, "documents")
    t = d.select("doc_id", token_count_col(F.col("text")).alias("n_tokens"))
    w = (Window.orderBy("doc_id")
         .rowsBetween(Window.unboundedPreceding, -1))
    prev = F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).cast("long")
    return (t.withColumn("prev_tokens", prev)
            .withColumn("seq_id",
                        F.floor(F.col("prev_tokens") / 1024).cast("long"))
            .withColumn("seq_offset",
                        (F.col("prev_tokens") % 1024).cast("long")))


_MM4_MEDIA_TOKENS = 64     # fixed per-image placeholder cost (LLaVA-style)
_MM4_BUDGET = 2048

_MM4_SQL = f"""
WITH spans AS ({_SPAN_SQL}),
tok AS (
  SELECT doc_id,
         COALESCE(list_sum(list_transform(spans, s ->
             CASE WHEN s.kind = 'text' AND trim(s.text) <> ''
                  THEN len(regexp_split_to_array(trim(s.text), '\\s+'))
                  ELSE 0 END)), 0)::BIGINT AS text_tokens,
         ({_MM4_MEDIA_TOKENS} *
          len(list_filter(spans, s -> s.kind = 'media')))::BIGINT
           AS media_tokens
  FROM spans),
t AS (SELECT doc_id, text_tokens, media_tokens,
             text_tokens + media_tokens AS n_tokens FROM tok),
c AS (
  SELECT *, COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
            0)::BIGINT AS prev_tokens
  FROM t)
SELECT doc_id, text_tokens, media_tokens, n_tokens, prev_tokens,
       (prev_tokens // {_MM4_BUDGET})::BIGINT AS seq_id,
       (prev_tokens % {_MM4_BUDGET})::BIGINT AS seq_offset
FROM c
"""


@q("mm4_multimodal_pack", _MM4_SQL)
def mm4_multimodal_pack(spark, sf_dir):
    """Multimodal sequence packing: interleaved text+media span sequences
    are costed in TRAINING tokens — text spans at their word count, each
    media span at a fixed {64}-token placeholder (the vision-language
    convention: an image occupies a constant patch-token block in the
    packed sequence) — then laid end-to-end and chunked into 2048-token
    training sequences via the distributed two-phase prefix sum
    (operators/sampling.pack_sequences; the oracle is the sequential
    single-window form). Composes px2's per-row span algebra with px3's
    scale-safe packing: the token costing is zero-shuffle HOF algebra, the
    global order dependency stays one n_blocks-row offset table."""
    from crawler_spark.operators.sampling import pack_sequences
    s = _spans_df(spark, sf_dir)
    text_tokens = F.aggregate(
        F.transform(
            "spans",
            lambda sp: F.when(
                (sp.kind == "text") & (F.trim(sp.text) != ""),
                F.size(F.split(F.trim(sp.text), r"\s+")))
             .otherwise(F.lit(0)).cast("long")),
        F.lit(0).cast("long"), lambda acc, x: acc + x)
    media_tokens = (
        F.lit(_MM4_MEDIA_TOKENS)
        * F.size(F.filter("spans", lambda sp: sp.kind == "media"))
    ).cast("long")
    t = (s.select("doc_id", text_tokens.alias("text_tokens"),
                  media_tokens.alias("media_tokens"))
         .withColumn("n_tokens",
                     (F.col("text_tokens") + F.col("media_tokens"))
                     .cast("long")))
    return pack_sequences(t, "n_tokens", order_col="doc_id",
                          budget=_MM4_BUDGET, n_blocks=8)

# =====================================================================
# Round-3 late additions: LM order-2 scoring, temperature mixing,
# recrawl snapshot diff, WARC round-trip
# =====================================================================

@q("tx12_bigram_logprob", """
WITH w AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w
           FROM documents),
bg AS (SELECT doc_id,
              unnest(list_transform(range(1, len(w)),
                                    i -> w[i] || ' ' || w[i + 1])) AS bigram
       FROM w),
c12 AS (SELECT bigram, count(*) AS c12 FROM bg GROUP BY 1),
c1 AS (SELECT split_part(bigram, ' ', 1) AS w1, count(*) AS c1
       FROM bg GROUP BY 1)
SELECT bg.doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
       round(avg(ln(c1.c1) - ln(c12.c12)), 4) AS neg_logprob
FROM bg JOIN c12 USING (bigram)
        JOIN c1 ON split_part(bg.bigram, ' ', 1) = c1.w1
GROUP BY bg.doc_id
""")
def tx12_bigram_logprob(spark, sf_dir):
    """Order-2 LM fluency scoring: mean -ln(P(w2|w1)) under the corpus's
    own bigram conditionals — the word-ORDER axis tx10's unigram score is
    blind to (shuffled text keeps its tx10 score, spikes here). Map-side
    HOF bigram generation; two partial-agg shuffles + joins back. See
    operators/langmodel.bigram_logprob."""
    from crawler_spark.operators.langmodel import bigram_logprob
    return bigram_logprob(_t(spark, sf_dir, "documents"))


_PX5_ALPHA, _PX5_BUDGET = 0.3, 450


@q("px5_temperature_mix", f"""
WITH c AS (SELECT lang, count(*) AS n_docs FROM documents GROUP BY 1),
t AS (SELECT CAST(sum(n_docs) AS DOUBLE) AS n FROM c),
q AS (SELECT lang, n_docs, pow(n_docs / t.n, {_PX5_ALPHA}) AS q
      FROM c CROSS JOIN t),
z AS (SELECT sum(q) AS z FROM q),
r AS (SELECT lang, n_docs, round(q / z.z, 6) AS p_sample,
             round(least(1.0, {_PX5_BUDGET} * (q / z.z) / n_docs), 6) AS rate
      FROM q CROSS JOIN z)
SELECT r.lang, CAST(r.n_docs AS BIGINT) AS n_docs, r.p_sample,
       CAST(count(*) AS BIGINT) AS n_kept
FROM documents d JOIN r ON d.lang = r.lang
WHERE ('0x' || substr(md5('ts/' || d.source || '/' || d.doc_id), 1, 8))::BIGINT
      < CAST(floor(r.rate * 4294967296.0) AS BIGINT)
GROUP BY 1, 2, 3
""")
def px5_temperature_mix(spark, sf_dir):
    """XLM-R/mT5 temperature sampling (p_l ∝ (n_l/N)^alpha, alpha=0.3):
    per-language sampled-corpus summary — stratum size, target proportion,
    and how many docs the content-stable md5 coin kept under a 450-doc
    budget (en is cut hard, tail langs ride near/at rate 1.0). Corpus
    never shuffles; the rate table is a broadcast. See
    operators/sampling.temperature_sampling."""
    from crawler_spark.operators.sampling import temperature_sampling
    d = _t(spark, sf_dir, "documents")
    key = F.concat(F.col("source"), F.lit("/"), F.col("doc_id").cast("string"))
    kept = temperature_sampling(d, "lang", key, alpha=_PX5_ALPHA,
                                budget=_PX5_BUDGET)
    return (kept.groupBy("lang", "n_docs", "p_sample")
            .agg(F.count("*").alias("n_kept"))
            .select("lang", F.col("n_docs").cast("long").alias("n_docs"),
                    "p_sample", "n_kept"))


@q("rc3_snapshot_diff", """
WITH old AS (SELECT doc_id, md5(text) AS fp FROM documents
             WHERE doc_id % 10 <> 9),
new AS (SELECT doc_id,
               md5(CASE WHEN doc_id % 7 = 0 THEN text || '#v2'
                        ELSE text END) AS fp
        FROM documents WHERE doc_id % 10 <> 0)
SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
       CASE WHEN o.fp IS NULL THEN 'new'
            WHEN n.fp IS NULL THEN 'gone'
            WHEN o.fp = n.fp THEN 'unchanged'
            ELSE 'changed' END AS status
FROM old o FULL OUTER JOIN new n ON o.doc_id = n.doc_id
""")
def rc3_snapshot_diff(spark, sf_dir):
    """Incremental-recrawl delta between two crawl snapshots (new / gone /
    changed / unchanged per URL) — the per-wave operator that feeds the
    change-rate estimator (rc2) and ships only deltas downstream. Snapshots
    derived deterministically from `documents`: the old crawl misses the
    %10==9 slice, the new one misses %10==0 and re-fetched different
    content for the %7==0 docs. One full-outer join on the key; bucketed
    snapshot storage makes it shuffle-free at 10^10 URLs. See
    operators/recrawl.snapshot_diff."""
    from crawler_spark.operators.recrawl import snapshot_diff
    d = _t(spark, sf_dir, "documents")
    old = (d.where(F.col("doc_id") % 10 != 9)
           .select(F.col("doc_id"), F.md5("text").alias("fingerprint")))
    new = (d.where(F.col("doc_id") % 10 != 0)
           .select(F.col("doc_id"),
                   F.md5(F.when(F.col("doc_id") % 7 == 0,
                                F.concat(F.col("text"), F.lit("#v2")))
                         .otherwise(F.col("text"))).alias("fingerprint")))
    return snapshot_diff(old, new, key_col="doc_id", fp_col="fingerprint")


@q("wc1_warc_roundtrip", """
SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       md5(text) AS payload_md5
FROM documents
""")
def wc1_warc_roundtrip(spark, sf_dir):
    """WARC 1.0 interchange gate: render every document into spec-shaped
    WARC response records, concatenate them into 20 archive files in
    deterministic order (all JVM-side), then re-parse the blobs with the
    Content-Length-framed mapInPandas splitter and prove every payload
    byte survived (md5 vs the corpus straight from parquet — the oracle
    never sees WARC at all, so any framing bug breaks the hash). See
    sources/warc.py."""
    from crawler_spark.sources.warc import (
        parse_warc, warc_file_blobs, warc_record_col,
    )
    d = _t(spark, sf_dir, "documents")
    uri = F.concat(F.lit("https://corpus.example/doc/"),
                   F.col("doc_id").cast("string"))
    files = warc_file_blobs(
        d.withColumn("file_id", (F.col("doc_id") % 20).cast("long")),
        "file_id", "doc_id", warc_record_col(uri, F.col("text")))
    parsed = parse_warc(files, "blob")
    return parsed.select(
        F.regexp_extract("target_uri", r"/doc/(\d+)$", 1).cast("long")
         .alias("doc_id"),
        F.col("n_bytes"),
        F.md5("payload").alias("payload_md5"))


_G5_EDGES_SQL = (
    "SELECT DISTINCT source AS src, "
    "'src' || CAST((doc_id * 7 + 3) % 40 AS VARCHAR) AS dst FROM documents "
    "WHERE doc_id % 11 = 0 "
    "AND source <> 'src' || CAST((doc_id * 7 + 3) % 40 AS VARCHAR)")
_G5_SEEDS_SQL = "SELECT 'src0' AS host UNION ALL SELECT 'src9'"

from crawler_spark.operators.hostrank import (  # noqa: E402
    hop_distance, hop_distance_oracle_sql, hyperanf_oracle_sql,
)


@q("g5_hop_distance",
   hop_distance_oracle_sql(_G5_EDGES_SQL, _G5_SEEDS_SQL, max_hops=6))
def g5_hop_distance(spark, sf_dir):
    """BFS hop distance from a 2-seed host set over a sparse deterministic
    host graph (depths 0-4 + unreachable hosts at this fixture) — the
    crawl-planning "how deep must the frontier go" view, and the graph twin
    of the wave loop: each hop is the engine's expand + seen-anti-join (J1)
    shape at host cardinality with per-hop lineage cuts. Oracle: recursive
    min-over-paths CTE under the same hop cap. See
    operators/hostrank.hop_distance."""
    d = _t(spark, sf_dir, "documents")
    dst = F.concat(F.lit("src"),
                   ((F.col("doc_id") * 7 + 3) % 40).cast("string"))
    edges = (d.where(F.col("doc_id") % 11 == 0)
             .select(F.col("source").alias("src"), dst.alias("dst"))
             .where(F.col("src") != F.col("dst"))
             .distinct())
    seeds = spark.createDataFrame([("src0",), ("src9",)], "host string")
    return hop_distance(edges, seeds, max_hops=6)


@q("g16_hyperanf", hyperanf_oracle_sql(_G5_EDGES_SQL, max_hops=4))
def g16_hyperanf(spark, sf_dir):
    """HyperANF neighborhood function (Boldi et al. WWW'11) over the g5
    host graph: per-host HLL estimates of |ball(v, r)| for r = 0..4 via
    register-wise max BFS — the 10^8-host alternative to per-node exact
    BFS, under the bit-exact hash gate thanks to ks4's integer register
    algebra (long-form (host, reg, mj) state; one UNION ALL + partial-
    agged groupBy max per round; one double division per output row).
    Oracle unrolls the rounds as MATERIALIZED CTEs. See
    operators/hostrank.hyperanf."""
    from crawler_spark.operators.hostrank import hyperanf
    d = _t(spark, sf_dir, "documents")
    dst = F.concat(F.lit("src"),
                   ((F.col("doc_id") * 7 + 3) % 40).cast("string"))
    edges = (d.where(F.col("doc_id") % 11 == 0)
             .select(F.col("source").alias("src"), dst.alias("dst"))
             .where(F.col("src") != F.col("dst"))
             .distinct())
    return hyperanf(edges, max_hops=4)


@q("ex1_boilerplate_strip", """
SELECT doc_id,
       CAST(ceil(len(regexp_split_to_array(trim(text), '\\s+')) / 8.0)
            AS INT) AS n_blocks,
       md5(array_to_string(regexp_split_to_array(trim(text), '\\s+'), ' '))
         AS content_md5
FROM documents
""")
def ex1_boilerplate_strip(spark, sf_dir):
    """Main-content extraction gated by the wc1 round-trip pattern: each
    document is rendered into an HTML page with link-dense chrome (nav,
    sidebar, footer) around its 8-word content paragraphs (every 4th
    paragraph carries an inline anchor that must SURVIVE), then the
    link-density extractor must reproduce the normalized original text
    md5-exactly and keep exactly the content blocks — the oracle never
    sees HTML. Pure codegen column algebra, zero shuffle, zero Python.
    The page is let-bound once via the array/transform idiom (NOTES fact
    #1) so the render isn't re-evaluated per consumer. See
    functions/extract.py."""
    from crawler_spark.functions.extract import (
        main_content_col, n_content_blocks_col, render_page_col,
    )
    d = _t(spark, sf_dir, "documents")
    words = F.split(F.trim(F.col("text")), r"\s+")
    page = render_page_col(words, F.col("source"))
    stats = F.element_at(
        F.transform(F.array(page), lambda p: F.struct(
            n_content_blocks_col(p).cast("int").alias("n_blocks"),
            F.md5(main_content_col(p)).alias("content_md5"))), 1)
    return d.select("doc_id",
                    stats.getField("n_blocks").alias("n_blocks"),
                    stats.getField("content_md5").alias("content_md5"))


@q("j6_asof_join", """
WITH l AS (SELECT event_id, user_id,
                  CAST(floor(epoch(ts)) AS BIGINT) AS t FROM events),
u AS (SELECT DISTINCT user_id FROM events),
r AS (SELECT user_id,
             CAST(1704067200 + user_id * 3600 + k * 604800 AS BIGINT)
               AS v_from,
             'v' || CAST(k AS VARCHAR) AS version
      FROM u, range(0, 4) t(k))
SELECT l.event_id, l.user_id, l.t, r.version, r.v_from
FROM l ASOF LEFT JOIN r
  ON l.user_id = r.user_id AND l.t >= r.v_from
""")
def j6_asof_join(spark, sf_dir):
    """As-of join (the brief's named custom operator): each event picks up
    the config version IN FORCE at its timestamp — most recent
    v_from <= t per user, null before the first version. Engine side is
    the union-and-window formulation (ONE shuffle, no join node, no
    inequality pair blow-up); the oracle is DuckDB's native ASOF LEFT
    JOIN. Version dim: 4 weekly versions per user, offset by user so
    early events fall before v0. See operators/joins.asof_join."""
    from crawler_spark.operators.joins import asof_join
    e = _t(spark, sf_dir, "events")
    l = e.select("event_id", "user_id",
                 F.unix_timestamp("ts").cast("long").alias("t"))
    r = (e.select("user_id").distinct()
         .select("user_id",
                 F.explode(F.sequence(F.lit(0), F.lit(3))).alias("k"))
         .select("user_id",
                 (F.lit(1704067200) + F.col("user_id") * 3600
                  + F.col("k") * 604800).cast("long").alias("v_from"),
                 F.concat(F.lit("v"), F.col("k").cast("string"))
                  .alias("version")))
    out = asof_join(l, r, on="user_id", left_ts="t", right_ts="v_from")
    return out.select("event_id", "user_id", "t", "version", "v_from")


@q("j7_range_join", """
WITH b(band_id, lo, hi) AS (VALUES
  (0, 0.0, 50.0), (1, 30.0, 120.0), (2, 100.0, 250.0),
  (3, 200.0, 490.0), (4, 480.0, 500.0), (5, 0.0, 500.0))
SELECT e.event_id, CAST(b.band_id AS INT) AS band_id,
       round(e.value, 2) AS value
FROM events e JOIN b ON e.value >= b.lo AND e.value < b.hi
""")
def j7_range_join(spark, sf_dir):
    """Banded range join (the brief's named custom operator): every
    (event, band) pair with lo <= value < hi over OVERLAPPING bands —
    rate-tier/size-class lookup. Engine side rewrites the inequality join
    as bucket expansion + broadcast EQUI-join + residual filter (no
    nested-loop, facts never shuffle); the oracle is the plain inequality
    join. See operators/joins.range_join."""
    from crawler_spark.operators.joins import range_join
    e = _t(spark, sf_dir, "events")
    bands = spark.createDataFrame(
        [(0, 0.0, 50.0), (1, 30.0, 120.0), (2, 100.0, 250.0),
         (3, 200.0, 490.0), (4, 480.0, 500.0), (5, 0.0, 500.0)],
        "band_id int, lo double, hi double")
    out = range_join(e, bands, "value", "lo", "hi", bucket_width=32.0)
    return out.select("event_id", F.col("band_id").cast("int"),
                      F.round("value", 2).alias("value"))


@q("ks1_kmv_distinct", """
WITH h AS (SELECT CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day_id,
                  ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
                    AS h32
           FROM events GROUP BY 1, 2),
r AS (SELECT day_id, h32,
             row_number() OVER (PARTITION BY day_id ORDER BY h32) AS rk
      FROM h),
a AS (SELECT day_id, CAST(count(*) AS BIGINT) AS n_exact,
             max(CASE WHEN rk = 64 THEN h32 END) AS hk
      FROM r GROUP BY 1)
SELECT day_id, n_exact,
       CASE WHEN n_exact < 64 THEN CAST(n_exact AS DOUBLE)
            ELSE round(63.0 * 4294967296.0 / hk, 4) END AS kmv_est
FROM a
""")
def ks1_kmv_distinct(spark, sf_dir):
    """KMV distinct-count sketch (k=64) of daily active users — the
    oracle-checkable stand-in for approx_count_distinct's HLL (whose
    register layout can never cross engines). Exact count printed next to
    the estimate so the fixture shows the sketch actually estimating.
    See operators/sketches.kmv_distinct."""
    from crawler_spark.operators.sketches import kmv_distinct
    e = _t(spark, sf_dir, "events")
    d = e.select(F.floor(F.unix_timestamp("ts") / 86400).cast("long")
                 .alias("day_id"), "user_id")
    return kmv_distinct(d, ["day_id"], F.col("user_id"), k=64)


@q("st5_hypertable_rollup", """
WITH x AS (SELECT event_type,
                  CAST(epoch(date_trunc('day', ts)) AS BIGINT) AS day_start,
                  CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_start,
                  value
           FROM events)
SELECT COALESCE(event_type, '(all)') AS event_type,
       COALESCE(day_start, -1) AS day_start,
       COALESCE(hour_start, -1) AS hour_start,
       CAST(count(*) AS BIGINT) AS n, round(sum(value), 2) AS sum_value
FROM x GROUP BY ROLLUP(event_type, day_start, hour_start)
""")
def st5_hypertable_rollup(spark, sf_dir):
    """Hypertable-style continuous aggregate (the brief's named example):
    the SAME metric materialized at every granularity of the
    type -> day -> hour hierarchy in ONE pass — GROUP BY ROLLUP plans a
    single Expand + partial/final agg (one shuffle total), not three
    scans. This is how per-hour, per-day and all-time crawl metrics
    coexist at 100 TB without re-reading the events."""
    e = _t(spark, sf_dir, "events")
    x = e.select(
        "event_type",
        F.unix_timestamp(F.date_trunc("day", F.col("ts"))).cast("long")
         .alias("day_start"),
        F.unix_timestamp(F.date_trunc("hour", F.col("ts"))).cast("long")
         .alias("hour_start"),
        "value")
    return (x.rollup("event_type", "day_start", "hour_start")
            .agg(F.count("*").alias("n"),
                 F.round(F.sum("value"), 2).alias("sum_value"))
            .select(F.coalesce(F.col("event_type"), F.lit("(all)"))
                     .alias("event_type"),
                    F.coalesce(F.col("day_start"), F.lit(-1)).cast("long")
                     .alias("day_start"),
                    F.coalesce(F.col("hour_start"), F.lit(-1)).cast("long")
                     .alias("hour_start"),
                    "n", "sum_value"))


@q("g6_redirect_resolve", """
WITH RECURSIVE e AS (
  SELECT 'u' || CAST(doc_id AS VARCHAR) AS src,
         CASE WHEN doc_id % 40 = 3 THEN 'u' || CAST(doc_id - 3 AS VARCHAR)
              ELSE 'u' || CAST(doc_id + 1 AS VARCHAR) END AS dst
  FROM documents WHERE doc_id % 4 <> 3 OR doc_id % 40 = 3),
walk AS (
  SELECT src AS start, dst AS cur, 1 AS hops FROM e
  UNION ALL
  SELECT walk.start, e.dst, walk.hops + 1
  FROM walk JOIN e ON e.src = walk.cur WHERE walk.hops < 16),
fin AS (SELECT start, cur, hops,
               row_number() OVER (PARTITION BY start ORDER BY hops DESC)
                 AS rk
        FROM walk)
SELECT start AS src, cur AS final, CAST(hops AS INT) AS hops,
       CAST(CASE WHEN cur IN (SELECT src FROM e) THEN 0 ELSE 1 END AS INT)
         AS resolved
FROM fin WHERE rk = 1
""")
def g6_redirect_resolve(spark, sf_dir):
    """3xx redirect-chain resolution by pointer doubling (Wyllie list
    ranking): final landing URL + hop count for every redirect source,
    loops surfaced as resolved=0 at the 16-hop fetcher cap instead of
    chased forever. Deterministic fixture: length<=3 chains plus a 4-cycle
    every 10th group. Four self-joins at edge cardinality replace up to 16
    sequential joins — the O(log L) shape that survives 10^10-edge redirect
    graphs. Oracle: recursive walk capped at 16 hops, max-hop row per
    start. See operators/hostrank.resolve_redirects."""
    from crawler_spark.operators.hostrank import resolve_redirects
    d = _t(spark, sf_dir, "documents")
    u = lambda c: F.concat(F.lit("u"), c.cast("string"))  # noqa: E731
    edges = (d.where((F.col("doc_id") % 4 != 3) | (F.col("doc_id") % 40 == 3))
             .select(u(F.col("doc_id")).alias("src"),
                     u(F.when(F.col("doc_id") % 40 == 3,
                              F.col("doc_id") - 3)
                       .otherwise(F.col("doc_id") + 1)).alias("dst")))
    return resolve_redirects(edges, rounds=4)


@q("j8_time_window_join", """
WITH x AS (SELECT event_id, user_id, CAST(floor(epoch(ts)) AS BIGINT) AS t,
                  event_type
           FROM events),
e AS (SELECT event_id, user_id, t FROM x WHERE event_type = 'error'),
c AS (SELECT user_id, t AS ct FROM x WHERE event_type = 'click')
SELECT e.event_id, e.user_id, e.t,
       CAST(count(c.ct) AS BIGINT) AS n_prior_clicks
FROM e LEFT JOIN c
  ON c.user_id = e.user_id AND e.t >= c.ct AND e.t - c.ct < 300
GROUP BY 1, 2, 3
""")
def j8_time_window_join(spark, sf_dir):
    """Per-key temporal correlation (stream-stream join's batch twin): for
    every error event, how many clicks the same user made in the preceding
    5 minutes. Engine side buckets time at the lag width and explodes the
    right side to {b, b+1}, turning the per-key inequality cartesian into
    an equi-join on (user, bucket) + residual — O(matches), not O(n² per
    hot user). Oracle is the plain inequality join. See
    operators/joins.time_window_join."""
    from crawler_spark.operators.joins import time_window_join
    x = _t(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type",
        F.unix_timestamp("ts").cast("long").alias("t"))
    errors = x.where(F.col("event_type") == "error") \
              .select("event_id", "user_id", "t")
    clicks = x.where(F.col("event_type") == "click") \
              .select("user_id", F.col("t").alias("ct"))
    m = time_window_join(errors, clicks, on="user_id",
                         left_ts="t", right_ts="ct", lag_max=300)
    cnt = m.groupBy("event_id").agg(F.count("*").alias("n"))
    return (errors.join(cnt, "event_id", "left")
            .select("event_id", "user_id", "t",
                    F.coalesce("n", F.lit(0)).cast("long")
                     .alias("n_prior_clicks")))


@q("ks2_countmin", """
WITH k AS (SELECT CAST(user_id AS VARCHAR) AS _k FROM events),
cells AS (SELECT j,
                 ('0x' || substr(md5(CAST(j AS VARCHAR) || '/' || _k), 1, 8))
                   ::BIGINT % 64 AS b,
                 count(*) AS c
          FROM k, range(0, 4) t(j) GROUP BY 1, 2),
keys AS (SELECT DISTINCT _k FROM k),
kb AS (SELECT _k, j,
              ('0x' || substr(md5(CAST(j AS VARCHAR) || '/' || _k), 1, 8))
                ::BIGINT % 64 AS b
       FROM keys, range(0, 4) t(j)),
est AS (SELECT _k, min(c) AS cm_est FROM kb JOIN cells USING (j, b)
        GROUP BY 1),
exact AS (SELECT _k, CAST(count(*) AS BIGINT) AS n_exact FROM k GROUP BY 1)
SELECT exact._k AS key, n_exact, CAST(cm_est AS BIGINT) AS cm_est
FROM exact JOIN est USING (_k)
""")
def ks2_countmin(spark, sf_dir):
    """Count-Min frequency sketch (depth 4 x width 64) of per-user event
    counts — the mergeable overestimating frequency companion to ks1's
    KMV cardinality sketch, exactly reproducible across engines from the
    md5 hash rows. 150 users into 64 buckets collide by construction, so
    the fixture shows cm_est >= n_exact with real overcounts. See
    operators/sketches.count_min."""
    from crawler_spark.operators.sketches import count_min
    e = _t(spark, sf_dir, "events")
    return count_min(e, F.col("user_id"), depth=4, width=64)


@q("mm6_span_stats", """
WITH spans AS (""" + _SPAN_SQL + """)
SELECT doc_id,
       len(spans)::BIGINT AS n_spans,
       len(list_filter(spans, x -> x.kind = 'text'))::BIGINT AS n_text,
       CAST(CASE WHEN len(spans) >= 2 THEN
              len(list_filter(range(2, len(spans) + 1),
                              i -> spans[i].kind <> spans[i-1].kind))
            ELSE 0 END + 1 AS BIGINT) AS n_runs,
       CAST(list_sum(list_transform(spans, x ->
              CASE WHEN x.kind = 'text' THEN length(x.text) ELSE 0 END))
            AS BIGINT) AS text_chars,
       CAST(list_max(list_transform(spans, x -> x."offset")) AS BIGINT)
         AS last_offset
FROM spans
""")
def mm6_span_stats(spark, sf_dir):
    """Interleaved span-sequence profiling (the px2 keep-gate's diagnostic
    sibling): per document, span count, text-span count, the number of
    maximal same-kind RUNS (the text<->media alternation structure
    interleaved-pretraining curricula select on), total text characters,
    and the last span offset. One let-bound struct fold over the span
    array (NOTES fact #1: five sibling stats referencing the spans
    projection directly would re-derive it five times) — adjacent-kind
    boundaries come from an index filter over the ALREADY-EVALUATED lambda
    array, so the whole row is zero-shuffle codegen algebra."""
    s = _spans_df(spark, sf_dir)

    def stats(sp):
        n = F.size(sp)
        boundaries = F.when(n >= 2, F.size(F.filter(
            F.sequence(F.lit(2), n),
            lambda i: F.element_at(sp, i).getField("kind")
            != F.element_at(sp, i - 1).getField("kind")))).otherwise(F.lit(0))
        text_len = F.transform(
            sp, lambda x: F.when(x.kind == "text", F.length(x.text))
                           .otherwise(F.lit(0)).cast("long"))
        return F.struct(
            n.cast("long").alias("n_spans"),
            F.size(F.filter(sp, lambda x: x.kind == "text")).cast("long")
             .alias("n_text"),
            (boundaries + 1).cast("long").alias("n_runs"),
            F.aggregate(text_len, F.lit(0).cast("long"),
                        lambda a, x: a + x).alias("text_chars"),
            F.array_max(F.transform(sp, lambda x: x.offset)).cast("long")
             .alias("last_offset"))

    st = F.element_at(F.transform(F.array(F.col("spans")), stats), 1)
    return s.select(
        "doc_id", st.getField("n_spans").alias("n_spans"),
        st.getField("n_text").alias("n_text"),
        st.getField("n_runs").alias("n_runs"),
        st.getField("text_chars").alias("text_chars"),
        st.getField("last_offset").alias("last_offset"))


@q("mm7_media_dedup", """
WITH spans AS (""" + _SPAN_SQL + """),
m AS (SELECT doc_id, unnest(spans) AS s FROM spans)
SELECT regexp_replace(s.media_ref, '/[0-9]+/m', '/m') AS asset,
       CAST(count(*) AS BIGINT) AS n_refs,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
       min(doc_id) AS first_doc
FROM m WHERE s.kind = 'media' GROUP BY 1
""")
def mm7_media_dedup(spark, sf_dir):
    """Media-asset dedup across interleaved documents: the crawler's
    fetch-once rule for images/video (J1's anti-join analog at ASSET
    granularity). media_refs normalize to their underlying asset key
    (the per-doc path segment stripped — CDNs serve one object under
    per-page URLs), then one partial-agged shuffle yields each asset's
    reference count, citing-document count, and first-seen document (the
    canonical fetch owner). At 100 TB the explode is map-side and the
    groupBy carries only (asset) keys — no doc payload moves."""
    s = _spans_df(spark, sf_dir)
    m = (s.select("doc_id", F.explode("spans").alias("s"))
         .where(F.col("s.kind") == "media")
         .select("doc_id",
                 F.regexp_replace(F.col("s.media_ref"), "/[0-9]+/m", "/m")
                  .alias("asset")))
    return (m.groupBy("asset")
            .agg(F.count("*").cast("long").alias("n_refs"),
                 F.countDistinct("doc_id").cast("long").alias("n_docs"),
                 F.min("doc_id").alias("first_doc")))


@q("ks3_exact_quantile", """
WITH v AS (SELECT event_type, value AS _v, count(*) AS _c
           FROM events GROUP BY 1, 2),
r AS (SELECT event_type, _v, _c,
             sum(_c) OVER (PARTITION BY event_type ORDER BY _v
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS _cum,
             sum(_c) OVER (PARTITION BY event_type) AS _n
      FROM v)
SELECT event_type, CAST(sum(_c) AS BIGINT) AS n,
       round(min(CASE WHEN _cum >= ceil(CAST(0.5 AS DOUBLE) * _n)
                 THEN _v END), 4) AS q_50,
       round(min(CASE WHEN _cum >= ceil(CAST(0.9 AS DOUBLE) * _n)
                 THEN _v END), 4) AS q_90,
       round(min(CASE WHEN _cum >= ceil(CAST(0.99 AS DOUBLE) * _n)
                 THEN _v END), 4) AS q_99
FROM r GROUP BY event_type
""")
def ks3_exact_quantile(spark, sf_dir):
    """Distributed EXACT per-type latency/value quantiles (p50/p90/p99) —
    the oracle-checkable companion to approx_percentile, whose t-digest
    state can never hash across engines. The plan compresses to DISTINCT
    (type, value) pairs before any sort (map-side combine absorbs repeated
    measurements), so the per-group window runs at distinct-value
    cardinality. ceil(q*n) is evaluated in DOUBLE on both engines (a
    DECIMAL literal would ceil differently on exact multiples). See
    operators/sketches.exact_quantiles."""
    from crawler_spark.operators.sketches import exact_quantiles
    e = _t(spark, sf_dir, "events")
    return exact_quantiles(e.select("event_type", "value"),
                           ["event_type"], F.col("value"),
                           qs=(0.5, 0.9, 0.99))


_G7_HOSTS_SQL = ("(SELECT DISTINCT source AS src, "
                 "CAST(substr(source, 4) AS INT) AS h FROM documents)")
_G7_EDGES_SQL = f"""
SELECT src, 'src' || CAST((h + 1) % 40 AS VARCHAR) AS dst FROM {_G7_HOSTS_SQL} hosts
UNION ALL
SELECT src, 'src' || CAST((h + 2) % 40 AS VARCHAR) FROM {_G7_HOSTS_SQL} hosts
UNION ALL
SELECT src, 'src' || CAST((h * 7 + 3) % 23 AS VARCHAR) FROM {_G7_HOSTS_SQL} hosts
"""

from crawler_spark.operators.hostrank import triangle_oracle_sql  # noqa: E402


@q("g7_triangle_count", triangle_oracle_sql(_G7_EDGES_SQL))
def g7_triangle_count(spark, sf_dir):
    """Per-host triangle participation over the host link graph — the
    clustering/cohesion signal behind link-farm and mirror-ring detection.
    Engine side is the DEGREE-ORDERED oriented wedge join (out-degree
    bounded by O(sqrt(m)) per node, so a Zipf hub can't go quadratic);
    the oracle is the plain lexicographic a<b<c three-way join — the
    triangle set is orientation-independent. Fixture graph: two chain
    families (h->h+1, h->h+2 mod 40: one guaranteed triangle per host)
    plus the g1 link family (h->7h+3 mod 23) for irregular closures.
    See operators/hostrank.triangle_counts."""
    from crawler_spark.operators.hostrank import triangle_counts
    d = _t(spark, sf_dir, "documents")
    hosts = d.select(F.col("source").alias("src"),
                     F.substring("source", 4, 10).cast("int").alias("h")) \
             .distinct()

    def to_dst(e):
        return F.concat(F.lit("src"), e.cast("string"))

    edges = (hosts.select("src", to_dst((F.col("h") + 1) % 40).alias("dst"))
             .unionAll(hosts.select(
                 "src", to_dst((F.col("h") + 2) % 40).alias("dst")))
             .unionAll(hosts.select(
                 "src", to_dst((F.col("h") * 7 + 3) % 23).alias("dst"))))
    return triangle_counts(edges)


@q("px6_stratified_split", """
WITH r AS (SELECT doc_id, lang,
                  row_number() OVER (PARTITION BY lang
                      ORDER BY md5('strat/' || CAST(doc_id AS VARCHAR)),
                               doc_id) AS rk,
                  count(*) OVER (PARTITION BY lang) AS n
           FROM documents)
SELECT doc_id, lang, CAST(rk AS BIGINT) AS strat_rank
FROM r WHERE rk <= CAST(ceil(CAST(0.2 AS DOUBLE) * n) AS BIGINT)
""")
def px6_stratified_split(spark, sf_dir):
    """Exact-quota stratified holdout: ceil(20%) of every language,
    selected by content-stable md5 rank (hex order == numeric order,
    NOTES fact #3) — zero quota variance, nested-monotone in the
    fraction, reproducible across engines/partitionings. One shuffle on
    the stratum key. See operators/sampling.stratified_sample."""
    from crawler_spark.operators.sampling import stratified_sample
    d = _t(spark, sf_dir, "documents").select("doc_id", "lang")
    out = stratified_sample(d, "lang", F.col("doc_id"), 0.2)
    return out.select("doc_id", "lang", F.col("_rk").alias("strat_rank"))


@q("dd12_containment", """
WITH sh AS (""" + _SHINGLE_SQL + """),
ex AS (SELECT doc_id, unnest(sh) AS s FROM sh),
df AS (SELECT s, count(*) AS df FROM ex GROUP BY s),
fex AS (SELECT ex.doc_id, ex.s FROM ex JOIN df ON ex.s = df.s
        WHERE df.df <= 64),
cands AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM fex a JOIN fex b ON a.s = b.s AND a.doc_id < b.doc_id),
v AS (SELECT doc_a, doc_b,
             round(len(list_intersect(sa.sh, sb.sh)) * 1.0 / len(sa.sh), 4)
               AS c_ab,
             round(len(list_intersect(sa.sh, sb.sh)) * 1.0 / len(sb.sh), 4)
               AS c_ba
      FROM cands
      JOIN sh sa ON sa.doc_id = doc_a
      JOIN sh sb ON sb.doc_id = doc_b)
SELECT doc_a, doc_b, c_ab, c_ba FROM v
WHERE c_ab >= 0.8 OR c_ba >= 0.8
""")
def dd12_containment(spark, sf_dir):
    """Asymmetric shingle CONTAINMENT dedup (|A∩B|/|A|): catches the
    quote-inside-article / page-inside-mirror pairs Jaccard structurally
    misses (a short doc fully embedded in a long one has Jaccard ~0 but
    containment 1.0 — the exact shape of eval-set leaks and boilerplate-
    wrapped duplication). Same two-stage scale shape as dd4: capped
    candidate buckets, TRUE containment over unfiltered sets. See
    operators/textdedup.containment_pairs."""
    from crawler_spark.operators.textdedup import containment_pairs
    d = _t(spark, sf_dir, "documents")
    return containment_pairs(d, threshold=0.8)


@q("st6_late_data_policy", """
WITH x AS (SELECT event_id, CAST(floor(epoch(ts)) AS BIGINT) AS t
           FROM events),
r AS (SELECT event_id, t,
             max(t) OVER (ORDER BY event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS wm0
      FROM x)
SELECT event_id, t, COALESCE(wm0, t) AS wm,
       (t < COALESCE(wm0, t) - 600) AS late
FROM r
""")
def st6_late_data_policy(spark, sf_dir):
    """The watermark admission rule itself, batch-inspectable: replay
    events in arrival order (event_id) and flag exactly the rows a
    withWatermark(ts, 10 min) stream would drop — event time more than
    600s behind the running max already seen. Engine side is a
    DISTRIBUTED PREFIX MAX (block-local cummax + n_blocks-row broadcast
    offsets — px3's prefix-sum shape with max algebra), NOT the global
    single-task window the oracle writes. See
    streaming/windows.late_data_flags."""
    from crawler_spark.streaming.windows import late_data_flags
    e = _t(spark, sf_dir, "events").select("event_id", "ts")
    out = late_data_flags(e, ts_col="ts", order_col="event_id",
                          delay_sec=600)
    return out.select("event_id", "t", "wm", "late")


_G8_EDGES_SQL = (
    "SELECT DISTINCT source AS src, "
    "'src' || CAST((doc_id * 7 + 3) % (1 + (CAST(substr(source, 4) AS INT) "
    "% 20)) AS VARCHAR) AS dst FROM documents "
    "WHERE source <> 'src' || CAST((doc_id * 7 + 3) % (1 + "
    "(CAST(substr(source, 4) AS INT) % 20)) AS VARCHAR)")


@q("g8_degree_histogram", f"""
WITH e0 AS ({_G8_EDGES_SQL}),
out_d AS (SELECT src AS host, count(*) AS deg FROM e0 GROUP BY 1),
in_d AS (SELECT dst AS host, count(*) AS deg FROM e0 GROUP BY 1),
u AS (SELECT 'out' AS direction, deg FROM out_d
      UNION ALL SELECT 'in', deg FROM in_d)
SELECT direction, CAST(length(bin(deg)) - 1 AS INT) AS bucket,
       CAST(count(*) AS BIGINT) AS n_hosts,
       CAST(min(deg) AS BIGINT) AS min_deg,
       CAST(max(deg) AS BIGINT) AS max_deg
FROM u GROUP BY 1, 2
""")
def g8_degree_histogram(spark, sf_dir):
    """Log2-binned in/out-degree distribution of the host link graph —
    the fan-out profile a frontier scheduler sizes its politeness and
    skew-salting thresholds from (a heavy log-log tail == Zipf hubs that
    need the salted path). The log2 bucket is computed as
    length(bin(deg)) - 1: pure integer algebra, bit-identical across
    engines (floor(log2(x)) through libm doubles is NOT — last-ulp
    differences straddle integer boundaries). Two keys-only aggregates;
    degree table is host-cardinality. Fixture: the dst modulus varies
    per source (1 + h%20), so degrees span several log2 buckets."""
    d = _t(spark, sf_dir, "documents")
    h = F.substring("source", 4, 10).cast("int")
    dst = F.concat(F.lit("src"),
                   ((F.col("doc_id") * 7 + 3) % (1 + (h % 20)))
                   .cast("string"))
    e0 = (d.select(F.col("source").alias("src"), dst.alias("dst"))
          .where(F.col("src") != F.col("dst")).distinct())
    out_d = e0.groupBy(F.col("src").alias("host")) \
              .agg(F.count("*").alias("deg"))
    in_d = e0.groupBy(F.col("dst").alias("host")) \
             .agg(F.count("*").alias("deg"))
    u = (out_d.select(F.lit("out").alias("direction"), "deg")
         .unionAll(in_d.select(F.lit("in").alias("direction"), "deg")))
    return (u.groupBy("direction",
                      (F.length(F.bin("deg")) - 1).cast("int")
                      .alias("bucket"))
            .agg(F.count("*").cast("long").alias("n_hosts"),
                 F.min("deg").cast("long").alias("min_deg"),
                 F.max("deg").cast("long").alias("max_deg")))


@q("f9_url_template_mining", """
WITH u AS (
  SELECT doc_id, source,
         (CASE WHEN doc_id % 3 = 0 THEN '/cat'
               WHEN doc_id % 3 = 1 THEN '/tag'
               ELSE '/u' END)
           || CAST(doc_id % 7 AS VARCHAR) || '/item/'
           || CAST(doc_id AS VARCHAR)
           || CASE WHEN doc_id % 5 = 0
                   THEN '/page/' || CAST(doc_id % 97 AS VARCHAR)
                   ELSE '' END AS path
  FROM documents)
SELECT regexp_replace(path, '[0-9]+', 'N', 'g') AS template,
       CAST(count(*) AS BIGINT) AS n_urls,
       CAST(count(DISTINCT source) AS BIGINT) AS n_hosts,
       min(path) AS sample_path
FROM u GROUP BY 1
""")
def f9_url_template_mining(spark, sf_dir):
    """URL template mining — the spider-trap / infinite-space detector:
    collapse every digit run in the path to N and count URLs per
    template. A template whose n_urls explodes while n_hosts stays small
    is a calendar/pagination trap the frontier should cap (the budget
    F7 then applies per template, not per URL). Map-side regex, one
    keys-only shuffle with two-phase count-distinct; template cardinality
    is orders below URL cardinality at 10^10."""
    d = _t(spark, sf_dir, "documents")
    route = (F.when(F.col("doc_id") % 3 == 0, "/cat")
             .when(F.col("doc_id") % 3 == 1, "/tag")
             .otherwise("/u"))
    path = F.concat(
        route, (F.col("doc_id") % 7).cast("string"),
        F.lit("/item/"), F.col("doc_id").cast("string"),
        F.when(F.col("doc_id") % 5 == 0,
               F.concat(F.lit("/page/"),
                        (F.col("doc_id") % 97).cast("string")))
         .otherwise(F.lit("")))
    u = d.select("source", path.alias("path"))
    return (u.groupBy(F.regexp_replace("path", "[0-9]+", "N")
                      .alias("template"))
            .agg(F.count("*").cast("long").alias("n_urls"),
                 F.countDistinct("source").cast("long").alias("n_hosts"),
                 F.min("path").alias("sample_path")))


@q("dd13_lsh_recall", "WITH " + _LSH_CTES + """,
cand AS (SELECT doc_a, doc_b FROM (""" + _LSH_PAIRS_SQL + """)),
tex AS (SELECT doc_id, unnest(sh) AS s FROM sh),
tcand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM tex a JOIN tex b ON a.s = b.s AND a.doc_id < b.doc_id),
truth AS (
  SELECT doc_a, doc_b FROM tcand
  JOIN sh sa ON sa.doc_id = doc_a
  JOIN sh sb ON sb.doc_id = doc_b
  WHERE round(len(list_intersect(sa.sh, sb.sh)) * 1.0
              / len(list_distinct(sa.sh || sb.sh)), 4) >= 0.8)
SELECT (SELECT count(*) FROM truth) AS n_truth,
       (SELECT count(*) FROM cand) AS n_cand,
       (SELECT count(*) FROM truth t
        JOIN cand c ON t.doc_a = c.doc_a AND t.doc_b = c.doc_b) AS n_hit,
       round((SELECT count(*) FROM truth t
              JOIN cand c ON t.doc_a = c.doc_a AND t.doc_b = c.doc_b) * 1.0
             / (SELECT count(*) FROM truth), 4) AS recall
""")
def dd13_lsh_recall(spark, sf_dir):
    """Dedup-index quality evaluation (an5's text twin): recall of dd3's
    MinHash-LSH candidate pairs against the EXHAUSTIVE true-Jaccard>=0.8
    pair set (dd4 semantics with the df cap off). The eval that justifies
    an LSH band configuration before a 10^10-doc run — at scale the truth
    side runs on a sampled slice (it is the quadratic one), the LSH side
    stays the production plan. One row: n_truth, n_cand, n_hit, recall."""
    from crawler_spark.operators.textdedup import (
        _shingle_projection, lsh_band_pairs, ngram_jaccard_pairs,
    )
    d = _t(spark, sf_dir, "documents")
    sh = _shingle_projection(d, "doc_id", "text", 3)  # ONE shingle pass
    truth = ngram_jaccard_pairs(d, threshold=0.8, max_df=None, sh=sh) \
        .select("doc_a", "doc_b")
    cand = lsh_band_pairs(d, n_perm=8, band_size=2, shingle_n=3,
                          max_bucket=64, sh=sh).select("doc_a", "doc_b")
    hits = truth.join(cand.withColumn("_hit", F.lit(1)),
                      ["doc_a", "doc_b"], "left")
    m = hits.agg(F.count("*").cast("long").alias("n_truth"),
                 F.coalesce(F.sum("_hit"), F.lit(0)).cast("long")
                  .alias("n_hit"))
    nc = cand.agg(F.count("*").cast("long").alias("n_cand"))
    return (m.crossJoin(F.broadcast(nc))
            .select("n_truth", "n_cand", "n_hit",
                    F.round(F.col("n_hit") / F.col("n_truth"), 4)
                     .alias("recall")))


_MM8_FRAME_COLS = """
       CAST((n//8) + (CASE WHEN fi < (n%8) THEN 1 ELSE 0 END) AS BIGINT)
         AS frame_bytes,
       CAST(coalesce(list_sum(
         cps[(fi*(n//8) + least(fi, n%8) + 1):
             (fi*(n//8) + least(fi, n%8) + (n//8)
              + (CASE WHEN fi < (n%8) THEN 1 ELSE 0 END))]), 0) AS BIGINT)
         AS frame_sum"""

_MM8_SQL = """
WITH a AS (SELECT doc_id,
                  regexp_replace(text, '[^\\x20-\\x7E]', '', 'g') AS s
           FROM documents),
     b AS (SELECT doc_id,
                  list_transform(split(s, ''), ch -> ascii(ch)) AS cps,
                  length(s) AS n
           FROM a),
     f AS (SELECT doc_id, cps, n, unnest([0, 2, 4, 6]) AS fi FROM b)
SELECT doc_id, CAST(fi AS INT) AS frame_idx,""" + _MM8_FRAME_COLS + """
FROM f
"""


@q("mm8_frame_algebra", _MM8_SQL)
def mm8_frame_algebra(spark, sf_dir):
    """Oracle-checkable frame sampling: the real 1->N mapInPandas fan-out
    (multimodal.frame_byte_sums, sharing np.array_split framing and the
    every_n stride with `sample_frames`) over ASCII-projected payload
    bytes, vs a DuckDB twin of the same frame-boundary algebra over code
    points. With mm8 the whole mm family's SEMANTICS sit under the hash
    gate (mm5: chunk decode algebra; mm8: UDTF fan-out + byte ranges) —
    only the codec calls themselves stay stubbed."""
    from crawler_spark.operators.multimodal import frame_byte_sums
    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.regexp_replace(F.col("text"), r"[^\x20-\x7E]", "")
        .alias("ascii_text"))
    src = d.withColumn("payload_bin", F.encode("ascii_text", "UTF-8"))
    return frame_byte_sums(src, every_n=2, n_frames=8)


@q("so4_intersect", """
SELECT doc_id FROM documents WHERE lang = 'en'
INTERSECT
SELECT doc_id FROM documents WHERE n_chars > 200
""")
def so4_intersect(spark, sf_dir):
    """SO-family completion: INTERSECT (distinct semantics) — the
    frontier-algebra op behind 'URLs both discovered this wave AND due
    for recrawl'. Plans as a left-semi join over distinct keys; one
    keys-only shuffle."""
    d = _t(spark, sf_dir, "documents")
    a = d.where(F.col("lang") == "en").select("doc_id")
    b = d.where(F.col("n_chars") > 200).select("doc_id")
    return a.intersect(b)


@q("a7_metrics_pivot", """
SELECT CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day_id,
       CAST(count(CASE WHEN event_type = 'click' THEN 1 END) AS BIGINT)
         AS n_click,
       CAST(count(CASE WHEN event_type = 'error' THEN 1 END) AS BIGINT)
         AS n_error,
       CAST(count(CASE WHEN event_type = 'view' THEN 1 END) AS BIGINT)
         AS n_view,
       round(sum(CASE WHEN event_type = 'purchase' THEN value END), 2)
         AS purchase_value
FROM events GROUP BY 1
""")
def a7_metrics_pivot(spark, sf_dir):
    """Metrics pivot: the per-day crawl dashboard row (clicks/errors/views
    wide, one column per type) via groupBy().pivot() with an EXPLICIT
    value list — Spark then plans a single pass with pivot-aggregate
    columns (no second job to discover distinct types, which at 10^10
    rows would be a full extra scan). Oracle is the equivalent
    conditional aggregation."""
    e = _t(spark, sf_dir, "events")
    day = F.floor(F.unix_timestamp("ts") / 86400).cast("long")
    p = (e.select(day.alias("day_id"), "event_type", "value")
         .groupBy("day_id")
         .pivot("event_type", ["click", "error", "view", "purchase"])
         .agg(F.count(F.lit(1)).alias("n"),
              F.round(F.sum("value"), 2).alias("val")))
    return p.select(
        "day_id",
        F.coalesce("click_n", F.lit(0)).cast("long").alias("n_click"),
        F.coalesce("error_n", F.lit(0)).cast("long").alias("n_error"),
        F.coalesce("view_n", F.lit(0)).cast("long").alias("n_view"),
        F.col("purchase_val").alias("purchase_value"))


@q("w5_frontier_sharding", """
WITH r AS (SELECT doc_id,
                  row_number() OVER (ORDER BY n_chars DESC, doc_id) AS rn,
                  count(*) OVER () AS n
           FROM documents)
SELECT doc_id, CAST(rn AS BIGINT) AS global_rank,
       CAST((rn - 1) * 8 // n + 1 AS INT) AS shard
FROM r
""")
def w5_frontier_sharding(spark, sf_dir):
    """Priority-balanced frontier sharding: every URL gets a GLOBAL
    priority rank and one of 8 crawler shards (shard = floor((rn-1)*k/n)
    + 1 — equal-size contiguous rank ranges, so each worker receives the
    same mix of high- and low-priority work as a range, not a lottery).
    Engine side computes the global rank DISTRIBUTEDLY: block-local
    row_numbers over range-partitioned priority blocks + the broadcast
    n_blocks-row offset table (px3's prefix-sum shape) — never the
    single-task global window the oracle writes. See
    operators/sampling.global_rank."""
    from crawler_spark.operators.sampling import global_rank
    d = _t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    ranked = global_rank(d, order_by=[F.col("n_chars"), F.col("doc_id")],
                         desc=[True, False])
    n = d.agg(F.count("*").alias("_n"))
    return (ranked.crossJoin(F.broadcast(n))
            .select("doc_id",
                    F.col("_rn").alias("global_rank"),
                    (F.floor((F.col("_rn") - 1) * 8 / F.col("_n")) + 1)
                    .cast("int").alias("shard")))


@q("w6_mercator_queues", """
WITH f AS (SELECT doc_id, source AS host, n_chars,
                  CAST(CAST(substr(source, 4) AS INT) % 8 AS INT)
                    AS queue_id,
                  1 + CAST(substr(source, 4) AS INT) % 7 AS delay
           FROM documents),
s AS (SELECT doc_id, host, n_chars, queue_id, delay,
             row_number() OVER (PARTITION BY host
                                ORDER BY n_chars DESC, doc_id)
               AS host_seq
      FROM f),
t AS (SELECT doc_id, host, queue_id, n_chars,
             CAST(host_seq AS BIGINT) AS host_seq,
             CAST((host_seq - 1) * delay AS BIGINT) AS dispatch_at
      FROM s)
SELECT doc_id, host, queue_id, host_seq, dispatch_at,
       CAST(row_number() OVER (PARTITION BY queue_id
                               ORDER BY dispatch_at, n_chars DESC, doc_id)
            AS BIGINT) AS queue_rank
FROM t
""")
def w6_mercator_queues(spark, sf_dir):
    """Mercator two-tier frontier scheduling (Heydon & Najork 1999 —
    the classic crawler frontier the reference's spider queue
    descends from): hosts hash to K=8 politeness back-queues; within a
    host, URLs take priority order (host_seq) and an earliest-dispatch
    time host_seq-1 times the host's Crawl-delay (rc4's fixture delay);
    within a back-queue, the dispatch order interleaves hosts by
    (dispatch_at, priority). The per-HOST window is host-cardinality
    (fine at scale); the per-QUEUE rank is K=8 giant partitions — the
    single-task window bug — so the engine computes it with
    keyed_global_rank (block-local ranks + per-key tiny offset cumsum,
    px3's shape with a partition key). See
    operators/sampling.keyed_global_rank."""
    from crawler_spark.operators.sampling import keyed_global_rank
    d = _t(spark, sf_dir, "documents")
    hnum = F.substring("host", 4, 10).cast("int")
    f = d.select("doc_id", F.col("source").alias("host"), "n_chars") \
         .withColumn("queue_id", (hnum % 8).cast("int")) \
         .withColumn("delay", (hnum % 7 + 1))
    w_host = Window.partitionBy("host").orderBy(F.desc("n_chars"),
                                                F.asc("doc_id"))
    t = (f.withColumn("host_seq",
                      F.row_number().over(w_host).cast("long"))
         .withColumn("dispatch_at",
                     ((F.col("host_seq") - 1) * F.col("delay"))
                     .cast("long")))
    ranked = keyed_global_rank(
        t, ["queue_id"],
        [F.col("dispatch_at"), F.col("n_chars"), F.col("doc_id")],
        n_blocks=8, out_col="queue_rank", desc=[False, True, False])
    return ranked.select("doc_id", "host", "queue_id", "host_seq",
                         "dispatch_at", "queue_rank")


@q("rc4_crawl_delay_budget", """
WITH pend AS (SELECT source AS host, count(*) AS pending FROM documents
              GROUP BY 1),
d AS (SELECT host, pending,
             1 + (CAST(substr(host, 4) AS INT) % 7) AS crawl_delay
      FROM pend)
SELECT host, CAST(crawl_delay AS INT) AS crawl_delay,
       CAST(pending AS BIGINT) AS pending,
       CAST(60 // crawl_delay AS BIGINT) AS wave_capacity,
       CAST(least(pending, 60 // crawl_delay) AS BIGINT) AS alloc
FROM d
""")
def rc4_crawl_delay_budget(spark, sf_dir):
    """Robots Crawl-delay wave budgeting (F5xF7): per host, the fetch
    capacity of a 60s politeness wave under its crawl-delay directive
    (floor(wave/delay)) and the actual allocation (min with pending) —
    the arithmetic the token-bucket scheduler (J3/W2) draws its per-host
    quotas from. One keys-only aggregate + map-side arithmetic; fixture
    delay = 1 + h%7 seconds."""
    d = _t(spark, sf_dir, "documents")
    pend = d.groupBy(F.col("source").alias("host")) \
            .agg(F.count("*").alias("pending"))
    delay = (F.substring("host", 4, 10).cast("int") % 7 + 1)
    cap = F.floor(60 / F.col("crawl_delay")).cast("long")
    return (pend.withColumn("crawl_delay", delay.cast("int"))
            .select("host", "crawl_delay",
                    F.col("pending").cast("long").alias("pending"),
                    cap.alias("wave_capacity"),
                    F.least(F.col("pending").cast("long"), cap)
                     .alias("alloc")))


_DD14_AGREE = " + ".join(
    f"(CASE WHEN sa.mh{i} = sb.mh{i} THEN 1 ELSE 0 END)" for i in range(8))


@q("dd14_minhash_estimate", "WITH " + _LSH_CTES + """,
pairs AS (""" + _LSH_PAIRS_SQL + """)
SELECT p.doc_a, p.doc_b,
       round((""" + _DD14_AGREE + """) / 8.0, 4) AS est_jaccard,
       round(len(list_intersect(sa2.sh, sb2.sh)) * 1.0
             / len(list_distinct(sa2.sh || sb2.sh)), 4) AS true_jaccard
FROM pairs p
JOIN sig sa ON sa.doc_id = p.doc_a
JOIN sig sb ON sb.doc_id = p.doc_b
JOIN sh sa2 ON sa2.doc_id = p.doc_a
JOIN sh sb2 ON sb2.doc_id = p.doc_b
""")
def dd14_minhash_estimate(spark, sf_dir):
    """MinHash as an ESTIMATOR, not just a bucketer: for every dd3
    candidate pair, the signature-agreement Jaccard estimate
    (#matching minhashes / 8 — the unbiased MinHash property) printed
    next to the TRUE shingle Jaccard. This is the per-pair view dd13's
    corpus-level recall summarizes: together they justify a band/perm
    config numerically before a 10^10-doc run. The shingle projection is
    checkpointed once and feeds both the signature and the truth joins
    (NOTES fact #1); candidate volume is dd3's (bucket-capped)."""
    from crawler_spark.operators.textdedup import (
        _shingle_projection, lsh_band_pairs, minhash_sig_cols,
    )
    d = _t(spark, sf_dir, "documents")
    sh = _shingle_projection(d, "doc_id", "text", 3)  # ONE shingle pass
    sig = sh.select("doc_id", *minhash_sig_cols(F.col("sh"), 8))
    pairs = lsh_band_pairs(d, n_perm=8, band_size=2, shingle_n=3,
                           max_bucket=64, sh=sh).select("doc_a", "doc_b")
    agree = sum(F.when(F.col(f"_a{i}") == F.col(f"_b{i}"), 1).otherwise(0)
                for i in range(8))
    j = (pairs
         .join(sig.select(F.col("doc_id").alias("doc_a"),
                          *[F.col(f"mh{i}").alias(f"_a{i}")
                            for i in range(8)]), "doc_a")
         .join(sig.select(F.col("doc_id").alias("doc_b"),
                          *[F.col(f"mh{i}").alias(f"_b{i}")
                            for i in range(8)]), "doc_b")
         .join(sh.select(F.col("doc_id").alias("doc_a"),
                         F.col("sh").alias("sha"),
                         F.size(F.array_distinct("sh")).alias("na")),
               "doc_a")
         .join(sh.select(F.col("doc_id").alias("doc_b"),
                         F.col("sh").alias("shb"),
                         F.size(F.array_distinct("sh")).alias("nb")),
               "doc_b"))
    # |A∪B| = na + nb − |A∩B| over the distinct sets (same integers the
    # oracle's list_distinct(concat) yields), |A∩B| let-bound once per
    # pair (NOTES fact #1) — drops the per-pair union hash-set build.
    tj = F.element_at(
        F.transform(F.array(F.size(F.array_intersect("sha", "shb"))),
                    lambda i: F.round(
                        i / (F.col("na") + F.col("nb") - i), 4)), 1)
    return j.select(
        "doc_a", "doc_b",
        F.round(agree / 8.0, 4).alias("est_jaccard"),
        tj.alias("true_jaccard"))


@q("st7_arrival_lag_quantiles", """
WITH x AS (SELECT event_id, event_type,
                  CAST(floor(epoch(ts)) AS BIGINT) AS t FROM events),
r AS (SELECT event_type, t,
             COALESCE(max(t) OVER (ORDER BY event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), t)
               AS wm
      FROM x),
l AS (SELECT event_type, greatest(wm - t, 0) AS _v FROM r),
v AS (SELECT event_type, _v, count(*) AS _c FROM l GROUP BY 1, 2),
c AS (SELECT event_type, _v, _c,
             sum(_c) OVER (PARTITION BY event_type ORDER BY _v
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS _cum,
             sum(_c) OVER (PARTITION BY event_type) AS _n
      FROM v)
SELECT event_type, CAST(sum(_c) AS BIGINT) AS n,
       round(min(CASE WHEN _cum >= ceil(CAST(0.5 AS DOUBLE) * _n)
                 THEN _v END), 4) AS q_50,
       round(min(CASE WHEN _cum >= ceil(CAST(0.9 AS DOUBLE) * _n)
                 THEN _v END), 4) AS q_90,
       round(min(CASE WHEN _cum >= ceil(CAST(0.99 AS DOUBLE) * _n)
                 THEN _v END), 4) AS q_99
FROM c GROUP BY event_type
""")
def st7_arrival_lag_quantiles(spark, sf_dir):
    """Watermark-lag monitoring: how far behind the running event-time
    frontier each event arrives (lag = wm - t, 0 for in-order rows), as
    exact p50/p90/p99 per event type — the number that TUNES the
    withWatermark delay (st1-st6 enforce it; this measures what it should
    be: a delay below q_99 drops ~1% of rows). Composes st6's
    distributed prefix max with ks3's distinct-compressed exact
    quantiles — both scale shapes carry over unchanged."""
    from crawler_spark.operators.sketches import exact_quantiles
    from crawler_spark.streaming.windows import late_data_flags
    e = _t(spark, sf_dir, "events").select("event_id", "event_type", "ts")
    w = late_data_flags(e, ts_col="ts", order_col="event_id")
    lag = w.select("event_type",
                   F.greatest(F.col("wm") - F.col("t"), F.lit(0))
                   .alias("lag"))
    return exact_quantiles(lag, ["event_type"], F.col("lag"),
                           qs=(0.5, 0.9, 0.99))


@q("ks4_hll_distinct", """
WITH h AS (SELECT CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day_id,
                  user_id, md5(CAST(user_id AS VARCHAR)) AS hx
           FROM events),
b AS (SELECT day_id, user_id,
             ('0x' || substr(hx, 1, 2))::BIGINT AS reg,
             ('0x' || substr(hx, 3, 13))::BIGINT AS v
      FROM h),
r AS (SELECT day_id, reg,
             max(CASE WHEN v = 0 THEN 53
                      ELSE 53 - length(bin(v)) END) AS mj
      FROM b GROUP BY 1, 2),
a AS (SELECT day_id, CAST(count(*) AS INT) AS regs_used,
             CAST(sum(1::BIGINT << (53 - mj)) AS BIGINT) AS s_used
      FROM r GROUP BY 1),
x AS (SELECT day_id, CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact
      FROM h GROUP BY 1)
SELECT x.day_id, x.n_exact, a.regs_used,
       CAST(256 - a.regs_used AS INT) AS zero_regs,
       round(4.2399330249068963e+20 /
             CAST(a.s_used + CAST(256 - a.regs_used AS BIGINT)
                  * 9007199254740992 AS DOUBLE), 4) AS hll_est
FROM x JOIN a USING (day_id)
""")
def ks4_hll_distinct(spark, sf_dir):
    """HyperLogLog distinct users per day with a cross-engine-exact
    register algebra — the 10^10-scale companion to ks1's KMV: NO
    distinct() shuffle anywhere (register table is a plain groupBy max
    whose map-side partial collapses every partition to <= 256 rows),
    integerized harmonic sum, one final double division. See
    operators/sketches.hll_distinct for the full derivation."""
    from crawler_spark.operators.sketches import hll_distinct
    e = _t(spark, sf_dir, "events")
    d = e.select(F.floor(F.unix_timestamp("ts") / 86400).cast("long")
                 .alias("day_id"), "user_id")
    return hll_distinct(d, ["day_id"], F.col("user_id"))


@q("tx13_ttr_hapax", """
WITH w AS (SELECT doc_id,
                  unnest(regexp_split_to_array(trim(text), '\\s+')) AS w
           FROM documents),
c AS (SELECT doc_id, w, count(*) AS c FROM w GROUP BY 1, 2)
SELECT doc_id,
       CAST(sum(c) AS BIGINT) AS n_tokens,
       CAST(count(*) AS BIGINT) AS n_types,
       CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
       round(CAST(count(*) AS DOUBLE) / CAST(sum(c) AS DOUBLE), 4) AS ttr,
       round(CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(count(*) AS DOUBLE), 4) AS hapax_frac
FROM c GROUP BY doc_id
""")
def tx13_ttr_hapax(spark, sf_dir):
    """Lexical-diversity quality signals: type-token ratio + hapax
    fraction per document — the vocabulary-collapse detector that
    catches generated/spun text tx2's surface ratios miss (boilerplate
    farms repeat a tiny vocabulary; TTR drops; hapax_frac drops harder).
    Gopher (Rae et al. 2021) gates on exactly this family.

    Scale: explode is map-side; ONE partial-agged shuffle on (doc_id,
    word) — duplicate words collapse in the map-side combine — then an
    even-keyed per-doc rollup. Same tokenizer as tx3 (whitespace on
    trimmed text) so the signals compose with its token counts."""
    d = _t(spark, sf_dir, "documents")
    w = d.select("doc_id",
                 F.explode(F.split(F.trim("text"), r"\s+")).alias("w"))
    c = w.groupBy("doc_id", "w").agg(F.count("*").alias("c"))
    types = F.count("*")
    tokens = F.sum("c")
    hapax = F.sum(F.when(F.col("c") == 1, 1).otherwise(0))
    return (c.groupBy("doc_id")
            .agg(tokens.cast("long").alias("n_tokens"),
                 types.cast("long").alias("n_types"),
                 hapax.cast("long").alias("n_hapax"),
                 F.round(types.cast("double") / tokens.cast("double"), 4)
                  .alias("ttr"),
                 F.round(hapax.cast("double") / types.cast("double"), 4)
                  .alias("hapax_frac")))


@q("px8_epoch_shuffle", """
WITH e AS (SELECT doc_id, epoch
           FROM documents, (SELECT unnest([0, 1]) AS epoch)),
k AS (SELECT doc_id, epoch,
             md5(CAST(doc_id AS VARCHAR) || ':'
                 || CAST(epoch AS VARCHAR)) AS key
      FROM e),
s AS (SELECT doc_id, epoch, key,
             CAST(('0x' || substr(key, 1, 2))::BIGINT % 8 AS INT) AS shard
      FROM k)
SELECT doc_id, CAST(epoch AS INT) AS epoch, shard,
       CAST(row_number() OVER (PARTITION BY epoch, shard
                               ORDER BY key, doc_id) AS BIGINT) AS pos
FROM s
""")
def px8_epoch_shuffle(spark, sf_dir):
    """Deterministic training-epoch shuffle: every document gets a fresh
    pseudo-random position each epoch from md5(doc_id:epoch) — content-
    stable (same corpus -> same order, resumable mid-epoch) yet
    epoch-decorrelated. The order is materialized as (shard, pos): 8
    reader shards, position within shard.

    Scale: this is how you shuffle 100 TB for training WITHOUT a global
    sort — the hash key distributes uniformly, so shard = first hash
    byte mod 8 is balanced, and the within-shard rank is a PARTITIONED
    window (distribute-by shard + sort-within-partition), never a
    single-task global order. Readers stream shards independently."""
    d = _t(spark, sf_dir, "documents").select("doc_id")
    e = d.select("doc_id",
                 F.explode(F.array(F.lit(0), F.lit(1))).alias("epoch"))
    key = F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":"),
                         F.col("epoch").cast("string")))
    k = e.select("doc_id", F.col("epoch").cast("int").alias("epoch"),
                 key.alias("key"))
    s = k.withColumn(
        "shard",
        (F.conv(F.substring("key", 1, 2), 16, 10).cast("long") % 8)
        .cast("int"))
    w = Window.partitionBy("epoch", "shard").orderBy("key", "doc_id")
    return s.select("doc_id", "epoch", "shard",
                    F.row_number().over(w).cast("long").alias("pos"))


@q("g9_kcore", f"""
WITH e0 AS ({_G8_EDGES_SQL}),
u0 AS (SELECT src AS u, dst AS v FROM e0
       UNION SELECT dst, src FROM e0),
d1 AS (SELECT u, count(*) AS deg FROM u0 GROUP BY 1),
k1 AS (SELECT u FROM d1 WHERE deg >= 8),
u1 AS (SELECT a.u, a.v FROM u0 a JOIN k1 b ON a.u = b.u
       JOIN k1 c ON a.v = c.u),
d2 AS (SELECT u, count(*) AS deg FROM u1 GROUP BY 1),
k2 AS (SELECT u FROM d2 WHERE deg >= 8),
u2 AS (SELECT a.u, a.v FROM u1 a JOIN k2 b ON a.u = b.u
       JOIN k2 c ON a.v = c.u),
d3 AS (SELECT u, count(*) AS deg FROM u2 GROUP BY 1),
k3 AS (SELECT u FROM d3 WHERE deg >= 8),
u3 AS (SELECT a.u, a.v FROM u2 a JOIN k3 b ON a.u = b.u
       JOIN k3 c ON a.v = c.u),
d4 AS (SELECT u, count(*) AS deg FROM u3 GROUP BY 1),
k4 AS (SELECT u FROM d4 WHERE deg >= 8),
u4 AS (SELECT a.u, a.v FROM u3 a JOIN k4 b ON a.u = b.u
       JOIN k4 c ON a.v = c.u),
d5 AS (SELECT u, count(*) AS deg FROM u4 GROUP BY 1),
k5 AS (SELECT u FROM d5 WHERE deg >= 8),
u5 AS (SELECT a.u, a.v FROM u4 a JOIN k5 b ON a.u = b.u
       JOIN k5 c ON a.v = c.u)
SELECT u AS node, CAST(count(*) AS BIGINT) AS deg FROM u5 GROUP BY 1
""")
def g9_kcore(spark, sf_dir):
    """8-core of the host link graph (Seidman 1983, fixed 5-round peel):
    the densely-interlinked host nucleus — a crawl scheduler treats core
    membership as a hub/authority prior (cheap complement to g1/g4) and
    a spam-farm signal (link farms are dense cores with low g2 anchor
    diversity). Same edge fixture as g8; see clusters.kcore_peel for the
    loop and its scale shape; oracle unrolls the identical 5 rounds."""
    from crawler_spark.operators.clusters import kcore_peel
    d = _t(spark, sf_dir, "documents")
    h = F.substring("source", 4, 10).cast("int")
    dst = F.concat(F.lit("src"),
                   ((F.col("doc_id") * 7 + 3) % (1 + (h % 20)))
                   .cast("string"))
    e0 = (d.select(F.col("source").alias("src"), dst.alias("dst"))
          .where(F.col("src") != F.col("dst")).distinct())
    return kcore_peel(e0, k=8, rounds=5)


@q("st8_ewma_rate", """
SELECT user_id, CAST(count(*) AS BIGINT) AS n,
       round(list_reduce(
                 list_prepend(0.0, list(value ORDER BY ts, event_id)),
                 (acc, x) -> (acc + x) * 0.5), 4) AS ewma
FROM events GROUP BY user_id
""")
def st8_ewma_rate(spark, sf_dir):
    """Per-key exponentially-weighted moving average of the measurement
    stream (zero-seeded, alpha = 1/2) — the adaptive-politeness estimator:
    a crawler smooths per-host fetch latency exactly like this and scales
    its crawl delay off the EWMA (AIMD-style), so one slow probe doesn't
    throttle a host forever and a degrading host backs off within a few
    fetches.

    alpha = 1/2 is deliberate: acc' = (acc + x) * 0.5 halves exactly in
    binary floating point, and both engines run the IDENTICAL operation
    sequence over the IDENTICAL (ts, event_id) order, so the fold is
    bit-stable under the hash gate — no libm, no reassociation.

    Scale: one shuffle on the key; the per-key state is a sorted array
    fold (the batch twin of applyInPandasWithState's running state in
    streaming/stateful.py — same recurrence a streaming job keeps per
    host). Key cardinality bounds the array; host-keyed groups are
    politeness-bounded by construction."""
    e = _t(spark, sf_dir, "events")
    arr = F.array_sort(F.collect_list(F.struct("ts", "event_id", "value")))
    fold = F.aggregate(F.transform(arr, lambda s: s["value"]),
                       F.lit(0.0),
                       lambda acc, x: (acc + x) * F.lit(0.5))
    return (e.groupBy("user_id")
            .agg(F.count("*").cast("long").alias("n"),
                 F.round(fold, 4).alias("ewma")))


@q("g10_reciprocal_links", f"""
WITH e0 AS ({_G8_EDGES_SQL}),
r AS (SELECT a.src, a.dst FROM e0 a
      WHERE EXISTS (SELECT 1 FROM e0 b
                    WHERE b.src = a.dst AND b.dst = a.src)),
o AS (SELECT src AS host, count(*) AS out_deg FROM e0 GROUP BY 1),
c AS (SELECT src AS host, count(*) AS n_recip FROM r GROUP BY 1)
SELECT o.host, CAST(o.out_deg AS BIGINT) AS out_deg,
       CAST(COALESCE(c.n_recip, 0) AS BIGINT) AS n_recip,
       round(CAST(COALESCE(c.n_recip, 0) AS DOUBLE)
             / CAST(o.out_deg AS DOUBLE), 4) AS recip_ratio
FROM o LEFT JOIN c ON o.host = c.host
""")
def g10_reciprocal_links(spark, sf_dir):
    """Per-host link reciprocity: the fraction of a host's outlinks whose
    target links straight back — the classic nepotistic-linking / link-
    exchange signal (Davison 2000): organic web reciprocity is low, link
    farms approach 1.0. A ranking prior that composes with g1/g4 (demote)
    and g9 (dense-core cross-check).

    Scale: the reciprocal test is a LEFT SEMI self-join on the reversed
    key — same edge table both sides, co-partitioned by symmetrizing the
    join key, no row multiplication (semi stops at first match); both
    rollups are host-cardinality partial aggs."""
    d = _t(spark, sf_dir, "documents")
    h = F.substring("source", 4, 10).cast("int")
    dst = F.concat(F.lit("src"),
                   ((F.col("doc_id") * 7 + 3) % (1 + (h % 20)))
                   .cast("string"))
    e0 = (d.select(F.col("source").alias("src"), dst.alias("dst"))
          .where(F.col("src") != F.col("dst")).distinct()
          .persist())
    rev = e0.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    rec = e0.join(rev, ["src", "dst"], "left_semi")
    o = e0.groupBy(F.col("src").alias("host")) \
          .agg(F.count("*").alias("out_deg"))
    c = rec.groupBy(F.col("src").alias("host")) \
           .agg(F.count("*").alias("n_recip"))
    nr = F.coalesce(F.col("n_recip"), F.lit(0))
    return (o.join(c, "host", "left")
            .select("host", F.col("out_deg").cast("long").alias("out_deg"),
                    nr.cast("long").alias("n_recip"),
                    F.round(nr.cast("double")
                            / F.col("out_deg").cast("double"), 4)
                     .alias("recip_ratio")))


@q("dd15_cdc_chunks", f"""
WITH h AS (SELECT doc_id, {_WH_SQL} AS wh FROM documents),
r AS (
  SELECT doc_id, wh, CASE WHEN len(wh) >= 4 THEN
    list_transform(range(0, len(wh) - 3), i ->
      list_reduce(list_prepend(0::BIGINT, list_slice(wh, i + 1, i + 4)),
                  (acc, x) -> (acc * 69069 + x) % 2147483647))
  ELSE
    [list_reduce(list_prepend(0::BIGINT, wh),
                 (acc, x) -> (acc * 69069 + x) % 2147483647)]
  END AS rolls FROM h),
e AS (SELECT doc_id, wh,
             list_transform(
               list_filter(range(0, len(rolls)), i -> rolls[i+1] % 16 = 0),
               i -> least(i + 4, len(wh))) AS ends0
      FROM r),
e2 AS (SELECT doc_id, wh,
              CASE WHEN len(ends0) > 0 AND ends0[len(ends0)] = len(wh)
                   THEN ends0 ELSE list_append(ends0, len(wh)) END AS ends
       FROM e),
c AS (SELECT doc_id, list_transform(range(1, len(ends) + 1), j ->
        list_reduce(list_prepend(0::BIGINT,
          list_slice(wh,
            (CASE WHEN j = 1 THEN 0 ELSE ends[j-1] END) + 1, ends[j])),
          (acc, x) -> (acc * 69069 + x) % 2147483647)) AS chs
      FROM e2),
x AS (SELECT doc_id, unnest(chs) AS ch FROM c),
g AS (SELECT ch, count(*) AS occ FROM x GROUP BY 1),
p AS (SELECT x.doc_id, count(*) AS n_chunks,
             sum(CASE WHEN g.occ >= 2 THEN 1 ELSE 0 END) AS n_dup
      FROM x JOIN g USING (ch) GROUP BY 1)
SELECT doc_id, CAST(n_chunks AS BIGINT) AS n_chunks,
       CAST(n_dup AS BIGINT) AS n_dup_chunks,
       round(CAST(n_dup AS DOUBLE) / CAST(n_chunks AS DOUBLE), 4)
         AS dup_frac
FROM p
""")
def dd15_cdc_chunks(spark, sf_dir):
    """Content-defined-chunk dedup profile (LBFS/FastCDC rule at word
    granularity): cut chunks where the k=4 rolling hash is 0 mod 16,
    fingerprint each chunk, and report per document how many of its
    chunks also occur elsewhere in the corpus — the storage-dedup /
    near-copy signal that survives insertions (boundaries re-sync after
    an edit, unlike fixed-size chunking). Complements dd11: dd11 counts
    repeated fixed-k windows; dd15 counts repeated variable-length
    chunks, so its dup_frac approximates the DEDUPABLE byte fraction.

    Scale: chunking is pure map-side HOF algebra over the shared word-
    hash projection (one split per doc); the only shuffle is the
    partial-agged groupBy on chunk hash + the join back (broadcast here,
    sort-merge at corpus scale — same shape as dd11, same hot-chunk
    skew absorption via two-phase agg). Chunk ids are 31-bit Rabin
    fingerprints: collisions overcount dups by ~n_chunks/2^31 — use
    md5-of-words chunk ids if exactness matters more than width.
    See textdedup.cdc_chunk_hashes."""
    from crawler_spark.operators.textdedup import (
        cdc_chunk_hashes, word_hashes_col,
    )
    d = _t(spark, sf_dir, "documents")
    h = d.select("doc_id", word_hashes_col(F.col("text")).alias("wh"))
    x = h.select("doc_id",
                 F.explode(cdc_chunk_hashes(F.col("wh"))).alias("ch"))
    g = x.groupBy("ch").agg(F.count("*").alias("occ"))
    p = (x.join(g, "ch")
         .groupBy("doc_id")
         .agg(F.count("*").alias("n_chunks"),
              F.sum(F.when(F.col("occ") >= 2, 1).otherwise(0))
               .alias("n_dup")))
    return p.select(
        "doc_id", F.col("n_chunks").cast("long").alias("n_chunks"),
        F.col("n_dup").cast("long").alias("n_dup_chunks"),
        F.round(F.col("n_dup").cast("double")
                / F.col("n_chunks").cast("double"), 4).alias("dup_frac"))


@q("rc5_lastmod_priority", """
WITH s AS (SELECT source AS host,
                  'https://' || source || '/p/' || CAST(doc_id AS VARCHAR)
                    AS url,
                  1700000000 + (doc_id * 7919) % 100000 AS lastmod,
                  1700000000 + (doc_id * 104729) % 100000 AS last_fetch
           FROM documents),
st AS (SELECT host, url, CAST(lastmod - last_fetch AS BIGINT) AS staleness
       FROM s WHERE lastmod > last_fetch),
r AS (SELECT host, url, staleness,
             row_number() OVER (PARTITION BY host
                                ORDER BY staleness DESC, url) AS rk
      FROM st)
SELECT host, url, staleness, CAST(rk AS INT) AS rk
FROM r WHERE rk <= 3
""")
def rc5_lastmod_priority(spark, sf_dir):
    """Sitemap-freshness recrawl targeting: join the sitemap's <lastmod>
    against the store's last-fetch time, keep URLs the publisher says
    changed since we fetched them, and take the top-3 stalest per host —
    the highest-yield recrawl batch under a per-host politeness budget.
    Complements rc1/rc2: TTL scheduling GUESSES change from history;
    lastmod is the publisher TELLING us (S4's sitemap source carries it),
    so these URLs jump the TTL queue.

    Scale: the sitemap side is host-partitioned by origin; the join is
    on url (both sides bucketable); the per-host top-k is w2's bounded
    window — politeness caps rows per host upstream."""
    d = _t(spark, sf_dir, "documents")
    s = d.select(
        F.col("source").alias("host"),
        F.concat(F.lit("https://"), F.col("source"), F.lit("/p/"),
                 F.col("doc_id").cast("string")).alias("url"),
        (F.lit(1700000000) + (F.col("doc_id") * 7919) % 100000)
         .alias("lastmod"),
        (F.lit(1700000000) + (F.col("doc_id") * 104729) % 100000)
         .alias("last_fetch"))
    st = (s.where(F.col("lastmod") > F.col("last_fetch"))
          .select("host", "url",
                  (F.col("lastmod") - F.col("last_fetch")).cast("long")
                  .alias("staleness")))
    w = Window.partitionBy("host").orderBy(F.col("staleness").desc(), "url")
    return (st.withColumn("rk", F.row_number().over(w).cast("int"))
            .where(F.col("rk") <= 3))


@q("p6_json_props", """
WITH x AS (SELECT event_type,
                  CAST(json_extract(props, '$.k') AS BIGINT) AS k
           FROM events)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(count(k) AS BIGINT) AS n_with_k,
       CAST(sum(k) AS BIGINT) AS sum_k,
       CAST(min(k) AS BIGINT) AS min_k,
       CAST(max(k) AS BIGINT) AS max_k
FROM x GROUP BY event_type
""")
def p6_json_props(spark, sf_dir):
    """Semi-structured property extraction: pull a typed field out of the
    JSON `props` payload and aggregate it per event type — the crawl
    store's page-metadata pattern (headers, timings, extractor outputs
    ride along as JSON; analytics project typed columns out on read).

    Scale: get_json_object is a codegen JVM expression — the JSON parse
    happens map-side inside the scan stage, no Python, and column
    pruning still reaches the parquet reader (props + event_type only).
    At petabyte scale you'd materialize hot fields as typed columns
    (schema evolution); this is the read-path for the long tail."""
    e = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (e.select("event_type", k.alias("k"))
            .groupBy("event_type")
            .agg(F.count("*").cast("long").alias("n"),
                 F.count("k").cast("long").alias("n_with_k"),
                 F.sum("k").cast("long").alias("sum_k"),
                 F.min("k").cast("long").alias("min_k"),
                 F.max("k").cast("long").alias("max_k")))


@q("km1_ivf_codebook", """
WITH q AS (SELECT vec_id,
                  list_transform(embedding,
                      x -> CAST(floor(CAST(x AS DOUBLE) * 64) AS BIGINT)) AS qv
           FROM embeddings),
v AS (SELECT vec_id, s.d AS d, s.v AS v
      FROM (SELECT vec_id,
                   unnest(list_transform(range(1, len(qv)+1),
                          i -> {'d': i, 'v': qv[i]})) AS s
            FROM q)),
seeds AS (SELECT vec_id, row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS c
          FROM q),
c0 AS (SELECT s.c, v.d, v.v AS cv FROM seeds s JOIN v ON v.vec_id = s.vec_id WHERE s.c <= 4)
,
dist1 AS (SELECT v.vec_id, c0.c,
                   sum((v.v - c0.cv) * (v.v - c0.cv)) AS d2
            FROM v JOIN c0 ON v.d = c0.d GROUP BY 1, 2),
a1 AS (SELECT vec_id, c, d2,
                row_number() OVER (PARTITION BY vec_id ORDER BY d2, c) AS rk
         FROM dist1),
asg1 AS (SELECT vec_id, c, d2 FROM a1 WHERE rk = 1),
c1 AS (SELECT a.c, v.d,
                CAST(floor(CAST(sum(v.v) AS DOUBLE) / count(*)) AS BIGINT) AS cv
         FROM asg1 a JOIN v ON v.vec_id = a.vec_id GROUP BY 1, 2),
dist2 AS (SELECT v.vec_id, c1.c,
                   sum((v.v - c1.cv) * (v.v - c1.cv)) AS d2
            FROM v JOIN c1 ON v.d = c1.d GROUP BY 1, 2),
a2 AS (SELECT vec_id, c, d2,
                row_number() OVER (PARTITION BY vec_id ORDER BY d2, c) AS rk
         FROM dist2),
asg2 AS (SELECT vec_id, c, d2 FROM a2 WHERE rk = 1),
c2 AS (SELECT a.c, v.d,
                CAST(floor(CAST(sum(v.v) AS DOUBLE) / count(*)) AS BIGINT) AS cv
         FROM asg2 a JOIN v ON v.vec_id = a.vec_id GROUP BY 1, 2),
dist3 AS (SELECT v.vec_id, c2.c,
                   sum((v.v - c2.cv) * (v.v - c2.cv)) AS d2
            FROM v JOIN c2 ON v.d = c2.d GROUP BY 1, 2),
a3 AS (SELECT vec_id, c, d2,
                row_number() OVER (PARTITION BY vec_id ORDER BY d2, c) AS rk
         FROM dist3),
asg3 AS (SELECT vec_id, c, d2 FROM a3 WHERE rk = 1),
c3 AS (SELECT a.c, v.d,
                CAST(floor(CAST(sum(v.v) AS DOUBLE) / count(*)) AS BIGINT) AS cv
         FROM asg3 a JOIN v ON v.vec_id = a.vec_id GROUP BY 1, 2)
SELECT vec_id, CAST(c AS INT) AS cluster, CAST(d2 AS BIGINT) AS d2
FROM asg3
""")
def km1_ivf_codebook(spark, sf_dir):
    """IVF codebook training under the hash gate: 3 Lloyd iterations of
    k=4 k-means over the integer-quantized embedding lattice, emitting
    each vector's final cell + squared distance. The stage an2's IVF
    probe presumes already happened (its `label` coarse cells). Integer
    arithmetic end-to-end makes iterative float clustering — normally
    impossible to cross-check bit-exactly — oracle-verifiable; the
    unrolled-CTE oracle runs the identical 3 rounds. See
    operators/similarity.kmeans_assign for the scale shape."""
    from crawler_spark.operators.similarity import kmeans_assign
    e = _t(spark, sf_dir, "embeddings")
    return kmeans_assign(e, k=4, iters=3, scale=64)


@q("an7_pq_encode", """
WITH q AS (SELECT vec_id,
                  list_transform(embedding,
                      x -> CAST(floor(CAST(x AS DOUBLE) * 64) AS BIGINT)) AS qv
           FROM embeddings),
v AS (SELECT vec_id, d, v, CAST((d - 1) // 16 AS INT) AS s
      FROM (SELECT vec_id, s.d AS d, s.v AS v
            FROM (SELECT vec_id,
                         unnest(list_transform(range(1, len(qv)+1),
                                i -> {'d': i, 'v': qv[i]})) AS s
                  FROM q))),
seeds AS (SELECT vec_id,
                 row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)),
                                    vec_id) AS c
          FROM q),
c0 AS (SELECT v.s, se.c, v.d, v.v AS cv
       FROM seeds se JOIN v ON v.vec_id = se.vec_id WHERE se.c <= 4),
dist1 AS (SELECT v.vec_id, v.s, c0.c,
                   sum((v.v - c0.cv) * (v.v - c0.cv)) AS d2
            FROM v JOIN c0 ON v.d = c0.d GROUP BY 1, 2, 3),
a1 AS (SELECT vec_id, s, c, d2,
                row_number() OVER (PARTITION BY vec_id, s
                                   ORDER BY d2, c) AS rk
         FROM dist1),
asg1 AS (SELECT vec_id, s, c, d2 FROM a1 WHERE rk = 1),
c1 AS (SELECT a.s, a.c, v.d,
                CAST(floor(CAST(sum(v.v) AS DOUBLE) / count(*)) AS BIGINT)
                  AS cv
         FROM asg1 a JOIN v ON v.vec_id = a.vec_id AND v.s = a.s
         GROUP BY 1, 2, 3),
dist2 AS (SELECT v.vec_id, v.s, c1.c,
                   sum((v.v - c1.cv) * (v.v - c1.cv)) AS d2
            FROM v JOIN c1 ON v.d = c1.d GROUP BY 1, 2, 3),
a2 AS (SELECT vec_id, s, c, d2,
                row_number() OVER (PARTITION BY vec_id, s
                                   ORDER BY d2, c) AS rk
         FROM dist2),
asg2 AS (SELECT vec_id, s, c, d2 FROM a2 WHERE rk = 1),
c2 AS (SELECT a.s, a.c, v.d,
                CAST(floor(CAST(sum(v.v) AS DOUBLE) / count(*)) AS BIGINT)
                  AS cv
         FROM asg2 a JOIN v ON v.vec_id = a.vec_id AND v.s = a.s
         GROUP BY 1, 2, 3)
SELECT vec_id,
       CAST(max(CASE WHEN s = 0 THEN c END) AS INT) AS code_0,
       CAST(max(CASE WHEN s = 1 THEN c END) AS INT) AS code_1,
       CAST(max(CASE WHEN s = 2 THEN c END) AS INT) AS code_2,
       CAST(max(CASE WHEN s = 3 THEN c END) AS INT) AS code_3,
       CAST(sum(d2) AS BIGINT) AS pq_err
FROM asg2 GROUP BY vec_id
""")
def an7_pq_encode(spark, sf_dir):
    """Product-quantization encoding under the hash gate: 4 subspace
    codebooks (k=4, 2 joint Lloyd iterations over the integer lattice)
    -> each vector's 4-code word + total quantization error. The encode
    stage of a PQ/ADC index (Jegou et al. 2011) — with km1 this
    completes codebook TRAINING for both IVF and PQ on the engine.
    See operators/similarity.pq_encode."""
    from crawler_spark.operators.similarity import pq_encode
    e = _t(spark, sf_dir, "embeddings")
    return pq_encode(e, m=4, k=4, iters=2, scale=64)


@q("an8_adc_search", """
WITH q AS (SELECT vec_id,
                  list_transform(embedding,
                      x -> CAST(floor(CAST(x AS DOUBLE) * 64) AS BIGINT)) AS qv
           FROM embeddings),
v AS (SELECT vec_id, d, v, CAST((d - 1) // 16 AS INT) AS s
      FROM (SELECT vec_id, s.d AS d, s.v AS v
            FROM (SELECT vec_id,
                         unnest(list_transform(range(1, len(qv)+1),
                                i -> {'d': i, 'v': qv[i]})) AS s
                  FROM q))),
seeds AS (SELECT vec_id,
                 row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)),
                                    vec_id) AS c
          FROM q),
c0 AS (SELECT v.s, se.c, v.d, v.v AS cv
       FROM seeds se JOIN v ON v.vec_id = se.vec_id WHERE se.c <= 4),
dist1 AS (SELECT v.vec_id, v.s, c0.c,
                   sum((v.v - c0.cv) * (v.v - c0.cv)) AS d2
            FROM v JOIN c0 ON v.d = c0.d GROUP BY 1, 2, 3),
a1 AS (SELECT vec_id, s, c, d2,
                row_number() OVER (PARTITION BY vec_id, s
                                   ORDER BY d2, c) AS rk
         FROM dist1),
asg1 AS (SELECT vec_id, s, c, d2 FROM a1 WHERE rk = 1),
c1 AS (SELECT a.s, a.c, v.d,
                CAST(floor(CAST(sum(v.v) AS DOUBLE) / count(*)) AS BIGINT)
                  AS cv
         FROM asg1 a JOIN v ON v.vec_id = a.vec_id AND v.s = a.s
         GROUP BY 1, 2, 3),
dist2 AS (SELECT v.vec_id, v.s, c1.c,
                   sum((v.v - c1.cv) * (v.v - c1.cv)) AS d2
            FROM v JOIN c1 ON v.d = c1.d GROUP BY 1, 2, 3),
a2 AS (SELECT vec_id, s, c, d2,
                row_number() OVER (PARTITION BY vec_id, s
                                   ORDER BY d2, c) AS rk
         FROM dist2),
asg2 AS (SELECT vec_id, s, c, d2 FROM a2 WHERE rk = 1),
c2 AS (SELECT a.s, a.c, v.d,
                CAST(floor(CAST(sum(v.v) AS DOUBLE) / count(*)) AS BIGINT)
                  AS cv
         FROM asg2 a JOIN v ON v.vec_id = a.vec_id AND v.s = a.s
         GROUP BY 1, 2, 3),
qd AS (SELECT vec_id AS qid, d, v AS qval, s FROM v WHERE vec_id IN (0, 1, 2)),
lut AS (SELECT qd.qid, c2.s, c2.c,
               sum((qd.qval - c2.cv) * (qd.qval - c2.cv)) AS ld
        FROM qd JOIN c2 ON qd.s = c2.s AND qd.d = c2.d
        GROUP BY 1, 2, 3),
sc AS (SELECT l.qid, a.vec_id, sum(l.ld) AS adc
       FROM asg2 a JOIN lut l ON l.s = a.s AND l.c = a.c
       WHERE l.qid <> a.vec_id
       GROUP BY 1, 2),
rk AS (SELECT qid, vec_id, adc,
              row_number() OVER (PARTITION BY qid
                                 ORDER BY adc, vec_id) AS rk
       FROM sc)
SELECT qid, vec_id, CAST(adc AS BIGINT) AS adc, CAST(rk AS INT) AS rk
FROM rk WHERE rk <= 5
""")
def an8_adc_search(spark, sf_dir):
    """ADC top-5 search over the PQ index (Jegou et al. 2011 §IV): exact
    query subvectors against the trained codebook build a broadcast m*k
    lookup table; the corpus is scanned by CODES ONLY (the compressed
    index — the full-precision vectors are never read at query time).
    With an7 this is the complete PQ pipeline (train -> encode -> search)
    bit-exact under the hash gate. See operators/similarity.adc_topk."""
    from crawler_spark.operators.similarity import adc_topk
    e = _t(spark, sf_dir, "embeddings")
    return adc_topk(e, query_ids=[0, 1, 2], topk=5, m=4, k=4, iters=2)


@q("tx15_perplexity_buckets", """
WITH w AS (SELECT doc_id,
                  unnest(regexp_split_to_array(trim(text), '\\s+')) AS word
           FROM documents),
f AS (SELECT word, count(*) AS c FROM w GROUP BY word),
t AS (SELECT CAST(sum(c) AS DOUBLE) AS n_total FROM f),
lp AS (SELECT doc_id, round(avg(ln(t.n_total) - ln(f.c)), 4) AS neg_logprob
       FROM w JOIN f USING (word) CROSS JOIN t GROUP BY doc_id),
b AS (SELECT d.doc_id, d.lang, lp.neg_logprob,
             ntile(3) OVER (PARTITION BY d.lang
                            ORDER BY lp.neg_logprob, d.doc_id) AS nt
      FROM lp JOIN documents d USING (doc_id))
SELECT doc_id, lang, neg_logprob,
       CASE nt WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
               ELSE 'tail' END AS bucket
FROM b
""")
def tx15_perplexity_buckets(spark, sf_dir):
    """CCNet's head/middle/tail curation split: per language, rank
    documents by their corpus-LM negative logprob (tx10's axis) and cut
    into equal thirds — 'head' is the fluent slice CCNet trains on,
    'tail' is the garbled slice it drops, 'middle' is the tunable
    reservoir. The ntile rides tx10's ROUNDED score (hash-stable), ties
    broken by doc_id, so the split is deterministic and resumable.

    Scale: tx10's two partial-agg shuffles + one per-language window;
    language partitions bound the sort; at 10^10 docs replace ntile with
    the tx8-style bucket-histogram threshold (no per-language sort) —
    same cut, documented containment property."""
    from crawler_spark.operators.langmodel import unigram_logprob
    d = _t(spark, sf_dir, "documents")
    lp = unigram_logprob(d).select("doc_id", "neg_logprob")
    j = lp.join(d.select("doc_id", "lang"), "doc_id")
    w = Window.partitionBy("lang").orderBy("neg_logprob", "doc_id")
    nt = F.ntile(3).over(w)
    return j.select("doc_id", "lang", "neg_logprob",
                    F.when(nt == 1, "head").when(nt == 2, "middle")
                     .otherwise("tail").alias("bucket"))


@q("rc6_adaptive_delay", """
WITH l AS (SELECT source AS host, doc_id,
                  CAST(100 + (doc_id * 31) % 900 AS DOUBLE) AS latency_ms
           FROM documents),
e AS (SELECT host, CAST(count(*) AS BIGINT) AS n_samples,
             list_reduce(list_prepend(0.0,
                 list(latency_ms ORDER BY doc_id)),
                 (acc, x) -> (acc + x) * 0.5) AS ewma_raw,
             CAST(count(*) AS BIGINT) AS pending
      FROM l GROUP BY host)
SELECT host, n_samples, round(ewma_raw, 4) AS ewma_ms,
       CAST(floor(60000.0 / greatest(ewma_raw, 100.0)) AS BIGINT)
         AS wave_budget,
       pending,
       CAST(least(pending,
                  CAST(floor(60000.0 / greatest(ewma_raw, 100.0))
                       AS BIGINT)) AS BIGINT) AS alloc
FROM e
""")
def rc6_adaptive_delay(spark, sf_dir):
    """Closed-loop adaptive politeness: each host's crawl budget for the
    next 60s wave derives from the EWMA of its OBSERVED fetch latencies
    (st8's alpha=1/2 fold) instead of a static delay directive — the
    AIMD governor that backs off degrading hosts within a few fetches
    and re-opens them as they recover. Composes st8 (estimator) with
    rc4's allocation rule (budget floor + pending clamp); a 100ms floor
    caps any host at 600 fetches/wave.

    Scale: one host-keyed shuffle total — the fold, the sample count and
    the pending count come out of the same grouped pass; the budget
    arithmetic is map-side on host-cardinality rows."""
    e = _t(spark, sf_dir, "documents")
    lat = (F.lit(100) + (F.col("doc_id") * 31) % 900).cast("double")
    l = e.select(F.col("source").alias("host"), "doc_id",
                 lat.alias("latency_ms"))
    arr = F.array_sort(F.collect_list(F.struct("doc_id", "latency_ms")))
    fold = F.aggregate(F.transform(arr, lambda s: s["latency_ms"]),
                       F.lit(0.0), lambda a, x: (a + x) * F.lit(0.5))
    g = (l.groupBy("host")
         .agg(F.count("*").cast("long").alias("n_samples"),
              fold.alias("ewma_raw"),
              F.count("*").cast("long").alias("pending")))
    budget = F.floor(F.lit(60000.0)
                     / F.greatest(F.col("ewma_raw"), F.lit(100.0))) \
              .cast("long")
    return g.select("host", "n_samples",
                    F.round("ewma_raw", 4).alias("ewma_ms"),
                    budget.alias("wave_budget"), "pending",
                    F.least(F.col("pending"), budget).cast("long")
                     .alias("alloc"))


from crawler_spark.operators.hostrank import (  # noqa: E402
    opic_hosts, opic_oracle_sql,
)


@q("g11_opic", opic_oracle_sql(_G1_EDGES_SQL, iters=4))
def g11_opic(spark, sf_dir):
    """OPIC host importance (Abiteboul et al., WWW 2003) over the g1 host
    graph: the crawl-native prioritization algorithm — importance is
    banked cash history, accumulated ONLINE while the crawl proceeds, so
    the priority signal is useful from wave 1 (PageRank needs the whole
    graph first). Dangling hosts pay into a uniform pot (the paper's
    virtual node). 4 fixed iterations; the oracle unrolls them with a
    one-row dangling-pot CTE per iteration. Per iteration: one src join +
    one dst groupBy at host cardinality — see operators/hostrank.opic_hosts."""
    d = _t(spark, sf_dir, "documents")
    dst = F.concat(F.lit("src"),
                   ((F.col("doc_id") * 7 + 3) % 23).cast("string"))
    edges = (d.select(F.col("source").alias("src"), dst.alias("dst"))
             .where(F.col("src") != F.col("dst"))
             .distinct())
    return opic_hosts(edges, iters=4)


@q("tx16_dsir", """
WITH w AS (SELECT doc_id, lang = 'en' AS tgt,
                  unnest(regexp_split_to_array(trim(text), '\\s+')) AS word
           FROM documents),
wb AS (SELECT doc_id, tgt,
              ('0x' || substr(md5(word), 1, 8))::BIGINT % 64 AS bkt
       FROM w),
c AS (SELECT bkt, count(*) AS c_raw,
             sum(CASE WHEN tgt THEN 1 ELSE 0 END) AS c_tgt
      FROM wb GROUP BY bkt),
t AS (SELECT CAST(sum(c_raw) AS DOUBLE) AS n_raw,
             CAST(sum(c_tgt) AS DOUBLE) AS n_tgt FROM c),
lr AS (SELECT bkt, ln((c_tgt + 1) / (t.n_tgt + 64))
                 - ln((c_raw + 1) / (t.n_raw + 64)) AS lr
       FROM c CROSS JOIN t)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
       round(sum(lr.lr), 4) AS logweight
FROM wb JOIN lr USING (bkt) GROUP BY doc_id
""")
def tx16_dsir(spark, sf_dir):
    """DSIR importance weights (Xie et al., NeurIPS 2023): hashed-unigram
    bag log-likelihood ratio of each document under the target domain
    (here: the 'en' slice as the in-domain exemplar) vs the raw corpus —
    the data-selection weight model behind DoReMi-style pretraining
    mixes. Positive = more target-like. The actual resample rides px4's
    Gumbel top-k over these weights; this query is the weight model
    under the hash gate. Two shuffles + one 64-row broadcast — see
    operators/langmodel.dsir_logweights."""
    from crawler_spark.operators.langmodel import dsir_logweights
    d = _t(spark, sf_dir, "documents")
    return dsir_logweights(d, is_target=(F.col("lang") == "en"))


@q("ks5_theta_setops", """
WITH ha AS (SELECT DISTINCT
              ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT AS h
            FROM events WHERE event_type = 'view'),
hb AS (SELECT DISTINCT
         ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT AS h
       FROM events WHERE event_type = 'purchase'),
ra AS (SELECT h, row_number() OVER (ORDER BY h) AS rk FROM ha),
rb AS (SELECT h, row_number() OVER (ORDER BY h) AS rk FROM hb),
ta AS (SELECT COALESCE(max(CASE WHEN rk = 64 THEN h END), 4294967296)
                AS theta_a,
              CAST(count(*) AS BIGINT) AS n_a_exact FROM ra),
tb AS (SELECT COALESCE(max(CASE WHEN rk = 64 THEN h END), 4294967296)
                AS theta_b,
              CAST(count(*) AS BIGINT) AS n_b_exact FROM rb),
th AS (SELECT n_a_exact, n_b_exact, least(theta_a, theta_b) AS theta
       FROM ta CROSS JOIN tb),
sa AS (SELECT h FROM ra CROSS JOIN th WHERE h < theta),
sb AS (SELECT h FROM rb CROSS JOIN th WHERE h < theta),
fl AS (SELECT CAST(a.h IS NOT NULL AS INT) AS in_a,
              CAST(b.h IS NOT NULL AS INT) AS in_b
       FROM sa a FULL OUTER JOIN sb b ON a.h = b.h),
cnt AS (SELECT CAST(sum(greatest(in_a, in_b)) AS BIGINT) AS s_union,
               CAST(sum(least(in_a, in_b)) AS BIGINT) AS s_inter,
               CAST(sum(in_a * (1 - in_b)) AS BIGINT) AS s_diff FROM fl),
ie AS (SELECT CAST(count(*) AS BIGINT) AS inter_exact
       FROM (SELECT h FROM ha INTERSECT SELECT h FROM hb))
SELECT n_a_exact, n_b_exact, inter_exact,
       round(s_union * 4294967296.0 / theta, 4) AS union_est,
       round(s_inter * 4294967296.0 / theta, 4) AS inter_est,
       round(s_diff * 4294967296.0 / theta, 4) AS diff_est
FROM th CROSS JOIN cnt CROSS JOIN ie
""")
def ks5_theta_setops(spark, sf_dir):
    """Theta-sketch set operations: estimated union/intersection/difference
    cardinality between viewers and purchasers WITHOUT joining the raw
    sets — both sides filtered to the SAME theta = min of the two k-th
    minimum hashes, so the ≤k-element samples compose under plain set
    algebra (the ks1 KMV sketch cannot intersect; this is why Theta
    exists). Exact counts ride along to make the error visible. See
    operators/sketches.theta_set_ops."""
    from crawler_spark.operators.sketches import theta_set_ops
    e = _t(spark, sf_dir, "events")
    return theta_set_ops(e.where(F.col("event_type") == "view"),
                         e.where(F.col("event_type") == "purchase"),
                         key=F.col("user_id"), k=64)


@q("st9_funnel", """
WITH u1 AS (SELECT user_id, min(ts) AS t1 FROM events
            WHERE event_type = 'view' GROUP BY user_id),
u2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e JOIN u1 USING (user_id)
       WHERE e.event_type = 'click' AND e.ts > u1.t1 GROUP BY e.user_id),
u3 AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e JOIN u2 USING (user_id)
       WHERE e.event_type = 'purchase' AND e.ts > u2.t2 GROUP BY e.user_id),
n AS (SELECT (SELECT CAST(count(*) AS BIGINT) FROM u1) AS n1,
             (SELECT CAST(count(*) AS BIGINT) FROM u2) AS n2,
             (SELECT CAST(count(*) AS BIGINT) FROM u3) AS n3)
SELECT 1 AS stage_no, 'view' AS stage, n1 AS n_users,
       CAST(1.0 AS DOUBLE) AS conv_from_prev FROM n
UNION ALL
SELECT 2, 'view>click', n2, round(CAST(n2 AS DOUBLE) / n1, 4) FROM n
UNION ALL
SELECT 3, 'view>click>purchase', n3, round(CAST(n3 AS DOUBLE) / n2, 4) FROM n
""")
def st9_funnel(spark, sf_dir):
    """Ordered funnel analysis over the event stream: users who viewed,
    then clicked strictly AFTER their first view, then purchased strictly
    after that click — the sequential-conversion query every product
    analytics stack ships (the windowFunnel shape). Each stage anchors on
    the first qualifying timestamp of the previous stage, so a purchase
    before the first view does not count.

    Scale: conditional min-aggs + joins at USER cardinality (events
    shuffle once per stage on user_id; stage tables are orders smaller
    than the stream). No window over raw events, no per-user sort."""
    e = _t(spark, sf_dir, "events")
    u1 = (e.where(F.col("event_type") == "view")
          .groupBy("user_id").agg(F.min("ts").alias("t1")))
    u2 = (e.where(F.col("event_type") == "click")
          .join(u1, "user_id").where(F.col("ts") > F.col("t1"))
          .groupBy("user_id").agg(F.min("ts").alias("t2")))
    u3 = (e.where(F.col("event_type") == "purchase")
          .join(u2, "user_id").where(F.col("ts") > F.col("t2"))
          .groupBy("user_id").agg(F.min("ts").alias("t3")))
    n = (u1.agg(F.count("*").cast("long").alias("n1"))
         .crossJoin(u2.agg(F.count("*").cast("long").alias("n2")))
         .crossJoin(u3.agg(F.count("*").cast("long").alias("n3"))))
    rows = F.array(
        F.struct(F.lit(1).alias("stage_no"), F.lit("view").alias("stage"),
                 F.col("n1").alias("n_users"),
                 F.lit(1.0).alias("conv_from_prev")),
        F.struct(F.lit(2).alias("stage_no"),
                 F.lit("view>click").alias("stage"),
                 F.col("n2").alias("n_users"),
                 F.round(F.col("n2") / F.col("n1"), 4)
                  .alias("conv_from_prev")),
        F.struct(F.lit(3).alias("stage_no"),
                 F.lit("view>click>purchase").alias("stage"),
                 F.col("n3").alias("n_users"),
                 F.round(F.col("n3") / F.col("n2"), 4)
                  .alias("conv_from_prev")))
    return (n.select(F.explode(rows).alias("r"))
            .select("r.stage_no", "r.stage", "r.n_users", "r.conv_from_prev"))


@q("a8_cohort_retention", """
WITH f AS (SELECT user_id, date_trunc('week', min(ts)) AS cw
           FROM events GROUP BY user_id),
act AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS aw FROM events),
r AS (SELECT f.cw,
             CAST(date_diff('day', CAST(f.cw AS DATE), CAST(a.aw AS DATE))
                  / 7 AS INT) AS offset_w,
             a.user_id
      FROM act a JOIN f USING (user_id))
SELECT CAST(cw AS DATE) AS cohort_week, offset_w,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM r GROUP BY 1, 2
""")
def a8_cohort_retention(spark, sf_dir):
    """Cohort retention matrix over the event stream: users grouped by
    their first-activity ISO week, counted distinct in every later week
    they reappear — the (cohort_week, offset) retention triangle that
    backs every growth dashboard. Week offsets are exact multiples of 7
    days (both truncations are Monday-aligned) so the integer division
    is lossless cross-engine.

    Scale: one user-keyed agg for first-activity, one map-side truncation
    + distinct at (user, week) granularity, one join at user cardinality,
    and a keys-only count-distinct rollup — the stream is never sorted."""
    e = _t(spark, sf_dir, "events")
    f = e.groupBy("user_id").agg(F.date_trunc("week", F.min("ts")).alias("cw"))
    act = (e.select("user_id", F.date_trunc("week", F.col("ts")).alias("aw"))
           .distinct())
    r = act.join(f, "user_id").select(
        "cw",
        (F.datediff(F.to_date("aw"), F.to_date("cw")) / 7).cast("int")
         .alias("offset_w"),
        "user_id")
    return (r.groupBy(F.to_date("cw").alias("cohort_week"), "offset_w")
            .agg(F.count_distinct("user_id").cast("long").alias("n_users")))


@q("f10_url_alias_rules", """
WITH u AS (
  SELECT doc_id, source || '.com' AS host,
         'http://' || source || '.com/item/' || CAST(doc_id AS VARCHAR) AS u1,
         CASE doc_id % 4
           WHEN 0 THEN 'http://' || source || '.com/item/'
                       || CAST(doc_id AS VARCHAR) || '/index.html'
           WHEN 1 THEN 'http://' || source || '.com/item/'
                       || CAST(doc_id AS VARCHAR) || '?session=42'
           WHEN 2 THEN 'http://www.' || source || '.com/item/'
                       || CAST(doc_id AS VARCHAR)
           ELSE 'http://' || source || '.com/item/' || CAST(doc_id AS VARCHAR)
         END AS u2
  FROM documents),
tok AS (SELECT doc_id, host,
               string_split(replace(u1, '?', '/?'), '/') AS a,
               string_split(replace(u2, '?', '/?'), '/') AS b
        FROM u),
m AS (SELECT doc_id, host, a, b, len(a) AS n1, len(b) AS n2,
             list_reduce(list_prepend(0, range(1, least(len(a), len(b)) + 1)),
               (acc, i) -> CASE WHEN acc = i - 1 AND a[i] = b[i]
                                THEN i ELSE acc END) AS lcp
      FROM tok),
s AS (SELECT *, list_reverse(a) AS ra, list_reverse(b) AS rb FROM m),
x AS (SELECT doc_id, host, a, b, n1, n2, lcp,
             least(list_reduce(
                     list_prepend(0, range(1, least(n1, n2) + 1)),
                     (acc, i) -> CASE WHEN acc = i - 1 AND ra[i] = rb[i]
                                      THEN i ELSE acc END),
                   least(n1, n2) - lcp) AS lcs
      FROM s),
r AS (SELECT host,
             COALESCE(array_to_string(
               list_slice(a, lcp + 1, n1 - lcs), '/'), '') AS mid1,
             COALESCE(array_to_string(
               list_slice(b, lcp + 1, n2 - lcs), '/'), '') AS mid2
      FROM x)
SELECT '"' || mid1 || '" -> "' || mid2 || '"' AS rule,
       CAST(count(*) AS BIGINT) AS support,
       CAST(count(DISTINCT host) AS BIGINT) AS n_hosts
FROM r WHERE mid1 <> mid2
GROUP BY 1 HAVING count(*) >= 5
""")
def f10_url_alias_rules(spark, sf_dir):
    """DUST rule mining (Bar-Yossef et al., WWW 2007 — 'Do Not Crawl in
    the DUST: Different URLs with Similar Text'): learn URL rewrite rules
    from content-duplicate URL pairs so the frontier can canonicalize
    aliases BEFORE fetching them (P1's canonicalizer handles syntax;
    DUST learns site conventions like '/index.html' suffixes, session
    query params, and www. host variants). Alias pairs are injected
    deterministically (3 site conventions over the corpus); each pair is
    tokenized on '/' (query split to its own token), the longest common
    token prefix/suffix is folded out, and the differing middles become
    a substitution rule; rules are ranked by pair support. Suffix length
    is clamped to the token overlap so pure-addition aliases yield the
    constant rule '"" -> "index.html"'.

    Scale shape: rule extraction is map-side column algebra (one
    let-bound fold per pair — URLs are ~6 tokens); the only shuffle is
    the keys-only rule rollup, at rule cardinality (orders below URL
    cardinality). The support threshold is the paper's significance
    filter."""
    d = _t(spark, sf_dir, "documents")
    host = F.concat(F.col("source"), F.lit(".com"))
    base = F.concat(F.lit("http://"), host, F.lit("/item/"),
                    F.col("doc_id").cast("string"))
    u2 = (F.when(F.col("doc_id") % 4 == 0,
                 F.concat(base, F.lit("/index.html")))
          .when(F.col("doc_id") % 4 == 1, F.concat(base, F.lit("?session=42")))
          .when(F.col("doc_id") % 4 == 2,
                F.concat(F.lit("http://www."), host, F.lit("/item/"),
                         F.col("doc_id").cast("string")))
          .otherwise(base))
    tok = lambda c: F.split(F.regexp_replace(c, r"\?", "/?"), "/")  # noqa: E731
    pair = F.array(F.struct(tok(base).alias("a"), tok(u2).alias("b")))

    def _rule(p):
        a, b = p["a"], p["b"]
        n1, n2 = F.size(a), F.size(b)
        nmin = F.least(n1, n2)
        lcp = F.aggregate(
            F.sequence(F.lit(1), nmin), F.lit(0),
            lambda acc, i: F.when(
                (acc == i - 1) & (F.element_at(a, i) == F.element_at(b, i)),
                i).otherwise(acc))
        ra, rb = F.reverse(a), F.reverse(b)
        lcs_raw = F.aggregate(
            F.sequence(F.lit(1), nmin), F.lit(0),
            lambda acc, i: F.when(
                (acc == i - 1) & (F.element_at(ra, i) == F.element_at(rb, i)),
                i).otherwise(acc))
        lcs = F.least(lcs_raw, nmin - lcp)
        mid1 = F.array_join(F.slice(a, lcp + 1, n1 - lcs - lcp), "/")
        mid2 = F.array_join(F.slice(b, lcp + 1, n2 - lcs - lcp), "/")
        return F.struct(mid1.alias("mid1"), mid2.alias("mid2"))

    # let-bind: the folds re-reference the token arrays per element
    # (NOTES fact #1) — behind the struct they are field accesses of an
    # already-evaluated pair, not re-splits.
    mids = F.element_at(F.transform(pair, _rule), 1)
    r = d.select(host.alias("host"), mids.alias("m")).select(
        "host", F.col("m.mid1").alias("mid1"), F.col("m.mid2").alias("mid2"))
    rule = F.concat(F.lit('"'), F.col("mid1"), F.lit('" -> "'),
                    F.col("mid2"), F.lit('"'))
    return (r.where(F.col("mid1") != F.col("mid2"))
            .select(rule.alias("rule"), "host")
            .groupBy("rule")
            .agg(F.count("*").cast("long").alias("support"),
                 F.count_distinct("host").cast("long").alias("n_hosts"))
            .where(F.col("support") >= 5))


@q("g12_personalized_pagerank", pagerank_oracle_sql(
    _G1_EDGES_SQL, iters=5, damping=0.85,
    teleport_cte="SELECT 'src0' AS host UNION ALL SELECT 'src1' "
                 "UNION ALL SELECT 'src2'"))
def g12_personalized_pagerank(spark, sf_dir):
    """Personalized PageRank (Haveliwala, WWW 2002) over the g1 host
    graph: the damped surfer restarts ONLY at the topic-seed hosts
    (src0/src1/src2), so rank measures graph proximity to the seeds —
    the focused-crawl prior (feed through hostrank_boosts to bias
    admission toward on-topic hosts, exactly like g1/g11). Same unrolled
    fixed-iteration contract as g1; the teleport set rides a broadcast
    flag join, no extra shuffle."""
    d = _t(spark, sf_dir, "documents")
    dst = F.concat(F.lit("src"),
                   ((F.col("doc_id") * 7 + 3) % 23).cast("string"))
    edges = (d.select(F.col("source").alias("src"), dst.alias("dst"))
             .where(F.col("src") != F.col("dst"))
             .distinct())
    tp = spark.createDataFrame([("src0",), ("src1",), ("src2",)],
                               "host string")
    ranks = pagerank_hosts(edges, iters=5, damping=0.85, teleport=tp)
    return ranks.select("host", F.round("rank", 4).alias("rank"))


_DD16_TRUE_J = ("len(list_intersect(sa.sh, sb.sh)) * 1.0 "
                "/ len(list_distinct(sa.sh || sb.sh))")


@q("dd16_lsh_band_planner", "WITH " + _LSH_CTES + """,
pairs AS (""" + _LSH_PAIRS_SQL + """),
tj AS (SELECT least(CAST(floor((""" + _DD16_TRUE_J + """) * 16) AS INT), 15)
         AS bin
       FROM pairs p
       JOIN sh sa ON sa.doc_id = p.doc_a
       JOIN sh sb ON sb.doc_id = p.doc_b),
hist AS (SELECT bin, CAST(2 * bin + 1 AS DOUBLE) / 32 AS s,
                CAST(count(*) AS BIGINT) AS n
         FROM tj GROUP BY bin),
cfg AS (SELECT b, r FROM (VALUES (16, 1), (8, 2), (4, 4), (2, 8), (1, 16))
          AS t(b, r)),
pw AS (SELECT c.b, c.r, h.s, h.n,
              h.s * h.s AS s2, (h.s * h.s) * (h.s * h.s) AS s4
       FROM hist h CROSS JOIN cfg c),
sr AS (SELECT b, r, s, n,
              CASE r WHEN 1 THEN s WHEN 2 THEN s2 WHEN 4 THEN s4
                     WHEN 8 THEN s4 * s4 ELSE (s4 * s4) * (s4 * s4)
              END AS srv
       FROM pw),
qq AS (SELECT b, r, s, n, 1.0 - srv AS q1,
              (1.0 - srv) * (1.0 - srv) AS q2,
              ((1.0 - srv) * (1.0 - srv)) * ((1.0 - srv) * (1.0 - srv)) AS q4
       FROM sr),
pc AS (SELECT b, r, s, n,
              1.0 - (CASE b WHEN 1 THEN q1 WHEN 2 THEN q2 WHEN 4 THEN q4
                            WHEN 8 THEN q4 * q4 ELSE (q4 * q4) * (q4 * q4)
                     END) AS p
       FROM qq),
agg AS (SELECT b, r,
               sum(CASE WHEN s >= 0.5 THEN n ELSE 0 END) AS n_pos,
               sum(CASE WHEN s < 0.5 THEN n ELSE 0 END) AS n_neg,
               sum(CASE WHEN s >= 0.5 THEN n * p ELSE 0 END) AS tp,
               sum(CASE WHEN s < 0.5 THEN n * p ELSE 0 END) AS fp
        FROM pc GROUP BY b, r)
SELECT CAST(b AS INT) AS n_bands, CAST(r AS INT) AS band_size,
       CAST(n_pos AS BIGINT) AS n_pos, CAST(n_neg AS BIGINT) AS n_neg,
       round(tp / greatest(n_pos, 1), 4) AS exp_recall,
       round(fp / greatest(n_neg, 1), 4) AS exp_fp_rate
FROM agg
""")
def dd16_lsh_band_planner(spark, sf_dir):
    """LSH band planning against THIS corpus's similarity profile (the
    Mining of Massive Datasets S-curve, evaluated empirically): bucket
    dd3's candidate pairs by TRUE shingle Jaccard into 16 bins, then for
    every (bands b, rows r) factorization of a 16-perm signature compute
    the expected recall above the 0.5 dup threshold and expected
    false-candidate rate below it under the collision curve
    P(s) = 1 - (1 - s^r)^b. Bin midpoints are dyadic ((2k+1)/32) and all
    powers are IEEE squaring chains, so both engines compute the curve
    bit-identically — no libm pow anywhere. The output is the table you
    read before committing a (b, r) to a 10^10-doc run; dd13 then
    validates the chosen config's realized recall.

    Scale: the histogram is 16 rows out of dd3's candidate-bounded pair
    set; the config sweep is a 5x16 broadcast cross of literals."""
    from crawler_spark.operators.textdedup import (
        _shingle_projection, lsh_band_pairs,
    )
    d = _t(spark, sf_dir, "documents")
    sh = _shingle_projection(d, "doc_id", "text", 3)
    pairs = lsh_band_pairs(d, n_perm=8, band_size=2, shingle_n=3,
                           max_bucket=64, sh=sh).select("doc_a", "doc_b")
    j = (pairs
         .join(sh.select(F.col("doc_id").alias("doc_a"),
                         F.col("sh").alias("sha"),
                         F.size(F.array_distinct("sh")).alias("na")),
               "doc_a")
         .join(sh.select(F.col("doc_id").alias("doc_b"),
                         F.col("sh").alias("shb"),
                         F.size(F.array_distinct("sh")).alias("nb")),
               "doc_b"))
    # |A∪B| = na + nb − |A∩B| over distinct sets: same integers as
    # size(array_union), identical IEEE division — but one hash-set
    # build per pair instead of two (let-bound, NOTES fact #1).
    tj = F.element_at(
        F.transform(F.array(F.size(F.array_intersect("sha", "shb"))),
                    lambda i: i / (F.col("na") + F.col("nb") - i)), 1)
    bin_ = F.least(F.floor(tj * 16).cast("int"), F.lit(15))
    hist = (j.select(bin_.alias("bin"))
            .groupBy("bin")
            .agg(F.count("*").cast("long").alias("n"))
            .withColumn("s", (2 * F.col("bin") + 1).cast("double") / 32))
    cfg = spark.createDataFrame([(16, 1), (8, 2), (4, 4), (2, 8), (1, 16)],
                                "b int, r int")
    e = hist.crossJoin(F.broadcast(cfg))
    s = F.col("s")
    s2, s4 = s * s, (s * s) * (s * s)
    sr = (F.when(F.col("r") == 1, s).when(F.col("r") == 2, s2)
          .when(F.col("r") == 4, s4).when(F.col("r") == 8, s4 * s4)
          .otherwise((s4 * s4) * (s4 * s4)))
    e = e.withColumn("srv", sr)
    q1 = F.lit(1.0) - F.col("srv")
    q2 = q1 * q1
    q4 = (q1 * q1) * (q1 * q1)
    p = F.lit(1.0) - (F.when(F.col("b") == 1, q1).when(F.col("b") == 2, q2)
                      .when(F.col("b") == 4, q4)
                      .when(F.col("b") == 8, q4 * q4)
                      .otherwise((q4 * q4) * (q4 * q4)))
    e = e.withColumn("p", p)
    pos = F.col("s") >= 0.5
    agg = (e.groupBy("b", "r")
           .agg(F.sum(F.when(pos, F.col("n")).otherwise(0)).alias("n_pos"),
                F.sum(F.when(~pos, F.col("n")).otherwise(0)).alias("n_neg"),
                F.sum(F.when(pos, F.col("n") * F.col("p")).otherwise(0.0))
                 .alias("tp"),
                F.sum(F.when(~pos, F.col("n") * F.col("p")).otherwise(0.0))
                 .alias("fp")))
    return agg.select(
        F.col("b").alias("n_bands"), F.col("r").alias("band_size"),
        F.col("n_pos").cast("long").alias("n_pos"),
        F.col("n_neg").cast("long").alias("n_neg"),
        F.round(F.col("tp") / F.greatest(F.col("n_pos"), F.lit(1)), 4)
         .alias("exp_recall"),
        F.round(F.col("fp") / F.greatest(F.col("n_neg"), F.lit(1)), 4)
         .alias("exp_fp_rate"))


from crawler_spark.operators.hostrank import (  # noqa: E402
    bowtie_classes, bowtie_oracle_sql,
)

_G13_EDGES_SQL = (
    "SELECT 'h' || CAST(doc_id % 211 AS VARCHAR) AS src, "
    "'h' || CAST((doc_id*13+5) % 211 AS VARCHAR) AS dst FROM documents "
    "WHERE doc_id % 2 = 0 "
    "UNION ALL "
    "SELECT 'h' || CAST((doc_id*17+3) % 211 AS VARCHAR), "
    "'h' || CAST((doc_id*29+11) % 211 AS VARCHAR) FROM documents "
    "WHERE doc_id % 5 = 0")


@q("g13_bowtie", bowtie_oracle_sql(_G13_EDGES_SQL, max_hops=8))
def g13_bowtie(spark, sf_dir):
    """Web bow-tie decomposition (Broder et al., WWW 2000) over a sparse
    deterministic host graph: every host classified as CORE / IN / OUT /
    TENDRIL / DISCONNECTED relative to the max-degree pivot's SCC — the
    crawl-strategy readout of how much of a web pure link-following
    covers from the current seeds (all five classes are populated at
    this fixture: 28/58/27/93/5 at sf0.01). Membership by three capped
    hop_distance BFS legs (forward/reverse/undirected) so both engines
    compute identical sets; see operators/hostrank.bowtie_classes for
    the scale shape (host-cardinality joins, per-hop lineage cuts, no
    quadratic step)."""
    d = _t(spark, sf_dir, "documents")
    h = lambda c: F.concat(F.lit("h"), (c % 211).cast("string"))  # noqa: E731
    e1 = (d.where(F.col("doc_id") % 2 == 0)
          .select(h(F.col("doc_id")).alias("src"),
                  h(F.col("doc_id") * 13 + 5).alias("dst")))
    e2 = (d.where(F.col("doc_id") % 5 == 0)
          .select(h(F.col("doc_id") * 17 + 3).alias("src"),
                  h(F.col("doc_id") * 29 + 11).alias("dst")))
    return bowtie_classes(e1.unionByName(e2), max_hops=8)


from crawler_spark.operators.sketches import (  # noqa: E402
    bloom_membership, bloom_membership_oracle_sql,
)

_KS6_KEYS_SQL = ("SELECT source || '/' || CAST(doc_id AS VARCHAR) AS key "
                 "FROM documents WHERE doc_id % 2 = 0")
_KS6_CAND_SQL = ("SELECT doc_id, source || '/' || CAST(doc_id AS VARCHAR) "
                 "AS key FROM documents")


@q("ks6_bloom_membership",
   bloom_membership_oracle_sql(_KS6_KEYS_SQL, _KS6_CAND_SQL, m=1024, k=4))
def ks6_bloom_membership(spark, sf_dir):
    """The URL-seen Bloom prefilter's semantics under the hash gate: build
    a k=4/m=1024 filter from the even-doc key set, probe every doc key,
    and emit per-candidate maybe_seen + false_positive — the false
    positives themselves (the defining Bloom behavior, ~15 percent at
    this fill factor) must match DuckDB exactly, which they do because
    bit positions derive from the repo's content-stable md5 family
    instead of the production splitmix64 bitsets (those are
    engine-internal; soundness pytest-gated in test_bloom). See
    operators/sketches.bloom_membership for the A5 linkage and the scale
    shape (broadcast bits table == the engine's bitset broadcast)."""
    d = _t(spark, sf_dir, "documents")
    key = F.concat(F.col("source"), F.lit("/"),
                   F.col("doc_id").cast("string"))
    keys = d.where(F.col("doc_id") % 2 == 0).select(key.alias("key"))
    cands = d.select("doc_id", key.alias("key"))
    return bloom_membership(keys, cands, key_col="key", m=1024, k=4)


from crawler_spark.operators.hostrank import (  # noqa: E402
    lpa_communities, lpa_oracle_sql,
)


@q("g14_lpa_communities", lpa_oracle_sql(_G13_EDGES_SQL, iters=4))
def g14_lpa_communities(spark, sf_dir):
    """Synchronous label-propagation communities (Raghavan et al. 2007,
    deterministic min-label variant) over the g13 sparse host graph —
    the site-network / mirror-farm grouping signal, finer than CC (g3)
    because membership needs a neighborhood VOTE, not one stray edge.
    Fixed 4 rounds, unrolled identically in the DuckDB oracle. See
    operators/hostrank.lpa_communities for the per-round scale shape
    (edge-cardinality join + partial agg + degree-bounded window,
    lineage cut per round)."""
    d = _t(spark, sf_dir, "documents")
    h = lambda c: F.concat(F.lit("h"), (c % 211).cast("string"))  # noqa: E731
    e1 = (d.where(F.col("doc_id") % 2 == 0)
          .select(h(F.col("doc_id")).alias("src"),
                  h(F.col("doc_id") * 13 + 5).alias("dst")))
    e2 = (d.where(F.col("doc_id") % 5 == 0)
          .select(h(F.col("doc_id") * 17 + 3).alias("src"),
                  h(F.col("doc_id") * 29 + 11).alias("dst")))
    return lpa_communities(e1.unionByName(e2), iters=4)


@q("rc7_revalidation", """
WITH v AS (SELECT doc_id, md5(text) AS etag FROM documents),
n AS (SELECT doc_id,
             CASE WHEN doc_id % 7 = 0 THEN text || '<p>changed</p>'
                  ELSE text END AS html
      FROM documents)
SELECT n.doc_id,
       CAST(CASE WHEN md5(n.html) = v.etag THEN 304 ELSE 200 END AS BIGINT)
         AS status,
       CAST(CASE WHEN md5(n.html) = v.etag THEN 0 ELSE length(n.html) END
            AS BIGINT) AS wire_bytes,
       md5(n.html) AS content_sig
FROM n JOIN v USING (doc_id)
""")
def rc7_revalidation(spark, sf_dir):
    """RFC 9110 conditional revalidation under the hash gate, through the
    PRODUCTION path (sources/fetch.ConditionalFetcher wrapping
    SimulatedFetcher — not a re-derivation): validators are the md5 of
    each doc's stored text; 1-in-7 docs "changed" on the live site. The
    oracle recomputes the If-None-Match outcome — 304 + zero wire bytes
    + validator carried as content_sig for unchanged docs, 200 + full
    body + fresh signature for changed ones. The engine feature this
    gates: run_recrawl(revalidate=True) + merge_revalidated (e2e-tested
    in test_recrawl with a mutated web fixture)."""
    from crawler_spark.sources.fetch import ConditionalFetcher, SimulatedFetcher
    d = _t(spark, sf_dir, "documents")
    url = F.concat(F.lit("http://"), F.col("source"), F.lit("/doc/"),
                   F.col("doc_id").cast("string"))
    new_html = F.when(F.col("doc_id") % 7 == 0,
                      F.concat(F.col("text"), F.lit("<p>changed</p>"))) \
                .otherwise(F.col("text"))
    pages = d.select(url.alias("url_canon"), F.lit(200).alias("status"),
                     F.length(new_html).cast("long").alias("bytes"),
                     new_html.alias("html"))
    validators = d.select(url.alias("url_canon"),
                          F.md5("text").alias("etag"))
    fetcher = ConditionalFetcher(SimulatedFetcher(pages, cache=False),
                                 validators)
    batch = d.select("doc_id", url.alias("url_canon"))
    res = fetcher.fetch(batch)
    return res.select("doc_id",
                      F.col("status").cast("long").alias("status"),
                      F.col("bytes").cast("long").alias("wire_bytes"),
                      "content_sig")


@q("wc2_cdx_index", r"""
WITH base AS (
  SELECT doc_id, CAST(doc_id % 20 AS BIGINT) AS file_id,
         'http://' || source || '/doc/' || CAST(doc_id AS VARCHAR) AS uri,
         text AS payload
  FROM documents),
rec AS (
  SELECT *,
         CAST(octet_length(encode(
           'WARC/1.0' || e'\r\n' ||
           'WARC-Type: response' || e'\r\n' ||
           'WARC-Record-ID: <urn:md5:' || md5(uri) || '>' || e'\r\n' ||
           'WARC-Date: 2026-01-01T00:00:00Z' || e'\r\n' ||
           'WARC-Target-URI: ' || uri || e'\r\n' ||
           'Content-Type: text/plain' || e'\r\n' ||
           'Content-Length: ' ||
           CAST(octet_length(encode(payload)) AS VARCHAR) ||
           e'\r\n' || e'\r\n' || payload || e'\r\n' || e'\r\n')) AS BIGINT)
           AS length,
         regexp_replace(lower(uri), '^https?://', '') AS rest
  FROM base),
keyed AS (
  SELECT *,
         array_to_string(list_reverse(string_split(
           split_part(split_part(rest, '/', 1), ':', 1), '.')), ',')
         || ')' || substr(rest, length(split_part(rest, '/', 1)) + 1)
           AS urlkey
  FROM rec)
SELECT urlkey, file_id,
       CAST(COALESCE(sum(length) OVER (PARTITION BY file_id ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
         AS "offset",
       length, md5(payload) AS digest
FROM keyed
""")
def wc2_cdx_index(spark, sf_dir):
    """CDX capture index over the wc1 WARC layout (20 rotation files,
    records ordered by doc_id): SURT urlkey + byte offset + record length
    + payload digest per capture — offsets derived by pure prefix-sum
    algebra over the render, never by re-parsing (sources/warc.cdx_index;
    test_warc byte-slices the real blobs at these offsets to pin the
    algebra). The oracle re-renders the identical record string in SQL
    and windows the same sum."""
    from crawler_spark.sources.warc import cdx_index
    d = _t(spark, sf_dir, "documents")
    uri = F.concat(F.lit("http://"), F.col("source"), F.lit("/doc/"),
                   F.col("doc_id").cast("string"))
    base = d.select("doc_id", (F.col("doc_id") % 20).cast("long")
                    .alias("file_id"), "text", "source")
    return cdx_index(base, "file_id", "doc_id",
                     F.concat(F.lit("http://"), F.col("source"),
                              F.lit("/doc/"), F.col("doc_id").cast("string")),
                     F.col("text"))


@q("wc3_warc_revisit", r"""
WITH base AS (
  SELECT doc_id,
         'http://' || source || '/doc/' || CAST(doc_id AS VARCHAR) AS uri,
         text AS payload,
         CASE WHEN doc_id % 3 = 0 THEN NULL
              WHEN doc_id % 7 = 0 THEN md5('old:' || text)
              ELSE md5(text) END AS prior_digest
  FROM documents),
rend AS (
  SELECT *,
         'WARC/1.0' || e'\r\n' ||
         'WARC-Type: response' || e'\r\n' ||
         'WARC-Record-ID: <urn:md5:' || md5(uri) || '>' || e'\r\n' ||
         'WARC-Date: 2026-01-01T00:00:00Z' || e'\r\n' ||
         'WARC-Target-URI: ' || uri || e'\r\n' ||
         'Content-Type: text/plain' || e'\r\n' ||
         'Content-Length: ' ||
         CAST(octet_length(encode(payload)) AS VARCHAR) ||
         e'\r\n' || e'\r\n' || payload || e'\r\n' || e'\r\n' AS full_rec,
         prior_digest IS NOT NULL AND md5(payload) = prior_digest
           AS unchanged
  FROM base),
delta AS (
  SELECT doc_id, full_rec,
         CASE WHEN unchanged THEN
           'WARC/1.0' || e'\r\n' ||
           'WARC-Type: revisit' || e'\r\n' ||
           'WARC-Record-ID: <urn:md5:' || md5('revisit:' || uri) || '>'
             || e'\r\n' ||
           'WARC-Date: 2026-01-01T00:00:00Z' || e'\r\n' ||
           'WARC-Target-URI: ' || uri || e'\r\n' ||
           'WARC-Profile: http://netpreserve.org/warc/1.0/revisit/identical-payload-digest'
             || e'\r\n' ||
           'WARC-Refers-To: <urn:md5:' || md5(uri) || '>' || e'\r\n' ||
           'WARC-Payload-Digest: md5:' || prior_digest || e'\r\n' ||
           'Content-Type: text/plain' || e'\r\n' ||
           'Content-Length: 0' || e'\r\n' || e'\r\n' || e'\r\n' || e'\r\n'
         ELSE full_rec END AS rec
  FROM rend)
SELECT doc_id,
       split_part(split_part(rec, e'\r\n', 2), ' ', 2) AS record_type,
       CAST(octet_length(encode(rec)) AS BIGINT) AS rec_len,
       md5(rec) AS rec_md5,
       CAST(octet_length(encode(full_rec)) - octet_length(encode(rec))
            AS BIGINT) AS saved_bytes
FROM delta
""")
def wc3_warc_revisit(spark, sf_dir):
    """Incremental WARC archive (revisit records, WARC 1.0 §6.7.2 /
    Common Crawl-Heritrix convention): re-crawling a corpus where a
    prior capture exists, unchanged payloads are written as headers-only
    `revisit` records (identical-payload-digest profile, WARC-Refers-To
    the original response's deterministic id) and new/changed payloads
    as full `response` records — rc7's conditional-revalidation
    economics applied to the archive layer (304 saves wire bytes,
    revisit saves storage bytes). Fixture: doc_id%3==0 has no prior
    capture, doc_id%7==0 changed since capture, the rest unchanged.
    Emits per-capture record type, rendered length, record md5, and
    storage bytes saved vs a full re-archive; the oracle re-renders the
    identical record strings in SQL. All map-side column algebra — zero
    shuffle, zero Python (the mapInPandas splitter walks revisit records
    via the same Content-Length framing; test_warc round-trips the delta
    blobs). See sources/warc.warc_delta_record_col."""
    from crawler_spark.sources.warc import (
        CRLF, warc_delta_record_col, warc_record_col,
    )
    d = _t(spark, sf_dir, "documents")
    uri = F.concat(F.lit("http://"), F.col("source"), F.lit("/doc/"),
                   F.col("doc_id").cast("string"))
    prior = (F.when(F.col("doc_id") % 3 == 0, F.lit(None).cast("string"))
             .when(F.col("doc_id") % 7 == 0,
                   F.md5(F.concat(F.lit("old:"), F.col("text"))))
             .otherwise(F.md5(F.col("text"))))
    # let-bind the two rendered strings once (NOTES fact #1) and derive
    # every output field from the bound struct
    stats = F.element_at(
        F.transform(
            F.array(F.struct(
                warc_delta_record_col(uri, F.col("text"), prior)
                .alias("rec"),
                warc_record_col(uri, F.col("text")).alias("full"))),
            lambda s: F.struct(
                F.substring_index(
                    F.substring_index(s.getField("rec"), CRLF, 2),
                    " ", -1).alias("record_type"),
                F.octet_length(s.getField("rec")).cast("long")
                .alias("rec_len"),
                F.md5(s.getField("rec")).alias("rec_md5"),
                (F.octet_length(s.getField("full"))
                 - F.octet_length(s.getField("rec"))).cast("long")
                .alias("saved_bytes"))), 1)
    return d.select("doc_id",
                    stats.getField("record_type").alias("record_type"),
                    stats.getField("rec_len").alias("rec_len"),
                    stats.getField("rec_md5").alias("rec_md5"),
                    stats.getField("saved_bytes").alias("saved_bytes"))


_IX_TOK_SQL = (
    "SELECT doc_id, unnest(list_filter(regexp_split_to_array("
    "lower(trim(text)), '\\s+'), t -> t <> '')) AS term FROM documents")


@q("ix1_inverted_index", f"""
WITH tok AS ({_IX_TOK_SQL}),
tf AS (SELECT term, doc_id, COUNT(*) AS tf FROM tok GROUP BY term, doc_id)
SELECT term,
       CAST(COUNT(*) AS BIGINT) AS df,
       CAST(SUM(tf) AS BIGINT) AS total_tf,
       CAST(MAX(tf) AS BIGINT) AS max_tf,
       md5(string_agg(CAST(doc_id AS VARCHAR) || ':' ||
                      CAST(tf AS VARCHAR), ' ' ORDER BY doc_id))
         AS postings_md5
FROM tf GROUP BY term
""")
def ix1_inverted_index(spark, sf_dir):
    """Distributed inverted-index build — the two-phase MapReduce index
    expressed declaratively: explode tokens map-side, (term, doc_id)
    partial-agged tf shuffle, then a term-cardinality rollup with df /
    corpus tf / max per-doc tf and an md5 digest of the doc_id-sorted
    "doc:tf" postings string, so the hash gate pins the FULL postings
    content cross-engine, not just term stats. Zipf head terms are
    combined to one row per (term, doc) per task before the wire. See
    operators/invindex.build_index."""
    from crawler_spark.operators.invindex import build_index
    return build_index(_t(spark, sf_dir, "documents"))


@q("ix2_conjunctive_search", f"""
WITH tok AS ({_IX_TOK_SQL}),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok
       WHERE term IN ('vector', 'window', 'merge')
       GROUP BY doc_id, term)
SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS score,
       CAST(COUNT(*) AS BIGINT) AS n_terms
FROM tf GROUP BY doc_id HAVING COUNT(*) = 3
""")
def ix2_conjunctive_search(spark, sf_dir):
    """Boolean AND retrieval over the ix1 index: documents containing
    ALL of a 3-term query, scored by summed tf. The literal IN list
    ships with the task (no join), the term filter sits BEFORE the
    shuffle, and the intersection is a partial-agged matched-term count
    == |q| — at serving time this is a postings key lookup, not a corpus
    scan. See operators/invindex.conjunctive_search."""
    from crawler_spark.operators.invindex import conjunctive_search
    return conjunctive_search(_t(spark, sf_dir, "documents"),
                              ["vector", "window", "merge"])


@q("ix3_phrase_search", """
WITH t AS (SELECT doc_id,
                  list_filter(regexp_split_to_array(lower(trim(text)),
                                                    '\\s+'),
                              x -> x <> '') AS toks
           FROM documents),
c AS (SELECT doc_id,
             CAST(len(list_filter(range(1, len(toks)),
                                  i -> toks[i] = 'table'
                                       AND toks[i+1] = 'table'))
                  AS BIGINT) AS n_occurrences
      FROM t)
SELECT doc_id, n_occurrences FROM c WHERE n_occurrences > 0
""")
def ix3_phrase_search(spark, sf_dir):
    """Exact phrase retrieval ("table table" — a duplicate-token phrase,
    the hard case) via positional postings: posexplode, per-term
    candidate starts (pos - phrase_offset), and a coverage count == |q|
    over (doc, start) — no |q|-way self-join, overlapping occurrences
    counted. The DuckDB twin slides a window over the token list
    directly. See operators/invindex.phrase_search."""
    from crawler_spark.operators.invindex import phrase_search
    return phrase_search(_t(spark, sf_dir, "documents"),
                         ["table", "table"])


_BPE_K = 6

_BPE_W0 = r"""w0 AS MATERIALIZED (
  SELECT word, CAST(COUNT(*) AS BIGINT) AS wcount,
         ' ' || array_to_string(string_split(word, ''), '  ') || ' '
           AS syms
  FROM (SELECT unnest(list_filter(regexp_split_to_array(
                 lower(trim(text)), '\s+'), x -> x <> '')) AS word
        FROM documents)
  WHERE regexp_matches(word, '^[a-z0-9]+$')
  GROUP BY word)"""


def _bpe_ctes(k: int) -> str:
    """Unrolled k-round BPE training chain (see operators/bpe.py for
    the double-separator replace trick that makes each round a plain
    substring replace, bit-identical across engines)."""
    parts = [_BPE_W0]
    for i in range(k):
        parts.append(f"""p{i} AS MATERIALIZED (
  SELECT pr[1] AS left_sym, pr[2] AS right_sym,
         CAST(SUM(wcount) AS BIGINT) AS pair_count
  FROM (SELECT wcount,
               unnest(list_transform(range(1, len(sl)),
                                     j -> [sl[j], sl[j+1]])) AS pr
        FROM (SELECT wcount, string_split(trim(syms), '  ') AS sl
              FROM w{i}))
  GROUP BY 1, 2)""")
        parts.append(f"""m{i} AS MATERIALIZED (
  SELECT * FROM p{i}
  ORDER BY pair_count DESC, left_sym, right_sym LIMIT 1)""")
        parts.append(f"""w{i + 1} AS MATERIALIZED (
  SELECT word, wcount,
         replace(syms,
                 ' ' || (SELECT left_sym FROM m{i}) || '  '
                     || (SELECT right_sym FROM m{i}) || ' ',
                 ' ' || (SELECT left_sym FROM m{i})
                     || (SELECT right_sym FROM m{i}) || ' ') AS syms
  FROM w{i})""")
    return "WITH " + ",\n".join(parts)


_BPE_TRAIN_TAIL = "\nUNION ALL\n".join(
    f"SELECT CAST({i} AS BIGINT) AS merge_rank, left_sym, right_sym,"
    f" pair_count FROM m{i}" for i in range(_BPE_K))


@q("tk1_bpe_train", f"""
{_bpe_ctes(_BPE_K)}
{_BPE_TRAIN_TAIL}
""")
def tk1_bpe_train(spark, sf_dir):
    """BPE tokenizer training (Sennrich et al. 2016) under the hash
    gate: k=6 merge rounds, each a weighted adjacent-pair count over
    the symbolized word VOCABULARY (one corpus shuffle total), a
    deterministic 1-row argmax, and a self-preserving double-separator
    substring replace — plain left-to-right replace() semantics are
    identical in Spark and DuckDB, so the whole iterative run is
    bit-exact cross-engine. The oracle unrolls the k rounds as a CTE
    chain. See operators/bpe.train_merges."""
    from crawler_spark.operators.bpe import train_merges
    return train_merges(_t(spark, sf_dir, "documents"), k=_BPE_K)


_BPE_ENC_SYMS = (
    "' ' || array_to_string(string_split(word, ''), '  ') || ' '")
for _i in range(_BPE_K):
    _BPE_ENC_SYMS = (
        f"replace({_BPE_ENC_SYMS},\n"
        f"  ' ' || (SELECT left_sym FROM m{_i}) || '  '"
        f" || (SELECT right_sym FROM m{_i}) || ' ',\n"
        f"  ' ' || (SELECT left_sym FROM m{_i})"
        f" || (SELECT right_sym FROM m{_i}) || ' ')")


@q("tk2_bpe_encode", f"""
{_bpe_ctes(_BPE_K)},
enc AS (
  SELECT doc_id, {_BPE_ENC_SYMS} AS syms
  FROM (SELECT doc_id, unnest(list_filter(regexp_split_to_array(
                 lower(trim(text)), '\\s+'), x -> x <> '')) AS word
        FROM documents)
  WHERE regexp_matches(word, '^[a-z0-9]+$'))
SELECT doc_id,
       CAST(SUM(CAST((length(syms)
                      - length(replace(syms, ' ', ''))) / 2 AS BIGINT))
            AS BIGINT) AS n_bpe_tokens
FROM enc GROUP BY doc_id
""")
def tk2_bpe_encode(spark, sf_dir):
    """Corpus encoded with the k=6 BPE merges learned from the SAME
    corpus (tk1): per-doc post-merge token counts via the format's
    space arithmetic (spaces = 2 * symbols, exact). The learned merges
    are a k-row bounded collect embedded as literal chained replaces —
    the encode pass is map-side only plus one partial-agged per-doc
    sum. See operators/bpe.encode_token_counts."""
    from crawler_spark.operators.bpe import encode_token_counts
    return encode_token_counts(_t(spark, sf_dir, "documents"), k=_BPE_K)


@q("px9_bpe_pack", f"""
{_bpe_ctes(_BPE_K)},
enc AS (
  SELECT doc_id, {_BPE_ENC_SYMS} AS syms
  FROM (SELECT doc_id, unnest(list_filter(regexp_split_to_array(
                 lower(trim(text)), '\\s+'), x -> x <> '')) AS word
        FROM documents)
  WHERE regexp_matches(word, '^[a-z0-9]+$')),
t AS (
  SELECT doc_id,
         CAST(SUM(CAST((length(syms)
                        - length(replace(syms, ' ', ''))) / 2 AS BIGINT))
              AS BIGINT) AS n_bpe_tokens
  FROM enc GROUP BY doc_id),
c AS (
  SELECT doc_id, n_bpe_tokens,
         COALESCE(SUM(n_bpe_tokens) OVER (ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  0)::BIGINT AS prev_tokens
  FROM t)
SELECT doc_id, n_bpe_tokens, prev_tokens,
       (prev_tokens // 512)::BIGINT AS seq_id,
       (prev_tokens % 512)::BIGINT AS seq_offset
FROM c
""")
def px9_bpe_pack(spark, sf_dir):
    """End-to-end tokenizer-aware packing: BPE token counts from the
    corpus-trained k=6 merge table (tk2) feed the distributed two-phase
    prefix-sum packer (px3) to chunk the corpus into 512-token training
    sequences — the tokenize→count→pack composition a pre-training data
    job actually runs, with every stage under the hash gate. Docs with
    no alnum words are absent by construction in both engines. See
    operators/bpe.encode_token_counts + operators/sampling.pack_sequences."""
    from crawler_spark.operators.bpe import encode_token_counts
    from crawler_spark.operators.sampling import pack_sequences
    counts = encode_token_counts(_t(spark, sf_dir, "documents"), k=_BPE_K)
    return pack_sequences(counts, "n_bpe_tokens", order_col="doc_id",
                          budget=512, n_blocks=8)


@q("ix4_vocab_ids", f"""
WITH tok AS ({_IX_TOK_SQL}),
tf AS (SELECT term, doc_id FROM tok GROUP BY term, doc_id),
idx AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term)
SELECT term, df,
       CAST(ROW_NUMBER() OVER (ORDER BY df DESC, term) - 1 AS BIGINT)
         AS term_id
FROM idx
""")
def ix4_vocab_ids(spark, sf_dir):
    """Dense tokenizer-vocabulary ids over the ix1 index (df desc, term
    asc — id 0 is the most common term, content-stable). The global
    row_number is `global_rank`'s two-phase shape: a pure monotone block
    id from driver-frozen boundary literals, block-local row_number,
    broadcast n_parts-row prefix-sum offsets — never a single-task
    global window over the vocabulary, and no plan-branch-racy
    partition-id blocking. See operators/invindex.vocab_ids."""
    from crawler_spark.operators.invindex import build_index, vocab_ids
    return vocab_ids(build_index(_t(spark, sf_dir, "documents")),
                     n_parts=8)


from crawler_spark.operators.hostrank import salsa_oracle_sql  # noqa: E402


@q("g17_salsa", salsa_oracle_sql(_G1_EDGES_SQL, iters=3))
def g17_salsa(spark, sf_dir):
    """SALSA hubs/authorities over the host graph (same deterministic
    edge derivation as g1/g4): the degree-normalized random-walk variant
    of HITS (Lempel & Moran, WWW 2000) that resists the Tightly-Knit-
    Community effect — the ranking large production link graphs actually
    deploy (GraphJet-style). 3 fixed sum-normalized iterations; the
    oracle unrolls them with identical degree weights. Per iteration two
    host-cardinality shuffles, lineage cut per round — identical scale
    shape to g1/g4. See operators/hostrank.salsa_hosts."""
    from crawler_spark.operators.hostrank import salsa_hosts
    d = _t(spark, sf_dir, "documents")
    dst = F.concat(F.lit("src"),
                   ((F.col("doc_id") * 7 + 3) % 23).cast("string"))
    edges = (d.select(F.col("source").alias("src"), dst.alias("dst"))
             .where(F.col("src") != F.col("dst"))
             .distinct())
    out = salsa_hosts(edges, iters=3)
    return out.select("host", F.round("auth", 4).alias("auth"),
                      F.round("hub", 4).alias("hub"))


_TX17_FEATS_SQL = f"""
SELECT doc_id,
       CAST({_NW} AS BIGINT) AS x1,
       CAST({_hits(_LM['en'])} AS BIGINT) AS x2,
       CAST(length(text) // 100 AS BIGINT) AS x3,
       CAST(length(text)
            - length(regexp_replace(text, '[0-9]', '', 'g')) AS BIGINT)
         AS x4,
       CAST(CASE WHEN {_NW} BETWEEN 20 AND 10000
                  AND {_hits(_LM['en'])} * 100 > {_NW}
            THEN 1 ELSE -1 END AS BIGINT) AS y
FROM documents
"""

from crawler_spark.operators.classifier import (  # noqa: E402
    perceptron_oracle_sql, perceptron_score, perceptron_train,
)


@q("tx17_perceptron_quality",
   perceptron_oracle_sql(_TX17_FEATS_SQL, ["x1", "x2", "x3", "x4"],
                         epochs=3, out_cols="f.doc_id"))
def tx17_perceptron_quality(spark, sf_dir):
    """Learned quality filter: a full-batch integer perceptron distilled
    from the heuristic teacher rule (length band + stopword density — the
    FineWeb-Edu/DCLM classifier-distillation pattern), trained IN the
    engine. Each epoch is one corpus scan -> map-side partial aggregate
    -> ONE collected row of 5 integers; weights re-enter the next epoch
    as plan literals — the canonical data-parallel GD shape at 100 TB
    (model state O(features) on the driver, data never shuffles). All
    integer arithmetic, so training + scoring sit under the bit-exact
    hash gate; the oracle unrolls the 3 epochs as chained 1-row weight
    CTEs. See operators/classifier.py."""
    d = _t(spark, sf_dir, "documents")
    t = F.trim(F.col("text"))
    w = F.split(t, r"\s+")
    en = list(_LM["en"])
    feats = d.select(
        "doc_id",
        F.size(w).cast("long").alias("x1"),
        F.size(F.filter(w, lambda x: x.isin(*en))).cast("long").alias("x2"),
        F.floor(F.length("text") / 100).cast("long").alias("x3"),
        (F.length("text")
         - F.length(F.regexp_replace(F.col("text"), "[0-9]", "")))
        .cast("long").alias("x4"))
    feats = feats.withColumn(
        "y",
        F.when(F.col("x1").between(20, 10000)
               & (F.col("x2") * 100 > F.col("x1")),
               F.lit(1)).otherwise(F.lit(-1)).cast("long"))
    feats = feats.localCheckpoint(eager=True)   # scanned once per epoch
    wts, b = perceptron_train(feats, ["x1", "x2", "x3", "x4"], epochs=3)
    return perceptron_score(feats, ["x1", "x2", "x3", "x4"], wts, b) \
        .select("doc_id", "y", "score", "pred")


from crawler_spark.operators.hostrank import harmonic_oracle_sql  # noqa: E402


@q("g18_harmonic_centrality", harmonic_oracle_sql(_G5_EDGES_SQL, max_hops=4))
def g18_harmonic_centrality(spark, sf_dir):
    """Harmonic centrality of every host in the g5 graph via HyperBall
    (Boldi & Vigna 2013): HLL-register BFS on the reversed graph (g16's
    bit-exact integer algebra), ball deltas folded as
    sum_t (|B(v,t)|-|B(v,t-1)|)/t in a fixed pivot order. The published
    10^8-node centrality method, fully under the hash gate. See
    operators/hostrank.harmonic_centrality."""
    from crawler_spark.operators.hostrank import harmonic_centrality
    d = _t(spark, sf_dir, "documents")
    dst = F.concat(F.lit("src"),
                   ((F.col("doc_id") * 7 + 3) % 40).cast("string"))
    edges = (d.where(F.col("doc_id") % 11 == 0)
             .select(F.col("source").alias("src"), dst.alias("dst"))
             .where(F.col("src") != F.col("dst"))
             .distinct())
    return harmonic_centrality(edges, max_hops=4)


_MM9_T_COLS = ",\n       ".join(
    f"CAST(len(list_filter(bk, x -> x = {c})) AS BIGINT) AS t{c}"
    for c in range(8))
_MM9_DOT = " + ".join(f"s{c} * t{c}" for c in range(8))
_MM9_NA = " + ".join(f"s{c} * s{c}" for c in range(8))
_MM9_NB = " + ".join(f"t{c} * t{c}" for c in range(8))

_MM9_SQL = f"""
WITH a AS (SELECT doc_id, text,
                  regexp_replace(text, '[^\\x20-\\x7E]', '', 'g') AS s
           FROM documents),
     b AS (SELECT doc_id, text,
                  list_transform(split(s, ''), ch -> ascii(ch)) AS cps,
                  length(s) AS n
           FROM a),
     m AS (SELECT doc_id, text,
       {_MM5_CHUNK_COLS}
     FROM b),
     w AS (SELECT doc_id, {_MM9_T_COLS}
           FROM (SELECT doc_id,
                        list_transform(
                          regexp_split_to_array(trim(text), '\\s+'),
                          x -> ('0x' || substr(md5(x), 1, 8))::BIGINT % 8)
                          AS bk
                 FROM a)),
     j AS (SELECT m.doc_id,
                  CAST({_MM9_DOT} AS BIGINT) AS dot,
                  CAST({_MM9_NA} AS BIGINT) AS na,
                  CAST({_MM9_NB} AS BIGINT) AS nb
           FROM m JOIN w ON m.doc_id = w.doc_id)
SELECT doc_id, dot, na, nb,
       CASE WHEN na * nb > 0
            THEN round(dot / sqrt(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)), 4)
            ELSE 0.0 END AS align_score,
       CAST(CASE WHEN dot > 0 AND 100 * dot * dot >= 9 * na * nb
            THEN 1 ELSE 0 END AS BIGINT) AS kept
FROM j
"""


@q("mm9_clip_gate", _MM9_SQL)
def mm9_clip_gate(spark, sf_dir):
    """CLIP-style image-text alignment gate (the LAION filtering rule:
    keep a pair iff cosine(img_emb, txt_emb) >= 0.3), with deterministic
    stand-in encoders: the media tower is the REAL mapInPandas decode
    kernel (multimodal.decode_byte_sums — swap for a CLIP image tower in
    production, nothing else changes), the text tower an 8-bucket hashed
    bag-of-words built in ONE zero-shuffle fold. The keep decision is
    pure integer arithmetic (100*dot^2 >= 9*na*nb, dot>0 — no float in
    the gate); the reported cosine uses one exact-product sqrt, bit-
    stable cross-engine (IEEE 754 requires sqrt correctly rounded —
    unlike log2, see g8). Scale: two narrow per-row passes + one id-key
    join; thresholding shuffles nothing."""
    from crawler_spark.operators.multimodal import decode_byte_sums
    d = _t(spark, sf_dir, "documents")
    src = d.select(
        "doc_id", "text",
        F.regexp_replace(F.col("text"), r"[^\x20-\x7E]", "")
        .alias("ascii_text"))
    media = decode_byte_sums(
        src.withColumn("payload_bin", F.encode("ascii_text", "UTF-8")))
    wds = F.split(F.trim(F.col("text")), r"\s+")
    bucket = lambda x: F.pmod(  # noqa: E731
        F.conv(F.substring(F.md5(x), 1, 8), 16, 10).cast("long"), F.lit(8))
    tv = F.aggregate(
        wds, F.array_repeat(F.lit(0).cast("long"), 8),
        lambda acc, x: F.transform(
            acc, lambda c, i: c + (bucket(x) == i.cast("long"))
            .cast("long")))
    txt = d.select("doc_id", tv.alias("tv"))
    j = media.join(txt, "doc_id")
    dot = sum((F.col(f"s{c}") * F.element_at("tv", c + 1)
               for c in range(8)), F.lit(0).cast("long"))
    na = sum((F.col(f"s{c}") * F.col(f"s{c}") for c in range(8)),
             F.lit(0).cast("long"))
    nb = sum((F.element_at("tv", c + 1) * F.element_at("tv", c + 1)
              for c in range(8)), F.lit(0).cast("long"))
    j = j.select("doc_id", dot.alias("dot"), na.alias("na"), nb.alias("nb"))
    score = F.when(
        F.col("na") * F.col("nb") > 0,
        F.round(F.col("dot") / F.sqrt((F.col("na") * F.col("nb"))
                                      .cast("double")), 4)) \
        .otherwise(F.lit(0.0))
    kept = F.when((F.col("dot") > 0)
                  & (100 * F.col("dot") * F.col("dot")
                     >= 9 * F.col("na") * F.col("nb")),
                  F.lit(1)).otherwise(F.lit(0)).cast("long")
    return j.select("doc_id", "dot", "na", "nb",
                    score.alias("align_score"), kept.alias("kept"))


@q("tk3_fertility", f"""
{_bpe_ctes(_BPE_K)},
enc AS (
  SELECT doc_id, word, {_BPE_ENC_SYMS} AS syms
  FROM (SELECT doc_id, unnest(list_filter(regexp_split_to_array(
                 lower(trim(text)), '\\s+'), x -> x <> '')) AS word
        FROM documents)
  WHERE regexp_matches(word, '^[a-z0-9]+$')),
t AS (
  SELECT doc_id,
         CAST(SUM(CAST((length(syms)
                        - length(replace(syms, ' ', ''))) / 2 AS BIGINT))
              AS BIGINT) AS n_bpe_tokens,
         CAST(COUNT(*) AS BIGINT) AS n_words,
         CAST(SUM(length(word)) AS BIGINT) AS n_chars
  FROM enc GROUP BY doc_id)
SELECT d.lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(t.n_bpe_tokens) AS BIGINT) AS n_tokens,
       CAST(SUM(t.n_words) AS BIGINT) AS n_words,
       CAST(SUM(t.n_chars) AS BIGINT) AS n_chars,
       round(CAST(SUM(t.n_bpe_tokens) AS DOUBLE) / SUM(t.n_words), 4)
         AS fertility,
       round(CAST(SUM(t.n_chars) AS DOUBLE) / SUM(t.n_bpe_tokens), 4)
         AS chars_per_token
FROM t JOIN documents d USING (doc_id)
GROUP BY d.lang
""")
def tk3_fertility(spark, sf_dir):
    """Tokenizer fertility per language — the standard multilingual
    tokenizer-evaluation metric (subword units per word; cf. XLM-R /
    SentencePiece evaluations): corpus encoded with its own k=6 BPE
    merges (tk2), per-doc token/word/char sums rolled up by the lang
    column, one exact division per output row. Low-resource languages
    with high fertility are exactly the ones a token-budget mix (tx8)
    under-samples — this is the diagnostic that pairs with it.
    Scale: encode is map-side; two partial-agged aggregates (doc, then
    lang); the doc->lang join carries 3 BIGINTs per doc. See
    operators/bpe.encode_word_stats."""
    from crawler_spark.operators.bpe import encode_word_stats
    d = _t(spark, sf_dir, "documents")
    t = encode_word_stats(d, k=_BPE_K)
    j = t.join(d.select("doc_id", "lang"), "doc_id")
    return (j.groupBy("lang")
            .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
                 F.sum("n_bpe_tokens").alias("n_tokens"),
                 F.sum("n_words").alias("n_words"),
                 F.sum("n_chars").alias("n_chars"),
                 F.round(F.sum("n_bpe_tokens").cast("double")
                         / F.sum("n_words"), 4).alias("fertility"),
                 F.round(F.sum("n_chars").cast("double")
                         / F.sum("n_bpe_tokens"), 4)
                 .alias("chars_per_token")))


from crawler_spark.operators.hostrank import (  # noqa: E402
    effective_diameter_oracle_sql,
)


@q("g19_effective_diameter",
   effective_diameter_oracle_sql(_G5_EDGES_SQL, max_hops=4))
def g19_effective_diameter(spark, sf_dir):
    """Effective diameter (90th-percentile interpolated hop count) of
    the g5 host graph from the HyperANF neighborhood function — the
    statistic the HyperANF paper was built to compute at web scale, and
    the crawl-planning answer to 'how many waves reach 90% of reachable
    pairs'. NF(t) is accumulated as exact integers (round(est*10^4)) so
    no float row-sum crosses the engines; one interpolation division at
    the end. See operators/hostrank.effective_diameter."""
    from crawler_spark.operators.hostrank import effective_diameter
    d = _t(spark, sf_dir, "documents")
    dst = F.concat(F.lit("src"),
                   ((F.col("doc_id") * 7 + 3) % 40).cast("string"))
    edges = (d.where(F.col("doc_id") % 11 == 0)
             .select(F.col("source").alias("src"), dst.alias("dst"))
             .where(F.col("src") != F.col("dst"))
             .distinct())
    return effective_diameter(edges, max_hops=4)


@q("wc4_wet_extract", """
SELECT doc_id,
       CAST(octet_length(encode(array_to_string(
             regexp_split_to_array(trim(text), '\\s+'), ' ')))
            AS BIGINT) AS n_bytes,
       md5(array_to_string(regexp_split_to_array(trim(text), '\\s+'), ' '))
         AS payload_md5
FROM documents
""")
def wc4_wet_extract(spark, sf_dir):
    """WET production path (Common Crawl's conversion records): each
    document is rendered into its link-dense HTML page (ex1's fixture
    renderer), the main content extracted JVM-side (link-density
    classifier), written as WARC/1.0 `conversion` records into 20 WET
    files, then re-parsed with the Content-Length-framed splitter — and
    the extracted payload must STILL md5-match the normalized original
    text straight from parquet (the oracle never sees HTML or WARC).
    Gates extractor + record framing + refers-to plumbing in one pass.
    All render/extract work is map-side column algebra; the only
    shuffle is the 20-file groupBy. See sources/warc.py +
    functions/extract.py."""
    from crawler_spark.functions.extract import (
        main_content_col, render_page_col,
    )
    from crawler_spark.sources.warc import (
        parse_warc, warc_conversion_record_col, warc_file_blobs,
    )
    d = _t(spark, sf_dir, "documents")
    uri = F.concat(F.lit("https://corpus.example/doc/"),
                   F.col("doc_id").cast("string"))
    words = F.split(F.trim(F.col("text")), r"\s+")
    page = render_page_col(words, F.col("source"))
    content = F.element_at(
        F.transform(F.array(page), lambda p: main_content_col(p)), 1)
    files = warc_file_blobs(
        d.withColumn("file_id", (F.col("doc_id") % 20).cast("long")),
        "file_id", "doc_id", warc_conversion_record_col(uri, content))
    parsed = parse_warc(files, "blob")
    return parsed.select(
        F.regexp_extract("target_uri", r"/doc/(\d+)$", 1).cast("long")
         .alias("doc_id"),
        F.col("n_bytes"),
        F.md5("payload").alias("payload_md5"))


@q("tx19_zipf_slope", f"""
WITH tok AS ({_IX_TOK_SQL}),
tf AS (SELECT term, doc_id FROM tok GROUP BY term, doc_id),
idx AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term),
r AS (SELECT df,
             CAST(ROW_NUMBER() OVER (ORDER BY df DESC, term) AS BIGINT)
               AS rnk
      FROM idx),
b AS (SELECT CAST(length(bin(rnk)) AS BIGINT) AS x,
             CAST(length(bin(df)) AS BIGINT) AS y
      FROM r),
s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * y) AS BIGINT) AS sxy,
             CAST(SUM(x * x) AS BIGINT) AS sxx
      FROM b)
SELECT n, sx, sy, sxy, sxx,
       round(CAST(n * sxy - sx * sy AS DOUBLE)
             / (n * sxx - sx * sx), 4) AS zipf_slope
FROM s
""")
def tx19_zipf_slope(spark, sf_dir):
    """Zipf-law fit over the corpus vocabulary: least-squares slope of
    log2(doc-frequency) against log2(rank) — the corpus-health
    diagnostic (natural text sits near -1; template/spam farms and
    boilerplate-heavy crawls flatten or steepen it, cf. the C4/Gopher
    corpus analyses). Integer lattice end to end: ranks come from ix4's
    distributed two-phase row_number, both logs are length(bin(v))
    (g8's trick — libm log2 is NOT cross-engine bit-stable, bit-length
    is), the five regression sums are exact BIGINTs, and ONE final
    division produces the slope. Scale: two vocabulary-cardinality
    shuffles (index + range partition) + one global partial agg."""
    from crawler_spark.operators.invindex import build_index, vocab_ids
    v = vocab_ids(build_index(_t(spark, sf_dir, "documents")), n_parts=8)
    b = v.select(
        F.length(F.bin(F.col("term_id") + 1)).cast("long").alias("x"),
        F.length(F.bin("df")).cast("long").alias("y"))
    s = b.agg(F.count(F.lit(1)).cast("long").alias("n"),
              F.sum("x").alias("sx"), F.sum("y").alias("sy"),
              F.sum(F.col("x") * F.col("y")).alias("sxy"),
              F.sum(F.col("x") * F.col("x")).alias("sxx"))
    return s.select(
        "n", "sx", "sy", "sxy", "sxx",
        F.round((F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
                .cast("double")
                / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")),
                4).alias("zipf_slope"))


@q("tx20_vocab_growth", f"""
WITH tok AS ({_IX_TOK_SQL}),
frst AS (SELECT term, MIN(doc_id) AS fd FROM tok GROUP BY term),
mx AS (SELECT MAX(doc_id) AS mxid FROM documents),
qs AS (SELECT q, ((mxid + 1) * q) // 4 AS thr
       FROM mx, (VALUES (1), (2), (3), (4)) t(q)),
nd AS (SELECT q, CAST(COUNT(*) AS BIGINT) AS n_docs
       FROM documents, qs WHERE doc_id < thr GROUP BY q),
vc AS (SELECT q, CAST(COUNT(*) AS BIGINT) AS vocab
       FROM frst, qs WHERE fd < thr GROUP BY q)
SELECT CAST(q AS BIGINT) AS quartile, n_docs, vocab
FROM nd JOIN vc USING (q)
""")
def tx20_vocab_growth(spark, sf_dir):
    """Heaps-law vocabulary growth curve (Heaps 1978): distinct-term
    count after each quartile of the corpus, via FIRST-OCCURRENCE
    semantics — a term's contribution point is min(doc_id), so the
    whole curve costs ONE vocabulary-cardinality aggregate + two
    broadcast-threshold conditional counts, never four corpus passes.
    The companion diagnostic to tx19: sub-linear growth (V ~ N^0.7) is
    healthy text; near-linear growth is an id/hash/spam explosion that
    will blow up tokenizer training (tk1) and the ix index. Thresholds
    derive from max(doc_id) as exact integers."""
    d = _t(spark, sf_dir, "documents")
    tok = d.select("doc_id",
                   F.explode(F.filter(
                       F.split(F.lower(F.trim("text")), r"\s+"),
                       lambda t: t != "")).alias("term"))
    first = tok.groupBy("term").agg(F.min("doc_id").alias("fd"))
    qs = (d.agg(F.max("doc_id").alias("mxid"))
          .select(F.explode(F.array(*[F.lit(k) for k in (1, 2, 3, 4)]))
                  .alias("q"), "mxid")
          .withColumn("thr", ((F.col("mxid") + 1) * F.col("q"))
                      .cast("long") / 4)
          .withColumn("thr", F.floor("thr").cast("long"))
          .select("q", "thr"))
    nd = (d.crossJoin(F.broadcast(qs))
          .where(F.col("doc_id") < F.col("thr"))
          .groupBy("q").agg(F.count(F.lit(1)).cast("long")
                            .alias("n_docs")))
    vc = (first.crossJoin(F.broadcast(qs))
          .where(F.col("fd") < F.col("thr"))
          .groupBy("q").agg(F.count(F.lit(1)).cast("long").alias("vocab")))
    return (nd.join(vc, "q")
            .select(F.col("q").cast("long").alias("quartile"),
                    "n_docs", "vocab"))


_PX10_SQL = f"""
WITH spans AS ({_SPAN_SQL}),
tok AS (
  SELECT doc_id,
         COALESCE(list_sum(list_transform(spans, s ->
             CASE WHEN s.kind = 'text' AND trim(s.text) <> ''
                  THEN len(regexp_split_to_array(trim(s.text), '\\s+'))
                  ELSE 0 END)), 0)::BIGINT AS text_tokens,
         COALESCE(list_sum(list_transform(spans, s ->
             CASE WHEN s.kind = 'text' AND trim(s.text) <> ''
                   AND len(regexp_split_to_array(trim(s.text), '\\s+')) < 3
                  THEN len(regexp_split_to_array(trim(s.text), '\\s+'))
                  ELSE 0 END)), 0)::BIGINT AS masked_text,
         ({_MM4_MEDIA_TOKENS} *
          len(list_filter(spans, s -> s.kind = 'media')))::BIGINT
           AS media_tokens
  FROM spans),
t AS (SELECT doc_id, text_tokens + media_tokens AS n_tokens,
             media_tokens + masked_text AS n_masked FROM tok),
c AS (
  SELECT *, COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
            0)::BIGINT AS prev_tokens
  FROM t),
p AS (SELECT *, (prev_tokens // {_MM4_BUDGET})::BIGINT AS seq_id FROM c)
SELECT seq_id,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
       CAST(SUM(n_masked) AS BIGINT) AS n_masked,
       CAST(SUM(n_tokens) - SUM(n_masked) AS BIGINT) AS n_loss_tokens,
       round(CAST(SUM(n_masked) AS DOUBLE) / SUM(n_tokens), 4)
         AS mask_ratio
FROM p GROUP BY seq_id
"""


@q("px10_loss_mask", _PX10_SQL)
def px10_loss_mask(spark, sf_dir):
    """Loss-mask accounting over packed multimodal sequences: media
    placeholder tokens and fragment text spans (< 3 words — the
    boilerplate-snippet mask rule) are excluded from the LM loss, and
    each 2048-token training sequence reports its maskable share — the
    number a data-loader needs to budget EFFECTIVE (loss-bearing)
    tokens per batch rather than raw tokens. Per-doc costing is ONE
    let-bound struct fold over the span array (zero shuffle); packing
    is mm4's distributed prefix sum; the rollup is one partial-agged
    groupBy(seq_id). Oracle: sequential window + the same span
    algebra."""
    from crawler_spark.operators.sampling import pack_sequences
    s = _spans_df(spark, sf_dir)

    def _wc(sp):
        return F.size(F.split(F.trim(sp.text), r"\s+"))

    def _stats(sp_arr):
        text = F.aggregate(
            F.transform(sp_arr, lambda sp: F.when(
                (sp.kind == "text") & (F.trim(sp.text) != ""), _wc(sp))
                .otherwise(F.lit(0)).cast("long")),
            F.lit(0).cast("long"), lambda a, x: a + x)
        masked = F.aggregate(
            F.transform(sp_arr, lambda sp: F.when(
                (sp.kind == "text") & (F.trim(sp.text) != "")
                & (_wc(sp) < 3), _wc(sp))
                .otherwise(F.lit(0)).cast("long")),
            F.lit(0).cast("long"), lambda a, x: a + x)
        media = (F.lit(_MM4_MEDIA_TOKENS)
                 * F.size(F.filter(sp_arr, lambda sp: sp.kind == "media"))
                 ).cast("long")
        return F.struct(text.alias("text"), masked.alias("masked"),
                        media.alias("media"))

    st = F.element_at(
        F.transform(F.array(F.col("spans")), _stats), 1)
    t = s.select(
        "doc_id",
        (st.getField("text") + st.getField("media")).alias("n_tokens"),
        (st.getField("media") + st.getField("masked")).alias("n_masked"))
    p = pack_sequences(t, "n_tokens", order_col="doc_id",
                       budget=_MM4_BUDGET, n_blocks=8)
    return (p.groupBy("seq_id")
            .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
                 F.sum("n_tokens").alias("n_tokens"),
                 F.sum("n_masked").alias("n_masked"),
                 (F.sum("n_tokens") - F.sum("n_masked")).cast("long")
                 .alias("n_loss_tokens"),
                 F.round(F.sum("n_masked").cast("double")
                         / F.sum("n_tokens"), 4).alias("mask_ratio")))


@q("g20_cocitation", f"""
WITH e0 AS ({_G8_EDGES_SQL}),
g AS (SELECT src, count(*) AS od FROM e0 GROUP BY 1),
e AS (SELECT e0.src, e0.dst FROM e0 JOIN g ON e0.src = g.src
      WHERE g.od <= 16),
p AS (SELECT a.dst AS h1, b.dst AS h2, count(*) AS cocite
      FROM e a JOIN e b ON a.src = b.src AND a.dst < b.dst
      GROUP BY 1, 2)
SELECT h1, h2, CAST(cocite AS BIGINT) AS cocite
FROM p WHERE cocite >= 2
""")
def g20_cocitation(spark, sf_dir):
    """Co-citation related-hosts (Dean & Henzinger, WWW 1999): two hosts
    are related when many distinct sources link to BOTH; the pair count
    is the classic "related pages" similarity that needs no content at
    all. Composes with g1/g17 as a same-topic prior and with f9/f10 as a
    mirror-candidate signal (mirrors share nearly all citers).

    Scale: NO edge self-join — edges group once by citing source and
    pairs are generated in-bucket from the sorted dst array (the dd3
    in-bucket idiom), so shuffle volume is the edge list, not the pair
    list. The quadratic guard is the out-degree cap (od <= 16 here;
    profligate citers say nothing about relatedness and are dropped,
    exactly like dd3's max_bucket): per-source pair fan-out is bounded
    by cap^2/2. Reference parity: spider exposes the raw link graph
    (page_links, spider/src/page.rs via lib.rs re-export); relatedness
    is derived algebra over it."""
    d = _t(spark, sf_dir, "documents")
    h = F.substring("source", 4, 10).cast("int")
    dst = F.concat(F.lit("src"),
                   ((F.col("doc_id") * 7 + 3) % (1 + (h % 20)))
                   .cast("string"))
    e0 = (d.select(F.col("source").alias("src"), dst.alias("dst"))
          .where(F.col("src") != F.col("dst")).distinct())
    grp = (e0.groupBy("src")
           .agg(F.sort_array(F.collect_list("dst")).alias("ds"))
           .where(F.size("ds") <= 16))
    pairs = grp.select(F.explode(F.flatten(F.expr(
        "transform(ds, (x, i) -> transform(slice(ds, i + 2, size(ds)), "
        "y -> struct(x AS h1, y AS h2)))"))).alias("p"))
    return (pairs.select("p.h1", "p.h2")
            .groupBy("h1", "h2")
            .agg(F.count(F.lit(1)).cast("long").alias("cocite"))
            .where(F.col("cocite") >= 2))


@q("f11_soft404", """
WITH s AS (
  SELECT source AS host,
         CASE WHEN regexp_matches(lower(text),
                '(not found|error 404|no longer available|page does not exist)')
               OR len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                      t -> t <> '')) < 20
              THEN 1 ELSE 0 END AS soft
  FROM documents)
SELECT host, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(soft) AS BIGINT) AS n_soft404,
       round(CAST(sum(soft) AS DOUBLE) / count(*), 4) AS soft404_rate
FROM s GROUP BY host
""")
def f11_soft404(spark, sf_dir):
    """Soft-404 detection: pages that return HTTP 200 but are really
    error shells — the canonical content-side crawler trap (Bar-Yossef
    et al., "Sic transit gloria telae", WWW 2004). The practical batch
    heuristic: an error-phrase match OR a thin body (< 20 real words).
    Per-host soft-404 rate feeds the frontier as a demotion prior (a
    host serving mostly error shells wastes fetch budget) and feeds dd8
    as a keep-disqualifier. Reference parity: spider surfaces only the
    status code (CrawlResults.status in main.rs:35-43); 200-but-empty
    detection is exactly what this adds on top.

    Scale: both signals are map-side codegen (one regex + one
    filtered-split length per row, text touched twice but let-binding
    is not needed — each signal folds the row once); the rollup is ONE
    partial-agged groupBy(host). Zero joins, zero Python."""
    d = _t(spark, sf_dir, "documents")
    low = F.lower("text")
    n_words = F.size(F.filter(
        F.split(F.trim("text"), r"\s+"), lambda t: t != ""))
    soft = F.when(
        low.rlike("(not found|error 404|no longer available"
                  "|page does not exist)") | (n_words < 20),
        F.lit(1)).otherwise(F.lit(0))
    return (d.select(F.col("source").alias("host"), soft.alias("soft"))
            .groupBy("host")
            .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
                 F.sum("soft").cast("long").alias("n_soft404"),
                 F.round(F.sum("soft").cast("double")
                         / F.count(F.lit(1)), 4).alias("soft404_rate")))


_G21_TRUST_CTE = ("SELECT 'src0' AS host UNION ALL SELECT 'src5' "
                  "UNION ALL SELECT 'src10'")


@q("g21_spam_mass", f"""
WITH pr_t AS (SELECT * FROM (
{pagerank_oracle_sql(_G1_EDGES_SQL, iters=5, damping=0.85)}
)),
tr_t AS (SELECT * FROM (
{pagerank_oracle_sql(_G1_EDGES_SQL, iters=5, damping=0.85,
                     teleport_cte=_G21_TRUST_CTE)}
)),
j AS (SELECT pr_t.host, pr_t.rank AS pr, tr_t.rank AS tr
      FROM pr_t JOIN tr_t USING (host)),
tot AS (SELECT SUM(pr) AS sp, SUM(tr) AS st FROM j)
SELECT host, pr,
       round(tr * sp / st, 4) AS tr_norm,
       round((pr - tr * sp / st) / pr, 4) AS spam_mass
FROM j, tot
""")
def g21_spam_mass(spark, sf_dir):
    """TrustRank + spam mass (Gyongyi, Garcia-Molina & Pedersen, VLDB
    2004; mass estimation per Gyongyi et al. 2006): rank the g1 host
    graph twice — classic PageRank and trust-seeded personalized
    PageRank (teleport only at the vetted seeds) — scale trust to
    PageRank's total mass, and report each host's spam mass = the
    fraction of its PageRank NOT accounted for by trusted proximity.
    High spam-mass hosts earn their rank from link farms rather than
    the trusted core: THE frontier demotion signal link-spam detection
    feeds a crawler (composes with g1/g11/g12 through
    hostrank_boosts, inverted).

    Scale: two fixed-iteration pagerank_hosts runs over the SAME
    checkpointed degree-weighted edge table (host cardinality, lineage
    cut per round), one host-cardinality join, one 2-scalar total agg
    broadcast back. Float discipline: both rank columns are fixed to 4
    decimals (the g1/g12 gate contract) BEFORE the mass arithmetic, and
    the normalization expression is written in the identical order in
    both engines. Reference parity: spider exposes the raw link graph
    (page_links via lib.rs re-export); rank-based spam triage is derived
    algebra over it."""
    d = _t(spark, sf_dir, "documents")
    dst = F.concat(F.lit("src"),
                   ((F.col("doc_id") * 7 + 3) % 23).cast("string"))
    edges = (d.select(F.col("source").alias("src"), dst.alias("dst"))
             .where(F.col("src") != F.col("dst"))
             .distinct())
    trusted = spark.createDataFrame(
        [("src0",), ("src5",), ("src10",)], "host string")
    pr = (pagerank_hosts(edges, iters=5, damping=0.85)
          .select("host", F.round("rank", 4).alias("pr")))
    tr = (pagerank_hosts(edges, iters=5, damping=0.85, teleport=trusted)
          .select("host", F.round("rank", 4).alias("tr")))
    j = pr.join(tr, "host")
    tot = j.agg(F.sum("pr").alias("sp"), F.sum("tr").alias("st"))
    return (j.crossJoin(F.broadcast(tot))
            .select("host", "pr",
                    F.round(F.col("tr") * F.col("sp") / F.col("st"), 4)
                    .alias("tr_norm"),
                    F.round((F.col("pr")
                             - F.col("tr") * F.col("sp") / F.col("st"))
                            / F.col("pr"), 4).alias("spam_mass")))


@q("ix6_postings_gaps", f"""
WITH tok AS ({_IX_TOK_SQL}),
tf AS (SELECT term, doc_id, COUNT(*) AS tf FROM tok GROUP BY term, doc_id),
g AS (SELECT term,
             doc_id - lag(doc_id, 1, CAST(-1 AS BIGINT))
               OVER (PARTITION BY term ORDER BY doc_id) AS gap
      FROM tf)
SELECT term,
       CAST(COUNT(*) AS BIGINT) AS df,
       CAST(MAX(gap) AS BIGINT) AS max_gap,
       CAST(SUM((length(bin(gap)) + 6) // 7) AS BIGINT) AS varint_bytes,
       CAST(COUNT(*) * 8 AS BIGINT) AS raw_bytes,
       round(CAST(SUM((length(bin(gap)) + 6) // 7) AS DOUBLE)
             / (COUNT(*) * 8), 4) AS ratio
FROM g GROUP BY term
""")
def ix6_postings_gaps(spark, sf_dir):
    """Postings delta-gap + varint compression accounting over the ix1
    index (Manning/Raghavan/Schutze IR ch.5 d-gap layout): per term,
    doc_ids sort, each becomes its gap from the previous (first id
    encodes as doc_id + 1), and LEB128 byte cost ceil(bitlen/7) sums
    against the raw 8-byte layout — the storage-planning pass an index
    build runs before writing compressed posting lists. Dense postings
    (stop words) compress hardest (gap 1 = 1 byte vs 8); rare terms
    barely at all — `ratio` measures it on THIS corpus. Gaps stream
    through a per-term lag window (no posting-list arrays in memory);
    all byte accounting is exact BIGINT algebra. See
    operators/invindex.postings_gap_stats."""
    from crawler_spark.operators.invindex import postings_gap_stats
    return postings_gap_stats(_t(spark, sf_dir, "documents"))


@q("mm10_mime_sniff", """
WITH a AS (SELECT doc_id,
                  regexp_replace(text, '[^\\x20-\\x7E]', '', 'g') AS s
           FROM documents),
p AS (SELECT doc_id,
             unhex((CASE doc_id % 6
                    WHEN 0 THEN '89504E470D0A1A0A'
                    WHEN 1 THEN 'FFD8FFE0'
                    WHEN 2 THEN '474946383961'
                    WHEN 3 THEN '255044462D'
                    WHEN 4 THEN '504B0304'
                    ELSE '' END) || hex(encode(s))) AS payload,
             CASE WHEN doc_id % 5 = 0 THEN '.png'
                  WHEN doc_id % 5 = 1 THEN '.mp4' ELSE '.html' END AS ext
      FROM a),
s AS (SELECT doc_id, ext, hex(payload) AS h,
             CAST(octet_length(payload) AS BIGINT) AS n_bytes
      FROM p)
SELECT doc_id, ext,
       CASE WHEN h LIKE '89504E47%' THEN 'image/png'
            WHEN h LIKE 'FFD8FF%' THEN 'image/jpeg'
            WHEN h LIKE '474946383761%' OR h LIKE '474946383961%'
              THEN 'image/gif'
            WHEN h LIKE '255044462D%' THEN 'application/pdf'
            WHEN h LIKE '504B0304%' THEN 'application/zip'
            ELSE 'text/plain' END AS mime,
       n_bytes,
       CAST(CASE WHEN (ext = '.png') <>
                      (CASE WHEN h LIKE '89504E47%' THEN 'image/png'
                            WHEN h LIKE 'FFD8FF%' THEN 'image/jpeg'
                            WHEN h LIKE '474946383761%'
                              OR h LIKE '474946383961%' THEN 'image/gif'
                            WHEN h LIKE '255044462D%'
                              THEN 'application/pdf'
                            WHEN h LIKE '504B0304%'
                              THEN 'application/zip'
                            ELSE 'text/plain' END = 'image/png')
            THEN 1 ELSE 0 END AS INT) AS ext_mismatch
FROM s
""")
def mm10_mime_sniff(spark, sf_dir):
    """Magic-byte MIME sniffing over binary payloads (file(1) / WHATWG
    sniffing reduced to its prefix table): the crawler-side guard
    against mislabeled Content-Type — the reference trusts the server
    header; real corpora lie, and the asset filter (F8) must act on
    CONTENT, not extension. Payloads are synthesized with real magic
    prefixes (PNG/JPEG/GIF/PDF/ZIP by doc_id%6, one class unmagicked)
    ahead of the document bytes, so the sniff CASE is exercised against
    genuine binary columns; `ext_mismatch` flags URLs whose .png
    extension claim disagrees with the sniffed type — the f11-style
    per-host spoof-rate input.

    Scale: unhex/hex/prefix-compare are map-side codegen over the
    binary column, zero shuffle, zero Python; output is flat
    (doc_id, ext, mime, n_bytes, ext_mismatch). The sniff consumes only
    the first 8 payload bytes — at 100 TB the scan prunes to the binary
    column and the comparison never touches the payload tail."""
    d = _t(spark, sf_dir, "documents")
    s = F.regexp_replace(F.col("text"), r"[^\x20-\x7E]", "")
    magic = (F.when(F.col("doc_id") % 6 == 0, "89504E470D0A1A0A")
             .when(F.col("doc_id") % 6 == 1, "FFD8FFE0")
             .when(F.col("doc_id") % 6 == 2, "474946383961")
             .when(F.col("doc_id") % 6 == 3, "255044462D")
             .when(F.col("doc_id") % 6 == 4, "504B0304")
             .otherwise(""))
    ext = (F.when(F.col("doc_id") % 5 == 0, ".png")
           .when(F.col("doc_id") % 5 == 1, ".mp4")
           .otherwise(".html"))
    p = d.select("doc_id", ext.alias("ext"),
                 F.unhex(F.concat(magic, F.hex(F.encode(s, "UTF-8"))))
                 .alias("payload"))
    h = F.hex(F.col("payload"))
    mime = (F.when(h.startswith("89504E47"), "image/png")
            .when(h.startswith("FFD8FF"), "image/jpeg")
            .when(h.startswith("474946383761")
                  | h.startswith("474946383961"), "image/gif")
            .when(h.startswith("255044462D"), "application/pdf")
            .when(h.startswith("504B0304"), "application/zip")
            .otherwise("text/plain"))
    return (p.select("doc_id", "ext", mime.alias("mime"),
                     F.octet_length("payload").cast("long")
                     .alias("n_bytes"),
                     ((F.col("ext") == ".png")
                      != (mime == "image/png")).cast("int")
                     .alias("ext_mismatch")))


@q("w7_waterfill_budget", """
WITH d AS (SELECT source || '/' || lang AS queue,
                  CAST(count(*) AS BIGINT) AS demand
           FROM documents GROUP BY 1),
r AS (SELECT queue, demand,
             CAST(ROW_NUMBER() OVER (ORDER BY demand, queue) - 1
                  AS BIGINT) AS i,
             CAST(COALESCE(SUM(demand) OVER (ORDER BY demand, queue
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  0) AS BIGINT) AS cum,
             CAST(COUNT(*) OVER () AS BIGINT) AS n
      FROM d),
f AS (SELECT *, demand * (n - i) + cum <= 300 AS isfull FROM r),
s AS (SELECT CAST(SUM(CASE WHEN isfull THEN 1 ELSE 0 END) AS BIGINT)
               AS nfull,
             CAST(COALESCE(SUM(CASE WHEN isfull THEN demand END), 0)
                  AS BIGINT) AS cumfull
      FROM f)
SELECT queue, demand,
       CAST(CASE WHEN isfull THEN demand
            ELSE (300 - cumfull) // greatest(n - nfull, 1)
                 + (CASE WHEN i - nfull <
                         (300 - cumfull) % greatest(n - nfull, 1)
                    THEN 1 ELSE 0 END)
            END AS BIGINT) AS alloc
FROM f, s
""")
def w7_waterfill_budget(spark, sf_dir):
    """Max-min fair fetch-budget allocation (water-filling / progressive
    filling, Bertsekas-Gallager Data Networks 6.5) across politeness
    queues: a global wave budget of 300 fetches splits over the
    (host, lang) queues so small queues are fully served and the Zipf
    head shares the remainder as evenly as integers allow — the F7
    global budget made HOST-FAIR instead of first-come-first-served.
    Composes with w6's Mercator queues (allocation per back-queue) and
    rc4's crawl-delay budgets (demand = due URLs). All BIGINT algebra —
    the fully-served set is provably a prefix of the ascending-demand
    order, so one distributed (rank, prefix-sum) pass + two 1-row
    broadcast rollups decide every allocation. See
    operators/politeness.waterfill_allocations (the global_rank/px3
    two-phase shape: block-local windows + a broadcast <= n_blocks-row
    offset table; no single-task global window)."""
    from crawler_spark.operators.politeness import waterfill_allocations
    d = _t(spark, sf_dir, "documents")
    dem = (d.groupBy(F.concat("source", F.lit("/"), "lang").alias("queue"))
           .agg(F.count(F.lit(1)).cast("long").alias("demand")))
    return waterfill_allocations(dem, budget=300, host="queue",
                                 n_blocks=8)


@q("tx21_readability", """
WITH a AS (SELECT doc_id, lower(trim(text)) AS low FROM documents),
b AS (SELECT doc_id, low,
             list_filter(regexp_split_to_array(low, '\\s+'),
                         x -> x <> '') AS ws
      FROM a),
c AS (SELECT doc_id,
             greatest(len(ws), 1) AS w,
             greatest(len(regexp_extract_all(low, '[.!?]+')), 1) AS s,
             len(regexp_extract_all(low, '[aeiouy]+'))
               + len(list_filter(ws,
                     x -> NOT regexp_matches(x, '[aeiouy]'))) AS syl
      FROM b)
SELECT doc_id,
       CAST(w AS BIGINT) AS n_words,
       CAST(s AS BIGINT) AS n_sentences,
       CAST(syl AS BIGINT) AS n_syllables,
       round(0.39 * w / s + 11.8 * syl / w - 15.59, 4) AS fk_grade
FROM c
""")
def tx21_readability(spark, sf_dir):
    """Flesch-Kincaid grade level (Kincaid et al. 1975) — the classic
    readability quality signal corpus filters and educational-value
    scorers gate on: 0.39*(words/sentences) + 11.8*(syllables/words)
    - 15.59. Syllables use the deterministic vowel-run heuristic
    (count of [aeiouy]+ runs; a vowel-less token still costs 1), so
    both engines share exact integer counts and the ONE float formula
    is written in the identical operation order and rounded to 4.

    Scale: entirely map-side codegen — one let-bound word split feeds
    word/no-vowel counts (Catalyst does no cross-column CSE; the array
    is computed once inside the transform), sentence and vowel runs are
    two regexp_counts over the same lowered text; zero shuffle, zero
    Python, no joins. Composes with tx2's quality score and tx15's
    perplexity buckets as a mixing-weight feature (tx8/tx16)."""
    d = _t(spark, sf_dir, "documents")
    low = F.lower(F.trim("text"))
    words = F.filter(F.split(low, r"\s+"), lambda t: t != "")
    stats = F.element_at(
        F.transform(F.array(words), lambda ws: F.struct(
            F.size(ws).cast("long").alias("w"),
            F.size(F.filter(ws, lambda x: ~x.rlike("[aeiouy]")))
            .cast("long").alias("novowel"))), 1)
    c = d.select(
        "doc_id",
        F.greatest(stats.getField("w"), F.lit(1).cast("long"))
        .alias("w"),
        F.greatest(F.regexp_count(low, F.lit("[.!?]+")).cast("long"),
                   F.lit(1).cast("long")).alias("s"),
        (F.regexp_count(low, F.lit("[aeiouy]+")).cast("long")
         + stats.getField("novowel")).alias("syl"))
    return c.select(
        "doc_id",
        F.col("w").alias("n_words"),
        F.col("s").alias("n_sentences"),
        F.col("syl").alias("n_syllables"),
        F.round(F.lit(0.39) * F.col("w") / F.col("s")
                + F.lit(11.8) * F.col("syl") / F.col("w")
                - F.lit(15.59), 4).alias("fk_grade"))


@q("w8_ip_apportion", """
WITH d AS (SELECT source AS host,
                  'ip' || CAST(CAST(substr(source, 4) AS INT) % 7
                               AS VARCHAR) AS ip,
                  CAST(count(*) AS BIGINT) AS demand
           FROM documents GROUP BY 1, 2),
t AS (SELECT ip, SUM(demand) AS d_ip FROM d GROUP BY 1),
j AS (SELECT d.*, least(40, d_ip) AS b,
             (least(40, d_ip) * demand) // d_ip AS base,
             (least(40, d_ip) * demand) % d_ip AS r
      FROM d JOIN t USING (ip)),
k AS (SELECT *,
             ROW_NUMBER() OVER (PARTITION BY ip
                                ORDER BY r DESC, host) AS rk,
             b - SUM(base) OVER (PARTITION BY ip) AS leftover
      FROM j)
SELECT ip, host, demand,
       CAST(base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END
            AS BIGINT) AS alloc
FROM k
""")
def w8_ip_apportion(spark, sf_dir):
    """IP-granular politeness apportionment (BUbiNG, Boldi et al. 2018:
    rate limits must bind on the shared ADDRESS or virtual-host farms
    multiply per-server pressure by the number of names): hosts map to
    their server IP, each IP's budget is min(cap=40, its total demand),
    and the budget splits back to the IP's hosts by the Hamilton
    largest-remainder method — floor-proportional plus one unit to the
    largest (B*d)%D remainders, host-ascending ties. Exact integer
    algebra end-to-end (true DIV, integer remainder ranks); per-IP
    sums equal the budget by construction. Composes with w7 (fair
    split ACROSS addresses) and rc4/rc6 (per-address rate). See
    operators/politeness.apportion_by_ip."""
    from crawler_spark.operators.politeness import apportion_by_ip
    d = _t(spark, sf_dir, "documents")
    dem = (d.groupBy(
        F.col("source").alias("host"),
        F.concat(F.lit("ip"),
                 (F.substring("source", 4, 10).cast("int") % 7)
                 .cast("string")).alias("ip"))
        .agg(F.count(F.lit(1)).cast("long").alias("demand")))
    return apportion_by_ip(dem, per_ip_cap=40)


@q("mm11_resize_algebra", """
WITH a AS (SELECT doc_id,
                  regexp_replace(text, '[^\\x20-\\x7E]', '', 'g') AS s
           FROM documents),
b AS (SELECT doc_id, s, length(s) AS n0 FROM a WHERE length(s) > 0),
r AS (SELECT doc_id,
             array_to_string(list_transform(range(0, 64),
                             i -> s[((i * n0) // 64) + 1]), '') AS outp
      FROM b)
SELECT doc_id, CAST(8 AS INT) AS width, CAST(8 AS INT) AS height,
       CAST(64 AS BIGINT) AS n_out_bytes, md5(outp) AS out_md5
FROM r
""")
def mm11_resize_algebra(spark, sf_dir):
    """The mm2 resize KERNEL's byte-exact output under the hash gate
    (mm5's trick applied to resampling): the real mapInPandas kernel
    (`resize_images` -> `_fake_resize`, even-strided selection
    out[i] = buf[(i*len)//n]) runs over ASCII-projected payload bytes,
    and the DuckDB twin recomputes the same strided character pick and
    md5 — so the resize semantics, not just the row shape, is
    cross-engine-verified (empty-ASCII payloads are excluded: the
    kernel's zero-fill bytes have no engine-portable string carrier).
    With mm5 (decode chunk algebra) and mm8 (frame-slice algebra) this
    closes the mm family: every codec stand-in's arithmetic is
    oracle-checked; production swaps the kernel body, not the plumbing.

    Scale: same narrow mapInPandas as mm2 (the designed Arrow Python
    island); the gate reduction is one map-side md5."""
    from crawler_spark.operators.multimodal import resize_images
    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.regexp_replace(F.col("text"), r"[^\x20-\x7E]", "")
        .alias("ascii_text"))
    src = (d.where(F.length("ascii_text") > 0)
           .select("doc_id",
                   F.encode("ascii_text", "UTF-8").alias("payload_bin"),
                   F.lit("image").alias("media_type")))
    out = resize_images(src, width=8, height=8)
    return out.select(
        "doc_id", "width", "height",
        F.length("payload_bin").cast("long").alias("n_out_bytes"),
        F.md5(F.encode("payload_bin", "UTF-8")).alias("out_md5"))


@q("g23_assortativity", f"""
WITH e AS ({_G8_EDGES_SQL}),
od AS (SELECT src, CAST(count(*) AS BIGINT) AS od FROM e GROUP BY 1),
id_ AS (SELECT dst, CAST(count(*) AS BIGINT) AS id FROM e GROUP BY 1),
x AS (SELECT od.od AS x, id_.id AS y
      FROM e JOIN od ON e.src = od.src JOIN id_ ON e.dst = id_.dst),
s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * y) AS BIGINT) AS sxy,
             CAST(SUM(x * x) AS BIGINT) AS sxx,
             CAST(SUM(y * y) AS BIGINT) AS syy
      FROM x)
SELECT n, sx, sy, sxy, sxx, syy,
       round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
             / (sqrt(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                * sqrt(CAST(n AS DOUBLE) * syy
                       - CAST(sy AS DOUBLE) * sy)), 4) AS assortativity
FROM s
""")
def g23_assortativity(spark, sf_dir):
    """Degree assortativity of the host graph (Newman, PRL 2002): the
    Pearson correlation between a link's source out-degree and target
    in-degree over all edges. The web is famously DISassortative
    (hubs link to low-degree pages, r < 0) — a corpus whose crawl graph
    turns assortative is usually a link-farm/mirror artifact, so this
    is the one-number companion to g8's degree histogram and the g21
    spam-mass prior. Five exact BIGINT moments (one partial-agged pass
    over degree-joined edges) and ONE float Pearson formula in
    identical operation order, rounded to 4 — the tx19 float
    discipline. See operators/hostrank.assortativity."""
    from crawler_spark.operators.hostrank import assortativity
    d = _t(spark, sf_dir, "documents")
    h = F.substring("source", 4, 10).cast("int")
    dst = F.concat(F.lit("src"),
                   ((F.col("doc_id") * 7 + 3) % (1 + (h % 20)))
                   .cast("string"))
    e = (d.select(F.col("source").alias("src"), dst.alias("dst"))
         .where(F.col("src") != F.col("dst")).distinct())
    return assortativity(e)


@q("tx23_code_detect", """
WITH a AS (SELECT doc_id, text,
                  length(text) AS n_chars,
                  regexp_split_to_array(text, '\\n') AS lines
           FROM documents),
b AS (SELECT doc_id,
             CAST(len(lines) AS BIGINT) AS n_lines,
             CAST(length(text)
                  - length(regexp_replace(text, '[{}\\[\\]();=<>]', '',
                                          'g')) AS BIGINT) AS sym_chars,
             CAST(greatest(n_chars, 1) AS BIGINT) AS n_chars,
             CAST(len(regexp_extract_all(lower(text),
                  '\\b(def|return|import|function|class|void|struct'
                  '|const|elif|lambda)\\b')) AS BIGINT) AS kw_hits,
             CAST(len(list_filter(lines,
                  l -> regexp_matches(l, '^(\\t|  )'))) AS BIGINT)
               AS indent_lines,
             CAST(len(list_filter(lines,
                  l -> regexp_matches(l, ';\\s*$'))) AS BIGINT)
               AS semi_lines
      FROM a),
c AS (SELECT *,
             (CASE WHEN sym_chars * 100 > n_chars * 3 THEN 2 ELSE 0 END
              + CASE WHEN semi_lines * 10 > n_lines THEN 1 ELSE 0 END
              + CASE WHEN indent_lines * 5 > n_lines THEN 1 ELSE 0 END
              + CASE WHEN kw_hits >= 2 THEN 1 ELSE 0 END) AS code_score
      FROM b)
SELECT doc_id, n_lines, sym_chars, kw_hits, indent_lines, semi_lines,
       CAST(code_score AS INT) AS code_score,
       CAST(CASE WHEN code_score >= 2 THEN 1 ELSE 0 END AS INT) AS is_code
FROM c
""")
def tx23_code_detect(spark, sf_dir):
    """Code-vs-prose detection — the pretraining-mix routing signal
    (StarCoder/DCLM pipelines split code into its own mixture bucket;
    prose filters like tx2/px1 MUST NOT see code or they reject it):
    four deterministic structural signals — code-symbol density
    ({}[]();=<>), end-of-line semicolons, leading indentation, reserved
    keywords — vote into an integer score (symbol density counts
    double); is_code at score >= 2. All ratio comparisons are written
    as integer cross-multiplications (sym*100 > chars*3), so the gate
    is BIGINT-exact cross-engine with no float thresholds at all.

    Scale: one regexp_replace + two line filters + one keyword count
    per row, all map-side codegen over a single line-split (let-bound
    array — NOTES fact #1); zero shuffle, zero joins, zero Python."""
    d = _t(spark, sf_dir, "documents")
    lines = F.split("text", "\n")
    stats = F.element_at(
        F.transform(F.array(lines), lambda ls: F.struct(
            F.size(ls).cast("long").alias("n_lines"),
            F.size(F.filter(ls, lambda l: l.rlike(r"^(\t|  )")))
            .cast("long").alias("indent"),
            F.size(F.filter(ls, lambda l: l.rlike(r";\s*$")))
            .cast("long").alias("semi"))), 1)
    sym = (F.length("text")
           - F.length(F.regexp_replace("text", r"[{}\[\]();=<>]", ""))
           ).cast("long")
    kw = F.regexp_count(
        F.lower("text"),
        F.lit(r"\b(def|return|import|function|class|void|struct"
              r"|const|elif|lambda)\b")).cast("long")
    b = d.select(
        "doc_id", stats.getField("n_lines").alias("n_lines"),
        sym.alias("sym_chars"),
        F.greatest(F.length("text").cast("long"), F.lit(1).cast("long"))
        .alias("n_chars"),
        kw.alias("kw_hits"),
        stats.getField("indent").alias("indent_lines"),
        stats.getField("semi").alias("semi_lines"))
    score = (F.when(F.col("sym_chars") * 100 > F.col("n_chars") * 3, 2)
             .otherwise(0)
             + F.when(F.col("semi_lines") * 10 > F.col("n_lines"), 1)
             .otherwise(0)
             + F.when(F.col("indent_lines") * 5 > F.col("n_lines"), 1)
             .otherwise(0)
             + F.when(F.col("kw_hits") >= 2, 1).otherwise(0))
    return (b.withColumn("code_score", score.cast("int"))
            .select("doc_id", "n_lines", "sym_chars", "kw_hits",
                    "indent_lines", "semi_lines", "code_score",
                    F.when(F.col("code_score") >= 2, 1).otherwise(0)
                    .cast("int").alias("is_code")))


@q("px11_length_buckets", """
WITH t AS (SELECT doc_id,
                  least(len(list_filter(regexp_split_to_array(
                        trim(text), '\\s+'), x -> x <> '')), 512) AS nt
           FROM documents),
b AS (SELECT doc_id, nt,
             CASE WHEN nt < 64 THEN 'b0' WHEN nt < 128 THEN 'b1'
                  WHEN nt < 256 THEN 'b2' ELSE 'b3' END AS bucket
      FROM t),
c AS (SELECT *, COALESCE(SUM(nt) OVER (PARTITION BY bucket
             ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             AS prev
      FROM b),
p AS (SELECT bucket, nt, prev // 512 AS seq_id FROM c)
SELECT bucket,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(MAX(seq_id) + 1 AS BIGINT) AS n_seqs,
       CAST(SUM(nt) AS BIGINT) AS n_tokens,
       CAST((MAX(seq_id) + 1) * 512 - SUM(nt) AS BIGINT) AS n_pad,
       round(CAST((MAX(seq_id) + 1) * 512 - SUM(nt) AS DOUBLE)
             / ((MAX(seq_id) + 1) * 512), 4) AS pad_ratio
FROM p GROUP BY bucket
""")
def px11_length_buckets(spark, sf_dir):
    """Length-bucketed sequence packing — the dynamic-batching layout
    data loaders use to cut padding waste (pad-to-longest batches
    similar-length docs together; mixing a 20-token doc into a
    512-token batch wastes 96% of its rows): docs route to fixed
    length buckets (<64, <128, <256, rest; capped at the 512 max
    sequence length, the truncation a loader applies), each bucket
    packs independently through px3's DISTRIBUTED two-phase prefix
    sum, and the rollup reports per-bucket padding waste — the number
    that justifies the bucket boundaries. Bucket routing is map-side;
    packing per bucket reuses pack_sequences (block windows +
    broadcast offsets, no single-task global window); the rollup is
    one partial-agged groupBy(bucket)."""
    from crawler_spark.operators.sampling import pack_sequences
    d = _t(spark, sf_dir, "documents")
    nt = F.least(
        F.size(F.filter(F.split(F.trim("text"), r"\s+"),
                        lambda x: x != "")).cast("long"),
        F.lit(512).cast("long"))
    t = d.select("doc_id", nt.alias("n_tokens"))
    t = t.withColumn(
        "bucket",
        F.when(F.col("n_tokens") < 64, "b0")
         .when(F.col("n_tokens") < 128, "b1")
         .when(F.col("n_tokens") < 256, "b2").otherwise("b3"))
    parts = []
    for bk in ("b0", "b1", "b2", "b3"):
        sub = t.where(F.col("bucket") == bk).select("doc_id", "n_tokens")
        parts.append(
            pack_sequences(sub, "n_tokens", order_col="doc_id",
                           budget=512, n_blocks=4)
            .withColumn("bucket", F.lit(bk)))
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    return (u.groupBy("bucket")
            .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
                 (F.max("seq_id") + 1).cast("long").alias("n_seqs"),
                 F.sum("n_tokens").cast("long").alias("n_tokens"),
                 ((F.max("seq_id") + 1) * 512
                  - F.sum("n_tokens")).cast("long").alias("n_pad"),
                 F.round(((F.max("seq_id") + 1) * 512
                          - F.sum("n_tokens")).cast("double")
                         / ((F.max("seq_id") + 1) * 512), 4)
                 .alias("pad_ratio")))


_AN9_MS = (8, 16, 32)


def _an9_block(m: int) -> str:
    vec = f"e.embedding[1:{m}]::DOUBLE[]" if m else "e.embedding::DOUBLE[]"
    qv = f"q.embedding[1:{m}]::DOUBLE[]" if m else "q.embedding::DOUBLE[]"
    tag = f"t{m}" if m else "fd"
    return f"""{tag}0 AS (
  SELECT q.vec_id AS qid, e.vec_id,
         round(list_cosine_similarity({vec}, {qv}), 4) AS cosine
  FROM embeddings e, (SELECT * FROM embeddings
                      WHERE vec_id IN (0, 1, 2)) q
  WHERE e.vec_id <> q.vec_id),
{tag} AS (SELECT qid, vec_id FROM (
  SELECT *, row_number() OVER (PARTITION BY qid
                               ORDER BY cosine DESC, vec_id) AS rnk
  FROM {tag}0) WHERE rnk <= 10)"""


@q("an9_mrl_recall", "WITH " + ",\n".join(
    [_an9_block(0)] + [_an9_block(m) for m in _AN9_MS]) + "\n"
    + "\nUNION ALL\n".join(f"""
SELECT f.qid, CAST({m} AS BIGINT) AS m, CAST(count(*) AS BIGINT) AS k,
       CAST(sum(CASE WHEN t.vec_id IS NOT NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_hit,
       round(sum(CASE WHEN t.vec_id IS NOT NULL THEN 1 ELSE 0 END) * 1.0
             / count(*), 4) AS recall
FROM fd f LEFT JOIN t{m} t USING (qid, vec_id) GROUP BY f.qid
""" for m in _AN9_MS))
def an9_mrl_recall(spark, sf_dir):
    """Matryoshka-truncation recall (Kusupati et al., NeurIPS 2022 —
    MRL; the eval behind every 'truncatable' embedding API): recall@10
    of brute-force search in the FIRST-m-dims subspace (m = 8/16/32 of
    64) against full-dimension search, per query. The storage/latency
    planning number for an embedding corpus: how many dims the ANN
    index (an2/an7) can drop before recall degrades. Both sides reuse
    an1's broadcast-query brute-force plan (the corpus never joins
    itself); truncation is a map-side slice. Float discipline is the
    an1/an5 contract: cosine rounded to 4, rank ties broken by
    vec_id."""
    from crawler_spark.operators.similarity import brute_force_topk
    e = _t(spark, sf_dir, "embeddings")
    qs = e.where(F.col("vec_id").isin(0, 1, 2))
    truth = brute_force_topk(e, qs, k=10).select("qid", "vec_id")
    parts = []
    for m in _AN9_MS:
        te = e.select("vec_id", F.slice("embedding", 1, m)
                      .alias("embedding"))
        tq = qs.select("vec_id", F.slice("embedding", 1, m)
                       .alias("embedding"))
        tr = (brute_force_topk(te, tq, k=10)
              .select("qid", "vec_id", F.lit(1).alias("hit")))
        parts.append(
            truth.join(tr, ["qid", "vec_id"], "left")
            .groupBy("qid")
            .agg(F.count(F.lit(1)).cast("long").alias("k"),
                 F.coalesce(F.sum("hit"), F.lit(0)).cast("long")
                 .alias("n_hit"),
                 F.round(F.coalesce(F.sum("hit"), F.lit(0))
                         / F.count(F.lit(1)), 4).alias("recall"))
            .select("qid", F.lit(m).cast("long").alias("m"),
                    "k", "n_hit", "recall"))
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    return u


@q("wc5_wat_metadata", f"""
WITH s AS ({_SPAN_SQL}),
m AS (
  SELECT doc_id,
         'https://corpus.example/doc/' || CAST(doc_id AS VARCHAR) AS uri,
         CAST(len(list_filter(spans, x -> x.kind = 'media')) AS BIGINT)
           AS n_media,
         CAST(len(spans) AS BIGINT) AS n_spans,
         COALESCE(list_sum(list_transform(spans, x ->
             CASE WHEN x.kind = 'text' AND trim(x.text) <> ''
                  THEN len(regexp_split_to_array(trim(x.text), '\\s+'))
                  ELSE 0 END)), 0)::BIGINT AS n_words
  FROM s),
p AS (SELECT doc_id,
             '{{"uri":"' || uri || '","media":' || n_media
               || ',"spans":' || n_spans || ',"words":' || n_words
               || '}}' AS payload
      FROM m)
SELECT doc_id,
       CAST(octet_length(encode(payload)) AS BIGINT) AS n_bytes,
       md5(payload) AS payload_md5
FROM p
""")
def wc5_wat_metadata(spark, sf_dir):
    """WAT production path (Common Crawl's metadata records — the
    third of the WARC/WET/WAT triad, all three now rendered by
    sources/warc.py): per capture, a deterministic JSON envelope
    describing the interleaved span content (media count, span count,
    text word count), framed as WARC/1.0 `metadata` records with
    WARC-Refers-To the response id, written into 20 WAT files and
    re-parsed with the Content-Length splitter — the re-extracted
    payload must md5-match the JSON the oracle recomputes straight
    from the span algebra (it never sees WARC). The JSON is built by
    explicit concatenation, NOT to_json, so both engines produce the
    identical byte string. Map-side render; the only shuffle is the
    20-file groupBy."""
    from crawler_spark.sources.warc import (
        parse_warc, warc_file_blobs, warc_metadata_record_col,
    )
    s = _spans_df(spark, sf_dir)
    uri = F.concat(F.lit("https://corpus.example/doc/"),
                   F.col("doc_id").cast("string"))
    n_media = F.size(F.filter("spans", lambda x: x.kind == "media"))
    n_spans = F.size("spans")
    n_words = F.aggregate(
        F.transform("spans", lambda x: F.when(
            (x.kind == "text") & (F.trim(x.text) != ""),
            F.size(F.split(F.trim(x.text), r"\s+")))
            .otherwise(F.lit(0)).cast("long")),
        F.lit(0).cast("long"), lambda a, v: a + v)
    payload = F.concat(
        F.lit('{"uri":"'), uri, F.lit('","media":'),
        n_media.cast("string"), F.lit(',"spans":'),
        n_spans.cast("string"), F.lit(',"words":'),
        n_words.cast("string"), F.lit("}"))
    files = warc_file_blobs(
        s.withColumn("file_id", (F.col("doc_id") % 20).cast("long")),
        "file_id", "doc_id", warc_metadata_record_col(uri, payload))
    parsed = parse_warc(files, "blob")
    return parsed.select(
        F.regexp_extract("target_uri", r"/doc/(\d+)$", 1).cast("long")
         .alias("doc_id"),
        F.col("n_bytes"),
        F.md5("payload").alias("payload_md5"))


_IX7_TERMS = ("vector", "window", "merge")
_IX7_MU = 2000.0


@q("ix7_lm_ranking", f"""
WITH tok AS ({_IX_TOK_SQL}),
cs AS (SELECT CAST(COUNT(*) AS BIGINT) AS c FROM tok),
ctf AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS ctf FROM tok
        WHERE term IN ('vector', 'window', 'merge') GROUP BY 1),
dl AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl FROM tok GROUP BY 1),
tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf FROM tok
       WHERE term IN ('vector', 'window', 'merge') GROUP BY 1, 2),
hit AS (SELECT doc_id,
        SUM(CASE WHEN term = 'vector' THEN tf ELSE 0 END) AS tf0,
        SUM(CASE WHEN term = 'window' THEN tf ELSE 0 END) AS tf1,
        SUM(CASE WHEN term = 'merge' THEN tf ELSE 0 END) AS tf2
        FROM tf GROUP BY doc_id),
j AS (SELECT h.doc_id, tf0, tf1, tf2, dl.dl,
             (SELECT ctf FROM ctf WHERE term = 'vector') AS ctf0,
             (SELECT ctf FROM ctf WHERE term = 'window') AS ctf1,
             (SELECT ctf FROM ctf WHERE term = 'merge') AS ctf2,
             (SELECT c FROM cs) AS c
      FROM hit h JOIN dl ON dl.doc_id = h.doc_id)
SELECT doc_id,
       CAST((CASE WHEN tf0 > 0 THEN 1 ELSE 0 END)
            + (CASE WHEN tf1 > 0 THEN 1 ELSE 0 END)
            + (CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS INT) AS n_hit,
       round(ln((tf0 + {_IX7_MU} * ctf0 / c) / (dl + {_IX7_MU}))
             + ln((tf1 + {_IX7_MU} * ctf1 / c) / (dl + {_IX7_MU}))
             + ln((tf2 + {_IX7_MU} * ctf2 / c) / (dl + {_IX7_MU})), 4)
         AS lm_score
FROM j
""")
def ix7_lm_ranking(spark, sf_dir):
    """Query-likelihood ranking with Dirichlet smoothing (Ponte & Croft
    1998; Zhai & Lafferty, SIGIR 2001 — the language-model alternative
    to tx11's BM25, and the stronger model at short-query retrieval):
    score(d) = sum over query terms of ln((tf + mu*ctf/C)/(|d| + mu)),
    mu = 2000. Missing terms contribute their smoothed (doc-length-
    dependent) mass — the part naive implementations drop and the
    reason this needs per-doc tf pivots, not just hit rows.

    Float discipline: the per-term logs sum in a FIXED textual order
    (t0 + t1 + t2 written out, never an aggregate over rows), so
    cross-engine agreement needs only IEEE ops + one round(4) — no
    sum-order hazard at all. Scale shape: corpus filtered to the query
    terms before any shuffle; ctf/C are broadcast scalars; the doc-
    length table joins at hit-doc cardinality."""
    d = _t(spark, sf_dir, "documents")
    from crawler_spark.operators.invindex import tokens_col
    tok = d.select("doc_id",
                   F.explode(tokens_col(F.col("text"))).alias("term"))
    cs = tok.agg(F.count(F.lit(1)).cast("long").alias("c"))
    qt = tok.where(F.col("term").isin(list(_IX7_TERMS)))
    ctf = qt.groupBy("term").agg(F.count(F.lit(1)).cast("long")
                                 .alias("ctf"))
    ctfs = ctf.groupBy().pivot("term", list(_IX7_TERMS)).sum("ctf") \
        .select(*[F.col(t).alias(f"ctf{i}")
                  for i, t in enumerate(_IX7_TERMS)])
    dl = tok.groupBy("doc_id").agg(F.count(F.lit(1)).cast("long")
                                   .alias("dl"))
    hit = (qt.groupBy("doc_id", "term")
           .agg(F.count(F.lit(1)).cast("long").alias("tf"))
           .groupBy("doc_id")
           .agg(*[F.sum(F.when(F.col("term") == t, F.col("tf"))
                        .otherwise(0)).cast("long").alias(f"tf{i}")
                  for i, t in enumerate(_IX7_TERMS)]))
    j = (hit.join(dl, "doc_id")
         .crossJoin(F.broadcast(ctfs))
         .crossJoin(F.broadcast(cs)))
    mu = F.lit(_IX7_MU)

    def term_log(i):
        return F.log((F.col(f"tf{i}") + mu * F.col(f"ctf{i}")
                      / F.col("c")) / (F.col("dl") + mu))

    n_hit = sum(F.when(F.col(f"tf{i}") > 0, 1).otherwise(0)
                for i in range(3))
    return j.select(
        "doc_id", n_hit.cast("int").alias("n_hit"),
        F.round(term_log(0) + term_log(1) + term_log(2), 4)
        .alias("lm_score"))


@q("mm12_span_audit", f"""
WITH s0 AS ({_SPAN_SQL}),
s AS (SELECT doc_id,
             CASE WHEN doc_id % 7 = 0 THEN
               list_transform(s0.spans, x -> struct_pack(
                 kind := x.kind, text := x.text,
                 media_ref := CASE WHEN doc_id % 14 = 0
                                    AND x.kind = 'media' THEN ''
                              ELSE x.media_ref END,
                 "offset" := (x."offset" % 20)::INT))
             ELSE s0.spans END AS spans
      FROM s0)
SELECT doc_id,
       CAST(len(spans) AS BIGINT) AS n_spans,
       CAST(len(list_filter(range(2, len(spans) + 1),
            i -> spans[i]."offset" <= spans[i-1]."offset")) AS BIGINT)
         AS off_viol,
       CAST(len(list_filter(spans, x -> x.kind = 'media'
            AND x.media_ref = '')) AS BIGINT) AS bad_media,
       CAST(len(list_filter(spans, x -> x.kind = 'text'
            AND trim(x.text) = '')) AS BIGINT) AS empty_text,
       CAST(CASE WHEN len(list_filter(range(2, len(spans) + 1),
                 i -> spans[i]."offset" <= spans[i-1]."offset")) = 0
             AND len(list_filter(spans, x -> x.kind = 'media'
                 AND x.media_ref = '')) = 0
             AND len(list_filter(spans, x -> x.kind = 'text'
                 AND trim(x.text) = '')) = 0
            THEN 1 ELSE 0 END AS INT) AS valid
FROM s
""")
def mm12_span_audit(spark, sf_dir):
    """Interleaved-span integrity audit — the validation pass a
    multimodal training pipeline runs before packing (px2/mm4/px10 all
    ASSUME monotone offsets, non-empty media refs and non-empty text
    spans; a violation silently corrupts sequence assembly): per doc,
    count offset-order violations (adjacent non-increasing), media
    spans with empty refs, and empty text spans, plus a single `valid`
    gate bit. Deterministic corruption is INJECTED for doc_id % 7 == 0
    (offsets wrapped mod 20; % 14 additionally blanks media refs) in
    BOTH engines, so the auditor's detection logic — not just the
    happy path — sits under the hash gate.

    Scale: the whole audit is per-row HOF algebra over the span array
    (adjacent-pair check via an index-range filter, no posexplode) —
    zero shuffle, zero joins, zero Python."""
    s0 = _spans_df(spark, sf_dir)
    corrupt = F.transform("spans", lambda x: F.struct(
        x.kind.alias("kind"), x.text.alias("text"),
        F.when((F.col("doc_id") % 14 == 0) & (x.kind == "media"),
               F.lit("")).otherwise(x.media_ref).alias("media_ref"),
        (x.offset % 20).cast("int").alias("offset")))
    s = s0.select(
        "doc_id",
        F.when(F.col("doc_id") % 7 == 0, corrupt)
         .otherwise(F.col("spans")).alias("spans"))
    sp = F.col("spans")
    off_viol = F.when(F.size(sp) < 2, F.lit(0).cast("long")).otherwise(
        F.size(F.filter(
            F.sequence(F.lit(2), F.size(sp)),
            lambda i: F.element_at(sp, i).getField("offset")
            <= F.element_at(sp, i - 1).getField("offset"))).cast("long"))
    bad_media = F.size(F.filter(
        sp, lambda x: (x.kind == "media") & (x.media_ref == ""))
    ).cast("long")
    empty_text = F.size(F.filter(
        sp, lambda x: (x.kind == "text") & (F.trim(x.text) == ""))
    ).cast("long")
    return s.select(
        "doc_id", F.size(sp).cast("long").alias("n_spans"),
        off_viol.alias("off_viol"), bad_media.alias("bad_media"),
        empty_text.alias("empty_text"),
        ((off_viol == 0) & (bad_media == 0) & (empty_text == 0))
        .cast("int").alias("valid"))


from crawler_spark.operators.hostrank import (  # noqa: E402
    clustering_oracle_sql, mirror_oracle_sql,
)


@q("g26_clustering_coeff", clustering_oracle_sql(_G7_EDGES_SQL))
def g26_clustering_coeff(spark, sf_dir):
    """Per-host local clustering coefficient (Watts-Strogatz) over the g7
    host-graph fixture — the per-node cohesion score that turns g7's raw
    triangle counts into the bounded [0,1] link-farm signal: high
    clustering at non-trivial degree marks a mirror-ring/spam cluster,
    near-zero marks a navigational hub. Triangles come from the
    degree-ordered wedge join (O(sqrt(m)) per-key fan-out); degrees and
    the final left join are host-cardinality broadcasts; ONE double
    formula rounded to 4 on both engines. See
    operators/hostrank.clustering_coefficients."""
    from crawler_spark.operators.hostrank import clustering_coefficients
    d = _t(spark, sf_dir, "documents")
    hosts = d.select(F.col("source").alias("src"),
                     F.substring("source", 4, 10).cast("int").alias("h")) \
             .distinct()

    def to_dst(e):
        return F.concat(F.lit("src"), e.cast("string"))

    edges = (hosts.select("src", to_dst((F.col("h") + 1) % 40).alias("dst"))
             .unionAll(hosts.select(
                 "src", to_dst((F.col("h") + 2) % 40).alias("dst")))
             .unionAll(hosts.select(
                 "src", to_dst((F.col("h") * 7 + 3) % 23).alias("dst"))))
    return clustering_coefficients(edges)


_G24_EDGES_SQL = """
SELECT 'src' || CAST(h AS VARCHAR) AS src,
       'src' || CAST(t AS VARCHAR) AS dst
FROM (SELECT DISTINCT CAST(substr(source, 4) AS INT) AS h FROM documents)
     hosts,
     LATERAL (SELECT unnest(CASE WHEN h % 10 >= 5 THEN
                [(3 * (h % 10) + 1) % 20, (5 * (h % 10) + 2) % 20,
                 (7 * (h % 10) + 3) % 20, (11 * h + 5) % 20]
              ELSE
                [(3 * (h % 10) + 1) % 20, (5 * (h % 10) + 2) % 20,
                 (7 * (h % 10) + 3) % 20] END) AS t) targets
"""


@q("g24_mirror_hosts", mirror_oracle_sql(_G24_EDGES_SQL))
def g24_mirror_hosts(spark, sf_dir):
    """Mirror-host detection (Bharat & Broder, WWW 1999): host pairs
    whose outlink host-sets are near-identical — the pre-fetch
    crawl-budget signal the per-domain reference scanner cannot compute.
    Fixture: host h's outlinks depend only on g = h % 10 (hosts h and
    h+10 are deliberate mirrors), with one h-specific extra target for
    g >= 5 (partial mirrors) and self-loop removal making a few pairs
    asymmetric — so the output exercises jaccard 1.0 exact mirrors,
    ~0.5-0.6 partials, and the containment asymmetry. Candidates from a
    df-capped shared-outlink index, verified exactly against the full
    collect_set arrays (the dd4 guard shape). See
    operators/hostrank.mirror_hosts."""
    from crawler_spark.operators.hostrank import mirror_hosts
    d = _t(spark, sf_dir, "documents")
    hosts = d.select(F.substring("source", 4, 10).cast("int").alias("h")) \
             .distinct()
    g = F.col("h") % 10
    base = F.array((g * 3 + 1) % 20, (g * 5 + 2) % 20, (g * 7 + 3) % 20)
    targets = F.when(g >= 5,
                     F.concat(base, F.array((F.col("h") * 11 + 5) % 20))) \
               .otherwise(base)
    edges = (hosts.select(
        F.concat(F.lit("src"), F.col("h").cast("string")).alias("src"),
        F.explode(targets).alias("t"))
        .select("src", F.concat(F.lit("src"),
                                F.col("t").cast("string")).alias("dst")))
    return mirror_hosts(edges)


from crawler_spark.functions.text import (  # noqa: E402
    tfidf_keywords, tfidf_keywords_oracle_sql,
)


@q("tx24_tfidf_keywords", tfidf_keywords_oracle_sql(k=5, min_len=3))
def tx24_tfidf_keywords(spark, sf_dir):
    """Per-document top-5 keywords by TF-IDF — the compact topic
    descriptor for cluster labeling and eval-neighborhood audits.
    tf is one explode + partial-agged groupBy; df joins back broadcast
    (vocab << corpus); ranking runs on the ROUNDED score with the term
    as tiebreak (the an5 float-ranking discipline); the top-k window
    partitions by doc_id — no global sort. See
    functions/text.tfidf_keywords."""
    d = _t(spark, sf_dir, "documents")
    return tfidf_keywords(d, F.col("text"), k=5, min_len=3)


@q("tx26_script_detect", """
WITH a AS (SELECT doc_id,
                  text || repeat('я', CAST(doc_id % 7 AS INT))
                       || repeat('中', CAST(doc_id % 5 AS INT))
                       || repeat('ع', CAST(doc_id % 3 AS INT)) AS t
           FROM documents),
c AS (SELECT doc_id,
             CAST(length(t) - length(regexp_replace(t,
                  '[A-Za-z]', '', 'g')) AS BIGINT) AS n_latin,
             CAST(length(t) - length(regexp_replace(t,
                  '[\\x{0400}-\\x{04FF}]', '', 'g')) AS BIGINT)
               AS n_cyrillic,
             CAST(length(t) - length(regexp_replace(t,
                  '[\\x{4E00}-\\x{9FFF}]', '', 'g')) AS BIGINT) AS n_cjk,
             CAST(length(t) - length(regexp_replace(t,
                  '[\\x{0600}-\\x{06FF}]', '', 'g')) AS BIGINT)
               AS n_arabic
      FROM a)
SELECT doc_id, n_latin, n_cyrillic, n_cjk, n_arabic,
       CASE WHEN greatest(n_latin, n_cyrillic, n_cjk, n_arabic) = 0
              THEN 'none'
            WHEN n_latin = greatest(n_latin, n_cyrillic, n_cjk, n_arabic)
              THEN 'latin'
            WHEN n_cyrillic = greatest(n_latin, n_cyrillic, n_cjk,
                                       n_arabic) THEN 'cyrillic'
            WHEN n_cjk = greatest(n_latin, n_cyrillic, n_cjk, n_arabic)
              THEN 'cjk'
            ELSE 'arabic' END AS main_script
FROM c
""")
def tx26_script_detect(spark, sf_dir):
    """Unicode-script composition + dominant script per document — the
    writing-system router in front of language ID (tx1's marker words
    only exist in Latin script) and a homoglyph-spam signal when scripts
    mix. The ASCII fixture text is salted with deterministic Cyrillic/
    CJK/Arabic runs keyed on doc_id so all four blocks and the 'none'
    tiebreak precedence are exercised. Counts are strip-and-subtract
    integer algebra (no floats anywhere); one map-side pass, zero
    shuffle, zero Python. See functions/text.script_mix_cols."""
    from crawler_spark.functions.text import script_mix_cols
    d = _t(spark, sf_dir, "documents")
    aug = F.concat(
        F.col("text"),
        F.expr("repeat('я', CAST(doc_id % 7 AS INT))"),
        F.expr("repeat('中', CAST(doc_id % 5 AS INT))"),
        F.expr("repeat('ع', CAST(doc_id % 3 AS INT))"))
    return d.withColumn("_m", script_mix_cols(aug)).select(
        "doc_id",
        F.col("_m.n_latin").alias("n_latin"),
        F.col("_m.n_cyrillic").alias("n_cyrillic"),
        F.col("_m.n_cjk").alias("n_cjk"),
        F.col("_m.n_arabic").alias("n_arabic"),
        F.col("_m.main_script").alias("main_script"))


_PX12_COIN = ("('0x' || substr(md5('{p}/' || CAST(doc_id AS VARCHAR)), "
              "1, 8))::BIGINT")


@q("px12_fim_transform", f"""
WITH a AS (SELECT doc_id, text, length(text) AS n,
                  {_PX12_COIN.format(p='fim')} AS gate,
                  {_PX12_COIN.format(p='fimc1')} AS c1c,
                  {_PX12_COIN.format(p='fimc2')} AS c2c,
                  {_PX12_COIN.format(p='fimspm')} AS spmc
           FROM documents),
b AS (SELECT *, (n >= 16 AND gate < 2147483648) AS is_fim FROM a),
c AS (SELECT *, CASE WHEN is_fim THEN c1c % (n + 1) ELSE 0 END AS c1
      FROM b),
d AS (SELECT *, CASE WHEN is_fim THEN c1 + c2c % (n - c1 + 1)
                     ELSE 0 END AS c2 FROM c),
e AS (SELECT *, substr(text, 1, CAST(c1 AS INT)) AS pre,
             substr(text, CAST(c1 + 1 AS INT), CAST(c2 - c1 AS INT))
               AS mid,
             substr(text, CAST(c2 + 1 AS INT), CAST(n - c2 AS INT))
               AS suf,
             CASE WHEN NOT is_fim THEN 'ar'
                  WHEN spmc % 2 = 0 THEN 'psm' ELSE 'spm' END AS mode
      FROM d)
SELECT doc_id, mode, CAST(n AS BIGINT) AS n_chars,
       CAST(c1 AS BIGINT) AS c1, CAST(c2 AS BIGINT) AS c2,
       CAST(length(pre) AS BIGINT) AS len_prefix,
       CAST(length(mid) AS BIGINT) AS len_middle,
       CAST(length(suf) AS BIGINT) AS len_suffix,
       md5(CASE WHEN mode = 'ar' THEN text
                WHEN mode = 'psm' THEN '<PRE>' || pre || '<SUF>' || suf
                                       || '<MID>' || mid
                ELSE '<PRE>' || '<SUF>' || suf || '<MID>' || pre || mid
           END) AS out_md5
FROM e
""")
def px12_fim_transform(spark, sf_dir):
    """Fill-in-the-middle training transform (Bavarian et al. 2022):
    50% of documents (content-stable md5 gate) are cut at two
    coin-derived points and re-serialized PSM or SPM with sentinel
    markers; the rest stay autoregressive. All coins are integerized
    md5 (the px5/tx9 discipline) so the SAME documents transform
    identically under any partitioning/engine — the auditability a
    mid-training FIM-rate change needs. Map-side string algebra, zero
    shuffle; the gate carries segment lengths + transformed-text md5.
    See operators/sampling.fim_transform."""
    from crawler_spark.operators.sampling import fim_transform
    d = _t(spark, sf_dir, "documents")
    return fim_transform(d, "text", "doc_id", fim_rate_pct=50,
                         min_chars=16)


@q("st10_scd2_intervals", """
WITH c AS (SELECT user_id, event_type, ts, event_id,
                  lag(event_type) OVER (PARTITION BY user_id
                      ORDER BY ts, event_id) AS prev
           FROM events),
ch AS (SELECT user_id, event_type, ts, event_id FROM c
       WHERE prev IS NULL OR prev <> event_type)
SELECT user_id, event_type AS status,
       CAST(floor(epoch(ts)) AS BIGINT) AS valid_from_s,
       CAST(coalesce(floor(epoch(lead(ts) OVER w)), -1) AS BIGINT)
         AS valid_to_s,
       CAST(row_number() OVER w AS INT) AS version,
       CAST(CASE WHEN lead(ts) OVER w IS NULL THEN 1 ELSE 0 END AS INT)
         AS is_current
FROM ch WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
""")
def st10_scd2_intervals(spark, sf_dir):
    """SCD type-2 history of each user's event-type stream — the
    changelog-to-intervals materialization behind AS-OF metadata joins
    (j6 consumes tables of exactly this shape) and Structured
    Streaming's foreachBatch upsert sinks. Only transitions create
    versions (runs of the same value are absorbed); the open version
    carries valid_to = -1 sentinel (the st5 null-vs-hash lesson) and
    is_current = 1. One shuffle on user_id; both windows share the
    Exchange+Sort. See operators/joins.scd2_intervals."""
    from crawler_spark.operators.joins import scd2_intervals
    e = _t(spark, sf_dir, "events")
    out = scd2_intervals(e, "user_id", "event_type", "ts", "event_id")
    return out.select(
        "user_id", F.col("event_type").alias("status"),
        F.unix_timestamp("valid_from").cast("long").alias("valid_from_s"),
        F.coalesce(F.unix_timestamp("valid_to"), F.lit(-1)).cast("long")
         .alias("valid_to_s"),
        "version", "is_current")


from crawler_spark.operators.invindex import proximity_oracle_sql  # noqa: E402
from crawler_spark.operators.hostrank import simrank_oracle_sql  # noqa: E402

_IX9_TERMS = ["spark", "table", "query"]


@q("ix9_proximity_rank", proximity_oracle_sql(_IX9_TERMS))
def ix9_proximity_rank(spark, sf_dir):
    """Minimal-cover proximity scoring (Tao & Zhai, SIGIR 2007) for a
    3-term query: the smallest token window covering all terms, per
    matching document — the ranking dimension tf-based ix2/tx11 can't
    see. One posexplode + |q| running-max windows sharing a single
    per-doc sort; only matched postings ever shuffle. See
    operators/invindex.proximity_rank."""
    from crawler_spark.operators.invindex import proximity_rank
    return proximity_rank(_t(spark, sf_dir, "documents"), _IX9_TERMS)


@q("g25_simrank", simrank_oracle_sql(_G8_EDGES_SQL, iters=3, c=0.8))
def g25_simrank(spark, sf_dir):
    """SimRank structural similarity over the g8 host graph (3 unrolled
    rounds, c=0.8): hosts are similar when their in-neighbors are — the
    citation-context dual of g24's outlink mirror test. Pair state is
    the honest O(n^2) of SimRank; the production path seeds candidate
    pairs from g20/g24 (docstring). Floats follow the g1 discipline:
    fixed iterations, identical formula order, round at the end. See
    operators/hostrank.simrank."""
    from crawler_spark.operators.hostrank import simrank
    d = _t(spark, sf_dir, "documents")
    h = F.substring("source", 4, 10).cast("int")
    dst = F.concat(F.lit("src"),
                   ((F.col("doc_id") * 7 + 3) % (1 + (h % 20)))
                   .cast("string"))
    e = (d.select(F.col("source").alias("src"), dst.alias("dst"))
         .where(F.col("src") != F.col("dst")).distinct())
    return simrank(e, iters=3, c=0.8)


@q("w9_ucb_host_select", """
WITH per AS (SELECT source AS host,
                    CAST(count(*) AS BIGINT) AS n_pulls,
                    CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
                         AS BIGINT) AS n_rewards
             FROM documents GROUP BY source),
tot AS (SELECT CAST(sum(n_pulls) AS BIGINT) AS t FROM per),
s AS (SELECT host, n_pulls, n_rewards,
             round(CAST(n_rewards AS DOUBLE) / CAST(n_pulls AS DOUBLE), 4)
               AS mean_reward,
             round(CAST(n_rewards AS DOUBLE) / CAST(n_pulls AS DOUBLE)
                   + 1.4 * sqrt(ln(CAST(t AS DOUBLE))
                                / CAST(n_pulls AS DOUBLE)), 4) AS ucb
      FROM per CROSS JOIN tot)
SELECT host, n_pulls, n_rewards, mean_reward, ucb,
       CAST(CASE WHEN row_number() OVER (ORDER BY ucb DESC, host) <= 8
            THEN 1 ELSE 0 END AS INT) AS selected
FROM s
""")
def w9_ucb_host_select(spark, sf_dir):
    """UCB1 bandit allocation of next-wave crawl budget across hosts
    (Auer et al. 2002): mean reward ('fetch produced an English page'
    as the fixture's reward indicator) plus the c*sqrt(ln T / n)
    exploration bonus keeps under-sampled hosts probed instead of
    starved — the principled explore/exploit knob w1's static
    priorities lack. One partial-agged groupBy + a scalar broadcast +
    one host-cardinality window; ranking on the ROUNDED score. See
    operators/politeness.ucb_host_select."""
    from crawler_spark.operators.politeness import ucb_host_select
    d = _t(spark, sf_dir, "documents")
    return ucb_host_select(d, "source", (F.col("lang") == "en"),
                           k=8, c=1.4)


@q("st11_event_sequence", """
WITH o AS (SELECT user_id AS key, event_type, ts, event_id,
                  lead(event_type, 1) OVER w AS t1,
                  lead(event_type, 2) OVER w AS t2,
                  CAST(floor(epoch(lead(ts, 2) OVER w)) AS BIGINT)
                    - CAST(floor(epoch(ts)) AS BIGINT) AS span
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
m AS (SELECT key,
             CASE WHEN event_type = 'click' AND t1 = 'view'
                       AND t2 = 'purchase' AND span <= 86400
                  THEN 1 END AS hit
      FROM o)
SELECT key, CAST(sum(hit) AS BIGINT) AS n_matches
FROM m GROUP BY key HAVING sum(hit) > 0
""")
def st11_event_sequence(spark, sf_dir):
    """CEP sequence detection (the MATCH_RECOGNIZE primitive Spark
    lacks): per user, count of strictly-consecutive click->view->purchase
    runs completing within a day. Each event becomes a candidate
    match START via |p|-1 lead() columns sharing ONE per-key sort —
    no self-joins, overlapping matches counted. One shuffle total.
    See streaming/windows.event_sequences."""
    from crawler_spark.streaming.windows import event_sequences
    e = _t(spark, sf_dir, "events")
    return event_sequences(e, ["click", "view", "purchase"],
                           within_sec=86400)


from crawler_spark.operators.hostrank import katz_oracle_sql  # noqa: E402


@q("g27_katz", katz_oracle_sql(_G8_EDGES_SQL, iters=4, alpha=0.1))
def g27_katz(spark, sf_dir):
    """Katz centrality over the g8 host graph (4 unrolled rounds,
    alpha=0.1): undivided damped walk-counting prestige — the axis that
    diverges from PageRank exactly where link farms amplify, making the
    g1-vs-g27 rank gap a spam signal beside g21. Fixed iterations,
    round at the end (the g1 float discipline); host-cardinality joins
    with per-round lineage cuts. See operators/hostrank.katz_hosts."""
    from crawler_spark.operators.hostrank import katz_hosts
    d = _t(spark, sf_dir, "documents")
    h = F.substring("source", 4, 10).cast("int")
    dst = F.concat(F.lit("src"),
                   ((F.col("doc_id") * 7 + 3) % (1 + (h % 20)))
                   .cast("string"))
    e = (d.select(F.col("source").alias("src"), dst.alias("dst"))
         .where(F.col("src") != F.col("dst")).distinct())
    return katz_hosts(e, iters=4, alpha=0.1)


@q("tx25_char_entropy", """
WITH s AS (SELECT doc_id,
                  list_filter(string_split(text, ''), x -> x <> '') AS cs
           FROM documents),
c AS (SELECT doc_id, len(cs) AS n,
             list_transform(list_sort(list_distinct(cs)),
                 ch -> len(list_filter(cs, x -> x = ch))) AS cnts
      FROM s)
SELECT doc_id, CAST(n AS BIGINT) AS n_chars,
       CAST(len(cnts) AS BIGINT) AS n_distinct,
       round(list_reduce(list_prepend(CAST(0 AS DOUBLE),
                 list_transform(cnts, c2 -> -(CAST(c2 AS DOUBLE) / n)
                                * ln(CAST(c2 AS DOUBLE) / n))),
             (a, b) -> a + b), 4) AS entropy
FROM c
""")
def tx25_char_entropy(spark, sf_dir):
    """Shannon character entropy per document — the gibberish gate
    (repeated-char stuffing scores near 0; base64/binary residue
    scores anomalously high for its length). The -p·ln(p) terms fold
    over the SORTED distinct-char list on both engines, making an
    order-sensitive float sum deterministic cross-engine (DuckDB's
    list_reduce seeds with the first element — the prepended explicit
    0.0 is NOTES fact #3). Map-side only, zero shuffle. See
    functions/text.char_entropy_col."""
    from crawler_spark.functions.text import char_entropy_col
    d = _t(spark, sf_dir, "documents")
    return d.withColumn("_e", char_entropy_col(F.col("text"))).select(
        "doc_id", F.col("_e.n_chars").alias("n_chars"),
        F.col("_e.n_distinct").alias("n_distinct"),
        F.col("_e.entropy").alias("entropy"))


@q("j9_interval_overlap", """
WITH a AS (SELECT user_id, event_id AS a_id,
                  CAST(floor(epoch(ts)) AS BIGINT) AS lo_a,
                  CAST(floor(epoch(ts)) + 1800 AS BIGINT) AS hi_a
           FROM events WHERE event_type = 'view'),
b AS (SELECT user_id, event_id AS b_id,
             CAST(floor(epoch(ts)) AS BIGINT) AS lo_b,
             CAST(floor(epoch(ts)) + 900 AS BIGINT) AS hi_b
      FROM events WHERE event_type = 'error')
SELECT a.user_id, a.a_id, b.b_id,
       CAST(least(hi_a, hi_b) - greatest(lo_a, lo_b) AS BIGINT)
         AS overlap_sec
FROM a JOIN b ON a.user_id = b.user_id
               AND lo_a < hi_b AND lo_b < hi_a
""")
def j9_interval_overlap(spark, sf_dir):
    """Interval-interval overlap join (which 30-min view sessions
    intersected which 15-min error windows, per user) via the two-sided
    bucket-expansion rewrite: candidates equi-join on (key, bucket) and
    each true pair survives exactly once by the first-shared-bucket
    rule — no cartesian, no inequality nested-loop, no distinct pass.
    The oracle is DuckDB's plain inequality join. See
    operators/joins.interval_overlap_join."""
    from crawler_spark.operators.joins import interval_overlap_join
    e = _t(spark, sf_dir, "events")
    t = F.unix_timestamp("ts").cast("long")
    a = (e.where(F.col("event_type") == "view")
         .select("user_id", F.col("event_id").alias("a_id"),
                 t.alias("lo_a"), (t + 1800).alias("hi_a")))
    b = (e.where(F.col("event_type") == "error")
         .select("user_id", F.col("event_id").alias("b_id"),
                 t.alias("lo_b"), (t + 900).alias("hi_b")))
    out = interval_overlap_join(a, b, "user_id", bucket_width=3600.0)
    return out.select(
        "user_id", "a_id", "b_id",
        (F.least("hi_a", "hi_b") - F.greatest("lo_a", "lo_b"))
        .cast("long").alias("overlap_sec"))


@q("a9_metrics_cube", """
SELECT coalesce(source, '<all>') AS source,
       coalesce(lang, '<all>') AS lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
       CAST(grouping(source) AS INT) AS g_source,
       CAST(grouping(lang) AS INT) AS g_lang
FROM documents GROUP BY CUBE(source, lang)
""")
def a9_metrics_cube(spark, sf_dir):
    """Full CUBE of the crawl metrics rollup — per (host, lang), per
    host, per lang, and grand-total marginals in ONE pass (Spark plans
    an Expand + one partial-agged exchange, not four scans); the
    dashboard shape st5's linear ROLLUP cannot produce. Null grouping
    keys are sentineled '<all>' with grouping() flags disambiguating a
    real null from a marginal (the st5 comparator lesson)."""
    d = _t(spark, sf_dir, "documents")
    return (d.cube("source", "lang")
            .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
                 F.sum("n_chars").cast("long").alias("sum_chars"),
                 F.grouping("source").cast("int").alias("g_source"),
                 F.grouping("lang").cast("int").alias("g_lang"))
            .select(F.coalesce("source", F.lit("<all>")).alias("source"),
                    F.coalesce("lang", F.lit("<all>")).alias("lang"),
                    "n_docs", "sum_chars", "g_source", "g_lang"))


@q("an10_range_search", """
WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qvec
           FROM embeddings WHERE vec_id IN (0, 1, 2)),
s AS (SELECT q.qid, e.vec_id,
             round(list_cosine_similarity(e.embedding::DOUBLE[], q.qvec),
                   4) AS cosine
      FROM embeddings e, q WHERE e.vec_id <> q.qid)
SELECT qid, vec_id, cosine FROM s WHERE cosine >= 0.2
""")
def an10_range_search(spark, sf_dir):
    """Cosine range query (everything within similarity >= 0.2 of a
    3-query batch) — the fixed-radius half of the ANN serving API:
    dedup radius probes and recall-set expansion want all neighbors
    above a floor, not top-k. Query batch broadcasts, ONE corpus scan,
    threshold on the ROUNDED score; at scale the predicate composes
    with an2/an4 cell pruning. See operators/similarity.range_search."""
    from crawler_spark.operators.similarity import range_search
    e = _t(spark, sf_dir, "embeddings")
    qs = e.where(F.col("vec_id").isin(0, 1, 2))
    return range_search(e, qs, threshold=0.2)


# mm13: dHash bits from the SAME decode_byte_sums integer output mm5
# gates — bit c is the integer cross-multiplied mean comparison
# s_c * z_{c+1} > s_{c+1} * z_c (no float division anywhere).
_MM13_BITS_SQL = " + ".join(
    f"(CASE WHEN s{c} * z{c+1} > s{c+1} * z{c} THEN {1 << c} ELSE 0 END)"
    for c in range(7))

_MM13_SQL = """
WITH a AS (SELECT doc_id,
                  regexp_replace(text, '[^\\x20-\\x7E]', '', 'g') AS s
           FROM documents),
     b AS (SELECT doc_id,
                  list_transform(split(s, ''), ch -> ascii(ch)) AS cps,
                  length(s) AS n
           FROM a),
     c AS (SELECT doc_id, CAST(n AS BIGINT) AS n_bytes,
       """ + _MM5_CHUNK_COLS + """
       FROM b),
     h AS (SELECT doc_id, n_bytes,
                  CAST(""" + _MM13_BITS_SQL + """ AS BIGINT) AS dhash
           FROM c)
SELECT doc_id, dhash,
       CAST(count(*) OVER (PARTITION BY dhash) AS BIGINT) AS bucket_n,
       CAST(CASE WHEN doc_id = min(doc_id) OVER (PARTITION BY dhash)
            THEN 1 ELSE 0 END AS INT) AS keep
FROM h
"""


@q("mm13_dhash_buckets", _MM13_SQL)
def mm13_dhash_buckets(spark, sf_dir):
    """Perceptual difference-hash over the media decode algebra: dHash
    bits are adjacent-chunk MEAN comparisons from mm5's exact integer
    chunk sums, written as cross-multiplications (s_c*z_{c+1} >
    s_{c+1}*z_c) so no float division exists anywhere — the
    content-addressed bucket key for near-identical media variants
    (re-encodes, resizes) that byte-exact mm7 dedup misses. Buckets
    roll up with one window (count + min-doc canonical keep flag).
    The decode side is the SAME mapInPandas island mm1/mm5 share;
    everything after is codegen. See operators/multimodal."""
    from crawler_spark.operators.multimodal import (
        attach_payload, decode_byte_sums,
    )
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    sums = decode_byte_sums(attach_payload(d))
    bits = None
    for c in range(7):
        b = F.when(F.col(f"s{c}") * F.col(f"z{c+1}")
                   > F.col(f"s{c+1}") * F.col(f"z{c}"),
                   F.lit(1 << c)).otherwise(F.lit(0))
        bits = b if bits is None else bits + b
    h = sums.select("doc_id", bits.cast("long").alias("dhash"))
    w = Window.partitionBy("dhash")
    return h.select(
        "doc_id", "dhash",
        F.count(F.lit(1)).over(w).cast("long").alias("bucket_n"),
        (F.col("doc_id") == F.min("doc_id").over(w)).cast("int")
        .alias("keep"))


_F13_DIRECTIVE_SQL = """CASE doc_id % 11
  WHEN 0 THEN 'noindex,nofollow'
  WHEN 1 THEN 'NOFOLLOW'
  WHEN 2 THEN ' NoIndex , Follow '
  WHEN 3 THEN 'none'
  WHEN 4 THEN 'all'
  WHEN 5 THEN ''
  WHEN 6 THEN 'index, nofollow'
  ELSE 'index,follow' END"""


@q("f13_meta_robots", f"""
WITH a AS (SELECT doc_id, {_F13_DIRECTIVE_SQL} AS directive,
                  CAST(ceil(len(list_filter(regexp_split_to_array(
                       trim(text), '\\s+'), x -> x <> '')) / 8.0)
                       AS BIGINT) AS n_links
           FROM documents),
b AS (SELECT doc_id, directive, n_links,
             list_transform(string_split(lower(directive), ','),
                            t -> trim(t)) AS toks
      FROM a),
c AS (SELECT doc_id, directive, n_links,
             CASE WHEN list_contains(toks, 'noindex')
                       OR list_contains(toks, 'none') THEN 0 ELSE 1 END
               AS indexable,
             CASE WHEN list_contains(toks, 'nofollow')
                       OR list_contains(toks, 'none') THEN 0 ELSE 1 END
               AS followable
      FROM b)
SELECT doc_id, directive, CAST(indexable AS INT) AS indexable,
       CAST(followable AS INT) AS followable, n_links,
       CAST(CASE WHEN followable = 1 THEN n_links ELSE 0 END AS BIGINT)
         AS n_links_followed
FROM c
""")
def f13_meta_robots(spark, sf_dir):
    """Page-level robots directives (meta robots / X-Robots-Tag): the
    indexability and link-follow gates that compose with the host-level
    F5 robots.txt cache — robots.txt decides FETCH, meta robots decides
    STORE and EXPAND. The fixture salts every directive form the
    standard allows (case, whitespace, 'none', 'all', empty-default);
    followed-link counts derive from the page's span chunking. Pure
    token algebra over one split, zero shuffle. See
    operators/robots.meta_robots_flags."""
    from crawler_spark.operators.robots import meta_robots_flags
    d = _t(spark, sf_dir, "documents")
    directive = (
        F.when(F.col("doc_id") % 11 == 0, F.lit("noindex,nofollow"))
        .when(F.col("doc_id") % 11 == 1, F.lit("NOFOLLOW"))
        .when(F.col("doc_id") % 11 == 2, F.lit(" NoIndex , Follow "))
        .when(F.col("doc_id") % 11 == 3, F.lit("none"))
        .when(F.col("doc_id") % 11 == 4, F.lit("all"))
        .when(F.col("doc_id") % 11 == 5, F.lit(""))
        .when(F.col("doc_id") % 11 == 6, F.lit("index, nofollow"))
        .otherwise(F.lit("index,follow")))
    words = F.filter(F.split(F.trim("text"), r"\s+"), lambda x: x != "")
    n_links = F.ceil(F.size(words) / 8.0).cast("long")
    out = (d.select("doc_id", directive.alias("directive"),
                    n_links.alias("n_links"))
           .withColumn("_f", meta_robots_flags(F.col("directive"))))
    return out.select(
        "doc_id", "directive",
        F.col("_f.indexable").alias("indexable"),
        F.col("_f.followable").alias("followable"), "n_links",
        F.when(F.col("_f.followable") == 1, F.col("n_links"))
         .otherwise(F.lit(0)).cast("long").alias("n_links_followed"))


@q("p8_rel_canonical", """
WITH d AS (SELECT doc_id FROM documents),
m AS (SELECT doc_id,
             CASE WHEN doc_id % 5 = 0 AND doc_id % 20 <> 0
                  THEN doc_id - (doc_id % 20) ELSE doc_id END
               AS canonical_id,
             CAST(CASE WHEN doc_id % 5 = 0 AND doc_id % 20 <> 0
                  THEN (doc_id % 20) // 5 ELSE 0 END AS INT) AS hops
      FROM d)
SELECT doc_id, CAST(canonical_id AS BIGINT) AS canonical_id, hops,
       CAST(CASE WHEN doc_id = canonical_id THEN 1 ELSE 0 END AS INT)
         AS is_canonical,
       CAST(count(*) OVER (PARTITION BY canonical_id) AS BIGINT)
         AS n_cluster
FROM m
""")
def p8_rel_canonical(spark, sf_dir):
    """rel=canonical collapse: pages declaring a canonical URL resolve
    through declaration CHAINS (a canonical target may itself declare
    one — 15→10→5→0 in the fixture) to the terminal canonical via the
    SAME pointer-doubling operator the 3xx resolver uses (g6), then
    cluster sizes roll up with one window — the pre-dedup URL-identity
    signal that saves dd1-dd10 from even seeing declared duplicates.
    The oracle is the chain's closed form (doc - doc%20 at stride 5),
    so the log-round engine path is checked against exact arithmetic.
    See operators/hostrank.resolve_redirects."""
    from crawler_spark.operators.hostrank import resolve_redirects
    d = _t(spark, sf_dir, "documents").select("doc_id")
    declaring = d.where((F.col("doc_id") % 5 == 0)
                        & (F.col("doc_id") % 20 != 0))
    edges = declaring.select(
        F.col("doc_id").cast("string").alias("src"),
        (F.col("doc_id") - 5).cast("string").alias("dst"))
    res = resolve_redirects(edges, rounds=4).select(
        F.col("src").cast("long").alias("doc_id"),
        F.col("final").cast("long").alias("_canon"),
        F.col("hops").alias("_hops"))
    m = (d.join(res, "doc_id", "left")
         .select("doc_id",
                 F.coalesce("_canon", F.col("doc_id")).cast("long")
                  .alias("canonical_id"),
                 F.coalesce("_hops", F.lit(0)).cast("int").alias("hops")))
    w = Window.partitionBy("canonical_id")
    return m.select(
        "doc_id", "canonical_id", "hops",
        (F.col("doc_id") == F.col("canonical_id")).cast("int")
        .alias("is_canonical"),
        F.count(F.lit(1)).over(w).cast("long").alias("n_cluster"))


@q("dd17_edit_distance", """
WITH base AS (
  SELECT doc_id,
         substr(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')),
                1, 64) AS norm
  FROM documents),
corpus AS (
  SELECT doc_id AS id, norm FROM base
  UNION ALL
  SELECT doc_id + 1000000 AS id,
         substr(norm, 1, 12) || '#' || substr(norm, 14, 64) AS norm
  FROM base WHERE doc_id % 9 = 0
  UNION ALL
  SELECT doc_id + 2000000 AS id,
         substr(norm, 1, 20) || substr(norm, 23, 64) AS norm
  FROM base WHERE doc_id % 9 = 3),
pre AS (
  SELECT id,
         substr(trim(regexp_replace(lower(norm), '\\s+', ' ', 'g')),
                1, 64) AS n
  FROM corpus),
d AS (SELECT id, n, length(n) AS len, substr(n, 1, 8) AS blk FROM pre),
cand AS (
  SELECT a.id AS id_a, b.id AS id_b, a.n AS na, b.n AS nb
  FROM d a JOIN d b ON a.blk = b.blk
  WHERE a.id < b.id AND abs(a.len - b.len) <= 3),
v AS (SELECT id_a, id_b, CAST(levenshtein(na, nb) AS INT) AS dist
      FROM cand)
SELECT id_a, id_b, dist,
       CAST(CASE WHEN id_b - id_a IN (1000000, 2000000) THEN 1 ELSE 0 END
            AS INT) AS injected
FROM v WHERE dist <= 3
""")
def dd17_edit_distance(spark, sf_dir):
    """Blocked edit-distance near-dup join (Gravano-style prefix+length
    blocking, Levenshtein verify only on candidates) — the char-level
    dedup axis next to dd3's token-level MinHash: one-typo mirrors and
    OCR variants hash to different shingle sets but sit at dist 1-2.
    The fixture injects two variant classes per ninth doc (one
    substitution at char 13; a two-char deletion at 21-22, which may
    cascade one whitespace collapse — why k=3): the gate proves the
    blocking RETAINS every injected pair (prefix-8 untouched, len diff
    <= 3) while the verify prices only blocked candidates. `injected`
    separates planted from natural word-salad collisions.
    See operators/textdedup.edit_distance_pairs."""
    from crawler_spark.operators.textdedup import (
        edit_distance_pairs, normalize_text,
    )
    d = _t(spark, sf_dir, "documents")
    base = d.select("doc_id",
                    F.substring(normalize_text(F.col("text")), 1, 64)
                    .alias("norm"))
    v1 = (base.where(F.col("doc_id") % 9 == 0)
          .select((F.col("doc_id") + 1000000).alias("id"),
                  F.concat(F.substring("norm", 1, 12), F.lit("#"),
                           F.substring("norm", 14, 64)).alias("norm")))
    v2 = (base.where(F.col("doc_id") % 9 == 3)
          .select((F.col("doc_id") + 2000000).alias("id"),
                  F.concat(F.substring("norm", 1, 20),
                           F.substring("norm", 23, 64)).alias("norm")))
    corpus = base.select(F.col("doc_id").alias("id"), "norm") \
                 .unionByName(v1).unionByName(v2)
    pairs = edit_distance_pairs(corpus, k=3, prefix_len=8, cap_len=64,
                                id_col="id", text_col="norm")
    return pairs.select(
        "id_a", "id_b", "dist",
        (F.col("id_b") - F.col("id_a")).isin(1000000, 2000000)
        .cast("int").alias("injected"))


@q("an11_mips_topk", """
WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qvec
           FROM embeddings WHERE vec_id IN (3, 4, 5)),
scored AS (
  SELECT q.qid, e.vec_id,
         round(list_inner_product(e.embedding::DOUBLE[], q.qvec), 4) AS dot
  FROM embeddings e, q WHERE e.vec_id <> q.qid)
SELECT qid, vec_id, dot, rnk FROM (
  SELECT *, row_number() OVER (PARTITION BY qid
                               ORDER BY dot DESC, vec_id) AS rnk
  FROM scored)
WHERE rnk <= 8
""")
def an11_mips_topk(spark, sf_dir):
    """Maximum-inner-product top-8 for a 3-query batch — the retrieval
    order for dual-encoder scorers where norm carries signal (reward
    models, popularity-weighted retrieval) and cosine is wrong. Exact
    one-scan baseline; the scale path is the norm-augmentation
    reduction to cosine (augment_for_mips) feeding the an2/an4 index
    plumbing, property-tested order-equal in test_similarity.
    See operators/similarity.mips_topk."""
    from crawler_spark.operators.similarity import mips_topk
    e = _t(spark, sf_dir, "embeddings")
    qs = e.where(F.col("vec_id").isin(3, 4, 5))
    return mips_topk(e, qs, k=8)


@q("an12_knn_graph", """
WITH scored AS (
  SELECT a.vec_id AS src, b.vec_id AS dst,
         round(list_cosine_similarity(a.embedding::DOUBLE[],
                                      b.embedding::DOUBLE[]), 4) AS cosine
  FROM embeddings a, embeddings b WHERE a.vec_id <> b.vec_id),
edges AS (
  SELECT src, dst, cosine, rnk FROM (
    SELECT *, row_number() OVER (PARTITION BY src
                                 ORDER BY cosine DESC, dst) AS rnk
    FROM scored)
  WHERE rnk <= 4),
mut AS (
  SELECT e.src, e.dst, e.cosine, e.rnk,
         CAST(CASE WHEN r.src IS NOT NULL THEN 1 ELSE 0 END AS INT)
           AS mutual
  FROM edges e LEFT JOIN (SELECT DISTINCT dst AS src, src AS dst
                          FROM edges) r
    ON e.src = r.src AND e.dst = r.dst)
SELECT src, dst, cosine, rnk, mutual FROM mut
""")
def an12_knn_graph(spark, sf_dir):
    """k-NN graph build (k=4) over the embedding corpus with the mutual
    (symmetrization) flag — the base-layer construction step of graph
    ANN indexes (HNSW/NN-descent seeds) and of SemDeDup-style cluster
    curation. Ranking on the ROUNDED cosine (an1 discipline); the
    mutual flag is one edge-list self-join on the reversed key —
    edges, not vectors. Brute all-pairs here; at scale pass cell_col
    (km1 coarse labels) to block pair generation within IVF cells.
    See operators/similarity.knn_graph."""
    from crawler_spark.operators.similarity import knn_graph
    e = _t(spark, sf_dir, "embeddings")
    return knn_graph(e, k=4)


@q("tx27_ngram_novelty", """
WITH sh AS (""" + _SHINGLE_SQL + """),
g AS (SELECT doc_id, unnest(sh) AS gram FROM sh),
df AS (SELECT gram, CAST(count(*) AS BIGINT) AS df FROM g GROUP BY 1)
SELECT g.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
       CAST(sum(CASE WHEN df.df = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_novel,
       round(sum(CASE WHEN df.df = 1 THEN 1 ELSE 0 END) * 1.0 / count(*),
             4) AS novelty
FROM g JOIN df USING (gram)
GROUP BY g.doc_id
""")
def tx27_ngram_novelty(spark, sf_dir):
    """Per-document 3-gram novelty: the fraction of a doc's distinct
    word trigrams that no other document shares — the memorization/
    boilerplate axis of Lee et al. 2022 (repeated n-grams are what
    near-dup training data burns compute re-learning) as a per-doc
    keep signal. Grams are per-doc DISTINCT map-side before the ONE
    df shuffle; the join back reuses the same gram hashing. See
    operators/langmodel.ngram_novelty."""
    from crawler_spark.operators.langmodel import ngram_novelty
    return ngram_novelty(_t(spark, sf_dir, "documents"), n=3)


@q("j10_bloom_prune_join", """
WITH dim AS (SELECT DISTINCT user_id FROM events WHERE user_id % 37 = 0),
bits AS (
  SELECT DISTINCT ('0x' || substr(md5('0:' || user_id), 1, 8))::BIGINT % 64
         AS pos FROM dim
  UNION
  SELECT ('0x' || substr(md5('1:' || user_id), 1, 8))::BIGINT % 64
  FROM dim),
u AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_events
      FROM events GROUP BY 1),
p AS (SELECT user_id, n_events FROM u
      WHERE ('0x' || substr(md5('0:' || user_id), 1, 8))::BIGINT % 64
              IN (SELECT pos FROM bits)
        AND ('0x' || substr(md5('1:' || user_id), 1, 8))::BIGINT % 64
              IN (SELECT pos FROM bits))
SELECT p.user_id, p.n_events,
       CAST(d.user_id IS NOT NULL AS INT) AS in_dim,
       CAST(CASE WHEN d.user_id IS NOT NULL THEN p.user_id % 5 ELSE -1 END
            AS INT) AS segment
FROM p LEFT JOIN dim d USING (user_id)
""")
def j10_bloom_prune_join(spark, sf_dir):
    """Bloom-pruned fact-dim join: the runtime row-level filter that
    bounds shuffle volume when a 10^10-row fact joins a small dim —
    fact rows whose key cannot be in the dim are dropped MAP-SIDE by a
    packed-bitmask test before any wire traffic (Spark 3.3's bloom
    join rewrite, made explicit so the prune also guards the
    aggregation placed before the join). The filter is deliberately
    tiny (m=64, k=2) so Bloom FALSE POSITIVES survive the prune and
    sit under the hash gate: in_dim separates true matches from FPs
    the exact join would drop. See operators/joins.bloom_prune_join."""
    from crawler_spark.operators.joins import bloom_prune_join
    e = _t(spark, sf_dir, "events")
    dim = e.select("user_id").where(F.col("user_id") % 37 == 0).distinct()
    pruned = bloom_prune_join(e.select("user_id"), dim, "user_id",
                              m=64, k=2)
    agg = (pruned.groupBy("user_id")
           .agg(F.count(F.lit(1)).cast("long").alias("n_events")))
    d2 = dim.withColumn("_in", F.lit(1))
    return (agg.join(F.broadcast(d2), "user_id", "left")
            .select("user_id", "n_events",
                    F.col("_in").isNotNull().cast("int").alias("in_dim"),
                    F.when(F.col("_in").isNotNull(),
                           F.col("user_id") % 5)
                     .otherwise(F.lit(-1)).cast("int").alias("segment")))


@q("px13_curriculum", """
WITH z AS (SELECT doc_id,
                  CAST(least(3, n_chars // 400) AS INT) AS phase,
                  md5('cur/' || doc_id) AS mk
           FROM documents)
SELECT doc_id, phase,
       CAST(row_number() OVER (ORDER BY phase, mk, doc_id) AS BIGINT) AS pos
FROM z
""")
def px13_curriculum(spark, sf_dir):
    """Curriculum training order (Bengio et al. 2009): 4 length-band
    phases stream easy->hard, rows WITHIN a phase in content-stable
    md5-shuffled order (crawl-locality decorrelation, the px8
    discipline). The global position comes from the DISTRIBUTED
    global_rank (block-local ranks + broadcast offset cumsum) — the
    oracle's single-partition ORDER BY window is exactly what the
    engine must never plan. See operators/sampling.curriculum_order."""
    from crawler_spark.operators.sampling import curriculum_order
    d = _t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    out = curriculum_order(
        d, F.least(F.lit(3), F.floor(F.col("n_chars") / 400)),
        F.concat(F.lit("cur/"), F.col("doc_id")), n_blocks=16)
    return out.select("doc_id", "phase", "pos")


@q("g28_modularity", """
WITH lab AS (""" + lpa_oracle_sql(_G13_EDGES_SQL, iters=4) + """),
e0 AS (SELECT DISTINCT src, dst FROM (""" + _G13_EDGES_SQL + """)
       WHERE src <> dst),
up AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
       FROM e0),
mm AS (SELECT CAST(count(*) AS DOUBLE) AS m FROM up),
deg AS (SELECT h AS host, CAST(count(*) AS BIGINT) AS d
        FROM (SELECT a AS h FROM up UNION ALL SELECT b AS h FROM up)
        GROUP BY 1),
dc AS (SELECT l.community, CAST(count(*) AS BIGINT) AS n_hosts,
              CAST(sum(deg.d) AS BIGINT) AS d_sum
       FROM lab l JOIN deg ON deg.host = l.host GROUP BY 1),
ec AS (SELECT la.community, CAST(count(*) AS BIGINT) AS e_in
       FROM up JOIN lab la ON la.host = up.a
               JOIN lab lb ON lb.host = up.b
       WHERE la.community = lb.community GROUP BY 1)
SELECT dc.community, dc.n_hosts, COALESCE(ec.e_in, 0) AS e_in, dc.d_sum,
       round(COALESCE(ec.e_in, 0) / mm.m
             - (dc.d_sum / (2 * mm.m)) * (dc.d_sum / (2 * mm.m)), 4)
         AS q_contrib
FROM dc LEFT JOIN ec USING (community) CROSS JOIN mm
""")
def g28_modularity(spark, sf_dir):
    """Newman modularity per g14 community — the quality gate on the
    community structure itself (is the detected "site network" dense
    inside and sparse outside, or an LPA artifact?). sum(q_contrib) is
    the partition's Q. Labels re-derive from the same g13 sparse graph;
    the oracle nests the unrolled LPA CTE so label assignment AND the
    modularity algebra both sit under the hash gate. See
    operators/hostrank.modularity."""
    from crawler_spark.operators.hostrank import lpa_communities, modularity
    d = _t(spark, sf_dir, "documents")
    h = lambda c: F.concat(F.lit("h"), (c % 211).cast("string"))  # noqa: E731
    e1 = (d.where(F.col("doc_id") % 2 == 0)
          .select(h(F.col("doc_id")).alias("src"),
                  h(F.col("doc_id") * 13 + 5).alias("dst")))
    e2 = (d.where(F.col("doc_id") % 5 == 0)
          .select(h(F.col("doc_id") * 17 + 3).alias("src"),
                  h(F.col("doc_id") * 29 + 11).alias("dst")))
    edges = e1.unionByName(e2)
    labels = lpa_communities(edges, iters=4)
    return modularity(edges, labels)


from crawler_spark.operators.multimodal import aspect_bucket_sql  # noqa: E402


@q("mm14_aspect_buckets", """
WITH d AS (SELECT doc_id,
                  CAST(160 + (doc_id * 37) % 800 AS BIGINT) AS width,
                  CAST(90 + (doc_id * 53) % 900 AS BIGINT) AS height
           FROM documents),
b AS (SELECT doc_id, width, height,
             """ + aspect_bucket_sql("width", "height") + """ AS bucket,
             md5('ab/' || doc_id) AS mk
      FROM d)
SELECT doc_id, width, height, bucket,
       CAST((row_number() OVER (PARTITION BY bucket ORDER BY mk, doc_id)
             - 1) // 32 + 1 AS BIGINT) AS batch_id
FROM b
""")
def mm14_aspect_buckets(spark, sf_dir):
    """Aspect-ratio bucketed batching for image training (the NovelAI/
    SDXL bucketing scheme): each media item goes to its nearest
    standard aspect bucket by EXACT integer cross-multiplication (no
    float ratios), then gets a batch id from a content-stable shuffled
    rank within its bucket, 32 items per batch — so every training
    batch crops/pads to ONE shape. Dims derive deterministically from
    doc_id (the metadata path: bucketing needs width/height, never
    pixels). The per-bucket rank is the DISTRIBUTED keyed_global_rank
    — a handful of buckets over 10^9 images is exactly the few-huge-
    keys regime where a naive per-key window collapses to one task per
    bucket. See operators/multimodal.aspect_bucket_col."""
    from crawler_spark.operators.multimodal import aspect_bucket_col
    from crawler_spark.operators.sampling import keyed_global_rank
    d = _t(spark, sf_dir, "documents").select("doc_id")
    dims = d.select(
        "doc_id",
        (160 + (F.col("doc_id") * 37) % 800).cast("long").alias("width"),
        (90 + (F.col("doc_id") * 53) % 900).cast("long").alias("height"))
    z = (dims
         .withColumn("bucket", aspect_bucket_col(F.col("width"),
                                                 F.col("height")))
         .withColumn("_mk", F.md5(F.concat(F.lit("ab/"), F.col("doc_id")))))
    ranked = keyed_global_rank(z, ["bucket"],
                               [F.col("_mk"), F.col("doc_id")],
                               n_blocks=16, out_col="_rn")
    return ranked.select(
        "doc_id", "width", "height", "bucket",
        (F.floor((F.col("_rn") - 1) / 32) + 1).cast("long")
        .alias("batch_id"))


@q("f14_trap_segments", """
WITH d AS (SELECT doc_id,
                  list_transform(range(0, 2 + doc_id % 4),
                    i -> 's' || CAST((doc_id * (i + 3) + i) % 11 AS VARCHAR))
                    AS base
           FROM documents),
s AS (SELECT doc_id,
             CASE WHEN doc_id % 13 = 0 THEN list_concat(base, base)
                  ELSE base END AS segs
      FROM d),
m AS (SELECT doc_id, len(segs) AS n,
             len(list_transform(range(0, len(segs) - 1),
                                i -> segs[i+1] || '/' || segs[i+2]))
             - len(list_distinct(list_transform(range(0, len(segs) - 1),
                                i -> segs[i+1] || '/' || segs[i+2])))
               AS n_rep_pairs,
             round(1.0 - len(list_distinct(segs)) * 1.0 / len(segs), 4)
               AS rep_ratio
      FROM s)
SELECT doc_id, CAST(n AS INT) AS depth,
       CAST(n_rep_pairs AS INT) AS n_rep_pairs, rep_ratio,
       CAST(n >= 8 OR n_rep_pairs >= 2 OR rep_ratio >= 0.5 AS INT) AS is_trap
FROM m
""")
def f14_trap_segments(spark, sf_dir):
    """Crawler-trap gate from URL path structure (Mercator's path-cycle
    traps; IRLbot's budget rules): depth, repeated adjacent segment
    PAIRS (the "/a/b/a/b" cycle signature), and segment repetition
    ratio, combined into an is_trap admission gate. The fixture
    synthesizes paths from doc_id with every 13th doc a cycle trap
    (path doubled). Pure let-bound HOF algebra over one split —
    map-side, zero shuffle, priced per frontier candidate per wave.
    See operators/scope.trap_signals."""
    from crawler_spark.operators.scope import trap_signals
    d = _t(spark, sf_dir, "documents").select("doc_id")
    seg = F.transform(
        F.sequence(F.lit(0), (1 + F.col("doc_id") % 4).cast("int")),
        lambda i: F.concat(F.lit("s"),
                           ((F.col("doc_id") * (i + 3) + i) % 11)
                           .cast("string")))
    segs = F.when(F.col("doc_id") % 13 == 0, F.concat(seg, seg)) \
            .otherwise(seg)
    path = F.concat(F.lit("/"), F.array_join(segs, "/"))
    out = d.select("doc_id", trap_signals(path).alias("_t"))
    return out.select(
        "doc_id", F.col("_t.depth").alias("depth"),
        F.col("_t.n_rep_pairs").alias("n_rep_pairs"),
        F.col("_t.rep_ratio").alias("rep_ratio"),
        F.col("_t.is_trap").alias("is_trap"))


from crawler_spark.operators.similarity import mmr_oracle_sql  # noqa: E402


@q("an13_mmr_rerank", mmr_oracle_sql([3, 4, 5], shortlist_k=8, picks=4))
def an13_mmr_rerank(spark, sf_dir):
    """MMR diversity re-ranking (Carbonell & Goldstein 1998) of the
    an1 shortlist: 4 greedy picks from the top-8, each maximizing
    0.7*relevance - 0.3*max-sim-to-selected — the anti-redundancy
    selector RAG serving puts after ANN retrieval, and the exemplar
    picker SemDeDup-style curation ends with. The greedy argmax rounds
    run as per-qid windows over the k-row shortlist; the oracle
    unrolls the identical rounds. See operators/similarity.mmr_rerank."""
    from crawler_spark.operators.similarity import mmr_rerank
    e = _t(spark, sf_dir, "embeddings")
    qs = e.where(F.col("vec_id").isin(3, 4, 5))
    return mmr_rerank(e, qs, shortlist_k=8, picks=4)


@q("ix10_rrf_fusion", f"""
WITH w AS (SELECT doc_id,
                  regexp_split_to_array(trim(lower(text)), '\\s+') AS w
           FROM documents),
g AS (SELECT count(*) AS n, avg(len(w)) AS avgdl FROM w),
t AS (SELECT doc_id, len(w) AS dl, unnest(w) AS term FROM w),
tf AS (SELECT doc_id, dl, term, count(*) AS tf FROM t
       WHERE term IN {_TX11_TERMS!r} GROUP BY 1, 2, 3),
df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tf GROUP BY 1),
lex AS (SELECT tf.doc_id,
               round(SUM(ln(1.0 + (g.n - df.df + 0.5) / (df.df + 0.5))
                         * tf.tf * 2.2
                         / (tf.tf + 1.2 * (0.25 + 0.75 * tf.dl / g.avgdl))),
                     4) AS bm25
        FROM tf JOIN df USING (term) CROSS JOIN g
        GROUP BY tf.doc_id),
lr AS (SELECT doc_id, CAST(row_number() OVER (ORDER BY bm25 DESC, doc_id)
                           AS INT) AS r0
       FROM lex QUALIFY r0 <= 50),
qv AS (SELECT embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id = 0),
den AS (SELECT e.vec_id AS doc_id,
               round(list_cosine_similarity(e.embedding::DOUBLE[], qv.v), 4)
                 AS cosine
        FROM embeddings e, qv WHERE e.vec_id <> 0),
dr AS (SELECT doc_id, CAST(row_number() OVER (ORDER BY cosine DESC, doc_id)
                           AS INT) AS r1
       FROM den QUALIFY r1 <= 50)
SELECT COALESCE(lr.doc_id, dr.doc_id) AS doc_id,
       CAST(COALESCE(lr.r0, -1) AS INT) AS r0,
       CAST(COALESCE(dr.r1, -1) AS INT) AS r1,
       round(COALESCE(1.0 / (60 + lr.r0), 0.0)
             + COALESCE(1.0 / (60 + dr.r1), 0.0), 6) AS rrf
FROM lr FULL OUTER JOIN dr ON lr.doc_id = dr.doc_id
""")
def ix10_rrf_fusion(spark, sf_dir):
    """Hybrid retrieval via reciprocal-rank fusion (Cormack et al.,
    SIGIR 2009): the lexical BM25 run (tx11's scorer) fused with the
    dense cosine run (an1's scorer, query = vec 0) by 1/(60+rank) —
    the combiner modern search stacks use precisely because the two
    score scales never need calibration. Each run's top-50 comes from
    TakeOrderedAndProject heaps (no global sort); ranks then live on
    k-bounded lists; the fusion join is a 50-row full-outer. Sentinels
    -1 mark "absent from this run". See operators/invindex.rrf_fusion."""
    from crawler_spark.functions.text import bm25_scores
    from crawler_spark.operators.invindex import rrf_fusion
    d = _t(spark, sf_dir, "documents")
    e = _t(spark, sf_dir, "embeddings")
    lex = bm25_scores(d, F.col("text"), _TX11_TERMS) \
        .select("doc_id", F.col("bm25").alias("score"))
    qs = e.where(F.col("vec_id") == 0)
    # top-50 suffices: rrf_fusion truncates to k_list anyway, and the
    # (cosine desc, vec_id) order is identical — never rank the corpus
    den = brute_force_topk(e, qs, k=50, id_col="vec_id") \
        .select(F.col("vec_id").alias("doc_id"),
                F.col("cosine").alias("score"))
    out = rrf_fusion([lex, den], id_col="doc_id", k_list=50)
    return out.select("doc_id", "r0", "r1", "rrf")


@q("st12_changelog_merge", """
WITH base AS (SELECT doc_id, n_chars AS val FROM documents),
ch AS (
  SELECT doc_id, 'u' AS op, n_chars + 1000 AS val,
         CAST(10 + doc_id % 5 AS BIGINT) AS ver
  FROM documents WHERE doc_id % 3 = 0
  UNION ALL
  SELECT doc_id, 'd' AS op, CAST(NULL AS BIGINT) AS val,
         CAST(8 + doc_id % 9 AS BIGINT) AS ver
  FROM documents WHERE doc_id % 7 = 0
  UNION ALL
  SELECT doc_id + 900000 AS doc_id, 'u' AS op, doc_id AS val,
         CAST(1 AS BIGINT) AS ver
  FROM documents WHERE doc_id % 11 = 0),
latest AS (SELECT doc_id, op, val FROM (
  SELECT *, row_number() OVER (PARTITION BY doc_id
                               ORDER BY ver DESC, op) AS rn
  FROM ch) WHERE rn = 1)
SELECT COALESCE(b.doc_id, l.doc_id) AS doc_id,
       CASE WHEN l.op = 'u' THEN l.val ELSE b.val END AS val,
       CASE WHEN l.op = 'u' THEN 'upsert' ELSE 'base' END AS src
FROM base b FULL OUTER JOIN latest l ON b.doc_id = l.doc_id
WHERE l.op IS NULL OR l.op = 'u'
""")
def st12_changelog_merge(spark, sf_dir):
    """CDC apply / MERGE INTO semantics: a synthesized changelog
    (updates, deletes, inserts, with REAL version ties — every doc_id
    where 10+id%5 = 8+id%9 carries a same-version update+delete pair
    resolved by the delete-wins tie rule) applied over the documents
    snapshot: latest version wins, 'd' drops the key, 'u' upserts, the
    rest pass through. One changelog-cardinality keyed window + one
    bucketable key join — the maintenance primitive between crawl
    epochs. See operators/joins.changelog_merge."""
    from crawler_spark.operators.joins import changelog_merge
    d = _t(spark, sf_dir, "documents")
    base = d.select("doc_id", F.col("n_chars").alias("val"))
    upd = (d.where(F.col("doc_id") % 3 == 0)
           .select("doc_id", F.lit("u").alias("op"),
                   (F.col("n_chars") + 1000).alias("val"),
                   (10 + F.col("doc_id") % 5).cast("long").alias("ver")))
    dele = (d.where(F.col("doc_id") % 7 == 0)
            .select("doc_id", F.lit("d").alias("op"),
                    F.lit(None).cast("long").alias("val"),
                    (8 + F.col("doc_id") % 9).cast("long").alias("ver")))
    ins = (d.where(F.col("doc_id") % 11 == 0)
           .select((F.col("doc_id") + 900000).alias("doc_id"),
                   F.lit("u").alias("op"),
                   F.col("doc_id").alias("val"),
                   F.lit(1).cast("long").alias("ver")))
    ch = upd.unionByName(dele).unionByName(ins)
    return changelog_merge(base, ch, "doc_id", "val", "ver", "op")


@q("an14_ivf_inertia", """
WITH asg AS (""" + _ORACLES["km1_ivf_codebook"] + """)
SELECT cluster, CAST(count(*) AS BIGINT) AS n_vecs,
       CAST(sum(d2) AS BIGINT) AS sum_d2,
       round(CAST(sum(d2) AS DOUBLE) / count(*), 4) AS mean_d2
FROM asg GROUP BY 1
""")
def an14_ivf_inertia(spark, sf_dir):
    """IVF index health report: per trained cell (km1's codebook), the
    member count, total and mean squared lattice distance — inertia
    and balance, the two numbers that decide whether the coarse
    quantizer needs retraining (one fat cell = probe blowup, high
    inertia = bad recall at nprobe). One cluster-cardinality rollup on
    km1's assignment; the oracle nests km1's unrolled Lloyd CTE so the
    whole train->assign->audit chain sits under the hash gate."""
    from crawler_spark.operators.similarity import kmeans_assign
    e = _t(spark, sf_dir, "embeddings")
    asg = kmeans_assign(e, k=4, iters=3, scale=64)
    return (asg.groupBy("cluster")
            .agg(F.count(F.lit(1)).cast("long").alias("n_vecs"),
                 F.sum("d2").cast("long").alias("sum_d2"),
                 F.round(F.sum("d2").cast("double") / F.count(F.lit(1)), 4)
                  .alias("mean_d2")))


@q("mm15_scene_cuts", """
WITH a AS (SELECT doc_id,
                  regexp_replace(text, '[^\\x20-\\x7E]', '', 'g') AS s
           FROM documents),
b AS (SELECT doc_id,
             list_transform(split(s, ''), ch -> ascii(ch)) AS cps,
             length(s) AS n
      FROM a WHERE length(s) >= 8),
f AS (SELECT doc_id, cps, n, unnest(range(0, 8)) AS fi FROM b),
fr AS (SELECT doc_id, CAST(fi AS INT) AS frame_idx,""" + _MM8_FRAME_COLS
       + """
       FROM f),
c AS (SELECT doc_id, frame_idx, frame_bytes, frame_sum,
             lag(frame_sum) OVER wd AS ps,
             lag(frame_bytes) OVER wd AS pz
      FROM fr WINDOW wd AS (PARTITION BY doc_id ORDER BY frame_idx)),
k AS (SELECT doc_id, frame_idx,
             CASE WHEN ps IS NOT NULL
                       AND abs(frame_sum * pz - ps * frame_bytes)
                           > 8 * frame_bytes * pz
                  THEN 1 ELSE 0 END AS cut
      FROM c),
s AS (SELECT doc_id, cut,
             sum(cut) OVER (PARTITION BY doc_id ORDER BY frame_idx)
               AS scene
      FROM k),
g AS (SELECT doc_id, scene, count(*) AS flen FROM s GROUP BY 1, 2)
SELECT t.doc_id, CAST(t.n_cuts AS INT) AS n_cuts,
       CAST(t.n_cuts + 1 AS INT) AS n_scenes,
       CAST(m.longest AS INT) AS longest_scene
FROM (SELECT doc_id, sum(cut) AS n_cuts FROM s GROUP BY 1) t
JOIN (SELECT doc_id, max(flen) AS longest FROM g GROUP BY 1) m
  USING (doc_id)
""")
def mm15_scene_cuts(spark, sf_dir):
    """Video scene segmentation over the frame algebra: a cut fires
    between adjacent sampled frames when their mean byte levels differ
    by more than 8 — written as the integer cross-multiplication
    |s_i*z_j - s_j*z_i| > 8*z_i*z_j so no float division exists (the
    mm13 discipline). Emits per-video cut count, scene count, and the
    longest scene run (cumulative-cut-sum segmentation, the standard
    run-id trick). The pre-clipping pass a video training pipeline runs
    before sampling clips: scene-straddling clips are garbage. Frames
    come from the SAME mapInPandas island as mm1/mm8 (every_n=1); all
    windows are per-video (8 rows), never global.
    See operators/multimodal.frame_byte_sums."""
    from crawler_spark.operators.multimodal import frame_byte_sums
    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.regexp_replace(F.col("text"), r"[^\x20-\x7E]", "")
        .alias("ascii_text"))
    src = (d.where(F.length("ascii_text") >= 8)
           .withColumn("payload_bin", F.encode("ascii_text", "UTF-8")))
    fr = frame_byte_sums(src, every_n=1, n_frames=8)
    wd = Window.partitionBy("doc_id").orderBy("frame_idx")
    ps = F.lag("frame_sum").over(wd)
    pz = F.lag("frame_bytes").over(wd)
    cut = F.when(
        ps.isNotNull()
        & (F.abs(F.col("frame_sum") * pz - ps * F.col("frame_bytes"))
           > 8 * F.col("frame_bytes") * pz), 1).otherwise(0)
    s = (fr.withColumn("cut", cut)
         .withColumn("scene", F.sum("cut").over(
             wd.rowsBetween(Window.unboundedPreceding,
                            Window.currentRow))))
    per = (s.groupBy("doc_id")
           .agg(F.sum("cut").cast("int").alias("n_cuts")))
    longest = (s.groupBy("doc_id", "scene")
               .agg(F.count(F.lit(1)).alias("_flen"))
               .groupBy("doc_id")
               .agg(F.max("_flen").cast("int").alias("longest_scene")))
    return (per.join(longest, "doc_id")
            .select("doc_id", "n_cuts",
                    (F.col("n_cuts") + 1).cast("int").alias("n_scenes"),
                    "longest_scene"))


@q("px14_rag_chunks", """
WITH w AS (SELECT doc_id,
                  regexp_split_to_array(trim(lower(text)), '\\s+') AS w
           FROM documents),
s AS (SELECT doc_id, w, len(w) AS n, unnest(range(0, len(w), 24)) AS st
      FROM w WHERE len(w) >= 1),
c AS (SELECT doc_id, st, n,
             list_slice(w, st + 1, least(st + 32, n)) AS sl
      FROM s)
SELECT doc_id, CAST(st // 24 AS INT) AS chunk_idx,
       CAST(st AS INT) AS start_word,
       CAST(len(sl) AS INT) AS n_words,
       md5(array_to_string(sl, ' ')) AS chunk_md5
FROM c
""")
def px14_rag_chunks(spark, sf_dir):
    """Sliding-window chunking for retrieval corpora / long-doc
    splitting: 32-word windows advancing by 24 (8-word overlap), last
    window short, chunk identity = md5 of the space-joined window so
    chunk-level dedup composes downstream. Pure map-side algebra —
    split once, sequence+posexplode+slice, ZERO shuffle, source
    partitioning preserved (the fan-out shape a 10^10-doc corpus
    needs). See operators/sampling.rag_chunk_spans."""
    from crawler_spark.operators.sampling import rag_chunk_spans
    d = _t(spark, sf_dir, "documents")
    return rag_chunk_spans(d, chunk=32, stride=24)


@q("ks7_heavy_hitters", """
WITH t AS (SELECT unnest(regexp_split_to_array(trim(lower(text)), '\\s+'))
                    AS word
           FROM documents),
n AS (SELECT count(*) AS n FROM t)
SELECT word, CAST(count(*) AS BIGINT) AS n_occ
FROM t, n
GROUP BY word, n.n
HAVING count(*) * 200 > n.n
""")
def ks7_heavy_hitters(spark, sf_dir):
    """Distributed two-pass frequent items (Misra-Gries 1982 family):
    every word whose corpus count strictly exceeds n/200, found WITHOUT
    a full-cardinality by-key shuffle — per-Arrow-batch local heavy
    hitters (bounded memory, < k rows each, sound by the MG covering
    argument) then an exact count of the tiny candidate set only. The
    strict final threshold makes the output batching-invariant and
    EQUAL to the exact answer, so a sketch pass sits under the hash
    gate; the oracle is the exact GROUP BY/HAVING the sketch avoids.
    The stopword-mining / vocab-head primitive over a 10^12-token
    corpus. See operators/sketches.heavy_hitters."""
    from crawler_spark.operators.sketches import heavy_hitters
    d = _t(spark, sf_dir, "documents")
    words = d.select(
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+"))
        .alias("word"))
    return heavy_hitters(words, "word", k=200)


@q("f15_retry_backoff", """
WITH e AS (SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS w,
                  (event_type <> 'error') AS ok FROM events),
lok AS (SELECT user_id, max(w) AS lok FROM e WHERE ok GROUP BY 1),
tf AS (SELECT e.user_id, CAST(count(*) AS INT) AS tail_fails,
              max(e.w) AS last_fail
       FROM e LEFT JOIN lok USING (user_id)
       WHERE NOT e.ok AND (lok.lok IS NULL OR e.w > lok.lok)
       GROUP BY 1),
mx AS (SELECT max(w) AS mx FROM e)
SELECT user_id, tail_fails, last_fail,
       last_fail + 3600 * (1 << least(tail_fails - 1, 6)) AS next_attempt,
       CAST(CASE WHEN last_fail + 3600 * (1 << least(tail_fails - 1, 6))
                      <= mx.mx THEN 1 ELSE 0 END AS INT) AS due
FROM tf, mx
""")
def f15_retry_backoff(spark, sf_dir):
    """Exponential retry backoff (the failure twin of rc1's TTL rule):
    per key, failures after the last success set next_attempt =
    last_fail + 3600 * 2^min(fails-1, 6) seconds — delay doubles per
    consecutive failure, integer shiftleft so the schedule is
    bit-stable cross-engine; `due` marks keys whose re-attempt time has
    passed the stream frontier. Two keyed partial aggs + one equi-join
    on the same key (no re-exchange under AQE), frontier a one-row
    broadcast. See operators/recrawl.retry_backoff."""
    from crawler_spark.operators.recrawl import retry_backoff
    e = _t(spark, sf_dir, "events")
    log = e.select("user_id",
                   F.unix_timestamp("ts").alias("w"),
                   (F.col("event_type") != "error").alias("ok"))
    out = retry_backoff(log, "user_id", "w", "ok", base=3600, cap_fails=6)
    mx = log.agg(F.max("w").alias("_mx"))
    return (out.crossJoin(F.broadcast(mx))
            .select("user_id", "tail_fails", "last_fail", "next_attempt",
                    F.when(F.col("next_attempt") <= F.col("_mx"), 1)
                     .otherwise(0).cast("int").alias("due")))


@q("ix11_champion_lists", f"""
WITH tok AS ({_IX_TOK_SQL}),
tf AS (SELECT doc_id, term, count(*) AS tf FROM tok
       WHERE term IN ('merge', 'vector', 'window') GROUP BY 1, 2),
ch AS (SELECT doc_id, term, tf,
              row_number() OVER (PARTITION BY term
                                 ORDER BY tf DESC, doc_id) AS rn
       FROM tf QUALIFY rn <= 15)
SELECT doc_id, CAST(sum(tf) AS BIGINT) AS score,
       CAST(count(*) AS INT) AS n_champ
FROM ch GROUP BY doc_id
""")
def ix11_champion_lists(spark, sf_dir):
    """Champion-list retrieval (IIR §7.1.3): each query term's top-15
    docs by tf, scored over the union of champion lists — serving cost
    bounded by |q|*r however long a stop-word's postings run. Per-term
    top-r is the few-huge-keys regime, so the engine runs the SALTED
    two-phase top-r (per-salt prune then true top-r over <= 16r
    survivors, selection-equal by the politeness-pre-prune argument);
    the oracle is the direct per-term window the engine must never plan
    at scale. See operators/invindex.champion_search."""
    from crawler_spark.operators.invindex import champion_search
    return champion_search(_t(spark, sf_dir, "documents"),
                           ["vector", "window", "merge"], r=15)


@q("ks8_decayed_counts", """
WITH e AS (SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) AS w
           FROM events),
mx AS (SELECT max(w) AS mx FROM e),
t AS (SELECT event_type,
             1.0 / CAST(1::BIGINT << CAST(least((mx.mx - w) // 3600, 32)
                                          AS INT) AS DOUBLE) AS wt
      FROM e, mx)
SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       round(sum(wt), 6) AS decayed
FROM t GROUP BY event_type
""")
def ks8_decayed_counts(spark, sf_dir):
    """Time-decayed frequency per event type (half-life 1h, cap 32
    buckets): each event adds 2^-age_hours — the recency-weighted
    counter behind trending detection and frontier priority decay.
    Base-2 integer-exponent decay keeps every term a dyadic rational,
    so the sum is EXACT and order-independent (no libm pow, no
    summation-order hazard) — a float aggregate under the hash gate
    with zero rounding debt. One map-side weight + one keyed rollup;
    frontier timestamp a one-row broadcast.
    See operators/sketches.decayed_counts."""
    from crawler_spark.operators.sketches import decayed_counts
    e = _t(spark, sf_dir, "events")
    return decayed_counts(e, "event_type", "ts", half_life_s=3600,
                          cap_buckets=32)


# =====================================================================
# Round-4 additions: nearest join, centroid drift, crawl equity,
# corpus dup mass, classifier calibration
# =====================================================================

@q("j11_nearest_join", """
WITH l AS (SELECT event_id, user_id,
                  CAST(floor(epoch(ts)) AS BIGINT) AS t FROM events),
u AS (SELECT DISTINCT user_id FROM events),
r AS (SELECT user_id,
             CAST(1704067200 + user_id * 3600 + k * 604800 AS BIGINT)
               AS v_from,
             'v' || CAST(k AS VARCHAR) AS version
      FROM u, range(0, 4) t(k)),
b AS (SELECT l.event_id, l.user_id, l.t, r.version AS bv, r.v_from AS bt
      FROM l ASOF LEFT JOIN r
        ON l.user_id = r.user_id AND l.t >= r.v_from),
f AS (SELECT l.event_id, min(r.v_from) AS ft,
             min_by(r.version, r.v_from) AS fv
      FROM l LEFT JOIN r
        ON l.user_id = r.user_id AND r.v_from > l.t
      GROUP BY 1)
SELECT b.event_id, b.user_id, b.t,
       CASE WHEN f.ft IS NULL
              OR (b.bt IS NOT NULL AND (b.t - b.bt) <= (f.ft - b.t))
            THEN b.bv ELSE f.fv END AS version,
       CASE WHEN f.ft IS NULL
              OR (b.bt IS NOT NULL AND (b.t - b.bt) <= (f.ft - b.t))
            THEN b.bt ELSE f.ft END AS v_from
FROM b LEFT JOIN f USING (event_id)
""")
def j11_nearest_join(spark, sf_dir):
    """Nearest-in-time join: each event picks the config version whose
    effective timestamp is CLOSEST (backward or forward; equal distance
    -> backward) — pandas merge_asof(direction='nearest') semantics,
    which plain ASOF (j6) cannot express. Engine: two union-and-window
    passes (backward + mirrored forward fill) and a map-side pick — no
    inequality join, O(events) rows; the oracle composes DuckDB ASOF
    with a min_by forward probe. Same per-user weekly version dim as
    j6. See operators/joins.nearest_join."""
    from crawler_spark.operators.joins import nearest_join
    e = _t(spark, sf_dir, "events")
    l = e.select("event_id", "user_id",
                 F.unix_timestamp("ts").cast("long").alias("t"))
    r = (e.select("user_id").distinct()
         .select("user_id",
                 F.explode(F.sequence(F.lit(0), F.lit(3))).alias("k"))
         .select("user_id",
                 (F.lit(1704067200) + F.col("user_id") * 3600
                  + F.col("k") * 604800).cast("long").alias("v_from"),
                 F.concat(F.lit("v"), F.col("k").cast("string"))
                  .alias("version")))
    out = nearest_join(l, r, on="user_id", left_ts="t", right_ts="v_from")
    return out.select("event_id", "user_id", "t", "version", "v_from")


@q("km2_centroid_drift", """
WITH q AS (SELECT vec_id, label,
                  CASE WHEN vec_id % 2 = 0 THEN 'a' ELSE 'b' END AS half,
                  list_transform(embedding,
                      x -> CAST(floor(CAST(x AS DOUBLE) * 64) AS BIGINT))
                    AS qv
           FROM embeddings),
v AS (SELECT label, half, s.d AS d, s.v AS v
      FROM (SELECT label, half,
                   unnest(list_transform(range(1, len(qv)+1),
                          i -> {'d': i, 'v': qv[i]})) AS s
            FROM q)),
agg AS (SELECT label, half, d, CAST(sum(v) AS BIGINT) AS s,
               CAST(count(*) AS BIGINT) AS n
        FROM v GROUP BY 1, 2, 3),
j AS (SELECT a.label, a.d, a.s * 1.0 / a.n - b.s * 1.0 / b.n AS diff,
             a.n AS na, b.n AS nb
      FROM agg a JOIN agg b ON a.label = b.label AND a.d = b.d
      WHERE a.half = 'a' AND b.half = 'b'),
g AS (SELECT label, max(na) AS n_a, max(nb) AS n_b,
             list(diff ORDER BY d) AS ds
      FROM j GROUP BY 1)
SELECT label, CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
       round(sqrt(list_reduce(list_prepend(0.0, ds),
                              (acc, x) -> acc + x * x)), 4) AS drift
FROM g
""")
def km2_centroid_drift(spark, sf_dir):
    """Per-IVF-cell centroid drift between two content-stable corpus
    halves (vec_id parity as the epoch proxy): the index-maintenance
    health check that decides when km1's coarse quantizer needs
    retraining, and the distribution-shift monitor between crawl
    snapshots. Integer-lattice sums (km1 discipline) + one division per
    coordinate + a dimension-ORDERED fold for the norm — no unordered
    float aggregation anywhere, so the drift is bit-stable under the
    hash gate. See operators/similarity.centroid_drift."""
    from crawler_spark.operators.similarity import centroid_drift
    e = _t(spark, sf_dir, "embeddings")
    return centroid_drift(e, split=(F.col("vec_id") % 2 == 0),
                          cell_col="label")


@q("w10_host_gini", """
WITH c AS (SELECT source AS host, CAST(count(*) AS BIGINT) AS x
           FROM documents GROUP BY 1),
r AS (SELECT host, x, row_number() OVER (ORDER BY x, host) AS i FROM c)
SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS sx,
       round((2 * sum(i * x) - (count(*) + 1) * sum(x)) * 1.0
             / (count(*) * sum(x)), 4) AS gini
FROM r
""")
def w10_host_gini(spark, sf_dir):
    """Crawl-equity metric: Gini coefficient of the per-host fetch
    allocation (0 = perfectly even, ->1 = one host hogs the budget) —
    the fairness number a politeness scheduler (w6/w7/w8) is judged by.
    The ascending rank runs through global_rank's distributed block
    shape (the oracle's naive unpartitioned row_number would be a
    single-task bug at 10^8 hosts); exact integer algebra to one final
    division. See operators/politeness.host_fairness_gini."""
    from crawler_spark.operators.politeness import host_fairness_gini
    d = _t(spark, sf_dir, "documents")
    counts = d.groupBy(F.col("source").alias("host")) \
              .agg(F.count(F.lit(1)).alias("x"))
    return host_fairness_gini(counts, "host", "x", n_blocks=8)


@q("dd18_dup_gram_mass", """
WITH sh AS (""" + _SHINGLE_SQL + """),
g AS (SELECT source AS stratum, unnest(sh) AS gram FROM sh),
pg AS (SELECT stratum, gram, CAST(count(*) AS BIGINT) AS occ
       FROM g GROUP BY 1, 2)
SELECT stratum, CAST(sum(occ) AS BIGINT) AS n_occurrences,
       CAST(count(*) AS BIGINT) AS n_distinct,
       round((sum(occ) - count(*)) * 1.0 / sum(occ), 4) AS dup_frac
FROM pg GROUP BY 1
""")
def dd18_dup_gram_mass(spark, sf_dir):
    """Corpus-slice duplicate 3-gram mass per source: the fraction of
    per-doc distinct gram instances that repeat an already-seen gram —
    the monitoring rollup over the pair-level dedup family (a rising
    value is the template-explosion/crawler-trap canary before any
    pair generation runs). Two-phase (stratum, gram) agg absorbs hot
    grams; exact integers to one division.
    See operators/textdedup.dup_gram_mass."""
    from crawler_spark.operators.textdedup import dup_gram_mass
    d = _t(spark, sf_dir, "documents")
    return dup_gram_mass(d, strata_col="source", shingle_n=3)


@q("a10_calibration_buckets", f"""
WITH s AS (SELECT CAST(floor(({_QUALITY_EXPR}) * 1000) AS BIGINT) AS sm,
                  CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
           FROM documents)
SELECT CAST(least(9, floor((sm * 10) / 1000.0)) AS INT) AS bucket,
       CAST(count(*) AS BIGINT) AS n,
       round(sum(sm) / (count(*) * 1000.0), 4) AS mean_score,
       round(sum(y) * 1.0 / count(*), 4) AS frac_pos
FROM s GROUP BY 1
""")
def a10_calibration_buckets(spark, sf_dir):
    """Reliability diagram of the tx2 quality score against the
    actually-English label (the score's stopword signal is en-based, so
    calibration against lang='en' is the natural check): per decile
    bucket, size, mean predicted score, observed positive rate. The
    ML-ops gate before a score is trusted as a keep-probability in
    px4/tx8 mixing. Integerized score -> exact BIGINT sums -> one
    division per output; one bucket-cardinality rollup.
    See operators/langmodel.calibration_buckets."""
    from crawler_spark.operators.langmodel import calibration_buckets
    from crawler_spark.functions.text import quality_score_col
    d = _t(spark, sf_dir, "documents")
    return calibration_buckets(
        d, score=quality_score_col(F.col("text")),
        label=(F.col("lang") == "en"))


@q("st13_stream_enrich", """
WITH u AS (SELECT DISTINCT user_id FROM events),
dim AS (SELECT user_id, 't' || CAST(user_id % 4 AS VARCHAR) AS tier,
               CAST(1 + user_id % 7 AS BIGINT) AS weight
        FROM u)
SELECT e.event_id, e.user_id, e.value, d.tier, d.weight,
       CAST(floor(e.value * d.weight) AS BIGINT) AS weighted
FROM events e LEFT JOIN dim d ON e.user_id = d.user_id
""")
def st13_stream_enrich(spark, sf_dir):
    """Stream-static enrichment join, batch twin: events pick up a
    per-user dim row (tier, weight) and a derived weighted value — the
    J2/J3 lookup as it runs inside a Structured Streaming micro-batch
    (stateless; dim re-evaluated per batch = live refresh; broadcast so
    the stream never shuffles). The streaming form is
    streaming/joins.enrich_stream, equality-tested against this twin in
    tests/test_streaming.py."""
    e = _t(spark, sf_dir, "events")
    dim = (e.select("user_id").distinct()
           .select("user_id",
                   F.concat(F.lit("t"), (F.col("user_id") % 4)
                            .cast("string")).alias("tier"),
                   (F.lit(1) + F.col("user_id") % 7).cast("long")
                   .alias("weight")))
    from crawler_spark.streaming.joins import enrich_stream
    out = enrich_stream(e, dim, "user_id")
    return out.select("event_id", "user_id", "value", "tier", "weight",
                      F.floor(F.col("value") * F.col("weight"))
                      .cast("long").alias("weighted"))


@q("ix12_proximity", """
WITH t AS (SELECT doc_id,
                  list_filter(regexp_split_to_array(lower(trim(text)),
                                                    '\\s+'),
                              x -> x <> '') AS toks
           FROM documents),
p AS (SELECT doc_id,
             list_filter(range(1, len(toks) + 1),
                         i -> toks[i] = 'hash') AS pa,
             list_filter(range(1, len(toks) + 1),
                         i -> toks[i] = 'join') AS pb
      FROM t),
c AS (SELECT doc_id,
             CAST(list_sum(list_transform(pa,
                  x -> len(list_filter(pb, y -> abs(x - y) <= 8))))
               AS BIGINT) AS n_pairs,
             CAST(list_min(flatten(list_transform(pa,
                  x -> list_transform(list_filter(pb,
                           y -> abs(x - y) <= 8),
                       y -> abs(x - y))))) AS BIGINT) AS min_dist
      FROM p WHERE len(pa) > 0 AND len(pb) > 0)
SELECT doc_id, n_pairs, min_dist FROM c WHERE n_pairs > 0
""")
def ix12_proximity(spark, sf_dir):
    """Proximity retrieval NEAR/8 for ('hash', 'join'): docs where the
    terms co-occur within 8 token positions, with pair count and
    minimum distance — the serving primitive between conjunctive AND
    (ix2, too loose) and exact phrase (ix3, too strict). Engine: the
    j8 bucket-expansion equi-join over token positions (never the
    per-doc position cross product); the oracle enumerates position
    pairs directly over the token lists.
    See operators/invindex.proximity_search."""
    from crawler_spark.operators.invindex import proximity_search
    return proximity_search(_t(spark, sf_dir, "documents"),
                            "hash", "join", k=8)


@q("a11_auc_ranksum", f"""
WITH s AS (SELECT CAST(floor(({_QUALITY_EXPR}) * 1000) AS BIGINT) AS sm,
                  CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
           FROM documents),
g AS (SELECT sm, count(*) AS c, sum(y) AS cp FROM s GROUP BY 1),
w AS (SELECT sm, c, cp,
             coalesce(sum(c) OVER (ORDER BY sm
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS f
      FROM g),
t AS (SELECT sum(cp * (2 * f + c + 1)) AS r2, sum(cp) AS npos,
             sum(c - cp) AS nneg
      FROM w)
SELECT CAST(npos AS BIGINT) AS n_pos, CAST(nneg AS BIGINT) AS n_neg,
       round((r2 - npos * (npos + 1)) / (2.0 * npos * nneg), 4) AS auc
FROM t
""")
def a11_auc_ranksum(spark, sf_dir):
    """ROC-AUC of the tx2 quality score against the actually-English
    label, via the Mann-Whitney rank-sum identity with midrank ties —
    the discrimination twin of a10's calibration diagram (the two
    checks every corpus-gating classifier passes together). Exact
    BIGINT rank algebra (2*R_pos stays integral under ties) down to one
    division + round(4). Scale shape: one partial-agged rollup to
    distinct-score cardinality (<= 1001 rows by score resolution — the
    window input is resolution-bounded, not data-bounded).
    See operators/langmodel.auc_ranksum."""
    from crawler_spark.functions.text import quality_score_col
    from crawler_spark.operators.langmodel import auc_ranksum
    d = _t(spark, sf_dir, "documents")
    return auc_ranksum(d, score=quality_score_col(F.col("text")),
                       label=(F.col("lang") == "en"))


@q("ks9_ams_f2", """
WITH r AS (SELECT unnest(range(0, 16)) AS r),
s AS (SELECT r.r,
             sum(CASE WHEN substr(md5(CAST(e.user_id AS VARCHAR)
                                  || '|' || CAST(r.r AS VARCHAR)), 1, 1)
                      IN ('0','2','4','6','8','a','c','e')
                 THEN 1 ELSE -1 END) AS x
      FROM events e CROSS JOIN r GROUP BY 1),
g AS (SELECT r // 4 AS grp, sum(x * x) AS sg FROM s GROUP BY 1),
m AS (SELECT list_sort(list(sg)) AS l FROM g),
ex AS (SELECT sum(c * c) AS f2 FROM (
        SELECT user_id, count(*) AS c FROM events GROUP BY 1))
SELECT CAST(ex.f2 AS BIGINT) AS true_f2,
       round((m.l[2] + m.l[3]) / 8.0, 4) AS est_f2,
       round(abs((m.l[2] + m.l[3]) / 8.0 - ex.f2) / ex.f2, 4) AS rel_err
FROM m CROSS JOIN ex
""")
def ks9_ams_f2(spark, sf_dir):
    """AMS tug-of-war F2 sketch over events.user_id: estimates the
    self-join size Σ count(k)² — the statistic a planner consults
    before shuffling a join on the key, and the skew canary for the
    politeness salting decision (J5). 16 estimators, median-of-means
    over 4 groups; sign hashes from md5 parity so the sketch is
    cross-engine bit-exact; the data is never shuffled (map-side sign
    columns -> one partial agg), with the exact-F2 groupBy kept as the
    accuracy-audit twin. In DuckDB the estimator fan-out is a 16-way
    cross join; in Spark it is 16 map-side columns — same algebra.
    See operators/sketches.ams_f2."""
    from crawler_spark.operators.sketches import ams_f2
    e = _t(spark, sf_dir, "events")
    return ams_f2(e, F.col("user_id"), n_est=16, n_groups=4)


_IX13_TERMS = ("scan", "filter", "hash")


@q("ix13_vsm_cosine", f"""
WITH w AS (SELECT doc_id,
                  list_filter(regexp_split_to_array(lower(trim(text)),
                                                    '\\s+'),
                              x -> x <> '') AS toks
           FROM documents),
t AS (SELECT doc_id, unnest(toks) AS term FROM w),
tf AS (SELECT doc_id, term, count(*) AS tf FROM t GROUP BY 1, 2),
n AS (SELECT count(*) AS n FROM documents),
dfv AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
wtd AS (SELECT doc_id, term,
               tf * (ln((n.n + 1.0) / (dfv.df + 1.0)) + 1.0) AS w
        FROM tf JOIN dfv USING (term) CROSS JOIN n),
norms AS (SELECT doc_id, sqrt(sum(w * w)) AS dnorm FROM wtd GROUP BY 1),
qw AS (SELECT term, ln((n.n + 1.0) / (dfv.df + 1.0)) + 1.0 AS qw
       FROM dfv CROSS JOIN n WHERE term IN {_IX13_TERMS!r}),
qn AS (SELECT sqrt(sum(qw * qw)) AS qnorm FROM qw),
dots AS (SELECT doc_id, sum(w * qw) AS dot FROM wtd JOIN qw USING (term)
         GROUP BY 1)
SELECT d.doc_id, round(d.dot / (norms.dnorm * qn.qnorm), 4) AS cosine
FROM dots d JOIN norms USING (doc_id) CROSS JOIN qn
""")
def ix13_vsm_cosine(spark, sf_dir):
    """Classic vector-space tf-idf cosine ranking of every document
    against a fixed query — the third retrieval scorer next to BM25
    (tx11) and the query-likelihood LM (ix7), completing the lexical
    ranking triad a serving stack A/B-tests. Full-vector document norms
    (computed once per corpus, amortized across queries); the query
    side broadcasts, so scoring reuses the (term, doc) tf layout and
    never reshuffles the corpus.
    See operators/invindex.vsm_cosine."""
    from crawler_spark.operators.invindex import vsm_cosine
    return vsm_cosine(_t(spark, sf_dir, "documents"), list(_IX13_TERMS))


@q("tx28_fuzzy_decontaminate", "WITH " + _LSH_CTES + """,
ev AS (SELECT band, key, s.doc_id AS eval_id
       FROM bands JOIN sh s USING (doc_id) WHERE s.source = 'src0'),
hits AS (SELECT DISTINCT c.doc_id, ev.eval_id
         FROM bands c JOIN sh cs ON cs.doc_id = c.doc_id
         JOIN ev ON c.band = ev.band AND c.key = ev.key
         WHERE cs.source <> 'src0'),
jac AS (SELECT h.doc_id, h.eval_id,
               round(len(list_intersect(a.sh, b.sh)) * 1.0 /
                     (len(a.sh) + len(b.sh)
                      - len(list_intersect(a.sh, b.sh))), 4) AS jac
        FROM hits h JOIN sh a ON a.doc_id = h.doc_id
        JOIN sh b ON b.doc_id = h.eval_id)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_matches,
       max(jac) AS max_jaccard
FROM jac WHERE jac >= 0.5 GROUP BY 1
""")
def tx28_fuzzy_decontaminate(spark, sf_dir):
    """Fuzzy eval-set decontamination: corpus docs whose MinHash-LSH
    bands collide with an eval doc (source='src0' stands in for the
    benchmark) AND whose true 3-gram Jaccard >= 0.5 — the
    paraphrase-robust companion to tx5's exact-gram gate. The eval
    side's banded signatures broadcast; the corpus streams through one
    map-side band projection and never self-joins.
    See operators/textdedup.fuzzy_decontaminate."""
    from crawler_spark.operators.textdedup import fuzzy_decontaminate
    d = _t(spark, sf_dir, "documents")
    return fuzzy_decontaminate(d, is_eval=(F.col("source") == "src0"),
                               min_jaccard=0.5)


@q("g30_ktruss", f"""
WITH d0 AS MATERIALIZED ({_G8_EDGES_SQL}),
e0 AS MATERIALIZED (SELECT DISTINCT least(src, dst) AS u,
                           greatest(src, dst) AS v FROM d0
                    WHERE src <> dst),
t1 AS MATERIALIZED (SELECT w.a, w.b, w.c FROM (
    SELECT e1.u AS a, e1.v AS b, e2.v AS c FROM e0 e1
    JOIN e0 e2 ON e1.u = e2.u AND e1.v < e2.v) w
    JOIN e0 e3 ON e3.u = w.b AND e3.v = w.c),
s1 AS MATERIALIZED (SELECT u, v, count(*) AS sup FROM (
    SELECT a AS u, b AS v FROM t1 UNION ALL SELECT a, c FROM t1
    UNION ALL SELECT b, c FROM t1) GROUP BY 1, 2),
e1 AS MATERIALIZED (SELECT e.u, e.v FROM e0 e
    LEFT JOIN s1 s ON e.u = s.u AND e.v = s.v
    WHERE coalesce(s.sup, 0) >= 6),
t2 AS MATERIALIZED (SELECT w.a, w.b, w.c FROM (
    SELECT e1.u AS a, e1.v AS b, e2.v AS c FROM e1 e1
    JOIN e1 e2 ON e1.u = e2.u AND e1.v < e2.v) w
    JOIN e1 e3 ON e3.u = w.b AND e3.v = w.c),
s2 AS MATERIALIZED (SELECT u, v, count(*) AS sup FROM (
    SELECT a AS u, b AS v FROM t2 UNION ALL SELECT a, c FROM t2
    UNION ALL SELECT b, c FROM t2) GROUP BY 1, 2),
e2 AS MATERIALIZED (SELECT e.u, e.v FROM e1 e
    LEFT JOIN s2 s ON e.u = s.u AND e.v = s.v
    WHERE coalesce(s.sup, 0) >= 6),
t3 AS MATERIALIZED (SELECT w.a, w.b, w.c FROM (
    SELECT e1.u AS a, e1.v AS b, e2.v AS c FROM e2 e1
    JOIN e2 e2 ON e1.u = e2.u AND e1.v < e2.v) w
    JOIN e2 e3 ON e3.u = w.b AND e3.v = w.c),
s3 AS MATERIALIZED (SELECT u, v, count(*) AS sup FROM (
    SELECT a AS u, b AS v FROM t3 UNION ALL SELECT a, c FROM t3
    UNION ALL SELECT b, c FROM t3) GROUP BY 1, 2)
SELECT e.u, e.v, CAST(coalesce(s.sup, 0) AS BIGINT) AS support
FROM e2 e LEFT JOIN s3 s ON e.u = s.u AND e.v = s.v
""")
def g30_ktruss(spark, sf_dir):
    """8-truss of the host link graph (Cohen 2008, fixed 2-round edge
    peel): edges sitting in >= 6 triangles of the current subgraph —
    the edge-level strengthening of g9's k-core that degree alone can't
    fake (a star hub has high degree, zero support), the standard dense-
    community/link-farm carve. Same edge fixture as g8/g9; engine loop
    in clusters.ktruss_peel (wedge join + partial-agged support rollup
    per round, lineage cut per round); the oracle unrolls the identical
    rounds under MATERIALIZED CTEs (each round references its
    predecessor 3x — inlined, the unroll is 3^rounds scans).
    Converges at this fixture inside 2 rounds (asserted in tests)."""
    from crawler_spark.operators.clusters import ktruss_peel
    d = _t(spark, sf_dir, "documents")
    h = F.substring("source", 4, 10).cast("int")
    dst = F.concat(F.lit("src"),
                   ((F.col("doc_id") * 7 + 3) % (1 + (h % 20)))
                   .cast("string"))
    e0 = (d.select(F.col("source").alias("src"), dst.alias("dst"))
          .where(F.col("src") != F.col("dst")).distinct())
    return ktruss_peel(e0, k=8, rounds=2)


@q("an15_ivf_multiprobe", """
WITH qz AS (SELECT vec_id, label,
                   list_transform(embedding,
                       x -> CAST(floor(CAST(x AS DOUBLE) * 64) AS BIGINT))
                     AS qv
            FROM embeddings),
ex AS (SELECT label AS cell, s.d AS d, s.v AS v
       FROM (SELECT label,
                    unnest(list_transform(range(1, len(qv)+1),
                           i -> {'d': i, 'v': qv[i]})) AS s
             FROM qz)),
cent AS (SELECT cell, d,
                CAST(floor(CAST(sum(v) AS DOUBLE) / count(*)) AS BIGINT)
                  AS cv
         FROM ex GROUP BY 1, 2),
qx AS (SELECT vec_id AS qid, s.d AS d, s.v AS qval
       FROM (SELECT vec_id,
                    unnest(list_transform(range(1, len(qv)+1),
                           i -> {'d': i, 'v': qv[i]})) AS s
             FROM qz WHERE vec_id IN (0, 1, 2, 3))),
d2 AS (SELECT qx.qid, c.cell,
              sum((qx.qval - c.cv) * (qx.qval - c.cv)) AS d2
       FROM qx JOIN cent c USING (d) GROUP BY 1, 2),
probes AS (SELECT qid, cell FROM (
    SELECT qid, cell, row_number() OVER (PARTITION BY qid
                                         ORDER BY d2, cell) AS rk
    FROM d2) WHERE rk <= 2),
qq AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qvec
       FROM embeddings WHERE vec_id IN (0, 1, 2, 3)),
scored AS (SELECT p.qid, e.vec_id,
                  round(list_cosine_similarity(e.embedding::DOUBLE[],
                                               qq.qvec), 4) AS cosine
           FROM probes p JOIN embeddings e ON e.label = p.cell
           JOIN qq ON qq.qid = p.qid
           WHERE e.vec_id <> p.qid)
SELECT qid, vec_id, cosine, CAST(rnk AS BIGINT) AS rnk FROM (
  SELECT qid, vec_id, cosine,
         row_number() OVER (PARTITION BY qid
                            ORDER BY cosine DESC, vec_id) AS rnk
  FROM scored) WHERE rnk <= 10
""")
def an15_ivf_multiprobe(spark, sf_dir):
    """Multi-probe IVF top-10 (nprobe=2) for 4 query vectors: the
    recall knob between 1-probe IVF (an2) and brute force (an1) — a
    query near a Voronoi boundary finds across-the-border neighbors
    without the full scan. Cell ranking by query→centroid distance on
    km1's integer lattice (floor-mean centroids, integer L2 — the only
    way an iterative-geometry decision sits under the cross-engine hash
    gate); in-cell scoring is the exact an1 cosine.
    See operators/similarity.ivf_multiprobe."""
    from crawler_spark.operators.similarity import ivf_multiprobe
    e = _t(spark, sf_dir, "embeddings")
    qs = e.where(F.col("vec_id").isin(0, 1, 2, 3))
    return ivf_multiprobe(e, qs, k=10, nprobe=2, scale=64)


@q("dd19_prefix_filter_join", """
WITH sh AS (""" + _SHINGLE_SQL + """),
p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             len(list_intersect(a.sh, b.sh)) AS inter,
             len(a.sh) AS na, len(b.sh) AS nb
      FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
SELECT doc_a, doc_b,
       round(inter * 1.0 / (na + nb - inter), 4) AS jaccard
FROM p WHERE round(inter * 1.0 / (na + nb - inter), 4) >= 0.5
""")
def dd19_prefix_filter_join(spark, sf_dir):
    """EXACT Jaccard>=0.5 similarity self-join via rarest-token prefix
    filtering (SSJoin/PPJoin) — the lossless counterpart to dd3's LSH
    and dd4's df-capped candidates: the oracle here is BRUTE-FORCE
    all-pairs, so the hash gate proves the prefix prune drops no pair.
    Candidates are indexed only on each doc's (1-t)-fraction rarest
    grams (the organic hot-bucket guard); verify is the dd4
    carried-size shape. See operators/textdedup.prefix_filter_pairs."""
    from crawler_spark.operators.textdedup import prefix_filter_pairs
    return prefix_filter_pairs(_t(spark, sf_dir, "documents"),
                               threshold=0.5, shingle_n=3)


@q("a12_average_precision", f"""
WITH s AS (SELECT doc_id,
                  CAST(floor(({_QUALITY_EXPR}) * 1000) AS BIGINT) AS sm,
                  CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
           FROM documents),
r AS (SELECT doc_id, y,
             row_number() OVER (ORDER BY sm DESC, doc_id) AS gr
      FROM s),
p AS (SELECT gr, row_number() OVER (ORDER BY gr) AS pr
      FROM r WHERE y = 1)
SELECT CAST(count(*) AS BIGINT) AS n_pos,
       round(sum(pr * 1.0 / gr) / count(*), 4) AS avg_precision
FROM p
""")
def a12_average_precision(spark, sf_dir):
    """Average precision of the tx2 quality score against the English
    label — the imbalance-robust companion to a11's AUC (AUC saturates
    when positives are rare; AP reports the precision actually paid at
    each positive's rank). Deterministic total order (score desc,
    doc_id) instead of a midrank convention; BOTH ranks run as
    global_rank's distributed block-prefix shape, never a single-task
    global window. See operators/langmodel.average_precision."""
    from crawler_spark.functions.text import quality_score_col
    from crawler_spark.operators.langmodel import average_precision
    d = _t(spark, sf_dir, "documents")
    return average_precision(d, score=quality_score_col(F.col("text")),
                             label=(F.col("lang") == "en"))


@q("tk4_oov_rate", """
WITH w AS (SELECT lang,
                  ('0x' || substr(md5(source || '/' || doc_id), 1, 8))
                    ::BIGINT % 1000 < 50 AS _val,
                  unnest(list_filter(regexp_split_to_array(
                      lower(trim(text)), '\\s+'), x -> x <> '')) AS word
           FROM documents),
vocab AS (SELECT word FROM (
    SELECT word, count(*) AS c FROM w WHERE NOT _val GROUP BY 1)
    ORDER BY c DESC, word LIMIT 16)
SELECT w.lang, CAST(count(*) AS BIGINT) AS n_words,
       CAST(sum(CASE WHEN v.word IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_oov,
       round(sum(CASE WHEN v.word IS NULL THEN 1 ELSE 0 END) * 1.0
             / count(*), 4) AS oov_rate
FROM w LEFT JOIN vocab v USING (word) WHERE w._val
GROUP BY 1
""")
def tk4_oov_rate(spark, sf_dir):
    """Held-out OOV rate per language of a top-16 word vocabulary fit
    on the train slice only (tx9's md5 coin) — the coverage audit that
    pairs with tk3's fertility when sizing a tokenizer vocab; fitting
    and measuring on the same slice would bias the rate down, so the
    split is part of the contract. Top-v is TakeOrderedAndProject over
    word cardinality; the 16-row vocab broadcasts onto the held-out
    stream. See operators/bpe.oov_rate."""
    from crawler_spark.operators.bpe import oov_rate
    return oov_rate(_t(spark, sf_dir, "documents"), v=16)


@q("tx29_gopher_gates", """
WITH s AS (SELECT source,
                  list_filter(regexp_split_to_array(lower(trim(text)),
                                                    '\\s+'),
                              x -> x <> '') AS w,
                  length(trim(text)) AS nc
           FROM documents),
g AS (SELECT source, nc, len(w) AS n,
             len(list_filter(w,
                 x -> regexp_matches(x, '^[a-z]+$'))) AS na,
             len(list_intersect(list_distinct(w),
                 ['the', 'a', 'of', 'to', 'and'])) AS ns,
             COALESCE(list_sum(list_transform(w, x -> length(x))),
                      0)::BIGINT AS wl
      FROM s)
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN NOT (n >= 50 AND n <= 100000)
                THEN 1 ELSE 0 END) AS BIGINT) AS n_fail_len,
       CAST(sum(CASE WHEN NOT (wl >= 3 * n AND wl <= 10 * n)
                THEN 1 ELSE 0 END) AS BIGINT) AS n_fail_wordlen,
       CAST(sum(CASE WHEN NOT (10 * na >= 8 * n)
                THEN 1 ELSE 0 END) AS BIGINT) AS n_fail_alpha,
       CAST(sum(CASE WHEN NOT (ns >= 2)
                THEN 1 ELSE 0 END) AS BIGINT) AS n_fail_stop,
       CAST(sum(CASE WHEN (n >= 50 AND n <= 100000)
                      AND (wl >= 3 * n AND wl <= 10 * n)
                      AND (10 * na >= 8 * n) AND (ns >= 2)
                THEN 1 ELSE 0 END) AS BIGINT) AS n_keep
FROM g GROUP BY 1
""")
def tx29_gopher_gates(spark, sf_dir):
    """Gopher (MassiveText) rule-based filter breakdown per source:
    per-rule kill counts + survivors — the threshold-tuning view a
    blended score (tx2) cannot give (word-length kills = OCR garbage;
    stop-word kills = non-English leakage). All-integer outputs, one
    let-bound fold per row, one group-cardinality rollup.
    See operators/langmodel.gopher_gates."""
    from crawler_spark.operators.langmodel import gopher_gates
    return gopher_gates(_t(spark, sf_dir, "documents"))


@q("ks10_bloom_fpr", """
WITH keys AS (SELECT DISTINCT 'u' || CAST(user_id AS VARCHAR) AS key
              FROM events WHERE user_id % 2 = 0),
cand AS (SELECT DISTINCT 'c' || CAST(user_id AS VARCHAR) AS key
         FROM events),
absent AS (SELECT key FROM cand
           WHERE key NOT IN (SELECT key FROM keys)),
pos AS (SELECT DISTINCT
               ('0x' || substr(md5(CAST(j AS VARCHAR) || ':' || key),
                               1, 8))::BIGINT % 1024 AS pos
        FROM keys CROSS JOIN (SELECT unnest(range(0, 4)) AS j) t),
cp AS (SELECT key,
              ('0x' || substr(md5(CAST(j AS VARCHAR) || ':' || key),
                              1, 8))::BIGINT % 1024 AS cpos
       FROM absent CROSS JOIN (SELECT unnest(range(0, 4)) AS j) t),
probe AS (SELECT cp.key,
                 sum(CASE WHEN p.pos IS NOT NULL THEN 1 ELSE 0 END)
                   AS hits
          FROM cp LEFT JOIN pos p ON p.pos = cp.cpos GROUP BY 1),
stats AS (SELECT count(*) AS n_absent,
                 sum(CASE WHEN hits = 4 THEN 1 ELSE 0 END) AS n_fp
          FROM probe),
nk AS (SELECT count(*) AS n FROM keys),
nb AS (SELECT count(*) AS b FROM pos)
SELECT CAST(nk.n AS BIGINT) AS n_keys,
       CAST(nb.b AS BIGINT) AS n_bits_set,
       CAST(stats.n_absent AS BIGINT) AS n_absent,
       CAST(stats.n_fp AS BIGINT) AS n_false_pos,
       round(stats.n_fp * 1.0 / stats.n_absent, 4) AS fpr_measured,
       round(power(1 - power(1 - 1.0 / 1024, 4 * nk.n), 4), 4)
         AS fpr_theory
FROM nk CROSS JOIN nb CROSS JOIN stats
""")
def ks10_bloom_fpr(spark, sf_dir):
    """Bloom FPR calibration on the events key space: filter built from
    even user ids ('u' namespace), probed with an entirely-absent 'c'
    namespace — measured false-positive rate vs the analytic
    (1-(1-1/m)^(kn))^k, the capacity check run before sizing the A5
    URL-seen prefilter (every false positive costs a shuffled lookup
    downstream). Same md5 bit-position family as ks6, so the false
    positives THEMSELVES are cross-engine identical.
    See operators/sketches.bloom_fpr_audit."""
    from crawler_spark.operators.sketches import bloom_fpr_audit
    e = _t(spark, sf_dir, "events")
    keys = (e.where(F.col("user_id") % 2 == 0)
            .select(F.concat(F.lit("u"), F.col("user_id").cast("string"))
                    .alias("key")))
    cand = e.select(F.concat(F.lit("c"), F.col("user_id").cast("string"))
                    .alias("key"))
    return bloom_fpr_audit(keys, cand, m=1024, k=4)


@q("px15_dataset_card", f"""
WITH d AS (SELECT source, lang,
                  CAST({_NW} AS BIGINT) AS nw,
                  CAST(length(text) AS BIGINT) AS nc,
                  CAST(floor(({_QUALITY_EXPR}) * 1000) AS BIGINT) AS sm,
                  md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))
                    AS fp
           FROM documents),
fpc AS (SELECT fp, count(*) AS fn FROM d GROUP BY 1),
j AS (SELECT d.*, CASE WHEN fpc.fn > 1 THEN 1 ELSE 0 END AS dup
      FROM d JOIN fpc USING (fp))
SELECT COALESCE(source, '(all)') AS source,
       COALESCE(lang, '(all)') AS lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(nw) AS BIGINT) AS n_words,
       CAST(sum(nc) AS BIGINT) AS n_chars,
       CAST(sum(dup) AS BIGINT) AS n_dup_docs,
       round(sum(sm) / (count(*) * 1000.0), 4) AS mean_quality
FROM j GROUP BY ROLLUP(source, lang)
""")
def px15_dataset_card(spark, sf_dir):
    """Dataset card: the per-slice release statistics (docs, words,
    chars, exact-dup count, mean quality) at every granularity of
    source -> lang plus the corpus total, in ONE ROLLUP pass (one
    Expand + one shuffle — not three scans). Dup flags from one
    fingerprint-cardinality groupBy joined back; quality integerized so
    slice means are exact sums to one division; null keys sentineled
    '(all)' (st5 convention). See operators/sampling.dataset_card."""
    from crawler_spark.functions.text import quality_score_col
    from crawler_spark.operators.sampling import dataset_card
    from crawler_spark.operators.textdedup import fingerprint_col
    d = _t(spark, sf_dir, "documents")
    return dataset_card(d, score=quality_score_col(F.col("text")),
                        fp=fingerprint_col(F.col("text")))


@q("a13_brier_decomposition", f"""
WITH s AS (SELECT CAST(floor(({_QUALITY_EXPR}) * 1000) AS BIGINT) AS sm,
                  CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
           FROM documents),
bk AS (SELECT CAST(least(9, floor((sm * 10) / 1000.0)) AS INT) AS bucket,
              CAST(count(*) AS BIGINT) AS n,
              CAST(sum(sm) AS BIGINT) AS ssm,
              CAST(sum(y) AS BIGINT) AS sy,
              CAST(sum(sm * sm) AS BIGINT) AS ssq,
              CAST(sum((sm - 1000 * y) * (sm - 1000 * y)) AS BIGINT) AS sbr,
              CAST(sum(sm * y) AS BIGINT) AS ssmy
       FROM s GROUP BY 1),
g AS (SELECT CAST(sum(n) AS BIGINT) AS nn, CAST(sum(sy) AS BIGINT) AS tsy,
             CAST(sum(sbr) AS BIGINT) AS tsbr
      FROM bk),
t AS (SELECT bucket,
             ((ssm - 1000 * sy) * 1.0) * ((ssm - 1000 * sy) * 1.0) / n AS tk,
             (sy / n - g.tsy / g.nn) * (sy / n - g.tsy / g.nn) * n AS rk,
             ssq - (ssm * 1.0) * ssm / n AS wk,
             ssmy - (ssm * 1.0) * sy / n AS ck
      FROM bk CROSS JOIN g),
f AS (SELECT list_reduce(list(tk ORDER BY bucket), (a, b) -> a + b) AS tt,
             list_reduce(list(rk ORDER BY bucket), (a, b) -> a + b) AS rr,
             list_reduce(list(wk ORDER BY bucket), (a, b) -> a + b) AS ww,
             list_reduce(list(ck ORDER BY bucket), (a, b) -> a + b) AS cc
      FROM t)
SELECT g.nn AS n_docs,
       round(g.tsbr / (g.nn * 1000000.0), 4) AS brier,
       round(f.tt / (g.nn * 1000000.0), 4) AS reliability,
       round(f.rr / g.nn, 4) AS resolution,
       round((g.tsy / g.nn) * ((g.nn - g.tsy) / g.nn), 4) AS uncertainty,
       round(f.ww / (g.nn * 1000000.0), 4) AS within_var,
       round(2.0 * f.cc / (g.nn * 1000.0), 4) AS within_cov
FROM g CROSS JOIN f
""")
def a13_brier_decomposition(spark, sf_dir):
    """Brier score + Murphy decomposition of the tx2 quality score
    against the actually-English label (the a10 pairing): reliability /
    resolution / uncertainty / within-bucket variance over the same 10
    score bins — completing the classifier-eval suite (a10 calibration,
    a11 AUC, a12 AP, a13 proper-scoring-rule decomposition), with the
    two continuous-score correction terms that make the Murphy identity
    exact (brier = rel - res + unc + within_var - within_cov). Exact
    BIGINT bucket sums; the cross-bucket reductions are <=10-element
    folds in pinned bucket order so both engines produce bit-identical
    doubles under round(4). One bucket-cardinality rollup — corpus
    touched once, map-side.
    See operators/langmodel.brier_decomposition."""
    from crawler_spark.functions.text import quality_score_col
    from crawler_spark.operators.langmodel import brier_decomposition
    d = _t(spark, sf_dir, "documents")
    return brier_decomposition(
        d, score=quality_score_col(F.col("text")),
        label=(F.col("lang") == "en"))


@q("ix14_wand_bounds", f"""
WITH w AS (SELECT doc_id,
                  list_filter(regexp_split_to_array(lower(trim(text)),
                                                    '\\s+'),
                              t -> t <> '') AS w
           FROM documents),
g AS (SELECT count(*) AS n, avg(len(w)) AS avgdl FROM w),
t AS (SELECT doc_id, len(w) AS dl, unnest(w) AS term FROM w),
tf AS (SELECT term, doc_id, dl, count(*) AS tf FROM t GROUP BY 1, 2, 3),
a AS (SELECT term, CAST(count(*) AS BIGINT) AS df,
             CAST(max(tf) AS BIGINT) AS max_tf,
             max(tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / g.avgdl)))
               AS maxc,
             max(g.n) AS n
      FROM tf CROSS JOIN g GROUP BY term)
SELECT term, df, max_tf,
       round(ln(1.0 + (n - df + 0.5) / (df + 0.5)) * maxc, 4) AS ub_bm25
FROM a
""")
def ix14_wand_bounds(spark, sf_dir):
    """Per-term BM25 upper-bound table for WAND/MaxScore dynamic pruning
    (Broder et al. 2003): for every vocabulary term, df, max per-doc tf,
    and the maximum BM25 contribution one posting can add — the
    precomputed impact bounds that let a query processor skip documents
    provably below the top-k threshold (the retrieval-serving companion
    to ix11's champion lists). idf is constant per term, so the max is
    taken over the idf-free posting factor (MAX is order-exact on
    bit-identical per-posting doubles, unlike SUM) and multiplied once.
    Reuses the ix1 (term, doc) partial-agged tf shuffle + one
    term-cardinality rollup; (n, avgdl) broadcasts.
    See operators/invindex.wand_upper_bounds."""
    from crawler_spark.operators.invindex import wand_upper_bounds
    return wand_upper_bounds(_t(spark, sf_dir, "documents"))


@q("px16_packing_efficiency", f"""
WITH t AS (SELECT doc_id, {_TX3_TOKENS} AS n_tokens FROM documents),
c AS (
  SELECT doc_id, n_tokens,
         COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  0)::BIGINT AS prev_tokens
  FROM t),
p AS (SELECT doc_id, n_tokens, prev_tokens,
             (prev_tokens // 1024)::BIGINT AS seq_id,
             ((prev_tokens + n_tokens - 1) // 1024)::BIGINT AS end_seq
      FROM c WHERE n_tokens > 0),
s AS (SELECT seq_id,
             CAST(count(*) AS BIGINT) AS n_docs_started,
             CAST(sum(CASE WHEN end_seq > seq_id THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_straddlers,
             CAST(max(end_seq) AS BIGINT) AS max_end
      FROM p GROUP BY seq_id),
g AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
             CAST(max(prev_tokens + n_tokens) AS BIGINT) AS corpus_end
      FROM p)
SELECT s.seq_id, s.n_docs_started, s.n_straddlers,
       CAST(CASE WHEN (s.seq_id + 1) * 1024 <= g.corpus_end THEN 1024
                 ELSE g.corpus_end - s.seq_id * 1024 END AS BIGINT)
         AS fill_tokens,
       CAST(CASE WHEN (s.seq_id + 1) * 1024 <= g.corpus_end THEN 0
                 ELSE (s.seq_id + 1) * 1024 - g.corpus_end END AS BIGINT)
         AS pad_tokens
FROM s CROSS JOIN g
""")
def px16_packing_efficiency(spark, sf_dir):
    """Packing-efficiency report over the px3 concat-then-chunk layout:
    per 1024-token training sequence, how many documents START in it,
    how many of those straddle into the next sequence (each straddler is
    a cross-document attention boundary the loader must mask or accept),
    and the fill/padding token split (only the final partial sequence
    pads — the report PROVES the concat layout's padding is bounded by
    one sequence, vs pad-to-longest whose waste px11 measures per
    bucket). Composes pack_sequences (the distributed two-phase prefix
    sum) with one seq-cardinality rollup + a broadcast 2-value scalar;
    zero-token docs are excluded (they start nowhere). All-integer
    outputs under the hash gate. Contract caveat: rows exist only for
    sequences where >= 1 document STARTS — a sequence interior to one
    giant document, or a terminal sequence consumed entirely by a
    straddler, is absent from the per-row view (take tail padding from
    ceil(corpus_end/1024)*1024 - corpus_end when docs can exceed the
    budget)."""
    from crawler_spark.functions.text import token_count_col
    from crawler_spark.operators.sampling import pack_sequences
    d = _t(spark, sf_dir, "documents")
    t = (d.select("doc_id",
                  token_count_col(F.col("text")).alias("n_tokens"))
         .where(F.col("n_tokens") > 0))
    p = pack_sequences(t, "n_tokens", order_col="doc_id",
                       budget=1024, n_blocks=8)
    p = p.withColumn(
        "end_seq",
        F.floor((F.col("prev_tokens") + F.col("n_tokens") - 1) / 1024)
        .cast("long"))
    s = (p.groupBy("seq_id")
         .agg(F.count(F.lit(1)).cast("long").alias("n_docs_started"),
              F.sum((F.col("end_seq") > F.col("seq_id")).cast("long"))
              .cast("long").alias("n_straddlers")))
    g = p.agg(F.sum("n_tokens").cast("long").alias("total_tokens"),
              F.max(F.col("prev_tokens") + F.col("n_tokens"))
              .cast("long").alias("corpus_end"))
    full = (F.col("seq_id") + 1) * 1024 <= F.col("corpus_end")
    return (s.crossJoin(F.broadcast(g))
            .select("seq_id", "n_docs_started", "n_straddlers",
                    F.when(full, F.lit(1024).cast("long"))
                    .otherwise(F.col("corpus_end")
                               - F.col("seq_id") * 1024)
                    .cast("long").alias("fill_tokens"),
                    F.when(full, F.lit(0).cast("long"))
                    .otherwise((F.col("seq_id") + 1) * 1024
                               - F.col("corpus_end"))
                    .cast("long").alias("pad_tokens")))


from crawler_spark.operators.hostrank import (  # noqa: E402
    pagerank_residual_oracle_sql,
)


@q("g32_pagerank_residual",
   pagerank_residual_oracle_sql(_G1_EDGES_SQL, iters=5, damping=0.85))
def g32_pagerank_residual(spark, sf_dir):
    """Convergence certificate for g1's fixed-iteration contract: the L1
    residual (exact-integer, 1e-8 grid — a float sum over hosts would be
    accumulation-order-dependent cross-engine) and max per-host delta
    between PageRank iterations 4 and 5 on the same host graph. Near
    zero = the W1 priorities g1 feeds the crawler are iteration-stable;
    large = raise iters before trusting them. Same host-cardinality
    scale shape as g1 + one extra host-keyed join and a scalar rollup.
    See operators/hostrank.pagerank_residual."""
    from crawler_spark.operators.hostrank import pagerank_residual
    d = _t(spark, sf_dir, "documents")
    dst = F.concat(F.lit("src"),
                   ((F.col("doc_id") * 7 + 3) % 23).cast("string"))
    edges = (d.select(F.col("source").alias("src"), dst.alias("dst"))
             .where(F.col("src") != F.col("dst"))
             .distinct())
    return pagerank_residual(edges, iters=5, damping=0.85)


@q("px17_token_budget_curve", f"""
WITH s AS (SELECT CAST(floor(({_QUALITY_EXPR}) * 1000) AS BIGINT) AS sm,
                  CAST({_TX3_TOKENS} AS BIGINT) AS nt
           FROM documents),
h AS (SELECT sm, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(nt) AS BIGINT) AS toks
      FROM s GROUP BY sm),
c AS (SELECT sm,
             CAST(SUM(n) OVER (ORDER BY sm DESC
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS n_docs_kept,
             CAST(SUM(toks) OVER (ORDER BY sm DESC
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS n_tokens_kept
      FROM h),
g AS (SELECT CAST(sum(nt) AS BIGINT) AS total FROM s)
SELECT round(c.sm / 1000.0, 4) AS q_threshold,
       c.n_docs_kept, c.n_tokens_kept,
       round(c.n_tokens_kept * 1.0 / g.total, 4) AS frac_tokens
FROM c CROSS JOIN g
""")
def px17_token_budget_curve(spark, sf_dir):
    """Quality-threshold vs token-yield tradeoff curve — the planning
    view behind tx8's budget selection: for every distinct quality level
    q (integerized to the a10 grid), how many documents and tokens
    survive a keep-if-quality>=q filter, and what corpus fraction that
    is. A data-mixing engineer reads the curve to pick the threshold
    whose yield meets the token budget BEFORE running the actual
    selection (the planning half of token_budget_threshold's
    histogram-cutoff trick). Exact BIGINT cumulative sums over the
    score HISTOGRAM — the descending window runs at distinct-score
    cardinality (<= 1001 rows by construction, the a11
    resolution-bounded pattern), never over documents; the corpus is
    touched once by one partial-agged rollup."""
    from crawler_spark.functions.text import (
        quality_score_col, token_count_col,
    )
    d = _t(spark, sf_dir, "documents")
    s = d.select(
        F.floor(quality_score_col(F.col("text")) * 1000).cast("long")
        .alias("sm"),
        token_count_col(F.col("text")).alias("nt"))
    h = s.groupBy("sm").agg(F.count(F.lit(1)).alias("n"),
                            F.sum("nt").alias("toks"))
    w = (Window.orderBy(F.desc("sm"))
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    c = h.select("sm",
                 F.sum("n").over(w).cast("long").alias("n_docs_kept"),
                 F.sum("toks").over(w).cast("long")
                 .alias("n_tokens_kept"))
    g = s.agg(F.sum("nt").cast("long").alias("total"))
    return (c.crossJoin(F.broadcast(g))
            .select(F.round(F.col("sm") / 1000.0, 4).alias("q_threshold"),
                    "n_docs_kept", "n_tokens_kept",
                    F.round(F.col("n_tokens_kept")
                            / F.col("total"), 4).alias("frac_tokens")))


@q("tx31_kneser_ney", """
WITH w AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w
           FROM documents),
bg AS (SELECT doc_id,
              unnest(list_transform(range(1, len(w)),
                                    i -> w[i] || ' ' || w[i + 1])) AS bigram
       FROM w),
c12 AS (SELECT bigram, CAST(count(*) AS BIGINT) AS c12 FROM bg GROUP BY 1),
c1 AS (SELECT split_part(bigram, ' ', 1) AS w1,
              CAST(count(*) AS BIGINT) AS c1,
              CAST(count(DISTINCT split_part(bigram, ' ', 2)) AS BIGINT)
                AS n1f
       FROM bg GROUP BY 1),
nb AS (SELECT split_part(bigram, ' ', 2) AS w2,
              CAST(count(DISTINCT split_part(bigram, ' ', 1)) AS BIGINT)
                AS n1b
       FROM bg GROUP BY 1),
tt AS (SELECT CAST(count(*) AS BIGINT) AS t FROM c12)
SELECT bg.doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
       round(avg(-ln((c12.c12 - 0.75) / c1.c1
                     + (0.75 * c1.n1f / c1.c1)
                     * (nb.n1b / CAST(tt.t AS DOUBLE)))), 4)
         AS kn_neg_logprob
FROM bg JOIN c12 USING (bigram)
        JOIN c1 ON split_part(bg.bigram, ' ', 1) = c1.w1
        JOIN nb ON split_part(bg.bigram, ' ', 2) = nb.w2
        CROSS JOIN tt
GROUP BY 1
""")
def tx31_kneser_ney(spark, sf_dir):
    """Interpolated Kneser-Ney bigram fluency scoring — the standard
    n-gram smoothing (Chen & Goodman 1999) on top of tx12's raw
    conditional: discounted observed mass plus a continuation-probability
    backoff (words that follow MANY contexts, not merely frequent words,
    absorb the discount). The CCNet-style LM quality axis with proper
    smoothing; rank disagreements vs tx12 concentrate on docs whose
    bigrams are frequent but context-rigid (boilerplate). Map-side HOF
    bigram generation, three type-cardinality partial-agg rollups (two
    with two-phase count-distinct), one broadcast scalar, zero Python.
    See operators/langmodel.kneser_ney_logprob."""
    from crawler_spark.operators.langmodel import kneser_ney_logprob
    return kneser_ney_logprob(_t(spark, sf_dir, "documents"))


# shared recursive-closure SCC CTE chain (g33 labels; g34 condensation)
_G33_SCC_CTES = """
WITH RECURSIVE eset AS (
  SELECT DISTINCT src, dst FROM (""" + _G13_EDGES_SQL + """)
  WHERE src <> dst),
hosts AS (SELECT DISTINCT host FROM
          (SELECT src AS host FROM eset UNION SELECT dst FROM eset)),
reach(src, dst) AS (
  SELECT src, dst FROM eset
  UNION
  SELECT r.src, e.dst FROM reach r JOIN eset e ON r.dst = e.src),
mut AS (SELECT a.src AS host, a.dst AS other
        FROM reach a JOIN reach b ON a.src = b.dst AND a.dst = b.src),
scc AS (SELECT h.host,
               least(h.host, COALESCE(min(m.other), h.host)) AS scc_id
        FROM hosts h LEFT JOIN mut m ON m.host = h.host
        GROUP BY h.host)"""


@q("g33_scc_decomposition", _G33_SCC_CTES + """
SELECT s.host, s.scc_id, CAST(z.n AS BIGINT) AS scc_size
FROM scc s JOIN (SELECT scc_id, count(*) AS n FROM scc GROUP BY 1) z
     USING (scc_id)
""")
def g33_scc_decomposition(spark, sf_dir):
    """Full SCC decomposition of the g13 host graph: every host labeled
    with its strongly-connected component (id = smallest member) and the
    component's size — the condensation view g13's single-pivot bow-tie
    cannot give: EVERY link neighborhood a frontier circulates in, not
    just the max-degree pivot's. Multistep shape (trim singletons to
    fixpoint, pointer-doubled closure on the 2-core remainder, mutual-
    reach min labels); the DuckDB twin is the uncapped recursive-CTE
    closure with identical string-min semantics.
    See operators/clusters.scc_decomposition."""
    from crawler_spark.operators.clusters import scc_decomposition
    d = _t(spark, sf_dir, "documents")
    h = lambda c: F.concat(F.lit("h"), (c % 211).cast("string"))  # noqa: E731
    e1 = (d.where(F.col("doc_id") % 2 == 0)
          .select(h(F.col("doc_id")).alias("src"),
                  h(F.col("doc_id") * 13 + 5).alias("dst")))
    e2 = (d.where(F.col("doc_id") % 5 == 0)
          .select(h(F.col("doc_id") * 17 + 3).alias("src"),
                  h(F.col("doc_id") * 29 + 11).alias("dst")))
    return scc_decomposition(e1.unionByName(e2))


@q("dd20_dup_substring_runs", f"""
WITH h AS (SELECT doc_id, {_WH_SQL} AS wh FROM documents),
r AS (SELECT doc_id, CASE WHEN len(wh) >= 8 THEN
    list_transform(range(0, len(wh) - 7), i ->
      list_reduce(list_prepend(0::BIGINT, list_slice(wh, i + 1, i + 8)),
                  (acc, x) -> (acc * 69069 + x) % 2147483647))
  ELSE [list_reduce(list_prepend(0::BIGINT, wh),
                    (acc, x) -> (acc * 69069 + x) % 2147483647)]
  END AS rolls FROM h),
e AS (SELECT doc_id, s.pos AS pos, s.rh AS rh FROM (
        SELECT doc_id,
               unnest(list_transform(range(0, len(rolls)), i ->
                 struct_pack(pos := i, rh := rolls[i + 1]))) AS s
        FROM r)),
rep AS (SELECT rh FROM e GROUP BY rh HAVING count(DISTINCT doc_id) >= 2),
ps AS (SELECT e.doc_id, list(CAST(pos AS BIGINT) ORDER BY pos) AS ps
       FROM e JOIN rep USING (rh) GROUP BY e.doc_id),
f AS (SELECT doc_id,
        list_reduce(
          list_prepend([CAST(-9 AS BIGINT), CAST(0 AS BIGINT),
                        CAST(0 AS BIGINT), CAST(0 AS BIGINT),
                        CAST(0 AS BIGINT)],
                       list_transform(ps, p -> [p])),
          (acc, x) -> CASE WHEN x[1] > acc[1] + 8 THEN
              [x[1], acc[2] + 1, acc[3] + 8, CAST(8 AS BIGINT),
               greatest(acc[5], CAST(8 AS BIGINT))]
            ELSE
              [x[1], acc[2], acc[3] + (x[1] - acc[1]),
               acc[4] + (x[1] - acc[1]),
               greatest(acc[5], acc[4] + (x[1] - acc[1]))]
            END) AS a
      FROM ps)
SELECT h.doc_id, len(wh)::BIGINT AS n_words,
       COALESCE(a[2], 0)::BIGINT AS n_runs,
       least(COALESCE(a[3], 0), len(wh))::BIGINT AS covered_words,
       least(COALESCE(a[5], 0), len(wh))::BIGINT AS longest_run_words,
       round(least(COALESCE(a[3], 0), len(wh)) * 1.0 / len(wh), 4)
         AS dup_word_frac
FROM h LEFT JOIN f USING (doc_id)
""")
def dd20_dup_substring_runs(spark, sf_dir):
    """Maximal cross-doc repeated-substring runs per document — the
    interval-merge layer over dd11's repeated-window signal: positions
    whose 8-word Rabin-Karp window repeats in >= 2 docs are merged into
    maximal runs (overlapping-or-touching intervals), yielding the
    quantities an exact-substring dedup policy (Lee et al. ACL 2022)
    acts on: run count, covered-word mass, longest shared passage, and
    covered fraction. One posexplode shuffle + two-phase count-distinct
    on the window hash, repeated positions rolled up per doc, then a
    single map-side 5-slot BIGINT fold (the identical list_reduce in the
    DuckDB twin). See operators/textdedup.dup_substring_runs."""
    from crawler_spark.operators.textdedup import (
        dup_substring_runs, word_hashes_col,
    )
    d = _t(spark, sf_dir, "documents")
    h = d.select("doc_id", word_hashes_col(F.col("text")).alias("h"))
    return dup_substring_runs(h, k=8)


@q("g34_scc_condensation", _G33_SCC_CTES + """,
cond AS (SELECT sa.scc_id AS scc_src, sb.scc_id AS scc_dst,
                CAST(count(*) AS BIGINT) AS n_links
         FROM eset e JOIN scc sa ON e.src = sa.host
                     JOIN scc sb ON e.dst = sb.host
         WHERE sa.scc_id <> sb.scc_id
         GROUP BY 1, 2)
SELECT scc_src, scc_dst, n_links FROM cond
""")
def g34_scc_condensation(spark, sf_dir):
    """The SCC condensation DAG of the g13 host graph: g33's components
    contracted to single nodes, component-level edges weighted by the
    count of distinct underlying host links. By construction acyclic —
    the seed-planning readout (an edge a -> b proves seeds in a cover b
    by link-following; the DAG's sources are the minimal covering seed
    components). Label join per endpoint + one pair rollup on top of the
    g33 labels. See operators/clusters.scc_condensation."""
    from crawler_spark.operators.clusters import scc_condensation
    d = _t(spark, sf_dir, "documents")
    h = lambda c: F.concat(F.lit("h"), (c % 211).cast("string"))  # noqa: E731
    e1 = (d.where(F.col("doc_id") % 2 == 0)
          .select(h(F.col("doc_id")).alias("src"),
                  h(F.col("doc_id") * 13 + 5).alias("dst")))
    e2 = (d.where(F.col("doc_id") % 5 == 0)
          .select(h(F.col("doc_id") * 17 + 3).alias("src"),
                  h(F.col("doc_id") * 29 + 11).alias("dst")))
    return scc_condensation(e1.unionByName(e2))


@q("a14_pr_curve", f"""
WITH s AS (SELECT CAST(floor(({_QUALITY_EXPR}) * 1000) AS BIGINT) AS sm,
                  CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
           FROM documents),
h AS (SELECT sm, CAST(sum(y) AS BIGINT) AS np,
             CAST(count(*) AS BIGINT) AS n
      FROM s GROUP BY sm),
c AS (SELECT sm,
             CAST(SUM(np) OVER (ORDER BY sm DESC
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS tp,
             CAST(SUM(n) OVER (ORDER BY sm DESC
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS cum
      FROM h),
g AS (SELECT CAST(sum(y) AS BIGINT) AS npos FROM s)
SELECT round(c.sm / 1000.0, 4) AS threshold, c.tp,
       CAST(c.cum - c.tp AS BIGINT) AS fp,
       round(c.tp * 1.0 / c.cum, 4) AS prec,
       round(c.tp * 1.0 / g.npos, 4) AS recall
FROM c CROSS JOIN g
""")
def a14_pr_curve(spark, sf_dir):
    """Precision-recall curve of the tx2 quality score against the
    English label at every achievable threshold — the operating-point
    view a12's single AP number integrates away (a release engineer
    picks the threshold off THIS table; a13 checks calibration at it).
    Same resolution-bounded shape as a11/px17: one corpus rollup to the
    integerized-score histogram, then descending cumulative windows over
    <= 1001 rows (by-design tiny — never a corpus-wide window) and one
    broadcast positives scalar."""
    from crawler_spark.functions.text import quality_score_col
    d = _t(spark, sf_dir, "documents")
    s = d.select(
        F.floor(quality_score_col(F.col("text")) * 1000).cast("long")
        .alias("sm"),
        (F.col("lang") == "en").cast("int").alias("y"))
    h = s.groupBy("sm").agg(F.sum("y").cast("long").alias("np"),
                            F.count(F.lit(1)).cast("long").alias("n"))
    w = (Window.orderBy(F.desc("sm"))
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    c = h.select("sm",
                 F.sum("np").over(w).cast("long").alias("tp"),
                 F.sum("n").over(w).cast("long").alias("cum"))
    g = s.agg(F.sum("y").cast("long").alias("npos"))
    return (c.crossJoin(F.broadcast(g))
            .select(F.round(F.col("sm") / 1000.0, 4).alias("threshold"),
                    "tp", (F.col("cum") - F.col("tp")).cast("long")
                    .alias("fp"),
                    F.round(F.col("tp") / F.col("cum"), 4).alias("prec"),
                    F.round(F.col("tp") / F.col("npos"), 4)
                    .alias("recall")))


@q("mm16_modality_transitions", """
WITH spans AS (""" + _SPAN_SQL + """),
t AS (SELECT unnest(list_transform(range(2, len(spans) + 1), i ->
        struct_pack(f := spans[i - 1].kind, t := spans[i].kind))) AS p
      FROM spans),
c AS (SELECT p.f AS from_kind, p.t AS to_kind,
             CAST(count(*) AS BIGINT) AS n
      FROM t GROUP BY 1, 2),
g AS (SELECT CAST(sum(n) AS BIGINT) AS tot FROM c)
SELECT from_kind, to_kind, n, round(n * 1.0 / tot, 4) AS frac
FROM c CROSS JOIN g
""")
def mm16_modality_transitions(spark, sf_dir):
    """Corpus-level modality transition matrix over the interleaved span
    sequences (input_hint payload): counts and fractions of adjacent
    (kind -> kind) steps — the first-order Markov view of interleaving
    structure an interleaved-pretraining curriculum is tuned against
    (mm6 profiles runs per doc; this is the corpus transition law). The
    adjacent-pair projection is a map-side HOF over the span array
    (bigram-gen shape, short-doc guarded); then ONE 4-row-bounded rollup
    and a broadcast total. Zero Python."""
    s = _spans_df(spark, sf_dir)
    sp = F.col("spans")
    idx = F.when(F.size(sp) >= 2,
                 F.sequence(F.lit(2), F.size(sp))
                 ).otherwise(F.array().cast("array<int>"))
    pairs = F.transform(
        idx, lambda i: F.struct(
            F.element_at(sp, i - 1)["kind"].alias("f"),
            F.element_at(sp, i)["kind"].alias("t")))
    t = s.select(F.explode(pairs).alias("p"))
    c = (t.groupBy(F.col("p.f").alias("from_kind"),
                   F.col("p.t").alias("to_kind"))
         .agg(F.count(F.lit(1)).cast("long").alias("n")))
    g = c.agg(F.sum("n").cast("long").alias("tot"))
    return (c.crossJoin(F.broadcast(g))
            .select("from_kind", "to_kind", "n",
                    F.round(F.col("n") / F.col("tot"), 4).alias("frac")))


@q("px19_export_manifest", """
WITH s AS (SELECT doc_id,
                  ('0x' || substr(md5('shard/' || CAST(doc_id AS VARCHAR)),
                                  1, 8))::BIGINT % 16 AS shard,
                  CAST(length(text) AS BIGINT) AS n_bytes,
                  ('0x' || substr(md5(text), 1, 15))::BIGINT AS h
           FROM documents)
SELECT shard,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
       CAST(max(n_bytes) AS BIGINT) AS max_doc_bytes,
       CAST(bit_xor(h) AS BIGINT) AS content_checksum
FROM s GROUP BY shard
""")
def px19_export_manifest(spark, sf_dir):
    """Deterministic sharded-export manifest — the release artifact a
    training run consumes next to the data: content-stable shard
    assignment (md5 coin on doc_id, 16 shards), per-shard document
    count, byte mass, max document size (the reader's buffer bound),
    and an ORDER-INDEPENDENT content checksum (bit_xor of per-doc
    60-bit text digests — xor commutes, so the checksum is identical
    however partitions arrive, unlike a sum mod 2^64 which DuckDB
    would widen to HUGEINT and Spark would wrap). Verifying a copied
    shard = recompute and compare one row. One partial-agged rollup;
    the corpus never shuffles by more than the 16-row shard key."""
    d = _t(spark, sf_dir, "documents")
    h8 = F.conv(F.substring(F.md5(
        F.concat(F.lit("shard/"), F.col("doc_id").cast("string"))), 1, 8),
        16, 10).cast("long") % 16
    h60 = F.conv(F.substring(F.md5(F.col("text")), 1, 15), 16, 10) \
        .cast("long")
    s = d.select(h8.alias("shard"),
                 F.length("text").cast("long").alias("n_bytes"),
                 h60.alias("h"))
    return (s.groupBy("shard")
            .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
                 F.sum("n_bytes").cast("long").alias("total_bytes"),
                 F.max("n_bytes").cast("long").alias("max_doc_bytes"),
                 F.bit_xor("h").cast("long").alias("content_checksum")))


@q("st14_session_gap_histogram", """
WITH l AS (SELECT user_id, event_id,
                  CAST(floor(epoch(ts)) AS BIGINT) AS t FROM events),
g AS (SELECT t - lag(t) OVER (PARTITION BY user_id
                              ORDER BY t, event_id) AS gap
      FROM l),
d AS (SELECT gap FROM g WHERE gap IS NOT NULL),
h AS (SELECT CASE WHEN gap <= 0 THEN 0
             ELSE length(bin(gap)) END AS bucket,
             CAST(count(*) AS BIGINT) AS n
      FROM d GROUP BY 1),
tot AS (SELECT CAST(sum(n) AS BIGINT) AS tot FROM h)
SELECT CAST(bucket AS INT) AS bucket,
       CAST(CASE WHEN bucket = 0 THEN 0
            ELSE (1::BIGINT << (bucket - 1)) END AS BIGINT) AS gap_lo,
       CAST((1::BIGINT << bucket) - 1 AS BIGINT) AS gap_hi,
       n, round(n * 1.0 / tot, 4) AS frac,
       round(SUM(n) OVER (ORDER BY bucket
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             * 1.0 / tot, 4) AS cum_frac
FROM h CROSS JOIN tot
""")
def st14_session_gap_histogram(spark, sf_dir):
    """Inter-event gap distribution per user stream, log2-bucketed with
    cumulative mass — the PLANNING view behind st2's 1800s session gap
    (pick the threshold where cum_frac plateaus, the dd16/px17 pattern:
    measure the knob's curve before committing it corpus-wide). Buckets
    come from the BINARY LENGTH of the integer gap (floor(log2)+1 as
    string length of bin()) — pure integer/string algebra, no libm log
    in either engine. One lag window per user stream (the st2 shuffle),
    a <=40-row histogram rollup, and a tiny cumulative window."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("t", "event_id")
    l = e.select("user_id", "event_id",
                 F.unix_timestamp("ts").alias("t"))
    g = l.select((F.col("t") - F.lag("t").over(w)).alias("gap")) \
         .where(F.col("gap").isNotNull())
    bucket = F.when(F.col("gap") <= 0, F.lit(0)) \
              .otherwise(F.length(F.bin("gap"))).cast("int")
    h = (g.select(bucket.alias("bucket"))
         .groupBy("bucket").agg(F.count(F.lit(1)).cast("long").alias("n")))
    tot = h.agg(F.sum("n").cast("long").alias("tot"))
    cw = (Window.orderBy("bucket")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    # python-API shiftleft takes only a literal shift; expr() for col-shift
    return (h.crossJoin(F.broadcast(tot))
            .select("bucket",
                    F.when(F.col("bucket") == 0, F.lit(0).cast("long"))
                    .otherwise(F.expr("shiftleft(1L, bucket - 1)")
                               .cast("long")).alias("gap_lo"),
                    (F.expr("shiftleft(1L, bucket)") - 1).cast("long")
                    .alias("gap_hi"),
                    "n",
                    F.round(F.col("n") / F.col("tot"), 4).alias("frac"),
                    F.round(F.sum("n").over(cw) / F.col("tot"), 4)
                    .alias("cum_frac")))


@q("g35_condensation_levels", _G33_SCC_CTES + """,
comps AS (SELECT DISTINCT scc_id FROM scc),
cond AS (SELECT DISTINCT sa.scc_id AS a, sb.scc_id AS b
         FROM eset e JOIN scc sa ON e.src = sa.host
                     JOIN scc sb ON e.dst = sb.host
         WHERE sa.scc_id <> sb.scc_id),
lv(node, l) AS (
  SELECT c.scc_id, 0 FROM comps c
  WHERE NOT EXISTS (SELECT 1 FROM cond WHERE cond.b = c.scc_id)
  UNION ALL
  SELECT cond.b, lv.l + 1 FROM lv JOIN cond ON cond.a = lv.node)
SELECT node AS scc_id, CAST(max(l) AS BIGINT) AS level
FROM lv GROUP BY node
""")
def g35_condensation_levels(spark, sf_dir):
    """Longest-path layering of the g34 condensation DAG: per component,
    the worst-case number of inter-component frontier expansions from a
    source component — the wave-depth floor a seed planner reads next to
    g34's edges (seeds in the level-0 layer need `level` waves to first
    touch a component). Spark side is Bellman-Ford relaxation at
    component cardinality (DAG-depth rounds, strict-improvement
    frontier, no path enumeration); the DuckDB twin enumerates paths
    recursively and maxes — fine at oracle scale, the reason the engine
    side relaxes instead. See operators/clusters.scc_condensation_levels.
    """
    from crawler_spark.operators.clusters import scc_condensation_levels
    d = _t(spark, sf_dir, "documents")
    h = lambda c: F.concat(F.lit("h"), (c % 211).cast("string"))  # noqa: E731
    e1 = (d.where(F.col("doc_id") % 2 == 0)
          .select(h(F.col("doc_id")).alias("src"),
                  h(F.col("doc_id") * 13 + 5).alias("dst")))
    e2 = (d.where(F.col("doc_id") % 5 == 0)
          .select(h(F.col("doc_id") * 17 + 3).alias("src"),
                  h(F.col("doc_id") * 29 + 11).alias("dst")))
    return scc_condensation_levels(e1.unionByName(e2))


@q("an16_ivf_recall_curve", """
WITH qz AS (SELECT vec_id, label,
                   list_transform(embedding,
                       x -> CAST(floor(CAST(x AS DOUBLE) * 64) AS BIGINT))
                     AS qv
            FROM embeddings),
ex AS (SELECT label AS cell, s.d AS d, s.v AS v
       FROM (SELECT label,
                    unnest(list_transform(range(1, len(qv)+1),
                           i -> {'d': i, 'v': qv[i]})) AS s
             FROM qz)),
cent AS (SELECT cell, d,
                CAST(floor(CAST(sum(v) AS DOUBLE) / count(*)) AS BIGINT)
                  AS cv
         FROM ex GROUP BY 1, 2),
qx AS (SELECT vec_id AS qid, s.d AS d, s.v AS qval
       FROM (SELECT vec_id,
                    unnest(list_transform(range(1, len(qv)+1),
                           i -> {'d': i, 'v': qv[i]})) AS s
             FROM qz WHERE vec_id IN (0, 1, 2, 3))),
d2 AS (SELECT qx.qid, c.cell,
              sum((qx.qval - c.cv) * (qx.qval - c.cv)) AS d2
       FROM qx JOIN cent c USING (d) GROUP BY 1, 2),
probes AS (SELECT qid, cell, rk AS cell_rk FROM (
    SELECT qid, cell, row_number() OVER (PARTITION BY qid
                                         ORDER BY d2, cell) AS rk
    FROM d2) WHERE rk <= 4),
qq AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qvec
       FROM embeddings WHERE vec_id IN (0, 1, 2, 3)),
scored AS (SELECT p.qid, e.vec_id, p.cell_rk,
                  round(list_cosine_similarity(e.embedding::DOUBLE[],
                                               qq.qvec), 4) AS cosine
           FROM probes p JOIN embeddings e ON e.label = p.cell
           JOIN qq ON qq.qid = p.qid
           WHERE e.vec_id <> p.qid),
truth AS (SELECT qid, vec_id FROM (
    SELECT qq.qid, e.vec_id,
           row_number() OVER (PARTITION BY qq.qid
               ORDER BY round(list_cosine_similarity(
                   e.embedding::DOUBLE[], qq.qvec), 4) DESC,
                        e.vec_id) AS rnk
    FROM embeddings e CROSS JOIN qq
    WHERE e.vec_id <> qq.qid) WHERE rnk <= 10),
nps AS (SELECT unnest([1, 2, 3, 4]) AS np),
topk AS (SELECT np, qid, vec_id FROM (
    SELECT n.np, s.qid, s.vec_id,
           row_number() OVER (PARTITION BY s.qid, n.np
                              ORDER BY s.cosine DESC, s.vec_id) AS rnk
    FROM scored s CROSS JOIN nps n
    WHERE s.cell_rk <= n.np) WHERE rnk <= 10),
h AS (SELECT np, CAST(count(*) AS BIGINT) AS c
      FROM topk JOIN truth USING (qid, vec_id) GROUP BY np)
SELECT CAST(n.np AS INT) AS nprobe, CAST(4 AS BIGINT) AS n_queries,
       round(COALESCE(h.c, 0) / 40.0, 4) AS mean_recall
FROM nps n LEFT JOIN h ON h.np = n.np
""")
def an16_ivf_recall_curve(spark, sf_dir):
    """Recall@10 vs nprobe (1..4) for multi-probe IVF over the km1
    integer lattice — the serving-side planning curve for an15's knob
    (how many centroid-ranked cells buy how much of brute force's
    answer). Truth is the exact an1 cosine top-10; candidates for
    nprobe=j are a PREFIX of the cell ranking, so one probed-cell
    scoring pass serves every j (filters, not re-scoring).
    See operators/similarity.ivf_recall_curve."""
    from crawler_spark.operators.similarity import ivf_recall_curve
    e = _t(spark, sf_dir, "embeddings")
    qs = e.where(F.col("vec_id").isin(0, 1, 2, 3))
    return ivf_recall_curve(e, qs, k=10, max_nprobe=4, scale=64)


@q("ix15_ndcg", f"""
WITH w AS (SELECT doc_id,
                  regexp_split_to_array(trim(lower(text)), '\\s+') AS w
           FROM documents),
g AS (SELECT count(*) AS n, avg(len(w)) AS avgdl FROM w),
t AS (SELECT doc_id, len(w) AS dl, unnest(w) AS term FROM w),
tf AS (SELECT doc_id, dl, term, count(*) AS tf FROM t
       WHERE term IN {_TX11_TERMS!r} GROUP BY 1, 2, 3),
df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tf GROUP BY 1),
bm AS (SELECT tf.doc_id,
              round(SUM(ln(1.0 + (g.n - df.df + 0.5) / (df.df + 0.5))
                        * tf.tf * 2.2
                        / (tf.tf + 1.2 * (0.25 + 0.75 * tf.dl / g.avgdl))),
                    4) AS bm25
       FROM tf JOIN df USING (term) CROSS JOIN g
       GROUP BY tf.doc_id),
rel AS (SELECT doc_id,
               CAST(len(list_intersect(list_distinct(w),
                    ['spark', 'merge', 'window', 'sort'])) AS BIGINT)
                 AS rel
        FROM w),
cand AS (SELECT b.doc_id, b.bm25, r.rel FROM bm b JOIN rel r
         USING (doc_id)),
rr AS (SELECT doc_id, rel, rnk,
              ((1::BIGINT << rel) - 1) / log2(rnk + 1) AS gn
       FROM (SELECT doc_id, rel,
                    row_number() OVER (ORDER BY bm25 DESC, doc_id) AS rnk
             FROM cand)
       WHERE rnk <= 10),
dcgt AS (SELECT rnk, doc_id, rel,
                SUM(gn) OVER (ORDER BY rnk ROWS BETWEEN UNBOUNDED
                              PRECEDING AND CURRENT ROW) AS dcg
         FROM rr),
ii AS (SELECT irnk,
              SUM(((1::BIGINT << rel) - 1) / log2(irnk + 1))
                OVER (ORDER BY irnk ROWS BETWEEN UNBOUNDED PRECEDING
                      AND CURRENT ROW) AS icum
       FROM (SELECT rel,
                    row_number() OVER (ORDER BY rel DESC, doc_id) AS irnk
             FROM cand)
       WHERE irnk <= 10)
SELECT CAST(d.rnk AS BIGINT) AS rnk, d.doc_id,
       CAST(d.rel AS INT) AS rel,
       round(d.dcg, 4) AS dcg, round(d.dcg / i.icum, 4) AS ndcg
FROM dcgt d JOIN ii i ON i.irnk = d.rnk
""")
def ix15_ndcg(spark, sf_dir):
    """NDCG@10 of the tx11 BM25 ranking against graded term-coverage
    relevance (rel = distinct query terms present) — the ranking-quality
    eval closing the retrieval stack: running DCG and NDCG@r per rank,
    integer gains via shiftleft (no libm pow), log2 only of the eleven
    small rank integers, cumulative sums in pinned rank order. Both
    top-10 selections are global sort-limits (TakeOrderedAndProject),
    never a corpus-wide single-partition window.
    See operators/invindex.ndcg_at_k."""
    from crawler_spark.operators.invindex import ndcg_at_k
    return ndcg_at_k(_t(spark, sf_dir, "documents"), _TX11_TERMS, k=10)


_A16_B = 16
# Poisson(1) inverse-CDF thresholds (cumulative e^-1 * 1/k!): literal
# doubles, identical in both engines.
_A16_C = ("0.36787944117144233", "0.7357588823428847",
          "0.9196986029286058", "0.9810118431238462")


@q("a16_poisson_bootstrap_ci", f"""
WITH s AS (SELECT doc_id,
                  CAST(floor(({_QUALITY_EXPR}) * 1000) AS BIGINT) AS sm
           FROM documents),
r AS (SELECT b, doc_id, sm,
             ('0x' || substr(md5('boot/' || CAST(b AS VARCHAR) || '/'
                                 || CAST(doc_id AS VARCHAR)), 1, 8))
               ::BIGINT / 4294967296.0 AS u
      FROM s CROSS JOIN (SELECT unnest(range(0, {_A16_B})) AS b)),
w AS (SELECT b, sm,
             CASE WHEN u < {_A16_C[0]} THEN 0
                  WHEN u < {_A16_C[1]} THEN 1
                  WHEN u < {_A16_C[2]} THEN 2
                  WHEN u < {_A16_C[3]} THEN 3
                  ELSE 4 END AS w
      FROM r),
m AS (SELECT b, CAST(sum(w * sm) AS BIGINT) AS ws,
             CAST(sum(w) AS BIGINT) AS n_eff
      FROM w GROUP BY b),
means AS (SELECT list_sort(list(ws * 1.0 / (1000.0 * n_eff))) AS ms
          FROM m),
pt AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
              CAST(sum(sm) AS BIGINT) AS tot FROM s)
SELECT pt.n_docs,
       CAST({_A16_B} AS INT) AS n_replicates,
       round(pt.tot / (1000.0 * pt.n_docs), 4) AS point_mean,
       round(ms[2], 4) AS boot_lo,
       round(ms[{_A16_B - 1}], 4) AS boot_hi
FROM pt CROSS JOIN means
""")
def a16_poisson_bootstrap_ci(spark, sf_dir):
    """Deterministic Poisson-bootstrap confidence interval for the mean
    tx2 quality score — the scale-correct uncertainty quantification
    (Chamandy et al., Google 2012: per-row independent Poisson(1)
    weights replace multinomial resampling, so each replicate is ONE
    partial-agged pass and rows never coordinate): 16 replicates from
    content-stable md5 uniforms through the literal Poisson inverse-CDF
    thresholds; the interval is the 2nd/15th order statistic of the
    replicate means (~6%/94% band at B=16). Everything is exact BIGINT
    until one division per output; the replicate means are selected
    from a SORTED 16-element list (array_sort + element_at — no
    percentile interpolation to diverge on). The corpus is touched by
    one 16x-expanded map pass and one 16-key rollup."""
    d = _t(spark, sf_dir, "documents")
    from crawler_spark.functions.text import quality_score_col
    s = d.select("doc_id",
                 F.floor(quality_score_col(F.col("text")) * 1000)
                 .cast("long").alias("sm"))
    bgrid = F.explode(F.sequence(F.lit(0), F.lit(_A16_B - 1))).alias("b")
    u = (F.conv(F.substring(F.md5(F.concat(
        F.lit("boot/"), F.col("b").cast("string"), F.lit("/"),
        F.col("doc_id").cast("string"))), 1, 8), 16, 10).cast("long")
        / F.lit(4294967296.0))
    w = (F.when(u < float(_A16_C[0]), 0)
         .when(u < float(_A16_C[1]), 1)
         .when(u < float(_A16_C[2]), 2)
         .when(u < float(_A16_C[3]), 3)
         .otherwise(4))
    m = (s.select("doc_id", "sm", bgrid)
         .withColumn("w", w)
         .groupBy("b")
         .agg(F.sum(F.col("w") * F.col("sm")).cast("long").alias("ws"),
              F.sum("w").cast("long").alias("n_eff")))
    means = m.agg(F.array_sort(F.collect_list(
        F.col("ws") / (F.lit(1000.0) * F.col("n_eff")))).alias("ms"))
    pt = s.agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
               F.sum("sm").cast("long").alias("tot"))
    return (pt.crossJoin(F.broadcast(means))
            .select("n_docs",
                    F.lit(_A16_B).cast("int").alias("n_replicates"),
                    F.round(F.col("tot") / (F.lit(1000.0)
                                            * F.col("n_docs")), 4)
                    .alias("point_mean"),
                    F.round(F.element_at("ms", 2), 4).alias("boot_lo"),
                    F.round(F.element_at("ms", _A16_B - 1), 4)
                    .alias("boot_hi")))


@q("a17_langid_confusion", f"""
WITH p AS ({_LANG_SQL}),
c AS (SELECT lang, lang_pred, CAST(count(*) AS BIGINT) AS n
      FROM p GROUP BY 1, 2),
tr AS (SELECT lang, CAST(sum(n) AS BIGINT) AS n_true FROM c GROUP BY 1),
pr AS (SELECT lang_pred, CAST(sum(n) AS BIGINT) AS n_pred
       FROM c GROUP BY 1)
SELECT c.lang, c.lang_pred, c.n,
       round(c.n * 1.0 / tr.n_true, 4) AS recall_contrib,
       round(c.n * 1.0 / pr.n_pred, 4) AS precision_contrib
FROM c JOIN tr USING (lang) JOIN pr USING (lang_pred)
""")
def a17_langid_confusion(spark, sf_dir):
    """Multiclass confusion matrix of the tx1 language-ID heuristic
    against the labeled lang column: per (true, predicted) cell, the
    count plus its share of the true class (the diagonal cell's
    recall_contrib IS that class's recall) and of the predicted class
    (diagonal precision_contrib = precision) — the eval view the
    score-based a10-a14 family cannot give for a MULTICLASS labeler,
    and the gate before tx1's predictions feed px5/px6 language
    stratification. One class-pair-bounded rollup (cells <= langs^2)
    plus two class-cardinality margins, broadcast-joined back."""
    from crawler_spark.functions.text import lang_id_col
    d = _t(spark, sf_dir, "documents")
    p = d.select("lang", lang_id_col(F.col("text")).alias("lang_pred"))
    c = (p.groupBy("lang", "lang_pred")
         .agg(F.count(F.lit(1)).cast("long").alias("n")))
    tr = c.groupBy("lang").agg(F.sum("n").cast("long").alias("n_true"))
    pr = (c.groupBy("lang_pred")
          .agg(F.sum("n").cast("long").alias("n_pred")))
    return (c.join(F.broadcast(tr), "lang")
            .join(F.broadcast(pr), "lang_pred")
            .select("lang", "lang_pred", "n",
                    F.round(F.col("n") / F.col("n_true"), 4)
                    .alias("recall_contrib"),
                    F.round(F.col("n") / F.col("n_pred"), 4)
                    .alias("precision_contrib")))


@q("km3_farthest_first", """
WITH q AS (SELECT vec_id,
                  list_transform(embedding,
                      x -> CAST(floor(CAST(x AS DOUBLE) * 64) AS BIGINT))
                    AS qv
           FROM embeddings),
v AS (SELECT vec_id, s.d AS d, s.v AS v
      FROM (SELECT vec_id,
                   unnest(list_transform(range(1, len(qv)+1),
                          i -> {'d': i, 'v': qv[i]})) AS s
            FROM q)),
s1 AS (SELECT min(vec_id) AS id FROM q),
d1 AS (SELECT v.vec_id, sum((v.v - w.v) * (v.v - w.v)) AS d2
       FROM v JOIN v w ON w.d = v.d AND w.vec_id = (SELECT id FROM s1)
       GROUP BY 1),
p2 AS (SELECT vec_id, d2 FROM d1
       WHERE vec_id <> (SELECT id FROM s1)
       ORDER BY d2 DESC, vec_id LIMIT 1),
e2 AS (SELECT v.vec_id, sum((v.v - w.v) * (v.v - w.v)) AS d2
       FROM v JOIN v w ON w.d = v.d
                       AND w.vec_id = (SELECT vec_id FROM p2)
       GROUP BY 1),
m2 AS (SELECT d1.vec_id, least(d1.d2, e2.d2) AS d2
       FROM d1 JOIN e2 USING (vec_id)),
p3 AS (SELECT vec_id, d2 FROM m2
       WHERE vec_id NOT IN ((SELECT id FROM s1), (SELECT vec_id FROM p2))
       ORDER BY d2 DESC, vec_id LIMIT 1),
e3 AS (SELECT v.vec_id, sum((v.v - w.v) * (v.v - w.v)) AS d2
       FROM v JOIN v w ON w.d = v.d
                       AND w.vec_id = (SELECT vec_id FROM p3)
       GROUP BY 1),
m3 AS (SELECT m2.vec_id, least(m2.d2, e3.d2) AS d2
       FROM m2 JOIN e3 USING (vec_id)),
p4 AS (SELECT vec_id, d2 FROM m3
       WHERE vec_id NOT IN ((SELECT id FROM s1), (SELECT vec_id FROM p2),
                            (SELECT vec_id FROM p3))
       ORDER BY d2 DESC, vec_id LIMIT 1),
e4 AS (SELECT v.vec_id, sum((v.v - w.v) * (v.v - w.v)) AS d2
       FROM v JOIN v w ON w.d = v.d
                       AND w.vec_id = (SELECT vec_id FROM p4)
       GROUP BY 1),
m4 AS (SELECT m3.vec_id, least(m3.d2, e4.d2) AS d2
       FROM m3 JOIN e4 USING (vec_id)),
rad AS (SELECT CAST(max(d2) AS BIGINT) AS r FROM m4)
SELECT CAST(t.rk AS INT) AS rk, t.vec_id,
       CAST(t.sel_d2 AS BIGINT) AS sel_d2, rad.r AS radius
FROM (
  SELECT 1 AS rk, (SELECT id FROM s1) AS vec_id, 0 AS sel_d2
  UNION ALL
  SELECT 2, (SELECT vec_id FROM p2), (SELECT d2 FROM p2)
  UNION ALL
  SELECT 3, (SELECT vec_id FROM p3), (SELECT d2 FROM p3)
  UNION ALL
  SELECT 4, (SELECT vec_id FROM p4), (SELECT d2 FROM p4)
) t CROSS JOIN rad
""")
def km3_farthest_first(spark, sf_dir):
    """Deterministic farthest-first (Gonzalez) k-center seeding, k=4,
    on the km1 integer lattice: the init-quality step before km1's
    Lloyd rounds (a bad seed shows up as a large coverage radius here,
    not three iterations in), and the deterministic stand-in for
    k-means++'s D^2 sampling that can sit under the cross-engine hash
    gate. Per center: selection rank, id, its exact integer min-L2 to
    the already-chosen set, plus the final k-center radius. The DuckDB
    twin unrolls the identical 3 traversal rounds (the km1 contract).
    See operators/similarity.farthest_first_centers."""
    from crawler_spark.operators.similarity import farthest_first_centers
    return farthest_first_centers(_t(spark, sf_dir, "embeddings"),
                                  k=4, scale=64)


@q("so5_symdiff", """
SELECT doc_id FROM (
  SELECT doc_id FROM documents WHERE lang = 'en'
  EXCEPT
  SELECT doc_id FROM documents WHERE n_chars > 200)
UNION
SELECT doc_id FROM (
  SELECT doc_id FROM documents WHERE n_chars > 200
  EXCEPT
  SELECT doc_id FROM documents WHERE lang = 'en')
""")
def so5_symdiff(spark, sf_dir):
    """SO-family completion: symmetric difference — 'URLs in exactly one
    of the two sets' (discovered-but-not-due XOR due-but-not-discovered,
    the frontier-reconciliation readout). Two anti-joins over distinct
    keys unioned; each plans as LeftAnti on a keys-only shuffle."""
    d = _t(spark, sf_dir, "documents")
    a = d.where(F.col("lang") == "en").select("doc_id")
    b = d.where(F.col("n_chars") > 200).select("doc_id")
    return a.subtract(b).union(b.subtract(a)).distinct()


@q("rc8_change_rate", """
WITH old AS (SELECT doc_id, source, md5(text) AS fp FROM documents
             WHERE doc_id % 10 <> 9),
new AS (SELECT doc_id,
               md5(CASE WHEN doc_id % 7 = 0 THEN text || '#v2'
                        ELSE text END) AS fp
        FROM documents WHERE doc_id % 10 <> 0),
pairs AS (SELECT o.source,
                 CASE WHEN o.fp = n.fp THEN 0 ELSE 1 END AS chg
          FROM old o JOIN new n ON o.doc_id = n.doc_id)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(sum(chg) AS BIGINT) AS n_changed,
       round(-ln((count(*) - sum(chg) + 0.5) / (count(*) + 0.5)), 4)
         AS lambda_hat
FROM pairs GROUP BY source
""")
def rc8_change_rate(spark, sf_dir):
    """Page change-rate estimation per source stratum (Cho &
    Garcia-Molina, TOIT 2003, the bias-corrected MLE for a Poisson
    change process observed through same-interval revisits):
    lambda_hat = -ln((n - X + 0.5) / (n + 0.5)) over the rc3 snapshot
    pair, where X = pages whose fingerprint changed between visits.
    The 0.5 correction keeps the estimator finite at X = n (the naive
    -ln(1 - X/n) diverges) — this is the number rc2's adaptive TTL and
    rc6's delay controller should be seeded with, estimated per
    stratum so template-heavy sources don't mask fast-churn ones.
    One fingerprint equi-join at key cardinality + one stratum rollup;
    exact BIGINTs into a single ln per output row."""
    d = _t(spark, sf_dir, "documents")
    old = (d.where(F.col("doc_id") % 10 != 9)
           .select("doc_id", "source", F.md5("text").alias("fp_o")))
    new = (d.where(F.col("doc_id") % 10 != 0)
           .select("doc_id",
                   F.md5(F.when(F.col("doc_id") % 7 == 0,
                                F.concat(F.col("text"), F.lit("#v2")))
                         .otherwise(F.col("text"))).alias("fp_n")))
    pairs = (old.join(new, "doc_id")
             .select("source",
                     F.when(F.col("fp_o") == F.col("fp_n"), 0)
                     .otherwise(1).alias("chg")))
    n, x = F.count(F.lit(1)), F.sum("chg")
    return (pairs.groupBy("source")
            .agg(n.cast("long").alias("n_pairs"),
                 x.cast("long").alias("n_changed"),
                 F.round(-F.log((n - x + F.lit(0.5))
                                / (n + F.lit(0.5))), 4)
                 .alias("lambda_hat")))


@q("ks11_sampled_quantiles", """
WITH h AS (SELECT event_type, event_id, value,
                  ('0x' || substr(md5('qs/' || CAST(event_id AS VARCHAR)),
                                  1, 8))::BIGINT AS hk
           FROM events),
s AS (SELECT event_type, value FROM (
        SELECT event_type, value,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY hk, event_id) AS rk
        FROM h) WHERE rk <= 64),
est AS (SELECT event_type,
               CAST(count(*) AS BIGINT) AS sample_n,
               list(value ORDER BY value) AS a
        FROM s GROUP BY event_type),
e2 AS (SELECT event_type, sample_n,
              round(a[CAST(ceil(CAST(0.5 AS DOUBLE) * sample_n) AS INT)],
                    4) AS q50_est,
              round(a[CAST(ceil(CAST(0.9 AS DOUBLE) * sample_n) AS INT)],
                    4) AS q90_est
       FROM est),
v AS (SELECT event_type, value AS _v, count(*) AS _c
      FROM events GROUP BY 1, 2),
r AS (SELECT event_type, _v, _c,
             sum(_c) OVER (PARTITION BY event_type ORDER BY _v
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS _cum,
             sum(_c) OVER (PARTITION BY event_type) AS _n
      FROM v),
ex AS (SELECT event_type, CAST(sum(_c) AS BIGINT) AS n,
              round(min(CASE WHEN _cum >= ceil(CAST(0.5 AS DOUBLE) * _n)
                        THEN _v END), 4) AS q50_exact,
              round(min(CASE WHEN _cum >= ceil(CAST(0.9 AS DOUBLE) * _n)
                        THEN _v END), 4) AS q90_exact
       FROM r GROUP BY event_type)
SELECT ex.event_type, ex.n, e2.sample_n,
       ex.q50_exact, e2.q50_est, ex.q90_exact, e2.q90_est
FROM ex JOIN e2 USING (event_type)
""")
def ks11_sampled_quantiles(spark, sf_dir):
    """Bottom-k uniform-sample quantiles next to their exact values —
    the MERGEABLE quantile path at 10^10 events (union two bottom-k
    samples and re-take the k hash-smallest — the KMV merge property —
    where ks3's exact distinct-value window needs the full value
    distribution): per event type, the 64 events with the smallest
    content-stable md5 coin form the sample, sample quantiles are exact
    index selections on the sorted 64-array, and the same row carries
    ks3's exact p50/p90 so the table IS the estimator-error audit
    (dd13's pattern: measure the knob next to its truth). One per-type
    rank shuffle (w2's top-k shape) + a 64-element sort per type; the
    exact side reuses ks3's distinct-value compression."""
    from pyspark.sql import Window as W
    from crawler_spark.operators.sketches import exact_quantiles
    e = _t(spark, sf_dir, "events")
    hk = F.conv(F.substring(F.md5(F.concat(
        F.lit("qs/"), F.col("event_id").cast("string"))), 1, 8), 16, 10) \
        .cast("long")
    s = (e.select("event_type", "event_id", "value")
         .withColumn("rk", F.row_number().over(
             W.partitionBy("event_type").orderBy(hk, F.col("event_id"))))
         .where(F.col("rk") <= 64))
    est = (s.groupBy("event_type")
           .agg(F.count(F.lit(1)).cast("long").alias("sample_n"),
                F.array_sort(F.collect_list("value")).alias("a")))
    idx = lambda q: F.ceil(F.lit(q).cast("double")  # noqa: E731
                           * F.col("sample_n")).cast("int")
    e2 = est.select("event_type", "sample_n",
                    F.round(F.element_at("a", idx(0.5)), 4)
                    .alias("q50_est"),
                    F.round(F.element_at("a", idx(0.9)), 4)
                    .alias("q90_est"))
    ex = (exact_quantiles(e.select("event_type", "value"),
                          ["event_type"], F.col("value"), qs=(0.5, 0.9))
          .select("event_type", "n",
                  F.col("q_50").alias("q50_exact"),
                  F.col("q_90").alias("q90_exact")))
    return (ex.join(e2, "event_type")
            .select("event_type", "n", "sample_n",
                    "q50_exact", "q50_est", "q90_exact", "q90_est"))


@q("a18_mcnemar", f"""
WITH p AS (SELECT lang,
                  CASE WHEN ({_LANG_CASE}) = 'en' THEN 1 ELSE 0 END AS a,
                  CASE WHEN ({_QUALITY_EXPR}) >= 0.7 THEN 1 ELSE 0 END
                    AS b,
                  CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
           FROM documents),
c AS (SELECT CAST(sum(CASE WHEN a = y AND b <> y THEN 1 ELSE 0 END)
                  AS BIGINT) AS n10,
             CAST(sum(CASE WHEN a <> y AND b = y THEN 1 ELSE 0 END)
                  AS BIGINT) AS n01,
             CAST(sum(CASE WHEN a = y THEN 1 ELSE 0 END) AS BIGINT)
               AS n_a_correct,
             CAST(sum(CASE WHEN b = y THEN 1 ELSE 0 END) AS BIGINT)
               AS n_b_correct,
             CAST(count(*) AS BIGINT) AS n
      FROM p)
SELECT n, n_a_correct, n_b_correct, n10, n01,
       round((n10 - n01) * (n10 - n01) * 1.0 / (n10 + n01), 4)
         AS mcnemar_chi2
FROM c
""")
def a18_mcnemar(spark, sf_dir):
    """McNemar's paired test between the two English detectors the
    pipeline actually ships — tx1's marker-density language-ID vs the
    tx2 quality gate at 0.7 (whose stopword axis doubles as an en
    signal) — against the labeled truth: the discordant-pair counts
    n10/n01 and the chi-square statistic (b-c)^2/(b+c). This is THE
    question a release engineer asks when swapping classifiers ("is B
    actually better, or do they just disagree?") and the paired-design
    completion of the eval suite (a10 calibration, a11 AUC, a12 AP,
    a13 Brier, a14 PR, a16 bootstrap CI, a17 confusion). Exact BIGINT
    discordance counts from ONE map-side pass + one global rollup;
    a single division into the statistic."""
    from crawler_spark.functions.text import (
        lang_id_col, quality_score_col,
    )
    d = _t(spark, sf_dir, "documents")
    p = d.select(
        (lang_id_col(F.col("text")) == "en").cast("int").alias("a"),
        (quality_score_col(F.col("text")) >= 0.7).cast("int").alias("b"),
        (F.col("lang") == "en").cast("int").alias("y"))
    agree_a = (F.col("a") == F.col("y")).cast("int")
    agree_b = (F.col("b") == F.col("y")).cast("int")
    c = p.agg(
        F.sum(((F.col("a") == F.col("y"))
               & (F.col("b") != F.col("y"))).cast("int"))
        .cast("long").alias("n10"),
        F.sum(((F.col("a") != F.col("y"))
               & (F.col("b") == F.col("y"))).cast("int"))
        .cast("long").alias("n01"),
        F.sum(agree_a).cast("long").alias("n_a_correct"),
        F.sum(agree_b).cast("long").alias("n_b_correct"),
        F.count(F.lit(1)).cast("long").alias("n"))
    diff = F.col("n10") - F.col("n01")
    return c.select("n", "n_a_correct", "n_b_correct", "n10", "n01",
                    F.round(diff * diff / (F.col("n10") + F.col("n01")),
                            4).alias("mcnemar_chi2"))
