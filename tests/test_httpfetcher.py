"""HttpFetcher plumbing (S5): the mapInPandas fetch stage with an injected
deterministic transport — proves batching, per-worker session reuse, the
dead-link error convention, and that a full crawl runs end-to-end through
the HTTP fetcher's code path (transport backed by the fixture web)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crawler_spark.sources.fetch import HttpFetcher
from crawler_spark.sources.webgraph import gen_pages, gen_seeds


def _fixture_transport(cfg):
    """Transport closure over the fixture web: behaves like the network."""
    pages = {r.url_canon: (int(r.status), r.html)
             for r in gen_pages(cfg).itertuples()}

    def transport(session, url, agent, timeout_s):
        if url not in pages:
            raise ConnectionError(url)      # dead link -> status 0 mapping
        return pages[url]

    return transport


def test_fetch_contract_and_error_mapping(spark, small_cfg):
    t = _fixture_transport(small_cfg)
    f = HttpFetcher(user_agent="TestBot/1.0", transport=t)
    urls = [r.url_canon for r in gen_pages(small_cfg).itertuples()][:20]
    batch = spark.createDataFrame(
        [(u, 0, 0.0, "agent-x") for u in urls]
        + [("http://nowhere.example.com/p0", 0, 0.0, "agent-x")],
        "url_canon string, depth int, priority double, agent string")
    out = f.fetch(batch)
    assert out.columns == ["url_canon", "depth", "priority", "agent",
                           "status", "bytes", "html"]
    rows = {r["url_canon"]: r for r in out.collect()}
    dead = rows.pop("http://nowhere.example.com/p0")
    assert (dead["status"], dead["bytes"], dead["html"]) == (0, 0, "")
    for u, r in rows.items():
        assert r["bytes"] == len(r["html"])
        assert r["status"] in (200, 404, 429, 500)


def test_full_crawl_through_http_fetcher(spark, small_cfg):
    """run_crawl over HttpFetcher(fake transport) == run_crawl over
    SimulatedFetcher: the two fetch paths are interchangeable."""
    from crawler_spark.plans.frontier import run_crawl
    from crawler_spark.sources.fetch import SimulatedFetcher
    from crawler_spark.sources.webgraph import to_spark
    from crawler_spark.spec import CrawlJobSpec

    spec = CrawlJobSpec(seeds=tuple(gen_seeds(small_cfg)), max_waves=4)
    pages_df, robots_df = to_spark(spark, small_cfg)
    via_http = run_crawl(spark, spec,
                         HttpFetcher(transport=_fixture_transport(small_cfg)),
                         robots_src=robots_df)
    via_join = run_crawl(spark, spec, SimulatedFetcher(pages_df),
                         robots_src=robots_df)
    a = {r["url_canon"] for r in via_http.seen.select("url_canon").collect()}
    b = {r["url_canon"] for r in via_join.seen.select("url_canon").collect()}
    assert a == b and via_http.n_fetched == via_join.n_fetched


def test_chrome_fetcher_same_surface(spark, small_cfg):
    """S6: ChromeFetcher is the same pluggable fetch surface — with an
    injected transport (standing in for a CDP-rendered DOM) a crawl through
    it equals the SimulatedFetcher crawl; without one, the stage raises
    NotImplementedError loudly (no browser in sandbox) instead of yielding
    silent empties."""
    from crawler_spark.plans.frontier import run_crawl
    from crawler_spark.sources.fetch import ChromeFetcher, SimulatedFetcher
    from crawler_spark.sources.webgraph import to_spark
    from crawler_spark.spec import CrawlJobSpec

    spec = CrawlJobSpec(seeds=tuple(gen_seeds(small_cfg)), max_waves=4)
    pages_df, robots_df = to_spark(spark, small_cfg)
    via_chrome = run_crawl(
        spark, spec, ChromeFetcher(transport=_fixture_transport(small_cfg)),
        robots_src=robots_df)
    via_join = run_crawl(spark, spec, SimulatedFetcher(pages_df),
                         robots_src=robots_df)
    a = {r["url_canon"] for r in via_chrome.seen.select("url_canon").collect()}
    b = {r["url_canon"] for r in via_join.seen.select("url_canon").collect()}
    assert a == b and via_chrome.n_fetched == via_join.n_fetched

    stub = ChromeFetcher()
    batch = spark.createDataFrame([("http://h0.example.com/p0", "a")],
                                  "url_canon string, agent string")
    with pytest.raises(Exception, match="no headless browser in sandbox"):
        stub.fetch(batch).collect()


def test_proxy_reaches_session_config(spark):
    """S5 proxy plumbing (reference proto/crawler.proto:24 -> scan.rs:30-32):
    a spec-level proxy URL must land on the per-worker pooled session as the
    http+https proxy BEFORE the transport issues any request. Injected
    session factory + recording transport prove it without a network."""
    import types

    def factory():
        return types.SimpleNamespace(proxies={})

    def transport(session, url, agent, timeout_s):
        # executes on the worker: serialize what the fetch stage configured
        return 200, ";".join(f"{k}={v}" for k, v in sorted(session.proxies.items()))

    f = HttpFetcher(transport=transport, proxy="http://proxy.example:3128",
                    session_factory=factory)
    batch = spark.createDataFrame([("http://h0.example.com/p0", "a")],
                                  "url_canon string, agent string")
    [row] = f.fetch(batch).collect()
    assert row["html"] == ("http=http://proxy.example:3128;"
                           "https=http://proxy.example:3128")
    # no proxy configured -> session untouched
    f2 = HttpFetcher(transport=transport, session_factory=factory)
    [row2] = f2.fetch(batch).collect()
    assert row2["html"] == ""


def test_default_transport_without_network(spark):
    """Default transport behavior, no injection: with `requests` importable
    but no network, connection failures map to the dead-link convention
    (status 0, empty body) — a real crawl treats unreachable hosts as dead,
    never as a job failure. Without `requests` at all, the stage raises
    NotImplementedError loudly instead of yielding silent empties."""
    f = HttpFetcher(timeout_s=0.5)
    batch = spark.createDataFrame(
        [("http://nonexistent-host-2471.invalid/p0", "a")],
        "url_canon string, agent string")
    try:
        rows = f.fetch(batch).collect()
    except Exception as e:                   # requests missing entirely
        assert "no network in sandbox" in str(e)
    else:
        assert [(r["status"], r["bytes"], r["html"]) for r in rows] == [(0, 0, "")]
