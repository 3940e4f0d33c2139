"""Deterministic synthetic web graph — the crawl substrate (FIXTURES.md §2).

Both the Spark engine (simulated-fetch join, SURVEY.md §2.4 J4) and the
single-threaded reference-semantics oracle (tests/oracle.py) consume the SAME
generated web: pages with single-line HTML bodies whose <a>/<img> tags are the
out-edges, per-host robots.txt bodies, and a seed list. No network exists in
the sandbox (and determinism is required by the test oracle), so the fixture
replaces reqwest (reference Cargo.lock:1843) as the fetch substrate.

Everything is a pure function of (seed, host, page_idx, slot): hashes come
from blake2b, primary-host sizes from a Zipf-like series (heavy host-key skew
— what the salting/AQE logic must survive, BASELINE.json north_rule). Besides
the primary hosts ``host{i}.example.com`` there are subdomain variants
(``sub.host{i}.example.com``) and alternate-TLD variants
(``host{i}.example.org``) to exercise the F3/F4 scope filters, plus anchor
links to static assets to exercise the F8 asset filter.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass
from functools import lru_cache

import pandas as pd


def _h(*parts) -> int:
    """Deterministic 64-bit hash of the argument tuple."""
    raw = "\x1f".join(str(p) for p in parts).encode()
    return int.from_bytes(hashlib.blake2b(raw, digest_size=8).digest(), "big")


_WORDS = (
    "crawl frontier wave fetch parse link media span host depth seed robots "
    "token bucket bloom filter shuffle partition skew salt hash dedup scope "
    "canonical url page graph node edge batch arrow pandas spark wave commit"
).split()


@dataclass(frozen=True)
class WebGraphConfig:
    seed: int = 42
    n_hosts: int = 20
    n_variant_hosts: int = 3          # first k primaries get sub./alt-TLD twins
    max_pages_per_host: int = 40      # host0 gets ~this many (Zipf head)
    zipf_a: float = 1.3
    out_degree: int = 6
    cross_host_edge_prob: float = 0.25
    media_span_prob: float = 0.5
    robots_deny_prob: float = 0.3     # fraction of hosts with a deny rule
    robots_delay_prob: float = 0.2    # fraction of hosts with Crawl-delay
    error_rate: float = 0.08          # 404/429/500 pages
    sitemap_prob: float = 0.7         # fraction of primaries with sitemap.xml
    redirect_rate: float = 0.06       # fraction of pages that 301 (same host)
    sitemap_orphans: int = 2          # sitemap-only pages (no inbound links)

    def primary(self, i: int) -> str:
        return f"host{i}.example.com"

    def hosts(self) -> list[str]:
        out = [self.primary(i) for i in range(self.n_hosts)]
        for i in range(min(self.n_variant_hosts, self.n_hosts)):
            out.append(f"sub.{self.primary(i)}")
            out.append(f"host{i}.example.org")
        return out

    def pages_of(self, host: str) -> int:
        if host.startswith("sub.") or host.endswith(".org"):
            return 2
        i = int(host.split(".", 1)[0][4:])
        return max(2, int(self.max_pages_per_host / float(i + 1) ** (self.zipf_a - 1.0)))


def page_url(host: str, pi: int) -> str:
    return f"http://{host}/p{pi}"


def _page_html(cfg: WebGraphConfig, host: str, pi: int) -> str:
    """Single-line HTML for (host, page): text, anchors, media — offsets are
    byte-stable because the string is assembled deterministically.
    Redirect pages serve an empty body (the fetcher substitutes the
    chain target's body, as reqwest's transparent following does)."""
    if page_status(cfg, host, pi) == 301:
        return ""
    rng = _h(cfg.seed, "page", host, pi)
    n_pages = cfg.pages_of(host)
    is_primary = not (host.startswith("sub.") or host.endswith(".org"))
    hi = int(host.split(".", 1)[0][4:]) if is_primary else -1
    parts = [f"<html><body><h1>{host} page {pi}</h1>"]
    for slot in range(cfg.out_degree):
        r = _h(cfg.seed, "edge", host, pi, slot)
        w1 = _WORDS[r % len(_WORDS)]
        w2 = _WORDS[(r >> 8) % len(_WORDS)]
        parts.append(f"<p>{w1} {w2} section {slot}</p>")
        if (r >> 16) % 1000 < cfg.cross_host_edge_prob * 1000:
            thost = cfg.primary((r >> 24) % cfg.n_hosts)
            tpi = (r >> 32) % cfg.pages_of(thost)
            href = page_url(thost, tpi)              # absolute cross-host link
        else:
            tpi = (r >> 32) % n_pages
            href = f"/p{tpi}"                        # relative same-host link
        parts.append(f'<a href="{href}">{w1} link {slot}</a>')
        if (r >> 40) % 1000 < cfg.media_span_prob * 1000:
            ext = ("png", "mp4", "ogg")[(r >> 48) % 3]
            tag = ("img", "video", "audio")[(r >> 48) % 3]
            parts.append(f'<{tag} src="/static/m{(r >> 52) % 97}.{ext}"/>')
        if (r >> 56) % 10 == 0:                      # F8 bait: anchor to asset
            parts.append(f'<a href="/static/d{(r >> 58) % 13}.pdf">asset {slot}</a>')
    if is_primary and hi < cfg.n_variant_hosts and pi == 0:
        # scope-filter bait: links to subdomain + alternate-TLD twins
        parts.append(f'<a href="http://sub.{host}/p0">sub link</a>')
        parts.append(f'<a href="http://host{hi}.example.org/p0">tld link</a>')
    parts.append(f"<footer>fin {rng % 997}</footer></body></html>")
    return "".join(parts)


def page_status(cfg: WebGraphConfig, host: str, pi: int) -> int:
    r = _h(cfg.seed, "status", host, pi) % 1000
    if pi > 0 and r < cfg.error_rate * 1000:   # page 0 always fetchable
        return (404, 429, 500)[r % 3]
    if pi > 0 and r < (cfg.error_rate + cfg.redirect_rate) * 1000:
        return 301                              # followed inside the fetcher
    return 200


def page_location(cfg: WebGraphConfig, host: str, pi: int) -> str:
    """Location target of a 301 page ('' otherwise): deterministic
    same-host pointer. Targets may themselves redirect (chains) or point
    back (loops) — both arise naturally and exercise the hop cap."""
    if page_status(cfg, host, pi) != 301:
        return ""
    n = max(1, cfg.pages_of(host))
    t = (pi * 7 + 3) % n
    if t == pi:
        t = (pi + 1) % n
    return page_url(host, t)


def robots_body(cfg: WebGraphConfig, host: str) -> str:
    """robots.txt for a host ('' = absent)."""
    r = _h(cfg.seed, "robots", host)
    lines = ["User-agent: *"]
    has_rule = False
    if (r % 1000) < cfg.robots_deny_prob * 1000:
        k = (r >> 16) % 7
        lines.append(f"Disallow: /p{k}")           # denies p{k}, p{k}0, p{k}1, ...
        lines.append(f"Allow: /p{k}0")             # carve-back (longer match wins)
        has_rule = True
    if ((r >> 32) % 1000) < cfg.robots_delay_prob * 1000:
        lines.append(f"Crawl-delay: {1 + (r >> 40) % 3}")
        has_rule = True
    if has_sitemap(cfg, host):
        # Non-group field (valid anywhere per the robots spec); the only
        # pointer to sitemap-alt.xml roots
        lines.append(
            f"Sitemap: http://{host}/{sitemap_root_path(cfg, host)}")
        has_rule = True
    return "\n".join(lines) if has_rule else ""


def sitemap_root_path(cfg: WebGraphConfig, host: str) -> str:
    """Where a host serves its root sitemap: ~25% of sitemap hosts use a
    non-well-known name (sitemap-alt.xml) DISCOVERABLE ONLY via the
    robots.txt `Sitemap:` directive — the discovery path real crawlers
    (and the sitemap crate) implement alongside the well-known probe."""
    if (_h(cfg.seed, "smalt", host) % 1000) < 250:
        return "sitemap-alt.xml"
    return "sitemap.xml"


def has_sitemap(cfg: WebGraphConfig, host: str) -> bool:
    if host.startswith("sub.") or host.endswith(".org"):
        return False
    return (_h(cfg.seed, "sitemap", host) % 1000) < cfg.sitemap_prob * 1000


def total_pages_of(cfg: WebGraphConfig, host: str) -> int:
    """Organic pages + sitemap-only orphans (S4). Orphans live past the
    organic index range, so no page ever links to them — only the sitemap
    reaches them; link targets are always modulo the ORGANIC count."""
    return cfg.pages_of(host) + (cfg.sitemap_orphans if has_sitemap(cfg, host)
                                 else 0)


def has_sitemap_index(cfg: WebGraphConfig, host: str) -> bool:
    """~40% of sitemap hosts publish a <sitemapindex> of two child
    sitemaps instead of one flat urlset (the large-site layout; the
    sitemaps.org 50k-URL cap forces it at scale). The spider crate's
    sitemap reader recurses these (Cargo.lock:2136-2145)."""
    return has_sitemap(cfg, host) and (_h(cfg.seed, "smidx", host)
                                       % 1000) < 400


def _sitemap_page_urls(cfg: WebGraphConfig, host: str) -> list[str]:
    n = cfg.pages_of(host)
    urls = [page_url(host, pi) for pi in range(0, n, 3)]
    urls += [page_url(host, n + j) for j in range(cfg.sitemap_orphans)]
    return urls


def _urlset(urls: list[str]) -> str:
    entries = "".join(f"<url><loc>{u}</loc></url>" for u in urls)
    return ('<?xml version="1.0" encoding="UTF-8"?>'
            '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
            + entries + "</urlset>")


def sitemap_body(cfg: WebGraphConfig, host: str,
                 path: str = "sitemap.xml") -> str:
    """Body of http://host/<path> ('' = absent). Flat hosts serve one
    urlset at sitemap.xml (every 3rd organic page plus orphans); index
    hosts serve a <sitemapindex> there pointing at sitemap-0.xml /
    sitemap-1.xml which split the same URL list (even/odd), so the
    TRANSITIVE page set is identical either way — nesting must be
    semantics-neutral, which is what the index e2e tests pin."""
    if not has_sitemap(cfg, host):
        return ""
    root = sitemap_root_path(cfg, host)
    if has_sitemap_index(cfg, host):
        if path == root:
            entries = "".join(
                f"<sitemap><loc>http://{host}/sitemap-{i}.xml</loc>"
                f"</sitemap>" for i in range(2))
            return ('<?xml version="1.0" encoding="UTF-8"?>'
                    '<sitemapindex xmlns='
                    '"http://www.sitemaps.org/schemas/sitemap/0.9">'
                    + entries + "</sitemapindex>")
        if path in ("sitemap-0.xml", "sitemap-1.xml"):
            i = int(path[8])
            return _urlset(_sitemap_page_urls(cfg, host)[i::2])
        return ""
    if path == root:
        return _urlset(_sitemap_page_urls(cfg, host))
    return ""


def gen_sitemaps_src(cfg: WebGraphConfig) -> pd.DataFrame:
    """(host, path, xml) rows for every sitemap document the fixture
    serves — roots AND index children (the engine/oracle look children
    up here by (host, path), standing in for the re-fetch)."""
    rows = []
    for h in cfg.hosts():
        for p in ("sitemap.xml", "sitemap-alt.xml",
                  "sitemap-0.xml", "sitemap-1.xml"):
            b = sitemap_body(cfg, h, p)
            if b:
                rows.append((h, p, b))
    return pd.DataFrame(rows, columns=["host", "path", "xml"])


def to_spark_sitemaps(spark, cfg: WebGraphConfig):
    return spark.createDataFrame(gen_sitemaps_src(cfg))


@lru_cache(maxsize=8)
def _pages_cached(cfg: WebGraphConfig) -> pd.DataFrame:
    rows = []
    for host in cfg.hosts():
        for pi in range(total_pages_of(cfg, host)):
            html = _page_html(cfg, host, pi)
            rows.append((page_url(host, pi), host,
                         page_status(cfg, host, pi), len(html), html,
                         page_location(cfg, host, pi)))
    return pd.DataFrame(rows, columns=["url_canon", "host", "status",
                                       "bytes", "html", "location"])


def gen_pages(cfg: WebGraphConfig) -> pd.DataFrame:
    """All pages: (url_canon, host, status, bytes, html)."""
    return _pages_cached(cfg).copy()


def gen_robots_src(cfg: WebGraphConfig) -> pd.DataFrame:
    rows = [(h, robots_body(cfg, h)) for h in cfg.hosts()]
    return pd.DataFrame(rows, columns=["host", "body"])


def gen_robots_pages(cfg: WebGraphConfig) -> pd.DataFrame:
    """robots.txt as a FETCHABLE substrate (for the lazy robots-cache path):
    one row per host, status 200 with the body, or 404/empty when the host
    has no robots.txt — exactly what a GET {host}/robots.txt returns."""
    rows = []
    for h in cfg.hosts():
        body = robots_body(cfg, h)
        rows.append((f"http://{h}/robots.txt", h,
                     200 if body else 404, len(body), body))
    return pd.DataFrame(rows, columns=["url_canon", "host", "status",
                                       "bytes", "html"])


def to_spark_robots_pages(spark, cfg: WebGraphConfig):
    return spark.createDataFrame(gen_robots_pages(cfg))


def gen_seeds(cfg: WebGraphConfig, n_seeds: int = 3) -> list[str]:
    """Seed URLs: page 0 of the n_seeds largest primaries (uppercased host in
    one seed to exercise case-insensitive dedup, reference Cargo.lock:289)."""
    seeds = [page_url(cfg.primary(i), 0) for i in range(min(n_seeds, cfg.n_hosts))]
    if seeds:
        seeds[0] = seeds[0].replace("host0", "HOST0", 1)
    return seeds


def to_spark(spark, cfg: WebGraphConfig):
    """(pages_df, robots_src_df) as Spark DataFrames (driver-side gen —
    fine up to ~50k pages; use to_spark_distributed beyond that)."""
    return (spark.createDataFrame(gen_pages(cfg)),
            spark.createDataFrame(gen_robots_src(cfg)))


def to_spark_distributed(spark, cfg: WebGraphConfig, parts: int | None = None):
    """(pages_df, robots_src_df) with the page bodies generated ON EXECUTORS.

    The page set is a pure function of (cfg.seed, host, page_idx), so
    generation distributes trivially: a tiny driver-side (host, n_pages)
    table fans out via explode(sequence(...)), and a mapInPandas stage
    renders each page's HTML where the data will live. This is the scale
    path for the bench/scaling fixtures (hundreds of thousands of pages —
    driver-side pandas would serialize gigabytes through one process).
    """
    from pyspark.sql import functions as F

    hosts = cfg.hosts()
    hdf = spark.createDataFrame([(h, total_pages_of(cfg, h)) for h in hosts],
                                "host string, n int")
    pairs = hdf.select(
        "host", F.explode(F.sequence(F.lit(0), F.col("n") - 1)).alias("pi"))
    pairs = pairs.repartition(parts or spark.sparkContext.defaultParallelism)

    def _render(batches):
        for pdf in batches:
            urls, statuses, nbytes, htmls, locs = [], [], [], [], []
            for host, pi in zip(pdf["host"], pdf["pi"]):
                html = _page_html(cfg, host, int(pi))
                urls.append(page_url(host, int(pi)))
                statuses.append(page_status(cfg, host, int(pi)))
                nbytes.append(len(html))
                htmls.append(html)
                locs.append(page_location(cfg, host, int(pi)))
            out = pd.DataFrame({
                "url_canon": urls, "host": pdf["host"].values,
                "status": statuses, "bytes": nbytes, "html": htmls,
                "location": locs})
            yield out

    pages = pairs.mapInPandas(
        _render,
        "url_canon string, host string, status long, bytes long, "
        "html string, location string")
    return pages, spark.createDataFrame(gen_robots_src(cfg))
