"""Fetch-and-parse stage (SURVEY.md §2.1 S5 + §2.3 P2).

The reference fetches with reqwest (Cargo.lock:1843) and streams an HTML5
parse for links (fast_html5ever, Cargo.lock:644). Here the stage is split:

  * **fetch** — pluggable. `SimulatedFetcher` joins the batch against the
    synthetic web-graph pages table (inner equi-join on url_canon — J4); a
    real deployment would swap in `HttpFetcher` (iterator pandas UDF holding
    a connection pool per Python worker) — stubbed, no network in sandbox.
  * **parse** — one `mapInPandas` pass over Arrow batches that runs the
    byte-offset span scanner (sources/parse.py) once per page and emits FOUR
    PARALLEL ARRAYS (kinds, texts, refs, offsets). The struct array is then
    assembled natively with `F.arrays_zip`, so no Python builds Arrow structs
    and downstream explode/filter stay JVM-side.

User-agent assignment (P3): deterministic per-host pick from the UA pool via
xxhash64(host) — the reference randomizes (README.md:13); determinism is
required by the oracle contract (SURVEY.md §5.3).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType, IntegerType, LongType, StringType, StructField, StructType,
)

from crawler_spark.sources.parse import extract_resolved_spans

_PARSE_COLS = [
    StructField("kinds", ArrayType(StringType(), False), False),
    StructField("texts", ArrayType(StringType(), False), False),
    StructField("refs", ArrayType(StringType(), False), False),
    StructField("offsets", ArrayType(IntegerType(), False), False),
]


def _resolve_redirect_pages(pages: DataFrame) -> DataFrame:
    """Transparent 3xx following (reqwest parity — the reference's fetch
    returns the chain target's body and the crawl never sees the hop):
    rewrite every redirect row to its FINAL target's (status, bytes,
    html), resolved by pointer doubling (hostrank.resolve_redirects —
    the g6 analytics operator is load-bearing here), with loops and
    chains past 16 hops mapped to status 0 (the redirect-limit error a
    real fetcher raises, surfaced as the dead-link convention). One-time
    table-cardinality cost at fetcher construction, zero per-wave cost."""
    from crawler_spark.operators.hostrank import resolve_redirects

    is_red = (F.col("status") >= 300) & (F.col("status") < 400) \
        & (F.col("location") != "")
    direct = pages.where(~is_red).select("url_canon", "status",
                                         "bytes", "html")
    red = pages.where(is_red).select(F.col("url_canon").alias("src"),
                                     F.col("location").alias("dst"))
    if not red.take(1):
        return direct
    r = resolve_redirects(red)
    tgt = direct.select(F.col("url_canon").alias("final"),
                        F.col("status").alias("_ts"),
                        F.col("bytes").alias("_tb"),
                        F.col("html").alias("_th"))
    landed = (r.join(tgt, "final", "left")
              .select(F.col("src").alias("url_canon"),
                      F.when(F.col("resolved") == 1,
                             F.coalesce(F.col("_ts"), F.lit(0)))
                       .otherwise(F.lit(0)).cast("long").alias("status"),
                      F.when(F.col("resolved") == 1,
                             F.coalesce(F.col("_tb"), F.lit(0)))
                       .otherwise(F.lit(0)).cast("long").alias("bytes"),
                      F.when(F.col("resolved") == 1,
                             F.coalesce(F.col("_th"), F.lit("")))
                       .otherwise(F.lit("")).alias("html")))
    return direct.unionByName(landed)


class SimulatedFetcher:
    """Deterministic fetch over the fixture web: left join on url_canon.
    Missing URL -> status 0 (dead link), empty body. Pages tables that
    carry a `location` column get transparent 3xx following (above)."""

    def __init__(self, pages: DataFrame, cache: bool = True):
        # (url_canon, status, bytes, html); host is re-derivable, drop to
        # keep the join payload minimal (column pruning by construction).
        # Cached: probed once per wave (MEMORY_AND_DISK, spill-safe).
        if "location" in pages.columns:
            # Eagerly materialize the redirect-resolved table NOW: the
            # resolution plan is a union of two full fixture scans plus the
            # landing-target join, and leaving it lazy re-derives all of it
            # inside the first wave's fetch join — a serial-ish planning +
            # recompute cost that scaling studies 25-26 measured as a ~40s
            # parallelism-independent component (BENCH/BASELINE.md). A real
            # fetcher pays redirects per response; construction-time
            # resolution is fixture preparation and must behave like it.
            pages = _resolve_redirect_pages(pages).select(
                "url_canon", "status", "bytes", "html")
            pages = pages.localCheckpoint(eager=True)
        self.pages = pages.select("url_canon", "status", "bytes", "html")
        if cache:
            self.pages = self.pages.persist()

    def fetch(self, batch: DataFrame) -> DataFrame:
        """batch(url_canon, depth, priority, ...) -> + status, bytes, html."""
        fetched = batch.join(self.pages, "url_canon", "left_outer")
        return (fetched
                .withColumn("status", F.coalesce(F.col("status"), F.lit(0)))
                .withColumn("bytes", F.coalesce(F.col("bytes"), F.lit(0)))
                .withColumn("html", F.coalesce(F.col("html"), F.lit(""))))


class ConditionalFetcher:
    """RFC 9110 conditional revalidation over any inner fetcher: the
    If-None-Match / 304 Not Modified cycle a production recrawler runs
    (reqwest surfaces ETag revalidation the same way; the reference's
    spider crate re-fetches unconditionally — this is the incremental-
    crawl upgrade on top of S5).

    `validators` is (url_canon, etag) — the strong validator recorded at
    the LAST fetch (fetch_log.content_sig, i.e. md5 of the body; real
    ETags are opaque server tokens, a content hash is the strong-
    validator model every cache may synthesize, RFC 9110 §8.8.3).
    Semantics: where the inner fetch returns 200 and the fresh body
    hashes to the stored validator, the row becomes status=304 with NO
    body and bytes=0 (the transfer a real 304 avoids), and
    `content_sig` carries the validator forward so change-rate
    estimation (rc2, Cho & Garcia-Molina) sees an explicit "observed
    unchanged" sample instead of a gap.

    Dropping the 304 body also skips re-parsing — sound for frontier
    expansion because an unchanged page's outlinks were already walked
    by the crawl that recorded the validator: every target is either in
    `seen` (not re-admissible) or itself due (already in the recrawl
    frontier). Pair with `merge_revalidated` to overlay the stored
    documents for 304 rows.

    Scale shape: validators are due-set-sized (NOT a small dim — no
    broadcast): one shuffle join on url_canon against the fetch batch,
    which the wave loop already partitions by url_hash; the simulated
    fetch join and this join co-partition under AQE. The 304 rewrite is
    a map-side projection. `content_sig` is computed FIRST and the
    not-modified flag derives from it — deriving the flag from
    `md5(html)` directly and rewriting html in the same chain is the
    classic self-clobbering projection bug (CollapseProject keeps it
    correct but the intent gets fragile); the residual cost is Catalyst
    inlining the md5 into each consumer (NOTES fact #1), bounded at a
    few hash evaluations per row on the 200 path."""

    def __init__(self, inner, validators: DataFrame):
        self.inner = inner
        self.validators = (validators
                           .select("url_canon", F.col("etag").alias("_etag"))
                           .distinct())

    def fetch(self, batch: DataFrame) -> DataFrame:
        res = self.inner.fetch(batch)
        sig = F.when(F.col("status") == 200, F.md5("html")).otherwise(F.lit(""))
        nm = (F.col("status") == 200) & (F.col("content_sig") == F.col("_etag"))
        return (res.join(self.validators, "url_canon", "left")
                .withColumn("content_sig", sig)
                .withColumn("_nm", F.coalesce(nm, F.lit(False)))
                .withColumn("bytes", F.when(F.col("_nm"), F.lit(0))
                            .otherwise(F.col("bytes")))
                .withColumn("html", F.when(F.col("_nm"), F.lit(""))
                            .otherwise(F.col("html")))
                .withColumn("status", F.when(F.col("_nm"), F.lit(304))
                            .otherwise(F.col("status")))
                .drop("_etag", "_nm"))


def _default_transport(session, url: str, agent: str,
                       timeout_s: float) -> tuple[int, str]:
    """Production transport: one pooled GET. The sandbox has no network, so
    the default path raises at execution time — inject a transport (tests use
    a deterministic fake) or use SimulatedFetcher."""
    if session is None:
        raise NotImplementedError(
            "no network in sandbox — inject `transport=` or use "
            "SimulatedFetcher (production: urllib3/requests pool per worker)")
    r = session.get(url, timeout=timeout_s, headers={"User-Agent": agent})
    return int(r.status_code), r.text


class HttpFetcher:
    """Real-network fetcher (SURVEY.md §2.1 S5): the batch flows through ONE
    `mapInPandas` pass; each Python worker lazily builds a single pooled HTTP
    session (the Spark analog of reqwest's connection pooling,
    Cargo.lock:1843) and reuses it across Arrow batches. Output contract is
    identical to SimulatedFetcher: + (status, bytes, html); dead transport ->
    status 0, empty body (matching the dead-link convention).

    `transport(session, url, agent, timeout_s) -> (status, html)` is
    injectable: tests drive the full plumbing — batching, per-worker session
    reuse, error mapping — with a deterministic fake; production uses the
    default pooled-GET transport.

    `proxy` mirrors the reference's ScanRequest.proxy field
    (proto/crawler.proto:24, plumbed at src/scanner/scan.rs:30-32): a
    non-empty value is installed on each worker's pooled session as the
    http+https proxy, so every GET issued by the transport routes through
    it. `session_factory` is injectable alongside `transport` so tests can
    assert the proxy actually reaches the session config without a network.
    """

    def __init__(self, timeout_s: float = 10.0, user_agent: str = "",
                 transport=None, proxy: str = "", session_factory=None):
        self.timeout_s = timeout_s
        self.user_agent = user_agent
        self.transport = transport or _default_transport
        self.proxy = proxy
        self.session_factory = session_factory

    def _make_session(self):
        if self.session_factory is not None:
            session = self.session_factory()
        else:
            try:  # pragma: no cover - requests absent/no network in sandbox
                import requests
                session = requests.Session()
            except Exception:
                session = None
        if session is not None and self.proxy:
            # requests.Session carries per-scheme proxies; the same dict
            # shape works for any injected session object exposing .proxies.
            session.proxies.update({"http": self.proxy, "https": self.proxy})
        return session

    def fetch(self, batch: DataFrame) -> DataFrame:
        in_fields = list(batch.schema.fields)
        out_schema = StructType(in_fields + [
            StructField("status", LongType(), False),
            StructField("bytes", LongType(), False),
            StructField("html", StringType(), False),
        ])
        keep = [f.name for f in in_fields]
        transport = self.transport
        timeout_s = self.timeout_s
        ua_override = self.user_agent
        make_session = self._make_session

        def _fetch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            session = make_session()           # one pool per Python worker
            for pdf in batches:
                statuses, sizes, bodies = [], [], []
                agents = (pdf["agent"] if "agent" in pdf
                          else pd.Series([ua_override] * len(pdf)))
                for url, agent in zip(pdf["url_canon"], agents):
                    try:
                        status, html = transport(session, url,
                                                 ua_override or agent, timeout_s)
                    except NotImplementedError:
                        raise
                    except Exception:
                        status, html = 0, ""   # dead link convention
                    statuses.append(int(status))
                    sizes.append(len(html))
                    bodies.append(html)
                out = pdf[keep].copy()
                out["status"], out["bytes"], out["html"] = statuses, sizes, bodies
                yield out

        return batch.mapInPandas(_fetch, out_schema)


def _chrome_transport(session, url: str, agent: str,
                      timeout_s: float) -> tuple[int, str]:
    """Headless-browser transport (reference features `chrome`/`smart`,
    Cargo.toml:44-45; chromiumoxide Cargo.lock:325-340): navigate, await
    network-idle, return the rendered DOM. No browser exists in this
    sandbox, so the default raises at execution time — inject a transport
    (tests use a deterministic fake) or run where a Chrome DevTools
    endpoint is reachable (production: one CDP websocket + tab pool per
    Python worker; Page.navigate then
    Runtime.evaluate(document.documentElement.outerHTML))."""
    raise NotImplementedError(
        "no headless browser in sandbox — inject `transport=` or use "
        "HttpFetcher/SimulatedFetcher")


class ChromeFetcher(HttpFetcher):
    """S6 smart/JS-rendering fetch on the SAME pluggable fetcher surface
    (SURVEY.md §2.1 S6): identical batch contract and mapInPandas plumbing
    as HttpFetcher — only the transport differs, mirroring how the
    reference gates rendering behind the `chrome` feature flag while the
    crawl loop stays unchanged."""

    def __init__(self, timeout_s: float = 30.0, user_agent: str = "",
                 transport=None, proxy: str = "", session_factory=None):
        super().__init__(timeout_s=timeout_s, user_agent=user_agent,
                         transport=transport or _chrome_transport,
                         proxy=proxy, session_factory=session_factory)


def needs_render_col(html, status):
    """S6 smart-mode routing predicate as PURE COLUMN ALGEBRA (stays in
    whole-stage codegen — the per-page decision costs no Python).

    A page "needs rendering" when the plain HTTP response is a JS
    application shell: HTTP 200 with a <script> tag but almost no visible
    text once tags are stripped (< 40 chars), or an explicit
    scripting-required marker (noscript-enable-JS prose / an empty SPA
    mount div). Mirrors the reference's `smart` feature gate
    (Cargo.toml:45 -> spider/smart), which falls back to a headless
    browser only when plain HTTP yields a JS-rendered document."""
    stripped = F.trim(F.regexp_replace(html, r"<[^>]*>", " "))
    has_script = F.instr(F.lower(html), "<script") > 0
    shell = has_script & (F.length(stripped) < 40)
    marker = (F.lower(html).contains("enable javascript")
              | F.lower(html).rlike(r'<div[^>]*id="(root|app)"[^>]*>\s*</div>'))
    return (status == 200) & (shell | marker)


class SmartFetcher:
    """S6 smart fetch: HTTP first, headless re-render only where needed —
    the reference's `smart` feature (Cargo.toml:45), which tries a plain
    request and escalates to Chrome when the document is JS-rendered.

    Spark-first split: the cheap HTTP pass fetches EVERY row; the routing
    decision is a codegen predicate (`needs_render_col`) — no Python — and
    only the shell rows re-enter the (expensive) Chrome mapInPandas stage.
    At scale this keeps the browser fleet sized to the JS fraction of the
    web, not the whole frontier; both passes are the same pluggable
    fetcher surface, so politeness/robots gating upstream is unchanged.

    Output contract is identical to HttpFetcher (+ a `rendered` boolean
    audit column: true on rows that went through the browser pass).
    """

    def __init__(self, http: HttpFetcher | None = None,
                 chrome: ChromeFetcher | None = None):
        self.http = http or HttpFetcher()
        self.chrome = chrome or ChromeFetcher()

    def fetch(self, batch: DataFrame) -> DataFrame:
        # persist = a re-fetch barrier: the plan forks into plain/shell
        # branches below, and without it each branch would re-run the HTTP
        # mapInPandas — re-issuing every GET. MEMORY_AND_DISK, freed when
        # the wave's batch goes out of scope.
        first = self.http.fetch(batch).persist()
        needs = needs_render_col(F.col("html"), F.col("status"))
        plain = (first.where(~needs)
                 .withColumn("rendered", F.lit(False)))
        shell = first.where(needs).drop("status", "bytes", "html")
        rendered = (self.chrome.fetch(shell)
                    .withColumn("rendered", F.lit(True)))
        return plain.unionByName(rendered)


def parse_spans(fetched: DataFrame) -> DataFrame:
    """Add `spans: array<struct<kind,text,media_ref,offset>>`, drop `html`.

    Non-200 pages get empty spans (the reference only streams successfully
    fetched pages — src/scanner/scan.rs:54-57).
    """
    in_fields = [f for f in fetched.schema.fields if f.name != "html"]
    out_schema = StructType(in_fields + _PARSE_COLS)
    keep = [f.name for f in in_fields]

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            kinds, texts, refs, offsets = [], [], [], []
            for url, status, html in zip(pdf["url_canon"], pdf["status"], pdf["html"]):
                if status == 200 and html:
                    spans = extract_resolved_spans(url, html)
                else:
                    spans = []
                kinds.append([s[0] for s in spans])
                texts.append([s[1] for s in spans])
                refs.append([s[2] for s in spans])
                offsets.append([s[3] for s in spans])
            out = pdf[keep].copy()
            out["kinds"], out["texts"], out["refs"], out["offsets"] = (
                kinds, texts, refs, offsets)
            yield out

    parsed = fetched.mapInPandas(_parse, out_schema)
    spans = F.arrays_zip(
        F.col("kinds").alias("kind"), F.col("texts").alias("text"),
        F.col("refs").alias("media_ref"), F.col("offsets").alias("offset"))
    return parsed.withColumn("spans", spans).drop("kinds", "texts", "refs", "offsets")


def ua_col(host, ua_pool: tuple[str, ...]):
    """P3: deterministic per-host UA pick (stays in codegen)."""
    arr = F.array(*[F.lit(u) for u in ua_pool])
    return F.element_at(arr, (F.pmod(F.xxhash64(host), F.lit(len(ua_pool))) + 1).cast("int"))
