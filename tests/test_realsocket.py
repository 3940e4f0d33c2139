"""Real-socket exercise of the production fetch path (round-3 verdict item
4): HttpFetcher with its DEFAULT pooled-requests transport against a live
loopback HTTP server — the first thing a real user hits, previously only
covered via injected transports. Validates bytes-on-the-wire UA headers,
real 301/302 chain following, 404 mapping, socket timeouts, robots.txt
fetch-through (reference parity: src/scanner/scan.rs:30-38 drives reqwest
the same way), all end-to-end through Spark's mapInPandas workers.

Offline-safe: the server binds 127.0.0.1:0 inside the test process; no
external network is touched.
"""

from __future__ import annotations

import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from crawler_spark.sources.fetch import HttpFetcher

ROBOTS_BODY = (b"User-agent: *\n"
               b"Disallow: /private\n"
               b"Crawl-delay: 2\n")

PAGES = {
    "/": b"<html><a href='/a'>a</a> <a href='/b'>b</a></html>",
    "/a": b"<html>page a</html>",
    "/b": b"<html>page b</html>",
    "/robots.txt": ROBOTS_BODY,
}


class _Handler(BaseHTTPRequestHandler):
    seen_agents: list = []            # class-level: handler is per-request
    protocol_version = "HTTP/1.1"

    def log_message(self, *a):         # quiet
        pass

    def do_GET(self):                  # noqa: N802 (http.server API)
        _Handler.seen_agents.append(self.headers.get("User-Agent", ""))
        if self.path == "/redir1":
            return self._redirect(301, "/redir2")
        if self.path == "/redir2":
            return self._redirect(302, "/a")
        if self.path == "/slow":
            time.sleep(3)
            return self._body(200, b"late")
        body = PAGES.get(self.path)
        if body is None:
            return self._body(404, b"not found")
        return self._body(200, body)

    def _redirect(self, code, loc):
        self.send_response(code)
        self.send_header("Location", loc)
        self.send_header("Content-Length", "0")
        self.end_headers()

    def _body(self, code, body):
        self.send_response(code)
        self.send_header("Content-Type", "text/html")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)


@pytest.fixture(scope="module")
def live_server():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    yield base
    srv.shutdown()


def _batch(spark, urls):
    return spark.createDataFrame(
        [(u, 0, 0.0) for u in urls],
        "url_canon string, depth int, priority double")


def test_default_transport_real_tcp(spark, live_server):
    """200s, 404 mapping, real redirect-chain following, and the UA header
    actually on the wire — default transport, default session factory."""
    _Handler.seen_agents.clear()
    f = HttpFetcher(user_agent="RealBot/1.0", timeout_s=5.0)
    out = f.fetch(_batch(spark, [f"{live_server}/",
                                 f"{live_server}/a",
                                 f"{live_server}/gone",
                                 f"{live_server}/redir1"]))
    rows = {r["url_canon"].replace(live_server, ""): r for r in out.collect()}
    assert rows["/"]["status"] == 200 and b"/a" in rows["/"]["html"].encode()
    assert rows["/a"]["status"] == 200
    assert rows["/gone"]["status"] == 404
    # requests follows the 301 -> 302 chain; final status/body are /a's
    assert rows["/redir1"]["status"] == 200
    assert rows["/redir1"]["html"] == "<html>page a</html>"
    for r in rows.values():
        assert r["bytes"] == len(r["html"])
    assert set(_Handler.seen_agents) == {"RealBot/1.0"}


def test_socket_timeout_maps_to_dead_link(spark, live_server):
    """A genuinely slow socket (server sleeps past timeout_s) takes the
    dead-link convention: status 0, empty body — no worker crash."""
    f = HttpFetcher(timeout_s=0.5)
    out = f.fetch(_batch(spark, [f"{live_server}/slow",
                                 f"{live_server}/a"]))
    rows = {r["url_canon"].replace(live_server, ""): r for r in out.collect()}
    assert (rows["/slow"]["status"], rows["/slow"]["bytes"],
            rows["/slow"]["html"]) == (0, 0, "")
    assert rows["/a"]["status"] == 200


def test_refused_connection_maps_to_dead_link(spark):
    """Nothing listening on the port: ConnectionError -> status 0."""
    f = HttpFetcher(timeout_s=2.0)
    out = f.fetch(_batch(spark, ["http://127.0.0.1:9/never"]))
    r = out.collect()[0]
    assert (r["status"], r["bytes"], r["html"]) == (0, 0, "")


def test_robots_fetch_through_real_bytes(spark, live_server):
    """fetch_robots_rules drives robots.txt bytes over the wire through the
    same fetcher and compiles Crawl-delay + Disallow from what the server
    actually sent; an unknown host compiles to allow-all (RFC 9309)."""
    from crawler_spark.operators.robots import fetch_robots_rules

    host = live_server.replace("http://", "")
    hosts = spark.createDataFrame([(host,), ("127.0.0.1:9",)], "host string")
    rules = {r["host"]: r for r in fetch_robots_rules(
        HttpFetcher(user_agent="RealBot/1.0", timeout_s=5.0),
        hosts, wave=3).collect()}
    live = rules[host]
    assert live["fetched_wave"] == 3
    assert live["crawl_delay_ms"] == 2000
    assert any(p == "/private" for p in live["deny_prefixes"])
    dead = rules["127.0.0.1:9"]
    assert list(dead["deny_prefixes"]) == []      # unavailable -> allow-all
