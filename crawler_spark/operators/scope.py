"""Frontier admission filters (SURVEY.md §2.2 F2-F4, F6-F8).

The reference's scope flags ride on the ScanRequest: `subdomains`
(proto/crawler.proto:22), `tld` (:23), regex blacklist (feature `regex`,
Cargo.toml:43); scheme/asset validation lives in spider's link filter.

Each filter exists twice, by design:
  * a pure-Python predicate — the oracle's (tests/oracle.py) semantics,
  * a native Spark Column builder — stays inside whole-stage codegen, no UDF.
The pytest e2e equality between oracle and engine is what proves the two
formulations agree.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, functions as F

# extensions never enqueued (media is *captured as spans*, not crawled — F8)
ASSET_EXT_RE = r"\.(png|jpe?g|gif|webp|ico|svg|css|js|mjs|pdf|zip|gz|tar|mp3|mp4|ogg|wav|avi|mov|woff2?|ttf|eot)$"
_ASSET_RE = re.compile(ASSET_EXT_RE, re.IGNORECASE)


def tld_key(host: str) -> str:
    """Registrable-domain key with the public suffix dropped (single-label
    simplification: strip the last dot-segment). 'host0.example.com' and
    'host0.example.org' share key 'host0.example' — the F4 `tld` semantics."""
    return host.rsplit(".", 1)[0] if "." in host else host


def scope_ok(host: str, seed_hosts: set[str], subdomains: bool, tld: bool) -> bool:
    """F2/F3/F4 combined admission predicate (pure form)."""
    if host in seed_hosts:
        return True
    if subdomains and any(host.endswith("." + sh) for sh in seed_hosts):
        return True
    if tld:
        key = tld_key(host)
        if any(tld_key(sh) == key for sh in seed_hosts):
            return True
    return False


def path_only(url_canon: str) -> str:
    rest = url_canon.split("://", 1)[-1]
    i = rest.find("/")
    path = rest[i:] if i >= 0 else "/"
    return path.split("?", 1)[0]


def is_asset(url_canon: str) -> bool:
    return bool(_ASSET_RE.search(path_only(url_canon)))


def blacklisted(url_canon: str, patterns: tuple[str, ...]) -> bool:
    return any(re.search(p, url_canon) for p in patterns)


# ---------------------------------------------------------------- Spark side

def scope_col(host: Column, seed_hosts: list[str], subdomains: bool, tld: bool) -> Column:
    """Native-Spark F2/F3/F4 predicate over a `host` column."""
    cond = host.isin(seed_hosts)
    if subdomains:
        for sh in seed_hosts:
            cond = cond | host.endswith("." + sh)
    if tld:
        keys = sorted({tld_key(sh) for sh in seed_hosts})
        host_key = F.regexp_replace(host, r"\.[^.]+$", "")  # strip last label
        cond = cond | host_key.isin(keys)
    return cond


def asset_col(url_canon: Column) -> Column:
    """True when the URL path ends in a static-asset extension (F8).
    Path = strip scheme+authority, strip query — all codegen-native."""
    path = F.regexp_replace(url_canon, r"^[a-z]+://[^/]*", "")
    path = F.regexp_replace(path, r"\?.*$", "")
    return F.lower(path).rlike(ASSET_EXT_RE.lower())


def blacklist_col(url_canon: Column, patterns: tuple[str, ...]) -> Column:
    """True when any blacklist regex matches (F6). Keep patterns in the
    Java/Python-common regex subset."""
    cond = F.lit(False)
    for p in patterns:
        cond = cond | url_canon.rlike(p)
    return cond
