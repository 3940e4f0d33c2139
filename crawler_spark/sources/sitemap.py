"""Sitemap seed expansion (SURVEY.md §2.1 S4).

The reference, with `sitemap` set (proto/crawler.proto:25), runs
`crawl_sitemap()` before the main crawl and carries the discovered links into
the crawl via `persist_links()` (src/scanner/scan.rs:71-74,
src/scanner/crawl.rs:32-35; XML via the `sitemap`/`quick-xml` crates,
Cargo.lock:2136-2145/1755).

Spark-side: sitemap bodies for the SEED hosts are parsed in one mapInPandas
pass and the extracted URLs are unioned into the wave-0 frontier at depth 0,
subject to the same admission pipeline (scope/robots/dedup) as every other
candidate. The pure parser is shared with tests/oracle.py.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import ArrayType, StringType, StructField, StructType

_LOC_RE = re.compile(r"<loc>\s*([^<\s][^<]*?)\s*</loc>", re.IGNORECASE)


def parse_sitemap(xml: str) -> list[str]:
    """Extract <loc> URLs from a sitemap urlset body (document order).

    Regex-based on purpose: the fixture emits canonical single-line XML, and
    a streaming regex scan mirrors the reference's event-based quick-xml
    reader more closely than a DOM parse. Nested <sitemapindex> entries are
    returned like any other <loc> (callers re-fetch them at admission)."""
    if not xml:
        return []
    return _LOC_RE.findall(xml)


SITEMAP_URLS_SCHEMA = StructType([
    StructField("host", StringType(), False),
    StructField("urls", ArrayType(StringType(), False), False),
])


def parse_sitemaps_df(sitemap_src: DataFrame) -> DataFrame:
    """(host, xml) -> (host, urls) in one vectorized mapInPandas pass."""

    def _parse(batches):
        for pdf in batches:
            yield pd.DataFrame({
                "host": pdf["host"],
                "urls": [parse_sitemap(x or "") for x in pdf["xml"]],
            })

    return sitemap_src.mapInPandas(_parse, SITEMAP_URLS_SCHEMA)
