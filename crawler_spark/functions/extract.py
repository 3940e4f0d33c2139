"""Main-content extraction: link-density boilerplate stripping (ex1).

Production crawl pipelines (trafilatura / jusText / boilerpipe lineage)
separate article text from navigation chrome by BLOCK-LEVEL LINK DENSITY:
a block whose visible text is mostly anchor text is chrome (nav bars,
footers, sidebars, "related links"); a block that is mostly plain text is
content. This module is that classifier as pure Column algebra — zero
Python, zero shuffle, fully inside whole-stage codegen.

The ex1 driver query gates it end-to-end with the wc1 pattern:
render(text) -> HTML page with link-dense chrome blocks around the real
paragraphs -> extract -> must reproduce the normalized original text
byte-for-byte (md5), with the chrome gone and inline anchors' TEXT kept.

Scale shape: per-row HOF algebra over the page string — the 100 TB cost
is one map-side pass, no exchange of any kind.

Reference parity: the reference's spider crate exposes raw page bodies
(scan.rs response payloads); content extraction is the first thing a
training-data consumer bolts on top.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# block elements considered segmentation boundaries (render + parse agree)
_BLOCK_RE = r"(?s)<(?:p|div)[^>]*>(.*?)</(?:p|div)>"
_ANCHOR_RE = r"(?s)<a[^>]*>(.*?)</a>"
_TAG_RE = r"(?s)<[^>]+>"


def main_content_col(html: Column, max_link_density: float = 0.5) -> Column:
    """HTML page string -> extracted main-content text: split into
    <p>/<div> blocks, strip tags inside each (anchor TEXT survives, tags
    become spaces, whitespace collapses), drop blocks whose anchor-text
    share of the visible text is >= `max_link_density`, join survivors
    with single spaces.

    Let-binding discipline (NOTES fact #1): each block's (text, anchor
    text) pair is computed ONCE into a struct array; the filter and the
    final projection both read the structs instead of re-running the
    regexes per consumer."""
    blocks = F.regexp_extract_all(html, F.lit(_BLOCK_RE), 1)
    stripped = F.transform(
        blocks,
        lambda b: F.struct(
            F.trim(F.regexp_replace(
                F.regexp_replace(b, _TAG_RE, " "), r"\s+", " ")).alias("txt"),
            F.trim(F.regexp_replace(
                F.array_join(F.regexp_extract_all(b, F.lit(_ANCHOR_RE), 1),
                             " "), r"\s+", " ")).alias("atxt")))
    kept = F.filter(
        stripped,
        lambda s: (F.length(s.getField("txt")) > 0)
        & (F.length(s.getField("atxt"))
           < F.lit(max_link_density) * F.length(s.getField("txt"))))
    return F.array_join(F.transform(kept, lambda s: s.getField("txt")), " ")


def n_content_blocks_col(html: Column,
                         max_link_density: float = 0.5) -> Column:
    """Count of blocks `main_content_col` keeps (same classification)."""
    blocks = F.regexp_extract_all(html, F.lit(_BLOCK_RE), 1)
    stripped = F.transform(
        blocks,
        lambda b: F.struct(
            F.trim(F.regexp_replace(
                F.regexp_replace(b, _TAG_RE, " "), r"\s+", " ")).alias("txt"),
            F.trim(F.regexp_replace(
                F.array_join(F.regexp_extract_all(b, F.lit(_ANCHOR_RE), 1),
                             " "), r"\s+", " ")).alias("atxt")))
    kept = F.filter(
        stripped,
        lambda s: (F.length(s.getField("txt")) > 0)
        & (F.length(s.getField("atxt"))
           < F.lit(max_link_density) * F.length(s.getField("txt"))))
    return F.size(kept)


def render_page_col(words: Column, source: Column) -> Column:
    """Deterministic HTML page around a word array (the ex1 fixture
    renderer, all JVM-side): link-dense chrome (nav + sidebar + footer)
    wrapping 8-word content paragraphs; every 4th paragraph wraps its
    first word in an inline <a> (content with links must SURVIVE
    extraction). The chrome mentions the host so pages differ."""
    nav = F.concat(
        F.lit('<div class="nav"><a href="/">Home</a> '
              '<a href="/about">About</a> <a href="/c">'),
        source, F.lit("</a></div>"))
    side = F.lit('<div class="side"><a href="/1">one</a> '
                 '<a href="/2">two</a> <a href="/3">three</a> '
                 '<a href="/4">four</a></div>')
    foot = F.concat(F.lit('<div class="foot"><a href="/tos">terms</a> '
                          '<a href="/priv">privacy</a> (c) '),
                    source, F.lit("</div>"))
    n_chunks = F.ceil(F.size(words) / 8.0).cast("int")
    paras = F.array_join(F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.concat(
            F.lit("<p>"),
            # only FULL 8-word paragraphs carry the inline anchor: a 1-2
            # word trailing chunk would be mostly anchor text and get
            # (correctly) classified as chrome, breaking the identity gate
            F.when(
                (i % 4 == 3) & (F.size(F.slice(words, i * 8 + 1, 8)) == 8),
                F.concat(F.lit('<a href="/w">'),
                         F.element_at(words, i * 8 + 1), F.lit("</a> "),
                         F.array_join(F.slice(words, i * 8 + 2, 7), " ")))
             .otherwise(F.array_join(F.slice(words, i * 8 + 1, 8), " ")),
            F.lit("</p>"))), "")
    return F.concat(nav, side, paras, foot)
