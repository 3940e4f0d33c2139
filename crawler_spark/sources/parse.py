"""Streaming HTML -> interleaved span extraction (SURVEY.md §2.3 P2).

The reference links `fast_html5ever` (Cargo.lock:644) for a streaming parse
that collects <a href> outlinks in document order; it never builds a DOM.
Here the parse emits the BASELINE.json `input_hint` payload directly:

    spans: array<struct<kind:string, text:string, media_ref:string, offset:int>>

with kind in ('text','link','media'), offset = character offset of the span
start in the source document, strictly increasing. The per-row invariant vs
the reference is span-sequence equality on (kind, text, media_ref, order).

Deliberately a hand-rolled scanner, not an HTML library DOM (SURVEY.md §7
hard-part (a)): offsets are pinned to a byte-offset contract that cannot
drift with parser versions. Handles the tag subset a link/media crawler
cares about; unknown tags are treated as inert separators.
"""

from __future__ import annotations

import re

from pyspark.sql.types import (
    ArrayType, IntegerType, StringType, StructField, StructType,
)

SPAN_STRUCT = StructType([
    StructField("kind", StringType(), False),
    StructField("text", StringType(), False),
    StructField("media_ref", StringType(), False),
    StructField("offset", IntegerType(), False),
])
SPANS_TYPE = ArrayType(SPAN_STRUCT, False)

_TAG_RE = re.compile(r"<[^>]*>")
_HREF_RE = re.compile(r"""\bhref\s*=\s*["']([^"']*)["']""", re.IGNORECASE)
_SRC_RE = re.compile(r"""\bsrc\s*=\s*["']([^"']*)["']""", re.IGNORECASE)
_WS_RE = re.compile(r"\s+")
_MEDIA_TAGS = ("img", "video", "audio", "source", "embed", "iframe")
_SKIP_CONTENT = ("script", "style")


_NAME_RE = re.compile(r"[a-zA-Z0-9]+")


def _tag_name(tag: str) -> str:
    body = tag[1:-1].strip().lstrip("/")
    m = _NAME_RE.match(body)
    return m.group(0).lower() if m else ""


def extract_spans(html: str) -> list[tuple[str, str, str, int]]:
    """Scan ``html`` once; return [(kind, text, media_ref, offset), ...].

    * text between tags  -> ('text', collapsed_text, '', offset)
    * <a href=X>         -> ('link', '', X, tag_offset)   (anchor text becomes
                            an ordinary text span — outlinks carry no text)
    * <img/video/audio/source/embed/iframe src=X>
                         -> ('media', '', X, tag_offset)
    * <script>/<style> bodies are skipped entirely.
    Empty/whitespace-only text segments are dropped. href/src values are the
    raw attribute values — canonicalization is a separate stage (P1).
    """
    if not html:
        return []
    spans: list[tuple[str, str, str, int]] = []
    pos = 0
    skip_until: str | None = None
    n = len(html)
    while pos < n:
        m = _TAG_RE.search(html, pos)
        text_end = m.start() if m else n
        if skip_until is None and text_end > pos:
            raw = html[pos:text_end]
            collapsed = _WS_RE.sub(" ", raw).strip()
            if collapsed:
                lead = len(raw) - len(raw.lstrip())
                spans.append(("text", collapsed, "", pos + lead))
        if m is None:
            break
        tag = m.group(0)
        name = _tag_name(tag)
        if skip_until is not None:
            if tag[1] == "/" and name == skip_until:
                skip_until = None
        else:
            if name in _SKIP_CONTENT and tag[1] != "/" and not tag.endswith("/>"):
                skip_until = name
            elif name == "a" and tag[1] != "/":
                href = _HREF_RE.search(tag)
                if href and href.group(1):
                    spans.append(("link", "", href.group(1), m.start()))
            elif name in _MEDIA_TAGS and tag[1] != "/":
                src = _SRC_RE.search(tag)
                if src and src.group(1):
                    spans.append(("media", "", src.group(1), m.start()))
        pos = m.end()
    return spans


def outlinks(spans: list[tuple[str, str, str, int]]) -> list[str]:
    """Raw hrefs to crawl: 'link' spans only — media refs are captured in the
    document payload but never enqueued (SURVEY.md §2.2 F8)."""
    return [s[2] for s in spans if s[0] == "link"]


def extract_resolved_spans(url_canon: str, html: str) -> list[tuple[str, str, str, int]]:
    """extract_spans + P1 resolution: link/media refs become absolute
    canonical URLs ('' when uncanonicalizable, e.g. mailto:). This is the
    exact `documents.spans` payload (input_hint invariant) — shared verbatim
    by the engine's parse UDF and the oracle."""
    from crawler_spark.functions.canon import canonicalize
    out = []
    for kind, text, ref, off in extract_spans(html):
        if kind in ("link", "media") and ref:
            ref = canonicalize(url_canon, ref)
        out.append((kind, text, ref, off))
    return out
