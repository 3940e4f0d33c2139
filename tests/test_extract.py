"""Link-density main-content extraction (functions/extract.py, ex1)."""

from __future__ import annotations

from pyspark.sql import functions as F

from crawler_spark.functions.extract import (
    main_content_col, n_content_blocks_col, render_page_col,
)


def _extract(spark, html, **kw):
    df = spark.createDataFrame([(html,)], "page string")
    return df.select(
        main_content_col(F.col("page"), **kw).alias("c"),
        n_content_blocks_col(F.col("page"), **kw).alias("n")).first()


def test_chrome_dropped_content_kept(spark):
    page = ('<div class="nav"><a href="/">Home</a> <a href="/a">About</a>'
            '</div><p>real article text goes here</p>'
            '<div class="foot"><a href="/t">terms</a></div>')
    r = _extract(spark, page)
    assert r.c == "real article text goes here" and r.n == 1


def test_inline_anchor_text_survives(spark):
    page = '<p>read the <a href="/doc">full document</a> for details</p>'
    r = _extract(spark, page)
    assert r.c == "read the full document for details" and r.n == 1


def test_density_threshold_boundary(spark):
    # visible text is "abcd abc" (8 — tags become spaces), anchor "abcd"
    # (4): exactly half -> dropped (>= cutoff)
    page = "<p><a>abcd</a>abc</p><p>keepme</p>"
    r = _extract(spark, page)
    assert r.c == "keepme" and r.n == 1
    # "ab abcdef" (9) vs anchor "ab" (2): below cutoff -> kept
    r2 = _extract(spark, "<p><a>ab</a>abcdef</p>")
    assert r2.c == "ab abcdef" and r2.n == 1


def test_empty_and_tag_only_blocks_dropped(spark):
    page = "<div>   </div><p><br/></p><p>body</p>"
    r = _extract(spark, page)
    assert r.c == "body" and r.n == 1


def test_render_extract_identity(spark):
    """The ex1 gate in miniature: extraction inverts the renderer."""
    texts = ["one two three four five six seven eight nine ten",
             "single",
             " ".join(f"w{i}" for i in range(37))]   # 5 chunks, short tail
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "doc_id long, text string")
    words = F.split(F.trim(F.col("text")), r"\s+")
    page = render_page_col(words, F.lit("hostA"))
    out = df.select("doc_id", main_content_col(page).alias("c"),
                    n_content_blocks_col(page).alias("n")).collect()
    for r in out:
        want = " ".join(texts[r.doc_id].split())
        n_chunks = (len(texts[r.doc_id].split()) + 7) // 8
        assert r.c == want and r.n == n_chunks
