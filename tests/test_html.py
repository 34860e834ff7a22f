"""HTML→text extraction: pure-Python goldens, Python↔JVM parity, and the
extract-UDTF path over html-only rows (tag soup must never be indexed).

Reference semantics being generalized: per-cue tag strip,
/root/reference/extract_words.py:26,142-143.
"""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from words_in_context_spark.textparse import (
    extract_lines,
    html_to_text,
    looks_like_html,
    looks_like_srt,
)

PAGE = (
    '<html><head><title>My Title</title>'
    '<script type="text/javascript">var hidden = "noscript tokens";\n'
    "if (1 < 2) { console.log('x'); }</script>"
    "<style>.cls { color: blue; }</style></head>"
    "<body><!-- secret comment -->"
    '<h1 id="h">Heading One</h1>'
    "<p>First paragraph with <b>bold</b> and <i>italic</i>.</p>"
    "<ul><li>Tom &amp; Jerry</li><li>&quot;quoted&quot; &lt;tag&gt;&nbsp;end</li></ul>"
    "<div>Second block</div></body></html>"
)


def test_html_to_text_drops_nonvisible_and_decodes_entities():
    txt = html_to_text(PAGE)
    assert "noscript" not in txt and "console" not in txt
    assert "color" not in txt and "blue" not in txt
    assert "secret comment" not in txt
    assert "Tom & Jerry" in txt
    assert '"quoted" <tag>' in txt
    assert "Heading One" in txt and "Second block" in txt
    # block-level structure became lines
    lines = txt.splitlines()
    assert "My Title" in lines
    assert any(ln.startswith("First paragraph with bold and italic") for ln in lines)


def test_html_detection_and_dispatch():
    assert looks_like_html(PAGE) and not looks_like_srt(PAGE)
    assert not looks_like_html("1\n00:00:01,000 --> 00:00:02,000\nHello\n")
    assert not looks_like_html("plain text with a < b comparison")
    lines = extract_lines(PAGE)
    assert "Heading One" in lines
    assert all("<" not in ln or "tag" in ln for ln in lines)


def test_amp_decoded_last_never_double_decodes():
    # '&amp;lt;' is the ESCAPED text '&lt;' — must not become a '<'
    assert html_to_text("<p>&amp;lt;</p>") == "&lt;"


@pytest.mark.parametrize(
    "snippet",
    [
        PAGE,
        "<p>no head</p><p>two paras</p>",
        "<div>a<br>b</div><script>var x=1;</script>tail",
        "<P>UPPER TAGS</P><STYLE>s{}</STYLE>done",
        "text with <unknown attr='1'>inline</unknown> tags & bare amp",
    ],
)
def test_python_jvm_parity(spark, snippet):
    """textparse.html_to_text (Arrow-UDF path) and functions/html.py (JVM
    chain / DuckDB oracle) must agree on whitespace-normalized visible text
    for entity-simple pages (the chain decodes the six common entities; the
    Python path uses html.unescape — a superset)."""
    from words_in_context_spark.functions.html import (
        html_visible_text_normalized,
    )

    jvm = (
        spark.createDataFrame([(snippet,)], "s string")
        .select(html_visible_text_normalized(F.col("s")).alias("v"))
        .first()["v"]
    )
    py = " ".join(html_to_text(snippet).split())
    assert py == jvm


def test_tokenize_udtf_html_only_rows(spark):
    """Rows with html bytes and no text must be extracted, not indexed as
    tag soup: structural tag names and script bodies never appear as terms."""
    from words_in_context_spark.operators.extract import tokenize

    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "url": ["u1"],
                "text": [None],
                "lang": ["en"],
                "html": [PAGE.encode()],
            }
        )
    )
    terms = {r["term"] for r in tokenize(docs).collect()}
    assert "heading" in terms and "paragraph" in terms and "jerry" in terms
    for soup in ("script", "style", "div", "href", "noscript", "console",
                 "hidden", "blue", "cls", "secret"):
        assert soup not in terms, soup
