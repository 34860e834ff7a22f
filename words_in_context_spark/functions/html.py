"""JVM-side HTML→text extraction as a built-in-expression chain.

Twin of the pure-Python ``textparse.html_to_text`` (the Arrow UDF path uses
that; this one keeps whole-stage codegen for SQL-expressible pipelines and is
what the DuckDB oracle replicates 1:1). The regex subset is RE2-compatible —
no backreferences — so the exact same patterns run in Spark (Java regex) and
DuckDB (RE2).

Generalizes the reference's per-cue ``TAG_REGEX`` strip
(/root/reference/extract_words.py:26,142-143) to whole Common-Crawl-style
pages: non-content blocks (script/style/comments) are dropped, block-level
tags become line breaks, remaining tags become spaces, the six ubiquitous
character entities are decoded (&amp; last, so &lt; etc. never double-decode).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# RE2-safe patterns (shared verbatim with the DuckDB oracle — see
# driver_queries_pipeline.HTML_* constants built from these).
COMMENT_PAT = r"<!--.*?-->"
SCRIPT_PAT = r"<script\b[^>]*>.*?</script\s*>"
STYLE_PAT = r"<style\b[^>]*>.*?</style\s*>"
BLOCK_TAG_PAT = (
    r"<\s*/?\s*(p|div|br|li|ul|ol|h[1-6]|tr|td|th|table|section|article|"
    r"header|footer|blockquote|pre|title)\b[^>]*>"
)
ANY_TAG_PAT = r"<[^>]*>"

# (entity, replacement) — order matters: &amp; is decoded LAST so already-
# escaped entities (&amp;lt;) don't double-decode into markup.
ENTITIES = [
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&amp;", "&"),
]


def html_visible_text(col: Column) -> Column:
    """Visible text of an HTML page, block-level tags replaced by newlines.
    Same operation order as textparse.html_to_text (comments → script/style →
    block tags → all tags → entities)."""
    s = F.regexp_replace(col, "(?s)" + COMMENT_PAT, " ")
    s = F.regexp_replace(s, "(?is)" + SCRIPT_PAT, " ")
    s = F.regexp_replace(s, "(?is)" + STYLE_PAT, " ")
    s = F.regexp_replace(s, "(?i)" + BLOCK_TAG_PAT, "\n")
    s = F.regexp_replace(s, ANY_TAG_PAT, " ")
    for ent, rep in ENTITIES:
        s = F.replace(s, F.lit(ent), F.lit(rep))
    return s


def html_visible_text_normalized(col: Column) -> Column:
    """Visible text with ALL whitespace collapsed to single spaces and
    trimmed — the comparison-stable form (line structure is an extraction
    detail; token streams are what the engine indexes)."""
    return F.trim(F.regexp_replace(html_visible_text(col), r"\s+", " "))
