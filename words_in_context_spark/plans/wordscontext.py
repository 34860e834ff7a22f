"""The words-in-context product query: ranked keywords + contextual examples.

This is the reference's end-user surface (gui.py:710-737 ``load_top_words`` +
gui.py:739-769 ``update_examples``): for one document, the top-k TF-IDF terms
and, per term, the subtitle lines where it occurs (J2: posting-list → snippet
join). The engine computes it for any document of the corpus from one DAG:

  tokens ──ranking (plans/tfidf)──► top-k per url
  tokens ──occurrences──► (url, term, line_id)
  docs   ──extract_lines_df──► (url, line_id, line)
  top-k ⋈ occurrences ⋈ lines → examples array per ranked term
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.extract import extract_lines_df, tokenize
from .tfidf import top_k_terms


def top_words_with_examples(
    docs: DataFrame,
    url: str,
    k: int = 20,
    name_filtering: bool = False,
    deprioritize_sound_desc: bool = False,
    max_examples: int = 5,
    tokens: DataFrame | None = None,
) -> DataFrame:
    """(rank, term, tf, df, score, examples:array<struct<line_id,line>>)
    for one document — the reference's two GUI panels in one DataFrame.

    ``tokens`` may be passed pre-computed (and persisted) to mirror the
    reference's corpus memoization (gui.py:557,724-727): filter toggles then
    re-run only ranking+join, never re-extraction."""
    if tokens is None:
        tokens = tokenize(docs)

    ranked = top_k_terms(
        tokens,
        k,
        name_filtering=name_filtering,
        deprioritize_sound_desc=deprioritize_sound_desc,
    ).where(F.col("url") == url)

    occs = (
        tokens.where(F.col("url") == url)
        .select("term", "line_id")
        .distinct()
    )
    lines = extract_lines_df(docs.where(F.col("url") == url)).select(
        "line_id", "line"
    )
    examples = (
        occs.join(lines, "line_id")
        .groupBy("term")
        .agg(
            F.slice(
                F.array_sort(F.collect_list(F.struct("line_id", "line"))),
                1,
                max_examples,
            ).alias("examples")
        )
    )
    return (
        ranked.join(examples, "term", "left")
        .select("rank", "term", "tf", "df", "score", "examples")
        .orderBy("rank")
    )
