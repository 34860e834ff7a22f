"""Phrase (exact token-adjacency) search — pure DataFrame composition.

"Words in context" generalized: the reference surfaces co-occurrence at cue
granularity (word_occ_ids, extract_words.py:195-196,222-228); this operator
matches exact phrases at TOKEN granularity over any (id, pos, term) token
table — the positional output of ``tokenize_simple``/``posexplode`` or the
extract UDTF's tok_idx stream.

Plan shape (and why it scales): the phrase is matched by an anchored chain of
equi-joins on (doc, pos) — term i of the phrase must sit at anchor_pos + i.
Every join keys on the SAME (doc, pos) pair, so after the first shuffle all
subsequent joins are co-partitioned; each side is pre-filtered to one term's
postings (selective; predicate reaches the scan). No window, no explode of
n-grams, no UDF. A k-term phrase costs k narrow filters + (k-1) co-partitioned
joins of already-small inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def phrase_matches(
    tokens: DataFrame,
    phrase: list[str],
    id_col: str = "doc_id",
    pos_col: str = "pos",
    term_col: str = "term",
) -> DataFrame:
    """(id, start_pos) for every exact occurrence of ``phrase`` (terms at
    consecutive positions). Deterministic, duplicate-free by construction."""
    if not phrase:
        raise ValueError("empty phrase")
    anchor = (
        tokens.where(F.col(term_col) == phrase[0])
        .select(F.col(id_col), F.col(pos_col).alias("start_pos"))
    )
    for i, term in enumerate(phrase[1:], start=1):
        nxt = tokens.where(F.col(term_col) == term).select(
            F.col(id_col), (F.col(pos_col) - i).alias("start_pos")
        )
        anchor = anchor.join(nxt, [id_col, "start_pos"])
    return anchor


def phrase_count(
    tokens: DataFrame,
    phrase: list[str],
    id_col: str = "doc_id",
    pos_col: str = "pos",
    term_col: str = "term",
) -> DataFrame:
    """(id, n_matches) per document containing the phrase at least once."""
    return (
        phrase_matches(tokens, phrase, id_col, pos_col, term_col)
        .groupBy(id_col)
        .agg(F.count("*").alias("n_matches"))
    )
