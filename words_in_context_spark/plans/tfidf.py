"""Flagship query: per-document term ranking by TF-IDF (reference semantics).

Distributed restatement of the reference pipeline
(/root/reference/extract_words.py:389-445 via gui.py:710-737): for every
document, rank its vocabulary by ``tf/doc_len * ln(N/df)`` with optional
likely-name zeroing (Q2) and sound-description deprioritization (Q3), ranks
assigned with a pinned tie-break (Q4: score desc, first-occurrence asc —
reproducing Python's stable-sort insertion order deterministically, which a
distributed sort otherwise would not).

Plan shape (and why it scales):
  tokens ──groupBy(url,term)──► tf            (1 shuffle, partial agg map-side)
  tf     ──groupBy(url)───────► doc_len       (re-agg of the SMALLER tf set)
  tf     ──groupBy(term)──────► df            (ditto — never re-reads tokens)
  tf ⋈ doc_len (url)  — co-partitioned by url after the tf shuffle
  tf ⋈ df (term)      — df table is |vocab|-sized → broadcast when small;
                         at web scale this becomes a shuffle join where AQE
                         splits skewed head terms (salting lives in the index
                         build path, index/build.py)
  window(url) row_number — one more shuffle by url for ranking.

All per-term flags the filters need (namecase evidence, sound-desc evidence,
first occurrence) are folded into the ONE tf aggregation so the toggles
(gui.py:680-708) re-run scoring without touching tokens again.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def term_doc_stats(tokens: DataFrame) -> DataFrame:
    """tokens → (url, term, tf, first_idx, all_sound, occs, name_occs,
    max_name_pos). One shuffle; everything downstream derives from this."""
    return tokens.groupBy("url", "term").agg(
        F.count("*").alias("tf"),
        F.min("tok_idx").alias("first_idx"),
        F.min(F.col("in_sound_desc").cast("int")).cast("boolean").alias("all_sound"),
        F.sum(F.col("is_namecase").cast("int")).alias("name_occs"),
        F.max(F.when(F.col("is_namecase"), F.col("pos"))).alias("max_name_pos"),
    )


def with_likely_name(td: DataFrame) -> DataFrame:
    """A8 (extract_words.py:306-327): likely name iff all occurrences are
    NameCase, ≥2 of them, and ≥1 NameCase occurrence at sentence pos > 0."""
    return td.withColumn(
        "is_likely_name",
        (F.col("name_occs") == F.col("tf"))
        & (F.col("name_occs") >= 2)
        & (F.col("max_name_pos") > 0),
    )


def doc_word_scores(
    tokens: DataFrame,
    name_filtering: bool = False,
    deprioritize_sound_desc: bool = False,
    n_docs: int | None = None,
    broadcast_df: bool = True,
) -> DataFrame:
    """Ranked (url, term, tf, doc_len, df, score, rank) for EVERY document at
    once — the reference computes one document per call; the engine computes
    the whole corpus in one DAG and filters at read time.

    ``n_docs`` (corpus cardinality N in the IDF) is taken from the caller when
    known (e.g. recorded in the index manifest); otherwise counted from the
    small doc_len aggregate — note this counts documents with ≥1 token, which
    matches the reference corpus of analyzed files.

    ``broadcast_df``: the df table is |vocab|-sized — a few GB even at web
    scale — so the caller-controlled default is a broadcast hint; Spark
    ignores an oversized hint and AQE can still convert either way. (The
    caller knows |vocab|; probing plan statistics here was version-fragile
    and always absent on plain parquet.)"""
    td = with_likely_name(term_doc_stats(tokens))

    doc_len = td.groupBy("url").agg(F.sum("tf").alias("doc_len"))
    df_tbl = td.groupBy("term").agg(F.count("*").alias("df"))
    if n_docs is None:
        n_docs = doc_len.count()  # scalar: one cheap job over the tiny agg

    scored = (
        td.join(doc_len, "url")
        .join(F.broadcast(df_tbl) if broadcast_df else df_tbl, "term")
        .withColumn(
            "score",
            (F.col("tf") / F.col("doc_len"))
            * F.log(F.lit(float(n_docs)) / F.col("df")),
        )
    )
    if name_filtering:
        scored = scored.withColumn(
            "score", F.when(F.col("is_likely_name"), 0.0).otherwise(F.col("score"))
        )
    if deprioritize_sound_desc:
        scored = scored.withColumn(
            "score",
            F.when(~F.col("all_sound"), F.col("score") * 10000).otherwise(
                F.col("score")
            ),
        )

    w = Window.partitionBy("url").orderBy(
        F.desc("score"), F.asc("first_idx"), F.asc("term")
    )
    return scored.select(
        "url",
        "term",
        "tf",
        "doc_len",
        "df",
        "score",
        F.row_number().over(w).alias("rank"),
    )


def top_k_terms(tokens: DataFrame, k: int = 20, **flags) -> DataFrame:
    """Top-k ranked terms per document."""
    return doc_word_scores(tokens, **flags).where(F.col("rank") <= k)
