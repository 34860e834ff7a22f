"""Results-export sink (S8) — the engine analog of the reference's Anki
export (/root/reference/export.py:117-188).

What the reference does and what carries over:
  * every note gets a CONTENT-DERIVED guid (``guid_for(fields)``,
    export.py:180) so re-exporting the same card never creates a duplicate —
    here: ``guid = md5(field₁ | field₂ | …)``;
  * deck names map to STABLE ids (``deck_name_to_id``, export.py:121-146) so
    repeated exports target the same deck — here: the sink directory is
    partitioned by the deck column, names are the identity;
  * the crash-backup WAL (export.py:34-63) is subsumed by the parquet
    append + guid anti-join: a re-run after a crash re-offers the same rows
    and the anti-join drops the ones already exported (exactly-once output).

The .apkg container itself is presentation-layer (genanki absent here, and a
binary desktop format has no distributed analog); any `df.write` format works
on top of this sink's exactly-once core.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def with_guid(df: DataFrame, field_cols: list[str], guid_col: str = "guid") -> DataFrame:
    """Content-derived note guid: md5 over the pipe-joined fields (the
    ``guid_for(note.fields)`` analog). NULL fields hash as empty."""
    return df.withColumn(
        guid_col,
        F.md5(
            F.concat_ws(
                "|", *[F.coalesce(F.col(c).cast("string"), F.lit("")) for c in field_cols]
            )
        ),
    )


def export_results(
    df: DataFrame,
    path: str,
    field_cols: list[str],
    deck_col: str | None = None,
) -> int:
    """Append ``df`` to the export store at ``path``, exactly once per
    content-guid. Returns the number of genuinely-new rows written.

    Idempotent by construction: rows whose guid already exists in the store
    are dropped (anti-join on the column-pruned guid scan), so crash-and-
    rerun or double-export converges — the reference's 'Anki doesn't like
    duplicate notes' invariant, enforced at the sink."""
    spark = df.sparkSession
    out = with_guid(df, field_cols)
    if _exists(path):
        existing = spark.read.parquet(path).select("guid").distinct()
        out = out.join(existing, "guid", "left_anti")
    out = out.persist()
    n_new = out.count()
    if n_new:
        writer = out.write.mode("append")
        if deck_col is not None:
            writer = writer.partitionBy(deck_col)
        writer.parquet(path)
    out.unpersist()
    return int(n_new)


def _exists(path: str) -> bool:
    return os.path.exists(os.path.join(path, "_SUCCESS"))
