"""Incremental index maintenance via Structured Streaming.

Generalizes the reference's incremental build (ST1: skip files already in the
cache, append new ones — /root/reference/extract_words.py:351-357,372-376)
into a streaming pipeline:

    readStream(parquet dir of web pages)
      → trigger(availableNow)                 # batch-incremental execution
      → foreachBatch(merge_docs_into_index)   # exactly-once per micro-batch

Exactly-once is layered:
  * the file-source checkpoint guarantees each input FILE is processed once;
  * an anti-join against doc_map guarantees each URL is indexed once even if
    re-delivered under a different file name (the reference's cache-key
    semantics, with url as the key);
  * segment rewrites go through the same dynamic-partition-overwrite +
    manifest commit as the batch build.

Global-stats policy: ``avgdl`` is FROZEN at initial-build value (recorded in
stats.json). Merged terms are re-encoded with the frozen avgdl, so block
max-impact metadata remains an exact upper bound for query-time scores and
WAND stays lossless; the true corpus avgdl drifts until a full rebuild —
standard search-engine practice (global stats refresh is periodic
maintenance, not per-batch).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..index import manifest as mf
from ..index.build import (
    SEGMENT_SCHEMA,
    _RUN_SCHEMA,
    _encode_run,
    bucket_expr,
    range_salt,
    read_tombstone_ids,
)
from ..operators.codec import decode_postings
from ..operators.extract import tokenize_tf

PAGES_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)


def _merge_with_existing(
    avgdl: float,
    n_buckets: int,
    n_salts: int,
    excluded: np.ndarray | None = None,
):
    """applyInPandas per term: decode existing segment row (if any) + new
    encoded runs, concatenate, sort by doc_id, re-encode with frozen avgdl.

    Invariants maintained here:
      * duplicate doc_ids are dropped (keep-first) — a replayed micro-batch
        whose previous attempt crashed between the segment overwrite and the
        doc_map append re-delivers identical postings; deduping makes the
        merge idempotent instead of tripping the strictly-increasing assert;
      * re-encoding is SALT-RANGE ALIGNED (encode_salt_aligned) so no block
        straddles a range boundary — query_topk's distributed range slicing
        depends on it;
      * ``excluded`` (sorted tombstoned doc_ids, index/build.delete_docs):
        since the term is being decoded anyway, its tombstoned postings are
        dropped opportunistically — df/metadata come out post-purge for
        merged terms, untouched terms wait for compact_index.
    """
    from ..index.build import _salt_boundaries, encode_salt_aligned, segment_row
    from ..index.query import _row_to_encoded

    boundaries = _salt_boundaries(n_salts)
    cols = [
        "term", "bucket", "df", "cf", "doc_bytes", "tf_bytes", "dl_bytes",
        "first_doc", "last_doc", "n", "doc_off", "tf_off", "dl_off",
        "max_impact", "max_impact_all",
    ]

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        term = pdf["term"].iloc[0]
        ids_parts, tf_parts, dl_parts = [], [], []
        for rec in pdf.to_dict("records"):
            enc = _row_to_encoded(rec)
            ids, tfs, dls = decode_postings(enc)
            ids_parts.append(ids)
            tf_parts.append(tfs)
            dl_parts.append(dls)
        ids = np.concatenate(ids_parts)
        tfs = np.concatenate(tf_parts)
        dls = np.concatenate(dl_parts)
        order = np.argsort(ids, kind="mergesort")
        ids, tfs, dls = ids[order], tfs[order], dls[order]
        keep = np.ones(ids.size, dtype=bool)
        keep[1:] = ids[1:] != ids[:-1]  # idempotent replay: drop duplicates
        if excluded is not None and excluded.size:
            keep &= ~np.isin(ids, excluded)
        ids, tfs, dls = ids[keep], tfs[keep], dls[keep]
        if ids.size == 0:
            return pd.DataFrame([], columns=cols)  # term fully tombstoned
        enc = encode_salt_aligned(ids, tfs, dls, avgdl, boundaries)
        return pd.DataFrame([segment_row(term, n_buckets, enc)], columns=cols)

    return fn


def merge_docs_into_index(
    spark: SparkSession, new_docs: DataFrame, index_dir: str
) -> int:
    """Merge a batch of new documents into an existing index. Returns the
    number of genuinely-new documents indexed."""
    stats = mf.read_stats(index_dir)
    avgdl = float(stats["avgdl"])
    n_buckets = int(stats["n_buckets"])
    n_salts = int(stats["n_salts"])
    generation = int(stats.get("generation", 0))
    doc_map_path = mf.data_dir(index_dir, "doc_map", generation)
    seg_path = os.path.join(index_dir, "segments")

    doc_map = spark.read.parquet(doc_map_path)
    # ST1 semantics: index each url exactly once (anti-join the "cache")
    fresh = new_docs.join(doc_map.select("url"), "url", "left_anti")

    tf_new = tokenize_tf(fresh).persist()  # tf aggregated inside the UDF
    new_map = (
        tf_new.groupBy("url")
        .agg(F.max("doc_len").alias("doc_len"))
        .withColumn("doc_id", F.xxhash64(F.col("url")))
        .select("doc_id", "url", "doc_len")
        .persist()
    )
    n_new = new_map.count()
    if n_new == 0:
        # repair pass: a prior attempt that crashed between the doc_map
        # append and write_stats left stats.n_docs stale; doc_map is the
        # source of truth, so reconcile here (cheap count, no-op otherwise)
        true_n = doc_map.count()
        if int(stats["n_docs"]) != int(true_n):
            stats["n_docs"] = int(true_n)
            mf.write_stats(index_dir, stats)
        tf_new.unpersist()
        new_map.unpersist()
        return 0

    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")

    # doc_id = xxhash64(url) is a pure function and doc_len is already a
    # tokenize_tf output column — projection, not a join (same change as the
    # batch build: the join shuffled the whole new-postings table on url)
    # bucket is not carried into the encode shuffle (recomputed post-merge
    # from the term, same as the batch build)
    postings_in = (
        tf_new.withColumn("doc_id", F.xxhash64(F.col("url")))
        .select("term", "doc_id", "tf", "doc_len")
    )
    new_runs = (
        postings_in.withColumn("salt", range_salt(F.col("doc_id"), n_salts))
        .groupBy("term", "salt")
        .applyInPandas(_encode_run(avgdl), schema=_RUN_SCHEMA)
        .persist()  # consumed by bucket collect, two joins, and the write
    )

    affected_buckets = [
        int(r["bucket"])
        for r in new_runs.select(
            bucket_expr(F.col("term"), n_buckets).alias("bucket")
        ).distinct().collect()
    ]
    # explicit schema: serves the structurally-empty index case (every doc
    # deleted + compacted) where the segments dir has no file to infer from
    old = spark.read.schema(SEGMENT_SCHEMA).parquet(seg_path).where(
        F.col("bucket").isin(affected_buckets)
    )
    # untouched terms in affected buckets pass through unchanged; terms with
    # new postings get decode-merge-re-encode
    new_terms = new_runs.select("term").distinct()
    untouched = old.join(new_terms, "term", "left_anti")
    to_merge_old = old.join(new_terms, "term", "left_semi").drop(
        "bucket", "max_impact_all"
    )
    runs_as_segments = new_runs.drop("salt")
    merged = (
        to_merge_old.unionByName(runs_as_segments, allowMissingColumns=False)
        .groupBy("term")
        .applyInPandas(
            _merge_with_existing(
                avgdl, n_buckets, n_salts,
                excluded=read_tombstone_ids(index_dir),
            ),
            SEGMENT_SCHEMA,
        )
    )
    out = untouched.unionByName(merged)
    # term-sorted within each rewritten bucket file, same as the batch build:
    # row-group min/max stats keep pruning term lookups after merges too
    out.repartition("bucket").sortWithinPartitions("term").write.mode(
        "overwrite"
    ).partitionBy("bucket").parquet(seg_path)
    from ..index.build import _touch_success

    _touch_success(seg_path)

    # Replay-idempotency ordering: doc_map is appended LAST of the data
    # writes — it is the replay gate (the anti-join above), so every earlier
    # write must tolerate a re-run. Segments tolerate it via keep-first dedup
    # in _merge_with_existing; positions via the doc_id anti-join below. A
    # crash anywhere before the doc_map append simply re-runs the whole
    # batch; after it, the batch is a no-op whose repair pass fixes stats.

    # positional store (if present) is (doc_id, term, line_ids): new docs
    # only ADD rows — append, no rewrite; anti-join by doc_id so a replayed
    # attempt that already appended them (then crashed before the doc_map
    # append) never duplicates rows
    positions_path = mf.data_dir(index_dir, "positions", generation)
    if os.path.exists(positions_path):
        from ..index.build import POSITIONS_SCHEMA_VERSION
        from ..index.build import bucket_expr as _bexpr
        from ..operators.extract import tokenize as _tokenize

        if int(stats.get("positions_schema", 0)) < POSITIONS_SCHEMA_VERSION:
            # Pre-versioning store: appending v2 rows (with tok_ids) into a
            # v1 store creates a mixed-schema parquet dir whose plain reads
            # sample one footer and silently drop pre-upgrade docs from
            # phrase results. If every existing row already carries tok_ids
            # (tok_ids-era store written before versions existed), stamp the
            # manifest and proceed; otherwise refuse with a rebuild path.
            existing = spark.read.option("mergeSchema", "true").parquet(
                positions_path
            )
            if "tok_ids" not in existing.columns or (
                existing.where(F.col("tok_ids").isNull()).limit(1).count() > 0
            ):
                raise ValueError(
                    f"positional store at {positions_path} predates tok_ids "
                    f"(schema v1); rebuild the index with_positions=True (or "
                    f"backfill tok_ids) before incremental merging — "
                    f"appending would silently corrupt phrase search"
                )
            stats["positions_schema"] = POSITIONS_SCHEMA_VERSION

        from ..index.build import POSITIONS_READ_SCHEMA

        already = (
            spark.read.schema(POSITIONS_READ_SCHEMA)
            .parquet(positions_path)
            .select("doc_id")
            .distinct()
        )
        (
            _tokenize(fresh)
            .groupBy("url", "term")
            .agg(
                F.array_sort(F.collect_list("line_id")).alias("line_ids"),
                F.array_sort(F.collect_list("tok_idx")).alias("tok_ids"),
            )
            .join(new_map.select("url", "doc_id"), "url")
            .join(already, "doc_id", "left_anti")
            .withColumn("bucket", _bexpr(F.col("term"), n_buckets))
            .select("bucket", "doc_id", "term", "line_ids", "tok_ids")
            .repartition("bucket")
            .write.mode("append")
            .partitionBy("bucket")
            .parquet(positions_path)
        )
        _touch_success(positions_path)

    new_map.write.mode("append").parquet(doc_map_path)

    # refresh manifest metrics for affected buckets + stats (pruned read +
    # on-disk bucket sizes — never re-reads the posting byte columns)
    from ..index.build import _bucket_metrics

    metrics = _bucket_metrics(spark, seg_path, affected_buckets)
    for b in affected_buckets:
        m = metrics.get(b)
        mf.commit_bucket(
            index_dir,
            b,
            {
                "n_terms": int(m["n_terms"]) if m else 0,
                "n_postings": int(m["n_postings"]) if m else 0,
                "bytes": int(m["bytes"]) if m else 0,
                "lineage": {"incremental": True, "added_docs": int(n_new)},
            },
        )
    # n_docs from the source of truth (doc_map after the append), never by
    # incrementing the old counter — a replayed batch or repaired crash
    # window would otherwise skew idf permanently
    stats["n_docs"] = int(spark.read.parquet(doc_map_path).count())
    mf.write_stats(index_dir, stats)
    tf_new.unpersist()
    new_map.unpersist()
    new_runs.unpersist()
    return int(n_new)


def incremental_build(
    spark: SparkSession,
    input_dir: str,
    index_dir: str,
    checkpoint_dir: str,
) -> None:
    """Drain all currently-available files from ``input_dir`` into the index
    (trigger availableNow), exactly once per file via the stream checkpoint."""
    stream = (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", 64)
        .parquet(input_dir)
    )

    def handle(batch_df: DataFrame, epoch_id: int) -> None:
        merge_docs_into_index(batch_df.sparkSession, batch_df, index_dir)

    q = (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
