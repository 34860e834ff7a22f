"""spark-submit entry point: index maintenance — delete docs, compact.

    python tools/make_pyfiles.py wics.zip
    spark-submit --py-files wics.zip jobs/maintain_index_job.py \
        --index-dir /data/index \
        [--delete-urls url1,url2 | --delete-urls-parquet /path/urls.parquet \
         | --dedup-docs-parquet /path/pages.parquet] \
        [--compact] [--stats]

Deletion is logical (Lucene-style tombstones; queries exclude immediately);
--compact performs the physical purge plus generational compaction of the
append-mode stores. --stats prints stats.json + tombstone count and exits.
The operations compose: delete then compact in one submit is the standard
takedown flow.
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index-dir", required=True)
    ap.add_argument("--delete-urls",
                    help="comma-separated urls to tombstone")
    ap.add_argument("--delete-urls-parquet",
                    help="parquet with a `url` column to tombstone (bulk "
                         "takedowns / dedup-driven drop lists)")
    ap.add_argument("--dedup-docs-parquet",
                    help="pages parquet (url, text): compute the near-dup "
                         "drop list (MinHash→LSH→Jaccard→components, keep "
                         "min-url canonical) and tombstone the rest; "
                         "combine with --compact for the physical purge")
    ap.add_argument("--compact", action="store_true",
                    help="physical purge of tombstones + generational "
                         "compaction of doc_map/positions")
    ap.add_argument("--stats", action="store_true",
                    help="print stats.json + tombstone count and exit")
    args = ap.parse_args()
    if not (args.delete_urls or args.delete_urls_parquet
            or args.dedup_docs_parquet or args.compact or args.stats):
        ap.error("nothing to do: pass --delete-urls[-parquet], "
                 "--dedup-docs-parquet, --compact, or --stats")

    from pyspark.sql import SparkSession

    from words_in_context_spark.index import manifest as mf
    from words_in_context_spark.index.build import (
        compact_index,
        delete_docs,
        read_tombstone_ids,
    )

    spark = SparkSession.builder.appName("wics-maintain-index").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    out: dict = {"index_dir": args.index_dir}
    if args.stats:
        out["stats"] = mf.read_stats(args.index_dir)
        out["tombstones"] = int(read_tombstone_ids(args.index_dir).size)
        print(json.dumps(out))
        return

    if args.delete_urls:
        urls = [u for u in args.delete_urls.split(",") if u]
        out["deleted"] = delete_docs(spark, args.index_dir, urls)
    if args.delete_urls_parquet:
        urls_df = spark.read.parquet(args.delete_urls_parquet)
        out["deleted_bulk"] = delete_docs(spark, args.index_dir, urls_df)
    if args.dedup_docs_parquet:
        from words_in_context_spark.operators.dedup import near_dup_drop_list

        docs = spark.read.parquet(args.dedup_docs_parquet)
        drop = near_dup_drop_list(docs.select("url", "text"), id_col="url")
        out["deleted_dedup"] = delete_docs(spark, args.index_dir, drop)
    if args.compact:
        out["compaction"] = compact_index(spark, args.index_dir)
    out["n_docs"] = mf.read_stats(args.index_dir)["n_docs"]
    out["tombstones_remaining"] = int(read_tombstone_ids(args.index_dir).size)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
