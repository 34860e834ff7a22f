"""spark-submit entry point: build (or resume) the inverted index.

    python tools/make_pyfiles.py wics.zip
    spark-submit --py-files wics.zip jobs/build_index_job.py \
        --index-dir /data/index [--input /path/to/pages_parquet | --gen-docs N] \
        [--n-buckets 512] [--n-salts 32] [--query storm,lantern]

On a cluster, add --master/--num-executors as usual; the job only uses the
active session's parallelism. With --query it runs a BM25 top-10 retrieval
after the build and prints the results (smoke check).

Recommended multi-executor submit conf (measured on the executor-axis bench,
tools/executor_axis_bench.py — closed a 13% multi-JVM wall gap):
    --conf spark.locality.wait=0          # shuffle-heavy build; Arrow stages
                                          # have no HDFS locality to wait for
    --conf spark.reducer.maxSizeInFlight=96m   # deeper fetch window hides
                                               # inter-executor netty latency
    --conf spark.sql.execution.arrow.maxRecordsPerBatch=512
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index-dir", required=True)
    ap.add_argument("--input", help="pages source: parquet dir OR catalog "
                                    "table name (spark.read.table — e.g. an "
                                    "Iceberg table on a cluster with the "
                                    "Iceberg runtime)")
    ap.add_argument("--gen-docs", type=int, help="synthesize N seeded docs instead")
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--n-buckets", type=int, default=32)
    ap.add_argument("--n-salts", type=int, default=8)
    ap.add_argument("--overwrite", action="store_true")
    ap.add_argument("--with-positions", action="store_true",
                    help="also build the positional store (wsid analog)")
    ap.add_argument("--lemmatizer", default=None,
                    help="lemmatizer registry name (e.g. 'english'), or a "
                         "per-language routing spec "
                         "'en=english,de=german,es=spanish,fr=french' "
                         "(ByLanguage — unlisted languages pass through); "
                         "default identity")
    ap.add_argument("--query", help="comma-separated terms for a post-build smoke query")
    ap.add_argument("--compact", action="store_true",
                    help="run generational compaction of the append-mode "
                         "stores (doc_map/positions) after the build/merge — "
                         "the periodic maintenance op for incrementally-"
                         "maintained indexes")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from words_in_context_spark.corpus import pages_dataframe
    from words_in_context_spark.index.build import build_index
    from words_in_context_spark.index.query import load_index, query_topk_local

    spark = SparkSession.builder.appName("wics-build-index").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    if args.input:
        from words_in_context_spark.corpus import read_pages

        docs = read_pages(spark, args.input)
        n_docs = None
    elif args.gen_docs:
        docs = pages_dataframe(spark, args.gen_docs, seed=args.seed)
        n_docs = args.gen_docs
    else:
        ap.error("one of --input / --gen-docs is required")

    lemmatizer = args.lemmatizer
    if lemmatizer and "=" in lemmatizer:
        lemmatizer = dict(
            kv.split("=", 1) for kv in lemmatizer.split(",")
        )

    t0 = time.time()
    res = build_index(
        spark,
        docs,
        args.index_dir,
        n_buckets=args.n_buckets,
        n_salts=args.n_salts,
        overwrite=args.overwrite,
        with_positions=args.with_positions,
        lemmatizer=lemmatizer,
    )
    sec = time.time() - t0
    print(
        json.dumps(
            {
                "index_dir": res.index_dir,
                "n_docs": res.n_docs,
                "built_buckets": len(res.built_buckets),
                "skipped_buckets": len(res.skipped_buckets),
                "sec": round(sec, 2),
                "docs_per_sec": round(res.n_docs / sec, 1),
            }
        )
    )

    if args.compact:
        from words_in_context_spark.index.build import compact_index

        print(json.dumps({"compact": compact_index(spark, args.index_dir)}))

    if args.query:
        h = load_index(args.index_dir)
        top = query_topk_local(spark, h, args.query.split(","), k=10)
        for rank, (doc_id, score) in enumerate(top, 1):
            print(f"{rank:2d}. doc={doc_id} score={score:.4f}")


if __name__ == "__main__":
    main()
