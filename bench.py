"""Per-round benchmark harness.

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": "...", "value": <total headline sec>, "unit": "sec",
     "queries": {...}, "sf": ..., "index_build": {...}, "bm25_p50_ms": ...}

The N-vs-4N scaling-efficiency evidence (north rule) is produced by
``tools/scaling_bench.py`` (separate processes — a JVM can't change master)
and recorded in BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "tfidf_topk",
    "bm25_topk",
    "doc_term_tf",
    "postings",
    "pricing_summary",
    "revenue_by_nation",
    "top_orders_per_customer",
    "events_hourly",
]

INDEX_BUILD_DOCS = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "2000"))


def _run_to_completion(df) -> int:
    # noop sink: full execution, no driver-side result materialization
    df.write.mode("overwrite").format("noop").save()
    return 0


def main() -> None:
    from words_in_context_spark.corpus import pages_dataframe
    from words_in_context_spark.driver_queries import QUERIES
    from words_in_context_spark.operators.extract import tokenize
    from words_in_context_spark.plans.tfidf import doc_word_scores
    from words_in_context_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")

    spark = get_spark(cores=cpus, app_name="wics-bench")
    spark.sparkContext.setLogLevel("ERROR")

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = QUERIES[name]
        t0 = time.time()
        _run_to_completion(fn(spark, sf_dir))
        timings[name] = round(time.time() - t0, 3)

    # Index-build throughput: synthesized web corpus → extract+tokenize UDTF →
    # per-doc term stats + ranked TF-IDF (the full flagship build DAG).
    t0 = time.time()
    docs = pages_dataframe(spark, INDEX_BUILD_DOCS, seed=42)
    scored = doc_word_scores(tokenize(docs), n_docs=INDEX_BUILD_DOCS)
    _run_to_completion(scored)
    build_sec = time.time() - t0
    index_build = {
        "docs": INDEX_BUILD_DOCS,
        "sec": round(build_sec, 3),
        "docs_per_sec": round(INDEX_BUILD_DOCS / build_sec, 1),
    }

    # BM25 query latency p50: repeated retrieval DAG on the documents table
    lat = []
    fn = QUERIES["bm25_topk"]
    for _ in range(5):
        t0 = time.time()
        fn(spark, sf_dir).collect()
        lat.append(time.time() - t0)
    bm25_p50_ms = round(statistics.median(lat) * 1000, 1)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_suite_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "cpus": cpus,
                "index_build": index_build,
                "bm25_p50_ms": bm25_p50_ms,
            }
        )
    )


if __name__ == "__main__":
    main()
