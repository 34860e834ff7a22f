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

# 50k default: at 10k the ~4-5 s of fixed cost (session, 7 jobs, manifest
# commits) dominates and docs/s understates sustained throughput (~1.6-3k
# docs/s at 500k); the corpus is pre-materialized and cached, so only the
# first run pays synthesis.
INDEX_BUILD_DOCS = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "50000"))

# Latency probes (bm25_p50_ms*) run against a FIXED-size index so the metric
# stays comparable across rounds regardless of the throughput corpus size —
# p50 scales ~linearly with posting length, so measuring it on the (now
# larger) build corpus would read as a regression when it's corpus growth.
LATENCY_PROBE_DOCS = int(os.environ.get("SPARK_GRAFT_BENCH_PROBE_DOCS", "10000"))


def _run_to_completion(df) -> int:
    # noop sink: full execution, no driver-side result materialization
    df.write.mode("overwrite").format("noop").save()
    return 0


def main() -> None:
    from words_in_context_spark.corpus import pages_dataframe
    from words_in_context_spark.driver_queries import QUERIES
    from words_in_context_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")

    spark = get_spark(cores=cpus, app_name="wics-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warmup: JVM codegen, Arrow/pandas-UDF worker pool, parquet footer reads,
    # broadcast/window/agg codegen paths — so the first measured query isn't
    # charged for session bring-up
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    spark.read.parquet(f"{sf_dir}/documents.parquet").count()

    # Forward-index build (one tokenize pass over the corpus, materialized to
    # parquet): the serving model — queries scan the term-doc table, never the
    # raw corpus. A FRESH cache dir is forced so this cost is always measured
    # and reported (forward_build), never hidden by a previous run's cache.
    import atexit
    import shutil as _sh_mod
    import tempfile as _tf_mod

    _fwd_dir = _tf_mod.mkdtemp(prefix="wics_fwd_bench_")
    os.environ["WICS_FWD_CACHE"] = _fwd_dir
    atexit.register(_sh_mod.rmtree, _fwd_dir, ignore_errors=True)
    from words_in_context_spark.driver_queries import _forward

    t0 = time.time()
    _forward(spark, sf_dir).write.mode("overwrite").format("noop").save()
    forward_build_sec = round(time.time() - t0, 3)
    spark.range(10_000).mapInPandas(
        lambda it: (pdf.assign(x=pdf["id"]) for pdf in it), "id long, x long"
    ).write.mode("overwrite").format("noop").save()
    _w = spark.range(10_000).withColumn("k", F.col("id") % 100)
    _d = spark.range(100).withColumnRenamed("id", "k")
    (
        _w.join(F.broadcast(_d), "k")
        .groupBy("k")
        .agg(F.count("*").alias("n"), F.sum("id").alias("s"))
        .withColumn(
            "rn",
            F.row_number().over(Window.partitionBy("k").orderBy(F.desc("s"))),
        )
        .write.mode("overwrite")
        .format("noop")
        .save()
    )

    # Plan-shape warmup: run each headline plan once over the TINY sf0.001
    # tables (different data, same generated code) so the measured run reflects
    # steady-state serving, not one-time whole-stage-codegen compilation —
    # measured ~2 s of JIT on the first tfidf/bm25 invocation otherwise.
    warm_dir = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
    if os.path.isdir(warm_dir) and os.path.abspath(warm_dir) != os.path.abspath(sf_dir):
        for name in HEADLINE:
            _run_to_completion(QUERIES[name](spark, warm_dir))

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = QUERIES[name]
        t0 = time.time()
        _run_to_completion(fn(spark, sf_dir))
        timings[name] = round(time.time() - t0, 3)

    # Index-build throughput: synthesized web corpus → extract+tokenize UDTF →
    # compressed segments + manifest (the REAL build, index/build.py).
    import shutil
    import tempfile

    from words_in_context_spark.index.build import build_index
    from words_in_context_spark.index.query import load_index, query_topk_local

    idx_dir = os.path.join(tempfile.gettempdir(), "wics_bench_index")
    shutil.rmtree(idx_dir, ignore_errors=True)
    # Corpus pre-materialized OUTSIDE the timed window (same protocol as
    # tools/scaling_bench.py): the measured job is the index build from an
    # existing pages table, as on a real cluster — not Python SRT synthesis.
    from words_in_context_spark.corpus import CORPUS_VERSION

    corpus_dir = os.path.join(
        tempfile.gettempdir(),
        f"wics_bench_corpus_{CORPUS_VERSION}_{INDEX_BUILD_DOCS}_42",
    )
    if not os.path.exists(os.path.join(corpus_dir, "_SUCCESS")):
        pages_dataframe(spark, INDEX_BUILD_DOCS, seed=42).write.mode(
            "overwrite"
        ).parquet(corpus_dir)
    docs = spark.read.parquet(corpus_dir)
    t0 = time.time()
    build_index(spark, docs, idx_dir, n_buckets=32, n_salts=8)
    build_sec = time.time() - t0
    index_build = {
        "docs": INDEX_BUILD_DOCS,
        "sec": round(build_sec, 3),
        "docs_per_sec": round(INDEX_BUILD_DOCS / build_sec, 1),
    }

    # BM25 top-k query latency p50: block-max WAND over a FIXED 10k-doc index
    # (LATENCY_PROBE_DOCS — round-over-round comparable; see note above).
    # Two regimes, both reported: HOT keeps postings resident in the handle's
    # term cache after the first call (the stated serving model — kernel time
    # only); COLD invalidates the cache before every call, so each iteration
    # pays the pruned-parquet fetch + decode alongside the kernel.
    if LATENCY_PROBE_DOCS != INDEX_BUILD_DOCS:
        probe_corpus = os.path.join(
            tempfile.gettempdir(),
            f"wics_bench_corpus_{CORPUS_VERSION}_{LATENCY_PROBE_DOCS}_42",
        )
        if not os.path.exists(os.path.join(probe_corpus, "_SUCCESS")):
            pages_dataframe(spark, LATENCY_PROBE_DOCS, seed=42).write.mode(
                "overwrite"
            ).parquet(probe_corpus)
        idx_dir = os.path.join(tempfile.gettempdir(), "wics_bench_index_probe")
        shutil.rmtree(idx_dir, ignore_errors=True)
        build_index(
            spark, spark.read.parquet(probe_corpus), idx_dir,
            n_buckets=32, n_salts=8,
        )
    h = load_index(idx_dir)
    lat = []
    for _ in range(7):
        t0 = time.time()
        query_topk_local(spark, h, ["storm", "lantern", "the"], k=10)
        lat.append(time.time() - t0)
    bm25_p50_ms = round(statistics.median(lat) * 1000, 1)
    lat_c = []
    for _ in range(7):
        h.invalidate()
        t0 = time.time()
        query_topk_local(spark, h, ["storm", "lantern", "the"], k=10)
        lat_c.append(time.time() - t0)
    bm25_p50_ms_cold = round(statistics.median(lat_c) * 1000, 1)

    # Selective-query p50 on a LONG-TAIL corpus (tail_vocab Zipf tail →
    # realistic df skew): a rare term + stopwords is the regime where
    # block-max WAND's bound skipping actually pays. The rare term is picked
    # deterministically from the built index (lexicographically first tail
    # term with 5 ≤ df ≤ 50).
    tail_idx = os.path.join(tempfile.gettempdir(), "wics_bench_index_tail")
    shutil.rmtree(tail_idx, ignore_errors=True)
    tail_corpus = os.path.join(
        tempfile.gettempdir(),
        f"wics_bench_corpus_tail_{CORPUS_VERSION}_{LATENCY_PROBE_DOCS}_42",
    )
    if not os.path.exists(os.path.join(tail_corpus, "_SUCCESS")):
        pages_dataframe(
            spark, LATENCY_PROBE_DOCS, seed=42, tail_vocab=50_000
        ).write.mode("overwrite").parquet(tail_corpus)
    tail_docs = spark.read.parquet(tail_corpus)
    build_index(spark, tail_docs, tail_idx, n_buckets=32, n_salts=8)
    seg = spark.read.parquet(os.path.join(tail_idx, "segments"))
    from pyspark.sql import functions as F2

    rare = (
        seg.where(F2.col("term").startswith("tail"))
        .where(F2.col("df").between(5, 50))
        .agg(F2.min("term"))
        .collect()[0][0]
    )
    rare = rare or "tailax"  # vanishingly unlikely; keeps the probe total
    ht = load_index(tail_idx)
    lat_t = []
    for _ in range(7):
        t0 = time.time()
        query_topk_local(spark, ht, [rare, "the", "storm"], k=10)
        lat_t.append(time.time() - t0)
    bm25_p50_ms_tail = round(statistics.median(lat_t) * 1000, 1)

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
                "forward_build_sec": forward_build_sec,
                "bm25_p50_ms": bm25_p50_ms,
                "bm25_p50_ms_cold": bm25_p50_ms_cold,
                "bm25_p50_ms_tail": bm25_p50_ms_tail,
            }
        )
    )


if __name__ == "__main__":
    main()
