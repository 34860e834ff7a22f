"""SparkSession builders tuned for local[N] testing of a cluster-scale job.

All knobs here are also the right defaults for a real multi-executor cluster:
AQE on (runtime coalescing + skew-join splitting), Arrow on (every Python
surface in this engine is a pandas/Arrow UDF), UTC session timezone (pinned so
the DuckDB oracle comparison is stable), shuffle partitions sized to
parallelism rather than the 200 default.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    cores: int | None = None,
    app_name: str = "words_in_context_spark",
    shuffle_partitions: int | None = None,
    driver_memory: str = "24g",
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession on ``local[cores]``.

    ``cores`` defaults to $SPARK_GRAFT_CPUS or all cores. ``shuffle_partitions``
    defaults to the core count — right for the small interactive queries
    (finer tasks measurably add ~1 s of scheduling overhead per query at
    sf0.1). The long-running build path raises it to 4× parallelism itself
    (see index/build.py) to bound its shuffle straggler tail; at cluster
    scale that rule is 4 × executors × cores.
    """
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    if shuffle_partitions is None:
        shuffle_partitions = max(cores, 4)

    # Executor Python workers must be able to import this package regardless
    # of the driver's cwd. Locally that's PYTHONPATH (inherited by the JVM,
    # then by the python daemon); on a real cluster the equivalent is
    # `spark-submit --py-files wics.zip` (see tools/make_pyfiles.py).
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    existing = os.environ.get("PYTHONPATH", "")
    if repo_root not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            repo_root + (os.pathsep + existing if existing else "")
        )

    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(cores))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Arrow batch size for mapInPandas surfaces (the extract/tokenize
        # UDTF): the 10000 default turns a whole input split into ONE giant
        # batch (a 3,750-doc split = one ~3M-token pandas frame) — poor
        # cache locality, large allocations, and zero JVM↔worker
        # pipelining. Measured on the 120k-doc corpus (interleaved A/B,
        # 2 rounds x 3 sizes): tokenize throughput 1.5-1.8x at BOTH
        # local[2] (1540→2348 docs/s) and local[8] (4580→8514), and the
        # tokenize stage's 2→8 scaling efficiency 0.74→0.91. 128 ≈ 512 >
        # 1024 >> 10000; 512 chosen as robust. Override via extra_conf.
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "512")
        .config("spark.driver.memory", driver_memory)
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
