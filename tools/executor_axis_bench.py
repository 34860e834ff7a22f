"""N-vs-4N EXECUTOR scaling evidence — the north rule's literal axis.

tools/scaling_bench.py scales task slots inside one JVM (local[2]→local[8]).
This tool scales EXECUTOR COUNT instead, using Spark's local-cluster mode:
``local-cluster[E, 2, mem]`` spawns E real executor JVMs (separate heaps,
separate Python worker pools, netty shuffle between processes) behind a
real standalone-style scheduler — the closest a single box gets to "N and
4N executors". lo = local-cluster[1,2] (1 executor × 2 cores, pinned to 2
host cores), hi = local-cluster[4,2] (4 executors × 2 cores, pinned to 8).

Same protocol as scaling_bench: interleaved pairs, taskset pinning,
co-timestamped pure-CPU window probes, /proc/stat busy_cores, median gate.

    python tools/executor_axis_bench.py [n_docs]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = """
import json, os, shutil, sys, time
sys.path.insert(0, {repo!r})
from words_in_context_spark.corpus import CORPUS_VERSION, pages_dataframe
from words_in_context_spark.index.build import build_index

n_exec, n_docs = int(sys.argv[1]), int(sys.argv[2])
cores = 2 * n_exec

repo_root = {repo!r}
existing = os.environ.get("PYTHONPATH", "")
if repo_root not in existing.split(os.pathsep):
    os.environ["PYTHONPATH"] = (
        repo_root + (os.pathsep + existing if existing else "")
    )

from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master(f"local-cluster[{{n_exec}},2,4096]")
    .appName(f"exec-axis-{{n_exec}}")
    .config("spark.sql.shuffle.partitions", str(max(cores, 4)))
    .config("spark.default.parallelism", str(cores))
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
    .config("spark.sql.adaptive.skewJoin.enabled", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    .config("spark.sql.execution.arrow.maxRecordsPerBatch", "512")
    .config("spark.driver.memory", "6g")
    .config("spark.executor.memory", "4g")
    .config("spark.executorEnv.PYTHONPATH", os.environ["PYTHONPATH"])
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
spark.range(10_000).repartition(cores).mapInPandas(
    lambda it: it, "id long").write.mode("overwrite").format("noop").save()

def cpu_jiffies():
    with open("/proc/stat") as f:
        p = f.readline().split()[1:]
    return sum(map(int, p[:3]))

idx = f"/tmp/wics_execaxis_idx_{{n_exec}}"
corpus = f"/tmp/wics_scaling_corpus_{{CORPUS_VERSION}}_{{n_docs}}"
if not os.path.exists(corpus + "/_SUCCESS"):
    pages_dataframe(spark, n_docs, seed=42).repartition(64).write.mode(
        "overwrite").parquet(corpus)
docs = spark.read.parquet(corpus)
shutil.rmtree(idx, ignore_errors=True)
c0, t0 = cpu_jiffies(), time.time()
build_index(spark, docs, idx, n_buckets=32, n_salts=8)
sec = time.time() - t0
busy = (cpu_jiffies() - c0) / 100.0 / sec
print(json.dumps({{"executors": n_exec, "cores": cores, "n_docs": n_docs,
                   "sec": round(sec, 2),
                   "docs_per_sec": round(n_docs / sec, 1),
                   "busy_cores": round(busy, 2)}}))
"""


def run_level(n_exec: int, n_docs: int) -> dict:
    cores = 2 * n_exec
    out = subprocess.run(
        ["taskset", "-c", f"0-{cores - 1}",
         sys.executable, "-c", _CHILD.format(repo=REPO),
         str(n_exec), str(n_docs)],
        capture_output=True, text=True, timeout=3600, cwd=REPO,
    )
    if out.returncode != 0:
        raise RuntimeError(
            f"executors={n_exec} failed:\n{out.stderr[-4000:]}"
        )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from scaling_bench import _cpu_probe

    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 480000
    n_pairs = int(os.environ.get("SPARK_GRAFT_SCALING_PAIRS", "2"))
    probe_gate = float(os.environ.get("SPARK_GRAFT_PROBE_GATE", "0"))
    pairs = []
    for _ in range(n_pairs):
        probe = _cpu_probe()
        waits = 0
        while probe_gate and probe < probe_gate and waits < 8:
            import time

            time.sleep(90)
            waits += 1
            probe = _cpu_probe()
        lo = run_level(1, n_docs)
        hi = run_level(4, n_docs)
        pairs.append(
            {
                "lo": lo,
                "hi": hi,
                "probe_eff": probe,
                "efficiency": round(
                    hi["docs_per_sec"] / lo["docs_per_sec"] / 4.0, 3
                ),
            }
        )
        print(json.dumps(pairs[-1]))
    import statistics

    effs = [p["efficiency"] for p in pairs]
    print(
        json.dumps(
            {
                "metric": "index_build_executor_axis_efficiency",
                "n_docs": n_docs,
                "levels": "local-cluster[1,2] -> local-cluster[4,2]",
                "pairs": effs,
                "probe_effs": [p["probe_eff"] for p in pairs],
                "efficiency": round(statistics.median(effs), 3),
                "threshold": 0.8,
                "pass": statistics.median(effs) >= 0.8,
            }
        )
    )


if __name__ == "__main__":
    main()
