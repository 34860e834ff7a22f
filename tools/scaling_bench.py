"""N-vs-4N scaling evidence (north rule).

The rule demands throughput scaling efficiency ≥ 0.8 between N and 4N
executors. This sandbox has one machine, so the driver-sanctioned proxy is:
the IDENTICAL index-build job on IDENTICAL input at N and 4N cores,
efficiency = (docs_per_sec@4N / docs_per_sec@N) / 4.

Core-count choice (N=2, 4N=8): a pure-CPU multiprocessing probe on this VM
measures 16.0 M-ops/s ×1, 116 M-ops/s ×8, 318 M-ops/s ×32 — i.e. the host
delivers 1→8 scaling at 0.91 efficiency but only 0.68 at 8→32 (SMT/host
throttling above ~8-16 effective cores). 2→8 therefore measures the ENGINE's
scaling rather than the hypervisor's CPU cap; on a real 1000-executor cluster
the analogous axis is executor count, where no such cap applies.

Each level runs under ``taskset -c 0-(N-1)``: local[N] caps only task slots,
while JVM shuffle/IO threads and python workers would otherwise spill onto
idle host cores and inflate the low-parallelism baseline.

Each parallelism level runs in its own subprocess (a JVM can't change its
master); results + the efficiency table are written to BENCH/scaling_latest.md
(BENCH/BASELINE.md holds the curated multi-run summary).

    python tools/scaling_bench.py [n_docs]
"""

from __future__ import annotations

import datetime as dt
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = """
import json, shutil, sys, time
sys.path.insert(0, {repo!r})
from words_in_context_spark.session import get_spark
from words_in_context_spark.corpus import pages_dataframe
from words_in_context_spark.index.build import build_index

cores, n_docs = int(sys.argv[1]), int(sys.argv[2])
spark = get_spark(cores=cores, app_name=f"scaling-{{cores}}")
spark.sparkContext.setLogLevel("ERROR")
# warmup outside the measured window
spark.range(10_000).mapInPandas(lambda it: it, "id long").write.mode(
    "overwrite").format("noop").save()
idx = f"/tmp/wics_scaling_idx_{{cores}}"
# input table pre-materialized OUTSIDE the timed window: the measured job is
# the index build from an existing pages table, as on a real cluster
corpus = f"/tmp/wics_scaling_corpus_{{n_docs}}"
import os
if not os.path.exists(corpus + "/_SUCCESS"):
    pages_dataframe(spark, n_docs, seed=42).repartition(64).write.mode(
        "overwrite").parquet(corpus)
docs = spark.read.parquet(corpus)
shutil.rmtree(idx, ignore_errors=True)
t0 = time.time()
build_index(spark, docs, idx, n_buckets=32, n_salts=8)
sec = time.time() - t0
print(json.dumps({{"cores": cores, "n_docs": n_docs, "sec": round(sec, 2),
                   "docs_per_sec": round(n_docs / sec, 1)}}))
"""


def run_level(cores: int, n_docs: int) -> dict:
    code = _CHILD.format(repo=REPO)
    # hard CPU affinity: local[N] only caps Spark TASK slots — JVM-internal
    # pools and python workers would otherwise steal idle host cores and
    # corrupt the N-core measurement (observed: a "2-core" run beating its
    # own 160k time at 240k). taskset pins the whole process tree.
    out = subprocess.run(
        ["taskset", "-c", f"0-{cores - 1}",
         sys.executable, "-c", code, str(cores), str(n_docs)],
        capture_output=True,
        text=True,
        timeout=3600,
        cwd=REPO,
    )
    if out.returncode != 0:
        raise RuntimeError(f"level {cores} failed:\n{out.stderr[-3000:]}")
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else int(
        os.environ.get("SPARK_GRAFT_SCALING_DOCS", "120000")
    )
    n_pairs = int(os.environ.get("SPARK_GRAFT_SCALING_PAIRS", "2"))
    # INTERLEAVED PAIRS: the hypervisor's cpu allocation drifts on multi-
    # minute timescales (observed ±50% wall on identical runs), so each
    # efficiency sample pairs a lo and hi run measured back-to-back; the
    # median pair is reported (best pair also shown).
    pairs = []
    for _ in range(n_pairs):
        lo = run_level(2, n_docs)
        hi = run_level(8, n_docs)
        pairs.append(
            {
                "lo": lo,
                "hi": hi,
                "efficiency": round(
                    (hi["docs_per_sec"] / lo["docs_per_sec"]) / 4.0, 3
                ),
            }
        )
    pairs.sort(key=lambda p: p["efficiency"])
    median_pair = pairs[len(pairs) // 2] if len(pairs) % 2 else pairs[len(pairs) // 2 - 1]
    best_pair = pairs[-1]
    # HEADLINE = the median interleaved pair (honest central tendency on a
    # drifting VM); best pair is supplementary. Keys name the actual
    # parallelism levels measured (local[2] / local[8] = N / 4N).
    lo, hi = median_pair["lo"], median_pair["hi"]
    eff = median_pair["efficiency"]
    result = {
        "metric": "index_build_scaling_efficiency",
        "n_docs": n_docs,
        "pairs": [p["efficiency"] for p in pairs],
        "local2": lo,
        "local8": hi,
        "speedup": round(hi["docs_per_sec"] / lo["docs_per_sec"], 2),
        "efficiency": eff,
        "best_pair_efficiency": best_pair["efficiency"],
        "threshold": 0.8,
        "pass": eff >= 0.8,
    }
    print(json.dumps(result))

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    # write to a per-run file: BENCH/BASELINE.md is the curated summary of
    # ALL samples and must not be clobbered by a single (noisy) run
    with open(os.path.join(REPO, "BENCH", "scaling_latest.md"), "w") as f:
        f.write(
            f"""# BENCH/BASELINE — measured engine numbers

Generated {dt.datetime.now(dt.timezone.utc).isoformat()} by
`tools/scaling_bench.py` on local[N] (single machine, {os.cpu_count()} cores,
see BASELINE.md for the N→4N proxy rationale).

## Index-build throughput & scaling efficiency (north rule)

Identical job — pre-materialized Common-Crawl-style pages table ({n_docs}
SRT-structured web pages, seed 42, parquet) → extract+tokenize+per-doc-tf
Arrow UDTF (no token shuffle) → range-salted posting encode → zero-decode
merge → 32 term-bucketed compressed segment partitions + manifest — on
identical input, at two parallelism levels:

| parallelism | wall (s) | docs/sec |
|---|---|---|
| local[2]  (N)  | {lo['sec']} | {lo['docs_per_sec']} |
| local[8] (4N) | {hi['sec']} | {hi['docs_per_sec']} |

(Interleaved lo/hi pairs — this sandbox VM's cpu allocation drifts ±50% on
multi-minute timescales, so each efficiency sample pairs runs measured
back-to-back; pair efficiencies this run: {result['pairs']}; the MEDIAN pair
is the headline above (best pair {result['best_pair_efficiency']} is
supplementary). N=2/4N=8 because a pure-CPU probe shows the hypervisor
itself only scales 0.68× from 8→32 threads; each level hard-pinned with
taskset — see module docstring.)

**speedup 2→8: {result['speedup']}×; scaling efficiency =
(throughput@4N / throughput@N) / 4 = {result['efficiency']} (median pair)**
(threshold ≥ 0.8 → {"PASS" if result['pass'] else "FAIL"})

## Headline query suite

See the driver-recorded `BENCH_r*.json` (bench.py at sf0.1, local[32]):
per-query wall seconds, real index-build docs/sec at 10k docs, and block-max
WAND BM25 top-k p50 latency over the built index.
"""
        )


if __name__ == "__main__":
    main()
