"""N-vs-4N EXECUTOR scaling evidence — the north rule's literal axis.

tools/scaling_bench.py scales task slots inside one JVM (local[2]→local[8]).
This tool scales EXECUTOR COUNT instead, using Spark's local-cluster mode:
``local-cluster[E, 2, mem]`` spawns E real executor JVMs (separate heaps,
separate Python worker pools, netty shuffle between processes) behind a
real standalone-style scheduler — the closest a single box gets to "N and
4N executors". lo = local-cluster[1,2] (1 executor × 2 cores, pinned to 2
host cores), hi = local-cluster[4,2] (4 executors × 2 cores, pinned to 8).

Protocol (same discipline as scaling_bench, round-5 verdict #1): interleaved
back-to-back pairs, taskset pinning, co-timestamped pure-CPU window probes,
per-busy-core rate parity, /proc/stat busy_cores, median-of-pairs gate.
Results append to BENCH/executor_axis_latest.md (one session table per run).

Multi-JVM-specific engine settings (ONLY correctness-neutral scheduler/
shuffle knobs a real cluster job would also set):
  * spark.locality.wait=0 — with 4 executors the scheduler otherwise holds
    tasks up to 3 s waiting for data-local slots; on an 8-core box every
    slot is equidistant, and at 10^12-doc scale the equivalent setting is
    standard for shuffle-heavy builds (locality matters for HDFS scans, not
    for this job's Arrow stages).
  * spark.reducer.maxSizeInFlight=96m — inter-JVM shuffle fetches go over
    netty loopback instead of in-process memory; a deeper in-flight window
    hides that latency.

Attribution instrument (SPARK_GRAFT_EXEC_CONTROL=1): each pair additionally
runs an in-JVM local[8] build BETWEEN lo and hi — same window, same 8 cores,
same input — so (ctrl vs hi) isolates the multi-JVM overhead (executor-JVM
JIT ×4, netty shuffle, task dispatch) from host-window noise, which cancels.

    python tools/executor_axis_bench.py [n_docs]

Env: SPARK_GRAFT_SCALING_PAIRS (default 2), SPARK_GRAFT_PROBE_GATE,
SPARK_GRAFT_EXEC_CONTROL, SPARK_GRAFT_EXEC_SUSTAINED_GATE (max seconds for a
pre-session real hi build; the round-5 finding is that 20 s probes miss
sustained caps — a real build ≤ the bound is the reliable window check).
"""

from __future__ import annotations

import datetime as dt
import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = """
import json, os, shutil, sys, time
sys.path.insert(0, {repo!r})
from words_in_context_spark.corpus import CORPUS_VERSION, pages_dataframe
from words_in_context_spark.index.build import build_index

mode, n_docs = sys.argv[1], int(sys.argv[2])
# mode: "exec:<E>" = local-cluster[E,2,4096]; "jvm:<C>" = local[C] control
kind, _, num = mode.partition(":")
num = int(num)
cores = 2 * num if kind == "exec" else num

repo_root = {repo!r}
existing = os.environ.get("PYTHONPATH", "")
if repo_root not in existing.split(os.pathsep):
    os.environ["PYTHONPATH"] = (
        repo_root + (os.pathsep + existing if existing else "")
    )

from pyspark.sql import SparkSession

master = (
    f"local-cluster[{{num}},2,4096]" if kind == "exec" else f"local[{{num}}]"
)
b = (
    SparkSession.builder.master(master)
    .appName(f"exec-axis-{{mode}}")
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
    # multi-JVM scheduler/shuffle tuning — see module docstring
    .config("spark.locality.wait", "0")
    .config("spark.reducer.maxSizeInFlight", "96m")
)
spark = b.getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
# warmup: spin every executor's JVM + python worker pool outside the window
spark.range(10_000).repartition(cores).mapInPandas(
    lambda it: it, "id long").write.mode("overwrite").format("noop").save()

def cpu_jiffies():
    with open("/proc/stat") as f:
        p = f.readline().split()[1:]
    return sum(map(int, p[:3]))

idx = f"/tmp/wics_execaxis_idx_{{mode.replace(':', '_')}}"
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
print(json.dumps({{"mode": mode, "cores": cores, "n_docs": n_docs,
                   "sec": round(sec, 2),
                   "docs_per_sec": round(n_docs / sec, 1),
                   "busy_cores": round(busy, 2)}}))
"""


def run_level(mode: str, n_docs: int) -> dict:
    kind, _, num = mode.partition(":")
    cores = 2 * int(num) if kind == "exec" else int(num)
    out = subprocess.run(
        ["taskset", "-c", f"0-{cores - 1}",
         sys.executable, "-c", _CHILD.format(repo=REPO),
         mode, str(n_docs)],
        capture_output=True, text=True, timeout=3600, cwd=REPO,
    )
    if out.returncode != 0:
        raise RuntimeError(f"{mode} failed:\n{out.stderr[-4000:]}")
    return json.loads(out.stdout.strip().splitlines()[-1])


def _rate(run: dict) -> float:
    return run["docs_per_sec"] / max(run.get("busy_cores") or 0, 0.1)


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from scaling_bench import _cpu_probe

    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 480000
    n_pairs = int(os.environ.get("SPARK_GRAFT_SCALING_PAIRS", "2"))
    probe_gate = float(os.environ.get("SPARK_GRAFT_PROBE_GATE", "0"))
    with_control = os.environ.get("SPARK_GRAFT_EXEC_CONTROL") == "1"
    sustained_gate = float(
        os.environ.get("SPARK_GRAFT_EXEC_SUSTAINED_GATE", "0")
    )

    session: dict = {"n_docs": n_docs, "pairs": []}
    if sustained_gate:
        # round-5 finding: the 20 s probe has a blind spot for sustained
        # caps; a REAL hi-level build under a wall bound is the reliable
        # window check. It is a GO/NO-GO: retry across windows, and if the
        # host never delivers, abort the session rather than spend 25 min
        # producing numbers a capped window already decided. Every check is
        # recorded (not hidden) either way.
        import time

        retries = int(
            os.environ.get("SPARK_GRAFT_EXEC_SUSTAINED_RETRIES", "3")
        )
        session["sustained_checks"] = []
        for attempt in range(retries):
            chk = run_level("exec:4", n_docs)
            session["sustained_checks"].append(chk)
            clean = chk["sec"] <= sustained_gate
            print(json.dumps({"sustained_check": chk,
                              "bound": sustained_gate,
                              "clean": clean}))
            if clean:
                break
            if attempt < retries - 1:
                time.sleep(180)
        else:
            print(json.dumps({
                "aborted": "sustained window check never passed",
                "checks": [c["sec"] for c in session["sustained_checks"]],
                "bound": sustained_gate,
            }))
            os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
            path = os.path.join(REPO, "BENCH", "executor_axis_latest.md")
            stamp = dt.datetime.now(dt.timezone.utc).isoformat(
                timespec="seconds"
            )
            with open(path, "a") as f:
                f.write(
                    f"\n## Session {stamp} — {n_docs} docs — ABORTED "
                    "(sustained window check never passed: "
                    + ", ".join(
                        f"{c['sec']} s"
                        for c in session["sustained_checks"]
                    )
                    + f" vs bound {sustained_gate} s)\n"
                )
            return

    for _ in range(n_pairs):
        probe = _cpu_probe()
        waits = 0
        while probe_gate and probe < probe_gate and waits < 8:
            import time

            time.sleep(90)
            waits += 1
            probe = _cpu_probe()
        lo = run_level("exec:1", n_docs)
        ctrl = run_level("jvm:8", n_docs) if with_control else None
        hi = run_level("exec:4", n_docs)
        pair = {
            "lo": lo,
            "hi": hi,
            "probe_eff": probe,
            "efficiency": round(
                hi["docs_per_sec"] / lo["docs_per_sec"] / 4.0, 3
            ),
            "rate_parity": round(_rate(hi) / _rate(lo), 3),
        }
        if ctrl:
            pair["ctrl_jvm8"] = ctrl
            # multi-JVM overhead co-windowed: hi wall / in-JVM-8 wall
            pair["multi_jvm_wall_ratio"] = round(ctrl["sec"] / hi["sec"], 3)
        session["pairs"].append(pair)
        print(json.dumps(pair))

    effs = [p["efficiency"] for p in session["pairs"]]
    parities = [p["rate_parity"] for p in session["pairs"]]
    # Clean-pair criterion, exec-axis calibration (2026-08-17): lo pinned-2
    # busy ≥1.8 plus a co-timestamped probe ≥0.95. The in-JVM suite's hi
    # busy bound (≥7.2) is NOT usable here — every lc[4,2] run of the
    # calibration day read busy 7.0-7.12 independent of window quality
    # (including a 105 s sustained-clean build), i.e. for multi-JVM mode
    # that counter is a structural ceiling, not a throttle discriminator.
    # The probe IS the window discriminator (r5: probe↔pair-eff tracks
    # monotonically; r6 session 1: probe 0.733 → eff 0.619, probe 1.025 →
    # eff 0.838 with ctrl/hi wall 0.994).
    clean = [
        p["efficiency"]
        for p in session["pairs"]
        if p["lo"].get("busy_cores", 0) >= 1.8
        and p["probe_eff"] >= 0.95
    ]
    gate = round(statistics.median(clean or effs), 3)
    result = {
        "metric": "index_build_executor_axis_efficiency",
        "n_docs": n_docs,
        "levels": "local-cluster[1,2] -> local-cluster[4,2]",
        "pairs": effs,
        "rate_parities": parities,
        "probe_effs": [p["probe_eff"] for p in session["pairs"]],
        "clean_pairs": clean,
        "efficiency": gate,
        "gate_basis": (
            f"median of {len(clean)} busy-clean pairs" if clean
            else "median of ALL pairs (no busy-clean pair)"
        ),
        "threshold": 0.8,
        "pass": gate >= 0.8,
    }
    if with_control:
        result["multi_jvm_wall_ratios"] = [
            p.get("multi_jvm_wall_ratio") for p in session["pairs"]
        ]
    print(json.dumps(result))

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    stamp = dt.datetime.now(dt.timezone.utc).isoformat(timespec="seconds")
    rows = []
    for i, p in enumerate(session["pairs"]):
        for lbl, r in (("lc[1,2]", p["lo"]),) + (
            (("local[8] ctrl", p["ctrl_jvm8"]),) if p.get("ctrl_jvm8") else ()
        ) + (("lc[4,2]", p["hi"]),):
            rows.append(
                f"| {i} | {lbl} | {r['sec']} | {r['docs_per_sec']} | "
                f"{r.get('busy_cores', '—')} |"
            )
    path = os.path.join(REPO, "BENCH", "executor_axis_latest.md")
    header_needed = not os.path.exists(path)
    with open(path, "a") as f:
        if header_needed:
            f.write(
                "# Executor-axis scaling sessions (local-cluster mode)\n\n"
                "The north rule's literal axis: N → 4N EXECUTORS. Each\n"
                "session: interleaved lc[1,2]→lc[4,2] pairs (real executor\n"
                "JVMs, netty shuffle), taskset-pinned, pure-CPU window\n"
                "probes, per-busy-core rate parity; optional co-windowed\n"
                "in-JVM local[8] control attributes multi-JVM overhead.\n"
                "Gate = median busy-clean pair efficiency, threshold 0.8.\n"
            )
        f.write(
            f"\n## Session {stamp} — {n_docs} docs\n\n"
            + (
                "Sustained window check(s): lc[4,2] "
                + ", ".join(
                    f"{c['sec']} s" for c in session["sustained_checks"]
                )
                + f" (bound {sustained_gate} s)\n\n"
                if session.get("sustained_checks") else ""
            )
            + "| pair | level | wall (s) | docs/sec | busy cores |\n"
            + "|---|---|---|---|---|\n"
            + "\n".join(rows)
            + "\n\npair efficiencies: "
            + json.dumps(effs)
            + "; rate parities: "
            + json.dumps(parities)
            + "; probes: "
            + json.dumps(result["probe_effs"])
            + (
                "; ctrl/hi wall ratios: "
                + json.dumps(result.get("multi_jvm_wall_ratios"))
                if with_control else ""
            )
            + f"\n\n**gate = {gate} ({result['gate_basis']}) → "
            + ("PASS" if result["pass"] else "FAIL")
            + "**\n"
        )


if __name__ == "__main__":
    main()
