"""Isolated encode+merge+write stage scaling probe (diagnostic tool).

The full-build scaling gate (tools/scaling_bench.py) composes tokenize
(scales ~0.9-1.0) with the posting encode/merge/write stage (the Amdahl
residual). This tool times ONLY the latter: it reuses a pre-built index's
``forward`` + ``doc_map`` checkpoints (build_index's resume path skips
tokenize entirely) and re-runs the segment build at pinned 2 and 8 cores.

Variants:
  id      current term_id-keyed path (default)
  noop    _encode_run replaced with a row-consuming stub — measures the
          shuffle + Arrow-transfer + pandas-conversion floor with the codec
          and the real segment write removed

    python tools/encode_stage_bench.py <src_index_dir> [variants...]
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
from words_in_context_spark.session import get_spark

cores, src, variant = int(sys.argv[1]), sys.argv[2], sys.argv[3]

import words_in_context_spark.index.build as B
import pandas as pd

_CONF = {{}}
if variant == "nocoalesce":
    _CONF["spark.sql.adaptive.coalescePartitions.enabled"] = "false"
elif variant == "bigbatch":
    _CONF["spark.sql.execution.arrow.maxRecordsPerBatch"] = "65536"
elif variant == "both":
    _CONF["spark.sql.adaptive.coalescePartitions.enabled"] = "false"
    _CONF["spark.sql.execution.arrow.maxRecordsPerBatch"] = "65536"
if variant == "noop":
    def _stub_row(key, t, s, m):
        return {{key: t, "salt": s, "df": 1, "cf": 1,
                "doc_bytes": b"", "tf_bytes": b"", "dl_bytes": b"",
                "first_doc": [0], "last_doc": [0], "n": [1], "doc_off": [0],
                "tf_off": [0], "dl_off": [0], "max_impact": [m]}}

    def _noop_encode(avgdl, key="term"):
        def fn(pdf):
            t = pdf[key].iloc[0]
            s = int(pdf["salt"].iloc[0])
            m = float(pdf["tf"].to_numpy().mean())  # force column materialize
            return pd.DataFrame([_stub_row(key, t, s, m)])
        return fn

    def _noop_encode_rows(avgdl):
        import numpy as np
        def fn(it):
            for pdf in it:
                out = []
                for row in pdf.itertuples(index=False):
                    m = float(np.asarray(row.tfs, dtype=np.int64).mean())
                    out.append(_stub_row("term_id", int(row.term_id),
                                         int(row.salt), m))
                yield pd.DataFrame(out, columns=B._RUN_COLS_ID)
        return fn

    B._encode_run = _noop_encode
    B._encode_rows = _noop_encode_rows

def cpu_jiffies():
    with open("/proc/stat") as f:
        p = f.readline().split()[1:]
    return sum(map(int, p[:3]))

spark = get_spark(cores=cores, app_name=f"encstage-{{cores}}", extra_conf=_CONF)
spark.sparkContext.setLogLevel("ERROR")
spark.range(10_000).mapInPandas(lambda it: it, "id long").write.mode(
    "overwrite").format("noop").save()

idx = f"/tmp/wics_encstage_{{cores}}"
shutil.rmtree(idx, ignore_errors=True)
os.makedirs(idx)
# hardlink-copy the tokenize outputs: resume path then skips tokenize
for name in ("forward", "doc_map"):
    shutil.copytree(os.path.join(src, name), os.path.join(idx, name),
                    copy_function=os.link)

# docs only feeds the partition-count check on this path
docs = spark.read.parquet(os.path.join(idx, "forward")).select("url").limit(1)
c0, t0 = cpu_jiffies(), time.time()
B.build_index(spark, docs, idx, n_buckets=32, n_salts=8)
sec = time.time() - t0
busy = (cpu_jiffies() - c0) / 100.0 / sec
print(json.dumps({{"cores": cores, "variant": variant, "sec": round(sec, 2),
                   "busy_cores": round(busy, 2)}}))
"""


def run(cores: int, src: str, variant: str) -> dict:
    out = subprocess.run(
        ["taskset", "-c", f"0-{cores - 1}", sys.executable, "-c",
         _CHILD.format(repo=REPO), str(cores), src, variant],
        capture_output=True, text=True, timeout=1800, cwd=REPO,
    )
    if out.returncode != 0:
        raise RuntimeError(f"{cores}/{variant} failed:\n{out.stderr[-3000:]}")
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/tmp/wics_scaling_idx_8"
    variants = sys.argv[2:] or ["id", "noop"]
    from scaling_bench import _cpu_probe  # same go/no-go instrument

    for v in variants:
        probe = _cpu_probe()
        lo = run(2, src, v)
        hi = run(8, src, v)
        eff = round(lo["sec"] / hi["sec"] / 4.0, 3)
        print(json.dumps({"variant": v, "probe_eff": probe, "lo": lo,
                          "hi": hi, "efficiency_2_8": eff}))


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    main()
