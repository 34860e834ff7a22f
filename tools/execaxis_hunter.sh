#!/bin/bash
# Window-hunting wrapper for tools/executor_axis_bench.py.
#
# The host's cycle allocation drifts on multi-minute timescales (documented
# in BENCH/BASELINE.md); the bench aborts itself when the sustained window
# check fails. This loop simply retries until one session completes, so a
# multi-hour run catches whatever clean windows the host offers. Every
# attempt (including aborted ones) is appended to BENCH/executor_axis_latest.md
# by the bench itself.
#
#   nohup tools/execaxis_hunter.sh [n_docs] [max_attempts] > /tmp/hunter.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
N_DOCS="${1:-480000}"
MAX="${2:-8}"
for i in $(seq 1 "$MAX"); do
  echo "=== attempt $i/$MAX $(date -u +%H:%M:%S) ==="
  SPARK_GRAFT_EXEC_SUSTAINED_GATE="${SPARK_GRAFT_EXEC_SUSTAINED_GATE:-106}" \
  SPARK_GRAFT_EXEC_SUSTAINED_RETRIES="${SPARK_GRAFT_EXEC_SUSTAINED_RETRIES:-2}" \
  SPARK_GRAFT_EXEC_CONTROL="${SPARK_GRAFT_EXEC_CONTROL:-1}" \
  SPARK_GRAFT_SCALING_PAIRS="${SPARK_GRAFT_SCALING_PAIRS:-2}" \
    python tools/executor_axis_bench.py "$N_DOCS" 2>&1 | tee /tmp/execaxis_attempt_$i.log
  if grep -q '"metric"' /tmp/execaxis_attempt_$i.log; then
    echo "=== session completed on attempt $i ==="
    exit 0
  fi
  sleep 600
done
echo "=== no clean window in $MAX attempts ==="
exit 1
