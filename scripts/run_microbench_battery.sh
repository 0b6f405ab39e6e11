#!/bin/bash
# Sequential first-in-process TPU measurements (one process per config —
# the second-executable slowdown forbids more). Logs JSON lines.
set -u
cd /root/repo
OUT=results/microbench_r2_argstyle.jsonl
mkdir -p results
: > "$OUT"
run() {
  echo "=== $* $(date +%H:%M:%S)" >> "$OUT.log"
  timeout 1800 python "$@" >> "$OUT" 2>> "$OUT.log"
  echo "--- exit $? $(date +%H:%M:%S)" >> "$OUT.log"
}
run bench.py --dense-only --batch-size 2048
run scripts/tpu_microbench.py mpa-gather 2048
run scripts/tpu_microbench.py mpa-symmetric 2048
run scripts/tpu_microbench.py mpa-typed 2048
run scripts/tpu_microbench.py seg-xla 2048
run scripts/tpu_microbench.py seg-pallas 2048
run scripts/tpu_microbench.py step-gather 2048
run scripts/tpu_microbench.py step-pallas 2048
echo DONE >> "$OUT.log"
