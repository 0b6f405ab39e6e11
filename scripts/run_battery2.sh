#!/bin/bash
set -u
cd /root/repo
OUT=results/microbench_r2_battery2.jsonl
mkdir -p results
: > "$OUT"
run() {
  echo "=== $* $(date +%H:%M:%S)" >> "$OUT.log"
  timeout 1800 python "$@" >> "$OUT" 2>> "$OUT.log"
  echo "--- exit $? $(date +%H:%M:%S)" >> "$OUT.log"
}
run scripts/tpu_microbench.py step-symmetric 2048
run scripts/tpu_microbench.py step-gather 2048
run scripts/tpu_microbench.py step-symmetric 2048
run scripts/tpu_microbench.py step-gather 2048
run scripts/tpu_microbench.py step-fusedgru 2048
run bench.py --dense-only --model mp --batch-size 2048
echo DONE >> "$OUT.log"
