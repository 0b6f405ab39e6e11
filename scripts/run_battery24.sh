#!/bin/bash
# Battery 24: step-level vloop A/B (op level: 1.140 vs 1.301 ms) + bf16.
set -u
cd /root/repo
OUT=results/microbench_r2_battery24.jsonl
while ! grep -q DONE results/microbench_r2_battery23.jsonl.log 2>/dev/null; do
  sleep 30
done
: > "$OUT"
run() {
  echo "=== $* $(date +%H:%M:%S)" >> "$OUT.log"
  timeout 2400 python "$@" >> "$OUT" 2>> "$OUT.log"
  echo "--- exit $? $(date +%H:%M:%S)" >> "$OUT.log"
}
run scripts/tpu_microbench.py step-onehot+aligned+vloop 2048
run scripts/tpu_microbench.py step-onehot+aligned 2048
run scripts/tpu_microbench.py step-onehot+aligned+vloop+bf16 2048
echo DONE >> "$OUT.log"
