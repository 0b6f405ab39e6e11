#!/bin/bash
# Battery 26 (round 3): stacked winners + scan-unroll A/B + fit throughput.
set -u
cd /root/repo
OUT=results/microbench_r3_battery26.jsonl
while ! grep -q DONE results/microbench_r3_battery25.jsonl.log 2>/dev/null; do
  sleep 30
done
: > "$OUT"
run() {
  echo "=== $* $(date +%H:%M:%S)" >> "$OUT.log"
  timeout 2400 python "$@" >> "$OUT" 2>> "$OUT.log"
  echo "--- exit $? $(date +%H:%M:%S)" >> "$OUT.log"
}
run scripts/tpu_microbench.py step-onehot+aligned+vloop+bf16+fusedgru+unroll2 2048
run scripts/tpu_microbench.py step-onehot+aligned+vloop+fusedgru+unroll2 2048
run scripts/tpu_microbench.py step-onehot+aligned+vloop+bf16+fusedgru+unroll8 2048
# end-to-end fit with the new host pipeline (group buffers + dev cache)
run scripts/tpu_microbench.py step-onehot+aligned+vloop+tile384 2048
run scripts/tpu_fit_throughput.py 100000 2048 3
echo DONE >> "$OUT.log"
