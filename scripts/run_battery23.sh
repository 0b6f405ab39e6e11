#!/bin/bash
# Battery 23: onehot constant-factor probes — vloop vs lanes select at
# op level (aligned), and batch-size sweep for the step sweet spot.
# Baselines: mpa-onehotaligned 1.264 ms, step-onehot+aligned 13.44 ms @2048.
set -u
cd /root/repo
OUT=results/microbench_r2_battery23.jsonl
: > "$OUT"
run() {
  echo "=== $* $(date +%H:%M:%S)" >> "$OUT.log"
  timeout 2400 python "$@" >> "$OUT" 2>> "$OUT.log"
  echo "--- exit $? $(date +%H:%M:%S)" >> "$OUT.log"
}
run scripts/tpu_microbench.py mpa-onehotalignedvloop 2048
run scripts/tpu_microbench.py mpa-onehotaligned 2048
run scripts/tpu_microbench.py step-onehot+aligned 1024
run scripts/tpu_microbench.py step-onehot+aligned 3072
echo DONE >> "$OUT.log"
