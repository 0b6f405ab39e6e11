#!/bin/bash
# Round-2 battery 9: the all-MXU one-hot message path on hardware
# (fetch-synced). A/B against step-gather (197 ms/step honest, battery 7).
set -u
cd /root/repo
OUT=results/microbench_r2_battery9.jsonl
mkdir -p results
while ! grep -q DONE results/microbench_r2_battery8.jsonl.log 2>/dev/null; do
  sleep 30
done
: > "$OUT"
run() {
  echo "=== $* $(date +%H:%M:%S)" >> "$OUT.log"
  timeout 2400 python "$@" >> "$OUT" 2>> "$OUT.log"
  echo "--- exit $? $(date +%H:%M:%S)" >> "$OUT.log"
}
run scripts/tpu_microbench.py mpa-onehot 2048
run scripts/tpu_microbench.py step-onehot 2048
run scripts/tpu_microbench.py step-gather 2048
run scripts/tpu_microbench.py step-onehot 2048
echo DONE >> "$OUT.log"
