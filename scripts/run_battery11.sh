#!/bin/bash
# Round-2 battery 11 (fetch-synced): the window_ALIGNED onehot layout on
# hardware. Aligned packing (no molecule straddles a 128-node window)
# shrinks the tiled edge count 0.66x (tile fill 0.57 -> 0.86) and drops
# the 3-window src halo (o_src 314 MB -> 70 MB per ion-step at batch
# 2048). Baseline to beat: step-onehot 22.7 ms/step (battery 9).
set -u
cd /root/repo
OUT=results/microbench_r2_battery11.jsonl
mkdir -p results
while ! grep -q DONE results/microbench_r2_battery10.jsonl.log 2>/dev/null; do
  sleep 30
done
: > "$OUT"
run() {
  echo "=== $* $(date +%H:%M:%S)" >> "$OUT.log"
  timeout 2400 python "$@" >> "$OUT" 2>> "$OUT.log"
  echo "--- exit $? $(date +%H:%M:%S)" >> "$OUT.log"
}
run scripts/tpu_microbench.py mpa-onehotaligned 2048
run scripts/tpu_microbench.py step-onehot+aligned 2048
run scripts/tpu_microbench.py step-onehot+aligned 2048
run scripts/tpu_microbench.py step-onehot+aligned+bf16 2048
run scripts/tpu_microbench.py step-onehot+aligned 4096
echo DONE >> "$OUT.log"
