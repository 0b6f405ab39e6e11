#!/bin/bash
# Round-2 battery 12: 10M-candidate screening sweep on the onehot path
# (device grid pack + on-device window tiling). Prior gather-impl sweep:
# 10,036,224 candidates in 1070 s = 9,445 pairs/s (RESULTS battery 4/6).
set -u
cd /root/repo
OUT=results/screen_10m_onehot.log
mkdir -p results
while ! grep -q DONE results/microbench_r2_battery11.jsonl.log 2>/dev/null; do
  sleep 30
done
echo "=== sweep start $(date +%H:%M:%S)" > "$OUT"
timeout 5400 python scripts/screen.py \
  --grid-cations 2688 --target-candidates 10000000 \
  --batch-size 4096 --top-k 100 --progress-every 1000000 \
  --out results/screen_10m_onehot.csv >> "$OUT" 2>&1
echo "--- exit $? $(date +%H:%M:%S)" >> "$OUT"
echo DONE >> "$OUT"
