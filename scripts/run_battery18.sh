#!/bin/bash
# Battery 18: end-to-end fit() throughput at production batch size
# (100k records, batch 2048, onehot+aligned) — exercises the C++
# columnar loader + window tiling + scan dispatch + eval loop on TPU.
set -u
cd /root/repo
OUT=results/battery18.log
while ! grep -q DONE results/screen_1b_factorized.log 2>/dev/null; do
  sleep 30
done
echo "=== battery18 start $(date +%H:%M:%S)" > "$OUT"
timeout 3600 python scripts/tpu_fit_throughput.py 100000 2048 4 >> "$OUT" 2>&1
echo "--- exit $? $(date +%H:%M:%S)" >> "$OUT"
echo DONE >> "$OUT"
