#!/bin/bash
# Battery 20: fit() epoch throughput re-measure after the native C++
# window tiler (battery 18 baseline: 5.02 s/epoch = 19.5k records/s).
set -u
cd /root/repo
OUT=results/battery20.log
while ! grep -q DONE results/screen_1b_v2.log 2>/dev/null; do
  sleep 30
done
echo "=== battery20 start $(date +%H:%M:%S)" > "$OUT"
timeout 3600 python scripts/tpu_fit_throughput.py 100000 2048 4 >> "$OUT" 2>&1
echo "--- exit $? $(date +%H:%M:%S)" >> "$OUT"
echo DONE >> "$OUT"
