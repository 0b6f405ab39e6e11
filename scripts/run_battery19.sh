#!/bin/bash
# Battery 19: 1B factorized sweep rerun with the two-stage top-k
# (battery 17 baseline: 1003.6 s = 996k pairs/s, ~95% in the flat top-k).
set -u
cd /root/repo
OUT=results/screen_1b_v2.log
while ! grep -q DONE results/battery18.log 2>/dev/null; do
  sleep 30
done
echo "=== 1B v2 start $(date +%H:%M:%S)" > "$OUT"
timeout 5400 python scripts/screen.py \
  --grid-cations 2688 --target-candidates 1000000000 \
  --top-k 100 --checkpoint results/viscosity_aligned_f32/checkpoints \
  --out results/screen_1b_v2.csv >> "$OUT" 2>&1
echo "--- exit $? $(date +%H:%M:%S)" >> "$OUT"
echo DONE >> "$OUT"
