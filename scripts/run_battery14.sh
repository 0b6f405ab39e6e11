#!/bin/bash
# Battery 14: factorized 10M screening sweep on TPU (exact-math: encode
# each unique ion once, VFT closed form over the T grid). Brute-force
# baseline: 605 s / 16,757 pairs/s (battery 12).
set -u
cd /root/repo
OUT=results/screen_10m_factorized.log
while ! grep -q DONE results/bench_r2_aligned.log 2>/dev/null; do
  sleep 30
done
echo "=== factorized sweep start $(date +%H:%M:%S)" > "$OUT"
timeout 5400 python scripts/screen.py \
  --grid-cations 2688 --target-candidates 10000000 \
  --top-k 100 --out results/screen_10m_factorized.csv >> "$OUT" 2>&1
echo "--- exit $? $(date +%H:%M:%S)" >> "$OUT"
echo DONE >> "$OUT"
