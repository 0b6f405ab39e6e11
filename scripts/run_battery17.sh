#!/bin/bash
# Battery 17: 1B-candidate factorized sweep (blocked eval). The T grid is
# deliberately dense (~20k points) — the pair axis is capped by the
# 2688-cation generator; this measures the eval loop + top-k merge at
# BASELINE-config-5 x100 scale.
set -u
cd /root/repo
OUT=results/screen_1b_factorized.log
while ! grep -q DONE results/battery16.log 2>/dev/null; do
  sleep 30
done
echo "=== 1B sweep start $(date +%H:%M:%S)" > "$OUT"
timeout 5400 python scripts/screen.py \
  --grid-cations 2688 --target-candidates 1000000000 \
  --top-k 100 --checkpoint results/viscosity_aligned_f32/checkpoints \
  --out results/screen_1b_factorized.csv >> "$OUT" 2>&1
echo "--- exit $? $(date +%H:%M:%S)" >> "$OUT"
echo DONE >> "$OUT"
