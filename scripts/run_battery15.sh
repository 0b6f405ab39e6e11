#!/bin/bash
# Battery 15: (a) real viscosity training on the NEW default path
# (onehot + window_aligned) f32 — expect Test R^2 ~0.97 like round 1;
# (b) same in bf16 (quality gate for making bf16 the throughput default);
# (c) factorized 10M sweep rerun with warm compile cache (steady-state).
set -u
cd /root/repo
OUT=results/battery15.log
while ! grep -q DONE results/screen_10m_factorized.log 2>/dev/null; do
  sleep 30
done
echo "=== battery15 start $(date +%H:%M:%S)" > "$OUT"
run() {
  echo "=== $* $(date +%H:%M:%S)" >> "$OUT"
  timeout 3600 "$@" >> "$OUT" 2>&1
  echo "--- exit $? $(date +%H:%M:%S)" >> "$OUT"
}
run python scripts/train_viscosity.py --epochs 400 --patience 40 \
  --out-dir results/viscosity_aligned_f32
run python scripts/train_viscosity.py --epochs 400 --patience 40 \
  --dtype bfloat16 --out-dir results/viscosity_aligned_bf16
run python scripts/screen.py --grid-cations 2688 --target-candidates 10000000 \
  --top-k 100 --checkpoint results/viscosity_aligned_f32/checkpoints \
  --out results/screen_10m_factorized_warm.csv
echo DONE >> "$OUT"
