#!/bin/bash
# Battery 16: the other model families end-to-end on TPU with the onehot
# default — melting-point training (SURVEY target: dev R^2 ~0.64-0.68 on
# real data; synthetic here), transfer pipeline from the battery-15 f32
# viscosity checkpoint, and the MP-config bench headline (bond_dim=1024).
set -u
cd /root/repo
OUT=results/battery16.log
while ! grep -q DONE results/battery15.log 2>/dev/null; do
  sleep 30
done
echo "=== battery16 start $(date +%H:%M:%S)" > "$OUT"
run() {
  echo "=== $* $(date +%H:%M:%S)" >> "$OUT"
  timeout 3600 "$@" >> "$OUT" 2>&1
  echo "--- exit $? $(date +%H:%M:%S)" >> "$OUT"
}
run python scripts/train_melting_point.py --epochs 300 --patience 40 \
  --out-dir results/mp_aligned
run python scripts/train_transfer.py --epochs 200 --patience 30 \
  --viscosity-checkpoint results/viscosity_aligned_f32/checkpoints \
  --out-dir results/transfer_aligned
run python bench.py --model mp --repeats 1 --no-baseline
run python bench.py --model mp --dense-only
echo DONE >> "$OUT"
