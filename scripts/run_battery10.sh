#!/bin/bash
# Round-2 battery 10 (fetch-synced): re-evaluate the Pallas kernel family
# honestly (every prior Pallas conclusion was block-sync fiction) and chase
# the onehot step's remaining headroom (fused GRU, bf16, batch 4096).
# Baselines to beat (battery 9): step-onehot 22.7 ms/step @ 2048,
# step-gather 197 ms; op-level mpa-onehot 2356 us; seg-xla 1384 us.
set -u
cd /root/repo
OUT=results/microbench_r2_battery10.jsonl
mkdir -p results
: > "$OUT"
run() {
  echo "=== $* $(date +%H:%M:%S)" >> "$OUT.log"
  timeout 2400 python "$@" >> "$OUT" 2>> "$OUT.log"
  echo "--- exit $? $(date +%H:%M:%S)" >> "$OUT.log"
}
# Pallas family, op level
run scripts/tpu_microbench.py seg-pallas 2048
run scripts/tpu_microbench.py mpa-fusedmsg 2048
# Pallas family, step level
run scripts/tpu_microbench.py step-pallas 2048
run scripts/tpu_microbench.py step-fusedmsg 2048
run scripts/tpu_microbench.py step-megakernel 2048
# onehot headroom
run scripts/tpu_microbench.py step-onehot+fusedgru 2048
run scripts/tpu_microbench.py step-onehot+bf16 2048
run scripts/tpu_microbench.py step-onehot 4096
# fetch-synced step-level re-eval of the other XLA impls
run scripts/tpu_microbench.py step-typed 2048
run scripts/tpu_microbench.py step-symmetric 2048
echo DONE >> "$OUT.log"
