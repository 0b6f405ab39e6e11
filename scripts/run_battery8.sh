#!/bin/bash
# Round-2 battery 8: WHERE does the honest model-forward time go?
# Hypothesis: gathers/scatters are pathologically slow on this backend
# (~60 ns/row) while matmuls run near peak (battery 7: 80 TFLOP/s).
# All fetch-synced. Waits for battery 7 to release the chip.
set -u
cd /root/repo
OUT=results/microbench_r2_battery8.jsonl
mkdir -p results
while ! grep -q DONE results/microbench_r2_battery7.jsonl.log 2>/dev/null; do
  sleep 30
done
: > "$OUT"
run() {
  echo "=== $* $(date +%H:%M:%S)" >> "$OUT.log"
  timeout 2400 python "$@" >> "$OUT" 2>> "$OUT.log"
  echo "--- exit $? $(date +%H:%M:%S)" >> "$OUT.log"
}
run scripts/tpu_physics_probe.py gather 454272 32
run scripts/tpu_physics_probe.py scatter 454272 32
run scripts/tpu_physics_probe.py gather 454272 128
run scripts/tpu_microbench.py gru-only 2048
run scripts/tpu_microbench.py seg-xla 2048
run scripts/tpu_microbench.py mpa-gather 2048
run scripts/tpu_microbench.py mpa-typed 2048
echo DONE >> "$OUT.log"
