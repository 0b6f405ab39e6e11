#!/bin/bash
# Round-2 battery 7: HONEST (fetch-synced) numbers after discovering that
# jax.block_until_ready returns before execution completes on this backend.
#  (1) physics probes: what the chip honestly sustains on a pure bf16/f32
#      matmul chain and an HBM stream — decides whether the model program
#      is inefficient or the relay's honest path is simply slow.
#  (2) second-executable re-test under fetch sync (matmul2).
#  (3) honest train-step numbers (the _time harness is now fetch-synced).
#  (4) full bench.py (driver contract) with honest sync.
# Waits for battery 6 to release the chip. Sequential — one TPU process.
set -u
cd /root/repo
OUT=results/microbench_r2_battery7.jsonl
mkdir -p results
while ! grep -q DONE results/microbench_r2_battery6.jsonl.log 2>/dev/null; do
  sleep 20
done
: > "$OUT"
run() {
  echo "=== $* $(date +%H:%M:%S)" >> "$OUT.log"
  timeout 2400 python "$@" >> "$OUT" 2>> "$OUT.log"
  echo "--- exit $? $(date +%H:%M:%S)" >> "$OUT.log"
}
run scripts/tpu_physics_probe.py matmul 4096 8 3
run scripts/tpu_physics_probe.py bandwidth 256 8
run scripts/tpu_physics_probe.py matmul-f32 4096 8 3
run scripts/tpu_physics_probe.py matmul2
run scripts/tpu_microbench.py step-gather 2048
run scripts/tpu_microbench.py fwd-only 2048
run scripts/tpu_microbench.py step-gather 512
echo "=== bench.py $(date +%H:%M:%S)" >> "$OUT.log"
timeout 7200 python bench.py >> "$OUT" 2>> "$OUT.log"
echo "--- exit $? $(date +%H:%M:%S)" >> "$OUT.log"
echo DONE >> "$OUT.log"
