#!/bin/bash
# Round-2 battery 5:
#  (1) dispatch-vary: is the 0.1 ms grid-dispatch microbench an
#      identical-call relay cache artifact? (production sweeps g0 and
#      measures ~3.4 s/dispatch — physically 0.1 ms is impossible at
#      ~490 GFLOP/dispatch)
#  (2) op-level + step-level numbers for the new fused-message kernel
#      and the megakernel (first hardware runs)
#  (3) more step-gather / step-fusedgru samples for a median A/B
# Sequential — never two processes on the chip (CLAUDE.md).
set -u
cd /root/repo
OUT=results/microbench_r2_battery5.jsonl
mkdir -p results
: > "$OUT"
run() {
  echo "=== $* $(date +%H:%M:%S)" >> "$OUT.log"
  timeout 2400 python "$@" >> "$OUT" 2>> "$OUT.log"
  echo "--- exit $? $(date +%H:%M:%S)" >> "$OUT.log"
}
run scripts/tpu_grid_microbench.py dispatch-vary
run scripts/tpu_microbench.py mpa-fusedmsg 2048
run scripts/tpu_microbench.py step-megakernel 2048
run scripts/tpu_microbench.py step-fusedgru 2048
run scripts/tpu_microbench.py step-gather 2048
run scripts/tpu_microbench.py step-fusedgru 2048
run scripts/tpu_microbench.py step-gather 2048
echo DONE >> "$OUT.log"
