#!/bin/bash
# Round-2 battery 4:
#  (1) coexistence bisect: does a Pallas custom-call sharing one program
#      with an ordinary XLA matmul trigger the axon slow path?
#  (2) ARG-STYLE grid-screening device split (dispatch / pack)
#  (3) train a fresh 4-step viscosity checkpoint (the old artifacts were
#      wiped with the gitignored data/ and results/ dirs)
#  (4) re-run the 10M-candidate devpack sweep post-closure-fix
# Sequential — never two processes on the chip (CLAUDE.md).
set -u
cd /root/repo
OUT=results/microbench_r2_battery4.jsonl
mkdir -p results
: > "$OUT"
run() {
  echo "=== $* $(date +%H:%M:%S)" >> "$OUT.log"
  timeout 3600 python "$@" >> "$OUT" 2>> "$OUT.log"
  echo "--- exit $? $(date +%H:%M:%S)" >> "$OUT.log"
}
run scripts/tpu_microbench.py seg-pallas-mix 2048
run scripts/tpu_microbench.py seg-xla-mix 2048
run scripts/tpu_grid_microbench.py dispatch
run scripts/tpu_grid_microbench.py pack
run scripts/train_viscosity.py --epochs 400 --patience 40 \
    --out-dir results/viscosity
run scripts/screen.py --grid-cations 2688 --target-candidates 10000000 \
    --batch-size 4096 --top-k 50 --progress-every 1000000 \
    --out results/screen_10m_argstyle.csv
echo DONE >> "$OUT.log"
