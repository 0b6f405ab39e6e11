#!/bin/bash
# Round-2 battery 6: pin the production screening gap.
#  dispatch-fetch : vary g0 + fetch outputs to host per dispatch (the
#                   production structure). If ~3.4 s/dispatch, execution
#                   on this backend is only synchronized by host fetches
#                   and block_until_ready under-waits.
#  dispatch-ckpt  : same, but with the orbax checkpoint restored first
#                   (exactly production) — second-executable probe.
set -u
cd /root/repo
OUT=results/microbench_r2_battery6.jsonl
mkdir -p results
: > "$OUT"
run() {
  echo "=== $* $(date +%H:%M:%S)" >> "$OUT.log"
  timeout 2400 python "$@" >> "$OUT" 2>> "$OUT.log"
  echo "--- exit $? $(date +%H:%M:%S)" >> "$OUT.log"
}
run scripts/tpu_grid_microbench.py dispatch-fetch
run scripts/tpu_grid_microbench.py dispatch-ckpt
run scripts/tpu_grid_microbench.py pack-fetch
run scripts/tpu_grid_microbench.py fwd-fetch
run scripts/tpu_grid_microbench.py dispatch-fetch 2304 1024 8
echo DONE >> "$OUT.log"
