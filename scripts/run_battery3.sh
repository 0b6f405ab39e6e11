#!/bin/bash
# Round-2 battery 3: (a) bisect the step-pallas 225 ms pathology
# (seg-pallas alone is FAST in arg style — where does the full step lose
# it?), (b) measure the ARG-STYLE grid-screening dispatch (the production
# path post-closure-fix; the old closure-style dispatch measured 3.2 s).
# Sequential — never two processes on the chip (CLAUDE.md).
set -u
cd /root/repo
OUT=results/microbench_r2_battery3.jsonl
mkdir -p results
: > "$OUT"
run() {
  echo "=== $* $(date +%H:%M:%S)" >> "$OUT.log"
  timeout 1800 python "$@" >> "$OUT" 2>> "$OUT.log"
  echo "--- exit $? $(date +%H:%M:%S)" >> "$OUT.log"
}
run scripts/tpu_microbench.py mpa-pallas 2048
run scripts/tpu_microbench.py fwd-only 2048
run scripts/tpu_microbench.py fwd-only-pallas 2048
run scripts/tpu_grid_microbench.py dispatch
run scripts/tpu_grid_microbench.py pack
echo DONE >> "$OUT.log"
