#!/bin/bash
# Battery 25 (round 3): step constant factors + aligned brute screening.
# All fetch-synced; one config per process; compile cache warm after first.
set -u
cd /root/repo
OUT=results/microbench_r3_battery25.jsonl
: > "$OUT"
run() {
  echo "=== $* $(date +%H:%M:%S)" >> "$OUT.log"
  timeout 2400 python "$@" >> "$OUT" 2>> "$OUT.log"
  echo "--- exit $? $(date +%H:%M:%S)" >> "$OUT.log"
}
# step A/Bs at batch 2048 (baseline reconfirm + candidates)
run scripts/tpu_microbench.py step-onehot+aligned+vloop 2048
run scripts/tpu_microbench.py step-onehot+aligned+vloop+bf16 2048
run scripts/tpu_microbench.py step-onehot+aligned+vloop+fusedgru 2048
run scripts/tpu_microbench.py step-onehot+aligned+vloop+w64 2048
run scripts/tpu_microbench.py step-onehot+aligned+vloop+bf16+w64 2048
run scripts/tpu_microbench.py step-onehot+aligned+vloop+bf16+fusedgru 2048
# brute-sweep layout A/B (2M pairs, device pack)
run scripts/tpu_screen_aligned_ab.py window 2000000
run scripts/tpu_screen_aligned_ab.py aligned 2000000
echo DONE >> "$OUT.log"
