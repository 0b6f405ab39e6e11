#!/bin/bash
# Battery 13: re-baseline bench.py on the window_aligned onehot default
# (battery 11: 13.44 ms/step f32, expect ~39 M edges/s, vs_baseline ~8.3).
set -u
cd /root/repo
while ! grep -q DONE results/screen_10m_onehot.log 2>/dev/null; do
  sleep 30
done
timeout 5400 python bench.py > results/bench_r2_aligned.json 2> results/bench_r2_aligned.log
echo "--- exit $?" >> results/bench_r2_aligned.log
echo DONE >> results/bench_r2_aligned.log
