#!/bin/bash
# Retry bench.py until the axon relay comes back (transient UNAVAILABLE).
cd /root/repo
for i in $(seq 1 40); do
  timeout 4000 python bench.py > results/bench_r2_vloop.json 2> results/bench_r2_vloop.err
  if [ -s results/bench_r2_vloop.json ]; then
    echo DONE >> results/bench_r2_vloop.err
    exit 0
  fi
  sleep 300
done
