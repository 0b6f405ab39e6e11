#!/usr/bin/env python
"""Capture a profiler trace of the benchmark train step and print the
top device ops by total self-time — the evidence base for kernel work.

Usage: python scripts/tpu_trace_step.py [batch_size] [inner] [out_dir]
"""

import glob
import gzip
import json
import sys
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from ionic_mpnn_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax

from ionic_mpnn_tpu.benchmarks import bench_packed_train_step, make_bench_dataset


def main():
    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    inner = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    out = sys.argv[3] if len(sys.argv) > 3 else "/tmp/mpnn_trace"

    records, vocab = make_bench_dataset(max(bs, 512))

    # warm (compile) OUTSIDE the trace
    r = bench_packed_train_step(records, vocab, batch_size=bs, iters=3,
                                warmup=3, inner=inner)
    print(f"[trace] warm: {r.steps_per_s:.0f} steps/s "
          f"{r.edges_per_s/1e9:.2f} B edges/s", flush=True)

    jax.profiler.start_trace(out)
    r = bench_packed_train_step(records, vocab, batch_size=bs, iters=3,
                                warmup=0, inner=inner)
    jax.profiler.stop_trace()
    print(f"[trace] traced: {r.steps_per_s:.0f} steps/s", flush=True)

    files = glob.glob(f"{out}/**/*.trace.json.gz", recursive=True)
    if not files:
        print("[trace] no trace.json.gz found", flush=True)
        return
    with gzip.open(sorted(files)[-1], "rt") as f:
        trace = json.load(f)

    # device-track events: group by op name, sum wall duration
    pid_names = {}
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pid_names[ev["pid"]] = ev.get("args", {}).get("name", "")
    totals = defaultdict(float)
    counts = defaultdict(int)
    device_total = 0.0
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") != "X":
            continue
        pname = pid_names.get(ev.get("pid"), "")
        if "TPU" not in pname and "/device" not in pname.lower():
            continue
        name = ev.get("name", "?")
        dur = float(ev.get("dur", 0.0))
        totals[name] += dur
        counts[name] += 1
        device_total += dur
    print(f"[trace] device events total {device_total/1e3:.2f} ms "
          f"across {sum(counts.values())} events")
    for name, dur in sorted(totals.items(), key=lambda kv: -kv[1])[:30]:
        print(f"  {dur/1e3:9.3f} ms  x{counts[name]:<5d} {name[:110]}")


if __name__ == "__main__":
    main()
