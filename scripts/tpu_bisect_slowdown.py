#!/usr/bin/env python
"""Bisect the second-config-in-process ~200x slowdown (CLAUDE.md artifact).

Each mode runs a sequence of benchmark phases IN ONE PROCESS and prints
steps/s per phase, discriminating the trigger:

  two-configs : A1(bs=256) -> A2(bs=256, fresh jit of identical HLO)
                -> B(bs=512, different HLO).
                A2 slow  => per-executable-object (program load/switch);
                A2 fast + B slow => per-distinct-HLO (program switch);
                both fast => artifact gone (cache? plugin fix?).
  no-donate   : same sequence without buffer donation.
                B fast here => donation (memory churn) is the trigger.
  clear-caches: A1 -> jax.clear_caches() -> A2.
                A2 slow => in-memory jit cache state is NOT the trigger.
  b-first     : B(512) -> A(256). order control.

Run modes sequentially (one TPU process at a time):
  for m in two-configs no-donate clear-caches b-first; do
      python scripts/tpu_bisect_slowdown.py $m; done
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from ionic_mpnn_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from ionic_mpnn_tpu.benchmarks import bench_packed_train_step, make_bench_dataset


def main():
    mode = sys.argv[1]
    records, vocab = make_bench_dataset(512)

    def run(tag, bs, donate=True):
        t0 = time.perf_counter()
        r = bench_packed_train_step(
            records, vocab, batch_size=bs, iters=20, warmup=3, donate=donate
        )
        print(
            f"[{mode}] {tag}: bs={bs} {r.steps_per_s:.1f} steps/s "
            f"({r.edges_per_s/1e6:.1f} M edges/s, phase wall {time.perf_counter()-t0:.1f}s)",
            flush=True,
        )

    if mode == "two-configs":
        run("A1", 256)
        run("A2", 256)
        run("B", 512)
    elif mode == "no-donate":
        run("A1", 256, donate=False)
        run("A2", 256, donate=False)
        run("B", 512, donate=False)
    elif mode == "clear-caches":
        import jax

        run("A1", 256)
        jax.clear_caches()
        run("A2-after-clear", 256)
    elif mode == "b-first":
        run("B", 512)
        run("A", 256)
    else:
        raise SystemExit(f"unknown mode {mode}")


if __name__ == "__main__":
    main()
