#!/usr/bin/env python
"""Benchmark entry point: prints ONE JSON line with the headline metric.

Metric: message-edges/s on the flagship viscosity MPNN's full training
step (fwd+bwd+Adam) with packed COO batching on one chip.
``vs_baseline`` = speedup over the reference design (dense padded
batching + per-edge tensordot) with identical weights on the same chip.
"""

import argparse
import json
import sys


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch-size", type=int, default=2048)
    parser.add_argument("--num-steps", type=int, default=4)
    parser.add_argument("--iters", type=int, default=30)
    parser.add_argument("--inner", type=int, default=1,
                        help="train steps folded into one jit call (lax.scan)")
    parser.add_argument("--no-baseline", action="store_true")
    parser.add_argument("--dtype", default="float32", choices=["float32", "bfloat16"])
    parser.add_argument("--message-impl", default="gather", choices=["gather", "typed"])
    args = parser.parse_args()

    from ionic_mpnn_tpu.benchmarks import run_benchmark

    result = run_benchmark(
        batch_size=args.batch_size,
        num_steps=args.num_steps,
        iters=args.iters,
        with_baseline=not args.no_baseline,
        compute_dtype=args.dtype,
        message_impl=args.message_impl,
        inner=args.inner,
    )
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
