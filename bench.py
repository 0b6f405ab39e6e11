#!/usr/bin/env python
"""Benchmark entry point: prints ONE JSON line with the headline metric.

Metric: message-edges/s on the flagship viscosity MPNN's full training
step (fwd+bwd+Adam) with packed COO batching on one chip.
``vs_baseline`` = speedup over the reference design (dense padded
batching + per-edge tensordot) with identical weights on the same chip.

The baseline is measured in a fresh subprocess: process isolation keeps
the packed and dense measurements independent (no shared live buffers or
donated-state interactions), and the persistent compile cache makes the
extra process cheap.

All timing is FETCH-synced (np.asarray of an output that depends on the
whole computation chain): jax.block_until_ready returns before execution
completes on the axon relay backend (measured: 0.4 ms block-synced vs
2146 ms fetch-synced for one identical dispatch), so block-based timing
overstates throughput by orders of magnitude here.
"""

import argparse
import json
import subprocess
import sys


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch-size", type=int, default=2048)
    parser.add_argument("--num-steps", type=int, default=4)
    parser.add_argument("--iters", type=int, default=30)
    parser.add_argument("--inner", type=int, default=8,
                        help="train steps folded into one jit call (lax.scan)")
    parser.add_argument("--no-baseline", action="store_true")
    parser.add_argument("--dtype", default="auto",
                        choices=["auto", "float32", "bfloat16"],
                        help="auto = bfloat16 on accelerators (quality-gated "
                             "at full model dims, RESULTS batteries 15/28), "
                             "float32 on CPU / for parity runs")
    parser.add_argument("--window", type=int, default=0,
                        help="onehot node window (0 = auto: 64 for bf16)")
    parser.add_argument("--balance", action="store_true",
                        help="LPT window balancing (opt-in: measured net loss\n                             on this backend, RESULTS battery 27)")
    parser.add_argument("--message-impl", default="auto",
                        choices=["auto", "gather", "typed", "symmetric", "onehot"],
                        help="auto = onehot on accelerators (battery-9 A/B: "
                             "8.7x over gather on the v5e relay), gather on CPU")
    parser.add_argument("--model", default="viscosity", choices=["viscosity", "mp"],
                        help="mp = melting-point config (bond_dim=1024)")
    parser.add_argument("--harness", default="auto",
                        choices=["auto", "paired", "host"],
                        help="paired = the PRODUCTION fit() step (on-device "
                             "pitch-slot paired packing + fwd/bwd/Adam, "
                             "battery 41 — 2.71 ms at batch 2048 vs 3.4 host);"
                             " host = the round-1..4 host greedy-packed "
                             "harness. auto = paired on accelerators for the "
                             "viscosity/onehot config, host otherwise")
    parser.add_argument("--dense-only", action="store_true",
                        help="internal: measure only the dense reference baseline")
    parser.add_argument("--packed-only", action="store_true",
                        help="internal: one first-in-process packed measurement")
    parser.add_argument("--repeats", type=int, default=3,
                        help="median-of-N fresh-process repeats (robustness "
                             "against transient relay/host noise; fetch-synced "
                             "samples typically agree to 4 digits)")
    args = parser.parse_args()

    from ionic_mpnn_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from ionic_mpnn_tpu.config import (
        resolve_compute_dtype,
        resolve_message_impl,
        resolve_onehot_window,
    )

    args.message_impl = resolve_message_impl(args.message_impl)
    args.dtype = resolve_compute_dtype(args.dtype)
    args.window = resolve_onehot_window(args.dtype, args.window)

    from ionic_mpnn_tpu.benchmarks import (
        bench_dense_reference,
        bench_packed_train_step,
        make_bench_dataset,
    )

    if args.dense_only:
        records, vocab = make_bench_dataset(max(args.batch_size, 512))
        visc = args.model == "viscosity"
        dense = bench_dense_reference(
            records, vocab,
            batch_size=min(args.batch_size, 256 if visc else 32),
            num_steps=args.num_steps,
            iters=10 if visc else 3, warmup=3 if visc else 1,
            model_kind=args.model,
        )
        print(json.dumps({"baseline_edges_per_s": round(dense.edges_per_s, 1)}))
        return 0

    import jax as _jax

    on_cpu = _jax.devices()[0].platform == "cpu"
    if args.harness == "auto":
        args.harness = ("paired" if not on_cpu and args.model == "viscosity"
                        and args.message_impl == "onehot"
                        and not args.balance else "host")
    if args.packed_only or on_cpu or args.repeats <= 1:
        if args.harness == "paired":
            from ionic_mpnn_tpu.benchmarks import bench_paired_epoch_step

            records, vocab = make_bench_dataset(
                max(args.inner * args.batch_size, 512))
            packed = bench_paired_epoch_step(
                records, vocab, batch_size=args.batch_size,
                num_steps=args.num_steps, iters=args.iters,
                compute_dtype=args.dtype, inner=args.inner,
                window=args.window,
            )
        else:
            records, vocab = make_bench_dataset(max(args.batch_size, 512))
            packed = bench_packed_train_step(
                records, vocab, batch_size=args.batch_size,
                num_steps=args.num_steps,
                iters=args.iters, compute_dtype=args.dtype,
                message_impl=args.message_impl, inner=args.inner,
                model_kind=args.model,
                window=args.window, balanced=args.balance,
            )
        if args.packed_only:
            print(json.dumps({
                "edges_per_s": packed.edges_per_s,
                "steps_per_s": packed.steps_per_s,
                "molecules_per_s": packed.molecules_per_s,
                "flops_per_step": packed.flops_per_step,
                "hbm_bytes_per_step": packed.hbm_bytes_per_step,
            }))
            return 0
    else:
        # median-of-N fresh-process repeats: robustness against transient
        # relay/host noise; the persistent compile cache makes repeats
        # cheap (ionic_mpnn_tpu/utils/cache.py).
        samples = []
        for _ in range(args.repeats):
            proc = subprocess.run(
                [sys.executable, __file__, "--packed-only",
                 "--batch-size", str(args.batch_size),
                 "--num-steps", str(args.num_steps),
                 "--iters", str(args.iters), "--inner", str(args.inner),
                 "--dtype", args.dtype, "--message-impl", args.message_impl,
                 "--model", args.model, "--window", str(args.window),
                 "--harness", args.harness]
                + (["--balance"] if args.balance else []),
                capture_output=True, text=True, timeout=2400,
            )
            samples.append(json.loads(proc.stdout.strip().splitlines()[-1]))
        samples.sort(key=lambda s: s["edges_per_s"])
        med = samples[len(samples) // 2]

        class _P:  # median sample in BenchResult shape
            edges_per_s = med["edges_per_s"]
            steps_per_s = med["steps_per_s"]
            molecules_per_s = med["molecules_per_s"]
            flops_per_step = med["flops_per_step"]
            hbm_bytes_per_step = med["hbm_bytes_per_step"]

        packed = _P()
    result = {
        "metric": "message_edges_per_s_fwd_bwd",
        "value": round(packed.edges_per_s, 1),
        "unit": "edges/s",
        "steps_per_s": round(packed.steps_per_s, 3),
        "molecules_per_s": round(packed.molecules_per_s, 1),
        "batch_size": args.batch_size,
        "num_steps": args.num_steps,
        "model": args.model,
        "harness": args.harness,
        "message_impl": args.message_impl,
        "compute_dtype": args.dtype,
        "onehot_window": args.window,
        "balanced": args.balance,
        "vs_baseline": 1.0,
    }
    if not (args.packed_only or on_cpu or args.repeats <= 1):
        result["samples_edges_per_s"] = [round(s["edges_per_s"], 1) for s in samples]

    # Absolute efficiency vs the chip roofline (analytic FLOP/byte model,
    # see ionic_mpnn_tpu/benchmarks/roofline.py) — only meaningful on TPU.
    import jax

    if jax.devices()[0].platform != "cpu":
        from ionic_mpnn_tpu.benchmarks.roofline import roofline_summary

        roof = roofline_summary(
            {"flops": packed.flops_per_step, "hbm_bytes": packed.hbm_bytes_per_step},
            measured_step_seconds=1.0 / packed.steps_per_s,
        )
        result["mfu"] = round(roof["mfu"], 5)
        result["hbm_bound_fraction"] = round(roof["hbm_bound_fraction"], 4)
        result["roofline_headroom"] = round(roof["roofline_headroom"], 2)
        if roof["mfu"] > 1.0:
            # Physics check: sustained FLOP/s above the chip's matmul peak
            # is impossible — on this relay-attached backend the step-rate
            # measurement is optimistic at high dispatch rates (completion
            # acks can lead actual execution). Flag rather than hide.
            result["mfu_note"] = (
                "exceeds chip peak — relay timing optimistic; treat "
                "edges/s as an upper bound this run"
            )
        result["model_flops_per_step"] = packed.flops_per_step
        result["model_hbm_bytes_per_step"] = packed.hbm_bytes_per_step

    if not args.no_baseline:
        try:
            proc = subprocess.run(
                [sys.executable, __file__, "--dense-only",
                 "--batch-size", str(args.batch_size),
                 "--num-steps", str(args.num_steps),
                 "--model", args.model],
                capture_output=True, text=True, timeout=1500,
            )
            line = proc.stdout.strip().splitlines()[-1]
            baseline = json.loads(line)["baseline_edges_per_s"]
            result["baseline_edges_per_s"] = baseline
            result["vs_baseline"] = round(packed.edges_per_s / baseline, 3)
        except Exception as e:  # baseline failure shouldn't kill the headline
            result["baseline_error"] = str(e)[:200]

    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
