#!/usr/bin/env python
"""Per-phase fetch-synced decomposition of the production train step.

Round-3 verdict item 1: the 5.39 ms production step (batch 2048, onehot,
bf16, w64) reports 57x roofline headroom with no attribution. This probe
times phase-stubbed forwards (ionic_mpnn_tpu/benchmarks/phases.py) under
the SAME harness discipline as bench.py: scan over 8 DISTINCT packed
batches per dispatch, every device array a jit ARGUMENT (closed-over
arrays poison this backend — CLAUDE.md), fetch-synced via np.asarray of
a chained scalar.

Variants (cumulative phases — consecutive deltas attribute the time):

  scanmin    scan-8 with a near-empty body, ONE param leaf carried
  scanfixed  scan-8 perturbing EVERY param leaf (~60 tiny adds) — the
             delta vs scanmin prices per-op overhead for small ops
  embed      + atom-table gathers (both ions)
  msg1/msg4  + first K onehot message+aggregate ops (no GRU)
  gru4       + all gated updates (= encoders minus readout)
  enc        + readout pool + fp dense
  fwd        + mixing + VFT head + loss (exact train-step loss)
  fwdbwd     value_and_grad of fwd (no optimizer)
  full       the production train step via bench_packed_train_step
             (fwd+bwd+clip+Adam)

Usage: tpu_phase_probe.py [batch_size] [variant ...]   (default: all)
Prints one JSON line per variant, incrementally (background-friendly).
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from ionic_mpnn_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

ALL = ("scanmin", "scanfixed", "embed", "msg1", "msg4", "gru4", "enc",
       "fwd", "fwdbwd", "full",
       # value_and_grad of a PHASE-stubbed forward: consecutive deltas
       # attribute the BACKWARD per phase (round-4 follow-up)
       "bwd-embed", "bwd-msg4", "bwd-gru4", "bwd-enc")
INNER = 8


def fetch_time(fn, carry, xs, iters=20, warmup=3):
    last = None
    for _ in range(warmup):
        carry, last = fn(carry, xs)
    np.asarray(last)
    t0 = time.perf_counter()
    for _ in range(iters):
        carry, last = fn(carry, xs)
    np.asarray(last)
    return (time.perf_counter() - t0) / (iters * INNER)


def main():
    argv = sys.argv[1:]
    paired = "--paired" in argv
    argv = [a for a in argv if a != "--paired"]
    dim = 0
    if "--dim" in argv:
        i = argv.index("--dim")
        dim = int(argv[i + 1])
        del argv[i:i + 2]
    bs = int(argv[0]) if argv and argv[0].isdigit() else 2048
    variants = [a for a in argv if not a.isdigit()] or list(ALL)
    unknown = set(variants) - set(ALL)
    if unknown:
        raise SystemExit(f"unknown variants {sorted(unknown)}; choose from {ALL}")

    from ionic_mpnn_tpu.benchmarks import make_bench_dataset
    from ionic_mpnn_tpu.benchmarks.phases import phase_forward
    from ionic_mpnn_tpu.config import viscosity_config
    from ionic_mpnn_tpu.data import iter_batches, plan_capacities
    from ionic_mpnn_tpu.models import ViscosityModel

    window = 64
    records, vocab = make_bench_dataset(max(bs, 512))
    dim_kw = ({"atom_dim": dim, "fp_size": dim,
               "mixing_size": max(20, dim // 2)} if dim else {})
    cfg = viscosity_config(
        vocab.atom_vocab_size, vocab.bond_vocab_size,
        compute_dtype="bfloat16", message_impl="onehot", onehot_window=window,
        **dim_kw,
    )
    plan = plan_capacities(records, batch_size=bs,
                           edge_layout="window_aligned", window=window)
    if paired:
        # phase attribution over PAIRED device-packed batches (battery 41
        # follow-up: the paired step ran 7.4 vs 3.4 ms on host batches)
        from ionic_mpnn_tpu.training.device_epochs import (
            _device_batch_paired,
            build_device_dataset,
            build_paired_perm,
            choose_paired_plan,
        )

        ds = build_device_dataset(records, window, plan.target_key)
        pplan = choose_paired_plan(ds, bs)
        print(json.dumps({"paired_plan": repr(pplan)}), flush=True)
        # enough slots for INNER distinct full batches: concatenate
        # per-seed permutations of the record set
        order = np.concatenate([
            np.random.default_rng(s).permutation(ds.n) for s in range(INNER)
        ]).astype(np.int32)
        perm = build_paired_perm(ds, order, pplan)
        R = pplan.regions
        assert len(perm) >= INNER * 2 * R
        packb = jax.jit(lambda a, idx: _device_batch_paired(
            ds.with_arrays(a), idx, pplan))
        stacked = [
            jax.tree.map(np.asarray,
                         packb(ds.arrays(),
                               jnp.asarray(perm[k * 2 * R:(k + 1) * 2 * R])))
            for k in range(INNER)
        ]
    else:
        stacked = [
            next(iter_batches(records[:bs], plan, shuffle=True, seed=s))
            for s in range(INNER)
        ]
    edges = float(np.mean([
        np.asarray(b.cation.edge_mask).sum() + np.asarray(b.anion.edge_mask).sum()
        for b in stacked
    ])) * cfg.num_steps  # message-edges per full step, bench.py's unit
    batches = jax.tree.map(lambda *xs: jnp.asarray(np.stack(xs)), *stacked)

    model = ViscosityModel(cfg)
    params = model.init(jax.random.PRNGKey(0), stacked[0])["params"]
    print(json.dumps({
        "bs": bs, "message_edges_per_step": edges,
        "node_caps": [stacked[0].cation.node_capacity, stacked[0].anion.node_capacity],
        "edge_caps": [stacked[0].cation.edge_capacity, stacked[0].anion.edge_capacity],
        "n_param_leaves": len(jax.tree.leaves(params)),
    }), flush=True)

    def perturb_all(p, s):
        return jax.tree.map(lambda x: x + (1e-12 * s).astype(x.dtype), p)

    results = {}
    for which in variants:
        if which == "full":
            from ionic_mpnn_tpu.benchmarks import bench_packed_train_step

            r = bench_packed_train_step(
                records, vocab, batch_size=bs, num_steps=cfg.num_steps,
                iters=20, warmup=3, compute_dtype="bfloat16",
                message_impl="onehot", inner=INNER, window=window,
            )
            dt = 1.0 / r.steps_per_s
        elif which == "scanmin":
            def multi(leaf, xs):
                def body(l, b):
                    s = jnp.sum(b.y)
                    return l + 1e-12 * s, s
                leaf, ss = jax.lax.scan(body, leaf, xs)
                return leaf, ss[-1]

            dt = fetch_time(jax.jit(multi), params["trunk"]["atom_embed"], batches)
        elif which == "scanfixed":
            def multi(p, xs):
                def body(pp, b):
                    s = jnp.sum(b.y)
                    return perturb_all(pp, s), s
                p, ss = jax.lax.scan(body, p, xs)
                return p, ss[-1]

            dt = fetch_time(jax.jit(multi), params, batches)
        elif which == "fwdbwd" or which.startswith("bwd-"):
            upto = "fwd" if which == "fwdbwd" else which[4:]
            grad_fn = jax.value_and_grad(
                lambda p, b, _u=upto: phase_forward(p, cfg, b, _u)
            )

            def multi(p, xs):
                def body(pp, b):
                    v, g = grad_fn(pp, b)
                    return jax.tree.map(lambda x, gx: x + 1e-6 * gx.astype(x.dtype),
                                        pp, g), v
                p, vs = jax.lax.scan(body, p, xs)
                return p, vs[-1]

            dt = fetch_time(jax.jit(multi), params, batches)
        else:
            def multi(p, xs, _which=which):
                def body(pp, b):
                    v = phase_forward(pp, cfg, b, _which)
                    return perturb_all(pp, v), v
                p, vs = jax.lax.scan(body, p, xs)
                return p, vs[-1]

            dt = fetch_time(jax.jit(multi), params, batches)
        results[which] = dt
        print(json.dumps({"which": which, "bs": bs, "ms_per_step": dt * 1e3,
                          "edges_per_s": edges / dt}), flush=True)

    print(json.dumps({"bs": bs, "summary_ms": {k: round(v * 1e3, 4) for k, v in results.items()}}), flush=True)


if __name__ == "__main__":
    main()
