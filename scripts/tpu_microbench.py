#!/usr/bin/env python
"""Single-config component microbenchmarks for the train step.

Each invocation measures ONE config in a fresh process (clean A/B
isolation — no shared buffers or allocator state between arms; the
round-2 "second-executable slowdown" that originally motivated this was
retracted as block-sync fiction, RESULTS.md battery 7, but per-process
isolation remains the cleanest protocol); the persistent compile cache
makes repeat invocations cheap. Shapes mirror `bench.py` at the given
batch.

  step-gather | step-symmetric | step-typed | step-pallas :
                 full train step, scan-8 (step-pallas = gather messages +
                 the Pallas sorted-scatter aggregate)
  fwd-only     : forward+loss only, scan-8
  mpa-gather | mpa-symmetric | mpa-typed    : message+aggregate fwd+bwd,
                 scan of 64 ops/dispatch (= 2 ions x 4 MP steps x 8)
  gru-only     : gated update fwd+bwd, scan of 64
  seg-xla | seg-pallas : the aggregate alone (sorted segment-sum fwd+bwd),
                 scan of 64
  cost         : XLA cost_analysis of the full step (no timing)

All harnesses pass every device array as a jit ARGUMENT (threaded through
the scan carry or the call signature) — closed-over arrays embed as HLO
constants and run ~1000x slower on this backend (CLAUDE.md), which
poisoned the round-2 closure-style op benches this file replaces.
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


def _bench_shapes(bs):
    from ionic_mpnn_tpu.benchmarks import make_bench_dataset
    from ionic_mpnn_tpu.data import iter_batches, plan_capacities

    records, vocab = make_bench_dataset(max(bs, 512))
    plan = plan_capacities(records, batch_size=bs)
    batch = next(iter_batches(records[:bs], plan))
    return records, vocab, plan, batch


def _time(fn, state, arg, iters=30, warmup=5):
    # Fetch-synced: block_until_ready returns BEFORE execution completes on
    # the axon relay (battery 6: 0.4 ms block-synced vs 2146 ms fetch-synced
    # for the same dispatch). `state` threads through every call, so
    # fetching the final (state, last) leaves forces the whole chain.
    last = None
    for _ in range(warmup):
        state, last = fn(state, arg)
    jax.tree.map(np.asarray, (state, last))
    t0 = time.perf_counter()
    for _ in range(iters):
        state, last = fn(state, arg)
    jax.tree.map(np.asarray, (state, last))
    return (time.perf_counter() - t0) / iters


def main():
    which = sys.argv[1]
    bs = int(sys.argv[2]) if len(sys.argv) > 2 else 2048

    if which.startswith("step-") or which.startswith("fwd-only") or which == "cost":
        from ionic_mpnn_tpu.benchmarks import bench_packed_train_step, make_bench_dataset

        records, vocab = make_bench_dataset(max(bs, 512))
        if which.startswith("fwd-only"):
            import dataclasses

            from ionic_mpnn_tpu.config import TrainConfig, viscosity_config
            from ionic_mpnn_tpu.data import iter_batches, plan_capacities
            from ionic_mpnn_tpu.models import ViscosityModel

            plan = plan_capacities(records, batch_size=bs)
            batch = next(iter_batches(records[:bs], plan))
            batch = jax.tree.map(jnp.asarray, batch)
            cfg = viscosity_config(vocab.atom_vocab_size, vocab.bond_vocab_size)
            if which == "fwd-only-pallas":
                cfg = dataclasses.replace(cfg, scatter_impl="pallas")
            model = ViscosityModel(cfg)
            variables = model.init(jax.random.PRNGKey(0), batch)

            def multi(params, b):
                # perturb params per iteration so XLA can't hoist the
                # loop-invariant forward out of the scan
                def body(p, _):
                    out = model.apply({"params": p}, b)["pred"]
                    s = jnp.sum(out)
                    p = jax.tree.map(lambda x: x + 1e-12 * s, p)
                    return p, s

                p2, ss = jax.lax.scan(body, params, None, length=8)
                return p2, ss[-1]

            fn = jax.jit(multi)
            dt = _time(fn, variables["params"], batch) / 8
            print(json.dumps({"which": which, "bs": bs, "us_per_step": dt * 1e6}))
            return
        if which == "cost":
            from ionic_mpnn_tpu.config import TrainConfig, viscosity_config
            from ionic_mpnn_tpu.data import iter_batches, plan_capacities
            from ionic_mpnn_tpu.models import ViscosityModel
            from ionic_mpnn_tpu.training.loop import TrainState, make_train_step
            from ionic_mpnn_tpu.training.optim import make_optimizer

            plan = plan_capacities(records, batch_size=bs)
            batch = next(iter_batches(records[:bs], plan))
            batch = jax.tree.map(jnp.asarray, batch)
            cfg = viscosity_config(vocab.atom_vocab_size, vocab.bond_vocab_size)
            tcfg = TrainConfig()
            model = ViscosityModel(cfg)
            variables = model.init(jax.random.PRNGKey(0), batch)
            optimizer = make_optimizer(tcfg.learning_rate, tcfg.clipnorm)
            state = TrainState(step=jnp.int32(0), params=variables["params"],
                               batch_stats={}, opt_state=optimizer.init(variables["params"]),
                               rng=jax.random.PRNGKey(0))
            step = make_train_step(model, cfg, tcfg, optimizer)
            ca = step.lower(state, batch).compile().cost_analysis()
            keep = {k: v for k, v in ca.items()
                    if k in ("flops", "bytes accessed", "transcendentals",
                             "optimal_seconds", "bytes accessed output",
                             "utilization operand 0 {}")}
            print(json.dumps({"which": which, "bs": bs, "cost": keep}))
            return
        # step-IMPL[+OPT...] — e.g. step-onehot+fusedgru+bf16
        spec = which.split("-", 1)[1]
        parts = spec.split("+")
        impl = parts[0]
        gru = "reference"
        scatter = "xla"
        dtype = "float32"
        if impl == "fusedgru":
            impl, gru = "gather", "fused"
        if impl == "pallas":
            impl, scatter = "gather", "pallas"
        if impl == "fusedmsg":
            impl = "pallas_fused"
        if impl == "megakernel":
            impl = "pallas_step"
        layout = ""
        onehot_select = "lanes"
        window = 0
        unroll = 1
        tight_tile = False
        tile_override = 0
        balanced = False
        remat = False
        for opt in parts[1:]:
            if opt == "remat":
                remat = True
            elif opt == "vloop":
                onehot_select = "vloop"
            elif opt == "fusedgru":
                gru = "fused"
            elif opt == "bf16":
                dtype = "bfloat16"
            elif opt == "pallas":
                scatter = "pallas"
            elif opt == "aligned":
                layout = "window_aligned"
            elif opt == "tighttile":
                tight_tile = True
            elif opt == "balanced":
                balanced = True
            elif opt.startswith("tile") and opt[4:].isdigit():
                tile_override = int(opt[4:])  # e.g. tile384 (safe: only raise it)
            elif opt.startswith("unroll") and opt[6:].isdigit():
                unroll = int(opt[6:])  # scan unroll, e.g. unroll2
            elif opt.startswith("w") and opt[1:].isdigit():
                window = int(opt[1:])  # onehot node window, e.g. w64
            else:
                raise SystemExit(f"unknown step option {opt}")
        r = bench_packed_train_step(records, vocab, batch_size=bs, iters=30,
                                    warmup=5, inner=8, message_impl=impl,
                                    gru_impl=gru, scatter_impl=scatter,
                                    compute_dtype=dtype, edge_layout=layout,
                                    onehot_select=onehot_select, window=window,
                                    unroll=unroll, tight_tile=tight_tile,
                                    tile_override=tile_override,
                                    balanced=balanced, remat=remat)
        print(json.dumps({
            "which": which, "bs": bs,
            "us_per_step": 1e6 / r.steps_per_s,
            "edges_per_s": r.edges_per_s,
        }))
        return

    # op-level microbenches on bench-plan shapes
    records, vocab, plan, batch = _bench_shapes(bs)
    g = batch.cation
    D, F, V = 32, 8, vocab.bond_vocab_size + 1
    rng = np.random.default_rng(0)
    h = jnp.array(rng.normal(size=(plan.node_cap, D)).astype(np.float32))
    table = jnp.array(rng.normal(size=(V, F)).astype(np.float32))
    W = jnp.array((rng.normal(size=(F, D, D)) * 0.2).astype(np.float32))
    cot = jnp.array(rng.normal(size=h.shape).astype(np.float32))
    bond = jnp.array(g.bond_ids)
    src = jnp.array(g.src)
    dst = jnp.array(g.dst)
    mask = jnp.array(g.edge_mask)
    n_real_edges = int(np.asarray(g.edge_mask).sum())

    if which.startswith("mpa-"):
        from ionic_mpnn_tpu.ops import (
            bond_type_matrices,
            message_pass_aggregate,
            message_pass_aggregate_symmetric,
            message_pass_aggregate_typed,
        )

        impl = which.split("-", 1)[1]
        halo = True
        select = "lanes"
        if impl == "onehotalignedvloop":
            impl, halo, select = "onehot", False, "vloop"
        if impl == "onehotaligned":
            impl, halo = "onehot", False
        if impl == "onehot":
            # re-pack on the window-tiled layout the op requires
            from ionic_mpnn_tpu.data.loader import plan_capacities as _pc
            from ionic_mpnn_tpu.data import iter_batches as _ib

            plan_w = _pc(records, batch_size=bs,
                         edge_layout="window" if halo else "window_aligned")
            g = next(_ib(records[:bs], plan_w)).cation
            h = jnp.array(rng.normal(size=(plan_w.node_cap, D)).astype(np.float32))
            cot = jnp.array(rng.normal(size=h.shape).astype(np.float32))
            bond = jnp.array(g.bond_ids)
            src = jnp.array(g.src)
            dst = jnp.array(g.dst)
            mask = jnp.array(g.edge_mask)
            n_real_edges = int(np.asarray(g.edge_mask).sum())

        def one(h_, W_, table_, bond_, src_, dst_, mask_, cot_):
            m_table = bond_type_matrices(table_, W_)
            if impl == "onehot":
                from ionic_mpnn_tpu.ops.message import message_pass_aggregate_onehot

                out = message_pass_aggregate_onehot(
                    h_, bond_, src_, dst_, m_table, mask_, halo=halo,
                    select=select)
            elif impl == "typed":
                out = message_pass_aggregate_typed(h_, bond_, src_, dst_, m_table, mask_)
            elif impl == "symmetric":
                out = message_pass_aggregate_symmetric(h_, bond_, src_, dst_, m_table, mask_)
            elif impl == "pallas":
                out = message_pass_aggregate(h_, bond_, src_, dst_, m_table, mask_,
                                             scatter="pallas")
            elif impl == "fusedmsg":
                from ionic_mpnn_tpu.ops.pallas.fused_message import (
                    fused_message_aggregate, message_table_to_lanes)

                out = fused_message_aggregate(
                    h_, message_table_to_lanes(m_table), bond_, src_, dst_,
                    mask_, h_.shape[0])
            else:
                out = message_pass_aggregate(h_, bond_, src_, dst_, m_table, mask_)
            return jnp.sum(out * cot_)

        grad_fn = jax.value_and_grad(one, argnums=(0, 1))

        def multi(carry, arrs):
            h_, W_ = carry
            table_, bond_, src_, dst_, mask_, cot_ = arrs
            def body(c, _):
                hh, WW = c
                v, (gh, gW) = grad_fn(hh, WW, table_, bond_, src_, dst_, mask_, cot_)
                return (hh + 1e-6 * gh, WW + 1e-6 * gW), v
            (h2, W2), vs = jax.lax.scan(body, (h_, W_), None, length=64)
            return (h2, W2), vs[-1]

        fn = jax.jit(multi)
        dt = _time(fn, (h, W), (table, bond, src, dst, mask, cot)) / 64
        print(json.dumps({
            "which": which, "bs": bs, "us_per_op": dt * 1e6,
            "edges_per_s_fwd_bwd": n_real_edges / dt,
        }))
        return

    if which.startswith("seg-"):
        impl = which.split("-", 1)[1]
        from ionic_mpnn_tpu.ops.pallas.segment_sum import segment_sum_vjp

        N = plan.node_cap
        msgs = jnp.array(rng.normal(size=(plan.edge_cap, D)).astype(np.float32))
        msgs = msgs * mask[:, None].astype(msgs.dtype)
        # -mix variants: the SAME segment-sum but with an MXU matmul in the
        # scan body. Tests whether a Pallas custom-call merely COEXISTING
        # with ordinary XLA ops in one program triggers the axon backend's
        # slow dispatch (fwd-only-pallas: 70.8 ms/step vs 53 us for xla,
        # while the standalone seg-pallas scan is FAST).
        mix = impl.endswith("-mix")
        if mix:
            impl = impl[: -len("-mix")]
        Wd = jnp.array((rng.normal(size=(D, D)) * 0.1).astype(np.float32))

        def one(m_, dst_, cot_, W_):
            if impl == "pallas":
                out = segment_sum_vjp(m_, dst_, N)
            else:
                out = jax.ops.segment_sum(m_, dst_, num_segments=N,
                                          indices_are_sorted=True)
            if mix:
                out = jnp.dot(out, W_, preferred_element_type=jnp.float32)
            return jnp.sum(out * cot_)

        grad_fn = jax.value_and_grad(one)

        def multi(carry, arrs):
            m_ = carry
            dst_, cot_, W_ = arrs
            def body(mm, _):
                v, gm = grad_fn(mm, dst_, cot_, W_)
                return mm + 1e-6 * gm, v
            m2, vs = jax.lax.scan(body, m_, None, length=64)
            return m2, vs[-1]

        fn = jax.jit(multi)
        dt = _time(fn, msgs, (dst, cot, Wd)) / 64
        print(json.dumps({
            "which": which, "bs": bs, "us_per_op": dt * 1e6,
            "edges_per_s_fwd_bwd": n_real_edges / dt,
        }))
        return

    if which == "gru-only":
        from ionic_mpnn_tpu.ops.gru import GATED_UPDATE_PARAM_SHAPES, gated_update

        shapes = GATED_UPDATE_PARAM_SHAPES(D)
        params = {k: jnp.array(rng.normal(size=s).astype(np.float32) * 0.1)
                  for k, s in shapes.items()}
        agg = jnp.array(rng.normal(size=h.shape).astype(np.float32))

        def one(h_, p_, agg_, cot_):
            return jnp.sum(gated_update(h_, agg_, p_) * cot_)

        grad_fn = jax.value_and_grad(one, argnums=(0, 1))

        def multi(carry, arrs):
            h_, p_ = carry
            agg_, cot_ = arrs
            def body(c, _):
                hh, pp = c
                v, (gh, gp) = grad_fn(hh, pp, agg_, cot_)
                return (hh + 1e-6 * gh,
                        jax.tree.map(lambda a, b: a + 1e-6 * b, pp, gp)), v
            c2, vs = jax.lax.scan(body, (h_, p_), None, length=64)
            return c2, vs[-1]

        fn = jax.jit(multi)
        dt = _time(fn, (h, params), (agg, cot)) / 64
        print(json.dumps({"which": which, "bs": bs, "us_per_op": dt * 1e6}))
        return

    raise SystemExit(f"unknown which {which}")


if __name__ == "__main__":
    main()
