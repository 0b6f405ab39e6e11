#!/usr/bin/env python
"""Battery 41: decompose the PAIRED device-epoch step (round 5).

Arms (one per process invocation — clean A/B, compile cache makes
repeats cheap):

  shapes          print layout stats only (no TPU timing)
  paired-epoch    production paired epoch_call, whole-epoch scan -> ms/step
  unpaired-epoch  single-occupancy epoch_call (battery-40 baseline)
  paired-pack     pack-only scan: _device_batch_paired per step + checksum
  paired-step     train step on 8 stacked PRE-PACKED paired batches
                  (isolates step cost from the on-device pack)
  host-step       train step on 8 stacked host greedy-packed batches
                  (the bench.py reference harness, ~2.98 ms at batch 2048)
  accum-step      GRADIENT-ACCUMULATION workaround for the nw efficiency
                  cliff (AXON 4d): effective batch 2·B as two paired
                  B-chunks (grads summed, one Adam step) — prices
                  optimizer-batch 4096 at ~2× the 2048 chunk cost instead
                  of the cliff's superlinear single-batch cost

All arrays ride as jit ARGUMENTS (closure poison, CLAUDE.md); timing is
fetch-synced (np.asarray of outputs that depend on the full chain).

Usage: python scripts/tpu_paired_probe.py ARM [n_records] [batch]
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


def _setup(n_records, bs):
    from ionic_mpnn_tpu.benchmarks import make_bench_dataset
    from ionic_mpnn_tpu.config import (
        TrainConfig,
        resolve_compute_dtype,
        resolve_onehot_window,
        viscosity_config,
    )
    from ionic_mpnn_tpu.data import plan_capacities
    from ionic_mpnn_tpu.models import ViscosityModel
    from ionic_mpnn_tpu.training.device_epochs import (
        build_device_dataset,
        build_paired_perm,
        choose_paired_plan,
    )

    records, vocab = make_bench_dataset(n_records)
    dtype = resolve_compute_dtype("auto")
    window = resolve_onehot_window(dtype)
    cfg = viscosity_config(vocab.atom_vocab_size, vocab.bond_vocab_size,
                           message_impl="onehot", compute_dtype=dtype,
                           onehot_window=window)
    plan = plan_capacities(records, batch_size=bs,
                           edge_layout="window_aligned", window=window)
    tcfg = TrainConfig(batch_size=bs, seed=0)
    model = ViscosityModel(cfg)
    ds = build_device_dataset(records, window, plan.target_key)
    pplan = choose_paired_plan(ds, bs)
    order = np.random.default_rng(1).permutation(ds.n).astype(np.int32)
    perm = build_paired_perm(ds, order, pplan)
    return (records, vocab, cfg, plan, tcfg, model, ds, pplan, perm, window)


def _fetch_time(run, iters=6):
    """run() -> pytree; fetch-synced mean seconds over iters."""
    out = run()
    jax.tree.map(np.asarray, out)  # warmup + first fetch
    t0 = time.perf_counter()
    for _ in range(iters):
        out = run()
    jax.tree.map(np.asarray, out)
    return (time.perf_counter() - t0) / iters


def main():
    arm = sys.argv[1]
    n_records = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
    bs = int(sys.argv[3]) if len(sys.argv) > 3 else 2048

    (records, vocab, cfg, plan, tcfg, model, ds, pplan, perm,
     window) = _setup(n_records, bs)
    R = pplan.regions
    steps = len(perm) // (2 * R)
    em_c, em_a = ds.cat_pool.em, ds.an_pool.em
    stats = {
        "arm": arm, "n_records": n_records, "batch": bs,
        "paired_plan": repr(pplan), "steps_per_epoch": steps,
        "em_c": em_c, "em_a": em_a,
        "paired_nw_c": R * pplan.region_c // window,
        "paired_nw_a": R * pplan.region_a // window,
        "paired_tile_c": (window // pplan.region_c) * 2 * em_c,
        "paired_tile_a": (window // pplan.region_a) * 2 * em_a,
        "paired_edges_c": 2 * R * em_c, "paired_edges_a": 2 * R * em_a,
        "unpaired_nw_c": bs * ds.cat_pool.pitch // window,
        "unpaired_nw_a": bs * ds.an_pool.pitch // window,
        "unpaired_edges_c": bs * em_c, "unpaired_edges_a": bs * em_a,
        "host_node_cap": plan.node_cap, "host_edge_cap": plan.edge_cap,
        "host_anion_node_cap": plan.anion_node_cap,
        "host_anion_edge_cap": plan.anion_edge_cap,
        "host_tile": plan.edge_tile, "host_anion_tile": plan.anion_edge_tile,
    }
    if arm == "shapes":
        print(json.dumps(stats))
        return 0

    from ionic_mpnn_tpu.training.loop import TrainState, make_train_step
    from ionic_mpnn_tpu.training.optim import make_optimizer
    from ionic_mpnn_tpu.data import iter_batches

    opt = make_optimizer(tcfg.learning_rate, tcfg.clipnorm)
    first = next(iter_batches(records[:bs], plan))
    variables = model.init(jax.random.PRNGKey(0), first)
    inner = make_train_step(model, cfg, tcfg, opt, jit_compile=False)

    def fresh_state():
        return TrainState(
            step=jnp.int32(0),
            params=jax.tree.map(jnp.asarray, variables["params"]),
            batch_stats={}, opt_state=opt.init(variables["params"]),
            rng=jax.random.PRNGKey(7))

    if arm in ("paired-epoch", "unpaired-epoch"):
        from ionic_mpnn_tpu.training.device_epochs import (
            make_device_epoch_call,
            make_paired_epoch_call,
        )

        if arm == "paired-epoch":
            call = make_paired_epoch_call(inner, ds, pplan, steps)
            perm_dev = jax.device_put(jnp.asarray(perm))
            n_steps = steps
        else:
            K_ep = -(-ds.n // bs)
            call = make_device_epoch_call(inner, ds, bs, K_ep)
            p = np.random.default_rng(1).permutation(ds.n).astype(np.int32)
            pad = (-len(p)) % (bs * K_ep)
            perm_dev = jax.device_put(jnp.asarray(
                np.concatenate([p, np.full(pad, ds.n, np.int32)])))
            n_steps = K_ep
        ds_arrays = ds.arrays()
        state = fresh_state()

        def run():
            nonlocal state
            state, m = call(state, ds_arrays, perm_dev, jnp.int32(0))
            return m

        sec = _fetch_time(run)
        stats.update(epoch_s=round(sec, 4),
                     ms_per_step=round(1e3 * sec / n_steps, 3),
                     n_steps=n_steps)

    elif arm == "paired-pack":
        from ionic_mpnn_tpu.training.device_epochs import _device_batch_paired

        perm_dev = jax.device_put(jnp.asarray(perm))
        ds_arrays = ds.arrays()

        @jax.jit
        def pack_epoch(ds_arrays, perm, g0):
            local = ds.with_arrays(ds_arrays)

            def body(acc, k):
                idx = jax.lax.dynamic_slice(perm, (g0 + k * 2 * R,), (2 * R,))
                b = _device_batch_paired(local, idx, pplan)
                s = (jnp.sum(b.cation.atom_ids) + jnp.sum(b.anion.atom_ids)
                     + jnp.sum(b.cation.src) + jnp.sum(b.anion.src)
                     + jnp.sum(b.y) + jnp.sum(b.sample_mask))
                return acc + s.astype(jnp.float32), None

            acc, _ = jax.lax.scan(body, jnp.float32(0),
                                  jnp.arange(steps, dtype=jnp.int32))
            return acc

        def run():
            return pack_epoch(ds_arrays, perm_dev, jnp.int32(0))

        sec = _fetch_time(run)
        stats.update(epoch_s=round(sec, 4),
                     ms_per_step=round(1e3 * sec / steps, 3), n_steps=steps)

    elif arm == "accum-step":
        import optax

        from ionic_mpnn_tpu.training.device_epochs import _device_batch_paired
        from ionic_mpnn_tpu.training.loop import _data_loss, _l2_penalty

        K = 8  # 8 chunks -> 4 effective 2B-batch optimizer steps
        packb = jax.jit(lambda a, idx: _device_batch_paired(
            ds.with_arrays(a), idx, pplan))
        batches = [packb(ds.arrays(),
                         jnp.asarray(perm[k * 2 * R:(k + 1) * 2 * R]))
                   for k in range(K)]
        stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *batches)

        def loss_fn(p, b):
            out = model.apply({"params": p}, b, deterministic=True)
            return (_data_loss(out["pred"], b.y, b.sample_mask, "mse", 1.0)
                    + _l2_penalty(p, cfg.fp_l2))

        @jax.jit
        def multi(state, batches):
            zeros = jax.tree.map(jnp.zeros_like, state.params)

            def body(carry, xs):
                s, acc = carry
                k, b = xs
                loss, g = jax.value_and_grad(loss_fn)(s.params, b)
                acc = jax.tree.map(jnp.add, acc, g)

                def apply_now(args):
                    s_, a_ = args
                    a_ = jax.tree.map(lambda x: x * 0.5, a_)
                    updates, new_opt = opt.update(a_, s_.opt_state, s_.params)
                    return (s_.replace(
                        params=optax.apply_updates(s_.params, updates),
                        opt_state=new_opt, step=s_.step + 1), zeros)

                s, acc = jax.lax.cond(k % 2 == 1, apply_now,
                                      lambda args: args, (s, acc))
                return (s, acc), loss

            (state, _), losses = jax.lax.scan(
                body, (state, zeros),
                (jnp.arange(K, dtype=jnp.int32), batches))
            return state, losses

        state = fresh_state()

        def run():
            nonlocal state
            state, losses = multi(state, stacked)
            return losses

        sec = _fetch_time(run)
        stats.update(ms_per_chunk=round(1e3 * sec / K, 3),
                     ms_per_effective_4096_step=round(2e3 * sec / K, 3))

    elif arm in ("paired-step", "host-step"):
        from ionic_mpnn_tpu.training.device_epochs import _device_batch_paired

        K = 8
        if arm == "paired-step":
            packb = jax.jit(lambda a, idx: _device_batch_paired(
                ds.with_arrays(a), idx, pplan))
            batches = [packb(ds.arrays(),
                             jnp.asarray(perm[k * 2 * R:(k + 1) * 2 * R]))
                       for k in range(K)]
            per_step_records = float(np.mean(
                [(perm[k * 2 * R:(k + 1) * 2 * R] >= 0).sum()
                 for k in range(K)]))
        else:
            it = iter_batches(records, plan, shuffle=False)
            batches = [jax.tree.map(jnp.asarray, next(it)) for _ in range(K)]
            per_step_records = float(np.mean(
                [float(np.asarray(b.sample_mask).sum()) for b in batches]))
        stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *batches)

        @jax.jit
        def multi(state, batches):
            def body(s, b):
                s2, m = inner(s, b)
                return s2, m["loss"]

            state, losses = jax.lax.scan(body, state, batches)
            return state, losses

        state = fresh_state()

        def run():
            nonlocal state
            state, losses = multi(state, stacked)
            return losses

        sec = _fetch_time(run)
        stats.update(ms_per_step=round(1e3 * sec / K, 3),
                     per_step_records=per_step_records)
    else:
        raise SystemExit(f"unknown arm {arm}")

    print(json.dumps(stats))
    return 0


if __name__ == "__main__":
    sys.exit(main())
