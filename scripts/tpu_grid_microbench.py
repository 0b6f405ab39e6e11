#!/usr/bin/env python
"""Single-component microbench for the device-resident screening dispatch.

Round-2 finding: the 10M-pair device-pack sweep runs ~3.2 s per dispatch
(8 x 4096 candidates) when the forward alone should be milliseconds. Each
invocation measures ONE component in a fresh process (clean isolation;
the "second-executable slowdown" that originally motivated this was
retracted as block-sync fiction, RESULTS.md battery 7):

  dispatch   : full screen step (pack both sides + fwd + top-k), scan-K
  pack       : grid_batch_on_device both sides only, scan-K
  pack-nodes : node block of pack_side_on_device only (searchsorted+gather)
  pack-edges : edge block only
  fwd        : fwd + top-k over K pre-packed DISTINCT stacked batches
  caps       : print the exact caps/shapes used (no device work)

Usage: python scripts/tpu_grid_microbench.py MODE [n_cations] [batch] [K]
Shapes mirror `scripts/screen.py --grid-cations 2688 --target-candidates
10000000 --batch-size 4096 --steps-per-call 8`.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from ionic_mpnn_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np


def build(n_cations: int, B: int):
    from ionic_mpnn_tpu.config import viscosity_config
    from ionic_mpnn_tpu.data import Vocab
    from ionic_mpnn_tpu.data.packing import round_up
    from ionic_mpnn_tpu.data.synthetic import SCREEN_ANIONS, enumerate_cations
    from ionic_mpnn_tpu.inference import IonPool
    from ionic_mpnn_tpu.models import ViscosityModel

    vocab = Vocab.load("data/vocab.pkl")
    cat_pool = IonPool(enumerate_cations(n_cations), vocab)
    an_pool = IonPool(list(SCREEN_ANIONS), vocab)
    C, A = len(cat_pool), len(an_pool)
    n_t = max(1, -(-10_000_000 // (C * A)))
    temps = np.linspace(273.15, 393.15, n_t).astype(np.float32)
    total = C * A * n_t

    gids = np.arange(total, dtype=np.int64)
    ci_all = gids % C
    ai_all = (gids // C) % A

    def batch_max(lens):
        csum = np.zeros(total + 1, np.int64)
        np.cumsum(lens, out=csum[1:])
        bounds = np.arange(0, total + B, B).clip(max=total)
        return int(np.diff(csum[bounds]).max())

    node_cap = round_up(max(batch_max(cat_pool.a_len[ci_all]),
                            batch_max(an_pool.a_len[ai_all])), 128)
    edge_cap = round_up(max(batch_max(cat_pool.e_len[ci_all]),
                            batch_max(an_pool.e_len[ai_all])), 128)
    cfg = viscosity_config(vocab.atom_vocab_size, vocab.bond_vocab_size)
    model = ViscosityModel(cfg)
    return (cat_pool, an_pool, temps, total, C, A, node_cap, edge_cap,
            model, cfg)


def timeit(fn, *args, iters=10, warmup=3):
    # Fetch-synced: block_until_ready under-waits on the axon relay
    # (battery 6: 0.4 ms block-synced vs 2146 ms fetch-synced for the same
    # dispatch). Calls with identical args are independent, so every
    # iteration's output is fetched after the loop (FIFO device execution
    # makes the total wall clock honest).
    out = None
    for _ in range(warmup):
        out = fn(*args)
    jax.tree.map(np.asarray, out)
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(iters)]
    jax.tree.map(np.asarray, outs)
    return (time.perf_counter() - t0) / iters


def main():
    mode = sys.argv[1]
    n_cations = int(sys.argv[2]) if len(sys.argv) > 2 else 2688
    B = int(sys.argv[3]) if len(sys.argv) > 3 else 4096
    K = int(sys.argv[4]) if len(sys.argv) > 4 else 8

    (cat_pool, an_pool, temps, total, C, A, node_cap, edge_cap,
     model, cfg) = build(n_cations, B)
    print(f"[shapes] C={C} A={A} total={total:,} node_cap={node_cap} "
          f"edge_cap={edge_cap} B={B} K={K}", flush=True)
    if mode == "caps":
        return

    from ionic_mpnn_tpu.ops.grid_pack import (
        device_pool, grid_batch_on_device, pack_side_on_device)

    # ARG-STYLE (CLAUDE.md): pools/params/temps are threaded through the
    # jit call signature, never closed over — mirrors production
    # ScreeningEngine._screen_grid_device. Closure-style variants of these
    # modes measured 3.2 s/dispatch purely from the HLO-constant slow path.
    cat_d = device_pool(cat_pool)
    an_d = device_pool(an_pool)
    temps_d = jnp.asarray(temps, jnp.float32)

    def one_batch(cd, ad, td, g0):
        return grid_batch_on_device(
            cd, ad, td, g0, n_cations=C, n_anions=A, total=total,
            batch_size=B, node_cap=node_cap, edge_cap=edge_cap,
            duplicate_edges=False, with_temperature=True)

    # All setup (init, eager packing) runs on the CPU backend so the timed
    # program is the FIRST executable the axon plugin loads (CLAUDE.md:
    # second-and-later executables dispatch ~25 ms/step).
    cpu = jax.devices("cpu")[0]
    tpu = jax.devices()[0]

    if mode in ("dispatch", "dispatch-vary", "dispatch-fetch", "dispatch-ckpt"):
        if mode == "dispatch-ckpt":
            # replicate production's pre-sweep work: restore the orbax
            # checkpoint BEFORE building the sweep executable, to test
            # whether anything it runs slows the subsequent sweep program
            # (it does not — the round-2 "second-executable slow path"
            # was retracted as block-sync fiction, RESULTS.md battery 7).
            from ionic_mpnn_tpu.training import restore_checkpoint

            restored = restore_checkpoint("results/viscosity/checkpoints")
            print("[ckpt] restored step", restored["step"], flush=True)
        with jax.default_device(cpu):
            cat_c, an_c = device_pool(cat_pool), device_pool(an_pool)
            temps_c = jnp.asarray(temps, jnp.float32)
            batch0 = grid_batch_on_device(
                cat_c, an_c, temps_c, jnp.int32(0), n_cations=C, n_anions=A,
                total=total, batch_size=B, node_cap=node_cap,
                edge_cap=edge_cap, duplicate_edges=False,
                with_temperature=True)
            params = model.init(jax.random.key(0), batch0, deterministic=True)
        params = jax.device_put(params, tpu)

        @jax.jit
        def fn(p, cd, ad, td, g0):
            def body(carry, s):
                b = one_batch(cd, ad, td, g0 + s * B)
                pred = model.apply(p, b, deterministic=True)["pred"]
                score = jnp.where(b.sample_mask > 0, -pred, -jnp.inf)
                vals, idx = jax.lax.top_k(score, min(50, B))
                return carry, (vals, g0 + s * B + idx.astype(jnp.int32))
            _, (vs, gis) = jax.lax.scan(body, 0, jnp.arange(K, dtype=jnp.int32))
            v2, i2 = jax.lax.top_k(vs.reshape(-1), min(50, B))
            return v2, gis.reshape(-1)[i2]

        if mode in ("dispatch-vary", "dispatch-fetch", "dispatch-ckpt"):
            # production passes a DIFFERENT grid offset every dispatch; a
            # constant g0 could be served from a relay-side cache of
            # identical (executable, args) calls — vary g0 exactly like
            # screen_grid does. -fetch additionally pulls every output to
            # the HOST (np.asarray) like production's top-k merge: if
            # block_until_ready under-synchronizes on this backend, only
            # the fetch timing is honest.
            import time as _t

            fetch = mode in ("dispatch-fetch", "dispatch-ckpt")
            for i in range(3):
                out = fn(params, cat_d, an_d, temps_d, jnp.int32(i * B * K))
                if fetch:
                    np.asarray(out[0])
            outs = []
            t0 = _t.perf_counter()
            iters = 10
            for i in range(iters):
                out = fn(params, cat_d, an_d, temps_d,
                         jnp.int32((3 + i) * B * K))
                if fetch:
                    outs.append((np.asarray(out[0]), np.asarray(out[1])))
                else:
                    outs.append(out)
            jax.block_until_ready(outs)
            dt = (_t.perf_counter() - t0) / iters
        else:
            dt = timeit(fn, params, cat_d, an_d, temps_d, jnp.int32(0))
        print(f"[{mode}] {dt*1e3:.1f} ms/dispatch = {dt/K*1e3:.2f} ms/batch "
              f"-> {B*K/dt:,.0f} pairs/s", flush=True)

    elif mode in ("pack", "pack-fetch"):
        @jax.jit
        def fn(cd, ad, td, g0):
            def body(carry, s):
                b = one_batch(cd, ad, td, g0 + s * B)
                # tiny reduction so nothing big ships back
                r = (jnp.sum(b.cation.atom_ids) + jnp.sum(b.anion.src)
                     + jnp.sum(b.temperature))
                return carry, r
            _, rs = jax.lax.scan(body, 0, jnp.arange(K, dtype=jnp.int32))
            return rs

        if mode == "pack-fetch":
            import time as _t

            for i in range(3):
                np.asarray(fn(cat_d, an_d, temps_d, jnp.int32(i * B * K)))
            t0 = _t.perf_counter()
            iters = 10
            for i in range(iters):
                np.asarray(fn(cat_d, an_d, temps_d,
                              jnp.int32((3 + i) * B * K)))
            dt = (_t.perf_counter() - t0) / iters
        else:
            dt = timeit(fn, cat_d, an_d, temps_d, jnp.int32(0))
        print(f"[{mode}] {dt*1e3:.1f} ms/dispatch = {dt/K*1e3:.2f} ms/batch",
              flush=True)

    elif mode in ("pack-nodes", "pack-edges"):
        # one cation side per scan step, node or edge block only
        @jax.jit
        def fn(cd, g0):
            def body(carry, s):
                gg = g0 + s * B + jnp.arange(B, dtype=jnp.int32)
                sel = jnp.where(gg < total, gg, 0) % C
                p = pack_side_on_device(cd, sel, node_cap, edge_cap)
                if mode == "pack-nodes":
                    r = jnp.sum(p.atom_ids) + jnp.sum(p.node_graph)
                else:
                    r = jnp.sum(p.src) + jnp.sum(p.bond_ids)
                return carry, r
            _, rs = jax.lax.scan(body, 0, jnp.arange(K, dtype=jnp.int32))
            return rs

        dt = timeit(fn, cat_d, jnp.int32(0))
        print(f"[{mode}] {dt*1e3:.1f} ms/dispatch = {dt/K*1e3:.2f} ms/side",
              flush=True)

    elif mode == "fwdref-argparams":
        # params as a PLAIN JIT ARG (not carried/perturbed), batch as xs,
        # top_k head — the exact production-dispatch structure with the
        # params-closure replaced by an argument. If fast, the screening
        # fix is one line; if slow, params must ride the scan carry.
        with jax.default_device(cpu):
            cat_c, an_c = device_pool(cat_pool), device_pool(an_pool)
            temps_c = jnp.asarray(temps, jnp.float32)
            batches = [
                grid_batch_on_device(
                    cat_c, an_c, temps_c, jnp.int32(i * B), n_cations=C,
                    n_anions=A, total=total, batch_size=B, node_cap=node_cap,
                    edge_cap=edge_cap, duplicate_edges=False,
                    with_temperature=True)
                for i in range(K)
            ]
            params = model.init(jax.random.key(0), batches[0],
                                deterministic=True)
        params = jax.device_put(params, tpu)
        stacked = jax.device_put(
            jax.tree.map(lambda *xs: jnp.stack(xs), *batches), tpu)

        @jax.jit
        def fn(p, bs):
            def body(carry, b):
                pred = model.apply(p, b, deterministic=True)["pred"]
                score = jnp.where(b.sample_mask > 0, -pred, -jnp.inf)
                vals, idx = jax.lax.top_k(score, min(50, B))
                return carry, (vals, idx)
            _, out = jax.lax.scan(body, 0, bs)
            return out

        dt = timeit(fn, params, stacked, iters=10, warmup=3) / K
        print(f"[{mode}] {dt*1e3:.3f} ms/batch -> {B/dt:,.0f} pairs/s",
              flush=True)

    elif mode in ("fwdref", "fwdref-topk", "fwdref-xs"):
        # One-variable mutations from tpu_microbench.py's FAST fwd-only
        # harness (34 us/step at training shapes) toward the SLOW fwd mode:
        #   fwdref      = fwd-only structure, grid-packed batch (content)
        #   fwdref-topk = + top_k/where head instead of sum loss
        #   fwdref-xs   = batch as stacked scan-xs instead of closed-over
        with jax.default_device(cpu):
            cat_c, an_c = device_pool(cat_pool), device_pool(an_pool)
            temps_c = jnp.asarray(temps, jnp.float32)
            batches = [
                grid_batch_on_device(
                    cat_c, an_c, temps_c, jnp.int32(i * B), n_cations=C,
                    n_anions=A, total=total, batch_size=B, node_cap=node_cap,
                    edge_cap=edge_cap, duplicate_edges=False,
                    with_temperature=True)
                for i in range(K if mode == "fwdref-xs" else 1)
            ]
            params = model.init(jax.random.key(0), batches[0],
                                deterministic=True)
        params = jax.device_put(params, tpu)

        def head(pred, b):
            if mode == "fwdref-topk":
                score = jnp.where(b.sample_mask > 0, -pred, -jnp.inf)
                vals, _ = jax.lax.top_k(score, min(50, B))
                return jnp.sum(vals)
            return jnp.sum(pred)

        if mode == "fwdref-xs":
            stacked = jax.device_put(
                jax.tree.map(lambda *xs: jnp.stack(xs), *batches), tpu)

            def multi(p, bs):
                def body(pp, b):
                    s = head(model.apply(pp, b, deterministic=True)["pred"], b)
                    pp = jax.tree.map(lambda x: x + 1e-12 * s, pp)
                    return pp, s
                p2, ss = jax.lax.scan(body, p, bs)
                return p2, ss[-1]

            fn = jax.jit(multi)
            dt = timeit(fn, params, stacked, iters=10, warmup=3) / K
        else:
            batch = jax.device_put(batches[0], tpu)

            def multi(p, b):
                def body(pp, _):
                    s = head(model.apply(pp, b, deterministic=True)["pred"], b)
                    pp = jax.tree.map(lambda x: x + 1e-12 * s, pp)
                    return pp, s
                p2, ss = jax.lax.scan(body, p, None, length=8)
                return p2, ss[-1]

            fn = jax.jit(multi)
            dt = timeit(fn, params, batch, iters=10, warmup=3) / 8
        print(f"[{mode}] {dt*1e3:.3f} ms/batch -> {B/dt:,.0f} pairs/s",
              flush=True)

    elif mode in ("fwd", "fwd-fetch"):
        # K DISTINCT batches packed eagerly once (on CPU), stacked, scanned
        with jax.default_device(cpu):
            cat_c, an_c = device_pool(cat_pool), device_pool(an_pool)
            temps_c = jnp.asarray(temps, jnp.float32)
            batches = [
                grid_batch_on_device(
                    cat_c, an_c, temps_c, jnp.int32(i * B), n_cations=C,
                    n_anions=A, total=total, batch_size=B, node_cap=node_cap,
                    edge_cap=edge_cap, duplicate_edges=False,
                    with_temperature=True)
                for i in range(K)
            ]
            stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *batches)
            params = model.init(jax.random.key(0), batches[0],
                                deterministic=True)
        stacked = jax.device_put(stacked, tpu)
        params = jax.device_put(params, tpu)

        @jax.jit
        def fn(p, stacked):
            def body(carry, b):
                pred = model.apply(p, b, deterministic=True)["pred"]
                score = jnp.where(b.sample_mask > 0, -pred, -jnp.inf)
                vals, idx = jax.lax.top_k(score, min(50, B))
                return carry, (vals, idx)
            _, out = jax.lax.scan(body, 0, stacked)
            return out

        if mode == "fwd-fetch":
            import time as _t

            for _ in range(3):
                out = fn(params, stacked)
                np.asarray(out[0])
            t0 = _t.perf_counter()
            iters = 10
            for _ in range(iters):
                out = fn(params, stacked)
                np.asarray(out[0]), np.asarray(out[1])
            dt = (_t.perf_counter() - t0) / iters
        else:
            dt = timeit(fn, params, stacked)
        print(f"[{mode}] {dt*1e3:.1f} ms/dispatch = {dt/K*1e3:.2f} ms/batch "
              f"-> {B*K/dt:,.0f} pairs/s", flush=True)

    elif mode in ("mpa", "mpa-grad", "mpa-typed", "msg", "agg", "gru", "pool"):
        # Component isolation at SCREENING shapes: one cation-side batch
        # packed on CPU, random states, scan-64 with a data-dependent
        # carry so XLA cannot hoist the op out of the loop.
        from ionic_mpnn_tpu.ops.gru import gated_update
        from ionic_mpnn_tpu.ops.message import (
            bond_type_matrices, edge_messages_from_table,
            message_pass_aggregate, message_pass_aggregate_typed)
        from ionic_mpnn_tpu.ops.segment import graph_sum_pool

        with jax.default_device(cpu):
            cat_c = device_pool(cat_pool)
            b = pack_side_on_device(
                cat_c, jnp.arange(B, dtype=jnp.int32) % C, node_cap, edge_cap)
        b = jax.device_put(b, tpu)
        D = 32
        V = int(np.asarray(cat_pool.bonds).max()) + 2
        rng = np.random.RandomState(0)
        h0 = jax.device_put(rng.randn(node_cap, D).astype(np.float32), tpu)
        mt = jax.device_put(rng.randn(V, D, D).astype(np.float32) * 0.1, tpu)
        msgs0 = jax.device_put(rng.randn(edge_cap, D).astype(np.float32), tpu)
        LOOPS = 64

        def scan64(body, init):
            @jax.jit
            def fn(x):
                out, _ = jax.lax.scan(body, x, None, length=LOOPS)
                return out
            return fn, init

        if mode == "mpa":
            fn, init = scan64(
                lambda h, _: (message_pass_aggregate(
                    h, b.bond_ids, b.src, b.dst, mt, b.edge_mask), None), h0)
        elif mode == "mpa-grad":
            # EXACT round-2 tpu_microbench.py harness structure: fwd+bwd
            # via value_and_grad, W carried (m_table recomputed in-loop),
            # cotangent-weighted scalar loss — to bisect the 50x rate gap
            # between that harness and the fwd-only one above.
            table = jax.device_put(
                rng.randn(V, 8).astype(np.float32), tpu)
            W0 = jax.device_put(
                (rng.randn(8, D, D) * 0.2).astype(np.float32), tpu)
            cot = jax.device_put(rng.randn(node_cap, D).astype(np.float32),
                                 tpu)
            from ionic_mpnn_tpu.ops.message import bond_type_matrices as btm

            def one(h_, W_):
                m_tab = btm(table, W_)
                out = message_pass_aggregate(h_, b.bond_ids, b.src, b.dst,
                                             m_tab, b.edge_mask)
                return jnp.sum(out * cot)

            grad_fn = jax.value_and_grad(one, argnums=(0, 1))

            @jax.jit
            def fn(carry):
                def body(c, _):
                    hh, WW = c
                    v, (gh, gW) = grad_fn(hh, WW)
                    return (hh + 1e-6 * gh, WW + 1e-6 * gW), v
                c2, vs = jax.lax.scan(body, carry, None, length=LOOPS)
                return c2
            init = (h0, W0)
        elif mode == "mpa-typed":
            fn, init = scan64(
                lambda h, _: (message_pass_aggregate_typed(
                    h, b.bond_ids, b.src, b.dst, mt, b.edge_mask), None), h0)
        elif mode == "msg":
            def body(h, _):
                m = edge_messages_from_table(h, b.bond_ids, b.src, mt)
                return h * (1.0 + 1e-12 * jnp.sum(m)), None
            fn, init = scan64(body, h0)
        elif mode == "agg":
            def body(m, _):
                a = jax.ops.segment_sum(m, b.dst, num_segments=node_cap,
                                        indices_are_sorted=True)
                return m * (1.0 + 1e-12 * jnp.sum(a)), None
            fn, init = scan64(body, msgs0)
        elif mode == "gru":
            gp = {
                "wz": rng.randn(2 * D, D).astype(np.float32) * 0.1,
                "bz": np.zeros(D, np.float32),
                "wr": rng.randn(2 * D, D).astype(np.float32) * 0.1,
                "br": np.zeros(D, np.float32),
                "wh": rng.randn(2 * D, D).astype(np.float32) * 0.1,
                "bh": np.zeros(D, np.float32),
                "ln_scale": np.ones(D, np.float32),
                "ln_bias": np.zeros(D, np.float32),
            }
            gp = jax.device_put(gp, tpu)

            def body(h, _):
                return gated_update(h, h, gp), None
            fn, init = scan64(body, h0)
        else:  # pool
            def body(h, _):
                p = graph_sum_pool(h, b.node_graph, B, b.node_mask)
                return h * (1.0 + 1e-12 * jnp.sum(p)), None
            fn, init = scan64(body, h0)

        dt = timeit(fn, init, iters=5, warmup=2)
        print(f"[{mode}] {dt/LOOPS*1e3:.3f} ms/op (scan-{LOOPS}, "
              f"N={node_cap} E={edge_cap})", flush=True)

    else:
        raise SystemExit(f"unknown mode {mode}")


if __name__ == "__main__":
    main()
