#!/usr/bin/env python
"""Reproducer: closed-over device arrays + a state-donating jit on axon.

The round-4 quality bisect isolated a training regression to
device-resident epochs; every component check passed (pool fidelity,
single-call bitwise pack parity CPU vs TPU, 8-step param parity within
one call), yet 400-epoch runs plateaued 20× above the reachable loss.
Hypothesis: the dataset pools CLOSED OVER by the donating jitted epoch
call get corrupted across calls on the axon backend (the arg-passing
variant converges normally).

This probe rebuilds the OLD closure-style call, checksums the pool and a
reference pack output before and after a series of donated calls, and
reports whether either drifted. Run on the TPU; CPU as control.
"""

import hashlib
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

if len(sys.argv) > 1 and sys.argv[1] == "cpu":
    jax.config.update("jax_platforms", "cpu")

from ionic_mpnn_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax.numpy as jnp
import numpy as np


def sha(x):
    return hashlib.sha256(np.asarray(x).tobytes()).hexdigest()[:12]


def main():
    from ionic_mpnn_tpu.config import TrainConfig, viscosity_config
    from ionic_mpnn_tpu.data import iter_batches, plan_capacities
    from ionic_mpnn_tpu.data.reference_io import load_pickle
    from ionic_mpnn_tpu.data.vocab import Vocab
    from ionic_mpnn_tpu.models import ViscosityModel
    from ionic_mpnn_tpu.training.device_epochs import (
        _device_batch,
        build_device_dataset,
    )
    from ionic_mpnn_tpu.training.loop import TrainState, make_train_step
    from ionic_mpnn_tpu.training.optim import make_optimizer

    records = load_pickle("/tmp/r4q/data/viscosity_id_data.pkl")[:1024]
    vocab = Vocab.load("/tmp/r4q/data/vocab.pkl")
    cfg = viscosity_config(vocab.atom_vocab_size, vocab.bond_vocab_size,
                           message_impl="onehot", compute_dtype="bfloat16",
                           onehot_window=64)
    plan = plan_capacities(records, batch_size=32,
                           edge_layout="window_aligned", window=64)
    model = ViscosityModel(cfg)
    tcfg = TrainConfig(batch_size=32, steps_per_call=8, seed=3)
    opt = make_optimizer(tcfg.learning_rate, tcfg.clipnorm)
    b0 = next(iter_batches(records[:32], plan, shuffle=False))
    params = model.init(jax.random.PRNGKey(0), b0)
    state = TrainState(step=jnp.int32(0), params=params["params"],
                       batch_stats={}, opt_state=opt.init(params["params"]),
                       rng=jax.random.PRNGKey(7))
    ds = build_device_dataset(records, plan.window, "log_eta")
    inner = make_train_step(model, cfg, tcfg, opt, jit_compile=False)

    # ---- the OLD closure-style epoch call (pools captured, state donated)
    B, K = 32, 8

    def closure_call(st, perm, g0):
        def body(s, k):
            idx = jax.lax.dynamic_slice(perm, (g0 + k * B,), (B,))
            batch = _device_batch(ds, idx)  # <-- ds CLOSED OVER
            s2, m = inner(s, batch)
            nk = jnp.sum(batch.sample_mask)
            return s2, (m["loss"] * nk, nk)

        st, (losses, nks) = jax.lax.scan(body, st,
                                         jnp.arange(K, dtype=jnp.int32))
        return st, {"loss_sum": jnp.sum(losses), "n": jnp.sum(nks)}

    call = jax.jit(closure_call, donate_argnums=(0,))

    pack = jax.jit(lambda perm, g0: _device_batch(
        ds, jax.lax.dynamic_slice(perm, (g0,), (32,))))

    perm = jnp.asarray(np.arange(1024, dtype=np.int32))
    pool_before = {
        "cat.fused_p": sha(ds.cat_pool.fused_p),
        "an.fused_p": sha(ds.an_pool.fused_p),
        "y": sha(ds.y),
    }
    ref_before = {f: sha(getattr(pack(perm, jnp.int32(0)).cation, f))
                  for f in ("atom_ids", "src", "dst", "bond_ids")}

    losses = []
    for g0 in range(0, 1024, B * K):
        state, m = call(state, perm, jnp.int32(g0))
        losses.append(round(float(m["loss_sum"] / m["n"]), 4))

    pool_after = {
        "cat.fused_p": sha(ds.cat_pool.fused_p),
        "an.fused_p": sha(ds.an_pool.fused_p),
        "y": sha(ds.y),
    }
    ref_after = {f: sha(getattr(pack(perm, jnp.int32(0)).cation, f))
                 for f in ("atom_ids", "src", "dst", "bond_ids")}

    print(json.dumps({
        "backend": jax.devices()[0].platform,
        "losses": losses,
        "pool_drift": {k: (pool_before[k], pool_after[k])
                       for k in pool_before if pool_before[k] != pool_after[k]},
        "pack_drift": {k: (ref_before[k], ref_after[k])
                       for k in ref_before if ref_before[k] != ref_after[k]},
    }), flush=True)


if __name__ == "__main__":
    main()
