"""Device-resident training epochs (training/device_epochs.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ionic_mpnn_tpu.config import TrainConfig, viscosity_config
from ionic_mpnn_tpu.data import iter_batches, plan_capacities
from ionic_mpnn_tpu.models import ViscosityModel
from ionic_mpnn_tpu.training.device_epochs import (
    build_device_dataset,
    make_device_epoch_call,
)
from ionic_mpnn_tpu.training.loop import make_train_step
from ionic_mpnn_tpu.training.optim import make_optimizer


def _setup(encoded_viscosity, n=16, batch=8):
    vocab = encoded_viscosity["vocab"]
    records = encoded_viscosity["viscosity"][:n]
    cfg = viscosity_config(vocab.atom_vocab_size, vocab.bond_vocab_size,
                           num_steps=2, message_impl="onehot")
    model = ViscosityModel(cfg)
    plan = plan_capacities(records, batch_size=batch,
                           edge_layout="window_aligned")
    params = model.init(jax.random.PRNGKey(0),
                        next(iter_batches(records, plan)))
    return records, cfg, model, plan, params


def test_build_device_dataset_dedupes(encoded_viscosity):
    records, cfg, model, plan, params = _setup(encoded_viscosity)
    ds = build_device_dataset(records, plan.window, plan.target_key)
    assert ds.n == len(records)
    # dedupe really dedupes (synthetic library reuses ions across records)
    assert int(ds.cat_pool.a_len.shape[0]) < len(records) or len(records) <= 2
    # every record's index maps back to its own molecule's atom count
    for i, r in enumerate(records):
        row = int(np.asarray(ds.cat_idx)[i])
        assert int(np.asarray(ds.cat_pool.a_len)[row]) == r["cation"]["num_atoms"]
        row = int(np.asarray(ds.an_idx)[i])
        assert int(np.asarray(ds.an_pool.a_len)[row]) == r["anion"]["num_atoms"]
    assert ds.cat_pool.pitch > 0 and ds.an_pool.pitch > 0


def test_device_epoch_step_matches_host_step(encoded_viscosity):
    """One device-packed train step == the host-packed step on the same
    records (same math, different placement → allclose)."""
    from ionic_mpnn_tpu.training.loop import TrainState

    records, cfg, model, plan, params = _setup(encoded_viscosity, n=8, batch=8)
    tcfg = TrainConfig(batch_size=8, steps_per_call=1, seed=3)
    opt = make_optimizer(tcfg.learning_rate, tcfg.clipnorm)
    ds = build_device_dataset(records, plan.window, plan.target_key)

    def fresh_state():
        return TrainState(
            step=jnp.int32(0), params=jax.tree.map(jnp.array, params["params"]),
            batch_stats={}, opt_state=opt.init(params["params"]),
            rng=jax.random.PRNGKey(7),
        )

    inner = make_train_step(model, cfg, tcfg, opt, jit_compile=False)
    call = make_device_epoch_call(inner, ds, batch_size=8, steps_per_call=1)
    perm = jnp.asarray(np.arange(8, dtype=np.int32))
    dev_state, dev_m = call(fresh_state(), ds.arrays(), perm, jnp.int32(0))

    host_batch = next(iter_batches(records, plan, shuffle=False))
    host_step = make_train_step(model, cfg, tcfg, opt)
    host_state, host_m = host_step(fresh_state(), host_batch)

    np.testing.assert_allclose(
        float(dev_m["loss_sum"] / dev_m["n"]), float(host_m["loss"]),
        rtol=2e-5, atol=1e-6)
    flat_d = jax.tree.leaves(dev_state.params)
    flat_h = jax.tree.leaves(host_state.params)
    for d, h in zip(flat_d, flat_h):
        np.testing.assert_allclose(np.asarray(d), np.asarray(h),
                                   rtol=5e-4, atol=5e-6)


def test_device_epoch_padded_tail_masked(encoded_viscosity):
    """Sentinel (out-of-range) permutation slots contribute nothing."""
    from ionic_mpnn_tpu.training.loop import TrainState

    records, cfg, model, plan, params = _setup(encoded_viscosity, n=5, batch=8)
    tcfg = TrainConfig(batch_size=8, steps_per_call=2, seed=3)
    opt = make_optimizer(tcfg.learning_rate, tcfg.clipnorm)
    ds = build_device_dataset(records, plan.window, plan.target_key)
    inner = make_train_step(model, cfg, tcfg, opt, jit_compile=False)
    call = make_device_epoch_call(inner, ds, batch_size=8, steps_per_call=2)
    perm = jnp.asarray(np.concatenate(
        [np.arange(5), np.full(11, 5)]).astype(np.int32))
    state = TrainState(
        step=jnp.int32(0), params=params["params"], batch_stats={},
        opt_state=opt.init(params["params"]), rng=jax.random.PRNGKey(7))
    _, m = call(state, ds.arrays(), perm, jnp.int32(0))
    assert float(m["n"]) == 5.0
    assert np.isfinite(float(m["loss_sum"]))


def test_all_sentinel_batch_is_noop(encoded_viscosity):
    """An all-sentinel scan slot must not touch the state: without the
    lax.cond guard it still applies an Adam step from the L2-penalty
    gradient (Adam normalizes even a tiny gradient to an lr-sized step),
    which measurably degraded convergence — the round-4 quality-
    regression root cause (RESULTS round 4)."""
    from ionic_mpnn_tpu.training.loop import TrainState

    records, cfg, model, plan, params = _setup(encoded_viscosity, n=8, batch=8)
    tcfg = TrainConfig(batch_size=8, steps_per_call=2, seed=3)
    opt = make_optimizer(tcfg.learning_rate, tcfg.clipnorm)
    ds = build_device_dataset(records, plan.window, plan.target_key)
    inner = make_train_step(model, cfg, tcfg, opt, jit_compile=False)

    def fresh():
        return TrainState(
            step=jnp.int32(0), params=jax.tree.map(jnp.array, params["params"]),
            batch_stats={}, opt_state=opt.init(params["params"]),
            rng=jax.random.PRNGKey(7))

    # K=2 with the second batch ALL sentinel vs K=1 over the real 8
    call2 = make_device_epoch_call(inner, ds, batch_size=8, steps_per_call=2)
    perm2 = jnp.asarray(np.concatenate(
        [np.arange(8), np.full(8, ds.n)]).astype(np.int32))
    s2, m2 = call2(fresh(), ds.arrays(), perm2, jnp.int32(0))

    call1 = make_device_epoch_call(inner, ds, batch_size=8, steps_per_call=1)
    s1, m1 = call1(fresh(), ds.arrays(),
                   jnp.asarray(np.arange(8, dtype=np.int32)), jnp.int32(0))
    assert float(m2["n"]) == float(m1["n"]) == 8.0
    for a, b in zip(jax.tree.leaves(s2.params), jax.tree.leaves(s1.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.multidevice
def test_dp_device_epoch_step_matches_single_device(encoded_viscosity):
    """One DP device-epoch call on the 8-device mesh == the single-device
    device-epoch call over the same 8·B records (grad psum exactness)."""
    from jax.sharding import Mesh

    from ionic_mpnn_tpu.training.device_epochs import make_dp_device_epoch_call
    from ionic_mpnn_tpu.training.loop import TrainState

    n_dev = 8
    B = 8
    records, cfg, model, plan, params = _setup(encoded_viscosity,
                                               n=n_dev * B, batch=B)
    tcfg = TrainConfig(batch_size=B, steps_per_call=1, seed=3)
    opt = make_optimizer(tcfg.learning_rate, tcfg.clipnorm)
    ds = build_device_dataset(records, plan.window, plan.target_key)

    def fresh_state():
        return TrainState(
            step=jnp.int32(0), params=jax.tree.map(jnp.array, params["params"]),
            batch_stats={}, opt_state=opt.init(params["params"]),
            rng=jax.random.PRNGKey(7),
        )

    mesh = Mesh(np.array(jax.devices()[:n_dev]), ("data",))
    dp_call = make_dp_device_epoch_call(model, cfg, tcfg, opt, mesh, ds,
                                        batch_size=B, steps_per_call=1)
    perm = jnp.asarray(np.arange(n_dev * B, dtype=np.int32))
    dp_state, dp_m = dp_call(fresh_state(), ds.arrays(), perm, jnp.int32(0))

    # single-device reference: ONE step over the same 32 records as one
    # batch is not equivalent (different Adam step count) — instead check
    # the DP loss against the mean of the 8 per-device host losses and
    # that params moved and stayed finite and replicated.
    assert float(dp_m["n"]) == n_dev * B
    loss = float(dp_m["loss_sum"] / dp_m["n"])
    assert np.isfinite(loss)
    for leaf in jax.tree.leaves(dp_state.params):
        assert np.all(np.isfinite(np.asarray(leaf)))

    # exactness vs a hand-built global batch: the DP step's psum'd grad
    # equals the single-device grad over the concatenated 8-device batch
    # (same global loss weighting by construction) — run the host DP step
    # on the SAME record split and compare updated params.
    from ionic_mpnn_tpu.parallel.data_parallel import (
        make_dp_train_step,
        shard_batch,
        stack_batches,
    )

    group = []
    for d in range(n_dev):
        sel = records[d * B:(d + 1) * B]
        group.append(
            next(iter_batches(sel, plan, shuffle=False))
        )
    dp_step = make_dp_train_step(model, cfg, tcfg, opt, mesh)
    host_state, host_m = dp_step(fresh_state(),
                                 shard_batch(stack_batches(group), mesh))
    np.testing.assert_allclose(loss, float(host_m["loss"]),
                               rtol=2e-5, atol=1e-6)
    for d, h in zip(jax.tree.leaves(dp_state.params),
                    jax.tree.leaves(host_state.params)):
        np.testing.assert_allclose(np.asarray(d), np.asarray(h),
                                   rtol=5e-4, atol=5e-6)


@pytest.mark.multidevice
def test_fit_dp_device_epochs_learns(encoded_viscosity):
    """fit(mesh, device_epochs=True) takes the DP device-resident path
    and trains (loss decreases)."""
    from jax.sharding import Mesh

    from ionic_mpnn_tpu.training.loop import fit

    vocab = encoded_viscosity["vocab"]
    records = encoded_viscosity["viscosity"]
    cfg = viscosity_config(vocab.atom_vocab_size, vocab.bond_vocab_size,
                           num_steps=2, message_impl="onehot")
    plan = plan_capacities(records, batch_size=8,
                           edge_layout="window_aligned")
    tcfg = TrainConfig(epochs=6, batch_size=8, steps_per_call=2,
                       early_stopping_patience=100, seed=0,
                       device_epochs=True)
    mesh = Mesh(np.array(jax.devices()[:4]), ("data",))
    result = fit(ViscosityModel(cfg), cfg, tcfg, records[:96], records[96:104],
                 plan, verbose=False, mesh=mesh)
    assert len(result.history["loss"]) == 6
    assert result.history["loss"][-1] < result.history["loss"][0]
    assert np.isfinite(result.best_val_loss)


def test_fit_device_epochs_learns(encoded_viscosity):
    """fit(device_epochs=True) trains (loss decreases) on CPU."""
    from ionic_mpnn_tpu.training.loop import fit

    vocab = encoded_viscosity["vocab"]
    records = encoded_viscosity["viscosity"]
    cfg = viscosity_config(vocab.atom_vocab_size, vocab.bond_vocab_size,
                           num_steps=2, message_impl="onehot")
    plan = plan_capacities(records, batch_size=8,
                           edge_layout="window_aligned")
    tcfg = TrainConfig(epochs=8, batch_size=8, steps_per_call=2,
                       early_stopping_patience=100, seed=0,
                       device_epochs=True)
    result = fit(ViscosityModel(cfg), cfg, tcfg, records[:24], records[24:32],
                 plan, verbose=False)
    assert len(result.history["loss"]) == 8
    assert result.history["loss"][-1] < result.history["loss"][0]
    assert np.isfinite(result.best_val_loss)
