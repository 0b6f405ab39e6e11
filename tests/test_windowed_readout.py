"""Windowed one-hot readout + one-hot embedding parity.

Round-4 step optimization: on window-aligned batches the per-graph
readout becomes batched (W, W) @ (W, D) one-hot matmuls + one B-row
gather (``ops/segment.graph_sum_pool_windowed``), and the atom embedding
becomes a one-hot matmul (table grad = matmul, not an N-row scatter).
Both must be value-equal to the segment-sum / gather formulations.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ionic_mpnn_tpu.benchmarks import make_bench_dataset
from ionic_mpnn_tpu.config import viscosity_config
from ionic_mpnn_tpu.data import iter_batches, plan_capacities
from ionic_mpnn_tpu.data.packing import compute_pool_slots
from ionic_mpnn_tpu.models import ViscosityModel
from ionic_mpnn_tpu.ops.segment import graph_sum_pool, graph_sum_pool_windowed

WINDOW = 64


def _aligned_batch(bs=32):
    records, vocab = make_bench_dataset(64)
    plan = plan_capacities(records, batch_size=bs,
                           edge_layout="window_aligned", window=WINDOW)
    batch = next(iter_batches(records[:bs], plan))
    return records, vocab, batch


def test_windowed_pool_matches_segment_sum():
    _, _, batch = _aligned_batch()
    rng = np.random.default_rng(0)
    for g in (batch.cation, batch.anion):
        assert g.pool_slot is not None
        h = jnp.asarray(rng.normal(size=(g.node_capacity, 16)).astype(np.float32))
        want = graph_sum_pool(h, jnp.asarray(g.node_graph), g.n_graphs,
                              jnp.asarray(g.node_mask),
                              node_sorted=g.node_sorted)
        got = graph_sum_pool_windowed(
            h, jnp.asarray(g.node_graph), jnp.asarray(g.node_mask),
            jnp.asarray(g.pool_slot), WINDOW, g.n_graphs,
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)


def test_windowed_pool_empty_slots_are_zero():
    # pack fewer records than graph slots: trailing slots are empty
    records, _, _ = _aligned_batch()
    plan = plan_capacities(records, batch_size=32,
                           edge_layout="window_aligned", window=WINDOW)
    batch = next(iter_batches(records[:5], plan))
    g = batch.cation
    slots = np.asarray(g.pool_slot)
    assert (slots[5:] == -1).all() and (slots[:5] >= 0).all()
    h = jnp.ones((g.node_capacity, 8), jnp.float32)
    got = np.asarray(graph_sum_pool_windowed(
        h, jnp.asarray(g.node_graph), jnp.asarray(g.node_mask),
        jnp.asarray(g.pool_slot), WINDOW, g.n_graphs))
    assert (got[5:] == 0).all()
    # real rows equal each molecule's atom count
    counts = np.bincount(np.asarray(g.node_graph)[np.asarray(g.node_mask)],
                         minlength=32)
    np.testing.assert_allclose(got[:, 0], counts.astype(np.float32))


def test_device_pool_slots_matches_host():
    from ionic_mpnn_tpu.ops.grid_pack import device_pool_slots

    _, _, batch = _aligned_batch()
    for g in (batch.cation, batch.anion):
        want = compute_pool_slots(g.node_graph, g.node_mask, WINDOW, g.n_graphs)
        got = np.asarray(device_pool_slots(jnp.asarray(g.node_graph), WINDOW,
                                           g.n_graphs))
        np.testing.assert_array_equal(got, want)


def test_device_pool_slots_sentinel_for_empty_slots():
    """Empty trailing graph slots must return -1 (the host contract), not
    alias a real graph's pooled row (ADVICE round 4)."""
    from ionic_mpnn_tpu.ops.grid_pack import device_pool_slots

    records, _, _ = _aligned_batch()
    plan = plan_capacities(records, batch_size=32,
                           edge_layout="window_aligned", window=WINDOW)
    batch = next(iter_batches(records[:5], plan))
    for g in (batch.cation, batch.anion):
        want = compute_pool_slots(g.node_graph, g.node_mask, WINDOW, g.n_graphs)
        got = np.asarray(device_pool_slots(jnp.asarray(g.node_graph), WINDOW,
                                           g.n_graphs))
        assert (want[5:] == -1).all()
        np.testing.assert_array_equal(got, want)


def test_remat_message_grads_identical():
    """remat_message (jax.checkpoint on the message op) must not change
    values or gradients — only the backward's memory/recompute trade."""
    records, vocab, batch = _aligned_batch()
    batch = jax.tree.map(jnp.asarray, batch)
    base = viscosity_config(
        vocab.atom_vocab_size, vocab.bond_vocab_size,
        message_impl="onehot", onehot_window=WINDOW, num_steps=2,
    )
    m0 = ViscosityModel(base)
    m1 = ViscosityModel(base.replace(remat_message=True))
    variables = m0.init(jax.random.PRNGKey(0), batch)

    def loss(params, model):
        out = model.apply({"params": params}, batch)["pred"]
        return jnp.mean((out - batch.y) ** 2)

    g0 = jax.grad(loss)(variables["params"], m0)
    g1 = jax.grad(loss)(variables["params"], m1)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_model_equal_across_embed_and_readout_paths():
    """Full model: onehot-embed + windowed readout == gather + segment-sum
    (predictions AND gradients)."""
    records, vocab, batch = _aligned_batch()
    batch = jax.tree.map(jnp.asarray, batch)
    base = viscosity_config(
        vocab.atom_vocab_size, vocab.bond_vocab_size,
        message_impl="onehot", onehot_window=WINDOW,
    )
    fast_cfg = base.replace(embed_impl="onehot")
    slow_cfg = base.replace(embed_impl="gather")
    fast_model, slow_model = ViscosityModel(fast_cfg), ViscosityModel(slow_cfg)
    variables = fast_model.init(jax.random.PRNGKey(0), batch)

    stripped = dataclasses.replace(
        batch,
        cation=dataclasses.replace(batch.cation, pool_slot=None),
        anion=dataclasses.replace(batch.anion, pool_slot=None),
    )
    p_fast = fast_model.apply(variables, batch)["pred"]
    p_slow = slow_model.apply(variables, stripped)["pred"]
    np.testing.assert_allclose(np.asarray(p_fast), np.asarray(p_slow),
                               rtol=1e-4, atol=1e-4)

    def loss(params, model, b):
        out = model.apply({"params": params}, b)["pred"]
        return jnp.mean((out - b.y) ** 2)

    g_fast = jax.grad(loss)(variables["params"], fast_model, batch)
    g_slow = jax.grad(loss)(variables["params"], slow_model, stripped)
    for a, b in zip(jax.tree.leaves(g_fast), jax.tree.leaves(g_slow)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-4)
