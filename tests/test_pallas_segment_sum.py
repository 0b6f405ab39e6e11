"""Pallas sorted-segment-sum kernel: interpret-mode correctness on CPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ionic_mpnn_tpu.ops.pallas.segment_sum import (
    segment_sum_vjp,
    sorted_segment_sum,
    window_ptr,
)


def _random_sorted_edges(rng, E, N, D):
    dst = np.sort(rng.integers(0, N, E)).astype(np.int32)
    msg = rng.normal(size=(E, D)).astype(np.float32)
    return jnp.array(msg), jnp.array(dst)


@pytest.mark.parametrize("E,N,D", [(256, 128, 32), (1000, 300, 32), (128, 512, 8)])
def test_kernel_matches_xla_segment_sum(E, N, D):
    rng = np.random.default_rng(0)
    msg, dst = _random_sorted_edges(rng, E, N, D)
    expected = jax.ops.segment_sum(msg, dst, num_segments=N)
    got = sorted_segment_sum(msg, dst, N, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), rtol=1e-5, atol=1e-5)


def test_kernel_handles_gaps_and_empty_nodes():
    # dst concentrated at a few nodes with big gaps
    dst = jnp.array(np.sort([0, 0, 5, 5, 5, 200, 200, 511]).astype(np.int32))
    msg = jnp.array(np.random.default_rng(1).normal(size=(8, 16)).astype(np.float32))
    expected = jax.ops.segment_sum(msg, dst, num_segments=512)
    got = sorted_segment_sum(msg, dst, 512, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), rtol=1e-5, atol=1e-5)


def test_kernel_on_packed_molecular_batch(encoded_viscosity):
    from ionic_mpnn_tpu.data import iter_batches, plan_capacities
    from ionic_mpnn_tpu.ops import bond_type_matrices, edge_messages_from_table

    records = encoded_viscosity["viscosity"][:32]
    plan = plan_capacities(records, batch_size=32)
    batch = next(iter_batches(records, plan))
    g = batch.cation
    rng = np.random.default_rng(2)
    vocab = encoded_viscosity["vocab"]
    table = jnp.array(rng.normal(size=(vocab.bond_vocab_size + 1, 8)).astype(np.float32))
    W = jnp.array(rng.normal(size=(8, 16, 16)).astype(np.float32))
    h = jnp.array(rng.normal(size=(g.atom_ids.shape[0], 16)).astype(np.float32))
    m_table = bond_type_matrices(table, W)
    msgs = edge_messages_from_table(h, jnp.array(g.bond_ids), jnp.array(g.src), m_table)
    msgs = msgs * jnp.array(g.edge_mask)[:, None]

    N = g.atom_ids.shape[0]
    expected = jax.ops.segment_sum(msgs, jnp.array(g.dst), num_segments=N)
    got = sorted_segment_sum(msgs, jnp.array(g.dst), N, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), rtol=1e-4, atol=1e-4)


def test_underfilled_batch_pad_edges_do_not_flood_window0(encoded_viscosity):
    """Regression: pad edges used to all carry dst=0, overflowing window 0's
    static tile budget on underfilled batches and silently dropping real
    messages. Pads are now spread across the node range at pack time."""
    from ionic_mpnn_tpu.data.packing import pack_graphs

    records = encoded_viscosity["viscosity"][:4]
    graphs = [r["cation"] for r in records]
    # huge edge capacity relative to real edges -> thousands of pad edges
    packed = pack_graphs(graphs, node_cap=256, edge_cap=4096)
    assert packed.edge_mask.sum() < 400
    rng = np.random.default_rng(0)
    msgs = jnp.array(rng.normal(size=(4096, 16)).astype(np.float32))
    msgs = msgs * jnp.array(packed.edge_mask)[:, None]
    N = 256
    expected = jax.ops.segment_sum(msgs, jnp.array(packed.dst), num_segments=N)
    got = sorted_segment_sum(msgs, jnp.array(packed.dst), N, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), rtol=1e-4, atol=1e-4)
    # and real node-0..127 rows are nonzero where expected
    assert np.abs(np.asarray(expected)[:64]).sum() > 0


def test_window_ptr():
    dst = jnp.array([0, 0, 3, 130, 130, 260], dtype=jnp.int32)
    ptr, nw = window_ptr(dst, 384, window=128)
    assert nw == 3
    np.testing.assert_array_equal(np.asarray(ptr), [0, 3, 5, 6])


def test_vjp_gradient_matches_xla():
    rng = np.random.default_rng(3)
    msg, dst = _random_sorted_edges(rng, 256, 100, 16)

    def loss_pallas(m):
        out = segment_sum_vjp(m, dst, 100, True)
        return jnp.sum(out ** 2)

    def loss_xla(m):
        out = jax.ops.segment_sum(m, dst, num_segments=100)
        return jnp.sum(out ** 2)

    g_pallas = jax.grad(loss_pallas)(msg)
    g_xla = jax.grad(loss_xla)(msg)
    np.testing.assert_allclose(np.asarray(g_pallas), np.asarray(g_xla), rtol=1e-4, atol=1e-4)
