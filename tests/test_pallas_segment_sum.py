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


# ---------------------------------------------------------------------------
# Capacity contract: overflow must be DETECTED, never a silent edge drop
# ---------------------------------------------------------------------------


def _overflowing_edges(D=8):
    # 3000 edges all landing in window 0 (< node 128) with the default
    # budget max_tiles(16) * tile(128) = 2048 -> 952 edges would be dropped.
    E = 3000
    rng = np.random.default_rng(7)
    dst = np.sort(rng.integers(0, 100, E)).astype(np.int32)
    msg = rng.normal(size=(E, D)).astype(np.float32)
    return jnp.array(msg), jnp.array(dst)


def test_window_overflow_counts_dropped_edges():
    from ionic_mpnn_tpu.ops.pallas.segment_sum import window_overflow

    _, dst = _overflowing_edges()
    dropped = window_overflow(np.asarray(dst), 256)
    # all 3000 edges start in tile 0 of window 0; budget is 2048
    assert dropped == 3000 - 2048
    # a healthy molecular-batch-like distribution has zero overflow
    ok = np.sort(np.random.default_rng(0).integers(0, 4096, 8192)).astype(np.int32)
    assert window_overflow(ok, 4096) == 0


def test_eager_overflow_raises_instead_of_truncating():
    from ionic_mpnn_tpu.ops.pallas.segment_sum import PallasCapacityError

    msg, dst = _overflowing_edges()
    with pytest.raises(PallasCapacityError):
        sorted_segment_sum(msg, dst, 256, interpret=True)


def test_jit_debug_check_raises_via_callback():
    from ionic_mpnn_tpu.ops.pallas.segment_sum import PallasCapacityError

    msg, dst = _overflowing_edges()

    @jax.jit
    def run(m, d):
        return sorted_segment_sum(m, d, 256, interpret=True, debug_check=True)

    with pytest.raises(Exception) as exc_info:
        jax.block_until_ready(run(msg, dst))
    assert "capacity exceeded" in str(exc_info.value)


def test_pack_graphs_rejects_overflowing_graph():
    from ionic_mpnn_tpu.data.packing import GraphCapacityError, pack_graphs

    # one pathological "molecule": a star graph, node 0 with degree 2500
    n = 2501
    edges = [[i, 0] for i in range(1, n)]
    g = {
        "atom_ids": [0] * n,
        "bond_ids": [0] * (n - 1),
        "edge_indices": edges,
        "num_atoms": n,
    }
    with pytest.raises(GraphCapacityError, match="capacity exceeded"):
        pack_graphs([g], node_cap=2560, edge_cap=2560)


def test_native_loader_validates_capacity(encoded_viscosity):
    # normal molecular batches sail through the native-path guard
    from ionic_mpnn_tpu import native

    if not native.native_available():
        pytest.skip("native packer not built")
    from ionic_mpnn_tpu.data import plan_capacities
    from ionic_mpnn_tpu.data.columnar import ColumnarIonPairs, iter_batches_fast

    records = encoded_viscosity["viscosity"][:32]
    plan = plan_capacities(records, batch_size=16)
    data = ColumnarIonPairs.from_records(records, target_key=plan.target_key)
    batches = list(iter_batches_fast(data, plan))
    assert batches
