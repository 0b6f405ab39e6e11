"""Fused message+aggregate Pallas kernel: interpret-mode correctness.

Reference math: out[n] = Σ_{e: dst_e=n} mask_e · M[bond_e] @ h[src_e]
(= ionic_mpnn_tpu.ops.message_pass_aggregate, the XLA path)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ionic_mpnn_tpu.ops import bond_type_matrices, message_pass_aggregate
from ionic_mpnn_tpu.ops.pallas.fused_message import (
    check_src_locality,
    fused_message_aggregate,
    message_table_to_lanes,
    transpose_lane_table,
)
from ionic_mpnn_tpu.ops.pallas.segment_sum import PallasCapacityError


def _molecular_edges(rng, n_mols, max_atoms, N, V):
    """Random packed-style graph: contiguous molecules, dst-sorted,
    edge-reversal-symmetric with equal bond ids, self-loop pads."""
    src, dst, bond = [], [], []
    base = 0
    for _ in range(n_mols):
        na = int(rng.integers(2, max_atoms + 1))
        if base + na > N:
            break
        for i in range(na - 1):  # chain bonds both directions
            b = int(rng.integers(1, V))
            src += [base + i, base + i + 1]
            dst += [base + i + 1, base + i]
            bond += [b, b]
        base += na
    order = np.argsort(dst, kind="stable")
    src = np.asarray(src, np.int32)[order]
    dst = np.asarray(dst, np.int32)[order]
    bond = np.asarray(bond, np.int32)[order]
    E = len(src)
    mask = np.ones(E, np.float32)
    # append pad self-loops spread over the node range (sorted merge)
    n_pad = 37
    pad_nodes = np.sort(rng.integers(0, N, n_pad)).astype(np.int32)
    src = np.concatenate([src, pad_nodes])
    dst = np.concatenate([dst, pad_nodes])
    bond = np.concatenate([bond, np.zeros(n_pad, np.int32)])
    mask = np.concatenate([mask, np.zeros(n_pad, np.float32)])
    order = np.argsort(dst, kind="stable")
    return src[order], dst[order], bond[order], mask[order]


@pytest.mark.parametrize("N,D,V,seed", [(256, 32, 7, 0), (384, 16, 5, 1)])
def test_fused_matches_xla_path(N, D, V, seed):
    rng = np.random.default_rng(seed)
    src, dst, bond, mask = _molecular_edges(rng, 40, 20, N, V)
    h = jnp.array(rng.normal(size=(N, D)).astype(np.float32))
    table = jnp.array(rng.normal(size=(V, 8)).astype(np.float32))
    W = jnp.array((rng.normal(size=(8, D, D)) * 0.3).astype(np.float32))
    m_table = bond_type_matrices(table, W)

    expected = message_pass_aggregate(
        h, jnp.array(bond), jnp.array(src), jnp.array(dst), m_table,
        jnp.array(mask) > 0,
    )
    got = fused_message_aggregate(
        h, message_table_to_lanes(m_table), jnp.array(bond), jnp.array(src),
        jnp.array(dst), jnp.array(mask), N, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               rtol=2e-4, atol=2e-4)


def test_fused_cross_window_edges():
    """Molecule straddling a window boundary: src in window w-1/w+1."""
    rng = np.random.default_rng(3)
    N, D, V = 256, 8, 3
    # one molecule spanning nodes 120..136 (crosses the 128 boundary)
    src = np.asarray([120 + i for i in range(16)] + [121 + i for i in range(16)], np.int32)
    dst = np.asarray([121 + i for i in range(16)] + [120 + i for i in range(16)], np.int32)
    bond = np.tile(np.asarray([1, 2], np.int32), 16)
    order = np.argsort(dst, kind="stable")
    src, dst, bond = src[order], dst[order], bond[order]
    mask = np.ones(len(src), np.float32)
    h = jnp.array(rng.normal(size=(N, D)).astype(np.float32))
    m_table = jnp.array(rng.normal(size=(V, D, D)).astype(np.float32))

    expected = message_pass_aggregate(
        h, jnp.array(bond), jnp.array(src), jnp.array(dst), m_table,
        jnp.array(mask) > 0,
    )
    got = fused_message_aggregate(
        h, message_table_to_lanes(m_table), jnp.array(bond), jnp.array(src),
        jnp.array(dst), jnp.array(mask), N, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               rtol=1e-5, atol=1e-5)


def test_fused_gradients_match_xla_path():
    rng = np.random.default_rng(4)
    N, D, V = 256, 16, 4
    src, dst, bond, mask = _molecular_edges(rng, 30, 15, N, V)
    h = jnp.array(rng.normal(size=(N, D)).astype(np.float32))
    m_table = jnp.array((rng.normal(size=(V, D, D)) * 0.3).astype(np.float32))
    cot = jnp.array(rng.normal(size=(N, D)).astype(np.float32))
    b_, s_, d_, m_ = (jnp.array(bond), jnp.array(src), jnp.array(dst),
                      jnp.array(mask))

    def loss_ref(h_, mt_):
        out = message_pass_aggregate(h_, b_, s_, d_, mt_, m_ > 0)
        return jnp.sum(out * cot)

    def loss_fused(h_, mt_):
        out = fused_message_aggregate(
            h_, message_table_to_lanes(mt_), b_, s_, d_, m_, N, interpret=True
        )
        return jnp.sum(out * cot)

    gh_ref, gt_ref = jax.grad(loss_ref, argnums=(0, 1))(h, m_table)
    gh, gt = jax.grad(loss_fused, argnums=(0, 1))(h, m_table)
    np.testing.assert_allclose(np.asarray(gh), np.asarray(gh_ref),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(gt), np.asarray(gt_ref),
                               rtol=2e-4, atol=2e-4)


def test_lane_table_roundtrip():
    rng = np.random.default_rng(5)
    V, D = 6, 32
    m = jnp.array(rng.normal(size=(V, D, D)).astype(np.float32))
    K = message_table_to_lanes(m)
    # K[j, v*D+i] == m[v, i, j]
    assert float(K[3, 2 * D + 7]) == float(m[2, 7, 3])
    KT = transpose_lane_table(K, V)
    mt = message_table_to_lanes(jnp.transpose(m, (0, 2, 1)))
    np.testing.assert_array_equal(np.asarray(KT), np.asarray(mt))


def test_locality_contract_raises():
    src = np.asarray([0, 300], np.int32)
    dst = np.asarray([0, 1], np.int32)
    with pytest.raises(PallasCapacityError):
        check_src_locality(src, dst, np.ones(2, bool), window=128)
    # masked (pad) violations are fine
    check_src_locality(src, dst, np.asarray([True, False]), window=128)

    rng = np.random.default_rng(6)
    N, D, V = 512, 8, 3
    h = jnp.array(rng.normal(size=(N, D)).astype(np.float32))
    m_table = jnp.array(rng.normal(size=(V, D, D)).astype(np.float32))
    with pytest.raises(PallasCapacityError):
        fused_message_aggregate(
            h, message_table_to_lanes(m_table), jnp.array([1, 1], np.int32),
            jnp.array(src), jnp.array(dst), jnp.ones(2, np.float32), N,
            interpret=True,
        )


def test_fused_on_real_packed_batch(encoded_viscosity):
    from ionic_mpnn_tpu.data import iter_batches, plan_capacities

    records = encoded_viscosity["viscosity"][:32]
    plan = plan_capacities(records, batch_size=32)
    batch = next(iter_batches(records, plan))
    g = batch.cation
    rng = np.random.default_rng(7)
    vocab = encoded_viscosity["vocab"]
    V = vocab.bond_vocab_size + 1
    D = 32
    N = g.atom_ids.shape[0]
    h = jnp.array(rng.normal(size=(N, D)).astype(np.float32))
    table = jnp.array(rng.normal(size=(V, 8)).astype(np.float32))
    W = jnp.array((rng.normal(size=(8, D, D)) * 0.3).astype(np.float32))
    m_table = bond_type_matrices(table, W)

    expected = message_pass_aggregate(
        h, jnp.array(g.bond_ids), jnp.array(g.src), jnp.array(g.dst),
        m_table, jnp.array(g.edge_mask),
    )
    got = fused_message_aggregate(
        h, message_table_to_lanes(m_table), jnp.array(g.bond_ids),
        jnp.array(g.src), jnp.array(g.dst),
        jnp.array(g.edge_mask), N, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               rtol=2e-4, atol=2e-4)
