"""Packed-op correctness: allclose vs the dense reference semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ionic_mpnn_tpu.data.packing import pack_graphs, pad_dense_batch
from ionic_mpnn_tpu.ops import (
    aggregate_to_nodes,
    bond_type_matrices,
    edge_messages_dense,
    edge_messages_from_table,
    gated_update,
    graph_sum_pool,
    message_pass_aggregate,
    message_pass_aggregate_typed,
    parity_edge_mask,
)
from ionic_mpnn_tpu.ops.dense_reference import (
    dense_bond_matrix_message,
    dense_gated_update,
    dense_global_sum_pool,
    dense_reduce,
)
from ionic_mpnn_tpu.ops.gru import GATED_UPDATE_PARAM_SHAPES


def _random_graphs(rng, n_graphs=5, max_atoms=9, atom_vocab=7, bond_vocab=4):
    graphs = []
    for _ in range(n_graphs):
        n = int(rng.integers(2, max_atoms))
        edges, bonds = [], []
        # random connected-ish multigraph; stored edges bidirectional like
        # the featurizer output
        for i in range(1, n):
            j = int(rng.integers(0, i))
            b = int(rng.integers(0, bond_vocab))
            edges += [(i, j), (j, i)]
            bonds += [b, b]
        graphs.append(
            {
                "atom_ids": rng.integers(0, atom_vocab, n).tolist(),
                "bond_ids": bonds,
                "edge_indices": edges,
                "num_atoms": n,
            }
        )
    return graphs


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(0)
    graphs = _random_graphs(rng)
    D, F = 8, 4
    atom_vocab, bond_vocab = 7, 4
    atom_table = rng.normal(size=(atom_vocab + 1, D)).astype(np.float32)
    bond_table = rng.normal(size=(bond_vocab + 1, F)).astype(np.float32)
    W = rng.normal(size=(F, D, D)).astype(np.float32) * 0.2
    return dict(
        rng=rng, graphs=graphs, D=D, F=F,
        atom_table=atom_table, bond_table=bond_table, W=W,
    )


def test_bond_type_table_equals_dense_contract(setup):
    """M_table[v] @ h == tensordot(embed[v], W) @ h for every bond type."""
    m_table = bond_type_matrices(jnp.array(setup["bond_table"]), jnp.array(setup["W"]))
    direct = jnp.einsum("vf,fij->vij", setup["bond_table"], setup["W"])
    np.testing.assert_allclose(np.asarray(m_table), np.asarray(direct), rtol=1e-5, atol=1e-5)


def test_edge_messages_table_vs_dense_bondstates(setup):
    packed = pack_graphs(setup["graphs"], node_cap=64, edge_cap=128, duplicate_edges=True)
    h = jnp.array(setup["atom_table"][packed.atom_ids])
    bond_states = jnp.array(setup["bond_table"][packed.bond_ids])
    m_table = bond_type_matrices(jnp.array(setup["bond_table"]), jnp.array(setup["W"]))
    via_table = edge_messages_from_table(h, jnp.array(packed.bond_ids), jnp.array(packed.src), m_table)
    via_dense = edge_messages_dense(h, bond_states, jnp.array(packed.src), jnp.array(setup["W"]))
    np.testing.assert_allclose(np.asarray(via_table), np.asarray(via_dense), rtol=2e-4, atol=2e-4)


def test_edge_messages_dense_chunked_matches_unchunked():
    rng = np.random.default_rng(1)
    E, N, F, D = 32, 16, 512, 8
    h = jnp.array(rng.normal(size=(N, D)).astype(np.float32))
    b = jnp.array(rng.normal(size=(E, F)).astype(np.float32))
    src = jnp.array(rng.integers(0, N, E).astype(np.int32))
    W = jnp.array(rng.normal(size=(F, D, D)).astype(np.float32) * 0.05)
    full = edge_messages_dense(h, b, src, W, f_chunk=512)
    chunked = edge_messages_dense(h, b, src, W, f_chunk=128)
    np.testing.assert_allclose(np.asarray(full), np.asarray(chunked), rtol=2e-4, atol=2e-4)


def _dense_inputs(setup):
    graphs = setup["graphs"]
    max_atoms = max(g["num_atoms"] for g in graphs)
    max_edges = max(len(g["edge_indices"]) for g in graphs)
    return pad_dense_batch(graphs, max_atoms + 1, max_edges), max_atoms + 1


def test_full_message_pass_parity_packed_vs_dense(setup):
    """One full message+reduce step: packed parity path == dense reference.

    The dense path embeds padded ids (pad id 0 -> embedding row 0) and runs
    the reference quirk masks; the packed path uses parity_edge_mask. The
    resulting per-molecule aggregates must match for every real atom.
    """
    dense, n_atoms = _dense_inputs(setup)
    atom_table, bond_table, W = (jnp.array(setup[k]) for k in ("atom_table", "bond_table", "W"))

    h_dense = atom_table[dense["atom"]]  # (B, N, D)
    b_dense = bond_table[dense["bond"]]  # (B, E, F)
    msg = dense_bond_matrix_message(h_dense, b_dense, jnp.array(dense["conn"]), W)
    agg_dense = dense_reduce(msg, jnp.array(dense["conn"][..., 1]), n_atoms)

    packed = pack_graphs(setup["graphs"], node_cap=64, edge_cap=256, duplicate_edges=True)
    h_packed = atom_table[packed.atom_ids]
    m_table = bond_type_matrices(bond_table, W)
    mask = parity_edge_mask(
        jnp.array(packed.src), jnp.array(packed.dst),
        jnp.array(packed.node_local), jnp.array(packed.edge_mask),
    )
    agg_packed = message_pass_aggregate(
        h_packed, jnp.array(packed.bond_ids), jnp.array(packed.src),
        jnp.array(packed.dst), m_table, mask,
    )

    # compare per real atom
    for g_idx, g in enumerate(setup["graphs"]):
        for a in range(g["num_atoms"]):
            flat_pos = np.flatnonzero(
                (packed.node_graph == g_idx) & (packed.node_local == a) & packed.node_mask
            )[0]
            np.testing.assert_allclose(
                np.asarray(agg_packed)[flat_pos],
                np.asarray(agg_dense)[g_idx, a],
                rtol=1e-4, atol=1e-4,
                err_msg=f"graph {g_idx} atom {a}",
            )


def test_parity_quirk_atom0_receives_and_sends_nothing(setup):
    packed = pack_graphs(setup["graphs"], node_cap=64, edge_cap=256, duplicate_edges=True)
    mask = parity_edge_mask(
        jnp.array(packed.src), jnp.array(packed.dst),
        jnp.array(packed.node_local), jnp.array(packed.edge_mask),
    )
    src_local = packed.node_local[packed.src]
    dst_local = packed.node_local[packed.dst]
    touches0 = (src_local == 0) | (dst_local == 0)
    assert not np.any(np.asarray(mask) & touches0 & packed.edge_mask)


def test_clean_mode_atom0_participates(setup):
    """Without the quirk, atom 0 aggregates its neighbors' messages."""
    packed = pack_graphs(setup["graphs"], node_cap=64, edge_cap=256)
    atom_table, bond_table, W = (jnp.array(setup[k]) for k in ("atom_table", "bond_table", "W"))
    h = atom_table[packed.atom_ids]
    m_table = bond_type_matrices(bond_table, W)
    agg = message_pass_aggregate(
        h, jnp.array(packed.bond_ids), jnp.array(packed.src),
        jnp.array(packed.dst), m_table, jnp.array(packed.edge_mask),
    )
    first_atom_rows = np.flatnonzero((packed.node_local == 0) & packed.node_mask)
    assert np.abs(np.asarray(agg)[first_atom_rows]).sum() > 0


def test_gated_update_packed_vs_dense(setup):
    rng = np.random.default_rng(2)
    D = setup["D"]
    params = {
        k: jnp.array(rng.normal(size=s).astype(np.float32) * 0.3)
        for k, s in GATED_UPDATE_PARAM_SHAPES(D).items()
    }
    params["ln_scale"] = jnp.ones(D)
    params["ln_bias"] = jnp.zeros(D)
    N = 12
    h = jnp.array(rng.normal(size=(N, D)).astype(np.float32))
    agg = jnp.array(rng.normal(size=(N, D)).astype(np.float32))
    packed_out = gated_update(h, agg, params)
    dense_out = dense_gated_update(h[None], agg[None], params)[0]
    np.testing.assert_allclose(np.asarray(packed_out), np.asarray(dense_out), rtol=1e-5, atol=1e-5)


def test_graph_sum_pool_matches_dense(setup):
    dense, n_atoms = _dense_inputs(setup)
    atom_table = jnp.array(setup["atom_table"])
    h_dense = atom_table[dense["atom"]]
    pooled_dense = dense_global_sum_pool(h_dense, jnp.array(dense["atom"]))

    packed = pack_graphs(setup["graphs"], node_cap=64, edge_cap=256)
    h_packed = atom_table[packed.atom_ids]
    pooled_packed = graph_sum_pool(
        h_packed, jnp.array(packed.node_graph), packed.n_graphs, jnp.array(packed.node_mask)
    )
    np.testing.assert_allclose(
        np.asarray(pooled_packed), np.asarray(pooled_dense), rtol=1e-4, atol=1e-4
    )


def test_typed_aggregation_matches_gather(setup):
    """Type-bucketed MXU formulation == gather formulation (both mask styles)."""
    packed = pack_graphs(setup["graphs"], node_cap=64, edge_cap=256, duplicate_edges=True)
    h = jnp.array(setup["atom_table"][packed.atom_ids])
    m_table = bond_type_matrices(jnp.array(setup["bond_table"]), jnp.array(setup["W"]))
    for mask in (
        jnp.array(packed.edge_mask),
        parity_edge_mask(
            jnp.array(packed.src), jnp.array(packed.dst),
            jnp.array(packed.node_local), jnp.array(packed.edge_mask),
        ),
    ):
        ref = message_pass_aggregate(
            h, jnp.array(packed.bond_ids), jnp.array(packed.src),
            jnp.array(packed.dst), m_table, mask,
        )
        typed = message_pass_aggregate_typed(
            h, jnp.array(packed.bond_ids), jnp.array(packed.src),
            jnp.array(packed.dst), m_table, mask,
        )
        np.testing.assert_allclose(np.asarray(typed), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_aggregate_is_deterministic_and_jittable(setup):
    packed = pack_graphs(setup["graphs"], node_cap=64, edge_cap=256)
    h = jnp.array(setup["atom_table"][packed.atom_ids])
    m_table = bond_type_matrices(jnp.array(setup["bond_table"]), jnp.array(setup["W"]))
    fn = jax.jit(
        lambda h: message_pass_aggregate(
            h, jnp.array(packed.bond_ids), jnp.array(packed.src),
            jnp.array(packed.dst), m_table, jnp.array(packed.edge_mask),
        )
    )
    a, b = fn(h), fn(h)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
