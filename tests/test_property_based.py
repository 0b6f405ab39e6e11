"""Property-based tests (hypothesis): packing invariants + op equivalences."""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from ionic_mpnn_tpu.data.packing import pack_graphs, round_up


@st.composite
def molecule(draw, max_atoms=12, atom_vocab=6, bond_vocab=4):
    n = draw(st.integers(1, max_atoms))
    n_bonds = draw(st.integers(0, max(0, n * 2)))
    edges, bonds = [], []
    for _ in range(n_bonds):
        i = draw(st.integers(0, n - 1))
        j = draw(st.integers(0, n - 1))
        b = draw(st.integers(0, bond_vocab - 1))
        edges += [(i, j), (j, i)]
        bonds += [b, b]
    return {
        "atom_ids": [draw(st.integers(0, atom_vocab - 1)) for _ in range(n)],
        "bond_ids": bonds,
        "edge_indices": edges,
        "num_atoms": n,
    }


@st.composite
def molecule_list(draw):
    return draw(st.lists(molecule(), min_size=1, max_size=6))


@given(molecule_list())
@settings(max_examples=40, deadline=None)
def test_packing_invariants(graphs):
    total_atoms = sum(g["num_atoms"] for g in graphs)
    total_edges = sum(len(g["edge_indices"]) for g in graphs)
    node_cap = round_up(total_atoms, 8)
    edge_cap = round_up(max(total_edges, 1), 8)
    packed = pack_graphs(graphs, node_cap, edge_cap)

    # node bookkeeping
    assert int(packed.node_mask.sum()) == total_atoms
    assert int(packed.edge_mask.sum()) == total_edges
    # ids offset by +1; pads are 0
    assert packed.atom_ids[packed.node_mask].min() >= 1 if total_atoms else True
    assert (packed.atom_ids[~packed.node_mask] == 0).all()
    # dst globally sorted (pads included)
    assert (np.diff(packed.dst) >= 0).all()
    # every real edge points at a real node of the same graph
    real = packed.edge_mask
    if real.any():
        assert packed.node_mask[packed.src[real]].all()
        assert packed.node_mask[packed.dst[real]].all()
        assert (packed.node_graph[packed.src[real]] == packed.node_graph[packed.dst[real]]).all()
    # per-graph atom counts preserved
    for gi, g in enumerate(graphs):
        assert int(((packed.node_graph == gi) & packed.node_mask).sum()) == g["num_atoms"]
        # local ids are 0..n-1
        locals_ = np.sort(packed.node_local[(packed.node_graph == gi) & packed.node_mask])
        np.testing.assert_array_equal(locals_, np.arange(g["num_atoms"]))


@given(molecule_list(), st.integers(0, 2 ** 31 - 1))
@settings(max_examples=20, deadline=None)
def test_packed_aggregate_matches_brute_force(graphs, seed):
    import jax.numpy as jnp

    from ionic_mpnn_tpu.ops import bond_type_matrices, message_pass_aggregate

    rng = np.random.default_rng(seed)
    D, F, atom_vocab, bond_vocab = 4, 3, 6, 4
    total_atoms = sum(g["num_atoms"] for g in graphs)
    total_edges = sum(len(g["edge_indices"]) for g in graphs)
    packed = pack_graphs(graphs, round_up(total_atoms, 8), round_up(max(total_edges, 1), 8))

    atom_table = rng.normal(size=(atom_vocab + 1, D)).astype(np.float32)
    bond_table = rng.normal(size=(bond_vocab + 1, F)).astype(np.float32)
    W = rng.normal(size=(F, D, D)).astype(np.float32)

    h = jnp.array(atom_table[packed.atom_ids])
    m_table = bond_type_matrices(jnp.array(bond_table), jnp.array(W))
    agg = np.asarray(message_pass_aggregate(
        h, jnp.array(packed.bond_ids), jnp.array(packed.src),
        jnp.array(packed.dst), m_table, jnp.array(packed.edge_mask)))

    # brute force per graph in original molecule coordinates
    offsets = {}
    off = 0
    for gi, g in enumerate(graphs):
        offsets[gi] = {}
        rows = np.flatnonzero((packed.node_graph == gi) & packed.node_mask)
        for r in rows:
            offsets[gi][int(packed.node_local[r])] = r

    for gi, g in enumerate(graphs):
        expected = np.zeros((g["num_atoms"], D), np.float32)
        for (s, t), b in zip(g["edge_indices"], g["bond_ids"]):
            M = np.einsum("f,fij->ij", bond_table[b + 1], W)
            h_s = atom_table[g["atom_ids"][s] + 1]
            expected[t] += M @ h_s
        for a in range(g["num_atoms"]):
            np.testing.assert_allclose(
                agg[offsets[gi][a]], expected[a], rtol=1e-3, atol=1e-3,
                err_msg=f"graph {gi} atom {a}",
            )
