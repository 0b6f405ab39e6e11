"""fit() with the native loader matches the Python-loader trajectory."""

import numpy as np
import pytest

from ionic_mpnn_tpu import native
from ionic_mpnn_tpu.config import TrainConfig, viscosity_config
from ionic_mpnn_tpu.data import plan_capacities
from ionic_mpnn_tpu.models import ViscosityModel
from ionic_mpnn_tpu.training import fit


@pytest.mark.skipif(not native.native_available(), reason="g++ unavailable")
def test_fit_native_loader_matches_python(encoded_viscosity):
    records = encoded_viscosity["viscosity"][:96]
    vocab = encoded_viscosity["vocab"]
    train, dev = records[:80], records[80:]
    cfg = viscosity_config(vocab.atom_vocab_size, vocab.bond_vocab_size, num_steps=1)
    plan = plan_capacities(train, batch_size=16)
    model = ViscosityModel(cfg)

    base = TrainConfig(epochs=3, early_stopping_patience=10, seed=2)
    r_native = fit(model, cfg, base, train, dev, plan, verbose=False)
    r_python = fit(model, cfg, base.replace(use_native_loader=False),
                   train, dev, plan, verbose=False)

    # bit-identical batches (tested at the packer level) -> identical losses
    np.testing.assert_allclose(r_native.history["loss"], r_python.history["loss"],
                               rtol=1e-6)
    np.testing.assert_allclose(r_native.history["val_loss"],
                               r_python.history["val_loss"], rtol=1e-6)


@pytest.mark.skipif(not native.native_available(), reason="g++ unavailable")
@pytest.mark.parametrize("edge_layout", ["sorted", "window_aligned"])
def test_fit_native_group_mode_matches_python(encoded_viscosity, edge_layout):
    """steps_per_call>1 + native loader takes the group-buffer path (C++
    packs straight into pre-stacked (K, ...) buffers); trajectories must
    match the Python loader + np.stack path exactly."""
    records = encoded_viscosity["viscosity"][:96]
    vocab = encoded_viscosity["vocab"]
    train, dev = records[:80], records[80:]
    impl = "onehot" if edge_layout == "window_aligned" else "gather"
    cfg = viscosity_config(vocab.atom_vocab_size, vocab.bond_vocab_size,
                           num_steps=1, message_impl=impl)
    plan = plan_capacities(train, batch_size=16, edge_layout=edge_layout)
    model = ViscosityModel(cfg)

    # K=3 with 80/16 = 5 batches: one full group + one PADDED group
    base = TrainConfig(epochs=3, early_stopping_patience=10, seed=2,
                       steps_per_call=3)
    r_native = fit(model, cfg, base, train, dev, plan, verbose=False)
    r_python = fit(model, cfg, base.replace(use_native_loader=False),
                   train, dev, plan, verbose=False)

    np.testing.assert_allclose(r_native.history["loss"], r_python.history["loss"],
                               rtol=1e-6)
    np.testing.assert_allclose(r_native.history["val_loss"],
                               r_python.history["val_loss"], rtol=1e-6)


@pytest.mark.skipif(not native.native_available(), reason="g++ unavailable")
def test_group_iterator_matches_stacked_batches(encoded_viscosity):
    """iter_batch_groups_fast == tree-stacked iter_batches_fast batches
    (bit-identical, including the padded tail group)."""
    import jax

    from ionic_mpnn_tpu.data.columnar import (
        ColumnarIonPairs,
        iter_batch_groups_fast,
        iter_batches_fast,
    )
    from ionic_mpnn_tpu.data.packing import pack_ion_pair_batch, window_tile_batch

    records = encoded_viscosity["viscosity"][:80]
    plan = plan_capacities(records, batch_size=16, edge_layout="window_aligned")
    data = ColumnarIonPairs.from_records(records)
    K = 3
    batches = list(iter_batches_fast(data, plan, shuffle=True, seed=7))
    empty = pack_ion_pair_batch([], batch_size=plan.batch_size,
                                node_cap=plan.node_cap, edge_cap=plan.edge_cap,
                                target_key=plan.target_key,
                                duplicate_edges=plan.duplicate_edges,
                                anion_node_cap=plan.anion_node_cap,
                                anion_edge_cap=plan.anion_edge_cap)
    empty = window_tile_batch(empty, plan.edge_tile, plan.window, aligned=True,
                              anion_tile=plan.anion_edge_tile)
    groups = list(iter_batch_groups_fast(data, plan, K, shuffle=True, seed=7))
    assert len(groups) == (len(batches) + K - 1) // K
    for gi, (stacked, n_real) in enumerate(groups):
        expect_members = batches[gi * K:(gi + 1) * K]
        n_expect = sum(int(np.asarray(b.sample_mask).sum()) for b in expect_members)
        assert n_real == n_expect
        expect_members = expect_members + [empty] * (K - len(expect_members))
        expect = jax.tree.map(lambda *xs: np.stack(xs), *expect_members)
        for a, b in zip(jax.tree.leaves(stacked), jax.tree.leaves(expect)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
