"""Activation parity vs the ACTUAL reference Keras implementation.

Imports the reference's layer/model code read-only from /root/reference
(no code copied), builds its viscosity Keras model, transplants OUR
parameters into it, and asserts end-to-end prediction parity against our
packed parity-mode model on the same molecules — the SURVEY §7 allclose
contract, including every quirk (atom-0 masking, 4x edge duplication,
GRU-variant with extra residual, VFT clips).
"""

import os
import sys
from pathlib import Path

import numpy as np
import pytest

REFERENCE = Path(os.environ.get("REFERENCE_DIR", "/root/reference"))

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not REFERENCE.exists(), reason="reference repo not mounted"),
]

tf = pytest.importorskip("tensorflow")


@pytest.fixture(scope="module")
def reference_modules():
    os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "2")
    sys.path.insert(0, str(REFERENCE))
    import train_viscosity as ref_train  # noqa: F401  (reference module)

    yield ref_train
    sys.path.remove(str(REFERENCE))


def _flat_params(params):
    from flax import traverse_util
    from flax.core import unfreeze

    return traverse_util.flatten_dict(unfreeze(params))


def _transplant_trunk(ref_model, flat, num_steps):
    """Copy trunk params (embeddings, bond transforms, gated updates) into a
    reference Keras model by layer type/name."""
    from tensorflow.keras.layers import Embedding

    embeddings = [l for l in ref_model.layers if isinstance(l, Embedding)]
    atom_emb, bond_emb = embeddings  # creation order: atom then bond
    atom_emb.set_weights([np.asarray(flat[("trunk", "atom_embed")])])
    bond_emb.set_weights([np.asarray(flat[("trunk", "bond_embed")])])

    for ion, prefix in (("cat_encoder", "cat"), ("an_encoder", "an")):
        for step in range(num_steps):
            ref_model.get_layer(f"{prefix}_bmm_{step}").set_weights(
                [np.asarray(flat[("trunk", ion, f"bmm_{step}", "bond_transform")])]
            )

    gus = [l for l in ref_model.layers if type(l).__name__ == "GatedUpdate"]
    assert len(gus) == 2 * num_steps

    def _suffix(layer):
        s = layer.name.rsplit("_", 1)[-1]
        return int(s) if s.isdigit() else 0

    # Keras auto-names follow creation order (cation steps then anion
    # steps), but the counter is GLOBAL across previously-built models in
    # the process — normalize to the lowest suffix. model.layers itself is
    # topologically sorted, so don't trust list position.
    k0 = min(_suffix(g) for g in gus)
    for gu in gus:
        k = _suffix(gu) - k0
        ion = "cat_encoder" if k < num_steps else "an_encoder"
        step = k % num_steps
        p = ("trunk", ion, f"gru_{step}")
        gu.dense_z.set_weights(
            [np.asarray(flat[p + ("dense_z", "kernel")]), np.asarray(flat[p + ("dense_z", "bias")])]
        )
        gu.dense_r.set_weights(
            [np.asarray(flat[p + ("dense_r", "kernel")]), np.asarray(flat[p + ("dense_r", "bias")])]
        )
        gu.dense_h.set_weights(
            [np.asarray(flat[p + ("dense_h", "kernel")]), np.asarray(flat[p + ("dense_h", "bias")])]
        )
        gu.layernorm.set_weights(
            [np.asarray(flat[p + ("layernorm", "scale")]), np.asarray(flat[p + ("layernorm", "bias")])]
        )


def _transplant(ref_model, flat, num_steps):
    """Trunk + viscosity-head transplant (reference build_model layout)."""
    from tensorflow.keras.layers import Dense

    _transplant_trunk(ref_model, flat, num_steps)
    denses = [l for l in ref_model.layers if isinstance(l, Dense)]
    # creation order: cat fp, an fp, cat proj, an proj, visc_params
    assert len(denses) == 5
    mapping = [
        ("trunk", "cat_encoder", "fp_dense"),
        ("trunk", "an_encoder", "fp_dense"),
        ("trunk", "cat_proj"),
        ("trunk", "an_proj"),
        ("vft_head", "visc_params"),
    ]
    for dense, path in zip(denses, mapping):
        dense.set_weights(
            [np.asarray(flat[path + ("kernel",)]), np.asarray(flat[path + ("bias",)])]
        )


def test_viscosity_end_to_end_activation_parity(reference_modules, encoded_viscosity):
    import jax

    from ionic_mpnn_tpu.config import viscosity_config
    from ionic_mpnn_tpu.data import iter_batches, plan_capacities
    from ionic_mpnn_tpu.data.packing import pad_dense_batch
    from ionic_mpnn_tpu.models import ViscosityModel

    ref_train = reference_modules
    vocab = encoded_viscosity["vocab"]
    records = encoded_viscosity["viscosity"][:12]

    # ---- our packed parity-mode model ----
    cfg = viscosity_config(vocab.atom_vocab_size, vocab.bond_vocab_size,
                           parity_mode=True)
    plan = plan_capacities(records, batch_size=12, duplicate_edges=True)
    batch = next(iter_batches(records, plan))
    model = ViscosityModel(cfg)
    variables = model.init(jax.random.PRNGKey(7), batch)
    ours = np.asarray(model.apply(variables, batch)["pred"])

    # ---- reference Keras model with the SAME weights ----
    ref_model = ref_train.build_model(
        atom_vocab_size=vocab.atom_vocab_size + 1,
        bond_vocab_size=vocab.bond_vocab_size + 1,
    )
    flat = _flat_params(variables["params"])
    _transplant(ref_model, flat, num_steps=4)

    max_atoms = max(
        max(r["cation"]["num_atoms"] for r in records),
        max(r["anion"]["num_atoms"] for r in records),
    )
    max_edges = max(
        max(len(r["cation"]["edge_indices"]) for r in records),
        max(len(r["anion"]["edge_indices"]) for r in records),
    )
    cat = pad_dense_batch([r["cation"] for r in records], max_atoms, max_edges)
    an = pad_dense_batch([r["anion"] for r in records], max_atoms, max_edges)
    ref_inputs = {
        "cat_atom": cat["atom"], "cat_bond": cat["bond"], "cat_connectivity": cat["conn"],
        "an_atom": an["atom"], "an_bond": an["bond"], "an_connectivity": an["conn"],
        "temperature": np.array([[r["T"]] for r in records], np.float32),
    }
    theirs = ref_model.predict(ref_inputs, verbose=0).flatten()

    np.testing.assert_allclose(ours, theirs, rtol=2e-4, atol=2e-4)


def test_melting_point_end_to_end_activation_parity(reference_modules, encoded_viscosity):
    """Same contract for the melting-point model: reference Keras build
    (train_melting_point.py:137-215, bond_dim = atom_dim² = 1024) with OUR
    transplanted weights must match the packed parity-mode model."""
    import jax

    sys.path.insert(0, str(REFERENCE))
    import train_melting_point as ref_mp

    from ionic_mpnn_tpu.config import melting_point_config
    from ionic_mpnn_tpu.data import iter_batches, plan_capacities
    from ionic_mpnn_tpu.data.packing import pad_dense_batch
    from ionic_mpnn_tpu.models import MeltingPointModel

    vocab = encoded_viscosity["vocab"]
    records = encoded_viscosity["mp"][:8]

    cfg = melting_point_config(vocab.atom_vocab_size, vocab.bond_vocab_size,
                               parity_mode=True)
    plan = plan_capacities(records, batch_size=8, duplicate_edges=True,
                           with_temperature=False, target_key="mp")
    batch = next(iter_batches(records, plan))
    model = MeltingPointModel(cfg)
    variables = model.init(jax.random.PRNGKey(11), batch)
    ours = np.asarray(model.apply(variables, batch)["pred"])

    ref_model = ref_mp.build_model(
        atom_vocab_size=vocab.atom_vocab_size + 1,
        bond_vocab_size=vocab.bond_vocab_size + 1,
    )
    flat = _flat_params(variables["params"])
    _transplant_trunk(ref_model, flat, num_steps=4)
    # MP head: creation order = cat fp, an fp, cat proj, an proj,
    # head Dense(32,relu), head Dense(1) (train_melting_point.py:173,191-198)
    from tensorflow.keras.layers import Dense

    denses = [l for l in ref_model.layers if isinstance(l, Dense)]
    assert len(denses) == 6
    mapping = [
        ("trunk", "cat_encoder", "fp_dense"),
        ("trunk", "an_encoder", "fp_dense"),
        ("trunk", "cat_proj"),
        ("trunk", "an_proj"),
        ("head_dense",),
        ("head_out",),
    ]
    for dense, path in zip(denses, mapping):
        dense.set_weights(
            [np.asarray(flat[path + ("kernel",)]), np.asarray(flat[path + ("bias",)])]
        )

    max_atoms = max(
        max(r["cation"]["num_atoms"] for r in records),
        max(r["anion"]["num_atoms"] for r in records),
    )
    max_edges = max(
        max(len(r["cation"]["edge_indices"]) for r in records),
        max(len(r["anion"]["edge_indices"]) for r in records),
    )
    cat = pad_dense_batch([r["cation"] for r in records], max_atoms, max_edges)
    an = pad_dense_batch([r["anion"] for r in records], max_atoms, max_edges)
    theirs = ref_model.predict(
        {
            "cat_atom": cat["atom"], "cat_bond": cat["bond"], "cat_connectivity": cat["conn"],
            "an_atom": an["atom"], "an_bond": an["bond"], "an_connectivity": an["conn"],
        },
        verbose=0,
    ).flatten()
    np.testing.assert_allclose(ours, theirs, rtol=2e-3, atol=2e-3)


def test_layer_level_parity_bond_matrix_message(reference_modules, encoded_viscosity):
    """Single-layer check: reference BondMatrixMessage+Reduce vs our fused op."""
    import jax.numpy as jnp

    from ionic_mpnn_tpu.data import iter_batches, plan_capacities
    from ionic_mpnn_tpu.data.packing import pad_dense_batch
    from ionic_mpnn_tpu.ops import (
        bond_type_matrices, message_pass_aggregate, parity_edge_mask,
    )

    sys.path.insert(0, str(REFERENCE))
    from models.layers import BondMatrixMessage as RefBMM, Reduce as RefReduce

    vocab = encoded_viscosity["vocab"]
    records = encoded_viscosity["viscosity"][:6]
    rng = np.random.default_rng(0)
    D, F = 16, 8
    atom_table = rng.normal(size=(vocab.atom_vocab_size + 1, D)).astype(np.float32)
    bond_table = rng.normal(size=(vocab.bond_vocab_size + 1, F)).astype(np.float32)
    W = (rng.normal(size=(F, D, D)) * 0.2).astype(np.float32)

    # reference path (dense)
    graphs = [r["cation"] for r in records]
    max_atoms = max(g["num_atoms"] for g in graphs)
    max_edges = max(len(g["edge_indices"]) for g in graphs)
    dense = pad_dense_batch(graphs, max_atoms, max_edges)
    h_dense = tf.constant(atom_table[dense["atom"]])
    b_dense = tf.constant(bond_table[dense["bond"]])
    conn = tf.constant(dense["conn"])
    ref_bmm = RefBMM(D, F)
    _ = ref_bmm([h_dense, b_dense, conn])  # build
    ref_bmm.set_weights([W])
    msgs = ref_bmm([h_dense, b_dense, conn])
    agg_ref = RefReduce()([msgs, conn[:, :, 1], h_dense]).numpy()

    # our packed parity path
    plan = plan_capacities(records, batch_size=6, duplicate_edges=True)
    batch = next(iter_batches(records, plan))
    g = batch.cation
    h = jnp.array(atom_table[g.atom_ids])
    m_table = bond_type_matrices(jnp.array(bond_table), jnp.array(W))
    mask = parity_edge_mask(jnp.array(g.src), jnp.array(g.dst),
                            jnp.array(g.node_local), jnp.array(g.edge_mask))
    agg_packed = np.asarray(message_pass_aggregate(
        h, jnp.array(g.bond_ids), jnp.array(g.src), jnp.array(g.dst), m_table, mask))

    for gi, graph in enumerate(graphs):
        for a in range(graph["num_atoms"]):
            pos = np.flatnonzero((g.node_graph == gi) & (g.node_local == a) & g.node_mask)[0]
            np.testing.assert_allclose(
                agg_packed[pos], agg_ref[gi, a], rtol=2e-4, atol=2e-4,
                err_msg=f"graph {gi} atom {a}",
            )
