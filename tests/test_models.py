"""Model tests: shapes, init, jit, parity quirks, transfer surgery."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import traverse_util
from flax.core import unfreeze

from ionic_mpnn_tpu.config import melting_point_config, viscosity_config
from ionic_mpnn_tpu.data import iter_batches, plan_capacities
from ionic_mpnn_tpu.models import (
    MeltingPointModel,
    TransferMPModel,
    ViscosityModel,
    load_trunk_params,
    transfer_stage_labels,
)


@pytest.fixture(scope="module")
def vis_batch(encoded_viscosity):
    records = encoded_viscosity["viscosity"][:12]
    plan = plan_capacities(records, batch_size=12)
    return next(iter_batches(records, plan)), encoded_viscosity["vocab"]


@pytest.fixture(scope="module")
def mp_batch(encoded_viscosity):
    records = encoded_viscosity["mp"][:8]
    plan = plan_capacities(records, batch_size=8, with_temperature=False, target_key="mp")
    return next(iter_batches(records, plan)), encoded_viscosity["vocab"]


def test_viscosity_model_forward(vis_batch):
    batch, vocab = vis_batch
    cfg = viscosity_config(vocab.atom_vocab_size, vocab.bond_vocab_size)
    model = ViscosityModel(cfg)
    params = model.init(jax.random.PRNGKey(0), batch)
    out = model.apply(params, batch)
    assert out["pred"].shape == (12,)
    assert out["mixed"].shape == (12, cfg.mixing_size)
    assert np.all(np.isfinite(np.asarray(out["pred"])))


def test_viscosity_param_structure(vis_batch):
    batch, vocab = vis_batch
    cfg = viscosity_config(vocab.atom_vocab_size, vocab.bond_vocab_size)
    params = ViscosityModel(cfg).init(jax.random.PRNGKey(0), batch)
    flat = traverse_util.flatten_dict(unfreeze(params["params"]))
    names = {"/".join(k) for k in flat}
    # shared embeddings live on the trunk, not per encoder
    assert "trunk/atom_embed" in names
    assert "trunk/bond_embed" in names
    # fresh weights per step per ion: 4 bmm + 4 gru each
    for ion in ("cat", "an"):
        for step in range(4):
            assert f"trunk/{ion}_encoder/bmm_{step}/bond_transform" in names
            assert f"trunk/{ion}_encoder/gru_{step}/dense_z/kernel" in names
    # bond transform shape (F, D, D)
    w = flat[("trunk", "cat_encoder", "bmm_0", "bond_transform")]
    assert w.shape == (cfg.bond_vocab_size + 1 and cfg.bond_dim, cfg.atom_dim, cfg.atom_dim)
    # embedding tables have the +1 pad row
    assert flat[("trunk", "atom_embed")].shape == (vocab.atom_vocab_size + 1, cfg.atom_dim)


def test_viscosity_jit_and_determinism(vis_batch):
    batch, vocab = vis_batch
    cfg = viscosity_config(vocab.atom_vocab_size, vocab.bond_vocab_size)
    model = ViscosityModel(cfg)
    params = model.init(jax.random.PRNGKey(0), batch)
    fn = jax.jit(lambda p, b: model.apply(p, b)["pred"])
    a = fn(params, batch)
    b = fn(params, batch)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_vft_head_constraints(vis_batch):
    """B and C stay in their clip ranges -> log_eta bounded given T."""
    batch, vocab = vis_batch
    cfg = viscosity_config(vocab.atom_vocab_size, vocab.bond_vocab_size)
    model = ViscosityModel(cfg)
    params = model.init(jax.random.PRNGKey(3), batch)
    out = model.apply(params, batch)
    t_scaled = np.asarray(batch.temperature)[:, 0] / 100.0
    # log_eta = A + B/(T'+C), with B in [0,20], C in [0.1,50]
    # => finite and, for nonneg B, pred >= A (bounded below by -|A|max)
    assert np.all(np.isfinite(np.asarray(out["pred"])))


def test_melting_point_model_shapes_and_big_bond_dim(mp_batch):
    batch, vocab = mp_batch
    cfg = melting_point_config(vocab.atom_vocab_size, vocab.bond_vocab_size)
    assert cfg.bond_dim == 32 * 32
    model = MeltingPointModel(cfg)
    params = model.init(jax.random.PRNGKey(1), batch)
    flat = traverse_util.flatten_dict(unfreeze(params["params"]))
    w = flat[("trunk", "cat_encoder", "bmm_0", "bond_transform")]
    assert w.shape == (1024, 32, 32)
    out = model.apply(params, batch)
    assert out["pred"].shape == (8,)
    assert np.all(np.isfinite(np.asarray(out["pred"])))


def test_parity_mode_drops_atom0(vis_batch):
    """In parity mode, zeroing atom-0 incident edge weights changes nothing."""
    batch, vocab = vis_batch
    cfg = viscosity_config(vocab.atom_vocab_size, vocab.bond_vocab_size, parity_mode=True)
    model = ViscosityModel(cfg)
    params = model.init(jax.random.PRNGKey(0), batch)
    base = np.asarray(model.apply(params, batch)["pred"])

    # Perturb bond ids on edges that touch local atom 0: parity mode must ignore them.
    c = batch.cation
    touches0 = ((c.node_local[c.src] == 0) | (c.node_local[c.dst] == 0)) & c.edge_mask
    new_bond_ids = np.asarray(c.bond_ids).copy()
    new_bond_ids[np.asarray(touches0)] = 1  # arbitrary different bond type
    batch2 = batch.replace(cation=c.replace(bond_ids=new_bond_ids))
    pred2 = np.asarray(model.apply(params, batch2)["pred"])
    np.testing.assert_allclose(base, pred2, rtol=1e-6)

    # In clean mode the same perturbation DOES change predictions.
    cfg_clean = viscosity_config(vocab.atom_vocab_size, vocab.bond_vocab_size)
    model_clean = ViscosityModel(cfg_clean)
    params_clean = model_clean.init(jax.random.PRNGKey(0), batch)
    a = np.asarray(model_clean.apply(params_clean, batch)["pred"])
    b = np.asarray(model_clean.apply(params_clean, batch2)["pred"])
    assert not np.allclose(a, b)


def test_transfer_model_and_trunk_surgery(mp_batch, vis_batch):
    mpb, vocab = mp_batch
    visb, _ = vis_batch
    cfg = viscosity_config(vocab.atom_vocab_size, vocab.bond_vocab_size)
    vis_model = ViscosityModel(cfg)
    vis_params = vis_model.init(jax.random.PRNGKey(0), visb)

    transfer = TransferMPModel(cfg)
    tvars = transfer.init(jax.random.PRNGKey(2), mpb, deterministic=True)
    new_params = load_trunk_params(tvars["params"], vis_params["params"])

    # trunk subtree equality
    flat_new = traverse_util.flatten_dict(unfreeze(new_params))
    flat_vis = traverse_util.flatten_dict(unfreeze(vis_params["params"]))
    for k, v in flat_vis.items():
        if k[0] == "trunk":
            np.testing.assert_array_equal(np.asarray(flat_new[k]), np.asarray(v))

    # forward works with transplanted trunk (BatchNorm has state)
    out = transfer.apply(
        {"params": new_params, "batch_stats": tvars["batch_stats"]}, mpb, deterministic=True
    )
    assert out["pred"].shape == (8,)
    assert np.all(np.isfinite(np.asarray(out["pred"])))


def test_transfer_stage_labels(mp_batch):
    batch, vocab = mp_batch
    cfg = viscosity_config(vocab.atom_vocab_size, vocab.bond_vocab_size)
    tvars = TransferMPModel(cfg).init(jax.random.PRNGKey(0), batch, deterministic=True)
    labels1 = traverse_util.flatten_dict(transfer_stage_labels(tvars["params"], stage=1))
    labels2 = traverse_util.flatten_dict(transfer_stage_labels(tvars["params"], stage=2))
    flat = traverse_util.flatten_dict(unfreeze(tvars["params"]))

    for path in flat:
        name = "/".join(path)
        if name.startswith("mp_") or name.startswith("melting_point"):
            assert labels1[path] == "trainable"
        if name.startswith("trunk/"):
            assert labels1[path] == "frozen"
    # stage 2 unfreezes the last two steps + projections
    assert labels2[("trunk", "cat_encoder", "bmm_3", "bond_transform")] == "trainable"
    assert labels2[("trunk", "cat_encoder", "bmm_0", "bond_transform")] == "frozen"
    assert labels2[("trunk", "cat_proj", "kernel")] == "trainable"
    assert labels2[("trunk", "atom_embed",)] == "frozen"


def test_gradients_flow(vis_batch):
    batch, vocab = vis_batch
    cfg = viscosity_config(vocab.atom_vocab_size, vocab.bond_vocab_size)
    model = ViscosityModel(cfg)
    params = model.init(jax.random.PRNGKey(0), batch)

    def loss_fn(p):
        pred = model.apply(p, batch)["pred"]
        return jnp.mean((pred - batch.y) ** 2 * batch.sample_mask)

    grads = jax.grad(loss_fn)(params)
    flat = traverse_util.flatten_dict(unfreeze(grads["params"]))
    nonzero = sum(bool(np.abs(np.asarray(g)).sum() > 0) for g in flat.values())
    assert nonzero > len(flat) * 0.8  # nearly all params receive gradient


def test_fused_gru_matches_reference_impl(encoded_viscosity):
    """gru_impl='fused' is a pure reformulation: same params, same output."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ionic_mpnn_tpu.config import viscosity_config
    from ionic_mpnn_tpu.data import iter_batches, plan_capacities
    from ionic_mpnn_tpu.models import ViscosityModel

    records = encoded_viscosity["viscosity"][:16]
    vocab = encoded_viscosity["vocab"]
    plan = plan_capacities(records, batch_size=16)
    batch = next(iter_batches(records, plan))

    cfg_ref = viscosity_config(vocab.atom_vocab_size, vocab.bond_vocab_size,
                               num_steps=3)
    cfg_fused = cfg_ref.replace(gru_impl="fused")
    m_ref, m_fused = ViscosityModel(cfg_ref), ViscosityModel(cfg_fused)
    v_ref = m_ref.init(jax.random.PRNGKey(0), batch)
    v_fused = m_fused.init(jax.random.PRNGKey(0), batch)
    # identical param trees (checkpoint interchange)
    assert jax.tree_util.tree_structure(v_ref) == jax.tree_util.tree_structure(v_fused)
    for a, b in zip(jax.tree.leaves(v_ref), jax.tree.leaves(v_fused)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    p_ref = np.asarray(m_ref.apply(v_ref, batch)["pred"])
    p_fused = np.asarray(m_fused.apply(v_ref, batch)["pred"])
    np.testing.assert_allclose(p_fused, p_ref, rtol=1e-5, atol=1e-5)

    # grads match too
    def loss(model, variables):
        out = model.apply(variables, batch)["pred"]
        return jnp.mean((out - jnp.asarray(batch.y)) ** 2)

    g_ref = jax.grad(lambda v: loss(m_ref, v))(v_ref)
    g_fused = jax.grad(lambda v: loss(m_fused, v))(v_ref)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_fused)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=4e-3, atol=1e-5)
