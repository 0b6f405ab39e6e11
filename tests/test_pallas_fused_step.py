"""Fused MP-step megakernel (message+aggregate+GatedUpdate in one Pallas
launch): interpret-mode correctness vs the composed XLA path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ionic_mpnn_tpu.ops.gru import GATED_UPDATE_PARAM_SHAPES, gated_update
from ionic_mpnn_tpu.ops.message import message_pass_aggregate
from ionic_mpnn_tpu.ops.pallas.fused_step import fused_mp_step
from ionic_mpnn_tpu.ops.pallas.segment_sum import PallasCapacityError

from test_pallas_fused_message import _molecular_edges


def _gru_params(rng, D):
    return {k: jnp.array((rng.normal(size=s) * 0.2).astype(np.float32))
            for k, s in GATED_UPDATE_PARAM_SHAPES(D).items()}


def _ref_step(h, m_table, gru, bond, src, dst, mask):
    agg = message_pass_aggregate(h, bond, src, dst, m_table, mask > 0)
    return gated_update(h, agg, gru)


@pytest.mark.parametrize("N,D,V,seed", [(256, 32, 7, 0), (384, 16, 5, 1)])
def test_fused_step_matches_composed(N, D, V, seed):
    rng = np.random.default_rng(seed)
    src, dst, bond, mask = _molecular_edges(rng, 40, 20, N, V)
    h = jnp.array(rng.normal(size=(N, D)).astype(np.float32))
    m_table = jnp.array((rng.normal(size=(V, D, D)) * 0.3).astype(np.float32))
    gru = _gru_params(rng, D)
    b_, s_, d_, m_ = (jnp.array(bond), jnp.array(src), jnp.array(dst),
                      jnp.array(mask))

    expected = _ref_step(h, m_table, gru, b_, s_, d_, m_)
    got = fused_mp_step(h, m_table, gru, b_, s_, d_, m_, N, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               rtol=2e-4, atol=2e-4)


def test_fused_step_multi_step_chain():
    """Chaining steps (as the encoder does) stays allclose."""
    rng = np.random.default_rng(2)
    N, D, V = 256, 16, 4
    src, dst, bond, mask = _molecular_edges(rng, 30, 15, N, V)
    h0 = jnp.array(rng.normal(size=(N, D)).astype(np.float32))
    b_, s_, d_, m_ = (jnp.array(bond), jnp.array(src), jnp.array(dst),
                      jnp.array(mask))

    h_ref, h_fused = h0, h0
    for step in range(3):
        m_table = jnp.array(
            (rng.normal(size=(V, D, D)) * 0.3).astype(np.float32))
        gru = _gru_params(rng, D)
        h_ref = _ref_step(h_ref, m_table, gru, b_, s_, d_, m_)
        h_fused = fused_mp_step(h_fused, m_table, gru, b_, s_, d_, m_, N,
                                interpret=True)
    np.testing.assert_allclose(np.asarray(h_fused), np.asarray(h_ref),
                               rtol=1e-3, atol=1e-3)


def test_fused_step_gradients():
    rng = np.random.default_rng(3)
    N, D, V = 256, 16, 4
    src, dst, bond, mask = _molecular_edges(rng, 30, 15, N, V)
    h = jnp.array(rng.normal(size=(N, D)).astype(np.float32))
    m_table = jnp.array((rng.normal(size=(V, D, D)) * 0.3).astype(np.float32))
    gru = _gru_params(rng, D)
    cot = jnp.array(rng.normal(size=(N, D)).astype(np.float32))
    b_, s_, d_, m_ = (jnp.array(bond), jnp.array(src), jnp.array(dst),
                      jnp.array(mask))

    def loss_ref(h_, mt_, g_):
        return jnp.sum(_ref_step(h_, mt_, g_, b_, s_, d_, m_) * cot)

    def loss_fused(h_, mt_, g_):
        return jnp.sum(
            fused_mp_step(h_, mt_, g_, b_, s_, d_, m_, N, interpret=True) * cot
        )

    ref_grads = jax.grad(loss_ref, argnums=(0, 1, 2))(h, m_table, gru)
    got_grads = jax.grad(loss_fused, argnums=(0, 1, 2))(h, m_table, gru)
    for a, b in zip(jax.tree.leaves(got_grads), jax.tree.leaves(ref_grads)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


def test_fused_step_locality_guard():
    rng = np.random.default_rng(4)
    N, D, V = 512, 8, 3
    h = jnp.array(rng.normal(size=(N, D)).astype(np.float32))
    m_table = jnp.array(rng.normal(size=(V, D, D)).astype(np.float32))
    gru = _gru_params(rng, D)
    with pytest.raises(PallasCapacityError):
        fused_mp_step(
            h, m_table, gru, jnp.array([1, 1], np.int32),
            jnp.array([0, 400], np.int32), jnp.array([0, 1], np.int32),
            jnp.ones(2, np.float32), N, interpret=True,
        )


def test_pallas_step_model_matches_gather(encoded_viscosity):
    """message_impl='pallas_step' must share the param tree with the
    composed path (checkpoint compatibility) and match it end-to-end."""
    from ionic_mpnn_tpu.config import viscosity_config
    from ionic_mpnn_tpu.data import iter_batches, plan_capacities
    from ionic_mpnn_tpu.models import ViscosityModel

    records = encoded_viscosity["viscosity"][:16]
    vocab = encoded_viscosity["vocab"]
    plan = plan_capacities(records, batch_size=16)
    batch = next(iter_batches(records, plan))

    cfg_g = viscosity_config(vocab.atom_vocab_size, vocab.bond_vocab_size,
                             num_steps=3, message_impl="gather")
    cfg_f = cfg_g.replace(message_impl="pallas_step")
    model_g = ViscosityModel(cfg_g)
    model_f = ViscosityModel(cfg_f)

    params_g = model_g.init(jax.random.PRNGKey(0), batch)
    params_f = model_f.init(jax.random.PRNGKey(0), batch)
    # identical tree: same module names, shapes, and inits
    assert jax.tree.structure(params_g) == jax.tree.structure(params_f)
    for a, b in zip(jax.tree.leaves(params_g), jax.tree.leaves(params_f)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    pred_g = np.asarray(model_g.apply(params_g, batch)["pred"])
    pred_f = np.asarray(model_f.apply(params_g, batch)["pred"])
    np.testing.assert_allclose(pred_g, pred_f, rtol=2e-4, atol=2e-4)

    def loss(m):
        return lambda p: ((m.apply(p, batch)["pred"] - batch.y) ** 2).mean()

    g_g = jax.grad(loss(model_g))(params_g)
    g_f = jax.grad(loss(model_f))(params_g)
    for a, b in zip(jax.tree.leaves(g_g), jax.tree.leaves(g_f)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=1e-5)
