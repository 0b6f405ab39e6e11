"""Model-level equivalence of message-aggregation implementations."""

import jax
import numpy as np

from ionic_mpnn_tpu.config import viscosity_config
from ionic_mpnn_tpu.data import iter_batches, plan_capacities
from ionic_mpnn_tpu.models import ViscosityModel


def test_model_predictions_identical_across_impls(encoded_viscosity):
    records = encoded_viscosity["viscosity"][:16]
    vocab = encoded_viscosity["vocab"]
    plan = plan_capacities(records, batch_size=16)
    batch = next(iter_batches(records, plan))

    cfg_g = viscosity_config(vocab.atom_vocab_size, vocab.bond_vocab_size,
                             num_steps=3, message_impl="gather")
    cfg_t = cfg_g.replace(message_impl="typed")

    model_g = ViscosityModel(cfg_g)
    model_t = ViscosityModel(cfg_t)
    params = model_g.init(jax.random.PRNGKey(0), batch)  # same tree for both

    pred_g = np.asarray(model_g.apply(params, batch)["pred"])
    pred_t = np.asarray(model_t.apply(params, batch)["pred"])
    np.testing.assert_allclose(pred_g, pred_t, rtol=1e-4, atol=1e-4)

    # gradients agree too
    def loss(m):
        return lambda p: ((m.apply(p, batch)["pred"] - batch.y) ** 2).mean()

    g_g = jax.grad(loss(model_g))(params)
    g_t = jax.grad(loss(model_t))(params)
    for a, b in zip(jax.tree.leaves(g_g), jax.tree.leaves(g_t)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-3, atol=1e-5)
