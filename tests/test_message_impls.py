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


def test_pallas_fused_model_matches_gather(encoded_viscosity):
    """message_impl='pallas_fused' (one fused Pallas kernel per MP step,
    interpret mode on CPU) must match the XLA gather path end-to-end,
    forward and gradients."""
    records = encoded_viscosity["viscosity"][:16]
    vocab = encoded_viscosity["vocab"]
    plan = plan_capacities(records, batch_size=16)
    batch = next(iter_batches(records, plan))

    cfg_g = viscosity_config(vocab.atom_vocab_size, vocab.bond_vocab_size,
                             num_steps=3, message_impl="gather")
    cfg_f = cfg_g.replace(message_impl="pallas_fused")

    model_g = ViscosityModel(cfg_g)
    model_f = ViscosityModel(cfg_f)
    params = model_g.init(jax.random.PRNGKey(0), batch)  # same tree for both

    pred_g = np.asarray(model_g.apply(params, batch)["pred"])
    pred_f = np.asarray(model_f.apply(params, batch)["pred"])
    np.testing.assert_allclose(pred_g, pred_f, rtol=2e-4, atol=2e-4)

    def loss(m):
        return lambda p: ((m.apply(p, batch)["pred"] - batch.y) ** 2).mean()

    g_g = jax.grad(loss(model_g))(params)
    g_f = jax.grad(loss(model_f))(params)
    for a, b in zip(jax.tree.leaves(g_g), jax.tree.leaves(g_f)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-3, atol=1e-5)


def test_symmetric_vjp_grads_match_autodiff(encoded_viscosity):
    """The graph-symmetry custom VJP must be gradient-exact vs plain AD
    on real molecular batches (edge lists are reversal-closed)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ionic_mpnn_tpu.data import iter_batches, plan_capacities
    from ionic_mpnn_tpu.ops import (
        bond_type_matrices,
        message_pass_aggregate,
        message_pass_aggregate_symmetric,
    )

    records = encoded_viscosity["viscosity"][:16]
    vocab = encoded_viscosity["vocab"]
    plan = plan_capacities(records, batch_size=16)
    batch = next(iter_batches(records, plan))

    for g, parity in ((batch.cation, False), (batch.anion, True)):
        rng = np.random.default_rng(0)
        D = 16
        h = jnp.array(rng.normal(size=(g.atom_ids.shape[0], D)).astype(np.float32))
        table = jnp.array(rng.normal(size=(vocab.bond_vocab_size + 1, 8)).astype(np.float32))
        W = jnp.array((rng.normal(size=(8, D, D)) * 0.2).astype(np.float32))
        m_table = bond_type_matrices(table, W)
        mask = jnp.array(g.edge_mask)
        if parity:
            from ionic_mpnn_tpu.ops import parity_edge_mask

            mask = parity_edge_mask(
                jnp.array(g.src), jnp.array(g.dst), jnp.array(g.node_local), mask
            )
        args = (jnp.array(g.bond_ids), jnp.array(g.src), jnp.array(g.dst))
        cot = jnp.array(rng.normal(size=h.shape).astype(np.float32))

        def loss_ref(h_, m_):
            return jnp.sum(message_pass_aggregate(h_, *args, m_, mask) * cot)

        def loss_sym(h_, m_):
            return jnp.sum(
                message_pass_aggregate_symmetric(h_, args[0], args[1], args[2], m_, mask) * cot
            )

        # forward identical
        np.testing.assert_allclose(
            np.asarray(message_pass_aggregate_symmetric(h, *args, m_table, mask)),
            np.asarray(message_pass_aggregate(h, *args, m_table, mask)),
            rtol=1e-5, atol=1e-5,
        )
        gh_ref, gm_ref = jax.grad(loss_ref, argnums=(0, 1))(h, m_table)
        gh_sym, gm_sym = jax.grad(loss_sym, argnums=(0, 1))(h, m_table)
        np.testing.assert_allclose(np.asarray(gh_sym), np.asarray(gh_ref),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(gm_sym), np.asarray(gm_ref),
                                   rtol=1e-4, atol=1e-5)


def test_symmetric_impl_trains_same_as_gather(encoded_viscosity):
    """One full train step with message_impl='symmetric' matches 'gather'."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ionic_mpnn_tpu.config import TrainConfig, viscosity_config
    from ionic_mpnn_tpu.data import iter_batches, plan_capacities
    from ionic_mpnn_tpu.models import ViscosityModel
    from ionic_mpnn_tpu.training.loop import TrainState, make_train_step
    from ionic_mpnn_tpu.training.optim import make_optimizer

    records = encoded_viscosity["viscosity"][:16]
    vocab = encoded_viscosity["vocab"]
    plan = plan_capacities(records, batch_size=16)
    batch = next(iter_batches(records, plan))
    tcfg = TrainConfig(seed=0)
    optimizer = make_optimizer(tcfg.learning_rate, tcfg.clipnorm)

    states = {}
    for impl in ("gather", "symmetric"):
        cfg = viscosity_config(vocab.atom_vocab_size, vocab.bond_vocab_size,
                               num_steps=2, message_impl=impl)
        model = ViscosityModel(cfg)
        variables = ViscosityModel(cfg.replace(message_impl="gather")).init(
            jax.random.PRNGKey(0), batch
        )
        p = jax.tree.map(jnp.array, variables["params"])
        state = TrainState(step=jnp.int32(0), params=p, batch_stats={},
                           opt_state=optimizer.init(p), rng=jax.random.PRNGKey(1))
        step = make_train_step(model, cfg, tcfg, optimizer)
        states[impl], _ = step(state, batch)

    for a, b in zip(jax.tree.leaves(states["gather"].params),
                    jax.tree.leaves(states["symmetric"].params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)
