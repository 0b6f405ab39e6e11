"""Pin the phase-stubbed probe forward against the real model.

``benchmarks/phases.py`` rebuilds the production onehot forward from the
param tree so ``scripts/tpu_phase_probe.py`` can cut it at phase
boundaries; if its reconstruction drifts from ``ViscosityModel.apply``
the per-phase attribution silently measures a different program.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ionic_mpnn_tpu.benchmarks import make_bench_dataset
from ionic_mpnn_tpu.benchmarks.phases import PHASES, phase_forward
from ionic_mpnn_tpu.config import viscosity_config
from ionic_mpnn_tpu.data import iter_batches, plan_capacities
from ionic_mpnn_tpu.models import ViscosityModel
from ionic_mpnn_tpu.training.loop import _data_loss, _l2_penalty


def _setup(dtype):
    records, vocab = make_bench_dataset(64)
    cfg = viscosity_config(
        vocab.atom_vocab_size, vocab.bond_vocab_size,
        compute_dtype=dtype, message_impl="onehot", onehot_window=64,
    )
    plan = plan_capacities(records, batch_size=32,
                           edge_layout="window_aligned", window=64)
    batch = next(iter_batches(records[:32], plan))
    batch = jax.tree.map(jnp.asarray, batch)
    model = ViscosityModel(cfg)
    variables = model.init(jax.random.PRNGKey(0), batch)
    return cfg, batch, model, variables


@pytest.mark.parametrize("dtype,tol", [("float32", 1e-5), ("bfloat16", 3e-2)])
def test_phase_fwd_matches_model_loss(dtype, tol):
    cfg, batch, model, variables = _setup(dtype)
    pred = model.apply(variables, batch)["pred"]
    expected = _data_loss(pred, batch.y, batch.sample_mask, "mse", 1.0)
    expected = expected + _l2_penalty(variables["params"], cfg.fp_l2)
    got = phase_forward(variables["params"], cfg, batch, "fwd")
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               rtol=tol, atol=tol)


def test_all_phases_run_and_are_finite():
    cfg, batch, _, variables = _setup("float32")
    for upto in PHASES:
        v = phase_forward(variables["params"], cfg, batch, upto)
        assert np.isfinite(np.asarray(v)), upto


def test_phase_fwd_differentiable():
    cfg, batch, _, variables = _setup("float32")
    g = jax.grad(lambda p: phase_forward(p, cfg, batch, "fwd"))(
        variables["params"]
    )
    flat = jax.tree.leaves(g)
    assert all(np.all(np.isfinite(np.asarray(x))) for x in flat)
    # the message/GRU params must receive gradient (chain not severed)
    gt = g["trunk"]["cat_encoder"]["bmm_0"]["bond_transform"]
    assert float(jnp.abs(gt).sum()) > 0
