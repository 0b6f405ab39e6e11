"""Transfer pipeline tests: staging, freezing semantics, learning."""

import jax
import numpy as np
import pytest
from flax import traverse_util
from flax.core import unfreeze

from ionic_mpnn_tpu.config import TrainConfig, viscosity_config
from ionic_mpnn_tpu.data import iter_batches, plan_capacities
from ionic_mpnn_tpu.models import ViscosityModel
from ionic_mpnn_tpu.training.transfer_pipeline import train_transfer


@pytest.mark.slow
def test_transfer_two_stage(encoded_viscosity):
    vocab = encoded_viscosity["vocab"]
    mp_records = encoded_viscosity["mp"]
    vis_records = encoded_viscosity["viscosity"][:32]

    cfg = viscosity_config(vocab.atom_vocab_size, vocab.bond_vocab_size, num_steps=4)

    # "pretrained" viscosity params (init only — enough to test mechanics)
    vis_plan = plan_capacities(vis_records, batch_size=16)
    vis_batch = next(iter_batches(vis_records, vis_plan))
    vis_params = ViscosityModel(cfg).init(jax.random.PRNGKey(0), vis_batch)["params"]

    train, dev = mp_records[:80], mp_records[80:100]
    plan = plan_capacities(train, batch_size=16, with_temperature=False, target_key="mp")

    result = train_transfer(
        vis_params, cfg, train, dev, plan,
        epochs=4, patience=10, verbose=False,
    )

    flat_vis = traverse_util.flatten_dict(unfreeze(vis_params))
    flat_s1 = traverse_util.flatten_dict(unfreeze(result.stage1.params))
    flat_s2 = traverse_util.flatten_dict(unfreeze(result.stage2.params))

    # Stage 1 froze the ENTIRE trunk: bit-identical to the pretrained params.
    for k, v in flat_vis.items():
        if k[0] == "trunk":
            np.testing.assert_array_equal(np.asarray(flat_s1[k]), np.asarray(v),
                                          err_msg="/".join(k))

    # Stage-1 head actually trained.
    head_moved = any(
        not np.array_equal(np.asarray(flat_s1[k]), np.asarray(flat_s2[k]))
        for k in flat_s1 if k[0].startswith("mp_")
    )
    assert head_moved

    # Stage 2: unfrozen trunk parts moved; frozen parts (embeddings, step 0/1) did not.
    moved = lambda k: not np.array_equal(np.asarray(flat_s1[k]), np.asarray(flat_s2[k]))
    assert moved(("trunk", "cat_encoder", "bmm_3", "bond_transform"))
    assert moved(("trunk", "cat_proj", "kernel"))
    assert not moved(("trunk", "atom_embed"))
    assert not moved(("trunk", "cat_encoder", "bmm_0", "bond_transform"))
    assert not moved(("trunk", "cat_encoder", "gru_0", "dense_z", "kernel"))

    # combined history covers both stages
    assert len(result.history["loss"]) == result.stage1.epochs_run + result.stage2.epochs_run
    # normalizer used the eps guard
    y_train = np.array([r["mp"] for r in train], np.float32)
    assert result.normalizer.std == pytest.approx(float(y_train.std()) + 1e-6, rel=1e-4)
