"""Test configuration: force an 8-device virtual CPU mesh for all tests.

The standard JAX fake-multi-device backend
(``--xla_force_host_platform_device_count``) lets the full multi-chip
sharding path compile and execute without TPU hardware.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

# Some environments pre-register an accelerator plugin at interpreter startup
# (sitecustomize) and pin jax_platforms via jax.config, which overrides env
# vars — so force CPU at the config level before any backend initializes.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402

# Fast-lane auto-marking (round-4 VERDICT item 8): tests measured >= ~9 s
# on this 2-core box (full-suite --durations run, RESULTS round 4) get the
# `slow` mark here so the ITERATION lane is
#
#     python -m pytest -m "not slow and not multidevice" -q
#
# while CI runs the full suite. One list, by test-function base name —
# update it from a fresh `--durations=40` run when the balance shifts.
_AUTO_SLOW = {
    "test_bf16_quality_gate",
    "test_pallas_step_model_matches_gather",
    "test_model_predictions_identical_across_impls",
    "test_fit_resumes_from_checkpoint",
    "test_fit_without_checkpoint_dir_untouched",
    "test_balanced_fit_trajectory_matches_python",
    "test_balanced_batches_match_model_outputs",
    "test_pallas_fused_model_matches_gather",
    "test_fit_native_loader_matches_python",
    "test_fit_native_group_mode_matches_python",
    "test_phase_fwd_differentiable",
    "test_phase_fwd_matches_model_loss",
    "test_device_epoch_step_matches_host_step",
    "test_gradients_flow",
    "test_packed_aggregate_matches_brute_force",
    "test_early_stopping_restores_best",
    "test_model_equal_across_embed_and_readout_paths",
    "test_fit_device_epochs_learns",
    "test_quality_protocol_escapes_collapse_basin",
    "test_paired_step_matches_host_step",
    "test_pack_side_paired_structural_exactness",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        base = item.name.split("[")[0]
        if base in _AUTO_SLOW:
            item.add_marker(pytest.mark.slow)


@pytest.fixture(scope="session")
def synthetic_raw(tmp_path_factory):
    """Small synthetic raw dataset in the reference text formats."""
    from ionic_mpnn_tpu.data.synthetic import generate_ionic_liquid_raw

    out = tmp_path_factory.mktemp("raw")
    paths = generate_ionic_liquid_raw(out, n_viscosity=300, n_mp=120, seed=0)
    return paths


@pytest.fixture(scope="session")
def encoded_viscosity(synthetic_raw):
    """Synthetic viscosity records run through the full data pipeline."""
    from ionic_mpnn_tpu.data import parse, vocab as vocab_mod, encode

    cations, anions = parse.load_ca_smiles(synthetic_raw["ca"])
    vis = parse.parse_viscosity(synthetic_raw["viscosity"], cations, anions)
    mp = parse.parse_melting_point(synthetic_raw["mp"], cations, anions)
    vis_graphs, _ = parse.convert_records_to_graphs(vis, "viscosity")
    mp_graphs, _ = parse.convert_records_to_graphs(mp, "mp")
    vocab = vocab_mod.build_vocab([vis_graphs, mp_graphs])
    vis_ids, _ = encode.encode_dataset(vis_graphs, vocab)
    mp_ids, _ = encode.encode_dataset(mp_graphs, vocab)
    return {"vocab": vocab, "viscosity": vis_ids, "mp": mp_ids}
