"""CLI integration: the full script chain runs end-to-end (tiny sizes)."""

import json
import os
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent

pytestmark = pytest.mark.slow


def _run(args, cwd, env=None):
    e = dict(os.environ)
    e["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    # Force CPU: disable the accelerator-plugin bootstrap (sitecustomize
    # skips registration without POOL_IPS) so scripts don't grab the TPU.
    e.pop("PALLAS_AXON_POOL_IPS", None)
    e["JAX_PLATFORMS"] = "cpu"
    if env:
        e.update(env)
    r = subprocess.run([sys.executable, *args], cwd=cwd, env=e,
                       capture_output=True, text=True, timeout=420)
    assert r.returncode == 0, f"{args}\nSTDOUT:{r.stdout[-2000:]}\nSTDERR:{r.stderr[-2000:]}"
    return r.stdout


def test_full_cli_chain(tmp_path):
    data = tmp_path / "data"
    results = tmp_path / "results"

    out = _run(
        ["scripts/prepare_data.py", "--data-dir", str(data), "--synthetic",
         "--n-viscosity", "120", "--n-mp", "60"],
        cwd=REPO,
    )
    assert "encoded=120" in out.replace(" ", "").replace("viscosityencode:", "") or "120" in out
    for f in ("vocab.pkl", "viscosity_id_data.pkl", "mp_id_data.pkl",
              "viscosity_id_data.npz"):
        assert (data / f).exists()

    out = _run(
        ["scripts/train_viscosity.py", "--data", str(data / "viscosity_id_data.pkl"),
         "--vocab", str(data / "vocab.pkl"), "--out-dir", str(results / "viscosity"),
         "--epochs", "3", "--patience", "10", "--num-steps", "1"],
        cwd=REPO,
    )
    assert "Test: R2=" in out
    assert (results / "viscosity/checkpoints").exists()
    assert (results / "viscosity/loss_viscosity.png").exists()
    assert (results / "viscosity/figure2_a_viscosity.png").exists()

    out = _run(
        ["scripts/train_melting_point.py", "--data", str(data / "mp_id_data.pkl"),
         "--vocab", str(data / "vocab.pkl"), "--out-dir", str(results / "melting_point"),
         "--epochs", "2", "--patience", "10", "--num-steps", "1", "--atom-dim", "8"],
        cwd=REPO,
    )
    assert "MAE=" in out
    assert (results / "melting_point/mp_norm_params.json").exists()

    out = _run(
        ["scripts/train_transfer.py", "--data", str(data / "mp_id_data.pkl"),
         "--vocab", str(data / "vocab.pkl"),
         "--viscosity-checkpoint", str(results / "viscosity/checkpoints"),
         "--out-dir", str(results / "transfer"),
         "--epochs", "2", "--patience", "10", "--num-steps", "1"],
        cwd=REPO,
    )
    assert "Test: R2=" in out
    assert (results / "transfer/scaler.json").exists()

    out = _run(
        ["scripts/screen.py", "--vocab", str(data / "vocab.pkl"),
         "--checkpoint", str(results / "viscosity/checkpoints"),
         "--top-k", "5", "--batch-size", "16",
         "--out", str(results / "screen_top.csv")],
        cwd=REPO,
    )
    assert (results / "screen_top.csv").exists()
    lines = (results / "screen_top.csv").read_text().strip().splitlines()
    assert len(lines) == 6  # header + 5

    out = _run(
        ["scripts/evaluate.py", "--data-dir", str(data),
         "--results-dir", str(results), "--out-dir", str(results / "evaluation")],
        cwd=REPO,
    )
    assert "viscosity" in out
    assert (results / "evaluation").exists()
