"""Scaling harness sanity on the virtual CPU mesh."""

import pytest

from ionic_mpnn_tpu.benchmarks.scaling import run_scaling_benchmark


@pytest.mark.multidevice
@pytest.mark.slow
def test_scaling_harness_runs():
    out = run_scaling_benchmark(per_device_batch=8, num_steps=1, iters=2, warmup=1,
                                device_counts=[1, 2])
    rows = out["weak_scaling"]
    assert [r["devices"] for r in rows] == [1, 2]
    assert rows[0]["scaling_efficiency"] == 1.0
    assert all(r["edges_per_s"] > 0 for r in rows)
