"""Scaling harness sanity on the virtual CPU mesh."""

import pytest

from ionic_mpnn_tpu.benchmarks.scaling import run_scaling_benchmark


@pytest.mark.multidevice
@pytest.mark.slow
def test_scaling_harness_runs():
    out = run_scaling_benchmark(per_device_batch=8, num_steps=1, iters=2, warmup=1,
                                device_counts=[1, 2])
    rows = out["weak_scaling"]
    assert out["mode"] == "dp"
    assert [r["devices"] for r in rows] == [1, 2]
    assert rows[0]["scaling_efficiency"] == 1.0
    assert all(r["edges_per_s"] > 0 for r in rows)


@pytest.mark.multidevice
@pytest.mark.slow
@pytest.mark.parametrize("mode", ["dp_onehot", "aligned_ep"])
def test_scaling_harness_production_modes(mode):
    out = run_scaling_benchmark(per_device_batch=8, num_steps=1, iters=2,
                                warmup=1, device_counts=[1, 2], mode=mode)
    key = "strong_scaling" if mode == "aligned_ep" else "weak_scaling"
    rows = out[key]
    assert [r["devices"] for r in rows] == [1, 2]
    assert all(r["edges_per_s"] > 0 for r in rows)
    assert rows[0]["scaling_efficiency"] == 1.0


def test_roofline_model():
    from ionic_mpnn_tpu.benchmarks.roofline import (
        TPU_V5E,
        roofline_summary,
        train_step_cost,
    )

    cost = train_step_cost(
        node_cap=32768, edge_cap=131072, n_graphs=2048,
        atom_dim=32, bond_dim=8, bond_vocab=20, num_steps=4,
    )
    assert cost["flops"] > 0 and cost["hbm_bytes"] > 0
    # dominant term sanity: per-edge matvec ~ 3 * 2 ions * 4 steps * 2*E*D^2
    assert cost["flops"] > 3 * 2 * 4 * 2 * 131072 * 32 * 32

    # measured time exactly at the roofline -> headroom 1, mfu <= 1
    roof = roofline_summary(cost, measured_step_seconds=cost["flops"] / TPU_V5E.peak_flops)
    assert 0 < roof["mfu"] <= 1.0001
    assert 0.0 <= roof["hbm_bound_fraction"] <= 1.0
    assert roof["roofline_headroom"] >= 0.99

    # with the VMEM-resident working set the step is MXU-bound (measured)
    assert roof["hbm_bound_fraction"] < 0.5
