"""Utility-tier tests: throughput meter, distributed helpers, plotting."""

import numpy as np

from ionic_mpnn_tpu.parallel.distributed import host_record_shard, initialize_distributed
from ionic_mpnn_tpu.utils import ThroughputMeter, plot_loss, plot_parity


def test_throughput_meter():
    m = ThroughputMeter()
    m.start()
    import time

    for _ in range(3):
        time.sleep(0.01)
        rate = m.step(100.0)
    assert rate > 0
    assert m.total_units == 300.0
    assert 0 < m.average < 100.0 / 0.01 * 2


def test_initialize_distributed_single_host_noop():
    assert initialize_distributed() == 0
    assert initialize_distributed(num_processes=1) == 0


def test_host_record_shard_single_process():
    records = list(range(10))
    assert host_record_shard(records) == records


def test_plotting_writes_files(tmp_path):
    history = {"loss": [3.0, 2.0, 1.0], "val_loss": [3.5, 2.5, 1.5]}
    p1 = plot_loss(history, tmp_path / "loss.png")
    assert p1.exists() and p1.stat().st_size > 0
    y = np.linspace(0, 1, 20)
    p2 = plot_parity(y, y + 0.1, y[:5], y[:5] - 0.1, tmp_path / "parity.png")
    assert p2.exists() and p2.stat().st_size > 0
    # dev split optional
    p3 = plot_parity(y, y, None, None, tmp_path / "parity2.png")
    assert p3.exists()
