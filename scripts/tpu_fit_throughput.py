#!/usr/bin/env python
"""End-to-end fit() throughput at production batch size on one chip.

Measures what bench.py's isolated train step cannot: the full epoch loop
with the C++ columnar loader, per-batch window tiling, scan-of-K dispatch,
eval passes, and early-stopping bookkeeping. Reports records/s per epoch
(wall-clock, which IS fetch-synced: the epoch loss history is fetched for
early stopping).

Usage: python scripts/tpu_fit_throughput.py [n_records] [batch_size] [epochs]
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    n_records = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    batch_size = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
    epochs = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    # default "auto" (on for accelerators); "device"/"host" force it
    mode = sys.argv[4] if len(sys.argv) > 4 else "auto"
    if mode not in ("auto", "device", "host", "device-unpaired"):
        raise SystemExit(
            f"unknown mode {mode!r}: expected auto | device | host | "
            "device-unpaired\n"
            "usage: tpu_fit_throughput.py [n_records] [batch] [epochs] [mode]"
        )
    device_epochs = {"device": True, "host": False, "auto": "auto",
                     "device-unpaired": True}[mode]
    paired = False if mode == "device-unpaired" else "auto"

    from ionic_mpnn_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from ionic_mpnn_tpu.benchmarks import make_bench_dataset
    from ionic_mpnn_tpu.config import (
        TrainConfig, edge_layout_for, resolve_compute_dtype,
        resolve_message_impl, resolve_onehot_window, viscosity_config,
    )
    from ionic_mpnn_tpu.data import plan_capacities
    from ionic_mpnn_tpu.models import ViscosityModel
    from ionic_mpnn_tpu.training import fit

    t0 = time.perf_counter()
    records, vocab = make_bench_dataset(n_records)
    gen_s = time.perf_counter() - t0
    impl = resolve_message_impl("auto")
    dtype = resolve_compute_dtype("auto")
    window = resolve_onehot_window(dtype)
    cfg = viscosity_config(vocab.atom_vocab_size, vocab.bond_vocab_size,
                           message_impl=impl, compute_dtype=dtype,
                           onehot_window=window)
    tcfg = TrainConfig(epochs=epochs, batch_size=batch_size,
                       early_stopping_patience=epochs + 1, seed=0,
                       device_epochs=device_epochs, paired_epochs=paired)
    plan = plan_capacities(records, batch_size=batch_size,
                           edge_layout=edge_layout_for(impl),
                           window=window)
    train, dev = records[: n_records - 2048], records[n_records - 2048:]

    t1 = time.perf_counter()
    result = fit(ViscosityModel(cfg), cfg, tcfg, train, dev, plan,
                 verbose=False)
    wall = time.perf_counter() - t1
    per_epoch = result.history.get("epoch_seconds") or []
    steady = sorted(per_epoch[1:])[len(per_epoch[1:]) // 2] if len(per_epoch) > 1 else wall / epochs
    print(json.dumps({
        "n_records": n_records,
        "batch_size": batch_size, "device_epochs": device_epochs,
        "paired_epochs": paired,
        "message_impl": impl,
        "compute_dtype": dtype,
        "onehot_window": window,
        "balanced": plan.balance,
        "edge_layout": plan.edge_layout,
        "gen_s": round(gen_s, 1),
        "epochs": epochs,
        "fit_wall_s": round(wall, 2),
        "epoch_seconds": [round(e, 2) for e in per_epoch],
        "steady_epoch_s": round(steady, 2),
        "records_per_s": round(len(train) / steady, 1),
        "final_loss": float(result.history["loss"][-1]),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
