#!/usr/bin/env python
"""CPU reproduction harness for the round-4 onehot-path quality gap.

The 400-epoch TPU protocol hit dev R² 0.45 on the onehot path vs 0.97 on
gather (RESULTS round 4). This runs small fit() arms on CPU with
path-isolating overrides so the offending component can be bisected in
minutes instead of TPU half-hours.

Usage: cpu_quality_bisect.py [n_records] [epochs] [arm ...]
Arms: gather | onehot | onehot-dev | onehot-noembed | onehot-nopool
"""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np


def main():
    argv = sys.argv[1:]
    n = int(argv[0]) if argv and argv[0].isdigit() else 1500
    epochs = int(argv[1]) if len(argv) > 1 and argv[1].isdigit() else 60
    arms = [a for a in argv if not a.isdigit()] or [
        "gather", "onehot", "onehot-dev", "onehot-noembed", "onehot-nopool"]

    from ionic_mpnn_tpu.benchmarks import make_bench_dataset
    from ionic_mpnn_tpu.config import TrainConfig, viscosity_config
    from ionic_mpnn_tpu.data import plan_capacities
    from ionic_mpnn_tpu.models import ViscosityModel
    from ionic_mpnn_tpu.training import evaluate_splits, fit, random_split

    records, vocab = make_bench_dataset(n)
    idx_tr, idx_dev, _ = random_split(len(records))
    train = [records[i] for i in idx_tr]
    dev = [records[i] for i in idx_dev]

    for arm in arms:
        impl = "gather" if arm == "gather" else "onehot"
        layout = "sorted" if impl == "gather" else "window_aligned"
        embed = "gather" if arm == "onehot-noembed" else "auto"
        dev_ep = arm == "onehot-dev"
        cfg = viscosity_config(
            vocab.atom_vocab_size, vocab.bond_vocab_size,
            message_impl=impl, compute_dtype="float32",
            onehot_window=128, embed_impl=embed,
        )
        tcfg = TrainConfig(epochs=epochs, batch_size=32,
                           early_stopping_patience=epochs, seed=0,
                           steps_per_call=8 if dev_ep else 0,
                           device_epochs=dev_ep,
                           # python loader only: the nopool arm's batch
                           # patch must see every train batch
                           use_native_loader=False)
        plan = plan_capacities(records, batch_size=32, edge_layout=layout,
                               window=128)
        if arm == "onehot-nopool":
            # strip pool_slot from every batch: forces the segment-sum
            # readout on otherwise-identical aligned batches
            from ionic_mpnn_tpu.data import loader as loader_mod

            orig = loader_mod.iter_batches

            def no_slot_iter(source, plan_, **kw):
                import dataclasses
                for b in orig(source, plan_, **kw):
                    yield dataclasses.replace(
                        b,
                        cation=dataclasses.replace(b.cation, pool_slot=None),
                        anion=dataclasses.replace(b.anion, pool_slot=None),
                    )

            import ionic_mpnn_tpu.training.loop as loop_mod

            loop_mod.iter_batches = no_slot_iter
        result = fit(ViscosityModel(cfg), cfg, tcfg, train, dev, plan,
                     verbose=False)
        if arm == "onehot-nopool":
            loop_mod.iter_batches = orig
        m = evaluate_splits(ViscosityModel(cfg), result.params,
                            result.batch_stats, {"dev": dev}, plan,
                            result.normalizer)
        print(json.dumps({
            "arm": arm, "n": n, "epochs": epochs,
            "final_loss": round(result.history["loss"][-1], 5),
            "best_val": round(result.best_val_loss, 5),
            "dev_r2": round(m["dev"]["r2"], 4),
        }), flush=True)


if __name__ == "__main__":
    main()
