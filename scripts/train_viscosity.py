#!/usr/bin/env python
"""Viscosity training pipeline (reference ``train_viscosity.py:237-413``
equivalent, TPU-native).

Loads ``viscosity_id_data.pkl`` + ``vocab.pkl`` (reference pickle formats
or the .npz shards), splits 80/10/10 (seed-42 random by default;
``--pair-split`` enables the leak-free pair-level split the reference
leaves commented out), trains the dual-encoder VFT model with early
stopping, then saves history, checkpoint, loss curve, parity plot, and
prints R²/MAE for train/dev/test.
"""

import argparse
import pickle
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default="data/viscosity_id_data.pkl")
    ap.add_argument("--vocab", default="data/vocab.pkl")
    ap.add_argument("--out-dir", default="results/viscosity")
    ap.add_argument("--epochs", type=int, default=1000)
    ap.add_argument("--batch-size", type=int, default=32)
    ap.add_argument("--patience", type=int, default=50)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--num-steps", type=int, default=4)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--steps-per-call", type=int, default=0,
                    help="fold K train steps into one jitted lax.scan dispatch; 0 = auto (8 on TPU, 1 on CPU)")
    ap.add_argument("--pair-split", action="store_true", help="leak-free pair-level split")
    ap.add_argument("--parity-mode", action="store_true", help="reproduce reference quirks")
    ap.add_argument("--dtype", default="auto",
                    choices=["auto", "float32", "bfloat16"],
                    help="auto = bfloat16 on accelerators (quality-gated, "
                         "RESULTS batteries 15/28), float32 on CPU")
    ap.add_argument("--message-impl", default="auto",
                    choices=["auto", "gather", "typed", "symmetric", "onehot"],
                    help="auto = onehot on accelerators, gather on CPU")
    ap.add_argument("--window", type=int, default=0,
                    help="onehot node window (0 = auto: 64 for bf16, 128 else)")
    ap.add_argument("--balance", action="store_true",
                    help="LPT window balancing (opt-in: measured net loss on the\n                    axon backend, RESULTS battery 27)")
    ap.add_argument("--device-epochs", default="auto",
                    choices=["auto", "on", "off"],
                    help="device-resident epochs (A/B isolation flag)")
    ap.add_argument("--paired-epochs", default="auto",
                    choices=["auto", "on", "off"],
                    help="pitch-slot paired device packing (round 5, "
                         "battery 41; auto = on whenever device epochs run)")
    ap.add_argument("--normalize-y", action="store_true",
                    help="z-score log_eta on train stats (de-normalized at "
                         "eval, normalizer persisted — the MP task's "
                         "standard treatment). Tames the raw-scale early "
                         "losses implicated in the battery-36 relu collapse")
    ap.add_argument("--warmup", type=int, default=1000,
                    help="linear LR warmup steps (0 = exact reference "
                         "recipe). Default 1000 (~5 epochs at the 7.7k-"
                         "record scale): guards the collapse-prone relu "
                         "fingerprint path against the huge early losses "
                         "of the raw-scale target — battery 36: a seed-0 "
                         "run deterministically killed 31/32 fp units and "
                         "plateaued at the T-only optimum (R² 0.42); 200 "
                         "steps was too short (ramp ends inside epoch 1), "
                         "1000 restores Test R² 0.9735")
    args = ap.parse_args()

    from ionic_mpnn_tpu.config import (
        TrainConfig, edge_layout_for, resolve_compute_dtype,
        resolve_message_impl, resolve_onehot_window, viscosity_config,
    )
    from ionic_mpnn_tpu.data import Vocab, plan_capacities
    from ionic_mpnn_tpu.data.reference_io import load_id_data_npz, load_pickle
    from ionic_mpnn_tpu.models import ViscosityModel
    from ionic_mpnn_tpu.training import (
        evaluate_splits, fit, pair_level_split, predict, random_split, save_checkpoint,
    )
    from ionic_mpnn_tpu.utils import plot_loss, plot_parity

    data_path = Path(args.data)
    records = (
        load_id_data_npz(data_path) if data_path.suffix == ".npz" else load_pickle(data_path)
    )
    vocab = Vocab.load(args.vocab)
    print(f"{len(records)} records; vocab atoms={vocab.atom_vocab_size} bonds={vocab.bond_vocab_size}")

    if args.pair_split:
        idx_train, idx_dev, idx_test = pair_level_split([r["pair_id"] for r in records])
    else:
        idx_train, idx_dev, idx_test = random_split(len(records))
    train = [records[i] for i in idx_train]
    dev = [records[i] for i in idx_dev]
    test = [records[i] for i in idx_test]
    print(f"split: train={len(train)} dev={len(dev)} test={len(test)}")

    impl = resolve_message_impl(args.message_impl)
    dtype = resolve_compute_dtype(args.dtype)
    window = resolve_onehot_window(dtype, args.window)
    cfg = viscosity_config(
        vocab.atom_vocab_size, vocab.bond_vocab_size,
        num_steps=args.num_steps, parity_mode=args.parity_mode,
        compute_dtype=dtype, message_impl=impl, onehot_window=window,
    )
    tcfg = TrainConfig(
        learning_rate=args.lr, epochs=args.epochs, batch_size=args.batch_size,
        early_stopping_patience=args.patience, seed=args.seed,
        steps_per_call=args.steps_per_call,
        device_epochs={"auto": "auto", "on": True, "off": False}[
            args.device_epochs],
        paired_epochs={"auto": "auto", "on": True, "off": False}[
            args.paired_epochs],
        warmup_steps=0 if args.parity_mode else args.warmup,
        normalize_y=args.normalize_y and not args.parity_mode,
    )
    # capacities from ALL records so dev/test molecules can't overflow at eval
    plan = plan_capacities(records, batch_size=tcfg.batch_size,
                           duplicate_edges=args.parity_mode,
                           edge_layout=edge_layout_for(impl),
                           window=window,
                           balance=args.balance)
    model = ViscosityModel(cfg)
    result = fit(model, cfg, tcfg, train, dev, plan)

    out_dir = Path(args.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    with open(out_dir / "history_viscosity.pkl", "wb") as f:
        pickle.dump(result.history, f)
    from ionic_mpnn_tpu.config import model_config_to_dict

    save_checkpoint(out_dir / "checkpoints", result.epochs_run, result.params,
                    normalizer=result.normalizer,
                    extra={"model_config": model_config_to_dict(cfg)})
    plot_loss(result.history, out_dir / "loss_viscosity.png", "Training curve (viscosity)")

    metrics = evaluate_splits(
        model, result.params, result.batch_stats,
        {"Train": train, "Dev": dev, "Test": test}, plan, result.normalizer,
    )
    for name, m in metrics.items():
        print(f"{name}: R2={m['r2']:.4f}, MAE={m['mae']:.4f}")

    y_train = np.array([r["log_eta"] for r in train], np.float32)
    y_dev = np.array([r["log_eta"] for r in dev], np.float32)
    pred_train = predict(model, result.params, result.batch_stats, train, plan)
    pred_dev = predict(model, result.params, result.batch_stats, dev, plan)
    plot_parity(
        y_train, pred_train, y_dev, pred_dev, out_dir / "figure2_a_viscosity.png",
        xlabel="Experimental log(viscosity)", ylabel="Predicted log(viscosity)",
        title="Viscosity prediction (Figure 2a)",
    )
    print(f"artifacts → {out_dir}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
