#!/usr/bin/env python
"""Melting-point training pipeline (reference ``train_melting_point.py:
221-335`` equivalent, TPU-native).

z-score normalizes the target on train-split stats (std-or-1 guard,
``train_melting_point.py:255-258``), trains the 1024-dim-bond-embedding
MPNN, evaluates de-normalized, and — unlike the reference, which never
persists its normalization stats — saves them with the checkpoint.
"""

import argparse
import pickle
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default="data/mp_id_data.pkl")
    ap.add_argument("--vocab", default="data/vocab.pkl")
    ap.add_argument("--out-dir", default="results/melting_point")
    ap.add_argument("--epochs", type=int, default=1000)
    ap.add_argument("--batch-size", type=int, default=32)
    ap.add_argument("--patience", type=int, default=50)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--num-steps", type=int, default=4)
    ap.add_argument("--atom-dim", type=int, default=32)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--steps-per-call", type=int, default=0,
                    help="fold K train steps into one jitted lax.scan dispatch; 0 = auto (8 on TPU, 1 on CPU)")
    ap.add_argument("--parity-mode", action="store_true")
    ap.add_argument("--message-impl", default="auto",
                    choices=["auto", "gather", "typed", "symmetric", "onehot"],
                    help="auto = onehot on accelerators, gather on CPU")
    ap.add_argument("--dtype", default="auto",
                    choices=["auto", "float32", "bfloat16"],
                    help="auto = bfloat16 on accelerators, float32 on CPU")
    ap.add_argument("--window", type=int, default=0,
                    help="onehot node window (0 = auto: 64 for bf16, 128 else)")
    ap.add_argument("--warmup", type=int, default=0,
                    help="linear LR warmup steps (0 = reference recipe; MP "
                         "z-scores its target so the battery-36 raw-scale "
                         "collapse risk is already tamed — flag provided "
                         "for parity with train_viscosity)")
    ap.add_argument("--balance", action="store_true",
                    help="LPT window balancing (opt-in: measured net loss on the\n                    axon backend, RESULTS battery 27)")
    args = ap.parse_args()

    from ionic_mpnn_tpu.config import (
        TrainConfig, edge_layout_for, melting_point_config,
        resolve_compute_dtype, resolve_message_impl, resolve_onehot_window,
    )
    from ionic_mpnn_tpu.data import Vocab, plan_capacities
    from ionic_mpnn_tpu.data.reference_io import load_id_data_npz, load_pickle
    from ionic_mpnn_tpu.models import MeltingPointModel
    from ionic_mpnn_tpu.training import evaluate_splits, fit, random_split, save_checkpoint
    from ionic_mpnn_tpu.utils import plot_loss

    data_path = Path(args.data)
    records = (
        load_id_data_npz(data_path) if data_path.suffix == ".npz" else load_pickle(data_path)
    )
    vocab = Vocab.load(args.vocab)

    idx_train, idx_dev, idx_test = random_split(len(records))
    train = [records[i] for i in idx_train]
    dev = [records[i] for i in idx_dev]
    test = [records[i] for i in idx_test]
    print(f"split: train={len(train)} dev={len(dev)} test={len(test)}")

    impl = resolve_message_impl(args.message_impl)
    dtype = resolve_compute_dtype(args.dtype)
    window = resolve_onehot_window(dtype, args.window, atom_dim=args.atom_dim)
    cfg = melting_point_config(
        vocab.atom_vocab_size, vocab.bond_vocab_size,
        atom_dim=args.atom_dim, num_steps=args.num_steps, parity_mode=args.parity_mode,
        message_impl=impl, compute_dtype=dtype, onehot_window=window,
    )
    tcfg = TrainConfig(
        learning_rate=args.lr, epochs=args.epochs, batch_size=args.batch_size,
        early_stopping_patience=args.patience, seed=args.seed,
        steps_per_call=args.steps_per_call,
        normalize_y=True, normalize_guard="or1",
        warmup_steps=0 if args.parity_mode else args.warmup,
    )
    plan = plan_capacities(records, batch_size=tcfg.batch_size,
                           with_temperature=False, target_key="mp",
                           duplicate_edges=args.parity_mode,
                           edge_layout=edge_layout_for(impl),
                           window=window, balance=args.balance)
    model = MeltingPointModel(cfg)
    result = fit(model, cfg, tcfg, train, dev, plan)

    out_dir = Path(args.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    with open(out_dir / "history_mp.pkl", "wb") as f:
        pickle.dump(result.history, f)
    from ionic_mpnn_tpu.config import model_config_to_dict

    save_checkpoint(out_dir / "checkpoints", result.epochs_run, result.params,
                    normalizer=result.normalizer,
                    extra={"model_config": model_config_to_dict(cfg)})
    result.normalizer.save(out_dir / "mp_norm_params.json")
    plot_loss(result.history, out_dir / "loss_mp.png", "Training curve (melting point)")

    metrics = evaluate_splits(
        model, result.params, result.batch_stats,
        {"Train": train, "Dev": dev, "Test": test}, plan, result.normalizer,
    )
    for name, m in metrics.items():
        print(f"{name}: R2={m['r2']:.4f}, MAE={m['mae']:.2f} K")
    print(f"artifacts → {out_dir}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
