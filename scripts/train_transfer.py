#!/usr/bin/env python
"""Transfer-learning pipeline (reference ``train_melting_point_transfer.py``
equivalent): pretrained viscosity trunk → melting-point head, two stages.

Loads a viscosity checkpoint (from ``scripts/train_viscosity.py``),
transplants the trunk into the transfer model, runs stage 1 (frozen
trunk, Huber loss, Adam lr_stage1) and stage 2 (partial unfreeze, Adam
lr_stage2), and saves model + scaler stats
(``train_melting_point_transfer.py:76-287``).
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
    ap.add_argument("--viscosity-checkpoint", default="results/viscosity/checkpoints")
    ap.add_argument("--out-dir", default="results/transfer")
    ap.add_argument("--lr-stage1", type=float, default=1e-3)
    ap.add_argument("--lr-stage2", type=float, default=1e-4)
    ap.add_argument("--epochs", type=int, default=1000)
    ap.add_argument("--patience", type=int, default=50)
    ap.add_argument("--num-steps", type=int, default=4)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--message-impl", default="auto",
                    choices=["auto", "gather", "typed", "symmetric", "onehot"],
                    help="auto = onehot on accelerators, gather on CPU; the "
                    "impl is execution strategy only (param trees are "
                    "identical), so it can differ from the checkpoint's")
    args = ap.parse_args()

    from ionic_mpnn_tpu.config import (
        edge_layout_for, resolve_message_impl, viscosity_config,
    )
    from ionic_mpnn_tpu.data import Vocab, plan_capacities
    from ionic_mpnn_tpu.data.reference_io import load_id_data_npz, load_pickle
    from ionic_mpnn_tpu.training import evaluate_splits, random_split, restore_checkpoint, save_checkpoint
    from ionic_mpnn_tpu.training.transfer_pipeline import train_transfer
    from ionic_mpnn_tpu.utils import plot_loss

    data_path = Path(args.data)
    records = (
        load_id_data_npz(data_path) if data_path.suffix == ".npz" else load_pickle(data_path)
    )
    vocab = Vocab.load(args.vocab)

    restored = restore_checkpoint(args.viscosity_checkpoint)
    vis_params = restored["params"]
    print(f"loaded viscosity checkpoint @ step {restored['step']}")

    idx_train, idx_dev, idx_test = random_split(len(records))
    train = [records[i] for i in idx_train]
    dev = [records[i] for i in idx_dev]
    test = [records[i] for i in idx_test]
    print(f"split: train={len(train)} dev={len(dev)} test={len(test)}")

    if "model_config" in restored.get("extra", {}):
        from ionic_mpnn_tpu.config import model_config_from_dict

        cfg = model_config_from_dict(restored["extra"]["model_config"])
    else:
        cfg = viscosity_config(
            vocab.atom_vocab_size, vocab.bond_vocab_size, num_steps=args.num_steps
        )
    impl = resolve_message_impl(args.message_impl)
    cfg = cfg.replace(message_impl=impl)
    # batch layout follows the (checkpoint-persisted) model window
    window = getattr(cfg, "onehot_window", 128) or 128
    plan = plan_capacities(records, batch_size=32, with_temperature=False,
                           target_key="mp", edge_layout=edge_layout_for(impl),
                           window=window)

    result = train_transfer(
        vis_params, cfg, train, dev, plan,
        lr_stage1=args.lr_stage1, lr_stage2=args.lr_stage2,
        epochs=args.epochs, patience=args.patience, seed=args.seed,
    )

    out_dir = Path(args.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    with open(out_dir / "history_transfer.pkl", "wb") as f:
        pickle.dump(result.history, f)
    from ionic_mpnn_tpu.config import model_config_to_dict

    save_checkpoint(out_dir / "checkpoints", len(result.history["loss"]), result.params,
                    batch_stats=result.batch_stats, normalizer=result.normalizer,
                    extra={"model_config": model_config_to_dict(cfg)})
    result.normalizer.save(out_dir / "scaler.json")
    plot_loss(result.history, out_dir / "loss_transfer.png", "Transfer training (both stages)")

    metrics = evaluate_splits(
        result.model, result.params, result.batch_stats,
        {"Train": train, "Dev": dev, "Test": test}, plan, result.normalizer,
    )
    for name, m in metrics.items():
        print(f"{name}: R2={m['r2']:.4f}, MAE={m['mae']:.2f} K")
    print(f"artifacts → {out_dir}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
