#!/usr/bin/env python
"""Evaluation & visualization (the reference Main.ipynb's role as a script).

Re-runs the exact training split, loads saved checkpoints, prints R²/MAE
per split for every trained task found, and regenerates the Figure-2
parity plots and loss curves (reference notebook cells 0-11).
"""

import argparse
import pickle
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def _eval_task(name, model_cls, records, ckpt_dir, out_dir, target_key,
               unit="", default_cfg=None, with_temperature=True):
    from ionic_mpnn_tpu.config import model_config_from_dict
    from ionic_mpnn_tpu.data import plan_capacities
    from ionic_mpnn_tpu.training import (
        evaluate_splits, predict, random_split, restore_checkpoint,
    )
    from ionic_mpnn_tpu.training.normalizer import Normalizer
    from ionic_mpnn_tpu.utils import plot_loss, plot_parity

    restored = restore_checkpoint(ckpt_dir)
    # rebuild the exact trained architecture from the persisted config
    # (older checkpoints without it fall back to the task default)
    if "model_config" in restored.get("extra", {}):
        cfg = model_config_from_dict(restored["extra"]["model_config"])
    elif default_cfg is not None:
        cfg = default_cfg
    else:
        raise KeyError(f"checkpoint {ckpt_dir} has no model_config and no default given")
    model = model_cls(cfg)
    # batch construction must match training: parity-mode checkpoints use
    # the reference's duplicated-edge expansion, and onehot checkpoints
    # need the window layout at the model's trained window size
    from ionic_mpnn_tpu.config import edge_layout_for

    plan = plan_capacities(records, batch_size=32,
                           duplicate_edges=cfg.parity_mode,
                           with_temperature=with_temperature,
                           target_key=target_key,
                           edge_layout=edge_layout_for(cfg.message_impl),
                           window=getattr(cfg, "onehot_window", 128) or 128)
    params = restored.get("best_params", restored["params"])
    batch_stats = restored.get("best_stats", restored.get("batch_stats"))
    normalizer = restored.get("normalizer") or Normalizer.identity()

    idx_train, idx_dev, idx_test = random_split(len(records))
    splits = {
        "Train": [records[i] for i in idx_train],
        "Dev": [records[i] for i in idx_dev],
        "Test": [records[i] for i in idx_test],
    }
    metrics = evaluate_splits(model, params, batch_stats, splits, plan, normalizer)
    print(f"== {name} ==")
    for split, m in metrics.items():
        print(f"  {split}: R2={m['r2']:.4f}, MAE={m['mae']:.4f}{unit}")

    y_train = np.array([r[target_key] for r in splits["Train"]], np.float32)
    y_dev = np.array([r[target_key] for r in splits["Dev"]], np.float32)
    pred_train = normalizer.inverse(predict(model, params, batch_stats, splits["Train"], plan))
    pred_dev = normalizer.inverse(predict(model, params, batch_stats, splits["Dev"], plan))
    plot_parity(y_train, pred_train, y_dev, pred_dev,
                Path(out_dir) / f"parity_{name}.png", title=f"{name} parity")
    hist_files = list(Path(ckpt_dir).parent.glob("history_*.pkl"))
    for hf in hist_files:
        with open(hf, "rb") as f:
            plot_loss(pickle.load(f), Path(out_dir) / f"loss_{name}.png", f"{name} loss")
    return metrics


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-dir", default="data")
    ap.add_argument("--results-dir", default="results")
    ap.add_argument("--out-dir", default="results/evaluation")
    args = ap.parse_args()

    from ionic_mpnn_tpu.config import melting_point_config, viscosity_config
    from ionic_mpnn_tpu.data import Vocab, plan_capacities
    from ionic_mpnn_tpu.data.reference_io import load_pickle
    from ionic_mpnn_tpu.models import MeltingPointModel, TransferMPModel, ViscosityModel
    from ionic_mpnn_tpu.training import random_split

    data_dir = Path(args.data_dir)
    results = Path(args.results_dir)
    out_dir = Path(args.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    vocab = Vocab.load(data_dir / "vocab.pkl")

    any_found = False
    vis_ckpt = results / "viscosity/checkpoints"
    if vis_ckpt.exists():
        any_found = True
        records = load_pickle(data_dir / "viscosity_id_data.pkl")
        _eval_task("viscosity", ViscosityModel, records, vis_ckpt, out_dir,
                   "log_eta", " log10(cP)",
                   default_cfg=viscosity_config(vocab.atom_vocab_size,
                                                vocab.bond_vocab_size))

    mp_ckpt = results / "melting_point/checkpoints"
    if mp_ckpt.exists():
        any_found = True
        records = load_pickle(data_dir / "mp_id_data.pkl")
        _eval_task("melting_point", MeltingPointModel, records, mp_ckpt,
                   out_dir, "mp", " K", with_temperature=False,
                   default_cfg=melting_point_config(vocab.atom_vocab_size,
                                                    vocab.bond_vocab_size))

    tr_ckpt = results / "transfer/checkpoints"
    if tr_ckpt.exists():
        any_found = True
        records = load_pickle(data_dir / "mp_id_data.pkl")
        _eval_task("transfer", TransferMPModel, records, tr_ckpt,
                   out_dir, "mp", " K", with_temperature=False,
                   default_cfg=viscosity_config(
                       vocab.atom_vocab_size, vocab.bond_vocab_size
                   ).replace(head="transfer"))

    if not any_found:
        print("no checkpoints found under", results)
        return 1
    print(f"figures → {out_dir}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
