#!/usr/bin/env python
"""Ionic-liquid screening sweep: grid of cation×anion×T candidates →
top-k lowest-viscosity pairs (BASELINE config 5).

Loads a trained viscosity checkpoint and sweeps either a provided
candidate CSV (columns cation,anion,T) or the synthetic template grid.
"""

import argparse
import csv
import itertools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--vocab", default="data/vocab.pkl")
    ap.add_argument("--checkpoint", default="results/viscosity/checkpoints")
    ap.add_argument("--candidates", help="CSV with cation,anion,T columns")
    ap.add_argument("--temperature", type=float, default=298.15)
    ap.add_argument("--top-k", type=int, default=20)
    ap.add_argument("--batch-size", type=int, default=512)
    ap.add_argument("--out", default="results/screen_top.csv")
    ap.add_argument("--grid-cations", type=int, default=0,
                    help="grid sweep: enumerate N synthetic cations x anions "
                         "x temperatures via the vectorized screen_grid path")
    ap.add_argument("--temperatures", default="",
                    help="comma-separated T grid for --grid-cations sweeps")
    ap.add_argument("--target-candidates", type=int, default=0,
                    help="size the T grid (273-393 K) so the sweep reaches "
                         "this many candidates")
    ap.add_argument("--progress-every", type=int, default=0)
    ap.add_argument("--host-pack", action="store_true",
                    help="use the host C++-packer pipeline instead of the "
                         "default device-resident grid packing")
    ap.add_argument("--steps-per-call", type=int, default=8,
                    help="batches folded into one dispatch (device path)")
    ap.add_argument("--model", default="viscosity", choices=["viscosity", "mp"],
                    help="mp = screen for LOW MELTING POINT with a "
                    "melting-point checkpoint (no temperature axis)")
    ap.add_argument("--brute-force", action="store_true",
                    help="grid sweeps: evaluate every candidate pair through "
                    "the full model instead of the exact-math factorized "
                    "path (encode each unique ion once; VFT head closed "
                    "form over the T grid)")
    ap.add_argument("--window", type=int, default=0,
                    help="onehot node window override (0 = checkpoint's; "
                    "bump to 128 to screen ion libraries larger than a "
                    "w64-trained model's window — the window is execution "
                    "layout, not parameters, so any value is exact)")
    ap.add_argument("--message-impl", default="auto",
                    choices=["auto", "gather", "typed", "symmetric", "onehot"],
                    help="execution strategy (param-tree-identical, so it can "
                    "differ from the checkpoint's); auto = onehot on "
                    "accelerators, gather on CPU")
    args = ap.parse_args()

    from ionic_mpnn_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from ionic_mpnn_tpu.config import (
        edge_layout_for, melting_point_config, resolve_message_impl,
        viscosity_config,
    )
    from ionic_mpnn_tpu.data import Vocab
    from ionic_mpnn_tpu.data.loader import BatchPlan
    from ionic_mpnn_tpu.data.synthetic import ANION_SMILES, CATION_TEMPLATES
    from ionic_mpnn_tpu.inference import ScreeningEngine
    from ionic_mpnn_tpu.models import MeltingPointModel, ViscosityModel
    from ionic_mpnn_tpu.training import restore_checkpoint

    vocab = Vocab.load(args.vocab)
    restored = restore_checkpoint(args.checkpoint)
    if "model_config" in restored.get("extra", {}):
        from ionic_mpnn_tpu.config import model_config_from_dict

        cfg = model_config_from_dict(restored["extra"]["model_config"])
    elif args.model == "mp":
        cfg = melting_point_config(vocab.atom_vocab_size, vocab.bond_vocab_size)
    else:
        cfg = viscosity_config(vocab.atom_vocab_size, vocab.bond_vocab_size)
    impl = resolve_message_impl(args.message_impl)
    cfg = cfg.replace(message_impl=impl)
    if args.window:
        cfg = cfg.replace(onehot_window=args.window)
    model = MeltingPointModel(cfg) if args.model == "mp" else ViscosityModel(cfg)

    if args.candidates:
        def candidates():
            with open(args.candidates) as f:
                for row in csv.DictReader(f):
                    yield row["cation"], row["anion"], float(row.get("T", args.temperature))
    else:
        cations = []
        for kind, fn in CATION_TEMPLATES:
            for n1 in range(1, 13):
                cations.append(fn(n1, 1) if kind == "im" else fn(n1))
        anions = [s for _, s, _ in ANION_SMILES]

        def candidates():
            for c, a in itertools.product(cations, anions):
                yield c, a, args.temperature

    # generous static capacities for arbitrary candidates; edge handling
    # must match the checkpoint's training mode (parity = duplicated edges)
    # and window tiling must match the checkpoint model's onehot window
    window = getattr(cfg, "onehot_window", 128) or 128
    node_per = ((96 + window - 1) // window) * window
    plan = BatchPlan(
        batch_size=args.batch_size,
        node_cap=args.batch_size * node_per,  # multiple of the onehot window
        edge_cap=args.batch_size * 256,
        target_key="mp" if args.model == "mp" else "log_eta",
        with_temperature=args.model != "mp",
        duplicate_edges=cfg.parity_mode,
        edge_layout=edge_layout_for(impl),
        window=window,
    )
    engine = ScreeningEngine(model, restored["params"], vocab, plan,
                             normalizer=restored.get("normalizer"))

    if args.grid_cations:
        # Vectorized grid sweep (BASELINE config 5 path): synthetic cation
        # family enumerated combinatorially x anion library x T grid.
        from ionic_mpnn_tpu.data.synthetic import SCREEN_ANIONS, enumerate_cations

        grid_cations = enumerate_cations(args.grid_cations)
        grid_anions = list(SCREEN_ANIONS)
        temps = [float(x) for x in args.temperatures.split(",") if x]
        if not temps and args.target_candidates:
            # how many in-vocab ions will survive decides the T-grid size
            from ionic_mpnn_tpu.inference import IonPool

            n_pairs = len(IonPool(grid_cations, vocab)) * len(
                IonPool(grid_anions, vocab)
            )
            n_t = max(1, -(-args.target_candidates // max(n_pairs, 1)))
            import numpy as _np

            temps = [float(t) for t in _np.linspace(273.15, 393.15, n_t)]
            print(f"T grid: {n_t} points x {n_pairs:,} pairs")
        elif not temps:
            temps = [args.temperature]
        if args.model == "mp":
            temps = [0.0]  # melting point has no temperature input
        t0 = time.time()
        if args.brute_force:
            report = engine.screen_grid(
                grid_cations, grid_anions, temps, top_k=args.top_k,
                minimize=True, progress_every=args.progress_every,
                device_pack=not args.host_pack,
                steps_per_call=args.steps_per_call,
            )
        else:
            report = engine.screen_grid_factorized(
                grid_cations, grid_anions, temps, top_k=args.top_k,
                minimize=True,
            )
        results, dt = report.results, time.time() - t0
        steady = (f", {report.steady_pairs_per_s:,.0f} pairs/s steady "
                  "(post-compile)" if report.steady_pairs_per_s else "")
        print(f"grid sweep: {report.n_screened:,} pairs at "
              f"{report.pairs_per_s:,.0f} pairs/s{steady} "
              f"({len(report.skipped)} ions skipped; consumer waited "
              f"{report.producer_wait_s:.0f}s on packing, "
              f"{report.device_s:.0f}s on device+dispatch)")
    else:
        t0 = time.time()
        results = list(engine.screen(candidates(), top_k=args.top_k, minimize=True))
        dt = time.time() - t0

    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    with open(out, "w", newline="") as f:
        w = csv.writer(f)
        pred_col = "pred_mp_K" if args.model == "mp" else "pred_log10_eta"
        w.writerow(["rank", "cation", "anion", "T", pred_col])
        for i, r in enumerate(results, 1):
            w.writerow([i, r.cation, r.anion, f"{r.temperature:.2f}", f"{r.prediction:.4f}"])
    print(f"screened in {dt:.1f}s → top-{args.top_k} at {out}")
    for r in results[:5]:
        print(f"  {r.prediction:8.4f}  {r.cation}  ·  {r.anion}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
