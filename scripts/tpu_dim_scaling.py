#!/usr/bin/env python
"""Battery 42: large-dim scaling arm (VERDICT r4 item 3).

The D=32 reference family leaves >=3/4 of the 128 MXU lanes idle
(BENCH_r04 mfu 0.032); this battery runs the SAME fetch-synced step
protocol as bench.py at atom_dim in {32, 64, 128} (fp_size scaled with
D) and reports ms/step, edges/s, and analytic-roofline MFU — the
demonstration that the step formulation saturates the chip as the model
grows.

Usage: python scripts/tpu_dim_scaling.py [batch] [D[:impl[:window]] ...]
       (defaults: 2048 and 32 64 128; impl in
        onehot|basis|gather|symmetric|typed; window 0 = the dim-aware
        auto rule. Battery 42 pt 2 verdicts: onehot wins at every D —
        gather materializes (E,D,D) per-edge matrices (206.7 ms at D=64,
        HBM-OOM at D=128), typed executes ~V× fewer FLOPs but its
        scatters price it 1.4× slower, basis loses whenever F ≥ V; the
        window knee is ~256 above D=32.)
"""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from ionic_mpnn_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()


def main():
    args = sys.argv[1:]
    bs = int(args[0]) if args and args[0].isdigit() else 2048
    rest = args[1:] if args and args[0].isdigit() else args
    dims = []
    for a in (rest or ["32", "64", "128"]):
        parts = a.split(":")
        d = int(parts[0])
        impl = parts[1] if len(parts) > 1 else "onehot"
        win = int(parts[2]) if len(parts) > 2 else 0  # 0 = auto
        dims.append((d, impl, win))

    from ionic_mpnn_tpu.benchmarks import (
        bench_packed_train_step,
        make_bench_dataset,
    )
    from ionic_mpnn_tpu.benchmarks.roofline import roofline_summary
    from ionic_mpnn_tpu.config import (
        resolve_compute_dtype,
        resolve_onehot_window,
    )

    records, vocab = make_bench_dataset(max(bs, 512))
    dtype = resolve_compute_dtype("auto")

    from ionic_mpnn_tpu.config import edge_layout_for

    for D, impl, win in dims:
        msg_impl = "onehot" if impl == "basis" else impl
        try:
            r = bench_packed_train_step(
                records, vocab, batch_size=bs, num_steps=4, iters=20, warmup=3,
                compute_dtype=dtype, message_impl=msg_impl, inner=8,
                window=win or resolve_onehot_window(dtype, atom_dim=D),
                atom_dim=0 if D == 32 else D,
                edge_layout=edge_layout_for(msg_impl),
                onehot_select="basis" if impl == "basis" else "auto",
            )
        except Exception as e:  # one arm failing (e.g. HBM OOM) shouldn't
            # kill the battery — D=128 gather needs a 30 GB (E, D, D)
            # per-edge-matrix temp and legitimately cannot compile
            print(json.dumps({
                "atom_dim": D, "impl": impl, "batch": bs,
                "window": win or resolve_onehot_window(dtype, atom_dim=D),
                "error": str(e).splitlines()[0][:200],
            }), flush=True)
            continue
        roof = roofline_summary(
            {"flops": r.flops_per_step, "hbm_bytes": r.hbm_bytes_per_step},
            measured_step_seconds=1.0 / r.steps_per_s,
        )
        print(json.dumps({
            "atom_dim": D, "impl": impl, "batch": bs, "dtype": dtype,
            "window": win or resolve_onehot_window(dtype, atom_dim=D),
            "ms_per_step": round(1e3 / r.steps_per_s, 3),
            "edges_per_s": round(r.edges_per_s, 1),
            "mfu": round(roof["mfu"], 5),
            "hbm_bound_fraction": round(roof["hbm_bound_fraction"], 4),
            "roofline_headroom": round(roof["roofline_headroom"], 2),
            "flops_per_step": r.flops_per_step,
        }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
