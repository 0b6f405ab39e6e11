#!/usr/bin/env python
"""Device brute-sweep layout A/B: halo "window" vs pitch-"window_aligned".

One layout per invocation (fresh-process isolation):

    python scripts/tpu_screen_aligned_ab.py aligned [n_pairs]
    python scripts/tpu_screen_aligned_ab.py window  [n_pairs]

Append "-shared" to the layout (aligned-shared / window-shared) to disable
per-side capacities — the round-3 A/B control (anion planes sized by the
shared cation-or-max caps, the pre-battery-28 behavior).

Append "-stub" (e.g. aligned-stub) to replace the model forward with a
checksum reduction that CONSUMES every packed plane but does no model
math — the round-4 IN-SITU pack-vs-forward split (VERDICT item 2): the
sweep program keeps its exact shape (device pack, masking, top-k, scan,
pipeline), so full − stub = the forward's true share, and stub = the
pack+sweep machinery's true cost inside the real program (the standalone
pack probe measured materialization XLA elides in situ — battery 30).

Builds a synthetic ion library, runs ScreeningEngine.screen_grid with
device packing on the onehot model, prints one JSON line with pairs/s.
Timing is the engine's own (fetch-synced: the top-k outputs are pulled to
host every dispatch).
"""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from ionic_mpnn_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import numpy as np


def main() -> int:
    layout = sys.argv[1] if len(sys.argv) > 1 else "aligned"
    stub = layout.endswith("-stub")
    layout = layout.removesuffix("-stub")
    per_side = not layout.endswith("-shared")
    layout = layout.removesuffix("-shared")
    lane = not layout.endswith("-noalign")  # battery 45 A/B control
    layout = layout.removesuffix("-noalign")
    n_pairs = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000_000
    batch = int(sys.argv[3]) if len(sys.argv) > 3 else 4096
    dtype = sys.argv[4] if len(sys.argv) > 4 else "auto"  # auto|float32|bfloat16
    window = int(sys.argv[5]) if len(sys.argv) > 5 else 0  # 0 = auto

    from ionic_mpnn_tpu.config import viscosity_config
    from ionic_mpnn_tpu.data import iter_batches, plan_capacities
    from ionic_mpnn_tpu.data.loader import BatchPlan
    from ionic_mpnn_tpu.data.synthetic import ANION_SMILES, CATION_TEMPLATES
    from ionic_mpnn_tpu.inference import ScreeningEngine
    from ionic_mpnn_tpu.models import ViscosityModel
    from ionic_mpnn_tpu.benchmarks import make_bench_dataset

    # ion library: all template cations x all anions
    cations = []
    for kind, fn in CATION_TEMPLATES:
        for n1 in (1, 2, 3, 4, 6, 8):
            cations.append(fn(n1, 1) if kind == "im" else fn(n1))
    cations = sorted(set(cations))
    anions = [s for _, s, _ in ANION_SMILES]
    n_temps = max(1, n_pairs // (len(cations) * len(anions)))
    temps = list(np.linspace(280.0, 380.0, n_temps))

    records, vocab = make_bench_dataset(64)
    from ionic_mpnn_tpu.config import resolve_compute_dtype, resolve_onehot_window

    cdtype = resolve_compute_dtype(dtype)
    win = resolve_onehot_window(cdtype, window)
    cfg = viscosity_config(vocab.atom_vocab_size, vocab.bond_vocab_size,
                           message_impl="onehot", compute_dtype=cdtype,
                           onehot_window=win)
    model = ViscosityModel(cfg)
    init_plan = plan_capacities(records, batch_size=8,
                                edge_layout="window_aligned")
    params = model.init(jax.random.PRNGKey(0),
                        next(iter_batches(records[:8], init_plan)))

    # engine plan: edge_layout carries the request; screen_grid derives
    # the sweep plan (aligned only honored on the device path)
    plan = BatchPlan(batch_size=batch, node_cap=batch * 64,
                     edge_cap=batch * 192, window=win,
                     edge_layout="window_aligned" if layout == "aligned"
                     else "window")
    engine = ScreeningEngine(model, params["params"], vocab, plan)
    if layout == "factorized":
        # round-5 item 6: re-adjudicate the sweep default on round-4/5
        # paths — the factorized number on record (233k steady) is
        # round-3-era while brute went 92.6k -> 523k across rounds
        import time as _time

        t0 = _time.perf_counter()
        report = engine.screen_grid_factorized(
            cations, anions, temps, top_k=50)
        wall = _time.perf_counter() - t0
        print(json.dumps({
            "mode": "screen-factorized", "dtype": cdtype, "window": win,
            "n_screened": report.n_screened,
            "pairs_per_s": round(report.pairs_per_s, 1),
            "wall_s": round(wall, 2),
            "top1": (report.results[0].prediction
                     if report.results else None),
        }))
        return 0
    if stub:
        import jax.numpy as jnp

        def checksum_fwd(v, b):
            # consume EVERY packed plane (so nothing the pack produces is
            # dead-code-eliminated) without any model math
            s = jnp.float32(0.0)
            for g in (b.cation, b.anion):
                for arr in (g.atom_ids, g.bond_ids, g.src, g.dst,
                            g.node_graph, g.node_local):
                    s = s + jnp.sum(arr).astype(jnp.float32) * 1e-12
                s = s + jnp.sum(g.node_mask) * 1e-12 + jnp.sum(g.edge_mask) * 1e-12
                if g.pool_slot is not None:
                    s = s + jnp.sum(g.pool_slot).astype(jnp.float32) * 1e-12
            return b.temperature[:, 0] + s

        engine._fwd = checksum_fwd
    report = engine.screen_grid(
        cations, anions, temps, top_k=50,
        device_pack=True, steps_per_call=8, progress_every=500_000,
        per_side_caps=per_side, lane_aligned_tiles=lane,
    )
    print(json.dumps({
        "mode": f"screen-{layout}" + ("" if per_side else "-shared")
                + ("-stub" if stub else "")
                + ("" if lane else "-noalign"),
        "dtype": cdtype, "window": win,
        "n_screened": report.n_screened,
        "pairs_per_s": round(report.pairs_per_s, 1),
        "wall_s": round(report.wall_s, 2),
        "device_s": round(report.device_s, 2),
        "steady_pairs_per_s": round(report.steady_pairs_per_s, 1),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
