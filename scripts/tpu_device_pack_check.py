#!/usr/bin/env python
"""Bitwise check of the on-device batch pack (device_epochs path).

The round-4 quality bisect isolated the TPU regression to device-
resident epochs while every CPU check (pool fidelity, 8-step param
parity) passes — leaving the axon backend's EXECUTION of the pack
program as the suspect. This fetches every plane of jitted
``_device_batch`` outputs and prints per-plane sha256 checksums; run it
once on the TPU and once with ``cpu`` as argv[1] and diff the output.

    python scripts/tpu_device_pack_check.py        # axon backend
    python scripts/tpu_device_pack_check.py cpu    # CPU reference
"""

import hashlib
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

if len(sys.argv) > 1 and sys.argv[1] == "cpu":
    jax.config.update("jax_platforms", "cpu")

from ionic_mpnn_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax.numpy as jnp
import numpy as np


def main():
    from ionic_mpnn_tpu.data.reference_io import load_pickle
    from ionic_mpnn_tpu.training.device_epochs import (
        _device_batch,
        build_device_dataset,
    )

    records = load_pickle("/tmp/r4q/data/viscosity_id_data.pkl")
    # the TPU run's exact train split + epoch-2 permutation
    from ionic_mpnn_tpu.training.splits import random_split

    idx_train, _, _ = random_split(len(records))
    train = [records[i] for i in idx_train]
    ds = build_device_dataset(train, 64, "log_eta")
    print(json.dumps({"backend": jax.devices()[0].platform, "n": ds.n}),
          flush=True)

    pack = jax.jit(lambda perm, g0: _device_batch(
        ds, jax.lax.dynamic_slice(perm, (g0,), (32,))))
    rng = np.random.default_rng(1)  # seed+epoch analogue
    perm = rng.permutation(ds.n).astype(np.int32)
    perm = np.concatenate([perm, np.full((-len(perm)) % 256, ds.n, np.int32)])
    perm_dev = jnp.asarray(perm)

    for g0 in (0, 256, 5888, 6112):
        b = pack(perm_dev, jnp.int32(g0))
        planes = {}
        for side_name in ("cation", "anion"):
            g = getattr(b, side_name)
            for f in ("atom_ids", "bond_ids", "src", "dst", "node_graph",
                      "node_local", "node_mask", "edge_mask", "pool_slot"):
                a = np.asarray(getattr(g, f))
                planes[f"{side_name}.{f}"] = hashlib.sha256(
                    a.tobytes()).hexdigest()[:12]
        for f in ("temperature", "y", "sample_mask"):
            planes[f] = hashlib.sha256(
                np.asarray(getattr(b, f)).tobytes()).hexdigest()[:12]
        print(json.dumps({"g0": g0, "planes": planes}), flush=True)


if __name__ == "__main__":
    main()
