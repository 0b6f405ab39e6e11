"""Checkpoint / resume via Orbax (async-capable, multi-host safe).

The reference only saves final ``.keras`` files with no mid-training
resume (SURVEY §5.4). Here: step-indexed Orbax checkpoints of the full
training state (params, batch_stats, opt_state optional), plus the target
normalizer stats the reference forgets to persist
(``train_melting_point.py`` never writes ``mp_norm_params.pkl``).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import orbax.checkpoint as ocp

from .normalizer import Normalizer

__all__ = ["save_checkpoint", "restore_checkpoint", "latest_step"]


def save_checkpoint(
    directory,
    step: int,
    params: Any,
    batch_stats: Any = None,
    opt_state: Any = None,
    normalizer: Optional[Normalizer] = None,
    extra: Optional[Dict[str, Any]] = None,
    extra_arrays: Optional[Dict[str, Any]] = None,
) -> Path:
    directory = Path(directory).absolute()
    directory.mkdir(parents=True, exist_ok=True)
    path = directory / f"step_{step:08d}"
    payload = {"params": jax.device_get(params)}
    if batch_stats:
        payload["batch_stats"] = jax.device_get(batch_stats)
    if opt_state is not None:
        payload["opt_state"] = jax.device_get(opt_state)
    if extra_arrays:
        for k, v in extra_arrays.items():
            payload[k] = jax.device_get(v)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path / "state", payload, force=True)
    meta = {"step": step}
    if normalizer is not None:
        meta["normalizer"] = {"mean": normalizer.mean, "std": normalizer.std}
    if extra:
        meta["extra"] = extra
    (path / "meta.json").write_text(json.dumps(meta))
    return path


def latest_step(directory) -> Optional[int]:
    directory = Path(directory)
    if not directory.exists():
        return None
    steps = sorted(
        int(p.name.split("_")[1]) for p in directory.glob("step_*") if (p / "meta.json").exists()
    )
    return steps[-1] if steps else None


def restore_checkpoint(directory, step: Optional[int] = None, target: Any = None) -> Dict[str, Any]:
    """Restore a checkpoint; ``target`` (a matching pytree of arrays) enables
    exact dtype/shape restoration. Returns payload + metadata."""
    directory = Path(directory).absolute()
    if step is None:
        step = latest_step(directory)
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {directory}")
    path = directory / f"step_{step:08d}"
    with ocp.StandardCheckpointer() as ckptr:
        if target is not None:
            payload = ckptr.restore(path / "state", target)
        else:
            payload = ckptr.restore(path / "state")
    meta = json.loads((path / "meta.json").read_text())
    out = dict(payload)
    out["step"] = meta["step"]
    if "normalizer" in meta:
        out["normalizer"] = Normalizer(**meta["normalizer"])
    if "extra" in meta:
        out["extra"] = meta["extra"]
    return out
