"""Checkpoint / resume via Orbax (ASYNC by default, multi-host safe).

The reference only saves final ``.keras`` files with no mid-training
resume (SURVEY §5.4). Here: step-indexed Orbax checkpoints of the full
training state (params, batch_stats, opt_state optional), plus the target
normalizer stats the reference forgets to persist
(``train_melting_point.py`` never writes ``mp_norm_params.pkl``).

Async checkpointing (SURVEY §2.3 elasticity row): :class:`CheckpointWriter`
wraps ``ocp.AsyncCheckpointer`` — ``save()`` returns after the cheap
host-side snapshot while array serialization runs on a background thread,
so the epoch loop never blocks on disk. Orbax commits the checkpoint
directory atomically (tmp dir + rename when the flush finishes), and
:func:`latest_step` only counts committed saves, so resume never sees a
partial checkpoint. ``wait()``/``close()`` join the in-flight save.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import orbax.checkpoint as ocp

from .normalizer import Normalizer

__all__ = [
    "CheckpointWriter",
    "save_checkpoint",
    "restore_checkpoint",
    "latest_step",
]


def _build_payload(
    params: Any,
    batch_stats: Any = None,
    opt_state: Any = None,
    extra_arrays: Optional[Dict[str, Any]] = None,
) -> Dict[str, Any]:
    # device_get snapshots everything to host numpy up front, so the async
    # background flush never races live (donated/updated) device buffers.
    payload = {"params": jax.device_get(params)}
    if batch_stats:
        payload["batch_stats"] = jax.device_get(batch_stats)
    if opt_state is not None:
        payload["opt_state"] = jax.device_get(opt_state)
    if extra_arrays:
        for k, v in extra_arrays.items():
            payload[k] = jax.device_get(v)
    return payload


class CheckpointWriter:
    """Reusable checkpoint writer; ``async_save=True`` (default) makes
    ``save()`` non-blocking (one save in flight at a time — a second save
    joins the first, which keeps ordering trivially correct)."""

    def __init__(self, async_save: bool = True):
        self.async_save = async_save
        if async_save:
            self._ckptr = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
        else:
            self._ckptr = ocp.Checkpointer(ocp.StandardCheckpointHandler())

    def save(
        self,
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
        payload = _build_payload(params, batch_stats, opt_state, extra_arrays)
        self._ckptr.save(path / "state", payload, force=True)
        # meta.json is tiny and written synchronously; checkpoint validity
        # is gated on the (atomically committed) state dir, not on meta —
        # see latest_step().
        meta = {"step": step}
        if normalizer is not None:
            meta["normalizer"] = {"mean": normalizer.mean, "std": normalizer.std}
        if extra:
            meta["extra"] = extra
        (path / "meta.json").write_text(json.dumps(meta))
        return path

    def wait(self) -> None:
        """Block until the in-flight save (if any) has committed."""
        if hasattr(self._ckptr, "wait_until_finished"):
            self._ckptr.wait_until_finished()

    def close(self) -> None:
        self.wait()
        self._ckptr.close()

    def __enter__(self) -> "CheckpointWriter":
        return self

    def __exit__(self, *exc) -> None:
        self.close()


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
    """One-shot synchronous save (convenience; ``fit`` uses a long-lived
    async :class:`CheckpointWriter` instead)."""
    with CheckpointWriter(async_save=False) as w:
        return w.save(directory, step, params, batch_stats, opt_state,
                      normalizer, extra, extra_arrays)


def latest_step(directory) -> Optional[int]:
    directory = Path(directory)
    if not directory.exists():
        return None
    steps = sorted(
        int(p.name.split("_")[1])
        for p in directory.glob("step_*")
        # "state" only exists once Orbax commits (tmp-dir rename), so an
        # in-flight async save is never offered for resume
        if (p / "meta.json").exists() and (p / "state").exists()
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
