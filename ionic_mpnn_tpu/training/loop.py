"""Training loop: jitted step, early stopping, history — the pjit-ready
replacement for ``model.fit``.

Behavioral parity with the reference recipe (``train_viscosity.py:
227-338``): Adam(1e-3, global-norm clip 1.0), MSE (or Huber for transfer),
up to 1000 epochs with EarlyStopping(val_loss, patience=50,
restore_best_weights=True), per-epoch shuffling, Keras-style history dict,
and the selective epoch logger (``train_viscosity.py:112-132``). L2
penalties are applied to the same kernels the reference regularizes (the
fingerprint/head Dense kernels, ``train_viscosity.py:189``,
``train_melting_point.py:173,197``).

TPU-first differences: batches are packed (see
:mod:`ionic_mpnn_tpu.data.loader`) and statically shaped so the step
compiles once; the loss is sample-masked; the whole step (fwd+bwd+update)
is one jitted function, donated, and works unchanged under pjit/shard_map
(see :mod:`ionic_mpnn_tpu.parallel`).
"""

from __future__ import annotations

import functools
import sys
import time
from dataclasses import dataclass
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct, traverse_util
from flax.core import unfreeze

from ..config import ModelConfig, TrainConfig
from ..data.loader import BatchPlan, iter_batches
from ..data.packing import IonPairBatch
from .metrics import mae, r2_score
from .normalizer import Normalizer
from .optim import make_optimizer
from . import checkpoint as ckpt

__all__ = ["TrainState", "FitResult", "make_train_step", "make_eval_step", "fit", "predict"]


@struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    rng: Any


@dataclass
class FitResult:
    params: Any
    batch_stats: Any
    history: Dict[str, List[float]]
    normalizer: Normalizer
    best_val_loss: float
    epochs_run: int
    stopped_early: bool


_REGULARIZED_KERNELS = ("fp_dense", "head_dense")


def _l2_penalty(params: Any, coef: float) -> jnp.ndarray:
    """Sum of coef * ||W||² over the reference-regularized Dense kernels."""
    if coef <= 0:
        return jnp.float32(0.0)
    flat = traverse_util.flatten_dict(unfreeze(params))
    total = jnp.float32(0.0)
    for path, w in flat.items():
        if path[-1] == "kernel" and any(m in path for m in _REGULARIZED_KERNELS):
            total = total + jnp.sum(jnp.square(w))
    return coef * total


def _data_loss(pred: jnp.ndarray, y: jnp.ndarray, mask: jnp.ndarray, kind: str, delta: float) -> jnp.ndarray:
    if kind == "mse":
        per = jnp.square(pred - y)
    elif kind == "huber":
        err = jnp.abs(pred - y)
        per = jnp.where(err <= delta, 0.5 * jnp.square(err), delta * (err - 0.5 * delta))
    else:
        raise ValueError(f"unknown loss {kind!r}")
    return jnp.sum(per * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def make_train_step(
    model,
    model_cfg: ModelConfig,
    train_cfg: TrainConfig,
    optimizer: optax.GradientTransformation,
    has_batch_stats: bool = False,
    jit_compile: bool = True,
) -> Callable[[TrainState, IonPairBatch], Tuple[TrainState, Dict[str, jnp.ndarray]]]:
    loss_kind, delta, l2 = train_cfg.loss, train_cfg.huber_delta, model_cfg.fp_l2

    def step(state: TrainState, batch: IonPairBatch):
        rng, dropout_rng = jax.random.split(state.rng)

        def loss_fn(params):
            variables = {"params": params}
            if has_batch_stats:
                variables["batch_stats"] = state.batch_stats
                out, mutated = model.apply(
                    variables, batch, deterministic=False,
                    rngs={"dropout": dropout_rng}, mutable=["batch_stats"],
                )
                new_stats = mutated["batch_stats"]
            else:
                out = model.apply(variables, batch, deterministic=False,
                                  rngs={"dropout": dropout_rng})
                new_stats = state.batch_stats
            data = _data_loss(out["pred"], batch.y, batch.sample_mask, loss_kind, delta)
            loss = data + _l2_penalty(params, l2)
            return loss, (data, new_stats)

        (loss, (data_loss, new_stats)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, new_opt_state = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt_state,
            rng=rng,
        )
        return new_state, {"loss": loss, "data_loss": data_loss}

    if not jit_compile:
        return step
    return jax.jit(step, donate_argnums=(0,))


def make_scan_train_step(
    model,
    model_cfg: ModelConfig,
    train_cfg: TrainConfig,
    optimizer: optax.GradientTransformation,
    steps_per_call: int,
    has_batch_stats: bool = False,
):
    """K train steps folded into one jitted lax.scan over stacked batches.

    Host dispatch (~1 ms/step through remote TPU tunnels) dominates the
    measured step time at these model sizes; scanning K statically-shaped
    batches per dispatch amortizes it K×. Input: a batch pytree with a
    leading K axis (see ``stack_batches``-style tree.map(np.stack)).
    Short groups are padded with zero-mask batches by the caller.
    """
    inner = make_train_step(model, model_cfg, train_cfg, optimizer,
                            has_batch_stats, jit_compile=False)

    def multi(state, batches):
        def body(s, b):
            # group-padding batches (all-zero mask) must be true no-ops:
            # without the cond they'd still apply an optimizer update from
            # the L2 penalty + Adam momentum.
            def run(s_):
                s2, m = inner(s_, b)
                return s2, m["loss"]

            def skip(s_):
                return s_, jnp.float32(0.0)

            s, loss = jax.lax.cond(jnp.sum(b.sample_mask) > 0, run, skip, s)
            return s, (loss, jnp.sum(b.sample_mask))

        state, (losses, ns) = jax.lax.scan(body, state, batches)
        return state, {"loss_sum": jnp.sum(losses * ns), "n": jnp.sum(ns)}

    return jax.jit(multi, donate_argnums=(0,))


def make_eval_step(model, model_cfg: ModelConfig, train_cfg: TrainConfig,
                   has_batch_stats: bool = False):
    loss_kind, delta, l2 = train_cfg.loss, train_cfg.huber_delta, model_cfg.fp_l2

    def step(params, batch_stats, batch: IonPairBatch):
        variables = {"params": params}
        if has_batch_stats:
            variables["batch_stats"] = batch_stats
        out = model.apply(variables, batch, deterministic=True)
        data = _data_loss(out["pred"], batch.y, batch.sample_mask, loss_kind, delta)
        loss = data + _l2_penalty(params, l2)
        n = jnp.sum(batch.sample_mask)
        res = {"loss_sum": data * n, "reg": loss - data, "n": n,
               "pred": out["pred"]}
        if "fp_cat" in out:
            # dead-unit canary: per-column max of the relu'd cation
            # fingerprint over real samples. The round-4 collapse basin
            # (battery 36) killed 31/32 cation fp units and presented as
            # a mysterious R² ≈ 0.42 plateau; tracking the fraction of
            # never-firing columns per epoch makes it loud instead.
            m = batch.sample_mask[:, None].astype(out["fp_cat"].dtype)
            res["fp_cat_colmax"] = jnp.max(out["fp_cat"] * m, axis=0)
        return res

    return jax.jit(step)


@jax.jit
def _pack_eval_leaves(leaves):
    """Concatenate pytree leaves into one flat f32 device vector so the
    epoch losses and every dev-eval output come back in a single
    np.asarray transfer. (device_get already coalesces a pytree into one
    round trip on the relay — battery 47 measured packing alone as
    neutral — but a single array lets the loss fetch and the eval fetch
    share ONE transfer, removing a ~15 ms round trip per epoch.)"""
    return jnp.concatenate(
        [jnp.ravel(x).astype(jnp.float32) for x in leaves])


@functools.partial(jax.jit, static_argnums=(0,))
def _jit_predict(model, variables, batch):
    """Module-level jit keyed on the (hashable) flax module: repeated
    predict/evaluate calls reuse one compilation per batch shape instead
    of re-tracing a fresh closure every call."""
    return model.apply(variables, batch, deterministic=True)["pred"]


def predict(
    model,
    params: Any,
    batch_stats: Any,
    records: Sequence[Dict[str, Any]],
    plan: BatchPlan,
) -> np.ndarray:
    """Predict over records in order; returns (len(records),) predictions."""
    variables = {"params": params}
    if batch_stats:
        variables["batch_stats"] = batch_stats
    preds: List[np.ndarray] = []
    for batch in iter_batches(records, plan, shuffle=False):
        p = np.asarray(_jit_predict(model, variables, batch))
        preds.append(p[np.asarray(batch.sample_mask) > 0])
    return np.concatenate(preds) if preds else np.zeros(0, np.float32)


def _normalize_records(records, target_key: str, normalizer: Normalizer):
    out = []
    for r in records:
        r2 = dict(r)
        r2[target_key] = float(normalizer.transform(np.asarray(r[target_key])))
        out.append(r2)
    return out


def fit(
    model,
    model_cfg: ModelConfig,
    train_cfg: TrainConfig,
    train_records: Sequence[Dict[str, Any]],
    dev_records: Sequence[Dict[str, Any]],
    plan: BatchPlan,
    init_variables: Optional[Any] = None,
    optimizer: Optional[optax.GradientTransformation] = None,
    verbose: bool = True,
    mesh: Optional[Any] = None,
) -> FitResult:
    """Train with early stopping; returns best-weight params + history.

    With ``mesh`` (a jax.sharding.Mesh with a populated ``data`` axis),
    training steps run data-parallel via the shard_map step: per-epoch
    batches are grouped ``n_devices`` at a time into stacked global
    batches (short groups padded with empty zero-mask batches) and
    gradients all-reduce over ICI. Evaluation stays single-device on the
    replicated params.
    """
    if train_cfg.normalize_y:
        y_train = np.asarray([r[plan.target_key] for r in train_records], np.float32)
        normalizer = Normalizer.fit(y_train, guard=train_cfg.normalize_guard)
        train_records = _normalize_records(train_records, plan.target_key, normalizer)
        dev_records = _normalize_records(dev_records, plan.target_key, normalizer)
    else:
        normalizer = Normalizer.identity()

    # Host-side batching: the C++ packer (bit-identical to the Python
    # path, tested) when built and enabled — per-epoch packing otherwise
    # rivals the TPU step time at scale.
    train_iter = iter_batches
    train_source: Any = train_records
    dev_iter = iter_batches
    dev_source: Any = dev_records
    if train_cfg.use_native_loader:
        from .. import native

        if native.native_available():
            from ..data.columnar import ColumnarIonPairs, iter_batches_fast

            train_iter = iter_batches_fast
            train_source = ColumnarIonPairs.from_records(
                train_records, target_key=plan.target_key
            )
            dev_iter = iter_batches_fast
            dev_source = ColumnarIonPairs.from_records(
                dev_records, target_key=plan.target_key
            )
    # The dev split never shuffles, so its packed batches are identical
    # every epoch — pack ONCE, put on DEVICE once, and reuse (per-epoch
    # Python re-packing rivaled the whole train-epoch host cost at scale,
    # and per-epoch host→device re-transfer of the same arrays costs
    # ~3 MB/batch/epoch through the axon tunnel — battery 29).
    dev_batches = [jax.device_put(b) for b in
                   dev_iter(dev_source, plan, shuffle=False)]

    rng = jax.random.PRNGKey(train_cfg.seed)
    init_rng, state_rng = jax.random.split(rng)

    first_batch = next(iter_batches(train_records, plan))
    if init_variables is None:
        init_variables = model.init(
            {"params": init_rng, "dropout": init_rng}, first_batch, deterministic=True
        )
    params = init_variables["params"]
    batch_stats = init_variables.get("batch_stats", {})
    has_bs = bool(batch_stats)

    if optimizer is None:
        optimizer = make_optimizer(train_cfg.learning_rate, train_cfg.clipnorm,
                                   train_cfg.weight_decay,
                                   warmup_steps=train_cfg.warmup_steps)
    state = TrainState(
        step=jnp.int32(0),
        params=params,
        batch_stats=batch_stats,
        opt_state=optimizer.init(params),
        rng=state_rng,
    )

    n_dev = 1
    if mesh is not None:
        n_dev = int(mesh.shape.get("data", 1))

    # steps_per_call <= 0 means AUTO: fold 8 steps per dispatch on
    # accelerators (host dispatch ~1 ms through remote tunnels dominates
    # otherwise — measured 7.1x at batch 2048, CLAUDE.md), single-step on
    # CPU where dispatch is cheap and scan only slows compiles.
    K = train_cfg.steps_per_call
    if K <= 0:
        K = 8 if jax.devices()[0].platform != "cpu" else 1
    K = max(1, K)

    from ..data.packing import pack_ion_pair_batch

    empty_batch = pack_ion_pair_batch(
        [], batch_size=plan.batch_size, node_cap=plan.node_cap,
        edge_cap=plan.edge_cap, target_key=plan.target_key,
        with_temperature=plan.with_temperature,
        duplicate_edges=plan.duplicate_edges,
        node_align=plan.node_align,
        balance_tile=plan.balance_tile,  # match real batches' static aux
        anion_node_cap=plan.anion_node_cap,
        anion_edge_cap=plan.anion_edge_cap,
        anion_balance_tile=plan.side_caps("anion")[3],
    )
    if plan.edge_layout in ("window", "window_aligned"):
        # group-padding batches must share the real batches' (static) edge
        # layout or tree stacking rejects the mix
        from ..data.packing import window_tile_batch

        empty_batch = window_tile_batch(
            empty_batch, plan.edge_tile, plan.window,
            aligned=plan.edge_layout == "window_aligned",
            anion_tile=plan.anion_edge_tile,
        )
    group_size = n_dev * K
    group_epoch_runner = None  # set by the native single-device K>1 path

    def _perm_prefetcher(prep):
        # The per-epoch permutation upload costs ~45 ms through the remote
        # relay link (~0.4 MB at ~9 MB/s upload, battery 46), serialized
        # ahead of the epoch dispatch. Building + uploading the NEXT
        # epoch's permutation right after the current epoch's first
        # dispatch hides the host build and the transfer behind device
        # compute. Same host RNG stream per epoch — bit-identical batches,
        # pure scheduling.
        cache: Dict[int, Any] = {}

        def get(epoch):
            return cache.pop(epoch) if epoch in cache else prep(epoch)

        def ahead(epoch):
            if epoch <= train_cfg.epochs and epoch not in cache:
                cache[epoch] = prep(epoch)

        return get, ahead

    if n_dev > 1:
        from ..parallel.data_parallel import (
            make_dp_train_step,
            shard_batch,
            stack_batch_groups,
            stack_batches,
        )

        dp_step = make_dp_train_step(
            model, model_cfg, train_cfg, optimizer, mesh,
            has_batch_stats=has_bs, steps_per_call=K,
        )

        if K == 1:
            def train_step(state, group):
                group = list(group) + [empty_batch] * (n_dev - len(group))
                stacked = shard_batch(stack_batches(group), mesh)
                state, m = dp_step(state, stacked)
                return state, m["loss"]
        else:
            def train_step(state, group):
                group = list(group) + [empty_batch] * (group_size - len(group))
                groups = [group[k * n_dev:(k + 1) * n_dev] for k in range(K)]
                state, m = dp_step(state, stack_batch_groups(groups, mesh))
                return state, m["loss_sum"] / jnp.maximum(m["n"], 1.0)

        # DP device-resident epochs (round-4): pools replicated once,
        # one permutation per epoch, per-device on-device packing inside
        # shard_map — the multi-device answer to battery 29's link bound
        # (host DP re-ships ~150 MB of packed batches per epoch).
        dev_ep = train_cfg.device_epochs
        if dev_ep == "auto":  # on for accelerators, off on CPU
            dev_ep = jax.devices()[0].platform != "cpu"
        if (dev_ep
                and model_cfg.message_impl == "onehot"
                and plan.edge_layout == "window_aligned"):
            from .device_epochs import (
                build_device_dataset,
                make_dp_device_epoch_call,
            )

            try:
                ds = build_device_dataset(
                    list(train_records), plan.window, plan.target_key,
                    with_temperature=plan.with_temperature,
                    duplicate_edges=plan.duplicate_edges,
                )
            except ValueError:  # molecule > window: host loader handles it
                ds = None
            if ds is not None:
                paired = train_cfg.paired_epochs
                if paired == "auto":
                    paired = True
                dp_pplan = None
                if paired:
                    from .device_epochs import (
                        build_paired_perm,
                        choose_paired_plan,
                    )

                    # per-device batch ≈ batch_size records, same as the
                    # unpaired DP layout
                    dp_pplan = choose_paired_plan(ds, plan.batch_size)
                dp_epoch_call = make_dp_device_epoch_call(
                    model, model_cfg, train_cfg, optimizer, mesh, ds,
                    plan.batch_size, K, has_batch_stats=has_bs,
                    paired_plan=dp_pplan,
                )
                ds_arrays = ds.arrays()
                if dp_pplan is not None:
                    GB = n_dev * 2 * dp_pplan.regions * K

                    def _dp_prep(epoch):
                        order = np.random.default_rng(
                            train_cfg.seed + epoch).permutation(
                                ds.n).astype(np.int32)
                        perm = build_paired_perm(ds, order, dp_pplan)
                        pad = (-len(perm)) % GB
                        perm_h = np.concatenate(
                            [perm, np.full(pad, -1, np.int32)])
                        return perm_h, jnp.asarray(perm_h)

                    get_perm, prefetch_perm = _perm_prefetcher(_dp_prep)

                    def dp_device_epoch(state, epoch, losses, ns):
                        perm_h, perm_dev = get_perm(epoch)
                        for g0 in range(0, len(perm_h), GB):
                            state, m = dp_epoch_call(
                                state, ds_arrays, perm_dev, jnp.int32(g0))
                            prefetch_perm(epoch + 1)
                            losses.append(
                                m["loss_sum"] / jnp.maximum(m["n"], 1.0))
                            ns.append(
                                int((perm_h[g0:g0 + GB] >= 0).sum()))
                        return state
                else:
                    GB = n_dev * plan.batch_size * K

                    def _dp_prep(epoch):
                        perm = np.random.default_rng(
                            train_cfg.seed + epoch).permutation(
                                ds.n).astype(np.int32)
                        pad = (-len(perm)) % GB
                        perm_h = np.concatenate(
                            [perm, np.full(pad, ds.n, np.int32)])
                        return perm_h, jnp.asarray(perm_h)

                    get_perm, prefetch_perm = _perm_prefetcher(_dp_prep)

                    def dp_device_epoch(state, epoch, losses, ns):
                        _, perm_dev = get_perm(epoch)
                        for g0 in range(0, ds.n, GB):
                            state, m = dp_epoch_call(state, ds_arrays,
                                                     perm_dev, jnp.int32(g0))
                            prefetch_perm(epoch + 1)
                            losses.append(
                                m["loss_sum"] / jnp.maximum(m["n"], 1.0))
                            ns.append(min(GB, ds.n - g0))
                        return state

                group_epoch_runner = dp_device_epoch
    else:
        # Device-resident epochs: the dataset is uploaded once and batches
        # pack ON DEVICE from a per-epoch permutation (~0.4 MB/epoch of
        # transfer instead of ~150 MB — battery 29's link bound). Works at
        # any steps_per_call (K=1 scans one batch per dispatch); falls
        # back to the host loader when its layout contract doesn't hold
        # (non-aligned layout, molecule > window, non-onehot impl).
        dev_ep = train_cfg.device_epochs
        if dev_ep == "auto":  # on for accelerators, off on CPU
            dev_ep = jax.devices()[0].platform != "cpu"
        if (dev_ep
                and model_cfg.message_impl == "onehot"
                and plan.edge_layout == "window_aligned"):
            from .device_epochs import build_device_dataset, make_device_epoch_call

            try:
                ds = build_device_dataset(
                    list(train_records), plan.window, plan.target_key,
                    with_temperature=plan.with_temperature,
                    duplicate_edges=plan.duplicate_edges,
                )
            except ValueError:  # molecule > window: host loader handles it
                ds = None
            if ds is not None:
                inner = make_train_step(model, model_cfg, train_cfg,
                                        optimizer, has_bs, jit_compile=False)
                # the dataset rides as an ARGUMENT every call — closing
                # over it corrupts it on the axon backend after a few
                # donated calls (round-4 quality bisect, battery 36)
                ds_arrays = ds.arrays()

                # Pitch-slot pairing (round 5): two records per region
                # when their sizes fit — halves the cation node plane the
                # single-occupancy pitch layout inflated (battery 40).
                paired = train_cfg.paired_epochs
                if paired == "auto":
                    paired = True
                pplan = None
                if paired:
                    from .device_epochs import (
                        build_paired_perm,
                        choose_paired_plan,
                        make_paired_epoch_call,
                    )

                    pplan = choose_paired_plan(ds, plan.batch_size)

                if pplan is not None:
                    # WHOLE-EPOCH scan sized to the ESTIMATED region
                    # count; an epoch whose pairing lands under the
                    # estimate just runs one extra (mostly-sentinel,
                    # cond-skipped) dispatch.
                    est_rps = pplan.regions * (1.0 + pplan.pair_frac)
                    K_ep = max(1, -(-ds.n // max(int(est_rps), 1)))
                    epoch_call = make_paired_epoch_call(inner, ds, pplan,
                                                        K_ep)
                    slots = 2 * pplan.regions * K_ep

                    def _prep(epoch):
                        order = np.random.default_rng(
                            train_cfg.seed + epoch).permutation(
                                ds.n).astype(np.int32)
                        perm = build_paired_perm(ds, order, pplan)
                        pad = (-len(perm)) % slots
                        perm_h = np.concatenate(
                            [perm, np.full(pad, -1, np.int32)])
                        return perm_h, jax.device_put(jnp.asarray(perm_h))

                    get_perm, prefetch_perm = _perm_prefetcher(_prep)

                    def device_epoch(state, epoch, losses, ns):
                        perm_h, perm_dev = get_perm(epoch)
                        for g0 in range(0, len(perm_h), slots):
                            state, m = epoch_call(state, ds_arrays, perm_dev,
                                                  jnp.int32(g0))
                            prefetch_perm(epoch + 1)
                            losses.append(
                                m["loss_sum"] / jnp.maximum(m["n"], 1.0))
                            # real-record count of this dispatch, host-side
                            # (fetching m["n"] would sync mid-epoch)
                            ns.append(int((perm_h[g0:g0 + slots] >= 0).sum()))
                        return state

                    group_epoch_runner = device_epoch
                else:
                    # WHOLE-EPOCH scan: with batches packed on device
                    # there is no reason to chunk the epoch into
                    # steps_per_call groups — one dispatch drives every
                    # step of the epoch (the scan trip count doesn't grow
                    # the program), eliminating the per-dispatch overhead
                    # chain entirely (round 4: the 7 dispatches of a
                    # 49-step epoch carried ~0.3 s of the 0.48 s steady
                    # epoch).
                    K_ep = max(1, -(-ds.n // plan.batch_size))
                    epoch_call = make_device_epoch_call(
                        inner, ds, plan.batch_size, K_ep)
                    BK = plan.batch_size * K_ep

                    def _prep(epoch):
                        perm = np.random.default_rng(
                            train_cfg.seed + epoch).permutation(
                                ds.n).astype(np.int32)
                        pad = (-len(perm)) % BK
                        perm_h = np.concatenate(
                            [perm, np.full(pad, ds.n, np.int32)])
                        return perm_h, jax.device_put(jnp.asarray(perm_h))

                    get_perm, prefetch_perm = _perm_prefetcher(_prep)

                    def device_epoch(state, epoch, losses, ns):
                        _, perm_dev = get_perm(epoch)
                        for g0 in range(0, ds.n, BK):
                            state, m = epoch_call(state, ds_arrays, perm_dev,
                                                  jnp.int32(g0))
                            prefetch_perm(epoch + 1)
                            losses.append(
                                m["loss_sum"] / jnp.maximum(m["n"], 1.0))
                            ns.append(min(BK, ds.n - g0))
                        return state

                    group_epoch_runner = device_epoch

        if K > 1:
            scan_step = make_scan_train_step(
                model, model_cfg, train_cfg, optimizer, K, has_bs
            )

            def train_step(state, group):
                group = list(group) + [empty_batch] * (K - len(group))
                stacked = jax.tree.map(lambda *xs: np.stack(xs), *group)
                state, m = scan_step(state, stacked)
                return state, m["loss_sum"] / jnp.maximum(m["n"], 1.0)

            # Native group mode: the C++ packer writes each batch straight
            # into rows of pre-stacked (K, ...) buffers, skipping both the
            # per-batch np.stack pass and the per-batch mask-sum bookkeeping.
            if group_epoch_runner is None and train_iter is not iter_batches:
                from ..data.columnar import iter_batch_groups_fast

                def native_group_epoch(state, epoch, losses, ns):
                    for stacked, n_real in iter_batch_groups_fast(
                        train_source, plan, K, shuffle=True,
                        seed=train_cfg.seed + epoch,
                    ):
                        state, m = scan_step(state, stacked)
                        losses.append(m["loss_sum"] / jnp.maximum(m["n"], 1.0))
                        ns.append(n_real)
                    return state

                group_epoch_runner = native_group_epoch
        else:
            single_step = make_train_step(model, model_cfg, train_cfg, optimizer, has_bs)

            def train_step(state, group):
                state, m = single_step(state, group[0])
                return state, m["loss"]

    eval_step = make_eval_step(model, model_cfg, train_cfg, has_bs)

    history: Dict[str, List[float]] = {"loss": [], "val_loss": [],
                                       "epoch_seconds": []}
    best_val = float("inf")
    best_params = jax.device_get(state.params)
    best_stats = jax.device_get(state.batch_stats)
    patience = 0
    stopped_early = False
    log_epochs = set(train_cfg.log_epochs) | set(
        range(train_cfg.epochs - 4, train_cfg.epochs + 1)
    )
    epochs_run = 0
    start_epoch = 1

    # ---- checkpoint/resume (absent in the reference — SURVEY §5.3/5.4) ----
    ckpt_dir = train_cfg.checkpoint_dir
    if ckpt_dir and ckpt.latest_step(ckpt_dir) is not None:
        target = {
            "params": jax.device_get(state.params),
            "opt_state": jax.device_get(state.opt_state),
            "best_params": jax.device_get(state.params),
        }
        if has_bs:
            target["batch_stats"] = jax.device_get(state.batch_stats)
            target["best_stats"] = jax.device_get(state.batch_stats)
        restored = ckpt.restore_checkpoint(ckpt_dir, target=target)
        extra = restored["extra"]
        state = state.replace(
            params=restored["params"],
            opt_state=restored["opt_state"],
            batch_stats=restored.get("batch_stats", state.batch_stats),
            step=jnp.int32(extra["global_step"]),
        )
        best_params = restored["best_params"]
        best_stats = restored.get("best_stats", best_stats)
        best_val = extra["best_val"]
        patience = extra["patience"]
        # wall times of pre-resume epochs are unknown: pad with NaN so the
        # three history lists stay index-aligned per epoch
        history = {"loss": list(extra["loss"]),
                   "val_loss": list(extra["val_loss"]),
                   "epoch_seconds": [float("nan")] * len(extra["loss"])}
        start_epoch = restored["step"] + 1
        if verbose:
            print(f"resumed from {ckpt_dir} at epoch {restored['step']}")

    # Async writer: save() snapshots to host and returns; the array flush
    # runs on a background thread so checkpointing never blocks the epoch
    # loop (SURVEY §2.3 elasticity row). Joined in the finally below.
    writer = ckpt.CheckpointWriter() if ckpt_dir else None

    def _save(epoch: int) -> None:
        extra_arrays = {"best_params": best_params}
        if has_bs:
            extra_arrays["best_stats"] = best_stats
        writer.save(
            ckpt_dir, epoch, state.params,
            batch_stats=state.batch_stats if has_bs else None,
            opt_state=state.opt_state,
            normalizer=normalizer,
            extra={
                "global_step": int(jax.device_get(state.step)),
                "best_val": best_val,
                "patience": patience,
                "loss": history["loss"],
                "val_loss": history["val_loss"],
            },
            extra_arrays=extra_arrays,
        )

    # IONIC_FIT_TIMERS=1: per-epoch segment breakdown (dispatch / loss
    # fetch / dev eval / bookkeeping) on stderr — the link-overhead
    # attribution tool behind battery 46's permutation prefetch.
    import os as _os

    timers = _os.environ.get("IONIC_FIT_TIMERS") == "1"

    try:
        for epoch in range(start_epoch, train_cfg.epochs + 1):
            epochs_run = epoch
            t0 = time.time()
            losses, ns = [], []
            if group_epoch_runner is not None:
                state = group_epoch_runner(state, epoch, losses, ns)
            else:
                group: List[Any] = []

                def _run_group(g):
                    nonlocal state
                    n_real = sum(float(np.asarray(b.sample_mask).sum()) for b in g)
                    state, loss = train_step(state, g)
                    losses.append(loss)
                    ns.append(n_real)

                for batch in train_iter(train_source, plan, shuffle=True,
                                        seed=train_cfg.seed + epoch):
                    group.append(batch)
                    if len(group) == group_size:
                        _run_group(group)
                        group = []
                if group:
                    _run_group(group)
            t_disp = time.time()
            w = np.asarray(ns)
            # Dispatch the dev eval BEFORE fetching anything, then fetch
            # the epoch losses AND every eval output leaf as ONE packed
            # f32 array: each host↔device round trip costs ~15 ms on the
            # remote relay (IONIC_FIT_TIMERS attribution, battery 47), so
            # the old fetch-losses → dispatch-eval → fetch-eval sequence
            # carried 2 extra round trips per epoch. The eval dispatches
            # queue behind the still-running epoch compute; the single
            # fetch at the end syncs the whole chain.
            outs = [eval_step(state.params, state.batch_stats, batch)
                    for batch in dev_batches]
            device_losses = bool(losses) and isinstance(losses[0], jax.Array)
            if device_losses or outs:
                loss_vec = (jnp.stack(losses) if device_losses
                            else jnp.asarray(np.asarray(losses, np.float32)))
                leaves, treedef = jax.tree.flatten(outs)
                sizes = [max(1, int(np.prod(x.shape))) for x in leaves]
                flat_h = np.asarray(_pack_eval_leaves([loss_vec] + leaves))
                losses_h = flat_h[:loss_vec.size]
                parts = np.split(flat_h[loss_vec.size:],
                                 np.cumsum(sizes)[:-1]) if outs else []
                outs = jax.tree.unflatten(
                    treedef,
                    [p.reshape(x.shape) for p, x in zip(parts, leaves)])
            else:
                losses_h = np.asarray(jax.device_get(losses))
            train_loss = float(np.average(losses_h, weights=w))
            t_fetch = time.time()

            val_sum = sum(float(o["loss_sum"]) for o in outs)
            val_n = sum(float(o["n"]) for o in outs)
            reg = float(outs[-1]["reg"]) if outs else 0.0
            val_loss = val_sum / max(val_n, 1.0) + reg
            t_eval = time.time()
            if timers:
                print(f"[fit-timers] epoch {epoch}: "
                      f"dispatch {t_disp - t0:.3f}s "
                      f"loss_fetch(sync) {t_fetch - t_disp:.3f}s "
                      f"dev_eval {t_eval - t_fetch:.3f}s",
                      file=sys.stderr)

            history["loss"].append(train_loss)
            history["val_loss"].append(val_loss)
            history["epoch_seconds"].append(time.time() - t0)
            if outs and "fp_cat_colmax" in outs[0]:
                colmax = np.max(np.stack(
                    [np.asarray(o["fp_cat_colmax"]) for o in outs]), axis=0)
                history.setdefault("dead_fp_cat_frac", []).append(
                    float((colmax <= 0.0).mean()))

            if verbose and epoch in log_epochs:
                print(
                    f"Epoch {epoch}/{train_cfg.epochs} - loss: {train_loss:.6f} "
                    f"- val_loss: {val_loss:.6f} ({time.time() - t0:.2f}s)"
                )

            if val_loss < best_val:
                best_val = val_loss
                best_params = jax.device_get(state.params)
                best_stats = jax.device_get(state.batch_stats)
                patience = 0
            else:
                patience += 1
                # Keras EarlyStopping stops when wait >= patience (after exactly
                # `patience` consecutive non-improving epochs).
                if patience >= train_cfg.early_stopping_patience:
                    stopped_early = True

            if ckpt_dir and (
                stopped_early
                or epoch == train_cfg.epochs  # final epoch: always persist
                or (train_cfg.checkpoint_every
                    and epoch % train_cfg.checkpoint_every == 0)
            ):
                _save(epoch)

            if stopped_early:
                if verbose:
                    print(f"Early stopping at epoch {epoch} (best val_loss {best_val:.6f})")
                break
    finally:
        if writer is not None:
            # join the in-flight async save so the final checkpoint is
            # committed before fit returns (resume-safety)
            writer.close()

    return FitResult(
        params=best_params,
        batch_stats=best_stats,
        history=history,
        normalizer=normalizer,
        best_val_loss=best_val,
        epochs_run=epochs_run,
        stopped_early=stopped_early,
    )


def evaluate_splits(
    model,
    params: Any,
    batch_stats: Any,
    splits: Dict[str, Sequence[Dict[str, Any]]],
    plan: BatchPlan,
    normalizer: Normalizer,
) -> Dict[str, Dict[str, float]]:
    """R²/MAE per split on the de-normalized scale
    (``train_viscosity.py:361-370``, ``train_melting_point.py:324-335``)."""
    results = {}
    for name, records in splits.items():
        y_true = np.asarray([r[plan.target_key] for r in records], np.float32)
        pred_norm = predict(model, params, batch_stats, records, plan)
        pred = normalizer.inverse(pred_norm)
        results[name] = {"r2": r2_score(y_true, pred), "mae": mae(y_true, pred)}
    return results
