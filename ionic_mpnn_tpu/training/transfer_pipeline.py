"""Two-stage transfer-learning pipeline (viscosity trunk → melting point).

Reference: ``train_melting_point_transfer.py:112-287`` —

  * build the transfer model from the pretrained viscosity trunk
    (``mix_cat_an`` tap, ``:95-96``) with a fresh deep MLP head,
  * z-score the target with ``std + 1e-6`` on train stats (``:174-181``),
  * **Stage 1**: freeze the whole trunk, train the head only,
    Adam(lr_stage1=1e-3) + Huber(delta=1.0) (``:189-208``),
  * **Stage 2**: unfreeze the last two message-passing steps of both
    encoders + the mixing projections, Adam(lr_stage2=1e-4), refit
    (``:214-241``) — the reference selects these by fragile
    auto-generated Keras layer names; here the selection is explicit
    parameter paths (:data:`~ionic_mpnn_tpu.models.transfer.
    STAGE2_UNFREEZE_SUBSTRINGS`),
  * histories of both stages are concatenated (``:247-254``).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, List, Sequence

import jax

from ..config import ModelConfig, TrainConfig
from ..data.loader import BatchPlan, iter_batches
from ..models import TransferMPModel, load_trunk_params, transfer_stage_labels
from .loop import FitResult, fit
from .optim import make_partitioned_optimizer

__all__ = ["TransferResult", "train_transfer"]


@dataclass
class TransferResult:
    params: Any
    batch_stats: Any
    history: Dict[str, List[float]]  # concatenated over both stages
    stage1: FitResult
    stage2: FitResult
    normalizer: Any
    model: TransferMPModel


def train_transfer(
    viscosity_params: Any,
    model_cfg: ModelConfig,
    train_records: Sequence[Dict[str, Any]],
    dev_records: Sequence[Dict[str, Any]],
    plan: BatchPlan,
    lr_stage1: float = 1e-3,
    lr_stage2: float = 1e-4,
    epochs: int = 1000,
    patience: int = 50,
    seed: int = 0,
    verbose: bool = True,
) -> TransferResult:
    cfg = model_cfg.replace(head="transfer")
    model = TransferMPModel(cfg)

    base_tcfg = TrainConfig(
        loss="huber",
        huber_delta=1.0,
        epochs=epochs,
        early_stopping_patience=patience,
        normalize_y=True,
        normalize_guard="eps",
        seed=seed,
    )

    # init + trunk transplant
    first_batch = next(iter_batches(train_records, plan))
    rng = jax.random.PRNGKey(seed)
    variables = model.init({"params": rng, "dropout": rng}, first_batch, deterministic=True)
    params = load_trunk_params(variables["params"], viscosity_params)
    init_variables = {"params": params, "batch_stats": variables.get("batch_stats", {})}

    # Stage 1: head only
    labels1 = transfer_stage_labels(params, stage=1)
    opt1 = make_partitioned_optimizer(labels1, lr_stage1, clipnorm=None)
    tcfg1 = base_tcfg.replace(learning_rate=lr_stage1)
    if verbose:
        print("=== Transfer stage 1: frozen trunk, training head ===")
    stage1 = fit(model, cfg, tcfg1, train_records, dev_records, plan,
                 init_variables=init_variables, optimizer=opt1, verbose=verbose)

    # Stage 2: partial unfreeze, lower LR
    labels2 = transfer_stage_labels(stage1.params, stage=2)
    opt2 = make_partitioned_optimizer(labels2, lr_stage2, clipnorm=None)
    tcfg2 = base_tcfg.replace(learning_rate=lr_stage2)
    if verbose:
        print("=== Transfer stage 2: partial trunk unfreeze ===")
    stage2 = fit(
        model, cfg, tcfg2, train_records, dev_records, plan,
        init_variables={"params": stage1.params, "batch_stats": stage1.batch_stats},
        optimizer=opt2, verbose=verbose,
    )

    history = {
        "loss": stage1.history["loss"] + stage2.history["loss"],
        "val_loss": stage1.history["val_loss"] + stage2.history["val_loss"],
        "stage1_epochs": [stage1.epochs_run],
    }
    return TransferResult(
        params=stage2.params,
        batch_stats=stage2.batch_stats,
        history=history,
        stage1=stage1,
        stage2=stage2,
        normalizer=stage2.normalizer,
        model=model,
    )
