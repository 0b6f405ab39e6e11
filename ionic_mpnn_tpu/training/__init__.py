"""Training tier: jitted loops, optimizers, metrics, splits, checkpoints."""

from .metrics import mae, r2_score, rmse
from .normalizer import Normalizer
from .splits import group_holdout_split, pair_level_split, random_split
from .optim import make_optimizer, make_partitioned_optimizer
from .loop import FitResult, TrainState, evaluate_splits, fit, predict
from .checkpoint import latest_step, restore_checkpoint, save_checkpoint

__all__ = [
    "mae",
    "r2_score",
    "rmse",
    "Normalizer",
    "group_holdout_split",
    "pair_level_split",
    "random_split",
    "make_optimizer",
    "make_partitioned_optimizer",
    "FitResult",
    "TrainState",
    "evaluate_splits",
    "fit",
    "predict",
    "latest_step",
    "restore_checkpoint",
    "save_checkpoint",
]
