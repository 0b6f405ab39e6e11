"""Configuration tree for models, training, and parallelism.

The reference scatters its configuration across hardcoded keyword defaults
(``train_viscosity.py:139-147``), module constants, and one absl-flags
script (``train_melting_point_transfer.py:24-31``). Here everything lives
in one dataclass tree (SURVEY.md §5.6's prescription).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Any, Optional, Tuple

__all__ = [
    "ModelConfig",
    "TrainConfig",
    "MeshConfig",
    "viscosity_config",
    "melting_point_config",
    "model_config_to_dict",
    "model_config_from_dict",
    "resolve_message_impl",
    "resolve_compute_dtype",
    "resolve_onehot_window",
    "edge_layout_for",
]


def resolve_message_impl(impl: str = "auto") -> str:
    """Resolve ``"auto"`` to the fastest measured impl for the active backend.

    ``"onehot"`` on accelerators: the all-MXU windowed one-hot path runs the
    flagship train step in 22.7 ms at batch 2048 vs 197 ms for the gather
    impl on the TPU v5e relay (fetch-synced A/B, RESULTS.md battery 9) —
    per-row gather/scatter is ~1000× off roofline there while matmuls run
    near peak. ``"gather"`` on CPU, where the one-hot formulation's
    redundant FLOPs (3·window per edge) actually cost time.
    """
    if impl != "auto":
        return impl
    import jax

    return "onehot" if jax.devices()[0].platform != "cpu" else "gather"


def resolve_compute_dtype(dtype: str = "auto") -> str:
    """Resolve ``"auto"`` to the production compute dtype per backend.

    ``"bfloat16"`` on accelerators: quality gates passed at full model
    dims (viscosity Test R² 0.9734 bf16 vs 0.9739 f32, MP/transfer
    equivalent — RESULTS.md batteries 15/28, trained end-to-end on TPU)
    and the step runs ~1.5× faster (battery 27). ``"float32"`` on CPU
    and for reference-parity runs (pass it explicitly).
    """
    if dtype != "auto":
        return dtype
    import jax

    return "bfloat16" if jax.devices()[0].platform != "cpu" else "float32"


def resolve_onehot_window(compute_dtype: str, window: int = 0,
                          atom_dim: int = 32) -> int:
    """Production onehot node window: 64 for bf16 at the reference
    D=32 (halved one-hot operands measured 9.56 vs 10.76 ms/step at
    batch 2048, battery 25), 128 otherwise (f32 showed no w64 win).
    Above D=32 the tradeoff flips — the window-count cost (AXON 4d)
    dominates the per-window one-hot width even though o_src FLOPs grow
    linearly in W; measured at batch 2048 (battery 42 pt 2):
    D=64 w64/128/256/512 = 11.06/7.71/6.48/6.29 ms,
    D=128 = 25.06/20.31/19.20/18.99 ms — the knee is ~256, so large-dim
    configs default to 256. Explicit ``window`` wins."""
    if window:
        return window
    if atom_dim > 32:
        return 256
    return 64 if compute_dtype == "bfloat16" else 128


def edge_layout_for(message_impl: str) -> str:
    """Batch edge layout a message impl needs.

    ``"window_aligned"`` for the one-hot path: window-tiled edges AND
    molecules packed so none straddles a window — the op then runs
    halo-free with ~86% tile fill (battery 11: 13.4 ms/step vs 22.7 for
    the halo ``"window"`` layout at batch 2048). dst-``"sorted"`` COO for
    everything else; every impl accepts the window layouts.
    (ScreeningEngine grid sweeps normalize to ``"window"`` — the device
    grid packer emits the halo layout.)
    """
    return "window_aligned" if message_impl == "onehot" else "sorted"


@dataclass(frozen=True)
class ModelConfig:
    """Architecture of the dual-encoder MPNN family."""

    atom_vocab_size: int  # raw vocab size; +1 pad row is added internally
    bond_vocab_size: int
    atom_dim: int = 32  # reference default, train_viscosity.py:142
    bond_dim: int = 8  # viscosity; melting point uses atom_dim**2 (= 1024)
    fp_size: int = 32
    mixing_size: int = 20
    num_steps: int = 4
    fp_l2: float = 1e-4  # L2 on the fingerprint Dense kernel (1e-5 for MP)
    head: str = "vft"  # "vft" (viscosity), "mlp" (melting point), "transfer"
    parity_mode: bool = False  # reproduce the reference's atom-0 masking quirk
    compute_dtype: str = "float32"  # "bfloat16" for TPU throughput configs
    # "gather" | "typed" | "symmetric" | "onehot" (all-MXU windowed one-hot
    # matmuls; needs BatchPlan(edge_layout="window")) | "pallas_fused"
    # (fused message+aggregate kernel) | "pallas_step" (megakernel:
    # message+aggregate+GRU)
    message_impl: str = "gather"
    onehot_window: int = 128  # node window for message_impl="onehot"
    # typed-select formulation inside the onehot impl: "vloop" (V masked
    # (E, D) @ (D, D) accumulations — no (E, V·D) intermediate; fastest
    # measured, battery 24: 11.89 vs 13.45 ms/step f32 at batch 2048) |
    # "lanes" (one (E, D) @ (D, V·D) matmul + one-hot reduce) | "basis"
    # (contract over the F=bond_dim embedding basis instead of the V
    # vocab lanes — F× redundant FLOPs instead of V×; the large-atom_dim
    # MFU fix when F < V, battery 42) | "auto"
    # (default): vloop while bond_vocab+1 <= ops.message.VLOOP_MAX_TYPES
    # (33), lanes beyond — vloop's program size/compile time grow linearly
    # with the vocab (measured 0.5 s -> 9.8 s per op from V=9 to V=257)
    # and remote-TPU compiles cost minutes, so large vocabs take the
    # V-independent formulation.
    onehot_select: str = "auto"
    # Rematerialize the message+aggregate op in the backward
    # (jax.checkpoint): the onehot formulation's saved intermediates (the
    # (E, V·D)/(E, D) products per step) are HBM traffic the backward
    # re-reads; recompute is cheap MXU work. A/B knob (RESULTS round 4).
    remat_message: bool = False
    gru_impl: str = "reference"  # "fused" packs z|r|candidate into wider matmuls
    scatter_impl: str = "xla"  # "xla" | "pallas" (sorted-scatter TPU kernel)
    # Atom-embedding lookup: "gather" (jnp.take) | "onehot" ((N, V) one-hot
    # @ table — value-identical, and the TABLE GRADIENT becomes a matmul
    # instead of an N-row unsorted scatter-add, the per-row-cost op class
    # the round-4 phase probe put inside the 3.1 ms backward) | "auto"
    # (default): onehot whenever the message impl is onehot (i.e. on
    # accelerators) and the vocab is small enough that the (N, V) one-hot
    # stays cheap, gather otherwise.
    embed_impl: str = "auto"
    # Edge-partitioned execution (graph analogue of context parallelism):
    # when set to a mesh axis name and the model runs inside shard_map with
    # edge arrays sharded over that axis, per-shard aggregates are merged
    # with one psum per message step (messages are additive → exact).
    ep_axis: Optional[str] = None
    # VFT head constants (models/layers.py:10-42)
    vft_b_clip: Tuple[float, float] = (0.0, 20.0)
    vft_c_clip: Tuple[float, float] = (0.1, 50.0)
    vft_eps: float = 1e-6
    t_scale: float = 100.0
    # transfer head (train_melting_point_transfer.py:98-103)
    transfer_dims: Tuple[int, ...] = (256, 128, 64)
    transfer_dropout: float = 0.3

    def replace(self, **kw) -> "ModelConfig":
        return dataclasses.replace(self, **kw)


def viscosity_config(atom_vocab_size: int, bond_vocab_size: int, **kw) -> ModelConfig:
    """Reference viscosity model (train_viscosity.py:139-231)."""
    return ModelConfig(
        atom_vocab_size=atom_vocab_size,
        bond_vocab_size=bond_vocab_size,
        head="vft",
        fp_l2=1e-4,
        **kw,
    )


def melting_point_config(atom_vocab_size: int, bond_vocab_size: int, atom_dim: int = 32, **kw) -> ModelConfig:
    """Reference melting-point model: bond_dim = atom_dim², MLP head
    (train_melting_point.py:137-215)."""
    return ModelConfig(
        atom_vocab_size=atom_vocab_size,
        bond_vocab_size=bond_vocab_size,
        atom_dim=atom_dim,
        bond_dim=atom_dim * atom_dim,
        head="mlp",
        fp_l2=1e-5,
        **kw,
    )


def model_config_to_dict(cfg: ModelConfig) -> dict:
    """JSON-safe dict for persisting alongside checkpoints."""
    d = dataclasses.asdict(cfg)
    for k, v in d.items():
        if isinstance(v, tuple):
            d[k] = list(v)
    return d


def model_config_from_dict(d: dict) -> ModelConfig:
    kw = dict(d)
    for k in ("vft_b_clip", "vft_c_clip", "transfer_dims"):
        if k in kw and isinstance(kw[k], list):
            kw[k] = tuple(kw[k])
    return ModelConfig(**kw)


@dataclass(frozen=True)
class TrainConfig:
    """Optimization recipe (reference: Adam(1e-3, clipnorm=1.0), MSE,
    EarlyStopping(val_loss, patience=50, restore_best_weights=True),
    epochs<=1000, batch 32 — train_viscosity.py:227-338)."""

    learning_rate: float = 1e-3
    clipnorm: float = 1.0
    # linear LR warmup steps (0 = reference recipe). The relu fingerprint
    # path can COLLAPSE under the huge early losses of raw-scale targets
    # (round-4 bisect: a deterministic seed-0 run killed 31/32 cation fp
    # units in the first epochs and plateaued at the temperature-only
    # optimum, dev R² 0.46 vs 0.97 — RESULTS battery 36); a short warmup
    # removes that failure mode without measurable cost at convergence.
    warmup_steps: int = 0
    loss: str = "mse"  # "mse" | "huber"
    huber_delta: float = 1.0
    epochs: int = 1000
    batch_size: int = 32
    early_stopping_patience: int = 50
    seed: int = 0
    # fold K train steps into one jitted lax.scan per dispatch; <= 0 = AUTO
    # (8 on accelerators — dispatch amortization, measured 7.1x through the
    # remote tunnel — 1 on CPU). Composes with DP: the scan runs inside
    # the shard_map body (parallel/data_parallel.py).
    steps_per_call: int = 0
    use_native_loader: bool = True  # C++ packer for epoch batching when built
    # Device-resident epochs: upload the dataset once, ship only a shuffled
    # permutation per epoch (~0.4 MB at 100k records) and pack batches ON
    # DEVICE (training/device_epochs.py). Cuts the host→device link cost
    # that bounds fit() on remote-tunnel backends (battery 29: ~150 MB of
    # packed arrays re-sent per epoch; battery 31: steady epoch 2.2 s →
    # 0.69 s = 141k records/s at 100k×2048, convergence-equivalent).
    # "auto" = on for accelerators, off on CPU (where the link is free and
    # the host loader is bit-reproducible vs earlier rounds). Single-device
    # onehot+aligned only; silently falls back to the host loader
    # elsewhere. Batches are fixed-pitch packed, so loss trajectories are
    # statistically equivalent but not bit-identical to the host loader's.
    device_epochs: Any = "auto"  # "auto" | True | False
    # Pitch-slot PAIRING for device-resident epochs (round 5): each pitch
    # region holds two records (a large molecule ascending + a small one
    # reversed at the region end) when their atom counts fit — halving the
    # cation node plane that made the single-occupancy device-epoch step
    # 3x the bench step (battery 40: fixed-pitch placement inflated nw to
    # 2048 windows vs ~1246 greedy; the nw efficiency cliff priced that at
    # ~7 ms/step). The host ships paired slot indices instead of a plain
    # permutation (training/device_epochs.build_paired_perm); region sizes
    # auto-chosen per side from dataset stats (choose_paired_plan, falls
    # back to single-occupancy when pairing can't win). "auto" = on
    # whenever device epochs run. Batch composition is pairing-sorted
    # within each chunk of the shuffled order — statistically equivalent,
    # not bit-identical, to the unpaired device path (same caveat class
    # as device_epochs itself).
    paired_epochs: Any = "auto"  # "auto" | True | False
    normalize_y: bool = False  # z-score on train stats (MP task)
    normalize_guard: str = "or1"  # "or1" (train_melting_point.py:256) | "eps" (transfer :174-181)
    weight_decay: float = 0.0
    checkpoint_dir: Optional[str] = None
    checkpoint_every: int = 0  # epochs; 0 = only best/final
    log_epochs: Tuple[int, ...] = (1, 2, 3, 4, 5, 50, 100, 150, 200)

    def replace(self, **kw) -> "TrainConfig":
        return dataclasses.replace(self, **kw)


@dataclass(frozen=True)
class MeshConfig:
    """Device mesh layout for SPMD training."""

    data_axis: str = "data"
    model_axis: str = "model"
    data_parallel: int = -1  # -1 = all devices
    model_parallel: int = 1

    def replace(self, **kw) -> "MeshConfig":
        return dataclasses.replace(self, **kw)
