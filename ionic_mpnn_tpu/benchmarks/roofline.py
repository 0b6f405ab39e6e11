"""Analytic roofline model for the packed MPNN training step.

Gives the benchmark an ABSOLUTE efficiency scale: ``mfu`` (fraction of
the chip's matmul peak actually sustained) and ``hbm_bound_fraction``
(share of the roofline-model step time attributable to HBM traffic vs
MXU compute). Without this, "fast" is only relative to the dense
reference design.

The model counts the work XLA actually executes on the padded capacity
shapes (masked pad edges/nodes still burn FLOPs and bytes — that's the
price of static shapes) for the gather-impl forward+backward+Adam step:

FLOPs per ion per message step (D = atom_dim, F = bond_dim, V = bond
vocab+1, E = edge capacity, N = node capacity):

  * bond-type table:   2·V·F·D²         ((V,F) @ (F,D·D))
  * edge messages:     2·E·D²           (per-edge matvec vs (V,D,D) table)
  * aggregation:       E·D              (segment-sum adds)
  * gated update:      12·N·D² + ~20·N·D (3 dense (N,2D)@(2D,D) + gates/LN)

Backward of a matmul chain costs ~2x its forward FLOPs (dL/dW and dL/dx),
so the train step total is ~3x forward. Adam adds ~10 FLOPs/param
(negligible here). Readout/head terms are O(N·D + B·D²) — included for
completeness, never material.

HBM bytes (fp32 = 4 B/elem) assume XLA fuses elementwise chains into
their producers, so only fusion-boundary tensors travel: node states,
gathered sources, messages, aggregates per step (forward), with backward
re-reading saved activations and writing cotangents (~2x forward bytes,
plus one more h-sized pass for the residual adds).

Peak numbers default to TPU v5e: 197 TFLOP/s bf16 MXU peak (JAX's
DEFAULT dot precision on TPU multiplies fp32 operands in bf16 passes, so
bf16 peak is the right denominator for both dtypes here) and 819 GB/s
HBM bandwidth.
"""

from __future__ import annotations

from dataclasses import dataclass

__all__ = ["ChipSpec", "TPU_V5E", "train_step_cost", "roofline_summary"]


@dataclass(frozen=True)
class ChipSpec:
    name: str
    peak_flops: float  # matmul peak, FLOP/s (bf16 multiply path)
    hbm_bw: float  # bytes/s


TPU_V5E = ChipSpec(name="tpu-v5e", peak_flops=197e12, hbm_bw=819e9)

_BYTES = 4  # fp32 storage (bf16 compute_dtype halves traffic; keep conservative)
_BWD_FLOP_FACTOR = 3.0  # fwd + ~2x fwd for backward
_BWD_BYTE_FACTOR = 3.0  # fwd + activation re-reads + cotangent writes


def train_step_cost(
    node_cap: int,
    edge_cap: int,
    n_graphs: int,
    atom_dim: int,
    bond_dim: int,
    bond_vocab: int,
    num_steps: int,
    n_ions: int = 2,
    bytes_per_elem: int = _BYTES,
) -> dict:
    """FLOPs + HBM bytes for ONE fwd+bwd+update train step (both ions)."""
    D, F, V = atom_dim, bond_dim, bond_vocab + 1
    N, E, B = node_cap, edge_cap, n_graphs

    per_step_flops = (
        2 * V * F * D * D  # bond-type table
        + 2 * E * D * D  # per-edge matvec
        + E * D  # segment-sum
        + 12 * N * D * D  # GRU dense trio
        + 20 * N * D  # gates, blend, LayerNorm, residual
    )
    readout_flops = 2 * N * D + 2 * B * D * D  # pool + fp dense
    fwd_flops = num_steps * per_step_flops + readout_flops
    flops = n_ions * fwd_flops * _BWD_FLOP_FACTOR

    # HBM model: the ESSENTIAL traffic floor — batch arrays streamed once
    # per step plus parameter/optimizer state — assuming a VMEM-resident
    # activation working set (~8-30 MB per ion at bench shapes, which fits
    # v5e's 128 MB VMEM budget under fusion). Real executables may spill
    # intermediates to HBM; this model is the lower bound the roofline
    # headroom is quoted against, not a claim about the compiled program
    # (honest fetch-synced bench: mfu ~0.012 at batch 2048, BENCH_r02 —
    # the headroom is real and mostly backend pathology, see RESULTS.md).
    io_bytes = bytes_per_elem * (3 * E + 2 * N)  # ids + masks, int32/bool
    param_elems = (
        num_steps * (F * D * D + 12 * D * D)  # bond transforms + GRU denses
        + V * F + D * D  # embeddings slice + fp dense (order of magnitude)
    )
    param_bytes = bytes_per_elem * param_elems * 3  # read + adam m/v update
    hbm_bytes = n_ions * (io_bytes + num_steps * 0 + param_bytes) + 1_000_000

    return {"flops": float(flops), "hbm_bytes": float(hbm_bytes)}


def roofline_summary(
    cost: dict, measured_step_seconds: float, chip: ChipSpec = TPU_V5E
) -> dict:
    """MFU + HBM-bound fraction for a measured per-step wall time."""
    t_mxu = cost["flops"] / chip.peak_flops
    t_hbm = cost["hbm_bytes"] / chip.hbm_bw
    t_roof = max(t_mxu, t_hbm)
    return {
        "mfu": cost["flops"] / (measured_step_seconds * chip.peak_flops),
        "hbm_bound_fraction": t_hbm / (t_hbm + t_mxu),
        "roofline_step_s": t_roof,
        "roofline_headroom": max(t_roof, 1e-12) and measured_step_seconds / t_roof,
        "chip": chip.name,
    }
