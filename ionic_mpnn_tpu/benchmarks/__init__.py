"""Benchmark harnesses (edges/s north-star metric)."""

from .harness import (bench_dense_reference, bench_packed_train_step,
                      bench_paired_epoch_step, make_bench_dataset)

__all__ = [
    "bench_dense_reference",
    "bench_packed_train_step",
    "bench_paired_epoch_step",
    "make_bench_dataset",
]
