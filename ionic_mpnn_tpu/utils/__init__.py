"""Utilities: plotting, profiling, misc."""

from .plotting import plot_loss, plot_parity
from .profiling import ThroughputMeter, trace

__all__ = ["plot_loss", "plot_parity", "ThroughputMeter", "trace"]
