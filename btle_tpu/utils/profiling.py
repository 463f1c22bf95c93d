"""Profiling hooks: jax.profiler traces + simple block timing.

The reference's only tracing was stage dump files and Vivado ILA captures
(SURVEY.md §5); on TPU the native tools are jax.profiler traces (viewable
in XProf/TensorBoard) plus wall-clock block statistics, both wrapped here.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field


@contextlib.contextmanager
def device_trace(out_dir: str):
    """Capture a jax.profiler trace around a code region."""
    import jax

    jax.profiler.start_trace(out_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@dataclass
class BlockStats:
    """Streaming-throughput accounting for a block-processing loop."""

    samples_per_block: int
    sample_rate_hz: float
    blocks: int = 0
    busy_s: float = 0.0
    t_start: float = field(default_factory=time.perf_counter)
    _t0: float = 0.0

    def begin(self):
        self._t0 = time.perf_counter()

    def end(self):
        self.busy_s += time.perf_counter() - self._t0
        self.blocks += 1

    @property
    def throughput_sps(self) -> float:
        return self.blocks * self.samples_per_block / self.busy_s if self.busy_s else 0.0

    @property
    def realtime_factor(self) -> float:
        return self.throughput_sps / self.sample_rate_hz if self.sample_rate_hz else 0.0

    def summary(self) -> str:
        return (f"{self.blocks} blocks, {self.throughput_sps/1e6:.1f} Msps "
                f"({self.realtime_factor:.1f}x real time)")
