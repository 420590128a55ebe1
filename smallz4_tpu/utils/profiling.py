"""Profiling / observability (SURVEY.md §5 'tracing' plan).

The reference offers a stderr progress line; the framework adds a
structured per-run report (bytes, ratio, per-stage wall time, GB/s) and a
jax.profiler trace context for device-level inspection.
"""
from __future__ import annotations

import contextlib
import dataclasses
import json
import time


@dataclasses.dataclass
class StageTimer:
    """Accumulates wall time per pipeline stage."""
    stages: dict = dataclasses.field(default_factory=dict)

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.stages[name] = self.stages.get(name, 0.0) + time.perf_counter() - t0


@dataclasses.dataclass
class RunReport:
    """Structured codec run report."""
    operation: str                 # "encode" | "decode"
    engine: str
    bytes_in: int = 0
    bytes_out: int = 0
    blocks: int = 0
    chips: int = 1
    wall_s: float = 0.0
    stages: dict = dataclasses.field(default_factory=dict)
    # engine counters (e.g. parity-refine volume: unconv_positions /
    # total_positions — the device convergence-certificate miss rate)
    counters: dict = dataclasses.field(default_factory=dict)

    @property
    def ratio(self) -> float:
        return self.bytes_out / self.bytes_in if self.bytes_in else 0.0

    @property
    def mbps(self) -> float:
        return self.bytes_in / self.wall_s / 1e6 if self.wall_s else 0.0

    @property
    def mbps_per_chip(self) -> float:
        return self.mbps / max(self.chips, 1)

    def to_json(self) -> str:
        d = dataclasses.asdict(self)
        d["ratio"] = round(self.ratio, 4)
        d["mbps"] = round(self.mbps, 3)
        d["mbps_per_chip"] = round(self.mbps_per_chip, 3)
        return json.dumps(d)


@contextlib.contextmanager
def device_trace(log_dir: str | None):
    """jax.profiler trace capture (view with TensorBoard / xprof)."""
    if not log_dir:
        yield
        return
    import jax

    with jax.profiler.trace(log_dir):
        yield


def block_until_ready(tree):
    """Synchronize a pytree of device arrays (for timing harnesses)."""
    import jax

    return jax.block_until_ready(tree)
