"""Logging, FPS counters, and per-stage profiling.

Rebuilds the reference's observability: a module logger with stdout + per-run
`scanner.log` file handler (test/mini1.py:53-62), per-second FPS log lines
(test/check81.py:406-418, mini1.py:423-431), and wall-clock stage timers
(test/gpu-performance.py:17-21) — extended with optional JAX profiler traces,
which the reference never had.
"""
from __future__ import annotations

import contextlib
import logging
import os
import time
from collections import defaultdict
from typing import Dict, Optional


def make_logger(name: str = "recon3d", output_dir: Optional[str] = None) -> logging.Logger:
    """stdout + optional <output_dir>/scanner.log (reference: mini1.py:53-62)."""
    logger = logging.getLogger(name)
    if logger.handlers:
        return logger
    logger.setLevel(logging.INFO)
    fmt = logging.Formatter("%(asctime)s - %(levelname)s - %(message)s")
    sh = logging.StreamHandler()
    sh.setFormatter(fmt)
    logger.addHandler(sh)
    if output_dir:
        os.makedirs(output_dir, exist_ok=True)
        fh = logging.FileHandler(os.path.join(output_dir, "scanner.log"))
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    return logger


class FPSCounter:
    """Per-second FPS logging (reference: check81.py:406-418).

    NOTE: consumers tick() when a jitted call RETURNS, which on an
    asynchronous runtime is the DISPATCH rate, not completed-frame
    throughput (dispatches ran ~10x ahead of execution on the axon
    backend until the round-5 integrate fix). Logged fps is a liveness
    signal; bench.py measures throughput with device-synced windows."""

    def __init__(self, logger: Optional[logging.Logger] = None, label: str = "scan"):
        self.logger = logger
        self.label = label
        self._count = 0
        self._t0 = time.perf_counter()
        self.last_fps = 0.0
        self.total_frames = 0

    def tick(self, n: int = 1) -> Optional[float]:
        """Count a frame; returns fps once per elapsed second, else None."""
        self._count += n
        self.total_frames += n
        dt = time.perf_counter() - self._t0
        if dt >= 1.0:
            self.last_fps = self._count / dt
            self._count = 0
            self._t0 = time.perf_counter()
            if self.logger:
                self.logger.info("%s fps: %.2f", self.label, self.last_fps)
            return self.last_fps
        return None


class StageTimer:
    """Accumulating wall-clock timers per pipeline stage."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def summary(self) -> str:
        lines = []
        for k in sorted(self.totals, key=self.totals.get, reverse=True):
            n = self.counts[k]
            lines.append(f"{k:30s} total {self.totals[k]*1e3:9.2f} ms  "
                         f"n={n:5d}  mean {self.totals[k]/max(n,1)*1e3:8.3f} ms")
        return "\n".join(lines)


@contextlib.contextmanager
def jax_trace(log_dir: Optional[str]):
    """Optional JAX profiler trace around a block (view with TensorBoard)."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
