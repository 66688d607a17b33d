"""Per-stage timing + JAX profiler integration.

The reference's observability was per-second FPS log lines
(check81.py:406-418, mini1.py:423-431) — kept in utils.logging.FPSCounter.
This module adds what a TPU deployment actually needs:

- StageTimer: named per-stage wall timing with device-sync-correct
  measurement (block via a tiny device round-trip — block_until_ready is
  not reliable on every platform) and a summary table;
- trace(): context manager around jax.profiler for full XLA/TPU traces
  viewable in TensorBoard/Perfetto.
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator, Optional

import jax


def _sync(x) -> None:
    """Force completion of everything queued before/for x."""
    leaves = [l for l in jax.tree.leaves(x) if hasattr(l, "block_until_ready")]
    if not leaves:
        return
    try:
        import jax.numpy as jnp
        import numpy as np

        # a scalar device->host read is the only universally reliable sync
        # (block_until_ready returns early on some experimental platforms)
        np.asarray(jnp.ravel(leaves[-1])[0])
    except Exception:
        for l in leaves:
            l.block_until_ready()


class StageTimer:
    """Accumulates wall time per named stage.

    timer = StageTimer()
    with timer.stage("sgm"):
        out = step(x)
        timer.sync(out)     # make async dispatch visible to the clock
    print(timer.summary())
    """

    def __init__(self) -> None:
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def sync(self, out) -> None:
        _sync(out)

    def summary(self) -> str:
        rows = ["stage                      total_ms   calls   ms/call"]
        for name in sorted(self.totals, key=self.totals.get, reverse=True):
            t, n = self.totals[name] * 1e3, self.counts[name]
            rows.append(f"{name:<26} {t:9.1f} {n:7d} {t / max(n, 1):9.2f}")
        return "\n".join(rows)

    def reset(self) -> None:
        self.totals.clear()
        self.counts.clear()


@contextlib.contextmanager
def trace(logdir: str, with_perfetto: bool = False) -> Iterator[None]:
    """jax.profiler trace around a region: XLA/TPU timeline to `logdir`.

    View with TensorBoard's profile plugin or ui.perfetto.dev.
    """
    jax.profiler.start_trace(logdir, create_perfetto_link=with_perfetto)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Named region inside a trace (shows up on the profiler timeline)."""
    with jax.profiler.TraceAnnotation(name):
        yield
