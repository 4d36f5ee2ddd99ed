"""Profiling — the DW_SCOPED_SAMPLE replacement (SURVEY §5).

The reference nests RAII GPU-timestamp scopes per pass and shows them in an
ImGui panel (dw::profiler::ui, main.cpp:681-682). Here:

  - ``scope(name)``: annotates the XLA program with named scopes so
    jax.profiler / xprof traces attribute device time per pass;
  - ``FrameTimer``: host-side hierarchical wall timings with
    block_until_ready fencing, printed as the text equivalent of the
    profiler panel;
  - ``trace(logdir)``: wraps jax.profiler.trace for full device traces.
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, List

import jax


def scope(name: str):
    """Named scope visible in XLA/profiler traces (use inside jitted code)."""
    return jax.named_scope(name)


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a device trace viewable in xprof/tensorboard."""
    with jax.profiler.trace(logdir):
        yield


class FrameTimer:
    """Host-side per-pass wall timings (each timed region fences the
    device, so only use for coarse per-pass numbers, not inside jit)."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)
        self._stack: List[str] = []

    @contextlib.contextmanager
    def time(self, name: str, result=None):
        path = "/".join(self._stack + [name])
        self._stack.append(name)
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if result is not None:
                jax.block_until_ready(result)
            self.totals[path] += time.perf_counter() - t0
            self.counts[path] += 1
            self._stack.pop()

    def report(self) -> str:
        lines = ["frame profiler (host wall, device-fenced):"]
        for path in sorted(self.totals):
            depth = path.count("/")
            name = path.split("/")[-1]
            avg = self.totals[path] / max(self.counts[path], 1)
            lines.append(
                f"  {'  ' * depth}{name:<24s} {avg * 1e3:8.2f} ms "
                f"(x{self.counts[path]})"
            )
        return "\n".join(lines)
