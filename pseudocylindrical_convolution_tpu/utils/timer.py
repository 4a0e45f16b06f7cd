"""Lightweight op timing (parity with extension/timer.h's time_it flag).

On TPU, accurate per-op timing requires blocking on device results; for
deeper profiles use jax.profiler (see Timer.profile)."""

from __future__ import annotations

import contextlib
import time

import jax


class Timer:
    def __init__(self, enabled: bool = False):
        self.enabled = enabled
        self.records: dict[str, list[float]] = {}

    @contextlib.contextmanager
    def time(self, name: str, sync=None):
        if not self.enabled:
            yield
            return
        t0 = time.perf_counter()
        yield
        if sync is not None:
            jax.block_until_ready(sync)
        self.records.setdefault(name, []).append(time.perf_counter() - t0)

    @contextlib.contextmanager
    def profile(self, logdir: str):
        jax.profiler.start_trace(logdir)
        try:
            yield
        finally:
            jax.profiler.stop_trace()

    def summary(self) -> str:
        lines = []
        for k, v in self.records.items():
            lines.append(f"{k}: n={len(v)} mean={sum(v)/len(v)*1e3:.2f}ms")
        return "\n".join(lines)
