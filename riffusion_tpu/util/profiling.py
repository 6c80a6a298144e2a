"""
First-class profiling (SURVEY §5: the reference has no profiler integration;
this is the TPU-native upgrade): capture XLA/xplane traces around any code
region, viewable in TensorBoard/XProf or Perfetto.

Usage:
    from riffusion_tpu.util.profiling import trace
    with trace("/tmp/riffusion_trace"):
        pipeline.riffuse_audio(...)

Or env-driven: set RIFFUSION_TPU_PROFILE_DIR and wrap server requests.
"""

from __future__ import annotations

import contextlib
import os
import time
import typing as T

import jax


@contextlib.contextmanager
def trace(log_dir: T.Optional[str] = None, create_perfetto_link: bool = False):
    """Capture a jax.profiler trace for the enclosed region."""
    log_dir = log_dir or os.environ.get("RIFFUSION_TPU_PROFILE_DIR")
    if not log_dir:
        yield None
        return
    os.makedirs(log_dir, exist_ok=True)
    with jax.profiler.trace(log_dir, create_perfetto_link=create_perfetto_link):
        yield log_dir


class StageTimer:
    """Wall-clock stage timing with a one-line report (host-side; device work
    is made visible by block_until_ready-ing stage outputs)."""

    def __init__(self) -> None:
        self.stages: T.List[T.Tuple[str, float]] = []
        self._t0 = time.time()

    def mark(self, name: str, *block_on) -> None:
        for x in block_on:
            jax.block_until_ready(x)
        now = time.time()
        self.stages.append((name, now - self._t0))
        self._t0 = now

    def report(self) -> str:
        total = sum(dt for _, dt in self.stages)
        parts = ", ".join(f"{name}={dt * 1000:.0f}ms" for name, dt in self.stages)
        return f"total={total * 1000:.0f}ms ({parts})"
