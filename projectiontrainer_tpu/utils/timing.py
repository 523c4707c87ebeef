"""Step timing + throughput instrumentation (absent in the reference — SURVEY §5.1).

images/sec/chip and tokens/sec are the BASELINE.md north-star numbers, so they are
first-class here: a StepTimer wraps the train loop and derives steps/s, images/s(/chip),
tokens/s; ``trace`` context manages a jax.profiler capture for deep dives.
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


class StepTimer:
    def __init__(self, *, warmup_steps: int = 2):
        self.warmup_steps = warmup_steps
        self.reset()

    def reset(self):
        self._count = 0
        self._images = 0
        self._tokens = 0
        self._elapsed = 0.0
        self._t0: Optional[float] = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, *, images: int = 0, tokens: int = 0):
        assert self._t0 is not None
        dt = time.perf_counter() - self._t0
        self._t0 = None
        self._count += 1
        if self._count <= self.warmup_steps:  # exclude compile steps
            return dt
        self._elapsed += dt
        self._images += images
        self._tokens += tokens
        return dt

    @property
    def measured_steps(self) -> int:
        return max(0, self._count - self.warmup_steps)

    def summary(self, *, n_chips: Optional[int] = None) -> dict:
        n_chips = n_chips or jax.device_count()
        if self.measured_steps == 0 or self._elapsed == 0:
            return {}
        out = {
            "steps_per_sec": self.measured_steps / self._elapsed,
            "step_time_ms": 1e3 * self._elapsed / self.measured_steps,
        }
        if self._images:
            out["images_per_sec"] = self._images / self._elapsed
            out["images_per_sec_per_chip"] = self._images / self._elapsed / n_chips
        if self._tokens:
            out["tokens_per_sec"] = self._tokens / self._elapsed
        return out


@contextlib.contextmanager
def trace(log_dir: str):
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepProfiler:
    """jax.profiler capture of a step window inside a train loop — wired to the
    ``--profile_dir`` flag (SURVEY §5.1: the reference has no profiling at all).

    Skips the compile steps (default: capture steps [start, start+num)), runs on
    process 0 only, writes a TensorBoard-loadable trace to ``log_dir``.
    """

    def __init__(self, log_dir: Optional[str], *, start_step: int = 10, num_steps: int = 5):
        self.log_dir = log_dir if jax.process_index() == 0 else None
        self.start_step = start_step
        self.stop_step = start_step + num_steps
        self._active = False

    def step(self, global_step: int):
        """Call once per train step with the CURRENT step index (before the step runs)."""
        if not self.log_dir:
            return
        if not self._active and global_step == self.start_step:
            jax.profiler.start_trace(self.log_dir)
            self._active = True
        elif self._active and global_step >= self.stop_step:
            jax.profiler.stop_trace()
            self._active = False

    def close(self):
        if self._active:
            jax.profiler.stop_trace()
            self._active = False
