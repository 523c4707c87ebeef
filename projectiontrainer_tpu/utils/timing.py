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
    """Window-based throughput measurement that never forces a device sync itself.

    Per-step host readbacks (``float(loss)``) stall the dispatch pipeline — measured
    ~9% of stage-1 step time through the tunneled runtime — so trainers now sync only
    at logging boundaries. Usage: ``count()`` each step (no timing), then
    ``window_end()`` IMMEDIATELY AFTER a real host-device sync; the elapsed window is
    attributed to the steps counted in it. The first window (jit compile) is excluded.

    The legacy per-step ``start()``/``stop()`` API remains for callers that do sync
    every step (each start/stop pair is a one-step window).
    """

    def __init__(self, *, warmup_steps: int = 1):
        self.warmup_windows = warmup_steps
        self.reset()

    def reset(self):
        self._windows = 0
        self._steps = 0
        self._images = 0
        self._tokens = 0
        self._elapsed = 0.0
        self._pending_steps = 0
        self._pending_images = 0
        self._pending_tokens = 0
        self._t0: Optional[float] = None

    # ------------------------------------------------------------- window API
    def count(self, *, images: int = 0, tokens: int = 0):
        """Record one dispatched step's work items (call once per train step)."""
        if self._t0 is None:
            self._t0 = time.perf_counter()
        self._pending_steps += 1
        self._pending_images += images
        self._pending_tokens += tokens

    def window_end(self):
        """Close the current window — call right after a host-device sync."""
        if self._t0 is None or self._pending_steps == 0:
            return
        dt = time.perf_counter() - self._t0
        self._windows += 1
        if self._windows > self.warmup_windows:  # first window(s) include compile
            self._elapsed += dt
            self._steps += self._pending_steps
            self._images += self._pending_images
            self._tokens += self._pending_tokens
        self._pending_steps = self._pending_images = self._pending_tokens = 0
        # clock restarts at the NEXT count(): time spent between windows (validation,
        # checkpointing, exports) must not be charged to the next window's steps
        self._t0 = None

    # ---------------------------------------------------- legacy per-step API
    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, *, images: int = 0, tokens: int = 0):
        self.count(images=images, tokens=tokens)
        self.window_end()

    @property
    def measured_steps(self) -> int:
        return self._steps

    def summary(self, *, n_chips: Optional[int] = None) -> dict:
        n_chips = n_chips or jax.device_count()
        if self._steps == 0 or self._elapsed == 0:
            return {}
        out = {
            "steps_per_sec": self._steps / self._elapsed,
            "step_time_ms": 1e3 * self._elapsed / self._steps,
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
        self.num_steps = num_steps
        self._stop_at: Optional[int] = None
        self._active = False
        self._done = False

    def step(self, global_step: int):
        """Call once per train step with the CURRENT step index (before the step runs).
        Fires at the first step >= start_step (a resumed run whose restored step is
        already past start_step still gets its trace) and captures num_steps steps."""
        if not self.log_dir or self._done:
            return
        if not self._active and global_step >= self.start_step:
            jax.profiler.start_trace(self.log_dir)
            self._active = True
            self._stop_at = global_step + self.num_steps
        elif self._active and global_step >= self._stop_at:
            jax.profiler.stop_trace()
            self._active = False
            self._done = True

    def close(self):
        if self._active:
            jax.profiler.stop_trace()
            self._active = False
