"""Process-pool image feeder with shared-memory handoff — the pod-scale host path.

The thread pool in data/pipeline.py tops out near one core's decode+augment
throughput: PIL's JPEG decoder and the native C++ kernels release the GIL, but the
Python orchestration between them serializes. One v5e host drives 4-8 chips
(SURVEY §7.3.6: the 3x north-star "is won or lost on host decode/augment"), so the
image hot path must scale across PROCESSES:

- N ``spawn``-context workers run decode (PIL, optional JPEG DCT ``draft``
  downscaling) + the sampled augment + fused native preprocess
  (data/augmentation.augment_and_preprocess_fast) — no JAX import in workers;
- pixel tensors come back through a ``multiprocessing.shared_memory`` slot pool
  (float32 [S, S, C] slots): a worker writes its slot in place and sends only
  ``(ticket, slot, ok)`` through the result queue — no pickling of megabyte
  arrays through pipes;
- the parent copies a finished slot into the sample dict (one memcpy, ~100x
  cheaper than the decode) and frees it immediately, then finishes the sample
  host-side (tokenization, labels) via the dataset's ``finish_pixels`` hook.

Datasets opt in with two methods (ContrastiveDataset and Stage1PairDataset):

    pixel_job(idx)            -> (path | None, augment_seed | None)
    finish_pixels(idx, pixels | None) -> sample dict  (None = worker IO failure)

Datasets without the protocol (or failures inside it) transparently fall back to
in-process ``dataset[idx]``.

The torch analogue is ``DataLoader(num_workers=N)`` with shared-memory tensors
(the reference's loaders: Stage0/train_vision_encoder_stage0.py:522-539); this is
the same capability without torch and with the fused C++ kernel inside the worker.
"""

from __future__ import annotations

import atexit
import collections
import multiprocessing as mp
import os
import queue as queue_mod
import threading
import time
from multiprocessing import shared_memory
from typing import Iterator, Optional

import numpy as np

_SENTINEL = ("__stop__",)

# Tickets crossing the worker queues are (stream << _TICKET_BITS) | ticket — a
# generation tag per sample stream, so an ABANDONED stream (consumer raised or the
# feed was dropped mid-epoch; its generator may still be running on a detached
# device_prefetch feeder thread) cannot poison the next one: ticket numbering
# restarts at 0 every stream, and only the tag disambiguates the two. poll() takes
# the CALLER's stream id — results for older streams are reclaimed, results for
# newer streams are buffered for their own consumer, and a caller whose stream has
# been superseded gets StaleStreamError instead of stealing the live stream's work.
_TICKET_BITS = 40
_TICKET_MASK = (1 << _TICKET_BITS) - 1


class StaleStreamError(RuntimeError):
    """Raised by poll() when a newer stream has started: the calling generator was
    abandoned by its consumer and must stop draining the shared result queue."""


def _worker_main(shm_name: str, n_slots: int, size: int, channels: int,
                 task_q, result_q, draft_size: Optional[int]):
    """Worker loop: decode + augment + preprocess into the shared slot.

    Imports only PIL/cv2/numpy + the native runtime — never JAX (a spawned child
    must not re-initialize the TPU client)."""
    shm = shared_memory.SharedMemory(name=shm_name)
    slots = np.ndarray((n_slots, size, size, channels), np.float32, buffer=shm.buf)
    from projectiontrainer_tpu.data import image as I
    from projectiontrainer_tpu.data.augmentation import augment_and_preprocess_fast
    try:
        while True:
            task = task_q.get()
            if task == _SENTINEL:
                break
            ticket, slot, path, aug_seed = task
            try:
                img = I.load_image(path, draft_size=draft_size)
                if aug_seed is None:
                    slots[slot] = I.preprocess(img, size)
                else:
                    arr = np.asarray(img)
                    slots[slot] = augment_and_preprocess_fast(
                        arr, size, rng=np.random.default_rng(aug_seed)
                    )
                result_q.put((ticket, slot, True))
            except Exception:
                result_q.put((ticket, slot, False))
    finally:
        shm.close()


class ProcessPixelPool:
    """A pool of decode+augment worker processes writing into shared-memory slots.

    One pool per (image_size, num_workers) lives for the process lifetime (see
    :func:`get_pool`) — spawn + import cost is paid once, then epochs reuse it.
    """

    def __init__(self, *, image_size: int, num_workers: int, channels: int = 3,
                 slots_per_worker: int = 8, draft_size: Optional[int] = None):
        self.image_size = image_size
        self.channels = channels
        self.num_workers = num_workers
        self.n_slots = max(2, num_workers * slots_per_worker)
        nbytes = self.n_slots * image_size * image_size * channels * 4
        self._shm = shared_memory.SharedMemory(create=True, size=nbytes)
        self.slots = np.ndarray(
            (self.n_slots, image_size, image_size, channels), np.float32,
            buffer=self._shm.buf,
        )
        ctx = mp.get_context("spawn")
        self._task_q = ctx.Queue()
        self._result_q = ctx.Queue()
        self._procs = [
            ctx.Process(
                target=_worker_main,
                args=(self._shm.name, self.n_slots, image_size, channels,
                      self._task_q, self._result_q, draft_size),
                daemon=True,
            )
            for _ in range(num_workers)
        ]
        # Workers must NOT attach to the accelerator: some environments register a
        # PJRT plugin from sitecustomize in every interpreter (claiming the chip the
        # parent already holds). Spawned children inherit os.environ, so strip the
        # triggering variables for the duration of the forks.
        saved = {
            k: os.environ.pop(k)
            for k in ("PALLAS_AXON_POOL_IPS",)
            if k in os.environ
        }
        prev_platforms = os.environ.get("JAX_PLATFORMS")
        os.environ["JAX_PLATFORMS"] = "cpu"
        try:
            for p in self._procs:
                p.start()
        finally:
            os.environ.update(saved)
            if prev_platforms is None:
                os.environ.pop("JAX_PLATFORMS", None)
            else:
                os.environ["JAX_PLATFORMS"] = prev_platforms
        self._free = collections.deque(range(self.n_slots))
        self._closed = False
        self._stream_gen = 0
        # an abandoned stream's generator can poll concurrently with the live one
        # (both on device_prefetch feeder threads) — guard the shared slot/pending
        # bookkeeping; the mp queues are internally thread-safe already
        self._lock = threading.Lock()
        # results read off _result_q by one stream's poll that belong to another
        # (newer) stream: buffered here for that stream's own consumer
        self._pending: dict[int, collections.deque] = {}

    # -------------------------------------------------------------- submission

    def new_stream(self) -> int:
        """Start a new sample stream and return its id: outstanding tickets from any
        previous stream become stale — their slots are reclaimed as their results
        drain through poll() — and ticket numbering may restart at 0 without
        collisions."""
        with self._lock:
            self._stream_gen += 1
            # a pending buffer for a now-superseded stream will never be polled —
            # reclaim its slots here or the slot pool leaks
            for g in [g for g in self._pending if g < self._stream_gen]:
                for _ticket, slot, _ok in self._pending.pop(g):
                    self._free.append(slot)
            return self._stream_gen

    def try_submit(self, stream: int, ticket: int, path: str,
                   aug_seed: Optional[int]) -> Optional[int]:
        """Atomically claim a free slot and enqueue the task; None when no slot is
        free (check-then-submit as two calls would race between streams)."""
        with self._lock:
            if not self._free:
                return None
            slot = self._free.popleft()
        self._task_q.put(((stream << _TICKET_BITS) | ticket, slot, path, aug_seed))
        return slot

    def poll(self, stream: int, timeout: Optional[float] = None):
        """Next finished (ticket, slot, ok) for ``stream``, or None on timeout.

        Results for streams OLDER than the caller are consumed internally and their
        slots freed; results for NEWER streams are buffered for that stream's own
        poll. Raises StaleStreamError once the caller's stream has been superseded —
        the abandoned generator must stop draining the shared queue."""
        deadline = None if timeout is None else time.monotonic() + timeout
        while True:
            with self._lock:
                buf = self._pending.get(stream)
                if buf:
                    item = buf.popleft()
                    if not buf:
                        del self._pending[stream]
                    return item
                if stream != self._stream_gen:
                    raise StaleStreamError(
                        f"stream {stream} superseded by {self._stream_gen}"
                    )
            wait = None if deadline is None else max(0.0, deadline - time.monotonic())
            try:
                tagged, slot, ok = self._result_q.get(timeout=min(wait, 0.5) if wait is not None else 0.5)
            except queue_mod.Empty:
                if deadline is not None and time.monotonic() >= deadline:
                    return None
                continue  # re-check pending/staleness between short waits
            g, ticket = tagged >> _TICKET_BITS, tagged & _TICKET_MASK
            if g == stream:
                return ticket, slot, ok
            with self._lock:
                if g > stream:
                    # a newer stream's result — hand it to that consumer
                    self._pending.setdefault(g, collections.deque()).append(
                        (ticket, slot, ok))
                else:
                    self._free.append(slot)  # abandoned-stream slot reclaimed

    def take(self, slot: int) -> np.ndarray:
        """Copy the slot's pixels out and free the slot."""
        out = self.slots[slot].copy()
        with self._lock:
            self._free.append(slot)
        return out

    def release(self, slot: int):
        with self._lock:
            self._free.append(slot)

    # -------------------------------------------------------------- lifecycle

    def close(self):
        if self._closed:
            return
        self._closed = True
        for _ in self._procs:
            try:
                self._task_q.put(_SENTINEL)
            except Exception:
                pass
        for p in self._procs:
            p.join(timeout=5)
            if p.is_alive():
                p.terminate()
        self._shm.close()
        try:
            self._shm.unlink()
        except FileNotFoundError:
            pass


_pools: dict = {}


def get_pool(image_size: int, num_workers: int, *,
             draft_size: Optional[int] = None) -> ProcessPixelPool:
    """Process-lifetime pool cache (spawn + cv2/PIL import cost paid once)."""
    key = (image_size, num_workers, draft_size)
    pool = _pools.get(key)
    if pool is None or pool._closed:
        pool = ProcessPixelPool(image_size=image_size, num_workers=num_workers,
                                draft_size=draft_size)
        _pools[key] = pool
    return pool


@atexit.register
def _close_pools():
    for pool in _pools.values():
        pool.close()


def supports_process_feed(dataset) -> bool:
    return hasattr(dataset, "pixel_job") and hasattr(dataset, "finish_pixels")


def map_samples_processes(dataset, indices, pool: ProcessPixelPool,
                          *, max_inflight: Optional[int] = None) -> Iterator[dict]:
    """Order-preserving sample stream with image work on the process pool.

    For each index: ``pixel_job`` describes the image fetch; workers fill shared
    slots out of order; samples are finished (tokenization etc.) and yielded in
    submission order. Indices whose job is ``(None, ...)`` — and worker failures —
    fall back to in-process ``dataset[idx]`` semantics via ``finish_pixels``.
    """
    indices = [int(i) for i in indices]
    stream = pool.new_stream()  # invalidate any abandoned prior stream's tickets/slots
    if max_inflight is None:
        max_inflight = pool.n_slots - 1
    inflight: dict[int, int] = {}          # ticket -> slot
    done: dict[int, tuple] = {}            # ticket -> (pixels | None)
    local: dict[int, bool] = {}            # tickets resolved without the pool
    pending_job: Optional[tuple] = None    # job drawn but not yet submitted
    next_submit = 0
    next_yield = 0
    n = len(indices)

    def _submit_more():
        # pixel_job may consume dataset RNG (the per-sample augmentation seed), so it
        # must be called exactly once per ticket: cache the drawn job across failed
        # try_submit attempts or retries would shift the whole downstream seed stream
        # depending on slot-availability timing (nondeterministic training data)
        nonlocal next_submit, pending_job
        while next_submit < n and len(inflight) < max_inflight:
            idx = indices[next_submit]
            if pending_job is None:
                pending_job = dataset.pixel_job(idx)
            path, aug_seed = pending_job
            if path is None:
                local[next_submit] = True
            else:
                slot = pool.try_submit(stream, next_submit, path, aug_seed)
                if slot is None:
                    return  # no free slot right now — retry after the next poll
                inflight[next_submit] = slot
            pending_job = None
            next_submit += 1

    try:
        _submit_more()
        while next_yield < n:
            while next_yield < n and (next_yield in local or next_yield in done):
                idx = indices[next_yield]
                if next_yield in local:
                    local.pop(next_yield)
                    sample = dataset.finish_pixels(idx, None)
                else:
                    sample = dataset.finish_pixels(idx, done.pop(next_yield))
                next_yield += 1
                yield sample
                _submit_more()
            if next_yield >= n:
                break
            # short-poll loop: draining an abandoned stream's stale results inside
            # poll() frees slots, so re-run _submit_more between polls — otherwise a
            # stream starting with zero free slots could wait forever on work it was
            # never able to submit
            deadline = time.monotonic() + 120.0
            while True:
                result = pool.poll(stream, timeout=2.0)
                _submit_more()
                if result is not None:
                    break
                if time.monotonic() > deadline:
                    raise RuntimeError(
                        "process feeder stalled: no worker result within 120s "
                        f"({len(inflight)} in flight)"
                    )
            ticket, slot, ok = result
            inflight.pop(ticket, None)
            if ok:
                done[ticket] = pool.take(slot)
            else:
                pool.release(slot)
                done[ticket] = None
            _submit_more()
    except StaleStreamError:
        # a newer stream started: this generator's consumer is gone (abandoned
        # mid-epoch on a prefetch thread) — stop quietly instead of competing for
        # the live stream's results
        return
