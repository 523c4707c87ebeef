"""Host-side input pipeline: worker pool -> batcher -> double-buffered device prefetch.

The reference relies on torch DataLoader workers (and falls back to ``num_workers=0`` "FOR
DEBUGGING" in Stage 0 — Stage0:522-539). Here the pipeline is explicit:

- a thread pool decodes/augments images (PIL/cv2 release the GIL for the heavy ops; the
  C++ runtime ops slot in transparently),
- per-host sharding replaces ``DistributedSampler``: each JAX process takes samples
  ``i % process_count == process_index``, with ``set_epoch``-style reshuffling,
- batches are ``jax.device_put`` ahead of consumption (double buffering) so the TPU never
  waits on the host — the single biggest lever for the images/sec/chip target (SURVEY §7.3.6).
"""

from __future__ import annotations

import collections
import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Iterable, Iterator, Optional

import jax
import numpy as np


def host_shard_indices(n: int, *, epoch: int, seed: int = 0, shuffle: bool = True,
                       process_index: Optional[int] = None,
                       process_count: Optional[int] = None) -> np.ndarray:
    """Deterministic per-epoch shuffle + contiguous round-robin host shard — the
    DistributedSampler.set_epoch semantics (reference: Stage0:508-509,623-631)."""
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    order = np.arange(n)
    if shuffle:
        order = np.random.default_rng(seed + epoch).permutation(n)
    # pad to a multiple of process count so every host sees the same step count
    pad = (-n) % pc
    if pad:
        order = np.concatenate([order, order[:pad]])
    return order[pi::pc]


def map_samples(dataset, indices, *, num_workers: int = 8) -> Iterator[dict]:
    """Fetch dataset[i] for i in indices with a thread pool, preserving order."""
    if num_workers <= 1:
        for i in indices:
            yield dataset[int(i)]
        return
    with ThreadPoolExecutor(max_workers=num_workers) as pool:
        window = collections.deque()
        it = iter(indices)
        try:
            for _ in range(num_workers * 2):
                window.append(pool.submit(dataset.__getitem__, int(next(it))))
        except StopIteration:
            pass
        while window:
            yield window.popleft().result()
            try:
                window.append(pool.submit(dataset.__getitem__, int(next(it))))
            except StopIteration:
                pass


def device_prefetch(batches: Iterable[dict], *, size: int = 2,
                    transform: Optional[Callable[[dict], dict]] = None) -> Iterator[dict]:
    """Move batches to device ``size`` steps ahead of the consumer on a feeder thread.
    ``transform`` (when given) owns device placement — e.g. a sharded device_put — and
    the default placement is skipped."""
    q: queue.Queue = queue.Queue(maxsize=size)
    _END = object()

    def feeder():
        try:
            for b in batches:
                if transform is not None:
                    b = transform(b)
                else:
                    b = jax.tree.map(jax.device_put, b)
                q.put(b)
            q.put(_END)
        except BaseException as e:  # noqa: BLE001 — propagate to the consumer
            # a failure on this thread (e.g. the process feeder's 120s stall
            # RuntimeError) must fail the epoch loudly; a bare _END here would
            # silently truncate the epoch and train on a fraction of the data
            q.put(e)

    t = threading.Thread(target=feeder, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _END:
            break
        if isinstance(item, BaseException):
            raise item
        yield item


def planned_epoch_batches(
    dataset,
    plan,                       # list[bucketing.PlannedBatch] — identical on all hosts
    *,
    pad_id: int,
    q_side: str = "right",
    a_side: str = "right",
    num_workers: int = 8,
    prefetch: int = 2,
    transform=None,
) -> Iterator[dict]:
    """Execute a global bucket plan: this host fetches its contiguous
    ``1/process_count`` slice of every planned batch (the slice its devices consume
    under ``make_array_from_process_local_data``), pads to the planned bucket, and
    emits local batches with globally-consistent ``sample_weight``."""
    from projectiontrainer_tpu.data.bucketing import pad_to

    pi, pc = jax.process_index(), jax.process_count()

    def local_batches():
        slices = []
        for pb in plan:
            if len(pb.indices) % pc:
                raise ValueError(
                    f"planned global batch {len(pb.indices)} not divisible by "
                    f"process count {pc}"
                )
            lbs = len(pb.indices) // pc
            slices.append((pb, pb.indices[pi * lbs:(pi + 1) * lbs], lbs))
        flat = np.concatenate([idx for _, idx, _ in slices]) if slices else np.zeros(0, int)
        sample_iter = map_samples(dataset, flat, num_workers=num_workers)
        for pb, idx, lbs in slices:
            samples = [next(sample_iter) for _ in range(lbs)]
            # global row j is real iff j < n_real; this host owns rows pi*lbs + k
            weight = (pi * lbs + np.arange(lbs) < pb.n_real).astype(np.float32)
            yield {
                "pixel_values": np.stack([s["pixel_values"] for s in samples]),
                "question_ids": np.stack([
                    pad_to(s["question_ids"], pb.q_bucket, pad_id, side=q_side)
                    for s in samples
                ]),
                "answer_ids": np.stack([
                    pad_to(s["answer_ids"], pb.a_bucket, pad_id, side=a_side)
                    for s in samples
                ]),
                "sample_weight": weight,
            }

    yield from device_prefetch(local_batches(), size=prefetch, transform=transform)


def epoch_batches(
    dataset,
    *,
    batch_size: int,
    epoch: int,
    batcher: Optional[Callable[[Iterable[dict]], Iterator[dict]]] = None,
    seed: int = 0,
    shuffle: bool = True,
    num_workers: int = 8,
    num_procs: int = 0,
    prefetch: int = 2,
    transform=None,
) -> Iterator[dict]:
    """The standard per-epoch pipeline: shard -> decode -> batch -> prefetch.

    ``num_procs > 0`` moves decode+augment onto worker PROCESSES with
    shared-memory pixel handoff (data/feeder.py) for datasets implementing the
    pixel_job/finish_pixels protocol — the pod-scale feed path."""
    from projectiontrainer_tpu.data.bucketing import fixed_batcher

    indices = host_shard_indices(len(dataset), epoch=epoch, seed=seed, shuffle=shuffle)
    if num_procs > 0:
        from projectiontrainer_tpu.data import feeder

        if feeder.supports_process_feed(dataset):
            pool = feeder.get_pool(dataset.image_size, num_procs)
            samples = feeder.map_samples_processes(dataset, indices, pool)
        else:
            samples = map_samples(dataset, indices, num_workers=num_workers)
    else:
        samples = map_samples(dataset, indices, num_workers=num_workers)
    if batcher is None:
        batches = fixed_batcher(samples, batch_size)
    else:
        batches = batcher(samples)
    yield from device_prefetch(batches, size=prefetch, transform=transform)
