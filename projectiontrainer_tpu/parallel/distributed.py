"""Multi-host runtime helpers: initialization and host-side gathers.

Replaces the reference's NCCL process-group bootstrap (Stage0/
train_vision_encoder_stage0.py:59-84: RANK/WORLD_SIZE env + dist.init_process_group) and
its manual padded all_gather protocol (:362-411) with JAX-native equivalents:

- :func:`initialize` wraps ``jax.distributed.initialize`` (no-op on single host);
- :func:`gather_objects` replaces ``gather_object`` for validation example strings
  (reference: Stage2/trainer.py:654) via multihost_utils;
- :func:`gather_ragged` reproduces the Stage-0 size-exchange + pad + gather semantics
  (variable per-host eval counts) as a fixed-size count+pad protocol — but note that
  under pjit most eval arrays are already global, so this is only needed for
  host-local (non-addressable) data.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> tuple[int, int]:
    """Initialize the multi-host runtime; returns (process_index, process_count).
    Safe to call on a single host (no-op)."""
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes, process_id=process_id,
        )
    return jax.process_index(), jax.process_count()


def is_main() -> bool:
    return jax.process_index() == 0


def barrier(name: str = "barrier"):
    """Cross-host sync point (the reference fences validation/saving with
    dist.barrier — Stage0:321,357,428,795-798)."""
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)


def gather_objects(local: Sequence[Any]) -> list[Any]:
    """All-gather arbitrary picklable host objects (validation example strings)."""
    if jax.process_count() == 1:
        return list(local)
    from jax.experimental import multihost_utils

    # process_allgather handles arrays; objects go through a pickle+pad protocol:
    import pickle

    payload = np.frombuffer(pickle.dumps(list(local)), dtype=np.uint8)
    sizes = multihost_utils.process_allgather(np.asarray([payload.size]))
    max_size = int(sizes.max())
    padded = np.zeros((max_size,), np.uint8)
    padded[: payload.size] = payload
    all_payloads = multihost_utils.process_allgather(padded)
    out = []
    for row, size in zip(np.atleast_2d(all_payloads), sizes.reshape(-1)):
        out.extend(pickle.loads(row[: int(size)].tobytes()))
    return out


def gather_ragged(local: np.ndarray) -> np.ndarray:
    """Gather per-host arrays with differing leading dims: size-exchange + pad +
    gather + trim (the Stage-0 padded all_gather, reference :362-411)."""
    if jax.process_count() == 1:
        return np.asarray(local)
    from jax.experimental import multihost_utils

    local = np.asarray(local)
    sizes = multihost_utils.process_allgather(np.asarray([local.shape[0]]))
    max_n = int(sizes.max())
    padded = np.zeros((max_n,) + local.shape[1:], local.dtype)
    padded[: local.shape[0]] = local
    gathered = multihost_utils.process_allgather(padded)
    rows = []
    for row, n in zip(gathered, sizes.reshape(-1)):
        rows.append(row[: int(n)])
    return np.concatenate(rows)
