"""Shared trainer plumbing: mesh construction, step accounting, batch feeding."""

from __future__ import annotations

import math
from typing import Iterator, Optional

import jax

from projectiontrainer_tpu.core.config import CommonConfig
from projectiontrainer_tpu.core.mesh import DATA_AXIS, MeshConfig, build_mesh
from projectiontrainer_tpu.data import pipeline as pipe
from projectiontrainer_tpu.parallel import shard_batch


def mesh_from_config(cfg: CommonConfig):
    return build_mesh(MeshConfig(data=cfg.mesh_data, model=cfg.mesh_model))


def global_batch_size(cfg: CommonConfig, mesh) -> int:
    """Reference semantics: ``batch_size`` is per-device; effective batch =
    batch x world x accum (reference: accelerator_setup.py:31)."""
    return cfg.batch_size * mesh.shape[DATA_AXIS]


def steps_per_epoch(n_samples: int, global_batch: int) -> int:
    return math.ceil(n_samples / global_batch)


def update_steps(n_samples: int, global_batch: int, accum: int, epochs: int) -> int:
    per_epoch = math.ceil(steps_per_epoch(n_samples, global_batch) / accum)
    return per_epoch * epochs


def real_rows(batch) -> "np.ndarray":
    """Boolean [B] mask of non-filler rows (``sample_weight > 0``; all-true when the
    batch carries no weights) — host-side eval metrics must exclude straggler fillers."""
    import numpy as np

    w = batch.get("sample_weight")
    if w is None:
        first = next(iter(batch.values()))
        return np.ones((first.shape[0],), bool)
    return np.asarray(w) > 0


def feed(dataset, cfg: CommonConfig, mesh, *, epoch: int, batcher=None,
         shuffle: bool = True) -> Iterator[dict]:
    """Per-epoch device-fed batches of the global batch size."""
    gbs = global_batch_size(cfg, mesh)
    yield from pipe.epoch_batches(
        dataset, batch_size=gbs, epoch=epoch, batcher=batcher, seed=cfg.seed,
        shuffle=shuffle, num_workers=cfg.num_workers,
        transform=lambda b: shard_batch(b, mesh),
    )
