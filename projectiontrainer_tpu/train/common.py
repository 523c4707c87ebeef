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


def place_params(params, mesh, cfg: CommonConfig):
    """Shard params per the config's layout and return ``(params, shardings)``.

    ``shardings`` is the NamedSharding pytree to pass to ``make_train_step`` —
    ``None`` for the plain DP/TP layout (GSPMD infers it), the explicit tree under
    ``--fsdp`` so the step pins reduce-scattered grads + shard-local updates."""
    from projectiontrainer_tpu.parallel import param_shardings, shard_params

    fsdp = bool(getattr(cfg, "fsdp", False))
    placed = shard_params(params, mesh, fsdp=fsdp)
    return placed, (param_shardings(params, mesh, fsdp=True) if fsdp else None)


def compute_dtype_from_config(cfg: CommonConfig):
    """``--mixed_precision {bf16,fp16,no}`` -> the compute dtype the loss casts params
    to (reference: accelerate --mixed_precision, e.g. Stage2/run_vqa_train_stage2.sh:73).
    fp16 maps to bf16 (TPU-native; documented fidelity delta). 'no' returns None: the
    loss computes in the params' own dtype."""
    import jax.numpy as jnp

    if cfg.mixed_precision in ("bf16", "fp16"):
        return jnp.bfloat16
    return None


def global_batch_size(cfg: CommonConfig, mesh) -> int:
    """Reference semantics: ``batch_size`` is per-device; effective batch =
    batch x world x accum (reference: accelerator_setup.py:31)."""
    return cfg.batch_size * mesh.shape[DATA_AXIS]


def local_batch_size(global_batch: int, *, process_count: int = None) -> int:
    """Rows THIS process feeds per step: global / process_count. Each host builds only
    its addressable slice (jax.make_array_from_process_local_data in shard_batch)."""
    pc = jax.process_count() if process_count is None else process_count
    if global_batch % pc:
        raise ValueError(
            f"global batch {global_batch} not divisible by process count {pc}"
        )
    return global_batch // pc


def steps_per_epoch(n_samples: int, global_batch: int, *, process_count: int = None) -> int:
    """Batches each epoch actually yields — computed the way the feed produces them:
    every host iterates its padded 1/pc index shard in local-batch chunks, so the count
    is identical on all hosts and the schedule ends exactly at max_train_steps."""
    pc = jax.process_count() if process_count is None else process_count
    shard = math.ceil(n_samples / pc)
    return math.ceil(shard / local_batch_size(global_batch, process_count=pc))


def update_steps(n_samples: int, global_batch: int, accum: int, epochs: int,
                 *, process_count: int = None) -> int:
    per_epoch = math.ceil(
        steps_per_epoch(n_samples, global_batch, process_count=process_count) / accum
    )
    return per_epoch * epochs


def real_rows(batch) -> "np.ndarray":
    """Boolean [B] mask of non-filler rows (``sample_weight > 0``; all-true when the
    batch carries no weights) — host-side eval metrics must exclude straggler fillers."""
    import numpy as np

    w = batch.get("sample_weight")
    if w is None:
        first = next(iter(batch.values()))
        return np.ones((first.shape[0],), bool)
    return to_host(w) > 0


def feed(dataset, cfg: CommonConfig, mesh, *, epoch: int, batcher=None,
         shuffle: bool = True) -> Iterator[dict]:
    """Per-epoch device-fed GLOBAL batches. Each host decodes only its 1/process_count
    index shard and builds local batches of gbs/process_count rows; shard_batch
    assembles them into globally-sharded arrays."""
    gbs = global_batch_size(cfg, mesh)
    lbs = local_batch_size(gbs)
    yield from pipe.epoch_batches(
        dataset, batch_size=lbs, epoch=epoch, batcher=batcher, seed=cfg.seed,
        shuffle=shuffle, num_workers=cfg.num_workers,
        num_procs=getattr(cfg, "num_loader_procs", 0),
        transform=lambda b: shard_batch(b, mesh),
    )


def left_align_padding(ids, pad_id: int) -> "np.ndarray":
    """Reorder each row so pad tokens come FIRST (left padding): ``[pad...][tokens]``.

    Generation prefixes require left padding — the last prefix slot must be a real
    token, because decode reads next-token logits from ``hidden[:, -1]`` (the
    reference forces ``padding_side='left'`` for generation, Stage2/trainer.py:499-505).
    Relative token order is preserved (stable sort on the boolean ``id != pad``:
    False/pad rows sort first)."""
    import numpy as np

    ids = np.asarray(ids)
    order = np.argsort(ids != pad_id, axis=1, kind="stable")
    return np.take_along_axis(ids, order, axis=1)


def to_host(x) -> "np.ndarray":
    """Materialize a (possibly globally-sharded) array on every host as numpy.
    Single-process: plain np.asarray. Multi-host: all-gather of the addressable shards
    (the pjit replacement for the reference's gather_object / padded all_gather —
    Stage2/trainer.py:654, Stage0:362-411); np.asarray on a non-addressable global
    array would raise."""
    import numpy as np

    if jax.process_count() == 1:
        return np.asarray(x)
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(x, tiled=True))
