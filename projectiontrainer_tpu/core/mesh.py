"""Device mesh construction for SPMD training.

Replaces the reference's NCCL/DDP process-group setup (reference:
Stage0/train_vision_encoder_stage0.py:59-84, Stage1/accelerator_setup.py:7-54) with a
`jax.sharding.Mesh`. Axes:

- ``data``: pure data parallelism (the only strategy the reference has — SURVEY §2.2);
- ``model``: tensor parallelism over attention heads / MLP hidden dims, a capability the
  reference lacks but which the TPU build provides for free via GSPMD.

Collectives (grad psum, eval all_gathers) are inserted by XLA and ride ICI within a slice.
"""

from __future__ import annotations

import contextlib
import dataclasses
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Mesh shape; ``data`` × ``model`` must equal the number of devices (or -1 to infer)."""

    data: int = -1
    model: int = 1

    def resolve(self, n_devices: int) -> tuple[int, int]:
        data, model = self.data, self.model
        if data == -1 and model == -1:
            raise ValueError("at most one mesh axis may be -1")
        if data == -1:
            data = n_devices // model
        if model == -1:
            model = n_devices // data
        if data * model != n_devices:
            raise ValueError(
                f"mesh {data}x{model} != device count {n_devices}"
            )
        return data, model


def build_mesh(
    config: MeshConfig = MeshConfig(),
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if config.data > 0 and config.model > 0:
        # fully-specified mesh may use a prefix of the available devices
        needed = config.data * config.model
        if needed > len(devices):
            raise ValueError(f"mesh needs {needed} devices, have {len(devices)}")
        devices = devices[:needed]
    data, model = config.resolve(len(devices))
    dev_array = np.asarray(devices).reshape(data, model)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


def local_mesh() -> Mesh:
    """1×1 mesh over the first device — for tests / single-chip runs."""
    return build_mesh(MeshConfig(data=1, model=1), devices=jax.devices()[:1])


# --------------------------------------------------------------- flash shard context
#
# pallas_call has no GSPMD partitioning rules, so the Pallas flash kernel must be
# wrapped in shard_map to run on a multi-chip mesh. Model code (decoder/siglip) has no
# mesh access; trainer loss builders instead set this TRACE-TIME context around the
# loss body, and ops.attention picks it up. Multi-device flash is strictly opt-in:
# without a context, multi-device tracing falls back to the XLA attention path.

_FLASH_MESH: list = [None]  # trace-time stack (tracing is single-threaded per jit)


@contextlib.contextmanager
def flash_shard_context(mesh: Optional[Mesh]):
    _FLASH_MESH.append(mesh)
    try:
        yield
    finally:
        _FLASH_MESH.pop()


def current_flash_mesh() -> Optional[Mesh]:
    return _FLASH_MESH[-1]


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis, replicate the rest."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
