"""GSPMD parameter/batch sharding rules over the ('data', 'model') mesh.

The reference's only parallelism is DDP data-parallel over NCCL (SURVEY §2.2); here DP is
the ``data`` mesh axis (batch dim sharded, gradients psum'd by XLA) and we additionally
provide Megatron-style tensor parallelism over the ``model`` axis — attention heads and MLP
hidden dims split so that each layer needs exactly one all-reduce per block, riding ICI:

- q/k/v and gate/up kernels: output-dim sharded  -> activations sharded by head/ffn
- o_proj and down kernels:   input-dim sharded   -> psum on exit (XLA inserts it)
- embedding / lm_head:        vocab sharded

Rules are (regex over '/'-joined param paths) -> PartitionSpec; first match wins; default
is replicated. The same path strings drive the freezing masks — one naming scheme everywhere.
"""

from __future__ import annotations

import re
from typing import Sequence

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from projectiontrainer_tpu.core.mesh import DATA_AXIS, MODEL_AXIS
from projectiontrainer_tpu.core.pytree import path_str

# (pattern, spec) — patterns are re.search'd against the path
DEFAULT_RULES: Sequence[tuple[str, P]] = (
    # decoder (llm/ or bare); the quantized QLoRA base shards like its bf16 kernel:
    # int8 'qvalues' [in,out] + per-out-channel 'scales' [out]; NF4 'packed_nf4'
    # [in/2,out] + 'block_scales' [in/64,out]; nf4-mirror 'qvalues_block' [in,out]
    # (all 2-D, kernel-shaped layouts)
    (r"attn/(q_proj|k_proj|v_proj)/(kernel|qvalues|qvalues_block|packed_nf4|block_scales)$",
     P(None, MODEL_AXIS)),
    (r"attn/(q_proj|k_proj|v_proj)/scales$", P(MODEL_AXIS)),
    (r"attn/o_proj/(kernel|qvalues|qvalues_block|packed_nf4|block_scales)$", P(MODEL_AXIS, None)),
    (r"mlp/(gate_proj|up_proj)/(kernel|qvalues|qvalues_block|packed_nf4|block_scales)$",
     P(None, MODEL_AXIS)),
    (r"mlp/(gate_proj|up_proj)/scales$", P(MODEL_AXIS)),
    (r"mlp/down_proj/(kernel|qvalues|qvalues_block|packed_nf4|block_scales)$", P(MODEL_AXIS, None)),
    (r"embed_tokens/embedding$", P(MODEL_AXIS, None)),
    (r"lm_head/kernel$", P(None, MODEL_AXIS)),
    # lora adapters: A replicated-in, r-dim replicated; B output-sharded to match base
    (r"lora/.*(q_proj|k_proj|v_proj|gate_proj|up_proj)/b$", P(None, MODEL_AXIS)),
    (r"lora/.*(o_proj|down_proj)/a$", P(MODEL_AXIS, None)),
    # SigLIP towers / classifier MHA / projector
    (r"attn/(q_proj|k_proj|v_proj)/kernel$", P(None, MODEL_AXIS)),
    (r"attn/out_proj/kernel$", P(MODEL_AXIS, None)),
    (r"(mlp|head)/fc1/kernel$", P(None, MODEL_AXIS)),
    (r"(mlp|head)/fc2/kernel$", P(MODEL_AXIS, None)),
    (r"projector/fc1/kernel$", P(None, MODEL_AXIS)),
    (r"projector/fc2/kernel$", P(MODEL_AXIS, None)),
    (r"token_embedding/embedding$", P(MODEL_AXIS, None)),
)


def spec_for_path(path: str, rules: Sequence[tuple[str, P]] = DEFAULT_RULES) -> P:
    for pattern, spec in rules:
        if re.search(pattern, path):
            return spec
    return P()


def _divisible(shape, spec, mesh: Mesh) -> bool:
    for dim, axis in enumerate(spec):
        if axis is None:
            continue
        if dim >= len(shape) or shape[dim] % mesh.shape[axis] != 0:
            return False
    return True


# Leaves below this element count stay replicated under FSDP: the all-gather latency
# for a few-KB norm scale or bias exceeds any memory win (v5e ICI round trip ~us vs
# bytes saved ~KB). 2^16 elements = 128 KB bf16 — well past break-even.
FSDP_MIN_SIZE = 65_536


def _with_fsdp_axis(spec: P, shape, mesh: Mesh) -> P:
    """ZeRO-3-style spec: add the ``data`` axis to the largest still-unsharded,
    divisible dim of a >=2-D leaf. Params then live sharded at rest; GSPMD inserts
    all-gathers on use in fwd/bwd and (with the train-step gradient constraint)
    reduce-scatters the grads, so Adam moments — created ``zeros_like(params)`` —
    inherit the sharded layout and per-device optimizer memory drops by the data-axis
    size. The "How to Scale Your Model" FSDP recipe: same mesh axis as the batch."""
    ndata = mesh.shape.get(DATA_AXIS, 1)
    if ndata <= 1 or len(shape) < 2:
        return spec
    import math

    if math.prod(shape) < FSDP_MIN_SIZE:
        return spec
    entries = list(spec) + [None] * (len(shape) - len(spec))
    candidates = [
        d for d in range(len(shape))
        if entries[d] is None and shape[d] % ndata == 0
    ]
    if not candidates:
        return spec
    best = max(candidates, key=lambda d: shape[d])
    entries[best] = DATA_AXIS
    while entries and entries[-1] is None:
        entries.pop()
    return P(*entries)


def param_shardings(params, mesh: Mesh, rules=DEFAULT_RULES, *, fsdp: bool = False):
    """NamedSharding pytree for params. Falls back to replication when a dim doesn't
    divide the mesh axis (tiny test models). ``fsdp=True`` additionally shards every
    large leaf over the ``data`` axis (ZeRO-3 / fully-sharded layout — required for
    full-parameter fine-tunes whose fp32 Adam state exceeds one chip, e.g. the
    Gemma3-4B full-joint stage-2 recipe); TP-rule axes are kept, the data axis rides
    the remaining largest dim."""

    def per_leaf(path, leaf):
        spec = spec_for_path(path_str(path), rules)
        if not _divisible(leaf.shape, spec, mesh):
            spec = P()
        if fsdp:
            spec = _with_fsdp_axis(spec, leaf.shape, mesh)
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(per_leaf, params)


def shard_params(params, mesh: Mesh, rules=DEFAULT_RULES, *, fsdp: bool = False):
    shardings = param_shardings(params, mesh, rules, fsdp=fsdp)
    return jax.tree.map(jax.device_put, params, shardings)


def local_nbytes(tree) -> int:
    """Per-device bytes of a sharded pytree (sum of each leaf's LOCAL shard size) —
    the number the FSDP memory assertions check against params_total/data_axis."""
    total = 0
    for leaf in jax.tree_util.tree_leaves(tree):
        if hasattr(leaf, "sharding") and hasattr(leaf, "shape"):
            import math

            shard = leaf.sharding.shard_shape(leaf.shape)
            total += math.prod(shard) * leaf.dtype.itemsize
        elif hasattr(leaf, "nbytes"):
            total += leaf.nbytes
    return total


def shard_batch(batch, mesh: Mesh):
    """Form the GLOBAL batch from this process's local slice, sharded over the data axis.

    Single-host this is a plain sharded device_put. Multi-host, each process feeds only
    the rows its addressable devices consume (``jax.make_array_from_process_local_data``)
    — the pjit-world replacement for ``DistributedSampler`` (reference:
    Stage0/train_vision_encoder_stage0.py:508-509): global batch = local batch x
    process_count, with no host decoding data another host's devices will use.
    """
    sharding = NamedSharding(mesh, P(DATA_AXIS))

    if jax.process_count() == 1:
        return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)

    import numpy as np

    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(sharding, np.asarray(x)),
        batch,
    )
