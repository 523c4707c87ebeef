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


def param_shardings(params, mesh: Mesh, rules=DEFAULT_RULES):
    """NamedSharding pytree for params. Falls back to replication when a dim doesn't
    divide the mesh axis (tiny test models)."""

    def per_leaf(path, leaf):
        spec = spec_for_path(path_str(path), rules)
        if not _divisible(leaf.shape, spec, mesh):
            spec = P()
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(per_leaf, params)


def shard_params(params, mesh: Mesh, rules=DEFAULT_RULES):
    shardings = param_shardings(params, mesh, rules)
    return jax.tree.map(jax.device_put, params, shardings)


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
