"""Dtype policy: bf16 compute / fp32 params+loss+optimizer, TPU-first.

The reference runs mixed precision via `accelerate --mixed_precision bf16` and computes the
Stage-2 loss in fp32 (reference: Stage2/trainer.py:408). On TPU the idiomatic policy is:
params in fp32 (or bf16 for frozen towers), activations/matmuls in bf16 (MXU-native), loss
and optimizer state in fp32.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


# Quantized-linear scale tensors must stay fp32: bitsandbytes keeps NF4 block scales
# in fp32 and a bf16 scale visibly degrades dequantization accuracy (ops/quant.py).
_KEEP_F32_KEYS = frozenset({"scales", "block_scales"})


def cast_compute_params(tree, compute_dtype):
    """Cast floating leaves of a params pytree to ``compute_dtype``, leaving quantized
    scale tensors (and all integer storage) untouched. Under autodiff the cast is the
    standard mixed-precision recipe: cotangents flow back through ``astype`` and
    accumulate into the original (fp32 master) leaves."""
    def _cast(path, x):
        last = path[-1]
        key = getattr(last, "key", None)
        if key in _KEEP_F32_KEYS:
            return x
        if jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(compute_dtype)
        return x

    return jax.tree_util.tree_map_with_path(_cast, tree)


@dataclasses.dataclass(frozen=True)
class DTypePolicy:
    param_dtype: jnp.dtype = jnp.float32
    compute_dtype: jnp.dtype = jnp.bfloat16
    loss_dtype: jnp.dtype = jnp.float32

    def cast_compute(self, tree):
        """Cast floating leaves of a pytree to the compute dtype."""
        return cast_compute_params(tree, self.compute_dtype)

    def cast_param(self, tree):
        def _cast(x):
            if jnp.issubdtype(x.dtype, jnp.floating):
                return x.astype(self.param_dtype)
            return x
        return jax.tree.map(_cast, tree)


def default_policy(mixed_precision: str = "bf16") -> DTypePolicy:
    """Map the reference's `--mixed_precision {bf16,fp16,no}` flag to a TPU policy.

    fp16 is not TPU-native; we map it to bf16 (documented fidelity delta).
    """
    if mixed_precision in ("bf16", "fp16"):
        return DTypePolicy(compute_dtype=jnp.bfloat16)
    return DTypePolicy(compute_dtype=jnp.float32)
