"""Multi-head attention core with GQA, causal/sliding-window masking, bias support.

This is the XLA reference path: fp32 softmax, bf16 QK^T/PV matmuls on the MXU. The Pallas
flash kernel (ops/flash_attention.py) implements the same contract and is selected by
``impl='flash'`` when running on TPU with shapes that tile; everything else falls through to
this implementation (replacing the reference's conditional flash-attention-2 at
Stage2/train_vqa_stage2.py:186).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -2.3819763e38  # matches XLA's mask fill; large but finite to avoid NaN in softmax


def _repeat_kv(x: jnp.ndarray, n_rep: int) -> jnp.ndarray:
    """[B, T, Hkv, D] -> [B, T, Hkv*n_rep, D] grouping queries onto kv heads."""
    if n_rep == 1:
        return x
    b, t, h, d = x.shape
    x = jnp.broadcast_to(x[:, :, :, None, :], (b, t, h, n_rep, d))
    return x.reshape(b, t, h * n_rep, d)


def make_attention_mask(
    q_len: int,
    kv_len: int,
    *,
    causal: bool,
    window: Optional[int] = None,
    q_offset=0,
) -> jnp.ndarray:
    """Boolean [q_len, kv_len] mask of *allowed* positions.

    ``q_offset`` shifts query positions (decode step with KV cache). ``window`` is a
    sliding-window size: key position must satisfy q_pos - window < k_pos (HF semantics:
    attends to the previous ``window`` tokens inclusive of self).
    """
    q_pos = jnp.arange(q_len)[:, None] + q_offset
    k_pos = jnp.arange(kv_len)[None, :]
    mask = jnp.ones((q_len, kv_len), dtype=bool)
    if causal:
        mask = mask & (k_pos <= q_pos)
    if window is not None:
        mask = mask & (k_pos > q_pos - window)
    return mask


def dot_product_attention(
    q: jnp.ndarray,  # [B, Tq, Hq, D]
    k: jnp.ndarray,  # [B, Tk, Hkv, D]
    v: jnp.ndarray,  # [B, Tk, Hkv, D]
    *,
    scale: Optional[float] = None,
    causal: bool = False,
    window: Optional[int] = None,
    kv_mask: Optional[jnp.ndarray] = None,  # [B, Tk] bool — padding mask on keys
    q_offset=0,
    impl: str = "xla",
    needs_grad: bool = True,
) -> jnp.ndarray:
    """Attention returning [B, Tq, Hq, D]. GQA when Hq > Hkv (must divide).

    ``needs_grad=False`` promises the call is never differentiated (cache-based
    decode/prefill) — the flash kernel then sizes its VMEM gate on the forward
    alone, keeping the transpose-free merged-lane path available at shapes whose
    backward would not fit."""
    if impl == "flash":
        from projectiontrainer_tpu.ops.flash_attention import (
            flash_attention, flash_attention_supported, sharded_flash_attention,
            sharded_flash_plan,
        )

        if flash_attention_supported(q, k, v, window=window):
            if jax.device_count() == 1:
                return flash_attention(
                    q, k, v, scale=scale, causal=causal, window=window,
                    kv_mask=kv_mask, q_offset=q_offset, needs_bwd=needs_grad,
                )
            # Multi-device: the Pallas kernel has no GSPMD partitioning rules, so it
            # runs ONLY under an explicit shard_map context (set by trainer loss
            # builders — core.mesh.flash_shard_context). Anything else (generation,
            # ad-hoc jits) falls through to the partitionable XLA path.
            from projectiontrainer_tpu.core.mesh import current_flash_mesh

            mesh = current_flash_mesh()
            if mesh is not None and sharded_flash_plan(mesh, q, k) is not None:
                return sharded_flash_attention(
                    mesh, q, k, v, scale=scale, causal=causal, window=window,
                    kv_mask=kv_mask,
                )

    b, tq, hq, d = q.shape
    _, tk, hkv, _ = k.shape
    if scale is None:
        scale = d ** -0.5
    n_rep = hq // hkv
    k = _repeat_kv(k, n_rep)
    v = _repeat_kv(v, n_rep)

    # [B, H, Tq, Tk] in fp32 for the softmax
    logits = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scale

    mask = make_attention_mask(tq, tk, causal=causal, window=window, q_offset=q_offset)
    mask = mask[None, None]
    if kv_mask is not None:
        mask = mask & kv_mask[:, None, None, :]
    logits = jnp.where(mask, logits, NEG_INF)

    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    # fully-masked rows (padded queries) get ZERO output, not the uniform average that
    # softmax-over-all-NEG_INF would produce; such rows are always excluded from losses
    probs = jnp.where(jnp.any(mask, axis=-1, keepdims=True), probs, 0.0).astype(q.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs, v, preferred_element_type=jnp.float32)
    return out.astype(q.dtype)
