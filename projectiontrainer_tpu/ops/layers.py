"""Functional neural-net building blocks on plain pytrees.

Models in this framework are pure functions over nested-dict params — no module objects in
the compute path. Each block here has an ``init_*`` returning a params subtree and an
``apply``-style function. This keeps freezing (bool masks), sharding (path rules) and
checkpointing (flat path <-> HF tensor name maps) trivial.

Conventions:
- Linear kernels are stored ``(in_features, out_features)`` (JAX convention, ``x @ W``);
  HF/torch ``nn.Linear.weight`` is ``(out, in)`` and gets transposed at import time.
- Matmuls run in the compute dtype (bf16 on TPU -> MXU) with fp32 accumulation via
  ``preferred_element_type``; norms/softmax accumulate in fp32.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# ---------------------------------------------------------------------------- init helpers


def _normal(key, shape, stddev, dtype):
    return (stddev * jax.random.normal(key, shape)).astype(dtype)


def init_linear(key, in_dim: int, out_dim: int, *, bias: bool = True, dtype=jnp.float32,
                stddev: float | None = None):
    kkey, _ = jax.random.split(key)
    if stddev is None:
        stddev = in_dim ** -0.5
    p = {"kernel": _normal(kkey, (in_dim, out_dim), stddev, dtype)}
    if bias:
        p["bias"] = jnp.zeros((out_dim,), dtype)
    return p


def init_embedding(key, vocab: int, dim: int, *, dtype=jnp.float32, stddev: float = 0.02):
    return {"embedding": _normal(key, (vocab, dim), stddev, dtype)}


def init_layernorm(dim: int, *, dtype=jnp.float32):
    return {"scale": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}


def init_rmsnorm(dim: int, *, dtype=jnp.float32, zero_centered: bool = False):
    # zero_centered (gemma style) stores w with effective scale (1 + w)
    init = jnp.zeros if zero_centered else jnp.ones
    return {"scale": init((dim,), dtype)}


# ---------------------------------------------------------------------------- apply fns


def linear(p, x, *, compute_dtype=None, precision=None):
    kernel = p["kernel"]
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        kernel = kernel.astype(compute_dtype)
    y = jnp.dot(x, kernel, precision=precision, preferred_element_type=jnp.float32)
    if "bias" in p:
        y = y + p["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


def embedding_lookup(p, ids):
    return jnp.take(p["embedding"], ids, axis=0)


def layernorm(p, x, *, eps: float = 1e-6):
    orig_dtype = x.dtype
    x = x.astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    y = y * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    return y.astype(orig_dtype)


def rmsnorm(p, x, *, eps: float = 1e-6, zero_centered: bool = False):
    """RMSNorm; ``zero_centered=True`` uses the Gemma convention ``y * (1 + w)`` in fp32."""
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
    y = xf * jax.lax.rsqrt(var + eps)
    w = p["scale"].astype(jnp.float32)
    y = y * (1.0 + w) if zero_centered else y * w
    return y.astype(orig_dtype)


def gelu(x, *, approximate: bool = True):
    return jax.nn.gelu(x, approximate=approximate)


def silu(x):
    return jax.nn.silu(x)


ACTIVATIONS = {
    "gelu_tanh": lambda x: jax.nn.gelu(x, approximate=True),
    "gelu": lambda x: jax.nn.gelu(x, approximate=False),
    "silu": jax.nn.silu,
}


# ---------------------------------------------------------------------------- RoPE


def rope_frequencies(head_dim: int, positions, *, theta: float = 10000.0,
                     scaling_factor: float = 1.0, llama3_scaling=None):
    """Return (sin, cos) of shape [*positions.shape, head_dim//2], fp32.

    ``llama3_scaling`` = (factor, low_freq_factor, high_freq_factor,
    original_max_position_embeddings): HF's frequency-dependent Llama-3 rope scaling
    (``_compute_llama3_parameters``) — long wavelengths divide by ``factor``, short ones
    stay, the band between interpolates smoothly.
    """
    fraction = 2.0 * jnp.arange(0, head_dim // 2, dtype=jnp.float32) / head_dim
    timescale = theta ** fraction  # [head_dim//2]
    inv_freq = 1.0 / timescale
    if llama3_scaling is not None:
        factor, low_ff, high_ff, orig_max = llama3_scaling
        low_wavelen = orig_max / low_ff
        high_wavelen = orig_max / high_ff
        wavelen = 2.0 * jnp.pi / inv_freq
        scaled = inv_freq / factor
        smooth = (orig_max / wavelen - low_ff) / (high_ff - low_ff)
        mid = (1.0 - smooth) * scaled + smooth * inv_freq
        inv_freq = jnp.where(
            wavelen > low_wavelen, scaled,
            jnp.where(wavelen < high_wavelen, inv_freq, mid),
        )
    pos = positions.astype(jnp.float32) / scaling_factor
    angle = pos[..., None] * inv_freq  # [..., head_dim//2]
    return jnp.sin(angle), jnp.cos(angle)


def apply_rope(x, sin, cos):
    """Rotate pairs split as (first half, second half) — matches HF rotate_half.

    x: [B, T, H, D]; sin/cos: [B, T, D//2] (or broadcastable).
    """
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    sin = sin[..., None, :].astype(jnp.float32)
    cos = cos[..., None, :].astype(jnp.float32)
    x1f, x2f = x1.astype(jnp.float32), x2.astype(jnp.float32)
    out1 = x1f * cos - x2f * sin
    out2 = x2f * cos + x1f * sin
    return jnp.concatenate([out1, out2], axis=-1).astype(x.dtype)


# ---------------------------------------------------------------------------- conv patches


def init_conv_patch(key, patch: int, in_ch: int, out_dim: int, *, dtype=jnp.float32):
    """Patchify conv stored as [patch, patch, in_ch, out_dim] (HWIO)."""
    stddev = (patch * patch * in_ch) ** -0.5
    return {
        "kernel": _normal(key, (patch, patch, in_ch, out_dim), stddev, dtype),
        "bias": jnp.zeros((out_dim,), dtype),
    }


def conv_patchify(p, images, *, patch: int):
    """images: [B, H, W, C] -> patch embeddings [B, (H/p)*(W/p), D].

    Implemented as space-to-depth + matmul so the FLOPs land on the MXU as one large GEMM
    instead of XLA's generic conv path.
    """
    b, h, w, c = images.shape
    gh, gw = h // patch, w // patch
    x = images.reshape(b, gh, patch, gw, patch, c)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, gh * gw, patch * patch * c)
    kernel = p["kernel"].reshape(patch * patch * c, -1)
    y = jnp.dot(x, kernel.astype(x.dtype), preferred_element_type=jnp.float32)
    return (y + p["bias"].astype(jnp.float32)).astype(images.dtype)
