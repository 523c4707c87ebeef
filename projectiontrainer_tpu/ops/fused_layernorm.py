"""Fused Pallas LayerNorm (forward + backward) for the SigLIP towers.

Stage-0 op profiling attributed ~90 ms of the 492 ms so400m step to LayerNorm-family
XLA fusions (BENCH_EXTRA_r05 ``stage0_step_breakdown``): XLA materializes fp32
intermediates and runs multi-pass reductions for the mean/variance and the backward's
two row-reductions. The tensors are bf16 and the op is pure HBM bandwidth — the
speed-of-light cost is one read + one write (fwd) and two reads + one write (bwd), a
few hundred microseconds per call at [16×1025, 1152].

This kernel does the whole normalization in one VMEM pass per row block, fp32 math on
bf16 data in registers, and accumulates the parameter gradients (``dscale``/``dbias``
— full-row reductions) across the sequential TPU grid in fp32 VMEM accumulator
outputs. It replaces ``ops.layers.layernorm`` inside the ViT/text encoder blocks when
the shapes tile (see :func:`fused_layernorm_supported`); the module-level fallback is
the plain XLA implementation, which is also the CPU/test path.

Replaces the reference's torch ``nn.LayerNorm`` inside HF SigLIP
(vision/text encoder layers; reference loads the towers at
Stage0/train_vision_encoder_stage0.py:462-466) — same math, eps inside the rsqrt.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from projectiontrainer_tpu.ops import layers as L

# row-block: 512 rows × D lanes per grid step keeps VMEM well under budget at
# D≈1152 (512×1152×4B = 2.4 MB fp32 working set) while amortizing grid overhead
_BLOCK_ROWS = 512


def fused_layernorm_supported(x) -> bool:
    """Gate: single-device TPU, 2-D+ with last dim a lane multiple, bf16/f32 input.

    Multi-device meshes fall back to the XLA implementation (a bare pallas_call is
    opaque to GSPMD and would force a gather; LN is row-local so the fallback shards
    perfectly) — mirroring the single-device Pallas gate in ops/flash_attention.py.
    """
    if jax.default_backend() != "tpu" or jax.device_count() != 1:
        return False
    if x.dtype not in (jnp.bfloat16, jnp.float32):
        return False
    d = x.shape[-1]
    rows = 1
    for s in x.shape[:-1]:
        rows *= s
    return d % 128 == 0 and rows % 8 == 0


# ---------------------------------------------------------------------------- forward


def _fwd_kernel(x_ref, scale_ref, bias_ref, o_ref, *, eps):
    x = x_ref[...].astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    xhat = xc * rstd
    y = xhat * scale_ref[...].astype(jnp.float32) + bias_ref[...].astype(jnp.float32)
    o_ref[...] = y.astype(o_ref.dtype)


def _fwd(x, scale, bias, *, eps, interpret=False):
    rows, d = x.shape
    blk = min(_BLOCK_ROWS, rows)
    grid = pl.cdiv(rows, blk)
    return pl.pallas_call(
        partial(_fwd_kernel, eps=eps),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((blk, d), lambda i: (i, 0)),
            pl.BlockSpec((1, d), lambda i: (0, 0)),
            pl.BlockSpec((1, d), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((blk, d), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((rows, d), x.dtype),
        interpret=interpret,
    )(x, scale.reshape(1, d), bias.reshape(1, d))


# ---------------------------------------------------------------------------- backward


def _bwd_kernel(x_ref, dy_ref, scale_ref,
                dx_ref, dscale_ref, dbias_ref, *, eps, n_valid_rows, blk):
    i = pl.program_id(0)
    x = x_ref[...].astype(jnp.float32)
    dy = dy_ref[...].astype(jnp.float32)
    # recompute the row stats instead of saving them: the bwd reads x anyway, so
    # this costs VPU only and keeps the residual set to {x, scale} (fits the
    # stage-0 batch-16 HBM budget where saved per-row stats + a second fwd output
    # tipped it over)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    xhat = xc * rstd
    d = x.shape[-1]

    # rows past the logical end (last ragged block) must not pollute dscale/dbias;
    # padded-row x/mean/rstd are uninitialized (possibly NaN), so mask PRODUCTS,
    # not just dy — 0 * NaN is still NaN
    row0 = i * blk
    valid = (jax.lax.broadcasted_iota(jnp.int32, (blk, 1), 0) + row0) < n_valid_rows

    # dx = rstd * (g - mean(g) - xhat * mean(g * xhat)),  g = dy * scale
    g = dy * scale_ref[...].astype(jnp.float32)
    gm = jnp.mean(g, axis=-1, keepdims=True)
    gxm = jnp.mean(g * xhat, axis=-1, keepdims=True)
    dx_ref[...] = (rstd * (g - gm - xhat * gxm)).astype(dx_ref.dtype)

    # parameter grads: accumulate across the sequential grid
    part_dscale = jnp.sum(jnp.where(valid, dy * xhat, 0.0), axis=0, keepdims=True)
    part_dbias = jnp.sum(jnp.where(valid, dy, 0.0), axis=0, keepdims=True)

    @pl.when(i == 0)
    def _init():
        dscale_ref[...] = jnp.zeros_like(dscale_ref)
        dbias_ref[...] = jnp.zeros_like(dbias_ref)

    dscale_ref[...] += part_dscale
    dbias_ref[...] += part_dbias


def _bwd(x, dy, scale, *, eps, interpret=False):
    rows, d = x.shape
    blk = min(_BLOCK_ROWS, rows)
    grid = pl.cdiv(rows, blk)
    dx, dscale, dbias = pl.pallas_call(
        partial(_bwd_kernel, eps=eps, n_valid_rows=rows, blk=blk),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((blk, d), lambda i: (i, 0)),
            pl.BlockSpec((blk, d), lambda i: (i, 0)),
            pl.BlockSpec((1, d), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((blk, d), lambda i: (i, 0)),
            pl.BlockSpec((1, d), lambda i: (0, 0)),
            pl.BlockSpec((1, d), lambda i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rows, d), x.dtype),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
        ],
        interpret=interpret,
    )(x, dy, scale.reshape(1, d))
    return dx, dscale.reshape(d), dbias.reshape(d)


# ---------------------------------------------------------------------------- public op


@partial(jax.custom_vjp, nondiff_argnames=("eps", "interpret"))
def _fused_ln(x, scale, bias, eps, interpret):
    return _fwd(x, scale, bias, eps=eps, interpret=interpret)


def _fused_ln_fwd(x, scale, bias, eps, interpret):
    out = _fwd(x, scale, bias, eps=eps, interpret=interpret)
    return out, (x, scale)


def _fused_ln_bwd(eps, interpret, residuals, dy):
    x, scale = residuals
    dx, dscale, dbias = _bwd(x, dy, scale, eps=eps, interpret=interpret)
    return dx, dscale.astype(scale.dtype), dbias.astype(scale.dtype)


_fused_ln.defvjp(_fused_ln_fwd, _fused_ln_bwd)


def layernorm(p, x, *, eps: float = 1e-6, interpret: bool = False):
    """Drop-in for :func:`ops.layers.layernorm`; Pallas on TPU, XLA elsewhere.

    ``p`` = {"scale": [D], "bias": [D]}; normalizes over the last axis in fp32.
    """
    if not fused_layernorm_supported(x):
        return L.layernorm(p, x, eps=eps)
    shape = x.shape
    x2 = x.reshape(-1, shape[-1])
    out = _fused_ln(x2, p["scale"], p["bias"], eps, interpret)
    return out.reshape(shape)
