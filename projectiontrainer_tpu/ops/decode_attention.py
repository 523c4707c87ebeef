"""Single-token decode attention over a split prefix/generated KV cache.

Serving/eval decode (replacing the reference's HF ``model.generate`` KV-cache path,
reference: Stage2/inference_vqa_stage2.py:271-277, Stage2/trainer.py:604-614) keeps TWO
caches instead of one [B*beams, P+G] buffer:

- a **prefix** cache ``[B, Hkv, P, D]`` — the visual+question prefix is identical for
  every beam of a sample, so it is stored once per sample, never reordered on beam
  selection, and each (batch, kv-head) program reads it ONCE for all beams;
- a **generated** cache ``[B*beams, Hkv, G, D]`` — small (G = max_new_tokens), the only
  part the per-step beam reorder has to gather.

Caches are stored HEAD-MAJOR (the kv-head axis before the sequence axis), unlike the
training/prefill cache's ``[B, T, Hkv, D]``: Mosaic requires a Pallas block's trailing
two dims to be (8,128)-tiled or full, so the per-(batch, kv-head) grid must index the
head axis OUTSIDE the trailing ``[seq, head_dim]`` tile. ``split_cache`` pays the
transpose once at prefill→decode handoff; per-step writes are a singleton swap.

Why: profiling the monolithic-cache beam loop on TPU showed ~45% of the 5.3 ms step was
attention waste — XLA lowers the Tq=1 QK^T/AV contractions to fp32 VPU multiply-reduce
fusions, materializing an fp32 convert of the whole bf16 cache every step, plus
memory-space staging copies and a full-cache (prefix included) gather on reorder. The
Pallas kernel here reads the caches in bf16 exactly once, folds all beams' query heads
into one MXU contraction against the shared prefix, and does the fp32 softmax in VMEM.

The XLA fallback implements the identical math (bf16 QK^T/AV on whatever the platform
offers, fp32 softmax) and is fully partitionable — multi-device generation (sharded KV
heads on the model axis) uses it, mirroring ops/flash_attention.py's single-device
Pallas gate.

Mask semantics match ops/attention.py's monolithic-cache decode step exactly: keys are
masked by the per-sample prefix padding mask, generated keys by ``j <= t``, and sliding
windows operate in cache-slot space (slot of the current query is ``prefix_len + t``).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from projectiontrainer_tpu.ops.attention import NEG_INF


def _shapes(q, kp, kg):
    r, hq, d = q.shape
    b, hkv, p, _ = kp.shape
    g = kg.shape[2]
    if r % b:
        raise ValueError(f"rows {r} not a multiple of batch {b}")
    nb = r // b
    n_rep = hq // hkv
    return r, hq, d, b, p, hkv, g, nb, n_rep


def pallas_decode_supported(q, kp, kg) -> bool:
    """Shape/dtype gate for the fused kernel (everything else → XLA fallback)."""
    r, hq, d, b, p, hkv, g, nb, n_rep = _shapes(q, kp, kg)
    if q.dtype != jnp.bfloat16 or kp.dtype != jnp.bfloat16 or kg.dtype != jnp.bfloat16:
        return False
    if d % 128 or p % 128 or g % 128:
        return False
    if hq % hkv:
        return False
    # VMEM budget: prefix K+V + all beams' gen K+V per program, plus fp32 scores
    vmem = 2 * (p * d + nb * g * d) * 2 + nb * n_rep * (p + g) * 4
    return vmem < 12 * 1024 * 1024


# ---------------------------------------------------------------------------- XLA path


def _xla_decode_attention(q, kp, vp, kg, vg, prefix_mask, t, prefix_len, scale, window):
    r, hq, d, b, p, hkv, g, nb, n_rep = _shapes(q, kp, kg)
    out_dtype = q.dtype
    if q.dtype == jnp.bfloat16 and jax.default_backend() == "cpu":
        # XLA:CPU's dot runtime rejects bf16 x bf16 -> f32 for the head-major
        # batched contractions below; upcast there (the CPU path is tests-only)
        q, kp, vp, kg, vg = (x.astype(jnp.float32) for x in (q, kp, vp, kg, vg))
    q5 = q.reshape(b, nb, hkv, n_rep, d)
    kg5 = kg.reshape(b, nb, hkv, g, d)
    vg5 = vg.reshape(b, nb, hkv, g, d)

    sp = jnp.einsum("bnkrd,bkpd->bnkrp", q5, kp,
                    preferred_element_type=jnp.float32) * scale
    sg = jnp.einsum("bnkrd,bnkgd->bnkrg", q5, kg5,
                    preferred_element_type=jnp.float32) * scale

    pidx = jnp.arange(p)
    validp = prefix_mask.astype(bool)[:, None, None, None, :]
    gidx = jnp.arange(g)
    validg = gidx <= t
    if window is not None:
        q_slot = prefix_len + t
        validp = validp & (pidx > q_slot - window)
        validg = validg & (gidx > t - window)
    sp = jnp.where(validp, sp, NEG_INF)
    sg = jnp.where(validg[None, None, None, None, :], sg, NEG_INF)

    s = jnp.concatenate([sp, sg], axis=-1)
    probs = jax.nn.softmax(s, axis=-1).astype(q.dtype)
    pp, pg = probs[..., :p], probs[..., p:]
    out = jnp.einsum("bnkrp,bkpd->bnkrd", pp, vp, preferred_element_type=jnp.float32)
    out = out + jnp.einsum("bnkrg,bnkgd->bnkrd", pg, vg5,
                           preferred_element_type=jnp.float32)
    return out.astype(out_dtype).reshape(r, hq, d)


# ---------------------------------------------------------------------------- kernel


def _decode_kernel(s_ref, q_ref, kp_ref, vp_ref, kg_ref, vg_ref, pm_ref, o_ref, *,
                   scale, window, nb, n_rep, d, p_pad, g_pad):
    t = s_ref[0]
    q_slot = s_ref[1]  # prefix_len + t, for slot-space sliding windows
    m = nb * n_rep

    q = q_ref[0, :, 0, :, :].reshape(m, d)
    kp = kp_ref[0, 0]  # [P_pad, D]

    # all beams × all heads of this kv group against the shared prefix: one MXU pass
    sp = jax.lax.dot_general(
        q, kp, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # [M, P_pad]
    pidx = jax.lax.broadcasted_iota(jnp.int32, (1, p_pad), 1)
    validp = pm_ref[0, 0, :][None, :] > 0
    if window is not None:
        validp &= pidx > q_slot - window
    sp = jnp.where(validp, sp, NEG_INF)

    gidx = jax.lax.broadcasted_iota(jnp.int32, (1, g_pad), 1)
    validg = gidx <= t
    if window is not None:
        validg &= gidx > t - window
    sgs = []
    for bm in range(nb):  # static: each beam against its own generated keys
        qb = q_ref[0, bm, 0, :, :]  # [n_rep, D]
        kgb = kg_ref[0, bm, 0]  # [G_pad, D]
        sg = jax.lax.dot_general(
            qb, kgb, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        sgs.append(jnp.where(validg, sg, NEG_INF))
    sg = jnp.concatenate(sgs, axis=0)  # rows beam-major, matching q's reshape

    s = jnp.concatenate([sp, sg], axis=1)  # [M, P_pad + G_pad]
    mx = jnp.max(s, axis=1, keepdims=True)
    e = jnp.exp(s - mx)
    probs = (e / jnp.sum(e, axis=1, keepdims=True)).astype(q.dtype)

    vp = vp_ref[0, 0]
    out_p = jax.lax.dot_general(
        probs[:, :p_pad], vp, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [M, D]
    rows = []
    for bm in range(nb):
        vgb = vg_ref[0, bm, 0]
        og = jax.lax.dot_general(
            probs[bm * n_rep:(bm + 1) * n_rep, p_pad:], vgb,
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )
        rows.append(out_p[bm * n_rep:(bm + 1) * n_rep] + og)
    out = jnp.concatenate(rows, axis=0).astype(o_ref.dtype)
    o_ref[0, :, 0, :, :] = out.reshape(nb, n_rep, d)


def _pallas_decode_attention(q, kp, vp, kg, vg, prefix_mask, t, prefix_len, scale,
                             window, interpret=False):
    r, hq, d, b, p, hkv, g, nb, n_rep = _shapes(q, kp, kg)
    out_dtype = q.dtype
    if interpret:
        # interpret mode executes the kernel body on the host platform, whose dot
        # runtime rejects bf16 operands (same limit as the CPU fallback)
        q, kp, vp, kg, vg = (x.astype(jnp.float32) for x in (q, kp, vp, kg, vg))
    q5 = q.reshape(b, nb, hkv, n_rep, d)
    kg5 = kg.reshape(b, nb, hkv, g, d)
    vg5 = vg.reshape(b, nb, hkv, g, d)
    pm = prefix_mask.astype(jnp.int32).reshape(b, 1, p)
    t = jnp.asarray(t, jnp.int32)
    scalars = jnp.stack([t, prefix_len + t])

    kernel = partial(
        _decode_kernel, scale=scale, window=window, nb=nb, n_rep=n_rep, d=d,
        p_pad=p, g_pad=g,
    )
    # Mosaic legality: every block's trailing two dims are the FULL array dims —
    # the (batch, kv-head) grid indexes only leading axes (head-major cache layout).
    out = pl.pallas_call(
        kernel,
        grid=(b, hkv),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, nb, 1, n_rep, d), lambda bi, hi: (bi, 0, hi, 0, 0)),
            pl.BlockSpec((1, 1, p, d), lambda bi, hi: (bi, hi, 0, 0)),
            pl.BlockSpec((1, 1, p, d), lambda bi, hi: (bi, hi, 0, 0)),
            pl.BlockSpec((1, nb, 1, g, d), lambda bi, hi: (bi, 0, hi, 0, 0)),
            pl.BlockSpec((1, nb, 1, g, d), lambda bi, hi: (bi, 0, hi, 0, 0)),
            pl.BlockSpec((1, 1, p), lambda bi, hi: (bi, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, nb, 1, n_rep, d), lambda bi, hi: (bi, 0, hi, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, nb, hkv, n_rep, d), out_dtype),
        interpret=interpret,
    )(scalars, q5, kp, vp, kg5, vg5, pm)
    return out.reshape(r, hq, d)


# ---------------------------------------------------------------------------- dispatch


def decode_attention(
    q,             # [R, Hq, D] — this step's queries, R = B * beams rows
    kp, vp,        # [B, Hkv, P, D] — shared prefix cache (P padded to 128 on TPU)
    kg, vg,        # [R, Hkv, G, D] — per-row generated cache, slot t just written
    *,
    prefix_mask,   # [B, P] bool/int — prefix padding mask
    t,             # scalar int32 — 0-based generation step (gen keys j <= t live)
    prefix_len: int,          # REAL (unpadded) prefix length, for slot-space windows
    scale: float,
    window: Optional[int] = None,
    impl: str = "xla",        # 'flash' → fused Pallas kernel when supported
    interpret: bool = False,
):
    """Returns [R, Hq, D] attention output in ``q.dtype``."""
    if (
        impl == "flash"
        and jax.device_count() == 1
        and pallas_decode_supported(q, kp, kg)
    ):
        return _pallas_decode_attention(
            q, kp, vp, kg, vg, prefix_mask, t, prefix_len, scale, window,
            interpret=interpret,
        )
    return _xla_decode_attention(
        q, kp, vp, kg, vg, prefix_mask, t, prefix_len, scale, window
    )
