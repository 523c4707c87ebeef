"""Pallas TPU flash attention: tiled online-softmax attention, forward + custom VJP.

The framework's native kernel deliverable (SURVEY §2.4: the reference's conditional
flash-attention-2 CUDA dependency at Stage2/train_vqa_stage2.py:186 becomes a
Mosaic-compiled Pallas kernel). Design:

- Internal layout [B, H, T, D] so every block's trailing (T-block, D) dims tile the
  TPU (8, 128) constraint; the public API stays [B, T, H, D] with cheap transposes.
- Grid (batch, q_head, q_blocks); K/V for the (batch, kv_head) pair live in VMEM whole
  (our sequences are <= ~1.6k tokens: 575 visual + 1024 text — SURVEY §5.7; K+V at
  D=256 bf16 is ~1.6MB, far under the ~16MB VMEM budget) and stream through the online
  max/denominator recurrence in BK-chunks — no [T, T] scores ever reach HBM.
- GQA: q head h reads kv head h // (Hq // Hkv) via the BlockSpec index map.
- Masking: causal, sliding window, per-batch KV padding, composed from broadcasted
  iotas; fully-masked rows produce ZERO output (defined semantics shared with the XLA
  path); causal grids skip fully-above-diagonal KV blocks.
- Backward: flash-attention-2 recomputation — forward also writes per-row logsumexp;
  kernel 1 accumulates dK/dV (grid over kv blocks), kernel 2 accumulates dQ.
- Blockwise structure means longer sequences are a block-count change, not a redesign.

Falls back to ops/attention.py's XLA path off-TPU or for unsupported shapes
(``flash_attention_supported``).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

NEG_INF = -2.3819763e38
LOG2E = 1.4426950408889634  # softmax runs in the exp2 domain (q pre-scaled by
                            # scale*log2e): exp2 is one VPU transcendental and the
                            # per-score `* scale` multiply disappears entirely

DEFAULT_BQ = 256
DEFAULT_BK = 256


def flash_attention_supported(q, k, v, *, window=None) -> bool:
    """Self-attention shapes only (training/prefill): same q/kv length, no cache
    decode. Any head_dim (non-64-multiples are zero-padded inside flash_attention)."""
    if jax.default_backend() != "tpu":
        return False
    b, tq, hq, d = q.shape
    _, tk, hkv, _ = k.shape
    if tq != tk:
        return False
    if hq % hkv != 0:
        return False
    # any head_dim is supported: non-64-multiples are zero-padded inside
    # flash_attention (see its docstring); tiny dims still win because the XLA
    # path's fp32 [B,H,T,T] score materialization dominates at training lengths
    return True


def _blocks(t: int, b: int) -> int:
    return -(-t // b)


def _pick_blocks(t: int, bq: int, bk: int) -> tuple[int, int, int]:
    bq_ = min(bq, max(8, 1 << (t - 1).bit_length()))
    bk_ = min(bk, bq_)
    blk = max(bq_, bk_)
    t_pad = _blocks(t, blk) * blk
    return bq_, bk_, t_pad


def _pad_to(x, t_pad, axis):
    pad = t_pad - x.shape[axis]
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


# ------------------------------------------------------------------- forward kernel


def _fwd_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, l_ref, *, causal, window,
                bq, bk, t_real, use_mask, masked):
    qi = pl.program_id(2)
    # MXU inputs stay in their NATIVE dtype (bf16 in training) with fp32 accumulation
    # via preferred_element_type — upcasting bf16 inputs to fp32 before the dot gains
    # nothing numerically (the values are already bf16) but forces the ~8x-slower fp32
    # MXU path; measured 27-layer so400m fwd: 192ms -> ~40ms. Matches the XLA path,
    # which also multiplies bf16 and casts probs to q.dtype before PV.
    #
    # VPU economy: q arrives pre-scaled by scale*LOG2E so the softmax runs in the
    # exp2 domain with no per-score multiply; when ``masked`` is False (full
    # self-attention on unpadded sequences — the SigLIP towers) all iota/compare/
    # where work is compiled out. Head dims that don't tile the 128 lane granule
    # (so400m's 72) are NOT padded by the caller: Mosaic zero-fills the lane
    # remainder on load (validated on-chip), so the MXU pass count is identical
    # but HBM traffic and the layout transposes shrink to the logical size.
    q = q_ref[0, 0]  # [BQ, D]
    t_pad = k_ref.shape[2]
    n_kv = t_pad // bk
    d = q_ref.shape[3]

    if masked:
        q_pos = qi * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0)

    m0 = jnp.full((bq, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((bq, 1), jnp.float32)
    acc0 = jnp.zeros((bq, d), jnp.float32)

    def body(j, carry):
        m, l, acc = carry
        k_blk = k_ref[0, 0, pl.ds(j * bk, bk), :]  # [BK, D]
        v_blk = v_ref[0, 0, pl.ds(j * bk, bk), :]
        s = jax.lax.dot_general(
            q, k_blk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [BQ, BK] fp32, log2-domain (q pre-scaled)

        if masked:
            k_pos = j * bk + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
            valid = k_pos < t_real
            if causal:
                valid &= k_pos <= q_pos
            if window is not None:
                valid &= k_pos > q_pos - window
            if use_mask:
                valid &= (mask_ref[0, 0, pl.ds(j * bk, bk)] > 0)[None, :]
            s = jnp.where(valid, s, NEG_INF)

        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        if masked:
            # explicit zero for invalid entries: fully-masked rows end with l=0 ->
            # output 0 (NEG_INF is finite, so s - m_new stays NaN-free)
            p = jnp.where(valid, jnp.exp2(s - m_new), 0.0)
        else:
            p = jnp.exp2(s - m_new)
        correction = jnp.exp2(m - m_new)
        l = l * correction + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * correction + jax.lax.dot_general(
            p.astype(v_blk.dtype), v_blk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return m_new, l, acc_new

    if causal:
        n_needed = jnp.minimum(n_kv, pl.cdiv((qi + 1) * bq, bk))
        m, l, acc = jax.lax.fori_loop(0, n_needed, body, (m0, l0, acc0))
    else:
        m, l, acc = jax.lax.fori_loop(0, n_kv, body, (m0, l0, acc0))

    l_safe = jnp.maximum(l, 1e-30)
    o_ref[0, 0] = (acc / l_safe).astype(o_ref.dtype)
    # lse reported in natural-log units (m is log2-domain)
    l_ref[0, 0, 0, :] = m[:, 0] / LOG2E + jnp.log(l_safe[:, 0])


def _fwd(q, k, v, kv_mask, *, scale, causal, window, bq, bk, interpret=False):
    """q/k/v in [B, H, T, D] (internal layout). Returns (out BHTD, lse [B,H,1,T])."""
    b, hq, t, d = q.shape
    hkv = k.shape[1]
    n_rep = hq // hkv
    bq_, bk_, t_pad = _pick_blocks(t, bq, bk)

    # softmax runs in the exp2 domain: fold scale * log2(e) into q once (fp32 mul,
    # cast back) instead of scaling every [BQ, BK] score block on the VPU
    q = (q.astype(jnp.float32) * (scale * LOG2E)).astype(q.dtype)

    qp = _pad_to(q, t_pad, 2)
    kp = _pad_to(k, t_pad, 2)
    vp = _pad_to(v, t_pad, 2)

    use_mask = kv_mask is not None
    masked = use_mask or causal or (window is not None) or (t_pad != t)
    mask_arr = (
        _pad_to(kv_mask.astype(jnp.int32), t_pad, 1) if use_mask
        else jnp.ones((b, t_pad), jnp.int32)
    )[:, None, :]  # [B, 1, T]

    grid = (b, hq, _blocks(t_pad, bq_))
    kernel = functools.partial(
        _fwd_kernel, causal=causal, window=window, bq=bq_, bk=bk_,
        t_real=t, use_mask=use_mask, masked=masked,
    )
    out, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, bq_, d), lambda bi, hi, qi: (bi, hi, qi, 0)),
            pl.BlockSpec((1, 1, t_pad, d), lambda bi, hi, qi: (bi, hi // n_rep, 0, 0)),
            pl.BlockSpec((1, 1, t_pad, d), lambda bi, hi, qi: (bi, hi // n_rep, 0, 0)),
            pl.BlockSpec((1, 1, t_pad), lambda bi, hi, qi: (bi, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, bq_, d), lambda bi, hi, qi: (bi, hi, qi, 0)),
            pl.BlockSpec((1, 1, 1, bq_), lambda bi, hi, qi: (bi, hi, 0, qi)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(qp.shape, q.dtype),
            jax.ShapeDtypeStruct((b, hq, 1, t_pad), jnp.float32),
        ],
        interpret=interpret,
    )(qp, kp, vp, mask_arr)
    return out[:, :, :t], lse[..., :t]


# ------------------------------------------------------------------- backward


def _bwd_dkv_kernel(q_ref, k_ref, v_ref, mask_ref, do_ref, lse_ref, delta_ref,
                    dk_ref, dv_ref, *, scale, causal, window, bq, bk, t_real,
                    use_mask, masked):
    # exp2-domain recompute (see _fwd_kernel): q arrives pre-scaled by scale*LOG2E
    # and lse by LOG2E, so p = exp2(s2 - lse2) with no per-score multiplies; the
    # chain-rule `* scale` lands once on the [BK, D] accumulator instead
    # (dk_true = ds^T q = (ds2^T q2) / LOG2E since q2 = q * scale * LOG2E and
    # ds = ds2 * scale).
    ki = pl.program_id(2)
    k_blk = k_ref[0, 0]   # [BK, D] native dtype (see _fwd_kernel dtype note)
    v_blk = v_ref[0, 0]
    t_pad = q_ref.shape[2]
    n_q = t_pad // bq
    d = q_ref.shape[3]
    if masked:
        k_pos = ki * bk + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
    if use_mask:
        kv_valid = (mask_ref[0, 0, pl.ds(ki * bk, bk)] > 0)[None, :]

    dk0 = jnp.zeros((bk, d), jnp.float32)
    dv0 = jnp.zeros((bk, d), jnp.float32)

    def body(j, carry):
        dk, dv = carry
        q_blk = q_ref[0, 0, pl.ds(j * bq, bq), :]
        do_blk = do_ref[0, 0, pl.ds(j * bq, bq), :]
        lse = lse_ref[0, 0, 0, pl.ds(j * bq, bq)]
        delta = delta_ref[0, 0, 0, pl.ds(j * bq, bq)]

        s = jax.lax.dot_general(
            q_blk, k_blk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [BQ, BK] log2-domain
        if masked:
            q_pos = j * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0)
            valid = (k_pos < t_real) & (q_pos < t_real)
            if causal:
                valid &= k_pos <= q_pos
            if window is not None:
                valid &= k_pos > q_pos - window
            if use_mask:
                valid &= kv_valid
            p = jnp.where(valid, jnp.exp2(s - lse[:, None]), 0.0)
        else:
            p = jnp.exp2(s - lse[:, None])

        dv = dv + jax.lax.dot_general(
            p.astype(do_blk.dtype), do_blk, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dp = jax.lax.dot_general(
            do_blk, v_blk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = p * (dp - delta[:, None])
        dk = dk + jax.lax.dot_general(
            ds.astype(q_blk.dtype), q_blk, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return dk, dv

    if causal:
        j_start = (ki * bk) // bq
        dk, dv = jax.lax.fori_loop(j_start, n_q, body, (dk0, dv0))
    else:
        dk, dv = jax.lax.fori_loop(0, n_q, body, (dk0, dv0))
    dk_ref[0, 0] = (dk * (1.0 / LOG2E)).astype(dk_ref.dtype)
    dv_ref[0, 0] = dv.astype(dv_ref.dtype)


def _bwd_dq_kernel(q_ref, k_ref, v_ref, mask_ref, do_ref, lse_ref, delta_ref, dq_ref,
                   *, scale, causal, window, bq, bk, t_real, use_mask, masked):
    # exp2-domain recompute; the chain-rule `* scale` lands once on the [BQ, D]
    # accumulator (dq_true = ds k = scale * (ds2 k)) — see _bwd_dkv_kernel.
    qi = pl.program_id(2)
    q_blk = q_ref[0, 0]  # native dtype (see _fwd_kernel dtype note), pre-scaled
    do_blk = do_ref[0, 0]
    lse = lse_ref[0, 0, 0, :]
    delta = delta_ref[0, 0, 0, :]
    t_pad = k_ref.shape[2]
    n_kv = t_pad // bk
    d = q_ref.shape[3]
    if masked:
        q_pos = qi * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0)

    dq0 = jnp.zeros((bq, d), jnp.float32)

    def body(j, dq):
        k_blk = k_ref[0, 0, pl.ds(j * bk, bk), :]
        v_blk = v_ref[0, 0, pl.ds(j * bk, bk), :]
        s = jax.lax.dot_general(
            q_blk, k_blk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # log2-domain
        if masked:
            k_pos = j * bk + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
            valid = k_pos < t_real
            if causal:
                valid &= k_pos <= q_pos
            if window is not None:
                valid &= k_pos > q_pos - window
            if use_mask:
                valid &= (mask_ref[0, 0, pl.ds(j * bk, bk)] > 0)[None, :]
            p = jnp.where(valid, jnp.exp2(s - lse[:, None]), 0.0)
        else:
            p = jnp.exp2(s - lse[:, None])
        dp = jax.lax.dot_general(
            do_blk, v_blk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = p * (dp - delta[:, None])
        return dq + jax.lax.dot_general(
            ds.astype(k_blk.dtype), k_blk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    if causal:
        n_needed = jnp.minimum(n_kv, pl.cdiv((qi + 1) * bq, bk))
        dq = jax.lax.fori_loop(0, n_needed, body, dq0)
    else:
        dq = jax.lax.fori_loop(0, n_kv, body, dq0)
    dq_ref[0, 0] = (dq * scale).astype(dq_ref.dtype)


def _bwd(q, k, v, kv_mask, out, lse, do, *, scale, causal, window, bq, bk,
         interpret=False):
    """All tensors in [B, H, T, D]; lse [B, H, 1, T]."""
    b, hq, t, d = q.shape
    hkv = k.shape[1]
    n_rep = hq // hkv
    bq_, bk_, t_pad = _pick_blocks(t, bq, bk)

    # exp2-domain recompute: pre-scale q and lse once (see _fwd)
    q = (q.astype(jnp.float32) * (scale * LOG2E)).astype(q.dtype)
    lse = lse * LOG2E

    qp, dop, op = (_pad_to(x, t_pad, 2) for x in (q, do, out))
    kp, vp = (_pad_to(x, t_pad, 2) for x in (k, v))
    lsep = _pad_to(lse, t_pad, 3)
    use_mask = kv_mask is not None
    masked = use_mask or causal or (window is not None) or (t_pad != t)
    mask_arr = (
        _pad_to(kv_mask.astype(jnp.int32), t_pad, 1) if use_mask
        else jnp.ones((b, t_pad), jnp.int32)
    )[:, None, :]

    delta = jnp.sum(
        op.astype(jnp.float32) * dop.astype(jnp.float32), axis=-1, keepdims=True
    ).swapaxes(2, 3)  # [B, H, 1, T]

    common = dict(scale=scale, causal=causal, window=window, bq=bq_, bk=bk_,
                  t_real=t, use_mask=use_mask, masked=masked)

    dk_ex, dv_ex = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, **common),
        grid=(b, hq, _blocks(t_pad, bk_)),
        in_specs=[
            pl.BlockSpec((1, 1, t_pad, d), lambda bi, hi, ki: (bi, hi, 0, 0)),
            pl.BlockSpec((1, 1, bk_, d), lambda bi, hi, ki: (bi, hi // n_rep, ki, 0)),
            pl.BlockSpec((1, 1, bk_, d), lambda bi, hi, ki: (bi, hi // n_rep, ki, 0)),
            pl.BlockSpec((1, 1, t_pad), lambda bi, hi, ki: (bi, 0, 0)),
            pl.BlockSpec((1, 1, t_pad, d), lambda bi, hi, ki: (bi, hi, 0, 0)),
            pl.BlockSpec((1, 1, 1, t_pad), lambda bi, hi, ki: (bi, hi, 0, 0)),
            pl.BlockSpec((1, 1, 1, t_pad), lambda bi, hi, ki: (bi, hi, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, bk_, d), lambda bi, hi, ki: (bi, hi, ki, 0)),
            pl.BlockSpec((1, 1, bk_, d), lambda bi, hi, ki: (bi, hi, ki, 0)),
        ],
        out_shape=[
            # MHA (n_rep == 1, the SigLIP towers): write native dtype straight from
            # the kernel — no cross-head reduction, half the output HBM traffic.
            # GQA: fp32 extended outputs, reduced over the query-head groups below.
            jax.ShapeDtypeStruct((b, hq, t_pad, d),
                                 k.dtype if n_rep == 1 else jnp.float32),
            jax.ShapeDtypeStruct((b, hq, t_pad, d),
                                 v.dtype if n_rep == 1 else jnp.float32),
        ],
        interpret=interpret,
    )(qp, kp, vp, mask_arr, dop, lsep, delta)

    if n_rep == 1:
        dk, dv = dk_ex[:, :, :t], dv_ex[:, :, :t]
    else:
        dk = dk_ex.reshape(b, hkv, n_rep, t_pad, d).sum(axis=2)[:, :, :t].astype(k.dtype)
        dv = dv_ex.reshape(b, hkv, n_rep, t_pad, d).sum(axis=2)[:, :, :t].astype(v.dtype)

    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, **common),
        grid=(b, hq, _blocks(t_pad, bq_)),
        in_specs=[
            pl.BlockSpec((1, 1, bq_, d), lambda bi, hi, qi: (bi, hi, qi, 0)),
            pl.BlockSpec((1, 1, t_pad, d), lambda bi, hi, qi: (bi, hi // n_rep, 0, 0)),
            pl.BlockSpec((1, 1, t_pad, d), lambda bi, hi, qi: (bi, hi // n_rep, 0, 0)),
            pl.BlockSpec((1, 1, t_pad), lambda bi, hi, qi: (bi, 0, 0)),
            pl.BlockSpec((1, 1, bq_, d), lambda bi, hi, qi: (bi, hi, qi, 0)),
            pl.BlockSpec((1, 1, 1, bq_), lambda bi, hi, qi: (bi, hi, 0, qi)),
            pl.BlockSpec((1, 1, 1, bq_), lambda bi, hi, qi: (bi, hi, 0, qi)),
        ],
        out_specs=pl.BlockSpec((1, 1, bq_, d), lambda bi, hi, qi: (bi, hi, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((b, hq, t_pad, d), q.dtype),
        interpret=interpret,
    )(qp, kp, vp, mask_arr, dop, lsep, delta)[:, :, :t]

    return dq, dk, dv


# ------------------------------------------- merged-lane (transposeless) kernels
#
# The BHTD internal layout forces a real transpose at every kernel boundary: the
# QKV projections produce [B, T, H*D] and the custom-call's operand layout
# constraint materializes the swapaxes as copies — the r4 stage-0 op table shows
# 325 copies of bf16[16,1024,16,72] = 38.8 ms/step (8.3% of device time) running at
# ~38 GB/s (the (T,H) swap moves 144-byte rows with large strides; it cannot go
# faster). Reading [B, T, H, D] blocks directly is NOT lowerable: Mosaic tiles the
# last two block dims as (sublane, lane), so a per-head [T, D] tile from a T-major
# block is an "unsupported shape cast" (measured, r4). The layout that IS legal:
# merge heads into the LANE dimension — pad D to the 128 granule and view the
# tensor as [B, T, H*Dp]. Each head is then a static 128-aligned lane band, and
# per-head slices q_ref[:, h*Dp:(h+1)*Dp] are free; no transposes exist anywhere.
# The pad's zero lanes contribute 0 to every dot product, so results are exact;
# for D a 128-multiple the merge is a pure reshape (no pad, no extra bytes).
#
# Kernel structure: grid (batch, HEAD-GROUP, blocks) — the head-group axis tiles
# the lane dimension in G-head bands, so every VMEM block stays ~1 MB even with
# Mosaic's pipeline double-buffering (a whole-KV variant measured 20 MB of scoped
# VMEM and failed to compile). Kernels loop the G heads of their band; dK/dV and
# dQ accumulate into REVISITED output blocks across the innermost grid axis (the
# fused-LayerNorm bwd pattern). Scoped to non-causal, unmasked, no-window,
# exact-block shapes whose head dim is a 128-multiple (free merge). For D=72/64
# towers the pad-based variant was measured a net loss (layout ops ~= the
# transposes they replace + 1.78x kernel traffic + 1.4 GB HBM overflow at the
# stage-0 batch), so those keep the BHTD path.


def _lanes_dp(d: int) -> int:
    return -(-d // 128) * 128


def _merge_heads(x, dp):
    """[B, T, H, D] -> [B, T, H*dp] with the head dim padded into lane bands."""
    b, t, h, d = x.shape
    if d != dp:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, dp - d)))
    return x.reshape(b, t, h * dp)


def _lanes_group(heads: int, n_rep: int, dp: int) -> int:
    """Heads per grid band: ~512 lanes per block, a multiple of n_rep (so a band's
    KV heads are whole), dividing the head count."""
    g = max(1, 512 // dp)
    g = max(g, n_rep)
    while heads % g or g % n_rep:
        g -= 1
    return g


def _fwd_lanes_kernel(q_ref, k_ref, v_ref, o_ref, l_ref, *, group, n_rep, dp, bk):
    t = k_ref.shape[1]
    n_kv = t // bk
    bq = q_ref.shape[1]
    for h in range(group):
        q = q_ref[0, :, pl.ds(h * dp, dp)]  # [BQ, Dp] pre-scaled (exp2 domain)
        g = h // n_rep
        m0 = jnp.full((bq, 1), NEG_INF, jnp.float32)
        l0 = jnp.zeros((bq, 1), jnp.float32)
        acc0 = jnp.zeros((bq, dp), jnp.float32)

        def body(j, carry, q=q, g=g):
            m, l, acc = carry
            k_blk = k_ref[0, pl.ds(j * bk, bk), pl.ds(g * dp, dp)]
            v_blk = v_ref[0, pl.ds(j * bk, bk), pl.ds(g * dp, dp)]
            s = jax.lax.dot_general(
                q, k_blk, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
            p = jnp.exp2(s - m_new)
            correction = jnp.exp2(m - m_new)
            l = l * correction + jnp.sum(p, axis=-1, keepdims=True)
            acc = acc * correction + jax.lax.dot_general(
                p.astype(v_blk.dtype), v_blk, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return m_new, l, acc

        m, l, acc = jax.lax.fori_loop(0, n_kv, body, (m0, l0, acc0))
        l_safe = jnp.maximum(l, 1e-30)
        o_ref[0, :, pl.ds(h * dp, dp)] = (acc / l_safe).astype(o_ref.dtype)
        # lse in natural-log units, stored banded [B, n_bands, T, g] (lane h —
        # the band's OWN g-lane array keeps the block legal: a g-wide lane block
        # of a [B, T, H] array is neither 128-divisible nor the full dim)
        l_ref[0, 0, :, h] = m[:, 0] / LOG2E + jnp.log(l_safe[:, 0])


def _bwd_dkv_lanes_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                          dk_ref, dv_ref, *, group, n_rep, dp, bq):
    t = q_ref.shape[1]
    n_q = t // bq
    bk = k_ref.shape[1]
    for h in range(group):
        g = h // n_rep
        k_blk = k_ref[0, :, pl.ds(g * dp, dp)]      # [BK, Dp]
        v_blk = v_ref[0, :, pl.ds(g * dp, dp)]
        dk0 = jnp.zeros((bk, dp), jnp.float32)
        dv0 = jnp.zeros((bk, dp), jnp.float32)

        def body(j, carry, h=h, k_blk=k_blk, v_blk=v_blk):
            dk, dv = carry
            q_blk = q_ref[0, pl.ds(j * bq, bq), pl.ds(h * dp, dp)]  # pre-scaled
            do_blk = do_ref[0, pl.ds(j * bq, bq), pl.ds(h * dp, dp)]
            lse = lse_ref[0, 0, pl.ds(j * bq, bq), h]               # log2-domain
            delta = delta_ref[0, 0, pl.ds(j * bq, bq), h]
            s = jax.lax.dot_general(
                q_blk, k_blk, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            p = jnp.exp2(s - lse[:, None])
            dv = dv + jax.lax.dot_general(
                p.astype(do_blk.dtype), do_blk, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dp_ = jax.lax.dot_general(
                do_blk, v_blk, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            ds = p * (dp_ - delta[:, None])
            dk = dk + jax.lax.dot_general(
                ds.astype(q_blk.dtype), q_blk, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return dk, dv

        dk, dv = jax.lax.fori_loop(0, n_q, body, (dk0, dv0))
        dk_ref[0, :, pl.ds(h * dp, dp)] = (dk * (1.0 / LOG2E)).astype(dk_ref.dtype)
        dv_ref[0, :, pl.ds(h * dp, dp)] = dv.astype(dv_ref.dtype)


def _bwd_dq_lanes_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref,
                         *, group, n_rep, dp, scale, bk):
    t = k_ref.shape[1]
    n_kv = t // bk
    for h in range(group):
        g = h // n_rep
        q_blk = q_ref[0, :, pl.ds(h * dp, dp)]
        do_blk = do_ref[0, :, pl.ds(h * dp, dp)]
        lse = lse_ref[0, 0, :, h]
        delta = delta_ref[0, 0, :, h]
        bq = q_blk.shape[0]
        dq0 = jnp.zeros((bq, dp), jnp.float32)

        def body(j, dq, q_blk=q_blk, do_blk=do_blk, lse=lse, delta=delta, g=g):
            k_blk = k_ref[0, pl.ds(j * bk, bk), pl.ds(g * dp, dp)]
            v_blk = v_ref[0, pl.ds(j * bk, bk), pl.ds(g * dp, dp)]
            s = jax.lax.dot_general(
                q_blk, k_blk, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            p = jnp.exp2(s - lse[:, None])
            dp_ = jax.lax.dot_general(
                do_blk, v_blk, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            ds = p * (dp_ - delta[:, None])
            return dq + jax.lax.dot_general(
                ds.astype(k_blk.dtype), k_blk, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        dq = jax.lax.fori_loop(0, n_kv, body, dq0)
        dq_ref[0, :, pl.ds(h * dp, dp)] = (dq * scale).astype(dq_ref.dtype)


def _lanes_supported(b, t, hq, hkv, d, *, causal, window, kv_mask, bq, bk,
                     needs_bwd: bool = True) -> bool:
    """Gate for the merged-lane path: the unmasked exact-block tower case."""
    if causal or window is not None or kv_mask is not None:
        return False
    bq_, bk_, t_pad = _pick_blocks(t, bq, bk)
    if t_pad != t:
        return False  # block padding would need the masked path
    dp = _lanes_dp(d)
    # Only FREE merges qualify (d a 128-multiple: the [B,T,H,D]->[B,T,H*D]
    # reshape is layout-identical, so the path deletes every transpose at zero
    # cost). Padded merges were measured a NET LOSS on the stage-0 D=72 shape:
    # the pad/unpad layout ops cost about what the transposes did (~0.1 ms per
    # 37.7 MB tensor either way), kernel HBM traffic grows dp/d = 1.78x, and the
    # transient padded copies pushed the batch-16 step 1.4 GB over HBM. d=72 and
    # d=64 therefore stay on the BHTD path — see BENCH_EXTRA_r06
    # stage0_attention_layout_avenues for the full account.
    if dp != d:
        return False
    n_rep = hq // hkv
    g = _lanes_group(hq, n_rep, dp)
    gkv = g // n_rep
    # per-band blocks, double-buffered by the Mosaic pipeline (x2). The gate must
    # model the WORST kernel of the path, which under GQA is the backward dK/dV one:
    # it holds full-T q AND do blocks at g QUERY heads (n_rep x larger than the
    # forward's gkv-head k/v blocks) plus bk-sized k/v in and dk/dv out blocks
    # (fp32 when n_rep > 1) — advisor r4: shapes like t=4096,hq=8,hkv=2,d=128
    # passed the forward-only estimate while the backward hit ~17 MB scoped VMEM.
    fwd = (2 * t * gkv * dp + 2 * bq_ * g * dp) * 2 * 2
    out_bytes = 4 if n_rep > 1 else 2
    bwd_dkv = (
        2 * t * g * dp * 2            # q + do, full T at g query heads, bf16
        + 2 * bk_ * gkv * dp * 2      # k + v blocks
        + 2 * bk_ * g * dp * out_bytes  # dk + dv output blocks (fp32 under GQA)
        + 2 * t * g * 4               # lse + delta bands, fp32
    ) * 2
    # forward-only callers (cache-based decode/prefill — never differentiated)
    # are gated on the forward estimate alone: requiring the backward to fit
    # would push long-T inference prefills back to the transpose-heavy BHTD path
    # for no reason (advisor r5). needs_bwd=False callers MUST be outside any
    # grad trace: the lanes path still registers a VJP whose dK/dV kernel could
    # blow scoped VMEM on shapes admitted forward-only.
    return (max(fwd, bwd_dkv) if needs_bwd else fwd) < 10 * 1024 * 1024


def _fwd_lanes(qm, km, vm, *, heads, hkv, dp, bq, bk, interpret=False):
    """Merged-lane tensors [B, T, H*dp] -> (out merged, lse [B, T, Hq])."""
    b, t, _ = qm.shape
    n_rep = heads // hkv
    g = _lanes_group(heads, n_rep, dp)
    gkv = g // n_rep
    out, lse = pl.pallas_call(
        functools.partial(_fwd_lanes_kernel, group=g, n_rep=n_rep, dp=dp, bk=bk),
        grid=(b, heads // g, t // bq),
        in_specs=[
            pl.BlockSpec((1, bq, g * dp), lambda bi, hi, qi: (bi, qi, hi)),
            pl.BlockSpec((1, t, gkv * dp), lambda bi, hi, qi: (bi, 0, hi)),
            pl.BlockSpec((1, t, gkv * dp), lambda bi, hi, qi: (bi, 0, hi)),
        ],
        out_specs=[
            pl.BlockSpec((1, bq, g * dp), lambda bi, hi, qi: (bi, qi, hi)),
            pl.BlockSpec((1, 1, bq, g), lambda bi, hi, qi: (bi, hi, qi, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(qm.shape, qm.dtype),
            jax.ShapeDtypeStruct((b, heads // g, t, g), jnp.float32),
        ],
        interpret=interpret,
    )(qm, km, vm)
    # banded [B, n_bands, T, g] -> [B, T, Hq] (tiny fp32 tensor)
    return out, lse.transpose(0, 2, 1, 3).reshape(b, t, heads)


def _bwd_lanes(qm, km, vm, delta_bth, lse, dom, *, heads, hkv, dp, scale, bq, bk,
               interpret=False):
    """qm/km/vm/dom merged [B, T, H*dp]; lse/delta_bth [B, T, Hq] natural-log /
    fp32. Returns merged grads (dk/dv extended per QUERY head, fp32 — reduced over
    head groups outside)."""
    b, t, _ = qm.shape
    n_rep = heads // hkv
    g = _lanes_group(heads, n_rep, dp)
    gkv = g // n_rep
    nb = heads // g
    # banded [B, n_bands, T, g] layout for lse/delta (see _fwd_lanes lse note)
    lse2 = (lse * LOG2E).reshape(b, t, nb, g).transpose(0, 2, 1, 3)
    delta = delta_bth.reshape(b, t, nb, g).transpose(0, 2, 1, 3)

    # dK/dV: grid (b, head-group, kv_block) — the q sweep runs INSIDE the kernel
    # over full-T band blocks (~1 MB), accumulating in fp32 registers and writing
    # each output block ONCE (revisited fp32 HBM outputs measured +1.45 GB over
    # budget at the stage-0 shapes)
    dkv_dtype = km.dtype if n_rep == 1 else jnp.float32
    dk_ex, dv_ex = pl.pallas_call(
        functools.partial(_bwd_dkv_lanes_kernel, group=g, n_rep=n_rep, dp=dp, bq=bq),
        grid=(b, heads // g, t // bk),
        in_specs=[
            pl.BlockSpec((1, t, g * dp), lambda bi, hi, ki: (bi, 0, hi)),
            pl.BlockSpec((1, bk, gkv * dp), lambda bi, hi, ki: (bi, ki, hi)),
            pl.BlockSpec((1, bk, gkv * dp), lambda bi, hi, ki: (bi, ki, hi)),
            pl.BlockSpec((1, t, g * dp), lambda bi, hi, ki: (bi, 0, hi)),
            pl.BlockSpec((1, 1, t, g), lambda bi, hi, ki: (bi, hi, 0, 0)),
            pl.BlockSpec((1, 1, t, g), lambda bi, hi, ki: (bi, hi, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, bk, g * dp), lambda bi, hi, ki: (bi, ki, hi)),
            pl.BlockSpec((1, bk, g * dp), lambda bi, hi, ki: (bi, ki, hi)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, t, heads * dp), dkv_dtype),
            jax.ShapeDtypeStruct((b, t, heads * dp), dkv_dtype),
        ],
        interpret=interpret,
    )(qm, km, vm, dom, lse2, delta)

    # dQ: grid (b, head-group, q_block) — kv sweep inside, one write per block
    dq = pl.pallas_call(
        functools.partial(_bwd_dq_lanes_kernel, group=g, n_rep=n_rep, dp=dp,
                          scale=scale, bk=bk),
        grid=(b, heads // g, t // bq),
        in_specs=[
            pl.BlockSpec((1, bq, g * dp), lambda bi, hi, qi: (bi, qi, hi)),
            pl.BlockSpec((1, t, gkv * dp), lambda bi, hi, qi: (bi, 0, hi)),
            pl.BlockSpec((1, t, gkv * dp), lambda bi, hi, qi: (bi, 0, hi)),
            pl.BlockSpec((1, bq, g * dp), lambda bi, hi, qi: (bi, qi, hi)),
            pl.BlockSpec((1, 1, bq, g), lambda bi, hi, qi: (bi, hi, qi, 0)),
            pl.BlockSpec((1, 1, bq, g), lambda bi, hi, qi: (bi, hi, qi, 0)),
        ],
        out_specs=pl.BlockSpec((1, bq, g * dp), lambda bi, hi, qi: (bi, qi, hi)),
        out_shape=jax.ShapeDtypeStruct((b, t, heads * dp), qm.dtype),
        interpret=interpret,
    )(qm, km, vm, dom, lse2, delta)

    return dq, dk_ex, dv_ex


@functools.partial(
    jax.custom_vjp, nondiff_argnames=("scale", "bq", "bk", "interpret")
)
def _flash_lanes(q, k, v, scale, bq, bk, interpret):
    out, _ = _flash_lanes_fwd(q, k, v, scale, bq, bk, interpret)
    return out


def _flash_lanes_fwd(q, k, v, scale, bq, bk, interpret):
    b, t, hq, d = q.shape
    hkv = k.shape[2]
    dp = _lanes_dp(d)
    qs = (q.astype(jnp.float32) * (scale * LOG2E)).astype(q.dtype)  # exp2 domain
    qm = _merge_heads(qs, dp)
    km = _merge_heads(k, dp)
    vm = _merge_heads(v, dp)
    om, lse = _fwd_lanes(qm, km, vm, heads=hq, hkv=hkv, dp=dp, bq=bq, bk=bk,
                         interpret=interpret)
    out = om.reshape(b, t, hq, dp)[..., :d]
    # residuals hold the UNPADDED public tensors: keeping the merged (dp-padded)
    # copies alive through the whole forward costs +4 GB at the stage-0 shapes
    # (27 layers x 3 tensors x 78% pad, remat off); bwd re-merges for the price
    # of three contiguous pads
    return out, (q, k, v, out, lse)


def _flash_lanes_bwd(scale, bq, bk, interpret, residuals, g):
    q, k, v, out, lse = residuals
    b, t, hq, d = g.shape
    dp = _lanes_dp(d)
    hkv = k.shape[2]
    n_rep = hq // hkv
    # the barrier keeps these re-merges from CSE-ing with the forward's merges —
    # shared, the 27 layers' merged (dp-padded) tensors all stay alive from fwd
    # to bwd and blow HBM by ~1.4 GB at the stage-0 shapes (measured); distinct,
    # each layer's merged copies live only inside its own fwd/bwd region
    q, k, v = jax.lax.optimization_barrier((q, k, v))
    qs = (q.astype(jnp.float32) * (scale * LOG2E)).astype(q.dtype)
    qm = _merge_heads(qs, dp)
    km = _merge_heads(k, dp)
    vm = _merge_heads(v, dp)
    dom = _merge_heads(g.astype(q.dtype), dp)
    # pad lanes are zero on both sides, so delta over d == delta over dp
    delta = (out.astype(jnp.float32) * g.astype(jnp.float32)).sum(-1)
    dqm, dk_ex, dv_ex = _bwd_lanes(qm, km, vm, delta, lse, dom, heads=hq, hkv=hkv,
                                   dp=dp, scale=scale, bq=bq, bk=bk,
                                   interpret=interpret)
    dq = dqm.reshape(b, t, hq, dp)[..., :d].astype(g.dtype)
    dk4 = dk_ex.reshape(b, t, hkv, n_rep, dp).sum(3)[..., :d].astype(g.dtype)
    dv4 = dv_ex.reshape(b, t, hkv, n_rep, dp).sum(3)[..., :d].astype(g.dtype)
    return dq, dk4, dv4


_flash_lanes.defvjp(_flash_lanes_fwd, _flash_lanes_bwd)


# ------------------------------------------------------------------- public


@functools.partial(
    jax.custom_vjp,
    nondiff_argnames=("scale", "causal", "window", "bq", "bk", "interpret"),
)
def _flash(q, k, v, kv_mask, scale, causal, window, bq, bk, interpret):
    out, _ = _fwd(q, k, v, kv_mask, scale=scale, causal=causal, window=window,
                  bq=bq, bk=bk, interpret=interpret)
    return out


def _flash_fwd(q, k, v, kv_mask, scale, causal, window, bq, bk, interpret):
    out, lse = _fwd(q, k, v, kv_mask, scale=scale, causal=causal, window=window,
                    bq=bq, bk=bk, interpret=interpret)
    return out, (q, k, v, kv_mask, out, lse)


def _flash_bwd(scale, causal, window, bq, bk, interpret, residuals, g):
    q, k, v, kv_mask, out, lse = residuals
    dq, dk, dv = _bwd(q, k, v, kv_mask, out, lse, g, scale=scale, causal=causal,
                      window=window, bq=bq, bk=bk, interpret=interpret)
    return dq, dk, dv, None


_flash.defvjp(_flash_fwd, _flash_bwd)


def _auto_blocks(t: int, *, causal: bool, has_mask: bool) -> tuple[int, int]:
    """Pad-minimizing block choice (r3 profile: padded rows are real MXU work).

    - non-causal unmasked, t <= 1024 (the vision towers): ONE exact block per
      (b, h) — zero padded rows, and t_pad == t compiles the mask-free kernel
      (no iota/compare/where). The kv-block lane pad (576 -> 640 in the score
      matmul's minor dim) is far cheaper than whole padded q rows.
    - non-causal unmasked, t > 1024: 1024-blocks (measured best at T=1024 D=72:
      6.68 ms vs 7.85 (1024/512) / 13.07 (512/512) fwd+bwd).
    - causal/masked: keep kv-block skipping, but pick the block size minimizing
      t_pad (tie-break: larger block). Gemma's T=1087: 384-blocks pad to 1152
      where the old 512/256 default padded to 1280 — measured 1.42x faster
      attention fwd+bwd."""
    if not causal and not has_mask:
        if t <= 1024:
            blk = -(-t // 8) * 8
            return blk, blk
        return 1024, 1024
    blk = -min((-(-t // c) * c, -c) for c in (128, 256, 384, 512))[1]
    return blk, blk


def flash_attention(
    q, k, v, *, scale: Optional[float] = None, causal: bool = False,
    window: Optional[int] = None, kv_mask=None, q_offset=0,
    bq: int = DEFAULT_BQ, bk: int = DEFAULT_BK, interpret: bool = False,
    needs_bwd: bool = True,
):
    """Drop-in for ops.attention.dot_product_attention on self-attention shapes.
    q/k/v: [B, T, H{q,kv}, D] -> [B, T, Hq, D].

    Head dims that don't tile the 128 lane granule (so400m's D=72) are handled by
    Mosaic's implicit zero-fill of the lane remainder — no explicit padding ops, no
    extra HBM traffic; the MXU still runs 128-deep contraction passes, so D=72 pays
    a 1.78x attention-matmul overhead but skips the XLA path's ~1 GB/layer fp32
    score materialization — measured 2x+ faster on the stage-0 tower.

    Auto block choice minimizes the PADDED length first — padded rows are real
    MXU work. r3 profile: ViT-L's T=576 under 256-blocks padded to 768 (33% wasted
    score rows AND forced the masked path's iota/compare work); Gemma's T=1087
    under 256-blocks padded to 1280. Exact blocks (single 576 block; 384-blocks ->
    1152) remove both. Only then do bigger blocks amortize per-program overhead
    (measured 7.04 vs 7.86 ms at T=1024 D=72)."""
    del q_offset  # self-attention only (checked by flash_attention_supported)
    b, t, hq, d = q.shape
    hkv = k.shape[2]
    if scale is None:
        scale = d ** -0.5
    if bq == DEFAULT_BQ and bk == DEFAULT_BK:
        bq, bk = _auto_blocks(t, causal=causal, has_mask=kv_mask is not None)
    # merged-lane path gets its OWN block size: its q/o blocks carry ALL heads
    # (bq x H*dp), so the auto choice's 1024-blocks blow the VMEM gate — 256 keeps
    # the forward (whole-KV + q/o blocks) near 10 MB at the so400m shape
    bq_l = bk_l = min(256, t)
    if _lanes_supported(b, t, hq, hkv, d, causal=causal, window=window,
                        kv_mask=kv_mask, bq=bq_l, bk=bk_l, needs_bwd=needs_bwd):
        # merged-lane path: heads live in 128-aligned lane bands, so no layout
        # transposes exist at the kernel boundary (the BHTD path's swapaxes
        # materialized as 38.8 ms/step of copies in the r4 stage-0 op table)
        return _flash_lanes(q, k, v, scale, bq_l, bk_l, interpret)
    qt, kt, vt = (x.swapaxes(1, 2) for x in (q, k, v))
    out = _flash(qt, kt, vt, kv_mask, scale, causal, window, bq, bk, interpret)
    return out.swapaxes(1, 2)


def sharded_flash_plan(mesh, q, k):
    """(q_spec, kv_spec, mask_spec, out_spec) PartitionSpecs for running the flash
    kernel per-shard under ``shard_map`` on ``mesh`` — batch over the data axis, query
    heads over the model axis, KV heads over model only when they divide (GQA with few
    KV heads keeps them replicated: under megatron sharding a 1-head KV is feature-
    sharded anyway, so the regather is one small head). Returns None when the shapes
    don't divide the mesh — callers must fall back to the XLA path."""
    from projectiontrainer_tpu.core.mesh import DATA_AXIS, MODEL_AXIS

    dsz = mesh.shape.get(DATA_AXIS, 1)
    msz = mesh.shape.get(MODEL_AXIS, 1)
    b, _, hq, _ = q.shape
    hkv = k.shape[2]
    if b % dsz:
        return None
    head_ax = MODEL_AXIS if msz > 1 else None
    if msz > 1 and hq % msz:
        return None
    if msz > 1 and hkv % msz and hkv != 1:
        # Replicated multi-head KV under a model-sharded mesh is WRONG: the per-shard
        # kernel maps local query head hi onto KV head ``hi // n_rep`` starting from
        # local KV head 0, but globally shard s's query heads all belong to the KV
        # group at offset ``s * hq_l // n_rep`` — shards s>0 would silently attend
        # with the wrong KV head. hkv == 1 is safe (every query head shares the one
        # KV head); otherwise require hkv % msz == 0 so KV heads shard alongside Q.
        return None
    kv_head_ax = MODEL_AXIS if (msz > 1 and hkv % msz == 0) else None
    hq_l = hq // msz if head_ax else hq
    hkv_l = hkv // msz if kv_head_ax else hkv
    if hq_l % hkv_l:
        return None
    from jax.sharding import PartitionSpec as P

    data_ax = DATA_AXIS if dsz > 1 else None
    return (
        P(data_ax, None, head_ax, None),
        P(data_ax, None, kv_head_ax, None),
        P(data_ax, None),
        P(data_ax, None, head_ax, None),
    )


def sharded_flash_attention(mesh, q, k, v, *, scale=None, causal=False, window=None,
                            kv_mask=None, interpret: bool = False):
    """``flash_attention`` under ``shard_map`` on a multi-device mesh (specs from
    :func:`sharded_flash_plan`; attention is independent per (batch, head) so no
    collectives are needed). Caller must have checked the plan is not None."""
    try:
        from jax import shard_map
    except ImportError:  # pragma: no cover - older JAX
        from jax.experimental.shard_map import shard_map

    plan = sharded_flash_plan(mesh, q, k)
    q_spec, kv_spec, mask_spec, out_spec = plan
    if scale is None:
        scale = q.shape[-1] ** -0.5

    def inner(q_, k_, v_, m_):
        return flash_attention(q_, k_, v_, scale=scale, causal=causal, window=window,
                               kv_mask=m_, interpret=interpret)

    if kv_mask is None:
        fn = shard_map(lambda q_, k_, v_: inner(q_, k_, v_, None), mesh=mesh,
                       in_specs=(q_spec, kv_spec, kv_spec), out_specs=out_spec,
                       check_vma=False)
        return fn(q, k, v)
    fn = shard_map(inner, mesh=mesh,
                   in_specs=(q_spec, kv_spec, kv_spec, mask_spec),
                   out_specs=out_spec, check_vma=False)
    return fn(q, k, v, kv_mask)
