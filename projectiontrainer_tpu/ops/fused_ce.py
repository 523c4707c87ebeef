"""Fused linear + cross-entropy Pallas TPU kernel for huge-vocab CLM losses.

The CLM loss at Gemma3's 262k vocab is HBM-bound, not FLOP-bound: materializing
[tokens, V] logits in fp32 costs ~1 GB of HBM write+read traffic per 256-token chunk,
and the chunked-scan XLA path (train/losses.chunked_shifted_clm_loss) still pays three
full passes over that buffer per chunk (matmul write, LSE read, gather read) plus the
backward rematerialization. Measured on v5e it is ~40% of the whole Stage-1 train step.

This kernel computes the per-token negative log-likelihood

    nll[t] = logsumexp_v(h[t] . W[v] * scale) - (h[t] . W[label[t]] * scale)

with a flash-attention-style **online LSE over vocab tiles**: logits live only in VMEM
tile by tile and never reach HBM. The backward kernel rematerializes each logits tile
and feeds the MXU directly with (softmax - onehot):

    dh[t] = g[t] * scale * sum_v (p[t,v] - 1[v == label[t]]) . W[v]

HBM traffic becomes "read W once per token-tile sweep" instead of "write+read the full
logits tensor"; arithmetic is unchanged (2*N*D*V per pass).

**The vocab table must be frozen.** The VJP deliberately returns a zero cotangent for
``table`` — computing dW (a [V, D] scatter-accumulate) would re-introduce the giant
HBM buffer this kernel exists to avoid. Every trainer here qualifies: Stage 1 freezes
the whole LLM (reference Stage1/projector_trainer.py:114-117) and Stage 2 trains LoRA
adapters whose targets exclude the embedding (Stage2/train_vqa_stage2.py:232-240).
Callers that train the embedding table must use the chunked XLA path instead —
``train/losses.shifted_clm_loss`` / ``chunked_shifted_clm_loss``.

Grid layout (both passes): ``(token_tiles, vocab_tiles)`` with vocab fastest-moving;
VMEM scratch accumulators (running max / sum-exp / picked logit, or the dh tile)
persist across the vocab sweep and are reset when ``program_id(1) == 0``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -2.3819763e38  # finite stand-in for -inf: exp(NEG_INF - NEG_INF) stays 1.0

# VMEM ceiling the tile picker targets (v5e has 16 MB/core; leave headroom for
# Mosaic's own buffers). Tiles shrink automatically as the hidden dim grows —
# Gemma3-1B (D=1152) gets (1024, 512) fwd tiles, Qwen3-8B (D=4096) drops to
# (256, 256)-class tiles that still feed the MXU a K=4096 contraction.
VMEM_BUDGET = 12 * 2**20

_TILE_LADDER = [(1024, 512), (512, 512), (512, 256), (256, 256), (256, 128),
                (128, 128)]


def _pick_blocks(d: int, itemsize: int, *, bwd: bool):
    """Largest (block_n, block_v) whose working set fits the VMEM budget: double-
    buffered h and w input blocks, the fp32 logits tile, and (bwd only) the resident
    fp32 dh output block that accumulates across the vocab sweep."""
    for bn, bv in _TILE_LADDER:
        use = 2 * bv * d * itemsize + 2 * bn * d * itemsize + bn * bv * 4
        if bwd:
            use += bn * d * 4
        if use <= VMEM_BUDGET:
            return bn, bv
    return _TILE_LADDER[-1]


def fused_ce_supported(table) -> bool:
    v, d = table.shape
    return jax.default_backend() == "tpu" and d % 128 == 0


def _fwd_kernel(h_ref, w_ref, lbl_ref, lse_ref, picked_ref, m_ref, s_ref, p_ref,
                *, scale: float, vocab: int, block_v: int):
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        s_ref[:] = jnp.zeros_like(s_ref)
        p_ref[:] = jnp.zeros_like(p_ref)

    logits = jax.lax.dot_general(
        h_ref[:], w_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale  # [TN, TV]

    col = j * block_v + jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
    logits = jnp.where(col < vocab, logits, NEG_INF)  # mask the padded vocab tail

    lbl = lbl_ref[:]  # [TN, 1]
    p_ref[:] += jnp.sum(jnp.where(col == lbl, logits, 0.0), axis=1, keepdims=True)

    m_prev = m_ref[:]
    m_new = jnp.maximum(m_prev, jnp.max(logits, axis=1, keepdims=True))
    s_ref[:] = s_ref[:] * jnp.exp(m_prev - m_new) + jnp.sum(
        jnp.exp(logits - m_new), axis=1, keepdims=True
    )
    m_ref[:] = m_new

    @pl.when(j == nj - 1)
    def _():
        lse_ref[:] = m_ref[:] + jnp.log(s_ref[:])
        picked_ref[:] = p_ref[:]


def _bwd_kernel(h_ref, w_ref, lbl_ref, lse_ref, g_ref, dh_ref,
                *, scale: float, vocab: int, block_v: int):
    # dh accumulates DIRECTLY in the (revisited, fp32) output block — the canonical
    # flash-bwd pattern. A scratch accumulator with one conditional final write made
    # Mosaic compile time blow up super-linearly in the vocab-tile count.
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        dh_ref[:] = jnp.zeros_like(dh_ref)

    logits = jax.lax.dot_general(
        h_ref[:], w_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale
    col = j * block_v + jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
    logits = jnp.where(col < vocab, logits, NEG_INF)

    p = jnp.exp(logits - lse_ref[:])  # [TN, TV]; padded cols -> exp(NEG_INF - lse) = 0
    q = (p - jnp.where(col == lbl_ref[:], 1.0, 0.0)) * g_ref[:]
    # zero the out-of-bounds table rows of the last vocab tile: their contents are
    # unspecified (NaN in interpret mode) and 0 * NaN would poison the accumulator
    # even though q is 0 at those columns
    row = jax.lax.broadcasted_iota(jnp.int32, w_ref.shape, 0) + j * block_v
    w = jnp.where(row < vocab, w_ref[:], 0)
    dh_ref[:] += jax.lax.dot_general(
        q.astype(h_ref.dtype), w, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _pad_tokens(x, block_n, fill=0):
    n = x.shape[0]
    pad = -n % block_n
    if pad:
        cfg = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
        x = jnp.pad(x, cfg, constant_values=fill)
    return x


def _fwd_call(hidden, table, labels, scale, interpret):
    n, d = hidden.shape
    v = table.shape[0]
    block_n, block_v = _pick_blocks(d, hidden.dtype.itemsize, bwd=False)
    h = _pad_tokens(hidden, block_n)
    lbl = _pad_tokens(labels.astype(jnp.int32), block_n)[:, None]
    np_, _ = h.shape
    grid = (np_ // block_n, pl.cdiv(v, block_v))
    lse, picked = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, vocab=v, block_v=block_v),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_n, d), lambda i, j: (i, 0)),
            pl.BlockSpec((block_v, d), lambda i, j: (j, 0)),
            pl.BlockSpec((block_n, 1), lambda i, j: (i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((block_n, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((block_n, 1), lambda i, j: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((np_, 1), jnp.float32),
            jax.ShapeDtypeStruct((np_, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_n, 1), jnp.float32),
            pltpu.VMEM((block_n, 1), jnp.float32),
            pltpu.VMEM((block_n, 1), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=int(2 * np_ * d * v), transcendentals=int(np_ * v),
            bytes_accessed=int(grid[0] * v * d * table.dtype.itemsize + np_ * d * 2),
        ),
        interpret=interpret,
    )(h, table, lbl)
    return lse[:n, 0], picked[:n, 0]


def _bwd_call(hidden, table, labels, lse, g, scale, interpret):
    n, d = hidden.shape
    v = table.shape[0]
    block_n, block_v = _pick_blocks(d, hidden.dtype.itemsize, bwd=True)
    h = _pad_tokens(hidden, block_n)
    lbl = _pad_tokens(labels.astype(jnp.int32), block_n)[:, None]
    lse_p = _pad_tokens(lse, block_n)[:, None]
    g_p = _pad_tokens(g.astype(jnp.float32), block_n)[:, None]
    np_, _ = h.shape
    grid = (np_ // block_n, pl.cdiv(v, block_v))
    dh = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale, vocab=v, block_v=block_v),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_n, d), lambda i, j: (i, 0)),
            pl.BlockSpec((block_v, d), lambda i, j: (j, 0)),
            pl.BlockSpec((block_n, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((block_n, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((block_n, 1), lambda i, j: (i, 0)),
        ],
        out_specs=pl.BlockSpec((block_n, d), lambda i, j: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((np_, d), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=int(4 * np_ * d * v), transcendentals=int(np_ * v),
            bytes_accessed=int(grid[0] * v * d * table.dtype.itemsize + 2 * np_ * d * 2),
        ),
        interpret=interpret,
    )(h, table, lbl, lse_p, g_p)
    # scale + downcast outside the kernel (fused by XLA; the kernel out is fp32)
    return (dh[:n] * scale).astype(hidden.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnames=("scale", "interpret"))
def fused_clm_token_nll(hidden, table, labels, scale=1.0, interpret=False):
    """Per-token NLL ``lse - logit[label]`` for flattened tokens, logits VMEM-only.

    hidden: [N, D] (bf16/f32); table: [V, D]; labels: [N] int (any value in [0, V);
    ignored positions should pass a dummy 0 and be masked OUTSIDE). Returns f32 [N].

    Differentiable wrt ``hidden`` only — the table cotangent is hard zero (see module
    docstring: frozen-table contract).
    """
    lse, picked = _fwd_call(hidden, table, labels, scale, interpret)
    return lse - picked


def _nll_fwd(hidden, table, labels, scale, interpret):
    lse, picked = _fwd_call(hidden, table, labels, scale, interpret)
    return lse - picked, (hidden, table, labels, lse)


def _nll_bwd(scale, interpret, res, g):
    hidden, table, labels, lse = res
    dh = _bwd_call(hidden, table, labels, lse, g, scale, interpret)
    # Zero table cotangent BY CONTRACT (frozen vocab table; see module docstring).
    # Under the trainers' stop_gradient masks this zeros tensor is dead code that XLA
    # removes; a caller that trains the table must not use the fused path.
    return dh, jnp.zeros_like(table), None


fused_clm_token_nll.defvjp(_nll_fwd, _nll_bwd)


# ----------------------------------------------------------- vocab-parallel (TP)


def _vp_axes(mesh):
    from projectiontrainer_tpu.core.mesh import DATA_AXIS, MODEL_AXIS

    dsz = mesh.shape.get(DATA_AXIS, 1)
    data_ax = DATA_AXIS if dsz > 1 else None
    return data_ax, MODEL_AXIS


@functools.lru_cache(maxsize=None)
def _make_vp_nll(mesh, scale: float, interpret: bool):
    """Vocab-parallel fused NLL for TP meshes, built once per (mesh, scale).

    The vocab table is Megatron-sharded on its vocab dim over the MODEL axis
    (parallel/sharding.py: ``embed_tokens/embedding -> P(MODEL, None)``), so each
    shard runs the Pallas kernel over its OWN vocab slice — labels are rebased to the
    slice (out-of-slice positions get -1, which matches no column, contributing zero
    picked-logit and no one-hot in the backward). The per-shard partial results
    combine with tree collectives over the model axis:

        lse   = pmax-shifted log-sum of per-shard LSEs   (online-LSE across shards)
        picked = psum (label lives in exactly one slice)
        dh    = psum of per-shard dh (the vocab sum splits across shards)

    This is the TP analogue of Megatron's vocab-parallel cross-entropy: the only
    cross-chip traffic is [tokens]-sized scalars fwd and one [tokens, D] psum bwd,
    riding ICI — the [tokens, V] logits never exist, globally or per shard.
    """
    from jax.sharding import PartitionSpec as P

    try:
        from jax import shard_map
    except ImportError:  # pragma: no cover - older JAX
        from jax.experimental.shard_map import shard_map

    data_ax, model_ax = _vp_axes(mesh)
    h_spec = P(data_ax, None, None)
    t_spec = P(model_ax, None)
    l_spec = P(data_ax, None)

    def _rebase(lbl, v_local):
        off = jax.lax.axis_index(model_ax) * v_local
        loc = lbl - off
        return jnp.where((loc >= 0) & (loc < v_local), loc, -1)

    def fwd_local(h, w, lbl):
        b, t1, d = h.shape
        loc = _rebase(lbl, w.shape[0])
        lse_s, picked_s = _fwd_call(h.reshape(-1, d), w, loc.reshape(-1),
                                    scale, interpret)
        m = jax.lax.pmax(lse_s, model_ax)
        lse = m + jnp.log(jax.lax.psum(jnp.exp(lse_s - m), model_ax))
        picked = jax.lax.psum(picked_s, model_ax)
        return (lse - picked).reshape(b, t1), lse.reshape(b, t1)

    fwd_sm = shard_map(fwd_local, mesh=mesh, in_specs=(h_spec, t_spec, l_spec),
                       out_specs=(l_spec, l_spec), check_vma=False)

    def bwd_local(h, w, lbl, lse, g):
        b, t1, d = h.shape
        loc = _rebase(lbl, w.shape[0])
        dh_s = _bwd_call(h.reshape(-1, d), w, loc.reshape(-1), lse.reshape(-1),
                         g.reshape(-1), scale, interpret)
        return jax.lax.psum(dh_s, model_ax).reshape(h.shape)

    bwd_sm = shard_map(bwd_local, mesh=mesh,
                       in_specs=(h_spec, t_spec, l_spec, l_spec, l_spec),
                       out_specs=h_spec, check_vma=False)

    @jax.custom_vjp
    def nll(hidden, table, labels):
        return fwd_sm(hidden, table, labels)[0]

    def nll_fwd(hidden, table, labels):
        out, lse = fwd_sm(hidden, table, labels)
        return out, (hidden, table, labels, lse)

    def nll_bwd(res, g):
        hidden, table, labels, lse = res
        dh = bwd_sm(hidden, table, labels, lse, g)
        # zero table cotangent BY CONTRACT (frozen vocab table; module docstring)
        return dh.astype(hidden.dtype), jnp.zeros_like(table), None

    nll.defvjp(nll_fwd, nll_bwd)
    return nll


def fused_clm_token_nll_vocab_parallel(hidden, table, labels, scale=1.0, *,
                                       mesh, interpret=False):
    """Per-token NLL on a TP mesh with the table vocab-sharded over MODEL.

    hidden: [B, T1, D] (already shifted — the prediction positions); table: [V, D]
    with V % model_size == 0; labels: [B, T1] int in [0, V) (mask ignored positions
    OUTSIDE). Differentiable wrt hidden only (frozen-table contract). Works on any
    backend (interpret mode is forced off-TPU, for virtual-mesh tests/dryruns)."""
    from projectiontrainer_tpu.core.mesh import MODEL_AXIS

    msz = mesh.shape.get(MODEL_AXIS, 1)
    v, d = table.shape
    if v % msz:
        raise ValueError(
            f"model axis size {msz} must divide the vocab ({v}) for the "
            f"vocab-parallel fused CE"
        )
    b = hidden.shape[0]
    dsz = mesh.shape.get(_vp_axes(mesh)[0], 1)
    if b % dsz:
        raise ValueError(
            f"data axis size {dsz} must divide the batch ({b}) for the "
            f"vocab-parallel fused CE"
        )
    interpret = bool(interpret) or jax.default_backend() != "tpu"
    return _make_vp_nll(mesh, float(scale), interpret)(hidden, table, labels)
