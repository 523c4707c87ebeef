"""Losses, each replicating the reference's exact numerical semantics (SURVEY §7.1.4).

All losses compute in fp32 regardless of input dtype (the reference casts logits to fp32
before its Stage-2 loss — Stage2/trainer.py:408 — and torch CE upcasts internally).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from projectiontrainer_tpu.core.mesh import DATA_AXIS, MODEL_AXIS

try:  # JAX >= 0.4.35 exposes shard_map at the top level
    from jax import shard_map
except ImportError:  # pragma: no cover - older JAX
    from jax.experimental.shard_map import shard_map

IGNORE_INDEX = -100


def shifted_clm_loss(logits, labels, sample_weights=None):
    """Causal-LM loss: tokens < n predict n; positions with label -100 are ignored and the
    mean runs over non-ignored targets only.

    Matches both reference paths: HF's internal loss under ``labels=`` (Stage 1 —
    Stage1/projector_trainer.py:226-233) and the manual shifted fp32 CE (Stage 2 —
    Stage2/trainer.py:407-418; torch ``nn.CrossEntropyLoss`` default ``ignore_index=-100``
    averages over valid tokens).

    logits: [B, T, V]; labels: [B, T] int with -100 at ignored positions.
    ``sample_weights`` [B] (optional) down-weights filler rows from straggler batches
    (weight 0.0) so the mean matches the reference's smaller final batch exactly.
    Returns (loss_scalar_fp32, num_valid_tokens).
    """
    logits = logits[:, :-1, :].astype(jnp.float32)
    labels = labels[:, 1:]
    valid = labels != IGNORE_INDEX
    safe_labels = jnp.where(valid, labels, 0)
    logprobs = jax.nn.log_softmax(logits, axis=-1)
    token_ll = jnp.take_along_axis(logprobs, safe_labels[..., None], axis=-1)[..., 0]
    token_loss = jnp.where(valid, -token_ll, 0.0)
    if sample_weights is None:
        count = jnp.maximum(valid.sum(), 1)
        return token_loss.sum() / count, valid.sum()
    w = sample_weights.astype(jnp.float32)[:, None]
    wcount = jnp.maximum((valid * w).sum(), 1e-9)
    return (token_loss * w).sum() / wcount, (valid * w).sum().astype(jnp.int32)


def chunked_shifted_clm_loss(hidden, embed_table, labels, *, chunk_size: int = 128,
                             logits_scale: float = 1.0, sample_weights=None):
    """Memory-efficient shifted CLM loss computed from hidden states.

    The naive path materializes fp32 logits [B, T, V] — at Gemma3's 262k vocab and
    T≈1087 that is tens of GB and dominates HBM. Instead we scan over T-chunks,
    computing each chunk's logits inside ``jax.checkpoint`` so the backward pass
    rematerializes them chunk-by-chunk: peak memory [B, chunk, V].

    hidden: [B, T, D]; embed_table: [V, D] (tied LM head); labels: [B, T].
    Semantics identical to :func:`shifted_clm_loss` (same shift, -100 mean, optional
    per-sample weights).
    """
    b, t, d = hidden.shape
    w = None if sample_weights is None else sample_weights.astype(jnp.float32)[:, None]
    hidden = hidden[:, :-1, :]
    labels = labels[:, 1:]
    t = t - 1
    n_chunks = -(-t // chunk_size)
    pad = n_chunks * chunk_size - t
    if pad:
        hidden = jnp.pad(hidden, ((0, 0), (0, pad), (0, 0)))
        labels = jnp.pad(labels, ((0, 0), (0, pad)), constant_values=IGNORE_INDEX)

    hidden = hidden.reshape(b, n_chunks, chunk_size, d).swapaxes(0, 1)
    labels = labels.reshape(b, n_chunks, chunk_size).swapaxes(0, 1)

    @jax.checkpoint
    def chunk_fn(carry, inputs):
        h, lbl = inputs
        logits = jnp.dot(
            h, embed_table.T.astype(h.dtype), preferred_element_type=jnp.float32
        ) * logits_scale
        valid = lbl != IGNORE_INDEX
        safe = jnp.where(valid, lbl, 0)
        # ll = logit[label] - LSE(logits): avoids materializing the full [B,chunk,V]
        # fp32 logprobs tensor that log_softmax would write back to HBM (at V=262k the
        # loss is HBM-bound; this is one fewer full write+read per chunk)
        logits = logits.astype(jnp.float32)
        lse = jax.scipy.special.logsumexp(logits, axis=-1)
        picked = jnp.take_along_axis(logits, safe[..., None], axis=-1)[..., 0]
        token_loss = jnp.where(valid, lse - picked, 0.0)
        valid_f = valid.astype(jnp.float32)
        if w is not None:
            token_loss = token_loss * w
            valid_f = valid_f * w
        loss_sum, count = carry
        return (loss_sum + token_loss.sum(), count + valid_f.sum()), None

    (loss_sum, count), _ = jax.lax.scan(chunk_fn, (0.0, 0.0), (hidden, labels))
    return loss_sum / jnp.maximum(count, 1e-9), count.astype(jnp.int32)


def fused_shifted_clm_loss(hidden, embed_table, labels, *, logits_scale: float = 1.0,
                           sample_weights=None, interpret: bool = False, mesh=None):
    """Shifted CLM loss via the Pallas fused linear+CE kernel (ops/fused_ce.py).

    Same semantics as :func:`chunked_shifted_clm_loss` (shift, -100 masked mean,
    optional per-sample weights) but the [tokens, V] logits never reach HBM — on v5e
    this roughly halves the loss+lm-head cost at Gemma3's 262k vocab.

    REQUIRES a frozen ``embed_table`` (its gradient is hard zero — the kernel contract;
    true for Stage 1's fully-frozen LLM and Stage 2's LoRA adapters). Trainers that
    unfreeze the embedding must use the chunked path.

    ``mesh``: pass the trainer's mesh to run the kernel sharded. pallas_call has no
    GSPMD partitioning rules, so the per-token NLL is wrapped in ``shard_map``:

    - DATA-only mesh: each device runs the kernel on its batch shard against the
      replicated table.
    - MODEL-sharded (TP) mesh: the vocab-parallel variant — each model shard sweeps
      its own vocab slice (table is Megatron-sharded P(MODEL, None)) and partial
      max/sum-exp/picked-logit combine with psum/pmax over the model axis
      (ops.fused_ce.fused_clm_token_nll_vocab_parallel). Requires V % model_size == 0
      (steps._resolve_ce_impl guards; otherwise the chunked path)."""
    b, t, d = hidden.shape
    labels = labels[:, 1:]
    valid = labels != IGNORE_INDEX
    safe = jnp.where(valid, labels, 0)

    from projectiontrainer_tpu.ops.fused_ce import (
        fused_clm_token_nll, fused_clm_token_nll_vocab_parallel,
    )

    def token_nll(h, table, lbl):
        bl = h.shape[0]
        flat = h[:, :-1, :].reshape(bl * (t - 1), d)
        return fused_clm_token_nll(
            flat, table, lbl.reshape(-1), logits_scale, interpret
        ).reshape(bl, t - 1)

    if mesh is not None and mesh.shape.get(MODEL_AXIS, 1) > 1:
        nll = fused_clm_token_nll_vocab_parallel(
            hidden[:, :-1, :], embed_table, safe, logits_scale,
            mesh=mesh, interpret=interpret,
        )
    elif mesh is not None and mesh.shape[DATA_AXIS] > 1:
        nll = shard_map(
            token_nll, mesh=mesh,
            in_specs=(P(DATA_AXIS), P(), P(DATA_AXIS)),
            out_specs=P(DATA_AXIS),
            # pallas_call's ShapeDtypeStruct outputs carry no varying-mesh-axes
            # metadata; the wrapper is trivially correct (no collectives inside)
            check_vma=False,
        )(hidden, embed_table, safe)
    else:
        nll = token_nll(hidden, embed_table, safe)

    token_loss = jnp.where(valid, nll, 0.0)
    valid_f = valid.astype(jnp.float32)
    if sample_weights is not None:
        w = sample_weights.astype(jnp.float32)[:, None]
        token_loss = token_loss * w
        valid_f = valid_f * w
    count = valid_f.sum()
    return token_loss.sum() / jnp.maximum(count, 1e-9), count.astype(jnp.int32)


def siglip_pairwise_loss(image_features, text_features, logit_scale, logit_bias=None,
                         sample_weight=None):
    """The reference's Stage-0 contrastive loss, replicated exactly (Stage0/
    train_vision_encoder_stage0.py:260-269): L2-normalize both towers, pairwise logits
    ``img @ txt.T * exp(logit_scale)`` (+ optional bias), **eye-matrix labels** with
    binary cross entropy summed then divided by n.

    ``sample_weight`` (0/1 per row) excludes straggler-batch filler rows: a filler
    duplicating a real row has IDENTICAL features, so its off-diagonal "negative"
    logit equals the true positive logit — an unmasked filler injects a large
    spurious BCE term pushing the real pair apart. Masking both the filler's row and
    column and dividing by n_real reproduces the reference's genuinely smaller final
    DDP batch.

    NOTE: this deliberately differs from canonical SigLIP's ±1 log-sigmoid loss — the
    reference uses BCE against an identity matrix; we replicate, not "fix" (SURVEY §7.1.4).
    """
    img = image_features.astype(jnp.float32)
    txt = text_features.astype(jnp.float32)
    img = img / jnp.linalg.norm(img, axis=-1, keepdims=True)
    txt = txt / jnp.linalg.norm(txt, axis=-1, keepdims=True)
    scale = jnp.exp(jnp.asarray(logit_scale, jnp.float32).reshape(()))
    logits = img @ txt.T * scale
    if logit_bias is not None:
        logits = logits + jnp.asarray(logit_bias, jnp.float32).reshape(())
    n = logits.shape[0]
    labels = jnp.eye(n, dtype=jnp.float32)
    # BCE-with-logits, sum reduction / n
    per = jnp.maximum(logits, 0.0) - logits * labels + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    if sample_weight is None:
        return per.sum() / n
    w = sample_weight.astype(jnp.float32)
    return (per * (w[:, None] * w[None, :])).sum() / jnp.maximum(w.sum(), 1.0)


def _masked_logsumexp(x, mask, temperature):
    """T * logsumexp(x/T) over masked elements; -inf-safe when mask is empty."""
    x = x / temperature
    neg = jnp.finfo(jnp.float32).min
    xm = jnp.where(mask, x, neg)
    m = jnp.max(xm, axis=-1, keepdims=True)
    m = jnp.maximum(m, neg)  # all-masked row -> stays neg; handled by caller
    s = jnp.sum(jnp.where(mask, jnp.exp(xm - m), 0.0), axis=-1)
    return temperature * (m[..., 0] + jnp.log(jnp.maximum(s, 1e-38)))


def two_way_multilabel_loss(logits, targets, *, t_p: float = 4.0, t_n: float = 1.0,
                            sample_weights=None):
    """Kobayashi CVPR'23 two-way multi-label loss, vectorized.

    Replicates ``TwoWayMultiLabelLoss`` (cls_evaluate/train_twoway_loss.py:166-286):
    sample-wise term (over classes, per sample) and class-wise term (over the batch, per
    class), each ``softplus(T_n*LSE(x_neg/T_n) + T_p*LSE(-x_pos/T_p))``, zero when a
    row/column lacks positives or negatives; final = (mean_sample + mean_class) / 2.

    ``sample_weights`` (0/1 per row) excludes straggler-batch filler rows from BOTH
    directions — fillers would otherwise be double-counted in the sample mean and
    inflate every class's over-the-batch logsumexp; the reference's final batch is
    genuinely smaller.

    The reference loops in Python per sample/class; here both directions are one masked
    logsumexp over the [B, C] matrix — the TPU-native formulation.
    """
    logits = logits.astype(jnp.float32)
    pos = targets == 1
    neg = targets == 0
    if sample_weights is not None:
        real = (sample_weights > 0)[:, None]
        pos = pos & real
        neg = neg & real
        n_samples = jnp.maximum(jnp.sum(real).astype(jnp.float32), 1.0)
    else:
        n_samples = float(targets.shape[0])

    def direction(axis, denom):
        p = jnp.moveaxis(pos, axis, -1)
        n = jnp.moveaxis(neg, axis, -1)
        x = jnp.moveaxis(logits, axis, -1)
        has_both = jnp.any(p, axis=-1) & jnp.any(n, axis=-1)
        lse_neg = _masked_logsumexp(x, n, t_n)
        lse_pos = _masked_logsumexp(-x, p, t_p)
        loss = jax.nn.softplus(lse_neg + lse_pos)
        return jnp.sum(jnp.where(has_both, loss, 0.0)) / denom

    sample_loss = direction(1, n_samples)          # over classes for each REAL sample
    class_loss = direction(0, float(targets.shape[1]))  # over real rows for each class
    return (sample_loss + class_loss) / 2.0


def softmax_ce_loss(logits, target_indices, sample_weights=None):
    """Single-label CE for the cls_evaluate probe (cls_evaluate/train_utils.py uses torch
    ``nn.CrossEntropyLoss`` over class logits). Optional per-sample weights exclude
    straggler-batch filler rows from the mean."""
    logits = logits.astype(jnp.float32)
    logprobs = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logprobs, target_indices[:, None], axis=-1)[:, 0]
    if sample_weights is None:
        return nll.mean()
    w = sample_weights.astype(jnp.float32)
    return (nll * w).sum() / jnp.maximum(w.sum(), 1e-9)
