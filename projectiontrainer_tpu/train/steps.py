"""Jitted train/eval steps for every stage — the framework's hot loops.

One generic ``make_train_step`` (value_and_grad -> masked optax update, donated state,
compiled once per mask variant) plus per-stage loss functions that rebuild the reference's
exact batch semantics (SURVEY §3.1-3.3). The loss functions take the *whole* param tree;
frozen subtrees contribute no gradient because the optimizer zeroes them and XLA prunes the
dead backward graph — the functional replacement for ``requires_grad_``/``no_grad``.
"""

from __future__ import annotations

import contextlib
import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax

from projectiontrainer_tpu.models import decoder as dec
from projectiontrainer_tpu.models import siglip, vlm
from projectiontrainer_tpu.models import classifier as cls_model
from projectiontrainer_tpu.core import dtypes
from projectiontrainer_tpu.core import mesh as mesh_mod
from projectiontrainer_tpu.train import lora as lora_mod
from projectiontrainer_tpu.train import losses


def init_state(params, tx) -> dict:
    return {"params": params, "opt_state": tx.init(params), "step": jnp.zeros((), jnp.int32)}


def swap_optimizer(state: dict, new_tx) -> dict:
    """Rebuild ``opt_state`` for ``new_tx``, carrying over every optimizer-state leaf
    whose tree path, shape, and dtype are unchanged — the Adam moments (mu/nu),
    bias-correction counts, and accumulation buffers of the param groups that survive a
    freeze-mask swap.

    The reference never rebuilds its optimizer at a freeze transition: torch keeps ONE
    AdamW and only flips ``requires_grad`` (cls_evaluate/train_utils.py:286-308 for
    1EpochUnfreeze, Stage2/trainer.py:267-289 for ``--train_ve_first_epoch``), so the
    still-trainable groups' moments and step counts persist while newly frozen params
    simply stop receiving grads. A fresh ``tx.init`` here would zero the surviving
    groups' second moments and restart their bias correction — the first post-swap
    update would be a full-magnitude fresh-Adam step, diverging from the reference's
    loss curve. Newly FROZEN leaves' moments are dropped (optax masks them out as
    ``MaskedNode``) — unobservable, those params never update again. The reverse
    (frozen -> trainable mid-run) never occurs in any trainer: ``1EpochUnfreeze`` and
    ``--train_ve_first_epoch`` both start trainable and freeze at epoch 1, and resume
    paths restore full state from disk.
    """
    new_opt = new_tx.init(state["params"])
    old_map = {
        jax.tree_util.keystr(p): leaf
        for p, leaf in jax.tree_util.tree_leaves_with_path(state["opt_state"])
    }
    paths_leaves = jax.tree_util.tree_leaves_with_path(new_opt)
    treedef = jax.tree_util.tree_structure(new_opt)
    leaves = []
    for p, leaf in paths_leaves:
        old = old_map.get(jax.tree_util.keystr(p))
        if (old is not None
                and getattr(old, "shape", None) == getattr(leaf, "shape", None)
                and getattr(old, "dtype", None) == getattr(leaf, "dtype", None)):
            leaf = old
        leaves.append(leaf)
    return {"params": state["params"],
            "opt_state": jax.tree_util.tree_unflatten(treedef, leaves),
            "step": state["step"]}


def _zero_grad_like(x):
    """Zero gradient for a frozen leaf. Integer leaves (int8 quantized QLoRA bases) get
    FLOAT zeros: a gradient pytree with integer leaves poisons ``optax.MultiSteps``'
    accumulator dtype and the running mean itself."""
    dtype = x.dtype if jnp.issubdtype(x.dtype, jnp.inexact) else jnp.float32
    return jnp.zeros(x.shape, dtype)


def make_train_step(loss_fn: Callable, tx, *, donate: bool = True, trainable_mask=None,
                    watch_subtree: Optional[str] = None, param_shardings=None):
    """loss_fn(params, batch, rng) -> (loss, aux). Returns jitted
    step(state, batch, rng) -> (state, loss, aux).

    ``trainable_mask`` (bool pytree) applies ``stop_gradient`` to frozen leaves before the
    loss — this is what lets XLA DCE the frozen weight-gradient matmuls (dW = x^T dy),
    not just zero them after the fact. Backprop through frozen *activations* (needed to
    reach upstream trainables like the projector) is unaffected.

    ``watch_subtree``: top-level params key (e.g. ``'projector'``) whose raw gradient
    pytree is returned in ``aux['watched_grads']`` — feeds the per-parameter norm +
    histogram logging that mirrors the reference's ``wandb.watch(projector)``
    (Stage1/train_projection_stage1.py:359-370). Host transfer happens only when the
    trainer actually reads it at a logging boundary.

    ``param_shardings`` (NamedSharding pytree matching params): pins gradients AND
    updated params to the params' layout via ``with_sharding_constraint``. Under an
    FSDP layout (parallel.sharding ``fsdp=True``) this is what turns the cross-data
    gradient combine into a REDUCE-SCATTER to each leaf's shard (ZeRO-2/3) instead of
    a full all-reduce of replicated grads, and keeps the optimizer update + Adam
    moments shard-local. Pure-DP/TP layouts are unaffected (the constraint restates
    what GSPMD already infers).
    """

    def constrain(tree):
        if param_shardings is None:
            return tree
        return jax.tree.map(jax.lax.with_sharding_constraint, tree, param_shardings)

    def step(state, batch, rng):
        params = state["params"]
        if trainable_mask is None:
            (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, batch, rng
            )
            grad_norm = optax.global_norm(grads)
        else:
            # Differentiate ONLY the trainable leaves: frozen leaves enter as
            # stop_gradient constants (XLA prunes their dW matmuls) and may be
            # non-differentiable dtypes (int8 quantized bases).
            flat, treedef = jax.tree_util.tree_flatten(params)
            mask_flat = jax.tree_util.tree_flatten(trainable_mask)[0]
            diff = [x for x, m in zip(flat, mask_flat) if m]

            def loss_of(diff_leaves):
                it = iter(diff_leaves)
                merged = [
                    next(it) if m else jax.lax.stop_gradient(x)
                    for x, m in zip(flat, mask_flat)
                ]
                return loss_fn(jax.tree_util.tree_unflatten(treedef, merged), batch, rng)

            (loss, aux), gdiff = jax.value_and_grad(loss_of, has_aux=True)(diff)
            grad_norm = optax.global_norm(gdiff)  # trainables only — the wandb.watch
            git = iter(gdiff)                     # equivalent (SURVEY §5.5)
            grads_flat = [
                next(git) if m else _zero_grad_like(x) for x, m in zip(flat, mask_flat)
            ]
            grads = jax.tree_util.tree_unflatten(treedef, grads_flat)

        grads = constrain(grads)
        updates, opt_state = tx.update(grads, state["opt_state"], state["params"])
        params = constrain(optax.apply_updates(state["params"], updates))
        aux = {**aux, "grad_norm": grad_norm}
        if watch_subtree is not None:
            aux["watched_grads"] = grads[watch_subtree]
        return (
            {"params": params, "opt_state": opt_state, "step": state["step"] + 1},
            loss,
            aux,
        )

    return jax.jit(step, donate_argnums=(0,) if donate else ())


# ---------------------------------------------------------------------------- stage 1


def _vis_remat(remat):
    """Decoder-side INTEGER (partial) remat doesn't apply to the vision tower — an
    int means 'remat the first N DECODER layers'; the tower keeps full remat (its
    activations are small next to the decoder's and its recompute is cheap)."""
    return True if isinstance(remat, int) and not isinstance(remat, bool) else remat


def _flash_ctx(mesh):
    """Trace-time shard_map context for the Pallas flash kernel on multi-device
    meshes (core.mesh.flash_shard_context); a no-op on single-device/no mesh."""
    if mesh is not None and mesh.size > 1:
        return mesh_mod.flash_shard_context(mesh)
    return contextlib.nullcontext()


def _resolve_ce_impl(ce_impl: str, table_frozen: bool,
                     hidden_size: Optional[int] = None, mesh=None,
                     vocab_size: Optional[int] = None) -> str:
    """'auto' picks the Pallas fused linear+CE kernel on TPU when its contract holds
    (ops/fused_ce.py): frozen vocab table and lane-aligned hidden dim. Single device
    and DATA-only meshes run the kernel per batch shard under shard_map; MODEL-sharded
    (TP) meshes run the vocab-parallel variant (each shard sweeps its vocab slice,
    partials combine over the model axis — fused_clm_token_nll_vocab_parallel), which
    additionally needs vocab_size % model_size == 0. Explicit ce_impl='fused'
    overrides the backend/mesh heuristics but NOT the correctness contract: the
    kernel returns a hard-zero table cotangent, so forcing it on a run that trains
    the embedding would silently zero those gradients — raise instead."""
    if ce_impl == "fused":
        if not table_frozen:
            raise ValueError(
                "ce_impl='fused' requires a frozen vocab table (the Pallas kernel's "
                "table cotangent is hard zero); use 'chunked' when training the "
                "embedding/lm-head"
            )
        if hidden_size is not None and hidden_size % 128 != 0:
            raise ValueError(
                f"ce_impl='fused' requires hidden_size % 128 == 0 (got {hidden_size})"
            )
        return ce_impl
    if ce_impl != "auto":
        return ce_impl
    if jax.default_backend() != "tpu" or not table_frozen:
        return "chunked"
    if hidden_size is not None and hidden_size % 128 != 0:
        return "chunked"
    if jax.device_count() == 1:
        return "fused"
    from projectiontrainer_tpu.core.mesh import MODEL_AXIS

    if mesh is None:
        return "chunked"
    msz = mesh.shape.get(MODEL_AXIS, 1)
    if msz == 1:
        return "fused"
    if vocab_size is not None and vocab_size % msz == 0:
        return "fused"  # vocab-parallel kernel
    return "chunked"


def _clm_loss_from_embeds(params, cfg: vlm.VLMConfig, embeds, mask, labels, *,
                          remat: bool, logits_chunk: Optional[int], lora=None,
                          lora_cfg=None, lora_rng=None, sample_weights=None,
                          ce_impl: str = "chunked", mesh=None, loss_prefix: int = 0):
    """``loss_prefix``: number of LEADING positions whose labels are statically -100
    (the visual prefix in stage 1, visual+question in stage 2). The lm-head + CE only
    ever contribute from pairs (hidden[i], labels[i+1]) with i >= loss_prefix-1, so the
    decoder output is cropped to that suffix before the head — exactly equal loss and
    gradients (dropped labels are all ignored; n_tok counts only labels[1:] != -100)
    at roughly half the lm-head/CE FLOPs for the reference shapes (575 visual + 512
    caption / 831 prefix + 1024 answer). The reference pays the full-sequence head
    (Stage2/trainer.py:400-418 runs the LLM fwd + fp32 CE over every position)."""
    hidden, _ = dec.forward(
        params["llm"], cfg.llm, inputs_embeds=embeds, attention_mask=mask,
        remat=remat, lora=lora, lora_cfg=lora_cfg, lora_rng=lora_rng,
    )
    if loss_prefix > 1:
        hidden = hidden[:, loss_prefix - 1:]
        labels = labels[:, loss_prefix - 1:]
    if logits_chunk and ce_impl == "fused":
        table = dec.lm_head_table(params["llm"], cfg.llm)
        return losses.fused_shifted_clm_loss(
            hidden, table, labels, sample_weights=sample_weights, mesh=mesh
        )
    if logits_chunk:
        table = dec.lm_head_table(params["llm"], cfg.llm)
        return losses.chunked_shifted_clm_loss(
            hidden, table, labels, chunk_size=logits_chunk, sample_weights=sample_weights
        )
    logits = dec.logits(params["llm"], cfg.llm, hidden)
    return losses.shifted_clm_loss(logits, labels, sample_weights=sample_weights)


def stage1_loss(cfg: vlm.VLMConfig, pad_token_id: int, *, remat: bool = True,
                logits_chunk: Optional[int] = None, ce_impl: str = "auto",
                compute_dtype=None, mesh=None):
    """[visual; caption] CLM loss (reference: Stage1/projector_trainer.py:160-233).
    batch: {'pixel_values': [B,H,W,C], 'caption_ids': [B,Tc]} (fixed 512-len captions).
    ``logits_chunk`` switches to the memory-efficient chunked CE (large-vocab models);
    ``ce_impl`` 'auto' upgrades it to the Pallas fused kernel on TPU (the Stage-1 LLM —
    including the vocab table — is always frozen, so the fused contract holds).
    ``compute_dtype`` (trainers pass bf16 from ``--mixed_precision``) casts params to
    the compute dtype inside the loss — fp32 masters, bf16 MXU matmuls. None = compute
    in the params' own dtype (exact-parity mode for tests)."""
    impl = _resolve_ce_impl(ce_impl, table_frozen=True,
                            hidden_size=cfg.llm.hidden_size, mesh=mesh,
                            vocab_size=cfg.llm.vocab_size)

    def loss_fn(params, batch, rng):
        del rng
        if compute_dtype is not None:
            params = dtypes.cast_compute_params(params, compute_dtype)
        with _flash_ctx(mesh):
            return _stage1_body(params, batch)

    def _stage1_body(params, batch):
        visual = vlm.visual_embeds(params, cfg, batch["pixel_values"],
                                   remat=_vis_remat(remat))
        embeds, mask, labels = vlm.build_sequence(
            params, cfg, visual, pad_token_id=pad_token_id,
            caption_ids=batch["caption_ids"],
        )
        loss, n_tok = _clm_loss_from_embeds(
            params, cfg, embeds, mask, labels, remat=remat, logits_chunk=logits_chunk,
            sample_weights=batch.get("sample_weight"), ce_impl=impl,
            mesh=mesh if impl == "fused" else None,
            loss_prefix=visual.shape[1],  # visual labels are statically -100
        )
        return loss, {"tokens": n_tok}

    return loss_fn


# ---------------------------------------------------------------------------- stage 2


def stage2_loss(cfg: vlm.VLMConfig, pad_token_id: int, *, lora_cfg=None,
                remat: bool = True, logits_chunk: Optional[int] = None,
                ce_impl: str = "auto", table_frozen: Optional[bool] = None,
                compute_dtype=None, mesh=None):
    """[visual; question; answer] answer-masked CLM loss (reference:
    Stage2/trainer.py:306-418). batch: {'pixel_values', 'question_ids', 'answer_ids'}
    (bucketed static shapes). LoRA adapters, when configured, live at params['lora'].

    ``table_frozen`` gates the Pallas fused-CE upgrade under ``ce_impl='auto'``: LoRA
    runs never train the embedding (reference adapter targets exclude it), so it
    defaults to ``lora_cfg is not None``; a full-LLM fine-tune keeps the chunked path.
    Trainers that freeze the LLM without LoRA may pass ``table_frozen=True``."""
    if table_frozen is None:
        table_frozen = lora_cfg is not None
    impl = _resolve_ce_impl(ce_impl, table_frozen=table_frozen,
                            hidden_size=cfg.llm.hidden_size, mesh=mesh,
                            vocab_size=cfg.llm.vocab_size)

    def loss_fn(params, batch, rng):
        # rng (train steps pass one; eval passes None) drives LoRA dropout — the
        # PEFT ``lora_dropout=0.05`` semantics of the reference recipe
        # (Stage2/train_vqa_stage2.py:236). dropout=0 or rng=None is the identity.
        if compute_dtype is not None:
            params = dtypes.cast_compute_params(params, compute_dtype)
        with _flash_ctx(mesh):
            return _stage2_body(params, batch, rng)

    def _stage2_body(params, batch, rng):
        visual = vlm.visual_embeds(params, cfg, batch["pixel_values"],
                                   remat=_vis_remat(remat))
        embeds, mask, labels = vlm.build_sequence(
            params, cfg, visual, pad_token_id=pad_token_id,
            question_ids=batch["question_ids"], answer_ids=batch["answer_ids"],
        )
        lora = params.get("lora") if lora_cfg is not None else None
        # hardware-RNG dropout stream: threefry mask synthesis costs ~25% of an 8B
        # QLoRA step (bench --lora_dropout A/B); rbg re-key removes it (train/lora.py)
        lora_rng = (lora_mod.dropout_stream(rng)
                    if lora is not None and lora_cfg.dropout > 0.0 else None)
        loss, n_tok = _clm_loss_from_embeds(
            params, cfg, embeds, mask, labels, remat=remat, logits_chunk=logits_chunk,
            lora=lora, lora_cfg=lora_cfg, lora_rng=lora_rng,
            sample_weights=batch.get("sample_weight"),
            ce_impl=impl, mesh=mesh if impl == "fused" else None,
            # visual AND question labels are statically -100 (answer-only supervision,
            # build_sequence supervised=False for questions) — crop the head to the
            # answer region
            loss_prefix=visual.shape[1] + batch["question_ids"].shape[1],
        )
        return loss, {"tokens": n_tok}

    return loss_fn


# ---------------------------------------------------------------------------- stage 0


def stage0_loss(cfg: siglip.SiglipConfig, *, remat: bool = True,
                local_negatives_shards: int = 1, compute_dtype=None, mesh=None):
    """SigLIP sigmoid pairwise loss on the full dual tower (reference:
    Stage0/train_vision_encoder_stage0.py:661-689). batch: {'pixel_values', 'input_ids'}.

    DP semantics: the reference computes this loss per-rank over the LOCAL batch (plain
    DDP grad averaging, no cross-device negative exchange). Under pjit the batch is one
    global array, so ``local_negatives_shards=N`` splits the global batch into N groups
    and averages their pairwise losses — set it to the data-axis size to reproduce the
    reference's per-rank negatives exactly (XLA keeps each group's [b/N, b/N] logits on
    its own shard; no cross-shard matmul is generated). The default 1 gives GLOBAL
    negatives — more informative gradients, a deliberate improvement knob.
    """

    def loss_fn(params, batch, rng):
        del rng
        if compute_dtype is not None:
            params = dtypes.cast_compute_params(params, compute_dtype)
        with _flash_ctx(mesh):
            img, txt, scale, bias = siglip.forward_contrastive(
                params, cfg, batch["pixel_values"], batch["input_ids"], remat=remat
            )
        w = batch.get("sample_weight")  # 0 for straggler-batch filler rows: a filler
        # duplicating a real row is a false negative in the pairwise matrix
        valid = batch.get("valid")  # missing-image placeholders — the reference's
        # collate drops them before the loss (Stage0:237-257)
        if valid is not None:
            vf = valid.astype(jnp.float32)
            w = vf if w is None else w * vf
        if local_negatives_shards > 1:
            b = img.shape[0]
            per = b // local_negatives_shards
            img_s = img.reshape(local_negatives_shards, per, -1)
            txt_s = txt.reshape(local_negatives_shards, per, -1)
            w_s = (jnp.ones((local_negatives_shards, per), jnp.float32) if w is None
                   else w.reshape(local_negatives_shards, per))
            shard_losses = jax.vmap(
                lambda i, t, sw: losses.siglip_pairwise_loss(
                    i, t, scale[0], bias[0], sample_weight=sw)
            )(img_s, txt_s, w_s)
            # fillers sit at the batch tail, so a straggler batch can leave whole
            # shards with zero real rows (loss 0); average only over shards that
            # have real rows or the step's loss/grads deflate by the empty count
            nonempty = (w_s.sum(axis=1) > 0).astype(shard_losses.dtype)
            loss = ((shard_losses * nonempty).sum()
                    / jnp.maximum(nonempty.sum(), 1.0))
        else:
            loss = losses.siglip_pairwise_loss(img, txt, scale[0], bias[0],
                                               sample_weight=w)
        return loss, {}

    return loss_fn


# ---------------------------------------------------------------------------- classifier


def classifier_loss(cfg: cls_model.ClassifierConfig, *, multilabel: bool = False,
                    t_p: float = 4.0, t_n: float = 1.0, compute_dtype=None):
    """cls_evaluate probe loss: softmax CE (train_utils) or two-way multi-label
    (train_twoway_loss). batch: {'pixel_values', 'target_indices' | 'targets'}."""

    def loss_fn(params, batch, rng):
        if compute_dtype is not None:
            params = dtypes.cast_compute_params(params, compute_dtype)
        logits = cls_model.forward(params, cfg, batch["pixel_values"], dropout_rng=rng)
        if multilabel:
            loss = losses.two_way_multilabel_loss(
                logits, batch["targets"], t_p=t_p, t_n=t_n,
                sample_weights=batch.get("sample_weight"),
            )
        else:
            loss = losses.softmax_ce_loss(
                logits, batch["target_indices"],
                sample_weights=batch.get("sample_weight"),
            )
        return loss, {"logits": logits}

    return loss_fn


# ---------------------------------------------------------------------------- eval


def make_eval_step(loss_fn: Callable):
    def step(params, batch):
        loss, aux = loss_fn(params, batch, None)
        return loss, aux

    return jax.jit(step)
