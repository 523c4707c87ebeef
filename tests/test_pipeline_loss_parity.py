"""Full-pipeline loss parity vs torch/HF: the BASELINE north-star check in miniature.

Assembles the reference's exact Stage-1 and Stage-2 computations out of HF torch modules
(SiglipVisionModel + Gemma3ForCausalLM + the reference MLPProjector, CLS-drop, concat,
masking, shifted CE) and compares the scalar loss against our jitted stage losses on
identical weights and identical batches. Target: well under the 1% loss-parity budget
(fp32 on CPU -> agreement to ~1e-4 relative).
"""

import numpy as np
import pytest
import torch
import torch.nn as nn

import jax
import jax.numpy as jnp

from projectiontrainer_tpu.models import decoder as dec
from projectiontrainer_tpu.models import projector as proj
from projectiontrainer_tpu.models import siglip, vlm
from projectiontrainer_tpu.train import steps

pytestmark = pytest.mark.slow  # torch/HF parity fixtures dominate the suite runtime


@pytest.fixture(scope="module")
def torch_stack():
    from transformers import Gemma3TextConfig, SiglipVisionConfig
    from transformers.models.gemma3.modeling_gemma3 import Gemma3ForCausalLM
    from transformers.models.siglip.modeling_siglip import SiglipVisionModel

    torch.manual_seed(0)
    vis_cfg = SiglipVisionConfig(
        hidden_size=48, intermediate_size=96, num_hidden_layers=2,
        num_attention_heads=4, image_size=32, patch_size=8,
        attn_implementation="eager",
    )
    llm_cfg = Gemma3TextConfig(
        vocab_size=97, hidden_size=40, intermediate_size=80, num_hidden_layers=2,
        num_attention_heads=2, num_key_value_heads=1, head_dim=20, sliding_window=8,
        query_pre_attn_scalar=20, max_position_embeddings=256,
        attn_implementation="eager",
    )
    vision = SiglipVisionModel(vis_cfg).eval()
    llm = Gemma3ForCausalLM(llm_cfg).eval()

    class TorchProjector(nn.Module):
        def __init__(self):
            super().__init__()
            self.model = nn.Sequential(
                nn.Linear(48, 96), nn.GELU(), nn.Linear(96, 40)
            )

        def forward(self, x):
            return self.model(x)

    projector = TorchProjector().eval()
    return vis_cfg, llm_cfg, vision, llm, projector


@pytest.fixture(scope="module")
def jax_stack(torch_stack):
    vis_cfg, llm_cfg, vision, llm, projector = torch_stack
    jvis = siglip.VisionConfig(
        hidden_size=48, intermediate_size=96, num_layers=2, num_heads=4,
        image_size=32, patch_size=8, use_head=False,
    )
    jllm = dec.from_hf_config(llm_cfg)
    jproj = proj.ProjectorConfig(vision_dim=48, llm_dim=40, expansion_factor=2)
    cfg = vlm.VLMConfig(vision=jvis, projector=jproj, llm=jllm)

    vis_sd = {k: v.detach().numpy() for k, v in vision.state_dict().items()}
    llm_sd = {k: v.detach().numpy() for k, v in llm.state_dict().items()}
    proj_sd = {k.removeprefix("model."): v.detach().numpy()
               for k, v in projector.state_dict().items()}
    params = {
        "vision": siglip.vision_params_from_hf_state_dict(jvis, vis_sd),
        "llm": dec.params_from_hf_state_dict(jllm, llm_sd),
        "projector": proj.params_from_torch_state_dict(proj_sd),
    }
    return cfg, params


PAD = 0


def _torch_stage1_loss(vision, llm, projector, pixels_nchw, caption_ids):
    """Reference Stage-1 computation (Stage1/projector_trainer.py:160-233)."""
    with torch.no_grad():
        hidden = vision(pixel_values=torch.tensor(pixels_nchw)).last_hidden_state
        patches = hidden[:, 1:, :]  # CLS-drop quirk
        projected = projector(patches)
        ids = torch.tensor(caption_ids)
        embeds = llm.get_input_embeddings()(ids)
        combined = torch.cat([projected, embeds], dim=1)
        b, v_len = projected.shape[0], projected.shape[1]
        attn = torch.cat(
            [torch.ones(b, v_len, dtype=torch.long), (ids != PAD).long()], dim=1
        )
        labels = ids.clone()
        labels[labels == PAD] = -100
        labels = torch.cat(
            [torch.full((b, v_len), -100, dtype=torch.long), labels], dim=1
        )
        out = llm(inputs_embeds=combined, attention_mask=attn, labels=labels)
        return float(out.loss)


def _torch_stage2_loss(vision, llm, projector, pixels_nchw, q_ids, a_ids):
    """Reference Stage-2 computation (Stage2/trainer.py:306-418)."""
    with torch.no_grad():
        hidden = vision(pixel_values=torch.tensor(pixels_nchw)).last_hidden_state
        projected = projector(hidden[:, 1:, :])
        q = torch.tensor(q_ids)
        a = torch.tensor(a_ids)
        embed = llm.get_input_embeddings()
        q_emb, a_emb = embed(q), embed(a)
        combined = torch.cat([projected, q_emb, a_emb], dim=1)
        b, v_len = projected.shape[0], projected.shape[1]
        attn = torch.cat(
            [torch.ones(b, v_len, dtype=torch.long), (q != PAD).long(), (a != PAD).long()],
            dim=1,
        )
        a_labels = a.clone()
        a_labels[a_labels == PAD] = -100
        labels = torch.cat(
            [torch.full((b, v_len + q.shape[1]), -100, dtype=torch.long), a_labels],
            dim=1,
        )
        logits = llm(inputs_embeds=combined, attention_mask=attn).logits.float()
        shift_logits = logits[..., :-1, :].reshape(-1, logits.shape[-1])
        shift_labels = labels[..., 1:].reshape(-1)
        return float(nn.CrossEntropyLoss()(shift_logits, shift_labels))


def test_stage1_loss_parity(torch_stack, jax_stack):
    _, _, vision, llm, projector = torch_stack
    cfg, params = jax_stack
    rng = np.random.default_rng(0)
    pixels = rng.normal(size=(2, 3, 32, 32)).astype(np.float32) * 0.5
    ids = rng.integers(1, 97, size=(2, 10))
    ids[0, 7:] = PAD

    expected = _torch_stage1_loss(vision, llm, projector, pixels, ids)
    loss_fn = steps.stage1_loss(cfg, PAD, remat=False)
    loss, aux = loss_fn(
        params,
        {"pixel_values": jnp.asarray(pixels.transpose(0, 2, 3, 1)),
         "caption_ids": jnp.asarray(ids)},
        None,
    )
    np.testing.assert_allclose(float(loss), expected, rtol=2e-4)


def test_stage1_loss_parity_chunked(torch_stack, jax_stack):
    _, _, vision, llm, projector = torch_stack
    cfg, params = jax_stack
    rng = np.random.default_rng(1)
    pixels = rng.normal(size=(2, 3, 32, 32)).astype(np.float32) * 0.5
    ids = rng.integers(1, 97, size=(2, 12))

    expected = _torch_stage1_loss(vision, llm, projector, pixels, ids)
    loss_fn = steps.stage1_loss(cfg, PAD, remat=False, logits_chunk=7)
    loss, _ = loss_fn(
        params,
        {"pixel_values": jnp.asarray(pixels.transpose(0, 2, 3, 1)),
         "caption_ids": jnp.asarray(ids)},
        None,
    )
    np.testing.assert_allclose(float(loss), expected, rtol=2e-4)


def test_stage2_loss_parity(torch_stack, jax_stack):
    _, _, vision, llm, projector = torch_stack
    cfg, params = jax_stack
    rng = np.random.default_rng(2)
    pixels = rng.normal(size=(2, 3, 32, 32)).astype(np.float32) * 0.5
    q_ids = rng.integers(1, 97, size=(2, 6))
    a_ids = rng.integers(1, 97, size=(2, 8))
    a_ids[1, 5:] = PAD

    expected = _torch_stage2_loss(vision, llm, projector, pixels, q_ids, a_ids)
    loss_fn = steps.stage2_loss(cfg, PAD, remat=False)
    loss, _ = loss_fn(
        params,
        {"pixel_values": jnp.asarray(pixels.transpose(0, 2, 3, 1)),
         "question_ids": jnp.asarray(q_ids), "answer_ids": jnp.asarray(a_ids)},
        None,
    )
    np.testing.assert_allclose(float(loss), expected, rtol=2e-4)


def test_stage1_multi_step_loss_curve_parity(torch_stack, jax_stack):
    """~50 optimizer steps on identical data vs the torch reference recipe
    (AdamW + HF cosine-with-warmup + global clip 5.0, projector-only — the actual
    north-star fidelity statement, BASELINE 1% budget). A one-forward parity test
    cannot catch optimizer/schedule drift; this does (VERDICT r1 item 5)."""
    import math

    from transformers import get_cosine_schedule_with_warmup

    _, _, vision, llm, t_projector = torch_stack
    cfg, params0 = jax_stack

    n_steps, lr, warmup_ratio, clip, wd = 50, 1e-3, 0.1, 5.0, 0.01
    rng = np.random.default_rng(42)
    batches = []
    for _ in range(4):  # cycle 4 fixed batches
        pixels = rng.normal(size=(2, 3, 32, 32)).astype(np.float32) * 0.5
        ids = rng.integers(1, 97, size=(2, 10))
        ids[0, 7:] = PAD
        batches.append((pixels, ids))

    # ---- torch side: the reference Stage-1 train loop in miniature
    import copy

    projector = copy.deepcopy(t_projector).train()
    for m in (vision, llm):
        for p in m.parameters():
            p.requires_grad_(False)
    opt = torch.optim.AdamW(projector.parameters(), lr=lr, betas=(0.9, 0.999),
                            eps=1e-8, weight_decay=wd)
    sched = get_cosine_schedule_with_warmup(
        opt, num_warmup_steps=math.ceil(warmup_ratio * n_steps),
        num_training_steps=n_steps)

    def torch_loss(pixels, ids):
        with torch.no_grad():
            hidden = vision(pixel_values=torch.tensor(pixels)).last_hidden_state
        projected = projector(hidden[:, 1:, :])
        t_ids = torch.tensor(ids)
        embeds = llm.get_input_embeddings()(t_ids)
        combined = torch.cat([projected, embeds], dim=1)
        b, v_len = projected.shape[0], projected.shape[1]
        attn = torch.cat(
            [torch.ones(b, v_len, dtype=torch.long), (t_ids != PAD).long()], dim=1)
        labels = t_ids.clone()
        labels[labels == PAD] = -100
        labels = torch.cat(
            [torch.full((b, v_len), -100, dtype=torch.long), labels], dim=1)
        return llm(inputs_embeds=combined, attention_mask=attn, labels=labels).loss

    t_losses = []
    for i in range(n_steps):
        pixels, ids = batches[i % len(batches)]
        opt.zero_grad()
        loss = torch_loss(pixels, ids)
        loss.backward()
        torch.nn.utils.clip_grad_norm_(projector.parameters(), clip)
        opt.step()
        sched.step()
        t_losses.append(float(loss.detach()))

    # ---- JAX side: the framework's own step machinery
    from projectiontrainer_tpu.train import masks, optim

    labels_tree = masks.stage1_labels(params0)
    tx, _ = optim.single_group_optimizer(
        labels_tree, lr, total_steps=n_steps, warmup_ratio=warmup_ratio,
        clip_norm=clip, weight_decay=wd)
    loss_fn = steps.stage1_loss(cfg, PAD, remat=False)
    step = steps.make_train_step(loss_fn, tx, donate=False,
                                 trainable_mask=masks.bool_mask(labels_tree))
    state = steps.init_state(jax.tree.map(jnp.asarray, params0), tx)
    j_losses = []
    for i in range(n_steps):
        pixels, ids = batches[i % len(batches)]
        batch = {"pixel_values": jnp.asarray(pixels.transpose(0, 2, 3, 1)),
                 "caption_ids": jnp.asarray(ids)}
        state, loss, _ = step(state, batch, jax.random.key(i))
        j_losses.append(float(loss))

    t_arr, j_arr = np.asarray(t_losses), np.asarray(j_losses)
    rel = np.abs(j_arr - t_arr) / np.abs(t_arr)
    assert t_arr[-1] < t_arr[0], "torch curve did not decrease — test not meaningful"
    assert j_arr[-1] < j_arr[0], "jax curve did not decrease"
    # the BASELINE north-star budget is 1%; fp32 CPU agreement should be far tighter
    assert rel.max() < 1e-2, f"loss curves diverged: max rel {rel.max():.2e} at step {rel.argmax()}"
    assert rel.mean() < 2e-3, f"mean rel drift {rel.mean():.2e}"


def test_stage0_multi_step_loss_curve_parity():
    """~30 optimizer steps of the stage-0 contrastive recipe vs the torch reference
    loop (Stage0/train_vision_encoder_stage0.py:555-733): full SigLIP dual tower with
    frozen text encoder + logit_scale + first-k vision layers (freeze_layers_ratio),
    eye-labels sigmoid loss with logit_bias, AdamW + cosine warmup with stage 0's
    floor-rounded warmup steps (int(ratio*max_steps), :598) and NO gradient clipping.
    The fractional warmup product (30 * 0.085 = 2.55) pins the floor-vs-ceil rounding."""
    import math  # noqa: F401  (documents the rounding contrast; reference uses int())

    from transformers import get_cosine_schedule_with_warmup

    from projectiontrainer_tpu.train import masks, optim
    from tests.test_siglip_parity import _hf_siglip, _port

    import copy

    cfg, model = _hf_siglip()
    jcfg, params0 = _port(cfg, model)
    n_layers = len(params0["vision"]["layers"])

    n_steps, lr, warmup_ratio, wd, ratio = 30, 1e-4, 0.085, 0.01, 0.4
    rng = np.random.default_rng(11)
    batches = []
    for _ in range(4):
        pixels = rng.normal(size=(4, 3, 32, 32)).astype(np.float32) * 0.5
        ids = rng.integers(1, 99, size=(4, 16))  # full-length: no padding ambiguity
        batches.append((pixels, ids))

    # ---- torch side: reference freeze policy + loop. Train a DEEPCOPY: the ported
    # params alias the live torch storage (state_dict().numpy() views + CPU jax
    # zero-copy asarray), so training the original would silently mutate the JAX side.
    model = copy.deepcopy(model).train()
    for p in model.text_model.parameters():
        p.requires_grad_(False)
    model.logit_scale.requires_grad_(False)
    n_freeze = int(n_layers * ratio)
    for i, layer in enumerate(model.vision_model.encoder.layers):
        if i < n_freeze:
            for p in layer.parameters():
                p.requires_grad_(False)
    params_to_optimize = [p for p in model.parameters() if p.requires_grad]
    opt = torch.optim.AdamW(params_to_optimize, lr=lr, weight_decay=wd)
    sched = get_cosine_schedule_with_warmup(
        opt, num_warmup_steps=int(warmup_ratio * n_steps),  # stage 0: int(), not ceil
        num_training_steps=n_steps)

    def torch_loss(pixels, ids):
        out = model(input_ids=torch.tensor(ids), pixel_values=torch.tensor(pixels),
                    attention_mask=torch.ones_like(torch.tensor(ids)),
                    return_loss=False, return_dict=True)
        img = nn.functional.normalize(out.image_embeds, p=2, dim=1)
        txt = nn.functional.normalize(out.text_embeds, p=2, dim=1)
        logits = img @ txt.t() * model.logit_scale.exp() + model.logit_bias
        n = logits.size(0)
        return nn.functional.binary_cross_entropy_with_logits(
            logits, torch.eye(n), reduction="sum") / n

    t_losses = []
    for i in range(n_steps):
        pixels, ids = batches[i % len(batches)]
        opt.zero_grad()
        loss = torch_loss(pixels, ids)
        loss.backward()
        opt.step()
        sched.step()
        t_losses.append(float(loss.detach()))

    # ---- JAX side: the stage-0 trainer's own wiring
    params = jax.tree.map(jnp.asarray, params0)
    labels_tree = masks.stage0_labels(
        params, freeze_text=True, freeze_logit_scale=True,
        freeze_layers_ratio=ratio, num_vision_layers=n_layers)
    tx, _ = optim.single_group_optimizer(
        labels_tree, lr, total_steps=n_steps, warmup_ratio=warmup_ratio,
        weight_decay=wd, warmup_rounding="floor")
    loss_fn = steps.stage0_loss(jcfg, remat=False)
    step = steps.make_train_step(loss_fn, tx, donate=False,
                                 trainable_mask=masks.bool_mask(labels_tree))
    state = steps.init_state(params, tx)
    j_losses = []
    for i in range(n_steps):
        pixels, ids = batches[i % len(batches)]
        batch = {"pixel_values": jnp.asarray(pixels.transpose(0, 2, 3, 1)),
                 "input_ids": jnp.asarray(ids)}
        state, loss, _ = step(state, batch, None)
        j_losses.append(float(loss))

    t_arr, j_arr = np.asarray(t_losses), np.asarray(j_losses)
    rel = np.abs(j_arr - t_arr) / np.abs(t_arr)
    assert t_arr[-1] < t_arr[0], "torch curve did not decrease — test not meaningful"
    assert j_arr[-1] < j_arr[0], "jax curve did not decrease"
    assert rel.max() < 1e-2, f"loss curves diverged: max rel {rel.max():.2e} at step {rel.argmax()}"
    assert rel.mean() < 2e-3, f"mean rel drift {rel.mean():.2e}"


def _run_cls_curve_parity(freeze_at=None):
    """~30 optimizer steps of the cls_evaluate probe recipe vs the torch reference loop
    (cls_evaluate/train_utils.py:219-335): AbnormalityClassifier (SigLIP backbone +
    query MHA head) under discriminative CONSTANT LRs — AdamW param groups at bb_lr
    (backbone) and lr (head) with NO scheduler (:257-261) — softmax CE on class
    indices. ``freeze_at=k`` flips the backbone to frozen before step k, the
    1EpochUnfreeze boundary: torch flips requires_grad on ONE persistent AdamW
    (:286-308), JAX swaps optimizers via steps.swap_optimizer which must carry the
    head group's Adam moments for the curves to stay matched."""
    import copy

    from transformers import SiglipVisionConfig
    from transformers.models.siglip.modeling_siglip import SiglipVisionModel

    from projectiontrainer_tpu.models import classifier, siglip
    from projectiontrainer_tpu.train import masks, optim

    hidden, heads, ncls = 32, 4, 5
    vcfg_hf = SiglipVisionConfig(
        hidden_size=hidden, intermediate_size=hidden * 4, num_hidden_layers=2,
        num_attention_heads=heads, image_size=16, patch_size=8,
        attn_implementation="eager",
    )
    torch.manual_seed(5)
    backbone = SiglipVisionModel(vcfg_hf)

    class TorchHead(nn.Module):
        """Reference head (cls_evaluate/models.py:107-139), dropout 0 for determinism."""

        def __init__(self):
            super().__init__()
            self.queries = nn.Parameter(torch.randn(1, ncls, hidden))
            self.mha = nn.MultiheadAttention(hidden, heads, batch_first=True)
            self.head = nn.Linear(hidden, 1)

        def forward(self, feats):
            q = self.queries.repeat(feats.shape[0], 1, 1)
            out, _ = self.mha(q, feats, feats)
            return self.head(out).squeeze(-1)

    head = TorchHead()

    vcfg = siglip.VisionConfig(
        hidden_size=hidden, intermediate_size=hidden * 4, num_layers=2,
        num_heads=heads, image_size=16, patch_size=8, use_head=False,
    )
    ccfg = classifier.ClassifierConfig(vision=vcfg, num_classes=ncls, num_heads=heads,
                                       dropout_rate=0.0)
    sd = {}
    for k, v in backbone.state_dict().items():
        sd["vision_model." + k.removeprefix("vision_model.")] = v.detach().numpy().copy()
    sd["abnormality_queries"] = head.queries.detach().numpy().copy()
    sd["mha.in_proj_weight"] = head.mha.in_proj_weight.detach().numpy().copy()
    sd["mha.in_proj_bias"] = head.mha.in_proj_bias.detach().numpy().copy()
    sd["mha.out_proj.weight"] = head.mha.out_proj.weight.detach().numpy().copy()
    sd["mha.out_proj.bias"] = head.mha.out_proj.bias.detach().numpy().copy()
    sd["classification_head.weight"] = head.head.weight.detach().numpy().copy()
    sd["classification_head.bias"] = head.head.bias.detach().numpy().copy()
    params = jax.tree.map(jnp.asarray, classifier.params_from_torch_state_dict(ccfg, sd))

    n_steps, head_lr, bb_lr, wd = 30, 1e-3, 1e-4, 0.01
    rng = np.random.default_rng(13)
    batches = []
    for _ in range(4):
        pixels = rng.normal(size=(4, 3, 16, 16)).astype(np.float32) * 0.5
        targets = rng.integers(0, ncls, size=(4,))
        batches.append((pixels, targets))

    # ---- torch side (deepcopies: the ported params alias live torch storage)
    backbone, head = copy.deepcopy(backbone).train(), copy.deepcopy(head).train()
    head_params = ([head.queries] + list(head.mha.parameters())
                   + list(head.head.parameters()))
    opt = torch.optim.AdamW(
        [{"params": list(backbone.parameters()), "lr": bb_lr},
         {"params": head_params, "lr": head_lr}],
        weight_decay=wd)  # no scheduler — constant LRs (train_utils.py:257-261)
    criterion = nn.CrossEntropyLoss()

    t_losses = []
    for i in range(n_steps):
        if freeze_at is not None and i == freeze_at:
            # the reference's dynamic freeze: requires_grad flip on the live optimizer
            backbone.requires_grad_(False)
            backbone.eval()
        pixels, targets = batches[i % len(batches)]
        opt.zero_grad()
        feats = backbone(pixel_values=torch.tensor(pixels)).last_hidden_state
        loss = criterion(head(feats), torch.tensor(targets))
        loss.backward()
        opt.step()
        t_losses.append(float(loss.detach()))

    # ---- JAX side: the cls trainer's own wiring
    def build(frozen):
        labels_tree = masks.classifier_labels(params, freeze_vision=frozen)
        tx, _ = optim.discriminative_optimizer(
            labels_tree, head_lr=head_lr, backbone_lr=bb_lr, total_steps=n_steps,
            weight_decay=wd)
        step = steps.make_train_step(loss_fn, tx, donate=False,
                                     trainable_mask=masks.bool_mask(labels_tree))
        return step, tx

    loss_fn = steps.classifier_loss(ccfg)
    step, tx = build(False)
    state = steps.init_state(params, tx)
    j_losses = []
    for i in range(n_steps):
        if freeze_at is not None and i == freeze_at:
            step, tx_frozen = build(True)
            state = steps.swap_optimizer(state, tx_frozen)
        pixels, targets = batches[i % len(batches)]
        batch = {"pixel_values": jnp.asarray(pixels.transpose(0, 2, 3, 1)),
                 "target_indices": jnp.asarray(targets)}
        state, loss, _ = step(state, batch, None)
        j_losses.append(float(loss))

    t_arr, j_arr = np.asarray(t_losses), np.asarray(j_losses)
    rel = np.abs(j_arr - t_arr) / np.abs(t_arr)
    assert t_arr[-1] < t_arr[0], "torch curve did not decrease — test not meaningful"
    assert j_arr[-1] < j_arr[0], "jax curve did not decrease"
    assert rel.max() < 1e-2, f"loss curves diverged: max rel {rel.max():.2e} at step {rel.argmax()}"
    assert rel.mean() < 2e-3, f"mean rel drift {rel.mean():.2e}"


def test_cls_multi_step_loss_curve_parity():
    """Unfreeze mode: backbone trains throughout. Completes the per-recipe curve-parity
    matrix (stage 0/1/2/cls)."""
    _run_cls_curve_parity()


def test_cls_1epoch_unfreeze_transition_curve_parity():
    """1EpochUnfreeze: backbone trains for the first 10 steps, then is frozen — the
    epoch boundary where trainer_cls swaps optimizers. Parity holds only if the head
    group's Adam moments survive the swap (steps.swap_optimizer)."""
    _run_cls_curve_parity(freeze_at=10)


def test_stage2_full_joint_multi_step_loss_curve_parity(torch_stack, jax_stack):
    """~30 optimizer steps of the stage-2 FULL-JOINT recipe (BASELINE config #4: VE +
    projector + LLM all trainable — the reference's epoch-0 ``--train_ve_first_epoch``
    state with QLoRA off, Stage2/train_vqa_stage2.py:121-134, trainer.py:189-246) vs
    the torch reference loop. This is the one recipe with a numeric regime the other
    curve tests never touch: the CHUNKED CE runs with a TRAINABLE vocab table (its
    table cotangent must flow — the fused Pallas CE is disallowed here by
    steps._resolve_ce_impl), the vision tower takes gradients through the projector
    concat, and per-module clip 1.0 spans THREE top-level groups (vision / projector /
    llm) instead of one. AdamW + HF cosine-with-warmup, fp32 masters+moments (the
    --master_dtype fp32 default; fp32 is what CPU torch runs, so curve agreement here
    pins the fp32-master policy's semantics, VERDICT r4 weak #1)."""
    import copy
    import math

    from transformers import get_cosine_schedule_with_warmup

    from projectiontrainer_tpu.train import masks, optim

    _, _, vision, llm, projector = torch_stack
    cfg, params0 = jax_stack

    n_steps, lr, warmup_ratio, clip, wd = 30, 3e-4, 0.1, 1.0, 0.01
    rng = np.random.default_rng(23)
    batches = []
    for _ in range(4):
        pixels = rng.normal(size=(2, 3, 32, 32)).astype(np.float32) * 0.5
        q_ids = rng.integers(1, 97, size=(2, 6))
        a_ids = rng.integers(1, 97, size=(2, 8))
        a_ids[0, 6:] = PAD
        batches.append((pixels, q_ids, a_ids))

    # ---- torch side: EVERYTHING trains (deepcopies — ported params alias torch
    # storage). Per-module clipping mirrors the reference's loop over the trainable
    # modules (Stage2/trainer.py:427-439): each of vision/projector/llm is clipped
    # to 1.0 as its own group.
    vision2 = copy.deepcopy(vision).train()
    llm2 = copy.deepcopy(llm).train()
    projector2 = copy.deepcopy(projector).train()
    for m in (vision2, llm2, projector2):
        for p in m.parameters():
            p.requires_grad_(True)
    module_groups = [list(vision2.parameters()), list(projector2.parameters()),
                     list(llm2.parameters())]
    opt = torch.optim.AdamW(
        [p for g in module_groups for p in g], lr=lr, betas=(0.9, 0.999),
        eps=1e-8, weight_decay=wd)
    sched = get_cosine_schedule_with_warmup(
        opt, num_warmup_steps=math.ceil(warmup_ratio * n_steps),
        num_training_steps=n_steps)

    def torch_loss(pixels, q_ids, a_ids):
        hidden = vision2(pixel_values=torch.tensor(pixels)).last_hidden_state
        projected = projector2(hidden[:, 1:, :])
        q, a = torch.tensor(q_ids), torch.tensor(a_ids)
        embed = llm2.get_input_embeddings()
        combined = torch.cat([projected, embed(q), embed(a)], dim=1)
        b, v_len = projected.shape[0], projected.shape[1]
        attn = torch.cat(
            [torch.ones(b, v_len, dtype=torch.long), (q != PAD).long(),
             (a != PAD).long()], dim=1)
        a_labels = a.clone()
        a_labels[a_labels == PAD] = -100
        labels = torch.cat(
            [torch.full((b, v_len + q.shape[1]), -100, dtype=torch.long), a_labels],
            dim=1)
        logits = llm2(inputs_embeds=combined, attention_mask=attn).logits.float()
        shift_logits = logits[..., :-1, :].reshape(-1, logits.shape[-1])
        shift_labels = labels[..., 1:].reshape(-1)
        return nn.CrossEntropyLoss()(shift_logits, shift_labels)

    t_losses = []
    for i in range(n_steps):
        pixels, q_ids, a_ids = batches[i % len(batches)]
        opt.zero_grad()
        loss = torch_loss(pixels, q_ids, a_ids)
        loss.backward()
        for g in module_groups:
            torch.nn.utils.clip_grad_norm_(g, clip)
        opt.step()
        sched.step()
        t_losses.append(float(loss.detach()))

    # ---- JAX side: the trainer's full-joint wiring — chunked CE with the trainable
    # table (logits_chunk small enough to split the 14-token suffix into 2 chunks)
    params = jax.tree.map(jnp.asarray, params0)
    labels_tree = masks.stage2_labels(
        params, masks.Stage2Freeze(train_llm=True, use_lora=False,
                                   train_projector=True, train_vision=True))
    tx, _ = optim.single_group_optimizer(
        labels_tree, lr, total_steps=n_steps, warmup_ratio=warmup_ratio,
        clip_norm=clip, clip_per_module=True, weight_decay=wd)
    loss_fn = steps.stage2_loss(cfg, PAD, remat=False, logits_chunk=7,
                                table_frozen=False)
    step = steps.make_train_step(loss_fn, tx, donate=False,
                                 trainable_mask=masks.bool_mask(labels_tree))
    state = steps.init_state(params, tx)
    j_losses = []
    for i in range(n_steps):
        pixels, q_ids, a_ids = batches[i % len(batches)]
        batch = {"pixel_values": jnp.asarray(pixels.transpose(0, 2, 3, 1)),
                 "question_ids": jnp.asarray(q_ids), "answer_ids": jnp.asarray(a_ids)}
        state, loss, _ = step(state, batch, jax.random.key(i))
        j_losses.append(float(loss))

    t_arr, j_arr = np.asarray(t_losses), np.asarray(j_losses)
    rel = np.abs(j_arr - t_arr) / np.abs(t_arr)
    assert t_arr[-1] < t_arr[0], "torch curve did not decrease — test not meaningful"
    assert j_arr[-1] < j_arr[0], "jax curve did not decrease"
    assert rel.max() < 1e-2, f"loss curves diverged: max rel {rel.max():.2e} at step {rel.argmax()}"
    assert rel.mean() < 2e-3, f"mean rel drift {rel.mean():.2e}"


def test_stage2_lora_multi_step_loss_curve_parity(torch_stack, jax_stack):
    """~40 optimizer steps of the stage-2 QLoRA recipe vs a torch re-implementation of
    the reference loop (Stage2/trainer.py:306-443 with PEFT LoRA forward semantics,
    dropout=0): LoRA adapters on q/k/v/o/gate/up/down as the only trainables, answer-
    masked shifted CE, AdamW + HF cosine-with-warmup + per-module clip 1.0. Extends the
    stage-1 curve test to the LoRA update path and the per-module clipping transform —
    drift in apply_delta, the lora trainable mask, or clip grouping shows up here and
    nowhere else."""
    import copy
    import math

    from transformers import get_cosine_schedule_with_warmup

    from projectiontrainer_tpu.train import lora as lora_mod
    from projectiontrainer_tpu.train import masks, optim

    _, _, vision, llm, projector = torch_stack
    cfg, params0 = jax_stack

    n_steps, lr, warmup_ratio, clip, wd = 40, 1e-3, 0.1, 1.0, 0.01
    r, alpha = 4, 8

    rng = np.random.default_rng(7)
    batches = []
    for _ in range(4):
        pixels = rng.normal(size=(2, 3, 32, 32)).astype(np.float32) * 0.5
        q_ids = rng.integers(1, 97, size=(2, 6))
        a_ids = rng.integers(1, 97, size=(2, 8))
        a_ids[1, 5:] = PAD
        batches.append((pixels, q_ids, a_ids))

    # ---- torch side: PEFT lora.Linear forward (base(x) + B(A(x)) * alpha/r)
    class LoraLinear(nn.Module):
        def __init__(self, base):
            super().__init__()
            self.base = base
            self.lora_A = nn.Linear(base.in_features, r, bias=False)
            self.lora_B = nn.Linear(r, base.out_features, bias=False)
            # PEFT zero-inits B (no grad flows to A at step 0); init both small-random
            # instead so A's update path is exercised from the first step
            nn.init.normal_(self.lora_A.weight, std=0.1)
            nn.init.normal_(self.lora_B.weight, std=0.1)
            self.scaling = alpha / r

        def forward(self, x):
            return self.base(x) + self.lora_B(self.lora_A(x)) * self.scaling

    torch.manual_seed(7)
    llm2 = copy.deepcopy(llm)
    targets = (("self_attn", ("q_proj", "k_proj", "v_proj", "o_proj")),
               ("mlp", ("gate_proj", "up_proj", "down_proj")))
    for layer in llm2.model.layers:
        for mod_name, names in targets:
            mod = getattr(layer, mod_name)
            for n in names:
                setattr(mod, n, LoraLinear(getattr(mod, n)))
    for p in llm2.parameters():
        p.requires_grad_(False)
    lora_params = []
    for m in llm2.modules():
        if isinstance(m, LoraLinear):
            m.lora_A.weight.requires_grad_(True)
            m.lora_B.weight.requires_grad_(True)
            lora_params += [m.lora_A.weight, m.lora_B.weight]

    # snapshot the adapter init BEFORE the torch loop trains it — both sides must
    # start from identical weights
    lora_init = {}
    for i, layer in enumerate(llm2.model.layers):
        for mod_name, names in targets:
            mod = getattr(layer, mod_name)
            for n in names:
                ll = getattr(mod, n)
                lora_init[(i, n)] = (ll.lora_A.weight.detach().numpy().T.copy(),
                                     ll.lora_B.weight.detach().numpy().T.copy())

    opt = torch.optim.AdamW(lora_params, lr=lr, betas=(0.9, 0.999), eps=1e-8,
                            weight_decay=wd)
    sched = get_cosine_schedule_with_warmup(
        opt, num_warmup_steps=math.ceil(warmup_ratio * n_steps),
        num_training_steps=n_steps)

    def torch_loss(pixels, q_ids, a_ids):
        with torch.no_grad():  # vision tower and projector are frozen in this recipe
            hidden = vision(pixel_values=torch.tensor(pixels)).last_hidden_state
            projected = projector(hidden[:, 1:, :])
        q, a = torch.tensor(q_ids), torch.tensor(a_ids)
        embed = llm2.get_input_embeddings()
        combined = torch.cat([projected, embed(q), embed(a)], dim=1)
        b, v_len = projected.shape[0], projected.shape[1]
        attn = torch.cat(
            [torch.ones(b, v_len, dtype=torch.long), (q != PAD).long(), (a != PAD).long()],
            dim=1)
        a_labels = a.clone()
        a_labels[a_labels == PAD] = -100
        labels = torch.cat(
            [torch.full((b, v_len + q.shape[1]), -100, dtype=torch.long), a_labels], dim=1)
        logits = llm2.model(inputs_embeds=combined, attention_mask=attn).last_hidden_state
        logits = llm2.lm_head(logits).float()
        shift_logits = logits[..., :-1, :].reshape(-1, logits.shape[-1])
        shift_labels = labels[..., 1:].reshape(-1)
        return nn.CrossEntropyLoss()(shift_logits, shift_labels)

    t_losses = []
    for i in range(n_steps):
        pixels, q_ids, a_ids = batches[i % len(batches)]
        opt.zero_grad()
        loss = torch_loss(pixels, q_ids, a_ids)
        loss.backward()
        # reference clips each trainable module's params as one group
        # (Stage2/trainer.py:427-439); here the LLM adapters are the only group
        torch.nn.utils.clip_grad_norm_(lora_params, clip)
        opt.step()
        sched.step()
        t_losses.append(float(loss.detach()))

    # ---- JAX side: the framework's stage-2 step machinery with the same adapters
    lcfg = lora_mod.LoraConfig(r=r, alpha=alpha, dropout=0.0)
    lparams = lora_mod.init(jax.random.key(0), cfg.llm, lcfg)
    for (i, n), (a, b) in lora_init.items():
        lparams["layers"][i][n]["a"] = jnp.asarray(a)
        lparams["layers"][i][n]["b"] = jnp.asarray(b)
    params = dict(jax.tree.map(jnp.asarray, params0))
    params["lora"] = lparams

    labels_tree = masks.stage2_labels(
        params, masks.Stage2Freeze(train_llm=False, use_lora=True))
    tx, _ = optim.single_group_optimizer(
        labels_tree, lr, total_steps=n_steps, warmup_ratio=warmup_ratio,
        clip_norm=clip, clip_per_module=True, weight_decay=wd)
    loss_fn = steps.stage2_loss(cfg, PAD, lora_cfg=lcfg, remat=False)
    step = steps.make_train_step(loss_fn, tx, donate=False,
                                 trainable_mask=masks.bool_mask(labels_tree))
    state = steps.init_state(params, tx)
    j_losses = []
    for i in range(n_steps):
        pixels, q_ids, a_ids = batches[i % len(batches)]
        batch = {"pixel_values": jnp.asarray(pixels.transpose(0, 2, 3, 1)),
                 "question_ids": jnp.asarray(q_ids), "answer_ids": jnp.asarray(a_ids)}
        state, loss, _ = step(state, batch, jax.random.key(i))
        j_losses.append(float(loss))

    t_arr, j_arr = np.asarray(t_losses), np.asarray(j_losses)
    rel = np.abs(j_arr - t_arr) / np.abs(t_arr)
    assert t_arr[-1] < t_arr[0], "torch curve did not decrease — test not meaningful"
    assert j_arr[-1] < j_arr[0], "jax curve did not decrease"
    assert rel.max() < 1e-2, f"loss curves diverged: max rel {rel.max():.2e} at step {rel.argmax()}"
    assert rel.mean() < 2e-3, f"mean rel drift {rel.mean():.2e}"
