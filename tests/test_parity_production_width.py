"""Loss parity at PRODUCTION widths (VERDICT r2 next #6): hidden 2048 / 262,144 vocab.

The tiny-shape parity suite (test_pipeline_loss_parity.py) proves the 1% north-star
budget (BASELINE.json) at toy widths; the numerically-sensitive paths — the 262k-vocab
logsumexp in the CLM loss (reference hot path: /root/reference/Stage2/trainer.py:400-418
computes it in fp32) and the NF4 value grid — deserve one check at real widths. Shallow
(2 layers) and short (T=32) keeps CPU runtime sane; widths are what matter numerically.

Covers:
1. a 6-step stage-1 optimizer loss-curve vs a live torch/HF loop at 2048/262k;
2. nf4-mirror (block-int8 re-encoding of the NF4 grid, BENCH nf4_dequant_cost_analysis)
   vs exact-LUT NF4 on the SAME quantized codes at a 2048-wide, 262k-vocab stage-2
   QLoRA loss: the two encodings differ by <= 1/254 per weight value, so loss and LoRA
   grads must agree well inside the 1% budget.
"""

import math

import numpy as np
import pytest
import torch
import torch.nn as nn

import jax
import jax.numpy as jnp

from projectiontrainer_tpu.models import decoder as dec
from projectiontrainer_tpu.models import projector as proj
from projectiontrainer_tpu.models import siglip, vlm
from projectiontrainer_tpu.train import masks, optim, steps

pytestmark = pytest.mark.slow

PAD = 0
HIDDEN, VOCAB, LAYERS = 2048, 262_144, 2


@pytest.fixture(scope="module")
def prod_stack():
    """Gemma3 decoder at 1B-class widths (hidden 2048, 262k vocab, head_dim 256,
    GQA 4/1) but 2 layers; tiny vision tower (vision widths are not the
    numerically-sensitive part)."""
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
        vocab_size=VOCAB, hidden_size=HIDDEN, intermediate_size=4096,
        num_hidden_layers=LAYERS, num_attention_heads=4, num_key_value_heads=1,
        head_dim=256, sliding_window=512, query_pre_attn_scalar=256,
        max_position_embeddings=1024, attn_implementation="eager",
    )
    vision = SiglipVisionModel(vis_cfg).eval()
    llm = Gemma3ForCausalLM(llm_cfg).eval()

    class TorchProjector(nn.Module):
        def __init__(self):
            super().__init__()
            self.model = nn.Sequential(
                nn.Linear(48, 96), nn.GELU(), nn.Linear(96, HIDDEN)
            )

        def forward(self, x):
            return self.model(x)

    projector = TorchProjector().eval()

    jvis = siglip.VisionConfig(
        hidden_size=48, intermediate_size=96, num_layers=2, num_heads=4,
        image_size=32, patch_size=8, use_head=False,
    )
    jllm = dec.from_hf_config(llm_cfg)
    jproj = proj.ProjectorConfig(vision_dim=48, llm_dim=HIDDEN, expansion_factor=2)
    cfg = vlm.VLMConfig(vision=jvis, projector=jproj, llm=jllm)

    params = {
        "vision": siglip.vision_params_from_hf_state_dict(
            jvis, {k: v.detach().numpy() for k, v in vision.state_dict().items()}),
        "llm": dec.params_from_hf_state_dict(
            jllm, {k: v.detach().numpy() for k, v in llm.state_dict().items()}),
        "projector": proj.params_from_torch_state_dict(
            {k.removeprefix("model."): v.detach().numpy()
             for k, v in projector.state_dict().items()}),
    }
    return cfg, params, vision, llm, projector


def test_stage1_curve_parity_production_width(prod_stack):
    """6 optimizer steps of the stage-1 recipe (AdamW + cosine warmup + clip 5.0,
    projector-only) at 2048 hidden / 262k vocab vs the live torch loop — the 262k
    logsumexp and the chunked-CE path at real width."""
    from transformers import get_cosine_schedule_with_warmup

    cfg, params0, vision, llm, t_projector = prod_stack
    n_steps, lr, warmup_ratio, clip, wd = 6, 1e-3, 0.2, 5.0, 0.01
    rng = np.random.default_rng(7)
    batches = []
    for _ in range(2):
        pixels = rng.normal(size=(1, 3, 32, 32)).astype(np.float32) * 0.5
        ids = rng.integers(1, VOCAB, size=(1, 32))
        ids[0, 28:] = PAD
        batches.append((pixels, ids))

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

    labels_tree = masks.stage1_labels(params0)
    tx, _ = optim.single_group_optimizer(
        labels_tree, lr, total_steps=n_steps, warmup_ratio=warmup_ratio,
        clip_norm=clip, weight_decay=wd)
    # logits_chunk exercises the memory-safe chunked 262k CE the trainers use
    loss_fn = steps.stage1_loss(cfg, PAD, remat=False, logits_chunk=16)
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
    assert rel.max() < 1e-2, f"curves diverged at 2048/262k: max rel {rel.max():.2e}"
    assert rel.mean() < 2e-3, f"mean rel drift {rel.mean():.2e}"


def test_nf4_mirror_vs_exact_production_width(prod_stack):
    """nf4-mirror vs exact-LUT NF4 on the SAME codes at 2048/262k through the full
    stage-2 QLoRA loss: value grids differ by <= 1/254 per weight, so loss and LoRA
    gradients must agree far inside the 1% budget."""
    from projectiontrainer_tpu.ops import quant
    from projectiontrainer_tpu.train import lora as lora_mod

    cfg, params0, *_ = prod_stack
    qdec_nf4 = quant.quantize_decoder(
        jax.tree.map(jnp.asarray, params0["llm"]), method="nf4")

    def mirror_tree(p):
        if isinstance(p, dict) and quant.is_quantized(p) and "codes" in p:
            return quant.nf4_int8_mirror(p)
        if isinstance(p, dict):
            return {k: mirror_tree(v) for k, v in p.items()}
        if isinstance(p, list):
            return [mirror_tree(v) for v in p]
        return p

    qdec_mirror = mirror_tree(qdec_nf4)

    lcfg = lora_mod.LoraConfig(r=16, alpha=32, dropout=0.0)
    lora_params = lora_mod.init(jax.random.key(1), cfg.llm, lcfg)
    rng = np.random.default_rng(9)
    batch = {
        "pixel_values": jnp.asarray(
            rng.normal(size=(1, 32, 32, 3)).astype(np.float32) * 0.5),
        "question_ids": jnp.asarray(rng.integers(1, VOCAB, size=(1, 8))),
        "answer_ids": jnp.asarray(rng.integers(1, VOCAB, size=(1, 16))),
    }
    loss_fn = steps.stage2_loss(cfg, PAD, lora_cfg=lcfg, remat=False, logits_chunk=16)

    def run(qdec):
        params = dict(params0, llm=qdec, lora=lora_params)
        def f(lora):
            p = dict(params, lora=lora)
            return loss_fn(p, batch, jax.random.key(2))[0]
        return jax.value_and_grad(f)(lora_params)

    loss_nf4, grad_nf4 = run(qdec_nf4)
    loss_mirror, grad_mirror = run(qdec_mirror)
    loss_rel = abs(float(loss_mirror) - float(loss_nf4)) / abs(float(loss_nf4))
    assert loss_rel < 3e-3, f"nf4-mirror loss off by {loss_rel:.2e} at 2048/262k"

    flat_n, _ = jax.flatten_util.ravel_pytree(grad_nf4)
    flat_m, _ = jax.flatten_util.ravel_pytree(grad_mirror)
    grad_rel = float(jnp.max(jnp.abs(flat_m - flat_n))
                     / jnp.maximum(jnp.max(jnp.abs(flat_n)), 1e-9))
    assert grad_rel < 2e-2, f"nf4-mirror LoRA grads off by {grad_rel:.2e}"
