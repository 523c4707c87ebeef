"""Model assembly from local HF snapshots (zero-egress: no hub downloads).

Replaces the reference's ``AutoModel.from_pretrained`` wiring
(Stage1/train_projection_stage1.py:178-252, Stage2/train_vqa_stage2.py:140-275): paths
must point at local snapshot directories; the projector is built from the towers'
hidden sizes exactly like the reference (vision_config.hidden_size -> llm hidden_size).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp

from projectiontrainer_tpu.checkpoint import export, hf_import
from projectiontrainer_tpu.models import projector as proj
from projectiontrainer_tpu.models import vlm


def load_tokenizer(name_or_path: str):
    from transformers import AutoTokenizer

    tok = AutoTokenizer.from_pretrained(name_or_path)
    if tok.pad_token is None:  # reference: Stage2/dataset.py:34-36
        tok.pad_token = tok.eos_token
    return tok


def build_vlm(
    vision_model_name: str,
    llm_name: str,
    *,
    stage1_projector_path: Optional[str] = None,
    expansion_factor: int = 10,
    seed: int = 0,
    param_dtype=jnp.float32,
    frozen_dtype=jnp.bfloat16,
    quantize_llm: bool = False,
    quant_method: str = "nf4-mirror",
):
    """Assemble (VLMConfig, params) from local snapshots. ``frozen_dtype`` stores the
    pretrained towers in bf16 (half the HBM; they are frozen in Stage 1 and under LoRA)
    while trainable-by-default parts stay in ``param_dtype``. ``quantize_llm`` applies
    weight-only quantization to the decoder projections — the ``--enable_qlora``
    base-weight path. ``quant_method``: 'nf4-mirror' (default: the reference's NF4
    value grid — Stage2/train_vqa_stage2.py:171-177 — re-encoded once as block-int8
    for LUT-free compute: 15x faster decode, +60%% training GEMM, <=0.4%% value
    perturbation, production-width loss/grad parity proven in
    tests/test_parity_production_width.py), 'nf4' (exact bitsandbytes LUT layout),
    or 'int8' (2x memory of nf4, per-channel scales, cheapest dequant)."""
    for path in (vision_model_name, llm_name):
        if not os.path.isdir(path):
            raise FileNotFoundError(
                f"{path!r} is not a local model directory (zero-egress environment: "
                "download snapshots ahead of time and pass their paths)"
            )
    siglip_cfg, siglip_params = hf_import.load_siglip(vision_model_name)
    llm_cfg, llm_params = hf_import.load_decoder(llm_name)

    if stage1_projector_path:
        proj_cfg, proj_params = export.load_projector(stage1_projector_path)
    else:
        proj_cfg = proj.ProjectorConfig(
            vision_dim=siglip_cfg.vision.hidden_size,
            llm_dim=llm_cfg.hidden_size,
            expansion_factor=expansion_factor,
        )
        proj_params = proj.init(jax.random.key(seed), proj_cfg, dtype=param_dtype)

    cfg = vlm.VLMConfig(vision=siglip_cfg.vision, projector=proj_cfg, llm=llm_cfg)
    cast = lambda tree, dt: jax.tree.map(
        lambda x: x.astype(dt) if jnp.issubdtype(x.dtype, jnp.floating) else x, tree
    )
    llm_tree = cast(llm_params, frozen_dtype)
    if quantize_llm:
        from projectiontrainer_tpu.ops.quant import quantize_decoder

        llm_tree = quantize_decoder(llm_tree, method=quant_method)
    params = {
        "vision": cast(siglip_params["vision"], frozen_dtype),
        "projector": cast(proj_params, param_dtype),
        "llm": llm_tree,
    }
    return cfg, params, siglip_cfg
