"""HF checkpoint import: local safetensors/torch-bin model dirs -> JAX param pytrees.

The reference loads pretrained towers via ``AutoModel.from_pretrained``
(Stage1/train_projection_stage1.py:179,204). Zero-egress TPU pods load the same artifacts
from a local snapshot directory: we read ``*.safetensors`` (or ``pytorch_model.bin``)
directly into numpy — no torch graph construction, no HF modeling code — then hand the
flat state dict to the per-model porters (models/*.params_from_hf_state_dict), which carry
per-tensor parity tests.
"""

from __future__ import annotations

import json
import os
from typing import Optional

import numpy as np


def load_state_dict(model_dir: str) -> dict[str, np.ndarray]:
    """Read every tensor from a local HF model directory (sharded or single-file
    safetensors preferred; torch .bin fallback)."""
    index = os.path.join(model_dir, "model.safetensors.index.json")
    sd: dict[str, np.ndarray] = {}
    if os.path.exists(index):
        with open(index) as f:
            weight_map = json.load(f)["weight_map"]
        for shard in sorted(set(weight_map.values())):
            sd.update(_load_safetensors(os.path.join(model_dir, shard)))
        return sd
    single = os.path.join(model_dir, "model.safetensors")
    if os.path.exists(single):
        return _load_safetensors(single)
    torch_bin = os.path.join(model_dir, "pytorch_model.bin")
    if os.path.exists(torch_bin):
        import torch

        raw = torch.load(torch_bin, map_location="cpu", weights_only=True)
        return {k: v.numpy() for k, v in raw.items()}
    raise FileNotFoundError(f"no model weights found under {model_dir}")


def _load_safetensors(path: str) -> dict[str, np.ndarray]:
    from safetensors import safe_open

    out = {}
    with safe_open(path, framework="np") as f:
        for k in f.keys():
            out[k] = f.get_tensor(k)
    return out


def load_config(model_dir: str) -> dict:
    with open(os.path.join(model_dir, "config.json")) as f:
        return json.load(f)


def _auto_attn_impl(attn_impl):
    """None -> 'flash' on TPU, 'xla' elsewhere. The Pallas kernel avoids the XLA
    path's fp32 [B,H,T,T] score materialization; decode steps (tq != tk) fall back to
    XLA inside dot_product_attention automatically. On a MULTI-device runtime the
    dispatch self-guards: the kernel runs only under a trainer's shard_map context
    (core.mesh.flash_shard_context) and everything else — generation, ad-hoc jits —
    takes the GSPMD-partitionable XLA path (pallas_call has no partitioning rules).
    Pass attn_impl explicitly to override."""
    if attn_impl is not None:
        return attn_impl
    import jax

    return "flash" if jax.default_backend() == "tpu" else "xla"


def load_siglip(model_dir: str, *, attn_impl: str | None = None,
                norm_impl: str | None = None):
    """Local SigLIP snapshot -> (SiglipConfig, params). ``attn_impl`` None = auto
    (Pallas flash on TPU). ``norm_impl`` None = auto: 'fused' Pallas LayerNorm on
    TPU, 'xla' elsewhere — independent of the attention choice, so attn_impl='xla'
    keeps the fused LN and norm_impl='xla' opts out of it while keeping flash
    (ops/fused_layernorm.py gates itself to single-device TPU per call, so
    multi-chip meshes transparently use XLA LN either way)."""
    import dataclasses

    from transformers import SiglipConfig as HFSiglipConfig

    from projectiontrainer_tpu.models import siglip

    hf_cfg = HFSiglipConfig.from_pretrained(model_dir)
    cfg = siglip.from_hf_config(hf_cfg)
    impl = _auto_attn_impl(attn_impl)
    if norm_impl is None:
        import jax

        norm = "fused" if jax.default_backend() == "tpu" else "xla"
    else:
        norm = norm_impl
    cfg = siglip.SiglipConfig(
        vision=dataclasses.replace(cfg.vision, attn_impl=impl, norm_impl=norm),
        text=dataclasses.replace(cfg.text, attn_impl=impl, norm_impl=norm),
    )
    sd = load_state_dict(model_dir)
    return cfg, siglip.params_from_hf_state_dict(cfg, sd)


def load_decoder(model_dir: str, *, attn_impl: str | None = None):
    """Local Gemma3/Qwen3 snapshot -> (DecoderConfig, params). ``attn_impl`` None =
    auto (Pallas flash on TPU; decode steps fall back to XLA internally)."""
    import dataclasses

    from transformers import AutoConfig

    from projectiontrainer_tpu.models import decoder

    hf_cfg = AutoConfig.from_pretrained(model_dir)
    if hf_cfg.model_type == "gemma3":  # multimodal wrapper -> text config
        hf_cfg = hf_cfg.text_config
    cfg = decoder.from_hf_config(hf_cfg)
    cfg = dataclasses.replace(cfg, attn_impl=_auto_attn_impl(attn_impl))
    sd = load_state_dict(model_dir)
    # strip multimodal prefixes if present (gemma-3 vlm checkpoints)
    sd = {
        k.removeprefix("language_model."): v
        for k, v in sd.items()
        if not k.startswith(("vision_tower.", "multi_modal_projector."))
    }
    return cfg, decoder.params_from_hf_state_dict(cfg, sd)
