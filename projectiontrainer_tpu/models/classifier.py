"""Abnormality classifier: SigLIP vision backbone + per-class query cross-attention head.

Functional equivalent of the reference's ``AbnormalityClassifier``
(cls_evaluate/models.py:107-139): learnable per-class query vectors cross-attend (16-head
MHA, torch semantics) over the vision tower's patch features; a shared ``Linear(d, 1)``
scores each attended query -> per-class logits. Dropout is supported for training parity.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from projectiontrainer_tpu.models import siglip
from projectiontrainer_tpu.ops import layers as L
from projectiontrainer_tpu.ops.attention import dot_product_attention


@dataclasses.dataclass(frozen=True)
class ClassifierConfig:
    vision: siglip.VisionConfig
    num_classes: int
    num_heads: int = 16
    dropout_rate: float = 0.1


def init(key, cfg: ClassifierConfig, dtype=jnp.float32):
    kq, kv, ka1, ka2, ka3, ka4, kh = jax.random.split(key, 7)
    d = cfg.vision.hidden_size
    return {
        "vision": siglip.init_vision(kv, cfg.vision, dtype),
        "queries": jax.random.normal(kq, (1, cfg.num_classes, d)).astype(dtype),
        "mha": {
            "q_proj": L.init_linear(ka1, d, d, dtype=dtype),
            "k_proj": L.init_linear(ka2, d, d, dtype=dtype),
            "v_proj": L.init_linear(ka3, d, d, dtype=dtype),
            "out_proj": L.init_linear(ka4, d, d, dtype=dtype),
        },
        "head": L.init_linear(kh, d, 1, dtype=dtype),
    }


def forward(params, cfg: ClassifierConfig, pixel_values, *, dropout_rng: Optional[jax.Array] = None):
    """pixel_values [B,H,W,C] -> logits [B, num_classes]. Uses the FULL last_hidden_state
    (no token dropped — the classifier path differs from the VLM path here, matching the
    reference: cls_evaluate/models.py:131-139)."""
    features, _ = siglip.vision_forward(params["vision"], cfg.vision, pixel_values)
    b, t, d = features.shape
    nh = cfg.num_heads
    hd = d // nh
    queries = jnp.broadcast_to(params["queries"].astype(features.dtype), (b, cfg.num_classes, d))
    q = L.linear(params["mha"]["q_proj"], queries).reshape(b, cfg.num_classes, nh, hd)
    k = L.linear(params["mha"]["k_proj"], features).reshape(b, t, nh, hd)
    v = L.linear(params["mha"]["v_proj"], features).reshape(b, t, nh, hd)
    attn = dot_product_attention(q, k, v, causal=False)
    h = L.linear(params["mha"]["out_proj"], attn.reshape(b, cfg.num_classes, d))
    if dropout_rng is not None and cfg.dropout_rate > 0.0:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - cfg.dropout_rate, h.shape)
        h = jnp.where(keep, h / (1.0 - cfg.dropout_rate), 0.0)
    logits = L.linear(params["head"], h)[..., 0]
    return logits


def params_from_torch_state_dict(cfg: ClassifierConfig, sd) -> dict:
    """Port a reference ``.pth`` checkpoint's model_state_dict (numpy arrays)."""
    d = cfg.vision.hidden_size
    in_w = np.asarray(sd["mha.in_proj_weight"])
    in_b = np.asarray(sd["mha.in_proj_bias"])
    vision_sd = {k: v for k, v in sd.items() if k.startswith("vision_model.")}
    vision_sd = {k[len("vision_model."):]: v for k, v in vision_sd.items()}
    return {
        "vision": siglip.vision_params_from_hf_state_dict(cfg.vision, vision_sd),
        "queries": jnp.asarray(np.asarray(sd["abnormality_queries"])),
        "mha": jax.tree.map(jnp.asarray, {
            "q_proj": {"kernel": in_w[:d].T, "bias": in_b[:d]},
            "k_proj": {"kernel": in_w[d:2 * d].T, "bias": in_b[d:2 * d]},
            "v_proj": {"kernel": in_w[2 * d:].T, "bias": in_b[2 * d:]},
            "out_proj": {"kernel": np.asarray(sd["mha.out_proj.weight"]).T,
                          "bias": np.asarray(sd["mha.out_proj.bias"])},
        }),
        "head": jax.tree.map(jnp.asarray, {
            "kernel": np.asarray(sd["classification_head.weight"]).T,
            "bias": np.asarray(sd["classification_head.bias"]),
        }),
    }
