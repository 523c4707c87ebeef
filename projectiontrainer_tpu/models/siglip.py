"""Functional SigLIP: vision tower, text tower, attention-pooling head, contrastive model.

Covers every way the reference consumes SigLIP:

- Stage 0 trains the full dual-tower model with the sigmoid pairwise loss (reference:
  Stage0/train_vision_encoder_stage0.py:451-842) — here :func:`forward_contrastive`.
- Stage 1/2 use the vision tower's ``last_hidden_state`` with the first patch token dropped
  ("discard CLS" on a CLS-less model — a reference quirk replicated deliberately; reference:
  Stage1/projector_trainer.py:173, Stage2/trainer.py:329) — :func:`vision_patch_embeddings`.
- cls_evaluate builds a probe head over the vision tower (models/classifier.py).
- Zero-shot classification scores prompts via ``logits_per_image``
  (reference: cls_evaluate/cls_without_head/classifier.py:15-93).

Architecture matches HF ``SiglipModel`` so checkpoints port tensor-for-tensor: pre-LN
encoder blocks, gelu-tanh MLP, no CLS token, learned absolute position embeddings,
MAP pooling head (vision), last-token pooling + linear head (text).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from projectiontrainer_tpu.ops import layers as L
from projectiontrainer_tpu.ops.attention import dot_product_attention


@dataclasses.dataclass(frozen=True)
class TowerConfig:
    hidden_size: int
    intermediate_size: int
    num_layers: int
    num_heads: int
    layer_norm_eps: float = 1e-6
    attn_impl: str = "xla"
    norm_impl: str = "xla"                     # 'xla' | 'fused' (Pallas LN, TPU-only)

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads


@dataclasses.dataclass(frozen=True)
class VisionConfig(TowerConfig):
    image_size: int = 384
    patch_size: int = 16
    num_channels: int = 3
    use_head: bool = True

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2


@dataclasses.dataclass(frozen=True)
class TextConfig(TowerConfig):
    vocab_size: int = 32_000
    max_position_embeddings: int = 64
    projection_size: Optional[int] = None  # defaults to hidden_size


@dataclasses.dataclass(frozen=True)
class SiglipConfig:
    vision: VisionConfig
    text: TextConfig


def vit_l_16_384() -> VisionConfig:
    """StanfordAIMI/XraySigLIP__vit-l-16-siglip-384__webli vision shape (SURVEY §0)."""
    return VisionConfig(hidden_size=1024, intermediate_size=4096, num_layers=24,
                        num_heads=16, image_size=384, patch_size=16)


def so400m_16_512() -> VisionConfig:
    """google/siglip2-so400m-patch16-512 vision shape (Stage 0 default)."""
    return VisionConfig(hidden_size=1152, intermediate_size=4304, num_layers=27,
                        num_heads=16, image_size=512, patch_size=16)


def from_hf_config(hf) -> SiglipConfig:
    v, t = hf.vision_config, hf.text_config
    return SiglipConfig(
        vision=VisionConfig(
            hidden_size=v.hidden_size, intermediate_size=v.intermediate_size,
            num_layers=v.num_hidden_layers, num_heads=v.num_attention_heads,
            layer_norm_eps=v.layer_norm_eps, image_size=v.image_size,
            patch_size=v.patch_size, num_channels=v.num_channels,
        ),
        text=TextConfig(
            hidden_size=t.hidden_size, intermediate_size=t.intermediate_size,
            num_layers=t.num_hidden_layers, num_heads=t.num_attention_heads,
            layer_norm_eps=t.layer_norm_eps, vocab_size=t.vocab_size,
            max_position_embeddings=t.max_position_embeddings,
            projection_size=getattr(t, "projection_size", t.hidden_size),
        ),
    )


# ---------------------------------------------------------------------------- init


def _init_encoder_layer(key, cfg: TowerConfig, dtype):
    keys = jax.random.split(key, 6)
    d = cfg.hidden_size
    return {
        "ln1": L.init_layernorm(d, dtype=dtype),
        "attn": {
            "q_proj": L.init_linear(keys[0], d, d, dtype=dtype),
            "k_proj": L.init_linear(keys[1], d, d, dtype=dtype),
            "v_proj": L.init_linear(keys[2], d, d, dtype=dtype),
            "out_proj": L.init_linear(keys[3], d, d, dtype=dtype),
        },
        "ln2": L.init_layernorm(d, dtype=dtype),
        "mlp": {
            "fc1": L.init_linear(keys[4], d, cfg.intermediate_size, dtype=dtype),
            "fc2": L.init_linear(keys[5], cfg.intermediate_size, d, dtype=dtype),
        },
    }


def init_vision(key, cfg: VisionConfig, dtype=jnp.float32):
    keys = jax.random.split(key, cfg.num_layers + 3)
    d = cfg.hidden_size
    params = {
        "patch_embedding": L.init_conv_patch(keys[0], cfg.patch_size, cfg.num_channels, d, dtype=dtype),
        "position_embedding": L.init_embedding(keys[1], cfg.num_patches, d, dtype=dtype),
        "layers": [_init_encoder_layer(keys[i + 3], cfg, dtype) for i in range(cfg.num_layers)],
        "post_layernorm": L.init_layernorm(d, dtype=dtype),
    }
    if cfg.use_head:
        hkeys = jax.random.split(keys[2], 7)
        params["head"] = {
            "probe": jax.random.normal(hkeys[0], (1, 1, d)).astype(dtype),
            "attention": {
                "q_proj": L.init_linear(hkeys[1], d, d, dtype=dtype),
                "k_proj": L.init_linear(hkeys[2], d, d, dtype=dtype),
                "v_proj": L.init_linear(hkeys[3], d, d, dtype=dtype),
                "out_proj": L.init_linear(hkeys[4], d, d, dtype=dtype),
            },
            "layernorm": L.init_layernorm(d, dtype=dtype),
            "mlp": {
                "fc1": L.init_linear(hkeys[5], d, cfg.intermediate_size, dtype=dtype),
                "fc2": L.init_linear(hkeys[6], cfg.intermediate_size, d, dtype=dtype),
            },
        }
    return params


def init_text(key, cfg: TextConfig, dtype=jnp.float32):
    keys = jax.random.split(key, cfg.num_layers + 4)
    d = cfg.hidden_size
    proj = cfg.projection_size or d
    return {
        "token_embedding": L.init_embedding(keys[0], cfg.vocab_size, d, dtype=dtype),
        "position_embedding": L.init_embedding(keys[1], cfg.max_position_embeddings, d, dtype=dtype),
        "layers": [_init_encoder_layer(keys[i + 4], cfg, dtype) for i in range(cfg.num_layers)],
        "final_layer_norm": L.init_layernorm(d, dtype=dtype),
        "head": L.init_linear(keys[2], d, proj, dtype=dtype),
    }


def init(key, cfg: SiglipConfig, dtype=jnp.float32):
    kv, kt = jax.random.split(key)
    return {
        "vision": init_vision(kv, cfg.vision, dtype),
        "text": init_text(kt, cfg.text, dtype),
        "logit_scale": jnp.asarray([np.log(10.0)], dtype),
        "logit_bias": jnp.asarray([-10.0], dtype),
    }


# ---------------------------------------------------------------------------- forward


def _ln(p, cfg: TowerConfig, x):
    if cfg.norm_impl == "fused":
        from projectiontrainer_tpu.ops import fused_layernorm as FLN

        return FLN.layernorm(p, x, eps=cfg.layer_norm_eps)
    return L.layernorm(p, x, eps=cfg.layer_norm_eps)


def _encoder_layer(p, cfg: TowerConfig, x, kv_mask=None):
    b, t, d = x.shape
    h = _ln(p["ln1"], cfg, x)
    q = L.linear(p["attn"]["q_proj"], h).reshape(b, t, cfg.num_heads, cfg.head_dim)
    k = L.linear(p["attn"]["k_proj"], h).reshape(b, t, cfg.num_heads, cfg.head_dim)
    v = L.linear(p["attn"]["v_proj"], h).reshape(b, t, cfg.num_heads, cfg.head_dim)
    attn = dot_product_attention(q, k, v, causal=False, kv_mask=kv_mask, impl=cfg.attn_impl)
    h = L.linear(p["attn"]["out_proj"], attn.reshape(b, t, d))
    x = x + h
    h = _ln(p["ln2"], cfg, x)
    h = L.linear(p["mlp"]["fc2"], L.gelu(L.linear(p["mlp"]["fc1"], h), approximate=True))
    return x + h


def _map_head(p, cfg: VisionConfig, x):
    """MAP pooling head with torch.nn.MultiheadAttention semantics (scale=head_dim^-0.5)."""
    b, t, d = x.shape
    probe = jnp.broadcast_to(p["probe"].astype(x.dtype), (b, 1, d))
    q = L.linear(p["attention"]["q_proj"], probe).reshape(b, 1, cfg.num_heads, cfg.head_dim)
    k = L.linear(p["attention"]["k_proj"], x).reshape(b, t, cfg.num_heads, cfg.head_dim)
    v = L.linear(p["attention"]["v_proj"], x).reshape(b, t, cfg.num_heads, cfg.head_dim)
    attn = dot_product_attention(q, k, v, causal=False, impl=cfg.attn_impl)
    h = L.linear(p["attention"]["out_proj"], attn.reshape(b, 1, d))
    residual = h
    h = _ln(p["layernorm"], cfg, h)
    h = L.linear(p["mlp"]["fc2"], L.gelu(L.linear(p["mlp"]["fc1"], h), approximate=True))
    return (residual + h)[:, 0]


def vision_forward(params, cfg: VisionConfig, pixel_values, *, remat: bool = False):
    """pixel_values: [B, H, W, C] (NHWC; converted from the processor's NCHW at the data
    layer). Returns (last_hidden_state [B, P, D], pooled [B, D] or None).

    ``remat``: False | True (checkpoint every layer, full policy) | 'dots' (checkpoint
    every layer, matmul outputs saveable) | int k > 0 (checkpoint only the FIRST k
    layers, full policy). Partial remat is the memory/speed sweet spot when the plain
    path misses HBM by a sliver: each checkpointed layer frees its activation internals
    (~0.7 GB at so400m-512 batch 32) for ~1/num_layers extra forward FLOPs, where
    full-tower 'dots' SAVES every matmul output and can exceed the no-remat footprint."""
    x = L.conv_patchify(params["patch_embedding"], pixel_values, patch=cfg.patch_size)
    x = x + params["position_embedding"]["embedding"][None].astype(x.dtype)
    if remat is True or remat == "dots":
        n_remat = len(params["layers"])
    else:
        n_remat = remat if isinstance(remat, int) else 0
    policy = (jax.checkpoint_policies.dots_with_no_batch_dims_saveable
              if remat == "dots" else None)
    ckpt_layer = jax.checkpoint(_encoder_layer, static_argnums=(1,), policy=policy)
    for i, lp in enumerate(params["layers"]):
        x = (ckpt_layer if i < n_remat else _encoder_layer)(lp, cfg, x)
    x = _ln(params["post_layernorm"], cfg, x)
    pooled = _map_head(params["head"], cfg, x) if "head" in params else None
    return x, pooled


def vision_patch_embeddings(params, cfg: VisionConfig, pixel_values, *, remat: bool = False):
    """The VLM vision path: last_hidden_state with patch token 0 dropped — replicating the
    reference's "discard CLS" slice (Stage1/projector_trainer.py:173) although SigLIP has no
    CLS token. 576 patches -> 575 visual tokens for ViT-L/16 @ 384."""
    hidden, _ = vision_forward(params, cfg, pixel_values, remat=remat)
    return hidden[:, 1:, :]


def text_forward(params, cfg: TextConfig, input_ids):
    """Returns (last_hidden_state, pooled). SigLIP text uses NO attention mask in practice
    (the processor pads with `padding='max_length'` and the model attends to padding; the
    pooled output is the LAST token's hidden state through a linear head)."""
    t = input_ids.shape[-1]
    x = L.embedding_lookup(params["token_embedding"], input_ids)
    x = x + params["position_embedding"]["embedding"][None, :t].astype(x.dtype)
    for lp in params["layers"]:
        x = _encoder_layer(lp, cfg, x)
    x = _ln(params["final_layer_norm"], cfg, x)
    pooled = L.linear(params["head"], x[:, -1, :])
    return x, pooled


def forward_contrastive(params, cfg: SiglipConfig, pixel_values, input_ids,
                        *, remat: bool = False):
    """Full dual-tower forward -> (image_embeds, text_embeds, logit_scale, logit_bias).
    Embeds are the raw pooled outputs (normalization happens inside the loss, matching
    the reference's siglip_loss at Stage0/train_vision_encoder_stage0.py:260-269).
    ``remat`` checkpoints the vision encoder layers (the tower that trains — and at
    512px/1024 patches the activation-memory hog; the frozen text fwd is cheap)."""
    _, img = vision_forward(params["vision"], cfg.vision, pixel_values, remat=remat)
    _, txt = text_forward(params["text"], cfg.text, input_ids)
    return img, txt, params["logit_scale"], params["logit_bias"]


def logits_per_image(params, cfg: SiglipConfig, pixel_values, input_ids):
    """Zero-shot scoring: normalized image/text embeds -> scaled similarity + bias
    (HF SiglipModel semantics, used by cls_evaluate/cls_without_head)."""
    img, txt, scale, bias = forward_contrastive(params, cfg, pixel_values, input_ids)
    img = img / jnp.linalg.norm(img, axis=-1, keepdims=True)
    txt = txt / jnp.linalg.norm(txt, axis=-1, keepdims=True)
    return img @ txt.T * jnp.exp(scale[0]) + bias[0]


# ---------------------------------------------------------------------------- HF import


def _lin_from(sd, name):
    p = {"kernel": np.asarray(sd[name + ".weight"]).T}
    if name + ".bias" in sd:
        p["bias"] = np.asarray(sd[name + ".bias"])
    return p


def _ln_from(sd, name):
    return {"scale": np.asarray(sd[name + ".weight"]), "bias": np.asarray(sd[name + ".bias"])}


def _encoder_layers_from(sd, prefix, num_layers):
    out = []
    for i in range(num_layers):
        p = f"{prefix}.layers.{i}."
        out.append({
            "ln1": _ln_from(sd, p + "layer_norm1"),
            "attn": {
                "q_proj": _lin_from(sd, p + "self_attn.q_proj"),
                "k_proj": _lin_from(sd, p + "self_attn.k_proj"),
                "v_proj": _lin_from(sd, p + "self_attn.v_proj"),
                "out_proj": _lin_from(sd, p + "self_attn.out_proj"),
            },
            "ln2": _ln_from(sd, p + "layer_norm2"),
            "mlp": {
                "fc1": _lin_from(sd, p + "mlp.fc1"),
                "fc2": _lin_from(sd, p + "mlp.fc2"),
            },
        })
    return out


def vision_params_from_hf_state_dict(cfg: VisionConfig, sd, prefix="vision_model") -> dict:
    """Port HF SiglipVisionModel weights (numpy). Conv kernel OIHW->HWIO; torch MHA packed
    in_proj is split into q/k/v."""
    sd = {k[len(prefix) + 1:] if k.startswith(prefix + ".") else k: v for k, v in sd.items()}
    params = {
        "patch_embedding": {
            "kernel": np.transpose(
                np.asarray(sd["embeddings.patch_embedding.weight"]), (2, 3, 1, 0)
            ),
            "bias": np.asarray(sd["embeddings.patch_embedding.bias"]),
        },
        "position_embedding": {
            "embedding": np.asarray(sd["embeddings.position_embedding.weight"])
        },
        "layers": _encoder_layers_from(sd, "encoder", cfg.num_layers),
        "post_layernorm": _ln_from(sd, "post_layernorm"),
    }
    if cfg.use_head and "head.probe" in sd:
        d = cfg.hidden_size
        in_w = np.asarray(sd["head.attention.in_proj_weight"])
        in_b = np.asarray(sd["head.attention.in_proj_bias"])
        params["head"] = {
            "probe": np.asarray(sd["head.probe"]),
            "attention": {
                "q_proj": {"kernel": in_w[:d].T, "bias": in_b[:d]},
                "k_proj": {"kernel": in_w[d:2 * d].T, "bias": in_b[d:2 * d]},
                "v_proj": {"kernel": in_w[2 * d:].T, "bias": in_b[2 * d:]},
                "out_proj": _lin_from(sd, "head.attention.out_proj"),
            },
            "layernorm": _ln_from(sd, "head.layernorm"),
            "mlp": {
                "fc1": _lin_from(sd, "head.mlp.fc1"),
                "fc2": _lin_from(sd, "head.mlp.fc2"),
            },
        }
    return jax.tree.map(jnp.asarray, params)


def text_params_from_hf_state_dict(cfg: TextConfig, sd, prefix="text_model") -> dict:
    sd = {k[len(prefix) + 1:] if k.startswith(prefix + ".") else k: v for k, v in sd.items()}
    params = {
        "token_embedding": {"embedding": np.asarray(sd["embeddings.token_embedding.weight"])},
        "position_embedding": {"embedding": np.asarray(sd["embeddings.position_embedding.weight"])},
        "layers": _encoder_layers_from(sd, "encoder", cfg.num_layers),
        "final_layer_norm": _ln_from(sd, "final_layer_norm"),
        "head": _lin_from(sd, "head"),
    }
    return jax.tree.map(jnp.asarray, params)


def params_from_hf_state_dict(cfg: SiglipConfig, sd) -> dict:
    return {
        "vision": vision_params_from_hf_state_dict(cfg.vision, sd),
        "text": text_params_from_hf_state_dict(cfg.text, sd),
        "logit_scale": jnp.asarray(np.atleast_1d(np.asarray(sd["logit_scale"]))),
        "logit_bias": jnp.asarray(np.atleast_1d(np.asarray(sd["logit_bias"]))),
    }
