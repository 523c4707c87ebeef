"""Generic GQA+RoPE causal decoder covering the Gemma3, Qwen3, Llama, and Mistral families.

The reference loads its LLMs through HF ``AutoModelForCausalLM`` (reference:
Stage1/train_projection_stage1.py:204-210, Stage2/train_vqa_stage2.py:169-187; models
``google/gemma-3-1b-it`` and ``Qwen/Qwen3-8B``) — so any causal LM is fair game as the
VLM backbone. Here the families are one functional decoder parameterized by
:class:`DecoderConfig`; family differences are config flags (Llama = Qwen3 minus qk-norm
plus optional llama3 rope scaling; Mistral = Llama with every layer sliding):

==================  ======================  =====================
feature             Gemma3                  Qwen3
==================  ======================  =====================
rmsnorm             zero-centered (1+w)     plain (w)
layer norms         sandwich (4 norms)      pre-LN (2 norms)
activation          gelu_tanh               silu
embed scale         sqrt(hidden)            none
qk-norm             yes (head_dim)          yes (head_dim)
attn scale          query_pre_attn^-0.5     head_dim^-0.5
rope                local+global thetas,    single theta
                    sliding-window layers
==================  ======================  =====================

Everything is a pure function over a nested-dict params pytree; the same ``forward`` serves
training (full-sequence) and decoding (KV cache with ``q_offset``), including the VLM path
where the sequence prefix is projected visual embeddings rather than token ids.
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
class DecoderConfig:
    vocab_size: int
    hidden_size: int
    intermediate_size: int
    num_layers: int
    num_heads: int
    num_kv_heads: int
    head_dim: int
    rms_norm_eps: float = 1e-6
    act: str = "gelu_tanh"
    rope_theta: float = 1_000_000.0
    rope_local_theta: Optional[float] = None     # used by sliding layers (Gemma3)
    rope_scaling_factor: float = 1.0             # linear rope scaling on full layers
    # Llama-3 frequency-dependent rope scaling: (factor, low_freq_factor,
    # high_freq_factor, original_max_position_embeddings); None = off
    rope_llama3: Optional[tuple] = None
    layer_types: tuple = ()                      # per-layer: 'full' | 'sliding'
    sliding_window: Optional[int] = None
    query_pre_attn_scalar: Optional[float] = None
    qk_norm: bool = True
    rmsnorm_zero_centered: bool = True
    sandwich_norms: bool = True
    embed_scale: bool = True
    tie_embeddings: bool = True
    attention_bias: bool = False
    attn_impl: str = "xla"                       # 'xla' | 'flash'

    def __post_init__(self):
        if not self.layer_types:
            object.__setattr__(self, "layer_types", ("full",) * self.num_layers)
        assert len(self.layer_types) == self.num_layers

    @property
    def attn_scale(self) -> float:
        base = self.query_pre_attn_scalar if self.query_pre_attn_scalar is not None else self.head_dim
        return float(base) ** -0.5


def gemma3_config(
    *, vocab_size=262_144, hidden_size=1152, intermediate_size=6912, num_layers=26,
    num_heads=4, num_kv_heads=1, head_dim=256, sliding_window=512,
    sliding_pattern=6, rope_theta=1_000_000.0, rope_local_theta=10_000.0,
    rope_scaling_factor=1.0, query_pre_attn_scalar=256, **kw,
) -> DecoderConfig:
    """Gemma3 defaults (1B-shaped); pattern = 1 full layer per `sliding_pattern` layers."""
    layer_types = tuple(
        "full" if (i + 1) % sliding_pattern == 0 else "sliding" for i in range(num_layers)
    )
    return DecoderConfig(
        vocab_size=vocab_size, hidden_size=hidden_size, intermediate_size=intermediate_size,
        num_layers=num_layers, num_heads=num_heads, num_kv_heads=num_kv_heads,
        head_dim=head_dim, act="gelu_tanh", rope_theta=rope_theta,
        rope_local_theta=rope_local_theta, rope_scaling_factor=rope_scaling_factor,
        layer_types=layer_types, sliding_window=sliding_window,
        query_pre_attn_scalar=query_pre_attn_scalar, qk_norm=True,
        rmsnorm_zero_centered=True, sandwich_norms=True, embed_scale=True, **kw,
    )


def qwen3_config(
    *, vocab_size=151_936, hidden_size=4096, intermediate_size=12_288, num_layers=36,
    num_heads=32, num_kv_heads=8, head_dim=128, rope_theta=1_000_000.0,
    tie_embeddings=False, **kw,
) -> DecoderConfig:
    return DecoderConfig(
        vocab_size=vocab_size, hidden_size=hidden_size, intermediate_size=intermediate_size,
        num_layers=num_layers, num_heads=num_heads, num_kv_heads=num_kv_heads,
        head_dim=head_dim, act="silu", rope_theta=rope_theta,
        layer_types=("full",) * num_layers, sliding_window=None,
        query_pre_attn_scalar=None, qk_norm=True, rmsnorm_zero_centered=False,
        sandwich_norms=False, embed_scale=False, tie_embeddings=tie_embeddings, **kw,
    )


def from_hf_config(hf) -> DecoderConfig:
    """Build a DecoderConfig from a transformers Gemma3TextConfig / Qwen3Config."""
    model_type = getattr(hf, "model_type", "")
    if model_type == "gemma3_text":
        factor = 1.0
        if getattr(hf, "rope_scaling", None):
            factor = float(hf.rope_scaling.get("factor", 1.0))
        layer_types = tuple(
            "sliding" if t == "sliding_attention" else "full" for t in hf.layer_types
        )
        return DecoderConfig(
            vocab_size=hf.vocab_size, hidden_size=hf.hidden_size,
            intermediate_size=hf.intermediate_size, num_layers=hf.num_hidden_layers,
            num_heads=hf.num_attention_heads, num_kv_heads=hf.num_key_value_heads,
            head_dim=hf.head_dim, rms_norm_eps=hf.rms_norm_eps, act="gelu_tanh",
            rope_theta=hf.rope_theta, rope_local_theta=hf.rope_local_base_freq,
            rope_scaling_factor=factor, layer_types=layer_types,
            sliding_window=hf.sliding_window, query_pre_attn_scalar=hf.query_pre_attn_scalar,
            qk_norm=True, rmsnorm_zero_centered=True, sandwich_norms=True, embed_scale=True,
            tie_embeddings=getattr(hf, "tie_word_embeddings", True),
            attention_bias=getattr(hf, "attention_bias", False),
        )
    if model_type == "qwen3":
        return DecoderConfig(
            vocab_size=hf.vocab_size, hidden_size=hf.hidden_size,
            intermediate_size=hf.intermediate_size, num_layers=hf.num_hidden_layers,
            num_heads=hf.num_attention_heads, num_kv_heads=hf.num_key_value_heads,
            head_dim=hf.head_dim, rms_norm_eps=hf.rms_norm_eps, act="silu",
            rope_theta=hf.rope_theta, layer_types=("full",) * hf.num_hidden_layers,
            sliding_window=None, query_pre_attn_scalar=None, qk_norm=True,
            rmsnorm_zero_centered=False, sandwich_norms=False, embed_scale=False,
            tie_embeddings=getattr(hf, "tie_word_embeddings", False),
            attention_bias=getattr(hf, "attention_bias", False),
        )
    if model_type in ("llama", "mistral"):
        # Llama/Mistral structure: pre-LN, silu, no qk-norm, no embed scale, plain
        # rmsnorm. Mistral (v0.1) slides EVERY layer with the single global theta;
        # Llama-3 checkpoints carry frequency-dependent rope scaling.
        factor, llama3 = 1.0, None
        rs = getattr(hf, "rope_scaling", None)
        if rs:
            rtype = rs.get("rope_type", rs.get("type", "default"))
            if rtype == "linear":
                factor = float(rs.get("factor", 1.0))
            elif rtype == "llama3":
                llama3 = (
                    float(rs["factor"]), float(rs["low_freq_factor"]),
                    float(rs["high_freq_factor"]),
                    float(rs["original_max_position_embeddings"]),
                )
            elif rtype != "default":
                raise ValueError(f"unsupported rope_scaling type: {rtype!r}")
        sliding = getattr(hf, "sliding_window", None)
        head_dim = getattr(hf, "head_dim", None) or hf.hidden_size // hf.num_attention_heads
        return DecoderConfig(
            vocab_size=hf.vocab_size, hidden_size=hf.hidden_size,
            intermediate_size=hf.intermediate_size, num_layers=hf.num_hidden_layers,
            num_heads=hf.num_attention_heads, num_kv_heads=hf.num_key_value_heads,
            head_dim=head_dim, rms_norm_eps=hf.rms_norm_eps, act="silu",
            rope_theta=hf.rope_theta, rope_scaling_factor=factor, rope_llama3=llama3,
            layer_types=("sliding" if sliding else "full",) * hf.num_hidden_layers,
            sliding_window=sliding, query_pre_attn_scalar=None, qk_norm=False,
            rmsnorm_zero_centered=False, sandwich_norms=False, embed_scale=False,
            tie_embeddings=getattr(hf, "tie_word_embeddings", False),
            attention_bias=getattr(hf, "attention_bias", False),
        )
    raise ValueError(f"unsupported HF model_type: {model_type!r}")


# ---------------------------------------------------------------------------- init


def init(key, cfg: DecoderConfig, dtype=jnp.float32):
    keys = jax.random.split(key, cfg.num_layers + 2)
    h, q_dim = cfg.hidden_size, cfg.num_heads * cfg.head_dim
    kv_dim = cfg.num_kv_heads * cfg.head_dim
    params = {
        "embed_tokens": L.init_embedding(keys[0], cfg.vocab_size, h, dtype=dtype),
        "final_norm": L.init_rmsnorm(h, dtype=dtype, zero_centered=cfg.rmsnorm_zero_centered),
        "layers": [],
    }
    if not cfg.tie_embeddings:
        params["lm_head"] = L.init_linear(keys[1], h, cfg.vocab_size, bias=False, dtype=dtype)
    zc = cfg.rmsnorm_zero_centered
    for i in range(cfg.num_layers):
        lkeys = jax.random.split(keys[i + 2], 8)
        layer = {
            "input_norm": L.init_rmsnorm(h, dtype=dtype, zero_centered=zc),
            "attn": {
                "q_proj": L.init_linear(lkeys[0], h, q_dim, bias=cfg.attention_bias, dtype=dtype),
                "k_proj": L.init_linear(lkeys[1], h, kv_dim, bias=cfg.attention_bias, dtype=dtype),
                "v_proj": L.init_linear(lkeys[2], h, kv_dim, bias=cfg.attention_bias, dtype=dtype),
                "o_proj": L.init_linear(lkeys[3], q_dim, h, bias=cfg.attention_bias, dtype=dtype),
            },
            "mlp": {
                "gate_proj": L.init_linear(lkeys[4], h, cfg.intermediate_size, bias=False, dtype=dtype),
                "up_proj": L.init_linear(lkeys[5], h, cfg.intermediate_size, bias=False, dtype=dtype),
                "down_proj": L.init_linear(lkeys[6], cfg.intermediate_size, h, bias=False, dtype=dtype),
            },
        }
        if cfg.qk_norm:
            layer["attn"]["q_norm"] = L.init_rmsnorm(cfg.head_dim, dtype=dtype, zero_centered=zc)
            layer["attn"]["k_norm"] = L.init_rmsnorm(cfg.head_dim, dtype=dtype, zero_centered=zc)
        if cfg.sandwich_norms:
            layer["post_attn_norm"] = L.init_rmsnorm(h, dtype=dtype, zero_centered=zc)
            layer["pre_ffw_norm"] = L.init_rmsnorm(h, dtype=dtype, zero_centered=zc)
            layer["post_ffw_norm"] = L.init_rmsnorm(h, dtype=dtype, zero_centered=zc)
        else:
            layer["post_attn_norm"] = L.init_rmsnorm(h, dtype=dtype, zero_centered=zc)
        params["layers"].append(layer)
    return params


# ---------------------------------------------------------------------------- forward


def embed(params, cfg: DecoderConfig, input_ids):
    """Token embedding, including the Gemma3 ``embed_scale`` multiply — the semantics the
    reference works around with a cloned scale tensor (reference: Stage2/trainer.py:347-360);
    in functional JAX it is simply a multiply."""
    x = L.embedding_lookup(params["embed_tokens"], input_ids)
    if cfg.embed_scale:
        scale = jnp.asarray(cfg.hidden_size ** 0.5, dtype=x.dtype)
        x = x * scale
    return x


def _rope_for_layer(cfg: DecoderConfig, layer_type: str, positions):
    if layer_type == "sliding" and cfg.rope_local_theta is not None:
        return L.rope_frequencies(cfg.head_dim, positions, theta=cfg.rope_local_theta)
    return L.rope_frequencies(
        cfg.head_dim, positions, theta=cfg.rope_theta,
        scaling_factor=cfg.rope_scaling_factor, llama3_scaling=cfg.rope_llama3,
    )


def _norm(p, x, cfg: DecoderConfig):
    return L.rmsnorm(p, x, eps=cfg.rms_norm_eps, zero_centered=cfg.rmsnorm_zero_centered)


# Stable per-target indices for deriving independent LoRA-dropout streams (PEFT has
# one dropout module per adapted projection; each draws its own mask).
_LORA_TARGET_INDEX = {
    "q_proj": 0, "k_proj": 1, "v_proj": 2, "o_proj": 3,
    "gate_proj": 4, "up_proj": 5, "down_proj": 6,
}


def _proj(lp, name, x, lora_layer, lora_cfg, lora_rng=None):
    p = lp[name]
    if "kernel" not in p:  # quantized base (ops/quant.py QUANT_KEYS, QLoRA)
        from projectiontrainer_tpu.ops.quant import quantized_matmul

        y = quantized_matmul(p, x)
    else:
        y = L.linear(p, x)
    if lora_layer is not None:
        from projectiontrainer_tpu.train import lora as lora_mod

        rng = None
        if lora_rng is not None:
            rng = jax.random.fold_in(lora_rng, _LORA_TARGET_INDEX[name])
        y = lora_mod.apply_delta(lora_layer, name, lora_cfg, x, y, rng=rng)
    return y


def _attention_block(lp, cfg: DecoderConfig, x, sin, cos, *, layer_type,
                     kv_mask, q_offset, cache=None, lora_layer=None, lora_cfg=None,
                     lora_rng=None, prefix_len=None):
    b, t, _ = x.shape
    q = _proj(lp, "q_proj", x, lora_layer, lora_cfg, lora_rng).reshape(b, t, cfg.num_heads, cfg.head_dim)
    k = _proj(lp, "k_proj", x, lora_layer, lora_cfg, lora_rng).reshape(b, t, cfg.num_kv_heads, cfg.head_dim)
    v = _proj(lp, "v_proj", x, lora_layer, lora_cfg, lora_rng).reshape(b, t, cfg.num_kv_heads, cfg.head_dim)
    if cfg.qk_norm:
        q = _norm(lp["q_norm"], q, cfg)
        k = _norm(lp["k_norm"], k, cfg)
    q = L.apply_rope(q, sin, cos)
    k = L.apply_rope(k, sin, cos)

    if cache is not None and "kp" in cache:
        # Split prefix/generated decode cache (ops/decode_attention.py): the prefix
        # K/V live at B rows shared by all beams; this step's K/V is written at
        # generated slot ``q_offset`` (= the 0-based decode step t). ``kv_mask`` here
        # is the [B, P] prefix padding mask; ``prefix_len`` the real prefix length.
        from projectiontrainer_tpu.ops.decode_attention import decode_attention

        # split caches are head-major [R, Hkv, G, D] (see ops/decode_attention.py);
        # this step's [R, 1, Hkv, D] K/V swaps to [R, Hkv, 1, D] before the write
        kg = jax.lax.dynamic_update_slice(
            cache["kg"], jnp.swapaxes(k, 1, 2).astype(cache["kg"].dtype),
            (0, 0, q_offset, 0))
        vg = jax.lax.dynamic_update_slice(
            cache["vg"], jnp.swapaxes(v, 1, 2).astype(cache["vg"].dtype),
            (0, 0, q_offset, 0))
        new_cache = {"kp": cache["kp"], "vp": cache["vp"], "kg": kg, "vg": vg}
        window = cfg.sliding_window if layer_type == "sliding" else None
        out = decode_attention(
            q[:, 0].astype(cache["kp"].dtype), cache["kp"], cache["vp"], kg, vg,
            prefix_mask=kv_mask, t=q_offset, prefix_len=prefix_len,
            scale=cfg.attn_scale, window=window, impl=cfg.attn_impl,
        ).astype(q.dtype)
        out = out.reshape(b, t, cfg.num_heads * cfg.head_dim)
        return _proj(lp, "o_proj", out, lora_layer, lora_cfg, lora_rng), new_cache

    new_cache = None
    if cache is not None:
        # Static-shape cache update: write the new K/V at q_offset.
        ck, cv = cache["k"], cache["v"]
        ck = jax.lax.dynamic_update_slice(ck, k.astype(ck.dtype), (0, q_offset, 0, 0))
        cv = jax.lax.dynamic_update_slice(cv, v.astype(cv.dtype), (0, q_offset, 0, 0))
        new_cache = {"k": ck, "v": cv}
        k, v = ck, cv

    window = cfg.sliding_window if layer_type == "sliding" else None
    out = dot_product_attention(
        q, k.astype(q.dtype), v.astype(q.dtype),
        scale=cfg.attn_scale, causal=True, window=window,
        kv_mask=kv_mask, q_offset=q_offset, impl=cfg.attn_impl,
        # cache-based calls are decode/prefill — inference-only, never under grad
        needs_grad=cache is None,
    )
    out = out.reshape(b, t, cfg.num_heads * cfg.head_dim)
    return _proj(lp, "o_proj", out, lora_layer, lora_cfg, lora_rng), new_cache


def _mlp_block(lp, cfg: DecoderConfig, x, lora_layer=None, lora_cfg=None, lora_rng=None):
    act = L.ACTIVATIONS[cfg.act]
    gate = act(_proj(lp, "gate_proj", x, lora_layer, lora_cfg, lora_rng))
    up = _proj(lp, "up_proj", x, lora_layer, lora_cfg, lora_rng)
    return _proj(lp, "down_proj", gate * up, lora_layer, lora_cfg, lora_rng)


def forward(
    params,
    cfg: DecoderConfig,
    *,
    input_ids=None,
    inputs_embeds=None,
    attention_mask=None,   # [B, T_kv] bool/int padding mask over the kv sequence
    positions=None,        # [B, T] int positions (defaults to arange + q_offset)
    cache=None,            # list of per-layer {'k','v'} (monolithic) or
                           # {'kp','vp','kg','vg'} (split prefix/generated) caches
    q_offset=0,
    remat: bool = False,
    lora=None,             # optional LoRA adapter pytree ({'layers': [...]})
    lora_cfg=None,
    lora_rng=None,         # PRNG key enabling LoRA dropout (train steps only)
    prefix_len=None,       # split-cache decode only: REAL prefix length (static int)
):
    """Run the decoder. Returns (hidden_states, new_cache).

    Training: pass ``inputs_embeds`` (e.g. [visual; text] concat) or ``input_ids``; no cache.
    Decoding with a monolithic cache: ``q_offset`` is the number of already-cached
    tokens and ``attention_mask`` must cover the full cache length. Decoding with a
    split cache (see :func:`init_gen_cache`): ``q_offset`` is the 0-based decode step,
    ``attention_mask`` is the [B, P] prefix padding mask, and ``prefix_len`` the real
    (unpadded) prefix length; positions must be passed explicitly.
    """
    if inputs_embeds is None:
        inputs_embeds = embed(params, cfg, input_ids)
    x = inputs_embeds
    b, t, _ = x.shape

    if positions is None:
        positions = jnp.arange(t)[None, :] + q_offset
        positions = jnp.broadcast_to(positions, (b, t))

    kv_mask = None
    if attention_mask is not None:
        kv_mask = attention_mask.astype(bool)

    # Precompute both rope variants once (cheap; avoids per-layer recompute).
    rope_by_type = {}
    for lt in set(cfg.layer_types):
        rope_by_type[lt] = _rope_for_layer(cfg, lt, positions)

    def layer_fn(x, lp, layer_type, layer_cache, lora_layer, layer_rng):
        sin, cos = rope_by_type[layer_type]
        residual = x
        h = _norm(lp["input_norm"], x, cfg)
        h, new_cache = _attention_block(
            lp["attn"], cfg, h, sin, cos, layer_type=layer_type,
            kv_mask=kv_mask, q_offset=q_offset, cache=layer_cache,
            lora_layer=lora_layer, lora_cfg=lora_cfg, lora_rng=layer_rng,
            prefix_len=prefix_len,
        )
        mlp_rng = None if layer_rng is None else jax.random.fold_in(layer_rng, 101)
        if cfg.sandwich_norms:
            h = _norm(lp["post_attn_norm"], h, cfg)
            x = residual + h
            residual = x
            h = _norm(lp["pre_ffw_norm"], x, cfg)
            h = _mlp_block(lp["mlp"], cfg, h, lora_layer, lora_cfg, mlp_rng)
            h = _norm(lp["post_ffw_norm"], h, cfg)
            x = residual + h
        else:
            x = residual + h
            residual = x
            h = _norm(lp["post_attn_norm"], x, cfg)
            h = _mlp_block(lp["mlp"], cfg, h, lora_layer, lora_cfg, mlp_rng)
            x = residual + h
        return x, new_cache

    # Dropout only engages when an rng arrives AND the adapter config asks for it —
    # otherwise layer rngs stay None so the traced graph is unchanged.
    use_dropout = (
        lora_rng is not None and lora is not None
        and lora_cfg is not None and lora_cfg.dropout > 0.0
    )
    new_caches = [] if cache is not None else None
    for i in range(cfg.num_layers):
        layer_cache = cache[i] if cache is not None else None
        lora_layer = lora["layers"][i] if lora is not None else None
        layer_rng = jax.random.fold_in(lora_rng, i) if use_dropout else None
        fn = layer_fn
        # remat=True -> full per-layer rematerialization (min memory);
        # remat='dots' -> save matmul outputs, recompute elementwise only;
        # remat=<int N> -> PARTIAL: fully remat the first N layers, keep the rest
        # un-remated — a memory/speed dial for models that almost fit un-remated
        # (8B QLoRA: full remat re-runs every attention fwd + ffn in the backward;
        # each un-remated layer skips its recompute at ~350-400 MB of saved
        # activations, so N walks the HBM frontier). NOTE: True == 1 in Python,
        # so test identity before the int branch.
        layer_remat = (
            remat if isinstance(remat, (bool, str)) else i < int(remat)
        )
        if layer_remat and layer_cache is None:
            policy = (
                jax.checkpoint_policies.dots_with_no_batch_dims_saveable
                if layer_remat == "dots" else None
            )
            fn = jax.checkpoint(layer_fn, static_argnums=(2,), policy=policy)
        x, nc = fn(x, params["layers"][i], cfg.layer_types[i], layer_cache, lora_layer,
                   layer_rng)
        if new_caches is not None:
            new_caches.append(nc)

    x = _norm(params["final_norm"], x, cfg)
    return x, new_caches


def lm_head_table(params, cfg: DecoderConfig):
    """[V, D] output-projection table (tied embedding or lm_head transpose) — feeds the
    chunked CLM loss so full fp32 logits are never materialized."""
    if cfg.tie_embeddings:
        return params["embed_tokens"]["embedding"]
    return params["lm_head"]["kernel"].T


def logits(params, cfg: DecoderConfig, hidden):
    """LM head: tied transpose of the embedding, or a separate lm_head."""
    if cfg.tie_embeddings:
        w = params["embed_tokens"]["embedding"]
        out = jnp.dot(hidden, w.T.astype(hidden.dtype), preferred_element_type=jnp.float32)
        return out
    return L.linear(params["lm_head"], hidden).astype(jnp.float32)


def init_cache(cfg: DecoderConfig, batch: int, max_len: int, dtype=jnp.bfloat16):
    return [
        {
            "k": jnp.zeros((batch, max_len, cfg.num_kv_heads, cfg.head_dim), dtype),
            "v": jnp.zeros((batch, max_len, cfg.num_kv_heads, cfg.head_dim), dtype),
        }
        for _ in range(cfg.num_layers)
    ]


def split_cache(prefix_cache, cfg: DecoderConfig, rows: int, gen_len: int,
                prefix_mask=None, pad_to: int = 1):
    """Convert a prefilled monolithic cache [B, P] into the split decode structure.

    ``rows`` = B * beams (the generated caches carry one row per beam); ``gen_len`` is
    max_new_tokens. ``pad_to`` pads the prefix/generated lengths up (128 on TPU so the
    Pallas kernel's block shapes tile); the padded prefix region is masked out via the
    returned padded ``prefix_mask``. Returns (cache_list, padded_prefix_mask).
    """
    def rup(n):
        return (n + pad_to - 1) // pad_to * pad_to

    b, p = prefix_cache[0]["k"].shape[:2]
    p_pad, g_pad = rup(p), rup(gen_len)
    dtype = prefix_cache[0]["k"].dtype
    out = []
    for layer in prefix_cache:
        # one-time prefill→decode transpose to the head-major split layout
        # [B, Hkv, P, D] (ops/decode_attention.py block-tiling requirement)
        kp, vp = jnp.swapaxes(layer["k"], 1, 2), jnp.swapaxes(layer["v"], 1, 2)
        if p_pad != p:
            pad = [(0, 0), (0, 0), (0, p_pad - p), (0, 0)]
            kp, vp = jnp.pad(kp, pad), jnp.pad(vp, pad)
        zeros = jnp.zeros((rows, cfg.num_kv_heads, g_pad, cfg.head_dim), dtype)
        out.append({"kp": kp, "vp": vp, "kg": zeros, "vg": zeros})
    if prefix_mask is not None and p_pad != p:
        prefix_mask = jnp.pad(prefix_mask.astype(jnp.int32), [(0, 0), (0, p_pad - p)])
    return out, prefix_mask


# ---------------------------------------------------------------------------- HF import


def params_from_hf_state_dict(cfg: DecoderConfig, sd) -> dict:
    """Port an HF Gemma3TextModel/Qwen3Model(-ForCausalLM) state dict (numpy arrays) into
    this decoder's pytree. Linear weights transpose (out,in)->(in,out)."""

    def get(name):
        for prefix in ("model.", ""):
            key = prefix + name
            if key in sd:
                return np.asarray(sd[key])
        raise KeyError(name)

    def lin(name):
        p = {"kernel": get(name + ".weight").T}
        if name + ".bias" in sd or "model." + name + ".bias" in sd:
            p["bias"] = get(name + ".bias")
        return p

    params = {
        "embed_tokens": {"embedding": get("embed_tokens.weight")},
        "final_norm": {"scale": get("norm.weight")},
        "layers": [],
    }
    if not cfg.tie_embeddings:
        if "lm_head.weight" in sd:
            params["lm_head"] = {"kernel": np.asarray(sd["lm_head.weight"]).T}
        else:
            params["lm_head"] = {"kernel": get("embed_tokens.weight").T.copy()}
    for i in range(cfg.num_layers):
        pre = f"layers.{i}."
        layer = {
            "input_norm": {"scale": get(pre + "input_layernorm.weight")},
            "attn": {
                "q_proj": lin(pre + "self_attn.q_proj"),
                "k_proj": lin(pre + "self_attn.k_proj"),
                "v_proj": lin(pre + "self_attn.v_proj"),
                "o_proj": lin(pre + "self_attn.o_proj"),
            },
            "mlp": {
                "gate_proj": lin(pre + "mlp.gate_proj"),
                "up_proj": lin(pre + "mlp.up_proj"),
                "down_proj": lin(pre + "mlp.down_proj"),
            },
        }
        if cfg.qk_norm:
            layer["attn"]["q_norm"] = {"scale": get(pre + "self_attn.q_norm.weight")}
            layer["attn"]["k_norm"] = {"scale": get(pre + "self_attn.k_norm.weight")}
        if cfg.sandwich_norms:
            layer["post_attn_norm"] = {"scale": get(pre + "post_attention_layernorm.weight")}
            layer["pre_ffw_norm"] = {"scale": get(pre + "pre_feedforward_layernorm.weight")}
            layer["post_ffw_norm"] = {"scale": get(pre + "post_feedforward_layernorm.weight")}
        else:
            layer["post_attn_norm"] = {"scale": get(pre + "post_attention_layernorm.weight")}
        params["layers"].append(layer)
    return jax.tree.map(jnp.asarray, params)
