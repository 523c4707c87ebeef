"""LoRA as a pytree-partitioned adapter over the decoder's projection matrices.

Replaces the reference's PEFT QLoRA stack (reference: Stage2/train_vqa_stage2.py:169-244:
``LoraConfig(r=16, alpha=32, dropout=.05, targets q/k/v/o/gate/up/down)``). Adapters live in
a separate ``params['lora']`` subtree mirroring the decoder layout, so the trainable mask is
just "the lora subtree" and base weights stay frozen (and can be quantized independently).

Forward merge: ``W_eff = W + (alpha/r) * A @ B`` applied lazily inside the decoder by
pre-merging before each step is WRONG for memory (it materializes full-size deltas); instead
we compute ``x @ A @ B`` as two thin matmuls — at r=16 this is ~1% extra FLOPs and keeps the
base matmul untouched for the MXU.

QLoRA base quantization is TPU-native here: ``ops/quant.py`` implements block-wise NF4
(bitsandbytes codebook, packed uint8 nibbles) and int8 absmax schemes; the frozen base is
held quantized and dequantized on the fly inside the decoder matmuls (``--enable_qlora``
selects the scheme via ``--quant_method {nf4,nf4-mirror,int8}``).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from projectiontrainer_tpu.models.decoder import DecoderConfig

TARGETS = ("q_proj", "k_proj", "v_proj", "o_proj", "gate_proj", "up_proj", "down_proj")


@dataclasses.dataclass(frozen=True)
class LoraConfig:
    r: int = 16
    alpha: int = 32
    dropout: float = 0.05
    targets: tuple = TARGETS

    def __post_init__(self):
        if not 0.0 <= self.dropout < 1.0:
            # dropout=1.0 would zero the LoRA branch always AND divide the
            # inverted-dropout rescale by a zero keep threshold — reject up front
            raise ValueError(f"lora dropout must be in [0, 1), got {self.dropout}")

    @property
    def scaling(self) -> float:
        return self.alpha / self.r


def init(key, dec_cfg: DecoderConfig, cfg: LoraConfig, dtype=jnp.float32):
    """Per-layer, per-target A (in, r) gaussian / B (r, out) zeros — PEFT init semantics."""
    h = dec_cfg.hidden_size
    q_dim = dec_cfg.num_heads * dec_cfg.head_dim
    kv_dim = dec_cfg.num_kv_heads * dec_cfg.head_dim
    dims = {
        "q_proj": (h, q_dim), "k_proj": (h, kv_dim), "v_proj": (h, kv_dim),
        "o_proj": (q_dim, h), "gate_proj": (h, dec_cfg.intermediate_size),
        "up_proj": (h, dec_cfg.intermediate_size),
        "down_proj": (dec_cfg.intermediate_size, h),
    }
    layers = []
    keys = jax.random.split(key, dec_cfg.num_layers)
    for i in range(dec_cfg.num_layers):
        tkeys = jax.random.split(keys[i], len(cfg.targets))
        layer = {}
        for t, tk in zip(cfg.targets, tkeys):
            din, dout = dims[t]
            layer[t] = {
                "a": (jax.random.normal(tk, (din, cfg.r)) * (1.0 / cfg.r)).astype(dtype),
                "b": jnp.zeros((cfg.r, dout), dtype),
            }
        layers.append(layer)
    return {"layers": layers}


def dropout_stream(rng):
    """Re-key a threefry PRNG key onto the ``rbg`` implementation for the LoRA
    dropout stream.

    Dropout draws one bernoulli mask per adapted projection per layer — ~1e10
    random bits per stage-2 step on an 8B model (doubled under remat). Threefry
    synthesizes those bits in ~10 VPU ops per 32-bit word, which measurably taxes
    the train step; ``rbg`` keys generate bits with the hardware ``RngBitGenerator``
    instead. ``fold_in``/``split`` still work on rbg keys, so the per-layer,
    per-target stream derivation in models/decoder.py is unchanged. Statistical
    semantics are identical (independent bernoulli masks); only the bit generator
    differs, so masks differ from the threefry stream draw-for-draw — acceptable
    for dropout, whose contract is distributional."""
    if rng is None:
        return None
    data = jax.random.bits(rng, (4,), jnp.uint32)
    return jax.random.wrap_key_data(data, impl="rbg")


def apply_delta(lora_layer_params, target: str, cfg: LoraConfig, x, y, rng=None):
    """y + scaling * (dropout(x) @ A) @ B for one projection; no-op if target not
    adapted. ``rng`` enables PEFT-style LoRA dropout (train only — eval passes None):
    inverted dropout on the LoRA-branch input, the base path untouched (PEFT
    ``lora.Linear.forward``; reference LoraConfig dropout=.05 at
    Stage2/train_vqa_stage2.py:236). ``rng=None`` or ``dropout=0`` is the identity —
    bit-for-bit the pre-dropout behavior."""
    if lora_layer_params is None or target not in lora_layer_params:
        return y
    p = lora_layer_params[target]
    a = p["a"].astype(x.dtype)
    b = p["b"].astype(x.dtype)
    scale = cfg.scaling
    if rng is not None and cfg.dropout > 0.0:
        # bernoulli(keep) as a 16-bit threshold test: 2 VPU ops/element vs ~6 for
        # the f32-uniform path (bits+shift+or+bitcast+sub+cmp) — this runs over
        # every LoRA-branch input element, ~1e10/step on an 8B model. The keep
        # probability is quantized to 1/65536 (|Δp| <= 8e-6); the inverted-dropout
        # rescale uses that EXACT effective keep and — by linearity of
        # (mask*x) @ A @ B — is folded into the scalar branch scale instead of a
        # per-element divide.
        thresh = min(int(round((1.0 - cfg.dropout) * 65536.0)), 65535)
        bits = jax.random.bits(rng, x.shape, "uint16")
        x = jnp.where(bits < jnp.uint16(thresh), x, jnp.zeros((), x.dtype))
        scale = scale * (65536.0 / thresh)
    delta = jnp.dot(jnp.dot(x, a, preferred_element_type=jnp.float32).astype(x.dtype), b,
                    preferred_element_type=jnp.float32)
    return y + scale * delta.astype(y.dtype)


def merge_into_decoder(dec_params, lora_params, cfg: LoraConfig):
    """Materialize W + scale*A@B into a plain decoder pytree (export / fast inference)."""
    attn_targets = {"q_proj", "k_proj", "v_proj", "o_proj"}
    merged = jax.tree.map(lambda x: x, dec_params)  # copy via identity map
    for i, layer in enumerate(lora_params["layers"]):
        for t, p in layer.items():
            dst = merged["layers"][i]["attn"] if t in attn_targets else merged["layers"][i]["mlp"]
            tp = dst[t]
            if "kernel" not in tp:
                # quantized base (int8 / nf4 / nf4-mirror): dequantize to dense bf16
                from projectiontrainer_tpu.ops.quant import (
                    dequantize, dequantize_block_int8, dequantize_nf4)

                if "packed_nf4" in tp:
                    w = dequantize_nf4(tp, dtype=jnp.bfloat16)
                elif "qvalues_block" in tp:
                    w = dequantize_block_int8(tp, dtype=jnp.bfloat16)
                else:
                    w = dequantize(tp, dtype=jnp.bfloat16)
                tp = {"kernel": w, **({"bias": tp["bias"]} if "bias" in tp else {})}
            w = tp["kernel"]
            delta = (p["a"].astype(jnp.float32) @ p["b"].astype(jnp.float32)) * cfg.scaling
            dst[t] = dict(tp, kernel=(w.astype(jnp.float32) + delta).astype(w.dtype))
    return merged
