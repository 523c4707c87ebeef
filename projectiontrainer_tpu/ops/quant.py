"""Weight-only quantization for the QLoRA base: block-wise NF4 (4-bit) and int8.

The reference loads frozen/LoRA-base LLM weights in 4-bit NF4 via bitsandbytes CUDA
kernels (Stage1/train_projection_stage1.py:195-200, Stage2/train_vqa_stage2.py:171-177).
Both methods here are TPU-native:

- **NF4** (default under ``--enable_qlora``, matching the reference): per-64-value
  blocks along the input dim, absmax-scaled, values snapped to the 16-entry
  normal-quantile codebook; two codes packed per uint8 → [in/2, out] storage (the 2-D
  layout keeps megatron TP shardings identical to the bf16 kernel's). 4x memory saving
  vs bf16. Divergence from bitsandbytes: block scales stay fp32 (no double-quant of
  the scales — a ~0.4 bit/param storage difference, numerics unaffected).
- **int8**: symmetric per-output-channel, 2x saving, cheapest dequant (fastest step).

A quantized linear is {'qvalues': int8 [in, out], 'scales': f32 [out]} (int8) or
{'packed_nf4': uint8 [in/2, out], 'block_scales': f32 [in/64, out]} (nf4);
:func:`quantized_matmul` dispatches on the keys, dequantizing into the GEMM feed so
the MXU still sees a dense bf16 matmul.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

import numpy as np

# bitsandbytes' NF4 codebook: the 16 quantiles of a standard normal, scaled to [-1, 1].
# Kept as NUMPY at module scope: this module is imported lazily inside jitted/remat
# traces, and a module-level jnp constant created mid-trace leaks a tracer.
NF4_CODE = np.asarray([
    -1.0, -0.6961928009986877, -0.5250730514526367, -0.39491748809814453,
    -0.28444138169288635, -0.18477343022823334, -0.09105003625154495, 0.0,
    0.07958029955625534, 0.16093020141124725, 0.24611230194568634,
    0.33791524171829224, 0.44070982933044434, 0.5626170039176941,
    0.7229568362236023, 1.0,
], np.float32)
NF4_BLOCK = 64


def quantize(w: jnp.ndarray, *, axis: int = 0) -> dict:
    """Symmetric per-output-channel int8. w: [in, out] -> qvalues int8 + scales f32."""
    w = w.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(w), axis=axis, keepdims=True)
    scales = jnp.maximum(absmax / 127.0, 1e-12)
    q = jnp.clip(jnp.round(w / scales), -127, 127).astype(jnp.int8)
    return {"qvalues": q, "scales": scales.squeeze(axis)}


def dequantize(qp: dict, *, axis: int = 0, dtype=jnp.bfloat16) -> jnp.ndarray:
    scales = jnp.expand_dims(qp["scales"], axis)
    return (qp["qvalues"].astype(jnp.float32) * scales).astype(dtype)


def quantize_nf4(w: jnp.ndarray, *, block: int = NF4_BLOCK) -> dict:
    """Block-wise NF4: [in, out] -> packed uint8 [in/2, out] + f32 scales [in/block, out].

    Blocks run along the INPUT dim per output column, and codes are packed along
    input-dim pairs, so both storage tensors shard over the ('data','model') mesh with
    the same PartitionSpecs as the bf16 kernel (output-dim TP divides axis 1; input-dim
    TP divides axis 0, with in/2 and in/block both divisible whenever in is).
    """
    din, dout = w.shape
    block = min(block, din)  # tiny test models; production dims are all % 64 == 0
    assert din % block == 0 and din % 2 == 0, (din, block)
    w = w.astype(jnp.float32)
    blocks = w.reshape(din // block, block, dout)
    absmax = jnp.max(jnp.abs(blocks), axis=1)                       # [in/block, out]
    scales = jnp.maximum(absmax, 1e-12)
    norm = blocks / scales[:, None, :]
    # nearest codebook entry via midpoint boundaries (codebook is sorted)
    mid = (NF4_CODE[1:] + NF4_CODE[:-1]) / 2.0
    idx = jnp.searchsorted(mid, norm.reshape(-1)).reshape(din, dout).astype(jnp.uint8)
    pairs = idx.reshape(din // 2, 2, dout)
    packed = (pairs[:, 0, :] << 4) | pairs[:, 1, :]
    return {"packed_nf4": packed, "block_scales": scales}


def dequantize_nf4(qp: dict, *, dtype=jnp.bfloat16) -> jnp.ndarray:
    packed = qp["packed_nf4"]
    scales = qp["block_scales"]
    half, dout = packed.shape
    din = half * 2
    block = din // scales.shape[0]
    hi = (packed >> 4).astype(jnp.int32)
    lo = (packed & 0xF).astype(jnp.int32)
    idx = jnp.stack([hi, lo], axis=1).reshape(din, dout)
    vals = jnp.asarray(NF4_CODE)[idx]                              # [in, out] f32
    vals = vals.reshape(din // block, block, dout) * scales[:, None, :]
    return vals.reshape(din, dout).astype(dtype)


def quantize_linear(p: dict, *, method: str = "int8") -> dict:
    """Quantize a Linear params dict {'kernel': [in,out], 'bias'?} in place-shape."""
    if method == "nf4":
        out = quantize_nf4(p["kernel"])
    else:
        out = quantize(p["kernel"], axis=0)
    if "bias" in p:
        out["bias"] = p["bias"]
    return out


def is_quantized(p: dict) -> bool:
    return "qvalues" in p or "packed_nf4" in p


def quantized_matmul(qp: dict, x: jnp.ndarray) -> jnp.ndarray:
    """x @ dequant(W) (+ bias). XLA fuses the dequant into the GEMM feed."""
    if "packed_nf4" in qp:
        w = dequantize_nf4(qp, dtype=x.dtype)
    else:
        w = dequantize(qp, axis=0, dtype=x.dtype)
    y = jnp.dot(x, w, preferred_element_type=jnp.float32)
    if "bias" in qp:
        y = y + qp["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


QUANT_TARGETS = ("q_proj", "k_proj", "v_proj", "o_proj", "gate_proj", "up_proj", "down_proj")


def quantize_decoder(dec_params: dict, targets=QUANT_TARGETS, *,
                     method: str = "int8") -> dict:
    """Quantize every projection matrix of a decoder pytree (embeddings/norms stay in
    their original dtype — matching the reference, where bitsandbytes only quantizes
    nn.Linear modules). method: 'int8' | 'nf4' (the reference's bitsandbytes format)."""
    out = {k: v for k, v in dec_params.items() if k != "layers"}
    layers = []
    for layer in dec_params["layers"]:
        new_layer = {}
        for blk_name, blk in layer.items():
            if blk_name in ("attn", "mlp"):
                new_layer[blk_name] = {
                    t: (quantize_linear(p, method=method)
                        if t in targets and "kernel" in p else p)
                    for t, p in blk.items()
                }
            else:
                new_layer[blk_name] = blk
        layers.append(new_layer)
    out["layers"] = layers
    return out


def quantization_error(qp: dict, kernel) -> float:
    """Max dequantization error of a quantized linear vs its original ``kernel``,
    relative to the kernel's max-abs value (diagnostics for QLoRA fidelity debugging)."""
    w = jnp.asarray(kernel, jnp.float32)
    if "packed_nf4" in qp:
        deq = dequantize_nf4(qp, dtype=jnp.float32)
    else:
        deq = dequantize(qp, dtype=jnp.float32)
    err = jnp.max(jnp.abs(deq - w))
    return float(err / jnp.maximum(jnp.max(jnp.abs(w)), 1e-12))
