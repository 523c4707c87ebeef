"""Weight-only int8 quantization — the TPU stand-in for bitsandbytes NF4 (QLoRA base).

The reference loads frozen/LoRA-base LLM weights in 4-bit NF4 via bitsandbytes CUDA
kernels (Stage1/train_projection_stage1.py:195-200, Stage2/train_vqa_stage2.py:171-177).
NF4 has no TPU kernel; the documented equivalent (SURVEY §7.3.5) is symmetric per-channel
int8: 2x memory saving vs bf16, dequantized inside the matmul so the MXU still sees a
dense GEMM. The ``--enable_qlora`` flag surface is preserved; the fidelity delta
(int8 vs nf4) is a documented divergence.

A quantized linear is a params subtree {'qvalues': int8 [in, out], 'scales': f32 [out],
('bias': f32)} produced by :func:`quantize_linear`; :func:`quantized_matmul` computes
``x @ (qvalues * scales)`` with the dequantize fused by XLA into the matmul epilogue.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


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


def quantize_linear(p: dict) -> dict:
    """Quantize a Linear params dict {'kernel': [in,out], 'bias'?} in place-shape."""
    out = quantize(p["kernel"], axis=0)
    if "bias" in p:
        out["bias"] = p["bias"]
    return out


def is_quantized(p: dict) -> bool:
    return "qvalues" in p


def quantized_matmul(qp: dict, x: jnp.ndarray) -> jnp.ndarray:
    """x @ dequant(W) (+ bias). XLA fuses the int8->bf16 dequant into the GEMM feed."""
    w = dequantize(qp, axis=0, dtype=x.dtype)
    y = jnp.dot(x, w, preferred_element_type=jnp.float32)
    if "bias" in qp:
        y = y + qp["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


QUANT_TARGETS = ("q_proj", "k_proj", "v_proj", "o_proj", "gate_proj", "up_proj", "down_proj")


def quantize_decoder(dec_params: dict, targets=QUANT_TARGETS) -> dict:
    """Quantize every projection matrix of a decoder pytree (embeddings/norms stay in
    their original dtype — matching the reference, where bitsandbytes only quantizes
    nn.Linear modules)."""
    out = {k: v for k, v in dec_params.items() if k != "layers"}
    layers = []
    for layer in dec_params["layers"]:
        new_layer = {}
        for blk_name, blk in layer.items():
            if blk_name in ("attn", "mlp"):
                new_layer[blk_name] = {
                    t: (quantize_linear(p) if t in targets and "kernel" in p else p)
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
    err = jnp.max(jnp.abs(dequantize(qp, dtype=jnp.float32) - w))
    return float(err / jnp.maximum(jnp.max(jnp.abs(w)), 1e-12))
