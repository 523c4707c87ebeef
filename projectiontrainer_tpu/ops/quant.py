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
- **nf4-mirror**: NF4 quantization (identical codes/scales — same fidelity-defining
  value grid) but computed through a block-wise int8 *compute mirror*: codes are
  re-encoded once at load as ``round(127*CODE[c])`` int8 with ``block_scales/127``.
  Dequant becomes a cast+scale (2 VPU ops/element) instead of a 16-entry LUT.

The mirror exists because the NF4 codebook lookup is inherently VPU-bound on TPU:
XLA lowers the 16-entry gather to a ~40-op compare/select chain per weight element,
which measures 500us per 4096x4096 GEMV on v5e where the int8 path runs 16-33us
(memory-bound optimum) — a 15x decode gap and +60% on training GEMMs. A fused
Pallas dequant-matmul was built and measured (BENCH_EXTRA_r04.json) at only 1.2x
over the XLA LUT path — the LUT arithmetic itself is the floor, so the fix is to
remove the LUT from the compute path, not to fuse it. Re-encoding to the int8 grid
perturbs each dequantized value by at most 1/254 (0.39%), an order of magnitude
below NF4's own ~3% block-quantization error; tests/test_quant.py asserts dequant
values within 1/254 of the exact LUT path element-wise and that a 50-step QLoRA
loss curve over the mirror diverges from the exact-NF4 curve no more than a
dense-bf16 control does (trajectory chaos, not quantization, sets that floor).

A quantized linear is {'qvalues': int8 [in, out], 'scales': f32 [out]} (int8),
{'packed_nf4': uint8 [in/2, out], 'block_scales': f32 [in/64, out]} (nf4), or
{'qvalues_block': int8 [in, out], 'block_scales': f32 [in/64, out]} (nf4-mirror);
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


def nf4_int8_mirror(qp: dict) -> dict:
    """One-time conversion of an NF4 linear to its block-wise int8 compute mirror.

    The value grid is preserved up to int8 rounding: dequant(mirror) =
    round(127*CODE[c]) * (scale/127) vs the exact CODE[c] * scale — max relative
    perturbation 1/254 per element (measured 3.7e-3 end-to-end), removing the
    VPU-bound 16-entry LUT from every subsequent matmul."""
    packed = qp["packed_nf4"]
    half, dout = packed.shape
    hi = (packed >> 4).astype(jnp.int32)
    lo = (packed & 0xF).astype(jnp.int32)
    idx = jnp.stack([hi, lo], axis=1).reshape(half * 2, dout)
    code8 = jnp.asarray(np.round(NF4_CODE * 127.0), jnp.int8)
    out = {"qvalues_block": code8[idx],
           "block_scales": qp["block_scales"] / 127.0}
    if "bias" in qp:
        out["bias"] = qp["bias"]
    return out


def dequantize_block_int8(qp: dict, *, dtype=jnp.bfloat16) -> jnp.ndarray:
    q = qp["qvalues_block"]
    scales = qp["block_scales"]
    din, dout = q.shape
    block = din // scales.shape[0]
    vals = q.astype(jnp.float32).reshape(din // block, block, dout) * scales[:, None, :]
    return vals.reshape(din, dout).astype(dtype)


def quantize_linear(p: dict, *, method: str = "int8") -> dict:
    """Quantize a Linear params dict {'kernel': [in,out], 'bias'?} in place-shape."""
    if method == "nf4":
        out = quantize_nf4(p["kernel"])
    elif method == "nf4-mirror":
        out = nf4_int8_mirror(quantize_nf4(p["kernel"]))
    else:
        out = quantize(p["kernel"], axis=0)
    if "bias" in p:
        out["bias"] = p["bias"]
    return out


QUANT_KEYS = ("qvalues", "packed_nf4", "qvalues_block")


def is_quantized(p: dict) -> bool:
    return any(k in p for k in QUANT_KEYS)


def quantized_matmul(qp: dict, x: jnp.ndarray) -> jnp.ndarray:
    """x @ dequant(W) (+ bias). XLA fuses the dequant into the GEMM feed."""
    if "packed_nf4" in qp:
        w = dequantize_nf4(qp, dtype=x.dtype)
    elif "qvalues_block" in qp:
        w = dequantize_block_int8(qp, dtype=x.dtype)
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
    nn.Linear modules). method: 'int8' | 'nf4' (the reference's bitsandbytes format)
    | 'nf4-mirror' (NF4 grid, block-int8 compute — see module docstring)."""
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
    elif "qvalues_block" in qp:
        deq = dequantize_block_int8(qp, dtype=jnp.float32)
    else:
        deq = dequantize(qp, dtype=jnp.float32)
    err = jnp.max(jnp.abs(deq - w))
    return float(err / jnp.maximum(jnp.max(jnp.abs(w)), 1e-12))
