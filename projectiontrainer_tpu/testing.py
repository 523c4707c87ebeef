"""Tiny model factories + synthetic CXR data — shared by tests, bench.py and the graft
entry. Shapes mirror the real stack (SigLIP ViT tower -> projector -> Gemma3-style
decoder) scaled down so CPU runs finish in seconds."""

from __future__ import annotations

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from projectiontrainer_tpu.models import decoder as dec
from projectiontrainer_tpu.models import projector as proj
from projectiontrainer_tpu.models import siglip, vlm


def tiny_vision_cfg(image_size=32, patch=8, hidden=32, layers=2, heads=4,
                    use_head=False) -> siglip.VisionConfig:
    return siglip.VisionConfig(
        hidden_size=hidden, intermediate_size=hidden * 4, num_layers=layers,
        num_heads=heads, image_size=image_size, patch_size=patch, use_head=use_head,
    )


def tiny_llm_cfg(vocab=128, hidden=48, layers=2, heads=2, kv_heads=1,
                 head_dim=16) -> dec.DecoderConfig:
    return dec.gemma3_config(
        vocab_size=vocab, hidden_size=hidden, intermediate_size=hidden * 3,
        num_layers=layers, num_heads=heads, num_kv_heads=kv_heads, head_dim=head_dim,
        sliding_window=16, query_pre_attn_scalar=head_dim,
    )


def tiny_vlm_cfg(**kw) -> vlm.VLMConfig:
    vis = tiny_vision_cfg(**{k[4:]: v for k, v in kw.items() if k.startswith("vis_")})
    llm = tiny_llm_cfg(**{k[4:]: v for k, v in kw.items() if k.startswith("llm_")})
    return vlm.VLMConfig(
        vision=vis,
        projector=proj.ProjectorConfig(
            vision_dim=vis.hidden_size, llm_dim=llm.hidden_size, expansion_factor=2
        ),
        llm=llm,
    )


def tiny_siglip_cfg(image_size=32, patch=8, hidden=32, layers=2, heads=4, vocab=128,
                    text_len=16) -> siglip.SiglipConfig:
    return siglip.SiglipConfig(
        vision=tiny_vision_cfg(image_size=image_size, patch=patch, hidden=hidden,
                               layers=layers, heads=heads, use_head=True),
        text=siglip.TextConfig(
            hidden_size=hidden, intermediate_size=hidden * 4, num_layers=layers,
            num_heads=heads, vocab_size=vocab, max_position_embeddings=text_len,
        ),
    )


def synthetic_corpus(tmp_dir: str, *, n: int = 16, image_size: int = 32,
                     seed: int = 0) -> tuple[str, str]:
    """Write n synthetic JPEG 'x-rays' + a manifest with the reference's field names.
    Returns (image_root, manifest_path)."""
    from PIL import Image

    rng = np.random.default_rng(seed)
    root = os.path.join(tmp_dir, "images")
    os.makedirs(root, exist_ok=True)
    labels = ["Pneumonia", "Edema", "Cardiomegaly", "No Finding"]
    samples = []
    for i in range(n):
        name = f"cxr_{i}.jpg"
        arr = rng.integers(0, 256, size=(image_size, image_size, 3), dtype=np.uint8)
        Image.fromarray(arr).save(os.path.join(root, name))
        label = labels[i % len(labels)]
        samples.append({
            "image": name,
            "problem": "What disease is shown in this chest x-ray ?",
            "normal_caption": label,
        })
    manifest = os.path.join(tmp_dir, "data.json")
    with open(manifest, "w") as f:
        json.dump(samples, f)
    return root, manifest


def word_tokenizer(extra_words=()):
    """Offline WordLevel tokenizer with the CXR label vocabulary baked in."""
    from tokenizers import Tokenizer
    from tokenizers.models import WordLevel
    from tokenizers.pre_tokenizers import Whitespace
    from tokenizers.processors import TemplateProcessing
    from transformers import PreTrainedTokenizerFast

    base = ["<pad>", "<s>", "</s>", "<unk>"]
    words = base + [
        "Pneumonia", "Edema", "Cardiomegaly", "No", "Finding", "What", "disease",
        "is", "shown", "in", "this", "chest", "x-ray", "?", "a", "the",
    ] + list(extra_words)
    vocab = {w: i for i, w in enumerate(dict.fromkeys(words))}
    tok = Tokenizer(WordLevel(vocab, unk_token="<unk>"))
    tok.pre_tokenizer = Whitespace()
    tok.post_processor = TemplateProcessing(
        single="<s> $A </s>",
        special_tokens=[("<s>", vocab["<s>"]), ("</s>", vocab["</s>"])],
    )
    return PreTrainedTokenizerFast(
        tokenizer_object=tok, pad_token="<pad>", eos_token="</s>", bos_token="<s>",
        unk_token="<unk>",
    )


def synthetic_quantized_decoder(llm_cfg, *, seed: int = 0, method: str = "int8"):
    """Decoder pytree with int8 projections (+f32 scales) and bf16 embeddings/norms —
    structurally identical to ``quantize_decoder(decoder.init(...))`` but generated with
    the (fast, vectorized) numpy RNG and without ever materializing the bf16 projection
    weights: a bf16 8B decoder would OOM a 16 GB chip before quantization, and jax's
    threefry PRNG takes minutes to draw ~8B values on CPU. Used by bench.py and the
    production-dims multichip dryrun."""
    rng = np.random.default_rng(seed)
    h = llm_cfg.hidden_size
    q_dim = llm_cfg.num_heads * llm_cfg.head_dim
    kv_dim = llm_cfg.num_kv_heads * llm_cfg.head_dim
    zc = llm_cfg.rmsnorm_zero_centered

    # bulk RNG is minutes-slow on a contended host CPU for ~8B draws; tile a small
    # random block with row-rolls instead — statistically meaningless but numerically
    # well-behaved, which is all a synthetic perf model needs
    _blocks: dict = {}

    def _block(shape, dtype, gen):
        if shape not in _blocks:
            _blocks[shape] = gen(shape)
        return np.roll(_blocks[shape], int(rng.integers(0, shape[0])), axis=0)

    def emb(n, d, scale=0.02):
        rows = min(n, 512)
        small = rng.standard_normal(size=(rows, d), dtype=np.float32) * scale
        small = np.asarray(jnp.asarray(small, jnp.bfloat16))  # convert once, small
        reps = -(-n // rows)
        return jnp.asarray(np.tile(small, (reps, 1))[:n])

    def norm(d):
        return {"scale": jnp.zeros((d,), jnp.bfloat16) if zc else jnp.ones((d,), jnp.bfloat16)}

    def qlin(din, dout):
        if method in ("nf4", "nf4-mirror"):
            packed = _block((din // 2, dout), np.uint8,
                            lambda s: rng.integers(0, 256, size=s, dtype=np.uint8))
            block = min(64, din)
            qp = {
                "packed_nf4": jnp.asarray(packed),
                "block_scales": jnp.full((din // block, dout), 0.02, jnp.float32),
            }
            if method == "nf4-mirror":
                from projectiontrainer_tpu.ops.quant import nf4_int8_mirror
                qp = jax.jit(nf4_int8_mirror)(qp)
            return qp
        q = _block((din, dout), np.int8,
                   lambda s: rng.integers(-127, 128, size=s, dtype=np.int8))
        return {
            "qvalues": jnp.asarray(q),
            "scales": jnp.full((dout,), 0.02 / 127.0, jnp.float32),
        }

    params = {
        "embed_tokens": {"embedding": emb(llm_cfg.vocab_size, h)},
        "final_norm": norm(h),
        "layers": [],
    }
    if not llm_cfg.tie_embeddings:
        params["lm_head"] = {"kernel": emb(h, llm_cfg.vocab_size)}
    for _ in range(llm_cfg.num_layers):
        layer = {
            "input_norm": norm(h),
            "attn": {
                "q_proj": qlin(h, q_dim),
                "k_proj": qlin(h, kv_dim),
                "v_proj": qlin(h, kv_dim),
                "o_proj": qlin(q_dim, h),
            },
            "mlp": {
                "gate_proj": qlin(h, llm_cfg.intermediate_size),
                "up_proj": qlin(h, llm_cfg.intermediate_size),
                "down_proj": qlin(llm_cfg.intermediate_size, h),
            },
        }
        if llm_cfg.qk_norm:
            layer["attn"]["q_norm"] = norm(llm_cfg.head_dim)
            layer["attn"]["k_norm"] = norm(llm_cfg.head_dim)
        if llm_cfg.sandwich_norms:
            for name in ("post_attn_norm", "pre_ffw_norm", "post_ffw_norm"):
                layer[name] = norm(h)
        else:
            layer["post_attn_norm"] = norm(h)
        params["layers"].append(layer)
    return params
