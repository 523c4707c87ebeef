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
