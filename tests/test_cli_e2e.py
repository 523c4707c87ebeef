"""CLI end-to-end: train_stage1 -> infer_stage1 -> train_stage2 against real local HF
snapshots (tiny random models saved with save_pretrained) — the full user workflow
including HF import, tokenizer loading, reference flag parsing, and artifact formats."""

import json
import os

import numpy as np
import pytest
import torch

from projectiontrainer_tpu import testing as T

pytestmark = pytest.mark.slow  # torch/HF parity fixtures dominate the suite runtime


@pytest.fixture(scope="module")
def snapshots(tmp_path_factory):
    """Local HF snapshot dirs for a tiny SigLIP and a tiny Gemma3 + tokenizer."""
    from transformers import (
        Gemma3TextConfig, SiglipConfig, SiglipTextConfig, SiglipVisionConfig,
    )
    from transformers.models.gemma3.modeling_gemma3 import Gemma3ForCausalLM
    from transformers.models.siglip.modeling_siglip import SiglipModel

    base = tmp_path_factory.mktemp("snapshots")
    torch.manual_seed(0)

    vis_dir = str(base / "siglip-tiny")
    siglip_cfg = SiglipConfig(
        vision_config=SiglipVisionConfig(
            hidden_size=32, intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=4, image_size=32, patch_size=8,
        ).to_dict(),
        text_config=SiglipTextConfig(
            hidden_size=32, intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=4, vocab_size=64, max_position_embeddings=16,
        ).to_dict(),
    )
    SiglipModel(siglip_cfg).save_pretrained(vis_dir)

    llm_dir = str(base / "gemma3-tiny")
    tok = T.word_tokenizer()
    vocab = len(tok.get_vocab())
    llm_cfg = Gemma3TextConfig(
        vocab_size=vocab, hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=2, num_key_value_heads=1, head_dim=16, sliding_window=8,
        query_pre_attn_scalar=16, max_position_embeddings=256,
    )
    Gemma3ForCausalLM(llm_cfg).save_pretrained(llm_dir)
    tok.save_pretrained(llm_dir)
    return vis_dir, llm_dir


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp("cli_corpus"))
    root, manifest = T.synthetic_corpus(tmp, n=8, image_size=32)
    return root, manifest


def test_cli_stage1_then_infer(snapshots, corpus, tmp_path):
    from projectiontrainer_tpu.cli import infer_stage1, train_stage1

    vis_dir, llm_dir = snapshots
    root, manifest = corpus
    out = str(tmp_path / "s1")
    result = train_stage1.main([
        "--image_root", root, "--train_json", manifest, "--output_dir", out,
        "--vision_model_name", vis_dir, "--llm_name", llm_dir,
        "--img_size", "32", "--batch_size", "2", "--num_epochs", "1",
        "--learning_rate", "1e-3", "--max_caption_len", "12",
        "--train_val_split", "0.25", "--num_workers", "2", "--mesh_data", "1",
        "--disable_wandb", "--expansion_factor", "2",
    ])
    assert np.isfinite(result["train/epoch_loss"])
    assert os.path.exists(os.path.join(out, "projector_final.bin"))

    image = os.path.join(root, "cxr_0.jpg")
    text = infer_stage1.main([
        "--image_path", image, "--vision_model_name", vis_dir, "--llm_name", llm_dir,
        "--projection_path", out, "--img_size", "32", "--max_new_tokens", "4",
    ])
    assert isinstance(text, str)


def test_cli_stage2_qlora(snapshots, corpus, tmp_path):
    from projectiontrainer_tpu.cli import train_stage1, train_stage2

    vis_dir, llm_dir = snapshots
    root, manifest = corpus
    s1 = str(tmp_path / "s1b")
    train_stage1.main([
        "--image_root", root, "--train_json", manifest, "--output_dir", s1,
        "--vision_model_name", vis_dir, "--llm_name", llm_dir,
        "--img_size", "32", "--batch_size", "2", "--num_epochs", "1",
        "--max_caption_len", "8", "--num_workers", "2", "--mesh_data", "1",
        "--disable_wandb", "--expansion_factor", "2",
    ])

    out = str(tmp_path / "s2")
    result = train_stage2.main([
        "--image_root", root, "--train_json", manifest, "--val_json", manifest,
        "--output_dir", out, "--vision_model_name", vis_dir, "--llm_name", llm_dir,
        "--stage1_projector_path", s1, "--img_size", "32", "--batch_size", "2",
        "--num_epochs", "1", "--max_q_len", "16", "--max_a_len", "8",
        "--enable_qlora", "--lora_r", "2", "--lora_alpha", "4",
        "--gradient_accumulation_steps", "1", "--num_workers", "2",
        "--mesh_data", "1", "--disable_wandb", "--eval_max_new_tokens", "4",
        "--eval_num_beams", "1",
    ])
    assert np.isfinite(result["train/epoch_loss"])
    ckpt = os.path.join(out, "checkpoint-epoch_0")
    assert os.path.exists(os.path.join(ckpt, "language_model", "adapter_model.safetensors"))
