"""End-to-end CLI coverage for the evaluation/inference entry points that
test_cli_e2e.py doesn't reach: cls_train -> cls_test, zero_shot_classify, and
stage-2 train -> infer_vqa_stage2 (batch) -> infer_generation."""

import json
import os

import numpy as np
import pytest
import torch

from projectiontrainer_tpu import testing as T

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def snapshots(tmp_path_factory):
    from transformers import (
        Gemma3TextConfig, SiglipConfig, SiglipTextConfig, SiglipVisionConfig,
    )
    from transformers.models.gemma3.modeling_gemma3 import Gemma3ForCausalLM
    from transformers.models.siglip.modeling_siglip import SiglipModel

    base = tmp_path_factory.mktemp("snapshots")
    torch.manual_seed(0)
    tok = T.word_tokenizer()

    vis_dir = str(base / "siglip-tiny")
    SiglipModel(SiglipConfig(
        vision_config=SiglipVisionConfig(
            hidden_size=32, intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=4, image_size=32, patch_size=8,
        ).to_dict(),
        text_config=SiglipTextConfig(
            hidden_size=32, intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=4, vocab_size=len(tok.get_vocab()),
            max_position_embeddings=16,
        ).to_dict(),
    )).save_pretrained(vis_dir)
    tok.save_pretrained(vis_dir)  # zero-shot scoring tokenizes prompts from here

    llm_dir = str(base / "gemma3-tiny")
    Gemma3ForCausalLM(Gemma3TextConfig(
        vocab_size=len(tok.get_vocab()), hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=2, num_key_value_heads=1,
        head_dim=16, sliding_window=8, query_pre_attn_scalar=16,
        max_position_embeddings=256,
    )).save_pretrained(llm_dir)
    tok.save_pretrained(llm_dir)
    return vis_dir, llm_dir


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp("eval_corpus"))
    root, manifest = T.synthetic_corpus(tmp, n=10, image_size=32)
    return root, manifest


def test_cls_train_then_cls_test(snapshots, corpus, tmp_path):
    """cls_test reconstructs the model from the architecture embedded in the
    checkpoint metadata (no vision flags needed) and reports the full metric set."""
    from projectiontrainer_tpu.cli import cls_test, cls_train

    vis_dir, _ = snapshots
    root, manifest = corpus
    base = str(tmp_path / "cls")
    cls_train.main([
        "--exp_id", "EXPT", "--class_names", "Pneumonia,Edema,Cardiomegaly,No Finding",
        "--vision_model_name", vis_dir, "--data_json", manifest, "--image_root", root,
        "--output_base_dir", base, "--img_size", "32", "--batch_size", "4",
        "--epochs", "2", "--lr", "1e-3", "--bb_lr", "1e-4", "--num_workers", "2",
        "--mesh_data", "1", "--disable_wandb",
    ])
    exp_dir = os.path.join(base, "EXPT")
    assert os.path.exists(os.path.join(exp_dir, "results.tsv"))

    acc = cls_test.main([
        "--exp_dir", exp_dir, "--checkpoint", "best", "--test_json", manifest,
        "--image_root", root, "--img_size", "32",
        "--roc_plot", str(tmp_path / "roc.png"),
    ])
    assert 0.0 <= acc <= 1.0
    assert os.path.exists(tmp_path / "roc.png")


def test_zero_shot_classify_cli(snapshots, corpus, tmp_path):
    from projectiontrainer_tpu.cli import zero_shot_classify

    vis_dir, _ = snapshots
    root, manifest = corpus
    out = str(tmp_path / "zs.json")
    zero_shot_classify.main([
        "--model_name", vis_dir, "--data_json", manifest, "--image_root", root,
        "--class_names", "Pneumonia,Edema,Cardiomegaly,No Finding",
        "--img_size", "32", "--batch_size", "4", "--max_text_len", "16",
        "--output_json", out,
    ])
    report = json.load(open(out))
    assert 0.0 <= report["accuracy"] <= 1.0
    assert len(report["predictions"]) == 10
    assert all("predicted" in r for r in report["predictions"])


def test_stage2_then_vqa_and_generation_inference(snapshots, corpus, tmp_path):
    """Full user workflow: stage-2 QLoRA training (nf4 default), then the batch VQA
    inference CLI with the reference's full decoding flag set, then the fixed-prompt
    generation-accuracy CLI on the same artifacts."""
    from projectiontrainer_tpu.cli import infer_generation, infer_vqa_stage2, train_stage2

    vis_dir, llm_dir = snapshots
    root, manifest = corpus
    out = str(tmp_path / "s2")
    train_stage2.main([
        "--image_root", root, "--train_json", manifest, "--output_dir", out,
        "--vision_model_name", vis_dir, "--llm_name", llm_dir, "--img_size", "32",
        "--batch_size", "2", "--num_epochs", "1", "--max_q_len", "12",
        "--max_a_len", "8", "--enable_qlora", "--num_workers", "2",
        "--mesh_data", "1", "--disable_wandb",
    ])
    ckpt = os.path.join(out, "checkpoint-epoch_0")
    preds = str(tmp_path / "preds.json")
    infer_vqa_stage2.main([
        "--input_json", manifest, "--image_root", root, "--output_json", preds,
        "--vision_model_name", vis_dir, "--base_llm_name", llm_dir,  # reference spelling
        "--adapter_path", os.path.join(ckpt, "language_model"),
        "--projector_path", os.path.join(ckpt, "projection_layer"),
        "--img_size", "32", "--batch_size", "4", "--max_q_len", "12",
        "--max_new_tokens", "6", "--num_beams", "3", "--do_sample",
        "--temperature", "0.3", "--top_p", "0.9", "--top_k", "50",
        "--repetition_penalty", "1.8", "--length_penalty", "1.2",
    ])
    results = json.load(open(preds))
    assert len(results) == 10
    assert all(isinstance(r["generated_answer"], str) for r in results)

    gen_out = str(tmp_path / "gen.json")
    acc = infer_generation.main([
        "--input_json", manifest, "--image_root", root, "--output_json", gen_out,
        "--vision_model_name", vis_dir, "--llm_name", llm_dir,
        "--adapter_path", os.path.join(ckpt, "language_model"),
        "--projector_path", os.path.join(ckpt, "projection_layer"),
        "--img_size", "32", "--batch_size", "4", "--max_q_len", "16",
        "--max_length", "6", "--num_beams", "3",  # reference flag name
        "--candidate_labels", "Pneumonia,Edema,Cardiomegaly,No Finding", "--verbose",
    ])
    assert 0.0 <= acc <= 1.0
    assert len(json.load(open(gen_out))["results"]) == 10
