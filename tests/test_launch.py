"""Pod launch layer (cli/launch.py): arg routing + a 2-host CPU-simulated launch that
runs the REAL stage-1 CLI end-to-end on each simulated host (VERDICT r2 next #5).

The reference's L0 equivalent is one bash launcher per stage wrapping torchrun/
accelerate (Stage2/run_vqa_train_stage2.sh:73, Stage0/run_train_vision_encoder_stage0.
sh:62); here `projectiontrainer-launch --simulate N` spawns N host processes with
virtual CPU devices joined over a localhost coordinator — the same code path a real
pod takes minus the TPU metadata auto-detection.
"""

import os

import pytest

from projectiontrainer_tpu.cli import launch

pytestmark = pytest.mark.slow


def test_split_argv_routing():
    pre, stage, rest = launch._split_argv(
        ["--simulate", "2", "stage1", "--", "--batch_size", "2"]
    )
    assert pre == ["--simulate", "2"]
    assert stage == "stage1"
    assert rest == ["--batch_size", "2"]
    # without the '--' separator
    _, stage, rest = launch._split_argv(["stage2", "--num_epochs", "1"])
    assert stage == "stage2" and rest == ["--num_epochs", "1"]


def test_feeder_injection():
    assert launch._inject_feeder(["--a", "1"], "3") == ["--a", "1",
                                                        "--num_loader_procs", "3"]
    # explicit stage setting wins
    argv = ["--num_loader_procs", "7"]
    assert launch._inject_feeder(argv, "3") == argv
    assert launch._inject_feeder(["--a"], "keep") == ["--a"]


@pytest.fixture(scope="module")
def snapshots(tmp_path_factory):
    import torch
    from transformers import (
        Gemma3TextConfig, SiglipConfig, SiglipTextConfig, SiglipVisionConfig,
    )
    from transformers.models.gemma3.modeling_gemma3 import Gemma3ForCausalLM
    from transformers.models.siglip.modeling_siglip import SiglipModel

    from projectiontrainer_tpu import testing as T

    base = tmp_path_factory.mktemp("launch_snapshots")
    torch.manual_seed(0)
    vis_dir = str(base / "siglip-tiny")
    SiglipModel(SiglipConfig(
        vision_config=SiglipVisionConfig(
            hidden_size=32, intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=4, image_size=32, patch_size=8,
        ).to_dict(),
        text_config=SiglipTextConfig(
            hidden_size=32, intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=4, vocab_size=64, max_position_embeddings=16,
        ).to_dict(),
    )).save_pretrained(vis_dir)
    llm_dir = str(base / "gemma3-tiny")
    tok = T.word_tokenizer()
    Gemma3ForCausalLM(Gemma3TextConfig(
        vocab_size=len(tok.get_vocab()), hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=2, num_key_value_heads=1, head_dim=16,
        sliding_window=8, query_pre_attn_scalar=16, max_position_embeddings=256,
    )).save_pretrained(llm_dir)
    tok.save_pretrained(llm_dir)
    return vis_dir, llm_dir


def test_simulated_two_host_stage1_launch(tmp_path, snapshots, capsys):
    from projectiontrainer_tpu import testing as T

    vis_dir, llm_dir = snapshots
    root, manifest = T.synthetic_corpus(str(tmp_path), n=8, image_size=32)
    out_dir = str(tmp_path / "out")

    rc = launch.main([
        "--simulate", "2", "--devices_per_host", "2", "--feeder_procs", "0",
        "stage1", "--",
        "--image_root", root, "--train_json", manifest,
        "--vision_model_name", vis_dir, "--llm_name", llm_dir,
        "--output_dir", out_dir, "--img_size", "32", "--batch_size", "2",
        "--num_epochs", "1", "--max_caption_len", "12", "--num_workers", "2",
        "--save_every_n_epochs", "1", "--disable_wandb",
    ])
    logs = capsys.readouterr().out
    assert rc == 0, logs[-4000:]
    # both simulated hosts came up with 2 local / 4 global devices and joined
    assert "[host 0] launch: process 0/2, 2 local / 4 global devices" in logs
    assert "[host 1] launch: process 1/2, 2 local / 4 global devices" in logs
    # the collective save produced the reference projector export on shared storage
    files = set()
    for _, _, fs in os.walk(out_dir):
        files.update(fs)
    assert any(f.startswith("projector_") and f.endswith(".bin") for f in files), files
