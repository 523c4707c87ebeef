"""Numerical parity of the functional SigLIP vs HF torch on a tiny random model."""

import numpy as np
import torch
import pytest

import jax.numpy as jnp

from projectiontrainer_tpu.models import siglip

pytestmark = pytest.mark.slow  # torch/HF parity fixtures dominate the suite runtime

TOL = dict(rtol=3e-4, atol=3e-4)


def _hf_siglip(hidden=64, layers=3, heads=4, image=32, patch=8, vocab=99, text_len=16):
    from transformers import SiglipConfig, SiglipTextConfig, SiglipVisionConfig
    from transformers.models.siglip.modeling_siglip import SiglipModel

    cfg = SiglipConfig(
        vision_config=SiglipVisionConfig(
            hidden_size=hidden, intermediate_size=hidden * 4, num_hidden_layers=layers,
            num_attention_heads=heads, image_size=image, patch_size=patch,
            attn_implementation="eager",
        ).to_dict(),
        text_config=SiglipTextConfig(
            hidden_size=hidden, intermediate_size=hidden * 4, num_hidden_layers=layers,
            num_attention_heads=heads, vocab_size=vocab, max_position_embeddings=text_len,
            attn_implementation="eager",
        ).to_dict(),
    )
    torch.manual_seed(3)
    model = SiglipModel(cfg).eval()
    return cfg, model


def _port(cfg, model):
    jcfg = siglip.from_hf_config(cfg)
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params = siglip.params_from_hf_state_dict(jcfg, sd)
    return jcfg, params


def test_vision_tower_parity():
    cfg, model = _hf_siglip()
    jcfg, params = _port(cfg, model)
    rng = np.random.default_rng(0)
    pixels = rng.normal(size=(2, 3, 32, 32)).astype(np.float32)  # NCHW (HF layout)
    with torch.no_grad():
        out = model.vision_model(pixel_values=torch.tensor(pixels))
    hidden, pooled = siglip.vision_forward(
        params["vision"], jcfg.vision, jnp.asarray(pixels.transpose(0, 2, 3, 1))
    )
    np.testing.assert_allclose(np.asarray(hidden), out.last_hidden_state.numpy(), **TOL)
    np.testing.assert_allclose(np.asarray(pooled), out.pooler_output.numpy(), **TOL)


def test_text_tower_parity():
    cfg, model = _hf_siglip()
    jcfg, params = _port(cfg, model)
    rng = np.random.default_rng(1)
    ids = rng.integers(0, 99, size=(2, 16))
    with torch.no_grad():
        out = model.text_model(input_ids=torch.tensor(ids))
    hidden, pooled = siglip.text_forward(params["text"], jcfg.text, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(hidden), out.last_hidden_state.numpy(), **TOL)
    np.testing.assert_allclose(np.asarray(pooled), out.pooler_output.numpy(), **TOL)


def test_logits_per_image_parity():
    cfg, model = _hf_siglip()
    jcfg, params = _port(cfg, model)
    rng = np.random.default_rng(2)
    pixels = rng.normal(size=(2, 3, 32, 32)).astype(np.float32)
    ids = rng.integers(0, 99, size=(4, 16))
    with torch.no_grad():
        out = model(
            input_ids=torch.tensor(ids), pixel_values=torch.tensor(pixels)
        ).logits_per_image.numpy()
    ours = siglip.logits_per_image(
        params, jcfg, jnp.asarray(pixels.transpose(0, 2, 3, 1)), jnp.asarray(ids)
    )
    np.testing.assert_allclose(np.asarray(ours), out, rtol=1e-3, atol=1e-3)


def test_patch_embeddings_drop_first():
    cfg, model = _hf_siglip()
    jcfg, params = _port(cfg, model)
    pixels = jnp.zeros((1, 32, 32, 3))
    patches = siglip.vision_patch_embeddings(params["vision"], jcfg.vision, pixels)
    assert patches.shape == (1, jcfg.vision.num_patches - 1, 64)
