"""Parity tests for the MLP projector and the AbnormalityClassifier head vs torch."""

import numpy as np
import torch
import torch.nn as nn
import pytest

import jax
import jax.numpy as jnp

from projectiontrainer_tpu.models import classifier, projector, siglip

pytestmark = pytest.mark.slow  # torch/HF parity fixtures dominate the suite runtime

TOL = dict(rtol=3e-4, atol=3e-4)


class TorchMLPProjector(nn.Module):
    """Replication of the reference MLPProjector (Stage1/projectors.py:4-29)."""

    def __init__(self, vision_dim, llm_dim, expansion_factor=10):
        super().__init__()
        inter = vision_dim * expansion_factor
        self.model = nn.Sequential(
            nn.Linear(vision_dim, inter), nn.GELU(), nn.Linear(inter, llm_dim)
        )

    def forward(self, x):
        return self.model(x)


def test_projector_parity_and_roundtrip():
    torch.manual_seed(0)
    tm = TorchMLPProjector(16, 24, expansion_factor=3).eval()
    cfg = projector.ProjectorConfig(vision_dim=16, llm_dim=24, expansion_factor=3)
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params = projector.params_from_torch_state_dict(sd)

    x = np.random.default_rng(0).normal(size=(2, 5, 16)).astype(np.float32)
    with torch.no_grad():
        expected = tm(torch.tensor(x)).numpy()
    ours = projector.forward(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(ours), expected, **TOL)

    # export -> import roundtrip preserves values
    exported = projector.to_torch_state_dict(params)
    params2 = projector.params_from_torch_state_dict(exported)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(params2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_projector_handles_module_prefix():
    torch.manual_seed(1)
    tm = TorchMLPProjector(8, 12, expansion_factor=2)
    sd = {"module." + k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params = projector.params_from_torch_state_dict(sd)
    assert params["fc1"]["kernel"].shape == (8, 16)


class TorchAbnormalityHead(nn.Module):
    """The reference classifier head minus the HF backbone (cls_evaluate/models.py:107-139)."""

    def __init__(self, embed_dim, num_classes, num_heads=4):
        super().__init__()
        self.queries = nn.Parameter(torch.randn(1, num_classes, embed_dim))
        self.mha = nn.MultiheadAttention(embed_dim, num_heads, batch_first=True)
        self.head = nn.Linear(embed_dim, 1)

    def forward(self, feats):
        q = self.queries.repeat(feats.shape[0], 1, 1)
        out, _ = self.mha(q, feats, feats)
        return self.head(out).squeeze(-1)


def test_classifier_forward_parity():
    """Full classifier vs torch: tiny SigLIP backbone (via HF) + torch MHA head."""
    from transformers import SiglipVisionConfig
    from transformers.models.siglip.modeling_siglip import SiglipVisionModel

    hidden, heads, ncls = 32, 4, 5
    vcfg_hf = SiglipVisionConfig(
        hidden_size=hidden, intermediate_size=hidden * 4, num_hidden_layers=2,
        num_attention_heads=heads, image_size=16, patch_size=8,
        attn_implementation="eager",
    )
    torch.manual_seed(2)
    backbone = SiglipVisionModel(vcfg_hf).eval()
    head = TorchAbnormalityHead(hidden, ncls, num_heads=heads).eval()

    vcfg = siglip.VisionConfig(
        hidden_size=hidden, intermediate_size=hidden * 4, num_layers=2,
        num_heads=heads, image_size=16, patch_size=8,
        use_head=False,
    )
    ccfg = classifier.ClassifierConfig(vision=vcfg, num_classes=ncls, num_heads=heads,
                                       dropout_rate=0.0)

    # Assemble the torch-style state dict the reference checkpoints use
    sd = {}
    for k, v in backbone.state_dict().items():
        sd["vision_model." + k.removeprefix("vision_model.")] = v.detach().numpy()
    sd["abnormality_queries"] = head.queries.detach().numpy()
    sd["mha.in_proj_weight"] = head.mha.in_proj_weight.detach().numpy()
    sd["mha.in_proj_bias"] = head.mha.in_proj_bias.detach().numpy()
    sd["mha.out_proj.weight"] = head.mha.out_proj.weight.detach().numpy()
    sd["mha.out_proj.bias"] = head.mha.out_proj.bias.detach().numpy()
    sd["classification_head.weight"] = head.head.weight.detach().numpy()
    sd["classification_head.bias"] = head.head.bias.detach().numpy()

    params = classifier.params_from_torch_state_dict(ccfg, sd)

    pixels = np.random.default_rng(1).normal(size=(2, 3, 16, 16)).astype(np.float32)
    with torch.no_grad():
        feats = backbone(pixel_values=torch.tensor(pixels)).last_hidden_state
        expected = head(feats).numpy()
    ours = classifier.forward(params, ccfg, jnp.asarray(pixels.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(ours), expected, **TOL)
