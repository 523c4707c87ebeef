"""MLP projector: vision patch embeddings -> LLM embedding space.

Functional equivalent of the reference's ``MLPProjector`` (reference:
Stage1/projectors.py:4-29): ``Linear(v, ef*v) -> GELU -> Linear(ef*v, llm)`` applied to each
patch embedding independently, ``expansion_factor`` default 10. The two matmuls are large
batched GEMMs (B*575 × 1024 × 10240) — ideal MXU work; XLA fuses the GELU in between.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from projectiontrainer_tpu.ops import layers as L


@dataclasses.dataclass(frozen=True)
class ProjectorConfig:
    vision_dim: int
    llm_dim: int
    expansion_factor: int = 10

    @property
    def intermediate_dim(self) -> int:
        return self.vision_dim * self.expansion_factor


def init(key, cfg: ProjectorConfig, dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    # Match torch nn.Linear default init (uniform +-1/sqrt(in)) in distributional terms.
    return {
        "fc1": L.init_linear(k1, cfg.vision_dim, cfg.intermediate_dim, dtype=dtype),
        "fc2": L.init_linear(k2, cfg.intermediate_dim, cfg.llm_dim, dtype=dtype),
    }


def forward(params, x):
    """x: [B, P, vision_dim] -> [B, P, llm_dim]. GELU is exact (torch nn.GELU default)."""
    h = L.gelu(L.linear(params["fc1"], x), approximate=False)
    return L.linear(params["fc2"], h)


def params_from_torch_state_dict(sd) -> dict:
    """Import a reference ``projector_*.bin`` state dict (numpy), tolerating the
    ``module.`` / ``model.`` key-prefix variants the reference's loaders handle
    (Stage1/inference_stage1.py:109-121, Stage2/train_vqa_stage2.py:50-70)."""
    clean = {}
    for k, v in sd.items():
        k = k.removeprefix("module.")
        k = k.removeprefix("model.")
        clean[k] = np.asarray(v)
    # reference Sequential layout: model.0 = fc1, model.2 = fc2
    return jax.tree.map(jnp.asarray, {
        "fc1": {"kernel": clean["0.weight"].T, "bias": clean["0.bias"]},
        "fc2": {"kernel": clean["2.weight"].T, "bias": clean["2.bias"]},
    })


def to_torch_state_dict(params) -> dict:
    """Export to the reference's ``model.{0,2}.{weight,bias}`` layout for interop."""
    return {
        "model.0.weight": np.asarray(params["fc1"]["kernel"]).T,
        "model.0.bias": np.asarray(params["fc1"]["bias"]),
        "model.2.weight": np.asarray(params["fc2"]["kernel"]).T,
        "model.2.bias": np.asarray(params["fc2"]["bias"]),
    }


def config_dict(cfg: ProjectorConfig) -> dict:
    """The ``projector_config.json`` payload (reference: Stage1/projector_trainer.py:488-505)."""
    return {
        "vision_dim": cfg.vision_dim,
        "llm_dim": cfg.llm_dim,
        "intermediate_dim": cfg.intermediate_dim,
        "expansion_factor": cfg.expansion_factor,
        "projector_type": "mlp_2layer_gelu",
    }
