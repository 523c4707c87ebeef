"""Interop exporters/loaders for the reference's on-disk checkpoint formats.

A user of the reference can point its inference scripts at artifacts written here:

- projector: ``projector_{epoch_N|best|final}.bin`` torch state dicts +
  ``projector_config.json`` (reference: Stage1/projector_trainer.py:455-521); loads
  tolerate ``module.``/``model.`` prefixes and ``.safetensors``
  (Stage1/inference_stage1.py:96-122, Stage2/train_vqa_stage2.py:25-80).
- Stage-2 layout: ``checkpoint-epoch_N/{language_model,projection_layer}``
  (reference: Stage2/trainer.py:710-769).
"""

from __future__ import annotations

import json
import os
from typing import Optional

import numpy as np

from projectiontrainer_tpu.models import projector as proj


def save_projector(
    params, cfg: proj.ProjectorConfig, out_dir: str, *, tag: str = "final",
    fmt: str = "bin",
) -> str:
    """Write projector weights in the reference layout. fmt: 'bin' (torch) or
    'safetensors'."""
    os.makedirs(out_dir, exist_ok=True)
    sd = proj.to_torch_state_dict(params)
    if fmt == "bin":
        import torch

        path = os.path.join(out_dir, f"projector_{tag}.bin")
        torch.save({k: torch.tensor(np.ascontiguousarray(v)) for k, v in sd.items()}, path)
    else:
        from safetensors.numpy import save_file

        path = os.path.join(out_dir, f"projector_{tag}.safetensors")
        save_file({k: np.ascontiguousarray(v) for k, v in sd.items()}, path)
    with open(os.path.join(out_dir, "projector_config.json"), "w") as f:
        json.dump(proj.config_dict(cfg), f, indent=2)
    return path


def load_projector(stage1_dir: str, *, prefer: tuple = ("best", "final")) -> tuple:
    """Load a projector from a reference-format directory. Returns (cfg, params).
    Mirrors ``load_pretrained_projector`` (Stage2/train_vqa_stage2.py:25-80): read
    projector_config.json for dims, then the preferred weight file."""
    with open(os.path.join(stage1_dir, "projector_config.json")) as f:
        cd = json.load(f)
    cfg = proj.ProjectorConfig(
        vision_dim=cd["vision_dim"], llm_dim=cd["llm_dim"],
        expansion_factor=cd.get(
            "expansion_factor", cd["intermediate_dim"] // cd["vision_dim"]
        ),
    )
    candidates = []
    for tag in prefer:
        candidates += [f"projector_{tag}.bin", f"projector_{tag}.safetensors"]
    candidates += sorted(
        f for f in os.listdir(stage1_dir)
        if f.startswith("projector_") and f.endswith((".bin", ".safetensors"))
    )
    for name in candidates:
        path = os.path.join(stage1_dir, name)
        if os.path.exists(path):
            return cfg, proj.params_from_torch_state_dict(_read_state_dict(path))
    raise FileNotFoundError(f"no projector weights in {stage1_dir}")


def _read_state_dict(path: str) -> dict[str, np.ndarray]:
    if path.endswith(".safetensors"):
        from safetensors import safe_open

        out = {}
        with safe_open(path, framework="np") as f:
            for k in f.keys():
                out[k] = f.get_tensor(k)
        return out
    import torch

    raw = torch.load(path, map_location="cpu", weights_only=True)
    return {k: v.numpy() for k, v in raw.items()}


def save_stage2_checkpoint(
    out_dir: str, epoch: int, *, projector_params, projector_cfg,
    lora_params=None, llm_params=None, metadata: Optional[dict] = None,
) -> str:
    """Write the reference's ``checkpoint-epoch_N/`` directory shape: projector under
    ``projection_layer/``, adapters or full LLM under ``language_model/``
    (numpy safetensors — importable by our loaders; torch-format projector included for
    reference-script compatibility)."""
    ckpt_dir = os.path.join(out_dir, f"checkpoint-epoch_{epoch}")
    proj_dir = os.path.join(ckpt_dir, "projection_layer")
    save_projector(projector_params, projector_cfg, proj_dir, tag="best")

    lm_dir = os.path.join(ckpt_dir, "language_model")
    os.makedirs(lm_dir, exist_ok=True)
    from safetensors.numpy import save_file

    import jax

    from projectiontrainer_tpu.core.pytree import path_str

    def flatten(tree):
        return {
            path_str(p): np.ascontiguousarray(np.asarray(x))
            for p, x in jax.tree_util.tree_leaves_with_path(tree)
        }

    if lora_params is not None:
        save_file(flatten(lora_params), os.path.join(lm_dir, "adapter_model.safetensors"))
    if llm_params is not None:
        save_file(flatten(llm_params), os.path.join(lm_dir, "model.safetensors"))
    if metadata is not None:
        with open(os.path.join(ckpt_dir, "metadata.json"), "w") as f:
            json.dump(metadata, f, indent=2, default=str)
    return ckpt_dir


def load_flat_safetensors(path: str):
    """Read a flat path->tensor safetensors file back into a nested pytree."""
    sd = _read_state_dict(path)
    root: dict = {}
    for key, val in sd.items():
        parts = key.split("/")
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = val
    return _listify(root)


def _listify(node):
    """Convert {'0': .., '1': ..} dicts back into lists (layer stacks)."""
    if not isinstance(node, dict):
        return node
    keys = list(node.keys())
    if keys and all(k.isdigit() for k in keys):
        return [_listify(node[str(i)]) for i in range(len(keys))]
    return {k: _listify(v) for k, v in node.items()}
