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
    lora_cfg=None, base_model_name: Optional[str] = None,
) -> str:
    """Write the reference's ``checkpoint-epoch_N/`` directory shape: projector under
    ``projection_layer/``, adapters or full LLM under ``language_model/``
    (reference: Stage2/trainer.py:710-769 — PEFT ``save_pretrained`` or full model).

    When ``lora_cfg`` is given the adapter is written in true HF-PEFT format
    (``adapter_model.safetensors`` with PEFT key/shape conventions +
    ``adapter_config.json``), so the directory is directly loadable by
    ``PeftModel.from_pretrained`` — a GPU/PEFT user can consume a TPU-trained adapter
    unchanged. Without it the legacy flat pytree layout is kept (still readable by
    :func:`load_adapter`)."""
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
        if lora_cfg is not None:
            save_peft_adapter(lora_params, lora_cfg, lm_dir,
                              base_model_name_or_path=base_model_name)
        else:
            save_file(flatten(lora_params),
                      os.path.join(lm_dir, "adapter_model.safetensors"))
    if llm_params is not None:
        save_file(flatten(llm_params), os.path.join(lm_dir, "model.safetensors"))
    if metadata is not None:
        with open(os.path.join(ckpt_dir, "metadata.json"), "w") as f:
            json.dump(metadata, f, indent=2, default=str)
    return ckpt_dir


# ------------------------------------------------------------------ PEFT adapter interop

# attention vs mlp module placement in HF decoder naming (model.layers.N.self_attn.*)
_PEFT_ATTN_TARGETS = frozenset({"q_proj", "k_proj", "v_proj", "o_proj"})


def _peft_key(layer: int, target: str, ab: str) -> str:
    parent = "self_attn" if target in _PEFT_ATTN_TARGETS else "mlp"
    return f"base_model.model.model.layers.{layer}.{parent}.{target}.lora_{ab}.weight"


def save_peft_adapter(lora_params, lora_cfg, out_dir: str, *,
                      base_model_name_or_path: Optional[str] = None) -> str:
    """Export the pytree LoRA adapters as an HF-PEFT adapter directory.

    The reference trains/saves adapters with PEFT (``LoraConfig`` at
    Stage2/train_vqa_stage2.py:232-240, ``save_pretrained`` at Stage2/trainer.py:728)
    and resumes them with ``PeftModel.from_pretrained`` (:219). This writes the same
    on-disk contract: ``adapter_model.safetensors`` keyed
    ``base_model.model.model.layers.N.{self_attn|mlp}.{target}.lora_{A,B}.weight``
    with torch ``nn.Linear`` weight shapes (A: [r, in], B: [out, r] — the transposes
    of this framework's (in, r)/(r, out) kernels) plus ``adapter_config.json``."""
    from safetensors.numpy import save_file

    os.makedirs(out_dir, exist_ok=True)
    sd = {}
    for i, layer in enumerate(lora_params["layers"]):
        for target, p in layer.items():
            a = np.ascontiguousarray(np.asarray(p["a"], dtype=np.float32).T)  # [r, in]
            b = np.ascontiguousarray(np.asarray(p["b"], dtype=np.float32).T)  # [out, r]
            sd[_peft_key(i, target, "A")] = a
            sd[_peft_key(i, target, "B")] = b
    save_file(sd, os.path.join(out_dir, "adapter_model.safetensors"))
    config = {
        "peft_type": "LORA",
        "task_type": "CAUSAL_LM",
        "r": int(lora_cfg.r),
        "lora_alpha": int(lora_cfg.alpha),
        "lora_dropout": float(lora_cfg.dropout),
        "target_modules": sorted(lora_cfg.targets),
        "bias": "none",
        "fan_in_fan_out": False,
        "inference_mode": True,
        "base_model_name_or_path": base_model_name_or_path,
    }
    with open(os.path.join(out_dir, "adapter_config.json"), "w") as f:
        json.dump(config, f, indent=2)
    return out_dir


def load_peft_adapter(adapter_dir: str):
    """Read an HF-PEFT LoRA adapter directory into (lora_params pytree, LoraConfig).

    Accepts adapters saved by PEFT itself (a reference Stage-2 run's
    ``language_model/`` dir — Stage2/trainer.py:728) or by :func:`save_peft_adapter`.
    Key-prefix tolerant: any ``…layers.N.{self_attn|mlp}.{target}.lora_{A,B}.weight``
    matches regardless of the ``base_model.model…`` wrapper depth (PEFT nests one
    more ``model.`` for *ForCausalLM bases than for bare decoders)."""
    import re

    from projectiontrainer_tpu.train.lora import LoraConfig

    with open(os.path.join(adapter_dir, "adapter_config.json")) as f:
        cfg_json = json.load(f)
    sd = _read_state_dict(os.path.join(adapter_dir, "adapter_model.safetensors"))

    pat = re.compile(
        r"layers\.(\d+)\.(?:self_attn|mlp)\.([A-Za-z0-9_]+)\.lora_(A|B)\.weight$"
    )
    per_layer: dict[int, dict] = {}
    for key, val in sd.items():
        m = pat.search(key)
        if m is None:
            raise ValueError(f"unrecognized PEFT adapter key: {key}")
        layer, target, ab = int(m.group(1)), m.group(2), m.group(3)
        entry = per_layer.setdefault(layer, {}).setdefault(target, {})
        # PEFT stores torch Linear weights: A [r, in], B [out, r] -> our (in, r)/(r, out)
        entry["a" if ab == "A" else "b"] = np.ascontiguousarray(
            np.asarray(val, np.float32).T
        )
    if not per_layer:
        raise ValueError(f"no LoRA tensors found in {adapter_dir}")
    n_layers = max(per_layer) + 1
    layers = []
    for i in range(n_layers):
        layer = per_layer.get(i, {})
        for target, entry in layer.items():
            missing = {"a", "b"} - set(entry)
            if missing:
                raise ValueError(f"layer {i} target {target}: missing lora_{missing}")
        layers.append(layer)
    lcfg = LoraConfig(
        r=int(cfg_json.get("r", 16)),
        alpha=int(cfg_json.get("lora_alpha", 32)),
        dropout=float(cfg_json.get("lora_dropout", 0.0)),
        targets=tuple(sorted({t for l in layers for t in l})),
    )
    return {"layers": layers}, lcfg


def load_adapter(adapter_dir: str):
    """Load a LoRA adapter directory in either format: HF-PEFT
    (``adapter_config.json`` present — a reference-trained adapter or a
    :func:`save_peft_adapter` export) or this framework's legacy flat pytree
    safetensors. Returns (lora_params, LoraConfig | None)."""
    if os.path.exists(os.path.join(adapter_dir, "adapter_config.json")):
        return load_peft_adapter(adapter_dir)
    params = load_flat_safetensors(os.path.join(adapter_dir, "adapter_model.safetensors"))
    return params, None


def save_siglip_hf(params, cfg, out_dir: str, *, src_dir: Optional[str] = None) -> str:
    """Export SigLIP params as an HF snapshot (config.json + model.safetensors) loadable
    by BOTH ``hf_import.load_siglip`` and ``transformers.SiglipModel.from_pretrained``.

    The reference Stage 0 saves its fine-tuned encoder with ``save_pretrained`` into
    ``best_model/`` / ``epoch_N/`` dirs that downstream consumers (Stage-1
    ``--vision_model_name``, the t-SNE epoch sweep, cls_evaluate) load as HF snapshots
    (Stage0/train_vision_encoder_stage0.py:800-835) — this is the TPU-side equivalent.
    ``src_dir`` (the pretrained snapshot the run started from) is used to copy processor
    and tokenizer files alongside, like the reference's ``processor.save_pretrained``.
    """
    import jax

    os.makedirs(out_dir, exist_ok=True)
    sd: dict[str, np.ndarray] = {}

    def put(name, arr):
        sd[name] = np.ascontiguousarray(np.asarray(jax.device_get(arr), np.float32))

    def put_lin(name, p, transpose=True):
        put(name + ".weight", np.asarray(p["kernel"]).T if transpose else p["kernel"])
        if "bias" in p:
            put(name + ".bias", p["bias"])

    def put_ln(name, p):
        put(name + ".weight", p["scale"])
        put(name + ".bias", p["bias"])

    def put_encoder(prefix, layers):
        for i, lp in enumerate(layers):
            pre = f"{prefix}.layers.{i}."
            put_ln(pre + "layer_norm1", lp["ln1"])
            for k in ("q_proj", "k_proj", "v_proj", "out_proj"):
                put_lin(pre + f"self_attn.{k}", lp["attn"][k])
            put_ln(pre + "layer_norm2", lp["ln2"])
            put_lin(pre + "mlp.fc1", lp["mlp"]["fc1"])
            put_lin(pre + "mlp.fc2", lp["mlp"]["fc2"])

    v = params["vision"]
    put("vision_model.embeddings.patch_embedding.weight",
        np.transpose(np.asarray(jax.device_get(v["patch_embedding"]["kernel"]),
                                np.float32), (3, 2, 0, 1)))  # HWIO -> OIHW
    put("vision_model.embeddings.patch_embedding.bias", v["patch_embedding"]["bias"])
    put("vision_model.embeddings.position_embedding.weight",
        v["position_embedding"]["embedding"])
    put_encoder("vision_model.encoder", v["layers"])
    put_ln("vision_model.post_layernorm", v["post_layernorm"])
    if "head" in v:
        h = v["head"]
        put("vision_model.head.probe", h["probe"])
        in_w = np.concatenate([
            np.asarray(jax.device_get(h["attention"][k]["kernel"]), np.float32).T
            for k in ("q_proj", "k_proj", "v_proj")
        ])
        in_b = np.concatenate([
            np.asarray(jax.device_get(h["attention"][k]["bias"]), np.float32)
            for k in ("q_proj", "k_proj", "v_proj")
        ])
        put("vision_model.head.attention.in_proj_weight", in_w)
        put("vision_model.head.attention.in_proj_bias", in_b)
        put_lin("vision_model.head.attention.out_proj", h["attention"]["out_proj"])
        put_ln("vision_model.head.layernorm", h["layernorm"])
        put_lin("vision_model.head.mlp.fc1", h["mlp"]["fc1"])
        put_lin("vision_model.head.mlp.fc2", h["mlp"]["fc2"])

    t = params["text"]
    put("text_model.embeddings.token_embedding.weight", t["token_embedding"]["embedding"])
    put("text_model.embeddings.position_embedding.weight",
        t["position_embedding"]["embedding"])
    put_encoder("text_model.encoder", t["layers"])
    put_ln("text_model.final_layer_norm", t["final_layer_norm"])
    put_lin("text_model.head", t["head"])
    put("logit_scale", np.atleast_1d(np.asarray(jax.device_get(params["logit_scale"]))))
    put("logit_bias", np.atleast_1d(np.asarray(jax.device_get(params["logit_bias"]))))

    from safetensors.numpy import save_file

    save_file(sd, os.path.join(out_dir, "model.safetensors"))
    _write_siglip_hf_config(cfg, out_dir, src_dir)
    if src_dir:
        import shutil

        for fname in ("preprocessor_config.json", "tokenizer_config.json",
                      "tokenizer.json", "special_tokens_map.json", "spiece.model",
                      "vocab.txt"):
            src = os.path.join(src_dir, fname)
            if os.path.exists(src):
                shutil.copy(src, os.path.join(out_dir, fname))
    return out_dir


def _write_siglip_hf_config(cfg, out_dir: str, src_dir: Optional[str]):
    """config.json for the exported snapshot: start from the source snapshot's config
    when available (preserves fields our SiglipConfig doesn't model), else synthesize."""
    if src_dir and os.path.exists(os.path.join(src_dir, "config.json")):
        with open(os.path.join(src_dir, "config.json")) as f:
            hf = json.load(f)
    else:
        hf = {"model_type": "siglip", "vision_config": {}, "text_config": {}}
    hf["vision_config"].update({
        "model_type": "siglip_vision_model",
        "hidden_size": cfg.vision.hidden_size,
        "intermediate_size": cfg.vision.intermediate_size,
        "num_hidden_layers": cfg.vision.num_layers,
        "num_attention_heads": cfg.vision.num_heads,
        "layer_norm_eps": cfg.vision.layer_norm_eps,
        "image_size": cfg.vision.image_size,
        "patch_size": cfg.vision.patch_size,
        "num_channels": cfg.vision.num_channels,
    })
    hf["text_config"].update({
        "model_type": "siglip_text_model",
        "hidden_size": cfg.text.hidden_size,
        "intermediate_size": cfg.text.intermediate_size,
        "num_hidden_layers": cfg.text.num_layers,
        "num_attention_heads": cfg.text.num_heads,
        "layer_norm_eps": cfg.text.layer_norm_eps,
        "vocab_size": cfg.text.vocab_size,
        "max_position_embeddings": cfg.text.max_position_embeddings,
        "projection_size": cfg.text.projection_size or cfg.text.hidden_size,
    })
    with open(os.path.join(out_dir, "config.json"), "w") as f:
        json.dump(hf, f, indent=2)


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
