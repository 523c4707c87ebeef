"""AOT memory + collective budget for multi-chip training programs (BASELINE config #4).

Compiles the REAL production train step for a target topology WITHOUT owning the
chips, via ``jax.experimental.topologies`` v5e AOT (the actual TPU compiler, with TPU
layouts/padding — authoritative per-device numbers) or, as a fallback, the virtual
CPU device mesh (approximate layouts, still a real GSPMD partition).

Outputs, per device:

- peak HBM and its components (arguments / temporaries / aliased donations) from
  ``compiled.memory_analysis()``;
- a collective inventory parsed from the optimized HLO: op kind x count x bytes of
  the result buffers — the all-gather / reduce-scatter traffic the FSDP layout pays
  each step.

The flagship consumer is the **Gemma3-4B full-joint stage-2 recipe** (VE + projector
+ LLM all trainable, ``--fsdp``, fp32 masters+moments) on a v5e-8 — the one BASELINE
config whose memory story cannot be proven by running it on this repo's single chip
(fp32 Adam state alone is ~32 GB). Reference recipe shape:
/root/reference/Stage2/train_vqa_stage2.py:121-134, Stage2/trainer.py:189-246.
"""

from __future__ import annotations

import re
from typing import Optional

# usable HBM per v5e chip: 16 GiB physical minus the runtime reserve — the XLA:TPU
# compiler enforces 15.75 GiB ("Used ... of 15.75G hbm" in its OOM accounting)
V5E_HBM_BYTES = int(15.75 * 1024**3)


def gemma3_4b_text_config(attn_impl: str = "xla"):
    """google/gemma-3-4b-it text-decoder dims (HF config.json: hidden 2560,
    intermediate 10240, 34 layers, 8 heads / 4 kv, head_dim 256, vocab 262 208,
    sliding 1024 with the 5-sliding:1-full pattern, linear rope factor 8)."""
    from projectiontrainer_tpu.models import decoder as dec

    return dec.gemma3_config(
        vocab_size=262_208, hidden_size=2560, intermediate_size=10_240,
        num_layers=34, num_heads=8, num_kv_heads=4, head_dim=256,
        sliding_window=1024, sliding_pattern=6, rope_scaling_factor=8.0,
        query_pre_attn_scalar=256, attn_impl=attn_impl,
    )


def xray_siglip_vit_l_cfg():
    """StanfordAIMI XraySigLIP ViT-L/16 @ 384 dims (the stage-2 vision tower —
    reference: Stage2/train_vqa_stage2.py:95): hidden 1024, 24 layers, 16 heads,
    ffn 4096, 576 patches."""
    from projectiontrainer_tpu.models import siglip

    return siglip.VisionConfig(
        hidden_size=1024, intermediate_size=4096, num_layers=24, num_heads=16,
        image_size=384, patch_size=16,
    )


def full_joint_4b_vlm_cfg(attn_impl: str = "xla"):
    from projectiontrainer_tpu.models import projector as proj
    from projectiontrainer_tpu.models import vlm

    vis = xray_siglip_vit_l_cfg()
    llm = gemma3_4b_text_config(attn_impl)
    return vlm.VLMConfig(
        vision=vis,
        projector=proj.ProjectorConfig(
            vision_dim=vis.hidden_size, llm_dim=llm.hidden_size, expansion_factor=10
        ),
        llm=llm,
    )


def small_test_vlm_cfg():
    """Reduced-width config for smoking the budget pipeline in seconds — the ONE
    definition shared by the ``--preset small-test`` CLI path and
    tests/test_budget.py, so CI covers exactly what the CLI compiles. Widths sit
    ABOVE the FSDP 64 KiB min-size cutoff (parallel/sharding.py) so the ZeRO-3
    gather/reduce pattern actually appears in the HLO."""
    from projectiontrainer_tpu.models import decoder as dec
    from projectiontrainer_tpu.models import projector as proj
    from projectiontrainer_tpu.models import siglip, vlm

    vis = siglip.VisionConfig(hidden_size=128, intermediate_size=512, num_layers=2,
                              num_heads=4, image_size=32, patch_size=8)
    llm = dec.gemma3_config(vocab_size=4096, hidden_size=256, intermediate_size=768,
                            num_layers=2, num_heads=8, num_kv_heads=4, head_dim=32,
                            sliding_window=16, query_pre_attn_scalar=32)
    return vlm.VLMConfig(
        vision=vis,
        projector=proj.ProjectorConfig(vision_dim=128, llm_dim=256,
                                       expansion_factor=4),
        llm=llm,
    )


def topology_mesh(n_devices: int = 8, model_axis: int = 1):
    """(mesh, kind): a ``('data','model')`` mesh over an AOT v5e topology when the
    installed libtpu supports it, else over virtual/local devices. ``kind`` is
    'tpu-aot' or the local backend's platform name.

    WARNING: when local devices are insufficient, the virtual-CPU fallback flips
    THE WHOLE PROCESS to the CPU platform and clears existing jax backends
    (invalidating live device arrays) — there is no way to undo a platform
    switch mid-process in jax. Call this from a dedicated process (the
    ``projectiontrainer-budget`` CLI, a sweep script); never from inside a
    training or serving process that still needs its TPU."""
    import numpy as np

    import jax
    from jax.sharding import Mesh

    devs, kind = None, None
    try:
        from jax.experimental import topologies

        topo = topologies.get_topology_desc(
            {8: "v5e:2x4", 4: "v5e:2x2", 1: "v5e:1x1"}[n_devices], platform="tpu"
        )
        devs, kind = list(topo.devices), "tpu-aot"
    except Exception:
        devs, kind = list(jax.devices()[:n_devices]), jax.default_backend()
    if len(devs) < n_devices:
        # virtual-CPU fallback: the axon sitecustomize pins the (1-chip) TPU
        # backend even under JAX_PLATFORMS=cpu — force the CPU platform with
        # enough virtual devices and reset backends (same trick as the driver's
        # dryrun entry)
        import os

        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count={n_devices}"
            )
        jax.config.update("jax_platforms", "cpu")
        if jax.default_backend() != "cpu" or len(jax.devices()) < n_devices:
            from jax.extend import backend as jex_backend

            jex_backend.clear_backends()
        devs, kind = list(jax.devices()[:n_devices]), jax.default_backend()
    assert len(devs) >= n_devices, (len(devs), n_devices)
    arr = np.array(devs[:n_devices]).reshape(n_devices // model_axis, model_axis)
    return Mesh(arr, ("data", "model")), kind


def _state_shardings(abstract_state, param_sharding_tree, mesh):
    """NamedSharding pytree for a full train state: params use their FSDP/TP layout;
    optimizer leaves that MIRROR a param (Adam mu/nu, MultiSteps accumulators — their
    key path ends with the param's path and shapes match) inherit that param's
    sharding, exactly as ``zeros_like`` propagates it at runtime; everything else
    (counters, the step scalar) is replicated."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    # param path -> (sharding, global shape); moments carry the param's GLOBAL shape
    pinfo = [
        (jax.tree_util.keystr(pp), sh, pl.shape)
        for (pp, sh), (_, pl) in zip(
            jax.tree_util.tree_leaves_with_path(param_sharding_tree),
            jax.tree_util.tree_leaves_with_path(abstract_state["params"]),
        )
    ]
    repl = NamedSharding(mesh, P())

    def assign(path, leaf):
        ks = jax.tree_util.keystr(path)
        for pks, sh, pshape in pinfo:
            if ks.endswith(pks) and getattr(leaf, "shape", None) == pshape:
                return sh
        return repl

    return {
        "params": param_sharding_tree,
        "opt_state": jax.tree_util.tree_map_with_path(
            assign, abstract_state["opt_state"]
        ),
        "step": repl,
    }


_DTYPE_BYTES = {
    "pred": 1, "s8": 1, "u8": 1, "s16": 2, "u16": 2, "s32": 4, "u32": 4,
    "s64": 8, "u64": 8, "f16": 2, "bf16": 2, "f32": 4, "f64": 8, "c64": 8,
    "c128": 16, "f8e4m3fn": 1, "f8e5m2": 1,
}

_SHAPE_RE = re.compile(r"\b([a-z]+[0-9]*(?:e[0-9a-z]+)?)\[([0-9,]*)\]")
_COLLECTIVE_RE = re.compile(
    r"=\s+(?P<type>\([^=]*?\)|\S+)\s+"
    r"(?P<op>all-gather|all-reduce|reduce-scatter|collective-permute|all-to-all)"
    r"(?P<start>-start)?\("
)


def _type_bytes(type_str: str) -> int:
    total = 0
    for dt, dims in _SHAPE_RE.findall(type_str):
        nbytes = _DTYPE_BYTES.get(dt)
        if nbytes is None:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * nbytes
    return total


def collective_inventory(hlo_text: str) -> dict:
    """Aggregate collectives from optimized HLO: per op kind, the instruction count
    and total RESULT-buffer bytes (for ``*-start`` async pairs only the start is
    counted; its result tuple includes the in-flight destination buffer, so bytes are
    an upper bound on the traffic of that op)."""
    out: dict[str, dict] = {}
    for m in _COLLECTIVE_RE.finditer(hlo_text):
        op = m.group("op")
        d = out.setdefault(op, {"count": 0, "result_bytes": 0})
        d["count"] += 1
        d["result_bytes"] += _type_bytes(m.group("type"))
    return out


def full_joint_budget(
    vlm_cfg=None,
    *,
    n_devices: int = 8,
    model_axis: int = 1,
    batch_per_device: int = 4,
    q_len: int = 256,
    a_len: int = 1024,
    accum_steps: int = 8,
    master_dtype: str = "fp32",
    remat="full",
    logits_chunk: Optional[int] = 128,
    mesh=None,
    kind: Optional[str] = None,
) -> dict:
    """AOT-compile the full-joint ``--fsdp`` stage-2 train step (the epoch-0
    all-trainable variant — the memory-worst program) at the given shapes and return
    the per-device memory + collective budget. Never materializes the params: the
    whole pipeline runs on ``ShapeDtypeStruct``s.

    Defaults are the BASELINE config #4 recipe: Gemma3-4B + ViT-L/384, per-device
    batch 4, top (q256, a1024) bucket, fp32 masters (``--master_dtype fp32``),
    full remat, v5e-8 data-parallel FSDP."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from projectiontrainer_tpu.models import vlm
    from projectiontrainer_tpu.parallel import param_shardings
    from projectiontrainer_tpu.train import masks, optim, steps

    if vlm_cfg is None:
        vlm_cfg = full_joint_4b_vlm_cfg()
    if mesh is None:
        mesh, kind = topology_mesh(n_devices, model_axis)
    elif kind is None:
        kind = "caller-mesh"

    # ---- abstract params under the master-dtype policy (trainer_stage2 semantics:
    # full-joint stores trainables in master_dtype; vlm.init is fp32 already)
    p_struct = jax.eval_shape(lambda: vlm.init(jax.random.key(0), vlm_cfg))
    tgt = jnp.float32 if master_dtype == "fp32" else jnp.bfloat16
    p_struct = jax.tree.map(
        lambda s: jax.ShapeDtypeStruct(
            s.shape, tgt if jnp.issubdtype(s.dtype, jnp.floating) else s.dtype
        ),
        p_struct,
    )
    shardings = param_shardings(p_struct, mesh, fsdp=True)
    params_aval = jax.tree.map(
        lambda s, sh: jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=sh),
        p_struct, shardings,
    )

    # ---- optimizer exactly as Stage2Trainer builds it for the epoch-0 variant
    policy = masks.Stage2Freeze(train_llm=True, use_lora=False,
                                train_projector=True, train_vision=True)
    labels = masks.stage2_labels(p_struct, policy)
    tx, _ = optim.single_group_optimizer(
        labels, 1e-5, total_steps=1000, warmup_ratio=0.05, weight_decay=0.01,
        clip_norm=1.0, clip_per_module=True, accum_steps=accum_steps,
    )
    opt_struct = jax.eval_shape(tx.init, p_struct)
    state_struct = {
        "params": p_struct, "opt_state": opt_struct,
        "step": jax.ShapeDtypeStruct((), jnp.int32),
    }
    st_shardings = _state_shardings(state_struct, shardings, mesh)
    repl = NamedSharding(mesh, P())

    def attach(s, sh):
        return jax.ShapeDtypeStruct(getattr(s, "shape", ()), s.dtype, sharding=sh)

    state_aval = {
        "params": params_aval,
        "opt_state": jax.tree.map(attach, opt_struct, st_shardings["opt_state"]),
        "step": jax.ShapeDtypeStruct((), jnp.int32, sharding=repl),
    }

    remat_arg = remat
    if isinstance(remat, str):
        remat_arg = {"full": True, "dots": "dots", "none": False}.get(remat, remat)
    loss_fn = steps.stage2_loss(
        vlm_cfg, 0, remat=remat_arg, logits_chunk=logits_chunk, table_frozen=False,
        compute_dtype=jnp.bfloat16, mesh=mesh,
    )
    step = steps.make_train_step(
        loss_fn, tx, donate=True, trainable_mask=masks.bool_mask(labels),
        param_shardings=shardings,
    )

    b = batch_per_device * mesh.shape["data"]
    img = vlm_cfg.vision.image_size
    dsh = NamedSharding(mesh, P("data"))
    batch_aval = {
        "pixel_values": jax.ShapeDtypeStruct((b, img, img, 3), jnp.float32, sharding=dsh),
        "question_ids": jax.ShapeDtypeStruct((b, q_len), jnp.int32, sharding=dsh),
        "answer_ids": jax.ShapeDtypeStruct((b, a_len), jnp.int32, sharding=dsh),
        "sample_weight": jax.ShapeDtypeStruct((b,), jnp.float32, sharding=dsh),
    }
    key_aval = jax.eval_shape(lambda: jax.random.key(0))
    key_aval = jax.ShapeDtypeStruct(key_aval.shape, key_aval.dtype, sharding=repl)

    lowered = step.lower(state_aval, batch_aval, key_aval)
    oom = None
    try:
        compiled = lowered.compile()
    except Exception as e:  # XLA:TPU RESOURCE_EXHAUSTED carries the exact usage
        msg = str(e)
        m = re.search(
            r"Used ([0-9.]+)([MG]) of ([0-9.]+)([MG]) hbm.*?"
            r"Exceeded hbm capacity by ([0-9.]+)([MG])", msg, re.S)
        if "RESOURCE_EXHAUSTED" not in msg or m is None:
            raise
        unit = {"M": 2**20, "G": 2**30}
        oom = {
            "used_bytes": int(float(m.group(1)) * unit[m.group(2)]),
            "limit_bytes": int(float(m.group(3)) * unit[m.group(4)]),
            "over_bytes": int(float(m.group(5)) * unit[m.group(6)]),
        }
        compiled = None

    # common report; the branches below fill the compile-dependent fields. An OOM
    # is a RESULT, not an error: the compiler's own accounting answers the budget
    # question, so sweeps can record both sides of the HBM frontier.
    state_bytes = sum(
        _leaf_local_bytes(l) for l in jax.tree_util.tree_leaves(state_aval)
    )
    report = {
        "kind": kind,
        "mesh": dict(mesh.shape),
        "model": "gemma3-4b-full-joint" if vlm_cfg.llm.hidden_size == 2560 else "custom",
        "batch_global": b,
        "batch_per_device": batch_per_device,
        "seq": {"visual": (img // vlm_cfg.vision.patch_size) ** 2 - 1,
                "q": q_len, "a": a_len},
        "master_dtype": master_dtype,
        "remat": str(remat),
        "accum_steps": accum_steps,
        "logits_chunk": logits_chunk,
        "state_bytes_per_device": int(state_bytes),
        "hbm_limit_bytes": V5E_HBM_BYTES,
        "oom": oom,
    }
    if compiled is None:
        report.update(
            per_device={"peak_bytes": oom["used_bytes"]},
            fits_16gb=False,
            collectives=None,
        )
        return report

    ma = compiled.memory_analysis()
    per_device = {}
    if ma is not None:
        per_device = {
            "argument_bytes": int(ma.argument_size_in_bytes),
            "output_bytes": int(ma.output_size_in_bytes),
            "temp_bytes": int(ma.temp_size_in_bytes),
            "alias_bytes": int(ma.alias_size_in_bytes),
            "generated_code_bytes": int(ma.generated_code_size_in_bytes),
        }
        peak = getattr(ma, "peak_memory_in_bytes", None)
        if peak is None:
            # donated state aliases outputs; live set = args + temps + code
            peak = (ma.argument_size_in_bytes + ma.temp_size_in_bytes
                    + ma.output_size_in_bytes - ma.alias_size_in_bytes
                    + ma.generated_code_size_in_bytes)
        per_device["peak_bytes"] = int(peak)
    report.update(
        per_device=per_device,
        fits_16gb=bool(per_device.get("peak_bytes", 0) < V5E_HBM_BYTES)
        if per_device else None,
        collectives=collective_inventory(compiled.as_text()),
    )
    return report


def _leaf_local_bytes(aval) -> int:
    import math

    sh = getattr(aval, "sharding", None)
    shape = getattr(aval, "shape", ())
    n = math.prod(sh.shard_shape(shape)) if sh is not None else math.prod(shape)
    return n * aval.dtype.itemsize
