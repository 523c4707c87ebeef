"""Worker for the 2-process multi-host test (run via subprocess, NOT pytest).

Each process owns 2 virtual CPU devices (4 total over 2 processes), initializes
jax.distributed against a localhost coordinator, trains a tiny Stage-1 epoch over its
OWN host shard of the corpus, runs eval (loss + generation through the multi-host
gather path), and writes a result JSON the parent test asserts on:

- the schedule accounting is exact: global_step after one epoch == max_train_steps
  (the reference's DistributedSampler semantics — Stage0:508-509);
- the loss is finite and IDENTICAL across processes (global batch, replicated step);
- eval decodes only via process_allgather (np.asarray on a non-addressable global
  array would raise).
"""

import json
import os
import sys


def main():
    proc_id = int(sys.argv[1])
    coordinator = sys.argv[2]
    workdir = sys.argv[3]
    out_json = sys.argv[4]

    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=2"
    )
    os.environ.setdefault("TOKENIZERS_PARALLELISM", "false")

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=coordinator, num_processes=2, process_id=proc_id
    )
    assert jax.process_count() == 2
    assert jax.device_count() == 4
    assert len(jax.local_devices()) == 2

    import numpy as np

    from projectiontrainer_tpu import testing as T
    from projectiontrainer_tpu.core.config import Stage1Config
    from projectiontrainer_tpu.core.mesh import MeshConfig, build_mesh
    from projectiontrainer_tpu.data import datasets
    from projectiontrainer_tpu.models import vlm
    from projectiontrainer_tpu.train.trainer_stage1 import Stage1Trainer

    root = os.path.join(workdir, "images")
    manifest = os.path.join(workdir, "data.json")
    tok = T.word_tokenizer()
    # output_dir is SHARED across processes, like a real multi-host run on shared
    # storage: Orbax saves are collective and deadlock on mismatched paths
    cfg = Stage1Config(
        image_root=root, train_json=manifest, output_dir=os.path.join(workdir, "out"),
        img_size=32, batch_size=2, num_epochs=1, learning_rate=1e-3, max_caption_len=12,
        # save_every_n_epochs=1: the save path MUST run under process_count=2 — it
        # exercises the collective Orbax write and the cross-host consistency assert
        # (checkpoint/manager.py), which a per-process salted hash() once broke
        num_workers=2, mesh_data=-1, disable_wandb=True, save_every_n_epochs=1,
    )
    vcfg = T.tiny_vlm_cfg()
    params = vlm.init(jax.random.key(0), vcfg)  # same key -> same init on both hosts
    samples = datasets.load_manifest(manifest)
    ds = datasets.Stage1PairDataset(
        samples, image_root=root, tokenizer=tok, image_size=32, max_length=12
    )
    val = datasets.Stage1PairDataset(
        samples[:6], image_root=root, tokenizer=tok, image_size=32, max_length=12
    )
    mesh = build_mesh(MeshConfig(data=-1, model=1))
    assert mesh.shape["data"] == 4

    trainer = Stage1Trainer(
        cfg, vlm_cfg=vcfg, params=params, tokenizer=tok,
        train_dataset=ds, val_dataset=val, mesh=mesh,
    )
    expected_steps = trainer.max_train_steps
    result = trainer.train()
    val_metrics = trainer.evaluate(epoch=0, max_generate_batches=1)

    # ---- stage 2: the planned bucket feed must agree across hosts (same plan from
    # the same token lengths -> same shapes and batch count on every process)
    from projectiontrainer_tpu.core.config import Stage2Config
    from projectiontrainer_tpu.train.trainer_stage2 import Stage2Trainer

    s2cfg = Stage2Config(
        image_root=root, train_json=manifest,
        output_dir=os.path.join(workdir, "out_s2"), img_size=32, batch_size=1,
        num_epochs=1, max_q_len=12, max_a_len=8, enable_qlora=True,
        num_workers=2, mesh_data=-1, disable_wandb=True, logging_steps=1000,
    )
    s2ds = datasets.Stage2VQADataset(
        samples, image_root=root, tokenizer=tok, image_size=32, max_q_len=12, max_a_len=8
    )
    import jax.numpy as jnp

    from projectiontrainer_tpu.models import siglip as siglip_mod

    vparams = vlm.init(jax.random.key(0), vcfg)
    s2 = Stage2Trainer(
        s2cfg, vlm_cfg=vcfg, params=vparams, tokenizer=tok,
        train_dataset=s2ds, val_dataset=None, mesh=mesh,
    )
    s2_plan_batches = len(s2._train_plans[0])  # identical on every host by design
    s2_expected = s2.max_train_steps           # optimizer updates = ceil(batches/accum)
    assert s2_expected == -(-s2_plan_batches // s2cfg.gradient_accumulation_steps)
    s2_result = s2.train()

    # ---- FSDP leg: full-joint step with params + Adam moments sharded over the
    # data axis ACROSS PROCESSES — the cross-host reduce-scatter/all-gather path
    # the single-process virtual-mesh tests can't exercise. FSDP-wide dims so the
    # min-size gate actually shards leaves.
    import numpy as np

    from projectiontrainer_tpu.models import decoder as dec
    from projectiontrainer_tpu.models import projector as proj
    from projectiontrainer_tpu.parallel import param_shardings, shard_batch, shard_params
    from projectiontrainer_tpu.train import masks as masks_mod, optim, steps

    fllm = dec.gemma3_config(
        vocab_size=1024, hidden_size=128, intermediate_size=512, num_layers=2,
        num_heads=4, num_kv_heads=2, head_dim=32, sliding_window=8,
        query_pre_attn_scalar=32,
    )
    fvis = T.tiny_vision_cfg(hidden=128)
    fcfg = vlm.VLMConfig(
        vision=fvis,
        projector=proj.ProjectorConfig(vision_dim=128, llm_dim=128, expansion_factor=4),
        llm=fllm,
    )
    fparams = vlm.init(jax.random.key(7), fcfg)  # same key -> same init on both hosts
    placed = shard_params(fparams, mesh, fsdp=True)
    fshard = param_shardings(fparams, mesh, fsdp=True)
    gate = placed["llm"]["layers"][0]["mlp"]["gate_proj"]["kernel"]
    fsdp_sharded = "data" in tuple(gate.sharding.spec)
    labels = masks_mod.stage2_labels(
        placed, masks_mod.Stage2Freeze(train_llm=True, use_lora=False,
                                       train_projector=True, train_vision=True)
    )
    ftx, _ = optim.single_group_optimizer(labels, 1e-3, total_steps=10, clip_norm=1.0)
    floss = steps.stage2_loss(fcfg, 0, remat=False, logits_chunk=64, table_frozen=False)
    fstep = steps.make_train_step(floss, ftx, donate=False,
                                  trainable_mask=masks_mod.bool_mask(labels),
                                  param_shardings=fshard)
    fstate = steps.init_state(placed, ftx)
    nprng = np.random.default_rng(7)
    # global batch 8 = 4 local rows per process; SAME global data on both hosts
    # (deterministic rng) -> replicated loss must agree exactly
    gbatch = {
        "pixel_values": nprng.normal(size=(8, 32, 32, 3)).astype(np.float32),
        "question_ids": nprng.integers(1, fllm.vocab_size, size=(8, 6)),
        "answer_ids": nprng.integers(1, fllm.vocab_size, size=(8, 8)),
    }
    local = {k: v[proc_id * 4:(proc_id + 1) * 4] for k, v in gbatch.items()}
    fbatch = shard_batch(local, mesh)
    fstate, fsdp_loss, _ = fstep(fstate, fbatch, jax.random.key(8))
    fsdp_loss = float(fsdp_loss)
    g2 = fstate["params"]["llm"]["layers"][0]["mlp"]["gate_proj"]["kernel"]
    fsdp_kept = g2.sharding.is_equivalent_to(gate.sharding, g2.ndim)

    # ---- FSDP TRAINER leg (advisor r4 #2): the full Stage2Trainer --fsdp path
    # including the epoch-boundary reference-layout EXPORT, whose leaves are sharded
    # over the CROSS-HOST data axis — to_host must collectively gather them before
    # np.asarray (a raw np.asarray on a non-addressable array raises). Same fcfg
    # dims so the 64Ki FSDP gate actually shards the MLP kernels.
    ft_cfg = Stage2Config(
        image_root=root, train_json=manifest,
        output_dir=os.path.join(workdir, "out_fsdp"), img_size=32, batch_size=1,
        num_epochs=1, max_q_len=12, max_a_len=8, fsdp=True, unfreeze_llm=True,
        unfreeze_projection_layer=True, num_workers=2, mesh_data=-1,
        disable_wandb=True, logging_steps=1000,
    )
    ft_ds = datasets.Stage2VQADataset(
        samples[:8], image_root=root, tokenizer=tok, image_size=32,
        max_q_len=12, max_a_len=8,
    )
    ft = Stage2Trainer(
        ft_cfg, vlm_cfg=fcfg, params=vlm.init(jax.random.key(7), fcfg), tokenizer=tok,
        train_dataset=ft_ds, val_dataset=None, mesh=mesh,
    )
    ft_gate = ft.state["params"]["llm"]["layers"][0]["mlp"]["gate_proj"]["kernel"]
    ft_sharded = "data" in tuple(ft_gate.sharding.spec)
    ft_result = ft.train()  # runs save_checkpoint -> export at the epoch boundary
    from jax.experimental import multihost_utils

    # process 0 alone writes the export files; fence before the other host reads
    multihost_utils.sync_global_devices("fsdp_export_written")
    exported = os.path.join(
        ft_cfg.output_dir, "checkpoint-epoch_0", "language_model", "model.safetensors"
    )
    # the export must hold the FULL (gathered) kernel, equal on every host to the
    # collectively gathered live param
    from safetensors.numpy import safe_open as _so

    with _so(exported, framework="numpy") as f:
        exp_gate = f.get_tensor("layers/0/mlp/gate_proj/kernel")
    from projectiontrainer_tpu.train import common as tcommon

    live_gate = tcommon.to_host(
        ft.state["params"]["llm"]["layers"][0]["mlp"]["gate_proj"]["kernel"])
    export_matches = (
        exp_gate.shape == live_gate.shape
        and bool(np.allclose(exp_gate, np.asarray(live_gate, exp_gate.dtype)))
    )

    out = {
        "process": proc_id,
        "expected_steps": int(expected_steps),
        "actual_steps": int(trainer.global_step),
        "epoch_loss": float(result["train/epoch_loss"]),
        "val_loss": float(val_metrics["val/loss"]),
        "last_word_accuracy": float(val_metrics.get("validation/last_word_accuracy", -1)),
        "s2_expected_steps": int(s2_plan_batches),
        "s2_actual_steps": int(s2.global_step),
        "s2_epoch_loss": float(s2_result["train/epoch_loss"]),
        "fsdp_loss": fsdp_loss,
        "fsdp_sharded": bool(fsdp_sharded),
        "fsdp_layout_kept": bool(fsdp_kept),
        "fsdp_trainer_loss": float(ft_result["train/epoch_loss"]),
        "fsdp_trainer_sharded": bool(ft_sharded),
        "fsdp_export_matches": bool(export_matches),
    }
    with open(out_json, "w") as f:
        json.dump(out, f)
    print("WORKER_OK", json.dumps(out))


if __name__ == "__main__":
    main()
