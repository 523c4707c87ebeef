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
    }
    with open(out_json, "w") as f:
        json.dump(out, f)
    print("WORKER_OK", json.dumps(out))


if __name__ == "__main__":
    main()
