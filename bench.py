"""Benchmark: Stage-1 projector-alignment training throughput on real hardware.

Runs the production-shape flagship stack — SigLIP ViT-L/16-384 vision tower (24L/1024),
MLP projector (1024 -> 10240 -> 1152), Gemma3-1B-shape decoder (26L, 262k vocab) — through
the real jitted train step (frozen towers bf16 + stop-gradient mask, fp32 projector,
chunked 262k-vocab CE, per-layer remat) on synthetic data, and reports images/sec/chip,
the BASELINE.md north-star metric.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}. The reference publishes
no numbers (BASELINE.md), so vs_baseline is measured against the driver-recorded history
when available (prior BENCH_r*.json), else null.

Usage: python bench.py [--mode stage1|stage1-tiny] [--batch N] [--steps N]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time


def _build_stage1(batch: int, tiny: bool):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from projectiontrainer_tpu.models import decoder as dec
    from projectiontrainer_tpu.models import projector as proj
    from projectiontrainer_tpu.models import siglip, vlm
    from projectiontrainer_tpu.train import masks, optim, steps

    if tiny:
        from projectiontrainer_tpu import testing as T

        cfg = T.tiny_vlm_cfg()
        caption_len = 16
        image = cfg.vision.image_size
    else:
        import dataclasses

        attn = "flash" if jax.default_backend() == "tpu" else "xla"
        vis = dataclasses.replace(siglip.vit_l_16_384(), attn_impl=attn)
        llm = dec.gemma3_config(attn_impl=attn)  # 1B shape: 26L, hidden 1152, 262k vocab
        cfg = vlm.VLMConfig(
            vision=vis,
            projector=proj.ProjectorConfig(
                vision_dim=vis.hidden_size, llm_dim=llm.hidden_size, expansion_factor=10
            ),
            llm=llm,
        )
        caption_len = 512
        image = vis.image_size

    rng = jax.random.key(0)
    # frozen towers in bf16 (they take no optimizer state), projector fp32
    params = {
        "vision": siglip.init_vision(jax.random.fold_in(rng, 0), cfg.vision, jnp.bfloat16),
        "projector": proj.init(jax.random.fold_in(rng, 1), cfg.projector, jnp.float32),
        "llm": dec.init(jax.random.fold_in(rng, 2), cfg.llm, jnp.bfloat16),
    }

    labels = masks.stage1_labels(params)
    tx, _ = optim.single_group_optimizer(
        labels, 3e-5, total_steps=1000, warmup_ratio=0.05, clip_norm=5.0
    )
    loss_fn = steps.stage1_loss(cfg, 0, remat=True, logits_chunk=256 if not tiny else None)
    step = steps.make_train_step(
        loss_fn, tx, donate=True, trainable_mask=masks.bool_mask(labels)
    )
    state = steps.init_state(params, tx)

    nprng = np.random.default_rng(0)
    batch_data = {
        "pixel_values": jnp.asarray(
            nprng.normal(size=(batch, image, image, 3)).astype(np.float32),
            dtype=jnp.bfloat16,
        ),
        "caption_ids": jnp.asarray(
            nprng.integers(1, cfg.llm.vocab_size, size=(batch, caption_len))
        ),
    }
    return step, state, batch_data


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--mode", default="stage1", choices=["stage1", "stage1-tiny"])
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--steps", type=int, default=8)
    parser.add_argument("--warmup", type=int, default=2)
    args = parser.parse_args(argv)

    import jax

    from projectiontrainer_tpu.core.cache import enable_compile_cache

    enable_compile_cache()
    tiny = args.mode == "stage1-tiny" or jax.default_backend() == "cpu"
    batch = args.batch if not tiny else 4

    step, state, batch_data = _build_stage1(batch, tiny)

    # warmup (includes compile); float() forces a device->host readback — the only
    # reliable sync on the tunneled axon runtime (block_until_ready returns early)
    for i in range(args.warmup):
        state, loss, _ = step(state, batch_data, jax.random.key(i))
    float(loss)

    t0 = time.perf_counter()
    for i in range(args.steps):
        state, loss, _ = step(state, batch_data, jax.random.key(100 + i))
        float(loss)  # per-step host sync (trainers read the loss every step anyway)
    elapsed = time.perf_counter() - t0

    n_chips = jax.device_count()
    images_per_sec = batch * args.steps / elapsed
    value = images_per_sec / n_chips

    vs_baseline = None
    history = sorted(glob.glob(os.path.join(os.path.dirname(__file__) or ".", "BENCH_r*.json")))
    if history:
        try:
            with open(history[-1]) as f:
                prev = json.load(f)
            if prev.get("value"):
                vs_baseline = value / float(prev["value"])
        except Exception:
            pass

    print(json.dumps({
        "metric": "stage1_align_images_per_sec_per_chip",
        "value": round(value, 3),
        "unit": "images/sec/chip",
        "vs_baseline": vs_baseline,
    }))
    print(
        f"# mode={args.mode} tiny={tiny} batch={batch} steps={args.steps} "
        f"elapsed={elapsed:.2f}s chips={n_chips} loss={float(loss):.4f} "
        f"step_time={elapsed / args.steps * 1e3:.1f}ms",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
