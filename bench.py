"""Benchmark: the BASELINE.md north-star metrics on real hardware.

Modes (all on production shapes — SigLIP ViT-L/16-384 tower, 1024->10240->1152 projector,
Gemma3-1B-shape decoder with 262k vocab — synthetic data, Pallas flash attention):

- ``stage1`` (default, driver-recorded): projector-alignment train step ->
  images/sec/chip (frozen bf16 towers + stop-gradient masks, chunked CE).
- ``stage2``: QLoRA VQA train step (575 visual + 256 q + 1024 a bucket) -> tokens/sec.
- ``gen``: jitted KV-cache generation from a [visual; question] prefix -> p50 latency.
- ``stage1-tiny``: CPU-runnable smoke variant.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}. The reference publishes
no numbers (BASELINE.md), so vs_baseline compares against the prior round's recorded
BENCH_r*.json when present, else null. Timing uses per-step host readbacks (the tunneled
runtime's block_until_ready is not a true sync).

Usage: python bench.py [--mode stage1|stage2|gen|stage1-tiny] [--batch N] [--steps N]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time


def _build_stage1(batch: int, tiny: bool, remat: bool = True):
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
    loss_fn = steps.stage1_loss(cfg, 0, remat=remat, logits_chunk=256 if not tiny else None)
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


def _full_vlm_cfg():
    import dataclasses

    import jax

    from projectiontrainer_tpu.models import decoder as dec
    from projectiontrainer_tpu.models import projector as proj
    from projectiontrainer_tpu.models import siglip, vlm

    attn = "flash" if jax.default_backend() == "tpu" else "xla"
    vis = dataclasses.replace(siglip.vit_l_16_384(), attn_impl=attn)
    llm = dec.gemma3_config(attn_impl=attn)
    return vlm.VLMConfig(
        vision=vis,
        projector=proj.ProjectorConfig(
            vision_dim=vis.hidden_size, llm_dim=llm.hidden_size, expansion_factor=10
        ),
        llm=llm,
    )


def _init_full_params(cfg, *, quantize=False):
    import jax
    import jax.numpy as jnp

    from projectiontrainer_tpu.models import decoder as dec
    from projectiontrainer_tpu.models import projector as proj
    from projectiontrainer_tpu.models import siglip

    rng = jax.random.key(0)
    llm_params = dec.init(jax.random.fold_in(rng, 2), cfg.llm, jnp.bfloat16)
    if quantize:
        from projectiontrainer_tpu.ops.quant import quantize_decoder

        llm_params = quantize_decoder(llm_params)
    return {
        "vision": siglip.init_vision(jax.random.fold_in(rng, 0), cfg.vision, jnp.bfloat16),
        "projector": proj.init(jax.random.fold_in(rng, 1), cfg.projector, jnp.float32),
        "llm": llm_params,
    }


def _run_stage2(batch: int, steps_n: int, warmup: int):
    """QLoRA VQA step at the largest bucket (q=256, a=1024) -> tokens/sec."""
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    from projectiontrainer_tpu.train import lora as lora_mod, masks, optim, steps

    cfg = _full_vlm_cfg()
    lcfg = lora_mod.LoraConfig(r=16, alpha=32)
    params = _init_full_params(cfg, quantize=True)
    params["lora"] = lora_mod.init(jax.random.key(1), cfg.llm, lcfg)
    labels = masks.stage2_labels(
        params, masks.Stage2Freeze(train_llm=False, use_lora=True, train_projector=False)
    )
    tx, _ = optim.single_group_optimizer(
        labels, 1e-5, total_steps=1000, clip_norm=1.0, clip_per_module=True
    )
    loss_fn = steps.stage2_loss(cfg, 0, lora_cfg=lcfg, remat=True, logits_chunk=256)
    step = steps.make_train_step(
        loss_fn, tx, donate=True, trainable_mask=masks.bool_mask(labels)
    )
    state = steps.init_state(params, tx)

    nprng = np.random.default_rng(0)
    image = cfg.vision.image_size
    batch_data = {
        "pixel_values": jnp.asarray(
            nprng.normal(size=(batch, image, image, 3)), dtype=jnp.bfloat16
        ),
        "question_ids": jnp.asarray(nprng.integers(1, 262144, size=(batch, 256))),
        "answer_ids": jnp.asarray(nprng.integers(1, 262144, size=(batch, 1024))),
    }
    for i in range(warmup):
        state, loss, aux = step(state, batch_data, jax.random.key(i))
    float(loss)
    t0 = time.perf_counter()
    total_tokens = 0
    for i in range(steps_n):
        state, loss, aux = step(state, batch_data, jax.random.key(100 + i))
        float(loss)
        total_tokens += batch * (575 + 256 + 1024)
    elapsed = time.perf_counter() - t0
    return {
        "metric": "stage2_vqa_tokens_per_sec",
        "value": round(total_tokens / elapsed, 1),
        "unit": "tokens/sec",
        "extra": f"loss={float(loss):.3f} step={elapsed / steps_n * 1e3:.0f}ms",
    }


def _run_gen(batch: int, steps_n: int, warmup: int, max_new: int = 128):
    """p50 latency of [visual; question] -> generation (greedy, static KV cache)."""
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    from projectiontrainer_tpu.generate import GenerationConfig, generate
    from projectiontrainer_tpu.models import vlm

    cfg = _full_vlm_cfg()
    params = _init_full_params(cfg)
    nprng = np.random.default_rng(0)
    image = cfg.vision.image_size
    pixels = jnp.asarray(nprng.normal(size=(batch, image, image, 3)), dtype=jnp.bfloat16)
    q_ids = jnp.asarray(nprng.integers(1, 262144, size=(batch, 64)))

    gcfg = GenerationConfig(max_new_tokens=max_new, do_sample=False, pad_token_id=0)

    @jax.jit
    def run(params, pixels, q_ids):
        visual = vlm.visual_embeds(params, cfg, pixels)
        from projectiontrainer_tpu.models import decoder as dec

        q_emb = dec.embed(params["llm"], cfg.llm, q_ids).astype(visual.dtype)
        embeds = jnp.concatenate([visual, q_emb], axis=1)
        mask = jnp.ones(embeds.shape[:2], jnp.int32)
        return generate(params["llm"], cfg.llm, embeds, mask, gcfg)

    for _ in range(warmup):
        out = run(params, pixels, q_ids)
    np.asarray(out)
    lat = []
    for _ in range(steps_n):
        t0 = time.perf_counter()
        out = run(params, pixels, q_ids)
        np.asarray(out)
        lat.append((time.perf_counter() - t0) / batch)
    import numpy as np  # noqa: F811

    return {
        "metric": "vqa_generation_latency_p50",
        "value": round(float(np.median(lat)), 4),
        "unit": f"sec/sample ({max_new} new tokens, batch {batch})",
        "extra": f"tokens/sec={max_new / np.median(lat):.1f}",
    }


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--mode", default="stage1", choices=["stage1", "stage1-tiny", "stage2", "gen"]
    )
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--steps", type=int, default=8)
    parser.add_argument("--warmup", type=int, default=2)
    parser.add_argument("--remat", type=str, default="full",
                        choices=["full", "dots", "none"])
    args = parser.parse_args(argv)

    import jax

    from projectiontrainer_tpu.core.cache import enable_compile_cache

    enable_compile_cache()

    if args.mode in ("stage2", "gen"):
        runner = _run_stage2 if args.mode == "stage2" else _run_gen
        result = runner(min(args.batch, 4), args.steps, args.warmup)
        extra = result.pop("extra", "")
        result["vs_baseline"] = None
        print(json.dumps(result))
        print(f"# {extra}", file=sys.stderr)
        return

    tiny = args.mode == "stage1-tiny" or jax.default_backend() == "cpu"
    batch = args.batch if not tiny else 4

    remat = {"full": True, "dots": "dots", "none": False}[args.remat]
    step, state, batch_data = _build_stage1(batch, tiny, remat=remat)

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
