"""Stage 2 VQA inference: batch generation over a JSON of (image, problem) samples.

CLI mirror of Stage2/inference_vqa_stage2.py:292-469 (base LLM + LoRA adapter +
projector; per sample: vision -> project -> embed question -> concat -> generate with
the reference's sampling surface: beams/temperature/top-p/top-k/repetition penalty).
Results are written as JSON with generated answers alongside ground truth.
"""

from __future__ import annotations

import argparse
import json
import os
import time

import jax.numpy as jnp
import numpy as np

from projectiontrainer_tpu.data import datasets, image as I
from projectiontrainer_tpu.generate import GenerationConfig, generate
from projectiontrainer_tpu.models import vlm
from projectiontrainer_tpu.train import lora as lora_mod, setup
from projectiontrainer_tpu.utils.logging import setup_logging


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input_json", type=str, default=None,
                   help="Batch mode: JSON of {image, problem} samples")
    p.add_argument("--image_path", type=str, default=None,
                   help="Single-image mode (reference run_inference, "
                        "Stage2/inference_vqa_stage2.py:25-209)")
    p.add_argument("--question", type=str, default=None,
                   help="Question for single-image mode")
    p.add_argument("--output_json", type=str, default="vqa_predictions.json")
    p.add_argument("--image_root", type=str, default=None)
    p.add_argument("--image_root_2", type=str, default=None)
    p.add_argument("--vision_model_name", type=str, required=True)
    # --base_llm_name is the reference launchers' spelling
    # (Stage2/run_vqa_inference_stage2.sh, run_generation_inference.sh)
    p.add_argument("--llm_name", "--base_llm_name", dest="llm_name", type=str,
                   required=True)
    p.add_argument("--adapter_path", type=str, default=None,
                   help="Directory containing adapter_model.safetensors (LoRA)")
    p.add_argument("--projector_path", type=str, required=True)
    p.add_argument("--img_size", type=int, default=384)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--max_q_len", type=int, default=256)
    p.add_argument("--max_new_tokens", type=int, default=1024)
    p.add_argument("--num_beams", type=int, default=3)
    p.add_argument("--do_sample", action="store_true")
    p.add_argument("--temperature", type=float, default=0.3)
    p.add_argument("--top_p", type=float, default=0.9)
    p.add_argument("--top_k", type=int, default=50)
    p.add_argument("--repetition_penalty", type=float, default=1.8)
    p.add_argument("--length_penalty", type=float, default=1.2)
    p.add_argument("--approx_topk", action="store_true",
                   help="TPU approx_max_k candidate scan in sampled beam search "
                        "(~4%% faster decode; sampling-path only, off = exact HF "
                        "semantics)")
    p.add_argument("--lora_r", type=int, default=16)
    p.add_argument("--lora_alpha", type=int, default=32)
    return p


def build_prefix(pixels, q_tok, vlm_cfg, params, tokenizer, *, max_q_len):
    """Stage A of VQA generation: bucket + LEFT-pad the questions and run the jitted
    [visual; question] prefix program (vision tower -> projector -> embeds). Returns
    device arrays WITHOUT blocking — dispatch is async, so a caller can enqueue the
    next batch's prefix while the previous batch still decodes (the serving
    double-buffer rides this).

    Pads questions to a BUCKET, not the batch max: a per-batch dynamic length
    recompiles the whole generate graph for every distinct value (minutes each on
    TPU); the bucket grid bounds compilation count like the training feed."""
    from projectiontrainer_tpu.data.bucketing import (
        DEFAULT_Q_BUCKETS, bucket_for, buckets_covering,
    )

    pad = tokenizer.pad_token_id or 0
    grid = buckets_covering(max_q_len, DEFAULT_Q_BUCKETS)  # max_q_len beyond the
    q_len = min(bucket_for(max(len(q) for q in q_tok), grid), max_q_len)  # grid widens it
    q_ids = np.full((len(q_tok), q_len), pad, np.int32)
    for i, q in enumerate(q_tok):  # left padding: last slot is the last question token
        q = q[-q_len:]  # over-bucket truncation keeps the tokens nearest the answer
        q_ids[i, q_len - len(q):] = q

    # one jitted program builds the [visual; question] prefix — eager per-op
    # dispatch of the vision tower costs seconds/call on the tunneled runtime
    return vlm.question_prefix(
        params, vlm_cfg, jnp.asarray(pixels), jnp.asarray(q_ids), pad_token_id=pad
    )


def decode_prefix(embeds, mask, vlm_cfg, params, tokenizer, *, gen_cfg):
    """Stage B of VQA generation: bucketed beam decode from a prebuilt prefix, then
    host-side detokenization (this is where the device sync happens)."""
    pad = tokenizer.pad_token_id or 0
    ids = generate(params["llm"], vlm_cfg.llm, embeds, mask, gen_cfg)
    return [
        tokenizer.decode([t for t in np.asarray(row) if t != pad], skip_special_tokens=True)
        for row in np.asarray(ids)
    ]


def generate_answers(pixels, q_tok, vlm_cfg, params, tokenizer, *, max_q_len, gen_cfg):
    """Core VQA generation shared by the batch CLI and the serving endpoint:
    prefix build (stage A) + decode (stage B) back to back."""
    embeds, mask = build_prefix(pixels, q_tok, vlm_cfg, params, tokenizer,
                                max_q_len=max_q_len)
    return decode_prefix(embeds, mask, vlm_cfg, params, tokenizer, gen_cfg=gen_cfg)


def answer_batch(samples, vlm_cfg, params, tokenizer, *, image_root, image_root_2,
                 img_size, max_q_len, gen_cfg):
    """samples: list of {'image', 'problem'} -> list of generated answer strings."""
    pixels = np.stack([
        I.preprocess(
            I.load_image(I.resolve_image_path(s["image"], image_root, image_root_2)),
            img_size,
        )
        for s in samples
    ])
    q_tok = [
        tokenizer(s["problem"], max_length=max_q_len, truncation=True,
                  add_special_tokens=False)["input_ids"]
        for s in samples
    ]
    return generate_answers(pixels, q_tok, vlm_cfg, params, tokenizer,
                            max_q_len=max_q_len, gen_cfg=gen_cfg)


def main(argv=None):
    args = build_parser().parse_args(argv)
    logger = setup_logging()
    vlm_cfg, params, _ = setup.build_vlm(
        args.vision_model_name, args.llm_name, stage1_projector_path=args.projector_path,
    )
    tokenizer = setup.load_tokenizer(args.llm_name)
    if args.adapter_path:
        from projectiontrainer_tpu.checkpoint.export import load_adapter

        lora, lcfg = load_adapter(args.adapter_path)
        if lcfg is None:  # legacy flat format carries no config — use the flags
            lcfg = lora_mod.LoraConfig(r=args.lora_r, alpha=args.lora_alpha)
        params["llm"] = lora_mod.merge_into_decoder(params["llm"], lora, lcfg)
        logger.info("merged LoRA adapters from %s", args.adapter_path)

    gen_cfg = GenerationConfig(
        max_new_tokens=args.max_new_tokens, num_beams=args.num_beams,
        do_sample=args.do_sample, temperature=args.temperature, top_p=args.top_p,
        top_k=args.top_k, repetition_penalty=args.repetition_penalty,
        length_penalty=args.length_penalty, eos_token_id=tokenizer.eos_token_id,
        pad_token_id=tokenizer.pad_token_id or 0, approx_top_k=args.approx_topk,
    )

    if args.image_path:
        # single-image mode: treat the CLI args as a one-sample manifest
        samples = [{"image": os.path.basename(args.image_path),
                    "problem": args.question or "Describe the findings."}]
        args.image_root = os.path.dirname(os.path.abspath(args.image_path))
    else:
        assert args.input_json, "--input_json or --image_path required"
        samples = datasets.load_manifest(args.input_json)
    results, latencies = [], []
    for i in range(0, len(samples), args.batch_size):
        chunk = samples[i:i + args.batch_size]
        n_real = len(chunk)
        if n_real < args.batch_size and len(samples) > args.batch_size:
            # pad the straggler chunk to the compiled batch shape (one less recompile)
            chunk = chunk + [chunk[-1]] * (args.batch_size - n_real)
        t0 = time.perf_counter()
        answers = answer_batch(
            chunk, vlm_cfg, params, tokenizer, image_root=args.image_root,
            image_root_2=args.image_root_2, img_size=args.img_size,
            max_q_len=args.max_q_len, gen_cfg=gen_cfg,
        )[:n_real]
        chunk = chunk[:n_real]
        latencies.append((time.perf_counter() - t0) / n_real)
        for s, a in zip(chunk, answers):
            results.append({**s, "generated_answer": a})
        logger.info("processed %d/%d", min(i + args.batch_size, len(samples)), len(samples))

    with open(args.output_json, "w") as f:
        json.dump(results, f, indent=2)
    if latencies:
        logger.info("p50 per-sample latency: %.3fs", float(np.median(latencies)))
    return results


if __name__ == "__main__":
    main()
