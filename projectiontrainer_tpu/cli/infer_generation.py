"""Generation evaluation: fixed diagnostic prompt, substring-match accuracy summary.

CLI mirror of Stage2/inference_generation.py:26-375: every sample gets the prompt
"Identify the diseases ... single word or phrase"; a generation is correct iff the
ground-truth label occurs in it (case-insensitive substring); prints per-label accuracy
and ground-truth/prediction distribution summaries.
"""

from __future__ import annotations

import argparse
import collections
import json
import sys

from projectiontrainer_tpu.cli.infer_vqa_stage2 import answer_batch, build_parser as _vqa_parser
from projectiontrainer_tpu.data import datasets
from projectiontrainer_tpu.eval import metrics as M
from projectiontrainer_tpu.generate import GenerationConfig
from projectiontrainer_tpu.train import lora as lora_mod, setup
from projectiontrainer_tpu.utils.logging import setup_logging

DIAGNOSTIC_PROMPT = (
    "Identify the diseases shown in the chest X-ray image. "
    "Answer with a single word or phrase."
)


def build_parser():
    p = _vqa_parser()
    p.description = __doc__
    p.add_argument("--prompt", type=str, default=DIAGNOSTIC_PROMPT)
    # reference surface (Stage2/inference_generation.py:215-217): --max_length is the
    # reference's name for the generation budget; --candidate_labels drives the
    # prediction-distribution summary; --verbose prints each sample as it finishes
    p.add_argument("--max_length", type=int, default=None,
                   help="Alias for --max_new_tokens (reference flag name)")
    p.add_argument("--candidate_labels", type=str, default=None,
                   help="Comma-separated labels for the prediction-distribution summary")
    p.add_argument("--verbose", action="store_true")
    return p


def display_summary(results, logger, candidate_labels=()):
    per_label = M.per_label_substring_accuracy(
        [r["generated_answer"] for r in results],
        [r.get("normal_caption", "") for r in results],
    )
    total_hits = sum(h for h, _ in per_label.values())
    total = sum(n for _, n in per_label.values())
    logger.info("overall substring accuracy: %.4f (%d/%d)",
                total_hits / max(1, total), total_hits, total)
    # GT-frequency ordering, like the reference (inference_generation.py:176-181)
    for label, (hits, n) in sorted(per_label.items(), key=lambda kv: -kv[1][1]):
        logger.info("  %-30s %3d/%3d  (%.3f)  [%.2f%% of GT]",
                    label, hits, n, hits / max(1, n), 100.0 * n / max(1, total))
    if candidate_labels:
        # prediction distribution: how often each CANDIDATE label appears in a
        # generation (reference inference_generation.py:168-171,191-200)
        pred_counts = collections.Counter()
        for r in results:
            gen = r["generated_answer"].lower()
            for label in candidate_labels:
                if label.lower() in gen:
                    pred_counts[label] += 1
        logger.info("prediction distribution (candidate label found in generation):")
        for label, n in pred_counts.most_common():
            logger.info("  %-30s %3d (%.2f%%)", label, n, 100.0 * n / max(1, total))
    gen_counter = collections.Counter(r["generated_answer"].strip() for r in results)
    logger.info("top generated answers: %s", gen_counter.most_common(10))
    return total_hits / max(1, total)


def main(argv=None):
    parser = build_parser()
    args = parser.parse_args(argv)
    if args.max_length is not None:
        if any(str(a).startswith("--max_new_tokens") for a in (argv or sys.argv[1:])):
            parser.error("--max_length is an alias for --max_new_tokens; pass one, "
                         "not both")
        args.max_new_tokens = args.max_length
    candidate_labels = [
        c.strip() for c in (args.candidate_labels or "").split(",") if c.strip()
    ]
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

    gen_cfg = GenerationConfig(
        max_new_tokens=args.max_new_tokens, num_beams=args.num_beams,
        do_sample=args.do_sample, temperature=args.temperature, top_p=args.top_p,
        top_k=args.top_k, repetition_penalty=args.repetition_penalty,
        length_penalty=args.length_penalty, eos_token_id=tokenizer.eos_token_id,
        pad_token_id=tokenizer.pad_token_id or 0,
    )

    samples = datasets.load_manifest(args.input_json)
    results = []
    for i in range(0, len(samples), args.batch_size):
        chunk = [dict(s, problem=args.prompt) for s in samples[i:i + args.batch_size]]
        n_real = len(chunk)
        if n_real < args.batch_size and len(samples) > args.batch_size:
            chunk = chunk + [chunk[-1]] * (args.batch_size - n_real)  # keep batch static
        answers = answer_batch(
            chunk, vlm_cfg, params, tokenizer, image_root=args.image_root,
            image_root_2=args.image_root_2, img_size=args.img_size,
            max_q_len=args.max_q_len, gen_cfg=gen_cfg,
        )[:n_real]
        for s, a in zip(samples[i:i + args.batch_size], answers):
            results.append({**s, "generated_answer": a})
            if args.verbose:
                logger.info("[%d] gt=%r gen=%r", len(results),
                            s.get("normal_caption", ""), a)

    acc = display_summary(results, logger, candidate_labels)
    with open(args.output_json, "w") as f:
        json.dump({"accuracy": acc, "results": results}, f, indent=2)
    return acc


if __name__ == "__main__":
    main()
