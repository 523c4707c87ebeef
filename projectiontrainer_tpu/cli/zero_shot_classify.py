"""Zero-shot SigLIP classification over a manifest (no trained head).

CLI mirror of cls_evaluate/cls_without_head/classifier.py + utils.py: prompt-template
scoring via logits_per_image, accuracy vs (comma-separated) ground-truth labels.
"""

from __future__ import annotations

import argparse
import json

import numpy as np

from projectiontrainer_tpu.checkpoint import hf_import
from projectiontrainer_tpu.data import datasets, image as I
from projectiontrainer_tpu.eval import zero_shot
from projectiontrainer_tpu.train import setup
from projectiontrainer_tpu.utils.logging import setup_logging


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model_name", type=str, required=True, help="Local SigLIP snapshot dir")
    p.add_argument("--data_json", type=str, required=True)
    p.add_argument("--image_root", type=str, required=True)
    p.add_argument("--image_root_2", type=str, default=None)
    p.add_argument("--class_names", type=str, required=True, help="Comma-separated")
    p.add_argument("--template", type=str, default="xray",
                   choices=list(zero_shot.PROMPT_TEMPLATES) + ["custom"])
    p.add_argument("--custom_template", type=str, default=None)
    p.add_argument("--img_size", type=int, default=384)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--max_text_len", type=int, default=64)
    p.add_argument("--output_json", type=str, default=None)
    args = p.parse_args(argv)
    logger = setup_logging()

    cfg, params = hf_import.load_siglip(args.model_name)
    tokenizer = setup.load_tokenizer(args.model_name)
    class_names = [c.strip() for c in args.class_names.split(",") if c.strip()]
    template = args.custom_template if args.template == "custom" else args.template

    clf = zero_shot.ZeroShotClassifier(
        cfg, params, tokenizer, class_names, template=template,
        max_text_len=args.max_text_len,
    )

    samples = datasets.load_manifest(args.data_json)
    predictions, gts = [], []
    for i in range(0, len(samples), args.batch_size):
        chunk = samples[i:i + args.batch_size]
        pixels = np.stack([
            I.preprocess(
                I.load_image(I.resolve_image_path(
                    s["image"], args.image_root, args.image_root_2)),
                args.img_size,
            )
            for s in chunk
        ])
        _, pred_idx = clf.predict(pixels)
        predictions.extend(class_names[j] for j in pred_idx)
        gts.extend(str(s.get("normal_caption", "")) for s in chunk)

    acc = zero_shot.multi_label_accuracy(predictions, gts)
    logger.info("zero-shot accuracy: %.4f over %d samples", acc, len(predictions))
    if args.output_json:
        with open(args.output_json, "w") as f:
            json.dump({"accuracy": acc,
                       "predictions": [
                           {**s, "predicted": p}
                           for s, p in zip(samples, predictions)
                       ]}, f, indent=2)
    return acc


if __name__ == "__main__":
    main()
