"""t-SNE visualization of SigLIP embeddings by class, with per-epoch sweep mode.

CLI mirror of Stage1/visualization/tsne_embedding_analysis.py plus the bash epoch-sweep
driver (Stage1/visualization/run_epoch_analysis.sh:21-43): ``--epochs_root`` points at a
Stage-0 output directory and produces one t-SNE plot per exported ``epoch_N``/
``best_model`` HF snapshot, so class-separation can be tracked over training.
"""

from __future__ import annotations

import argparse
import os
import re

import numpy as np

from projectiontrainer_tpu.checkpoint import export, hf_import
from projectiontrainer_tpu.data import datasets
from projectiontrainer_tpu.data import image as I
from projectiontrainer_tpu.eval import tsne
from projectiontrainer_tpu.utils.logging import setup_logging


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model_name", type=str, default=None,
                   help="Single local SigLIP snapshot dir")
    p.add_argument("--epochs_root", type=str, default=None,
                   help="Sweep mode: a Stage-0 output dir; every epoch_N/ and "
                        "best_model/ HF snapshot inside gets its own plot")
    p.add_argument("--data_json", type=str, required=True)
    p.add_argument("--image_root", type=str, required=True)
    p.add_argument("--image_root_2", type=str, default=None)
    p.add_argument("--classes", type=str,
                   default="No Finding,Atelectasis,Cardiomegaly,Effusion")
    p.add_argument("--img_size", type=int, default=384)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--max_samples_per_class", type=int, default=200)
    p.add_argument("--projector_path", type=str, default=None,
                   help="Optional: also embed through the Stage-1 projector")
    p.add_argument("--output", type=str, default="tsne.png",
                   help="Output image (single mode) or directory (sweep mode)")
    p.add_argument("--seed", type=int, default=42)
    return p


def _epoch_snapshot_dirs(root: str) -> list[tuple[str, str]]:
    """(tag, dir) for every HF snapshot under a Stage-0 output dir, epochs sorted."""
    out = []
    for d in sorted(os.listdir(root)):
        full = os.path.join(root, d)
        if not os.path.isdir(full) or not os.path.exists(os.path.join(full, "config.json")):
            continue
        if re.fullmatch(r"epoch_\d+", d) or d == "best_model":
            out.append((d, full))
    out.sort(key=lambda td: (0, int(td[0][6:])) if td[0].startswith("epoch_") else (1, 0))
    return out


def run_one(model_dir: str, args, samples, classes, logger, output: str) -> str:
    cfg, params = hf_import.load_siglip(model_dir)

    def batches():
        for i in range(0, len(samples), args.batch_size):
            chunk = samples[i:i + args.batch_size]
            yield np.stack([
                I.preprocess(
                    I.load_image(I.resolve_image_path(
                        s["image"], args.image_root, args.image_root_2)),
                    args.img_size,
                )
                for s in chunk
            ])

    projector_params = None
    if args.projector_path:
        _, projector_params = export.load_projector(args.projector_path)

    emb = tsne.compute_image_embeddings(
        params["vision"], cfg.vision, batches(), projector_params=projector_params
    )
    pts = tsne.tsne_2d(emb, seed=args.seed)
    labels = [str(s["normal_caption"]) for s in samples]
    tsne.plot_tsne(pts, labels, output)
    logger.info("wrote %s", output)
    return output


def main(argv=None):
    args = build_parser().parse_args(argv)
    logger = setup_logging()
    if bool(args.model_name) == bool(args.epochs_root):
        raise SystemExit("exactly one of --model_name / --epochs_root is required")

    classes = [c.strip() for c in args.classes.split(",")]
    samples = tsne.balance_classes(
        datasets.load_manifest(args.data_json), classes, seed=args.seed
    )
    samples = samples[: args.max_samples_per_class * len(classes)]
    logger.info("embedding %d balanced samples over %d classes", len(samples), len(classes))

    if args.model_name:
        return run_one(args.model_name, args, samples, classes, logger, args.output)

    snapshots = _epoch_snapshot_dirs(args.epochs_root)
    if not snapshots:
        raise SystemExit(f"no epoch_N/best_model HF snapshots under {args.epochs_root}")
    os.makedirs(args.output, exist_ok=True)
    outputs = []
    for tag, model_dir in snapshots:
        out = os.path.join(args.output, f"tsne_{tag}.png")
        outputs.append(run_one(model_dir, args, samples, classes, logger, out))
    return outputs


if __name__ == "__main__":
    main()
