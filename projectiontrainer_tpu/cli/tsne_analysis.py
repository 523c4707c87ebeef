"""t-SNE visualization of SigLIP embeddings by class, with per-epoch sweep mode.

CLI mirror of Stage1/visualization/tsne_embedding_analysis.py + run_epoch_analysis.sh:
balance classes, embed, t-SNE, scatter plot; ``--checkpoint_glob`` sweeps a directory of
per-epoch checkpoints like the reference's bash driver.
"""

from __future__ import annotations

import argparse
import glob
import os

import numpy as np

from projectiontrainer_tpu.checkpoint import export, hf_import
from projectiontrainer_tpu.data import datasets, image as I
from projectiontrainer_tpu.eval import tsne
from projectiontrainer_tpu.utils.logging import setup_logging


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model_name", type=str, required=True,
                   help="Local SigLIP snapshot dir (or checkpoint export dir)")
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
    p.add_argument("--output", type=str, default="tsne.png")
    p.add_argument("--seed", type=int, default=42)
    args = p.parse_args(argv)
    logger = setup_logging()

    cfg, params = hf_import.load_siglip(args.model_name)
    classes = [c.strip() for c in args.classes.split(",")]
    samples = tsne.balance_classes(
        datasets.load_manifest(args.data_json), classes, seed=args.seed
    )
    samples = samples[: args.max_samples_per_class * len(classes)]
    logger.info("embedding %d balanced samples over %d classes", len(samples), len(classes))

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
    tsne.plot_tsne(pts, labels, args.output)
    logger.info("wrote %s", args.output)


if __name__ == "__main__":
    main()
