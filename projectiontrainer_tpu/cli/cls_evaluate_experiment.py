"""Checkpoint sweep: evaluate every saved checkpoint of a cls experiment on a test set.

CLI mirror of cls_evaluate/evaluate_experiment.py:258-411: per-checkpoint metrics, best
epoch from results.tsv (AUC -> Acc fallback), machine-readable BEST_RESULT line, and a
metric-vs-epoch plot.
"""

from __future__ import annotations

import argparse
import json
import os

from projectiontrainer_tpu.eval import sweep
from projectiontrainer_tpu.utils.logging import setup_logging


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--exp_id", type=str, required=True)
    p.add_argument("--output_base_dir", type=str, required=True)
    p.add_argument("--test_json", type=str, default=None,
                   help="Test manifest; omit to just summarize results.tsv")
    p.add_argument("--image_root", type=str, default=None)
    p.add_argument("--image_root_2", type=str, default=None)
    p.add_argument("--img_size", type=int, default=384)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--plot", type=str, default=None)
    args = p.parse_args(argv)
    logger = setup_logging()

    exp_dir = os.path.join(args.output_base_dir, args.exp_id)
    if args.test_json:
        from projectiontrainer_tpu.core.config import ClsConfig
        from projectiontrainer_tpu.data import datasets

        # class names come from the training config embedded in checkpoint metadata
        orbax_dir = os.path.join(exp_dir, "orbax")
        metas = sorted(f for f in os.listdir(orbax_dir) if f.endswith("_metadata.json"))
        with open(os.path.join(orbax_dir, metas[-1])) as f:
            cfg = ClsConfig(**json.loads(json.load(f)["config"]))
        names = cfg.effective_class_names()
        test_ds = datasets.ClassificationDataset(
            datasets.load_manifest(args.test_json),
            image_root=args.image_root or cfg.image_root, class_names=names,
            image_size=args.img_size, image_root_2=args.image_root_2,
            handle_abnormal=cfg.handle_abnormal,
            abnormal_source_classes=cfg.abnormal_source_classes,
        )
        results = sweep.evaluate_all_checkpoints(exp_dir, test_ds,
                                                 batch_size=args.batch_size)
        for r in results:
            logger.info("%s: acc=%.4f auc=%.4f loss=%.4f",
                        r["checkpoint"], r["accuracy"], r["auc"], r["loss"])
        if args.plot and results:
            sweep.plot_metrics_vs_epoch(results, args.plot)

    sweep.emit_best_result(args.exp_id, exp_dir)


if __name__ == "__main__":
    main()
