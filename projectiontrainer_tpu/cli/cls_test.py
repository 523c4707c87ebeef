"""Single-checkpoint test report: confusion matrix, per-class stats, ROC-AUC, ROC plot.

CLI mirror of cls_evaluate/test.py:39-345.
"""

from __future__ import annotations

import argparse
import json
import os

import jax
import numpy as np

from projectiontrainer_tpu.checkpoint import CheckpointManager
from projectiontrainer_tpu.core.config import ClsConfig
from projectiontrainer_tpu.data import datasets
from projectiontrainer_tpu.eval import metrics as M
from projectiontrainer_tpu.models import classifier as cls_model
from projectiontrainer_tpu.utils.logging import setup_logging


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--exp_dir", type=str, required=True,
                   help="Experiment directory containing orbax/ checkpoints")
    p.add_argument("--checkpoint", type=str, default="best")
    p.add_argument("--test_json", type=str, required=True)
    p.add_argument("--image_root", type=str, required=True)
    p.add_argument("--image_root_2", type=str, default=None)
    p.add_argument("--img_size", type=int, default=384)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--roc_plot", type=str, default=None)
    p.add_argument("--vision_hidden", type=int, default=1024)
    p.add_argument("--vision_layers", type=int, default=24)
    p.add_argument("--vision_heads", type=int, default=16)
    p.add_argument("--patch_size", type=int, default=16)
    args = p.parse_args(argv)
    logger = setup_logging()

    orbax_dir = os.path.join(args.exp_dir, "orbax")
    with open(os.path.join(orbax_dir, f"{args.checkpoint}_metadata.json")) as f:
        meta = json.load(f)
    cfg = ClsConfig(**json.loads(meta["config"]))
    names = cfg.effective_class_names()

    from projectiontrainer_tpu.models import siglip

    if "model_config" in meta:
        # reconstruct the model from the architecture embedded at save time — the
        # reference's vars(args)-in-checkpoint pattern (cls_evaluate/train_utils.py:363,
        # evaluate_experiment.py:88-114); CLI flags are only the legacy fallback
        mc = meta["model_config"]
        vcfg = siglip.VisionConfig(**mc["vision"])
        model_cfg = cls_model.ClassifierConfig(
            vision=vcfg, num_classes=mc["num_classes"],
            num_heads=mc.get("num_heads", 16), dropout_rate=0.0,
        )
    else:
        vcfg = siglip.VisionConfig(
            hidden_size=args.vision_hidden, intermediate_size=args.vision_hidden * 4,
            num_layers=args.vision_layers, num_heads=args.vision_heads,
            image_size=args.img_size, patch_size=args.patch_size, use_head=False,
        )
        model_cfg = cls_model.ClassifierConfig(
            vision=vcfg, num_classes=len(names), dropout_rate=0.0
        )
    params = cls_model.init(jax.random.key(0), model_cfg)
    mgr = CheckpointManager(orbax_dir)
    # params-only restore: the evaluator has no optimizer-state template
    params = mgr.restore_params(args.checkpoint, params)

    ds = datasets.ClassificationDataset(
        datasets.load_manifest(args.test_json), image_root=args.image_root,
        class_names=names, image_size=args.img_size, image_root_2=args.image_root_2,
        handle_abnormal=cfg.handle_abnormal,
        abnormal_source_classes=cfg.abnormal_source_classes,
    )
    fn = jax.jit(lambda p, x: cls_model.forward(p, model_cfg, x))
    logits_all, targets_all = [], []
    for i in range(0, len(ds), args.batch_size):
        batch = [ds[j] for j in range(i, min(i + args.batch_size, len(ds)))]
        pixels = np.stack([b["pixel_values"] for b in batch])
        logits_all.append(np.asarray(fn(params, pixels), np.float32))
        targets_all.append(np.asarray([b["target_indices"] for b in batch]))
    logits = np.concatenate(logits_all)
    targets = np.concatenate(targets_all)
    preds = logits.argmax(-1)
    probs = np.exp(logits - logits.max(-1, keepdims=True))
    probs /= probs.sum(-1, keepdims=True)

    cm = M.confusion_matrix(preds, targets, len(names))
    stats = M.per_class_stats(cm)
    logger.info("accuracy: %.4f", M.accuracy(preds, targets))
    logger.info("confusion matrix:\n%s", cm)
    for i, name in enumerate(names):
        logger.info("%-20s recall=%.3f precision=%.3f specificity=%.3f f1=%.3f",
                    name, stats["recall"][i], stats["precision"][i],
                    stats["specificity"][i], stats["f1"][i])
    logger.info("macro OVR AUC: %.4f", M.macro_ovr_auroc(probs, targets, len(names)))
    try:
        from sklearn.metrics import roc_auc_score
        from sklearn.preprocessing import label_binarize

        y_bin = label_binarize(targets, classes=list(range(len(names))))
        if y_bin.shape[1] == 1:
            y_bin = np.hstack([1 - y_bin, y_bin])
        logger.info("micro OVR AUC: %.4f",
                    roc_auc_score(y_bin, probs, average="micro", multi_class="ovr"))
    except Exception as e:
        logger.warning("micro AUC unavailable: %s", e)

    if args.roc_plot:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        from sklearn.metrics import roc_curve

        fig, ax = plt.subplots(figsize=(7, 7))
        for i, name in enumerate(names):
            mask = (targets == i).astype(int)
            if mask.sum() in (0, len(mask)):
                continue
            fpr, tpr, _ = roc_curve(mask, probs[:, i])
            ax.plot(fpr, tpr, label=name)
        ax.plot([0, 1], [0, 1], "k--", alpha=0.4)
        ax.set_xlabel("FPR")
        ax.set_ylabel("TPR")
        ax.legend()
        fig.savefig(args.roc_plot, dpi=120, bbox_inches="tight")
    return M.accuracy(preds, targets)


if __name__ == "__main__":
    main()
