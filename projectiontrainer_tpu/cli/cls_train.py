"""cls_evaluate training entry: attention-probe classifier experiments.

CLI mirror of cls_evaluate/train.py:53-143 with the same flags (``--exp_id``,
``--class_names``, ``--freeze_mode {Freeze,Unfreeze,1EpochUnfreeze}``,
``--handle_abnormal``, ``--filter_no_finding``, ``--lr``/``--bb_lr`` discriminative LRs).
"""

from __future__ import annotations

import jax

from projectiontrainer_tpu.checkpoint import hf_import
from projectiontrainer_tpu.core.config import ClsConfig, from_args, parser_for
from projectiontrainer_tpu.data import datasets
from projectiontrainer_tpu.models import classifier as cls_model
from projectiontrainer_tpu.train.trainer_cls import ClsTrainer
from projectiontrainer_tpu.utils.logging import setup_logging


def build_trainer(cfg: ClsConfig, *, vision_cfg=None, vision_params=None) -> ClsTrainer:
    logger = setup_logging()
    names = cfg.effective_class_names()

    if vision_cfg is None:
        siglip_cfg, siglip_params = hf_import.load_siglip(cfg.vision_model_name)
        vision_cfg = siglip_cfg.vision
        vision_params = siglip_params["vision"]

    model_cfg = cls_model.ClassifierConfig(
        vision=vision_cfg, num_classes=len(names), dropout_rate=cfg.dropout_rate
    )
    params = cls_model.init(jax.random.key(cfg.seed), model_cfg)
    if vision_params is not None:
        params["vision"] = vision_params

    samples = datasets.load_manifest(cfg.data_json)
    if cfg.filter_no_finding:
        samples = [s for s in samples
                   if str(s.get("normal_caption", "")).strip() != "No Finding"]
    train_s, val_s = datasets.stratified_split(samples, val_ratio=0.1, seed=cfg.seed)
    mk = lambda s: datasets.ClassificationDataset(
        s, image_root=cfg.image_root, class_names=names, image_size=cfg.img_size,
        image_root_2=cfg.image_root_2, handle_abnormal=cfg.handle_abnormal,
        abnormal_source_classes=cfg.abnormal_source_classes,
    )
    logger.info("experiment %s: classes=%s train=%d val=%d freeze=%s",
                cfg.exp_id, names, len(train_s), len(val_s), cfg.freeze_mode)
    return ClsTrainer(
        cfg, model_cfg=model_cfg, params=params,
        train_dataset=mk(train_s), val_dataset=mk(val_s),
    )


def main(argv=None):
    args = parser_for(ClsConfig, __doc__).parse_args(argv)
    cfg = from_args(ClsConfig, args)
    trainer = build_trainer(cfg)
    return trainer.train()


if __name__ == "__main__":
    main()
