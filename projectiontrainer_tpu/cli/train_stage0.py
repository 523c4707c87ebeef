"""Stage 0 entry: SigLIP contrastive vision-encoder fine-tuning.

CLI mirror of the reference entry (Stage0/train_vision_encoder_stage0.py:845-897) with
the same flag names (``--model_name``, ``--freeze_layers_ratio``,
``--freeze_text_encoder``, ``--use_online_augmentation``, ...).
"""

from __future__ import annotations

import jax

from projectiontrainer_tpu.checkpoint import hf_import
from projectiontrainer_tpu.core.config import Stage0Config, from_args, parser_for
from projectiontrainer_tpu.data import datasets
from projectiontrainer_tpu.train import setup
from projectiontrainer_tpu.train.trainer_stage0 import Stage0Trainer
from projectiontrainer_tpu.utils.logging import setup_logging


def main(argv=None):
    args = parser_for(Stage0Config, __doc__).parse_args(argv)
    cfg = from_args(Stage0Config, args)
    logger = setup_logging()

    model_cfg, params = hf_import.load_siglip(cfg.model_name)
    tokenizer = setup.load_tokenizer(cfg.model_name)

    samples = datasets.load_manifest(cfg.train_json)
    train_samples, val_samples = datasets.train_val_split(
        samples, cfg.val_split, seed=cfg.seed
    )
    mk = lambda s, aug: datasets.ContrastiveDataset(
        s, image_root=cfg.image_root, tokenizer=tokenizer, image_size=cfg.img_size,
        max_text_len=cfg.max_text_len, image_root_2=cfg.image_root_2,
        augment=aug, seed=cfg.seed,
    )
    train_ds = mk(train_samples, cfg.use_online_augmentation)
    trainer = Stage0Trainer(
        cfg, model_cfg=model_cfg, params=params, tokenizer=tokenizer,
        train_dataset=train_ds,
        val_dataset=mk(val_samples, False) if val_samples else None,
        class_names=train_ds.class_names,
    )
    result = trainer.train()
    logger.info("done: %s", result)
    return result


if __name__ == "__main__":
    main()
