"""Stage 1 entry: projector alignment training.

CLI mirror of the reference entry (Stage1/train_projection_stage1.py:136-408) with the
same flag names; launch: ``python -m projectiontrainer_tpu.cli.train_stage1 --image_root
... --train_json ... --vision_model_name <local dir> --llm_name <local dir>``.
"""

from __future__ import annotations

from projectiontrainer_tpu.core.config import Stage1Config, from_args, parser_for
from projectiontrainer_tpu.data import datasets
from projectiontrainer_tpu.train import setup
from projectiontrainer_tpu.train.trainer_stage1 import Stage1Trainer
from projectiontrainer_tpu.utils.logging import setup_logging


def main(argv=None):
    args = parser_for(Stage1Config, __doc__).parse_args(argv)
    cfg = from_args(Stage1Config, args)
    logger = setup_logging()

    if cfg.resume and cfg.enable_qlora:
        # saved quant format wins over the config default — the restore template
        # must match the checkpoint's packed leaf structure (advisor r4)
        import os

        from projectiontrainer_tpu.checkpoint import CheckpointManager

        saved = CheckpointManager(
            os.path.join(cfg.output_dir, "orbax")).detect_quant_method()
        if saved is not None and saved != cfg.quant_method:
            logger.warning(
                "checkpoint in %s was saved with quant_method=%s; overriding the "
                "configured %s so the resume template matches the stored tree",
                cfg.output_dir, saved, cfg.quant_method,
            )
            cfg.quant_method = saved

    vlm_cfg, params, _ = setup.build_vlm(
        cfg.vision_model_name, cfg.llm_name,
        expansion_factor=cfg.expansion_factor, seed=cfg.seed,
        quantize_llm=cfg.enable_qlora,
        quant_method=cfg.quant_method,
    )
    tokenizer = setup.load_tokenizer(cfg.llm_name)

    samples = datasets.load_manifest(cfg.train_json)
    if cfg.val_json:
        val_samples = datasets.load_manifest(cfg.val_json)
        train_samples = samples
    elif cfg.train_val_split > 0:
        train_samples, val_samples = datasets.train_val_split(
            samples, cfg.train_val_split, seed=cfg.seed
        )
    else:
        train_samples, val_samples = samples, []

    mk = lambda s: datasets.Stage1PairDataset(
        s, image_root=cfg.image_root, tokenizer=tokenizer, image_size=cfg.img_size,
        max_length=cfg.max_caption_len, image_root_2=cfg.image_root_2,
    )
    trainer = Stage1Trainer(
        cfg, vlm_cfg=vlm_cfg, params=params, tokenizer=tokenizer,
        train_dataset=mk(train_samples),
        val_dataset=mk(val_samples) if val_samples else None,
    )
    logger.info("starting stage-1 training: %d train / %d val samples",
                len(train_samples), len(val_samples))
    result = trainer.train()
    logger.info("done: %s", result)
    return result


if __name__ == "__main__":
    main()
