"""Stage 2 entry: VQA instruction fine-tuning.

CLI mirror of the reference entry (Stage2/train_vqa_stage2.py:82-352) with the same flag
names, incl. ``--enable_qlora``, ``--unfreeze_projection_layer``, ``--unfreeze_llm``,
``--train_ve_first_epoch``, ``--resume_qlora_adapter_path``, ``--stage1_projector_path``.
"""

from __future__ import annotations

import os

from projectiontrainer_tpu.core.config import Stage2Config, from_args, parser_for
from projectiontrainer_tpu.data import datasets
from projectiontrainer_tpu.train import setup
from projectiontrainer_tpu.train.trainer_stage2 import Stage2Trainer
from projectiontrainer_tpu.utils.logging import setup_logging


def main(argv=None):
    args = parser_for(Stage2Config, __doc__).parse_args(argv)
    cfg = from_args(Stage2Config, args)
    logger = setup_logging()

    if cfg.resume and cfg.enable_qlora:
        # the restore template must match the checkpoint's packed leaf structure;
        # the saved quant format wins over the config default (advisor r4: the
        # nf4 -> nf4-mirror default flip broke resume of pre-flip checkpoints)
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
        stage1_projector_path=cfg.stage1_projector_path or None, seed=cfg.seed,
        quantize_llm=cfg.enable_qlora,
        quant_method=cfg.quant_method,
    )
    tokenizer = setup.load_tokenizer(cfg.llm_name)

    if cfg.resume_qlora_adapter_path:
        # PEFT-format (a reference run's language_model/ dir or our own exports) or
        # legacy flat pytree — reference resume: Stage2/train_vqa_stage2.py:219
        from projectiontrainer_tpu.checkpoint.export import load_adapter

        params["lora"], loaded_lcfg = load_adapter(cfg.resume_qlora_adapter_path)
        if loaded_lcfg is not None and (
            loaded_lcfg.r != cfg.lora_r or loaded_lcfg.alpha != cfg.lora_alpha
        ):
            logger.warning(
                "adapter_config.json says r=%d alpha=%d but flags request r=%d "
                "alpha=%d — the flags win (scaling alpha/r changes the effective "
                "adapter magnitude)",
                loaded_lcfg.r, loaded_lcfg.alpha, cfg.lora_r, cfg.lora_alpha,
            )
        logger.info("resumed LoRA adapters from %s", cfg.resume_qlora_adapter_path)

    mk = lambda path: datasets.Stage2VQADataset.from_json(
        path, image_root=cfg.image_root, tokenizer=tokenizer, image_size=cfg.img_size,
        max_q_len=cfg.max_q_len, max_a_len=cfg.max_a_len, image_root_2=cfg.image_root_2,
    )
    trainer = Stage2Trainer(
        cfg, vlm_cfg=vlm_cfg, params=params, tokenizer=tokenizer,
        train_dataset=mk(cfg.train_json),
        val_dataset=mk(cfg.val_json) if cfg.val_json else None,
    )
    result = trainer.train()
    logger.info("done: %s", result)
    return result


if __name__ == "__main__":
    main()
