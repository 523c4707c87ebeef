"""Stage 0 trainer: SigLIP contrastive fine-tune with zero-shot validation.

Orchestration mirror of ``train_vision_encoder`` (reference:
Stage0/train_vision_encoder_stage0.py:451-842): full-model sigmoid pairwise loss with the
text tower / logit_scale / first-k vision layers frozen; per-epoch zero-shot
classification validation (class prompts encoded once, argmax over logits_per_image);
best-by-accuracy + periodic checkpoints gated by save_every_n_epochs/min_save_epoch.

The reference's padded cross-rank gather of predictions (:362-411) collapses to plain
jnp arrays here: eval batches are globally sharded, predictions come back as one global
array — no manual size-exchange protocol needed on static shapes.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from projectiontrainer_tpu.checkpoint import CheckpointManager
from projectiontrainer_tpu.core.config import Stage0Config
from projectiontrainer_tpu.eval import metrics as M
from projectiontrainer_tpu.models import siglip
from projectiontrainer_tpu.train import common, masks, optim, steps
from projectiontrainer_tpu.utils import MetricLogger, StepProfiler, StepTimer


class Stage0Trainer:
    def __init__(self, cfg: Stage0Config, *, model_cfg: siglip.SiglipConfig, params,
                 tokenizer, train_dataset, val_dataset=None, class_names: Sequence[str] = (),
                 mesh=None, logger: Optional[MetricLogger] = None):
        self.cfg = cfg
        self.model_cfg = model_cfg
        self.tokenizer = tokenizer
        self.train_dataset = train_dataset
        self.val_dataset = val_dataset
        self.class_names = list(class_names)
        self.mesh = mesh if mesh is not None else common.mesh_from_config(cfg)
        self.logger = logger or MetricLogger(
            cfg.output_dir, project=cfg.wandb_project, run_name=cfg.wandb_run_name,
            use_wandb=not cfg.disable_wandb and cfg.wandb_project is not None,
        )
        self.timer = StepTimer()
        self.profiler = StepProfiler(cfg.profile_dir, start_step=cfg.profile_start_step,
                                     num_steps=cfg.profile_num_steps)

        gbs = common.global_batch_size(cfg, self.mesh)
        self.max_train_steps = common.update_steps(
            len(train_dataset), gbs, cfg.gradient_accumulation_steps, cfg.num_epochs
        )

        params, param_shardings = common.place_params(params, self.mesh, cfg)
        labels = masks.stage0_labels(
            params, freeze_text=cfg.freeze_text_encoder,
            freeze_logit_scale=cfg.freeze_logit_scale,
            freeze_layers_ratio=cfg.freeze_layers_ratio,
            num_vision_layers=model_cfg.vision.num_layers,
        )
        self.tx, self.schedule = optim.single_group_optimizer(
            labels, cfg.learning_rate, total_steps=self.max_train_steps,
            warmup_ratio=cfg.warmup_ratio, weight_decay=cfg.weight_decay,
            accum_steps=cfg.gradient_accumulation_steps,
            # stage 0 rounds warmup steps DOWN — int(ratio * max_steps) at
            # Stage0/train_vision_encoder_stage0.py:598, unlike stages 1/2's ceil
            warmup_rounding="floor",
        )
        from projectiontrainer_tpu.core.mesh import DATA_AXIS

        shards = self.mesh.shape[DATA_AXIS] if cfg.local_negatives else 1
        # remat=False: the reference enables gradient checkpointing only in stages 1/2
        # (Stage1/train_projection_stage1.py:216-233), not stage 0, and the benched
        # operating point (batch 16, bench.py --mode stage0) fits without it. Large
        # batches (>= 32) need remat — bench --remat full documents the boundary.
        loss_fn = steps.stage0_loss(
            model_cfg, remat=False, local_negatives_shards=shards,
            compute_dtype=common.compute_dtype_from_config(cfg), mesh=self.mesh,
        )
        self.train_step = steps.make_train_step(
            loss_fn, self.tx, trainable_mask=masks.bool_mask(labels),
            param_shardings=param_shardings,
        )
        self.state = steps.init_state(params, self.tx)

        self.ckpt = CheckpointManager(
            os.path.join(cfg.output_dir, "orbax"),
            save_every_n_epochs=max(1, cfg.save_every_n_epochs),
            min_save_epoch=cfg.min_save_epoch, best_mode="max",
        )
        self.global_step = 0
        self.start_epoch = 0
        self._zero_shot_fn = jax.jit(self._zero_shot_logits)
        if cfg.resume:
            self.resume_latest()

    def resume_latest(self) -> int:
        """Restore params+optimizer+step from the latest epoch checkpoint — true resume
        for the 100-epoch Stage-0 run, which the reference lacks (SURVEY §5.3)."""
        latest = self.ckpt.latest_epoch()
        if latest is None:
            return 0
        self.state = self.ckpt.restore(f"epoch_{latest}", self.state)
        self.start_epoch = latest + 1
        self.global_step = int(self.state["step"])
        self.logger.log({"resumed_from_epoch": latest}, step=self.global_step)
        return self.start_epoch

    # ------------------------------------------------------------------ train

    def train(self) -> dict:
        cfg = self.cfg
        epoch_loss = float("nan")
        for epoch in range(self.start_epoch, cfg.num_epochs):
            loss_sum, n_losses = None, 0
            for batch in common.feed(self.train_dataset, cfg, self.mesh, epoch=epoch):
                model_batch = {k: batch[k] for k in
                               ("pixel_values", "input_ids", "sample_weight", "valid")
                               if k in batch}
                self.profiler.step(self.global_step)
                self.state, loss, aux = self.train_step(
                    self.state, model_batch, jax.random.key(self.global_step)
                )
                self.timer.count(images=batch["pixel_values"].shape[0])
                self.global_step += 1
                loss_sum = loss if loss_sum is None else loss_sum + loss
                n_losses += 1
                if self.global_step % cfg.logging_steps == 0:
                    loss_f = float(loss)  # sync point
                    self.timer.window_end()
                    self.logger.log(
                        {"train/batch_loss": loss_f,
                         "learning_rate": float(self.schedule(
                             self.global_step // cfg.gradient_accumulation_steps)),
                         "train/grad_norm": float(aux["grad_norm"]),
                         **self.timer.summary()},
                        step=self.global_step,
                    )
            epoch_loss = float(loss_sum / n_losses) if n_losses else float("nan")
            self.timer.window_end()
            self.logger.log({"train/epoch_loss": epoch_loss, "epoch": epoch},
                            step=self.global_step)

            if self.val_dataset is not None and len(self.val_dataset) and self.class_names:
                zs = self.validate_zero_shot(epoch)
                if self.ckpt.save_best(zs["accuracy"], self.state, {"epoch": epoch, **zs}):
                    self._export_hf("best_model")
            if cfg.save_every_n_epochs:
                if self.ckpt.save_periodic(epoch, self.state, {"epoch": epoch}):
                    # reference names these 1-indexed: epoch_{N+1} (Stage0:826)
                    self._export_hf(f"epoch_{epoch + 1}")
        self.profiler.close()
        self.ckpt.save_final(self.state)
        return {"train/epoch_loss": epoch_loss, **self.timer.summary()}

    def _export_hf(self, tag: str):
        """HF-format snapshot under output_dir/<tag> — what the reference's downstream
        consumers (Stage-1 --vision_model_name, the t-SNE epoch sweep, cls_evaluate)
        load with from_pretrained (Stage0/train_vision_encoder_stage0.py:800-835)."""
        from projectiontrainer_tpu.checkpoint import export

        # collective gather FIRST (TP-sharded params span non-addressable devices on
        # multi-host; every process must participate), then only rank 0 writes
        params = jax.tree.map(common.to_host, self.state["params"])
        if jax.process_index() != 0:
            return
        src = self.cfg.model_name if os.path.isdir(self.cfg.model_name or "") else None
        export.save_siglip_hf(
            params, self.model_cfg, os.path.join(self.cfg.output_dir, tag), src_dir=src,
        )

    # ------------------------------------------------------------------ zero-shot

    def _zero_shot_logits(self, params, pixel_values, class_text_ids):
        _, img = siglip.vision_forward(params["vision"], self.model_cfg.vision, pixel_values)
        _, txt = siglip.text_forward(params["text"], self.model_cfg.text, class_text_ids)
        img = img / jnp.linalg.norm(img, axis=-1, keepdims=True)
        txt = txt / jnp.linalg.norm(txt, axis=-1, keepdims=True)
        return img @ txt.T * jnp.exp(params["logit_scale"][0]) + params["logit_bias"][0]

    def validate_zero_shot(self, epoch: int) -> dict:
        """Class prompts = the raw class names (the reference encodes the caption-classes
        themselves — Stage0:290-307); prediction = argmax over logits."""
        enc = self.tokenizer(
            self.class_names, padding="max_length", truncation=True,
            max_length=self.cfg.max_text_len,
        )
        class_ids = jnp.asarray(np.asarray(enc["input_ids"], np.int32))
        preds, targets = [], []
        for batch in common.feed(self.val_dataset, self.cfg, self.mesh, epoch=0, shuffle=False):
            valid = common.to_host(batch["valid"]).astype(bool) & common.real_rows(batch)
            logits = self._zero_shot_fn(
                self.state["params"], batch["pixel_values"], class_ids
            )
            pred = common.to_host(jnp.argmax(logits, axis=-1))
            preds.append(pred[valid])
            targets.append(common.to_host(batch["class_idx"])[valid])
        preds = np.concatenate(preds) if preds else np.zeros((0,), np.int32)
        targets = np.concatenate(targets) if targets else np.zeros((0,), np.int32)
        out = M.zero_shot_prf(preds, targets) if len(preds) else {"accuracy": 0.0}
        self.logger.log({f"zero_shot/{k}": v for k, v in out.items()} | {"epoch": epoch},
                        step=self.global_step)
        return out
