"""cls_evaluate trainer: attention-probe classifier over the SigLIP backbone.

Orchestration mirror of ``run_training_loop`` (reference:
cls_evaluate/train_utils.py:261-398):

- freeze modes {Freeze, Unfreeze, 1EpochUnfreeze} -> mask variants (1EpochUnfreeze
  trains the backbone in epoch 0 only — the reference's dynamic freeze :286-308);
- discriminative LRs: head at ``lr``, backbone at ``bb_lr`` (:219-259);
- per-epoch eval: accuracy + macro one-vs-rest AUROC (:73-92);
- ``results.tsv`` per-epoch metric log (:269-281,370-379), best checkpoint replaced in
  place, periodic every-2-epochs saves with config metadata embedded (:341-396);
- optional two-way multi-label loss variant (train_twoway_loss.py).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np

from projectiontrainer_tpu.checkpoint import CheckpointManager
from projectiontrainer_tpu.core.config import ClsConfig
from projectiontrainer_tpu.eval import metrics as M
from projectiontrainer_tpu.models import classifier as cls_model
from projectiontrainer_tpu.train import common, masks, optim, steps
from projectiontrainer_tpu.utils import MetricLogger, StepProfiler, StepTimer


class ClsTrainer:
    def __init__(self, cfg: ClsConfig, *, model_cfg: cls_model.ClassifierConfig, params,
                 train_dataset, val_dataset=None, mesh=None,
                 logger: Optional[MetricLogger] = None):
        self.cfg = cfg
        self.model_cfg = model_cfg
        self.train_dataset = train_dataset
        self.val_dataset = val_dataset
        self.mesh = mesh if mesh is not None else common.mesh_from_config(cfg)
        self.exp_dir = os.path.join(cfg.output_base_dir, cfg.exp_id)
        os.makedirs(self.exp_dir, exist_ok=True)
        self.logger = logger or MetricLogger(self.exp_dir)
        self.timer = StepTimer()
        self.profiler = StepProfiler(cfg.profile_dir, start_step=cfg.profile_start_step,
                                     num_steps=cfg.profile_num_steps)

        gbs = common.global_batch_size(cfg, self.mesh)
        self.max_train_steps = common.update_steps(
            len(train_dataset), gbs, cfg.gradient_accumulation_steps, cfg.epochs
        )

        params, param_shardings = common.place_params(params, self.mesh, cfg)
        self._steps = {}
        for frozen in {True, False} if cfg.freeze_mode == "1EpochUnfreeze" else {cfg.freeze_mode == "Freeze"}:
            labels = masks.classifier_labels(params, freeze_vision=frozen)
            tx, schedule = optim.discriminative_optimizer(
                labels, head_lr=cfg.lr, backbone_lr=cfg.bb_lr,
                total_steps=self.max_train_steps, weight_decay=cfg.weight_decay,
                accum_steps=cfg.gradient_accumulation_steps,
            )
            loss_fn = steps.classifier_loss(
                model_cfg, multilabel=cfg.multilabel_two_way,
                compute_dtype=common.compute_dtype_from_config(cfg),
            )
            self._steps[frozen] = (
                steps.make_train_step(
                    loss_fn, tx, donate=False, trainable_mask=masks.bool_mask(labels),
                    param_shardings=param_shardings,
                ),
                tx, schedule,
            )
        first_frozen = self._epoch_frozen(0)
        _, self.tx, self.schedule = self._steps[first_frozen]
        self.state = steps.init_state(params, self.tx)
        self._logits_fn = jax.jit(
            lambda p, pix: cls_model.forward(p, model_cfg, pix)
        )
        self.ckpt = CheckpointManager(
            os.path.join(self.exp_dir, "orbax"), save_every_n_epochs=2, best_mode="max"
        )
        self.global_step = 0
        self.start_epoch = 0
        if cfg.resume:
            latest = self.ckpt.latest_epoch()
            if latest is not None:
                # periodic checkpoints from epoch >= 1 use the post-swap optimizer under
                # 1EpochUnfreeze; restore into the matching template
                _, tx_latest, _ = self._steps[self._epoch_frozen(latest)]
                if tx_latest is not self.tx:
                    self.state = steps.init_state(self.state["params"], tx_latest)
                    self.tx = tx_latest
                self.state = self.ckpt.restore(f"epoch_{latest}", self.state)
                self.start_epoch = latest + 1
                self.global_step = int(self.state["step"])
        self.results_tsv = os.path.join(self.exp_dir, "results.tsv")
        if jax.process_index() == 0 and not os.path.exists(self.results_tsv):
            with open(self.results_tsv, "w") as f:
                f.write("Epoch\tTrain Loss\tVal Loss\tVal Acc\tVal AUC\n")

    def _model_config_dict(self) -> dict:
        """Model architecture embedded in checkpoint metadata so downstream evaluators
        can reconstruct the model without the original script args (the reference
        stores vars(args) inside .pth for this — cls_evaluate/train_utils.py:363)."""
        import dataclasses

        return {
            "vision": dataclasses.asdict(self.model_cfg.vision),
            "num_classes": self.model_cfg.num_classes,
            "num_heads": self.model_cfg.num_heads,
            "dropout_rate": self.model_cfg.dropout_rate,
        }

    def _epoch_frozen(self, epoch: int) -> bool:
        if self.cfg.freeze_mode == "Freeze":
            return True
        if self.cfg.freeze_mode == "Unfreeze":
            return False
        return epoch != 0  # 1EpochUnfreeze: backbone trains only in epoch 0

    # ------------------------------------------------------------------ train

    def train(self) -> dict:
        cfg = self.cfg
        best = None
        for epoch in range(self.start_epoch, cfg.epochs):
            frozen = self._epoch_frozen(epoch)
            step_fn, tx, _ = self._steps[frozen]
            if tx is not self.tx:
                # 1EpochUnfreeze boundary: rebuild opt_state for the frozen-backbone
                # mask but KEEP the head group's Adam moments/counts — the reference
                # keeps one AdamW across the requires_grad flip (train_utils.py:286-308)
                self.state = steps.swap_optimizer(self.state, tx)
                self.tx = tx
            loss_sum, n_losses = None, 0
            last_grad_norm = None
            for batch in common.feed(self.train_dataset, cfg, self.mesh, epoch=epoch):
                self.profiler.step(self.global_step)
                self.state, loss, aux = step_fn(
                    self.state, batch, jax.random.key(self.global_step)
                )
                self.timer.count(images=batch["pixel_values"].shape[0])
                self.global_step += 1
                loss_sum = loss if loss_sum is None else loss_sum + loss
                n_losses += 1
                last_grad_norm = aux["grad_norm"]
            train_loss = float(loss_sum / n_losses) if n_losses else float("nan")
            grad_norm = float(last_grad_norm) if last_grad_norm is not None else float("nan")
            self.timer.window_end()

            val_loss, val_acc, val_auc = float("nan"), float("nan"), float("nan")
            meta = {"epoch": epoch, "config": cfg.to_json(),
                    "model_config": self._model_config_dict()}
            if self.val_dataset is not None and len(self.val_dataset):
                val_loss, val_acc, val_auc = self.evaluate()
                if self.ckpt.save_best(val_auc if np.isfinite(val_auc) else val_acc,
                                       self.state, meta):
                    best = (epoch, val_acc, val_auc)
            self.ckpt.save_periodic(epoch, self.state, meta)

            self.logger.log(
                {"train/epoch_loss": train_loss, "val/loss": val_loss,
                 "val/accuracy": val_acc, "val/auc": val_auc,
                 "train/grad_norm": grad_norm, "epoch": epoch},
                step=self.global_step,
            )
            if jax.process_index() == 0:
                with open(self.results_tsv, "a") as f:
                    f.write(f"{epoch}\t{train_loss:.6f}\t{val_loss:.6f}\t{val_acc:.6f}\t{val_auc:.6f}\n")
        self.profiler.close()
        return {"best": best, **self.timer.summary()}

    # ------------------------------------------------------------------ eval

    def evaluate(self, dataset=None) -> tuple[float, float, float]:
        from projectiontrainer_tpu.train.losses import softmax_ce_loss, two_way_multilabel_loss

        dataset = dataset if dataset is not None else self.val_dataset
        target_key = "targets" if self.cfg.multilabel_two_way else "target_indices"
        all_logits, all_targets = [], []
        for batch in common.feed(dataset, self.cfg, self.mesh, epoch=0, shuffle=False):
            logits = self._logits_fn(self.state["params"], batch["pixel_values"])
            keep = common.real_rows(batch)  # drop straggler-batch filler rows
            all_logits.append(common.to_host(logits).astype(np.float32)[keep])
            all_targets.append(common.to_host(batch[target_key])[keep])
        logits = np.concatenate(all_logits)
        targets = np.concatenate(all_targets)
        if self.cfg.multilabel_two_way:
            # multi-label: loss only, like the reference's two-way evaluate
            # (train_twoway_loss.py:290-320 — argmax accuracy is not meaningful)
            loss = float(two_way_multilabel_loss(logits, targets))
            return loss, float("nan"), float("nan")
        loss = float(softmax_ce_loss(logits, targets))
        probs = np.exp(logits - logits.max(-1, keepdims=True))
        probs = probs / probs.sum(-1, keepdims=True)
        acc = M.accuracy(logits.argmax(-1), targets)
        auc = M.macro_ovr_auroc(probs, targets)
        return loss, acc, auc
