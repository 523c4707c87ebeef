"""Rank-aware metric logging: stdout + JSONL + optional W&B.

Replaces the reference's Accelerate/W&B wiring (Stage1/accelerator_setup.py:19-54,
Stage0:86-102). Metric names match the reference (train/batch_loss, train/epoch_loss,
learning_rate, val/loss, validation/last_word_accuracy, ... — SURVEY §5.5). Every metric
is also appended to ``metrics.jsonl`` so zero-egress TPU pods keep a full record; W&B
attaches only if the package is importable and not disabled.
"""

from __future__ import annotations

import json
import logging
import os
import time
from typing import Mapping, Optional

import jax


def setup_logging(name: str = "projectiontrainer_tpu") -> logging.Logger:
    """INFO on process 0, WARNING elsewhere (reference: accelerator_setup.py:19-25)."""
    logger = logging.getLogger(name)
    if not logger.handlers:
        handler = logging.StreamHandler()
        handler.setFormatter(
            logging.Formatter("%(asctime)s [%(levelname)s] %(name)s: %(message)s")
        )
        logger.addHandler(handler)
    logger.setLevel(logging.INFO if jax.process_index() == 0 else logging.WARNING)
    return logger


class MetricLogger:
    def __init__(self, output_dir: Optional[str] = None, *, project: Optional[str] = None,
                 run_name: Optional[str] = None, use_wandb: bool = False,
                 config: Optional[dict] = None):
        self.is_main = jax.process_index() == 0
        self.logger = setup_logging()
        self._jsonl = None
        self._wandb = None
        if self.is_main and output_dir:
            os.makedirs(output_dir, exist_ok=True)
            self._jsonl = open(os.path.join(output_dir, "metrics.jsonl"), "a")
        if self.is_main and use_wandb:
            try:
                import wandb

                self._wandb = wandb.init(
                    project=project, name=run_name, config=config or {}, mode="offline"
                    if os.environ.get("WANDB_MODE", "offline") == "offline" else "online",
                )
            except Exception as e:  # zero-egress pods: degrade to JSONL silently
                self.logger.warning("wandb unavailable (%s); logging to JSONL only", e)

    def log(self, metrics: Mapping[str, float], step: Optional[int] = None):
        if not self.is_main:
            return
        payload = {k: float(v) for k, v in metrics.items()}
        if step is not None:
            payload["step"] = int(step)
        payload["time"] = time.time()
        if self._jsonl:
            self._jsonl.write(json.dumps(payload) + "\n")
            self._jsonl.flush()
        if self._wandb:
            self._wandb.log(payload, step=step)
        msg = " ".join(f"{k}={v:.6g}" for k, v in payload.items() if k != "time")
        self.logger.info(msg)

    def log_gradient_stats(self, grads: Mapping, step: Optional[int] = None,
                           prefix: str = "gradients"):
        """Per-parameter gradient norms + histograms — the ``wandb.watch`` equivalent
        (reference: Stage1/train_projection_stage1.py:359-370 watches the projector).
        Scalar norms go to every sink; full histograms go to W&B when attached and a
        compact (min/max/mean/std) summary to JSONL."""
        if not self.is_main:
            return
        import numpy as np

        from projectiontrainer_tpu.core.pytree import path_str

        scalars = {}
        hists = {}
        for path, leaf in jax.tree_util.tree_leaves_with_path(grads):
            name = f"{prefix}/{path_str(path)}"
            arr = np.asarray(leaf, dtype=np.float32)
            scalars[f"{name}.norm"] = float(np.linalg.norm(arr))
            scalars[f"{name}.mean"] = float(arr.mean())
            scalars[f"{name}.std"] = float(arr.std())
            hists[name] = arr
        self.log(scalars, step=step)
        if self._wandb:
            import wandb

            self._wandb.log({k: wandb.Histogram(v.ravel()) for k, v in hists.items()},
                            step=step)

    def close(self):
        if self._jsonl:
            self._jsonl.close()
        if self._wandb:
            self._wandb.finish()
