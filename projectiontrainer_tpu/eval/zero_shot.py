"""Zero-shot SigLIP classification (no trained head).

Equivalent of cls_evaluate/cls_without_head (reference: classifier.py:15-93,
utils.py:9-256): score each image against class prompts via ``logits_per_image``
softmax; accuracy against (possibly comma-separated multi-label) ground truth.
Prompt templates match the reference's three styles (utils.py:120-126).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from projectiontrainer_tpu.models import siglip

PROMPT_TEMPLATES = {
    "xray": "This X-ray shows {label}.",
    "photo": "This is a photo of {label}.",
    "plain": "{label}",
}


def build_prompts(class_names: Sequence[str], template: str = "xray") -> list[str]:
    tmpl = PROMPT_TEMPLATES.get(template, template)
    return [tmpl.format(label=c) for c in class_names]


class ZeroShotClassifier:
    def __init__(self, cfg: siglip.SiglipConfig, params, tokenizer, class_names,
                 *, template: str = "xray", max_text_len: int = 64):
        self.cfg = cfg
        self.params = params
        self.class_names = list(class_names)
        prompts = build_prompts(class_names, template)
        enc = tokenizer(prompts, padding="max_length", truncation=True,
                        max_length=max_text_len)
        self.class_ids = jnp.asarray(np.asarray(enc["input_ids"], np.int32))
        self._fn = jax.jit(self._logits)

    def _logits(self, params, pixel_values):
        _, img = siglip.vision_forward(params["vision"], self.cfg.vision, pixel_values)
        _, txt = siglip.text_forward(params["text"], self.cfg.text, self.class_ids)
        img = img / jnp.linalg.norm(img, axis=-1, keepdims=True)
        txt = txt / jnp.linalg.norm(txt, axis=-1, keepdims=True)
        return img @ txt.T * jnp.exp(params["logit_scale"][0]) + params["logit_bias"][0]

    def predict(self, pixel_values) -> tuple[np.ndarray, np.ndarray]:
        """Returns (probs [B, C], predicted class indices [B])."""
        logits = self._fn(self.params, pixel_values)
        probs = np.asarray(jax.nn.softmax(logits, axis=-1))
        return probs, probs.argmax(-1)

    def evaluate(self, batches, *, label_key: str = "class_idx") -> dict:
        preds, targets = [], []
        for batch in batches:
            _, p = self.predict(batch["pixel_values"])
            preds.append(p)
            targets.append(np.asarray(batch[label_key]))
        preds = np.concatenate(preds)
        targets = np.concatenate(targets)
        return {"accuracy": float((preds == targets).mean()), "n": int(len(preds))}


def multi_label_accuracy(predicted_labels: Sequence[str],
                         ground_truth: Sequence[str]) -> float:
    """The reference's comma-separated GT convention: a prediction is correct if it
    matches ANY of the comma-separated ground-truth labels (utils.py:170-200)."""
    hits = 0
    for pred, gt in zip(predicted_labels, ground_truth):
        gt_set = {g.strip().lower() for g in str(gt).split(",")}
        hits += int(pred.strip().lower() in gt_set)
    return hits / max(1, len(predicted_labels))
