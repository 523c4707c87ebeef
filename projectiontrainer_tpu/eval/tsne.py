"""t-SNE embedding analysis of SigLIP vision features by class.

Equivalent of Stage1/visualization/tsne_embedding_analysis.py: filter a manifest to a
class subset, balance to the minimum class count (:42-60), embed through the vision
tower's pooled output (:95-97), 2-D t-SNE (sklearn replaces the reference's
MulticoreTSNE — analysis-side only), per-class scatter plot; optional projector-space
embedding (present-but-commented-out in the reference :138-180).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from projectiontrainer_tpu.models import projector as proj_mod
from projectiontrainer_tpu.models import siglip


def balance_classes(samples: Sequence[dict], classes: Sequence[str], *, seed: int = 42,
                    label_key: str = "normal_caption") -> list[dict]:
    """Filter to ``classes`` and subsample each to the minimum class count."""
    rng = np.random.default_rng(seed)
    by_class = {c: [s for s in samples if str(s.get(label_key, "")).strip() == c]
                for c in classes}
    n_min = min((len(v) for v in by_class.values() if v), default=0)
    out = []
    for c, group in by_class.items():
        idx = rng.choice(len(group), size=min(n_min, len(group)), replace=False)
        out.extend(group[i] for i in idx)
    return out


def compute_image_embeddings(params, cfg: siglip.VisionConfig, batches,
                             *, projector_params=None) -> np.ndarray:
    """Pooled vision embeddings (MAP head), optionally pushed through the projector
    (mean over patch tokens then)."""
    fn = jax.jit(lambda p, x: siglip.vision_forward(p, cfg, x))
    out = []
    for pixel_values in batches:
        hidden, pooled = fn(params, jnp.asarray(pixel_values))
        if projector_params is not None:
            projected = proj_mod.forward(projector_params, hidden[:, 1:, :])
            out.append(np.asarray(projected.mean(axis=1), np.float32))
        else:
            emb = pooled if pooled is not None else hidden.mean(axis=1)
            out.append(np.asarray(emb, np.float32))
    return np.concatenate(out)


def tsne_2d(embeddings: np.ndarray, *, seed: int = 42, perplexity: float = 30.0) -> np.ndarray:
    from sklearn.manifold import TSNE

    perplexity = min(perplexity, max(2.0, (len(embeddings) - 1) / 3))
    return TSNE(n_components=2, random_state=seed, perplexity=perplexity,
                init="pca").fit_transform(embeddings)


def plot_tsne(points: np.ndarray, labels: Sequence[str], out_path: str,
              *, title: str = "t-SNE of SigLIP embeddings"):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(8, 8))
    for c in sorted(set(labels)):
        mask = np.asarray([l == c for l in labels])
        ax.scatter(points[mask, 0], points[mask, 1], s=12, alpha=0.7, label=c)
    ax.legend()
    ax.set_title(title)
    fig.savefig(out_path, dpi=120, bbox_inches="tight")
    plt.close(fig)
