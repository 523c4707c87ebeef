"""Checkpoint sweeper end-to-end: train a tiny cls experiment, evaluate every saved
checkpoint from metadata-reconstructed models, and emit the BEST_RESULT protocol."""

import io
import os
import pytest

import numpy as np

import jax

from projectiontrainer_tpu import testing as T
from projectiontrainer_tpu.core.config import ClsConfig
from projectiontrainer_tpu.core.mesh import MeshConfig, build_mesh
from projectiontrainer_tpu.data import datasets
from projectiontrainer_tpu.eval import sweep
from projectiontrainer_tpu.models import classifier as cls_model
from projectiontrainer_tpu.train.trainer_cls import ClsTrainer

pytestmark = pytest.mark.slow  # torch/HF parity fixtures dominate the suite runtime


def test_sweep_over_checkpoints(tmp_path):
    root, manifest = T.synthetic_corpus(str(tmp_path), n=12, image_size=32)
    cfg = ClsConfig(
        exp_id="SWEEP", class_names="Pneumonia,Edema,Cardiomegaly,No Finding",
        freeze_mode="Freeze", image_root=root, data_json=manifest,
        output_base_dir=str(tmp_path / "out"), img_size=32, batch_size=4, epochs=4,
        lr=1e-3, num_workers=2, mesh_data=1, disable_wandb=True,
    )
    names = cfg.effective_class_names()
    mcfg = cls_model.ClassifierConfig(
        vision=T.tiny_vision_cfg(), num_classes=len(names), num_heads=4, dropout_rate=0.0
    )
    params = cls_model.init(jax.random.key(0), mcfg)
    samples = datasets.load_manifest(manifest)
    train_s, val_s = datasets.stratified_split(samples, val_ratio=0.25, seed=0)
    mk = lambda s: datasets.ClassificationDataset(
        s, image_root=root, class_names=names, image_size=32
    )
    mesh = build_mesh(MeshConfig(data=1, model=1), devices=jax.devices()[:1])
    trainer = ClsTrainer(cfg, model_cfg=mcfg, params=params,
                         train_dataset=mk(train_s), val_dataset=mk(val_s), mesh=mesh)
    trainer.train()

    exp_dir = os.path.join(cfg.output_base_dir, cfg.exp_id)
    # periodic saves every 2 epochs -> epoch_1, epoch_3
    results = sweep.evaluate_all_checkpoints(exp_dir, mk(val_s))
    assert len(results) == 2
    assert all(np.isfinite(r["accuracy"]) for r in results)

    # best-epoch selection + BEST_RESULT line
    epoch, acc, auc = sweep.best_epoch_from_results(os.path.join(exp_dir, "results.tsv"))
    assert 0 <= epoch < 4
    buf = io.StringIO()
    line = sweep.emit_best_result("SWEEP", exp_dir, stream=buf)
    assert line.startswith("BEST_RESULT\tSWEEP\t")
    assert len(line.split("\t")) == 6

    # plot writes a file
    plot = str(tmp_path / "metrics.png")
    sweep.plot_metrics_vs_epoch(results, plot)
    assert os.path.exists(plot)
