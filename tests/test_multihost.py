"""2-process multi-host training on virtual CPU devices (VERDICT r1 weak #2).

Spawns two real OS processes, each with 2 virtual CPU devices, joined via
jax.distributed over a localhost coordinator — the closest CPU-only approximation of a
2-host TPU slice. Asserts per-host feeding (each host builds only its addressable
slice), exact schedule accounting, identical replicated losses, and that the eval
decode path (process_allgather) works where np.asarray would raise.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from projectiontrainer_tpu import testing as T

pytestmark = pytest.mark.slow


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_four_process_ragged_gather_and_best_save(tmp_path):
    """4 hosts x 1 device with per-host eval counts 3/5/7/9 through gather_ragged +
    gather_objects + the collective best-save path (VERDICT r2 next #8; reference
    padded-gather semantics: Stage0/train_vision_encoder_stage0.py:362-411)."""
    workdir = str(tmp_path)
    coordinator = f"127.0.0.1:{_free_port()}"
    worker = os.path.join(os.path.dirname(__file__), "multihost_ragged_worker.py")
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    procs, outs = [], []
    for pid in range(4):
        out_json = os.path.join(workdir, f"ragged_{pid}.json")
        outs.append(out_json)
        procs.append(subprocess.Popen(
            [sys.executable, worker, str(pid), coordinator, out_json, workdir],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env,
        ))
    logs = [p.communicate(timeout=600)[0] for p in procs]
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-4000:]}"
    results = [json.load(open(o)) for o in outs]
    for r in results:
        assert r["gathered_rows"] == 24
        assert r["saved_first"] is True and r["saved_worse"] is False
    # the gathered metric is identical on every host (global array semantics)
    assert len({r["metric"] for r in results}) == 1


def test_two_process_stage1_epoch(tmp_path):
    workdir = str(tmp_path)
    T.synthetic_corpus(workdir, n=10, image_size=32)
    coordinator = f"127.0.0.1:{_free_port()}"
    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # workers set their own 2-device flag
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    procs, outs = [], []
    for pid in range(2):
        out_json = os.path.join(workdir, f"result_{pid}.json")
        outs.append(out_json)
        procs.append(subprocess.Popen(
            [sys.executable, worker, str(pid), coordinator, workdir, out_json],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            cwd=os.path.dirname(os.path.dirname(__file__)), env=env,
        ))
    logs = [p.communicate(timeout=900)[0] for p in procs]
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-4000:]}"

    results = [json.load(open(o)) for o in outs]
    for r in results:
        # schedule accounting exact: n=10, gbs=2*4=8, pc=2 -> shard 5, lbs 4 -> 2 steps
        assert r["expected_steps"] == 2
        assert r["actual_steps"] == r["expected_steps"]
        assert np.isfinite(r["epoch_loss"]) and np.isfinite(r["val_loss"])
        assert r["last_word_accuracy"] >= 0  # generation/gather path ran
    # the global batch is identical on both hosts -> replicated losses agree exactly
    assert results[0]["epoch_loss"] == results[1]["epoch_loss"]
    assert results[0]["val_loss"] == results[1]["val_loss"]
    # stage-2 planned bucket feed: plans agree across hosts (QLoRA nf4 base)
    for r in results:
        assert r["s2_actual_steps"] == r["s2_expected_steps"] > 0
        assert np.isfinite(r["s2_epoch_loss"])
    assert results[0]["s2_epoch_loss"] == results[1]["s2_epoch_loss"]
    # FSDP leg: params really sharded over the cross-process data axis, the layout
    # survived the update, and the replicated loss agrees bit-for-bit across hosts
    for r in results:
        assert r["fsdp_sharded"] and r["fsdp_layout_kept"]
        assert np.isfinite(r["fsdp_loss"])
    assert results[0]["fsdp_loss"] == results[1]["fsdp_loss"]
    # FSDP TRAINER leg (advisor r4 #2): the full --fsdp Stage2Trainer ran cross-host
    # including the epoch-boundary reference-layout export; the exported kernel equals
    # the collectively gathered live param on BOTH hosts
    for r in results:
        assert r["fsdp_trainer_sharded"]
        assert np.isfinite(r["fsdp_trainer_loss"])
        assert r["fsdp_export_matches"]
    assert results[0]["fsdp_trainer_loss"] == results[1]["fsdp_trainer_loss"]
