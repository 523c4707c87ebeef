"""Unified Orbax checkpointing with the reference's best/periodic/final semantics.

The reference has four ad-hoc formats (SURVEY §5.4); this manager unifies them: one Orbax
scheme for {params, opt_state, step, metadata} with

- ``save_periodic(epoch)`` gated by ``save_every_n_epochs`` / ``min_save_epoch``
  (reference: Stage0:800-835 flags :886-887),
- ``save_best(metric)`` replacing the previous best (reference:
  cls_evaluate/train_utils.py:341-366, Stage1/projector_trainer.py:288,420),
- full optimizer+schedule state so resume actually works (the reference saves optimizer
  state but never reloads it — SURVEY §5.3; we close that gap),
- interop exporters in checkpoint/export.py for the reference's on-disk formats.
"""

from __future__ import annotations

import atexit
import json
import os
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, *, save_every_n_epochs: int = 1,
                 min_save_epoch: int = 0, best_mode: str = "min",
                 async_save: bool = True):
        """``async_save=True`` (default): the HIGH-FREQUENCY ``save_step`` path
        (``--save_steps`` cadence) returns once the device->host copy is done (safe
        even with donated train states — the next step can reuse the buffers) and
        the serialization/disk writes overlap the following train steps; the next
        save, any restore, and interpreter exit flush the in-flight write. Epoch /
        best / final saves stay blocking: they sit at eval boundaries where a stall
        is cheap, and other readers (evaluators constructing their own manager on
        the same directory, e.g. the sweep) must see them committed the moment the
        call returns. The reference blocks training for every save
        (accelerator.save_state — Stage2/trainer.py:718)."""
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.save_every_n_epochs = save_every_n_epochs
        self.min_save_epoch = min_save_epoch
        self.best_mode = best_mode
        self.async_save = async_save
        self._best_metric: Optional[float] = None
        self._last_step_saved: Optional[int] = None
        # StandardCheckpointer IS an AsyncCheckpointer under the hood; sync behavior
        # comes from waiting immediately after save
        self._ckptr = ocp.StandardCheckpointer()
        atexit.register(self.wait)
        state_file = os.path.join(self.directory, "manager_state.json")
        if os.path.exists(state_file):
            try:
                with open(state_file) as f:
                    self._best_metric = json.load(f).get("best_metric")
            except (ValueError, OSError):
                # torn/empty file from a crashed writer: treat as no prior best
                # rather than aborting resume
                self._best_metric = None

    def _persist_manager_state(self):
        """Single-writer, atomic: every process tracks _best_metric in memory, but
        only host 0 touches the shared file — N concurrent truncate-writes to the
        same path can interleave or leave torn JSON on NFS/gcsfuse. tmp+rename makes
        a crash mid-write leave the old state instead of an empty file."""
        if jax.process_index() != 0:
            return
        path = os.path.join(self.directory, "manager_state.json")
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"best_metric": self._best_metric}, f)
        os.replace(tmp, path)

    @staticmethod
    def _assert_cross_host_consistent(name: str, state):
        """All hosts must be saving the same checkpoint at the same train step — a
        desync here (one host lagging an epoch) would produce a torn checkpoint that
        Orbax happily writes. The reference defends with barriers around saves
        (Stage0/train_vision_encoder_stage0.py:795-798); SURVEY §5.2 prescribes this
        stronger consistency assert for the TPU build."""
        if jax.process_count() <= 1:
            return
        from jax.experimental import multihost_utils

        import zlib

        step = state.get("step") if isinstance(state, dict) else None
        # crc32, NOT hash(): Python's str hash is salted per process, so hash(name)
        # differs across hosts and would trip this assert on every in-sync save
        local = np.array(
            [zlib.crc32(name.encode()) & 0x7FFFFFFF,
             -1 if step is None else int(jax.device_get(step))],
            dtype=np.int64,
        )
        gathered = multihost_utils.process_allgather(local)
        if not (gathered == gathered[0]).all():
            raise RuntimeError(
                f"cross-host checkpoint desync: hosts disagree on (name, step) for "
                f"save '{name}' — got rows {gathered.tolist()}"
            )

    def wait(self):
        """Block until any in-flight async save is fully committed to disk."""
        self._ckptr.wait_until_finished()

    def _save(self, name: str, state, metadata: Optional[dict] = None, *,
              block: bool = True):
        path = os.path.join(self.directory, name)
        self._assert_cross_host_consistent(name, state)
        self.wait()  # at most one save in flight; flush the previous one first
        self._ckptr.save(path, state, force=True)
        if block:
            self.wait()
        if metadata is not None and jax.process_index() == 0:
            with open(os.path.join(self.directory, f"{name}_metadata.json"), "w") as f:
                json.dump(metadata, f, indent=2, default=str)

    def save_periodic(self, epoch: int, state, metadata: Optional[dict] = None) -> bool:
        if epoch < self.min_save_epoch:
            return False
        if (epoch + 1) % self.save_every_n_epochs != 0:
            return False
        self._save(f"epoch_{epoch}", state, metadata)
        return True

    def save_best(self, metric: float, state, metadata: Optional[dict] = None) -> bool:
        metric = float(metric)
        if jax.process_count() > 1:
            # The better/worse decision gates a COLLECTIVE save: if hosts ever
            # disagreed (host-local metric aggregation, a NaN on one host), some
            # would enter the allgather+Orbax collectives and others would proceed
            # to the next train step's collectives — a pod-wide hang. Decide on
            # host 0's metric everywhere; this broadcast is itself collective and
            # runs unconditionally, so the call order stays uniform.
            from jax.experimental import multihost_utils

            metric = float(multihost_utils.broadcast_one_to_all(
                np.asarray(metric, np.float64)))
        better = (
            self._best_metric is None
            or (self.best_mode == "min" and metric < self._best_metric)
            or (self.best_mode == "max" and metric > self._best_metric)
        )
        if not better:
            return False
        self._best_metric = float(metric)
        md = dict(metadata or {})
        md["best_metric"] = self._best_metric
        self._save("best", state, md)
        self._persist_manager_state()
        return True

    def save_final(self, state, metadata: Optional[dict] = None):
        self._save("final", state, metadata)

    def restore(self, name: str, template) -> Any:
        """Restore into the structure/shardings of ``template`` (an abstract or concrete
        state pytree).

        Leaves without a mesh sharding (scalar optimizer counters created eagerly by
        ``tx.init`` sit on a SingleDeviceSharding) are coerced to REPLICATED over the
        mesh inferred from the template's sharded leaves: Orbax restores committed to
        the template's devices, and a state mixing single-device counters with
        mesh-sharded params is rejected by the next jitted train step
        ("incompatible devices") — a restore-only crash that never shows on one
        device and would kill a multi-chip resume."""
        self.wait()  # the target may be the save still in flight
        path = os.path.join(self.directory, name)
        from jax.sharding import NamedSharding, PartitionSpec

        mesh = None
        for leaf in jax.tree_util.tree_leaves(template):
            s = getattr(leaf, "sharding", None)
            if isinstance(s, NamedSharding) and s.mesh.size > 1:
                mesh = s.mesh
                break

        def to_struct(leaf):
            s = ocp.utils.to_shape_dtype_struct(leaf)
            if mesh is not None and not isinstance(
                getattr(leaf, "sharding", None), NamedSharding
            ):
                s = jax.ShapeDtypeStruct(
                    s.shape, s.dtype, sharding=NamedSharding(mesh, PartitionSpec())
                )
            return s

        template = jax.tree.map(to_struct, template)
        return self._ckptr.restore(path, template)

    def restore_params(self, name: str, params_template=None) -> Any:
        """Restore ONLY the params subtree of a saved state — evaluators don't carry
        the optimizer-state template the trainer had (the reference's evaluators
        likewise rebuild from the checkpoint alone — evaluate_experiment.py:88-114).
        The full-state template is built from the checkpoint's own on-disk metadata,
        so any optimizer layout restores; ``params_template`` is unused but kept for
        call-site clarity."""
        del params_template
        self.wait()
        path = os.path.join(self.directory, name)
        meta = self._ckptr.metadata(path).item_metadata.tree

        def to_struct(m):
            return jax.ShapeDtypeStruct(tuple(m.shape), np.dtype(str(m.dtype)))

        template = jax.tree.map(to_struct, meta)
        return self._ckptr.restore(path, template)["params"]

    def detect_quant_method(self) -> Optional[str]:
        """Infer the quantization format of the newest saved state from its on-disk
        leaf names: 'qvalues_block' -> nf4-mirror, 'packed_nf4' -> nf4,
        'qvalues' -> int8, none -> None (dense/bf16 base).

        Resume must rebuild the SAME packed leaf structure the checkpoint holds —
        a config default that has moved since the save (e.g. the r4 'nf4' ->
        'nf4-mirror' flip) would otherwise make the restore template mismatch the
        stored tree (advisor r4). Callers override ``cfg.quant_method`` with this
        before quantizing the freshly imported base weights."""
        self.wait()  # an in-flight async save_step commits its dir in the background
        name = None
        step = self.latest_step()
        if step is not None:
            name = f"step_{step}"
        elif self.latest_epoch() is not None:
            name = f"epoch_{self.latest_epoch()}"
        if name is None:
            return None
        meta = self._ckptr.metadata(os.path.join(self.directory, name)).item_metadata.tree
        keys = {
            str(getattr(path[-1], "key", path[-1]))
            for path, _ in jax.tree_util.tree_flatten_with_path(meta)[0]
        }
        if "qvalues_block" in keys:
            return "nf4-mirror"
        if "packed_nf4" in keys:
            return "nf4"
        if "qvalues" in keys:
            return "int8"
        return None

    def latest_epoch(self) -> Optional[int]:
        epochs = []
        for d in os.listdir(self.directory):
            if d.startswith("epoch_") and d[6:].isdigit():
                epochs.append(int(d[6:]))
        return max(epochs) if epochs else None

    def save_step(self, step: int, state, metadata: Optional[dict] = None):
        """Mid-epoch checkpoint under ``step_K`` (``--save_steps`` cadence). Only the
        newest is kept — the previous step checkpoint is deleted after a successful
        save, bounding disk for long runs. Epoch checkpoints are untouched."""
        import shutil

        # self-tracked, NOT latest_step(): the previous async save commits (dir
        # rename) in a background thread, so a directory scan taken now may miss it
        # and skip the prune (observed with back-to-back fast steps)
        if self._last_step_saved is None:
            self._last_step_saved = self.latest_step()
        prev = self._last_step_saved
        # async (when enabled): the in-flight write overlaps the next train steps;
        # the state snapshot is host-copied before _save returns, so the trainer's
        # donated buffers may be reused immediately. The wait() at the head of
        # _save commits `prev` before the rmtree below can touch it.
        self._save(f"step_{step}", state, metadata, block=not self.async_save)
        self._last_step_saved = step
        # Directory mutation must be single-writer: concurrent rmtree from every
        # process against the shared checkpoint dir races (and a non-zero process
        # could start deleting before process 0's metadata write lands). Sync so the
        # new save is complete everywhere, then let process 0 alone clean up.
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            multihost_utils.sync_global_devices(f"ckpt_step_{step}_saved")
        if prev is not None and prev != step and jax.process_index() == 0:
            shutil.rmtree(os.path.join(self.directory, f"step_{prev}"),
                          ignore_errors=True)
            old_md = os.path.join(self.directory, f"step_{prev}_metadata.json")
            if os.path.exists(old_md):
                os.remove(old_md)

    def latest_step(self) -> Optional[int]:
        steps = []
        for d in os.listdir(self.directory):
            if d.startswith("step_") and d[5:].isdigit():
                steps.append(int(d[5:]))
        return max(steps) if steps else None

    def has(self, name: str) -> bool:
        return os.path.isdir(os.path.join(self.directory, name))
