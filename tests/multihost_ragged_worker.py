"""Worker for the 4-process ragged-gather multi-host test (run via subprocess).

Each of the 4 processes owns 1 virtual CPU device and holds a GENUINELY different
number of local eval rows (3 + 2*pid). Exercises, in order:

1. ``gather_ragged`` — the Stage-0 padded all_gather protocol
   (/root/reference/Stage0/train_vision_encoder_stage0.py:362-411: size exchange ->
   pad -> all_gather -> trim) with per-host counts 3/5/7/9;
2. ``gather_objects`` — ragged pickled example strings (Stage2/trainer.py:654);
3. the collective best-save path: the metric is computed from the GLOBAL gathered
   array (identical on every host), then ``save_best`` runs its collective Orbax
   write twice (improving metric then non-improving) — mismatched decisions across
   hosts would deadlock the collective write.
"""

import json
import os
import sys


def main():
    proc_id = int(sys.argv[1])
    coordinator = sys.argv[2]
    out_json = sys.argv[3]
    workdir = sys.argv[4]

    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ.setdefault("TOKENIZERS_PARALLELISM", "false")

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=coordinator, num_processes=4, process_id=proc_id
    )
    assert jax.process_count() == 4

    import numpy as np

    from projectiontrainer_tpu.parallel import distributed

    # --- 1. ragged array gather: counts 3/5/7/9, rows tagged (pid, row, feature) ---
    n_local = 3 + 2 * proc_id
    local = np.stack([
        np.array([proc_id, i, proc_id * 100 + i], np.int64) for i in range(n_local)
    ])
    global_rows = distributed.gather_ragged(local)
    assert global_rows.shape == (3 + 5 + 7 + 9, 3), global_rows.shape
    # concatenation is in process order with per-host trim (no padding rows leak)
    expect = np.concatenate([
        np.stack([np.array([p, i, p * 100 + i]) for i in range(3 + 2 * p)])
        for p in range(4)
    ])
    assert (global_rows == expect).all(), global_rows

    # --- 2. ragged object gather (validation example strings) ---
    objs = distributed.gather_objects(
        [f"host{proc_id}_example{i}" for i in range(n_local)]
    )
    assert len(objs) == 24
    assert objs == [f"host{p}_example{i}" for p in range(4) for i in range(3 + 2 * p)]

    # --- 3. best-save from the gathered metric (collective Orbax write) ---
    from projectiontrainer_tpu.checkpoint.manager import CheckpointManager

    metric = float(global_rows[:, 2].mean())  # identical on every host by construction
    ckpt = CheckpointManager(os.path.join(workdir, "orbax"), best_mode="max")
    state = {"w": np.full((4,), metric, np.float32)}
    saved_first = ckpt.save_best(metric, state)
    saved_worse = ckpt.save_best(metric - 1.0, state)  # must NOT save, on every host
    distributed.barrier("ragged-test-done")

    with open(out_json, "w") as f:
        json.dump({
            "process": proc_id,
            "gathered_rows": int(global_rows.shape[0]),
            "metric": metric,
            "saved_first": bool(saved_first),
            "saved_worse": bool(saved_worse),
        }, f)
    print("WORKER_OK", proc_id)


if __name__ == "__main__":
    main()
