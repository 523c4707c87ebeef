"""AOT memory/collective budget CLI for multi-chip training programs.

Compiles the REAL full-joint ``--fsdp`` stage-2 train step for a target v5e
topology without owning any chips (``jax.experimental.topologies`` AOT — the
actual XLA:TPU compiler; virtual CPU devices as a fallback) and prints one JSON
object: per-device peak HBM, whether the program fits the chip, the sharded state
bytes, and the per-step collective inventory (all-gather / reduce-scatter /
all-reduce counts x bytes). This is the capacity-planning surface for BASELINE
config #4 — the Gemma3-4B full-joint recipe whose fp32 Adam state (~32 GB) can
never be executed on one chip (reference recipe:
Stage2/train_vqa_stage2.py:121-134, Stage2/trainer.py:189-246).

Notes for the AOT path on a machine without local TPU metadata: export
``TPU_WORKER_HOSTNAMES=localhost TPU_WORKER_ID=0 TPU_SKIP_MDS_QUERY=1`` and clear
a stale ``/tmp/libtpu_lockfile`` if a prior run crashed. A 4B compile takes
~13-17 min. Recorded sweep results live in ``BUDGET_4B.json`` at the repo root.
"""

from __future__ import annotations

import argparse
import json


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--n_devices", type=int, default=8)
    p.add_argument("--model_axis", type=int, default=1,
                   help="TP size; data axis = n_devices / model_axis. TP>1 makes "
                        "the chunked CE vocab-parallel and halves the table-grad "
                        "buffers that dominate the 4B step's temp memory")
    p.add_argument("--batch_per_device", type=int, default=2)
    p.add_argument("--q_len", type=int, default=256)
    p.add_argument("--a_len", type=int, default=1024)
    p.add_argument("--accum_steps", type=int, default=16)
    p.add_argument("--master_dtype", choices=["fp32", "bf16"], default="fp32")
    p.add_argument("--remat", type=str, default="full")
    p.add_argument("--logits_chunk", type=int, default=64)
    p.add_argument("--preset", choices=["gemma3-4b", "small-test"],
                   default="gemma3-4b",
                   help="small-test compiles a reduced-width model through the "
                        "identical pipeline in seconds — a smoke of the budget "
                        "surface itself (CI uses it via tests/test_budget.py)")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    # XLA parses XLA_FLAGS once per process: request the virtual device count
    # BEFORE anything initializes jax, so the CPU fallback actually has
    # n_devices when the AOT topology is unavailable (the AOT path is
    # unaffected — it builds a topology-only client)
    import os

    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={args.n_devices}"
        )
    from projectiontrainer_tpu.parallel import budget as B

    vlm_cfg = B.small_test_vlm_cfg() if args.preset == "small-test" else None
    out = B.full_joint_budget(
        vlm_cfg,
        n_devices=args.n_devices, model_axis=args.model_axis,
        batch_per_device=args.batch_per_device, q_len=args.q_len,
        a_len=args.a_len, accum_steps=args.accum_steps,
        master_dtype=args.master_dtype, remat=args.remat,
        logits_chunk=args.logits_chunk,
    )
    print(json.dumps(out, indent=1))
    return out


if __name__ == "__main__":
    main()
