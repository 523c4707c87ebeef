"""Pod launch layer: multi-host bring-up for every training stage.

The reference's L0 is a set of bash launchers wrapping ``torchrun``/``accelerate
launch`` (Stage2/run_vqa_train_stage2.sh:73, Stage0/run_train_vision_encoder_stage0.sh:62
— env-var blocks + per-process spawn). On TPU pods there is no elastic agent: each host
runs ONE process that owns its local chips, and `jax.distributed.initialize` joins them
over a coordinator. This launcher is that bring-up, three ways:

1. **Cloud TPU pod (auto)** — run the same command on every host (e.g. ``gcloud compute
   tpus tpu-vm ssh ... --worker=all --command="projectiontrainer-launch stage2 -- ..."``);
   with no ``--num_processes``, ``jax.distributed.initialize()`` auto-detects the
   coordinator, process count, and process id from the TPU metadata:

       projectiontrainer-launch stage2 -- --train_json ... --output_dir gs://...

2. **Explicit multi-host** — any cluster with shared storage; pass the triple per host:

       projectiontrainer-launch --coordinator host0:9427 --num_processes 2 \
           --process_id $RANK stage1 -- --train_json ...

3. **Local simulation** — N processes x M virtual CPU devices on one machine, joined
   over a localhost coordinator; validates a pod config (sharding, per-host feed,
   collective saves) with zero TPUs:

       projectiontrainer-launch --simulate 2 --devices_per_host 2 stage1 -- ...

Per-host feeder sizing: ``--feeder_procs auto`` (default) sizes the decode+augment
worker-process pool to the host: ``min(cores - 2, 4 x local_chips)`` (measured demand:
stage-0 needs ~8 workers/chip-at-33-img/s on one core each — BENCH host_pipeline row;
4/chip covers stage-1/2, stage-0 pods should pass an explicit count). The computed value
is injected as ``--num_loader_procs`` unless the stage args already set it.
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys

# stage name -> cli module with main(argv) (all parse reference-compatible flags)
STAGES = {
    "stage0": "projectiontrainer_tpu.cli.train_stage0",
    "stage1": "projectiontrainer_tpu.cli.train_stage1",
    "stage2": "projectiontrainer_tpu.cli.train_stage2",
    "cls": "projectiontrainer_tpu.cli.cls_train",
    "experiments": "projectiontrainer_tpu.cli.run_experiments",
}


def _split_argv(argv):
    """Launcher args before the stage name; stage args after (optionally '--')."""
    for i, a in enumerate(argv):
        if a in STAGES:
            rest = argv[i + 1:]
            if rest[:1] == ["--"]:
                rest = rest[1:]
            return argv[:i], a, rest
    return argv, None, []


def _auto_feeder_procs() -> int:
    import multiprocessing

    import jax

    cores = multiprocessing.cpu_count()
    return max(0, min(cores - 2, 4 * len(jax.local_devices())))


def _inject_feeder(stage_argv: list[str], feeder: str) -> list[str]:
    if feeder == "keep" or any(a.startswith("--num_loader_procs") for a in stage_argv):
        return stage_argv
    n = _auto_feeder_procs() if feeder == "auto" else int(feeder)
    return stage_argv + ["--num_loader_procs", str(n)]


def _simulate(args, stage: str, stage_argv: list[str]) -> int:
    """Spawn N local processes with virtual CPU devices over a localhost coordinator."""
    import socket

    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    coordinator = f"127.0.0.1:{s.getsockname()[1]}"
    s.close()

    # sanitize: the axon sitecustomize registers the TPU plugin at interpreter start
    # and would fight over the real chip (same issue as data/feeder.py workers)
    env = {k: v for k, v in os.environ.items() if k != "PALLAS_AXON_POOL_IPS"}
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)  # children set their own device count
    env.setdefault("TOKENIZERS_PARALLELISM", "false")
    # children must import this package even when it's run from a checkout
    pkg_root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    env["PYTHONPATH"] = pkg_root + os.pathsep + env.get("PYTHONPATH", "")

    import tempfile

    # child stdout goes to FILES, not pipes: hosts block at collectives waiting for
    # each other, and a host whose pipe buffer fills while an earlier host is being
    # drained sequentially would deadlock the whole simulation
    logdir = tempfile.mkdtemp(prefix="ptt_launch_sim_")
    procs, logs = [], []
    for pid in range(args.simulate):
        cmd = [
            sys.executable, "-m", "projectiontrainer_tpu.cli.launch",
            "--coordinator", coordinator,
            "--num_processes", str(args.simulate), "--process_id", str(pid),
            "--devices_per_host", str(args.devices_per_host),
            "--feeder_procs", args.feeder_procs,
            stage, "--", *stage_argv,
        ]
        log_path = os.path.join(logdir, f"host{pid}.log")
        logs.append(log_path)
        log_f = open(log_path, "w")
        procs.append((subprocess.Popen(
            cmd, env=env, text=True, stdout=log_f, stderr=subprocess.STDOUT,
        ), log_f))
    rc = 0
    for pid, (p, log_f) in enumerate(procs):
        p.wait()
        log_f.close()
        with open(logs[pid]) as f:
            for line in f:
                print(f"[host {pid}] {line.rstrip()}")
        rc = rc or p.returncode
    return rc


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    parser = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter,
        usage="projectiontrainer-launch [options] "
              f"{{{','.join(STAGES)}}} -- <stage args>",
    )
    parser.add_argument("--coordinator", default=None,
                        help="host:port of process 0 (omit on Cloud TPU pods: "
                             "auto-detected from the TPU metadata)")
    parser.add_argument("--num_processes", type=int, default=None,
                        help="total host processes (omit for single-host or TPU-pod "
                             "auto-detection)")
    parser.add_argument("--process_id", type=int, default=None,
                        help="this host's index in [0, num_processes)")
    parser.add_argument("--simulate", type=int, default=0, metavar="N",
                        help="spawn N local processes with virtual CPU devices each "
                             "(pod dry-run without TPUs)")
    parser.add_argument("--devices_per_host", type=int, default=0,
                        help="virtual CPU devices per process (simulation only)")
    parser.add_argument("--feeder_procs", default="auto",
                        help="'auto' (size to host cores/chips), 'keep' (leave stage "
                             "default), or an integer per-host worker count")
    launcher_argv, stage, stage_argv = _split_argv(argv)
    args = parser.parse_args(launcher_argv)
    if stage is None:
        parser.error(f"missing stage (one of {', '.join(STAGES)})")

    if args.simulate:
        return _simulate(args, stage, stage_argv)

    if args.devices_per_host:  # child of --simulate (or explicit CPU dry-run)
        os.environ["JAX_PLATFORMS"] = "cpu"
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.devices_per_host}"
        )

    import jax

    if args.devices_per_host:
        jax.config.update("jax_platforms", "cpu")

    from projectiontrainer_tpu.parallel import distributed

    if args.num_processes is not None and args.num_processes > 1:
        process_index, process_count = distributed.initialize(
            coordinator_address=args.coordinator,
            num_processes=args.num_processes, process_id=args.process_id,
        )
    elif (args.num_processes is None and args.coordinator is None
          and not args.devices_per_host
          and os.environ.get("JAX_PLATFORMS", "") != "cpu"):
        # Possible Cloud TPU pod: let jax's cluster detection fill coordinator /
        # process count / process id. Plain `gcloud compute tpus tpu-vm` pods are
        # detected via the GCE metadata server (TPU_WORKER_HOSTNAMES /
        # MEGASCALE_COORDINATOR_ADDRESS exist only on GKE/multislice), so attempt
        # the bare call and fall back to single-process when no cluster is found.
        try:
            jax.distributed.initialize()
        except Exception as e:  # single host / no cluster env: normal local run
            print(f"launch: single-process (cluster auto-detect: {e})", flush=True)
        process_index, process_count = jax.process_index(), jax.process_count()
    else:
        process_index, process_count = jax.process_index(), jax.process_count()

    print(f"launch: process {process_index}/{process_count}, "
          f"{len(jax.local_devices())} local / {jax.device_count()} global devices, "
          f"backend={jax.default_backend()}", flush=True)

    stage_argv = _inject_feeder(stage_argv, args.feeder_procs)

    import importlib

    mod = importlib.import_module(STAGES[stage])
    mod.main(stage_argv)
    return 0


if __name__ == "__main__":
    sys.exit(main())
