"""Console-script shims for [project.scripts] in pyproject.toml.

The CLI ``main()`` functions return their results (training metrics dicts, generated
strings, accuracy floats) so tests and callers can assert on them — but pip's generated
wrappers run ``sys.exit(main())``, which would turn any truthy return into exit status 1
(and print its repr) on a SUCCESSFUL run. Each shim swallows the value and returns 0;
failures still propagate as exceptions (exit 1 with a traceback).
"""

from __future__ import annotations

import importlib


def _run(module: str):
    importlib.import_module(f"projectiontrainer_tpu.cli.{module}").main()
    return 0


def train_stage0():
    return _run("train_stage0")


def train_stage1():
    return _run("train_stage1")


def train_stage2():
    return _run("train_stage2")


def infer_stage1():
    return _run("infer_stage1")


def infer_vqa():
    return _run("infer_vqa_stage2")


def infer_generation():
    return _run("infer_generation")


def balanced_sample():
    return _run("balanced_sample")


def tsne():
    return _run("tsne_analysis")


def zero_shot():
    return _run("zero_shot_classify")


def cls_train():
    return _run("cls_train")


def cls_test():
    return _run("cls_test")


def cls_evaluate():
    return _run("cls_evaluate_experiment")


def run_experiments():
    return _run("run_experiments")


def serve():
    return _run("serve")


def budget():
    return _run("budget")


def launch():
    # launch.main returns a real exit code (nonzero when a simulated host fails)
    from projectiontrainer_tpu.cli import launch as mod

    return mod.main()
