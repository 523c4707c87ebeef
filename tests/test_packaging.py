"""Packaging (pyproject.toml): every declared console entry point resolves to an
importable callable, and the wheel ships the C++ pipeline source (VERDICT r2 next #4).
A live `pip install -e . && projectiontrainer-train-stage1 --help` is exercised in CI
setup; this test keeps the entry-point table and the package importable offline."""

import importlib
import os
import tomllib

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _pyproject():
    with open(os.path.join(REPO, "pyproject.toml"), "rb") as f:
        return tomllib.load(f)


def test_console_scripts_resolve():
    scripts = _pyproject()["project"]["scripts"]
    assert len(scripts) >= 15  # one per reference launch surface + launch/serve
    for name, target in scripts.items():
        mod_name, func = target.split(":")
        mod = importlib.import_module(mod_name)
        assert callable(getattr(mod, func)), f"{name} -> {target} not callable"
        # must route through the exit-code shims: mains return result values, and
        # pip's `sys.exit(main())` wrapper would turn those into exit status 1
        assert mod_name.endswith("._scripts"), f"{name} bypasses the exit-code shim"


def test_core_dependencies_declared():
    deps = " ".join(_pyproject()["project"]["dependencies"])
    for pkg in ["jax", "numpy", "optax", "orbax", "Pillow", "opencv", "scipy",
                "safetensors", "tokenizers"]:
        assert pkg in deps, f"{pkg} missing from [project.dependencies]"


def test_native_source_in_package_data():
    data = _pyproject()["tool"]["setuptools"]["package-data"]
    assert any("csrc" in p for p in data.get("projectiontrainer_tpu.runtime", []))
    assert os.path.exists(os.path.join(
        REPO, "projectiontrainer_tpu", "runtime", "csrc", "pipeline.cpp"))
