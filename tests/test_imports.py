"""Every module in the package must import cleanly (streamlit/cog/demucs
are optional and gated, so even UI modules import without them)."""

import importlib
import pkgutil

import riffusion_tpu


def test_all_modules_import():
    failures = []
    for mod in pkgutil.walk_packages(riffusion_tpu.__path__, prefix="riffusion_tpu."):
        try:
            importlib.import_module(mod.name)
        except Exception as e:  # noqa: BLE001
            failures.append((mod.name, repr(e)))
    assert not failures, failures


def test_integrations_import():
    importlib.import_module("integrations.baseten")
    importlib.import_module("integrations.cog_riffusion")


def test_oracle_deps_present_in_ci():
    """In CI the torch/transformers value oracles must RUN, not skip: the
    oracle suites `importorskip` these packages, and round 2 shipped a dev
    extra without transformers, so the flagship conversion-correctness tests
    silently vanished from CI. This guard FAILS (not skips) when either
    package is missing under CI."""
    import os

    import pytest

    if not os.environ.get("CI"):
        pytest.skip("guard only enforced in CI")
    import torch  # noqa: F401
    import transformers  # noqa: F401
