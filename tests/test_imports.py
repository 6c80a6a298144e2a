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
