"""
Test configuration: force the CPU backend with 8 virtual devices so sharding
tests exercise a real multi-device mesh without TPU hardware, and keep test
runs independent of whatever accelerator the host has.

Must run before jax is imported anywhere, hence the env mutation at module
import time (pytest imports conftest first).
"""

import os

os.environ.setdefault("RIFFUSION_TEST_DEVICE", "cpu")
# The AOT executable store (riffusion_tpu/aot.py) is a deploy-time artifact;
# tests must not litter ~/.cache with CPU executables for every tiny program
# shape. The dedicated tests (test_aot.py) opt back in with a tmp store dir.
os.environ.setdefault("RIFFUSION_TPU_NO_AOT", "1")
if os.environ["RIFFUSION_TEST_DEVICE"] == "cpu":
    # Override any ambient accelerator platform (e.g. a tunneled TPU whose
    # PJRT plugin a sitecustomize registers at interpreter start — env vars
    # alone are too late there, hence the config.update).
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")

# The suite is compile-bound on CPU (every test program is compiled by
# XLA:CPU/LLVM); a persistent compilation cache makes warm re-runs and CI
# (which persists the dir via actions/cache) several times faster. Opt out
# with RIFFUSION_TPU_NO_COMPILE_CACHE=1.
if not os.environ.get("RIFFUSION_TPU_NO_COMPILE_CACHE"):
    import jax as _jax

    _cache_dir = os.environ.get(
        "RIFFUSION_TEST_COMPILE_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "riffusion_tpu", "xla-tests"),
    )
    os.makedirs(_cache_dir, exist_ok=True)
    _jax.config.update("jax_compilation_cache_dir", _cache_dir)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    _jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def test_device() -> str:
    return os.environ.get("RIFFUSION_TEST_DEVICE", "cpu")


def synth_waveform(
    duration_s: float, sample_rate: int = 44100, channels: int = 1, seed: int = 42
) -> np.ndarray:
    """Deterministic synthetic music-ish test audio: a chord of decaying
    partials + a beat envelope + light noise, (channels, samples) float in
    [-1, 1]. Keeps the test suite self-contained (no audio fixtures)."""
    rng = np.random.default_rng(seed)
    n = int(duration_s * sample_rate)
    t = np.arange(n) / sample_rate
    out = np.zeros((channels, n), dtype=np.float64)
    freqs = [110.0, 220.0, 330.0, 554.37, 880.0, 1661.2, 3322.4]
    for c in range(channels):
        sig = np.zeros(n)
        for i, f in enumerate(freqs):
            phase = rng.uniform(0, 2 * np.pi)
            detune = 1.0 + 0.001 * c
            sig += (0.5 ** (i + 1)) * np.sin(2 * np.pi * f * detune * t + phase)
        beat = 0.55 + 0.45 * np.square(np.sin(2 * np.pi * 2.0 * t))
        sig *= beat
        sig += 0.01 * rng.standard_normal(n)
        out[c] = sig
    peak = np.max(np.abs(out))
    return (out / peak * 0.8).astype(np.float32)


@pytest.fixture(scope="session")
def mono_wave() -> np.ndarray:
    return synth_waveform(5.678, channels=1)


@pytest.fixture(scope="session")
def mono_wave_short() -> np.ndarray:
    """~1.4 s clip for the heavier numerical parity tests (CPU-friendly)."""
    return synth_waveform(1.414, channels=1)


@pytest.fixture(scope="session")
def stereo_wave() -> np.ndarray:
    return synth_waveform(5.678, channels=2)
