"""
Device selection seam + in-graph math helpers.

`check_device` mirrors the reference's torch_util.check_device contract
(reference riffusion/util/torch_util.py:7-18): callers may ask for any device
string ("tpu", "cuda", "gpu", "mps", "cpu"); accelerator aliases resolve to
whatever accelerator JAX actually has (TPU here), with a warning + fallback
when none is present. Tests select backends through the same seam via the
RIFFUSION_TEST_DEVICE env var.

`slerp` is the reference's spherical interpolation (torch_util.py:21-48) as a
pure jnp function — no host round trip, so it can live inside the jitted
denoise graph.
"""

from __future__ import annotations

import os
import typing as T
import warnings

import jax
import jax.numpy as jnp

_ACCELERATOR_ALIASES = ("cuda", "gpu", "tpu", "mps", "axon")

_cache_enabled = False


def enable_persistent_compilation_cache(path: T.Optional[str] = None) -> None:
    """Turn on JAX's persistent compilation cache (idempotent).

    This is the framework's replacement for the reference's downloadable
    traced-UNet artifact (riffusion_pipeline.py:127-171): every compiled
    program shape is cached on disk and reloads in seconds on later runs.
    Opt out with RIFFUSION_TPU_NO_COMPILE_CACHE=1.
    """
    global _cache_enabled
    if _cache_enabled or os.environ.get("RIFFUSION_TPU_NO_COMPILE_CACHE"):
        return
    cache_dir = path or os.environ.get(
        "RIFFUSION_TPU_COMPILE_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "riffusion_tpu", "xla"),
    )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # persist even sub-second programs: a serving process compiles dozens
        # of small helpers (threefry, convert_element_type, embeds) at ~0.4 s
        # each over the remote-compile relay; re-paying them on every restart
        # costs more than the cache files do
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        _cache_enabled = True
    except Exception as e:  # cache is an optimization, never fatal
        warnings.warn(f"could not enable persistent compilation cache: {e}")


def default_device() -> str:
    """Canonical name of the best available device ("tpu" or "cpu")."""
    return "cpu" if jax.default_backend() == "cpu" else "tpu"


def check_device(device: str, backup: str = "cpu") -> str:
    """Resolve a requested device string to an available one, warning on
    fallback. Accelerator names are treated as aliases for "the accelerator
    JAX has" so reference-style device="cuda" call sites keep working."""
    device = device.lower()
    if device.startswith("cpu"):
        return "cpu"
    if any(device.startswith(a) for a in _ACCELERATOR_ALIASES):
        if jax.default_backend() != "cpu":
            return "tpu"
        warnings.warn(
            f"WARNING: {device} is not available, using {backup} instead.", stacklevel=3
        )
        return backup
    warnings.warn(f"WARNING: unknown device {device!r}, using {backup}.", stacklevel=3)
    return backup


def jax_device(device: str):
    """Map a canonical device string to a concrete jax.Device."""
    platform = "cpu" if device.startswith("cpu") else jax.default_backend()
    return jax.devices(platform)[0]


def slerp(t, v0: jax.Array, v1: jax.Array, dot_threshold: float = 0.9995) -> jax.Array:
    """Spherical interpolation between arrays, with a lerp fallback when the
    vectors are nearly parallel. Pure jnp; both branches are computed and
    selected with `where` (cheap relative to the surrounding graph and keeps
    the op jit/vmap-friendly)."""
    v0 = jnp.asarray(v0)
    v1 = jnp.asarray(v1)
    norm = jnp.linalg.norm(v0.ravel()) * jnp.linalg.norm(v1.ravel())
    dot = jnp.sum(v0 * v1) / jnp.maximum(norm, 1e-20)

    lerp = (1.0 - t) * v0 + t * v1

    dot_c = jnp.clip(dot, -1.0, 1.0)
    theta_0 = jnp.arccos(dot_c)
    sin_theta_0 = jnp.sin(theta_0)
    theta_t = theta_0 * t
    safe_sin = jnp.where(jnp.abs(sin_theta_0) < 1e-12, 1.0, sin_theta_0)
    s0 = jnp.sin(theta_0 - theta_t) / safe_sin
    s1 = jnp.sin(theta_t) / safe_sin
    slerped = s0 * v0 + s1 * v1

    return jnp.where(jnp.abs(dot) > dot_threshold, lerp, slerped)
