"""
ctypes bindings to the native C++ audio engine (riffusion_tpu/native/), with
pure-numpy/scipy fallbacks so the framework works before the .so is built.

The engine is auto-built on first import if a compiler is available; set
RIFFUSION_TPU_NO_NATIVE=1 to force the Python fallbacks.
"""

from __future__ import annotations

import ctypes
import math
import os
import subprocess
import threading
import typing as T

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libriffaudio.so")

_lib_lock = threading.Lock()
_lib: T.Optional[ctypes.CDLL] = None
_lib_failed = False


def _load_lib() -> T.Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    if os.environ.get("RIFFUSION_TPU_NO_NATIVE"):
        _lib_failed = True
        return None
    with _lib_lock:
        if _lib is not None or _lib_failed:
            return _lib
        try:
            if not os.path.exists(_LIB_PATH):
                subprocess.run(
                    ["make", "-C", _NATIVE_DIR],
                    check=True,
                    capture_output=True,
                    timeout=120,
                )
            lib = ctypes.CDLL(_LIB_PATH)
            lib.rf_resample_poly_int16.restype = ctypes.c_int64
            lib.rf_resample_poly_int16.argtypes = [
                ctypes.POINTER(ctypes.c_int16),
                ctypes.c_int64,
                ctypes.c_int32,
                ctypes.c_int64,
                ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int16),
            ]
            lib.rf_crossfade_concat_int16.restype = None
            lib.rf_crossfade_concat_int16.argtypes = [
                ctypes.POINTER(ctypes.c_int16),
                ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int16),
                ctypes.c_int64,
                ctypes.c_int32,
                ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int16),
            ]
            lib.rf_compress_dynamic_range_int16.restype = None
            lib.rf_compress_dynamic_range_int16.argtypes = [
                ctypes.POINTER(ctypes.c_int16),
                ctypes.c_int64,
                ctypes.c_int32,
                ctypes.c_double,
                ctypes.c_double,
                ctypes.c_double,
                ctypes.c_double,
                ctypes.c_double,
                ctypes.POINTER(ctypes.c_int16),
            ]
            _lib = lib
        except Exception:
            _lib_failed = True
    return _lib


def _i16_ptr(a: np.ndarray) -> "ctypes.POINTER(ctypes.c_int16)":  # type: ignore[valid-type]
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int16))


def resample_poly_int16(data: np.ndarray, rate_in: int, rate_out: int) -> np.ndarray:
    """Resample (samples, channels) int16 PCM from rate_in to rate_out."""
    assert data.dtype == np.int16 and data.ndim == 2
    if rate_in == rate_out:
        return data
    n, channels = data.shape
    lib = _load_lib()
    if lib is not None:
        g = math.gcd(rate_in, rate_out)
        out_len = -(-(n * (rate_out // g)) // (rate_in // g))
        src = np.ascontiguousarray(data)
        out = np.empty((out_len, channels), dtype=np.int16)
        written = lib.rf_resample_poly_int16(
            _i16_ptr(src), n, channels, rate_in, rate_out, _i16_ptr(out)
        )
        if written == out_len:
            return out
    # scipy fallback
    from scipy.signal import resample_poly

    g = math.gcd(rate_in, rate_out)
    out = resample_poly(data.astype(np.float64), rate_out // g, rate_in // g, axis=0)
    return np.clip(np.round(out), -32768, 32767).astype(np.int16)


def crossfade_concat_int16(a: np.ndarray, b: np.ndarray, xf_samples: int) -> np.ndarray:
    """Concatenate two (samples, channels) int16 buffers with a linear crossfade."""
    assert a.dtype == np.int16 and b.dtype == np.int16
    assert a.shape[1] == b.shape[1]
    na, channels = a.shape
    nb = b.shape[0]
    xf = int(min(xf_samples, na, nb))
    lib = _load_lib()
    if lib is not None:
        a_c = np.ascontiguousarray(a)
        b_c = np.ascontiguousarray(b)
        out = np.empty((na + nb - xf, channels), dtype=np.int16)
        lib.rf_crossfade_concat_int16(
            _i16_ptr(a_c), na, _i16_ptr(b_c), nb, channels, xf, _i16_ptr(out)
        )
        return out
    # numpy fallback
    head = a[: na - xf]
    t = (np.arange(xf, dtype=np.float64) / max(xf, 1))[:, None]
    mixed = a[na - xf :].astype(np.float64) * (1.0 - t) + b[:xf].astype(np.float64) * t
    tail = b[xf:]
    return np.concatenate(
        [head, np.clip(np.round(mixed), -32768, 32767).astype(np.int16), tail], axis=0
    )


def compress_dynamic_range_int16(
    data: np.ndarray,
    rate: int,
    threshold_db: float = -20.0,
    ratio: float = 4.0,
    attack_ms: float = 5.0,
    release_ms: float = 50.0,
) -> np.ndarray:
    """Feed-forward dynamic range compression on (samples, channels) int16 PCM."""
    assert data.dtype == np.int16 and data.ndim == 2
    n, channels = data.shape
    lib = _load_lib()
    if lib is not None:
        src = np.ascontiguousarray(data)
        out = np.empty_like(src)
        lib.rf_compress_dynamic_range_int16(
            _i16_ptr(src), n, channels, float(rate), threshold_db, ratio,
            attack_ms, release_ms, _i16_ptr(out),
        )
        return out
    # numpy fallback: block-wise envelope follower (vectorized, approximate)
    x = data.astype(np.float64)
    peak = np.max(np.abs(x), axis=1)
    level_db = np.where(peak > 0, 20.0 * np.log10(np.maximum(peak, 1e-9) / 32767.0), -120.0)
    att = math.exp(-1.0 / (rate * attack_ms / 1000.0))
    rel = math.exp(-1.0 / (rate * release_ms / 1000.0))
    env = np.empty_like(level_db)
    e = -120.0
    for i in range(n):  # pragma: no cover - slow path, native preferred
        c = att if level_db[i] > e else rel
        e = c * e + (1 - c) * level_db[i]
        env[i] = e
    gain_db = np.where(env > threshold_db, threshold_db + (env - threshold_db) / ratio - env, 0.0)
    out = x * (10.0 ** (gain_db / 20.0))[:, None]
    return np.clip(np.round(out), -32768, 32767).astype(np.int16)
