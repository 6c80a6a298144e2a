"""
TPU-native STFT / iSTFT.

Semantics match torch.stft/torch.istft as configured by the reference
(reference riffusion/spectrogram_converter.py:47-73): centered frames with
reflect padding, a periodic Hann window of `win_length` zero-padded to
`n_fft`, hop `hop_length`, one-sided spectrum, no normalization.

TPU-first design
----------------
Riffusion's geometry (n_fft=17640, win=4410, hop=441) makes an FFT a poor fit
for the MXU, and XLA:TPU FFTs are VPU-bound. Instead:

1. The analysis window is zero outside its `win_length` support, so the DFT of
   a frame only reads `win_length` samples -> the STFT is an exact matmul with
   a (win_length, n_bins) cosine/sine pair evaluated at the window's offset
   inside the padded frame. Likewise the inverse DFT restricted to the window
   support is a (n_bins, win_length) matmul.
2. The mel filterbank is identically zero above `max_frequency`, so both the
   forward magnitude (consumed by mel) and Griffin-Lim (whose magnitudes are
   zero above the band) only ever need the lowest `n_bins` active frequency
   bins. Restricting the DFT to those bins is *exact*, not an approximation,
   and cuts compute/memory by n_fft//2+1 over n_bins (~2.2x at defaults).
3. hop divides both win_length and the window offset at the defaults, so
   framing and overlap-add are stride-free reshapes + shifted adds (no gather
   or scatter in the hot path). A general gather/scatter fallback covers
   arbitrary params.

A `backend="fft"` path (jnp.fft.rfft/irfft on full frames) is kept for CPU,
where pocketfft beats the matmul.
"""

from __future__ import annotations

import dataclasses
import functools
import typing as T

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def hann_window(win_length: int) -> np.ndarray:
    """Periodic Hann window (matches torch.hann_window(periodic=True))."""
    n = np.arange(win_length, dtype=np.float64)
    return (0.5 * (1.0 - np.cos(2.0 * np.pi * n / win_length))).astype(np.float64)


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3, 4))
def _device_dft_consts(
    n_fft: int, win_length: int, hop_length: int, offset: int, n_bins: int
) -> T.Dict[str, "Array"]:
    """Build the matmul-DFT operand matrices on device (see jax_consts).

    The phase theta = 2*pi*m*k/n_fft is computed as 2*pi*((m*k) mod n_fft)
    / n_fft with the mod taken in int32 — exact, so the only float error is
    one rounding of theta in [0, 2pi) plus the cos/sin intrinsic, matching
    the float64 host build to ~1e-6 absolute. Caller guarantees
    (offset+win_length-1)*(n_bins-1) < 2**31.
    """
    nw = jnp.arange(win_length, dtype=jnp.int32)
    window = 0.5 * (
        1.0 - jnp.cos(nw.astype(jnp.float32) * jnp.float32(2.0 * np.pi / win_length))
    )

    m = (nw + offset)[:, None]
    k = jnp.arange(n_bins, dtype=jnp.int32)[None, :]
    theta = ((m * k) % n_fft).astype(jnp.float32) * jnp.float32(2.0 * np.pi / n_fft)
    cos_m, msin_m = jnp.cos(theta), -jnp.sin(theta)

    # inverse: transpose geometry with conjugate-symmetry doubling weights
    full_bins = n_fft // 2 + 1
    w = jnp.full((n_bins, 1), 2.0, jnp.float32).at[0].set(1.0)
    if n_bins == full_bins and n_fft % 2 == 0:
        w = w.at[-1].set(1.0)
    scale = w * jnp.float32(1.0 / n_fft)
    icos = cos_m.T * scale
    imsin = msin_m.T * scale
    return {
        "window": window,
        "cos": cos_m,
        "msin": msin_m,
        "icos": icos,
        "imsin": imsin,
    }


@dataclasses.dataclass(frozen=True)
class STFTKernel:
    """Precomputed constants + methods for one STFT geometry.

    Construct via `get_stft_kernel` (cached). Methods are jnp-pure and safe to
    call inside jit; all shapes are static given the input length.
    """

    n_fft: int
    win_length: int
    hop_length: int
    n_bins: int  # number of (lowest) frequency bins computed/consumed
    backend: str  # "dft" (MXU matmuls) or "fft" (jnp.fft)

    # ------------------------------------------------------------- constants

    @functools.cached_property
    def _window(self) -> np.ndarray:
        return hann_window(self.win_length)

    @property
    def _offset(self) -> int:
        """Start of the window support inside the zero-padded n_fft frame."""
        return (self.n_fft - self.win_length) // 2

    @functools.cached_property
    def _dft_mats(self) -> T.Tuple[np.ndarray, np.ndarray]:
        """(cos, msin) matrices of shape (win_length, n_bins):
        X[k] = sum_m f[m] * exp(-2i*pi*k*(m+offset)/n_fft)."""
        m = np.arange(self.win_length, dtype=np.float64)[:, None] + self._offset
        k = np.arange(self.n_bins, dtype=np.float64)[None, :]
        theta = 2.0 * np.pi * m * k / self.n_fft
        return np.cos(theta).astype(np.float32), (-np.sin(theta)).astype(np.float32)

    @functools.cached_property
    def _idft_mats(self) -> T.Tuple[np.ndarray, np.ndarray]:
        """(cos, msin) matrices of shape (n_bins, win_length) implementing the
        one-sided inverse DFT restricted to the window support, including the
        1/n_fft factor and the conjugate-symmetry doubling weights."""
        full_bins = self.n_fft // 2 + 1
        k = np.arange(self.n_bins, dtype=np.float64)[:, None]
        m = np.arange(self.win_length, dtype=np.float64)[None, :] + self._offset
        theta = 2.0 * np.pi * m * k / self.n_fft
        w = np.full((self.n_bins, 1), 2.0)
        w[0] = 1.0
        if self.n_bins == full_bins and self.n_fft % 2 == 0:
            w[-1] = 1.0
        scale = w / self.n_fft
        return (
            (np.cos(theta) * scale).astype(np.float32),
            (-np.sin(theta) * scale).astype(np.float32),
        )

    def jax_consts(self) -> T.Dict[str, Array]:
        """The kernel's large constant operands as jax arrays.

        These are deliberately *arguments* of the jitted programs rather than
        closed-over constants: embedding ~100 MB DFT matrices as HLO literals
        bloats the serialized module (and breaks remote-compile payload
        limits); as parameters they live in HBM once and the HLO stays tiny.
        """
        # kernels are shared across converters (get_stft_kernel cache), so the
        # consts cache is keyed by the active default device — a CPU converter
        # must not inherit TPU-resident operands (the device_put pull of
        # ~100 MB matrices over a remote relay is exactly what this avoids)
        caches = self.__dict__.setdefault("_jax_consts_caches", {})
        dev_key = str(getattr(jax.config, "jax_default_device", None) or "default")
        cached = caches.get(dev_key)
        if cached is None:
            try:
                from jax._src.core import trace_state_clean

                in_trace = not trace_state_clean()
            except ImportError:  # private API moved: assume traced (safe path)
                in_trace = True
            if (
                self.backend == "dft"
                and not in_trace
                and (self._offset + self.win_length - 1) * max(self.n_bins - 1, 1) < 2**31
            ):
                # Synthesize the ~hundreds-of-MB DFT operands ON DEVICE (on
                # the caller's default device; SpectrogramConverter wraps its
                # init in `jax.default_device`): a host->device transfer of
                # the numpy versions costs tens of seconds over a remote-TPU
                # relay and dominated server warm start. Accuracy matches the
                # float64 host path because the phase m*k is reduced mod
                # n_fft in *integer* arithmetic before any float rounding
                # (theta stays in [0, 2pi) with ~1e-7 error vs ~6e-4 from
                # naive f32). NOT used under an outer trace:
                # ensure_compile_time_eval would run the build op-by-op,
                # which overflows remote-compile payload limits.
                cached = _device_dft_consts(
                    self.n_fft, self.win_length, self.hop_length,
                    self._offset, self.n_bins,
                )
            else:
                # Host build. Concrete even if first touched under a jit
                # trace (otherwise the cache would hold leaked tracers).
                with jax.ensure_compile_time_eval():
                    if self.backend == "fft":
                        cached = {"window": jnp.asarray(self._window, dtype=jnp.float32)}
                    else:
                        cos_m, msin_m = self._dft_mats
                        icos, imsin = self._idft_mats
                        cached = {
                            "window": jnp.asarray(self._window, dtype=jnp.float32),
                            "cos": jnp.asarray(cos_m),
                            "msin": jnp.asarray(msin_m),
                            "icos": jnp.asarray(icos),
                            "imsin": jnp.asarray(imsin),
                        }
            caches[dev_key] = cached
        return cached

    @property
    def _fast_layout(self) -> bool:
        """True when framing/OLA reduce to reshapes + shifted adds."""
        return (
            self.win_length % self.hop_length == 0
            and self._offset % self.hop_length == 0
            and self.n_fft % self.hop_length == 0
        )

    # ---------------------------------------------------------------- shapes

    def num_frames(self, num_samples: int) -> int:
        pad = self.n_fft // 2
        return 1 + (num_samples + 2 * pad - self.n_fft) // self.hop_length

    def num_output_samples(self, n_frames: int) -> int:
        """istft(length=None) output length (torch semantics, even n_fft)."""
        return (n_frames - 1) * self.hop_length

    # --------------------------------------------------------------- framing

    def _frames_windowed(self, waveform: Array) -> Array:
        """(B, L) -> (B, F, win_length): window-support samples of each
        centered frame, reflect-padded, *not* yet multiplied by the window."""
        pad = self.n_fft // 2
        x = jnp.pad(waveform, ((0, 0), (pad, pad)), mode="reflect")
        f = self.num_frames(waveform.shape[-1])
        off, hop, win = self._offset, self.hop_length, self.win_length
        region = jax.lax.dynamic_slice_in_dim(x, off, (f - 1) * hop + win, axis=-1)
        if self._fast_layout:
            r = win // hop
            chunks = region[:, : (f - 1 + r) * hop].reshape(x.shape[0], f - 1 + r, hop)
            stacked = jnp.stack([chunks[:, j : j + f] for j in range(r)], axis=2)
            return stacked.reshape(x.shape[0], f, win)
        idx = (np.arange(f)[:, None] * hop + np.arange(win)[None, :]).astype(np.int32)
        return jnp.take(region, jnp.asarray(idx), axis=-1)

    def _overlap_add(self, frames: Array, n_frames: int) -> Array:
        """(B, F, win_length) -> (B, (F-1)*hop + win_length) overlap-add.

        Fast path is a pure pad-and-sum over the win/hop phases — no
        read-modify-write slice chains (which XLA:TPU has been observed to
        miscompile when fused inside loops)."""
        hop, win = self.hop_length, self.win_length
        b = frames.shape[0]
        if self._fast_layout:
            r = win // hop
            fw = frames.reshape(b, n_frames, r, hop)
            acc = jnp.zeros((b, n_frames - 1 + r, hop), frames.dtype)
            for j in range(r):
                acc = acc + jnp.pad(
                    fw[:, :, j, :], ((0, 0), (j, r - 1 - j), (0, 0))
                )
            return acc.reshape(b, (n_frames - 1 + r) * hop)
        out_len = (n_frames - 1) * hop + win
        idx = (np.arange(n_frames)[:, None] * hop + np.arange(win)[None, :]).astype(np.int32)
        acc = jnp.zeros((b, out_len), frames.dtype)
        return acc.at[:, jnp.asarray(idx)].add(frames)

    def _ola_envelope(self, n_frames: int) -> np.ndarray:
        """Sum of squared windows over the OLA region (trace-time constant)."""
        hop, win = self.hop_length, self.win_length
        w2 = self._window.astype(np.float64) ** 2
        env = np.zeros((n_frames - 1) * hop + win)
        for i in range(n_frames):
            env[i * hop : i * hop + win] += w2
        return np.maximum(env, 1e-11).astype(np.float32)

    # ------------------------------------------------------------------ stft

    def stft(
        self,
        waveform: Array,
        consts: T.Optional[T.Dict[str, Array]] = None,
        precision: T.Optional[jax.lax.Precision] = None,
    ) -> T.Tuple[Array, Array]:
        """(B, L) float32 -> (real, imag), each (B, n_bins, F)."""
        if consts is None:
            consts = self.jax_consts()
        if precision is None:
            precision = jax.lax.Precision.HIGHEST
        frames = self._frames_windowed(waveform.astype(jnp.float32))
        xw = frames * consts["window"]
        if self.backend == "fft":
            off = self._offset
            full = jnp.pad(xw, ((0, 0), (0, 0), (off, self.n_fft - self.win_length - off)))
            spec = jnp.fft.rfft(full, n=self.n_fft, axis=-1)[..., : self.n_bins]
            return (
                jnp.real(spec).astype(jnp.float32).transpose(0, 2, 1),
                jnp.imag(spec).astype(jnp.float32).transpose(0, 2, 1),
            )
        real = jnp.dot(xw, consts["cos"], precision=precision)
        imag = jnp.dot(xw, consts["msin"], precision=precision)
        return real.transpose(0, 2, 1), imag.transpose(0, 2, 1)

    def magnitude(
        self,
        waveform: Array,
        consts: T.Optional[T.Dict[str, Array]] = None,
        precision: T.Optional[jax.lax.Precision] = None,
    ) -> Array:
        """(B, L) -> (B, n_bins, F) spectrogram magnitudes."""
        real, imag = self.stft(waveform, consts, precision)
        return jnp.sqrt(real * real + imag * imag)

    # ----------------------------------------------------------------- istft

    def istft(
        self,
        real: Array,
        imag: Array,
        consts: T.Optional[T.Dict[str, Array]] = None,
        precision: T.Optional[jax.lax.Precision] = None,
    ) -> Array:
        """(B, n_bins, F) x2 -> (B, (F-1)*hop) waveform (torch.istft, center,
        length=None). Bins above n_bins are treated as exactly zero."""
        if consts is None:
            consts = self.jax_consts()
        if precision is None:
            precision = jax.lax.Precision.HIGHEST
        n_frames = real.shape[-1]
        if self.backend == "fft":
            full_bins = self.n_fft // 2 + 1
            spec = (real + 1j * imag).transpose(0, 2, 1)
            spec = jnp.pad(spec, ((0, 0), (0, 0), (0, full_bins - self.n_bins)))
            frames_full = jnp.fft.irfft(spec, n=self.n_fft, axis=-1)
            off = self._offset
            frames_t = jax.lax.dynamic_slice_in_dim(frames_full, off, self.win_length, axis=-1)
            frames_t = frames_t.astype(jnp.float32)
        else:
            rt = real.transpose(0, 2, 1)
            it = imag.transpose(0, 2, 1)
            frames_t = jnp.dot(
                rt, consts["icos"], precision=precision
            ) + jnp.dot(it, consts["imsin"], precision=precision)
        frames_w = frames_t * consts["window"]
        y = self._overlap_add(frames_w, n_frames)
        env = jnp.asarray(self._ola_envelope(n_frames))
        y = y / env
        trim = self.n_fft // 2 - self._offset
        return jax.lax.dynamic_slice_in_dim(
            y, trim, self.num_output_samples(n_frames), axis=-1
        )


@functools.lru_cache(maxsize=32)
def get_stft_kernel(
    n_fft: int,
    win_length: int,
    hop_length: int,
    n_bins: T.Optional[int] = None,
    backend: T.Optional[str] = None,
) -> STFTKernel:
    """Build (cached) an STFTKernel. `n_bins=None` computes the full one-sided
    spectrum; `backend=None` picks matmul-DFT on accelerators, FFT on CPU."""
    if n_bins is None:
        n_bins = n_fft // 2 + 1
    if backend is None:
        backend = "fft" if jax.default_backend() == "cpu" else "dft"
    return STFTKernel(
        n_fft=n_fft,
        win_length=win_length,
        hop_length=hop_length,
        n_bins=n_bins,
        backend=backend,
    )
