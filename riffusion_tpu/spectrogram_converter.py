"""
Audio <-> mel-spectrogram conversion, the JAX analogue of the reference's
torchaudio-based SpectrogramConverter (reference
riffusion/spectrogram_converter.py:34-204).

Each direction is one jit-compiled device program:

  forward:  waveform -> band-restricted matmul-DFT magnitudes -> mel einsum
  inverse:  mel -> closed-form inverse-mel matmul -> Griffin-Lim fori_loop
            -> iSTFT

Programs are compiled per (channels, num_frames/num_samples) shape and cached
by XLA; callers that sweep many clips should keep clip geometry fixed (the
CLI/server paths do).
"""

from __future__ import annotations

import functools
import typing as T

import jax
import jax.numpy as jnp
import numpy as np

from riffusion_tpu.audio.segment import AudioSegment
from riffusion_tpu.ops.griffin_lim import griffin_lim
from riffusion_tpu.ops.mel import active_bin_count, inverse_mel_operator, mel_filterbank
from riffusion_tpu.ops.stft import get_stft_kernel
from riffusion_tpu.spectrogram_params import SpectrogramParams
from riffusion_tpu.util import audio_util, jax_util


class SpectrogramConverter:
    """
    Convert between audio segments and mel-amplitude arrays.

    A "spectrogram" here is a (channels, frequency, time) float array of mel
    amplitudes, exactly as in the reference. The forward direction discards
    phase; the inverse approximates it with Griffin-Lim.
    """

    def __init__(
        self,
        params: SpectrogramParams,
        device: str = "tpu",
        gl_precision: str = "default",
    ):
        """gl_precision: matmul precision inside the Griffin-Lim iteration
        loop ("default" = bf16 MXU passes, ~3x faster; "highest" = full fp32).
        The final synthesis always runs at full precision; reconstruction
        quality is equivalent within test tolerance (the projection loop only
        steers phase estimates)."""
        self.p = params
        self.device = jax_util.check_device(device)
        self._jax_device = jax_util.jax_device(self.device)
        self._gl_precision = (
            jax.lax.Precision.HIGHEST if gl_precision == "highest" else jax.lax.Precision.DEFAULT
        )
        jax_util.enable_persistent_compilation_cache()

        n_freqs = params.n_fft // 2 + 1
        fb = mel_filterbank(
            n_freqs=n_freqs,
            f_min=float(params.min_frequency),
            f_max=float(params.max_frequency),
            n_mels=params.num_frequencies,
            sample_rate=params.sample_rate,
            norm=params.mel_scale_norm,
            mel_scale=params.mel_scale_type,
        )
        self._n_active = active_bin_count(fb)
        self._fb_active = fb[: self._n_active]  # (n_active, n_mels)
        self._inv_mel = inverse_mel_operator(
            n_freqs=n_freqs,
            f_min=float(params.min_frequency),
            f_max=float(params.max_frequency),
            n_mels=params.num_frequencies,
            sample_rate=params.sample_rate,
            norm=params.mel_scale_norm,
            mel_scale=params.mel_scale_type,
            n_active=self._n_active,
        )
        backend = "fft" if self.device == "cpu" else "dft"
        self._kernel = get_stft_kernel(
            n_fft=params.n_fft,
            win_length=params.win_length,
            hop_length=params.hop_length,
            n_bins=self._n_active,
            backend=backend,
        )

        # Large constant operands are explicit jit arguments (see
        # STFTKernel.jax_consts for why). The DFT operands are synthesized
        # directly on the target device (jax.default_device scopes the jitted
        # build), so only the small mel matrices pay a host->device transfer.
        put = functools.partial(jax.device_put, device=self._jax_device)
        with jax.default_device(self._jax_device):
            stft_consts = self._kernel.jax_consts()
        self._consts = {
            "stft": jax.tree.map(put, stft_consts),
            "fb": put(jnp.asarray(self._fb_active)),
            "inv_mel": put(jnp.asarray(self._inv_mel)),
        }

        # consts are passed as call arguments so they stay HLO parameters.
        self._forward = jax.jit(self._mel_amplitudes)
        self._inverse = jax.jit(self._waveform, static_argnames=("n_iters",))

    @property
    def device_consts(self):
        """Constant operands pytree; pass through when composing the converter
        methods inside a larger jit to avoid HLO literal embedding."""
        return self._consts

    # ------------------------------------------------------------- jitted fns

    def _mel_amplitudes(self, waveform: jax.Array, consts=None) -> jax.Array:
        """(B, L) -> (B, n_mels, F)"""
        if consts is None:
            consts = self._consts
        amplitudes = self._kernel.magnitude(waveform, consts["stft"])  # (B, n_active, F)
        return jnp.einsum(
            "fm,bft->bmt", consts["fb"], amplitudes, precision=jax.lax.Precision.HIGHEST
        )

    def _waveform(
        self, amplitudes_mel: jax.Array, key: jax.Array, n_iters: int, consts=None
    ) -> jax.Array:
        """(B, n_mels, F) -> (B, samples)"""
        if consts is None:
            consts = self._consts
        linear = jnp.einsum(
            "fm,bmt->bft",
            consts["inv_mel"],
            amplitudes_mel,
            precision=jax.lax.Precision.HIGHEST,
        )
        linear = jnp.maximum(linear, 0.0)
        return griffin_lim(
            linear,
            self._kernel,
            key,
            n_iters=n_iters,
            momentum=0.99,
            consts=consts["stft"],
            precision=self._gl_precision,
        )

    # ----------------------------------------------------------- public (host)

    def spectrogram_from_audio(self, audio: AudioSegment) -> np.ndarray:
        """Audio segment -> (channels, frequency, time) mel amplitudes."""
        assert int(audio.frame_rate) == self.p.sample_rate, "Audio sample rate must match params"
        waveform = audio.raw_data.T.astype(np.float32)  # (channels, samples)
        amplitudes_mel = self._forward(jnp.asarray(waveform), self._consts)
        return np.asarray(amplitudes_mel)

    def audio_from_spectrogram(
        self,
        spectrogram: np.ndarray,
        apply_filters: bool = True,
        seed: int = 0,
    ) -> AudioSegment:
        """(channels, frequency, time) mel amplitudes -> audio segment."""
        key = jax.random.PRNGKey(seed)
        waveform = self._inverse(
            jnp.asarray(spectrogram, dtype=jnp.float32),
            key,
            n_iters=self.p.num_griffin_lim_iters,
            consts=self._consts,
        )
        segment = audio_util.audio_from_waveform(
            samples=np.asarray(waveform),
            sample_rate=self.p.sample_rate,
            normalize=True,
        )
        if apply_filters:
            segment = audio_util.apply_filters(segment, compression=False)
        return segment

    # Device-side entry points for the fused pipeline ------------------------

    def mel_amplitudes_from_waveform(self, waveform: jax.Array, consts=None) -> jax.Array:
        """jnp-in/jnp-out forward. When calling inside a larger jit, pass
        `consts` through as a traced argument (see `device_consts`)."""
        return self._mel_amplitudes(waveform, consts)

    def waveform_from_mel_amplitudes(
        self, amplitudes_mel: jax.Array, key: T.Optional[jax.Array] = None, consts=None
    ) -> jax.Array:
        """jnp-in/jnp-out inverse. When calling inside a larger jit, pass
        `consts` through as a traced argument (see `device_consts`)."""
        if key is None:
            key = jax.random.PRNGKey(0)
        return self._waveform(
            amplitudes_mel, key, n_iters=self.p.num_griffin_lim_iters, consts=consts
        )


@functools.lru_cache(maxsize=8)
def cached_converter(params: SpectrogramParams, device: str = "tpu") -> SpectrogramConverter:
    """Converter cache keyed by params (the reference rebuilt one per request,
    noted as a perf TODO at server.py:158; here reuse is free and safe since
    converters are stateless after init)."""
    return SpectrogramConverter(params=params, device=device)
