"""
Audio -> mel -> audio round trips through SpectrogramConverter and
SpectrogramImageConverter, mirroring the reference's converter tests
(test/spectrogram_converter_test.py, test/spectrogram_image_converter_test.py,
test/image_to_audio_test.py invariants) and adding a spectral-similarity
check the reference left as a TODO.
"""

import numpy as np
import pytest

from riffusion_tpu.audio.segment import AudioSegment
from riffusion_tpu.spectrogram_converter import SpectrogramConverter
from riffusion_tpu.spectrogram_image_converter import SpectrogramImageConverter
from riffusion_tpu.spectrogram_params import SpectrogramParams


def _segment(wave: np.ndarray, rate: int = 44100) -> AudioSegment:
    return AudioSegment.from_float(wave, rate)


def _spectral_profile(x: np.ndarray, rate: int) -> np.ndarray:
    """Coarse log-magnitude band profile for similarity comparison."""
    spec = np.abs(np.fft.rfft(x * np.hanning(x.size)))
    freqs = np.fft.rfftfreq(x.size, 1.0 / rate)
    bands = np.logspace(np.log10(50), np.log10(9500), 24)
    prof = np.array([spec[(freqs >= lo) & (freqs < hi)].sum() for lo, hi in zip(bands[:-1], bands[1:])])
    return np.log1p(prof)


@pytest.mark.parametrize("stereo", [False, True])
def test_mel_roundtrip_invariants(mono_wave, stereo_wave, test_device, stereo):
    wave = stereo_wave if stereo else mono_wave
    params = SpectrogramParams(stereo=stereo)
    converter = SpectrogramConverter(params=params, device=test_device)
    segment = _segment(wave)

    spectrogram = converter.spectrogram_from_audio(segment)
    assert spectrogram.shape == (2 if stereo else 1, 512, 568)
    assert np.all(spectrogram >= 0)
    assert np.max(spectrogram) > 0

    audio = converter.audio_from_spectrogram(spectrogram, apply_filters=True)
    assert audio.frame_rate == params.sample_rate
    assert audio.channels == (2 if stereo else 1)
    # istft(length=None) trims to (frames-1)*hop -> within 10ms of original
    assert abs(audio.duration_ms - segment.duration_ms) < 10

    # Spectral similarity: Griffin-Lim audio should correlate with the source
    prof_a = _spectral_profile(wave[0], params.sample_rate)
    n = min(audio.frame_count, wave.shape[-1])
    prof_b = _spectral_profile(audio.raw_data[:n, 0].astype(np.float32) / 32768.0, params.sample_rate)
    corr = np.corrcoef(prof_a, prof_b)[0, 1]
    assert corr > 0.85, f"spectral correlation too low: {corr}"


def test_image_roundtrip(mono_wave, test_device):
    params = SpectrogramParams()
    converter = SpectrogramImageConverter(params=params, device=test_device)
    segment = _segment(mono_wave)

    image = converter.spectrogram_image_from_audio(segment)
    assert image.mode == "RGB"
    # width = duration_ms / step_size_ms, height = num_frequencies
    assert image.size == (568, 512)

    # EXIF params round-trip
    recovered = SpectrogramParams.from_exif(image.getexif())
    assert recovered.sample_rate == params.sample_rate
    assert recovered.num_frequencies == params.num_frequencies

    audio = converter.audio_from_spectrogram_image(image)
    assert audio.frame_rate == 44100
    assert audio.channels == 1
    assert abs(audio.duration_ms - segment.duration_ms) < 10


def test_image_roundtrip_stereo_channel_coercion(mono_wave, test_device):
    params = SpectrogramParams(stereo=True)
    converter = SpectrogramImageConverter(params=params, device=test_device)
    # mono input with stereo=True triggers channel cloning (warning path)
    segment = _segment(mono_wave)
    image = converter.spectrogram_image_from_audio(segment)
    arr = np.array(image)
    assert np.all(arr[:, :, 0] == 0)  # stereo packing: R zeroed

    audio = converter.audio_from_spectrogram_image(image)
    assert audio.channels == 2


def test_inverse_mel_quality(test_device):
    """Closed-form inverse mel must invert the forward mel projection well
    on in-band content (replaces the reference's 200-iteration SGD)."""
    import jax.numpy as jnp

    from riffusion_tpu.ops.mel import (
        active_bin_count,
        inverse_mel_operator,
        mel_filterbank,
    )

    p = SpectrogramParams()
    n_freqs = p.n_fft // 2 + 1
    fb = mel_filterbank(n_freqs, 0.0, 10000.0, 512, 44100)
    n_active = active_bin_count(fb)
    inv = inverse_mel_operator(n_freqs, 0.0, 10000.0, 512, 44100, n_active=n_active)

    # Smooth linear spectrum restricted to active band (pointwise recovery of
    # per-bin noise is impossible: 512 mels -> 4096 bins is underdetermined,
    # for the reference's SGD inverse just as much as for this one).
    freqs = np.linspace(0, 22050, n_freqs)[:n_active]
    lin = (np.exp(-((freqs - 2000) ** 2) / (2 * 1500**2)) + 0.05).astype(np.float32)

    mel = fb[:n_active].T @ lin  # (n_mels,)
    lin_rec = np.maximum(np.asarray(jnp.asarray(inv) @ jnp.asarray(mel)), 0)

    # (a) mel-consistency: re-projecting the reconstruction reproduces the mel
    mel_rt = fb[:n_active].T @ lin_rec
    assert np.linalg.norm(mel_rt - mel) / np.linalg.norm(mel) < 1e-3

    # (b) pointwise recovery on the smooth spectrum where mel coverage exists
    mask = fb[:n_active].sum(axis=1) > 1e-3
    err = np.abs(lin_rec[mask] - lin[mask]) / (np.abs(lin[mask]) + 1e-2)
    assert np.median(err) < 0.1
