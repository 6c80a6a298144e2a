"""
Golden-file parity against artifacts produced by the reference's torchaudio
stack (the two checked-in spectrogram PNGs + wav clips under
/root/reference/test/test_data). Skipped when the reference checkout is not
present.

The stereo golden encodes with NO channel coercion and matches our encoder
essentially bit-for-bit (max pixel diff <= 2). The mono golden passes through
pydub's stereo->mono downmix whose clipping/rounding differs slightly from
ours, giving a ~1-2% scale difference — well inside the reference's own
numeric tolerance (image_util_test rtol=0.15).
"""

from pathlib import Path

import numpy as np
import pytest
from PIL import Image

from riffusion_tpu.audio.segment import AudioSegment
from riffusion_tpu.spectrogram_image_converter import SpectrogramImageConverter
from riffusion_tpu.spectrogram_params import SpectrogramParams

REF = Path("/root/reference/test/test_data/tired_traveler")
CLIP = REF / "clips" / "clip_2_start_103694_ms_duration_5678_ms.wav"
GOLDEN_MONO = REF / "images" / "clip_2_start_103694_ms_duration_5678_ms.png"
GOLDEN_STEREO = REF / "images" / "clip_2_start_103694_ms_duration_5678_ms_stereo.png"

pytestmark = [
    pytest.mark.skipif(not CLIP.exists(), reason="reference test data not available"),
    # multi-minute DSP compiles at the full 5.68 s clip geometry: runs in the
    # dedicated CI slow job (ci.yml slow-tests), keeping the main matrix fast
    pytest.mark.slow,
]


def _spectral_profile(x: np.ndarray, rate: int) -> np.ndarray:
    spec = np.abs(np.fft.rfft(x * np.hanning(x.size)))
    freqs = np.fft.rfftfreq(x.size, 1.0 / rate)
    bands = np.logspace(np.log10(50), np.log10(9500), 30)
    prof = np.array(
        [spec[(freqs >= a) & (freqs < b)].sum() for a, b in zip(bands[:-1], bands[1:])]
    )
    return np.log1p(prof)


def test_encode_matches_golden_stereo(test_device):
    segment = AudioSegment.from_file(CLIP)
    conv = SpectrogramImageConverter(SpectrogramParams(stereo=True), device=test_device)
    ours = np.array(conv.spectrogram_image_from_audio(segment)).astype(np.int16)
    golden = np.array(Image.open(GOLDEN_STEREO).convert("RGB")).astype(np.int16)
    assert ours.shape == golden.shape
    diff = np.abs(ours - golden)
    assert diff.max() <= 2, f"max pixel diff {diff.max()}"


def test_encode_matches_golden_mono_bit_tight(test_device):
    """The reference's mono golden is empirically the LEFT CHANNEL, not a
    downmix: imaging channel 0 of the stereo spectrogram reproduces it with
    max pixel diff <= 1 (verified against the artifact; identical EXIF
    MAX_VALUE in both goldens corroborates). It predates the reference's
    set_channels(1) coercion (spectrogram_image_converter.py:46-48) and the
    reference's own tests never pixel-compare it. Deriving the same quantity
    makes this golden bit-tight instead of the former mean<5/p99<30 band."""
    from riffusion_tpu.spectrogram_converter import SpectrogramConverter
    from riffusion_tpu.util import image_util

    segment = AudioSegment.from_file(CLIP)
    conv = SpectrogramConverter(SpectrogramParams(stereo=True), device=test_device)
    spec = conv.spectrogram_from_audio(segment)  # (2, F, T)
    img = image_util.image_from_spectrogram(spec[:1], power=0.25)
    ours = np.array(img).astype(np.int16)
    golden = np.array(Image.open(GOLDEN_MONO).convert("RGB")).astype(np.int16)
    diff = np.abs(ours - golden)
    assert diff.max() <= 2, f"max pixel diff {diff.max()}"


def test_encode_mono_downmix_near_golden(test_device):
    """Drift guard for the REAL mono path (pydub-style (L+R)/2 downmix, what
    the reference's current code produces): the golden is a different mono
    derivation (see above), so this is tolerance-banded; the measured delta
    is mean ~3.4 / p99 ~24 from downmix-vs-left-channel content, not DSP
    error (the stereo and channel-0 tests above are bit-tight)."""
    segment = AudioSegment.from_file(CLIP)
    conv = SpectrogramImageConverter(SpectrogramParams(stereo=False), device=test_device)
    ours = np.array(conv.spectrogram_image_from_audio(segment)).astype(np.int16)
    golden = np.array(Image.open(GOLDEN_MONO).convert("RGB")).astype(np.int16)
    diff = np.abs(ours - golden)
    assert diff.mean() < 5, f"mean pixel diff {diff.mean()}"
    assert np.percentile(diff, 99) < 30


def test_decode_reference_golden_to_audio(test_device):
    """Decoding the reference's own PNG through our EXIF + inverse stack must
    produce audio spectrally matching the reference's original wav clip."""
    image = Image.open(GOLDEN_STEREO)
    params = SpectrogramParams.from_exif(image.getexif())
    assert params.stereo is True
    conv = SpectrogramImageConverter(params, device=test_device)
    audio = conv.audio_from_spectrogram_image(image.convert("RGB"))

    original = AudioSegment.from_file(CLIP)
    assert audio.frame_rate == original.frame_rate
    assert audio.channels == 2
    assert abs(audio.duration_ms - original.duration_ms) < 10

    n = min(audio.frame_count, original.frame_count)
    prof_ours = _spectral_profile(audio.raw_data[:n, 0] / 32768.0, 44100)
    prof_ref = _spectral_profile(original.raw_data[:n, 0] / 32768.0, 44100)
    corr = np.corrcoef(prof_ours, prof_ref)[0, 1]
    assert corr > 0.9, f"spectral correlation vs reference clip: {corr}"
