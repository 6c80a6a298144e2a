"""AudioSegment engine tests: wav IO, slicing, mixing, resampling, filters."""

import io

import numpy as np
import pytest

from riffusion_tpu.audio.segment import AudioSegment
from riffusion_tpu.util import audio_util


def _segment(duration_s=1.0, rate=44100, channels=1, freq=440.0):
    t = np.arange(int(duration_s * rate)) / rate
    wave = 0.5 * 32767.0 * np.sin(2 * np.pi * freq * t)
    data = np.tile(wave[:, None], (1, channels))
    return AudioSegment.from_float(data.T, rate)


def test_wav_roundtrip():
    seg = _segment(channels=2)
    buf = seg.export(io.BytesIO(), format="wav")
    loaded = AudioSegment.from_wav(buf)
    assert loaded.frame_rate == seg.frame_rate
    assert loaded.channels == 2
    np.testing.assert_array_equal(loaded.raw_data, seg.raw_data)


def test_from_file_sniffs_wav():
    seg = _segment()
    buf = seg.export(io.BytesIO(), format="wav")
    loaded = AudioSegment.from_file(buf)
    assert loaded.frame_rate == 44100


def test_ms_slicing():
    seg = _segment(duration_s=2.0)
    clip = seg[250:750]
    assert abs(clip.duration_ms - 500) < 1
    assert clip.frame_count == int(0.5 * 44100)


def test_split_to_mono_and_set_channels():
    seg = _segment(channels=2)
    monos = seg.split_to_mono()
    assert len(monos) == 2
    assert monos[0].channels == 1
    np.testing.assert_array_equal(monos[0].raw_data[:, 0], seg.raw_data[:, 0])

    up = monos[0].set_channels(2)
    assert up.channels == 2
    np.testing.assert_array_equal(up.raw_data[:, 0], up.raw_data[:, 1])


def test_gain_and_dbfs():
    seg = _segment()
    quieter = seg.apply_gain(-6.0)
    assert quieter.dBFS == pytest.approx(seg.dBFS - 6.0, abs=0.1)


def test_append_crossfade_duration():
    a = _segment(duration_s=1.0)
    b = _segment(duration_s=1.0, freq=880.0)
    joined = a.append(b, crossfade=200)
    assert abs(joined.duration_seconds - 1.8) < 0.01


def test_overlay_keeps_length():
    a = _segment(duration_s=1.0)
    b = _segment(duration_s=0.4, freq=880.0)
    mixed = a.overlay(b)
    assert mixed.frame_count == a.frame_count


def test_resample():
    seg = _segment(duration_s=1.0, rate=44100)
    down = seg.set_frame_rate(22050)
    assert down.frame_rate == 22050
    assert abs(down.duration_seconds - 1.0) < 0.01
    # tone survives resampling: correlation with the ideal 440 Hz tone
    t = np.arange(down.frame_count) / 22050
    ref = np.sin(2 * np.pi * 440.0 * t)
    got = down.raw_data[:, 0].astype(np.float64)
    corr = np.abs(np.dot(ref, got)) / (np.linalg.norm(ref) * np.linalg.norm(got) + 1e-9)
    assert corr > 0.98


def test_stitch_segments():
    segs = [_segment(duration_s=1.0) for _ in range(3)]
    out = audio_util.stitch_segments(segs, crossfade_s=0.2)
    assert abs(out.duration_seconds - (3.0 - 0.4)) < 0.02


def test_overlay_segments():
    segs = [_segment(duration_s=1.0), _segment(duration_s=1.0, freq=660.0)]
    out = audio_util.overlay_segments(segs)
    assert out.frame_count == segs[0].frame_count


def test_apply_filters_levels():
    seg = _segment().apply_gain(-30)
    out = audio_util.apply_filters(seg, compression=False)
    # normalize(headroom=0.1) should bring the peak near full scale
    assert out.max_dBFS > -1.0


def test_apply_filters_with_compression():
    seg = _segment()
    out = audio_util.apply_filters(seg, compression=True)
    assert out.frame_count == seg.frame_count
    assert out.max_dBFS > -1.0


def test_silent():
    seg = AudioSegment.silent(500, 44100, channels=2)
    assert seg.frame_count == 22050
    assert seg.dBFS == -float("inf")
