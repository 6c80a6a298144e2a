"""
Audio utility functions (host side).

Capability parity with reference riffusion/util/audio_util.py:13-99
(audio_from_waveform / apply_filters / stitch_segments / overlay_segments),
built on the framework's own AudioSegment + native engine instead of
pydub/ffmpeg. The previously-disabled-for-speed dynamic range compressor
(reference audio_util.py:55, "~1.7 seconds on a beefy CPU") is a single-pass
C++ kernel here and cheap enough to enable.
"""

from __future__ import annotations

import typing as T

import numpy as np

from riffusion_tpu.audio import native
from riffusion_tpu.audio.segment import AudioSegment


def audio_from_waveform(
    samples: np.ndarray, sample_rate: int, normalize: bool = False
) -> AudioSegment:
    """
    Convert a float waveform of shape (channels, samples) to an AudioSegment.

    If `normalize`, peak-normalizes to int16 full scale first (matching the
    reference's int16 conversion contract).
    """
    return AudioSegment.from_float(np.asarray(samples), sample_rate, normalize=normalize)


def apply_filters(segment: AudioSegment, compression: bool = False) -> AudioSegment:
    """
    Post-processing chain: optional compression, then level to -12 dBFS and
    peak-normalize with 0.1 dB headroom (same chain as the reference).
    """
    if compression:
        segment = normalize(segment, headroom=0.1)
        segment = segment.apply_gain(-10 - segment.dBFS)
        compressed = native.compress_dynamic_range_int16(
            segment.raw_data,
            segment.frame_rate,
            threshold_db=-20.0,
            ratio=4.0,
            attack_ms=5.0,
            release_ms=50.0,
        )
        segment = AudioSegment(compressed, segment.frame_rate)

    if segment.dBFS == -float("inf"):
        # Silent audio: any gain is a no-op (and +inf gain would NaN).
        return segment

    desired_db = -12
    segment = segment.apply_gain(desired_db - segment.dBFS)
    segment = normalize(segment, headroom=0.1)
    return segment


def normalize(segment: AudioSegment, headroom: float = 0.1) -> AudioSegment:
    """Peak-normalize so the loudest sample sits `headroom` dB below full scale."""
    peak = segment.max_dBFS
    if peak == -float("inf"):
        return segment
    return segment.apply_gain(-headroom - peak)


def stitch_segments(segments: T.Sequence[AudioSegment], crossfade_s: float) -> AudioSegment:
    """Concatenate segments with a crossfade between consecutive pairs."""
    crossfade_ms = int(crossfade_s * 1000)
    combined = segments[0]
    for segment in segments[1:]:
        combined = combined.append(segment, crossfade=crossfade_ms)
    return combined


def overlay_segments(segments: T.Sequence[AudioSegment]) -> AudioSegment:
    """Mix segments on top of each other (result has the first segment's length)."""
    assert len(segments) > 0
    output = segments[0]
    for segment in segments[1:]:
        output = output.overlay(segment)
    return output
