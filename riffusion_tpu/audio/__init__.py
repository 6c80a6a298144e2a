"""Host-side audio engine: segments, codecs, filters, resampling.

This subsystem replaces the reference's pydub+ffmpeg dependency
(reference riffusion/util/audio_util.py) with a self-contained numpy/C++
implementation. Device DSP lives in `riffusion_tpu.ops`; this package is the
host I/O boundary (files, codecs, int16 conversion, stitching).
"""

from riffusion_tpu.audio.segment import AudioSegment  # noqa: F401

__all__ = ["AudioSegment"]
