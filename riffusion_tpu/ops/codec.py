"""
In-graph (jnp) spectrogram <-> image codec math.

Mirrors the uint8 codec in util/image_util.py (power curve, invert, Y-flip,
channel packing) but stays on device, so the fused VAE-decode -> audio path
(riffusion_pipeline) never round-trips through PIL. Quantization to uint8 is
applied in-graph to keep numerics identical to the host codec.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def quantize_image(spectrogram: Array, power: float) -> Array:
    """(C, F, T) magnitudes -> (C, F, T) uint8 codes (no flip/packing)."""
    max_value = jnp.max(spectrogram)
    data = spectrogram / jnp.maximum(max_value, 1e-20)
    data = jnp.power(data, power)
    data = 255.0 - data * 255.0
    return jnp.clip(data, 0, 255).astype(jnp.uint8)


def spectrogram_from_codes(codes: Array, power: float, max_value: float) -> Array:
    """(C, F, T) uint8 codes -> (C, F, T) float32 magnitudes."""
    data = (255.0 - codes.astype(jnp.float32)) / 255.0
    data = jnp.power(data, 1.0 / power)
    return data * max_value


def rgb_image_from_codes(codes: Array) -> Array:
    """(C, F, T) uint8 codes -> (F, T, 3) uint8 image with Y-flip and the
    mono->RGB / stereo->(0,G,B) packing of util/image_util.py."""
    c = codes.shape[0]
    if c == 1:
        rgb = jnp.repeat(codes.transpose(1, 2, 0), 3, axis=-1)
    elif c == 2:
        zeros = jnp.zeros_like(codes[0])
        rgb = jnp.stack([zeros, codes[0], codes[1]], axis=-1)
    else:
        raise NotImplementedError(f"Unsupported number of channels: {c}")
    return rgb[::-1, :, :]


def codes_from_rgb_image(image: Array, stereo: bool) -> Array:
    """(F, T, 3) uint8 image -> (C, F, T) uint8 codes (undo flip/packing)."""
    flipped = image[::-1, :, :]
    data = flipped.transpose(2, 0, 1)
    if stereo:
        return data[1:3]
    return data[0:1]


def codes_from_vae_output(decoded: Array, stereo: bool) -> Array:
    """Map VAE decoder output in [-1, 1], NHWC (1, F, T, 3) -> (C, F, T) uint8
    codes, replicating the reference's numpy->PIL->numpy round trip
    (riffusion_pipeline.py:430-434 then image_util.spectrogram_from_image)."""
    img01 = jnp.clip(decoded[0] / 2.0 + 0.5, 0.0, 1.0)
    u8 = jnp.round(img01 * 255.0).astype(jnp.uint8)
    return codes_from_rgb_image(u8, stereo=stereo)
