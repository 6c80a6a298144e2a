"""
AutoencoderKL (VAE) in Flax — SD v1 architecture. Used by the pipeline to
encode seed images into latents (reference riffusion_pipeline.py:255-264) and
decode denoised latents back to spectrogram images (:427-428). NHWC.
"""

from __future__ import annotations

import dataclasses
import typing as T

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from riffusion_tpu.models.layers import (
    Downsample2D,
    ResnetBlock2D,
    Upsample2D,
    precise_dtype,
)

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    in_channels: int = 3
    out_channels: int = 3
    latent_channels: int = 4
    block_out_channels: T.Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    norm_num_groups: int = 32
    scaling_factor: float = 0.18215

    @classmethod
    def tiny(cls) -> "VAEConfig":
        return cls(block_out_channels=(32, 32, 32, 32), layers_per_block=1)


class VAEAttention(nn.Module):
    """Single-head self-attention over spatial tokens (VAE mid block)."""

    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, h, w, c = x.shape
        residual = x
        y = nn.GroupNorm(num_groups=32, epsilon=1e-6, name="group_norm")(x)
        y = y.reshape(b, h * w, c).astype(self.dtype)
        q = nn.Dense(c, dtype=self.dtype, name="to_q")(y)
        k = nn.Dense(c, dtype=self.dtype, name="to_k")(y)
        v = nn.Dense(c, dtype=self.dtype, name="to_v")(y)
        logits = jnp.einsum("bqc,bkc->bqk", q, k) / np.sqrt(c)
        weights = jax.nn.softmax(
            logits.astype(precise_dtype(self.dtype)), axis=-1
        ).astype(self.dtype)
        y = jnp.einsum("bqk,bkc->bqc", weights, v)
        y = nn.Dense(c, dtype=self.dtype, name="to_out")(y)
        return residual + y.reshape(b, h, w, c)


class VAEMidBlock(nn.Module):
    channels: int
    groups: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = ResnetBlock2D(self.channels, self.dtype, self.groups, eps=1e-6, name="resnets_0")(x)
        x = VAEAttention(self.channels, self.dtype, name="attentions_0")(x)
        x = ResnetBlock2D(self.channels, self.dtype, self.groups, eps=1e-6, name="resnets_1")(x)
        return x


class Encoder(nn.Module):
    cfg: VAEConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        cfg = self.cfg
        x = nn.Conv(
            cfg.block_out_channels[0], (3, 3), padding=((1, 1), (1, 1)),
            dtype=self.dtype, name="conv_in",
        )(x.astype(self.dtype))
        for b, out_ch in enumerate(cfg.block_out_channels):
            for i in range(cfg.layers_per_block):
                x = ResnetBlock2D(
                    out_ch, self.dtype, cfg.norm_num_groups, eps=1e-6,
                    name=f"down_blocks_{b}_resnets_{i}",
                )(x)
            if b != len(cfg.block_out_channels) - 1:
                x = Downsample2D(
                    out_ch, self.dtype, symmetric=False,
                    name=f"down_blocks_{b}_downsamplers_0",
                )(x)
        x = VAEMidBlock(
            cfg.block_out_channels[-1], cfg.norm_num_groups, self.dtype, name="mid_block"
        )(x)
        x = nn.GroupNorm(num_groups=cfg.norm_num_groups, epsilon=1e-6, name="conv_norm_out")(x)
        x = nn.silu(x).astype(self.dtype)
        x = nn.Conv(
            2 * cfg.latent_channels, (3, 3), padding=((1, 1), (1, 1)),
            dtype=precise_dtype(self.dtype), name="conv_out",
        )(x)
        # diffusers applies an extra 1x1 "quant_conv" after the encoder
        return nn.Conv(
            2 * cfg.latent_channels, (1, 1),
            dtype=precise_dtype(self.dtype), name="quant_conv",
        )(x)


class Decoder(nn.Module):
    cfg: VAEConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z: Array) -> Array:
        cfg = self.cfg
        z = nn.Conv(
            cfg.latent_channels, (1, 1),
            dtype=precise_dtype(self.dtype), name="post_quant_conv",
        )(z)
        x = nn.Conv(
            cfg.block_out_channels[-1], (3, 3), padding=((1, 1), (1, 1)),
            dtype=self.dtype, name="conv_in",
        )(z.astype(self.dtype))
        x = VAEMidBlock(
            cfg.block_out_channels[-1], cfg.norm_num_groups, self.dtype, name="mid_block"
        )(x)
        reversed_channels = list(reversed(cfg.block_out_channels))
        for b, out_ch in enumerate(reversed_channels):
            for i in range(cfg.layers_per_block + 1):
                x = ResnetBlock2D(
                    out_ch, self.dtype, cfg.norm_num_groups, eps=1e-6,
                    name=f"up_blocks_{b}_resnets_{i}",
                )(x)
            if b != len(reversed_channels) - 1:
                x = Upsample2D(out_ch, self.dtype, name=f"up_blocks_{b}_upsamplers_0")(x)
        x = nn.GroupNorm(num_groups=cfg.norm_num_groups, epsilon=1e-6, name="conv_norm_out")(x)
        x = nn.silu(x).astype(self.dtype)
        return nn.Conv(
            cfg.out_channels, (3, 3), padding=((1, 1), (1, 1)),
            dtype=precise_dtype(self.dtype), name="conv_out",
        )(x)


class AutoencoderKL(nn.Module):
    """VAE with `encode_moments` / `decode` / sampling helpers.

    encode_moments returns (mean, logvar) each (B, H/8, W/8, latent_channels).
    """

    cfg: VAEConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = Encoder(self.cfg, self.dtype)
        self.decoder = Decoder(self.cfg, self.dtype)

    def __call__(self, x: Array, key: Array) -> Array:
        """Full autoencode (train-style); returns reconstruction."""
        mean, logvar = self.encode_moments(x)
        z = self.sample(mean, logvar, key)
        return self.decode(z)

    def encode_moments(self, x: Array) -> T.Tuple[Array, Array]:
        moments = self.encoder(x)
        mean, logvar = jnp.split(moments, 2, axis=-1)
        return mean, jnp.clip(logvar, -30.0, 20.0)

    def sample(self, mean: Array, logvar: Array, key: Array) -> Array:
        std = jnp.exp(0.5 * logvar)
        return mean + std * jax.random.normal(key, mean.shape, dtype=mean.dtype)

    def decode(self, z: Array) -> Array:
        return self.decoder(z)
