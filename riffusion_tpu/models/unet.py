"""
UNet2DCondition in Flax — the denoiser of the Stable Diffusion v1 family
(riffusion-v1 is a fine-tune; loaded by the reference at
riffusion_pipeline.py:92-121). The reference accelerated this with a traced
TorchScript artifact (riffusion_pipeline.py:127-171); here `jax.jit` over the
whole denoise scan *is* the trace, with XLA fusing the schedule math in.

NHWC everywhere; compute dtype bf16 on TPU with fp32 GroupNorm/softmax.
"""

from __future__ import annotations

import dataclasses
import typing as T

import flax.linen as nn
import jax
import jax.numpy as jnp

from riffusion_tpu.models.layers import (
    Downsample2D,
    ResnetBlock2D,
    TimestepEmbedding,
    Transformer2D,
    Upsample2D,
    precise_dtype,
    timestep_embedding,
)

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    """SD v1 geometry by default; `tiny()` for tests/benchmarks without weights."""

    sample_size: int = 64
    in_channels: int = 4
    out_channels: int = 4
    block_out_channels: T.Tuple[int, ...] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    cross_attention_dim: int = 768
    attention_head_dim: int = 8  # number of heads (diffusers v1 naming quirk)
    # Which down blocks have cross-attention (SD v1: all but the last)
    cross_attn_blocks: T.Tuple[bool, ...] = (True, True, True, False)
    norm_num_groups: int = 32
    freq_shift: float = 0.0
    flip_sin_to_cos: bool = True

    @classmethod
    def tiny(cls) -> "UNetConfig":
        return cls(
            sample_size=8,
            block_out_channels=(32, 64, 64, 64),
            layers_per_block=1,
            cross_attention_dim=64,
            attention_head_dim=2,
        )


class CrossAttnDownBlock(nn.Module):
    cfg: UNetConfig
    out_channels: int
    add_downsample: bool
    has_attn: bool
    dtype: jnp.dtype
    flash: bool = True

    @nn.compact
    def __call__(self, x: Array, temb: Array, context: Array):
        skips = []
        for i in range(self.cfg.layers_per_block):
            x = ResnetBlock2D(
                self.out_channels, self.dtype, self.cfg.norm_num_groups,
                name=f"resnets_{i}",
            )(x, temb)
            if self.has_attn:
                x = Transformer2D(
                    self.cfg.attention_head_dim, self.dtype, flash=self.flash,
                    groups=self.cfg.norm_num_groups, name=f"attentions_{i}",
                )(x, context)
            skips.append(x)
        if self.add_downsample:
            x = Downsample2D(self.out_channels, self.dtype, name="downsamplers_0")(x)
            skips.append(x)
        return x, skips


class CrossAttnUpBlock(nn.Module):
    cfg: UNetConfig
    out_channels: int
    add_upsample: bool
    has_attn: bool
    dtype: jnp.dtype
    flash: bool = True

    @nn.compact
    def __call__(self, x: Array, skips: T.List[Array], temb: Array, context: Array,
                 upsample_to: T.Optional[T.Tuple[int, int]] = None):
        for i in range(self.cfg.layers_per_block + 1):
            x = jnp.concatenate([x, skips.pop()], axis=-1)
            x = ResnetBlock2D(
                self.out_channels, self.dtype, self.cfg.norm_num_groups,
                name=f"resnets_{i}",
            )(x, temb)
            if self.has_attn:
                x = Transformer2D(
                    self.cfg.attention_head_dim, self.dtype, flash=self.flash,
                    groups=self.cfg.norm_num_groups, name=f"attentions_{i}",
                )(x, context)
        if self.add_upsample:
            x = Upsample2D(self.out_channels, self.dtype, name="upsamplers_0")(
                x, out_size=upsample_to
            )
        return x


class MidBlock(nn.Module):
    cfg: UNetConfig
    channels: int
    dtype: jnp.dtype
    flash: bool = True

    @nn.compact
    def __call__(self, x: Array, temb: Array, context: Array) -> Array:
        x = ResnetBlock2D(
            self.channels, self.dtype, self.cfg.norm_num_groups, name="resnets_0"
        )(x, temb)
        x = Transformer2D(
            self.cfg.attention_head_dim, self.dtype, flash=self.flash,
            groups=self.cfg.norm_num_groups, name="attentions_0",
        )(x, context)
        x = ResnetBlock2D(
            self.channels, self.dtype, self.cfg.norm_num_groups, name="resnets_1"
        )(x, temb)
        return x


class UNet2DCondition(nn.Module):
    """Text-conditioned denoising UNet.

    __call__(latents NHWC (B,H,W,C), timesteps (B,) or scalar,
             encoder_hidden_states (B, seq, cross_dim)) -> noise prediction.
    """

    cfg: UNetConfig
    dtype: jnp.dtype = jnp.float32
    #: allow the Pallas flash-attention kernel (set False when this module
    #: will be jitted for CPU on a TPU-default host; see layers.Attention)
    flash: bool = True

    @nn.compact
    def __call__(self, sample: Array, timesteps: Array, encoder_hidden_states: Array) -> Array:
        cfg = self.cfg
        if timesteps.ndim == 0:
            timesteps = jnp.broadcast_to(timesteps, (sample.shape[0],))
        context = encoder_hidden_states.astype(self.dtype)

        temb_dim = cfg.block_out_channels[0] * 4
        t_emb = timestep_embedding(
            timesteps,
            cfg.block_out_channels[0],
            flip_sin_to_cos=cfg.flip_sin_to_cos,
            downscale_freq_shift=cfg.freq_shift,
            dtype=precise_dtype(self.dtype),
        )
        temb = TimestepEmbedding(temb_dim, self.dtype, name="time_embedding")(t_emb)

        x = nn.Conv(
            cfg.block_out_channels[0], (3, 3), padding=((1, 1), (1, 1)),
            dtype=self.dtype, name="conv_in",
        )(sample.astype(self.dtype))

        skips: T.List[Array] = [x]
        num_blocks = len(cfg.block_out_channels)
        for b in range(num_blocks):
            x, block_skips = CrossAttnDownBlock(
                cfg,
                cfg.block_out_channels[b],
                add_downsample=(b != num_blocks - 1),
                has_attn=cfg.cross_attn_blocks[b],
                dtype=self.dtype,
                flash=self.flash,
                name=f"down_blocks_{b}",
            )(x, temb, context)
            skips.extend(block_skips)

        x = MidBlock(cfg, cfg.block_out_channels[-1], self.dtype, flash=self.flash,
                     name="mid_block")(
            x, temb, context
        )

        for b in reversed(range(num_blocks)):
            # skips for this block: layers_per_block+1 entries
            take = cfg.layers_per_block + 1
            block_skips, skips = skips[-take:], skips[:-take]
            # Upsample to the spatial size of the next block's skip (handles
            # odd dims at intermediate resolutions for /32-but-not-/64 images,
            # matching diffusers' forward_upsample_size behavior).
            upsample_to = skips[-1].shape[1:3] if skips else None
            x = CrossAttnUpBlock(
                cfg,
                cfg.block_out_channels[b],
                add_upsample=(b != 0),
                has_attn=cfg.cross_attn_blocks[b],
                dtype=self.dtype,
                flash=self.flash,
                name=f"up_blocks_{num_blocks - 1 - b}",
            )(x, list(block_skips), temb, context, upsample_to=upsample_to)

        x = nn.GroupNorm(num_groups=cfg.norm_num_groups, epsilon=1e-5, name="conv_norm_out")(x)
        x = nn.silu(x).astype(self.dtype)
        x = nn.Conv(
            cfg.out_channels, (3, 3), padding=((1, 1), (1, 1)),
            dtype=precise_dtype(self.dtype), name="conv_out",
        )(x)
        return x
