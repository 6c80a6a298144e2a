"""
Shared Flax building blocks for the diffusion stack (resnet blocks, attention,
transformer blocks, up/downsampling, timestep embeddings).

Architecture matches Stable Diffusion v1 (what the riffusion-v1 checkpoint
is a fine-tune of; the reference loads it through diffusers at
riffusion_pipeline.py:92-102). Implementation is TPU-first: NHWC convs,
einsum attention with fp32 softmax, GroupNorm in fp32, compute dtype
configurable (bf16 on TPU).
"""

from __future__ import annotations

import typing as T

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def precise_dtype(dtype: jnp.dtype) -> jnp.dtype:
    """Accumulation/softmax dtype for a module compute dtype: fp32 for the
    fp32/bf16 TPU paths (identical HLO to a hard fp32 pin), fp64 when a module
    runs in fp64 (the roundoff-free wiring oracle in tests)."""
    return jnp.promote_types(jnp.float32, dtype)


def timestep_embedding(
    timesteps: Array,
    dim: int,
    max_period: float = 10000.0,
    flip_sin_to_cos: bool = True,
    downscale_freq_shift: float = 0.0,
    dtype: jnp.dtype = jnp.float32,
) -> Array:
    """Sinusoidal timestep embedding, (B,) -> (B, dim). Matches the SD v1
    convention (flip_sin_to_cos=True, freq_shift=0)."""
    half = dim // 2
    exponent = -np.log(max_period) * jnp.arange(half, dtype=dtype)
    exponent = exponent / (half - downscale_freq_shift)
    freqs = jnp.exp(exponent)
    args = timesteps.astype(dtype)[:, None] * freqs[None, :]
    sin, cos = jnp.sin(args), jnp.cos(args)
    emb = jnp.concatenate([cos, sin] if flip_sin_to_cos else [sin, cos], axis=-1)
    if dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


class TimestepEmbedding(nn.Module):
    """Two-layer MLP lifting the sinusoidal embedding to the temb dimension."""

    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, t_emb: Array) -> Array:
        x = nn.Dense(self.dim, dtype=self.dtype, name="linear_1")(t_emb.astype(self.dtype))
        x = nn.silu(x)
        return nn.Dense(self.dim, dtype=self.dtype, name="linear_2")(x)


class ResnetBlock2D(nn.Module):
    """GN -> silu -> conv -> (+temb) -> GN -> silu -> conv, with skip."""

    out_channels: int
    dtype: jnp.dtype = jnp.float32
    groups: int = 32
    #: diffusers uses norm eps 1e-5 in the UNet (norm_eps) but 1e-6 in the
    #: VAE encoder/decoder resnets — both matter for converted-weight parity
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: Array, temb: T.Optional[Array] = None) -> Array:
        residual = x
        h = nn.GroupNorm(num_groups=self.groups, epsilon=self.eps, name="norm1")(x)
        h = nn.silu(h).astype(self.dtype)
        h = nn.Conv(self.out_channels, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype,
                    name="conv1")(h)
        if temb is not None:
            temb_proj = nn.Dense(self.out_channels, dtype=self.dtype, name="time_emb_proj")(
                nn.silu(temb).astype(self.dtype)
            )
            h = h + temb_proj[:, None, None, :]
        h = nn.GroupNorm(num_groups=self.groups, epsilon=self.eps, name="norm2")(h)
        h = nn.silu(h).astype(self.dtype)
        h = nn.Conv(self.out_channels, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype,
                    name="conv2")(h)
        if residual.shape[-1] != self.out_channels:
            residual = nn.Conv(
                self.out_channels, (1, 1), dtype=self.dtype, name="conv_shortcut"
            )(residual)
        return (residual + h).astype(self.dtype)


import os as _os

# Attention inner-math implementation (overridable for benchmarking):
#  "flash": Pallas TPU flash attention with 512-block tiling for large-seq
#           self-attention (avoids materializing the fp32 S x S logits that
#           dominate the UNet step: 38.2 -> 22.5 ms/step on v5e); non-eligible
#           sites (cross-attention, short seq, CPU) fall back to "pref"
#  "pref":  einsum with fp32 MXU accumulation + fp32 softmax (no pre-softmax
#           cast op, so XLA fuses the softmax chain)
#  "dpa":   jax.nn.dot_product_attention (library fused attention)
#  "cast":  naive bf16 einsum with explicit fp32 cast around softmax
ATTENTION_IMPL = _os.environ.get("RIFFUSION_TPU_ATTENTION", "flash")

# Einsum variant used at non-flash sites (the hybrid gate's fallback and the
# einsum-window sites). "pref" = (b,s,h,d) layouts; "pret" = merged
# (b,S,H*D) <-> (b,H*D,S) transposes so the attention matmuls see a
# 128-friendly minor dim (S) instead of head_dim (40) — candidate fix for the
# five ~14 ms/step K-transpose kOutput fusions at the seq-4096 sites
# (benchmarks/unet_profile_2026-08-19.json, 24% of the b32 CFG step).
EINSUM_VARIANT = _os.environ.get("RIFFUSION_TPU_EINSUM_VARIANT", "pref")

# Full-row Pallas attention at the einsum-window sites (seq-4096, head_dim
# 40): consumes q/k/v in the (b, s, h*d) layout the projections emit, so the
# five ~14 ms/step (b,s,h,d)->(b,h,d,s) layout copies (24% of the b32 CFG
# step, docs/performance.md) never exist. Isolated microbench
# (benchmarks/rowattn_micro.py, v5e, 2026-08-19): 14.5 ms/site vs einsum's
# 15.7-16.4 — and the in-context einsum additionally pays the layout copy.
# "0" falls back to the einsum variants below at those sites.
ROWATTN = _os.environ.get("RIFFUSION_TPU_ROWATTN", "1") != "0"
ROWATTN_BLOCK_Q = int(_os.environ.get("RIFFUSION_TPU_ROWATTN_BLOCK_Q", "512"))
# A/B arm: bf16 softmax numerator inside the row kernel (~0.4% per-weight
# error, fp32 row sums). Measured exactly neutral at the serving shape
# (benchmarks/rowattn_micro.json 2026-08-19: 14.31-14.37 ms both arms — the
# kernel is MXU-bound, not VPU-bound), so it stays default-off.
ROWATTN_EXP_BF16 = _os.environ.get("RIFFUSION_TPU_ROWATTN_EXP_BF16", "0") != "0"

# Flash-gate tunables (read at trace time; module-level so benchmarks can A/B
# them without code edits). Defaults are the measured-best configuration for
# the FULL UNet step on v5e (isolated-op benches mislead — XLA fuses einsum
# attention into its surrounding block):
#   b=2  CFG step: flash 22.4 ms vs einsum-only 53.4 ms (2.4x)
#   b=16 (batch-8 serving): hybrid 116.8 ms ~= einsum-only 118.8 ms
#   b=32 (batch-16 serving): hybrid 238.7 ms vs flash-everywhere 280.2 ms
#        vs einsum-only 244.9 ms  (= 14.9 ms per clip CFG pair)
# benchmarks/attn_sweep.py round-2 confirmation at b=32 (one concurrent CPU
# job, so ~10% above the solo numbers): hybrid 262.8, einsum-cast-bf16 257.3,
# einsum-window>=1024 260.7, flash-512 290.0, flash-256 390.3; flash blocks
# >=1024 exhaust VMEM. The einsum variants are within noise of each other —
# the hybrid default stands, with fp32 softmax kept for accuracy.
# Hybrid = einsum at self-attention sites with seq >= 2048 when b > 8; flash
# elsewhere; head_dim 160 (1280-ch blocks) always einsum (pad-to-256 flash is
# 2x faster in isolation but neutral-to-worse in context).
FLASH_MAX_DPAD = int(_os.environ.get("RIFFUSION_TPU_FLASH_MAX_DPAD", "128"))
EINSUM_SEQ_MIN = int(_os.environ.get("RIFFUSION_TPU_EINSUM_SEQ_MIN", "2048"))
EINSUM_B_LO = int(_os.environ.get("RIFFUSION_TPU_EINSUM_B_LO", "8"))
EINSUM_B_HI = int(_os.environ.get("RIFFUSION_TPU_EINSUM_B_HI", str(1 << 30)))
FLASH_BLOCK_B_MIN = int(_os.environ.get("RIFFUSION_TPU_FLASH_BLOCK_B_MIN", "32"))
FLASH_BLOCK_MAX = int(_os.environ.get("RIFFUSION_TPU_FLASH_BLOCK_MAX", "512"))


class Attention(nn.Module):
    """Multi-head attention (self when context is None). fp32 softmax.

    `flash=False` disables the Pallas TPU kernel regardless of backend — the
    pipeline sets it from its actual target device, because a CPU-jitted
    program on a TPU-default host must not emit TPU pallas_call ops
    (jax.default_backend() alone cannot see the jit target)."""

    num_heads: int
    head_dim: int
    out_dim: int
    dtype: jnp.dtype = jnp.float32
    flash: bool = True

    @nn.compact
    def __call__(self, x: Array, context: T.Optional[Array] = None) -> Array:
        ctx = x if context is None else context
        inner = self.num_heads * self.head_dim
        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(x)
        k = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_k")(ctx)
        v = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_v")(ctx)

        b, lq, _ = q.shape
        lk = k.shape[1]
        scale = 1.0 / np.sqrt(self.head_dim)

        # Full-row Pallas kernel at the einsum-window sites: q/k/v stay in
        # the (b, s, h*d) projection layout end-to-end (no layout copies, no
        # head reshape on the XLA side). Gated exactly like the einsum
        # window it replaces; RIFFUSION_TPU_ROWATTN=0 restores the einsum.
        einsum_window = lq >= EINSUM_SEQ_MIN and EINSUM_B_LO < b < EINSUM_B_HI
        use_rowattn = (
            ROWATTN
            and self.flash  # pallas allowed on the jit target device
            and context is None
            and einsum_window
            and lq % ROWATTN_BLOCK_Q == 0
            and self.head_dim <= 128
            and jax.default_backend() != "cpu"
        )
        if use_rowattn:
            from ..ops.attention import full_row_attention

            out = full_row_attention(
                q, k, v,
                num_heads=self.num_heads, scale=scale, block_q=ROWATTN_BLOCK_Q,
                exp_bf16=ROWATTN_EXP_BF16,
            )
            return nn.Dense(self.out_dim, dtype=self.dtype, name="to_out")(out)

        q = q.reshape(b, lq, self.num_heads, self.head_dim)
        k = k.reshape(b, lk, self.num_heads, self.head_dim)
        v = v.reshape(b, lk, self.num_heads, self.head_dim)

        # zero-padded head size: exact (padded q/k dims contribute nothing to
        # the logits; padded v columns are sliced away). head_dim 160 (the
        # 1280-ch blocks) pads to 256.
        d_pad = 64 if self.head_dim <= 64 else (128 if self.head_dim <= 128 else 256)
        # Flash/einsum choice, measured in-context on the full v5e UNet step
        # (isolated op benches mislead here — XLA fuses einsum attention with
        # its block): einsum wins for batched serving at large seq, flash
        # wins everywhere at interactive batch. Tunables are module-level so
        # benchmarks can A/B them.
        use_flash = (
            self.flash
            and ATTENTION_IMPL == "flash"
            and context is None  # self-attention only (cross kv=77 needs masks)
            and lq >= 256
            and d_pad <= FLASH_MAX_DPAD
            and not einsum_window
            and jax.default_backend() != "cpu"
        )
        if use_flash:
            from jax.experimental.pallas.ops.tpu.flash_attention import (
                BlockSizes,
                flash_attention,
            )

            def prep(x):
                x = x.transpose(0, 2, 1, 3).astype(jnp.bfloat16)  # (B,H,S,D)
                if d_pad != self.head_dim:
                    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, d_pad - self.head_dim)))
                return x

            bq = bk = min(FLASH_BLOCK_MAX, lq)
            block_b = 8 if (b >= FLASH_BLOCK_B_MIN and b % 8 == 0) else 1
            block_sizes = BlockSizes(
                block_q=bq, block_k_major=bk, block_k=bk, block_b=block_b,
                block_q_major_dkv=bq, block_k_major_dkv=bk,
                block_k_dkv=bk, block_q_dkv=bq,
                block_k_major_dq=bk, block_k_dq=bk, block_q_dq=bq,
            )
            out = flash_attention(
                prep(q), prep(k), prep(v), causal=False, sm_scale=scale,
                block_sizes=block_sizes,
            )
            out = out[..., : self.head_dim].transpose(0, 2, 1, 3).astype(self.dtype)
        elif ATTENTION_IMPL == "dpa":
            out = jax.nn.dot_product_attention(q, k, v, scale=scale)
        elif ATTENTION_IMPL == "cast":
            logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
            weights = jax.nn.softmax(
                logits.astype(precise_dtype(self.dtype)), axis=-1
            ).astype(self.dtype)
            out = jnp.einsum("bhqk,bkhd->bqhd", weights, v)
        elif ATTENTION_IMPL == "pret" or EINSUM_VARIANT == "pret":
            # Same math as "pref", but every layout change is a merged
            # (b, S, H*D) <-> (b, H*D, S) transpose — both dims 128-friendly —
            # instead of leaving XLA to materialize (b,h,d,s) copies with a
            # head_dim-wide minor dim.
            def to_bhds(x, s):
                return (
                    x.reshape(b, s, inner)
                    .transpose(0, 2, 1)
                    .reshape(b, self.num_heads, self.head_dim, s)
                )

            qT = to_bhds(q, lq)
            kT = to_bhds(k, lk)
            vT = to_bhds(v, lk)
            logits = (
                jnp.einsum(
                    "bhdq,bhdk->bhqk", qT, kT,
                    preferred_element_type=precise_dtype(self.dtype),
                )
                * scale
            )
            weights = jax.nn.softmax(logits, axis=-1)
            outT = jnp.einsum("bhqk,bhdk->bhdq", weights.astype(vT.dtype), vT)
            out = (
                outT.reshape(b, inner, lq)
                .transpose(0, 2, 1)
                .reshape(b, lq, self.num_heads, self.head_dim)
            )
        else:  # "pref"
            logits = (
                jnp.einsum(
                    "bqhd,bkhd->bhqk", q, k,
                    preferred_element_type=precise_dtype(self.dtype),
                )
                * scale
            )
            weights = jax.nn.softmax(logits, axis=-1)
            out = jnp.einsum("bhqk,bkhd->bqhd", weights.astype(v.dtype), v)
        out = out.reshape(b, lq, inner)
        return nn.Dense(self.out_dim, dtype=self.dtype, name="to_out")(out)


class GEGLUFeedForward(nn.Module):
    """GEGLU feed-forward: Dense(8x) split into value/gate, gelu gate, Dense."""

    dim: int
    dtype: jnp.dtype = jnp.float32
    mult: int = 4

    @nn.compact
    def __call__(self, x: Array) -> Array:
        inner = self.dim * self.mult
        proj = nn.Dense(inner * 2, dtype=self.dtype, name="proj_in")(x)
        value, gate = jnp.split(proj, 2, axis=-1)
        # exact (erf) gelu: diffusers' GEGLU uses F.gelu's default, not the
        # tanh approximation — matters for converted-checkpoint parity
        x = value * nn.gelu(gate, approximate=False)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj_out")(x)


class BasicTransformerBlock(nn.Module):
    """Self-attn -> cross-attn -> GEGLU ff, each pre-LayerNorm + residual."""

    dim: int
    num_heads: int
    dtype: jnp.dtype = jnp.float32
    flash: bool = True

    @nn.compact
    def __call__(self, x: Array, context: Array) -> Array:
        head_dim = self.dim // self.num_heads
        attn1 = Attention(self.num_heads, head_dim, self.dim, self.dtype,
                          flash=self.flash, name="attn1")
        attn2 = Attention(self.num_heads, head_dim, self.dim, self.dtype,
                          flash=self.flash, name="attn2")
        ff = GEGLUFeedForward(self.dim, self.dtype, name="ff")

        x = x + attn1(nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x))
        x = x + attn2(nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x), context)
        x = x + ff(nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm3")(x))
        return x


class Transformer2D(nn.Module):
    """Spatial transformer: GN -> 1x1 conv in -> transformer block(s) on
    flattened tokens -> 1x1 conv out, residual."""

    num_heads: int
    dtype: jnp.dtype = jnp.float32
    depth: int = 1
    flash: bool = True
    groups: int = 32

    @nn.compact
    def __call__(self, x: Array, context: Array) -> Array:
        b, h, w, c = x.shape
        residual = x
        y = nn.GroupNorm(num_groups=self.groups, epsilon=1e-6, name="norm")(x)
        y = nn.Conv(c, (1, 1), dtype=self.dtype, name="proj_in")(y.astype(self.dtype))
        y = y.reshape(b, h * w, c)
        for i in range(self.depth):
            y = BasicTransformerBlock(
                c, self.num_heads, self.dtype, flash=self.flash, name=f"blocks_{i}"
            )(y, context)
        y = y.reshape(b, h, w, c)
        y = nn.Conv(c, (1, 1), dtype=self.dtype, name="proj_out")(y)
        return (y + residual).astype(self.dtype)


class Downsample2D(nn.Module):
    """3x3 stride-2 conv. The UNet uses symmetric padding=1; the VAE encoder
    uses diffusers' asymmetric (0,1) manual pad — both conventions matter for
    exact weight-conversion parity."""

    out_channels: int
    dtype: jnp.dtype = jnp.float32
    symmetric: bool = True

    @nn.compact
    def __call__(self, x: Array) -> Array:
        padding = ((1, 1), (1, 1)) if self.symmetric else ((0, 1), (0, 1))
        return nn.Conv(
            self.out_channels, (3, 3), strides=(2, 2), padding=padding,
            dtype=self.dtype, name="conv",
        )(x)


class Upsample2D(nn.Module):
    """Nearest resize + 3x3 conv. `out_size` overrides the default 2x target
    (needed when the matching skip connection has odd spatial dims)."""

    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, out_size: T.Optional[T.Tuple[int, int]] = None) -> Array:
        b, h, w, c = x.shape
        th, tw = out_size if out_size is not None else (h * 2, w * 2)
        x = jax.image.resize(x, (b, th, tw, c), method="nearest")
        return nn.Conv(
            self.out_channels, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype, name="conv"
        )(x)
