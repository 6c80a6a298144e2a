"""
Pure-torch reference forwards for the SD v1 UNet and VAE, written directly
against the published diffusers architecture semantics (the reference runs
diffusers itself, /root/reference/riffusion/riffusion_pipeline.py:92-102, so
it gets whole-model wiring for free; these functions give the TPU build the
same guarantee).

Implementation notes — everything is `torch.nn.functional` over a diffusers
state dict (no diffusers import, no nn.Module graph), NCHW:

* UNet2DConditionModel: sinusoidal time embedding (flip_sin_to_cos, shift 0)
  -> 2-layer MLP; conv_in; down blocks (resnet [+ spatial transformer]) with
  skip collection after every layer and after each downsampler; mid
  resnet/transformer/resnet; up blocks popping skips in reverse, concatenated
  BEFORE each resnet; nearest-2x upsample + conv; GroupNorm(eps 1e-5) ->
  silu -> conv_out.
* ResnetBlock2D: GN(eps) silu conv1, + time_emb_proj(silu(temb)), GN(eps)
  silu conv2, 1x1 conv_shortcut when channels change. eps: 1e-5 UNet / 1e-6 VAE.
* Transformer2DModel: GN(eps 1e-6) -> 1x1 conv proj_in -> flatten to tokens
  -> BasicTransformerBlock (pre-LN self-attn, cross-attn, GEGLU ff with EXACT
  erf gelu) -> 1x1 conv proj_out, residual.
* AutoencoderKL: encoder (downsamplers use asymmetric (0,1) padding), mid
  block with single-head channel attention (scale 1/sqrt(C)), quant_conv /
  post_quant_conv 1x1, decoder with layers_per_block+1 resnets per up block.

Used by tests/test_model_wiring_oracle.py: load the SAME state dict into
these forwards and into the converted Flax modules, and require matching
outputs — a swapped skip, a misplaced temb, or a wrong upsample position
passes every per-layer oracle but fails here.
"""

from __future__ import annotations

import math
import typing as T

import torch
import torch.nn.functional as F

SD = T.Mapping[str, torch.Tensor]


# ----------------------------------------------------------------- primitives


def _conv(sd: SD, p: str, x, stride=1, padding=1):
    return F.conv2d(x, sd[f"{p}.weight"], sd[f"{p}.bias"], stride=stride, padding=padding)


def _linear(sd: SD, p: str, x):
    return F.linear(x, sd[f"{p}.weight"], sd.get(f"{p}.bias"))


def _gn(sd: SD, p: str, x, groups: int, eps: float):
    return F.group_norm(x, groups, sd[f"{p}.weight"], sd[f"{p}.bias"], eps)


def _ln(sd: SD, p: str, x, eps: float = 1e-5):
    return F.layer_norm(x, x.shape[-1:], sd[f"{p}.weight"], sd[f"{p}.bias"], eps)


def timestep_embedding(timesteps, dim: int, flip_sin_to_cos: bool = True,
                       downscale_freq_shift: float = 0.0, max_period: float = 10000.0,
                       dtype=torch.float32):
    half = dim // 2
    exponent = -math.log(max_period) * torch.arange(half, dtype=dtype)
    exponent = exponent / (half - downscale_freq_shift)
    freqs = torch.exp(exponent)
    args = timesteps.to(dtype)[:, None] * freqs[None, :]
    emb = torch.cat([torch.sin(args), torch.cos(args)], dim=-1)
    if flip_sin_to_cos:
        emb = torch.cat([emb[:, half:], emb[:, :half]], dim=-1)
    return emb


def _resnet(sd: SD, p: str, x, temb=None, groups: int = 32, eps: float = 1e-5):
    residual = x
    h = _conv(sd, f"{p}.conv1", F.silu(_gn(sd, f"{p}.norm1", x, groups, eps)))
    if temb is not None and f"{p}.time_emb_proj.weight" in sd:
        h = h + _linear(sd, f"{p}.time_emb_proj", F.silu(temb))[:, :, None, None]
    h = _conv(sd, f"{p}.conv2", F.silu(_gn(sd, f"{p}.norm2", h, groups, eps)))
    if f"{p}.conv_shortcut.weight" in sd:
        residual = _conv(sd, f"{p}.conv_shortcut", residual, padding=0)
    return residual + h


def _attention(sd: SD, p: str, x, context=None, heads: int = 1):
    ctx = x if context is None else context
    q, k, v = _linear(sd, f"{p}.to_q", x), _linear(sd, f"{p}.to_k", ctx), _linear(sd, f"{p}.to_v", ctx)
    b, lq, inner = q.shape
    d = inner // heads

    def split(t):
        return t.reshape(b, -1, heads, d).permute(0, 2, 1, 3)

    q, k, v = split(q), split(k), split(v)
    weights = (q @ k.transpose(-1, -2) / math.sqrt(d)).softmax(dim=-1)
    out = (weights @ v).permute(0, 2, 1, 3).reshape(b, lq, inner)
    return _linear(sd, f"{p}.to_out.0", out)


def _basic_transformer_block(sd: SD, p: str, x, context, heads: int):
    x = x + _attention(sd, f"{p}.attn1", _ln(sd, f"{p}.norm1", x), heads=heads)
    x = x + _attention(sd, f"{p}.attn2", _ln(sd, f"{p}.norm2", x), context, heads=heads)
    h = _linear(sd, f"{p}.ff.net.0.proj", _ln(sd, f"{p}.norm3", x))
    value, gate = h.chunk(2, dim=-1)
    # diffusers GEGLU uses F.gelu's default (exact erf), not the tanh approx
    return x + _linear(sd, f"{p}.ff.net.2", value * F.gelu(gate))


def _transformer_2d(sd: SD, p: str, x, context, heads: int, groups: int = 32):
    b, c, h, w = x.shape
    residual = x
    y = _gn(sd, f"{p}.norm", x, groups, 1e-6)
    y = _conv(sd, f"{p}.proj_in", y, padding=0)
    y = y.permute(0, 2, 3, 1).reshape(b, h * w, c)
    y = _basic_transformer_block(sd, f"{p}.transformer_blocks.0", y, context, heads)
    y = y.reshape(b, h, w, c).permute(0, 3, 1, 2)
    return _conv(sd, f"{p}.proj_out", y, padding=0) + residual


# ----------------------------------------------------------------------- UNet


@torch.no_grad()
def unet_forward(
    sd: SD,
    sample: torch.Tensor,        # (B, C, H, W)
    timesteps: torch.Tensor,     # (B,)
    context: torch.Tensor,       # (B, seq, cross_dim)
    block_out_channels: T.Sequence[int] = (320, 640, 1280, 1280),
    layers_per_block: int = 2,
    cross_attn_blocks: T.Sequence[bool] = (True, True, True, False),
    attention_head_dim: int = 8,  # = number of heads (diffusers v1 quirk)
    norm_num_groups: int = 32,
    swap_skip_order: bool = False,  # teeth: concat [skip, x] instead of [x, skip]
) -> torch.Tensor:
    groups = norm_num_groups
    heads = attention_head_dim

    def cat_skip(x, skip):
        return torch.cat([skip, x] if swap_skip_order else [x, skip], dim=1)

    t_emb = timestep_embedding(
        timesteps, block_out_channels[0], dtype=sample.dtype
    )
    temb = _linear(sd, "time_embedding.linear_1", t_emb)
    temb = _linear(sd, "time_embedding.linear_2", F.silu(temb))

    x = _conv(sd, "conv_in", sample)

    skips = [x]
    n = len(block_out_channels)
    for b in range(n):
        p = f"down_blocks.{b}"
        for i in range(layers_per_block):
            x = _resnet(sd, f"{p}.resnets.{i}", x, temb, groups)
            if cross_attn_blocks[b]:
                x = _transformer_2d(sd, f"{p}.attentions.{i}", x, context, heads, groups)
            skips.append(x)
        if b != n - 1:
            x = _conv(sd, f"{p}.downsamplers.0.conv", x, stride=2)
            skips.append(x)

    x = _resnet(sd, "mid_block.resnets.0", x, temb, groups)
    x = _transformer_2d(sd, "mid_block.attentions.0", x, context, heads, groups)
    x = _resnet(sd, "mid_block.resnets.1", x, temb, groups)

    for uidx, b in enumerate(reversed(range(n))):
        p = f"up_blocks.{uidx}"
        for i in range(layers_per_block + 1):
            x = cat_skip(x, skips.pop())
            x = _resnet(sd, f"{p}.resnets.{i}", x, temb, groups)
            if cross_attn_blocks[b]:
                x = _transformer_2d(sd, f"{p}.attentions.{i}", x, context, heads, groups)
        if b != 0:
            target = skips[-1].shape[-2:]
            x = F.interpolate(x, size=target, mode="nearest")
            x = _conv(sd, f"{p}.upsamplers.0.conv", x)

    x = F.silu(_gn(sd, "conv_norm_out", x, groups, 1e-5))
    return _conv(sd, "conv_out", x)


# ------------------------------------------------------------------------ VAE


def _vae_attention(sd: SD, p: str, x):
    b, c, h, w = x.shape
    residual = x
    y = _gn(sd, f"{p}.group_norm", x, 32, 1e-6)
    y = y.permute(0, 2, 3, 1).reshape(b, h * w, c)
    y = _attention(sd, p, y, heads=1)
    return residual + y.reshape(b, h, w, c).permute(0, 3, 1, 2)


def _vae_mid(sd: SD, p: str, x, groups: int):
    x = _resnet(sd, f"{p}.resnets.0", x, None, groups, eps=1e-6)
    x = _vae_attention(sd, f"{p}.attentions.0", x)
    return _resnet(sd, f"{p}.resnets.1", x, None, groups, eps=1e-6)


@torch.no_grad()
def vae_encode_moments(
    sd: SD,
    image: torch.Tensor,  # (B, 3, H, W)
    block_out_channels: T.Sequence[int] = (128, 256, 512, 512),
    layers_per_block: int = 2,
    norm_num_groups: int = 32,
) -> T.Tuple[torch.Tensor, torch.Tensor]:
    groups = norm_num_groups
    n = len(block_out_channels)
    x = _conv(sd, "encoder.conv_in", image)
    for b in range(n):
        p = f"encoder.down_blocks.{b}"
        for i in range(layers_per_block):
            x = _resnet(sd, f"{p}.resnets.{i}", x, None, groups, eps=1e-6)
        if b != n - 1:
            # diffusers VAE downsampler: asymmetric (0, 1) pad, stride-2 conv
            x = F.pad(x, (0, 1, 0, 1))
            x = _conv(sd, f"{p}.downsamplers.0.conv", x, stride=2, padding=0)
    x = _vae_mid(sd, "encoder.mid_block", x, groups)
    x = F.silu(_gn(sd, "encoder.conv_norm_out", x, groups, 1e-6))
    x = _conv(sd, "encoder.conv_out", x)
    moments = _conv(sd, "quant_conv", x, padding=0)
    mean, logvar = moments.chunk(2, dim=1)
    return mean, torch.clamp(logvar, -30.0, 20.0)


@torch.no_grad()
def vae_decode(
    sd: SD,
    latents: torch.Tensor,  # (B, latent_ch, h, w)
    block_out_channels: T.Sequence[int] = (128, 256, 512, 512),
    layers_per_block: int = 2,
    norm_num_groups: int = 32,
) -> torch.Tensor:
    groups = norm_num_groups
    n = len(block_out_channels)
    z = _conv(sd, "post_quant_conv", latents, padding=0)
    x = _conv(sd, "decoder.conv_in", z)
    x = _vae_mid(sd, "decoder.mid_block", x, groups)
    for b in range(n):
        p = f"decoder.up_blocks.{b}"
        for i in range(layers_per_block + 1):
            x = _resnet(sd, f"{p}.resnets.{i}", x, None, groups, eps=1e-6)
        if b != n - 1:
            x = F.interpolate(x, scale_factor=2.0, mode="nearest")
            x = _conv(sd, f"{p}.upsamplers.0.conv", x)
    x = F.silu(_gn(sd, "decoder.conv_norm_out", x, groups, 1e-6))
    return _conv(sd, "decoder.conv_out", x)
