"""
Full-model wiring oracles: one synthesized diffusers state dict drives BOTH a
pure-torch reference forward (tests/torch_sd_reference.py, written from the
published diffusers semantics) and the converted Flax modules, and the outputs
must match. Per-layer oracles (tests/test_weight_oracles.py) validate each
layer type; only a whole-model comparison can catch a swapped skip-connection
concat, a temb injected after the wrong norm, or an upsample placed one block
off. The reference gets this guarantee for free by running diffusers itself
(/root/reference/riffusion/riffusion_pipeline.py:92-102).

A deliberate-defect "teeth" test proves the oracle actually bites: the torch
reference run with swapped skip-concat order must NOT match.

Both sides run in float64 (jax.experimental.enable_x64 on the Flax side, a
double state dict on the torch side): a wiring defect changes outputs at O(1)
while fp64 roundoff sits at ~1e-12, so the comparison can never flake the way
an fp32 run can (cross-framework fp32 reduction-order noise on an unlucky
weight draw reached 2.7e-3 — above any tolerance that still has teeth).
Seeding is zlib.crc32 of the key name, stable across processes (builtin hash()
is salted per process).
"""

import zlib

import numpy as np
import pytest

torch = pytest.importorskip("torch")

# fp64 whole-model forwards on both frameworks are multi-minute on one core:
# dedicated CI slow job (ci.yml slow-tests); per-layer oracles stay fast
pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp

enable_x64 = jax.enable_x64

import test_weight_conversion as twc
import torch_sd_reference as ref
from riffusion_tpu.models.unet import UNet2DCondition, UNetConfig
from riffusion_tpu.models.vae import AutoencoderKL, VAEConfig
from riffusion_tpu.models.weights import convert_torch_state_dict


def _synth_state_dict(kind, torch_keys, flat_flax, scale=0.08):
    """Random torch state dict with the exact torch-layout shapes implied by
    the flax tree (same scheme as the disk-checkpoint fixture)."""
    sd = {}
    for tk, tag in torch_keys.items():
        if tag == "skip":
            sd[tk] = np.zeros((1, 77), np.float64)
            continue
        probe = {tk: np.zeros((2, 2, 3, 3)) if tag == "conv"
                 else np.zeros((2, 2)) if tag in ("linear", "embed")
                 else np.zeros((2,))}
        (path,) = twc._flatten(convert_torch_state_dict(probe, kind)).keys()
        shape = twc._torch_shape(path, flat_flax[path])
        rng = np.random.default_rng(zlib.crc32(tk.encode()))
        if tag == "norm":
            # norm scales near 1 keep activations O(1) through the depth
            sd[tk] = 1.0 + rng.standard_normal(shape) * 0.05
        else:
            sd[tk] = rng.standard_normal(shape) * scale
    return sd


@pytest.fixture(scope="module")
def unet_case():
    cfg = UNetConfig.tiny()
    unet = UNet2DCondition(cfg, dtype=jnp.float64, flash=False)
    with enable_x64():
        flax_shapes = jax.eval_shape(
            lambda: unet.init(
                jax.random.PRNGKey(0),
                jnp.zeros((1, cfg.sample_size, cfg.sample_size, cfg.in_channels)),
                jnp.zeros((1,), jnp.int32),
                jnp.zeros((1, 77, cfg.cross_attention_dim)),
            )["params"]
        )
    sd = _synth_state_dict("unet", twc._torch_unet_keys(cfg), twc._flatten(flax_shapes))

    rng = np.random.default_rng(7)
    latents = rng.standard_normal((2, cfg.in_channels, 8, 8))
    timesteps = np.array([500, 10], np.int64)
    context = rng.standard_normal((2, 77, cfg.cross_attention_dim))

    with enable_x64():
        flax_params = convert_torch_state_dict(sd, "unet")
        flax_out = np.asarray(
            unet.apply(
                {"params": flax_params},
                jnp.asarray(latents.transpose(0, 2, 3, 1)),
                jnp.asarray(timesteps, jnp.int32),
                jnp.asarray(context),
            )
        )  # NHWC
    sd_t = {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}
    return cfg, sd_t, latents, timesteps, context, flax_out


def _unet_ref(cfg, sd_t, latents, timesteps, context, **kw):
    out = ref.unet_forward(
        sd_t,
        torch.from_numpy(latents),
        torch.from_numpy(timesteps),
        torch.from_numpy(context),
        block_out_channels=cfg.block_out_channels,
        layers_per_block=cfg.layers_per_block,
        cross_attn_blocks=cfg.cross_attn_blocks,
        attention_head_dim=cfg.attention_head_dim,
        norm_num_groups=cfg.norm_num_groups,
        **kw,
    )
    return out.numpy().transpose(0, 2, 3, 1)  # -> NHWC


def test_unet_full_forward_matches_torch(unet_case):
    cfg, sd_t, latents, timesteps, context, flax_out = unet_case
    want = _unet_ref(cfg, sd_t, latents, timesteps, context)
    np.testing.assert_allclose(flax_out, want, atol=1e-9, rtol=1e-7)


def test_unet_oracle_catches_swapped_skip(unet_case):
    """Teeth: a wrong skip-concat order must fail the oracle decisively."""
    cfg, sd_t, latents, timesteps, context, flax_out = unet_case
    swapped = _unet_ref(cfg, sd_t, latents, timesteps, context, swap_skip_order=True)
    assert np.abs(flax_out - swapped).max() > 1e-2


@pytest.fixture(scope="module")
def vae_case():
    cfg = VAEConfig.tiny()
    vae = AutoencoderKL(cfg, dtype=jnp.float64)
    with enable_x64():
        flax_shapes = jax.eval_shape(
            lambda: vae.init(
                jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, cfg.in_channels)),
                jax.random.PRNGKey(1),
            )["params"]
        )
    sd = _synth_state_dict("vae", twc._torch_vae_keys(cfg), twc._flatten(flax_shapes))
    with enable_x64():
        flax_params = convert_torch_state_dict(sd, "vae")
    return cfg, sd, flax_params, vae


def test_vae_encode_moments_match_torch(vae_case):
    cfg, sd, flax_params, vae = vae_case
    rng = np.random.default_rng(3)
    image = rng.standard_normal((2, cfg.in_channels, 64, 64))

    with enable_x64():
        mean, logvar = vae.apply(
            {"params": flax_params}, jnp.asarray(image.transpose(0, 2, 3, 1)),
            method="encode_moments",
        )
        mean, logvar = np.asarray(mean), np.asarray(logvar)
    sd_t = {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}
    want_mean, want_logvar = ref.vae_encode_moments(
        sd_t, torch.from_numpy(image),
        block_out_channels=cfg.block_out_channels,
        layers_per_block=cfg.layers_per_block,
        norm_num_groups=cfg.norm_num_groups,
    )
    np.testing.assert_allclose(
        mean, want_mean.numpy().transpose(0, 2, 3, 1), atol=1e-9, rtol=1e-7
    )
    np.testing.assert_allclose(
        logvar, want_logvar.numpy().transpose(0, 2, 3, 1), atol=1e-9, rtol=1e-7
    )


def test_vae_decode_matches_torch(vae_case):
    cfg, sd, flax_params, vae = vae_case
    rng = np.random.default_rng(4)
    latents = rng.standard_normal((2, cfg.latent_channels, 8, 8))

    with enable_x64():
        got = np.asarray(
            vae.apply(
                {"params": flax_params}, jnp.asarray(latents.transpose(0, 2, 3, 1)),
                method="decode",
            )
        )
    sd_t = {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}
    want = ref.vae_decode(
        sd_t, torch.from_numpy(latents),
        block_out_channels=cfg.block_out_channels,
        layers_per_block=cfg.layers_per_block,
        norm_num_groups=cfg.norm_num_groups,
    )
    np.testing.assert_allclose(
        got, want.numpy().transpose(0, 2, 3, 1), atol=1e-9, rtol=1e-7
    )
