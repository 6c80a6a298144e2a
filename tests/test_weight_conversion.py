"""
Torch -> Flax weight conversion correctness.

Strategy: enumerate the exact parameter names a diffusers/transformers torch
checkpoint contains (generated here independently, following the published
naming conventions), synthesize tensors of the right torch-layout shapes from
the Flax tree, convert, and assert the converted tree is exactly the tree the
Flax modules initialize — a bijection with matching shapes. This catches any
renaming or transpose drift without needing real weights.
"""

import zlib
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from riffusion_tpu.models.clip import CLIPTextConfig, CLIPTextModel
from riffusion_tpu.models.unet import UNet2DCondition, UNetConfig
from riffusion_tpu.models.vae import AutoencoderKL, VAEConfig
from riffusion_tpu.models.weights import convert_torch_state_dict


def _flatten(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flatten(v, prefix + (k,)))
        else:
            # keep abstract leaves (jax.eval_shape ShapeDtypeStructs) intact:
            # np.asarray would collapse them to 0-d object arrays
            out["/".join(prefix + (k,))] = v if hasattr(v, "shape") else np.asarray(v)
    return out


def _torch_shape(flax_path: str, arr) -> tuple:
    """Inverse layout transform: the torch-side shape for a flax leaf.
    Works from .shape alone so abstract leaves (jax.eval_shape output)
    are accepted too."""
    leaf = flax_path.rsplit("/", 1)[-1]
    s = tuple(arr.shape)
    if leaf == "kernel" and len(s) == 4:
        return (s[3], s[2], s[0], s[1])  # HWIO -> OIHW
    if leaf == "kernel" and len(s) == 2:
        return (s[1], s[0])
    return s


# ------------------------------------------------------------- name generators


def _torch_unet_keys(cfg: UNetConfig):
    """Diffusers UNet2DConditionModel state-dict keys for this config."""
    keys = {}

    def conv(name, has_bias=True):
        keys[f"{name}.weight"] = "conv"
        if has_bias:
            keys[f"{name}.bias"] = "bias"

    def linear(name, bias=True):
        keys[f"{name}.weight"] = "linear"
        if bias:
            keys[f"{name}.bias"] = "bias"

    def norm(name):
        keys[f"{name}.weight"] = "norm"
        keys[f"{name}.bias"] = "bias"

    def resnet(p, in_ch, out_ch, temb=True):
        norm(f"{p}.norm1")
        conv(f"{p}.conv1")
        if temb:
            linear(f"{p}.time_emb_proj")
        norm(f"{p}.norm2")
        conv(f"{p}.conv2")
        if in_ch != out_ch:
            conv(f"{p}.conv_shortcut")

    def transformer(p):
        norm(f"{p}.norm")
        conv(f"{p}.proj_in")
        b = f"{p}.transformer_blocks.0"
        for a in ("attn1", "attn2"):
            for t in ("to_q", "to_k", "to_v"):
                linear(f"{b}.{a}.{t}", bias=False)
            linear(f"{b}.{a}.to_out.0")
        norm(f"{b}.norm1")
        norm(f"{b}.norm2")
        norm(f"{b}.norm3")
        linear(f"{b}.ff.net.0.proj")
        linear(f"{b}.ff.net.2")
        conv(f"{p}.proj_out")

    conv("conv_in")
    linear("time_embedding.linear_1")
    linear("time_embedding.linear_2")

    chans = cfg.block_out_channels
    in_ch = chans[0]
    n = len(chans)
    for bidx in range(n):
        out_ch = chans[bidx]
        for i in range(cfg.layers_per_block):
            resnet(f"down_blocks.{bidx}.resnets.{i}", in_ch if i == 0 else out_ch, out_ch)
            if cfg.cross_attn_blocks[bidx]:
                transformer(f"down_blocks.{bidx}.attentions.{i}")
        if bidx != n - 1:
            conv(f"down_blocks.{bidx}.downsamplers.0.conv")
        in_ch = out_ch

    resnet("mid_block.resnets.0", chans[-1], chans[-1])
    transformer("mid_block.attentions.0")
    resnet("mid_block.resnets.1", chans[-1], chans[-1])

    for uidx, bidx in enumerate(reversed(range(n))):
        out_ch = chans[bidx]
        for i in range(cfg.layers_per_block + 1):
            # skip-concat always changes channel count -> shortcut always present
            resnet(f"up_blocks.{uidx}.resnets.{i}", -1, out_ch)
            if cfg.cross_attn_blocks[bidx]:
                transformer(f"up_blocks.{uidx}.attentions.{i}")
        if bidx != 0:
            conv(f"up_blocks.{uidx}.upsamplers.0.conv")

    norm("conv_norm_out")
    conv("conv_out")
    return keys


def _torch_vae_keys(cfg: VAEConfig):
    keys = {}

    def conv(name):
        keys[f"{name}.weight"] = "conv"
        keys[f"{name}.bias"] = "bias"

    def linear(name):
        keys[f"{name}.weight"] = "linear"
        keys[f"{name}.bias"] = "bias"

    def norm(name):
        keys[f"{name}.weight"] = "norm"
        keys[f"{name}.bias"] = "bias"

    def resnet(p, in_ch, out_ch):
        norm(f"{p}.norm1")
        conv(f"{p}.conv1")
        norm(f"{p}.norm2")
        conv(f"{p}.conv2")
        if in_ch != out_ch:
            conv(f"{p}.conv_shortcut")

    chans = cfg.block_out_channels
    n = len(chans)

    conv("encoder.conv_in")
    in_ch = chans[0]
    for b in range(n):
        for i in range(cfg.layers_per_block):
            resnet(f"encoder.down_blocks.{b}.resnets.{i}", in_ch if i == 0 else chans[b], chans[b])
        if b != n - 1:
            conv(f"encoder.down_blocks.{b}.downsamplers.0.conv")
        in_ch = chans[b]
    resnet("encoder.mid_block.resnets.0", chans[-1], chans[-1])
    norm("encoder.mid_block.attentions.0.group_norm")
    for t in ("to_q", "to_k", "to_v"):
        linear(f"encoder.mid_block.attentions.0.{t}")
    linear("encoder.mid_block.attentions.0.to_out.0")
    resnet("encoder.mid_block.resnets.1", chans[-1], chans[-1])
    norm("encoder.conv_norm_out")
    conv("encoder.conv_out")
    conv("quant_conv")

    conv("post_quant_conv")
    conv("decoder.conv_in")
    resnet("decoder.mid_block.resnets.0", chans[-1], chans[-1])
    norm("decoder.mid_block.attentions.0.group_norm")
    for t in ("to_q", "to_k", "to_v"):
        linear(f"decoder.mid_block.attentions.0.{t}")
    linear("decoder.mid_block.attentions.0.to_out.0")
    resnet("decoder.mid_block.resnets.1", chans[-1], chans[-1])
    rev = list(reversed(chans))
    in_ch = rev[0]
    for b in range(n):
        for i in range(cfg.layers_per_block + 1):
            resnet(f"decoder.up_blocks.{b}.resnets.{i}", in_ch if i == 0 else rev[b], rev[b])
        if b != n - 1:
            conv(f"decoder.up_blocks.{b}.upsamplers.0.conv")
        in_ch = rev[b]
    norm("decoder.conv_norm_out")
    conv("decoder.conv_out")
    return keys


def _torch_clip_keys(cfg: CLIPTextConfig):
    keys = {}
    keys["text_model.embeddings.token_embedding.weight"] = "embed"
    keys["text_model.embeddings.position_embedding.weight"] = "embed"
    keys["text_model.embeddings.position_ids"] = "skip"
    for i in range(cfg.num_layers):
        p = f"text_model.encoder.layers.{i}"
        for t in ("q_proj", "k_proj", "v_proj", "out_proj"):
            keys[f"{p}.self_attn.{t}.weight"] = "linear"
            keys[f"{p}.self_attn.{t}.bias"] = "bias"
        for t in ("layer_norm1", "layer_norm2"):
            keys[f"{p}.{t}.weight"] = "norm"
            keys[f"{p}.{t}.bias"] = "bias"
        for t in ("fc1", "fc2"):
            keys[f"{p}.mlp.{t}.weight"] = "linear"
            keys[f"{p}.mlp.{t}.bias"] = "bias"
    keys["text_model.final_layer_norm.weight"] = "norm"
    keys["text_model.final_layer_norm.bias"] = "bias"
    return keys


# --------------------------------------------------------------------- cases


@pytest.mark.parametrize(
    "kind",
    ["unet", "vae", "clip"],
)
def test_conversion_bijection(kind):
    key = jax.random.PRNGKey(0)
    # the test consumes only the param tree STRUCTURE and leaf shapes, so
    # abstract init (eval_shape, no XLA compile) replaces the real one
    if kind == "unet":
        cfg = UNetConfig.tiny()
        module = UNet2DCondition(cfg, dtype=jnp.float32)
        flax_params = jax.eval_shape(
            lambda: module.init(
                key,
                jnp.zeros((1, 8, 8, 4)),
                jnp.zeros((1,), jnp.int32),
                jnp.zeros((1, 77, cfg.cross_attention_dim)),
            )["params"]
        )
        torch_keys = _torch_unet_keys(cfg)
    elif kind == "vae":
        cfg = VAEConfig.tiny()
        module = AutoencoderKL(cfg, dtype=jnp.float32)
        flax_params = jax.eval_shape(
            lambda: module.init(key, jnp.zeros((1, 64, 64, 3)), key)["params"]
        )
        torch_keys = _torch_vae_keys(cfg)
    else:
        cfg = CLIPTextConfig.tiny()
        module = CLIPTextModel(cfg, dtype=jnp.float32)
        flax_params = jax.eval_shape(
            lambda: module.init(key, jnp.zeros((1, 77), jnp.int32))["params"]
        )
        torch_keys = _torch_clip_keys(cfg)

    flat_flax = _flatten(flax_params)

    # Build a fake torch state dict with unique values so we can verify the
    # value mapping, using the flax tree for shapes (via the inverse layout).
    # First convert names only to find the expected flax target of each key.
    probe = {k: np.zeros((1,)) for k in torch_keys}
    # real tensors:
    state_dict = {}
    for i, (tk, tag) in enumerate(sorted(torch_keys.items())):
        if tag == "skip":
            state_dict[tk] = np.zeros((1, 77))
            continue
        state_dict[tk] = None  # fill below after we know the target

    converted_names = convert_torch_state_dict(
        {k: np.zeros((2, 2, 3, 3)) if v == "conv" else np.zeros((2, 2)) if v in ("linear", "embed") else np.zeros((2,))
         for k, v in torch_keys.items() if v != "skip"},
        kind,
    )
    got_paths = set(_flatten(converted_names).keys())
    want_paths = set(flat_flax.keys())

    missing = sorted(want_paths - got_paths)
    extra = sorted(got_paths - want_paths)
    assert not missing, f"{kind}: flax params not produced by conversion: {missing[:10]}"
    assert not extra, f"{kind}: converted keys with no flax home: {extra[:10]}"

    # Now verify layout/shape: synthesize torch tensors with the exact
    # inverse-transformed shapes and check converted shapes match flax.
    state_dict = {}
    path_by_torch_key = {}
    for tk, tag in torch_keys.items():
        if tag == "skip":
            state_dict[tk] = np.zeros((1, 77), np.float32)
            continue
        single = convert_torch_state_dict({tk: np.zeros((2, 2, 3, 3)) if tag == "conv" else np.zeros((2, 2)) if tag in ("linear", "embed") else np.zeros((2,))}, kind)
        (path,) = _flatten(single).keys()
        path_by_torch_key[tk] = path
        arr = flat_flax[path]
        state_dict[tk] = np.random.default_rng(zlib.crc32(tk.encode())).standard_normal(
            _torch_shape(path, arr)
        ).astype(np.float32)

    converted = _flatten(convert_torch_state_dict(state_dict, kind))
    for path, arr in flat_flax.items():
        assert converted[path].shape == arr.shape, (
            f"{kind}: shape mismatch at {path}: {converted[path].shape} vs {arr.shape}"
        )

    # Spot-check a value round trip (conv + linear transpose correctness)
    for tk, path in path_by_torch_key.items():
        src = state_dict[tk]
        dst = converted[path]
        leaf = path.rsplit("/", 1)[-1]
        if src.ndim == 4:
            np.testing.assert_array_equal(dst, src.transpose(2, 3, 1, 0))
        elif src.ndim == 2 and leaf == "kernel":
            np.testing.assert_array_equal(dst, src.T)
        else:
            np.testing.assert_array_equal(dst, src)
