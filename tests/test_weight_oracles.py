"""
Value-level weight-conversion oracles: convert real torch modules and assert
the Flax forward pass reproduces the torch forward pass numerically.

These close the blindness of the name/shape bijection test
(test_weight_conversion.py): a transposed square kernel, swapped q<->k, or a
wrong GroupNorm scale passes every shape check but fails these oracles. The
reference gets this guarantee for free by running diffusers itself
(/root/reference/riffusion/riffusion_pipeline.py:92-102); here torch +
transformers (both installed) provide the ground truth.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from riffusion_tpu.models.clip import CLIPTextConfig, CLIPTextModel
from riffusion_tpu.models.layers import Attention, Downsample2D
from riffusion_tpu.models.weights import convert_torch_state_dict

ATOL = 2e-4  # fp32 forward-pass agreement


def _sd(module):
    return {k: v.detach().numpy() for k, v in module.state_dict().items()}


# ------------------------------------------------------------- CLIP end-to-end


def test_clip_hidden_states_match_torch():
    """Random-weight transformers CLIPTextModel -> convert -> Flax hidden
    states must match torch's last_hidden_state. Covers embeddings, q/k/v/out
    projections (square: catches transposes AND swaps), pre-LN residuals,
    quick-gelu MLP, causal mask, and the final LayerNorm in one shot."""
    transformers = pytest.importorskip("transformers")

    t_cfg = transformers.CLIPTextConfig(
        vocab_size=1024,
        hidden_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=128,
        max_position_embeddings=77,
        hidden_act="quick_gelu",
    )
    torch.manual_seed(0)
    t_model = transformers.CLIPTextModel(t_cfg).eval()
    # default init leaves weights tiny; re-randomize so errors can't hide
    with torch.no_grad():
        for p in t_model.parameters():
            p.normal_(0.0, 0.05)

    ids = np.array([[3, 77, 500, 9, 1, 0, 2, 44] + [0] * 69], dtype=np.int64)
    with torch.no_grad():
        torch_out = t_model(torch.from_numpy(ids)).last_hidden_state.numpy()

    f_cfg = CLIPTextConfig(
        vocab_size=1024, hidden_size=64, num_layers=2, num_heads=4,
        intermediate_size=128, max_positions=77,
    )
    flax_model = CLIPTextModel(f_cfg, dtype=jnp.float32)
    params = convert_torch_state_dict(_sd(t_model), "clip")
    flax_out = np.asarray(flax_model.apply({"params": params}, jnp.asarray(ids, jnp.int32)))

    np.testing.assert_allclose(flax_out, torch_out, atol=ATOL, rtol=1e-3)


def test_clip_oracle_catches_qk_swap():
    """Sanity that the oracle has teeth: swapping q<->k kernels (which the
    shape bijection cannot see — both are square) must change the output."""
    transformers = pytest.importorskip("transformers")
    t_cfg = transformers.CLIPTextConfig(
        vocab_size=256, hidden_size=32, num_hidden_layers=1,
        num_attention_heads=2, intermediate_size=64,
        max_position_embeddings=77, hidden_act="quick_gelu",
    )
    torch.manual_seed(1)
    t_model = transformers.CLIPTextModel(t_cfg).eval()
    # large weights so attention is peaked (near-uniform attention would make
    # a q<->k swap numerically invisible and defang this test)
    with torch.no_grad():
        for p in t_model.parameters():
            p.normal_(0.0, 0.5)
    params = convert_torch_state_dict(_sd(t_model), "clip")

    f_cfg = CLIPTextConfig(vocab_size=256, hidden_size=32, num_layers=1,
                           num_heads=2, intermediate_size=64)
    model = CLIPTextModel(f_cfg, dtype=jnp.float32)
    ids = jnp.asarray([[5, 9, 200, 3] + [0] * 73], jnp.int32)
    good = model.apply({"params": params}, ids)

    attn = params["layers_0"]["self_attn"]
    attn["q_proj"], attn["k_proj"] = attn["k_proj"], attn["q_proj"]
    swapped = model.apply({"params": params}, ids)
    assert float(jnp.max(jnp.abs(good - swapped))) > 1e-3


# ------------------------------------------------------- layout micro-oracles


def test_linear_layout_vs_torch():
    """Square torch Linear through the converter == torch forward (a missing
    .T on a square kernel is shape-silent; values expose it)."""
    torch.manual_seed(2)
    lin = torch.nn.Linear(16, 16)
    x = torch.randn(3, 16)
    want = lin(x).detach().numpy()

    sd = {
        "text_model.encoder.layers.0.mlp.fc1.weight": lin.weight.detach().numpy(),
        "text_model.encoder.layers.0.mlp.fc1.bias": lin.bias.detach().numpy(),
    }
    p = convert_torch_state_dict(sd, "clip")["layers_0"]["fc1"]
    got = np.asarray(x.numpy() @ np.asarray(p["kernel"]) + np.asarray(p["bias"]))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_conv_layout_vs_torch():
    """torch Conv2d (NCHW/OIHW) vs flax conv math (NHWC/HWIO) with the
    converted kernel — catches any wrong transpose axis order."""
    torch.manual_seed(3)
    conv = torch.nn.Conv2d(3, 5, 3, padding=1)
    x = torch.randn(1, 3, 8, 8)
    want = conv(x).detach().numpy()  # (1, 5, 8, 8)

    sd = {"conv_in.weight": conv.weight.detach().numpy(),
          "conv_in.bias": conv.bias.detach().numpy()}
    p = convert_torch_state_dict(sd, "unet")["conv_in"]
    x_nhwc = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    got = jax.lax.conv_general_dilated(
        x_nhwc, jnp.asarray(p["kernel"]), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + jnp.asarray(p["bias"])
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 3, 1, 2), want, atol=1e-4
    )


def test_vae_asymmetric_downsample_vs_torch():
    """The VAE encoder downsampler uses diffusers' manual (0,1) pad + stride-2
    conv; Downsample2D(symmetric=False) must reproduce torch exactly."""
    torch.manual_seed(4)
    conv = torch.nn.Conv2d(4, 4, 3, stride=2, padding=0)
    x = torch.randn(1, 4, 8, 8)
    x_pad = torch.nn.functional.pad(x, (0, 1, 0, 1))  # diffusers vae encoder pad
    want = conv(x_pad).detach().numpy()

    sd = {"encoder.down_blocks.0.downsamplers.0.conv.weight": conv.weight.detach().numpy(),
          "encoder.down_blocks.0.downsamplers.0.conv.bias": conv.bias.detach().numpy()}
    tree = convert_torch_state_dict(sd, "vae")
    params = tree["encoder"]["down_blocks_0_downsamplers_0"]

    mod = Downsample2D(4, dtype=jnp.float32, symmetric=False)
    got = mod.apply({"params": params}, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 3, 1, 2), want, atol=1e-4
    )


def test_groupnorm_vs_torch():
    """GroupNorm scale/bias conversion + NHWC math vs torch NCHW."""
    torch.manual_seed(5)
    gn = torch.nn.GroupNorm(4, 8, eps=1e-5)
    with torch.no_grad():
        gn.weight.normal_(1.0, 0.3)
        gn.bias.normal_(0.0, 0.3)
    x = torch.randn(2, 8, 4, 4)
    want = gn(x).detach().numpy()

    sd = {"conv_norm_out.weight": gn.weight.detach().numpy(),
          "conv_norm_out.bias": gn.bias.detach().numpy()}
    p = convert_torch_state_dict(sd, "unet")["conv_norm_out"]

    import flax.linen as nn

    mod = nn.GroupNorm(num_groups=4, epsilon=1e-5)
    got = mod.apply({"params": p}, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 3, 1, 2), want, atol=1e-4
    )


def test_unet_attention_vs_torch():
    """Diffusers-named attention (to_q/to_k/to_v/to_out.0, square kernels)
    converted into our Attention module must match a torch reference forward.
    Catches swapped projections and transposes the bijection can't see."""
    dim, heads = 32, 4
    torch.manual_seed(6)
    to_q = torch.nn.Linear(dim, dim, bias=False)
    to_k = torch.nn.Linear(dim, dim, bias=False)
    to_v = torch.nn.Linear(dim, dim, bias=False)
    to_out = torch.nn.Linear(dim, dim)

    x = torch.randn(1, 24, dim)
    with torch.no_grad():
        q = to_q(x).reshape(1, 24, heads, dim // heads).transpose(1, 2)
        k = to_k(x).reshape(1, 24, heads, dim // heads).transpose(1, 2)
        v = to_v(x).reshape(1, 24, heads, dim // heads).transpose(1, 2)
        attn = torch.softmax(q @ k.transpose(-1, -2) / np.sqrt(dim // heads), dim=-1)
        want = to_out((attn @ v).transpose(1, 2).reshape(1, 24, dim)).numpy()

    prefix = "down_blocks.0.attentions.0.transformer_blocks.0.attn1"
    sd = {
        f"{prefix}.to_q.weight": to_q.weight.detach().numpy(),
        f"{prefix}.to_k.weight": to_k.weight.detach().numpy(),
        f"{prefix}.to_v.weight": to_v.weight.detach().numpy(),
        f"{prefix}.to_out.0.weight": to_out.weight.detach().numpy(),
        f"{prefix}.to_out.0.bias": to_out.bias.detach().numpy(),
    }
    tree = convert_torch_state_dict(sd, "unet")
    params = tree["down_blocks_0"]["attentions_0"]["blocks_0"]["attn1"]

    mod = Attention(num_heads=heads, head_dim=dim // heads, out_dim=dim,
                    dtype=jnp.float32)
    got = np.asarray(mod.apply({"params": params}, jnp.asarray(x.numpy())))
    np.testing.assert_allclose(got, want, atol=ATOL, rtol=1e-3)


def test_timestep_mlp_vs_torch():
    """time_embedding MLP (linear_1/silu/linear_2) conversion oracle."""
    torch.manual_seed(7)
    l1 = torch.nn.Linear(8, 16)
    l2 = torch.nn.Linear(16, 16)
    x = torch.randn(2, 8)
    with torch.no_grad():
        want = l2(torch.nn.functional.silu(l1(x))).numpy()

    sd = {
        "time_embedding.linear_1.weight": l1.weight.detach().numpy(),
        "time_embedding.linear_1.bias": l1.bias.detach().numpy(),
        "time_embedding.linear_2.weight": l2.weight.detach().numpy(),
        "time_embedding.linear_2.bias": l2.bias.detach().numpy(),
    }
    tree = convert_torch_state_dict(sd, "unet")["time_embedding"]

    from riffusion_tpu.models.layers import TimestepEmbedding

    mod = TimestepEmbedding(16, dtype=jnp.float32)
    got = np.asarray(mod.apply({"params": tree}, jnp.asarray(x.numpy())))
    np.testing.assert_allclose(got, want, atol=1e-5)
