"""
Full-row Pallas attention (ops/attention.py): parity against the einsum
composition it replaces at the serving sites, VJP correctness, and the
layers.py gate wiring.

The kernel itself runs in interpreter mode here (the suite is CPU-only);
the real-chip numbers live in benchmarks/rowattn_micro.py and the full-step
A/B in benchmarks/unet_profile.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from riffusion_tpu.ops.attention import _reference, full_row_attention


@pytest.mark.parametrize(
    "dtype,tol",
    [(jnp.float32, 2e-6), (jnp.bfloat16, 2e-2)],
    ids=["f32", "bf16"],
)
def test_parity_vs_einsum(dtype, tol):
    rng = np.random.default_rng(0)
    b, s, h, d = 2, 256, 3, 40
    q = jnp.asarray(rng.standard_normal((b, s, h * d)), dtype)
    k = jnp.asarray(rng.standard_normal((b, s, h * d)), dtype)
    v = jnp.asarray(rng.standard_normal((b, s, h * d)), dtype)
    scale = 1 / np.sqrt(d)
    out = full_row_attention(
        q, k, v, num_heads=h, scale=scale, block_q=128, interpret=True
    )
    ref = _reference(q, k, v, h, scale)
    assert out.shape == ref.shape and out.dtype == ref.dtype
    err = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32))))
    assert err < tol, err


def test_parity_large_logits_stability():
    """Row-max subtraction must keep exp() finite for large logit scales."""
    rng = np.random.default_rng(1)
    b, s, h, d = 1, 128, 1, 40
    q = jnp.asarray(30.0 * rng.standard_normal((b, s, h * d)), jnp.float32)
    k = jnp.asarray(30.0 * rng.standard_normal((b, s, h * d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, s, h * d)), jnp.float32)
    out = full_row_attention(
        q, k, v, num_heads=h, scale=1.0, block_q=64, interpret=True
    )
    assert bool(jnp.all(jnp.isfinite(out)))
    ref = _reference(q, k, v, h, 1.0)
    assert float(jnp.max(jnp.abs(out - ref))) < 1e-4


def test_vjp_matches_einsum_grads():
    rng = np.random.default_rng(2)
    b, s, h, d = 1, 128, 2, 16
    q = jnp.asarray(rng.standard_normal((b, s, h * d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, s, h * d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, s, h * d)), jnp.float32)

    def loss_pal(q, k, v):
        return full_row_attention(
            q, k, v, num_heads=h, scale=0.25, block_q=64, interpret=True
        ).sum()

    def loss_ref(q, k, v):
        return _reference(q, k, v, h, 0.25).sum()

    g = jax.grad(loss_pal, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g, gr):
        assert float(jnp.max(jnp.abs(a - b_))) < 1e-5


def test_shape_validation():
    q = jnp.zeros((1, 100, 80))
    with pytest.raises(ValueError, match="not divisible by block_q"):
        full_row_attention(q, q, q, num_heads=2, scale=1.0, block_q=64)
    q = jnp.zeros((1, 128, 80))
    with pytest.raises(ValueError, match="not divisible by num_heads"):
        full_row_attention(q, q, q, num_heads=3, scale=1.0, block_q=64)
    k = jnp.zeros((1, 128, 40))
    with pytest.raises(ValueError, match="shape mismatch"):
        full_row_attention(q, k, k, num_heads=2, scale=1.0, block_q=64)


def test_gate_requires_tpu_and_window():
    """On the CPU suite backend the layers.py gate must never route to the
    kernel (a CPU-jitted program cannot emit TPU pallas_call ops) — the
    einsum window keeps working as before."""
    from riffusion_tpu.models import layers

    attn = layers.Attention(num_heads=2, head_dim=40, out_dim=80, flash=True)
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((10, 2048, 80)), jnp.float32
    )
    params = attn.init(jax.random.PRNGKey(0), x)
    out = attn.apply(params, x)  # would crash if pallas_call were emitted
    assert out.shape == (10, 2048, 80)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_exp_bf16_parity_within_tolerance():
    """The bf16-numerator A/B arm must stay within ~1% of the fp32 softmax."""
    rng = np.random.default_rng(3)
    b, s, h, d = 1, 256, 2, 40
    q = jnp.asarray(rng.standard_normal((b, s, h * d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, s, h * d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, s, h * d)), jnp.float32)
    scale = 1 / np.sqrt(d)
    out = full_row_attention(
        q, k, v, num_heads=h, scale=scale, block_q=128, exp_bf16=True,
        interpret=True,
    )
    ref = _reference(q, k, v, h, scale)
    err = float(jnp.max(jnp.abs(out - ref)))
    assert err < 2e-2, err
