"""
Full-row Pallas TPU attention for the UNet's large-seq/small-head sites.

Why this kernel exists: the serving-step profile
(docs/performance.md, benchmarks/unet_profile_2026-08-19.json) showed XLA
spending ~24% of the batch-32 CFG UNet step materializing K as
``(b, h, d, s)`` for the logits matmul at the five seq-4096 self-attention
sites — five ~14 ms kOutput fusions whose minor dimension is head_dim=40,
~34x above the HBM bandwidth roofline. Generic flash attention was measured
*worse* than einsum-with-copies at these shapes (41.5 ms/step, see
models/layers.py gate comments): its running-max/rescale machinery and
d->128 padding buy memory savings this problem doesn't need — at head_dim
40 the entire K and V for one batch row is ~2 MB of VMEM.

So this kernel does the obvious thing the shapes allow:

- Q, K, V are consumed and O is produced in the NATURAL ``(b, s, h*d)``
  layout the qkv Dense projections emit — every HBM transfer is a
  contiguous row block at full DMA bandwidth, and no XLA layout copy
  exists anywhere on the path. Head extraction is an in-VMEM lane slice.
- K and V for one batch row are staged to VMEM ONCE and reused across all
  Q blocks: the grid is (b, s_q/block_q) with the q-block index innermost,
  and the K/V BlockSpec index maps are constant in it, so Mosaic's
  revisiting detection skips the re-fetch.
- Softmax is ONE pass over the full row (the whole row of logits is live in
  VMEM in fp32): no running max, no rescale corrections.
- The normalizer division happens AFTER the PV matmul, on the (block_q, d)
  output instead of the (block_q, s) weights — s/d x fewer divides.

The contraction dimension is head_dim (40 at the target sites), so the MXU
runs the logits matmul at ~d/128 utilization no matter the layout — that
cost is intrinsic to the architecture's head size. What the kernel removes
is the layout-copy term on top of it.

Autodiff: the custom VJP recomputes the standard einsum composition for the
backward pass (these sites are O(s^2) compute-bound; rematerialization is
the usual trade), so fine-tuning through a batched UNet step takes the same
gradient path it always did while serving gets the kernel.

Reference parity target: softmax(q k^T / sqrt(d)) v with fp32 softmax,
matching models/layers.py's "pref" einsum path (the reference computes the
same math through torch SDPA in diffusers' CrossAttention,
/root/reference/riffusion/riffusion_pipeline.py's UNet).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["full_row_attention"]


def _make_kernel(num_heads: int, head_dim: int, exp_bf16: bool):
    def kernel(q_ref, k_ref, v_ref, o_ref):
        """One (batch row, q-block) program; loops the heads.

        q_ref: (1, block_q, h*d) — pre-scaled by log2(e)/sqrt(d), so the
            logits land in the log2 domain and the softmax numerator is a
            bare exp2 (the VPU's native exponential; exp(x) lowers to
            exp2(x * log2e) anyway — folding the multiply into the (b,s,hd)
            projection output instead of the (block_q, s) logits does it on
            s/d x fewer elements)
        k_ref: (1, s, h*d)
        v_ref: (1, s, h*d)
        o_ref: (1, block_q, h*d)
        """
        for h in range(num_heads):
            sl = slice(h * head_dim, (h + 1) * head_dim)
            q = q_ref[0, :, sl]
            k = k_ref[0, :, sl]
            v = v_ref[0, :, sl]
            # (block_q, d) x (s, d) -> (block_q, s), contracting d with d:
            # K is consumed in its natural layout; any operand re-tiling
            # happens in VMEM, not as a 335 MB HBM round trip.
            logits = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            m = jnp.max(logits, axis=1, keepdims=True)
            x = logits - m
            if exp_bf16:
                # A/B arm (RIFFUSION_TPU_ROWATTN_EXP_BF16): halve the
                # softmax's VPU element width. The max-subtracted domain is
                # [-inf, 0] where bf16's ~2^-8 relative grid costs ~0.4%
                # per-weight error; the row sum accumulates fp32.
                e = jnp.exp2(x.astype(jnp.bfloat16))
            else:
                e = jnp.exp2(x)
            l = jnp.sum(e, axis=1, keepdims=True, dtype=jnp.float32)
            # Unnormalized weights through the MXU in the compute dtype;
            # normalize on the (block_q, d) result.
            pv = jax.lax.dot_general(
                e.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            o_ref[0, :, sl] = (pv / l).astype(o_ref.dtype)

    return kernel


_LOG2E = 1.4426950408889634


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def _full_row_attention(q, k, v, num_heads, scale, block_q, exp_bf16, interpret):
    return _forward(q, k, v, num_heads, scale, block_q, exp_bf16, interpret)


def _forward(q, k, v, num_heads, scale, block_q, exp_bf16, interpret):
    b, s_q, inner = q.shape
    s_kv = k.shape[1]
    head_dim = inner // num_heads
    # Scale (and the exp->exp2 log2e fold) applied to q outside the kernel:
    # XLA fuses it into the producing projection, and the kernel sees
    # pre-scaled logits operands.
    q = q * jnp.asarray(scale * _LOG2E, q.dtype)

    grid = (b, s_q // block_q)
    qo_spec = pl.BlockSpec((1, block_q, inner), lambda ib, iq: (ib, iq, 0))
    # Index maps constant in iq (the innermost grid dim): K/V stay resident
    # in VMEM across every q block of the same batch row.
    kv_spec = pl.BlockSpec((1, s_kv, inner), lambda ib, iq: (ib, 0, 0))
    flops = 2 * 2 * b * s_q * s_kv * inner
    return pl.pallas_call(
        _make_kernel(num_heads, head_dim, exp_bf16),
        grid=grid,
        in_specs=[qo_spec, kv_spec, kv_spec],
        out_specs=qo_spec,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            # Working set at the target sites (block_q=512, s=4096, inner=320,
            # bf16): K+V resident rows ~6 MB (x2 pipeline buffers), fp32
            # logits + exp ~16 MB, q/o blocks ~1 MB -> ~37 MB, over the 16 MB
            # default scoped-vmem limit but comfortably inside the v5e's
            # 128 MB physical VMEM.
            vmem_limit_bytes=96 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(3 * b * s_kv * inner + b * s_q * inner)
            * q.dtype.itemsize,
            transcendentals=b * num_heads * s_q * s_kv,
        ),
        interpret=interpret,
    )(q, k, v)


def _reference(q, k, v, num_heads, scale):
    """The einsum composition the kernel replaces (= layers.py "pref")."""
    b, s_q, inner = q.shape
    d = inner // num_heads
    qh = q.reshape(b, s_q, num_heads, d)
    kh = k.reshape(b, k.shape[1], num_heads, d)
    vh = v.reshape(b, v.shape[1], num_heads, d)
    logits = (
        jnp.einsum("bqhd,bkhd->bhqk", qh, kh, preferred_element_type=jnp.float32)
        * scale
    )
    weights = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", weights.astype(vh.dtype), vh)
    return out.reshape(b, s_q, inner)


def _fwd(q, k, v, num_heads, scale, block_q, exp_bf16, interpret):
    return _forward(q, k, v, num_heads, scale, block_q, exp_bf16, interpret), (q, k, v)


def _bwd(num_heads, scale, block_q, exp_bf16, interpret, residuals, g):
    # Backward = VJP of the einsum composition, rematerialized: the sites are
    # O(s^2) compute-bound, and training batches hit this path rarely enough
    # that the standard XLA gradient is the right cost/complexity trade.
    q, k, v = residuals
    _, vjp = jax.vjp(
        lambda q, k, v: _reference(q, k, v, num_heads, scale), q, k, v
    )
    return vjp(g)


_full_row_attention.defvjp(_fwd, _bwd)


def full_row_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    num_heads: int,
    scale: float,
    block_q: int = 512,
    exp_bf16: bool = False,
    interpret: bool = False,
) -> jax.Array:
    """softmax(q k^T * scale) v over (b, s, h*d) operands, heads packed in
    the minor dim (the qkv projections' natural output layout).

    Requirements (the caller gates on these — see models/layers.py):
      - s_q divisible by block_q (4096 at the target sites)
      - the whole K/V row per batch element fits VMEM: at the target sites
        (4096, 320) bf16 is ~3 MB lane-padded
    """
    b, s_q, inner = q.shape
    if s_q % block_q:
        raise ValueError(f"s_q={s_q} not divisible by block_q={block_q}")
    if inner % num_heads:
        raise ValueError(f"inner={inner} not divisible by num_heads={num_heads}")
    if k.shape != v.shape or k.shape[0] != b or k.shape[2] != inner:
        raise ValueError(f"shape mismatch: q={q.shape} k={k.shape} v={v.shape}")
    return _full_row_attention(
        q, k, v, int(num_heads), float(scale), int(block_q), bool(exp_bf16),
        bool(interpret),
    )
