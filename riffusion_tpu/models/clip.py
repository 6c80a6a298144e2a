"""
CLIP text encoder (ViT-L/14 text tower) in Flax — the prompt encoder of the
SD v1 family (the reference calls it through transformers at
riffusion_pipeline.py:177-191). Pre-LN transformer with causal mask and
quick-gelu, final LayerNorm; returns the last hidden state (what the
diffusion cross-attention consumes).
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    max_positions: int = 77
    intermediate_size: int = 3072

    @classmethod
    def tiny(cls) -> "CLIPTextConfig":
        return cls(vocab_size=1024, hidden_size=64, num_layers=2, num_heads=4,
                   intermediate_size=128)


def quick_gelu(x: Array) -> Array:
    return x * jax.nn.sigmoid(1.702 * x)


class CLIPAttention(nn.Module):
    cfg: CLIPTextConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, causal_mask: Array) -> Array:
        cfg = self.cfg
        head_dim = cfg.hidden_size // cfg.num_heads
        q = nn.Dense(cfg.hidden_size, dtype=self.dtype, name="q_proj")(x)
        k = nn.Dense(cfg.hidden_size, dtype=self.dtype, name="k_proj")(x)
        v = nn.Dense(cfg.hidden_size, dtype=self.dtype, name="v_proj")(x)
        b, l, _ = x.shape
        q = q.reshape(b, l, cfg.num_heads, head_dim)
        k = k.reshape(b, l, cfg.num_heads, head_dim)
        v = v.reshape(b, l, cfg.num_heads, head_dim)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(head_dim)
        logits = logits.astype(jnp.float32) + causal_mask[None, None, :, :]
        weights = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", weights, v).reshape(b, l, cfg.hidden_size)
        return nn.Dense(cfg.hidden_size, dtype=self.dtype, name="out_proj")(out)


class CLIPEncoderLayer(nn.Module):
    cfg: CLIPTextConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, causal_mask: Array) -> Array:
        y = nn.LayerNorm(epsilon=1e-5, name="layer_norm1")(x)
        x = x + CLIPAttention(self.cfg, self.dtype, name="self_attn")(y, causal_mask)
        y = nn.LayerNorm(epsilon=1e-5, name="layer_norm2")(x)
        y = nn.Dense(self.cfg.intermediate_size, dtype=self.dtype, name="fc1")(y)
        y = quick_gelu(y)
        y = nn.Dense(self.cfg.hidden_size, dtype=self.dtype, name="fc2")(y)
        return x + y


class CLIPTextModel(nn.Module):
    """__call__(input_ids (B, L) int32) -> last hidden state (B, L, hidden)."""

    cfg: CLIPTextConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids: Array) -> Array:
        cfg = self.cfg
        b, l = input_ids.shape
        tok = nn.Embed(cfg.vocab_size, cfg.hidden_size, name="token_embedding")(input_ids)
        pos = nn.Embed(cfg.max_positions, cfg.hidden_size, name="position_embedding")(
            jnp.arange(l)[None, :]
        )
        x = (tok + pos).astype(self.dtype)

        causal_mask = jnp.triu(jnp.full((l, l), -1e9, dtype=jnp.float32), k=1)
        for i in range(cfg.num_layers):
            x = CLIPEncoderLayer(cfg, self.dtype, name=f"layers_{i}")(x, causal_mask)
        return nn.LayerNorm(epsilon=1e-5, name="final_layer_norm")(x)
