"""
Probe: does XLA:TPU map int8 dot_general onto the MXU at ~2x bf16 rate?

TPU v5e peak is 394 int8 TOPS vs 197 bf16 TFLOPs. If int8 x int8 -> int32
`lax.dot_general` actually hits that rate, a W8A8-quantized UNet path could
roughly double the serving ceiling (which is UNet-matmul-bound, see
benchmarks/attn_sweep.py). If XLA instead upcasts, this prints ~1x and the
quantization project is dead on arrival — measure before building.

Timing discipline: over the remote axon relay each program dispatch costs
~200 ms, so single-op timings are meaningless (first version of this probe
"measured" a 4096^3 bf16 matmul at 0.5 TF/s). The matmul is therefore
chained ITERS times inside one jitted `lax.fori_loop` — one dispatch, many
MXU passes, carry-dependent so XLA cannot elide any iteration.

Run solo: python benchmarks/int8_probe.py

Measured 2026-08-17 (v5e behind the axon relay), chained-loop numbers:
  attn qk+pv d40:  bf16 0.468 ms/iter vs int8 0.479 ms/iter  -> 1.0x
  conv 2880->320:  bf16 13.5 ms/iter  vs int8 5.7 ms/iter    -> 2.4x
  square 4096^3:   bf16 13.8 ms      vs int8 6.1 ms          -> 2.3x
Verdict: int8 does engage the MXU's double rate on large K/N GEMMs, but the
serving bottleneck is d=40 attention (benchmarks/attn_sweep.py), which gains
NOTHING (the head dim pads to 128 either way and the qk/pv GEMMs are
bandwidth/overhead-bound, not MXU-bound). Absolute rates in this probe also
sit far below what the full UNet program sustains, so isolated-loop numbers
on this relay under-report fused-program performance. A W8A8 UNet would
complicate the weight pipeline and quality story for, at best, a modest
conv-only win — not built.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

ITERS = 100


def sync(x) -> None:
    float(np.asarray(x).ravel()[0].astype(np.float64))


def main() -> None:
    import jax
    import jax.numpy as jnp
    from jax import lax

    print(f"devices: {jax.devices()}", file=sys.stderr)
    key = jax.random.PRNGKey(0)

    # UNet-shaped chains: attention qk+pv at d=40 (padded 128 on MXU), and a
    # conv-as-GEMM (3x3 @ 320ch mid-block, K=2880 N=320) with the output
    # tiled back up to the input width so iterations chain.
    def attn_chain(dtype, pref, post):
        b1 = (jax.random.normal(key, (40, 4096)) * 3).astype(dtype)
        b2 = (jax.random.normal(key, (4096, 40)) * 3).astype(dtype)

        @jax.jit
        def loop(x):
            def body(_, x):
                s = lax.dot_general(x, b1, (((1,), (0,)), ((), ())),
                                    preferred_element_type=pref)
                s = post(s)
                y = lax.dot_general(s, b2, (((1,), (0,)), ((), ())),
                                    preferred_element_type=pref)
                return post(y)
            return lax.fori_loop(0, ITERS, body, x)
        return loop, (jax.random.normal(key, (4096, 40)) * 3).astype(dtype), \
            2.0 * 4096 * 40 * 4096 * 2 * ITERS

    def conv_chain(dtype, pref, post):
        b = (jax.random.normal(key, (2880, 320)) * 3).astype(dtype)

        @jax.jit
        def loop(x):
            def body(_, x):
                y = lax.dot_general(x, b, (((1,), (0,)), ((), ())),
                                    preferred_element_type=pref)
                y = post(y)
                return jnp.concatenate([y] * 9, axis=1)
            return lax.fori_loop(0, ITERS, body, x)
        return loop, (jax.random.normal(key, (4096, 2880)) * 3).astype(dtype), \
            2.0 * 4096 * 2880 * 320 * ITERS

    post_bf = lambda y: (y * 0.01).astype(jnp.bfloat16)
    post_i8 = lambda y: lax.clamp(-127, y >> 6, 127).astype(jnp.int8)
    for cname, chain in (("attn qk+pv d40", attn_chain), ("conv gemm 2880->320", conv_chain)):
        for name, dtype, pref, post in (
            ("bf16", jnp.bfloat16, jnp.float32, post_bf),
            ("int8", jnp.int8, jnp.int32, post_i8),
        ):
            fn, x, flops = chain(dtype, pref, post)
            sync(fn(x))
            t0 = time.time()
            sync(fn(x))
            dt = time.time() - t0
            print(f"{cname} {name}: {dt * 1e3 / ITERS:.3f} ms/iter, "
                  f"{flops / dt / 1e12:.1f} T{'OP' if name == 'int8' else 'F'}/s")

    for n in (2048, 4096):
        b_f = jax.random.normal(key, (n, n), jnp.bfloat16)
        b_i = (jax.random.normal(key, (n, n)) * 3).astype(jnp.int8)

        @jax.jit
        def loop_bf16(x, b=b_f):
            def body(_, x):
                y = lax.dot_general(
                    x, b, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                return (y * (1.0 / n)).astype(jnp.bfloat16)
            return lax.fori_loop(0, ITERS, body, x)

        @jax.jit
        def loop_int8(x, b=b_i):
            def body(_, x):
                y = lax.dot_general(
                    x, b, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
                return lax.clamp(-127, y >> 8, 127).astype(jnp.int8)
            return lax.fori_loop(0, ITERS, body, x)

        x_f = jax.random.normal(key, (n, n), jnp.bfloat16)
        x_i = (jax.random.normal(key, (n, n)) * 3).astype(jnp.int8)

        flops = 2.0 * n * n * n * ITERS
        for name, fn, x in (("bf16", loop_bf16, x_f), ("int8", loop_int8, x_i)):
            sync(fn(x))  # compile + warm
            t0 = time.time()
            sync(fn(x))
            dt = time.time() - t0
            print(
                f"n={n} {name}: {dt * 1e3 / ITERS:.3f} ms/matmul, "
                f"{flops / dt / 1e12:.1f} T{'OP' if name == 'int8' else 'F'}/s"
            )


if __name__ == "__main__":
    main()
