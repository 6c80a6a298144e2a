"""
Isolated microbench: full-row Pallas attention vs the einsum composition at
the serving-shape site (b=32, s=4096, h=8, d=40, bf16).

Isolated numbers guide kernel iteration only — the gating decision is the
full-step A/B in benchmarks/unet_profile.py (XLA fuses einsum attention into
its surrounding block, so isolated wins can evaporate in context).

Run solo: python benchmarks/rowattn_micro.py [--iters 20] [--block-q 512]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def log(*args) -> None:
    print(*args, file=sys.stderr, flush=True)


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--iters", type=int, default=20)
    parser.add_argument("--block-q", type=int, default=512)
    parser.add_argument("--exp-bf16", action="store_true")
    parser.add_argument("--b", type=int, default=32)
    parser.add_argument("--s", type=int, default=4096)
    parser.add_argument("--heads", type=int, default=8)
    parser.add_argument("--d", type=int, default=40)
    parser.add_argument("--json", default=None)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from riffusion_tpu.util import jax_util

    jax_util.enable_persistent_compilation_cache()
    from riffusion_tpu.ops.attention import _reference, full_row_attention

    b, s, h, d = args.b, args.s, args.heads, args.d
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((b, s, h * d)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, s, h * d)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, s, h * d)), jnp.bfloat16)
    scale = 1 / np.sqrt(d)

    pal = jax.jit(
        lambda q, k, v: full_row_attention(
            q, k, v, num_heads=h, scale=scale, block_q=args.block_q,
            exp_bf16=args.exp_bf16,
        )
    )
    ref = jax.jit(lambda q, k, v: _reference(q, k, v, h, scale))

    def sync_scalar(x):
        # relay rule: host readback is the only reliable sync, and it must be
        # tiny (a full 84 MB output fetch costs ~400 ms of tunnel time)
        return float(np.asarray(x[0, 0, :1])[0])

    results = {}
    t0 = time.time()
    o1 = pal(q, k, v)
    sync_scalar(o1)
    results["pallas_compile_s"] = round(time.time() - t0, 1)
    log(f"pallas compile+run1: {results['pallas_compile_s']}s")
    t0 = time.time()
    o2 = ref(q, k, v)
    sync_scalar(o2)
    results["einsum_compile_s"] = round(time.time() - t0, 1)
    log(f"einsum compile+run1: {results['einsum_compile_s']}s")
    err = float(jnp.max(jnp.abs(o1.astype(jnp.float32) - o2.astype(jnp.float32))))
    results["max_abs_err"] = err
    log("max abs err vs einsum:", err)

    for name, fn in [("pallas", pal), ("einsum", ref), ("pallas", pal), ("einsum", ref)]:
        sync_scalar(fn(q, k, v))
        t0 = time.time()
        for _ in range(args.iters):
            out = fn(q, k, v)
        sync_scalar(out)
        ms = (time.time() - t0) / args.iters * 1000
        results.setdefault(name + "_ms", []).append(round(ms, 2))
        log(f"{name}: {ms:.2f} ms/call (isolated, 1 site b{b})")

    print(json.dumps(results))
    if args.json:
        Path(args.json).write_text(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
