"""Sweep attention configurations for the batched-serving UNet step.

Times the full UNet CFG pair at a given batch (default b=32 = 16 clips) under
the module-level attention gates in models/layers.py, one subprocess per
config so the env-read constants rebind. Timing forces a host readback (the
only reliable sync on relay-attached devices).

Run: python benchmarks/attn_sweep.py            # sweep
     python benchmarks/attn_sweep.py --one B32  # single config (child mode)
"""

from __future__ import annotations

import os
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

CONFIGS = {
    # name -> env overrides
    "hybrid-einsum(default)": {},
    "flash-512-b8": {"RIFFUSION_TPU_EINSUM_B_LO": str(1 << 30)},  # einsum window off
    "flash-1024-b8": {
        "RIFFUSION_TPU_EINSUM_B_LO": str(1 << 30),
        "RIFFUSION_TPU_FLASH_BLOCK_MAX": "1024",
    },
    "flash-2048-b1": {
        "RIFFUSION_TPU_EINSUM_B_LO": str(1 << 30),
        "RIFFUSION_TPU_FLASH_BLOCK_MAX": "2048",
        "RIFFUSION_TPU_FLASH_BLOCK_B_MIN": str(1 << 30),
    },
    "flash-256-b8": {
        "RIFFUSION_TPU_EINSUM_B_LO": str(1 << 30),
        "RIFFUSION_TPU_FLASH_BLOCK_MAX": "256",
    },
    "einsum-cast-bf16": {
        "RIFFUSION_TPU_ATTENTION": "cast",
    },
}


def run_one(batch: int) -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from riffusion_tpu.models.weights import random_bundle

    bundle = random_bundle("full", dtype=jnp.bfloat16)
    unet, _, _ = bundle.modules()
    cast = jax.jit(
        lambda p: jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if jnp.issubdtype(x.dtype, jnp.floating) else x, p
        )
    )
    params = cast(bundle.unet_params)
    lat = jnp.zeros((batch, 64, 64, 4), jnp.float32)
    ts = jnp.zeros((batch,), jnp.int32)
    ctx = jnp.zeros((batch, 77, bundle.unet_config.cross_attention_dim), jnp.float32)
    fn = jax.jit(lambda p, l, t, c: unet.apply({"params": p}, l, t, c))

    def sync(x):
        return float(np.asarray(x).ravel()[0])

    sync(fn(params, lat, ts, ctx))  # compile
    n = 6
    t0 = time.time()
    out = None
    for _ in range(n):
        out = fn(params, lat, ts, ctx)
    sync(out)
    dt = (time.time() - t0) / n
    print(f"RESULT_MS={dt * 1000:.1f}")


def main() -> None:
    if "--one" in sys.argv:
        run_one(int(os.environ.get("SWEEP_BATCH", "32")))
        return
    batch = int(sys.argv[sys.argv.index("--batch") + 1]) if "--batch" in sys.argv else 32
    for name, env in CONFIGS.items():
        child_env = dict(os.environ, SWEEP_BATCH=str(batch), **env)
        t0 = time.time()
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--one"],
            capture_output=True, text=True, timeout=4000, env=child_env,
        )
        ms = next(
            (l.split("=")[1] for l in proc.stdout.splitlines()
             if l.startswith("RESULT_MS=")), None,
        )
        if ms is None:
            tail = (proc.stderr or "")[-300:]
            print(f"{name}: FAILED rc={proc.returncode} {tail}", flush=True)
        else:
            print(f"{name}: {ms} ms  (wall {time.time() - t0:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
