"""
Component microbenchmarks (BASELINE.json configs): UNet steps/sec,
Griffin-Lim ms/clip, converter round trips, batched throughput.

Run: python benchmarks/components.py [--device tpu|cpu] [--json out.json]

Timing discipline for remote-device setups: a host readback of the result is
the only reliable synchronization (block_until_ready does not wait on the
relay used here), so every measurement forces one.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def _sync_time(f, n=5):
    float(np.asarray(f()).ravel()[0])  # warm/compile
    t0 = time.time()
    out = None
    for _ in range(n):
        out = f()
    float(np.asarray(out).ravel()[0])
    return (time.time() - t0) / n


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--device", default=None)
    parser.add_argument("--json", default=None)
    args = parser.parse_args()

    import jax

    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from riffusion_tpu.models.unet import UNet2DCondition
    from riffusion_tpu.models.weights import random_bundle
    from riffusion_tpu.spectrogram_converter import SpectrogramConverter
    from riffusion_tpu.spectrogram_params import SpectrogramParams

    backend = jax.default_backend()
    results = {"backend": backend}
    print(f"backend: {backend}", file=sys.stderr)

    dtype = jnp.float32 if backend == "cpu" else jnp.bfloat16
    bundle = random_bundle("full", dtype=dtype)
    unet, vae, _ = bundle.modules()
    cast = jax.jit(
        lambda p: jax.tree.map(
            lambda x: x.astype(dtype) if jnp.issubdtype(x.dtype, jnp.floating) else x, p
        )
    )
    unet_params = cast(bundle.unet_params)
    vae_params = cast(bundle.vae_params)

    # UNet CFG step (the serving hot op)
    lat = jnp.zeros((2, 64, 64, 4), jnp.float32)
    ts = jnp.zeros((2,), jnp.int32)
    ctx = jnp.zeros((2, 77, bundle.unet_config.cross_attention_dim), jnp.float32)
    unet_fn = jax.jit(lambda p, l, t, c: unet.apply({"params": p}, l, t, c))
    dt = _sync_time(lambda: unet_fn(unet_params, lat, ts, ctx), n=10)
    results["unet_cfg_step_ms"] = round(dt * 1000, 2)
    results["unet_steps_per_sec"] = round(1.0 / dt, 2)
    print(f"unet CFG step: {dt * 1000:.1f} ms", file=sys.stderr)

    # VAE decode
    z = jnp.zeros((1, 64, 64, 4), jnp.float32)
    dec_fn = jax.jit(lambda p, z: vae.apply({"params": p}, z, method="decode"))
    dt = _sync_time(lambda: dec_fn(vae_params, z))
    results["vae_decode_ms"] = round(dt * 1000, 2)
    print(f"vae decode: {dt * 1000:.1f} ms", file=sys.stderr)

    # Griffin-Lim 32 iters on a 512x512 mel clip
    conv = SpectrogramConverter(SpectrogramParams(), device=backend)
    mel = jnp.ones((1, 512, 512), jnp.float32)
    key = jax.random.PRNGKey(0)
    dt = _sync_time(
        lambda: conv._inverse(mel, key, n_iters=32, consts=conv._consts), n=5
    )
    results["griffin_lim32_ms"] = round(dt * 1000, 2)
    print(f"griffin-lim 32: {dt * 1000:.1f} ms", file=sys.stderr)

    # forward STFT+mel for a 5.11 s clip
    wav = jnp.zeros((1, 225351), jnp.float32)
    dt = _sync_time(lambda: conv._forward(wav, conv._consts), n=5)
    results["stft_mel_forward_ms"] = round(dt * 1000, 2)
    print(f"stft+mel fwd: {dt * 1000:.1f} ms", file=sys.stderr)

    print(json.dumps(results))
    if args.json:
        Path(args.json).write_text(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
