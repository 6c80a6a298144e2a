"""
UNet serving-step profile: where does the batch-16 CFG step spend its time,
and how far from the chip's peak is it? (Round-3 VERDICT weak #4: ~46% MFU
with no published per-op profile.)

Two measurements:

1. Steady-state step time of the serving CFG UNet step (batch 2N latents,
   one scan iteration's body) with host-readback sync, plus the analytic
   FLOP count (from XLA cost analysis) -> achieved TFLOP/s and MFU vs the
   v5e bf16 peak (197 TF/s).
2. An xplane device trace of K steps (jax.profiler.trace), parsed with
   jax.profiler.ProfileData: per-op self-time aggregated by op name ->
   top-N table with % of device time. Skipped gracefully when the PJRT
   backend doesn't export device traces (remote relays may not).

Run solo: python benchmarks/unet_profile.py [--pairs 16] [--trace]
"""

from __future__ import annotations

import argparse
import collections
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

V5E_BF16_PEAK_TFLOPS = 197.0


def log(*args) -> None:
    print(*args, file=sys.stderr, flush=True)


def parse_xplane(trace_dir: str, top: int = 12):
    """Aggregate device-plane op self-times from the newest xplane proto."""
    import jax

    files = sorted(Path(trace_dir).rglob("*.xplane.pb"), key=lambda p: p.stat().st_mtime)
    if not files:
        return None
    data = jax.profiler.ProfileData.from_serialized_xspace(files[-1].read_bytes())
    per_op: dict = collections.Counter()
    device_total = 0.0
    for plane in data.planes:
        if "TPU" not in plane.name and "/device" not in plane.name.lower():
            continue
        for line in plane.lines:
            # XLA op lines carry per-op events; steps/others are skipped
            if "XLA Ops" not in line.name and "XLA TraceMe" not in line.name \
                    and "Ops" not in line.name:
                continue
            for event in line.events:
                dur = event.duration_ns / 1e6
                per_op[event.name] += dur
                device_total += dur
    if not per_op:
        return None
    rows = per_op.most_common(top)
    return {"device_total_ms": device_total, "top": rows}


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--pairs", type=int, default=16, help="serving batch (CFG doubles it)")
    parser.add_argument("--iters", type=int, default=20)
    parser.add_argument("--trace", action="store_true", help="capture + parse an xplane trace")
    parser.add_argument("--trace-dir", default="/tmp/riffusion_unet_trace")
    parser.add_argument("--json", default=None)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from riffusion_tpu.models.weights import random_bundle

    backend = jax.default_backend()
    log(f"backend: {backend}, devices: {jax.devices()}")
    dtype = jnp.float32 if backend == "cpu" else jnp.bfloat16
    bundle = random_bundle("full", dtype=dtype)
    unet, _, _ = bundle.modules(flash=(backend != "cpu"))
    params = bundle.unet_params

    b = 2 * args.pairs
    latents = jnp.zeros((b, 64, 64, bundle.unet_config.in_channels), jnp.float32)
    t = jnp.full((b,), 500, jnp.int32)
    context = jnp.zeros((b, 77, bundle.unet_config.cross_attention_dim), jnp.float32)
    guidance = jnp.float32(7.0)

    def cfg_step(params, latents, t, context, guidance):
        eps = unet.apply({"params": params}, latents, t, context)
        eps_u, eps_t = jnp.split(eps, 2, axis=0)
        out = eps_u + guidance * (eps_t - eps_u)
        # fold the next latent usage so the step isn't dead-code-eliminated
        return out

    step = jax.jit(cfg_step)
    compiled = step.lower(params, latents, t, context, guidance).compile()

    flops = None
    try:
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        flops = float(ca.get("flops", 0.0)) or None
    except Exception as e:
        log(f"cost_analysis unavailable: {e}")

    def run_once():
        out = compiled(params, latents, t, context, guidance)
        # host readback is the only reliable sync on the remote relay
        return float(np.asarray(out[0, 0, 0, 0], np.float32))

    run_once()  # warm
    t0 = time.time()
    for _ in range(args.iters):
        run_once()
    dt = (time.time() - t0) / args.iters
    per_pair_ms = dt * 1000 / args.pairs
    result = {
        "pairs": args.pairs,
        "unet_batch": b,
        "step_ms": round(dt * 1000, 2),
        "ms_per_clip_pair": round(per_pair_ms, 3),
    }
    if flops:
        tflops = flops / dt / 1e12
        result["flops_per_step"] = flops
        result["achieved_tflops"] = round(tflops, 1)
        if backend != "cpu":
            result["mfu_vs_v5e_peak"] = round(tflops / V5E_BF16_PEAK_TFLOPS, 3)
    log(f"CFG step (batch {b}): {result['step_ms']} ms "
        f"({result['ms_per_clip_pair']} ms/clip-pair)"
        + (f", {result.get('achieved_tflops')} TF/s"
           f" = {100 * result.get('mfu_vs_v5e_peak', 0):.0f}% of v5e bf16 peak"
           if flops else ""))

    if args.trace:
        import jax.profiler

        with jax.profiler.trace(args.trace_dir):
            for _ in range(5):
                run_once()
        top = parse_xplane(args.trace_dir)
        if top is None:
            log("no device-plane ops in the xplane trace (relay backends may "
                "not export device traces); see the roofline numbers above")
            result["trace"] = None
        else:
            log(f"device total: {top['device_total_ms']:.1f} ms over 5 steps")
            for name, ms in top["top"]:
                log(f"  {ms:8.2f} ms  {100 * ms / top['device_total_ms']:5.1f}%  {name[:90]}")
            result["trace"] = {
                "device_total_ms": round(top["device_total_ms"], 2),
                "top": [(n, round(ms, 2)) for n, ms in top["top"]],
            }

    print(json.dumps(result))
    if args.json:
        Path(args.json).write_text(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
