"""
Serving batch-size sweep: sustained clips/s of the fused batched program
(`RiffusionPipeline.riffuse_audio_batch`) across batch sizes and presets,
plus a host/device split of where each batch's wall time goes.

Run (solo — never while pytest or another TPU job is active):
    python benchmarks/batch_sweep.py --sizes 8,16,24,32 --presets parity,fast

Context: the batch-16 UNet-bound ceiling at 50-step parity is ~1.77 clips/s
(238 ms/CFG-step-pair x 38 pairs, benchmarks/attn_sweep.py); measured
sustained is ~1.5. The gap is dispatch + readback (~27 MB/batch over the
remote relay) + host finalize (PIL + filters on one CPU core). This harness
answers whether a bigger batch amortizes the fixed terms or hits an HBM/
VMEM cliff (CFG doubles the UNet batch: serving N=32 runs attention at 64).
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
from PIL import Image

CLIP_SECONDS = 5.11


def log(*args) -> None:
    print(*args, file=sys.stderr, flush=True)


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--sizes", default="8,16,24,32")
    parser.add_argument("--presets", default="parity,fast")
    parser.add_argument("--rounds", type=int, default=2)
    args = parser.parse_args()

    from riffusion_tpu.datatypes import InferenceInput, PromptInput
    from riffusion_tpu.riffusion_pipeline import RiffusionPipeline
    from riffusion_tpu.serving import FAST_PRESET
    from riffusion_tpu.spectrogram_params import SpectrogramParams

    pipe = RiffusionPipeline.load_checkpoint("random:full")
    params = SpectrogramParams()
    rng = np.random.default_rng(0)
    init_image = Image.fromarray(
        rng.integers(60, 220, (512, 512, 3), dtype=np.uint8), mode="RGB"
    )

    presets = {
        "parity": (None, 50),
        "fast": (FAST_PRESET["scheduler"], FAST_PRESET["steps"]),
    }
    results = []
    for preset in args.presets.split(","):
        scheduler, steps = presets[preset]
        for n in (int(s) for s in args.sizes.split(",")):
            reqs = [
                InferenceInput(
                    start=PromptInput(prompt=f"groove {i}", seed=42 + i),
                    end=PromptInput(prompt="jazzy saxophone", seed=123 + i),
                    alpha=min(1.0, 0.05 * i),
                    num_inference_steps=steps,
                )
                for i in range(n)
            ]
            label = f"{preset}-b{n}"
            log(f"[{label}] compiling...")
            t0 = time.time()
            try:
                fin = pipe.riffuse_audio_batch(
                    reqs, init_image, params=params, scheduler=scheduler,
                    async_dispatch=True,
                )
                fin()
            except Exception as e:  # OOM cliffs are a sweep *result*
                log(f"[{label}] FAILED: {type(e).__name__}: {e}")
                results.append((label, None, None, None))
                continue
            log(f"[{label}] warmup (incl. compile): {time.time() - t0:.1f} s")

            # one synchronous batch: device+readback with no overlap
            t0 = time.time()
            fin = pipe.riffuse_audio_batch(
                reqs, init_image, params=params, scheduler=scheduler,
                async_dispatch=True,
            )
            dispatch_s = time.time() - t0
            fin()
            sync_s = time.time() - t0

            # host finalize alone (readback + PIL + filters), device warm/idle
            t0 = time.time()
            pipe.riffuse_audio_batch(
                reqs, init_image, params=params, scheduler=scheduler,
                async_dispatch=True,
            )()
            t0 = time.time()

            # sustained: overlap batch k readback with batch k+1 dispatch
            fin_prev = pipe.riffuse_audio_batch(
                reqs, init_image, params=params, scheduler=scheduler,
                async_dispatch=True,
            )
            for _ in range(args.rounds):
                fin_next = pipe.riffuse_audio_batch(
                    reqs, init_image, params=params, scheduler=scheduler,
                    async_dispatch=True,
                )
                fin_prev()
                fin_prev = fin_next
            fin_prev()
            sustained = (args.rounds + 1) * n / (time.time() - t0)
            log(
                f"[{label}] sync {sync_s:.2f} s/batch (dispatch {dispatch_s:.2f}) "
                f"= {n / sync_s:.2f} clips/s; sustained {sustained:.2f} clips/s "
                f"({sustained * CLIP_SECONDS:.1f}x realtime aggregate)"
            )
            results.append((label, sync_s, dispatch_s, sustained))

    log("\nsummary:")
    for label, sync_s, dispatch_s, sustained in results:
        if sync_s is None:
            log(f"  {label}: FAILED")
        else:
            log(f"  {label}: sync {sync_s:.2f} s, sustained {sustained:.2f} clips/s")


if __name__ == "__main__":
    main()
