"""
Serving batch-size sweep: sustained clips/s of the fused batched program
(`RiffusionPipeline.riffuse_audio_batch`) across batch sizes and presets.

Run (solo — never while pytest or another TPU job is active):
    python benchmarks/batch_sweep.py --sizes 8,16,24,32 --presets parity,fast

Each (preset, size) config runs in its OWN subprocess, the same structure as
bench.py: a compile-time RESOURCE_EXHAUSTED poisons the whole process (every
later compile in it fails, even ones that fit on a clean device — measured
2026-08-17: after parity-b24 OOMed, fast-b8 reported RESOURCE_EXHAUSTED too),
and accumulated executables from earlier configs eat HBM the later configs
need. A subprocess exit releases the TPU completely.

Forced-flash probe (RIFFUSION_TPU_EINSUM_B_LO=1e6, i.e. Pallas flash at
every site, measured 2026-08-18 at the unipc_k-16 fast preset): b16 drops to
1.01 clips/s sustained vs 3.86 with the hybrid gate (flash-everywhere is
3.8x slower at serving shapes — the gate's einsum choice is right), and b24/
b32 still RESOURCE_EXHAUSTED, so the HBM cliff is NOT the einsum attention
matrices alone — conv/resnet activations at CFG batch 48+ bound it. b16
stays the bucket ceiling regardless of attention implementation.

Context: the batch-16 UNet-bound ceiling at 50-step parity is ~1.77 clips/s
(238 ms/CFG-step-pair x 38 pairs, benchmarks/attn_sweep.py); measured
sustained is ~1.5. The gap is dispatch + readback (~27 MB/batch over the
remote relay) + host finalize (PIL + filters on one CPU core). This harness
answers whether a bigger batch amortizes the fixed terms or hits an HBM
cliff (CFG doubles the UNet batch: serving N=32 runs attention at 64).
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

CLIP_SECONDS = 5.11


def log(*args) -> None:
    print(*args, file=sys.stderr, flush=True)


def run_config(preset: str, n: int, rounds: int) -> None:
    """One (preset, batch-size) measurement; prints @@RESULT= on stdout."""
    import numpy as np
    from PIL import Image

    from riffusion_tpu.datatypes import InferenceInput, PromptInput
    from riffusion_tpu.riffusion_pipeline import RiffusionPipeline
    from riffusion_tpu.serving import FAST_PRESET
    from riffusion_tpu.spectrogram_params import SpectrogramParams

    scheduler, steps = {
        "parity": (None, 50),
        "fast": (FAST_PRESET["scheduler"], FAST_PRESET["steps"]),
    }[preset]

    pipe = RiffusionPipeline.load_checkpoint("random:full")
    params = SpectrogramParams()
    rng = np.random.default_rng(0)
    init_image = Image.fromarray(
        rng.integers(60, 220, (512, 512, 3), dtype=np.uint8), mode="RGB"
    )
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

    def dispatch():
        return pipe.riffuse_audio_batch(
            reqs, init_image, params=params, scheduler=scheduler,
            async_dispatch=True,
        )

    log(f"[{label}] compiling...")
    t0 = time.time()
    dispatch()()
    log(f"[{label}] warmup (incl. compile): {time.time() - t0:.1f} s")

    # one synchronous batch: device+readback with no overlap
    t0 = time.time()
    fin = dispatch()
    dispatch_s = time.time() - t0
    fin()
    sync_s = time.time() - t0

    # sustained: overlap batch k readback with batch k+1 dispatch
    t0 = time.time()
    fin_prev = dispatch()
    for _ in range(rounds):
        fin_next = dispatch()
        fin_prev()
        fin_prev = fin_next
    fin_prev()
    sustained = (rounds + 1) * n / (time.time() - t0)
    log(
        f"[{label}] sync {sync_s:.2f} s/batch (dispatch {dispatch_s:.2f}) "
        f"= {n / sync_s:.2f} clips/s; sustained {sustained:.2f} clips/s "
        f"({sustained * CLIP_SECONDS:.1f}x realtime aggregate)"
    )
    print(f"@@RESULT={label},{sync_s:.3f},{dispatch_s:.3f},{sustained:.3f}",
          flush=True)


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--sizes", default="8,16,24,32")
    parser.add_argument("--presets", default="parity,fast")
    parser.add_argument("--rounds", type=int, default=2)
    parser.add_argument("--config", help="internal: run one preset:size inline")
    args = parser.parse_args()

    if args.config:
        preset, n = args.config.split(":")
        run_config(preset, int(n), args.rounds)
        return

    here = os.path.abspath(__file__)
    results = []
    for preset in args.presets.split(","):
        for n in (int(s) for s in args.sizes.split(",")):
            label = f"{preset}-b{n}"
            proc = subprocess.run(
                [sys.executable, here, "--config", f"{preset}:{n}",
                 "--rounds", str(args.rounds)],
                stdout=subprocess.PIPE, stderr=None, text=True, timeout=1800,
            )
            row = None
            for line in proc.stdout.splitlines():
                if line.startswith("@@RESULT="):
                    lab, sync_s, dispatch_s, sustained = line[9:].split(",")
                    row = (lab, float(sync_s), float(dispatch_s), float(sustained))
            if row is None:
                log(f"[{label}] FAILED (rc={proc.returncode})")
                results.append((label, None, None, None))
            else:
                results.append(row)

    log("\nsummary:")
    for label, sync_s, dispatch_s, sustained in results:
        if sync_s is None:
            log(f"  {label}: FAILED")
        else:
            log(f"  {label}: sync {sync_s:.2f} s, sustained {sustained:.2f} clips/s")


if __name__ == "__main__":
    main()
