"""
Build the AOT executable artifact store for the serving/bench flagship
programs (riffusion_tpu/aot.py — the traced-UNet-artifact equivalent,
reference riffusion_pipeline.py:127-171).

Run once per deploy (or per code change; the store is keyed by a package
code fingerprint) on the target device:

    python scripts/build_aot_artifact.py [--checkpoint random:full] [--quick]

Each flagship program is compiled once and its serialized executable is
persisted; every later process (serving restarts, bench phases) loads the
executable from disk instead of tracing + compiling. `--quick` builds only
the two single-request programs (parity + FAST preset).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*args) -> None:
    print(*args, file=sys.stderr, flush=True)


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--checkpoint", default="random:full")
    parser.add_argument("--quick", action="store_true", help="singles only")
    parser.add_argument(
        "--prune", action="store_true", help="delete stale fingerprint dirs"
    )
    args = parser.parse_args()

    import numpy as np
    from PIL import Image

    from riffusion_tpu import aot
    from riffusion_tpu.datatypes import InferenceInput, PromptInput
    from riffusion_tpu.riffusion_pipeline import RiffusionPipeline
    from riffusion_tpu.serving import FAST_PRESET
    from riffusion_tpu.spectrogram_params import SpectrogramParams

    if not aot.enabled():
        raise SystemExit("RIFFUSION_TPU_NO_AOT is set; nothing to build")

    if args.prune:
        for path in aot.prune():
            log(f"pruned stale fingerprint: {path}")

    t_all = time.time()
    pipe = RiffusionPipeline.load_checkpoint(args.checkpoint)
    params = SpectrogramParams()
    rng = np.random.default_rng(0)
    init_image = Image.fromarray(
        rng.integers(60, 220, (512, 512, 3), dtype=np.uint8), mode="RGB"
    )

    def make_inputs(i: int = 0, steps: int = 50) -> InferenceInput:
        return InferenceInput(
            start=PromptInput(prompt=f"groove {i}" if i else "funky synth solo", seed=42 + i),
            end=PromptInput(prompt="jazzy saxophone", seed=123 + i),
            alpha=0.5 if not i else 0.05 * i,
            num_inference_steps=steps,
        )

    fast_steps, fast_sched = FAST_PRESET["steps"], FAST_PRESET["scheduler"]
    jobs = [
        ("parity single (50-step fused)", lambda: pipe.riffuse_audio(
            make_inputs(), init_image, params=params)),
        (f"FAST single ({fast_sched}-{fast_steps})", lambda: pipe.riffuse_audio(
            make_inputs(steps=fast_steps), init_image, params=params, scheduler=fast_sched)),
    ]
    if not args.quick:
        jobs += [
            (f"FAST batch-16 ({fast_sched}-{fast_steps})", lambda: pipe.riffuse_audio_batch(
                [make_inputs(i, steps=fast_steps) for i in range(16)],
                init_image, params=params, scheduler=fast_sched)),
            ("parity batch-16", lambda: pipe.riffuse_audio_batch(
                [make_inputs(i) for i in range(16)], init_image, params=params)),
            ("parity batch-8", lambda: pipe.riffuse_audio_batch(
                [make_inputs(i) for i in range(8)], init_image, params=params)),
        ]

    for name, run in jobs:
        t0 = time.time()
        run()
        log(f"built: {name} in {time.time() - t0:.1f} s")

    store = os.path.join(aot.store_dir(), aot.fingerprint())
    total_mb = 0.0
    for f in sorted(os.listdir(store)) if os.path.isdir(store) else []:
        size = os.path.getsize(os.path.join(store, f)) / 1e6
        total_mb += size
        log(f"  {f}  {size:8.1f} MB")
    log(f"store: {store}  ({total_mb:.0f} MB total) in {time.time() - t_all:.1f} s")


if __name__ == "__main__":
    main()
