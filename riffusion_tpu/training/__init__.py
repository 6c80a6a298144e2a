"""Fine-tuning subsystem: dataset precompute + sharded training driver.

The reference ships no training code at all — its riffusion-v1 checkpoint was
fine-tuned elsewhere (SURVEY §5 "Checkpoint/resume: inference-only"). This
package supplies that missing capability TPU-natively: precompute spectrogram
latents as one batched jitted VAE program, then stream fixed-shape batches
into the GSPMD-sharded trainer (parallel/train.py) with EMA and orbax
checkpoint/resume, exporting a native checkpoint that
`RiffusionPipeline.load_checkpoint` loads directly.
"""

from riffusion_tpu.training.dataset import (  # noqa: F401
    LatentDataset,
    build_latent_dataset,
)
from riffusion_tpu.training.finetune import (  # noqa: F401
    FinetuneConfig,
    run_finetune,
)
