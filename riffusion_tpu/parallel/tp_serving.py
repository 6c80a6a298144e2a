"""
Tensor-parallel single-request serving.

Data parallelism (riffuse_audio_batch(mesh=...)) scales THROUGHPUT: N chips
serve N clips in the wall-clock of one. This module scales LATENCY: one
request's UNet runs with its attention qkv/out and MLP kernels column/row-
split over the mesh "model" axis (the same Megatron-style layout the trainer
uses, parallel/train.py:34-56), so a latency-critical deployment can spend
several chips on a single clip. GSPMD inserts the all-reduces: a column-split
kernel produces "model"-sharded activations consumed head-wise, and the
paired row-split projection reduces over ICI — no hand-written collectives.

The reference is single-GPU only (one pipeline on one device,
riffusion_pipeline.py:63-90); this has no reference equivalent.

Usage:
    mesh = make_mesh(axis_names=("model",))
    image, segment = riffuse_audio_tp(pipe, inputs, init_image, mesh,
                                      params=SpectrogramParams())

Validated numerically on the virtual-CPU mesh: the tp output equals the
single-device output (tests/test_tp_serving.py), proving the layout rules
reconstruct the exact same math.
"""

from __future__ import annotations

import typing as T
import weakref

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from PIL import Image

from riffusion_tpu.datatypes import InferenceInput
from riffusion_tpu.parallel.train import shard_params

if T.TYPE_CHECKING:  # pragma: no cover
    from riffusion_tpu.riffusion_pipeline import RiffusionPipeline
    from riffusion_tpu.spectrogram_params import SpectrogramParams

# per-(pipeline, mesh) cache of the mesh param placement — resharding ~900M
# params is a one-time cost per process. Keyed WEAKLY by pipeline: an id()
# key could alias a new pipeline after garbage collection (serving stale
# weights), and would pin the sharded params in device memory forever.
_TP_CACHE: "weakref.WeakKeyDictionary[T.Any, T.Dict[Mesh, T.Tuple]]" = (
    weakref.WeakKeyDictionary()
)


def _tp_placed(pipeline: "RiffusionPipeline", mesh: Mesh):
    """(tp-sharded UNet params, replicated VAE params) for this mesh."""
    per_pipe = _TP_CACHE.setdefault(pipeline, {})
    if mesh not in per_pipe:
        per_pipe[mesh] = (
            shard_params(pipeline.unet_params, mesh),
            _replicate(pipeline.vae_params, mesh),
        )
    return per_pipe[mesh]


def _replicate(tree, mesh: Mesh):
    """Place every array leaf on the mesh fully replicated."""
    repl = NamedSharding(mesh, P())

    def place(x):
        if isinstance(x, (jax.Array, np.ndarray)):
            return jax.device_put(x, repl)
        return x

    return jax.tree.map(place, tree)


def riffuse_audio_tp(
    pipeline: "RiffusionPipeline",
    inputs: InferenceInput,
    init_image: Image.Image,
    mesh: Mesh,
    params: T.Optional["SpectrogramParams"] = None,
    mask_image: T.Optional[Image.Image] = None,
    use_reweighting: bool = True,
    apply_filters: bool = True,
    scheduler: T.Optional[str] = None,
):
    """One riffuse_audio request with the UNet tensor-parallel over `mesh`'s
    "model" axis. Returns (PIL image, AudioSegment) with the same argument
    surface as `RiffusionPipeline.riffuse_audio` (mask, reweighting, filter
    and scheduler knobs all pass through).

    Reuses the pipeline's fused program unchanged: jit specializes on the
    argument shardings, so the single-device program and the tp program are
    two compilations of one callable, and GSPMD derives the collectives from
    the param layout alone."""
    from riffusion_tpu.spectrogram_params import SpectrogramParams

    params = params or SpectrogramParams()
    program, args = pipeline._build_call(
        inputs, init_image, mask_image, use_reweighting, params, scheduler
    )
    (unet_params, vae_params, *rest) = args
    unet_tp, vae_repl = _tp_placed(pipeline, mesh)
    args_tp = (unet_tp, vae_repl, *(_replicate(a, mesh) for a in rest))
    # mesh-sharded args must go to the raw jit wrapper (which specializes on
    # shardings), not a stored single-device executable (aot.AotProgram)
    program = getattr(program, "jit_fn", program)
    image_u8, waveform = program(*args_tp)
    image_np, waveform_np = jax.device_get((image_u8, waveform))
    from riffusion_tpu.audio.segment import AudioSegment
    from riffusion_tpu.util import audio_util

    segment = AudioSegment(waveform_np.T, params.sample_rate)
    if apply_filters:
        segment = audio_util.apply_filters(segment, compression=False)
    return Image.fromarray(image_np, mode="RGB"), segment


def dryrun_tp_serving(n_devices: int) -> float:
    """One tensor-parallel riffuse_audio on tiny shapes over an n-device
    ("model",) mesh — used by __graft_entry__.dryrun_multichip to validate
    the latency-scaling inference sharding alongside the training step and
    the data-parallel serving batch."""
    from riffusion_tpu.parallel.mesh import make_mesh
    from riffusion_tpu.riffusion_pipeline import RiffusionPipeline
    from riffusion_tpu.spectrogram_params import SpectrogramParams

    devices = jax.devices()[:n_devices]
    assert len(devices) == n_devices
    mesh = make_mesh((n_devices,), ("model",), devices=devices)
    pipe = RiffusionPipeline.load_checkpoint("random:tiny")
    rng = np.random.default_rng(0)
    init = Image.fromarray(rng.integers(0, 255, (64, 64, 3), np.uint8))
    from riffusion_tpu.datatypes import PromptInput

    inputs = InferenceInput(
        start=PromptInput(prompt="tp check", seed=1),
        end=PromptInput(prompt="target", seed=2),
        alpha=0.4,
        num_inference_steps=2,
    )
    _, segment = riffuse_audio_tp(
        pipe, inputs, init, mesh, params=SpectrogramParams(num_frequencies=64)
    )
    data = segment.raw_data.astype(np.float64)
    assert np.isfinite(data).all() and np.abs(data).max() > 0
    return segment.duration_seconds
