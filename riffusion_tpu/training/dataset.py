"""
Fine-tuning dataset pipeline: audio files -> spectrogram images -> VAE
posterior moments + CLIP text embeddings, cached as npz shards.

TPU-first shape of this pipeline:
  * The expensive step (VAE encode) runs as ONE batched jitted program per
    shard — conv FLOPs land on the MXU, not a per-clip Python loop.
  * Shards store the posterior *moments* (mean, logvar) rather than sampled
    latents, so every training epoch resamples the VAE posterior — the
    standard latent-diffusion recipe — at the cost of a cheap host-side
    gaussian draw instead of re-running the encoder.
  * Text prompts are deduplicated: each unique prompt is CLIP-encoded once
    and clips reference it by index.

The reference has no equivalent (it ships inference only); the closest
analogue is its dataset tooling `cli.sample_clips` / `cli.audio_to_images_batch`
(/root/reference/riffusion/cli.py:98-204), which stops at images on disk.
"""

from __future__ import annotations

import dataclasses
import json
import os
import typing as T
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from riffusion_tpu.audio.segment import AudioSegment
from riffusion_tpu.spectrogram_params import SpectrogramParams

AUDIO_EXTENSIONS = (".wav", ".mp3", ".flac", ".ogg", ".m4a")


@dataclasses.dataclass(frozen=True)
class DatasetMeta:
    num_clips: int
    latent_shape: T.Tuple[int, int, int]  # (h, w, c)
    context_shape: T.Tuple[int, int]  # (seq, hidden)
    scaling_factor: float
    num_shards: int
    prompts: T.Tuple[str, ...]
    params: T.Dict[str, T.Any]  # SpectrogramParams asdict, for provenance

    def to_json(self) -> dict:
        return dataclasses.asdict(self)

    @classmethod
    def from_json(cls, d: dict) -> "DatasetMeta":
        return cls(
            num_clips=d["num_clips"],
            latent_shape=tuple(d["latent_shape"]),
            context_shape=tuple(d["context_shape"]),
            scaling_factor=d["scaling_factor"],
            num_shards=d["num_shards"],
            prompts=tuple(d["prompts"]),
            params=d["params"],
        )


def _iter_audio_files(audio_dir: Path) -> T.List[Path]:
    files = sorted(
        p for p in audio_dir.iterdir()
        if p.suffix.lower() in AUDIO_EXTENSIONS and p.is_file()
    )
    if not files:
        raise FileNotFoundError(f"no audio files ({AUDIO_EXTENSIONS}) in {audio_dir}")
    return files


def _prompt_for(path: Path, prompts_map: T.Dict[str, str], default_prompt: T.Optional[str]) -> str:
    if path.name in prompts_map:
        return prompts_map[path.name]
    if path.stem in prompts_map:
        return prompts_map[path.stem]
    if default_prompt is not None:
        return default_prompt
    # filename as prompt: "lofi_hip_hop-take2" -> "lofi hip hop take2"
    return path.stem.replace("_", " ").replace("-", " ").strip()


def _slice_clips(segment: AudioSegment, clip_duration_ms: int, max_clips: int) -> T.List[AudioSegment]:
    """Non-overlapping fixed-duration windows; drops the trailing remainder
    so every clip maps to the same spectrogram geometry (static shapes)."""
    total_ms = int(segment.duration_seconds * 1000)
    clips = []
    for start in range(0, total_ms - clip_duration_ms + 1, clip_duration_ms):
        clips.append(segment[start : start + clip_duration_ms])
        if len(clips) >= max_clips:
            break
    return clips


def build_latent_dataset(
    pipeline,
    audio_dir: T.Union[str, Path],
    out_dir: T.Union[str, Path],
    params: T.Optional[SpectrogramParams] = None,
    prompts_json: T.Optional[T.Union[str, Path]] = None,
    default_prompt: T.Optional[str] = None,
    clip_duration_ms: int = 5120,
    max_clips_per_file: int = 64,
    encode_batch: int = 8,
    shard_size: int = 256,
    seed: int = 0,
) -> DatasetMeta:
    """Precompute (VAE moments, prompt index) shards from a directory of audio.

    `pipeline` is a loaded RiffusionPipeline — its VAE/CLIP weights and
    device placement are reused. 5120 ms = 512 frames x 10 ms, the flagship
    512x512 spectrogram geometry (and the reference's own dataset-clip
    default, cli.py:102 duration_ms=5120).
    """
    from riffusion_tpu.riffusion_pipeline import preprocess_image

    audio_dir = Path(audio_dir)
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    params = params or SpectrogramParams()

    prompts_map: T.Dict[str, str] = {}
    if prompts_json is None and (audio_dir / "prompts.json").exists():
        prompts_json = audio_dir / "prompts.json"
    if prompts_json is not None:
        with open(prompts_json, encoding="utf-8") as fh:
            prompts_map = json.load(fh)

    from riffusion_tpu.spectrogram_image_converter import SpectrogramImageConverter

    converter = SpectrogramImageConverter(params, device=pipeline.device)

    # ---- enumerate (image array, prompt) pairs -----------------------------
    images: T.List[np.ndarray] = []
    prompt_of_clip: T.List[str] = []
    for path in _iter_audio_files(audio_dir):
        segment = AudioSegment.from_file(str(path))
        prompt = _prompt_for(path, prompts_map, default_prompt)
        for clip in _slice_clips(segment, clip_duration_ms, max_clips_per_file):
            img = converter.spectrogram_image_from_audio(clip)
            arr = preprocess_image(img)[0]  # (H, W, 3) float32 in [-1, 1]
            # VAE downsamples 8x; crop to stride-8 geometry (static shapes)
            h8, w8 = (arr.shape[0] // 8) * 8, (arr.shape[1] // 8) * 8
            images.append(arr[:h8, :w8])
            prompt_of_clip.append(prompt)
    if not images:
        raise ValueError(
            f"no clips of {clip_duration_ms} ms could be sliced from {audio_dir} "
            "(are the files shorter than one clip?)"
        )

    # ---- dedup + embed prompts --------------------------------------------
    unique_prompts = sorted(set(prompt_of_clip))
    prompt_index = {p: i for i, p in enumerate(unique_prompts)}
    contexts = np.stack(
        [np.asarray(pipeline.embed_text(p))[0] for p in unique_prompts]
    ).astype(np.float16)  # (P, 77, hidden)
    ctx_of_clip = np.asarray([prompt_index[p] for p in prompt_of_clip], np.int32)

    # ---- batched VAE encode (one jitted program, padded final batch) -------
    vae = pipeline.vae
    vae_params = pipeline.vae_params

    @jax.jit
    def encode(p, imgs):
        mean, logvar = vae.apply({"params": p}, imgs, method="encode_moments")
        return mean, logvar

    means: T.List[np.ndarray] = []
    logvars: T.List[np.ndarray] = []
    for i in range(0, len(images), encode_batch):
        batch = images[i : i + encode_batch]
        n = len(batch)
        if n < encode_batch:  # pad to the compiled batch shape
            batch = batch + [batch[-1]] * (encode_batch - n)
        mean, logvar = encode(vae_params, jnp.stack(batch))
        means.append(np.asarray(mean[:n], np.float16))
        logvars.append(np.asarray(logvar[:n], np.float16))
    mean_all = np.concatenate(means)
    logvar_all = np.concatenate(logvars)

    # ---- write shards ------------------------------------------------------
    num_shards = (len(images) + shard_size - 1) // shard_size
    for s in range(num_shards):
        lo, hi = s * shard_size, min((s + 1) * shard_size, len(images))
        np.savez_compressed(
            out_dir / f"shard_{s:05d}.npz",
            mean=mean_all[lo:hi],
            logvar=logvar_all[lo:hi],
            ctx=ctx_of_clip[lo:hi],
        )
    np.save(out_dir / "contexts.npy", contexts)

    meta = DatasetMeta(
        num_clips=len(images),
        latent_shape=tuple(mean_all.shape[1:]),
        context_shape=tuple(contexts.shape[1:]),
        scaling_factor=float(pipeline.bundle.vae_config.scaling_factor),
        num_shards=num_shards,
        prompts=tuple(unique_prompts),
        params={
            k: v for k, v in dataclasses.asdict(params).items()
            if not isinstance(v, (list, dict)) or v
        },
    )
    with open(out_dir / "meta.json", "w", encoding="utf-8") as fh:
        json.dump(meta.to_json(), fh, indent=2)
    del seed  # reserved for future randomized slicing
    return meta


class LatentDataset:
    """Streams shuffled fixed-shape (latents, contexts) batches from a
    precomputed shard directory. Each epoch resamples the VAE posterior
    (z = mean + std * eps) and rescales by the VAE scaling factor, so the
    trainer sees exactly what the inference path's encode produces
    (riffusion_pipeline.py `_run`'s init-latent scaling)."""

    def __init__(self, root: T.Union[str, Path]):
        self.root = Path(root)
        with open(self.root / "meta.json", encoding="utf-8") as fh:
            self.meta = DatasetMeta.from_json(json.load(fh))
        self.contexts = np.load(self.root / "contexts.npy").astype(np.float32)
        means, logvars, ctxs = [], [], []
        for s in range(self.meta.num_shards):
            with np.load(self.root / f"shard_{s:05d}.npz") as z:
                means.append(z["mean"])
                logvars.append(z["logvar"])
                ctxs.append(z["ctx"])
        self.mean = np.concatenate(means).astype(np.float32)
        self.logvar = np.concatenate(logvars).astype(np.float32)
        self.ctx = np.concatenate(ctxs)
        assert len(self.mean) == self.meta.num_clips

    def __len__(self) -> int:
        return self.meta.num_clips

    def batches(
        self, batch_size: int, seed: int = 0, sample_posterior: bool = True
    ) -> T.Iterator[T.Tuple[np.ndarray, np.ndarray]]:
        """Infinite epoch-shuffled batch stream (drops the remainder batch to
        keep shapes static for XLA)."""
        if batch_size > len(self):
            raise ValueError(
                f"batch_size {batch_size} exceeds dataset size {len(self)}"
            )
        rng = np.random.default_rng(seed)
        scale = self.meta.scaling_factor
        while True:
            order = rng.permutation(len(self))
            for lo in range(0, len(self) - batch_size + 1, batch_size):
                idx = order[lo : lo + batch_size]
                mean = self.mean[idx]
                if sample_posterior:
                    std = np.exp(0.5 * self.logvar[idx])
                    z = mean + std * rng.standard_normal(mean.shape).astype(np.float32)
                else:
                    z = mean
                yield z * scale, self.contexts[self.ctx[idx]]
