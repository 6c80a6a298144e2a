"""
Fine-tuning subsystem tests: dataset precompute, the training loop with EMA,
checkpoint resume, and the export -> RiffusionPipeline.load_checkpoint bridge.

Runs end-to-end on the tiny random bundle at 64x64 spectrogram geometry
(640 ms clips -> 8x8 latents) over the virtual 8-device CPU mesh from
conftest. The reference has no training path to mirror (SURVEY §5:
inference-only), so these tests define the contract.
"""

import json

import numpy as np
import pytest
from PIL import Image

from riffusion_tpu.audio.segment import AudioSegment
from riffusion_tpu.riffusion_pipeline import RiffusionPipeline
from riffusion_tpu.spectrogram_params import SpectrogramParams
from riffusion_tpu.training import (
    FinetuneConfig,
    LatentDataset,
    build_latent_dataset,
    run_finetune,
)

TINY_PARAMS = SpectrogramParams(num_frequencies=64)
CLIP_MS = 640  # 64 frames at 10 ms/step -> 64x64 image -> 8x8 latents


@pytest.fixture(scope="module")
def pipe():
    return RiffusionPipeline.load_checkpoint("random:tiny", device="cpu")


@pytest.fixture(scope="module")
def audio_dir(tmp_path_factory):
    """Three short audio files (two share a prompt via prompts.json)."""
    root = tmp_path_factory.mktemp("audio")
    rng = np.random.default_rng(7)
    sr = 44100
    t = np.arange(int(sr * 1.5)) / sr  # 1.5 s -> 2 clips of 640 ms each
    for i, freq in enumerate((220.0, 440.0, 660.0)):
        wave = 0.5 * np.sin(2 * np.pi * freq * t) + 0.05 * rng.standard_normal(t.shape)
        seg = AudioSegment((wave * 32767).astype(np.int16), sr)
        seg.export(str(root / f"tone_{i}.wav"), format="wav")
    (root / "prompts.json").write_text(
        json.dumps({"tone_0.wav": "low drone", "tone_1.wav": "low drone"})
    )
    return root


@pytest.fixture(scope="module")
def dataset_dir(pipe, audio_dir, tmp_path_factory):
    out = tmp_path_factory.mktemp("latents")
    meta = build_latent_dataset(
        pipe,
        audio_dir,
        out,
        params=TINY_PARAMS,
        clip_duration_ms=CLIP_MS,
        encode_batch=4,
        shard_size=4,
    )
    assert meta.num_clips == 6  # 3 files x 2 clips
    return out


def test_dataset_shapes_and_prompt_dedup(dataset_dir, pipe):
    ds = LatentDataset(dataset_dir)
    assert len(ds) == 6
    # 64x64 image -> 8x8 latents with the VAE's latent channel count
    assert ds.meta.latent_shape == (8, 8, pipe.bundle.vae_config.latent_channels)
    # prompts: "low drone" (2 files) + "tone 2" (from filename) = 2 unique
    assert len(ds.meta.prompts) == 2
    assert "low drone" in ds.meta.prompts
    assert ds.contexts.shape == (2, 77, pipe.bundle.clip_config.hidden_size)
    # every clip references a valid prompt row
    assert set(np.unique(ds.ctx)) <= {0, 1}
    # multi-shard write path: 6 clips at shard_size=4 -> 2 shards
    assert ds.meta.num_shards == 2


def test_dataset_batches_are_shuffled_and_scaled(dataset_dir):
    ds = LatentDataset(dataset_dir)
    it = ds.batches(batch_size=4, seed=0)
    lat1, ctx1 = next(it)
    assert lat1.shape == (4, *ds.meta.latent_shape)
    assert ctx1.shape == (4, *ds.meta.context_shape)
    assert lat1.dtype == np.float32
    # posterior sampling: successive epochs of the same clip differ
    lat2, _ = next(it)
    assert not np.array_equal(lat1, lat2)
    # deterministic stream for a fixed seed
    it_b = ds.batches(batch_size=4, seed=0)
    lat1b, ctx1b = next(it_b)
    np.testing.assert_array_equal(lat1, lat1b)
    np.testing.assert_array_equal(ctx1, ctx1b)
    # latents are scaled by the VAE scaling factor (not raw moments): with
    # random-init VAE the posterior mean is O(1), so scaled std ≈ 0.18 * raw
    assert 0 < ds.meta.scaling_factor < 1


def test_batch_size_larger_than_dataset_raises(dataset_dir):
    ds = LatentDataset(dataset_dir)
    with pytest.raises(ValueError, match="exceeds dataset size"):
        next(ds.batches(batch_size=64))


@pytest.fixture(scope="module")
def finetune_run(dataset_dir, tmp_path_factory):
    out = tmp_path_factory.mktemp("run")
    cfg = FinetuneConfig(
        checkpoint="random:tiny",
        dataset_dir=str(dataset_dir),
        output_dir=str(out),
        steps=4,
        batch_size=4,
        learning_rate=1e-3,
        warmup_steps=1,
        ema_decay=0.5,
        checkpoint_every=2,
        log_every=1,
    )
    stats = run_finetune(cfg, log=lambda s: None)
    return cfg, out, stats


@pytest.mark.slow  # full train-step compile (multi-minute on 1 core); CI slow job
def test_finetune_trains_and_logs(finetune_run):
    cfg, out, stats = finetune_run
    assert stats["steps"] == 4
    assert np.isfinite(stats["final_loss"])
    assert stats["num_clips"] == 6
    losses = json.loads((out / "loss_log.json").read_text())
    assert [s for s, _ in losses] == [1, 2, 3, 4]
    # mid-run checkpoint (step 2) plus the final one (step 4)
    assert (out / "checkpoints" / "state_2").is_dir()
    assert (out / "checkpoints" / "state_4").is_dir()


@pytest.mark.slow  # full train-step compile (multi-minute on 1 core); CI slow job
def test_finetune_export_loads_and_riffuses(finetune_run):
    _, out, stats = finetune_run
    tuned = RiffusionPipeline.load_checkpoint(stats["export_dir"], device="cpu")
    base = RiffusionPipeline.load_checkpoint("random:tiny", device="cpu")
    # training moved the UNet away from the base weights...
    tuned_leaf = np.asarray(
        next(iter(jax_leaves(tuned.unet_params)))
    )
    base_leaf = np.asarray(next(iter(jax_leaves(base.unet_params))))
    assert not np.allclose(tuned_leaf, base_leaf)
    # ...while VAE/CLIP are untouched (frozen during fine-tune)
    np.testing.assert_allclose(
        np.asarray(next(iter(jax_leaves(tuned.vae_params)))),
        np.asarray(next(iter(jax_leaves(base.vae_params)))),
    )
    # and the exported checkpoint actually generates
    rng = np.random.default_rng(0)
    init = Image.fromarray(rng.integers(0, 255, (64, 64, 3), dtype=np.uint8), "RGB")
    from riffusion_tpu.datatypes import InferenceInput, PromptInput

    img = tuned.riffuse(
        InferenceInput(
            start=PromptInput(prompt="low drone", seed=1),
            end=PromptInput(prompt="tone 2", seed=2),
            alpha=0.5,
            num_inference_steps=2,
        ),
        init,
    )
    assert img.size == (64, 64)


@pytest.mark.slow  # full train-step compile (multi-minute on 1 core); CI slow job
def test_finetune_ema_lags_raw_params(finetune_run):
    """EMA export must differ from both the init and the raw final params."""
    cfg, out, stats = finetune_run
    import orbax.checkpoint as ocp

    raw = ocp.StandardCheckpointer().restore(str((out / "checkpoints" / "state_4").absolute()))
    p = np.asarray(next(iter(jax_leaves(raw["params"]))))
    e = np.asarray(next(iter(jax_leaves(raw["ema"]))))
    assert not np.allclose(p, e)


@pytest.mark.slow  # full train-step compile (multi-minute on 1 core); CI slow job
def test_finetune_resume_continues(dataset_dir, tmp_path_factory):
    """Re-invoking with larger steps resumes from the newest checkpoint and
    reproduces the uninterrupted run's data stream."""
    out = tmp_path_factory.mktemp("resume")
    base = dict(
        checkpoint="random:tiny",
        dataset_dir=str(dataset_dir),
        output_dir=str(out),
        batch_size=4,
        learning_rate=1e-3,
        warmup_steps=1,
        ema_decay=0.0,
        checkpoint_every=2,
        log_every=1,
    )
    run_finetune(FinetuneConfig(steps=2, **base), log=lambda s: None)
    logged = []
    stats = run_finetune(
        FinetuneConfig(steps=4, **base), log=lambda s: logged.append(s)
    )
    assert stats["steps"] == 4
    assert any("resumed from checkpoint step 2" in s for s in logged)
    losses = json.loads((out / "loss_log.json").read_text())
    assert [s for s, _ in losses] == [1, 2, 3, 4]


def jax_leaves(tree):
    import jax

    return jax.tree_util.tree_leaves(tree)
