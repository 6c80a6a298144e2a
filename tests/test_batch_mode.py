"""Batched riffuse: N requests in one device program must match serial
execution exactly and preserve per-request identity."""

import numpy as np
import pytest
from PIL import Image

from riffusion_tpu.datatypes import InferenceInput, PromptInput
from riffusion_tpu.riffusion_pipeline import RiffusionPipeline
from riffusion_tpu.spectrogram_params import SpectrogramParams


@pytest.fixture(scope="module")
def pipe():
    return RiffusionPipeline.load_checkpoint("random:tiny", device="cpu")


def _req(i, steps=3):
    return InferenceInput(
        start=PromptInput(prompt=f"style {i}", seed=i),
        end=PromptInput(prompt="target", seed=100 + i),
        alpha=0.25 * i,
        num_inference_steps=steps,
    )


@pytest.mark.slow  # multi-minute compile on 1 core; runs in the CI slow job
def test_batch_matches_serial(pipe):
    rng = np.random.default_rng(1)
    init = Image.fromarray(rng.integers(0, 255, (64, 64, 3), dtype=np.uint8))
    params = SpectrogramParams(num_frequencies=64)
    reqs = [_req(i) for i in range(3)]

    batch = pipe.riffuse_audio_batch(reqs, init, params=params)
    assert len(batch) == 3

    img_serial, audio_serial = pipe.riffuse_audio(reqs[1], init, params=params)
    # batched matmul/conv reductions reassociate: allow +-2 uint8 quantization
    diff = np.abs(
        np.array(batch[1][0]).astype(np.int16) - np.array(img_serial).astype(np.int16)
    )
    assert diff.max() <= 2, f"max pixel diff {diff.max()}"
    # Phase keys match per request (tests/test_batch_rng.py), but the UNet
    # runs at batch 2N vs 2 so its matmul reductions reassociate; Griffin-Lim
    # amplifies those latent-level float diffs chaotically, so waveforms can
    # differ sample-wise. The invariant is the spectral content:
    # re-analyzing both audios must give near-identical mels.
    mel_b = pipe.converter(params).spectrogram_from_audio(batch[1][1])
    mel_s = pipe.converter(params).spectrogram_from_audio(audio_serial)
    corr = np.corrcoef(np.log1p(mel_b).ravel(), np.log1p(mel_s).ravel())[0, 1]
    assert corr > 0.98, f"mel spectral correlation {corr}"

    # per-request identity preserved
    assert not np.array_equal(np.array(batch[0][0]), np.array(batch[2][0]))


def test_batch_requires_uniform_steps(pipe):
    init = Image.new("RGB", (64, 64))
    with pytest.raises(AssertionError):
        pipe.riffuse_audio_batch([_req(0, steps=3), _req(1, steps=4)], init)


@pytest.mark.slow  # multi-minute compile on 1 core; runs in the CI slow job
def test_sharded_batch_matches_unsharded(pipe):
    """riffuse_audio_batch(mesh=...) shards the batch over the mesh 'data'
    axis; results must match the single-device batch program bit-for-bit
    up to uint8 rounding (multi-chip serving path, SURVEY.md §2.2)."""
    import jax

    from riffusion_tpu.parallel.mesh import make_mesh

    mesh = make_mesh((4, 2), ("data", "model"))
    rng = np.random.default_rng(2)
    init = Image.fromarray(rng.integers(0, 255, (64, 64, 3), dtype=np.uint8))
    params = SpectrogramParams(num_frequencies=64)
    reqs = [_req(i) for i in range(4)]

    plain = pipe.riffuse_audio_batch(reqs, init, params=params)
    sharded = pipe.riffuse_audio_batch(reqs, init, params=params, mesh=mesh)
    assert len(sharded) == 4
    for (img_p, seg_p), (img_s, seg_s) in zip(plain, sharded):
        diff = np.abs(
            np.array(img_p).astype(np.int16) - np.array(img_s).astype(np.int16)
        )
        assert diff.max() <= 2, f"max pixel diff {diff.max()}"
        assert seg_s.duration_seconds == pytest.approx(seg_p.duration_seconds)


def test_sharded_batch_requires_divisible_batch(pipe):
    from riffusion_tpu.parallel.mesh import make_mesh

    mesh = make_mesh((4, 2), ("data", "model"))
    init = Image.new("RGB", (64, 64))
    with pytest.raises(AssertionError):
        pipe.riffuse_audio_batch([_req(i) for i in range(3)], init, mesh=mesh)


@pytest.mark.slow  # multi-minute compile on 1 core; runs in the CI slow job
def test_per_item_init_images(pipe):
    """riffuse_audio_batch accepts one init image PER request (the long-audio
    clip sweep): each request's output must match the single-request result
    for its own image within uint8 rounding."""
    rng = np.random.default_rng(5)
    images = [
        Image.fromarray(rng.integers(0, 255, (64, 64, 3), dtype=np.uint8))
        for _ in range(2)
    ]
    params = SpectrogramParams(num_frequencies=64)
    reqs = [_req(i) for i in range(2)]

    batch = pipe.riffuse_audio_batch(reqs, images, params=params)
    assert len(batch) == 2
    for i in range(2):
        img_serial, _ = pipe.riffuse_audio(reqs[i], images[i], params=params)
        diff = np.abs(
            np.array(batch[i][0]).astype(np.int16) - np.array(img_serial).astype(np.int16)
        )
        assert diff.max() <= 2, f"request {i}: max pixel diff {diff.max()}"

    with pytest.raises(AssertionError):
        pipe.riffuse_audio_batch(reqs, images[:1], params=params)  # count mismatch


@pytest.mark.slow  # multi-minute compile on 1 core; runs in the CI slow job
def test_masked_batch_matches_serial(pipe):
    """Batched inpainting: a shared mask in the batch program must reproduce
    the single-request masked result per item."""
    rng = np.random.default_rng(7)
    init = Image.fromarray(rng.integers(0, 255, (64, 64, 3), dtype=np.uint8))
    # white top half = preserved region after preprocess_mask inversion rules
    mask_arr = np.full((64, 64), 255, np.uint8)
    mask_arr[32:] = 0
    mask = Image.fromarray(mask_arr)
    params = SpectrogramParams(num_frequencies=64)
    reqs = [_req(i) for i in range(2)]

    batch = pipe.riffuse_audio_batch(reqs, init, params=params, mask_image=mask)
    for i in range(2):
        img_serial = pipe.riffuse(reqs[i], init, mask_image=mask)
        diff = np.abs(
            np.array(batch[i][0]).astype(np.int16) - np.array(img_serial).astype(np.int16)
        )
        assert diff.max() <= 2, f"request {i}: max pixel diff {diff.max()}"


def test_batch_rejects_mixed_strengths(pipe):
    """Heterogeneous denoising strengths must raise, not silently average
    (the start step is a compile-time constant of the batched program)."""
    init = Image.new("RGB", (64, 64))
    weak = InferenceInput(
        start=PromptInput(prompt="a", seed=1, denoising=0.4),
        end=PromptInput(prompt="b", seed=2, denoising=0.4),
        alpha=0.0,
        num_inference_steps=3,
    )
    with pytest.raises(ValueError, match="denoising strength"):
        pipe.riffuse_audio_batch([_req(0), weak], init)
