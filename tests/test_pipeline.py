"""
Pipeline integration tests on the tiny random-weight bundle: riffuse /
riffuse_audio / txt2img / img2img / masks, determinism, prompt weighting,
and the fused-path geometry contract.
"""

import numpy as np
import pytest
from PIL import Image

from riffusion_tpu.datatypes import InferenceInput, PromptInput
from riffusion_tpu.riffusion_pipeline import (
    RiffusionPipeline,
    preprocess_image,
    preprocess_mask,
)
from riffusion_tpu.spectrogram_params import SpectrogramParams


@pytest.fixture(scope="module")
def pipe():
    return RiffusionPipeline.load_checkpoint("random:tiny", device="cpu")


@pytest.fixture()
def init_image():
    rng = np.random.default_rng(0)
    return Image.fromarray(rng.integers(0, 255, (64, 64, 3), dtype=np.uint8), mode="RGB")


def _inputs(alpha=0.25, steps=4, seed_a=42, seed_b=99):
    return InferenceInput(
        start=PromptInput(prompt="acoustic folk guitar", seed=seed_a),
        end=PromptInput(prompt="heavy techno beat", seed=seed_b),
        alpha=alpha,
        num_inference_steps=steps,
    )


def test_riffuse_shapes_and_determinism(pipe, init_image):
    img1 = pipe.riffuse(_inputs(), init_image)
    img2 = pipe.riffuse(_inputs(), init_image)
    assert img1.size == (64, 64)
    np.testing.assert_array_equal(np.array(img1), np.array(img2))


def test_riffuse_seed_sensitivity(pipe, init_image):
    img1 = pipe.riffuse(_inputs(seed_a=1), init_image)
    img2 = pipe.riffuse(_inputs(seed_a=2), init_image)
    assert not np.array_equal(np.array(img1), np.array(img2))


def test_riffuse_alpha_endpoints(pipe, init_image):
    img0 = pipe.riffuse(_inputs(alpha=0.0), init_image)
    img1 = pipe.riffuse(_inputs(alpha=1.0), init_image)
    assert not np.array_equal(np.array(img0), np.array(img1))


def test_riffuse_audio_fused(pipe, init_image):
    params = SpectrogramParams(num_frequencies=64)
    image, audio = pipe.riffuse_audio(_inputs(), init_image, params=params)
    assert image.size == (64, 64)
    assert audio.frame_rate == 44100
    # 64 frames -> (64-1)*hop samples
    assert audio.frame_count == 63 * params.hop_length


def test_riffuse_with_mask(pipe, init_image):
    mask = Image.fromarray(
        np.tile(np.linspace(0, 255, 64, dtype=np.uint8)[:, None], (1, 64))
    )
    img_masked = pipe.riffuse(_inputs(), init_image, mask_image=mask)
    img_plain = pipe.riffuse(_inputs(), init_image)
    assert not np.array_equal(np.array(img_masked), np.array(img_plain))


def test_txt2img_and_img2img(pipe, init_image):
    img = pipe.txt2img("piano melody", seed=5, num_inference_steps=3, width=64, height=64)
    assert img.size == (64, 64)
    img2 = pipe.img2img("jazz sax", init_image, denoising_strength=0.6, num_inference_steps=4)
    assert img2.size == (64, 64)


def test_weighted_prompts_differ(pipe, init_image):
    def run(prompt):
        return pipe.riffuse(
            InferenceInput(
                start=PromptInput(prompt=prompt, seed=42),
                end=PromptInput(prompt="heavy techno beat", seed=99),
                alpha=0.25,
                num_inference_steps=4,
            ),
            init_image,
        )

    weighted = run("lo-fi (jazz:1.8) beat")
    plain = run("lo-fi jazz beat")
    assert not np.array_equal(np.array(weighted), np.array(plain))


def test_embed_text_cached(pipe):
    e1 = pipe.embed_text("same prompt")
    e2 = pipe.embed_text("same prompt")
    assert e1 is e2  # lru cache hit


def test_preprocess_image_stride():
    img = Image.new("RGB", (70, 100))
    arr = preprocess_image(img)
    assert arr.shape == (1, 96, 64, 3)
    assert arr.min() >= -1.0 and arr.max() <= 1.0


def test_preprocess_mask_invert():
    mask = Image.new("L", (64, 64), 255)  # all white -> repaint -> zeros
    arr = preprocess_mask(mask, size=(8, 8))
    assert arr.shape == (1, 8, 8, 4)
    np.testing.assert_allclose(arr, 0.0)


def test_scheduler_switch(pipe, init_image):
    img_d = pipe.img2img("beat", init_image, num_inference_steps=4, scheduler="ddim")
    img_e = pipe.img2img("beat", init_image, num_inference_steps=4, scheduler="euler")
    assert img_d.size == img_e.size == (64, 64)


def test_img2img_magic_mix(pipe, init_image):
    """MagicMix semantic img2img (reference streamlit/util.py:317-350):
    layout-preserving blend must run, be deterministic, and respond to
    mix_factor."""
    img1 = pipe.img2img_magic_mix(
        "orchestral strings", init_image, num_inference_steps=4, seed=7,
        kmin=0.3, kmax=0.6, mix_factor=0.5,
    )
    img2 = pipe.img2img_magic_mix(
        "orchestral strings", init_image, num_inference_steps=4, seed=7,
        kmin=0.3, kmax=0.6, mix_factor=0.5,
    )
    assert img1.size == (64, 64)
    np.testing.assert_array_equal(np.array(img1), np.array(img2))

    img3 = pipe.img2img_magic_mix(
        "orchestral strings", init_image, num_inference_steps=4, seed=7,
        kmin=0.3, kmax=0.6, mix_factor=0.9,
    )
    assert not np.array_equal(np.array(img1), np.array(img3))


def test_img2img_magic_mix_sigma_scheduler(pipe, init_image):
    """Magic mix under a sigma-space scheduler exercises the
    add_noise_at_index dispatch in the q-sampling branch."""
    img = pipe.img2img_magic_mix(
        "piano", init_image, num_inference_steps=4, seed=3, scheduler="euler",
    )
    arr = np.array(img)
    assert arr.shape == (64, 64, 3)
    assert np.isfinite(arr.astype(np.float64)).all()
    assert arr.std() > 0


def test_request_keys_independent():
    """The VAE reparameterization key must differ from the noise_a key:
    identical keys make the encoder's sampling draw bit-identical to the
    img2img noise (round-2 RNG correlation defect). The reference draws both
    sequentially from one generator (riffusion_pipeline.py:233-239, 371-377)."""
    import jax

    from riffusion_tpu.riffusion_pipeline import request_keys

    keys = request_keys(42, 99)
    raw = [tuple(np.asarray(k).tolist()) for k in keys]
    assert len(set(raw)) == 4, f"request keys not pairwise distinct: {raw}"
    vae_draw = np.asarray(jax.random.normal(keys[0], (2, 8, 8, 4)))
    noise_a = np.asarray(jax.random.normal(keys[1], (2, 8, 8, 4)))
    assert not np.array_equal(vae_draw, noise_a)
    # deterministic per seed pair
    np.testing.assert_array_equal(np.asarray(request_keys(42, 99)), np.asarray(keys))
