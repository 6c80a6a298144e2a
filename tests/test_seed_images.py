"""
Seed-image musical-prior validation: the procedurally regenerated seed
spectrograms (scripts/make_seed_images.py) are img2img tempo/rhythm priors
(the reference serves them by id, server.py:130-142), so each must decode to
a spectrogram with real beat structure — strong onset-envelope periodicity in
a musical tempo range — not just the right geometry.
"""

import os

import numpy as np
import pytest
from PIL import Image

from riffusion_tpu.util import image_util

SEED_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "seed_images")

SEEDS = ["og_beat", "agile", "marim", "motorway", "vibes"]
MASKS = [
    "mask_beat_lines_80", "mask_gradient_dark", "mask_gradient_top_70",
    "mask_gradient_top_fifth_75", "mask_top_third_75", "mask_top_third_95",
]


def _onset_autocorr(name: str):
    img = Image.open(os.path.join(SEED_DIR, f"{name}.png"))
    spec = image_util.spectrogram_from_image(img, power=0.25, stereo=False,
                                             max_value=30e6)
    env = spec.sum(axis=(0, 1))  # energy per 10 ms time column
    env = env - env.mean()
    ac = np.correlate(env, env, "full")[env.size - 1:]
    return ac / (ac[0] + 1e-9)


@pytest.mark.parametrize("name", SEEDS)
def test_seed_has_beat_structure(name):
    """Onset-envelope autocorrelation must peak >= 0.3 at a lag corresponding
    to 60-180 BPM (beat period 333-1000 ms = lag 33-100 at 10 ms/column)."""
    ac = _onset_autocorr(name)
    lo, hi = 33, 100
    peak = float(ac[lo:hi].max())
    lag = lo + int(np.argmax(ac[lo:hi]))
    bpm = 60.0 / (lag * 0.01)
    assert peak >= 0.3, f"{name}: no tempo periodicity (max ac {peak:.2f})"
    assert 60 <= bpm <= 180, f"{name}: implausible tempo {bpm:.0f} BPM"


@pytest.mark.parametrize("name", SEEDS)
def test_seed_geometry_and_energy(name):
    img = Image.open(os.path.join(SEED_DIR, f"{name}.png"))
    assert img.size == (512, 512)
    spec = image_util.spectrogram_from_image(img, power=0.25, stereo=False,
                                             max_value=30e6)
    # energy must span a real frequency band, not a single line
    freq_profile = spec.sum(axis=(0, 2))
    active = (freq_profile > 0.01 * freq_profile.max()).sum()
    assert active > 32, f"{name}: spectral content too narrow ({active} bins)"


@pytest.mark.parametrize("name", MASKS)
def test_mask_is_valid(name):
    """Reference mask convention: white = repaint, darker = keep. Every mask
    is a predominantly-white field (most of the spectrogram is regenerated)
    with darker keep structure; a mostly-dark mask would freeze the output to
    the init image (the round-1 masks had exactly that inversion)."""
    img = Image.open(os.path.join(SEED_DIR, f"{name}.png")).convert("L")
    assert img.size == (512, 512)
    arr = np.asarray(img)
    assert arr.max() == 255, f"{name}: no fully-repainted region"
    assert arr.min() < 250, f"{name}: no keep structure at all"
    assert arr.mean() > 160, f"{name}: predominantly keep — inverted mask?"
