"""
Generate the built-in seed spectrogram images and inpainting masks.

The reference ships five 512x512 seed spectrograms (beat/tempo priors for
img2img conditioning) and six masks, looked up by id from server requests
(reference server.py:129-142, seed_images/). This framework synthesizes its
own originals: each seed is a deterministic procedurally-generated groove
rendered to audio and converted with the framework's own DSP stack (so every
seed image round-trips through image_to_audio and carries EXIF params).

Run: python scripts/make_seed_images.py [out_dir]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

from PIL import Image  # noqa: E402

from riffusion_tpu.spectrogram_image_converter import SpectrogramImageConverter  # noqa: E402
from riffusion_tpu.spectrogram_params import SpectrogramParams  # noqa: E402
from riffusion_tpu.audio.segment import AudioSegment  # noqa: E402

SR = 44100
# 512 spectrogram columns: 1 + L // 441 == 512
NUM_SAMPLES = 511 * 441 + 220


def _env(n: int, attack: int, decay: float) -> np.ndarray:
    t = np.arange(n)
    e = np.exp(-t / decay)
    e[:attack] *= np.linspace(0, 1, attack)
    return e


def _kick(rng, t0: int, out: np.ndarray) -> None:
    n = 6000
    t = np.arange(n) / SR
    f = 120 * np.exp(-t * 18) + 45
    sig = np.sin(2 * np.pi * np.cumsum(f) / SR) * _env(n, 40, 1800.0)
    out[t0 : t0 + n] += 0.9 * sig[: max(0, min(n, out.size - t0))]


def _snare(rng, t0: int, out: np.ndarray) -> None:
    n = 5000
    noise = rng.standard_normal(n)
    tone = 0.4 * np.sin(2 * np.pi * 190 * np.arange(n) / SR)
    sig = (0.7 * noise + tone) * _env(n, 20, 900.0)
    out[t0 : t0 + n] += 0.5 * sig[: max(0, min(n, out.size - t0))]


def _hat(rng, t0: int, out: np.ndarray) -> None:
    n = 1800
    noise = rng.standard_normal(n)
    b = np.fft.rfft(noise)
    freqs = np.fft.rfftfreq(n, 1 / SR)
    b[freqs < 5500] = 0
    sig = np.fft.irfft(b, n) * _env(n, 10, 350.0)
    out[t0 : t0 + n] += 0.35 * sig[: max(0, min(n, out.size - t0))]


def _pluck(rng, t0: int, freq: float, out: np.ndarray, gain: float = 0.3) -> None:
    n = 12000
    t = np.arange(n) / SR
    sig = np.zeros(n)
    for k, amp in enumerate([1.0, 0.5, 0.33, 0.2], start=1):
        sig += amp * np.sin(2 * np.pi * freq * k * t + rng.uniform(0, 6.28))
    sig *= _env(n, 60, 2500.0)
    end = min(n, out.size - t0)
    out[t0 : t0 + end] += gain * sig[:end]


def _groove(seed: int, bpm: float, pattern: str, tones: list) -> np.ndarray:
    """One bar-looped groove: pattern chars k/s/h per 16th note + tone plucks."""
    rng = np.random.default_rng(seed)
    out = np.zeros(NUM_SAMPLES)
    step = int(SR * 60 / bpm / 4)  # 16th note
    i = 0
    pos = 0
    while pos < NUM_SAMPLES - 1:
        ch = pattern[i % len(pattern)]
        if "k" in ch:
            _kick(rng, pos, out)
        if "s" in ch:
            _snare(rng, pos, out)
        if "h" in ch:
            _hat(rng, pos, out)
        i += 1
        pos += step
    beat = int(SR * 60 / bpm)
    for j, f in enumerate(tones):
        for rep in range(int(NUM_SAMPLES / (beat * len(tones)))):
            _pluck(rng, (j + rep * len(tones)) * beat % (NUM_SAMPLES - 12000), f, out)
    out += 0.003 * rng.standard_normal(NUM_SAMPLES)
    return (out / np.max(np.abs(out)) * 0.85).astype(np.float32)


SEEDS = {
    # name: (seed, bpm, 16th-note pattern, pluck tones Hz)
    "og_beat": (11, 100, "kh h sh h kh kh sh h ", [110.0, 146.8]),
    "agile": (23, 128, "khh hsh khh shh ", [220.0, 164.8, 196.0]),
    "marim": (37, 95, "k h s h ", [261.6, 329.6, 392.0, 523.3]),
    "motorway": (53, 118, "khkhshkh", [82.4, 110.0]),
    "vibes": (71, 85, "k  h s  h ", [349.2, 440.0, 523.3]),
}


def make_masks(out_dir: Path) -> None:
    """Inpainting masks with the reference's semantics: white (255) = fully
    repainted, darker = increasingly kept (preprocess_mask inverts, so pixel
    value/255 is the repaint weight; reference masks are near-white fields
    with darker "keep" structure in the top frequency bands).
    Structure matches the reference assets (top-third masks are binary at
    round(pct*255); gradients run dark-at-top to white partway down)."""
    h = w = 512
    y = np.linspace(0, 1, h)[:, None]

    def save(name: str, arr: np.ndarray) -> None:
        img = Image.fromarray(np.clip(arr, 0, 255).astype(np.uint8), mode="L")
        img.save(out_dir / f"{name}.png")
        print(f"wrote {out_dir / name}.png")

    # faint beat-aligned vertical "keep" lines (80% repaint) over the upper
    # bands of an otherwise fully-repainted field
    lines = np.full((h, w), 255.0)
    for x in range(0, w, 32):
        lines[: int(0.4 * h), x : x + 4] = 0.8 * 255
    save("mask_beat_lines_80", lines)

    # strong keep at the top fading quadratically to full repaint mid-image
    dark = 32 + (255 - 32) * np.clip(2 * y, 0, 1) ** 2
    save("mask_gradient_dark", np.tile(dark, (1, w)))

    # mild keep (65%) at the top fading linearly to full repaint at mid-image
    top70 = 165 + (255 - 165) * np.clip(2 * y, 0, 1)
    save("mask_gradient_top_70", np.tile(top70, (1, w)))

    # same, concentrated in the top third
    fifth = 165 + (255 - 165) * np.clip(3 * y, 0, 1)
    save("mask_gradient_top_fifth_75", np.tile(fifth, (1, w)))

    third75 = np.full((h, w), 255.0)
    third75[: h // 3] = 192  # ceil(0.75 * 255), the reference's value
    save("mask_top_third_75", third75)
    third95 = np.full((h, w), 255.0)
    third95[: h // 3] = round(0.95 * 255)
    save("mask_top_third_95", third95)


def main() -> None:
    out_dir = Path(sys.argv[1]) if len(sys.argv) > 1 else Path(__file__).parent.parent / "seed_images"
    out_dir.mkdir(parents=True, exist_ok=True)

    params = SpectrogramParams()
    converter = SpectrogramImageConverter(params=params, device="cpu")

    for name, (seed, bpm, pattern, tones) in SEEDS.items():
        wave = _groove(seed, bpm, pattern, tones)
        segment = AudioSegment.from_float(wave[None, :] * 32767, SR)
        image = converter.spectrogram_image_from_audio(segment)
        assert image.size == (512, 512), image.size
        image.save(out_dir / f"{name}.png", exif=image.getexif(), format="PNG")
        print(f"wrote {out_dir / name}.png")

    make_masks(out_dir)


if __name__ == "__main__":
    main()
