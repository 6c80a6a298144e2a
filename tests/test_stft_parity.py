"""
Numerical parity of the matmul-DFT STFT/iSTFT against torch.stft/torch.istft
(the exact ops the reference uses through torchaudio). torch runs on CPU here
purely as an oracle; the framework code under test is pure JAX.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from riffusion_tpu.ops.stft import get_stft_kernel
from riffusion_tpu.spectrogram_params import SpectrogramParams

PARAMS = SpectrogramParams()


def torch_stft(wave: np.ndarray, p: SpectrogramParams) -> np.ndarray:
    """(bins, frames) oracle spectrum for a (1, L) or (L,) wave."""
    window = torch.hann_window(p.win_length)
    spec = torch.stft(
        torch.from_numpy(wave.reshape(-1)).to(torch.float64),
        n_fft=p.n_fft,
        hop_length=p.hop_length,
        win_length=p.win_length,
        window=window.to(torch.float64),
        center=True,
        pad_mode="reflect",
        onesided=True,
        return_complex=True,
        normalized=False,
    )
    return spec.numpy()


@pytest.mark.parametrize("backend", ["dft", "fft"])
def test_stft_matches_torch(mono_wave_short, backend):
    p = PARAMS
    kernel = get_stft_kernel(p.n_fft, p.win_length, p.hop_length, backend=backend)
    ref = torch_stft(mono_wave_short, p)  # (bins, frames)

    # consts as jit *arguments* (the production calling convention): closing
    # over the ~100 MB DFT matrices embeds them as HLO literals, which makes
    # even cache-hit compiles take a minute on CPU
    real, imag = jax.jit(kernel.stft)(
        jnp.asarray(mono_wave_short), kernel.jax_consts()
    )
    got = np.asarray(real[0]) + 1j * np.asarray(imag[0])

    assert got.shape == ref.shape
    scale = np.max(np.abs(ref))
    np.testing.assert_allclose(got, ref, atol=2e-4 * scale, rtol=0)


@pytest.mark.parametrize("backend", ["dft", "fft"])
def test_active_band_restriction_is_exact(mono_wave_short, backend):
    """Band-restricted kernel must equal the full kernel on the kept bins."""
    p = PARAMS
    full = get_stft_kernel(p.n_fft, p.win_length, p.hop_length, backend=backend)
    n_bins = 4096
    band = get_stft_kernel(p.n_fft, p.win_length, p.hop_length, n_bins=n_bins, backend=backend)

    mag_full = np.asarray(
        jax.jit(full.magnitude)(jnp.asarray(mono_wave_short), full.jax_consts())
    )
    mag_band = np.asarray(
        jax.jit(band.magnitude)(jnp.asarray(mono_wave_short), band.jax_consts())
    )
    np.testing.assert_allclose(mag_band, mag_full[:, :n_bins, :], atol=1e-3, rtol=1e-4)


@pytest.mark.parametrize("backend", ["dft", "fft"])
def test_istft_matches_torch(mono_wave_short, backend):
    p = PARAMS
    kernel = get_stft_kernel(p.n_fft, p.win_length, p.hop_length, backend=backend)
    spec = torch_stft(mono_wave_short, p)

    window = torch.hann_window(p.win_length).to(torch.float64)
    ref = torch.istft(
        torch.from_numpy(spec),
        n_fft=p.n_fft,
        hop_length=p.hop_length,
        win_length=p.win_length,
        window=window,
        center=True,
    ).numpy()

    got = np.asarray(
        jax.jit(kernel.istft)(
            jnp.asarray(np.real(spec)[None].astype(np.float32)),
            jnp.asarray(np.imag(spec)[None].astype(np.float32)),
            kernel.jax_consts(),
        )
    )[0]

    assert got.shape == ref.shape
    peak = np.max(np.abs(ref))
    np.testing.assert_allclose(got, ref, atol=2e-4 * peak, rtol=0)


def test_frame_count_contract(mono_wave):
    p = PARAMS
    kernel = get_stft_kernel(p.n_fft, p.win_length, p.hop_length)
    # 5678 ms at 10 ms per hop -> 568 columns (reference audio_to_image_test.py:72-75)
    assert kernel.num_frames(mono_wave.shape[-1]) == 568


def test_general_layout_fallback():
    """Odd geometry (hop does not divide win) goes through gather/scatter."""
    kernel = get_stft_kernel(512, 300, 77, backend="fft")
    assert not kernel._fast_layout
    rng = np.random.default_rng(0)
    wave = rng.standard_normal((1, 4000)).astype(np.float32)

    ref = torch.stft(
        torch.from_numpy(wave[0]).to(torch.float64),
        n_fft=512,
        hop_length=77,
        win_length=300,
        window=torch.hann_window(300).to(torch.float64),
        center=True,
        pad_mode="reflect",
        onesided=True,
        return_complex=True,
    ).numpy()
    real, imag = kernel.stft(jnp.asarray(wave))
    got = np.asarray(real[0]) + 1j * np.asarray(imag[0])
    np.testing.assert_allclose(got, ref, atol=1e-3, rtol=0)

    wav_rt = torch.istft(
        torch.from_numpy(ref),
        n_fft=512,
        hop_length=77,
        win_length=300,
        window=torch.hann_window(300).to(torch.float64),
        center=True,
    ).numpy()
    got_wav = np.asarray(
        kernel.istft(
            jnp.asarray(np.real(ref)[None].astype(np.float32)),
            jnp.asarray(np.imag(ref)[None].astype(np.float32)),
        )
    )[0]
    np.testing.assert_allclose(got_wav, wav_rt, atol=2e-3, rtol=0)


@pytest.mark.parametrize("bins,frames,rolled", [(512, 128, True), (500, 128, False)])
def test_griffin_lim_rolled_matches_unrolled(bins, frames, rolled):
    """griffin_lim takes a lax.fori_loop when both trailing spectrum dims are
    128-aligned (the XLA:TPU carry miscompile only bites unaligned shapes;
    see ops/griffin_lim.py) and must produce the same waveform either way.
    On CPU both loop forms are sound, so we pin equality by comparing the
    gated implementation against an explicit static unroll."""
    from riffusion_tpu.ops.griffin_lim import griffin_lim

    p = SpectrogramParams()
    kernel = get_stft_kernel(
        p.n_fft, p.win_length, p.hop_length, n_bins=bins, backend="dft"
    )
    consts = kernel.jax_consts()
    rng = np.random.default_rng(3)
    mag = jnp.asarray(
        np.abs(rng.standard_normal((1, bins, frames))).astype(np.float32)
    )
    key = jax.random.PRNGKey(11)
    n_iters = 4

    got = np.asarray(
        jax.jit(lambda m, c, k: griffin_lim(m, kernel, k, n_iters=n_iters, consts=c))(
            mag, consts, key
        )
    )

    # explicit unrolled reference (same init/momentum math)
    def reference(mag, consts, key):
        kr, ki = jax.random.split(key)
        ar = jax.random.uniform(kr, mag.shape, dtype=jnp.float32)
        ai = jax.random.uniform(ki, mag.shape, dtype=jnp.float32)
        norm = jnp.sqrt(ar * ar + ai * ai) + 1e-16
        ar, ai = ar / norm, ai / norm
        mom = 0.99 / 1.99
        tr = jnp.zeros_like(mag); ti = jnp.zeros_like(mag)
        for _ in range(n_iters):
            wav = kernel.istft(mag * ar, mag * ai, consts)
            rr, ri = kernel.stft(wav, consts)
            ur = rr - mom * tr; ui = ri - mom * ti
            un = jnp.sqrt(ur * ur + ui * ui) + 1e-16
            ar, ai, tr, ti = ur / un, ui / un, rr, ri
        return kernel.istft(mag * ar, mag * ai, consts)

    want = np.asarray(jax.jit(reference)(mag, consts, key))
    np.testing.assert_allclose(got, want, atol=1e-4 * np.abs(want).max())
