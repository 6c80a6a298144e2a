"""
riffusion_tpu — a TPU-native (JAX/Flax/XLA/Pallas) real-time music generation framework.

Provides the full capability surface of the riffusion reference library
(see /root/reference, riffusion/riffusion-hobby) rebuilt TPU-first:

* Audio <-> mel-spectrogram <-> image codecs running as XLA programs
  (MXU matmul-DFT STFT, mel filterbank einsum, least-squares inverse mel,
  Griffin-Lim as a `lax.fori_loop`).
* A Flax Stable-Diffusion stack (CLIP text encoder, UNet2DCondition, VAE)
  with JAX-native schedulers, driven by a single jit-compiled denoise scan.
* A fused latents->waveform path that never leaves the device.
* CLI / JSON HTTP server / streamlit frontends mirroring the reference API.
* `jax.sharding.Mesh`-based frame/clip parallelism for alpha sweeps and
  long-audio restyling.
"""

__version__ = "0.1.0"

from riffusion_tpu.spectrogram_params import SpectrogramParams  # noqa: F401

__all__ = ["SpectrogramParams", "__version__"]
