"""Device DSP ops: STFT/iSTFT, mel projections, Griffin-Lim, image codec math.

Everything here is pure-functional jnp code designed to run under `jax.jit`
on TPU. The STFT is formulated as a matmul-DFT restricted to the active
frequency band so the hot loops ride the MXU (see ops/stft.py docstring).
"""

from riffusion_tpu.ops.stft import STFTKernel, get_stft_kernel  # noqa: F401
from riffusion_tpu.ops.mel import (  # noqa: F401
    mel_filterbank,
    active_bin_count,
    inverse_mel_operator,
)
from riffusion_tpu.ops.griffin_lim import griffin_lim  # noqa: F401
