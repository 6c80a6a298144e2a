"""Multi-chip execution: device meshes, sharded frame/clip sweeps, and the
sharded fine-tuning train step.

The reference is strictly single-device (SURVEY §2.2: no distributed backend
of any kind); this package is the TPU-native *capability extension*: the
embarrassingly parallel axes the reference iterates serially (interpolation
alphas, audio-to-audio clips, batch dataset prep) become batch axes sharded
over an ICI mesh with XLA-inserted collectives, and fine-tuning runs
DP x TP x SP via GSPMD shardings.
"""

from riffusion_tpu.parallel.mesh import make_mesh  # noqa: F401
