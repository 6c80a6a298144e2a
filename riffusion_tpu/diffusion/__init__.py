"""Diffusion runtime: schedulers and the jitted pipeline."""
