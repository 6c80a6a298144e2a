"""Flax model stack: CLIP text encoder, UNet2DCondition, VAE, tokenizer,
weight loading/conversion. NHWC layouts, bf16-friendly, built for jit/scan."""
