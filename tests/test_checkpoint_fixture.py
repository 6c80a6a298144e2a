"""
End-to-end checkpoint load-path coverage: a tiny diffusers-layout checkpoint
is synthesized ON DISK (torch weight files + config.json + scheduler config +
tokenizer vocab/merges), then driven through the flagship flow the reference
documents (README.md:24 "point it at riffusion-model-v1"):

    load_diffusers_checkpoint -> RiffusionPipeline -> riffuse
    -> save_native -> load_native (tree equality)
    -> scripts/convert_checkpoint.py main()

This exercises models/weights.py:280-466 (file probing, torch .bin loading,
config parsing, scheduler-name mapping, tokenizer discovery) with real files,
which the in-memory conversion tests cannot.
"""

import json
import os
import subprocess
import sys
import zlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from riffusion_tpu.models.clip import CLIPTextConfig, CLIPTextModel
from riffusion_tpu.models.tokenizer import BOS, EOS, _bytes_to_unicode
from riffusion_tpu.models.unet import UNet2DCondition, UNetConfig
from riffusion_tpu.models.vae import AutoencoderKL, VAEConfig
from riffusion_tpu.models.weights import (
    convert_torch_state_dict,
    load_bundle,
    load_diffusers_checkpoint,
    load_native,
    save_native,
)

import test_weight_conversion as twc

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


# ------------------------------------------------------------ fixture builder


def _synth_torch_state_dict(kind, torch_keys, flat_flax):
    """Synthesize a torch state dict whose converted tree lands exactly on the
    flax param tree (shapes via the inverse layout transform)."""
    sd = {}
    for tk, tag in torch_keys.items():
        if tag == "skip":
            sd[tk] = np.zeros((1, 77), np.float32)
            continue
        probe = {tk: np.zeros((2, 2, 3, 3)) if tag == "conv"
                 else np.zeros((2, 2)) if tag in ("linear", "embed")
                 else np.zeros((2,))}
        (path,) = twc._flatten(convert_torch_state_dict(probe, kind)).keys()
        shape = twc._torch_shape(path, flat_flax[path])
        rng = np.random.default_rng(zlib.crc32(tk.encode()))
        sd[tk] = (rng.standard_normal(shape) * 0.05).astype(np.float32)
    return sd


def _write_tiny_vocab(tok_dir):
    os.makedirs(tok_dir, exist_ok=True)
    chars = list(_bytes_to_unicode().values())
    merges = [("h", "e"), ("l", "l"), ("he", "llo</w>")]
    tokens = chars + [c + "</w>" for c in chars] + ["".join(m) for m in merges]
    tokens += [BOS, EOS]
    tokens += [f"<unused{i}>" for i in range(1024 - len(tokens))]
    vocab = {t: i for i, t in enumerate(tokens[:1024])}
    with open(os.path.join(tok_dir, "vocab.json"), "w", encoding="utf-8") as fh:
        json.dump(vocab, fh)
    with open(os.path.join(tok_dir, "merges.txt"), "w", encoding="utf-8") as fh:
        fh.write("#version: 0.2\n" + "\n".join(" ".join(m) for m in merges) + "\n")


@pytest.fixture(scope="module")
def tiny_diffusers_checkpoint(tmp_path_factory):
    """A complete tiny diffusers-layout checkpoint directory on disk."""
    root = tmp_path_factory.mktemp("diffusers_ckpt")
    key = jax.random.PRNGKey(0)

    # --- unet ---
    unet_cfg = UNetConfig.tiny()
    unet = UNet2DCondition(unet_cfg, dtype=jnp.float32)
    # only the param tree STRUCTURE feeds the synthesized state dict, so
    # eval_shape (no XLA compile, ~3 s) replaces init (~38 s on 1 CPU core)
    flax_params = jax.eval_shape(
        lambda: unet.init(
            key, jnp.zeros((1, 8, 8, 4)), jnp.zeros((1,), jnp.int32),
            jnp.zeros((1, 77, unet_cfg.cross_attention_dim)),
        )["params"]
    )
    sd = _synth_torch_state_dict(
        "unet", twc._torch_unet_keys(unet_cfg), twc._flatten(flax_params)
    )
    os.makedirs(root / "unet")
    torch.save({k: torch.from_numpy(v) for k, v in sd.items()},
               root / "unet" / "diffusion_pytorch_model.bin")
    with open(root / "unet" / "config.json", "w") as fh:
        json.dump({
            "_class_name": "UNet2DConditionModel",
            "sample_size": unet_cfg.sample_size,
            "in_channels": 4, "out_channels": 4,
            "block_out_channels": list(unet_cfg.block_out_channels),
            "layers_per_block": unet_cfg.layers_per_block,
            "cross_attention_dim": unet_cfg.cross_attention_dim,
            "attention_head_dim": unet_cfg.attention_head_dim,
            "down_block_types": ["CrossAttnDownBlock2D"] * 3 + ["DownBlock2D"],
        }, fh)

    # --- vae ---
    vae_cfg = VAEConfig.tiny()
    vae = AutoencoderKL(vae_cfg, dtype=jnp.float32)
    vae_params = jax.eval_shape(
        lambda: vae.init(key, jnp.zeros((1, 64, 64, 3)), key)["params"]
    )
    sd = _synth_torch_state_dict(
        "vae", twc._torch_vae_keys(vae_cfg), twc._flatten(vae_params)
    )
    os.makedirs(root / "vae")
    torch.save({k: torch.from_numpy(v) for k, v in sd.items()},
               root / "vae" / "diffusion_pytorch_model.bin")
    with open(root / "vae" / "config.json", "w") as fh:
        json.dump({
            "_class_name": "AutoencoderKL",
            "in_channels": 3, "out_channels": 3, "latent_channels": 4,
            "block_out_channels": list(vae_cfg.block_out_channels),
            "layers_per_block": vae_cfg.layers_per_block,
            "scaling_factor": 0.18215,
        }, fh)

    # --- text encoder: a REAL transformers CLIPTextModel state dict ---
    t_cfg = transformers.CLIPTextConfig(
        vocab_size=1024, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=128,
        max_position_embeddings=77, hidden_act="quick_gelu",
    )
    torch.manual_seed(0)
    t_clip = transformers.CLIPTextModel(t_cfg).eval()
    os.makedirs(root / "text_encoder")
    torch.save(t_clip.state_dict(), root / "text_encoder" / "pytorch_model.bin")
    with open(root / "text_encoder" / "config.json", "w") as fh:
        json.dump({
            "architectures": ["CLIPTextModel"],
            "vocab_size": 1024, "hidden_size": 64, "num_hidden_layers": 2,
            "num_attention_heads": 4, "intermediate_size": 128,
            "max_position_embeddings": 77, "hidden_act": "quick_gelu",
        }, fh)

    # --- tokenizer / scheduler / index ---
    _write_tiny_vocab(str(root / "tokenizer"))
    os.makedirs(root / "scheduler")
    with open(root / "scheduler" / "scheduler_config.json", "w") as fh:
        json.dump({"_class_name": "EulerDiscreteScheduler",
                   "num_train_timesteps": 1000}, fh)
    with open(root / "model_index.json", "w") as fh:
        json.dump({"_class_name": "StableDiffusionPipeline"}, fh)

    return root, t_clip


# -------------------------------------------------------------------- tests


def test_load_diffusers_checkpoint(tiny_diffusers_checkpoint):
    root, t_clip = tiny_diffusers_checkpoint
    bundle = load_diffusers_checkpoint(str(root), dtype=jnp.float32)

    assert bundle.scheduler_name == "euler"  # mapped from the scheduler config
    assert bundle.unet_config.block_out_channels == (32, 64, 64, 64)
    assert bundle.clip_config.hidden_size == 64

    # the converted CLIP must match the torch model numerically (the weights
    # came from a real transformers module, so this is a true value oracle
    # through the FILE path, not just the in-memory converter)
    ids = np.array([[2, 7, 100, 1] + [1] * 73], dtype=np.int64)
    with torch.no_grad():
        want = t_clip(torch.from_numpy(ids)).last_hidden_state.numpy()
    model = CLIPTextModel(bundle.clip_config, dtype=jnp.float32)
    got = np.asarray(model.apply({"params": bundle.clip_params},
                                 jnp.asarray(ids, jnp.int32)))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)

    # real BPE tokenizer was discovered from tokenizer/
    ids = bundle.tokenizer("hello")["input_ids"][0]
    assert len(ids) == 77
    assert ids[0] == bundle.tokenizer.bos_token_id


def test_riffuse_from_disk_checkpoint(tiny_diffusers_checkpoint):
    """The flagship flow: disk checkpoint -> pipeline -> one riffuse call."""
    from PIL import Image

    from riffusion_tpu.datatypes import InferenceInput, PromptInput
    from riffusion_tpu.riffusion_pipeline import RiffusionPipeline

    root, _ = tiny_diffusers_checkpoint
    pipe = RiffusionPipeline.load_checkpoint(str(root), device="cpu")
    seed = Image.fromarray(
        np.random.default_rng(0).integers(0, 255, (64, 64, 3), np.uint8), "RGB"
    )
    inputs = InferenceInput(
        start=PromptInput(prompt="hello", seed=1),
        end=PromptInput(prompt="piano", seed=2),
        alpha=0.3, num_inference_steps=3,
    )
    img = pipe.riffuse(inputs, seed)
    arr = np.asarray(img)
    assert arr.shape == (64, 64, 3)
    assert np.isfinite(arr.astype(np.float64)).all()
    assert arr.std() > 0


def test_native_round_trip(tiny_diffusers_checkpoint, tmp_path):
    root, _ = tiny_diffusers_checkpoint
    bundle = load_diffusers_checkpoint(str(root), dtype=jnp.float32)
    save_native(bundle, str(tmp_path / "native"))
    re = load_native(str(tmp_path / "native"), dtype=jnp.float32)

    assert re.scheduler_name == bundle.scheduler_name
    assert re.unet_config == bundle.unet_config
    for a, b in zip(jax.tree.leaves(bundle.unet_params), jax.tree.leaves(re.unet_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # load_bundle resolves a native dir by its marker file
    again = load_bundle(str(tmp_path / "native"), dtype=jnp.float32)
    assert again.clip_config == bundle.clip_config


@pytest.mark.slow  # subprocess re-import + conversion (~45 s); in-process path covered above
def test_convert_checkpoint_script(tiny_diffusers_checkpoint, tmp_path):
    """scripts/convert_checkpoint.py main() end to end, including tokenizer
    file carry-over into the native checkpoint."""
    root, _ = tiny_diffusers_checkpoint
    out = tmp_path / "converted"
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO_ROOT, "scripts", "convert_checkpoint.py"),
         str(root), str(out)],
        capture_output=True, text=True, timeout=600,
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert (out / "riffusion_tpu.json").exists()
    assert (out / "unet.msgpack").exists()
    assert (out / "vocab.json").exists()  # tokenizer carried over

    bundle = load_bundle(str(out), dtype=jnp.float32)
    assert bundle.scheduler_name == "euler"
    assert type(bundle.tokenizer).__name__ == "CLIPTokenizer"


def test_synth_dedupe_flag(monkeypatch):
    """RIFFUSION_TPU_SYNTH_DEDUPE=0 must give same-spec leaves distinct
    values (unique cross-layer geometry for the quality gates); the default
    dedupes them into one buffer (relay-transfer optimization)."""
    import jax
    import numpy as np

    from riffusion_tpu.models.weights import random_bundle

    def same_spec_pairs(params):
        leaves = [x for x in jax.tree.leaves(params) if x.ndim > 1]
        by_shape = {}
        for x in leaves:
            by_shape.setdefault((x.shape, str(x.dtype)), []).append(x)
        return [v for v in by_shape.values() if len(v) >= 2]

    deduped = random_bundle("tiny", seed=0).unet_params
    pairs = same_spec_pairs(deduped)
    assert pairs, "tiny bundle should have repeated-spec leaves"
    assert all(v[0] is v[1] for v in pairs)

    monkeypatch.setenv("RIFFUSION_TPU_SYNTH_DEDUPE", "0")
    unique = random_bundle("tiny", seed=1).unet_params
    found_distinct = False
    for v in same_spec_pairs(unique):
        if not np.array_equal(np.asarray(v[0]), np.asarray(v[1])):
            found_distinct = True
    assert found_distinct
