"""
Checkpoint loading for the Flax diffusion stack.

Three sources:
  1. A local diffusers-layout checkpoint with torch weights (what the hub
     serves for riffusion/riffusion-model-v1; the reference loads it at
     riffusion_pipeline.py:92-102) — converted tensor-by-tensor to Flax
     (OIHW->HWIO convs, transposed linears, norm weight->scale).
  2. A native checkpoint previously saved by `save_native` (msgpack params +
     json configs) — the fast path; conversion happens once.
  3. "random:tiny" / "random:full" — deterministic random init with the
     correct architecture, so benchmarks and tests run with real FLOPs and
     no network access.
"""

from __future__ import annotations

import dataclasses
import json
import os
import typing as T

import jax
import jax.numpy as jnp
import numpy as np

from riffusion_tpu.models.clip import CLIPTextConfig, CLIPTextModel
from riffusion_tpu.models.tokenizer import CLIPTokenizer, HashTokenizer
from riffusion_tpu.models.unet import UNet2DCondition, UNetConfig
from riffusion_tpu.models.vae import AutoencoderKL, VAEConfig

Params = T.Dict[str, T.Any]


@dataclasses.dataclass
class ModelBundle:
    """Everything the pipeline needs: configs, params, tokenizer, scheduler id."""

    unet_config: UNetConfig
    vae_config: VAEConfig
    clip_config: CLIPTextConfig
    unet_params: Params
    vae_params: Params
    clip_params: Params
    tokenizer: T.Any
    scheduler_name: str = "pndm"
    dtype: T.Any = jnp.bfloat16
    #: Content identity of the loaded weights (spec+seed for random bundles,
    #: dir stat digest for checkpoint dirs). Keys the cross-process text
    #: embedding cache (embed_cache.py); "" disables that cache for bundles
    #: constructed directly without one.
    checkpoint_id: str = ""

    def modules(self, dtype=None, flash: bool = True):
        dtype = dtype or self.dtype
        return (
            UNet2DCondition(self.unet_config, dtype=dtype, flash=flash),
            AutoencoderKL(self.vae_config, dtype=dtype),
            CLIPTextModel(self.clip_config, dtype=dtype),
        )


# --------------------------------------------------------------- random init


def _shape_cache_path(tag: str, cfgs: T.Tuple) -> str:
    import hashlib

    from riffusion_tpu import aot

    raw = "|".join([tag, repr(cfgs), aot._package_code_hash()])
    name = hashlib.sha256(raw.encode()).hexdigest()[:16]
    base = os.environ.get(
        "RIFFUSION_TPU_SHAPE_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "riffusion_tpu", "shapes"),
    )
    return os.path.join(base, f"{tag}-{name}.pkl")


def _load_shape_cache(tag: str, cfgs: T.Tuple):
    import pickle

    path = _shape_cache_path(tag, cfgs)
    if not os.path.exists(path):
        return None
    def to_dtype(name: str):
        try:
            return np.dtype(name)
        except TypeError:  # bfloat16 & friends live in ml_dtypes
            import ml_dtypes

            return np.dtype(getattr(ml_dtypes, name))

    try:
        with open(path, "rb") as f:
            plain = pickle.load(f)
        return jax.tree.map(
            lambda sd: jax.ShapeDtypeStruct(sd[0], to_dtype(sd[1])),
            plain,
            is_leaf=lambda x: isinstance(x, tuple),
        )
    except Exception:
        return None


def _save_shape_cache(tag: str, cfgs: T.Tuple, shapes) -> None:
    import pickle

    path = _shape_cache_path(tag, cfgs)
    try:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        plain = jax.tree.map(lambda s: (tuple(s.shape), str(s.dtype)), shapes)
        tmp = f"{path}.tmp.{os.getpid()}"
        with open(tmp, "wb") as f:
            pickle.dump(plain, f)
        os.replace(tmp, path)
    except Exception:
        pass  # cache is an optimization only


def random_bundle(size: str = "tiny", seed: int = 0, dtype=jnp.bfloat16) -> ModelBundle:
    """Deterministic random-weight bundle ("tiny" or "full" SD v1 geometry)."""
    from riffusion_tpu.util import jax_util

    jax_util.enable_persistent_compilation_cache()
    if size == "tiny":
        unet_cfg, vae_cfg, clip_cfg = UNetConfig.tiny(), VAEConfig.tiny(), CLIPTextConfig.tiny()
    elif size == "full":
        unet_cfg, vae_cfg, clip_cfg = UNetConfig(), VAEConfig(), CLIPTextConfig()
    else:
        raise ValueError(f"Unknown random bundle size: {size!r} (use tiny/full)")

    unet, vae, clip = (
        UNet2DCondition(unet_cfg, dtype=dtype),
        AutoencoderKL(vae_cfg, dtype=dtype),
        CLIPTextModel(clip_cfg, dtype=dtype),
    )
    k = jax.random.PRNGKey(seed)
    k_unet, k_vae, k_clip, k_samp = jax.random.split(k, 4)

    # Param *structures* via eval_shape (no device compile), then fast host
    # numpy init — initializing ~1B params with jitted per-layer RNG would
    # otherwise dominate load time (and remote-compile poorly). The
    # eval_shape traces themselves cost ~30 s of single-core host time for
    # the full model, so the resulting shape trees are disk-cached keyed by
    # (configs, package code hash) — a serving restart reads them in ms.
    def shapes_cached(tag, build):
        cached = _load_shape_cache(tag, (unet_cfg, vae_cfg, clip_cfg))
        if cached is not None:
            return cached
        shapes = build()
        _save_shape_cache(tag, (unet_cfg, vae_cfg, clip_cfg), shapes)
        return shapes

    s = unet_cfg.sample_size
    latents = jnp.zeros((1, s, s, unet_cfg.in_channels), jnp.float32)
    context = jnp.zeros((1, clip_cfg.max_positions, unet_cfg.cross_attention_dim), jnp.float32)
    unet_shapes = shapes_cached("unet", lambda: jax.eval_shape(
        lambda: unet.init(k_unet, latents, jnp.zeros((1,), jnp.int32), context)["params"]
    ))
    img = jnp.zeros((1, s * 8, s * 8, vae_cfg.in_channels), jnp.float32)
    vae_shapes = shapes_cached("vae", lambda: jax.eval_shape(
        lambda: vae.init(k_vae, img, k_samp)["params"]
    ))
    ids = jnp.zeros((1, clip_cfg.max_positions), jnp.int32)
    clip_shapes = shapes_cached("clip", lambda: jax.eval_shape(
        lambda: clip.init(k_clip, ids)["params"]
    ))

    # Weights are synthesized ON DEVICE in a single jitted program: one RNG
    # pool is tiled per-leaf with a rotating offset. This avoids both
    # per-element host RNG (minutes for ~1B params on small hosts) and the
    # host->device bulk transfer (minutes over a remote-TPU relay).
    # Statistical purity is irrelevant here — these weights only exist to
    # exercise real FLOPs deterministically.
    pool_size = 1 << 20

    def materialize(shapes, out_dtype=None):
        """Synthesize a param tree. Two relay-bandwidth optimizations (on a
        tunneled TPU, program OUTPUT bytes ship at ~20-35 MB/s, measured —
        the 4.26 GB full bundle cost ~2 min of every warm start):

        1. Leaves are DEDUPLICATED by (kind, shape, dtype, std): every leaf
           with the same spec shares ONE device buffer (unique shapes are
           ~19% of the full bundle's bytes). Repeated values across layers
           are fine for FLOP-exercising weights; norm layers re-center
           activations between blocks.
        2. `out_dtype` synthesizes floating leaves directly in the serving
           dtype (bf16 for UNet/CLIP), halving output bytes and removing the
           pipeline's whole-tree cast program (another full-size output).
        """

        # RIFFUSION_TPU_SYNTH_DEDUPE=0 gives every leaf its own pool offset:
        # quality/diagnostic harnesses (sampler_agreement.py's ODE gate,
        # wiring oracles) need unique cross-layer geometry — dedup makes
        # every same-spec layer identical, which distorts the drift field
        # the gate integrates and masks Q-vs-K asymmetries. Serving/bench
        # boots keep the dedupe (it is purely a relay-transfer optimization).
        dedupe = os.environ.get("RIFFUSION_TPU_SYNTH_DEDUPE", "1") != "0"

        def leaf_key(path, s_):
            name = path[-1].key if path else ""
            dt = s_.dtype
            if out_dtype is not None and jnp.issubdtype(dt, jnp.floating):
                dt = jnp.dtype(out_dtype)
            if name == "bias":
                return ("zeros", tuple(s_.shape), jnp.dtype(dt).name, 0.0)
            if name == "scale":
                return ("ones", tuple(s_.shape), jnp.dtype(dt).name, 0.0)
            fan_in = int(np.prod(s_.shape[:-1])) if len(s_.shape) > 1 else s_.shape[0]
            std = float(1.0 / np.sqrt(max(fan_in, 1)))
            ident = "" if dedupe else jax.tree_util.keystr(path)
            return ("pool", tuple(s_.shape), jnp.dtype(dt).name, std, ident)

        keys_tree = jax.tree_util.tree_map_with_path(
            leaf_key, shapes, is_leaf=lambda x: hasattr(x, "shape")
        )
        uniq: dict = {}
        for k_ in jax.tree.leaves(keys_tree, is_leaf=lambda x: isinstance(x, tuple)):
            if k_ not in uniq:
                # rotating start offset decorrelates distinct shapes
                uniq[k_] = (len(uniq) * 99991) % pool_size

        def build(key):
            pool = jax.random.normal(key, (pool_size,), jnp.float32)
            # Static-index slices of a tiled pool: each leaf lowers to one
            # slice + reshape (vs the previous roll+resize, whose ~700
            # million-element gathers made the HLO so large that even a
            # *cached* compile cost ~20 s per tree; XLA CSEs the shared
            # tile/concat across leaves).
            tiled = {1: pool}
            out = {}
            for spec, start in uniq.items():
                kind, shape, dtname, std = spec[:4]
                dt = jnp.dtype(dtname)
                if kind == "zeros":
                    out[spec] = jnp.zeros(shape, dt)
                    continue
                if kind == "ones":
                    out[spec] = jnp.ones(shape, dt)
                    continue
                n = int(np.prod(shape)) if shape else 1
                reps = -(-(start + n) // pool_size)  # ceil
                if reps not in tiled:
                    tiled[reps] = jnp.tile(pool, reps)
                seg = jax.lax.slice_in_dim(tiled[reps], start, start + n)
                out[spec] = (seg.reshape(shape) * std).astype(dt)
            return out

        built = jax.jit(build)(jax.random.PRNGKey(seed))
        # Assemble the full tree OUTSIDE the jit so duplicate leaves are the
        # same jax.Array object (one device buffer, shipped once).
        return jax.tree.map(
            lambda k_: built[k_], keys_tree, is_leaf=lambda x: isinstance(x, tuple)
        )

    # UNet/CLIP in the bundle dtype (the pipeline's compute/storage dtype);
    # the VAE always serves fp32 (riffusion_pipeline.py:119-124).
    unet_params = materialize(unet_shapes, out_dtype=dtype)
    vae_params = materialize(vae_shapes, out_dtype=jnp.float32)
    clip_params = materialize(clip_shapes, out_dtype=dtype)

    return ModelBundle(
        unet_config=unet_cfg,
        vae_config=vae_cfg,
        clip_config=clip_cfg,
        unet_params=unet_params,
        vae_params=vae_params,
        clip_params=clip_params,
        tokenizer=HashTokenizer(vocab_size=clip_cfg.vocab_size),
        scheduler_name="pndm",
        dtype=dtype,
        checkpoint_id=f"random:{size}:s{seed}:{jnp.dtype(dtype).name}",
    )


# ------------------------------------------------------- torch -> flax rename


def _rename_unet_key(key: str) -> T.Optional[str]:
    """diffusers torch UNet key -> flax path string ('a/b/c'), None to skip."""
    if key.endswith(("attn1.to_out.1.weight", "attn2.to_out.1.bias")):
        return None
    k = key
    k = k.replace("transformer_blocks.", "blocks_")
    k = k.replace(".to_out.0.", ".to_out.")
    k = k.replace("ff.net.0.proj", "ff.proj_in")
    k = k.replace("ff.net.2", "ff.proj_out")
    k = k.replace("time_embedding.linear_1", "time_embedding.linear_1")
    # index flattening: down_blocks.0 -> down_blocks_0, resnets.1 -> resnets_1 ...
    import re

    k = re.sub(r"\.(\d+)", r"_\1", k)
    return k.replace(".", "/")


def _rename_vae_key(key: str) -> T.Optional[str]:
    k = key
    # old (diffusers<=0.9) attention names -> new unified names
    k = k.replace("mid_block.attentions.0.query", "mid_block.attentions.0.to_q")
    k = k.replace("mid_block.attentions.0.key", "mid_block.attentions.0.to_k")
    k = k.replace("mid_block.attentions.0.value", "mid_block.attentions.0.to_v")
    k = k.replace("mid_block.attentions.0.proj_attn", "mid_block.attentions.0.to_out")
    k = k.replace("mid_block.attentions.0.norm", "mid_block.attentions.0.group_norm")
    k = k.replace(".to_out.0.", ".to_out.")
    k = k.replace("mid_block.attentions.0", "mid_block.attentions_0__ATT")
    import re

    k = re.sub(r"\.(\d+)", r"_\1", k)
    k = k.replace("attentions_0__ATT", "attentions_0")
    # encoder/decoder sub-block flattening to the flax flat names
    k = re.sub(r"(encoder|decoder)/?", r"\1.", k.replace("/", "."))
    k = k.replace("..", ".")
    parts = k.split(".")
    if parts[0] in ("encoder", "decoder"):
        # down_blocks_0.resnets_0 -> down_blocks_0_resnets_0 etc
        flat: T.List[str] = [parts[0]]
        rest = parts[1:]
        merged: T.List[str] = []
        for p in rest[:-1]:
            if merged and (
                p.startswith(("resnets_", "downsamplers_", "upsamplers_"))
                and merged[-1].startswith(("down_blocks_", "up_blocks_"))
            ):
                merged[-1] = merged[-1] + "_" + p
            else:
                merged.append(p)
        if merged and merged[-1] == "downsamplers_0_conv":  # guard (shouldn't happen)
            pass
        flat.extend(merged + [rest[-1]])
        k = "/".join(flat)
    elif parts[0] == "quant_conv":
        k = "/".join(["encoder"] + parts)
    elif parts[0] == "post_quant_conv":
        k = "/".join(["decoder"] + parts)
    else:
        k = "/".join(parts)
    # mid block children
    k = k.replace("mid_block_resnets", "mid_block/resnets")
    k = k.replace("mid_block_attentions", "mid_block/attentions")
    return k


def _rename_clip_key(key: str) -> T.Optional[str]:
    if not key.startswith("text_model."):
        return None
    k = key[len("text_model.") :]
    if k.startswith("embeddings.position_ids"):
        return None
    k = k.replace("embeddings.token_embedding", "token_embedding")
    k = k.replace("embeddings.position_embedding", "position_embedding")
    k = k.replace("encoder.layers.", "layers_")
    k = k.replace(".mlp.", ".")
    import re

    k = re.sub(r"layers_(\d+)\.", r"layers_\1/", k)
    return k.replace(".", "/")


def _transform_value(flax_path: str, value: np.ndarray) -> T.Tuple[str, np.ndarray]:
    """Map torch tensor layout + param leaf name to flax conventions."""
    leaf = flax_path.rsplit("/", 1)[-1]
    if leaf == "weight":
        if value.ndim == 4:  # conv OIHW -> HWIO
            return flax_path[: -len("weight")] + "kernel", value.transpose(2, 3, 1, 0)
        if value.ndim == 2:
            module = flax_path.split("/")[-2] if "/" in flax_path else ""
            if module in ("token_embedding", "position_embedding"):
                return flax_path[: -len("weight")] + "embedding", value
            return flax_path[: -len("weight")] + "kernel", value.T
        # 1D: norm scale
        return flax_path[: -len("weight")] + "scale", value
    return flax_path, value


def _insert(tree: Params, path: str, value: np.ndarray) -> None:
    parts = path.split("/")
    node = tree
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = jnp.asarray(value)


def convert_torch_state_dict(
    state_dict: T.Mapping[str, np.ndarray], kind: str
) -> Params:
    """Convert a diffusers/transformers torch state dict to a flax param tree.

    kind: "unet" | "vae" | "clip".
    """
    rename = {"unet": _rename_unet_key, "vae": _rename_vae_key, "clip": _rename_clip_key}[kind]
    tree: Params = {}
    for key, value in state_dict.items():
        flax_path = rename(key)
        if flax_path is None:
            continue
        flax_path, out = _transform_value(flax_path, np.asarray(value))
        _insert(tree, flax_path, out)
    return tree


# ------------------------------------------------------------- file handling


def _load_torch_weights(folder: str) -> T.Dict[str, np.ndarray]:
    """Load torch weights from a model subfolder (safetensors preferred)."""
    candidates = [
        "diffusion_pytorch_model.safetensors",
        "model.safetensors",
        "diffusion_pytorch_model.bin",
        "pytorch_model.bin",
    ]
    for name in candidates:
        path = os.path.join(folder, name)
        if os.path.exists(path):
            if name.endswith(".safetensors"):
                from safetensors.numpy import load_file

                return dict(load_file(path))
            import torch

            sd = torch.load(path, map_location="cpu", weights_only=True)
            return {k: v.float().numpy() for k, v in sd.items()}
    raise FileNotFoundError(f"No torch weights found in {folder}")


def _unet_config_from_json(cfg: dict) -> UNetConfig:
    down_types = cfg.get("down_block_types", ["CrossAttnDownBlock2D"] * 3 + ["DownBlock2D"])
    return UNetConfig(
        sample_size=cfg.get("sample_size", 64),
        in_channels=cfg.get("in_channels", 4),
        out_channels=cfg.get("out_channels", 4),
        block_out_channels=tuple(cfg.get("block_out_channels", (320, 640, 1280, 1280))),
        layers_per_block=cfg.get("layers_per_block", 2),
        cross_attention_dim=cfg.get("cross_attention_dim", 768),
        attention_head_dim=cfg.get("attention_head_dim", 8),
        cross_attn_blocks=tuple(t.startswith("CrossAttn") for t in down_types),
        norm_num_groups=cfg.get("norm_num_groups", 32),
        freq_shift=cfg.get("freq_shift", 0),
        flip_sin_to_cos=cfg.get("flip_sin_to_cos", True),
    )


def _vae_config_from_json(cfg: dict) -> VAEConfig:
    return VAEConfig(
        in_channels=cfg.get("in_channels", 3),
        out_channels=cfg.get("out_channels", 3),
        latent_channels=cfg.get("latent_channels", 4),
        block_out_channels=tuple(cfg.get("block_out_channels", (128, 256, 512, 512))),
        layers_per_block=cfg.get("layers_per_block", 2),
        norm_num_groups=cfg.get("norm_num_groups", 32),
        scaling_factor=cfg.get("scaling_factor", 0.18215),
    )


def _clip_config_from_json(cfg: dict) -> CLIPTextConfig:
    return CLIPTextConfig(
        vocab_size=cfg.get("vocab_size", 49408),
        hidden_size=cfg.get("hidden_size", 768),
        num_layers=cfg.get("num_hidden_layers", 12),
        num_heads=cfg.get("num_attention_heads", 12),
        max_positions=cfg.get("max_position_embeddings", 77),
        intermediate_size=cfg.get("intermediate_size", 3072),
    )


def _read_json(path: str) -> dict:
    with open(path, encoding="utf-8") as fh:
        return json.load(fh)


def _dir_identity(root: str, dtype) -> str:
    """Cheap content identity for a checkpoint directory: path plus every
    file's (relpath, size, mtime_ns). A weight-file rewrite changes it; a
    re-serve of the same files keeps it stable across restarts."""
    import hashlib

    h = hashlib.sha256(os.path.abspath(root).encode())
    for dirpath, dirnames, filenames in sorted(os.walk(root)):
        dirnames.sort()
        for name in sorted(filenames):
            p = os.path.join(dirpath, name)
            try:
                st = os.stat(p)
            except OSError:
                continue
            h.update(f"{os.path.relpath(p, root)}|{st.st_size}|{st.st_mtime_ns}".encode())
    return f"dir:{h.hexdigest()[:24]}:{jnp.dtype(dtype).name}"


def load_diffusers_checkpoint(root: str, dtype=jnp.bfloat16) -> ModelBundle:
    """Convert a local diffusers-layout torch checkpoint directory."""
    unet_cfg = _unet_config_from_json(_read_json(os.path.join(root, "unet", "config.json")))
    vae_cfg = _vae_config_from_json(_read_json(os.path.join(root, "vae", "config.json")))
    clip_cfg = _clip_config_from_json(
        _read_json(os.path.join(root, "text_encoder", "config.json"))
    )

    unet_params = convert_torch_state_dict(_load_torch_weights(os.path.join(root, "unet")), "unet")
    vae_params = convert_torch_state_dict(_load_torch_weights(os.path.join(root, "vae")), "vae")
    clip_params = convert_torch_state_dict(
        _load_torch_weights(os.path.join(root, "text_encoder")), "clip"
    )

    try:
        tokenizer: T.Any = CLIPTokenizer.from_pretrained(root)
    except FileNotFoundError:
        tokenizer = HashTokenizer(vocab_size=clip_cfg.vocab_size)

    scheduler_name = "pndm"
    sched_cfg_path = os.path.join(root, "scheduler", "scheduler_config.json")
    if os.path.exists(sched_cfg_path):
        cls_name = _read_json(sched_cfg_path).get("_class_name", "PNDMScheduler")
        scheduler_name = {
            "PNDMScheduler": "pndm",
            "DDIMScheduler": "ddim",
            "LMSDiscreteScheduler": "lms",
            "EulerDiscreteScheduler": "euler",
            "EulerAncestralDiscreteScheduler": "euler_a",
            "DPMSolverMultistepScheduler": "dpmpp",
        }.get(cls_name, "pndm")

    return ModelBundle(
        unet_config=unet_cfg,
        vae_config=vae_cfg,
        clip_config=clip_cfg,
        unet_params=unet_params,
        vae_params=vae_params,
        clip_params=clip_params,
        tokenizer=tokenizer,
        scheduler_name=scheduler_name,
        dtype=dtype,
        checkpoint_id=_dir_identity(root, dtype),
    )


# ----------------------------------------------------------- native save/load


def save_native(bundle: ModelBundle, out_dir: str) -> None:
    """Save the converted bundle in the framework's native layout
    (msgpack params + json configs) for fast reloads."""
    from flax import serialization

    os.makedirs(out_dir, exist_ok=True)
    meta = {
        "unet": dataclasses.asdict(bundle.unet_config),
        "vae": dataclasses.asdict(bundle.vae_config),
        "clip": dataclasses.asdict(bundle.clip_config),
        "scheduler": bundle.scheduler_name,
    }
    with open(os.path.join(out_dir, "riffusion_tpu.json"), "w", encoding="utf-8") as fh:
        json.dump(meta, fh, indent=2)
    for name, params in (
        ("unet", bundle.unet_params),
        ("vae", bundle.vae_params),
        ("clip", bundle.clip_params),
    ):
        # Fetch the whole tree to host numpy BEFORE encoding. Encoding
        # device arrays lets the msgpack encoder trigger one blocking
        # device->host transfer per leaf; over a remote-relay TPU that is
        # ~0.5 s round trip x 686 UNet leaves (measured 369 s for the full
        # bundle). Issuing every copy async first overlaps the round trips.
        for leaf in jax.tree.leaves(params):
            if hasattr(leaf, "copy_to_host_async"):
                leaf.copy_to_host_async()
        params_np = jax.device_get(params)
        with open(os.path.join(out_dir, f"{name}.msgpack"), "wb") as fh:
            fh.write(serialization.to_bytes(params_np))


def load_native(root: str, dtype=jnp.bfloat16) -> ModelBundle:
    from flax import serialization

    meta = _read_json(os.path.join(root, "riffusion_tpu.json"))
    unet_cfg = UNetConfig(**{**meta["unet"], "block_out_channels": tuple(meta["unet"]["block_out_channels"]), "cross_attn_blocks": tuple(meta["unet"]["cross_attn_blocks"])})
    vae_cfg = VAEConfig(**{**meta["vae"], "block_out_channels": tuple(meta["vae"]["block_out_channels"])})
    clip_cfg = CLIPTextConfig(**meta["clip"])

    params = {}
    for name in ("unet", "vae", "clip"):
        with open(os.path.join(root, f"{name}.msgpack"), "rb") as fh:
            params[name] = serialization.msgpack_restore(fh.read())

    try:
        tokenizer: T.Any = CLIPTokenizer.from_pretrained(root)
    except FileNotFoundError:
        tokenizer = HashTokenizer(vocab_size=clip_cfg.vocab_size)

    return ModelBundle(
        unet_config=unet_cfg,
        vae_config=vae_cfg,
        clip_config=clip_cfg,
        unet_params=params["unet"],
        vae_params=params["vae"],
        clip_params=params["clip"],
        tokenizer=tokenizer,
        scheduler_name=meta.get("scheduler", "pndm"),
        dtype=dtype,
        checkpoint_id=_dir_identity(root, dtype),
    )


def load_bundle(checkpoint: str, dtype=jnp.bfloat16, seed: int = 0) -> ModelBundle:
    """Resolve a checkpoint spec:
    - "random:tiny" / "random:full" -> deterministic random init
    - dir with riffusion_tpu.json   -> native load
    - dir with model_index.json / unet/ -> diffusers torch conversion
    """
    if checkpoint.startswith("random:"):
        return random_bundle(checkpoint.split(":", 1)[1], seed=seed, dtype=dtype)
    if os.path.isdir(checkpoint):
        if os.path.exists(os.path.join(checkpoint, "riffusion_tpu.json")):
            return load_native(checkpoint, dtype=dtype)
        if os.path.exists(os.path.join(checkpoint, "unet")):
            return load_diffusers_checkpoint(checkpoint, dtype=dtype)
    raise FileNotFoundError(
        f"Cannot resolve checkpoint {checkpoint!r}: expected 'random:tiny', "
        "'random:full', a native checkpoint dir, or a diffusers-layout dir "
        "(hub downloads are not performed by this framework)."
    )
