"""
Fine-tuning driver: checkpoint + latent dataset -> trained native checkpoint.

Orchestrates the GSPMD-sharded trainer (parallel/train.py) over a precomputed
latent dataset (training/dataset.py) with the standard latent-diffusion
fine-tune recipe: eps-prediction MSE, AdamW with warmup-cosine schedule,
EMA of the UNet params, periodic orbax checkpoints with resume, and a final
export in the framework's native layout so the result is directly loadable by
`RiffusionPipeline.load_checkpoint(output_dir / "export")`.

The reference has no training path (SURVEY §5: inference-only; its
riffusion-v1 weights were fine-tuned elsewhere). This module is the
capability that produced those weights, rebuilt TPU-natively.
"""

from __future__ import annotations

import dataclasses
import json
import os
import shutil
import time
import typing as T
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import optax

from riffusion_tpu.models.weights import load_bundle, save_native
from riffusion_tpu.parallel.mesh import make_mesh
from riffusion_tpu.parallel.train import DiffusionTrainer, shard_params
from riffusion_tpu.training.dataset import LatentDataset


@dataclasses.dataclass
class FinetuneConfig:
    checkpoint: str  # spec for models/weights.py:load_bundle
    dataset_dir: str  # shard dir from training/dataset.py:build_latent_dataset
    output_dir: str  # checkpoints/, loss_log.json, export/ land here
    steps: int = 1000
    batch_size: int = 4
    learning_rate: float = 1e-5
    warmup_steps: int = 100
    weight_decay: float = 1e-2
    ema_decay: float = 0.999  # 0 disables EMA (export then uses raw params)
    checkpoint_every: int = 500
    log_every: int = 50
    seed: int = 0
    sample_posterior: bool = True
    resume: bool = True
    # mesh: all devices on "data" by default (pure dp is right for SD-scale
    # fine-tuning on <=8 chips); pass e.g. (2, 2, 2) to add tp/sp axes.
    mesh_shape: T.Optional[T.Tuple[int, int, int]] = None


def _lr_schedule(cfg: FinetuneConfig):
    """Linear warmup then cosine decay to 10% of peak — the usual
    diffusion-fine-tune shape; becomes constant when steps <= warmup."""
    decay_steps = max(cfg.steps - cfg.warmup_steps, 1)
    return optax.warmup_cosine_decay_schedule(
        init_value=0.0,
        peak_value=cfg.learning_rate,
        warmup_steps=min(cfg.warmup_steps, cfg.steps),
        decay_steps=decay_steps + min(cfg.warmup_steps, cfg.steps),
        end_value=cfg.learning_rate * 0.1,
    )


def _latest_checkpoint_step(ckpt_root: Path) -> T.Optional[int]:
    steps = []
    if ckpt_root.is_dir():
        for child in ckpt_root.iterdir():
            if child.name.startswith("state_") and child.is_dir():
                try:
                    steps.append(int(child.name.split("_", 1)[1]))
                except ValueError:
                    pass
    return max(steps) if steps else None


def _copy_tokenizer_files(src_checkpoint: str, export_dir: Path) -> None:
    """Carry vocab.json + merges.txt into the export so the fine-tuned
    checkpoint tokenizes identically to its parent (models/tokenizer.py
    looks in the root and tokenizer/)."""
    src = Path(src_checkpoint)
    if not src.is_dir():
        return
    for cand in (src, src / "tokenizer"):
        vocab, merges = cand / "vocab.json", cand / "merges.txt"
        if vocab.exists() and merges.exists():
            tok_dir = export_dir / "tokenizer"
            tok_dir.mkdir(exist_ok=True)
            shutil.copy2(vocab, tok_dir / "vocab.json")
            shutil.copy2(merges, tok_dir / "merges.txt")
            return


def run_finetune(cfg: FinetuneConfig, log: T.Callable[[str], None] = print) -> dict:
    """Run the fine-tune loop; returns summary stats (final/initial loss,
    steps run, export path). Safe to re-invoke with a larger cfg.steps — it
    resumes from the newest checkpoint in output_dir."""
    out_dir = Path(cfg.output_dir).absolute()
    out_dir.mkdir(parents=True, exist_ok=True)
    ckpt_root = out_dir / "checkpoints"

    dataset = LatentDataset(cfg.dataset_dir)

    devices = jax.devices()
    if cfg.mesh_shape is not None:
        shape = tuple(cfg.mesh_shape)
    else:
        # as much data-parallelism as the batch divides into; leftover
        # devices go to the tensor-parallel axis rather than sitting idle
        import math

        data = math.gcd(cfg.batch_size, len(devices))
        shape = (data, len(devices) // data, 1)
    n_mesh = int(np.prod(shape))
    mesh = make_mesh(shape, ("data", "model", "seq"), devices=devices[:n_mesh])
    if cfg.batch_size % mesh.shape["data"] != 0:
        raise ValueError(
            f"batch_size {cfg.batch_size} not divisible by data-parallel "
            f"degree {mesh.shape['data']}"
        )

    # fp32 master weights; forward compute dtype follows the platform
    # (bf16 hits the MXU double-rate path, emulated+slow on CPU).
    compute_dtype = jnp.bfloat16 if devices[0].platform == "tpu" else jnp.float32
    bundle = load_bundle(cfg.checkpoint, dtype=jnp.float32)
    trainer = DiffusionTrainer(
        bundle.unet_config,
        mesh,
        learning_rate=_lr_schedule(cfg),
        weight_decay=cfg.weight_decay,
        dtype=compute_dtype,
    )
    params, opt_state = trainer.init_from(bundle.unet_params)
    ema = jax.tree.map(jnp.copy, params) if cfg.ema_decay > 0 else None

    @jax.jit
    def ema_update(e, p):
        d = cfg.ema_decay
        return jax.tree.map(lambda a, b: a * d + b.astype(a.dtype) * (1.0 - d), e, p)

    # ---- resume ------------------------------------------------------------
    start_step = 0
    if cfg.resume:
        latest = _latest_checkpoint_step(ckpt_root)
        if latest is not None:
            params, opt_state, ema, start_step = _restore(
                ckpt_root, latest, params, opt_state, ema
            )
            log(f"resumed from checkpoint step {start_step}")

    losses: T.List[T.Tuple[int, float]] = []
    loss_log_path = out_dir / "loss_log.json"
    if loss_log_path.exists():
        with open(loss_log_path, encoding="utf-8") as fh:
            losses = [tuple(x) for x in json.load(fh) if x[0] <= start_step]

    batches = dataset.batches(
        cfg.batch_size, seed=cfg.seed, sample_posterior=cfg.sample_posterior
    )
    # replay the stream to where the resumed step left off so data order is
    # identical to an uninterrupted run
    for _ in range(start_step):
        next(batches)

    key = jax.random.PRNGKey(cfg.seed)
    first_loss: T.Optional[float] = None
    loss_val = float("nan")
    t0 = time.monotonic()
    for step in range(start_step, cfg.steps):
        latents, context = next(batches)
        step_key = jax.random.fold_in(key, step)
        params, opt_state, loss = trainer.step(
            params, opt_state, latents, context, step_key
        )
        if ema is not None:
            ema = ema_update(ema, params)
        if step == start_step or (step + 1) % cfg.log_every == 0 or step + 1 == cfg.steps:
            loss_val = float(loss)
            if not np.isfinite(loss_val):
                raise FloatingPointError(f"non-finite loss {loss_val} at step {step}")
            if first_loss is None:
                first_loss = loss_val
            losses.append((step + 1, loss_val))
            rate = (step + 1 - start_step) / max(time.monotonic() - t0, 1e-9)
            log(f"step {step + 1}/{cfg.steps} loss {loss_val:.5f} ({rate:.2f} it/s)")
        if (step + 1) % cfg.checkpoint_every == 0 and step + 1 < cfg.steps:
            _save(ckpt_root, step + 1, params, opt_state, ema)
            with open(loss_log_path, "w", encoding="utf-8") as fh:
                json.dump(losses, fh)

    if cfg.steps > start_step:
        _save(ckpt_root, cfg.steps, params, opt_state, ema)
    with open(loss_log_path, "w", encoding="utf-8") as fh:
        json.dump(losses, fh)

    # ---- export ------------------------------------------------------------
    export_dir = out_dir / "export"
    final_params = ema if ema is not None else params
    bundle.unet_params = jax.tree.map(
        lambda x: np.asarray(x, np.float32), final_params
    )
    save_native(bundle, str(export_dir))
    _copy_tokenizer_files(cfg.checkpoint, export_dir)
    log(f"exported fine-tuned checkpoint to {export_dir}")

    return {
        "steps": cfg.steps,
        "first_loss": first_loss,
        "final_loss": loss_val,
        "export_dir": str(export_dir),
        "num_clips": len(dataset),
    }


# ------------------------------------------------------------- orbax helpers


def _state_dict(params, opt_state, ema) -> dict:
    state = {"params": params, "opt_state": opt_state}
    if ema is not None:
        state["ema"] = ema
    return state


def _save(ckpt_root: Path, step: int, params, opt_state, ema) -> None:
    import orbax.checkpoint as ocp

    checkpointer = ocp.StandardCheckpointer()
    path = ckpt_root.absolute() / f"state_{step}"
    if path.exists():
        shutil.rmtree(path)
    checkpointer.save(os.fspath(path), _state_dict(params, opt_state, ema))
    checkpointer.wait_until_finished()


def _restore(ckpt_root: Path, step: int, params, opt_state, ema):
    import orbax.checkpoint as ocp

    checkpointer = ocp.StandardCheckpointer()
    like = _state_dict(params, opt_state, ema)
    restored = checkpointer.restore(
        os.fspath(ckpt_root.absolute() / f"state_{step}"), target=like
    )

    from jax.sharding import NamedSharding

    def _land(r, l):
        # Re-place only mesh-sharded leaves. Leaves whose template sits on
        # the default device (e.g. the optimizer's step counter) must stay
        # UNCOMMITTED — an explicit device_put would commit them to one
        # device and make the next jitted step reject the mixed placement.
        s = getattr(l, "sharding", None)
        if isinstance(s, NamedSharding):
            return jax.device_put(r, s)
        # round-trip through host: orbax hands back arrays committed to one
        # device, and jnp.asarray on a committed array is a no-op
        return jnp.asarray(np.asarray(r))

    restored = jax.tree.map(_land, restored, like)
    return (
        restored["params"],
        restored["opt_state"],
        restored.get("ema"),
        step,
    )
