"""Fine-tuning subsystem: loss decreases on a fixed batch, and training
state round-trips through orbax checkpoints."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from riffusion_tpu.models.unet import UNetConfig
from riffusion_tpu.parallel.mesh import factor_mesh_shape, make_mesh
from riffusion_tpu.parallel.train import DiffusionTrainer


@pytest.fixture(scope="module")
def trainer_setup():
    mesh = make_mesh(factor_mesh_shape(len(jax.devices()), 2), ("data", "model"))
    cfg = UNetConfig.tiny()
    trainer = DiffusionTrainer(cfg, mesh, learning_rate=1e-3, dtype=jnp.float32)
    key = jax.random.PRNGKey(0)
    params, opt_state = trainer.init(key)
    s = cfg.sample_size
    batch = max(2 * mesh.shape["data"], 2)
    latents = jax.random.normal(jax.random.fold_in(key, 1), (batch, s, s, cfg.in_channels))
    context = jax.random.normal(jax.random.fold_in(key, 2), (batch, 77, cfg.cross_attention_dim))
    return trainer, params, opt_state, latents, context


def _fresh(state):
    """Copy donated-able buffers so tests sharing the fixture stay isolated
    (trainer.step donates params/opt_state)."""
    return jax.tree.map(jnp.copy, state)


@pytest.mark.slow  # ~3 min: sharded train-step compile + 8 optimization steps
def test_loss_decreases(trainer_setup):
    trainer, params, opt_state, latents, context = trainer_setup
    params, opt_state = _fresh(params), _fresh(opt_state)
    losses = []
    for i in range(8):
        # fixed RNG -> fixed noise/timesteps: pure optimization progress
        params, opt_state, loss = trainer.step(
            params, opt_state, latents, context, jax.random.PRNGKey(123)
        )
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], f"no learning: {losses}"


@pytest.fixture(scope="module")
def small_trainer_setup():
    """Single-device trainer for the checkpoint round trip: orbax save/restore
    logic is device-count independent, and the 1x1-mesh compile is several
    times cheaper than the 8-virtual-device SPMD compile (the sharded step
    itself is covered by test_loss_decreases under -m slow)."""
    mesh = make_mesh((1, 1), ("data", "model"), devices=jax.devices()[:1])
    cfg = dataclasses.replace(
        UNetConfig.tiny(), block_out_channels=(16, 16, 16, 16),
        cross_attention_dim=16, norm_num_groups=4,
    )
    trainer = DiffusionTrainer(cfg, mesh, learning_rate=1e-3, dtype=jnp.float32)
    key = jax.random.PRNGKey(0)
    params, opt_state = trainer.init(key)
    s = cfg.sample_size
    latents = jax.random.normal(jax.random.fold_in(key, 1), (2, s, s, cfg.in_channels))
    context = jax.random.normal(jax.random.fold_in(key, 2), (2, 77, cfg.cross_attention_dim))
    return trainer, params, opt_state, latents, context


@pytest.mark.slow  # multi-minute compile on 1 core; runs in the CI slow job
def test_checkpoint_roundtrip(tmp_path, small_trainer_setup):
    trainer, params, opt_state, latents, context = small_trainer_setup
    params, opt_state = _fresh(params), _fresh(opt_state)
    params, opt_state, _ = trainer.step(
        params, opt_state, latents, context, jax.random.PRNGKey(3)
    )
    trainer.save_checkpoint(str(tmp_path / "ckpt"), params, opt_state, step=1)

    like = {"params": params, "opt_state": opt_state, "step": 1}
    params2, opt_state2, step = trainer.restore_checkpoint(
        str(tmp_path / "ckpt"), 1, like=like
    )
    assert step == 1
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(params2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # restored state steps identically
    _, _, loss_a = trainer.step(params, opt_state, latents, context, jax.random.PRNGKey(5))
    _, _, loss_b = trainer.step(params2, opt_state2, latents, context, jax.random.PRNGKey(5))
    assert float(loss_a) == pytest.approx(float(loss_b), rel=1e-6)
