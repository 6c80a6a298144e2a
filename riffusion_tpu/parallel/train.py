"""
Sharded diffusion fine-tuning.

The reference ships no training at all (its checkpoint was fine-tuned
elsewhere; SURVEY §5 "Checkpoint/resume: inference-only"). This module adds
the training capability TPU-natively: the standard latent-diffusion
noise-prediction objective (sample t, noise latents, MSE on predicted eps)
over a GSPMD mesh:

  * dp  — batch axis sharded over mesh axis "data"
  * tp  — attention qkv/out and MLP kernels sharded over mesh axis "model"
          (Megatron-style column/row split; XLA inserts the all-reduces)
  * sp  — activation spatial (latent height) axis sharded over mesh axis
          "seq" via sharding constraints (conv halos handled by GSPMD)

Pipeline-parallelism and expert-parallelism are not applicable to this model
family (a single dense UNet with no MoE); dp x tp x sp covers the meaningful
parallelism axes at SD scale.
"""

from __future__ import annotations

import functools
import typing as T

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from riffusion_tpu.diffusion import schedulers as sched
from riffusion_tpu.models.unet import UNet2DCondition, UNetConfig

# Dense kernels split column-wise (output dim over "model"): their outputs
# are consumed head-wise / elementwise, so no communication until the paired
# row-split layer reduces.
_COLUMN_SPLIT = ("to_q", "to_k", "to_v", "fc1", "linear_1")
# Row-split (input dim over "model"): all-reduce after.
_ROW_SPLIT = ("to_out", "fc2", "linear_2", "out_proj", "proj_out")


def param_spec(path: T.Tuple[str, ...], leaf: jnp.ndarray) -> P:
    """Tensor-parallel PartitionSpec for one UNet/CLIP param leaf."""
    names = [p for p in path]
    module = names[-2] if len(names) >= 2 else ""
    leaf_name = names[-1]
    if leaf_name == "kernel" and leaf.ndim == 2:
        if module in _COLUMN_SPLIT or module.startswith("proj_in"):
            return P(None, "model")
        if module in _ROW_SPLIT:
            return P("model", None)
    if leaf_name == "bias" and leaf.ndim == 1 and module in _COLUMN_SPLIT:
        return P("model")
    # convs / norms / embeddings replicated (conv FLOPs shard via dp/sp)
    return P()


def shard_params(params, mesh: Mesh):
    """Place a param tree onto the mesh with tensor-parallel layout."""

    def place(path, leaf):
        spec = param_spec(tuple(k.key for k in path), leaf)
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)


class DiffusionTrainer:
    """Noise-prediction fine-tuning of the UNet on spectrogram latents."""

    def __init__(
        self,
        unet_config: UNetConfig,
        mesh: Mesh,
        learning_rate: T.Union[float, T.Callable] = 1e-5,  # float or optax schedule
        weight_decay: float = 1e-2,
        noise_config: sched.NoiseConfig = sched.NoiseConfig(),
        dtype=jnp.bfloat16,
    ):
        self.cfg = unet_config
        self.mesh = mesh
        self.noise_config = noise_config
        self.unet = UNet2DCondition(unet_config, dtype=dtype)
        self.tx = optax.adamw(learning_rate, weight_decay=weight_decay)
        self._has_seq = "seq" in mesh.axis_names

        self._step = jax.jit(self._train_step, donate_argnums=(0, 1))

    # ------------------------------------------------------------------ setup

    def init_from(self, params):
        """Adopt existing UNet params (e.g. a loaded checkpoint bundle's):
        cast to fp32 master weights, place with the tensor-parallel layout,
        and init matching optimizer state. Used by training/finetune.py.

        The copy is unconditional (jnp.array, not asarray): synthesized
        bundles dedupe same-spec leaves into ONE device buffer
        (models/weights.py), and an fp32 bundle on a single-device mesh
        would otherwise reach the donate_argnums=(0, 1) train step with the
        same buffer behind multiple arguments — donating an aliased buffer
        is unsupported."""
        params = jax.tree.map(lambda x: jnp.array(x, jnp.float32, copy=True), params)
        params = shard_params(params, self.mesh)
        # eager init: zeros_like follows each param's NamedSharding, so the
        # optimizer moments land sharded on the mesh (jit-wrapping tx.init
        # instead commits everything to the default device)
        opt_state = self.tx.init(params)
        return params, opt_state

    def init(self, key: jax.Array, seq_len: int = 77):
        """Initialize sharded params + optimizer state."""
        s = self.cfg.sample_size
        latents = jnp.zeros((1, s, s, self.cfg.in_channels), jnp.float32)
        ctx = jnp.zeros((1, seq_len, self.cfg.cross_attention_dim), jnp.float32)
        params = self.unet.init(key, latents, jnp.zeros((1,), jnp.int32), ctx)["params"]
        params = shard_params(params, self.mesh)
        # eager init so the moments follow param shardings (see init_from)
        opt_state = self.tx.init(params)
        return params, opt_state

    # ------------------------------------------------------------------- step

    def _constrain(self, x, spec: P):
        return jax.lax.with_sharding_constraint(x, NamedSharding(self.mesh, spec))

    def _train_step(self, params, opt_state, latents, context, key):
        """One update. latents: (B, H, W, C) clean latents (sharded over
        'data'); context: (B, L, D) text embeddings."""
        k_t, k_noise = jax.random.split(key)
        b = latents.shape[0]
        t = jax.random.randint(k_t, (b,), 0, self.noise_config.num_train_timesteps)
        noise = jax.random.normal(k_noise, latents.shape, jnp.float32)
        noisy = sched.add_noise(self.noise_config, latents, noise, t)

        if self._has_seq:
            noisy = self._constrain(noisy, P("data", "seq", None, None))

        def loss_fn(p):
            eps = self.unet.apply({"params": p}, noisy, t, context)
            if self._has_seq:
                eps = self._constrain(eps, P("data", "seq", None, None))
            return jnp.mean(jnp.square(eps.astype(jnp.float32) - noise))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = self.tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    def step(self, params, opt_state, latents, context, key):
        """Jitted sharded train step; returns (params, opt_state, loss)."""
        latents = jax.device_put(
            latents, NamedSharding(self.mesh, P("data", None, None, None))
        )
        context = jax.device_put(
            context, NamedSharding(self.mesh, P("data", None, None))
        )
        return self._step(params, opt_state, latents, context, key)


    # ----------------------------------------------------------- checkpoints

    def save_checkpoint(self, path: str, params, opt_state, step: int) -> None:
        """Persist training state with orbax (capability the reference lacks
        entirely — it is inference-only, SURVEY §5)."""
        import orbax.checkpoint as ocp

        checkpointer = ocp.StandardCheckpointer()
        checkpointer.save(
            f"{path}/state_{step}",
            {"params": params, "opt_state": opt_state, "step": step},
        )
        checkpointer.wait_until_finished()

    def restore_checkpoint(self, path: str, step: int, like=None):
        """Restore (params, opt_state) saved by save_checkpoint."""
        import orbax.checkpoint as ocp

        checkpointer = ocp.StandardCheckpointer()
        restored = checkpointer.restore(f"{path}/state_{step}", target=like)
        if like is not None:
            # land restored arrays on the template's shardings — otherwise the
            # next trainer.step sees different input layouts and recompiles
            restored = jax.tree.map(
                lambda r, l: jax.device_put(r, l.sharding)
                if hasattr(l, "sharding") else r,
                restored, like,
            )
        return restored["params"], restored["opt_state"], restored["step"]


def dryrun_train_step(n_devices: int, mesh_axes: T.Tuple[str, ...] = ("data", "model", "seq")):
    """Build an n-device mesh, jit the FULL sharded train step on tiny shapes,
    and run one update. Used by __graft_entry__.dryrun_multichip."""
    import jax as _jax

    from riffusion_tpu.parallel.mesh import factor_mesh_shape, make_mesh

    devices = _jax.devices()[:n_devices]
    assert len(devices) == n_devices, (
        f"need {n_devices} devices, have {len(_jax.devices())}"
    )
    shape = factor_mesh_shape(n_devices, len(mesh_axes))
    mesh = make_mesh(shape, mesh_axes, devices=devices)
    cfg = UNetConfig.tiny()
    trainer = DiffusionTrainer(cfg, mesh, dtype=jnp.float32)

    key = jax.random.PRNGKey(0)
    params, opt_state = trainer.init(key)

    batch = max(2 * mesh.shape["data"], 2)
    s = cfg.sample_size
    latents = jax.random.normal(jax.random.fold_in(key, 1), (batch, s, s, cfg.in_channels))
    context = jax.random.normal(
        jax.random.fold_in(key, 2), (batch, 77, cfg.cross_attention_dim)
    )
    params, opt_state, loss = trainer.step(params, opt_state, latents, context, key)
    loss_val = float(loss)
    assert jnp.isfinite(loss_val), f"non-finite training loss: {loss_val}"
    return loss_val
