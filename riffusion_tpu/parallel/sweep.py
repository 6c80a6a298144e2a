"""
Sharded frame/clip sweeps.

The reference generates interpolation frames serially (one riffuse call per
alpha, streamlit/tasks/interpolation.py:146-173) and restyles long audio one
5 s clip at a time (audio_to_audio.py:210). Here those loops become a batch
axis: one jitted program vmapped over frames/clips and sharded over the mesh
'data' axis, so N chips generate N frames in the wall-clock of one.
"""

from __future__ import annotations

import functools
import typing as T

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

from riffusion_tpu.diffusion import schedulers as sched
from riffusion_tpu.riffusion_pipeline import RiffusionPipeline, request_keys
from riffusion_tpu.util import jax_util


class FrameSweep:
    """Batched alpha-sweep interpolation over a device mesh.

    Usage: sweep = FrameSweep(pipeline, mesh); images = sweep.interpolate(...).
    All alphas share the seed image, seeds, and prompts; text embeddings and
    guidance are lerped per-frame on device.
    """

    def __init__(self, pipeline: RiffusionPipeline, mesh: T.Optional[Mesh] = None):
        self.pipe = pipeline
        self.mesh = mesh

    @functools.lru_cache(maxsize=8)
    def _program(self, scheduler: str, num_steps: int, t_start: int,
                 noise_timestep: int, num_frames: int, height: int, width: int,
                 seq_len: int):
        pipe = self.pipe
        scale = pipe.bundle.vae_config.scaling_factor
        plan = sched.make_plan(scheduler, num_steps, t_start, pipe.noise_config)

        def one_frame(unet_params, vae_params, init_latents, embed_start, embed_end,
                      uncond, alpha, guidance, noise_a, noise_b, key_sched):
            text_embedding = embed_start + alpha * (embed_end - embed_start)
            text_emb = jnp.concatenate([uncond, text_embedding], axis=0)
            noise = jax_util.slerp(alpha, noise_a, noise_b)
            if plan.name in sched.SIGMA_BASED:
                # k-diffusion samplers start at x0 + sigma_start*eps (same
                # branch as the pipeline's _riffuse_program); DDPM-space
                # noising would leave the init latents under-scaled
                latents = sched.add_noise_sigma(plan, init_latents, noise, 0)
            else:
                latents = sched.add_noise(
                    pipe.noise_config, init_latents, noise, jnp.asarray(noise_timestep)
                )
            latents = pipe._scan_denoise(
                plan, unet_params, latents, text_emb, guidance, None, None, None, key_sched
            )
            decoded = pipe.vae.apply({"params": vae_params}, latents / scale, method="decode")
            image01 = jnp.clip(decoded / 2.0 + 0.5, 0.0, 1.0)
            return jnp.round(image01[0] * 255.0).astype(jnp.uint8)

        def program(unet_params, vae_params, init_image, embed_start, embed_end,
                    uncond, alphas, guidances, keys):
            mean, logvar = pipe.vae.apply(
                {"params": vae_params}, init_image, method="encode_moments"
            )
            init_latents = scale * pipe.vae.apply(
                {"params": vae_params}, mean, logvar, keys[0], method="sample"
            )
            init_latents = init_latents.astype(jnp.float32)
            noise_a = jax.random.normal(keys[1], init_latents.shape, jnp.float32)
            noise_b = jax.random.normal(keys[2], init_latents.shape, jnp.float32)
            frame_keys = jax.random.split(keys[3], num_frames)

            frames = jax.vmap(
                one_frame,
                in_axes=(None, None, None, None, None, None, 0, 0, None, None, 0),
            )(unet_params, vae_params, init_latents, embed_start, embed_end,
              uncond, alphas, guidances, noise_a, noise_b, frame_keys)
            if self.mesh is not None:
                frames = jax.lax.with_sharding_constraint(
                    frames, NamedSharding(self.mesh, PartitionSpec("data"))
                )
            return frames  # (num_frames, H, W, 3) uint8

        if self.mesh is not None:
            alpha_sharding = NamedSharding(self.mesh, PartitionSpec("data"))
            repl = NamedSharding(self.mesh, PartitionSpec())
            return jax.jit(
                program,
                in_shardings=(repl, repl, repl, repl, repl, repl,
                              alpha_sharding, alpha_sharding, repl),
                out_shardings=alpha_sharding,
            )
        return jax.jit(program)

    def interpolate(
        self,
        prompt_start: str,
        prompt_end: str,
        seed_start: int,
        seed_end: int,
        init_image,
        alphas: T.Sequence[float],
        num_inference_steps: int = 50,
        denoising: float = 0.75,
        guidance_start: float = 7.0,
        guidance_end: float = 7.0,
        use_reweighting: bool = True,
    ) -> np.ndarray:
        """Generate all alpha frames in one sharded program.

        Returns (num_frames, H, W, 3) uint8 spectrogram images. num_frames
        should be a multiple of the mesh 'data' axis for even sharding (it is
        padded up internally otherwise, extra frames discarded).
        """
        from riffusion_tpu.riffusion_pipeline import preprocess_image

        pipe = self.pipe
        embed = pipe.embed_text_weighted if use_reweighting else pipe.embed_text
        embed_start = embed(prompt_start)
        embed_end = embed(prompt_end)
        if embed_start.shape[1] != embed_end.shape[1]:
            seq = max(embed_start.shape[1], embed_end.shape[1])
            embed_start = pipe._pad_seq(embed_start, seq)
            embed_end = pipe._pad_seq(embed_end, seq)
        uncond = pipe._uncond_embedding(None, embed_start.shape[1])

        alphas_arr = np.asarray(list(alphas), np.float32)
        n = len(alphas_arr)
        shard = self.mesh.shape["data"] if self.mesh is not None else 1
        n_pad = -(-n // shard) * shard
        alphas_padded = np.pad(alphas_arr, (0, n_pad - n), mode="edge")
        guidances = guidance_start * (1 - alphas_padded) + guidance_end * alphas_padded

        image_arr = preprocess_image(init_image)
        height, width = image_arr.shape[1], image_arr.shape[2]

        offset = pipe.noise_config.steps_offset
        init_timestep = min(int(num_inference_steps * denoising) + offset, num_inference_steps)
        t_start = max(num_inference_steps - init_timestep + offset, 0)
        full_plan = sched.make_plan(
            pipe.bundle.scheduler_name, num_inference_steps, 0, pipe.noise_config
        )
        noise_timestep = int(full_plan.timesteps[-init_timestep])

        program = self._program(
            pipe.bundle.scheduler_name, num_inference_steps, t_start, noise_timestep,
            n_pad, height, width, int(embed_start.shape[1]),
        )
        keys = request_keys(seed_start, seed_end)
        frames = program(
            pipe.unet_params, pipe.vae_params, jnp.asarray(image_arr),
            embed_start, embed_end, uncond,
            jnp.asarray(alphas_padded), jnp.asarray(guidances.astype(np.float32)), keys,
        )
        return np.asarray(frames)[:n]


def dryrun_serving_batch(n_devices: int) -> int:
    """Mesh-sharded batched serving on tiny shapes: one riffuse_audio_batch
    over a (data, model) mesh with the batch sharded on 'data'. Used by
    __graft_entry__.dryrun_multichip to validate the inference sharding path
    alongside the training step."""
    from PIL import Image

    from riffusion_tpu.datatypes import InferenceInput, PromptInput
    from riffusion_tpu.parallel.mesh import factor_mesh_shape, make_mesh
    from riffusion_tpu.spectrogram_params import SpectrogramParams

    devices = jax.devices()[:n_devices]
    assert len(devices) == n_devices, (
        f"need {n_devices} devices, have {len(jax.devices())}"
    )
    mesh = make_mesh(
        factor_mesh_shape(n_devices, 2), ("data", "model"), devices=devices
    )
    pipe = RiffusionPipeline.load_checkpoint("random:tiny")
    rng = np.random.default_rng(0)
    init = Image.fromarray(rng.integers(0, 255, (64, 64, 3), np.uint8))
    n = mesh.shape["data"]
    reqs = [
        InferenceInput(
            start=PromptInput(prompt=f"style {i}", seed=i),
            end=PromptInput(prompt="target", seed=100 + i),
            alpha=0.1 * i,
            num_inference_steps=2,
        )
        for i in range(n)
    ]
    results = pipe.riffuse_audio_batch(
        reqs, init, params=SpectrogramParams(num_frequencies=64), mesh=mesh
    )
    assert len(results) == n
    return n
