"""
JAX-native diffusion schedulers: DDIM, PNDM (PLMS), LMS, Euler,
Euler-Ancestral, DPM-Solver++(2M) (linear and Karras grids), and a
UniPC-style exponential predictor-corrector.

TPU-first design: schedulers are split into a host-side *plan* (numpy arrays
of per-step timesteps/coefficients, computed once per step count) and a pure
`step(plan, state, i, model_output, sample)` function with static shapes and
a fixed-size history ring, so the whole denoise loop runs as one
`lax.scan` under jit. This replaces diffusers' stateful Python schedulers
(used by the reference via riffusion_pipeline.py:314-425 and
streamlit/util.py:80-109, which exposes the same six schedulers).

Algorithms follow the published papers (DDIM: Song et al.; PNDM: Liu et al.;
LMS: Katherine Crowson's k-diffusion formulation; DPM-Solver++: Lu et al.)
with diffusers-compatible coefficient conventions so converted checkpoints
sample identically (within float tolerance).
"""

from __future__ import annotations

import dataclasses
import functools
import typing as T

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

SCHEDULER_NAMES = (
    "pndm", "ddim", "lms", "euler", "euler_a", "dpmpp", "dpmpp_k", "unipc", "unipc_k"
)


@dataclasses.dataclass(frozen=True)
class NoiseConfig:
    """Training-time noise schedule (SD v1 defaults)."""

    num_train_timesteps: int = 1000
    beta_start: float = 0.00085
    beta_end: float = 0.012
    beta_schedule: str = "scaled_linear"
    steps_offset: int = 1
    set_alpha_to_one: bool = False  # DDIM/PNDM final-alpha convention

    @functools.cached_property
    def alphas_cumprod(self) -> np.ndarray:
        n = self.num_train_timesteps
        if self.beta_schedule == "scaled_linear":
            betas = np.linspace(self.beta_start**0.5, self.beta_end**0.5, n) ** 2
        elif self.beta_schedule == "linear":
            betas = np.linspace(self.beta_start, self.beta_end, n)
        else:
            raise ValueError(f"Unknown beta schedule {self.beta_schedule}")
        return np.cumprod(1.0 - betas).astype(np.float64)

    @property
    def final_alpha_cumprod(self) -> float:
        return 1.0 if self.set_alpha_to_one else float(self.alphas_cumprod[0])


@dataclasses.dataclass(frozen=True)
class SchedulerPlan:
    """Precomputed per-step arrays for one (scheduler, num_steps) pair.

    All fields are numpy (trace-time constants — they are tiny). `timesteps`
    is what the UNet sees at scan index i; other arrays are indexed by i.
    """

    name: str
    num_inference_steps: int
    timesteps: np.ndarray  # (S,) int32 — UNet conditioning timestep per index
    # generic per-index coefficient table, meaning depends on scheduler:
    coeffs: T.Dict[str, np.ndarray]
    init_noise_sigma: float = 1.0
    history: int = 1  # required history ring size

    @property
    def num_steps(self) -> int:
        return len(self.timesteps)


# ------------------------------------------------------------------- helpers


def _interp_sigmas(noise: NoiseConfig, num_steps: int) -> T.Tuple[np.ndarray, np.ndarray]:
    """k-diffusion sigma schedule with linear interpolation over train steps.
    Returns (timesteps float descending, sigmas descending with final 0)."""
    acp = noise.alphas_cumprod
    sigmas_full = ((1 - acp) / acp) ** 0.5
    t = np.linspace(0, noise.num_train_timesteps - 1, num_steps, dtype=np.float64)[::-1]
    sigmas = np.interp(t, np.arange(len(sigmas_full)), sigmas_full)
    return t, np.concatenate([sigmas, [0.0]])


def _karras_sigmas(
    noise: NoiseConfig, num_steps: int, rho: float = 7.0,
    sigma_max: T.Optional[float] = None,
) -> T.Tuple[np.ndarray, np.ndarray]:
    """Karras et al. (2022, arXiv:2206.00364 eq. 5) rho-spaced sigma schedule
    over the model's trained sigma range (or [sigma_min, sigma_max] when an
    explicit top is given — the img2img case). Spends more steps at low sigma
    than the linear-in-t grid, which is where few-step solver error
    concentrates — the standard few-step schedule (k-diffusion
    get_sigmas_karras). Timesteps for the discretely-conditioned UNet come
    from inverting the training sigma curve in log-sigma space. Returns
    (t float descending, sigmas descending with final 0)."""
    acp = noise.alphas_cumprod
    sigmas_full = ((1 - acp) / acp) ** 0.5
    sigma_min = float(sigmas_full[0])
    if sigma_max is None:
        sigma_max = float(sigmas_full[-1])
    ramp = np.linspace(0, 1, num_steps, dtype=np.float64)
    min_inv, max_inv = sigma_min ** (1 / rho), sigma_max ** (1 / rho)
    sigmas = (max_inv + ramp * (min_inv - max_inv)) ** rho  # descending
    t = np.interp(np.log(sigmas), np.log(sigmas_full), np.arange(len(sigmas_full)))
    return t, np.concatenate([sigmas, [0.0]])


def _sliced_grid(
    noise: NoiseConfig, num_steps: int, t_start: int, karras: bool,
    rho: float = 7.0, anchor: str = "respace",
) -> T.Tuple[np.ndarray, np.ndarray]:
    """(t, sigmas) for the EXECUTED suffix of an img2img chain.

    Linear grid: index slicing, which on that grid IS noise-level slicing
    (timesteps are linear in index) — the reference's strength semantics
    (interpolate_img2img, riffusion_pipeline.py:361-368). Karras grid: index
    slicing would distort strength badly — the rho-spacing packs indices at
    low sigma, so index t_start of a 16-step Karras grid sits at sigma ~36
    where the linear grid sits at ~8, denoising far more than requested.
    Instead anchor to the NOISE LEVEL, one of three ways (`anchor`; the
    round-5 img2img re-gate measures all three — see
    benchmarks/sampler_agreement.py):

    - "respace" (default): take the linear grid's sigma at t_start as the
      top and respace the executed steps Karras-style below it. Strength
      means exactly what it does on the linear grid.
    - "suffix": build the FULL num_steps Karras grid and execute from the
      index whose sigma is nearest the linear grid's level at t_start —
      the spacing a full Karras run would use, with strength quantized to
      that grid (may execute a few more steps than respace).
    - "suffix_exact": like "suffix" but the first executed sigma is REPLACED
      by the linear grid's exact level, keeping strength semantics exact
      while the tail keeps full-grid spacing.
    """
    if anchor not in ("respace", "suffix", "suffix_exact"):
        raise ValueError(f"unknown Karras slice anchor {anchor!r}")
    if karras and 0 < t_start < num_steps:
        _, sig_lin = _interp_sigmas(noise, num_steps)
        sig_start = float(sig_lin[t_start])
        if anchor in ("suffix", "suffix_exact"):
            t, sigmas = _karras_sigmas(noise, num_steps, rho=rho)
            idx = int(np.argmin(np.abs(sigmas[:-1] - sig_start)))
            t, sigmas = t[idx:].copy(), sigmas[idx:].copy()
            if anchor == "suffix_exact":
                acp = noise.alphas_cumprod
                sigmas_full = ((1 - acp) / acp) ** 0.5
                sigmas[0] = sig_start
                t[0] = float(np.interp(
                    np.log(sig_start), np.log(sigmas_full),
                    np.arange(len(sigmas_full)),
                ))
            return t, sigmas
        return _karras_sigmas(noise, num_steps - t_start, rho=rho, sigma_max=sig_start)
    t, sigmas = (
        (lambda n, s: _karras_sigmas(n, s, rho=rho)) if karras else _interp_sigmas
    )(noise, num_steps)
    return t[t_start:], sigmas[t_start:]


# ---------------------------------------------------------------------- DDIM


def _make_ddim_plan(noise: NoiseConfig, num_steps: int, t_start: int = 0) -> SchedulerPlan:
    n = noise.num_train_timesteps
    step = n // num_steps
    timesteps = (np.arange(0, num_steps) * step + noise.steps_offset)[::-1].astype(np.int64)
    timesteps = timesteps[t_start:]
    acp = noise.alphas_cumprod
    prev_ts = timesteps - step
    alpha_t = acp[timesteps]
    alpha_prev = np.where(prev_ts >= 0, acp[np.maximum(prev_ts, 0)], noise.final_alpha_cumprod)
    return SchedulerPlan(
        name="ddim",
        num_inference_steps=num_steps,
        timesteps=timesteps.astype(np.int32),
        coeffs={
            "alpha_t": alpha_t.astype(np.float32),
            "alpha_prev": alpha_prev.astype(np.float32),
        },
    )


def _ddim_step(plan: SchedulerPlan, state, i: Array, model_output: Array, sample: Array):
    a_t = jnp.asarray(plan.coeffs["alpha_t"])[i]
    a_prev = jnp.asarray(plan.coeffs["alpha_prev"])[i]
    x0 = (sample - jnp.sqrt(1.0 - a_t) * model_output) / jnp.sqrt(a_t)
    direction = jnp.sqrt(1.0 - a_prev) * model_output
    prev = jnp.sqrt(a_prev) * x0 + direction
    return prev, state


# ---------------------------------------------------------------------- PNDM


def _make_pndm_plan(noise: NoiseConfig, num_steps: int, t_start: int = 0) -> SchedulerPlan:
    """PLMS (PNDM with skip_prk_steps=True, the SD/riffusion configuration).

    `t_start` slices the global timestep sequence (img2img starts partway
    down), while the counter-dependent warmup behavior stays relative to the
    executed suffix — matching diffusers' counter semantics exactly.
    """
    n = noise.num_train_timesteps
    step = n // num_steps
    ts_asc = (np.arange(0, num_steps) * step + noise.steps_offset).astype(np.int64)
    # plms timestep sequence duplicates the second step (counter 1 re-uses it)
    seq = np.concatenate([ts_asc[:-1], ts_asc[-2:-1], ts_asc[-1:]])[::-1].copy()
    seq = seq[t_start:]

    acp = noise.alphas_cumprod
    s = len(seq)
    t_used = np.empty(s, np.int64)
    t_prev = np.empty(s, np.int64)
    weights = np.zeros((s, 4), np.float64)
    push = np.zeros(s, bool)
    avg_with_last = np.zeros(s, bool)
    use_cur_sample = np.zeros(s, bool)

    ets_len = 0
    for i in range(s):
        t = int(seq[i])
        if i == 1:
            # counter==1: average with last et, reuse stored sample, step from
            # t+step down to t
            t_used[i], t_prev[i] = t + step, t
            avg_with_last[i] = True
            use_cur_sample[i] = True
            weights[i, 0] = 1.0  # applied to the averaged output directly
        else:
            t_used[i], t_prev[i] = t, t - step
            push[i] = True
            ets_len = min(ets_len + 1, 4)
            if ets_len == 1:
                weights[i, :1] = [1.0]
            elif ets_len == 2:
                weights[i, :2] = [3 / 2, -1 / 2]
            elif ets_len == 3:
                weights[i, :3] = [23 / 12, -16 / 12, 5 / 12]
            else:
                weights[i, :4] = [55 / 24, -59 / 24, 37 / 24, -9 / 24]

    alpha_t = acp[np.clip(t_used, 0, n - 1)]
    alpha_prev = np.where(t_prev >= 0, acp[np.clip(t_prev, 0, n - 1)], noise.final_alpha_cumprod)
    sample_coeff = (alpha_prev / alpha_t) ** 0.5
    denom = alpha_t * (1 - alpha_prev) ** 0.5 + (alpha_t * (1 - alpha_t) * alpha_prev) ** 0.5
    output_coeff = (alpha_prev - alpha_t) / denom

    return SchedulerPlan(
        name="pndm",
        num_inference_steps=num_steps,
        timesteps=seq.astype(np.int32),
        coeffs={
            "weights": weights.astype(np.float32),
            "push": push.astype(np.float32),
            "avg_with_last": avg_with_last.astype(np.float32),
            "use_cur_sample": use_cur_sample.astype(np.float32),
            "sample_coeff": sample_coeff.astype(np.float32),
            "output_coeff": output_coeff.astype(np.float32),
        },
        history=4,
    )


def _pndm_init_state(plan: SchedulerPlan, shape, dtype):
    return {
        "ets": jnp.zeros((4,) + tuple(shape), dtype),
        "cur_sample": jnp.zeros(shape, dtype),
    }


def _pndm_step(plan: SchedulerPlan, state, i: Array, model_output: Array, sample: Array):
    c = {k: jnp.asarray(v) for k, v in plan.coeffs.items()}
    ets = state["ets"]

    push = c["push"][i]
    # counter==0 stores the sample for reuse at counter==1
    cur_sample = jnp.where(jnp.equal(i, 0), sample, state["cur_sample"])
    sample_eff = jnp.where(c["use_cur_sample"][i] > 0, cur_sample, sample)

    # push current model output into the ring (newest at index 0) when needed
    pushed = jnp.concatenate([model_output[None], ets[:-1]], axis=0)
    ets = jnp.where(push > 0, pushed, ets)

    avg = 0.5 * (model_output + ets[0])
    weighted = jnp.tensordot(c["weights"][i], ets, axes=1)
    e_eff = jnp.where(c["avg_with_last"][i] > 0, avg, weighted)

    prev = c["sample_coeff"][i] * sample_eff - c["output_coeff"][i] * e_eff
    return prev, {"ets": ets, "cur_sample": cur_sample}


# ----------------------------------------------------------------- LMS / Euler


def _make_lms_plan(
    noise: NoiseConfig, num_steps: int, t_start: int = 0, order: int = 4
) -> SchedulerPlan:
    t, sigmas = _sliced_grid(noise, num_steps, t_start, karras=False)
    from scipy import integrate

    n_exec = len(t)
    coeffs = np.zeros((n_exec, order), np.float64)
    for i in range(n_exec):
        cur_order = min(i + 1, order)
        for j in range(cur_order):

            def lms_derivative(tau, j=j, i=i, cur_order=cur_order):
                prod = 1.0
                for k in range(cur_order):
                    if j == k:
                        continue
                    prod *= (tau - sigmas[i - k]) / (sigmas[i - j] - sigmas[i - k])
                return prod

            coeffs[i, j] = integrate.quad(
                lms_derivative, sigmas[i], sigmas[i + 1], epsrel=1e-4
            )[0]

    return SchedulerPlan(
        name="lms",
        num_inference_steps=num_steps,
        timesteps=np.round(t).astype(np.int32),
        coeffs={
            "sigmas": sigmas.astype(np.float32),
            "lms": coeffs.astype(np.float32),
            "t_float": t.astype(np.float32),
        },
        init_noise_sigma=float(np.max(sigmas)),
        history=order,
    )


def _lms_init_state(plan, shape, dtype):
    return {"derivs": jnp.zeros((4,) + tuple(shape), dtype)}


def _lms_step(plan: SchedulerPlan, state, i, model_output, sample):
    sigmas = jnp.asarray(plan.coeffs["sigmas"])
    sigma = sigmas[i]
    x0 = sample - sigma * model_output
    d = (sample - x0) / sigma
    derivs = jnp.concatenate([d[None], state["derivs"][:-1]], axis=0)
    w = jnp.asarray(plan.coeffs["lms"])[i]  # (4,), newest first
    prev = sample + jnp.tensordot(w, derivs, axes=1)
    return prev, {"derivs": derivs}


def _make_euler_plan(
    noise: NoiseConfig, num_steps: int, ancestral: bool, t_start: int = 0
) -> SchedulerPlan:
    t, sigmas = _sliced_grid(noise, num_steps, t_start, karras=False)
    coeffs: T.Dict[str, np.ndarray] = {
        "sigmas": sigmas.astype(np.float32),
        "t_float": t.astype(np.float32),
    }
    if ancestral:
        s_from, s_to = sigmas[:-1], sigmas[1:]
        with np.errstate(divide="ignore", invalid="ignore"):
            sigma_up = np.sqrt(
                np.maximum(s_to**2 * (s_from**2 - s_to**2) / np.maximum(s_from**2, 1e-20), 0)
            )
            sigma_down = np.sqrt(np.maximum(s_to**2 - sigma_up**2, 0))
        coeffs["sigma_up"] = sigma_up.astype(np.float32)
        coeffs["sigma_down"] = sigma_down.astype(np.float32)
    return SchedulerPlan(
        name="euler_a" if ancestral else "euler",
        num_inference_steps=num_steps,
        timesteps=np.round(t).astype(np.int32),
        coeffs=coeffs,
        init_noise_sigma=float(np.max(sigmas)),
    )


def _euler_step(plan, state, i, model_output, sample):
    sigmas = jnp.asarray(plan.coeffs["sigmas"])
    sigma = sigmas[i]
    x0 = sample - sigma * model_output
    d = (sample - x0) / sigma
    prev = sample + d * (sigmas[i + 1] - sigma)
    return prev, state


def _euler_a_step(plan, state, i, model_output, sample):
    sigmas = jnp.asarray(plan.coeffs["sigmas"])
    sigma = sigmas[i]
    x0 = sample - sigma * model_output
    d = (sample - x0) / sigma
    sigma_down = jnp.asarray(plan.coeffs["sigma_down"])[i]
    sigma_up = jnp.asarray(plan.coeffs["sigma_up"])[i]
    prev = sample + d * (sigma_down - sigma)
    keys = state["key"]  # (N, 2), one key per batch item
    splits = jax.vmap(jax.random.split)(keys)  # (N, 2, 2)
    new_keys, subs = splits[:, 0], splits[:, 1]
    # Draw each item's noise at shape (1, ...) from its own key: bit-identical
    # to the single-request program with that key, for any batch size/position.
    noise = jax.vmap(
        lambda k: jax.random.normal(k, (1,) + sample.shape[1:], sample.dtype)
    )(subs)[:, 0]
    prev = prev + noise * sigma_up
    return prev, {"key": new_keys}


# ------------------------------------------------------------- DPM-Solver++ 2M


def _make_dpmpp_plan(
    noise: NoiseConfig, num_steps: int, t_start: int = 0, karras: bool = False,
    rho: float = 7.0, anchor: str = "respace",
) -> SchedulerPlan:
    """DPM-Solver++(2M) plan. `karras=True` (the "dpmpp_k" scheduler id) swaps
    the linear-in-t sigma grid for the Karras rho=7 schedule — same stepper,
    same plan name (every downstream dispatch is on the math family), denser
    low-sigma coverage so ~20 steps integrate the flow ODE as accurately as
    ~28 linear steps (benchmarks/sampler_agreement.py measures this)."""
    t, sigmas = _sliced_grid(noise, num_steps, t_start, karras, rho=rho, anchor=anchor)
    # alpha/sigma decomposition: x = alpha x0 + sigma_vp eps with
    # alpha = 1/sqrt(1+sigma^2) (k-diffusion sigma), lambda = -log(sigma_vp/alpha)
    sig = np.maximum(sigmas, 1e-10)
    lam = -np.log(sig)
    # The final step reaches sigma=0, i.e. h -> inf in lambda space: the 2M
    # extrapolation coefficient 1/(2r) = h/(2 h_last) blows up to ~40x there,
    # amplifying x0-prediction noise. Drop to first order (x = x0) on any
    # step whose target sigma is 0 — k-diffusion's dpmpp_2m does the same.
    first_order = (sigmas[1:] == 0.0).astype(np.float32)
    return SchedulerPlan(
        name="dpmpp",
        num_inference_steps=num_steps,
        timesteps=np.round(t).astype(np.int32),
        coeffs={"sigmas": sigmas.astype(np.float32), "lam": lam.astype(np.float32),
                "t_float": t.astype(np.float32), "first_order": first_order},
        init_noise_sigma=float(np.max(sigmas)),
        history=2,
    )


def _dpmpp_init_state(plan, shape, dtype):
    return {"x0_prev": jnp.zeros(shape, dtype), "has_prev": jnp.zeros((), jnp.float32)}


def _dpmpp_step(plan, state, i, model_output, sample):
    """DPM-Solver++(2M) in k-diffusion sigma space (data prediction)."""
    sigmas = jnp.asarray(plan.coeffs["sigmas"])
    sigma, sigma_next = sigmas[i], sigmas[i + 1]
    x0 = sample - sigma * model_output

    t_fn = lambda s: -jnp.log(jnp.maximum(s, 1e-10))
    t_cur, t_next = t_fn(sigma), t_fn(sigma_next)
    h = t_next - t_cur

    # second-order correction using the previous x0 prediction
    sigma_prev = sigmas[jnp.maximum(i - 1, 0)]
    h_last = t_cur - t_fn(sigma_prev)
    r = h_last / jnp.where(h == 0, 1.0, h)
    use_2m = (state["has_prev"] > 0) & (jnp.asarray(plan.coeffs["first_order"])[i] == 0)
    x0_d = jnp.where(
        use_2m,
        (1 + 1 / (2 * jnp.maximum(r, 1e-5))) * x0 - (1 / (2 * jnp.maximum(r, 1e-5))) * state["x0_prev"],
        x0,
    )
    # DPM-Solver++(2M) data-prediction update in sigma space:
    # x_next = (sigma_next/sigma) x - expm1(-h) x0_d
    ratio = sigma_next / jnp.maximum(sigma, 1e-10)
    prev = ratio * sample - jnp.expm1(-h) * x0_d
    return prev, {"x0_prev": x0, "has_prev": jnp.ones((), jnp.float32)}


# ------------------------------------------------------ UniPC (predictor-corrector)


def _exp_lagrange_weights(t_nodes: np.ndarray, t_a: float, t_b: float) -> np.ndarray:
    """Weights w_j = int_{t_a}^{t_b} e^{s - t_b} L_j(s) ds, where L_j is the
    Lagrange basis over `t_nodes`. These are the exact exponential-integrator
    quadrature weights for x' = x0(t) - x (the probability-flow ODE in
    lambda = -log(sigma) space, data prediction): a polynomial model of x0
    over the nodes integrates to sum_j w_j x0_j. They satisfy
    sum_j w_j = 1 - e^{-(t_b - t_a)}, so a constant x0 is recovered exactly.
    Same host-side scipy.quad pattern as the LMS plan above."""
    from scipy import integrate

    k = len(t_nodes)
    w = np.zeros(k, np.float64)
    for j in range(k):

        def basis(s, j=j):
            prod = np.exp(s - t_b)
            for m in range(k):
                if m == j:
                    continue
                prod *= (s - t_nodes[m]) / (t_nodes[j] - t_nodes[m])
            return prod

        w[j] = integrate.quad(basis, t_a, t_b, epsrel=1e-10)[0]
    return w


def _make_unipc_plan(
    noise: NoiseConfig, num_steps: int, t_start: int = 0,
    karras: bool = False, order: int = 2,
    rho: float = 7.0, anchor: str = "respace",
) -> SchedulerPlan:
    """UniPC-style exponential predictor-corrector (Zhao et al. 2023,
    arXiv:2302.04867 structure; coefficients here are the exact
    exponential-Adams weights rather than the paper's B(h) family).

    Per step: an order-`order` Adams-Bashforth predictor over the x0-
    prediction history, then — at the NEXT model evaluation — an
    order-(`order`+1) Adams-Moulton corrector that re-integrates the step
    just taken including the new x0, at zero extra UNet evaluations. The
    corrector is the free-lunch accuracy term: each model output is used
    both to refine the step that produced it and to predict the next one.

    All scalar coefficients depend only on the sigma grid, so they are
    precomputed into plan arrays (newest-first ring layout) and the jitted
    step is two weighted sums — no runtime linear solves like diffusers'
    UniPCMultistepScheduler (the reference never shipped UniPC; this is a
    capability extension motivated by throughput-per-quality).
    """
    t, sigmas = _sliced_grid(noise, num_steps, t_start, karras, rho=rho, anchor=anchor)
    s = len(t)
    lam = -np.log(np.maximum(sigmas, 1e-10))

    ring = order + 1  # corrector uses up to order+1 nodes (incl. the new x0)
    pred_w = np.zeros((s, ring), np.float64)
    corr_w = np.zeros((s, ring), np.float64)
    pred_ratio = np.zeros(s, np.float64)
    corr_ratio = np.zeros(s, np.float64)
    corr_on = np.zeros(s, np.float64)

    for i in range(s):
        # predictor for [t_i, t_{i+1}] over nodes {t_i, t_{i-1}, ...}
        pred_ratio[i] = sigmas[i + 1] / sigmas[i]
        if sigmas[i + 1] == 0.0:
            # h -> inf: polynomial extrapolation diverges; exact limit is the
            # newest x0 (same first-order rule as the dpmpp final step)
            pred_w[i, 0] = 1.0
        else:
            k_p = min(i + 1, order)
            nodes = lam[i - np.arange(k_p)]  # newest first
            pred_w[i, :k_p] = _exp_lagrange_weights(nodes, lam[i], lam[i + 1])
        # corrector re-integrates [t_{i-1}, t_i] over nodes {t_i, t_{i-1}, ...}
        if i >= 1:
            corr_on[i] = 1.0
            corr_ratio[i] = sigmas[i] / sigmas[i - 1]
            k_c = min(i + 1, ring)
            nodes = lam[i - np.arange(k_c)]  # newest first: x0_i is node 0
            corr_w[i, :k_c] = _exp_lagrange_weights(nodes, lam[i - 1], lam[i])

    return SchedulerPlan(
        name="unipc",
        num_inference_steps=num_steps,
        timesteps=np.round(t).astype(np.int32),
        coeffs={
            "sigmas": sigmas.astype(np.float32),
            "t_float": t.astype(np.float32),
            "pred_w": pred_w.astype(np.float32),
            "corr_w": corr_w.astype(np.float32),
            "pred_ratio": pred_ratio.astype(np.float32),
            "corr_ratio": corr_ratio.astype(np.float32),
            "corr_on": corr_on.astype(np.float32),
        },
        init_noise_sigma=float(np.max(sigmas)),
        history=ring,
    )


def _unipc_init_state(plan, shape, dtype):
    ring = int(plan.history)
    return {
        "x0_ring": jnp.zeros((ring,) + tuple(shape), dtype),
        "sample_prev": jnp.zeros(shape, dtype),
        "x_pred_prev": jnp.zeros(shape, dtype),
    }


def _unipc_step(plan, state, i, model_output, sample):
    """Correct the previous step with the fresh x0, then predict the next.

    The correction is applied as a DELTA on the incoming `sample`, not as a
    replacement: callers may have edited the latent between steps (per-step
    inpainting mask re-noising, MagicMix blends — riffusion_pipeline.py scan
    bodies), and x_i = sample + (corrected - x_pred_prev) preserves those
    edits while reducing to x_i = corrected exactly when the sample is
    untouched (sample == the predictor output stored in x_pred_prev)."""
    c = {k: jnp.asarray(v) for k, v in plan.coeffs.items()}
    sigma = c["sigmas"][i]
    x0 = sample - sigma * model_output
    ring = jnp.concatenate([x0[None], state["x0_ring"][:-1]], axis=0)

    corrected = c["corr_ratio"][i] * state["sample_prev"] + jnp.tensordot(
        c["corr_w"][i], ring, axes=1
    )
    x_i = jnp.where(
        c["corr_on"][i] > 0, sample + (corrected - state["x_pred_prev"]), sample
    )

    x_next = c["pred_ratio"][i] * x_i + jnp.tensordot(c["pred_w"][i], ring, axes=1)
    return x_next, {"x0_ring": ring, "sample_prev": x_i, "x_pred_prev": x_next}


# ----------------------------------------------------------------- interface


_MAKERS: T.Dict[str, T.Callable[..., SchedulerPlan]] = {
    "ddim": _make_ddim_plan,
    "pndm": _make_pndm_plan,
    "lms": _make_lms_plan,
    "euler": lambda n, s, t_start=0: _make_euler_plan(n, s, ancestral=False, t_start=t_start),
    "euler_a": lambda n, s, t_start=0: _make_euler_plan(n, s, ancestral=True, t_start=t_start),
    "dpmpp": _make_dpmpp_plan,
    "dpmpp_k": lambda n, s, t_start=0, **kw: _make_dpmpp_plan(
        n, s, t_start=t_start, karras=True, **kw
    ),
    "unipc": _make_unipc_plan,
    "unipc_k": lambda n, s, t_start=0, **kw: _make_unipc_plan(
        n, s, t_start=t_start, karras=True, **kw
    ),
}

_STEPPERS = {
    "ddim": _ddim_step,
    "pndm": _pndm_step,
    "lms": _lms_step,
    "euler": _euler_step,
    "euler_a": _euler_a_step,
    "dpmpp": _dpmpp_step,
    "unipc": _unipc_step,
}

#: Schedulers on the Karras rho-spaced sigma grid: their img2img slicing is
#: anchored to the LINEAR grid's noise level at t_start (see _sliced_grid),
#: so index selection against timesteps must use `slice_anchor_timesteps`.
KARRAS_GRID = ("dpmpp_k", "unipc_k")


def parse_scheduler(name: str) -> T.Tuple[str, T.Dict[str, str]]:
    """Split a scheduler string into (base name, grid options): "unipc_k"
    -> ("unipc_k", {}), "unipc_k:rho=3,anchor=suffix" -> ("unipc_k",
    {"rho": "3", "anchor": "suffix"}). Base-name semantics (stepper, sigma
    space, grid family) never vary with options."""
    base, _, opts_s = name.partition(":")
    opts: T.Dict[str, str] = {}
    for tok in opts_s.split(","):
        if tok:
            k, _, v = tok.partition("=")
            opts[k] = v
    return base, opts


def slice_anchor_timesteps(
    name: str, num_steps: int, noise: NoiseConfig = NoiseConfig()
) -> np.ndarray:
    """Timesteps in the space that `t_start` slices for `name`. Karras-grid
    schedulers re-anchor the sliced suffix to the linear grid's sigma at
    t_start, so a caller choosing t_start from a timestep bound (MagicMix's
    kmax) must search the LINEAR grid; every other plan slices its own
    timesteps."""
    name = parse_scheduler(name)[0]
    if name in KARRAS_GRID:
        t, _ = _interp_sigmas(noise, num_steps)
        return np.round(t).astype(np.int32)
    return np.asarray(make_plan(name, num_steps, 0, noise).timesteps)


#: Schedulers whose step() operates in k-diffusion sigma space (x = x0 + sigma*eps)
#: rather than DDPM space (x = sqrt(a)*x0 + sqrt(1-a)*eps). Their forward
#: noising must use `add_noise_sigma`, mirroring how each diffusers scheduler
#: owns its add_noise (the reference delegates at riffusion_pipeline.py:379).
SIGMA_BASED = ("lms", "euler", "euler_a", "dpmpp", "dpmpp_k", "unipc", "unipc_k")
_SIGMA_BASED = SIGMA_BASED


@functools.lru_cache(maxsize=64)
def make_plan(
    name: str,
    num_steps: int,
    t_start: int = 0,
    noise: NoiseConfig = NoiseConfig(),
) -> SchedulerPlan:
    """Build (cached) the execution plan for `num_steps` inference steps,
    starting at position `t_start` of the global sequence (img2img).

    Karras-grid names accept grid options after a colon —
    "unipc_k:rho=3", "dpmpp_k:anchor=suffix_exact,rho=5" — tuning the
    rho-spacing and the img2img start anchoring (_sliced_grid). The plan's
    `name` stays the base family, so every stepper/space dispatch is
    unchanged; callers keying programs on the scheduler STRING (the
    pipeline's program caches and AOT keys) see distinct variants."""
    base, opts = parse_scheduler(name)
    if base not in _MAKERS:
        raise ValueError(f"Unknown scheduler {base!r}; choose from {SCHEDULER_NAMES}")
    kwargs: T.Dict[str, T.Any] = {}
    if opts:
        if base not in KARRAS_GRID:
            raise ValueError(f"grid options {opts} only apply to {KARRAS_GRID}")
        unknown = set(opts) - {"rho", "anchor"}
        if unknown:
            raise ValueError(f"unknown scheduler options {sorted(unknown)}")
        if "rho" in opts:
            kwargs["rho"] = float(opts["rho"])
        if "anchor" in opts:
            kwargs["anchor"] = opts["anchor"]
    return _MAKERS[base](noise, num_steps, t_start, **kwargs)


def init_state(plan: SchedulerPlan, shape, dtype=jnp.float32, key: T.Optional[Array] = None):
    if plan.name == "pndm":
        return _pndm_init_state(plan, shape, dtype)
    if plan.name == "lms":
        return _lms_init_state(plan, shape, dtype)
    if plan.name == "dpmpp":
        return _dpmpp_init_state(plan, shape, dtype)
    if plan.name == "unipc":
        return _unipc_init_state(plan, shape, dtype)
    if plan.name == "euler_a":
        assert key is not None, "euler_a needs a PRNG key in its state"
        # State holds ONE KEY PER BATCH ITEM, (N, 2): each request's ancestral
        # noise stream is derived from its own key, so its output is
        # independent of batch size, position, and companions (and bit-equal
        # to the single-request program). Single-request callers pass a bare
        # (2,) key, normalized to (1, 2) here.
        keys = key if key.ndim == 2 else key[None]
        if keys.shape[0] != shape[0]:
            raise ValueError(
                f"euler_a needs one key per batch item: got {keys.shape[0]} "
                f"keys for batch {shape[0]}"
            )
        return {"key": keys}
    return {}


def step(plan: SchedulerPlan, state, i: Array, model_output: Array, sample: Array):
    """One scheduler update at scan index i. Returns (prev_sample, new_state)."""
    return _STEPPERS[plan.name](plan, state, i, model_output, sample)


def scale_model_input(plan: SchedulerPlan, sample: Array, i: Array) -> Array:
    """Pre-UNet latent scaling (sigma-based schedulers need it; DDIM/PNDM are
    identity, mirroring scheduler.scale_model_input in the reference loop)."""
    if plan.name in _SIGMA_BASED:
        sigma = jnp.asarray(plan.coeffs["sigmas"])[i]
        return sample / jnp.sqrt(sigma**2 + 1.0)
    return sample


def add_noise(
    noise_cfg: NoiseConfig, sample: Array, noise: Array, timestep: Array
) -> Array:
    """Forward-process noising at integer train timestep(s) (DDPM convention,
    used by PNDM/DDIM img2img and mask re-noising)."""
    acp = jnp.asarray(noise_cfg.alphas_cumprod.astype(np.float32))
    a = acp[jnp.asarray(timestep, jnp.int32)]
    while a.ndim < sample.ndim:
        a = a[..., None]
    return jnp.sqrt(a) * sample + jnp.sqrt(1.0 - a) * noise


def add_noise_sigma(plan: SchedulerPlan, sample: Array, noise: Array, i: Array) -> Array:
    """Sigma-space noising for k-diffusion style schedulers (img2img start)."""
    sigma = jnp.asarray(plan.coeffs["sigmas"])[i]
    return sample + noise * sigma


def add_noise_at_index(
    plan: SchedulerPlan, noise_cfg: NoiseConfig, sample: Array, noise: Array, i: Array
) -> Array:
    """Noise `sample` for consumption at plan index `i`, in the scheduler's own
    working space. Sigma-based samplers (lms/euler/euler_a/dpmpp) divide the
    UNet input by sqrt(sigma^2+1) in scale_model_input, so their noised latents
    must carry the full `x0 + sigma*eps` scale; DDPM-space noising would leave
    them under-scaled by sqrt(1+sigma^2). PNDM/DDIM keep the DDPM convention.
    """
    if plan.name in SIGMA_BASED:
        return add_noise_sigma(plan, sample, noise, i)
    return add_noise(noise_cfg, sample, noise, jnp.asarray(plan.timesteps)[jnp.asarray(i)])
