"""Scheduler tests.

Strategy (no diffusers in CI): an analytic oracle.  For a delta data
distribution at x0, the exact epsilon predictor is known in closed form for
both the alpha-space (DDPM) and sigma-space (k-diffusion) parameterizations.
Any correctly-wired sampler driven by the oracle must converge to x0 — this
exercises every coefficient table, ring buffer, and sign.  Plus golden math
checks and jitted-scan equivalence.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ml_stable_diffusion_tpu.schedulers import (
    DDIMScheduler,
    DiscreteFlowScheduler,
    DPMSolverMultistepScheduler,
    EulerAncestralScheduler,
    EulerScheduler,
    LMSScheduler,
    PNDMScheduler,
    SCHEDULER_MAP,
)
from ml_stable_diffusion_tpu.schedulers.base import (
    SchedulerConfig,
    TimestepSpacing,
)

X0 = jnp.asarray(np.random.RandomState(0).standard_normal((1, 4, 4)).astype(np.float32))
NOISE = jnp.asarray(np.random.RandomState(1).standard_normal((1, 4, 4)).astype(np.float32))


def _acp(config):
    return jnp.asarray(config.alphas_cumprod(), jnp.float32)


def _alpha_space_oracle(config):
    acp = _acp(config)

    def eps(x, t):
        a = acp[jnp.clip(t.astype(jnp.int32), 0, config.num_train_timesteps - 1)]
        return (x - jnp.sqrt(a) * X0) / jnp.sqrt(1 - a)

    return eps


def _run(scheduler, steps, oracle, sigma_space=False, noise_fn=None):
    """Eager reference loop mirroring the pipeline contract."""
    plan = scheduler.set_timesteps(steps)
    x = NOISE * plan.init_noise_sigma
    state = scheduler.initial_state(plan, x.shape)
    for i in range(plan.num_steps):
        i = jnp.asarray(i)
        model_in = scheduler.scale_model_input(plan, state, x, i)
        t = plan.timesteps[i]
        if sigma_space:
            sigma = plan.table("sigmas")[i]
            e = (x - X0) / sigma  # exact eps in k-diffusion parameterization
        else:
            e = oracle(model_in * 0 + x, t) if oracle else None
        noise = noise_fn(i) if noise_fn else None
        state, x = scheduler.step(plan, state, e, i, x, noise=noise)
    return x


def _expected_terminal(sched, steps, terminal_alpha):
    """For a delta data distribution the exact epsilon along the trajectory is
    the constant c, and the exact terminal point is
    sqrt(a_term) x0 + sqrt(1 - a_term) c."""
    plan = sched.set_timesteps(steps)
    acp = _acp(sched.config)
    t0 = int(np.asarray(plan.timesteps)[0])
    a0 = acp[t0]
    c = (NOISE - jnp.sqrt(a0) * X0) / jnp.sqrt(1 - a0)
    return jnp.sqrt(terminal_alpha) * X0 + jnp.sqrt(1 - terminal_alpha) * c


@pytest.mark.parametrize("cls,terminal,tol", [
    # DDIM uses set_alpha_to_one (terminal alpha = 1 -> exact x0)
    (DDIMScheduler, 1.0, 1e-3),
    # PNDM/DPM++ terminate at training timestep 0 (alpha = acp[0])
    (PNDMScheduler, None, 5e-3),
    (DPMSolverMultistepScheduler, None, 2e-2),
])
def test_alpha_space_convergence(cls, terminal, tol):
    sched = cls()
    if terminal is None:
        terminal = float(sched.config.alphas_cumprod()[0])
    out = _run(sched, 20, _alpha_space_oracle(sched.config))
    expected = _expected_terminal(sched, 20, terminal)
    err = float(jnp.abs(out - expected).max())
    assert err < tol, err


@pytest.mark.parametrize("cls,tol", [
    (EulerScheduler, 1e-4),
    (LMSScheduler, 1e-4),
])
def test_sigma_space_convergence(cls, tol):
    out = _run(cls(), 20, None, sigma_space=True)
    assert float(jnp.abs(out - X0).max()) < tol


def test_euler_ancestral_zero_noise_converges():
    out = _run(EulerAncestralScheduler(), 20, None, sigma_space=True,
               noise_fn=lambda i: jnp.zeros_like(X0))
    assert float(jnp.abs(out - X0).max()) < 1e-4


def test_flow_exact_recovery():
    sched = DiscreteFlowScheduler(shift=3.0)
    plan = sched.set_timesteps(10)
    x = NOISE * plan.init_noise_sigma
    state = sched.initial_state(plan, x.shape)
    v = NOISE - X0  # exact velocity for delta data
    for i in range(plan.num_steps):
        state, x = sched.step(plan, state, v, jnp.asarray(i), x)
    np.testing.assert_allclose(np.asarray(x), np.asarray(X0), atol=1e-5)


def test_pndm_timestep_duplication():
    plan = PNDMScheduler().set_timesteps(50)
    ts = np.asarray(plan.timesteps)
    assert plan.num_steps == 51
    assert ts[0] == 981 and ts[1] == 961 and ts[2] == 961 and ts[3] == 941
    assert ts[-1] == 1


def test_alphas_cumprod_golden():
    cfg = SchedulerConfig()
    acp = cfg.alphas_cumprod()
    np.testing.assert_allclose(acp[0], 1 - 0.00085, rtol=1e-10)
    assert 0.0 < acp[-1] < 0.01  # heavily noised at T


def test_dpm_karras_spacing():
    sched = DPMSolverMultistepScheduler(timestep_spacing=TimestepSpacing.KARRAS)
    plan = sched.set_timesteps(20)
    ts = np.asarray(plan.timesteps)
    assert (np.diff(ts) < 0).all()  # descending
    assert plan.num_steps == 20
    out = _run(sched, 20, _alpha_space_oracle(sched.config))
    expected = _expected_terminal(sched, 20, float(sched.config.alphas_cumprod()[0]))
    assert float(jnp.abs(out - expected).max()) < 5e-2


def test_img2img_strength_slices_trajectory():
    for name, cls in SCHEDULER_MAP.items():
        sched = cls()
        full = sched.set_timesteps(20, strength=1.0)
        half = sched.set_timesteps(20, strength=0.5)
        assert half.num_steps < full.num_steps, name
        # noised start point must match the first timestep of the sliced plan
        noised = sched.add_noise(half, X0, NOISE)
        assert noised.shape == X0.shape, name


def test_scan_jit_equivalence():
    """The whole trajectory must compile to one lax.scan and match eager."""
    sched = DPMSolverMultistepScheduler()
    plan = sched.set_timesteps(10)
    oracle = _alpha_space_oracle(sched.config)

    def eager():
        x = NOISE * plan.init_noise_sigma
        state = sched.initial_state(plan, x.shape)
        for i in range(plan.num_steps):
            i = jnp.asarray(i)
            e = oracle(x, plan.timesteps[i])
            state, x = sched.step(plan, state, e, i, x)
        return x

    @jax.jit
    def scanned():
        x = NOISE * plan.init_noise_sigma
        state = sched.initial_state(plan, x.shape)

        def body(carry, i):
            x, state = carry
            e = oracle(x, plan.timesteps[i])
            state, x = sched.step(plan, state, e, i, x)
            return (x, state), None

        (x, _), _ = jax.lax.scan(body, (x, state), jnp.arange(plan.num_steps))
        return x

    np.testing.assert_allclose(np.asarray(eager()), np.asarray(scanned()),
                               rtol=2e-5, atol=2e-5)


def test_pndm_scan_jit_equivalence():
    sched = PNDMScheduler()
    plan = sched.set_timesteps(8)
    oracle = _alpha_space_oracle(sched.config)

    def eager():
        x = NOISE * plan.init_noise_sigma
        state = sched.initial_state(plan, x.shape)
        for i in range(plan.num_steps):
            i = jnp.asarray(i)
            e = oracle(x, plan.timesteps[i])
            state, x = sched.step(plan, state, e, i, x)
        return x

    @jax.jit
    def scanned():
        x = NOISE * plan.init_noise_sigma
        state = sched.initial_state(plan, x.shape)

        def body(carry, i):
            x, state = carry
            e = oracle(x, plan.timesteps[i])
            state, x = sched.step(plan, state, e, i, x)
            return (x, state), None

        (x, _), _ = jax.lax.scan(body, (x, state), jnp.arange(plan.num_steps))
        return x

    np.testing.assert_allclose(np.asarray(eager()), np.asarray(scanned()),
                               rtol=2e-5, atol=2e-5)


class _PLMSOracle:
    """Eager re-implementation of the stateful PLMS algorithm (reference
    Scheduler.swift:137-344 / diffusers step_plms counter machinery) used as
    a trajectory oracle for the scan-form PNDMScheduler — including the
    counter 0/1 warmup quirk, which REPLAYS at the resume point on img2img
    (the scheduler's counter restarts from 0 after set_timesteps)."""

    def __init__(self, config, ratio):
        self.acp = np.asarray(config.alphas_cumprod(), np.float64)
        self.final_alpha = self.acp[0]
        self.ratio = ratio
        self.ets = []
        self.counter = 0
        self.cur_sample = None

    def step(self, eps, t, x):
        t = int(t)
        prev_t = t - self.ratio
        if self.counter != 1:
            self.ets.append(eps)
        else:
            prev_t = t
            t = t + self.ratio
        if len(self.ets) == 1 and self.counter == 0:
            eps_c = eps
            self.cur_sample = x
        elif len(self.ets) == 1 and self.counter == 1:
            eps_c = (eps + self.ets[-1]) / 2
            x = self.cur_sample
        elif len(self.ets) == 2:
            eps_c = (3 * self.ets[-1] - self.ets[-2]) / 2
        elif len(self.ets) == 3:
            eps_c = (23 * self.ets[-1] - 16 * self.ets[-2]
                     + 5 * self.ets[-3]) / 12
        else:
            eps_c = (55 * self.ets[-1] - 59 * self.ets[-2]
                     + 37 * self.ets[-3] - 9 * self.ets[-4]) / 24
        a_t = self.acp[t]
        a_p = self.acp[prev_t] if prev_t >= 0 else self.final_alpha
        coeff = np.sqrt(a_p / a_t)
        denom = a_t * np.sqrt(1 - a_p) + np.sqrt(a_t * (1 - a_t) * a_p)
        self.counter += 1
        return coeff * x - (a_p - a_t) * eps_c / denom


@pytest.mark.parametrize("strength", [1.0, 0.5, 0.3],
                         ids=["fresh", "resume0.5", "resume0.3"])
def test_pndm_matches_stateful_oracle(strength):
    """The scan-form PNDM trajectory (incl. img2img resume) must match the
    eagerly-computed stateful PLMS oracle step for step (VERDICT r2 weak #5:
    the resumed path previously deviated — it dropped the warmup corrector
    and re-ramped order 1->4)."""
    from ml_stable_diffusion_tpu.schedulers import PNDMScheduler

    S = 10
    sched = PNDMScheduler()
    plan = sched.set_timesteps(S, strength=strength)
    ratio = sched.config.num_train_timesteps // S
    oracle = _PLMSOracle(sched.config, ratio)

    rng = np.random.RandomState(0)
    field = rng.randn(1, 4, 4, 2).astype(np.float32)

    def fake_eps(x, t):  # deterministic, t- and x-dependent
        return 0.15 * np.asarray(x) + np.sin(float(t) / 100.0) * field

    ts = np.asarray(plan.timesteps)
    x_ref = rng.randn(1, 4, 4, 2).astype(np.float32)
    x_scan = jnp.asarray(x_ref)
    state = sched.initial_state(plan, x_scan.shape)
    x_orc = x_ref.copy()
    for i in range(plan.num_steps):
        e = fake_eps(x_orc, ts[i])
        x_orc = oracle.step(np.asarray(e, np.float64), ts[i], x_orc)
        e2 = fake_eps(np.asarray(x_scan), ts[i])
        state, x_scan = sched.step(plan, state, jnp.asarray(e2),
                                   jnp.asarray(i), x_scan)
    np.testing.assert_allclose(np.asarray(x_scan), x_orc, rtol=2e-4,
                               atol=2e-4)


def test_pndm_resume_eval_count_matches_reference_slice():
    """Resumed plan length = len(plms_timesteps[t_start:]) = S + 1 - t_start
    (the reference pipeline slices the descending PLMS array and keeps the
    rest; it does NOT drop the extra warmup evaluation)."""
    from ml_stable_diffusion_tpu.schedulers import PNDMScheduler
    from ml_stable_diffusion_tpu.schedulers.base import strength_slice

    sched = PNDMScheduler()
    for S, strength in ((10, 0.5), (20, 0.3), (10, 1.0)):
        plan = sched.set_timesteps(S, strength=strength)
        assert plan.num_steps == S + 1 - strength_slice(S, strength)


def test_karras_spacing_euler_family():
    """timestep_spacing='karras' on the sigma-space schedulers (diffusers
    use_karras_sigmas): sigmas follow the Karras rho=7 ramp and timesteps
    come back through sigma->t interpolation (in-range, descending)."""
    from ml_stable_diffusion_tpu.schedulers import SCHEDULER_MAP
    from ml_stable_diffusion_tpu.schedulers.base import (
        SchedulerConfig,
        TimestepSpacing,
        karras_sigma_ramp,
    )

    for name in ("Euler", "EulerAncestral", "LMS"):
        cfg = SchedulerConfig(timestep_spacing=TimestepSpacing.KARRAS)
        sched = SCHEDULER_MAP[name](cfg)
        plan = sched.set_timesteps(8)
        sig = np.asarray(plan.table("sigmas"))[:8]
        acp = cfg.alphas_cumprod()
        all_sig = np.sqrt((1 - acp) / acp)
        want = karras_sigma_ramp(float(all_sig.min()), float(all_sig.max()), 8)
        np.testing.assert_allclose(sig, want, rtol=1e-5)
        ts = np.asarray(plan.timesteps)
        assert (np.diff(ts) < 0).all()
        assert ts.min() >= 0 and ts.max() <= cfg.num_train_timesteps - 1
        assert plan.init_noise_sigma == pytest.approx(float(all_sig.max()),
                                                      rel=1e-5)


def test_lcm_timestep_grid_and_boundary_step():
    """LCM analytic oracle: the timestep grid subsamples the 50-step DDIM
    distillation grid; a step on a sample noised from known (x0, eps)
    returns exactly c_out*x0_hat + c_skip*sample, re-noised to the next
    grid point except on the final step."""
    import jax.numpy as jnp

    from ml_stable_diffusion_tpu.schedulers import SCHEDULER_MAP

    sched = SCHEDULER_MAP["LCM"]()
    plan = sched.set_timesteps(4)
    np.testing.assert_array_equal(np.asarray(plan.timesteps),
                                  [999, 759, 519, 279])
    plan8 = sched.set_timesteps(8)
    assert len(np.asarray(plan8.timesteps)) == 8
    assert np.asarray(plan8.timesteps)[0] == 999

    rng = np.random.default_rng(0)
    x0 = rng.normal(size=(1, 4, 4, 4)).astype(np.float32)
    eps = rng.normal(size=(1, 4, 4, 4)).astype(np.float32)
    noise = rng.normal(size=(1, 4, 4, 4)).astype(np.float32)
    acp = sched.config.alphas_cumprod()
    for i, last in [(1, False), (3, True)]:
        t = int(np.asarray(plan.timesteps)[i])
        sample = np.sqrt(acp[t]) * x0 + np.sqrt(1 - acp[t]) * eps
        # model predicts the exact eps -> pred_x0 == x0
        _, out = sched.step(plan, None, jnp.asarray(eps), i,
                            jnp.asarray(sample), noise=jnp.asarray(noise))
        scaled = t * 10.0
        c_skip = 0.25 / (scaled**2 + 0.25)
        c_out = scaled / np.sqrt(scaled**2 + 0.25)
        denoised = c_out * x0 + c_skip * sample
        if last:
            want = denoised
        else:
            t_prev = int(np.asarray(plan.timesteps)[i + 1])
            want = (np.sqrt(acp[t_prev]) * denoised
                    + np.sqrt(1 - acp[t_prev]) * noise)
        np.testing.assert_allclose(np.asarray(out), want, rtol=2e-4,
                                   atol=2e-5)


def test_lcm_pipeline_e2e(tmp_path):
    import sys
    from pathlib import Path as _P

    sys.path.insert(0, str(_P(__file__).parent))
    from helpers import tiny_text_encoder, tiny_tokenizer, tiny_unet, tiny_vae

    from ml_stable_diffusion_tpu.pipelines import (
        PipelineConfiguration,
        StableDiffusionPipeline,
    )

    dec, enc = tiny_vae()
    pipe = StableDiffusionPipeline(
        tokenizer=tiny_tokenizer(tmp_path), text_encoder=tiny_text_encoder(),
        unet=tiny_unet(), vae_decoder=dec, vae_encoder=enc)
    cfg = lambda seed: PipelineConfiguration(
        prompt="a cat", step_count=4, seed=seed, guidance_scale=1.0,
        scheduler="LCM", disable_safety=True)
    a = pipe.generate_images(cfg(5), image_hw=(64, 64)).latents
    b = pipe.generate_images(cfg(5), image_hw=(64, 64)).latents
    c = pipe.generate_images(cfg(6), image_hw=(64, 64)).latents
    assert np.isfinite(a).all()
    np.testing.assert_array_equal(a, b)
    assert np.abs(a - c).max() > 1e-6
