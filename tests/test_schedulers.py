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
