"""PNDM scheduler (PLMS path, skip_prk) — the reference's default scheduler
(StableDiffusionScheduler.pndmScheduler, Scheduler.swift:137-344).

diffusers-PLMS semantics in scan form:
- The trajectory has S+1 model evaluations: the second-from-last training
  timestep is visited twice during warmup (diffusers duplicates it in
  ``plms_timesteps``; the Swift port hides the same behavior in its counter
  logic).  ``plan.num_steps`` is therefore ``steps + 1``.
- The epsilon history (``ets``, Scheduler.swift:152-154) is a fixed 4-slot
  ring buffer in the scan carry; the 1st/2nd/3rd/4th-order Adams–Bashforth
  weights are looked up per step from a static table.
- The counter==1 quirk (re-evaluate at the same point, restore the stashed
  original sample) is encoded with static weight rows + a `where` on the
  stashed sample.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .base import PredictionType, Scheduler, SchedulerPlan, strength_slice


class PNDMScheduler(Scheduler):
    def set_timesteps(self, num_inference_steps: int, strength: float = 1.0) -> SchedulerPlan:
        cfg = self.config
        S = num_inference_steps
        ratio = cfg.num_train_timesteps // S
        asc = np.arange(S, dtype=np.int64) * ratio + cfg.steps_offset
        # duplicate the second-from-last ascending timestep (PLMS warmup)
        plms = np.concatenate([asc[:-1], asc[-2:-1], asc[-1:]])[::-1].copy()

        acp = cfg.alphas_cumprod()
        final_alpha = acp[0]  # set_alpha_to_one=False for SD

        # img2img resume: the reference pipeline slices the front of the
        # descending PLMS array (timesteps[t_start * order:]) and the
        # scheduler's counter machinery restarts from 0, so the warmup
        # stash/restore/midpoint-corrector quirk REPLAYS at the resume
        # point.  One construction therefore covers fresh AND resumed
        # trajectories: take ts = plms[start:], apply the counter==1
        # re-targeting to ts[1] (for the fresh case ts[1] + ratio == ts[0]
        # because of the duplicated row — the same formula).
        start = strength_slice(num_inference_steps, strength)
        ts = plms[start:]
        N = len(ts)  # = S + 1 - start

        t_eval = ts.astype(np.float64)  # model is called at these
        # (timestep, prev_timestep) pairs for the update formula.
        t_upd = ts.copy()
        t_prev = ts - ratio
        if N >= 2:
            # counter==1: the update re-targets the SAME interval again
            # (diffusers step_plms: prev_timestep = timestep; timestep += ratio)
            t_upd[1] = ts[1] + ratio
            t_prev[1] = ts[1]

        a_t = acp[np.clip(t_upd, 0, None)]
        a_p = np.where(t_prev >= 0, acp[np.clip(t_prev, 0, None)], final_alpha)

        sample_coeff = np.sqrt(a_p / a_t)
        mo_denom = a_t * np.sqrt(1 - a_p) + np.sqrt(a_t * (1 - a_t) * a_p)
        alpha_diff = a_p - a_t

        # epsilon-combination weights on [e_current, m0, m1, m2, m3]
        # (m0 = newest ring entry AFTER this step's conditional append).
        # Identical for fresh and resumed runs — the counter restarts.
        w = np.zeros((N, 5))
        for i in range(N):
            if i == 0:
                w[i] = [0, 1, 0, 0, 0]
            elif i == 1:
                w[i] = [0.5, 0.5, 0, 0, 0]
            elif i == 2:
                w[i] = [0, 3 / 2, -1 / 2, 0, 0]
            elif i == 3:
                w[i] = [0, 23 / 12, -16 / 12, 5 / 12, 0]
            else:
                w[i] = [0, 55 / 24, -59 / 24, 37 / 24, -9 / 24]

        # v-prediction -> epsilon conversion coefficients at the *evaluation*
        # timestep: eps = sqrt(acp)*v + sqrt(1-acp)*x.
        a_eval = acp[np.clip(ts, 0, None)]

        tables = {
            "sample_coeff": jnp.asarray(sample_coeff, jnp.float32),
            "mo_denom": jnp.asarray(mo_denom, jnp.float32),
            "alpha_diff": jnp.asarray(alpha_diff, jnp.float32),
            "weights": jnp.asarray(w, jnp.float32),
            "sqrt_a_eval": jnp.asarray(np.sqrt(a_eval), jnp.float32),
            "sqrt_1m_a_eval": jnp.asarray(np.sqrt(1 - a_eval), jnp.float32),
        }
        return SchedulerPlan(
            timesteps=jnp.asarray(t_eval, jnp.float32),
            num_steps=N,
            init_noise_sigma=1.0,
            tables=tables,
        )

    def initial_state(self, plan, shape, dtype=jnp.float32):
        return {
            "ets": jnp.zeros((4, *shape), dtype),
            "cur_sample": jnp.zeros(shape, dtype),
        }

    def step(self, plan, state, model_output, i, sample, noise=None):
        if self.config.prediction_type == PredictionType.V_PREDICTION:
            model_output = (plan.table("sqrt_a_eval")[i] * model_output
                            + plan.table("sqrt_1m_a_eval")[i] * sample)

        # warmup quirk (counter 0/1) applies to every trajectory — on
        # img2img resume the reference scheduler's counter restarts from 0
        warmup_stash = i == 0
        warmup_restore = i == 1
        append = i != 1

        cur_sample = jnp.where(warmup_stash, sample, state["cur_sample"])
        upd_sample = jnp.where(warmup_restore, cur_sample, sample)

        # ring append
        slot = jnp.where(i == 0, 0, (i - 1) % 4).astype(jnp.int32)
        ets = jnp.where(append, state["ets"].at[slot].set(model_output), state["ets"])
        newest = slot  # on the skipped append (i==1) slot==0 == newest anyway

        w = plan.table("weights")[i]
        combined = w[0] * model_output
        for j in range(4):
            combined = combined + w[j + 1] * ets[(newest - j) % 4]

        prev = (plan.table("sample_coeff")[i] * upd_sample
                - plan.table("alpha_diff")[i] * combined / plan.table("mo_denom")[i])
        return {"ets": ets, "cur_sample": cur_sample}, prev

    def add_noise(self, plan, original, noise, i=0):
        # reconstruct acp at the i-th evaluation timestep
        a = plan.table("sqrt_a_eval")[i]
        s = plan.table("sqrt_1m_a_eval")[i]
        return a * original + s * noise
