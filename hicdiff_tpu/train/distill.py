"""Progressive DDIM distillation of the conditional reverse chain.

New capability (no reference counterpart — the reference always runs all
T=1000 ancestral steps per sample, /root/reference/src/hicdiff_condition.py:
601-623). Builds on this framework's truncated conditional sampler
(gaussian.py t_start): the truncated DDIM chain over `t* + 1` steps is
halved repeatedly (30 -> 15 -> 8 -> 4 -> 2 -> 1 at sigma=0.1) following
progressive distillation (Salimans & Ho, ICLR 2022): at each stage a student
initialized from the teacher learns, in ONE DDIM step, the state the teacher
reaches in TWO — so K halves per stage at (near-)constant sample quality.

Alignment with deployment is exact: stage grids use the same
`np.linspace(-1, top, K+1)` construction as `GaussianDiffusion.ddim_sample`
(gaussian.py:412), so a distilled checkpoint is consumed by the standard
`inference.py -u 0 --t-start auto --sampling-steps K` path with no new
sampler code. The i=0 training state is the chain's actual deterministic
init sqrt(acp[t*]) * y (measurement noise playing the diffusion noise's
role) rather than a fresh-noise forward marginal, so the 1-step student is
trained on exactly its deployment input distribution.

Loss: x-space L2 between the student's ONE deployed DDIM step and the
teacher's TWO (both with the deployed sampler's exact algebra, x0-clip
included). The PD paper's solved one-step-equivalent target is deliberately
NOT used: on this truncated high-SNR grid its denominator is 0.04-0.3 and
the deployed clip breaks the eps-cancellation the solve relies on, blowing
the target up ~27x (see the in-line note in the loss).

TPU-first: the distill step is one jitted function over the 1-D data mesh
(batch sharded, params replicated, XLA-inserted gradient psum), identical in
layout to train/trainer.py.
"""
from __future__ import annotations

import os
import time
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from hicdiff_tpu.diffusion.gaussian import GaussianDiffusion
from hicdiff_tpu.parallel.mesh import make_mesh, pad_batch, replicate, shard_batch
from hicdiff_tpu.train.checkpoint import checkpoint_name, save_checkpoint
from hicdiff_tpu.train.logging import MetricLogger

__all__ = ["ProgressiveDistiller", "halving_stages", "stage_grid"]


def stage_grid(top: int, k: int) -> np.ndarray:
    """The K-step DDIM time grid from `top` down to -1 (inclusive).

    MUST match gaussian.py:412 (`ddim_sample`) exactly — the distilled student
    is deployed through that sampler.
    """
    return np.linspace(-1, top, k + 1).astype(int)[::-1].copy()


def halving_stages(k0: int) -> list:
    """[k0, ceil(k0/2), ..., 1] — the progressive halving plan."""
    ks = [k0]
    while ks[-1] > 1:
        ks.append(-(-ks[-1] // 2))
    return ks


class ProgressiveDistiller:
    """One distillation stage: teacher at its grid -> student at half the steps.

    The engine must be mode='cond' with a self-conditioned model and t_start
    set (the truncated conditional configuration).
    """

    def __init__(
        self,
        engine: GaussianDiffusion,
        student_steps: int,
        lr: float = 1e-5,
        mesh=None,
    ):
        assert engine.mode == "cond" and engine.self_condition, (
            "distillation targets the truncated conditional chain"
        )
        assert engine.t_start is not None, "set engine.t_start (truncation_timestep)"
        assert engine.objective == "pred_noise"
        self.engine = engine
        self.student_steps = int(student_steps)
        self.optimizer = optax.adam(lr)
        self.mesh = mesh if mesh is not None else make_mesh()
        self.n_devices = int(np.prod([self.mesh.devices.size]))

        top = engine.t_start
        if self.student_steps > top + 1:
            raise ValueError(
                f"student_steps={self.student_steps} exceeds the truncated "
                f"grid's t_start+1={top + 1} distinct steps — start the "
                f"halving plan at K0 <= t_start+1"
            )
        grid = stage_grid(top, self.student_steps)  # (K+1,) descending to -1
        # Tables are padded to a stage-independent length and passed as jit
        # ARGUMENTS (with K as a dynamic scalar) so every halving stage reuses
        # one compiled step instead of baking its grid in as constants.
        pad_len = top + 1
        self._t_hi_tab = np.full((pad_len,), top, np.int32)
        self._t_hi_tab[: self.student_steps] = grid[:-1]
        self._t_lo_tab = np.full((pad_len,), -1, np.int32)
        self._t_lo_tab[: self.student_steps] = grid[1:]
        s = engine.schedule
        eng = engine

        def alpha_at(t):
            # acp[t] with the t = -1 endpoint meaning "fully denoised" (alpha=1)
            a = jnp.take(s.alphas_cumprod, jnp.maximum(t, 0))
            return jnp.where(t < 0, 1.0, a)

        def bc(v, ndim):
            return v.reshape(v.shape[0], *((1,) * (ndim - 1)))

        def ddim_to(x0_hat, eps_hat, t_next, ndim):
            # eta=0 DDIM jump to t_next (t_next = -1 -> x0_hat, via alpha=1)
            a = alpha_at(t_next)
            return (
                bc(jnp.sqrt(a), ndim) * x0_hat
                + bc(jnp.sqrt(1.0 - a), ndim) * eps_hat
            )

        def loss_fn(student_params, teacher_params, rng, batch, weights,
                    t_hi_tab, t_lo_tab, n_steps):
            y, x0 = batch
            b = x0.shape[0]
            i_key, n_key = jax.random.split(rng)
            i = jax.random.randint(i_key, (b,), 0, n_steps)
            t_hi = jnp.take(t_hi_tab, i)
            t_lo = jnp.take(t_lo_tab, i)
            # teacher midpoint; degenerates safely to t_hi when the gap is 1
            t_mid = (t_hi + t_lo + 1) // 2

            a_hi = alpha_at(t_hi)
            noise = jax.random.normal(n_key, x0.shape, dtype=x0.dtype)
            x_marginal = eng.q_sample(x0, t_hi, noise)
            # i == 0 (t_hi == t*): deployment init — the scaled measurement,
            # whose noise IS the measurement noise (exact marginal match)
            x_init = bc(jnp.sqrt(a_hi), x0.ndim) * y
            x = jnp.where(bc(i == 0, x0.ndim), x_init, x_marginal)

            # ---- teacher: two DDIM steps t_hi -> t_mid -> t_lo (frozen),
            # exact deployed-sampler algebra incl. the x0 clip (gaussian.py:435-449)
            p1 = eng.model_predictions(
                teacher_params, x, t_hi, y, clip_x_start=eng.ddim_clip_x_start
            )
            x_mid = ddim_to(p1.pred_x_start, p1.pred_noise, t_mid, x0.ndim)
            p2 = eng.model_predictions(
                teacher_params, x_mid, t_mid, y,
                clip_x_start=eng.ddim_clip_x_start,
            )
            x_tgt = ddim_to(p2.pred_x_start, p2.pred_noise, t_lo, x0.ndim)
            x_tgt = jax.lax.stop_gradient(x_tgt)

            # ---- student: ONE deployed step t_hi -> t_lo, matched in x-space.
            # (The PD paper's solved eps/x0 target is ill-conditioned on this
            # truncated high-SNR grid: the solve's denominator
            # sqrt(a_lo) - sqrt((1-a_lo)/(1-a_hi)) sqrt(a_hi) is 0.04-0.3, and
            # the deployed sampler's x0 clip breaks the exact eps-cancellation
            # the solve relies on, so clip residue is amplified ~27x into the
            # target — measured: solved-x0 targets at RMS 1.5 on [-1,1] data
            # while the teacher's own inter-step x0 drift is 0.005 RMS.
            # Matching the deployed one-step map directly needs no solve, is
            # exactly the deployment objective, and stays conditioned.)
            p_s = eng.model_predictions(
                student_params, x, t_hi, y, clip_x_start=eng.ddim_clip_x_start
            )
            x_next_s = ddim_to(p_s.pred_x_start, p_s.pred_noise, t_lo, x0.ndim)
            per = ((x_next_s - x_tgt) ** 2).reshape(b, -1).mean(axis=1)
            return jnp.sum(per * weights) / jnp.maximum(jnp.sum(weights), 1.0)

        def distill_step(student_params, opt_state, teacher_params, rng, batch,
                         weights, t_hi_tab, t_lo_tab, n_steps):
            loss, grads = jax.value_and_grad(loss_fn)(
                student_params, teacher_params, rng, batch, weights,
                t_hi_tab, t_lo_tab, n_steps,
            )
            updates, opt_state = self.optimizer.update(
                grads, opt_state, student_params
            )
            student_params = optax.apply_updates(student_params, updates)
            return student_params, opt_state, loss

        self._distill_step = jax.jit(distill_step, donate_argnums=(0, 1))
        self._eval_step = jax.jit(loss_fn)

    def _grid_args(self):
        # converted/uploaded once: this is called from the per-batch host
        # loops, where every unjitted jnp op is a remote dispatch (CLAUDE.md)
        if not hasattr(self, "_grid_args_cache"):
            self._grid_args_cache = (
                jnp.asarray(self._t_hi_tab),
                jnp.asarray(self._t_lo_tab),
                jnp.int32(self.student_steps),
            )
        return self._grid_args_cache

    # ---------------------------------------------------------------- helpers
    def _prep(self, data, target, pad_to: int):
        nd = self.n_devices
        multiple = -(-max(pad_to, 1) // nd) * nd
        (data, target), weights = pad_batch((data, target), multiple)
        data, target, weights = shard_batch(self.mesh, data, target, weights)
        return (data, target), weights

    @staticmethod
    def _weighted_mean(losses, sizes):
        if not losses:
            return 0.0
        w = jnp.asarray(sizes, jnp.float32)
        return float(jnp.stack(losses) @ w) / max(sum(sizes), 1)

    # ------------------------------------------------------------------- fit
    def fit(
        self,
        teacher_params,
        train_loader,
        val_loader,
        *,
        steps: int,
        rng,
        logger: Optional[MetricLogger] = None,
    ) -> Tuple:
        """Train a student (init = teacher) for `steps` optimizer steps.

        Returns (best_student_params, best_val_loss); best is tracked by the
        distillation loss on the val split at the end of each data epoch.
        """
        teacher_params = replicate(self.mesh, teacher_params)
        student = jax.tree.map(jnp.copy, teacher_params)
        opt_state = replicate(self.mesh, self.optimizer.init(student))
        pad_to = getattr(train_loader, "batch_size", 0)

        best_val = float("inf")
        best_student = None
        step = 0
        epoch = 0
        while step < steps:
            epoch += 1
            t0 = time.time()
            losses, sizes = [], []
            for data, target, _, _ in train_loader:
                if step >= steps:
                    break
                batch, weights = self._prep(data, target, pad_to)
                key = jax.random.fold_in(rng, step)
                student, opt_state, loss = self._distill_step(
                    student, opt_state, teacher_params, key, batch, weights,
                    *self._grid_args(),
                )
                losses.append(loss)
                sizes.append(data.shape[0])
                step += 1
            train_loss = self._weighted_mean(losses, sizes)

            losses, sizes = [], []
            for i, (data, target, _, _) in enumerate(val_loader):
                batch, weights = self._prep(data, target, pad_to)
                key = jax.random.fold_in(rng, 10_000_000 + i)
                losses.append(
                    self._eval_step(student, teacher_params, key, batch,
                                    weights, *self._grid_args())
                )
                sizes.append(data.shape[0])
            val_loss = self._weighted_mean(losses, sizes)
            if val_loss < best_val:
                best_val = val_loss
                best_student = jax.tree.map(jnp.copy, student)
            if logger:
                logger.log(
                    {
                        "stage_steps": self.student_steps,
                        "epoch": epoch,
                        "step": step,
                        "distill/train_loss": train_loss,
                        "distill/val_loss": val_loss,
                        "epoch_seconds": time.time() - t0,
                    }
                )
        return (best_student if best_student is not None else student), best_val
