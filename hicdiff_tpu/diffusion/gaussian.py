"""Unified Gaussian diffusion engine.

One parameterized engine replacing the reference's three copy-pasted files:

  * mode='uncond' — unconditional DDPM (/root/reference/src/hicdiff.py:432-755)
  * mode='cond'   — conditional DDPM where the noisy patch is a persistent
    self-conditioning channel (/root/reference/src/hicdiff_condition.py:429-750)
  * mode='sr3'    — SR3/WaveGrad continuous-noise-level variant
    (/root/reference/src/hicdiff_sr3.py:491-796)

TPU-first design decisions (vs the reference's Python loops):
  * the full reverse `p_sample` / `ddim` loop is a single `jax.lax.scan` over
    timesteps — one compiled step, no host round-trips (the reference runs 1000
    sequential Python iterations, src/hicdiff_condition.py:615-617);
  * all schedule constants live in a `DiffusionSchedule` table (fp64 host-computed,
    fp32 on device) and are gathered with `jnp.take` per batched timestep;
  * randomness is explicit: every method takes a PRNG key; sampling folds the step
    index into the key so results are independent of scan unrolling;
  * data layout is NHWC.

Numerics preserved: x0-clamp to [-1,1] in p_mean_variance, zero noise at t=0,
p2 loss reweighting, per-batch-element random t in p_losses (scalar t in sr3),
sr3's T+2-length sqrt_alphas_cumprod_prev indexing.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from hicdiff_tpu.diffusion.schedules import DiffusionSchedule, make_schedule

Params = Any


class ModelPrediction(NamedTuple):
    pred_noise: jnp.ndarray
    pred_x_start: jnp.ndarray


def _extract(a: jnp.ndarray, t: jnp.ndarray, ndim: int) -> jnp.ndarray:
    """a[t] broadcast to an image batch: (b,) -> (b, 1, 1, 1) (hicdiff.py:391-394)."""
    out = jnp.take(a, t, axis=0)
    return out.reshape(out.shape[0], *((1,) * (ndim - 1)))


@dataclasses.dataclass(frozen=True)
class GaussianDiffusion:
    """Functional diffusion engine around a flax model.

    The model must have signature model.apply(vars, x, time, x_self_cond) with x
    NHWC. All engine methods are pure: they take `params` and a PRNG key.
    """

    model: Any  # flax linen Module
    image_size: int
    schedule: DiffusionSchedule
    mode: str = "uncond"  # 'uncond' | 'cond' | 'sr3'
    objective: str = "pred_noise"
    loss_type: str = "l2"
    self_condition: bool = False
    channels: int = 1
    sampling_timesteps: Optional[int] = None
    ddim_sampling_eta: float = 0.0
    # None -> 2D images (image_size, image_size, channels); an int selects the 1-D
    # engine (hicdiff_1d.py GaussianDiffusion1D parity) with shape (seq_length, c)
    seq_length: Optional[int] = None
    # clamp the x0 prediction to [-1,1] inside the DDIM update (the reference
    # default, hicdiff.py:648). Exposed because the clamp is implicated in the
    # measured conditional-DDIM high-t degeneracy (VALIDATION.md)
    ddim_clip_x_start: bool = True
    # fuse the posterior-step epilogue (x0 predict + clamp + posterior mean +
    # on-chip noise) into one Pallas VMEM pass (kernels/sample_step.py).
    # pred_noise objective only; trajectories differ bitwise from the jax.random
    # path (own PRNG stream) while statistically identical.
    fused_sample_step: bool = False
    # truncated conditional sampling (mode='cond' only): start the reverse
    # chain at t_start from sqrt(alphas_cumprod[t_start]) * y instead of pure
    # noise at T-1. When alphas_cumprod[t_start] ~= 1/(1+sigma0^2) the scaled
    # noisy input EXACTLY matches the forward marginal q(x_t|x0) — the
    # measurement noise plays the diffusion noise's role — so the chain skips
    # the uninformative high-t regime entirely (~T/sigma-dependent, e.g. 29 of
    # 1000 steps at sigma0=0.1 on the sigmoid schedule). Use
    # truncation_timestep(sigma0) to derive it. New capability (the reference
    # always runs all T steps, src/hicdiff_condition.py:601-623).
    t_start: Optional[int] = None
    # sr3 training draws ONE scalar t per optimizer step in the reference
    # (hicdiff_sr3.py:758 numpy randint outside the batch dim), so t-space is
    # covered ~batch-times slower than the discrete-t engines — measured as
    # the sr3 formulation's quality lag (VALIDATION.md zoo table). Opt-in
    # fix: draw t (and its continuous level) per SAMPLE instead. Off by
    # default to preserve reference-parity training semantics.
    sr3_per_sample_t: bool = False

    @classmethod
    def create(
        cls,
        model,
        *,
        image_size: int,
        timesteps: int = 1000,
        sampling_timesteps: Optional[int] = None,
        loss_type: str = "l2",
        objective: str = "pred_noise",
        beta_schedule: str = "sigmoid",
        schedule_fn_kwargs: Optional[dict] = None,
        p2_loss_weight_gamma: float = 0.0,
        p2_loss_weight_k: float = 1.0,
        ddim_sampling_eta: float = 0.0,
        mode: str = "uncond",
        auto_normalize: bool = False,  # accepted for API parity; always False in use
        seq_length: Optional[int] = None,
        fused_sample_step: bool = False,
        t_start: Optional[int] = None,
        sr3_per_sample_t: bool = False,
    ) -> "GaussianDiffusion":
        assert objective in ("pred_noise", "pred_x0", "pred_v")
        assert mode in ("uncond", "cond", "sr3")
        del auto_normalize
        schedule = make_schedule(
            beta_schedule,
            timesteps,
            p2_loss_weight_gamma=p2_loss_weight_gamma,
            p2_loss_weight_k=p2_loss_weight_k,
            **(schedule_fn_kwargs or {}),
        )
        return cls(
            model=model,
            image_size=image_size,
            schedule=schedule,
            mode=mode,
            objective=objective,
            loss_type=loss_type,
            self_condition=bool(getattr(model, "self_condition", False)),
            channels=int(getattr(model, "channels", 1)),
            sampling_timesteps=sampling_timesteps,
            ddim_sampling_eta=ddim_sampling_eta,
            seq_length=seq_length,
            fused_sample_step=fused_sample_step,
            t_start=t_start,
            sr3_per_sample_t=sr3_per_sample_t,
        )

    # ------------------------------------------------------------------ setup
    @property
    def num_timesteps(self) -> int:
        return self.schedule.num_timesteps

    @property
    def is_ddim_sampling(self) -> bool:
        return (
            self.sampling_timesteps is not None
            and self.sampling_timesteps < self.num_timesteps
        )

    def truncation_timestep(self, sigma0: float) -> int:
        """The t whose forward marginal matches `y = x + sigma0 * eps`.

        sqrt(acp_t) * y ~ q(x_t | x0) exactly when acp_t = 1/(1 + sigma0^2);
        returns the nearest schedule index (host-side, static).
        """
        import numpy as np

        acp = np.asarray(jax.device_get(self.schedule.alphas_cumprod))
        return int(np.argmin(np.abs(acp - 1.0 / (1.0 + float(sigma0) ** 2))))

    def _truncated_init(self, cond):
        """sqrt(alphas_cumprod[t_start]) * y — exact-marginal chain init."""
        scale = jnp.take(self.schedule.alphas_cumprod, self.t_start) ** 0.5
        return (scale * cond).astype(jnp.float32)

    def _validate_t_start(self, conditioned: bool) -> bool:
        """Shared t_start validation; returns whether truncation is active.

        Truncation needs a conditioning input to initialize the chain from:
        mode 'cond' or 'sr3' AND a self_condition=True model (mode='cond'
        alone is not enough — a non-self-conditioned model has no input to
        scale). For sr3 the init is the same sqrt(acp[t*])*y exact-marginal
        scaling; the chain then runs the sr3 scalar-level posterior steps.
        """
        if self.t_start is None:
            return False
        if not (conditioned and self.mode in ("cond", "sr3")):
            raise ValueError(
                "t_start requires a conditioned engine: mode in ('cond','sr3') "
                "AND a self_condition=True model (the truncated chain "
                "initializes from the conditioning input)"
            )
        if not 0 <= self.t_start < self.num_timesteps:
            raise ValueError(
                f"t_start {self.t_start} outside [0, {self.num_timesteps})"
            )
        return True

    @property
    def sample_data_shape(self):
        if self.seq_length is not None:
            return (self.seq_length, self.channels)
        return (self.image_size, self.image_size, self.channels)

    def init_params(self, rng) -> Params:
        x = jnp.zeros((1, *self.sample_data_shape))
        if self.mode == "sr3":
            time = jnp.ones((1,), dtype=jnp.float32)
        else:
            time = jnp.zeros((1,), dtype=jnp.int32)
        cond = x if self.self_condition else None
        return self.model.init(rng, x, time, cond)["params"]

    def _apply(self, params, x, time, x_self_cond):
        return self.model.apply({"params": params}, x, time, x_self_cond)

    # --------------------------------------------------------------- algebra
    def predict_start_from_noise(self, x_t, t, noise):
        s = self.schedule
        return (
            _extract(s.sqrt_recip_alphas_cumprod, t, x_t.ndim) * x_t
            - _extract(s.sqrt_recipm1_alphas_cumprod, t, x_t.ndim) * noise
        )

    def predict_noise_from_start(self, x_t, t, x0):
        s = self.schedule
        return (
            _extract(s.sqrt_recip_alphas_cumprod, t, x_t.ndim) * x_t - x0
        ) / _extract(s.sqrt_recipm1_alphas_cumprod, t, x_t.ndim)

    def predict_v(self, x_start, t, noise):
        s = self.schedule
        return (
            _extract(s.sqrt_alphas_cumprod, t, x_start.ndim) * noise
            - _extract(s.sqrt_one_minus_alphas_cumprod, t, x_start.ndim) * x_start
        )

    def predict_start_from_v(self, x_t, t, v):
        s = self.schedule
        return (
            _extract(s.sqrt_alphas_cumprod, t, x_t.ndim) * x_t
            - _extract(s.sqrt_one_minus_alphas_cumprod, t, x_t.ndim) * v
        )

    def q_posterior(self, x_start, x_t, t):
        s = self.schedule
        posterior_mean = (
            _extract(s.posterior_mean_coef1, t, x_t.ndim) * x_start
            + _extract(s.posterior_mean_coef2, t, x_t.ndim) * x_t
        )
        posterior_variance = _extract(s.posterior_variance, t, x_t.ndim)
        posterior_log_variance = _extract(
            s.posterior_log_variance_clipped, t, x_t.ndim
        )
        return posterior_mean, posterior_variance, posterior_log_variance

    def q_sample(self, x_start, t, noise):
        """Forward diffusion x_t ~ q(x_t | x_0) (hicdiff.py:694-700)."""
        s = self.schedule
        return (
            _extract(s.sqrt_alphas_cumprod, t, x_start.ndim) * x_start
            + _extract(s.sqrt_one_minus_alphas_cumprod, t, x_start.ndim) * noise
        )

    def q_sample_continuous(self, x_start, continuous_sqrt_alpha_cumprod, noise):
        """SR3 forward with a per-sample continuous level (hicdiff_sr3.py:735-739)."""
        c = continuous_sqrt_alpha_cumprod.reshape(
            -1, *((1,) * (x_start.ndim - 1))
        )
        return c * x_start + jnp.sqrt(1.0 - c**2) * noise

    # ------------------------------------------------------------ prediction
    def model_predictions(
        self, params, x, t, x_self_cond=None, clip_x_start: bool = False
    ) -> ModelPrediction:
        if self.mode == "sr3":
            # condition the model on the continuous level sqrt_acp_prev[t+1]
            level = jnp.take(self.schedule.sqrt_alphas_cumprod_prev, t + 1, axis=0)
            model_output = self._apply(params, x, level, x_self_cond)
        else:
            model_output = self._apply(params, x, t, x_self_cond)
        maybe_clip = (
            (lambda z: jnp.clip(z, -1.0, 1.0)) if clip_x_start else (lambda z: z)
        )

        if self.objective == "pred_noise":
            pred_noise = model_output
            x_start = maybe_clip(self.predict_start_from_noise(x, t, pred_noise))
        elif self.objective == "pred_x0":
            x_start = maybe_clip(model_output)
            pred_noise = self.predict_noise_from_start(x, t, x_start)
        else:  # pred_v
            x_start = maybe_clip(self.predict_start_from_v(x, t, model_output))
            pred_noise = self.predict_noise_from_start(x, t, x_start)
        return ModelPrediction(pred_noise, x_start)

    def p_mean_variance(self, params, x, t, x_self_cond=None, clip_denoised=True):
        preds = self.model_predictions(params, x, t, x_self_cond)
        x_start = preds.pred_x_start
        if clip_denoised:
            x_start = jnp.clip(x_start, -1.0, 1.0)
        model_mean, posterior_variance, posterior_log_variance = self.q_posterior(
            x_start, x, t
        )
        return model_mean, posterior_variance, posterior_log_variance, x_start

    # -------------------------------------------------------------- sampling
    def p_sample_step(self, params, rng, x, t_scalar, x_self_cond=None):
        """One reverse step; noise is zeroed at t==0 (hicdiff.py:595-601)."""
        b = x.shape[0]
        t = jnp.full((b,), t_scalar, dtype=jnp.int32)

        if self.fused_sample_step and self.objective == "pred_noise":
            from hicdiff_tpu.kernels.sample_step import fused_posterior_step

            if self.mode == "sr3":
                level = jnp.take(self.schedule.sqrt_alphas_cumprod_prev, t + 1)
                eps = self._apply(params, x, level, x_self_cond)
            else:
                eps = self._apply(params, x, t, x_self_cond)
            s = self.schedule
            seed = jax.random.randint(rng, (), 0, 2**31 - 1)
            return fused_posterior_step(
                x,
                eps,
                jnp.take(s.sqrt_recip_alphas_cumprod, t_scalar),
                jnp.take(s.sqrt_recipm1_alphas_cumprod, t_scalar),
                jnp.take(s.posterior_mean_coef1, t_scalar),
                jnp.take(s.posterior_mean_coef2, t_scalar),
                jnp.take(s.posterior_log_variance_clipped, t_scalar),
                (t_scalar > 0).astype(jnp.float32),
                seed,
            )

        model_mean, _, model_log_variance, x_start = self.p_mean_variance(
            params, x, t, x_self_cond, clip_denoised=True
        )
        noise = jax.random.normal(rng, x.shape, dtype=x.dtype)
        noise = jnp.where(t_scalar > 0, noise, jnp.zeros_like(noise))
        pred_img = model_mean + jnp.exp(0.5 * model_log_variance) * noise
        return pred_img, x_start

    def p_sample_loop(
        self, params, rng, x_in, *, return_all_timesteps: bool = False
    ):
        """Full reverse chain as a lax.scan.

        x_in: for the conditioned engines (mode='cond'/'sr3') the conditioning
        image batch (hicdiff_condition.py:601-623); for mode='uncond' a shape
        tuple.
        """
        conditioned = self.mode in ("cond", "sr3") and self.self_condition
        if conditioned:
            cond = x_in
            shape = cond.shape
        else:
            shape = tuple(x_in)

        truncated = self._validate_t_start(conditioned)

        rng, init_key = jax.random.split(rng)
        if truncated:
            img0 = self._truncated_init(cond)
            ts = jnp.arange(self.t_start, -1, -1)
        else:
            img0 = jax.random.normal(init_key, shape, dtype=jnp.float32)
            ts = jnp.arange(self.num_timesteps - 1, -1, -1)

        if conditioned:
            # persistent self-cond: the noisy input every step
            def step(img, t):
                key = jax.random.fold_in(rng, t)
                img, x_start = self.p_sample_step(params, key, img, t, cond)
                out = img if return_all_timesteps else None
                return img, out

            img, all_imgs = jax.lax.scan(step, img0, ts)
        else:
            # uncond engine: threads the predicted x_start as self-cond when the
            # model is self-conditioned (hicdiff.py:604-620: x_start starts None
            # == zeros for the model's default); None for plain models
            def step(carry, t):
                img, x_start_prev = carry
                key = jax.random.fold_in(rng, t)
                sc = x_start_prev if self.self_condition else None
                img, x_start = self.p_sample_step(params, key, img, t, sc)
                out = img if return_all_timesteps else None
                return (img, x_start), out

            (img, _), all_imgs = jax.lax.scan(
                step, (img0, jnp.zeros_like(img0)), ts
            )

        if return_all_timesteps:
            return jnp.concatenate([img0[None], all_imgs], axis=0)
        return img

    def ddim_sample(
        self, params, rng, x_in, *, return_all_timesteps: bool = False
    ):
        """DDIM sampling as a lax.scan over time pairs (hicdiff.py:623-664).

        For the conditioned engines the conditioning image is used every step
        (PARITY.md #26); the uncond engine with a self-conditioned model uses
        the reference's first-iteration-None semantics approximated by zeros.
        """
        import numpy as np

        conditioned = self.mode in ("cond", "sr3") and self.self_condition
        if conditioned:
            cond = x_in
            shape = cond.shape
        else:
            cond = None
            shape = tuple(x_in)

        truncated = self._validate_t_start(conditioned)

        total = self.num_timesteps
        top = self.t_start if truncated else total - 1
        steps = min(self.sampling_timesteps or total, top + 1)
        times = np.linspace(-1, top, steps + 1).astype(int)[::-1]
        time_pairs = np.stack([times[:-1], times[1:]], axis=1)  # (steps, 2)
        eta = self.ddim_sampling_eta
        s = self.schedule

        rng, init_key = jax.random.split(rng)
        if truncated:
            img0 = self._truncated_init(cond)
        else:
            img0 = jax.random.normal(init_key, shape, dtype=jnp.float32)

        def step(carry, pair):
            img, x_start_prev = carry
            time, time_next = pair[0], pair[1]
            b = img.shape[0]
            t = jnp.full((b,), time, dtype=jnp.int32)
            if conditioned:
                sc = cond
            elif self.self_condition:
                # uncond engine threads its own x0 prediction (hicdiff.py:638)
                sc = x_start_prev
            else:
                sc = None
            preds = self.model_predictions(
                params, img, t, sc, clip_x_start=self.ddim_clip_x_start
            )
            pred_noise, x_start = preds

            alpha = jnp.take(s.alphas_cumprod, time)
            alpha_next = jnp.take(s.alphas_cumprod, jnp.maximum(time_next, 0))
            sigma = eta * jnp.sqrt(
                (1 - alpha / alpha_next) * (1 - alpha_next) / (1 - alpha)
            )
            c = jnp.sqrt(1 - alpha_next - sigma**2)
            key = jax.random.fold_in(rng, time)
            noise = jax.random.normal(key, img.shape, dtype=img.dtype)
            img_next = x_start * jnp.sqrt(alpha_next) + c * pred_noise + sigma * noise
            img_next = jnp.where(time_next < 0, x_start, img_next)
            out = img_next if return_all_timesteps else None
            return (img_next, x_start), out

        (img, _), all_imgs = jax.lax.scan(
            step, (img0, jnp.zeros_like(img0)), jnp.asarray(time_pairs)
        )
        if return_all_timesteps:
            return jnp.concatenate([img0[None], all_imgs], axis=0)
        return img

    def interpolate(self, params, rng, x1, x2, *, t: Optional[int] = None,
                    lam: float = 0.5):
        """Latent interpolation (hicdiff.py:674-692): diffuse both images to
        step t via q_sample, blend linearly with weight lam, then run the
        reverse chain from t-1 down to 0 as a lax.scan (the reference runs a
        Python loop). For a self-conditioned model the running x0 prediction is
        threaded (first step zeros — the reference passes None, see PARITY #13).
        """
        t = self.num_timesteps - 1 if t is None else int(t)
        assert x1.shape == x2.shape, "interpolate endpoints must share a shape"
        b = x1.shape[0]
        rng, k1, k2 = jax.random.split(rng, 3)
        tb = jnp.full((b,), t, dtype=jnp.int32)
        xt1 = self.q_sample(x1, tb, jax.random.normal(k1, x1.shape, x1.dtype))
        xt2 = self.q_sample(x2, tb, jax.random.normal(k2, x2.shape, x2.dtype))
        img0 = (1.0 - lam) * xt1 + lam * xt2

        def step(carry, ti):
            img, x_start_prev = carry
            key = jax.random.fold_in(rng, ti)
            sc = x_start_prev if self.self_condition else None
            img, x_start = self.p_sample_step(params, key, img, ti, sc)
            return (img, x_start), None

        ts = jnp.arange(t - 1, -1, -1)
        (img, _), _ = jax.lax.scan(step, (img0, jnp.zeros_like(img0)), ts)
        return img

    def sample(self, params, rng, batch_size: int, *, return_all_timesteps=False):
        shape = (batch_size, *self.sample_data_shape)
        fn = self.ddim_sample if self.is_ddim_sampling else self.p_sample_loop
        return fn(params, rng, shape, return_all_timesteps=return_all_timesteps)

    def super_resolution(self, params, rng, x_in, *, return_all_timesteps=False):
        """Conditional denoising entry (hicdiff_condition.py:677-678).

        Improvements over the reference (whose super_resolution always runs
        the full chain even though its sample() dispatches,
        hicdiff_condition.py:671-678):
          * sampling_timesteps < T selects the DDIM sampler over the chain;
          * t_start (see the field / truncation_timestep) truncates the chain
            to start from the scaled noisy input at the exact-marginal
            timestep — measured better than the full chain on every metric at
            33x fewer forwards (VALIDATION.md). Both compose.
        """
        fn = self.ddim_sample if self.is_ddim_sampling else self.p_sample_loop
        return fn(params, rng, x_in, return_all_timesteps=return_all_timesteps)

    def chunked_sampler(self, chunk_steps: int = 250):
        """Factory for a host-chunked reverse-chain sampler.

        Selects the same chain as super_resolution/sample (ancestral scan, or
        DDIM when sampling_timesteps < T; truncation via t_start) but splits
        the scan's step axis into segments of at most `chunk_steps` steps,
        each dispatched as a SEPARATE XLA execution. Rationale: a single XLA
        execution longer than ~3 min of device time crashes the tunneled TPU
        worker (CLAUDE.md — the reference's 1000-step chain as one scan dies
        at batch 64), while four 250-step segments run safely at any batch
        size. Segments are dispatched asynchronously (no host sync between
        them) so chunking adds no pipeline bubble, and at most two scan
        lengths (chunk and remainder) are ever compiled.

        Numerics are IDENTICAL to p_sample_loop / ddim_sample: the same
        post-split rng, the same per-step fold_in keys — the segments merely
        partition the step axis (tests/test_diffusion.py asserts equality).

        Returns fn(params, rng, x_in) -> img. Conditioned engines take the
        conditioning batch as x_in; uncond engines a static shape tuple.
        """
        import numpy as np

        if chunk_steps < 1:
            raise ValueError(f"chunk_steps must be >= 1, got {chunk_steps}")
        conditioned = self.mode in ("cond", "sr3") and self.self_condition
        truncated = self._validate_t_start(conditioned)
        total = self.num_timesteps
        top = self.t_start if truncated else total - 1
        use_ddim = self.is_ddim_sampling
        eta = self.ddim_sampling_eta
        s = self.schedule

        if use_ddim:
            steps = min(self.sampling_timesteps or total, top + 1)
            times = np.linspace(-1, top, steps + 1).astype(int)[::-1]
            step_axis = np.stack([times[:-1], times[1:]], axis=1)  # (steps, 2)
        else:
            step_axis = np.arange(top, -1, -1)

        @jax.jit
        def seg_ancestral(params, rng, carry, ts, cond):
            def step(carry, t):
                img, x_start_prev = carry
                key = jax.random.fold_in(rng, t)
                if conditioned:
                    sc = cond
                elif self.self_condition:
                    sc = x_start_prev
                else:
                    sc = None
                img, x_start = self.p_sample_step(params, key, img, t, sc)
                return (img, x_start), None

            return jax.lax.scan(step, carry, ts)[0]

        @jax.jit
        def seg_ddim(params, rng, carry, pairs, cond):
            def step(carry, pair):
                img, x_start_prev = carry
                time, time_next = pair[0], pair[1]
                b = img.shape[0]
                t = jnp.full((b,), time, dtype=jnp.int32)
                if conditioned:
                    sc = cond
                elif self.self_condition:
                    sc = x_start_prev
                else:
                    sc = None
                preds = self.model_predictions(
                    params, img, t, sc, clip_x_start=self.ddim_clip_x_start
                )
                pred_noise, x_start = preds
                alpha = jnp.take(s.alphas_cumprod, time)
                alpha_next = jnp.take(
                    s.alphas_cumprod, jnp.maximum(time_next, 0)
                )
                sigma = eta * jnp.sqrt(
                    (1 - alpha / alpha_next) * (1 - alpha_next) / (1 - alpha)
                )
                c = jnp.sqrt(1 - alpha_next - sigma**2)
                key = jax.random.fold_in(rng, time)
                noise = jax.random.normal(key, img.shape, dtype=img.dtype)
                img_next = (
                    x_start * jnp.sqrt(alpha_next) + c * pred_noise + sigma * noise
                )
                img_next = jnp.where(time_next < 0, x_start, img_next)
                return (img_next, x_start), None

            return jax.lax.scan(step, carry, pairs)[0]

        seg_fn = seg_ddim if use_ddim else seg_ancestral

        # The per-batch host loop must issue ONLY jitted calls: every eager
        # jnp op is a remote dispatch on the tunneled backend (CLAUDE.md).
        # Segment index arrays are device-resident constants built once here;
        # the rng-split/chain-init prologue is one jitted call per batch.
        segments = tuple(
            jnp.asarray(step_axis[i : i + chunk_steps])
            for i in range(0, len(step_axis), chunk_steps)
        )

        @jax.jit
        def prologue_cond(rng, cond):
            rng, init_key = jax.random.split(rng)
            img0 = (self._truncated_init(cond) if truncated
                    else jax.random.normal(init_key, cond.shape,
                                           dtype=jnp.float32))
            return rng, img0, jnp.zeros_like(img0)

        uncond_prologues: dict = {}  # static shape -> jitted init

        def prologue_uncond(rng, shape):
            fn = uncond_prologues.get(shape)
            if fn is None:
                @jax.jit
                def fn(rng):
                    rng, init_key = jax.random.split(rng)
                    img0 = jax.random.normal(init_key, shape,
                                             dtype=jnp.float32)
                    return rng, img0, jnp.zeros_like(img0)
                uncond_prologues[shape] = fn
            return fn(rng)

        def sample_fn(params, rng, x_in):
            if conditioned:
                cond = x_in
                rng, img0, zeros = prologue_cond(rng, cond)
            else:
                cond = None
                rng, img0, zeros = prologue_uncond(rng, tuple(x_in))
            carry = (img0, zeros)
            for seg in segments:
                carry = seg_fn(params, rng, carry, seg, cond)
            return carry[0]

        return sample_fn

    # ----------------------------------------------------------------- loss
    def _elementwise_loss(self, model_out, target):
        if self.loss_type == "l2":
            return (model_out - target) ** 2
        elif self.loss_type == "l1":
            return jnp.abs(model_out - target)
        raise ValueError(f"invalid loss type {self.loss_type}")

    def p_losses(self, params, rng, x_in, *, reduce: bool = True):
        """Training loss.

        mode='uncond': x_in is the clean batch (hicdiff.py:711-755).
        mode='cond':   x_in is (cond, target) (hicdiff_condition.py:715-750).
        mode='sr3':    x_in is (cond, target) with continuous-level training
                       (hicdiff_sr3.py:754-791).

        reduce=False returns the per-sample (b,) loss vector (already p2-weighted)
        so a data-parallel trainer can mask padded samples before averaging.
        """
        if self.mode == "sr3":
            return self._p_losses_sr3(params, rng, x_in, reduce=reduce)

        if self.mode == "cond":
            cond, x_start = x_in
        else:
            cond, x_start = None, x_in

        b = x_start.shape[0]
        t_key, noise_key, sc_key, sc_bern_key = jax.random.split(rng, 4)
        t = jax.random.randint(t_key, (b,), 0, self.num_timesteps)
        noise = jax.random.normal(noise_key, x_start.shape, dtype=x_start.dtype)
        x = self.q_sample(x_start, t, noise)

        if self.mode == "cond":
            x_self_cond = cond if self.self_condition else None
        elif self.self_condition:
            # uncond engine: 50% of steps self-condition on the model's own x0
            # prediction, gradient-stopped (hicdiff.py:723-727). lax.cond executes
            # only the taken branch, so the extra forward is paid half the time.
            # (The reference would pass None here and crash — the zeros default is
            # the standard lucidrains behavior it stripped; see SURVEY.md quirks.)
            use_sc = jax.random.bernoulli(sc_bern_key, 0.5)
            x_self_cond = jax.lax.cond(
                use_sc,
                lambda: jax.lax.stop_gradient(
                    self.model_predictions(params, x, t, jnp.zeros_like(x)).pred_x_start
                ),
                lambda: jnp.zeros_like(x),
            )
        else:
            x_self_cond = None

        model_out = self._apply(params, x, t, x_self_cond)

        if self.objective == "pred_noise":
            target = noise
        elif self.objective == "pred_x0":
            # NOTE: the conditional reference targets x_start == cond here
            # (hicdiff_condition.py:733 'target = x_start' where x_start is the
            # conditioning image); we target the clean image, which is what the
            # live pred_noise path trains anyway.
            target = x_start
        else:
            target = self.predict_v(x_start, t, noise)

        loss = self._elementwise_loss(model_out, target)
        loss = loss.reshape(b, -1).mean(axis=1)
        loss = loss * jnp.take(self.schedule.p2_loss_weight, t, axis=0)
        return loss.mean() if reduce else loss

    def _p_losses_sr3(self, params, rng, x_in, *, reduce: bool = True):
        cond, x_end = x_in
        b = x_end.shape[0]
        t_key, u_key, noise_key = jax.random.split(rng, 3)
        if self.sr3_per_sample_t:
            # opt-in (see field docstring): per-sample t for b-times denser
            # t-space coverage per optimizer step
            t = jax.random.randint(t_key, (b,), 1, self.num_timesteps + 1)
        else:
            # scalar t in [1, T] per step (numpy semantics, hicdiff_sr3.py:758)
            t = jax.random.randint(t_key, (), 1, self.num_timesteps + 1)
        prev = self.schedule.sqrt_alphas_cumprod_prev
        lo = jnp.take(prev, t - 1)
        hi = jnp.take(prev, t)
        level = jax.random.uniform(u_key, (b,), minval=lo, maxval=hi)

        noise = jax.random.normal(noise_key, x_end.shape, dtype=x_end.dtype)
        x = self.q_sample_continuous(x_end, level, noise)
        x_self_cond = cond if self.self_condition else None
        model_out = self._apply(params, x, level, x_self_cond)

        if self.objective == "pred_noise":
            target = noise
        elif self.objective == "pred_x0":
            target = x_end
        else:
            tb = jnp.broadcast_to(
                jnp.clip(t - 1, 0, self.num_timesteps - 1), (b,)
            )
            target = self.predict_v(x_end, tb, noise)
        # no p2 reweighting in sr3 (commented out at hicdiff_sr3.py:788-791)
        loss = self._elementwise_loss(model_out, target)
        return loss.mean() if reduce else loss.reshape(b, -1).mean(axis=1)

    def __call__(self, params, rng, x_in):
        return self.p_losses(params, rng, x_in)
