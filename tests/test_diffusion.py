"""Diffusion-engine algebra and sampling tests (closed-form identities per
SURVEY.md §4 test strategy)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from hicdiff_tpu.diffusion.gaussian import GaussianDiffusion
from hicdiff_tpu.models.hicedrn import HicedrnDiff


class TinyModel(nn.Module):
    """Minimal time-conditioned model for engine tests."""

    channels: int = 1
    self_condition: bool = False

    @nn.compact
    def __call__(self, x, time, x_self_cond=None):
        if self.self_condition:
            if x_self_cond is None:
                x_self_cond = jnp.zeros_like(x)
            x = jnp.concatenate([x_self_cond, x], axis=-1)
        temb = time.astype(jnp.float32).reshape(-1, 1, 1, 1)
        h = nn.Conv(8, (3, 3), padding="SAME")(x) + temb * 0.0
        h = jax.nn.silu(h)
        return nn.Conv(self.channels, (3, 3), padding="SAME")(h)


def make_engine(mode="uncond", self_condition=False, T=20, image_size=8, **kw):
    model = TinyModel(self_condition=self_condition)
    return GaussianDiffusion.create(
        model,
        image_size=image_size,
        timesteps=T,
        loss_type="l2",
        # NB: the reference linear schedule scales betas by 1000/T, so tiny test T
        # degenerates (beta_end -> 1, alpha_bar -> 0); cosine is well-behaved.
        beta_schedule="cosine",
        mode=mode,
        **kw,
    )


def test_q_sample_inversion():
    """predict_start_from_noise(q_sample(x0, t, n), t, n) == x0 (closed form)."""
    eng = make_engine()
    key = jax.random.PRNGKey(0)
    x0 = jax.random.normal(key, (4, 8, 8, 1))
    noise = jax.random.normal(jax.random.fold_in(key, 1), x0.shape)
    t = jnp.array([0, 5, 10, 19])
    xt = eng.q_sample(x0, t, noise)
    rec = eng.predict_start_from_noise(xt, t, noise)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(x0), rtol=1e-3, atol=1e-3)


def test_predict_v_roundtrip():
    eng = make_engine(objective="pred_v")
    key = jax.random.PRNGKey(0)
    x0 = jax.random.normal(key, (4, 8, 8, 1))
    noise = jax.random.normal(jax.random.fold_in(key, 1), x0.shape)
    t = jnp.array([1, 7, 13, 18])
    xt = eng.q_sample(x0, t, noise)
    v = eng.predict_v(x0, t, noise)
    rec = eng.predict_start_from_v(xt, t, v)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(x0), rtol=1e-3, atol=1e-4)


def test_q_posterior_fixed_point():
    """posterior mean of (x, x, t) == x since coef1+coef2 == 1 in the limit... use
    identity: coef1 + coef2*sqrt? Use exact algebra instead: for x_start == x_t == x,
    mean = (coef1 + coef2) * x. Check against schedule arrays."""
    eng = make_engine()
    s = eng.schedule
    x = jnp.ones((2, 8, 8, 1))
    t = jnp.array([3, 9])
    mean, var, logvar = eng.q_posterior(x, x, t)
    coef = np.asarray(s.posterior_mean_coef1 + s.posterior_mean_coef2)
    np.testing.assert_allclose(
        np.asarray(mean)[:, 0, 0, 0], coef[np.asarray(t)], rtol=1e-6
    )


def test_q_sample_statistics():
    """Marginal q(x_t|x_0) has mean sqrt(acp)*x0 and var (1-acp)."""
    eng = make_engine(T=100)
    key = jax.random.PRNGKey(42)
    x0 = jnp.full((2000, 4, 4, 1), 0.7)
    t = jnp.full((2000,), 50)
    noise = jax.random.normal(key, x0.shape)
    xt = np.asarray(eng.q_sample(x0, t, noise))
    acp = float(eng.schedule.alphas_cumprod[50])
    np.testing.assert_allclose(xt.mean(), np.sqrt(acp) * 0.7, atol=0.01)
    np.testing.assert_allclose(xt.std(), np.sqrt(1 - acp), atol=0.01)


@pytest.mark.parametrize("mode,self_cond", [("uncond", False), ("cond", True)])
def test_loss_finite_and_grad_flows(mode, self_cond):
    eng = make_engine(mode=mode, self_condition=self_cond)
    key = jax.random.PRNGKey(0)
    params = eng.init_params(key)
    x = jax.random.normal(jax.random.fold_in(key, 1), (4, 8, 8, 1))
    batch = (x * 0.5, x) if mode == "cond" else x

    def loss_fn(p):
        return eng.p_losses(p, jax.random.fold_in(key, 2), batch)

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    gnorm = sum(float(jnp.sum(g**2)) for g in jax.tree.leaves(grads))
    assert gnorm > 0


def test_sr3_loss():
    eng = make_engine(mode="sr3", self_condition=True)
    key = jax.random.PRNGKey(0)
    params = eng.init_params(key)
    x = jax.random.normal(jax.random.fold_in(key, 1), (4, 8, 8, 1))
    loss = eng.p_losses(params, jax.random.fold_in(key, 2), (x * 0.5, x))
    assert np.isfinite(float(loss))


def test_sr3_per_sample_t():
    """sr3_per_sample_t=True: per-sample levels (spanning the schedule rather
    than one scalar-t bracket), finite loss + nonzero grads; default stays the
    reference's scalar-t semantics."""
    import dataclasses

    eng = make_engine(mode="sr3", self_condition=True, sr3_per_sample_t=True)
    assert not dataclasses.replace(eng, sr3_per_sample_t=False).sr3_per_sample_t
    key = jax.random.PRNGKey(0)
    params = eng.init_params(key)
    b = 16
    x = jax.random.normal(jax.random.fold_in(key, 1), (b, 8, 8, 1))

    def loss_fn(p):
        return eng.p_losses(p, jax.random.fold_in(key, 2), (x * 0.5, x))

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    assert sum(float(jnp.sum(g**2)) for g in jax.tree.leaves(grads)) > 0

    # the drawn levels genuinely differ across samples: per-sample t makes the
    # level spread far wider than any single [prev[t-1], prev[t]] bracket
    t_key, u_key, _ = jax.random.split(jax.random.fold_in(key, 2), 3)
    t = jax.random.randint(t_key, (b,), 1, eng.num_timesteps + 1)
    assert len(np.unique(np.asarray(t))) > 1
    prev = np.asarray(eng.schedule.sqrt_alphas_cumprod_prev)
    lo = prev[np.asarray(t) - 1]
    hi = prev[np.asarray(t)]
    level = np.asarray(
        jax.random.uniform(u_key, (b,), minval=lo, maxval=hi)
    )
    max_bracket = np.abs(np.diff(prev)).max()
    assert level.max() - level.min() > 2 * max_bracket


def test_p_sample_loop_shapes_uncond():
    eng = make_engine(T=5)
    key = jax.random.PRNGKey(0)
    params = eng.init_params(key)
    out = jax.jit(lambda p, k: eng.sample(p, k, batch_size=2))(params, key)
    assert out.shape == (2, 8, 8, 1)
    assert np.isfinite(np.asarray(out)).all()


def test_p_sample_loop_conditional():
    eng = make_engine(mode="cond", self_condition=True, T=5)
    key = jax.random.PRNGKey(0)
    params = eng.init_params(key)
    cond = jax.random.normal(jax.random.fold_in(key, 3), (2, 8, 8, 1))
    out = jax.jit(lambda p, k, c: eng.super_resolution(p, k, c))(params, key, cond)
    assert out.shape == cond.shape
    assert np.isfinite(np.asarray(out)).all()


def test_ddim_sample():
    eng = make_engine(T=10, sampling_timesteps=4)
    assert eng.is_ddim_sampling
    key = jax.random.PRNGKey(0)
    params = eng.init_params(key)
    out = jax.jit(lambda p, k: eng.sample(p, k, batch_size=2))(params, key)
    assert out.shape == (2, 8, 8, 1)
    assert np.isfinite(np.asarray(out)).all()


def test_sampling_deterministic_given_key():
    eng = make_engine(T=5)
    key = jax.random.PRNGKey(7)
    params = eng.init_params(key)
    a = eng.sample(params, key, batch_size=1)
    b = eng.sample(params, key, batch_size=1)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_trained_toy_model_denoises():
    """Overfit pred_noise on constant images; sampling should move toward them.

    Minimal end-to-end check that loss-gradient-sampling plumbing is consistent.
    """
    import optax

    eng = make_engine(T=20)
    key = jax.random.PRNGKey(0)
    params = eng.init_params(key)
    x0 = jnp.ones((16, 8, 8, 1)) * 0.5
    opt = optax.adam(1e-2)
    opt_state = opt.init(params)

    @jax.jit
    def step(p, s, k):
        loss, g = jax.value_and_grad(lambda q: eng.p_losses(q, k, x0))(p)
        updates, s = opt.update(g, s)
        return optax.apply_updates(p, updates), s, loss

    losses = []
    for i in range(200):
        params, opt_state, loss = step(params, opt_state, jax.random.fold_in(key, i))
        losses.append(float(loss))
    assert np.mean(losses[-20:]) < np.mean(losses[:20]) * 0.7


def test_ddim_conditional():
    """DDIM fast path for the conditional engine conditions on the noisy input."""
    eng = make_engine(mode="cond", self_condition=True, T=10, sampling_timesteps=4)
    key = jax.random.PRNGKey(0)
    params = eng.init_params(key)
    cond = jax.random.normal(jax.random.fold_in(key, 5), (2, 8, 8, 1))
    out = jax.jit(lambda p, k, c: eng.super_resolution(p, k, c))(params, key, cond)
    assert out.shape == cond.shape
    assert np.isfinite(np.asarray(out)).all()


def test_sampling_sharded_over_mesh():
    """Conditional sampling with the batch sharded across the 8-device mesh."""
    from hicdiff_tpu.parallel.mesh import data_sharding, make_mesh, replicate

    eng = make_engine(mode="cond", self_condition=True, T=5)
    mesh = make_mesh()
    key = jax.random.PRNGKey(0)
    params = replicate(mesh, eng.init_params(key))
    cond = jax.device_put(
        jax.random.normal(key, (16, 8, 8, 1)), data_sharding(mesh)
    )
    out = jax.jit(lambda p, k, c: eng.super_resolution(p, k, c))(params, key, cond)
    assert out.shape == cond.shape
    assert np.isfinite(np.asarray(out)).all()


def test_uncond_self_conditioned_sampling():
    """uncond engine + self-conditioned model: x_in is a shape tuple and the
    model's own x0 prediction is threaded (hicdiff.py:604-620, 638)."""
    eng = make_engine(mode="uncond", self_condition=True, T=5)
    key = jax.random.PRNGKey(0)
    params = eng.init_params(key)
    out = jax.jit(lambda p, k: eng.sample(p, k, batch_size=2))(params, key)
    assert out.shape == (2, 8, 8, 1)
    assert np.isfinite(np.asarray(out)).all()
    # ddim variant too
    eng2 = make_engine(mode="uncond", self_condition=True, T=10, sampling_timesteps=4)
    params2 = eng2.init_params(key)
    out2 = jax.jit(lambda p, k: eng2.sample(p, k, batch_size=2))(params2, key)
    assert np.isfinite(np.asarray(out2)).all()


def test_interpolate_shapes_and_determinism():
    """engine.interpolate (hicdiff.py:674-692): q_sample both endpoints to t,
    blend, run the reverse chain from t."""
    eng = make_engine("uncond")
    rng = jax.random.PRNGKey(0)
    params = eng.init_params(rng)
    x1 = jnp.clip(jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 1)) * 0.3, -1, 1)
    x2 = jnp.clip(jax.random.normal(jax.random.PRNGKey(2), (2, 8, 8, 1)) * 0.3, -1, 1)
    out = eng.interpolate(params, rng, x1, x2, t=4, lam=0.5)
    assert out.shape == x1.shape
    assert jnp.isfinite(out).all()
    out2 = eng.interpolate(params, rng, x1, x2, t=4, lam=0.5)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))
    # lam=0 vs lam=1 select different blends
    o0 = eng.interpolate(params, rng, x1, x2, t=4, lam=0.0)
    o1 = eng.interpolate(params, rng, x1, x2, t=4, lam=1.0)
    assert float(jnp.abs(o0 - o1).max()) > 0


def test_interpolate_default_t_selfcond():
    eng = make_engine("uncond", self_condition=True)
    rng = jax.random.PRNGKey(0)
    params = eng.init_params(rng)
    x1 = jnp.zeros((1, 8, 8, 1))
    x2 = jnp.ones((1, 8, 8, 1)) * 0.5
    out = eng.interpolate(params, rng, x1, x2)  # t defaults to T-1
    assert out.shape == x1.shape and jnp.isfinite(out).all()


# ---------------------------------------------------- truncated sampling
def test_truncation_timestep_matches_marginal():
    import dataclasses

    from hicdiff_tpu.models.hicedrn import HicedrnDiff

    model = HicedrnDiff(self_condition=True, number_resnet=1, features=32)
    eng = GaussianDiffusion.create(
        model, image_size=16, timesteps=1000, beta_schedule="sigmoid",
        mode="cond",
    )
    t = eng.truncation_timestep(0.1)
    acp = np.asarray(jax.device_get(eng.schedule.alphas_cumprod))
    # alphas_cumprod[t] within one schedule step of 1/(1+sigma^2)
    assert abs(acp[t] - 1 / 1.01) <= np.abs(np.diff(acp)).max()
    assert 0 < t < 100  # sigma=0.1 needs only a few dozen of 1000 steps


def test_truncated_sampling_runs_and_is_near_input():
    import dataclasses

    from hicdiff_tpu.models.hicedrn import HicedrnDiff

    model = HicedrnDiff(self_condition=True, number_resnet=1, features=32)
    eng = GaussianDiffusion.create(
        model, image_size=16, timesteps=50, beta_schedule="sigmoid",
        mode="cond",
    )
    rng = jax.random.PRNGKey(0)
    params = eng.init_params(rng)
    cond = jnp.clip(
        jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 1)) * 0.3, -1, 1
    )
    t5 = dataclasses.replace(eng, t_start=5)
    out = t5.super_resolution(params, rng, cond)
    assert out.shape == cond.shape and bool(jnp.isfinite(out).all())
    # an untrained model still cannot take a 6-step chain far from its init
    assert float(jnp.abs(out - cond).mean()) < 1.0

    # DDIM over the truncated range caps K at t_start+1
    t5k = dataclasses.replace(t5, sampling_timesteps=3)
    out2 = t5k.super_resolution(params, rng, cond)
    assert out2.shape == cond.shape and bool(jnp.isfinite(out2).all())


def test_truncated_sampling_rejects_uncond():
    import dataclasses

    import pytest

    from hicdiff_tpu.models.hicedrn import HicedrnDiff

    model = HicedrnDiff(number_resnet=1, features=32)
    eng = GaussianDiffusion.create(
        model, image_size=16, timesteps=50, mode="uncond",
    )
    params = eng.init_params(jax.random.PRNGKey(0))
    bad = dataclasses.replace(eng, t_start=5)
    with pytest.raises(ValueError):
        bad.sample(params, jax.random.PRNGKey(0), 2)


# --------------------------------------------------------------- chunked scans
def test_chunked_sampler_matches_conditional_chain():
    """chunked_sampler == p_sample_loop bitwise (same rng threading; the
    segments only partition the scan's step axis)."""
    eng = make_engine(mode="cond", self_condition=True, T=11)
    key = jax.random.PRNGKey(3)
    params = eng.init_params(key)
    cond = jax.random.normal(jax.random.fold_in(key, 7), (2, 8, 8, 1))
    ref = jax.jit(lambda p, k, c: eng.super_resolution(p, k, c))(
        params, key, cond
    )
    for chunk in (4, 11, 100):
        out = eng.chunked_sampler(chunk)(params, key, cond)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_chunked_sampler_matches_uncond_chain():
    eng = make_engine(mode="uncond", self_condition=True, T=9)
    key = jax.random.PRNGKey(0)
    params = eng.init_params(key)
    shape = (2, 8, 8, 1)
    ref = eng.p_sample_loop(params, key, shape)
    out = eng.chunked_sampler(4)(params, key, shape)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_chunked_sampler_matches_truncated_chain():
    import dataclasses

    eng = dataclasses.replace(
        make_engine(mode="cond", self_condition=True, T=20), t_start=6
    )
    key = jax.random.PRNGKey(1)
    params = eng.init_params(key)
    cond = jax.random.normal(jax.random.fold_in(key, 2), (2, 8, 8, 1))
    ref = eng.super_resolution(params, key, cond)
    out = eng.chunked_sampler(4)(params, key, cond)  # segments 4 + 3
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_chunked_sampler_matches_ddim():
    eng = make_engine(
        mode="cond", self_condition=True, T=20, sampling_timesteps=7
    )
    key = jax.random.PRNGKey(5)
    params = eng.init_params(key)
    cond = jax.random.normal(jax.random.fold_in(key, 9), (2, 8, 8, 1))
    ref = eng.super_resolution(params, key, cond)  # DDIM path
    out = eng.chunked_sampler(3)(params, key, cond)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_chunked_sampler_rejects_bad_chunk():
    eng = make_engine(mode="cond", self_condition=True, T=5)
    with pytest.raises(ValueError):
        eng.chunked_sampler(0)


def test_sr3_truncated_sampling_runs():
    """t_start now extends to the sr3 engine (same exact-marginal init)."""
    import dataclasses

    eng = dataclasses.replace(
        make_engine(mode="sr3", self_condition=True, T=20), t_start=4
    )
    key = jax.random.PRNGKey(0)
    params = eng.init_params(key)
    cond = jax.random.normal(jax.random.fold_in(key, 1), (2, 8, 8, 1))
    out = eng.super_resolution(params, key, cond)
    assert out.shape == cond.shape and bool(jnp.isfinite(out).all())
    out2 = eng.chunked_sampler(3)(params, key, cond)
    np.testing.assert_array_equal(np.asarray(out2), np.asarray(out))
