"""DDRM sampler tests (denoising.py parity semantics)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hicdiff_tpu.degrade.operators import make_operator
from hicdiff_tpu.diffusion.schedules import get_beta_schedule
from hicdiff_tpu.sampling.ddrm import ddrm_sample, efficient_generalized_steps


def zero_model(x, t):
    return jnp.zeros_like(x)


BETAS = jnp.asarray(
    get_beta_schedule(
        "linear", beta_start=0.0001, beta_end=0.02, num_diffusion_timesteps=100
    ),
    dtype=jnp.float32,
)


@pytest.mark.parametrize("deg", ["deno", "sr2", "deblur_uni", "inp_mask", "cs4"])
def test_ddrm_runs_all_operators(deg):
    op = make_operator(deg, image_channel=1, image_size=8)
    key = jax.random.PRNGKey(0)
    x0 = jnp.clip(jax.random.normal(key, (2, 8, 8, 1)) * 0.3, -1, 1)
    y0 = op.H(x0)
    xf, x0f = ddrm_sample(
        key, zero_model, op, y0, sigma_0=0.1, betas=BETAS,
        timestep=20, num_timesteps=100, image_size=8, channels=1,
    )
    assert xf.shape == (2, 8, 8, 1)
    assert np.isfinite(np.asarray(xf)).all()
    assert np.isfinite(np.asarray(x0f)).all()


def test_ddrm_denoising_tracks_measurement():
    """With identity H, etaB=1 pins observed directions to the measurement during
    the chain; with a zero-noise model the final x0 equals the last xt/sqrt(at),
    which should stay close to y0 for small sigma."""
    op = make_operator("deno", image_channel=1, image_size=8)
    key = jax.random.PRNGKey(1)
    x0 = jnp.clip(jax.random.normal(key, (4, 8, 8, 1)) * 0.3, -1, 1)
    y0 = op.H(x0) + 0.05 * jax.random.normal(jax.random.fold_in(key, 1), (4, 64))
    xf, _ = ddrm_sample(
        key, zero_model, op, y0, sigma_0=0.05, betas=BETAS,
        timestep=100, num_timesteps=100, image_size=8, channels=1,
    )
    err = np.abs(np.asarray(xf).reshape(4, -1) - np.asarray(y0)).mean()
    assert err < 0.2, f"DDRM(deno) drifted from measurement: {err}"


def test_ddrm_is_jittable_and_deterministic():
    op = make_operator("deno", image_channel=1, image_size=8)
    key = jax.random.PRNGKey(2)
    y0 = jax.random.normal(key, (2, 64))

    f = jax.jit(
        lambda k, y: ddrm_sample(
            k, zero_model, op, y, sigma_0=0.1, betas=BETAS,
            timestep=20, num_timesteps=100, image_size=8, channels=1,
        )[0]
    )
    a = f(key, y0)
    b = f(key, y0)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_chunked_ddrm_matches_one_shot():
    """make_chunked_ddrm_sampler == ddrm_sample bitwise for any chunk size."""
    from hicdiff_tpu.sampling.ddrm import make_chunked_ddrm_sampler

    h_funcs = make_operator("deno", image_channel=1, image_size=8)
    betas = jnp.asarray(
        get_beta_schedule("linear", beta_start=1e-4, beta_end=0.02,
                          num_diffusion_timesteps=20),
        jnp.float32,
    )
    model_fn = lambda x, t: x * 0.1
    key = jax.random.PRNGKey(2)
    y = jax.random.normal(jax.random.fold_in(key, 1), (2, 8, 8, 1))
    ref = ddrm_sample(
        key, model_fn, h_funcs, y, 0.1, betas=betas, timestep=20,
        num_timesteps=20, image_size=8,
    )[0]
    for chunk in (7, 20, 64):
        fn = make_chunked_ddrm_sampler(
            model_fn, h_funcs, 0.1, betas=betas, timestep=20,
            num_timesteps=20, chunk_steps=chunk, image_size=8,
        )
        np.testing.assert_array_equal(np.asarray(fn(key, y)), np.asarray(ref))


def test_ddrm_truncation_timestep_rule():
    """t* is the smallest timestep whose chain noise STRICTLY exceeds the
    measurement's (the init mask `s*sigma > sigma_0`, denoising.py:24, falls
    back to pure noise at equality)."""
    from hicdiff_tpu.diffusion.schedules import get_beta_schedule
    from hicdiff_tpu.sampling.ddrm import ddrm_truncation_timestep

    betas = np.asarray(
        get_beta_schedule("linear", beta_start=1e-4, beta_end=0.02,
                          num_diffusion_timesteps=1000),
        np.float64,
    )
    acp = np.cumprod(1.0 - betas)
    sig = np.sqrt(1.0 - acp) / np.sqrt(acp)
    prev = -1
    for s0 in (0.01, 0.1, 0.5, 1.0):
        t = ddrm_truncation_timestep(betas, s0)
        assert sig[t] > s0, (s0, t)
        if t:
            assert sig[t - 1] <= s0, (s0, t)
        assert t > prev  # monotone in sigma_0
        prev = t
    # measurement noisier than the whole schedule -> full chain
    assert ddrm_truncation_timestep(betas, 1e9) == 999
    # smaller operator singulars raise the required chain noise level
    assert (ddrm_truncation_timestep(betas, 0.1, singulars_min=0.5)
            > ddrm_truncation_timestep(betas, 0.1))


def test_ddrm_auto_t_start_nullspace_guard():
    """Auto truncation applies only to full-rank operators. For sr/cs/inp the
    spectral init (denoising.py:24-39) places the unobserved directions at
    sigma(t*) noise around ZERO — the skipped high-noise steps are exactly
    where the prior synthesizes their content — so `auto` must return None
    (run the full chain) rather than a t* that silently degrades them."""
    from hicdiff_tpu.sampling.ddrm import (
        ddrm_auto_t_start,
        ddrm_truncation_timestep,
    )

    dim = 8 * 8
    deno = make_operator("deno", image_channel=1, image_size=8)
    assert ddrm_auto_t_start(deno, BETAS, 0.1, image_dim=dim) == \
        ddrm_truncation_timestep(BETAS, 0.1)
    # the sigma floor (sigma_0=0 divides in the init's case A) is built in
    assert ddrm_auto_t_start(deno, BETAS, 0.0, image_dim=dim) == \
        ddrm_truncation_timestep(BETAS, 1e-4)
    for deg in ("sr2", "inp_mask", "cs4"):
        op = make_operator(deg, image_channel=1, image_size=8)
        assert ddrm_auto_t_start(op, BETAS, 0.1, image_dim=dim) is None, deg
    # deblur is image-sized but its kernel spectrum may touch zero/negative:
    # either a valid (int) t* or the None fallback is sound — never a crash
    blur = make_operator("deblur_uni", image_channel=1, image_size=8)
    r = ddrm_auto_t_start(blur, BETAS, 0.1, image_dim=dim)
    assert r is None or (isinstance(r, int) and 0 <= r < len(BETAS))


def test_truncated_seq_ends_exactly_at_t_start():
    from hicdiff_tpu.sampling.ddrm import _build_seq

    # default: the reference grid (metrics_diff.py:216-217)
    assert _build_seq(100, 20) == list(range(0, 100, 5))
    assert _build_seq(1000, 1000) == list(range(1000))
    # truncated: covers [0, t_start], last element EXACTLY t_start
    assert _build_seq(1000, 1000, t_start=27) == list(range(28))
    short = _build_seq(1000, 10, t_start=27)
    assert short[0] == 0 and short[-1] == 27 and len(short) <= 11
    # t_start below the step count: every step, still ends at t_start
    assert _build_seq(1000, 100, t_start=3) == [0, 1, 2, 3]
    with pytest.raises(ValueError):
        _build_seq(1000, 10, t_start=1000)


def test_truncated_chunked_matches_oneshot():
    """The chunked truncated chain is bitwise identical to the one-shot
    truncated chain (same guarantee the full-range forms have)."""
    from hicdiff_tpu.diffusion.schedules import get_beta_schedule
    from hicdiff_tpu.sampling.ddrm import make_chunked_ddrm_sampler

    h_funcs = make_operator("deno", image_channel=1, image_size=8)
    betas = jnp.asarray(
        get_beta_schedule("linear", beta_start=1e-4, beta_end=0.02,
                          num_diffusion_timesteps=50),
        jnp.float32,
    )
    model_fn = lambda x, t: x * 0.1
    key = jax.random.PRNGKey(5)
    y = jax.random.normal(jax.random.fold_in(key, 1), (2, 8, 8, 1))
    ref = ddrm_sample(
        key, model_fn, h_funcs, y, 0.1, betas=betas, timestep=50,
        num_timesteps=50, image_size=8, t_start=13,
    )[0]
    for chunk in (4, 14, 64):
        fn = make_chunked_ddrm_sampler(
            model_fn, h_funcs, 0.1, betas=betas, timestep=50,
            num_timesteps=50, chunk_steps=chunk, image_size=8, t_start=13,
        )
        np.testing.assert_array_equal(np.asarray(fn(key, y)), np.asarray(ref))


def test_truncated_ddrm_tracks_measurement():
    """The exact-marginal truncated chain (init = the measurement at its true
    noise level, PARITY #33 scaling) stays near y for identity H at small
    sigma — the quality property the full chain has, at ~t*+1 forwards."""
    from hicdiff_tpu.sampling.ddrm import ddrm_truncation_timestep

    op = make_operator("deno", image_channel=1, image_size=8)
    key = jax.random.PRNGKey(6)
    x0 = jnp.clip(jax.random.normal(key, (4, 8, 8, 1)) * 0.3, -1, 1)
    y0 = op.H(x0) + 0.05 * jax.random.normal(jax.random.fold_in(key, 1), (4, 64))
    ts = ddrm_truncation_timestep(BETAS, 0.05)
    assert ts < 50  # the 100-step test schedule truncates hard at sigma=0.05
    xf, _ = ddrm_sample(
        key, zero_model, op, y0, sigma_0=0.05, betas=BETAS,
        timestep=100, num_timesteps=100, image_size=8, channels=1,
        t_start=ts,
    )
    err = np.abs(np.asarray(xf).reshape(4, -1) - np.asarray(y0)).mean()
    assert err < 0.2, f"truncated DDRM(deno) drifted from measurement: {err}"


def test_chunked_ddrm_sharded_matches_unsharded():
    """The -u 1 headline path's 8-way data parallelism as a TEST, not an
    architecture claim: the chunked DDRM chain over a mesh-sharded
    measurement batch (replicated params, batch split across all 8 virtual
    devices — inference.py:300-328's layout) must reproduce the unsharded
    chain."""
    from hicdiff_tpu.models.hicedrn import HicedrnDiff
    from hicdiff_tpu.parallel.mesh import data_sharding, make_mesh, replicate
    from hicdiff_tpu.sampling.ddrm import make_chunked_ddrm_sampler

    model = HicedrnDiff(self_condition=False, number_resnet=2, features=32)
    key = jax.random.PRNGKey(3)
    params = model.init(
        key, jnp.zeros((1, 8, 8, 1)), jnp.zeros((1,), jnp.int32), None
    )["params"]
    op = make_operator("deno", image_channel=1, image_size=8)
    x0 = jnp.clip(jax.random.normal(key, (16, 8, 8, 1)) * 0.3, -1, 1)
    y0 = op.H(x0).reshape(16, 8, 8, 1)

    def make(params_in):
        inner = lambda x, t: model.apply({"params": params_in}, x, t, None)
        return make_chunked_ddrm_sampler(
            inner, op, 0.1, betas=BETAS, timestep=10, num_timesteps=100,
            chunk_steps=4, image_size=8, channels=1,
        )

    ref = np.asarray(make(params)(key, jnp.asarray(y0)))

    mesh = make_mesh()
    assert mesh.devices.size == 8
    params_repl = replicate(mesh, params)
    y_sharded = jax.device_put(jnp.asarray(y0), data_sharding(mesh))
    out_dev = make(params_repl)(key, y_sharded)
    # the restoration stays sharded across the mesh (no silent gather)
    assert len(set(out_dev.devices())) == 8
    np.testing.assert_allclose(np.asarray(out_dev), ref, atol=2e-5, rtol=0)
