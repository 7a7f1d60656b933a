"""Schedule parity tests: our float64-numpy schedules must match the torch float64
reference formulas (src/hicdiff.py:396-430) bit-for-bit after the fp32 cast."""
import numpy as np
import pytest
import torch

from hicdiff_tpu.diffusion.schedules import (
    cosine_beta_schedule,
    get_beta_schedule,
    linear_beta_schedule,
    make_schedule,
    sigmoid_beta_schedule,
)


def torch_linear(timesteps):
    scale = 1000 / timesteps
    return torch.linspace(scale * 0.0001, scale * 0.02, timesteps, dtype=torch.float64)


def torch_cosine(timesteps, s=0.008):
    steps = timesteps + 1
    t = torch.linspace(0, timesteps, steps, dtype=torch.float64) / timesteps
    ac = torch.cos((t + s) / (1 + s) * np.pi * 0.5) ** 2
    ac = ac / ac[0]
    betas = 1 - (ac[1:] / ac[:-1])
    return torch.clip(betas, 0, 0.999)


def torch_sigmoid(timesteps, start=-3, end=3, tau=1):
    steps = timesteps + 1
    t = torch.linspace(0, timesteps, steps, dtype=torch.float64) / timesteps
    v_start = torch.tensor(start / tau).sigmoid()
    v_end = torch.tensor(end / tau).sigmoid()
    ac = (-((t * (end - start) + start) / tau).sigmoid() + v_end) / (v_end - v_start)
    ac = ac / ac[0]
    betas = 1 - (ac[1:] / ac[:-1])
    return torch.clip(betas, 0, 0.999)


@pytest.mark.parametrize("T", [10, 100, 1000])
def test_linear_matches_torch(T):
    ours = linear_beta_schedule(T)
    ref = torch_linear(T).numpy()
    np.testing.assert_allclose(ours, ref, rtol=0, atol=1e-15)


@pytest.mark.parametrize("T", [10, 1000])
def test_cosine_matches_torch(T):
    np.testing.assert_allclose(
        cosine_beta_schedule(T), torch_cosine(T).numpy(), rtol=1e-12, atol=1e-15
    )


@pytest.mark.parametrize("T", [10, 1000])
def test_sigmoid_matches_torch(T):
    # torch.tensor(start/tau).sigmoid() is computed in float32 in the reference; our
    # float64 version differs at ~1e-8 relative — well inside fp32 buffer precision.
    np.testing.assert_allclose(
        sigmoid_beta_schedule(T), torch_sigmoid(T).numpy(), rtol=1e-6, atol=1e-9
    )


def test_derived_constants_match_torch_pipeline():
    T = 1000
    betas = torch_linear(T)
    alphas = 1.0 - betas
    ac = torch.cumprod(alphas, dim=0)
    ac_prev = torch.nn.functional.pad(ac[:-1], (1, 0), value=1.0)
    posterior_variance = betas * (1.0 - ac_prev) / (1.0 - ac)

    s = make_schedule("linear", T)
    np.testing.assert_array_equal(np.asarray(s.betas), betas.to(torch.float32).numpy())
    np.testing.assert_array_equal(
        np.asarray(s.alphas_cumprod), ac.to(torch.float32).numpy()
    )
    np.testing.assert_array_equal(
        np.asarray(s.posterior_variance), posterior_variance.to(torch.float32).numpy()
    )
    np.testing.assert_array_equal(
        np.asarray(s.posterior_mean_coef1),
        (betas * torch.sqrt(ac_prev) / (1.0 - ac)).to(torch.float32).numpy(),
    )
    np.testing.assert_array_equal(
        np.asarray(s.posterior_log_variance_clipped),
        torch.log(posterior_variance.clamp(min=1e-20)).to(torch.float32).numpy(),
    )
    # sr3's double-padded sqrt alpha-bar prev (hicdiff_sr3.py:536):
    # sqrt([1, 1, acp0, ..., acp(T-2)]) — length T+1, starts with two 1s
    sq_prev = np.asarray(s.sqrt_alphas_cumprod_prev)
    ref_prev = torch.sqrt(
        torch.nn.functional.pad(ac_prev, (1, 0), value=1.0)
    ).to(torch.float32)
    assert sq_prev.shape == (T + 1,)
    assert sq_prev[0] == 1.0 and sq_prev[1] == 1.0
    np.testing.assert_allclose(sq_prev, ref_prev.numpy(), atol=1e-7)


def test_ddrm_beta_schedules():
    for name in ["quad", "linear", "const", "jsd", "sigmoid"]:
        betas = get_beta_schedule(
            name, beta_start=0.0001, beta_end=0.02, num_diffusion_timesteps=1000
        )
        assert betas.shape == (1000,)
        assert np.all(betas > 0) and np.all(betas <= 1.0)
    lin = get_beta_schedule(
        "linear", beta_start=0.0001, beta_end=0.02, num_diffusion_timesteps=1000
    )
    np.testing.assert_allclose(lin[0], 0.0001)
    np.testing.assert_allclose(lin[-1], 0.02)
