"""Pallas fused posterior step: interpret-mode correctness vs the pure-JAX math."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hicdiff_tpu.kernels.sample_step import fused_posterior_step


def reference_step(x, eps, a, b, c1, c2, logvar, gate, z):
    x0 = jnp.clip(a * x - b * eps, -1, 1)
    mean = c1 * x0 + c2 * x
    return mean + jnp.exp(0.5 * logvar) * gate * z, x0


@pytest.mark.skipif(
    bool(__import__("os").environ.get("HICDIFF_TEST_TPU")),
    reason="interpret-mode pallas_call hangs on the remote TPU backend; "
    "this closed-form check is the CPU-suite variant",
)
def test_fused_step_deterministic_parts():
    """With gate=0 (t==0, no noise) the kernel must match the closed form."""
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (4, 16, 16, 1))
    eps = jax.random.normal(jax.random.fold_in(key, 1), x.shape)
    a, b, c1, c2, logvar = 1.1, 0.5, 0.7, 0.3, -2.0
    out, x0 = fused_posterior_step(
        x, eps, a, b, c1, c2, logvar, 0.0, 123, interpret=True
    )
    ref_out, ref_x0 = reference_step(x, eps, a, b, c1, c2, logvar, 0.0, 0.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out), atol=1e-5)
    np.testing.assert_allclose(np.asarray(x0), np.asarray(ref_x0), atol=1e-5)


@pytest.mark.skipif(
    not __import__("os").environ.get("HICDIFF_TEST_TPU"),
    reason="the Pallas TPU interpreter stubs prng_random_bits to zeros; "
    "noise statistics only measurable on real hardware",
)
def test_fused_step_noise_statistics():
    """With gate=1 the residual (out - mean) must be N(0, sigma^2).

    Runs the COMPILED kernel (interpret=False): the interpreter stubs
    prng_random_bits to zeros, so the statistics only exist on hardware."""
    key = jax.random.PRNGKey(2)
    x = jax.random.normal(key, (64, 32, 32, 1))
    eps = jnp.zeros_like(x)
    a, b, c1, c2, logvar = 1.0, 0.0, 0.0, 0.0, 2 * np.log(0.5)  # sigma = 0.5
    out, x0 = fused_posterior_step(
        x, eps, a, b, c1, c2, logvar, 1.0, 7
    )
    # mean = c1*x0 + c2*x = 0, so out IS the noise
    noise = np.asarray(out).ravel()
    assert abs(noise.mean()) < 0.01
    np.testing.assert_allclose(noise.std(), 0.5, atol=0.01)
    # seeded: same seed reproduces
    out2, _ = fused_posterior_step(
        x, eps, a, b, c1, c2, logvar, 1.0, 7
    )
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))
    # different seed differs
    out3, _ = fused_posterior_step(
        x, eps, a, b, c1, c2, logvar, 1.0, 8
    )
    assert not np.array_equal(np.asarray(out), np.asarray(out3))
