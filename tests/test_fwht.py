"""FWHT: matmul formulation must equal the reference-shaped butterfly."""
import jax
import jax.numpy as jnp
import numpy as np

from hicdiff_tpu.kernels.fwht import fwht_butterfly, fwht_matmul, hadamard_matrix


def test_hadamard_orthogonality():
    h = np.asarray(hadamard_matrix(64))
    np.testing.assert_allclose(h @ h.T, 64 * np.eye(64), atol=1e-4)


def test_matmul_equals_butterfly():
    key = jax.random.PRNGKey(0)
    for dim in (8, 64):
        x = jax.random.normal(key, (3, 1, dim * dim))
        a = np.asarray(fwht_matmul(x, dim))
        b = np.asarray(fwht_butterfly(x, dim))
        np.testing.assert_allclose(a, b, atol=1e-3, rtol=1e-4)


def test_fwht_involution():
    key = jax.random.PRNGKey(1)
    x = jax.random.normal(key, (2, 64))
    y = fwht_matmul(fwht_matmul(x, 8), 8)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-4)
