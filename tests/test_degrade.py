"""Degradation operator tests: orthogonality, adjointness, pinv identities and
behavioral ground truths (SURVEY.md §4: unit tests for H-ops adjointness)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hicdiff_tpu.degrade.operators import (
    Deblurring,
    Deblurring2D,
    Denoising,
    GeneralH,
    Inpainting,
    SuperResolution,
    WalshHadamardCS,
    make_operator,
)

KEY = jax.random.PRNGKey(0)


def rand(shape):
    return jax.random.normal(KEY, shape, dtype=jnp.float32)


def check_orthogonal(op, dim, b=3, atol=1e-4):
    """V and U must be orthogonal: Vt(V(x)) == x, Ut(U(y)) == y."""
    x = rand((b, dim))
    np.testing.assert_allclose(
        np.asarray(op.Vt(op.V(x))), np.asarray(x), atol=atol, rtol=1e-4
    )
    m = op.singulars().shape[0]
    # U acts on the small space but most impls accept padded vectors; use H's
    # output dim via H of a test vector
    y = op.H(rand((b, dim)))
    np.testing.assert_allclose(
        np.asarray(op.Ut(op.U(y))), np.asarray(y), atol=atol, rtol=1e-4
    )


def check_pinv(op, dim, b=2, atol=1e-3):
    """H(H_pinv(H(x))) == H(x) — the Moore-Penrose identity actually exercised by
    the prep pipeline (PrepareData_linear.py:205)."""
    x = rand((b, dim))
    hx = op.H(x)
    hph = op.H(op.H_pinv(hx))
    np.testing.assert_allclose(np.asarray(hph), np.asarray(hx), atol=atol, rtol=1e-3)


def test_denoising_identity():
    op = Denoising(1, 8)
    x = rand((2, 64))
    np.testing.assert_array_equal(np.asarray(op.H(x)), np.asarray(x))
    np.testing.assert_array_equal(np.asarray(op.H_pinv(x)), np.asarray(x))
    check_orthogonal(op, 64)


def test_inpainting_masks_pixels():
    missing = np.array([0, 5, 17, 33])
    op = Inpainting(1, 8, missing)
    x = rand((2, 64))
    y = op.H(x)
    assert y.shape == (2, 64 - 4)
    # H keeps exactly the kept pixels in kept order
    kept = np.setdiff1d(np.arange(64), missing)
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(x)[:, kept], atol=1e-5
    )
    # pinv restores kept pixels, zeros missing
    rec = np.asarray(op.H_pinv(y))
    np.testing.assert_allclose(rec[:, kept], np.asarray(x)[:, kept], atol=1e-5)
    np.testing.assert_allclose(rec[:, missing], 0.0, atol=1e-6)
    check_orthogonal(op, 64)
    check_pinv(op, 64)


def test_super_resolution_is_patch_average():
    op = SuperResolution(1, 8, 2)
    img = rand((2, 1, 8, 8))
    y = op.H(img)
    assert y.shape == (2, 16)
    ref = np.asarray(img).reshape(2, 4, 2, 4, 2).mean(axis=(2, 4)).reshape(2, 16)
    # singular ordering means y may be +- patch average depending on SVD sign; H
    # applies U s Vt so the composite is exactly the averaging matrix
    np.testing.assert_allclose(np.asarray(y), ref, atol=1e-4)
    check_orthogonal(op, 64)
    check_pinv(op, 64)


def test_deblurring_matches_conv_matrix():
    kernel = np.array([0.25, 0.5, 0.25])
    op = Deblurring(kernel, 1, 8)
    img = rand((1, 1, 8, 8))
    y = np.asarray(op.H(img)).reshape(8, 8)
    # ground truth: H_small @ img @ H_small^T
    from hicdiff_tpu.degrade.operators import _conv_matrix

    Hm = _conv_matrix(kernel, 8)
    ref = Hm @ np.asarray(img)[0, 0] @ Hm.T
    np.testing.assert_allclose(y, ref, atol=1e-4)
    check_orthogonal(op, 64)
    check_pinv(op, 64)


def test_deblurring2d():
    k1 = np.array([0.25, 0.5, 0.25])
    k2 = np.array([0.1, 0.8, 0.1])
    op = Deblurring2D(k1, k2, 1, 8)
    img = rand((1, 1, 8, 8))
    from hicdiff_tpu.degrade.operators import _conv_matrix

    H1 = _conv_matrix(k1, 8)
    H2 = _conv_matrix(k2, 8)
    ref = H1 @ np.asarray(img)[0, 0] @ H2.T
    np.testing.assert_allclose(
        np.asarray(op.H(img)).reshape(8, 8), ref, atol=1e-4
    )
    check_orthogonal(op, 64)


def test_walsh_hadamard_orthogonal():
    rng = np.random.default_rng(3)
    op = WalshHadamardCS(1, 8, 4, rng.permutation(64))
    check_orthogonal(op, 64)
    x = rand((2, 64))
    y = op.H(x)
    assert y.shape == (2, 16)  # compressed by 4
    check_pinv(op, 64)


def test_general_h():
    rng = np.random.default_rng(0)
    H = rng.normal(size=(16, 64))
    op = GeneralH(H)
    x = rand((2, 64))
    np.testing.assert_allclose(
        np.asarray(op.H(x)), np.asarray(x) @ H.T.astype(np.float32), atol=1e-3
    )
    check_pinv(op, 64)


@pytest.mark.parametrize(
    "deg",
    ["deno", "inp_mask", "sr2", "sr_bicubic2", "deblur_uni", "deblur_gauss",
     "deblur_aniso", "cs4"],
)
def test_factory_all_degradations(deg):
    op = make_operator(deg, image_channel=1, image_size=8)
    x = rand((2, 64))
    y = op.H(x)
    assert np.isfinite(np.asarray(y)).all()
    rec = op.H_pinv(y)
    assert rec.shape == (2, 64)
    assert np.isfinite(np.asarray(rec)).all()


def test_factory_rejects_unknown():
    with pytest.raises(ValueError):
        make_operator("nonsense")
