"""Loss-library tests: TV loss vs torch formula, composite weighting."""
import jax
import jax.numpy as jnp
import numpy as np
import torch

from hicdiff_tpu.metrics.losses import (
    VGGFeatures,
    deephic_generator_loss,
    feature_reconstruction_loss,
    hiedsr_gan_generator_loss,
    hiedsr_generator_loss,
    tv_loss,
)


def torch_tv(x, w=1.0):
    b, c, h, wd = x.shape
    count_h = c * (h - 1) * wd
    count_w = c * h * (wd - 1)
    h_tv = torch.pow(x[:, :, 1:, :] - x[:, :, : h - 1, :], 2).sum()
    w_tv = torch.pow(x[:, :, :, 1:] - x[:, :, :, : wd - 1], 2).sum()
    return w * 2 * (h_tv / count_h + w_tv / count_w) / b


def test_tv_loss_matches_torch():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(3, 1, 16, 16)).astype(np.float32)
    ref = torch_tv(torch.from_numpy(x)).item()
    ours = float(tv_loss(np.transpose(x, (0, 2, 3, 1))))
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def _vgg_apply():
    net = VGGFeatures("vgg19_35")
    x0 = jnp.zeros((1, 64, 64, 1))
    params = net.init(jax.random.PRNGKey(0), x0)
    return lambda x: net.apply(params, x)


def test_hiedsr_losses_composite():
    rng = jax.random.PRNGKey(1)
    out = jax.random.normal(rng, (2, 64, 64, 1)) * 0.1
    tgt = jnp.zeros_like(out)
    vgg = _vgg_apply()
    img, per, tv, total = hiedsr_generator_loss(vgg, out, tgt)
    np.testing.assert_allclose(
        float(total), float(img) + 0.001 * float(per) + 2e-8 * float(tv), rtol=1e-6
    )
    labels = jnp.array([0.3, 0.7])
    img2, per2, tv2, total2 = hiedsr_gan_generator_loss(vgg, labels, out, tgt)
    np.testing.assert_allclose(
        float(total2),
        float(img2) + 0.001 * float(per2) + 2e-8 * float(tv2) + 2e-3 * float(jnp.mean(1 - labels)),
        rtol=1e-6,
    )
    total3 = deephic_generator_loss(vgg, labels, out, tgt)
    assert np.isfinite(float(total3))


def test_vgg_feature_shapes():
    net = VGGFeatures("vgg19_35")
    x = jnp.zeros((1, 64, 64, 1))
    params = net.init(jax.random.PRNGKey(0), x)
    feat = net.apply(params, x)
    # vgg19[:35] on 64x64: 4 maxpools -> 4x4 spatial, 512 channels
    assert feat.shape == (1, 4, 4, 512)
    net16 = VGGFeatures("vgg16_31")
    params16 = net16.init(jax.random.PRNGKey(0), x)
    assert net16.apply(params16, x).shape == (1, 4, 4, 512)


def test_feature_reconstruction_loss():
    fn = lambda x: [x * 2.0, x[:, ::2] * 3.0]
    a = jnp.ones((2, 8, 8, 1))
    b = jnp.zeros_like(a)
    val = float(feature_reconstruction_loss(fn, a, b))
    np.testing.assert_allclose(val, 4.0 + 9.0, rtol=1e-6)
    assert float(feature_reconstruction_loss(fn, a, a)) == 0.0
