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


def test_vae_latent_loss_and_training_step():
    """vae_latent_loss (vae_loss.py:25-29 semantics): zero on identical
    inputs, positive on different ones, gradients flow only through the
    output branch; and the VAE itself trains (ELBO decreases)."""
    import optax

    from hicdiff_tpu.metrics.losses import vae_latent_loss
    from hicdiff_tpu.models.vae import VAEModel

    vae = VAEModel(latent_dim=8, pre_latent=32, condensed_latent=16)
    rng = jax.random.PRNGKey(0)
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 64, 64, 1), minval=-1)
    params = vae.init(rng, x, rng)["params"]

    def encode(imgs):
        return vae.apply({"params": params}, imgs, method=VAEModel.encode)

    same = float(vae_latent_loss(encode, x, x))
    assert same == 0.0
    y = jnp.clip(x + 0.5, -1, 1)
    assert float(vae_latent_loss(encode, y, x)) > 0.0

    # target branch is stop_gradient'ed: d(loss)/d(target-as-output) == 0
    g = jax.grad(lambda out: vae_latent_loss(encode, out, x))(x)
    assert float(jnp.abs(g).max()) == 0.0

    # the VAE is genuinely trainable, not a stub
    opt = optax.adam(1e-3)

    def loss_fn(p, step_rng):
        return vae.apply({"params": p}, x, step_rng, method=VAEModel.loss)

    opt_state = opt.init(params)
    first = None
    p = params
    for i in range(20):
        loss, grads = jax.value_and_grad(loss_fn)(p, jax.random.fold_in(rng, i))
        updates, opt_state = opt.update(grads, opt_state)
        p = optax.apply_updates(p, updates)
        first = first if first is not None else float(loss)
    assert float(loss) < first


def test_ckpt_registry_resolution(tmp_path):
    """ckpt_registry (the missing src/functions/ckpt_util.py equivalent):
    known-name resolution, loud failure with candidates, zero-egress
    download contract."""
    import pytest

    from hicdiff_tpu.utils import ckpt_registry

    with pytest.raises(FileNotFoundError) as err:
        ckpt_registry.get_ckpt_path("cond_hicedrn", prefix=str(tmp_path))
    assert "candidates tried" in str(err.value)
    assert "HiCedrn_cond_l2_sig.msgpack" in str(err.value)

    wdir = tmp_path / "Model_Weights"
    wdir.mkdir()
    target = wdir / "bestg_40000_c64_s64_Human1_HiCedrn_cond_l2_sig.msgpack"
    target.write_bytes(b"x")
    assert ckpt_registry.get_ckpt_path(
        "cond_hicedrn", prefix=str(tmp_path)
    ) == str(target)

    # unknown names resolve as ad-hoc relative paths
    assert ckpt_registry.get_ckpt_path(
        "Model_Weights/bestg_40000_c64_s64_Human1_HiCedrn_cond_l2_sig.msgpack",
        prefix=str(tmp_path),
    ) == str(target)

    # download: pre-placed file satisfies; md5 checked; missing file raises
    import hashlib

    md5 = hashlib.md5(b"x").hexdigest()
    assert ckpt_registry.download("http://nowhere", str(target), md5) == str(
        target
    )
    with pytest.raises(ValueError):
        ckpt_registry.download("http://nowhere", str(target), "0" * 32)
    with pytest.raises(FileNotFoundError):
        ckpt_registry.download("http://nowhere", str(tmp_path / "absent"))
