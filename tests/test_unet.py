"""Attention U-Net structural tests: shapes, parameter count parity (analytic vs
the torch reference architecture at hicdiff.py:255-387)."""
import jax
import jax.numpy as jnp
import numpy as np

from hicdiff_tpu.models.unet import Unet


def n_params(params):
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))


def test_unet_shapes():
    model = Unet(dim=32, dim_mults=(1, 2), channels=1)
    x = jnp.zeros((2, 16, 16, 1))
    t = jnp.zeros((2,), dtype=jnp.int32)
    params = model.init(jax.random.PRNGKey(0), x, t, None)["params"]
    out = model.apply({"params": params}, x, t, None)
    assert out.shape == (2, 16, 16, 1)
    assert np.isfinite(np.asarray(out)).all()


def test_unet_self_condition():
    model = Unet(dim=32, dim_mults=(1, 2), channels=1, self_condition=True)
    x = jnp.zeros((2, 16, 16, 1))
    t = jnp.zeros((2,), dtype=jnp.int32)
    cond = jnp.ones_like(x)
    params = model.init(jax.random.PRNGKey(0), x, t, cond)["params"]
    out = model.apply({"params": params}, x, t, cond)
    assert out.shape == (2, 16, 16, 1)


def test_unet_param_count_matches_torch_reference():
    """Analytic param count of the torch Unet(dim=64, mults=(1,2,4,8), ch=1)."""
    conv = lambda cin, cout, k: cin * cout * k * k + cout
    conv_nb = lambda cin, cout, k: cin * cout * k * k  # no bias
    lin = lambda fin, fout: fin * fout + fout
    gn = lambda c: 2 * c
    ln = lambda c: c  # our LayerNorm has scale only (hicdiff.py:99-108)

    def block(cin, cout):
        # WSConv (conv w/ bias) + GroupNorm
        return conv(cin, cout, 3) + gn(cout)

    def resblock(cin, cout, time_dim):
        p = lin(time_dim, cout * 2) + block(cin, cout) + block(cout, cout)
        if cin != cout:
            p += conv(cin, cout, 1)
        return p

    def linattn(c):
        hidden = 128
        # prenorm + to_qkv + to_out conv + to_out LayerNorm
        return ln(c) + conv_nb(c, hidden * 3, 1) + conv(hidden, c, 1) + ln(c)

    def attn(c):
        hidden = 128
        return ln(c) + conv_nb(c, hidden * 3, 1) + conv(hidden, c, 1)

    dim = 64
    time_dim = 256
    dims = [64, 64, 128, 256, 512]
    in_out = list(zip(dims[:-1], dims[1:]))
    total = conv(1, 64, 7)  # init conv
    total += lin(64, 256) + lin(256, 256)  # time mlp
    for ind, (din, dout) in enumerate(in_out):
        is_last = ind == len(in_out) - 1
        total += resblock(din, din, time_dim) * 2 + linattn(din)
        total += conv(din, dout, 3) if is_last else conv(din * 4, dout, 1)
    total += resblock(512, 512, time_dim) * 2 + attn(512)
    for ind, (din, dout) in enumerate(reversed(in_out)):
        is_last = ind == len(in_out) - 1
        total += resblock(dout + din, dout, time_dim) * 2 + linattn(dout)
        total += conv(dout, din, 3)
    total += resblock(dim * 2, dim, time_dim) + conv(dim, 1, 1)

    model = Unet(dim=64, dim_mults=(1, 2, 4, 8), channels=1)
    x = jnp.zeros((1, 64, 64, 1))
    t = jnp.zeros((1,), dtype=jnp.int32)
    params = model.init(jax.random.PRNGKey(0), x, t, None)["params"]
    assert n_params(params) == total


def test_unet_sr3_noise_level():
    model = Unet(dim=32, dim_mults=(1, 2), channels=1, noise_level_emb=True)
    x = jnp.zeros((2, 16, 16, 1))
    level = jnp.array([0.5, 0.9])
    params = model.init(jax.random.PRNGKey(0), x, level, None)["params"]
    out = model.apply({"params": params}, x, level, None)
    assert out.shape == (2, 16, 16, 1)


def test_unet_bf16_gradients():
    """bf16 compute must be differentiable (the backward conv dtype bug)."""
    import jax.numpy as jnp

    from hicdiff_tpu.diffusion.gaussian import GaussianDiffusion

    model = Unet(dim=16, dim_mults=(1, 2), self_condition=True, dtype=jnp.bfloat16)
    eng = GaussianDiffusion.create(
        model, image_size=16, timesteps=8, beta_schedule="cosine",
        mode="cond", loss_type="l2",
    )
    key = jax.random.PRNGKey(0)
    params = eng.init_params(key)
    x = jax.random.normal(key, (2, 16, 16, 1))
    loss, grads = jax.value_and_grad(
        lambda p: eng.p_losses(p, key, (x * 0.5, x))
    )(params)
    assert np.isfinite(float(loss))
    assert all(np.isfinite(np.asarray(g)).all() for g in jax.tree.leaves(grads))
