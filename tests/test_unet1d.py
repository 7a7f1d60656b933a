"""1-D engine + Unet1D tests (hicdiff_1d parity)."""
import jax
import jax.numpy as jnp
import numpy as np

from hicdiff_tpu.diffusion.gaussian import GaussianDiffusion
from hicdiff_tpu.models.unet1d import Unet1D


def test_unet1d_shapes():
    model = Unet1D(dim=16, dim_mults=(1, 2), channels=1)
    x = jnp.zeros((2, 32, 1))
    t = jnp.zeros((2,), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), x, t, None)["params"]
    out = model.apply({"params": params}, x, t, None)
    assert out.shape == (2, 32, 1)


def test_engine_1d_sample_and_loss():
    model = Unet1D(dim=16, dim_mults=(1, 2), channels=1)
    eng = GaussianDiffusion.create(
        model, image_size=32, timesteps=5, loss_type="l2",
        beta_schedule="cosine", mode="uncond", seq_length=32,
    )
    key = jax.random.PRNGKey(0)
    params = eng.init_params(key)
    x = jax.random.normal(jax.random.fold_in(key, 1), (4, 32, 1))
    loss = eng.p_losses(params, key, x)
    assert np.isfinite(float(loss))
    out = eng.sample(params, key, batch_size=2)
    assert out.shape == (2, 32, 1)
    assert np.isfinite(np.asarray(out)).all()
