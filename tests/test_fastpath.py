"""Fused Pallas ResnetBlock fast path vs the flax reference path.

The kernel (kernels/resblock.py) and driver (models/fastpath.py) must be
numerically interchangeable with HicedrnResBlock / HicedrnDiff
(models/hicedrn.py:44-64,134-192 — themselves pinned to
/root/reference/src/model/hicedrn_Diff.py by tests/test_torch_convert.py), so
samplers can swap paths without touching checkpoints.
"""
import jax
import jax.numpy as jnp
import pytest

from hicdiff_tpu.kernels.resblock import fused_resblock
from hicdiff_tpu.models.fastpath import FusedHicedrn, hicedrn_fused_forward
from hicdiff_tpu.models.hicedrn import HicedrnDiff, HicedrnResBlock


def _block_scale_shift(p, temb):
    te = (
        jax.nn.silu(temb) @ p["Dense_0"]["Dense_0"]["kernel"]
        + p["Dense_0"]["Dense_0"]["bias"]
    )
    return jnp.split(te, 2, axis=-1)


@pytest.mark.parametrize("shape", [(2, 64, 64, 256), (1, 16, 16, 256)])
def test_fused_resblock_matches_flax(shape):
    blk = HicedrnResBlock(features=shape[-1])
    x = jax.random.normal(jax.random.PRNGKey(1), shape, jnp.float32) * 0.5
    temb = jax.random.normal(jax.random.PRNGKey(2), (shape[0], 1024), jnp.float32)
    p = blk.init(jax.random.PRNGKey(0), x, temb)["params"]
    ref = blk.apply({"params": p}, x, temb)
    scale, shift = _block_scale_shift(p, temb)
    got = fused_resblock(
        x,
        p["Conv2d_0"]["Conv_0"]["kernel"],
        p["Conv2d_0"]["Conv_0"]["bias"],
        scale,
        shift,
        interpret=True,
    )
    assert float(jnp.max(jnp.abs(got - ref))) < 2e-5


def test_fused_forward_matches_flax_model():
    m = HicedrnDiff(self_condition=True, number_resnet=3, features=256)
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 64, 64, 1)) * 0.3
    cond = jax.random.normal(jax.random.PRNGKey(4), (2, 64, 64, 1)) * 0.3
    t = jnp.array([5, 900], jnp.int32)
    p = m.init(jax.random.PRNGKey(0), x, t, cond)["params"]
    ref = m.apply({"params": p}, x, t, cond)
    got = hicedrn_fused_forward(
        p, x, t, cond, number_resnet=3, self_condition=True, features=256,
        interpret=True,
    )
    assert got.dtype == jnp.float32
    assert float(jnp.max(jnp.abs(got - ref))) < 2e-5


def test_fused_wrapper_drop_in():
    """FusedHicedrn.apply matches model.apply; cond=None handled like flax."""
    m = HicedrnDiff(self_condition=True, number_resnet=2, features=256)
    wrapper = FusedHicedrn(m, interpret=True)
    assert wrapper.self_condition and wrapper.channels == 1
    x = jax.random.normal(jax.random.PRNGKey(5), (1, 16, 16, 1)) * 0.3
    t = jnp.array([17], jnp.int32)
    p = m.init(jax.random.PRNGKey(0), x, t, x)["params"]
    ref = m.apply({"params": p}, x, t, None)
    got = wrapper.apply({"params": p}, x, t, None)
    assert float(jnp.max(jnp.abs(got - ref))) < 2e-5


def test_fused_wrapper_rejects_non_base():
    m = HicedrnDiff(variant="att", number_resnet=2)
    with pytest.raises(ValueError):
        FusedHicedrn(m)
