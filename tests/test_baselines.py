"""Baseline model zoo: shape contracts (incl. the unpadded H-12 models)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hicdiff_tpu.models.baselines import (
    DAE,
    DeepHiC,
    DeepHiCDiscriminator,
    HiCARN,
    HiCSR,
    HiCSRDiscriminator,
    HicPlus,
    HiedsrDiscriminator,
    Unet2D,
)
from hicdiff_tpu.models.hicedrn import HicedrnGenerator

KEY = jax.random.PRNGKey(0)
X64 = jnp.zeros((2, 64, 64, 1))
X76 = jnp.zeros((2, 76, 76, 1))  # 64 + 2*6 padding for the unpadded models


def init_apply(model, x, train=False, **kw):
    variables = model.init(KEY, x, **kw)
    return model.apply(variables, x, **kw)


def test_hicplus_crops_12():
    out = init_apply(HicPlus(), X76)
    assert out.shape == (2, 64, 64, 1)


def test_hicsr_crops_12():
    out = init_apply(HiCSR(num_res_blocks=2), X76)
    assert out.shape == (2, 64, 64, 1)
    assert float(jnp.abs(out).max()) <= 1.0  # tanh


def test_deephic_same_size_01_range():
    out = init_apply(DeepHiC(resblock_num=2), X64)
    assert out.shape == (2, 64, 64, 1)
    assert 0.0 <= float(out.min()) and float(out.max()) <= 1.0


def test_dae_same_size():
    out = init_apply(DAE(), X64)
    assert out.shape == (2, 64, 64, 1)


def test_unet2d_same_size():
    out = init_apply(Unet2D(), X64)
    assert out.shape == (2, 64, 64, 1)
    assert 0.0 <= float(out.min()) and float(out.max()) <= 1.0


def test_hicarn_same_size():
    out = init_apply(HiCARN(num_channels=16), X64)
    assert out.shape == (2, 64, 64, 1)


def test_hiedsr_generator():
    out = init_apply(HicedrnGenerator(number_blocks=2), X64)
    assert out.shape == (2, 64, 64, 1)


@pytest.mark.parametrize(
    "disc,expect",
    [
        (DeepHiCDiscriminator(), (2,)),
        (HiCSRDiscriminator(), None),  # patch logits
        (HiedsrDiscriminator(), None),  # patch probabilities
    ],
)
def test_discriminators(disc, expect):
    out = init_apply(disc, X64)
    if expect:
        assert out.shape == expect
    assert np.isfinite(np.asarray(out)).all()


def test_unet2d_kaiming_init():
    """unet_2D init parity (Unet_parts1.py:94): conv kernels kaiming-normal
    (var 2/fan_in, plain normal), BatchNorm scale ~ N(1, 0.02)."""
    import jax

    from hicdiff_tpu.models.baselines import Unet2D

    model = Unet2D()
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 1)))
    flat = jax.tree_util.tree_flatten_with_path(variables["params"])[0]
    checked_conv = checked_bn = 0
    for path, leaf in flat:
        names = [getattr(k, "key", "") for k in path]
        if "kernel" in names and leaf.ndim == 4 and leaf.size >= 4096:
            fan_in = leaf.shape[0] * leaf.shape[1] * leaf.shape[2]
            expect = np.sqrt(2.0 / fan_in)
            got = float(np.std(np.asarray(leaf)))
            assert 0.8 * expect < got < 1.2 * expect, (names, got, expect)
            checked_conv += 1
        if "scale" in names and leaf.ndim == 1 and leaf.size >= 64:
            arr = np.asarray(leaf)
            assert abs(float(arr.mean()) - 1.0) < 0.02
            assert 0.005 < float(arr.std()) < 0.05, names
            checked_bn += 1
    assert checked_conv >= 5 and checked_bn >= 2
