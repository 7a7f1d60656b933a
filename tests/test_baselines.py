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
