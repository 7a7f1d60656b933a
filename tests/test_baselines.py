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


def test_load_baseline_native_range_adaptation(tmp_path):
    """'01'-output models (deephic/unet/hicplus) are driven in their native
    range: load_baseline's model_fn must equal 2*model((x+1)/2)-1 so the
    harness's uniform (out+1)/2 rescale (reference stard_metrics.py:141-143)
    recovers the model's native prediction (PARITY.md #31)."""
    from hicdiff_tpu.models.zoo import BASELINES, load_baseline

    x = jnp.asarray(
        np.random.default_rng(0).uniform(-1, 1, (2, 64, 64, 1)).astype("f4")
    )
    for name in ("deephic", "hicplus"):
        ctor, needs_pad, out_range = BASELINES[name]
        assert out_range == "01"
        model_fn, had = load_baseline(name, wdir=str(tmp_path))
        assert not had
        model = ctor()
        x01 = (x + 1.0) / 2.0
        if needs_pad:
            x01 = jnp.pad(x01, ((0, 0), (6, 6), (6, 6), (0, 0)))
        variables = model.init(jax.random.PRNGKey(0), x01)
        direct = model.apply(variables, x01)
        np.testing.assert_allclose(
            np.asarray(model_fn(x)), np.asarray(direct) * 2.0 - 1.0,
            rtol=0, atol=1e-6,
        )


def test_pm1_models_cover_negative_targets():
    """The 'pm1' rows of BASELINES really can emit negatives (the property the
    '01' split exists to respect)."""
    from hicdiff_tpu.models.zoo import BASELINES

    assert BASELINES["hiedsr"][2] == "pm1"
    assert BASELINES["hicsr"][2] == "pm1"
    assert BASELINES["hicarn"][2] == "pm1"


def test_bn_recalibration_converges_stats(tmp_path):
    """recalibrate_batch_stats drives BatchNorm running stats to the train
    distribution around fixed weights (the post-training fix for small
    datasets where the 0.99-momentum EMA never converges — measured on the
    Dros split: deephic val 0.061 -> 0.016, eval PCC -0.83 -> +0.92)."""
    from flax import linen as nn

    from pretrain_baselines import recalibrate_batch_stats

    class TinyBN(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            return nn.BatchNorm(use_running_average=not train)(x)

    model = TinyBN()
    x0 = np.random.default_rng(0).normal(3.0, 2.0, (16, 8, 8, 1)).astype("f4")
    v = model.init(jax.random.PRNGKey(0), x0)
    params = v["params"]
    # skew the running stats far from the data distribution
    stats = {"BatchNorm_0": {"mean": jnp.full((1,), -7.0),
                             "var": jnp.full((1,), 40.0)}}

    class FakeDM:
        batch_size = 16

        def train_dataloader(self):
            for i in range(4):
                xb = np.random.default_rng(i).normal(
                    3.0, 2.0, (16, 8, 8, 1)
                ).astype("f4")
                yield xb, xb, None, None

    out = recalibrate_batch_stats(
        model, params, stats, FakeDM(), lambda x: x, target_updates=600,
    )
    mean = float(out["BatchNorm_0"]["mean"][0])
    var = float(out["BatchNorm_0"]["var"][0])
    assert abs(mean - 3.0) < 0.1, mean
    assert abs(var - 4.0) < 0.5, var
