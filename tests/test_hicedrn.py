"""Backbone structural tests: shapes, shared-weight semantics, parameter counts
matched analytically against the torch reference architecture
(src/model/hicedrn_Diff.py:210-289)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hicdiff_tpu.models.hicedrn import HicedrnDiff, HicedrnGenerator


def n_params(params):
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))


def test_hicedrn_base_param_count_and_shape():
    model = HicedrnDiff(self_condition=False)
    x = jnp.zeros((2, 64, 64, 1))
    t = jnp.zeros((2,), dtype=jnp.int32)
    params = model.init(jax.random.PRNGKey(0), x, t, None)["params"]
    out = model.apply({"params": params}, x, t, None)
    assert out.shape == (2, 64, 64, 1)

    # analytic torch param count (hicedrn_Diff):
    # head conv 1->256 (3x3), time mlp 256->1024->1024,
    # 32 x [Linear 1024->512, one shared conv 256->256 3x3],
    # body_tail 256->256 3x3, tail 256->1 3x3
    conv = lambda cin, cout, k: cin * cout * k * k + cout
    lin = lambda fin, fout: fin * fout + fout
    expected = (
        conv(1, 256, 3)
        + lin(256, 1024)
        + lin(1024, 1024)
        + 32 * (lin(1024, 512) + conv(256, 256, 3))
        + conv(256, 256, 3)
        + conv(256, 1, 3)
    )
    assert n_params(params) == expected


def test_hicedrn_self_condition_doubles_input_channels():
    model = HicedrnDiff(self_condition=True)
    x = jnp.zeros((2, 64, 64, 1))
    t = jnp.zeros((2,), dtype=jnp.int32)
    cond = jnp.ones_like(x)
    params = model.init(jax.random.PRNGKey(0), x, t, cond)["params"]
    out = model.apply({"params": params}, x, t, cond)
    assert out.shape == (2, 64, 64, 1)
    # head conv must see 2 input channels
    head_kernel = jax.tree.leaves(
        {k: v for k, v in params.items() if k == "Conv2d_0"}
    )
    assert any(p.shape[:3] == (3, 3, 2) for p in jax.tree.leaves(params) if p.ndim == 4)


def test_shared_conv_applied_twice():
    """Each residual block must own exactly ONE 3x3 conv (applied twice)."""
    model = HicedrnDiff(self_condition=False, number_resnet=2)
    x = jnp.zeros((1, 16, 16, 1))
    t = jnp.zeros((1,), dtype=jnp.int32)
    params = model.init(jax.random.PRNGKey(0), x, t, None)["params"]
    block_params = params["HicedrnResBlock_0"]
    conv_keys = [k for k in block_params if k.startswith("Conv2d")]
    assert len(conv_keys) == 1, f"expected one shared conv, got {conv_keys}"


def test_residual_scaling_identity_at_zero_weights():
    """With the block conv zeroed, a block must be an exact identity (h*0.1 + x)."""
    model = HicedrnDiff(self_condition=False, number_resnet=1)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 16, 1))
    t = jnp.zeros((1,), dtype=jnp.int32)
    params = model.init(jax.random.PRNGKey(0), x, t, None)["params"]

    zeroed = jax.tree.map(jnp.zeros_like, params)
    out = model.apply({"params": zeroed}, x, t, None)
    # everything zero -> head/tail zero -> output exactly zero
    np.testing.assert_array_equal(np.asarray(out), 0.0)


def test_sr3_variant_runs_with_continuous_level():
    model = HicedrnDiff(self_condition=True, variant="sr3", number_resnet=2)
    x = jnp.zeros((2, 16, 16, 1))
    level = jnp.array([0.5, 0.9], dtype=jnp.float32)
    cond = jnp.ones_like(x)
    params = model.init(jax.random.PRNGKey(0), x, level, cond)["params"]
    out = model.apply({"params": params}, x, level, cond)
    assert out.shape == (2, 16, 16, 1)


def test_att_variant_inserts_linear_attention():
    model = HicedrnDiff(self_condition=False, variant="att", number_resnet=4)
    x = jnp.zeros((1, 16, 16, 1))
    t = jnp.zeros((1,), dtype=jnp.int32)
    params = model.init(jax.random.PRNGKey(0), x, t, None)["params"]
    att_keys = [k for k in params if "LinearAttention" in k]
    assert len(att_keys) == 2  # after every 2nd of 4 blocks


def test_generator_shapes():
    model = HicedrnGenerator(number_blocks=2)
    x = jnp.zeros((2, 40, 40, 1))
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    out = model.apply({"params": params}, x)
    assert out.shape == (2, 40, 40, 1)
