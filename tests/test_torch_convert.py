"""Checkpoint conversion + ACTIVATION PARITY against the reference architecture.

Builds a random torch-style state dict with the reference's exact key layout
(src/model/hicedrn_Diff.py), evaluates the reference forward semantics with
torch *functional* ops (the architecture spec, cited per line), converts the
weights with tools/convert_torch_checkpoint.py, and requires our flax model to
reproduce the activations within fp32 tolerance — the SURVEY.md §4(c) parity
test.
"""
import math

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from hicdiff_tpu.models.hicedrn import HicedrnDiff
from tools.convert_torch_checkpoint import convert_hicedrn_state_dict

N_FEAT = 256
N_BLOCKS = 3  # small for test speed; mapping logic is identical for 32


def make_state_dict(rng, self_condition=True):
    in_ch = 2 if self_condition else 1
    sd = {}

    def conv(prefix, cin, cout, k=3):
        sd[prefix + ".weight"] = rng.normal(size=(cout, cin, k, k)).astype(np.float32) * 0.05
        sd[prefix + ".bias"] = rng.normal(size=(cout,)).astype(np.float32) * 0.05

    def lin(prefix, fin, fout):
        sd[prefix + ".weight"] = rng.normal(size=(fout, fin)).astype(np.float32) * 0.05
        sd[prefix + ".bias"] = rng.normal(size=(fout,)).astype(np.float32) * 0.05

    conv("model.head", in_ch, N_FEAT)
    lin("model.time_mlp.1", N_FEAT, N_FEAT * 4)
    lin("model.time_mlp.3", N_FEAT * 4, N_FEAT * 4)
    for i in range(N_BLOCKS):
        lin(f"model.body.{i}.mlp.1", N_FEAT * 4, N_FEAT * 2)
        conv(f"model.body.{i}.conv.proj", N_FEAT, N_FEAT)
    conv("model.body_tail", N_FEAT, N_FEAT)
    conv("model.tail", N_FEAT, 1)
    return sd


def torch_reference_forward(sd, x, time, x_self_cond):
    """hicedrn_Diff.forward (hicedrn_Diff.py:267-289) via torch functional ops."""
    t = lambda k: torch.from_numpy(sd["model." + k])
    x = torch.cat([x_self_cond, x], dim=1)  # :273
    x = F.conv2d(x, t("head.weight"), t("head.bias"), padding=1)  # :275
    r = x.clone()

    # SinusoidalPosEmb(256) -> Linear -> GELU -> Linear (:238-243, :141-153)
    half = N_FEAT // 2
    emb = math.log(10000) / (half - 1)
    emb = torch.exp(torch.arange(half) * -emb)
    emb = time[:, None].float() * emb[None, :]
    emb = torch.cat([emb.sin(), emb.cos()], dim=-1)
    temb = F.linear(emb, t("time_mlp.1.weight"), t("time_mlp.1.bias"))
    temb = F.gelu(temb)
    temb = F.linear(temb, t("time_mlp.3.weight"), t("time_mlp.3.bias"))

    for i in range(N_BLOCKS):  # ResnetBlock :194-208
        te = F.linear(F.silu(temb), t(f"body.{i}.mlp.1.weight"), t(f"body.{i}.mlp.1.bias"))
        scale, shift = te[:, :, None, None].chunk(2, dim=1)
        h = F.conv2d(x, t(f"body.{i}.conv.proj.weight"), t(f"body.{i}.conv.proj.bias"), padding=1)
        h = h * (scale + 1) + shift
        h = F.silu(h)
        h = F.conv2d(h, t(f"body.{i}.conv.proj.weight"), t(f"body.{i}.conv.proj.bias"), padding=1)
        x = h * 0.1 + x
    x = F.conv2d(x, t("body_tail.weight"), t("body_tail.bias"), padding=1)  # :282
    x = x + r
    return F.conv2d(x, t("tail.weight"), t("tail.bias"), padding=1)  # :287


def test_converted_weights_reproduce_reference_activations():
    rng = np.random.default_rng(0)
    sd = make_state_dict(rng, self_condition=True)

    xb = rng.normal(size=(2, 1, 16, 16)).astype(np.float32) * 0.5
    cond = rng.normal(size=(2, 1, 16, 16)).astype(np.float32) * 0.5
    time = np.array([3, 700], dtype=np.int64)

    ref = torch_reference_forward(
        sd, torch.from_numpy(xb), torch.from_numpy(time), torch.from_numpy(cond)
    ).numpy()

    params = convert_hicedrn_state_dict(sd)
    model = HicedrnDiff(self_condition=True, number_resnet=N_BLOCKS)
    ours = model.apply(
        {"params": jax.tree.map(jnp.asarray, params)},
        jnp.asarray(np.transpose(xb, (0, 2, 3, 1))),
        jnp.asarray(time),
        jnp.asarray(np.transpose(cond, (0, 2, 3, 1))),
    )
    ours_nchw = np.transpose(np.asarray(ours), (0, 3, 1, 2))
    np.testing.assert_allclose(ours_nchw, ref, atol=2e-5, rtol=1e-4)


def test_convert_rejects_non_hicedrn():
    import pytest

    with pytest.raises(ValueError):
        convert_hicedrn_state_dict({"model.foo.weight": np.zeros((1,))})


def test_convert_accepts_bare_backbone_dict():
    rng = np.random.default_rng(1)
    sd = make_state_dict(rng)
    bare = {k[len("model."):]: v for k, v in sd.items()}
    params = convert_hicedrn_state_dict(bare)
    assert f"HicedrnResBlock_{N_BLOCKS-1}" in params


def test_export_roundtrip_inverts_convert():
    """export_hicedrn_params is the exact inverse of convert_hicedrn_state_dict."""
    from tools.export_torch_checkpoint import export_hicedrn_params

    rng = np.random.default_rng(7)
    sd = make_state_dict(rng, self_condition=True)
    params = convert_hicedrn_state_dict(sd)
    back = export_hicedrn_params(params, prefix="model.")
    assert set(back) == set(sd)
    for k in sd:
        np.testing.assert_array_equal(back[k], sd[k])


def test_export_rejects_non_hicedrn():
    import pytest

    from tools.export_torch_checkpoint import export_hicedrn_params

    with pytest.raises((ValueError, KeyError)):
        export_hicedrn_params({"Conv2d_0": {"Conv_0": {
            "kernel": np.zeros((3, 3, 1, 1)), "bias": np.zeros((1,))}},
            "Conv2d_1": {"Conv_0": {"kernel": np.zeros((3, 3, 1, 1)),
                                    "bias": np.zeros((1,))}},
            "Conv2d_2": {"Conv_0": {"kernel": np.zeros((3, 3, 1, 1)),
                                    "bias": np.zeros((1,))}},
            "TimeMLP_0": {"Dense_0": {"Dense_0": {
                "kernel": np.zeros((4, 4)), "bias": np.zeros((4,))}},
                "Dense_1": {"Dense_0": {"kernel": np.zeros((4, 4)),
                                        "bias": np.zeros((4,))}}}})
