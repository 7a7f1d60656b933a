"""Fused inference fast path for the hicedrn backbone.

A pure function over the flax param tree of `HicedrnDiff` (variant='base') that
replaces every residual block with the Pallas fused kernel
(kernels/resblock.py) — the 32-block body is where ~97% of the sampling chain's
FLOPs live (reference /root/reference/src/model/hicedrn_Diff.py:245-283). The
head/tail convs and the time MLP stay in XLA (three small convs + two GEMMs per
step). `FusedHicedrn` wraps it with the `model.apply(vars, x, t, cond)` /
`self_condition` / `channels` surface `GaussianDiffusion` expects, so any
sampler (p_sample_loop / DDIM / DDRM) runs unchanged on the fused path.

Flax remains the source of truth: the params consumed here are exactly the
trees produced by `HicedrnDiff.init` / loaded from checkpoints, and
tests/test_fastpath.py pins the fused forward to `HicedrnDiff.apply`.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from hicdiff_tpu.kernels.resblock import fused_resblock
from hicdiff_tpu.models.common import SinusoidalPosEmb

__all__ = ["FusedHicedrn", "hicedrn_fused_forward"]


def _conv2d(x, p, dtype):
    k = p["Conv_0"]["kernel"].astype(dtype or x.dtype)
    y = jax.lax.conv_general_dilated(
        x.astype(k.dtype),
        k,
        window_strides=(1, 1),
        padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + p["Conv_0"]["bias"].astype(y.dtype)


def _dense(x, p, dtype):
    kern = p["Dense_0"]["kernel"].astype(dtype or x.dtype)
    return x.astype(kern.dtype) @ kern + p["Dense_0"]["bias"].astype(kern.dtype)


def _sinusoidal_emb(t, dim):
    # param-free module — reuse the flax implementation to keep the fast path
    # formula-identical with the model it mirrors
    return SinusoidalPosEmb(dim).apply({}, t)


def hicedrn_fused_forward(
    params,
    x,
    time,
    x_self_cond=None,
    *,
    number_resnet: int = 32,
    self_condition: bool = False,
    features: int = 256,
    dtype: Optional[jnp.dtype] = None,
    interpret: bool = False,
):
    """HicedrnDiff (variant='base') forward with Pallas-fused residual blocks.

    Mirrors models/hicedrn.py HicedrnDiff.__call__ (itself a re-design of
    hicedrn_Diff.py:210-289) block for block.
    """
    if self_condition:
        if x_self_cond is None:
            x_self_cond = jnp.zeros_like(x)
        x = jnp.concatenate([x_self_cond, x], axis=-1)

    cdt = dtype or x.dtype
    x = _conv2d(x.astype(cdt), params["Conv2d_0"], cdt)  # head
    r = x

    # time MLP: sinusoidal(feat) -> Dense(4*feat) -> exact GELU -> Dense
    tp = params["TimeMLP_0"]
    emb = _sinusoidal_emb(time, features)
    emb = _dense(emb, tp["Dense_0"], jnp.float32)
    emb = jax.nn.gelu(emb, approximate=False)
    t_emb = _dense(emb, tp["Dense_1"], jnp.float32).astype(cdt)
    t_act = jax.nn.silu(t_emb)

    for i in range(number_resnet):
        bp = params[f"HicedrnResBlock_{i}"]
        te = _dense(t_act, bp["Dense_0"], cdt)  # (B, 2*feat)
        scale, shift = jnp.split(te, 2, axis=-1)
        x = fused_resblock(
            x,
            bp["Conv2d_0"]["Conv_0"]["kernel"],
            bp["Conv2d_0"]["Conv_0"]["bias"],
            scale,
            shift,
            interpret=interpret,
        )

    x = _conv2d(x, params["Conv2d_1"], cdt)  # body_tail
    x = x + r
    out = _conv2d(x, params["Conv2d_2"], cdt)  # tail
    return out.astype(jnp.float32)


class FusedHicedrn:
    """Drop-in model wrapper running the Pallas fast path.

    Exposes the `.apply({"params": p}, x, t, cond)` / `.self_condition` /
    `.channels` surface GaussianDiffusion uses, so
    `GaussianDiffusion.create(FusedHicedrn(model), ...)` (or
    `engine.with_fused_model()`) swaps the compute path without touching
    checkpoints or samplers. Only variant='base' has a fused kernel.
    """

    def __init__(self, model, *, interpret: bool = False):
        if getattr(model, "variant", "base") != "base":
            raise ValueError(
                f"fused path supports variant='base', got {model.variant!r}"
            )
        self.model = model
        self.self_condition = bool(getattr(model, "self_condition", False))
        self.channels = int(getattr(model, "channels", 1))
        self.interpret = interpret

    def apply(self, variables, x, time, x_self_cond=None):
        return hicedrn_fused_forward(
            variables["params"],
            x,
            time,
            x_self_cond,
            number_resnet=self.model.number_resnet,
            self_condition=self.self_condition,
            features=self.model.features,
            dtype=self.model.dtype,
            interpret=self.interpret,
        )

    def init(self, rng, x, time, cond=None):
        return self.model.init(rng, x, time, cond)
