"""1-D attention U-Net — the hicdiff_1d variant's backbone.

Re-design of /root/reference/src/hicdiff_1d.py:150-400 (`Unet1D`): the lucidrains
topology over (b, n, c) sequences with Conv1d everywhere — weight-standardized
convs in the blocks (hicdiff_1d.py:79-93), strided-conv downsampling
(Conv1d(k=4, s=2, p=1), :76-77), linear attention with post-projection LayerNorm
and NO token-count scaling (:195-222 — unlike the 2D variant), nearest-x2 +
conv upsampling. Paired with the unified GaussianDiffusion engine via
`seq_length=` (the reference clones the whole engine as GaussianDiffusion1D,
hicdiff_1d.py:404-705 — ours is one shape-agnostic engine).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from hicdiff_tpu.models.common import (
    Dense,
    TimeMLP,
    torch_bias_init,
    torch_kernel_init,
)

__all__ = ["Unet1D"]


class Conv1d(nn.Module):
    features: int
    kernel_size: int = 3
    padding: str | int = "SAME"
    strides: int = 1
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1] * self.kernel_size
        pad = self.padding
        if isinstance(pad, int):
            pad = [(pad, pad)]
        return nn.Conv(
            self.features,
            (self.kernel_size,),
            strides=(self.strides,),
            padding=pad,
            use_bias=self.use_bias,
            kernel_init=torch_kernel_init,
            bias_init=torch_bias_init(fan_in),
        )(x)


class WSConv1d(nn.Module):
    """Weight-standardized Conv1d (hicdiff_1d.py:79-93)."""

    features: int
    kernel_size: int = 3

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        k = self.kernel_size
        fan_in = in_ch * k
        kernel = self.param(
            "kernel", torch_kernel_init, (k, in_ch, self.features), jnp.float32
        )
        bias = self.param("bias", torch_bias_init(fan_in), (self.features,), jnp.float32)
        mean = kernel.mean(axis=(0, 1), keepdims=True)
        var = kernel.var(axis=(0, 1), keepdims=True)
        kernel = (kernel - mean) * jax.lax.rsqrt(var + 1e-5)
        out = jax.lax.conv_general_dilated(
            x,
            kernel,
            window_strides=(1,),
            padding=[(k // 2, k // 2)],
            dimension_numbers=("NWC", "WIO", "NWC"),
        )
        return out + bias


class _LayerNorm1d(nn.Module):
    """Channel LayerNorm with scale only (hicdiff_1d.py:95-103)."""

    @nn.compact
    def __call__(self, x):
        g = self.param("g", nn.initializers.ones, (x.shape[-1],), jnp.float32)
        var = jnp.var(x, axis=-1, keepdims=True)
        mean = jnp.mean(x, axis=-1, keepdims=True)
        return (x - mean) * jax.lax.rsqrt(var + 1e-5) * g


class _Block1d(nn.Module):
    """WSConv1d -> GroupNorm -> scale-shift -> SiLU (hicdiff_1d.py:152-168)."""

    features: int
    groups: int = 8

    @nn.compact
    def __call__(self, x, scale_shift=None):
        x = WSConv1d(self.features, 3)(x)
        x = nn.GroupNorm(num_groups=self.groups, epsilon=1e-5)(x)
        if scale_shift is not None:
            scale, shift = scale_shift
            x = x * (scale + 1) + shift
        return jax.nn.silu(x)


class _ResnetBlock1d(nn.Module):
    features: int
    groups: int = 8

    @nn.compact
    def __call__(self, x, time_emb=None):
        scale_shift = None
        if time_emb is not None:
            te = Dense(self.features * 2)(jax.nn.silu(time_emb))
            scale, shift = jnp.split(te[:, None, :], 2, axis=-1)
            scale_shift = (scale, shift)
        h = _Block1d(self.features, self.groups)(x, scale_shift)
        h = _Block1d(self.features, self.groups)(h)
        if x.shape[-1] != self.features:
            x = Conv1d(self.features, 1)(x)
        return h + x


class _Attention1d(nn.Module):
    """Linear (hicdiff_1d.py:195-222) or full (:224-246) attention. The 1D linear
    variant scales q only (no v/n division) and post-norms the projection."""

    heads: int = 4
    dim_head: int = 32
    linear: bool = False

    @nn.compact
    def __call__(self, x):
        b, n, c = x.shape
        hidden = self.heads * self.dim_head
        scale = self.dim_head**-0.5
        qkv = Conv1d(hidden * 3, 1, use_bias=False)(x)
        qkv = qkv.reshape(b, n, 3, self.heads, self.dim_head)
        q = jnp.swapaxes(qkv[:, :, 0], 1, 2)  # (b, h, n, d)
        k = jnp.swapaxes(qkv[:, :, 1], 1, 2)
        v = jnp.swapaxes(qkv[:, :, 2], 1, 2)
        if self.linear:
            q = jax.nn.softmax(q, axis=-1) * scale  # softmax over d
            k = jax.nn.softmax(k, axis=-2)  # softmax over n
            ctx = jnp.einsum("bhnd,bhne->bhde", k, v)
            out = jnp.einsum("bhde,bhnd->bhne", ctx, q)
        else:
            sim = jnp.einsum("bhid,bhjd->bhij", q * scale, k)
            attn = jax.nn.softmax(sim, axis=-1)
            out = jnp.einsum("bhij,bhjd->bhid", attn, v)
        out = jnp.swapaxes(out, 1, 2).reshape(b, n, hidden)
        out = Conv1d(c, 1)(out)
        if self.linear:
            out = _LayerNorm1d()(out)
        return out


class _PreNormResidual1d(nn.Module):
    fn: nn.Module

    @nn.compact
    def __call__(self, x):
        return self.fn(_LayerNorm1d()(x)) + x


class Unet1D(nn.Module):
    """Unet1D(dim, dim_mults, channels) over (b, n, c) sequences."""

    dim: int = 64
    init_dim: Optional[int] = None
    out_dim: Optional[int] = None
    dim_mults: Tuple[int, ...] = (1, 2, 4, 8)
    channels: int = 1
    self_condition: bool = False
    resnet_block_groups: int = 8
    learned_variance: bool = False

    @nn.compact
    def __call__(self, x, time, x_self_cond=None):
        if self.self_condition:
            if x_self_cond is None:
                x_self_cond = jnp.zeros_like(x)
            x = jnp.concatenate([x_self_cond, x], axis=-1)

        init_dim = self.init_dim or self.dim
        x = Conv1d(init_dim, 7, padding=3)(x)
        r = x

        dims = [init_dim] + [self.dim * m for m in self.dim_mults]
        in_out = list(zip(dims[:-1], dims[1:]))
        t = TimeMLP(fourier_dim=self.dim, time_dim=self.dim * 4)(time)

        g = self.resnet_block_groups
        hs = []
        for ind, (din, dout) in enumerate(in_out):
            is_last = ind >= len(in_out) - 1
            x = _ResnetBlock1d(din, g)(x, t)
            hs.append(x)
            x = _ResnetBlock1d(din, g)(x, t)
            x = _PreNormResidual1d(_Attention1d(linear=True))(x)
            hs.append(x)
            if not is_last:
                # strided-conv downsample (hicdiff_1d.py:76-77)
                x = Conv1d(dout, 4, strides=2, padding=1)(x)
            else:
                x = Conv1d(dout, 3)(x)

        mid = dims[-1]
        x = _ResnetBlock1d(mid, g)(x, t)
        x = _PreNormResidual1d(_Attention1d(linear=False))(x)
        x = _ResnetBlock1d(mid, g)(x, t)

        for ind, (din, dout) in enumerate(reversed(in_out)):
            is_last = ind == len(in_out) - 1
            x = jnp.concatenate([x, hs.pop()], axis=-1)
            x = _ResnetBlock1d(dout, g)(x, t)
            x = jnp.concatenate([x, hs.pop()], axis=-1)
            x = _ResnetBlock1d(dout, g)(x, t)
            x = _PreNormResidual1d(_Attention1d(linear=True))(x)
            if not is_last:
                b, n, c = x.shape
                x = jax.image.resize(x, (b, n * 2, c), method="nearest")
                x = Conv1d(din, 3)(x)
            else:
                x = Conv1d(din, 3)(x)

        x = jnp.concatenate([x, r], axis=-1)
        x = _ResnetBlock1d(self.dim, g)(x, t)
        out_dim = self.out_dim or self.channels * (2 if self.learned_variance else 1)
        return Conv1d(out_dim, 1)(x)
