"""1-D attention U-Net — the hicdiff_1d variant's backbone.

Re-design of /root/reference/src/hicdiff_1d.py:250-400 (`Unet1D`): the same
lucidrains topology as the 2D Unet but over (b, n, c) sequences with Conv1d
everywhere; paired with the unified GaussianDiffusion engine via
`seq_length=` (the reference clones the whole engine as GaussianDiffusion1D,
hicdiff_1d.py:404-705 — ours is one engine, shape-agnostic).
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
            padding=pad,
            use_bias=self.use_bias,
            kernel_init=torch_kernel_init,
            bias_init=torch_bias_init(fan_in),
        )(x)


class _LayerNorm1d(nn.Module):
    @nn.compact
    def __call__(self, x):
        g = self.param("g", nn.initializers.ones, (x.shape[-1],), jnp.float32)
        var = jnp.var(x, axis=-1, keepdims=True)
        mean = jnp.mean(x, axis=-1, keepdims=True)
        return (x - mean) * jax.lax.rsqrt(var + 1e-5) * g


class _Block1d(nn.Module):
    features: int
    groups: int = 8

    @nn.compact
    def __call__(self, x, scale_shift=None):
        x = Conv1d(self.features, 3)(x)
        x = nn.GroupNorm(num_groups=self.groups)(x)
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
        q = jnp.swapaxes(qkv[:, :, 0], 1, 2)
        k = jnp.swapaxes(qkv[:, :, 1], 1, 2)
        v = jnp.swapaxes(qkv[:, :, 2], 1, 2)
        if self.linear:
            q = jax.nn.softmax(q, axis=-1) * scale
            k = jax.nn.softmax(k, axis=-2)
            v = v / n
            ctx = jnp.einsum("bhnd,bhne->bhde", k, v)
            out = jnp.einsum("bhde,bhnd->bhne", ctx, q)
        else:
            sim = jnp.einsum("bhid,bhjd->bhij", q * scale, k)
            attn = jax.nn.softmax(sim, axis=-1)
            out = jnp.einsum("bhij,bhjd->bhid", attn, v)
        out = jnp.swapaxes(out, 1, 2).reshape(b, n, hidden)
        return Conv1d(c, 1)(out)


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
                # space-to-depth downsample
                b, n, c = x.shape
                x = x.reshape(b, n // 2, 2, c).transpose(0, 1, 3, 2).reshape(
                    b, n // 2, c * 2
                )
                x = Conv1d(dout, 1)(x)
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
