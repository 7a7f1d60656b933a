"""Attention U-Net diffusion backbone, NHWC / TPU-native.

Re-design of the lucidrains-style `Unet` embedded in the reference engines
(/root/reference/src/hicdiff.py:255-387): 7x7 init conv, dims
[init, d, 2d, 4d, 8d], per-resolution [ResnetBlock x2 + Residual(PreNorm(
LinearAttention)) + Downsample], full-attention mid block, symmetric ups with
skip concatenation, final res block + 1x1 conv. Building blocks:
WeightStandardizedConv2d + GroupNorm(8) + scale-shift + SiLU (hicdiff.py:84-197).

Downsample is the space-to-depth rearrange + 1x1 conv (hicdiff.py:78-82) — on TPU
this is a reshape/transpose XLA fuses for free; Upsample is nearest x2 + 3x3 conv.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from hicdiff_tpu.models.common import (
    ChannelLayerNorm,
    Conv2d,
    Dense,
    TimeMLP,
    torch_bias_init,
    torch_kernel_init,
)


class WSConv2d(nn.Module):
    """Weight-standardized conv (hicdiff.py:84-97): kernel normalized to zero
    mean / unit variance per output channel before the convolution."""

    features: int
    kernel_size: int = 3
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        k = self.kernel_size
        fan_in = in_ch * k * k
        kernel = self.param(
            "kernel", torch_kernel_init, (k, k, in_ch, self.features), jnp.float32
        )
        bias = self.param("bias", torch_bias_init(fan_in), (self.features,), jnp.float32)
        eps = 1e-5
        mean = kernel.mean(axis=(0, 1, 2), keepdims=True)
        var = kernel.var(axis=(0, 1, 2), keepdims=True)  # biased, like torch unbiased=False
        kernel = (kernel - mean) * jax.lax.rsqrt(var + eps)
        dtype = self.dtype or x.dtype
        # no preferred_element_type here: with bf16 operands the f32 cotangent
        # would hit the transposed (backward) conv against a bf16 operand and
        # fail dtype checking; XLA:TPU accumulates bf16 convs in fp32 anyway
        out = jax.lax.conv_general_dilated(
            x.astype(dtype),
            kernel.astype(dtype),
            window_strides=(1, 1),
            padding=[(k // 2, k // 2), (k // 2, k // 2)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return out + bias.astype(dtype)


class UnetBlock(nn.Module):
    """WSConv -> GroupNorm(8) -> scale-shift -> SiLU (hicdiff.py:155-171)."""

    features: int
    groups: int = 8
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, scale_shift=None):
        x = WSConv2d(self.features, 3, dtype=self.dtype)(x)
        x = nn.GroupNorm(num_groups=self.groups, epsilon=1e-5)(x)
        if scale_shift is not None:
            scale, shift = scale_shift
            x = x * (scale + 1) + shift
        return jax.nn.silu(x)


class UnetResnetBlock(nn.Module):
    """block1(scale-shift) -> block2 -> + res_conv(x) (hicdiff.py:173-197)."""

    features: int
    groups: int = 8
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, time_emb=None):
        scale_shift = None
        if time_emb is not None:
            te = Dense(self.features * 2, dtype=self.dtype)(jax.nn.silu(time_emb))
            scale, shift = jnp.split(te[:, None, None, :], 2, axis=-1)
            scale_shift = (scale, shift)
        h = UnetBlock(self.features, self.groups, dtype=self.dtype)(x, scale_shift)
        h = UnetBlock(self.features, self.groups, dtype=self.dtype)(h)
        if x.shape[-1] != self.features:
            x = Conv2d(self.features, kernel_size=1, dtype=self.dtype)(x)
        return h + x


class UnetLinearAttention(nn.Module):
    """Linear attention WITHOUT internal pre-norm (hicdiff.py:199-227); the Unet
    wraps it in Residual(PreNorm(.)) externally."""

    heads: int = 4
    dim_head: int = 32
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        hidden = self.heads * self.dim_head
        scale = self.dim_head**-0.5
        qkv = Conv2d(hidden * 3, kernel_size=1, use_bias=False, dtype=self.dtype)(x)
        qkv = qkv.reshape(b, h * w, 3, self.heads, self.dim_head)
        q = jnp.swapaxes(qkv[:, :, 0], 1, 2)
        k = jnp.swapaxes(qkv[:, :, 1], 1, 2)
        v = jnp.swapaxes(qkv[:, :, 2], 1, 2)
        q = jax.nn.softmax(q, axis=-1) * scale
        k = jax.nn.softmax(k, axis=-2)
        v = v / (h * w)
        context = jnp.einsum("bhnd,bhne->bhde", k, v, preferred_element_type=jnp.float32)
        out = jnp.einsum("bhde,bhnd->bhne", context, q, preferred_element_type=jnp.float32)
        out = jnp.swapaxes(out, 1, 2).reshape(b, h, w, hidden).astype(x.dtype)
        out = Conv2d(c, kernel_size=1, dtype=self.dtype)(out)
        return ChannelLayerNorm()(out)


class UnetAttention(nn.Module):
    """Full softmax attention for the mid block (hicdiff.py:229-251)."""

    heads: int = 4
    dim_head: int = 32
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        hidden = self.heads * self.dim_head
        scale = self.dim_head**-0.5
        qkv = Conv2d(hidden * 3, kernel_size=1, use_bias=False, dtype=self.dtype)(x)
        qkv = qkv.reshape(b, h * w, 3, self.heads, self.dim_head)
        q = jnp.swapaxes(qkv[:, :, 0], 1, 2) * scale  # (b, heads, n, d)
        k = jnp.swapaxes(qkv[:, :, 1], 1, 2)
        v = jnp.swapaxes(qkv[:, :, 2], 1, 2)
        sim = jnp.einsum("bhid,bhjd->bhij", q, k, preferred_element_type=jnp.float32)
        attn = jax.nn.softmax(sim, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhij,bhjd->bhid", attn, v, preferred_element_type=jnp.float32)
        out = jnp.swapaxes(out, 1, 2).reshape(b, h, w, hidden).astype(x.dtype)
        return Conv2d(c, kernel_size=1, dtype=self.dtype)(out)


class _PreNormResidual(nn.Module):
    """Residual(PreNorm(fn)) (hicdiff.py:64-70, 110-118)."""

    fn: nn.Module

    @nn.compact
    def __call__(self, x):
        return self.fn(ChannelLayerNorm()(x)) + x


def _downsample_s2d(x):
    """Space-to-depth: 'b c (h 2)(w 2) -> b (c 4) h w' channel-major ordering."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # (b, h2, w2, c, p1, p2)
    return x.reshape(b, h // 2, w // 2, c * 4)


class Unet(nn.Module):
    """Unet(dim=64, dim_mults=(1,2,4,8)) parity (hicdiff.py:255-387)."""

    dim: int = 64
    init_dim: Optional[int] = None
    out_dim: Optional[int] = None
    dim_mults: Tuple[int, ...] = (1, 2, 4, 8)
    channels: int = 1
    self_condition: bool = False
    resnet_block_groups: int = 8
    learned_variance: bool = False
    learned_sinusoidal_cond: bool = False
    random_fourier_features: bool = False
    learned_sinusoidal_dim: int = 16
    # SR3 variant (hicdiff_sr3.py:348-359): condition on a continuous noise level
    # through the WaveGrad positional encoding instead of integer timesteps
    noise_level_emb: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, time, x_self_cond=None):
        if self.self_condition:
            if x_self_cond is None:
                x_self_cond = jnp.zeros_like(x)
            x = jnp.concatenate([x_self_cond, x], axis=-1)

        init_dim = self.init_dim or self.dim
        x = Conv2d(init_dim, kernel_size=7, dtype=self.dtype)(x)
        r = x

        dims = [init_dim] + [self.dim * m for m in self.dim_mults]
        in_out = list(zip(dims[:-1], dims[1:]))
        time_dim = self.dim * 4
        if self.noise_level_emb:
            from hicdiff_tpu.models.common import SR3PositionalEncoding

            emb = SR3PositionalEncoding(self.dim)(time)
            emb = Dense(time_dim, dtype=self.dtype)(emb)
            emb = jax.nn.gelu(emb, approximate=False)
            t = Dense(time_dim, dtype=self.dtype)(emb).astype(x.dtype)
        else:
            t = TimeMLP(
                fourier_dim=self.dim,
                time_dim=time_dim,
                learned_sinusoidal=self.learned_sinusoidal_cond,
                learned_sinusoidal_dim=self.learned_sinusoidal_dim,
                random_fourier=self.random_fourier_features,
            )(time).astype(x.dtype)

        groups = self.resnet_block_groups
        h_stack = []
        num_res = len(in_out)
        for ind, (dim_in, dim_out) in enumerate(in_out):
            is_last = ind >= num_res - 1
            x = UnetResnetBlock(dim_in, groups, dtype=self.dtype)(x, t)
            h_stack.append(x)
            x = UnetResnetBlock(dim_in, groups, dtype=self.dtype)(x, t)
            x = _PreNormResidual(UnetLinearAttention(dtype=self.dtype))(x)
            h_stack.append(x)
            if not is_last:
                x = _downsample_s2d(x)
                x = Conv2d(dim_out, kernel_size=1, dtype=self.dtype)(x)
            else:
                x = Conv2d(dim_out, kernel_size=3, dtype=self.dtype)(x)

        mid_dim = dims[-1]
        x = UnetResnetBlock(mid_dim, groups, dtype=self.dtype)(x, t)
        x = _PreNormResidual(UnetAttention(dtype=self.dtype))(x)
        x = UnetResnetBlock(mid_dim, groups, dtype=self.dtype)(x, t)

        for ind, (dim_in, dim_out) in enumerate(reversed(in_out)):
            is_last = ind == len(in_out) - 1
            x = jnp.concatenate([x, h_stack.pop()], axis=-1)
            x = UnetResnetBlock(dim_out, groups, dtype=self.dtype)(x, t)
            x = jnp.concatenate([x, h_stack.pop()], axis=-1)
            x = UnetResnetBlock(dim_out, groups, dtype=self.dtype)(x, t)
            x = _PreNormResidual(UnetLinearAttention(dtype=self.dtype))(x)
            if not is_last:
                b, hh, ww, cc = x.shape
                x = jax.image.resize(x, (b, hh * 2, ww * 2, cc), method="nearest")
                x = Conv2d(dim_in, kernel_size=3, dtype=self.dtype)(x)
            else:
                x = Conv2d(dim_in, kernel_size=3, dtype=self.dtype)(x)

        x = jnp.concatenate([x, r], axis=-1)
        x = UnetResnetBlock(self.dim, groups, dtype=self.dtype)(x, t)
        out_dim = self.out_dim or self.channels * (2 if self.learned_variance else 1)
        return Conv2d(out_dim, kernel_size=1, dtype=self.dtype)(x).astype(jnp.float32)
