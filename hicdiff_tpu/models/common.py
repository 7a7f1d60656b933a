"""Shared model building blocks, NHWC / TPU-native.

All modules here use channels-last (NHWC) layout — the layout XLA:TPU tiles best —
whereas the reference is NCHW torch. Initializers replicate torch defaults
(kaiming-uniform with a=sqrt(5) for conv/linear weights, U(+-1/sqrt(fan_in)) for
biases) so training-from-scratch dynamics match the reference
(/root/reference/src/model/hicedrn_Diff.py, src/hicdiff.py).
"""
from __future__ import annotations

import math
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

# torch nn.Conv2d / nn.Linear default weight init:
#   kaiming_uniform(a=sqrt(5)) == U(-sqrt(3*scale/fan_in), +...) with scale = 1/3
torch_kernel_init = nn.initializers.variance_scaling(
    1.0 / 3.0, mode="fan_in", distribution="uniform"
)


def torch_bias_init(fan_in: int) -> Callable:
    """torch default bias init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)

    return init


class Conv2d(nn.Module):
    """3x3/kxk conv with torch-default init, NHWC."""

    features: int
    kernel_size: int = 3
    padding: str | int = "SAME"
    use_bias: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        fan_in = in_ch * self.kernel_size * self.kernel_size
        pad = self.padding
        if isinstance(pad, int):
            pad = [(pad, pad), (pad, pad)]
        return nn.Conv(
            features=self.features,
            kernel_size=(self.kernel_size, self.kernel_size),
            padding=pad,
            use_bias=self.use_bias,
            kernel_init=torch_kernel_init,
            bias_init=torch_bias_init(fan_in),
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(x)


class Dense(nn.Module):
    """Linear layer with torch-default init."""

    features: int
    use_bias: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        return nn.Dense(
            features=self.features,
            use_bias=self.use_bias,
            kernel_init=torch_kernel_init,
            bias_init=torch_bias_init(fan_in),
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(x)


class SinusoidalPosEmb(nn.Module):
    """Sinusoidal timestep embedding (hicdiff.py:122-134).

    emb[i] = exp(-log(10000) * i / (half_dim - 1)); out = cat(sin(t*emb), cos(t*emb)).
    """

    dim: int

    @nn.compact
    def __call__(self, t):
        half_dim = self.dim // 2
        emb = math.log(10000) / (half_dim - 1)
        emb = jnp.exp(jnp.arange(half_dim, dtype=jnp.float32) * -emb)
        emb = t.astype(jnp.float32)[:, None] * emb[None, :]
        return jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=-1)


class LearnedSinusoidalPosEmb(nn.Module):
    """Learned (or random fourier) sinusoidal embedding (hicdiff.py:136-151).

    Output dim = dim + 1 (raw t is concatenated in front).
    """

    dim: int
    is_random: bool = False

    @nn.compact
    def __call__(self, t):
        half_dim = self.dim // 2
        weights = self.param(
            "weights", nn.initializers.normal(stddev=1.0), (half_dim,), jnp.float32
        )
        if self.is_random:
            weights = jax.lax.stop_gradient(weights)
        t = t.astype(jnp.float32)[:, None]
        freqs = t * weights[None, :] * 2 * math.pi
        fouriered = jnp.concatenate([jnp.sin(freqs), jnp.cos(freqs)], axis=-1)
        return jnp.concatenate([t, fouriered], axis=-1)


class TimeMLP(nn.Module):
    """sinu_pos_emb -> Linear -> GELU(exact) -> Linear (hicdiff.py:300-305).

    torch nn.GELU default is exact (erf), not tanh-approximate.
    """

    fourier_dim: int
    time_dim: int
    learned_sinusoidal: bool = False
    learned_sinusoidal_dim: int = 16
    random_fourier: bool = False

    @nn.compact
    def __call__(self, t):
        if self.learned_sinusoidal or self.random_fourier:
            x = LearnedSinusoidalPosEmb(
                self.learned_sinusoidal_dim, is_random=self.random_fourier
            )(t)
        else:
            x = SinusoidalPosEmb(self.fourier_dim)(t)
        x = Dense(self.time_dim)(x)
        x = jax.nn.gelu(x, approximate=False)
        x = Dense(self.time_dim)(x)
        return x


class SR3PositionalEncoding(nn.Module):
    """WaveGrad-style noise-level encoding (hicdiff_sr3.py:155-165).

    Takes a continuous noise level (sqrt alpha-bar) per batch element; output dim.
    encoding = level * 10^(arange(count)*4/count) then [sin, cos].
    """

    dim: int

    @nn.compact
    def __call__(self, noise_level):
        count = self.dim // 2
        step = jnp.arange(count, dtype=jnp.float32) / count
        encoding = noise_level.astype(jnp.float32)[:, None] * jnp.exp(
            -math.log(1e4) * step[None, :]
        )
        return jnp.concatenate([jnp.sin(encoding), jnp.cos(encoding)], axis=-1)


def layer_norm_channels(x, g, eps: float = 1e-5):
    """Reference LayerNorm over the channel axis (hicdiff.py:99-108), NHWC here.

    Biased variance, (x - mean) * rsqrt(var + eps) * g.
    """
    var = jnp.var(x, axis=-1, keepdims=True)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * g


class ChannelLayerNorm(nn.Module):
    """LayerNorm with learnable per-channel scale only (hicdiff.py:99-108)."""

    @nn.compact
    def __call__(self, x):
        g = self.param("g", nn.initializers.ones, (x.shape[-1],), jnp.float32)
        return layer_norm_channels(x, g)
