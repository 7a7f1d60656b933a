"""HicEDRN diffusion backbone family — the production model of the framework.

TPU-native re-design of /root/reference/src/model/hicedrn_Diff.py (base),
hicedrn_att_Diff.py (attention variant) and hicedrn_sr3_Diff.py (SR3 noise-level
variant). NHWC layout, fp32 params with a configurable compute dtype (bf16 for the
MXU fast path). Semantics preserved exactly:

  * head: 3x3 conv in_ch -> 256, in_ch doubles when self-conditioned
    (hicedrn_Diff.py:221-225).
  * time MLP: SinusoidalPosEmb(256) -> Linear(256,1024) -> GELU(exact) ->
    Linear(1024,1024) (hicedrn_Diff.py:238-243); the SR3 variant instead uses a
    WaveGrad PositionalEncoding over the continuous noise level
    (hicedrn_sr3_Diff.py:170-180,290-294).
  * 32 residual blocks, each applying ONE shared 3x3 conv TWICE
    (hicedrn_Diff.py:202-204) with scale-shift time conditioning after the first
    application only, SiLU in between, and a x0.1 residual scale
    (hicedrn_Diff.py:205) — the shared-weight + 0.1-scale quirks are load-bearing
    for checkpoint/numerics parity (SURVEY.md §7 "Hard parts").
  * attention variant inserts LinearAttention(256) after every 2nd block
    (hicedrn_att_Diff.py:259-268).
  * global residual around the body, body_tail conv, tail conv to out_dim
    (hicedrn_Diff.py:253-257,275-287).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from hicdiff_tpu.models.common import (
    ChannelLayerNorm,
    Conv2d,
    Dense,
    SR3PositionalEncoding,
    TimeMLP,
    layer_norm_channels,
)

N_FEAT = 256


class HicedrnResBlock(nn.Module):
    """Time-conditioned residual block with a single conv applied twice.

    hicedrn_Diff.py:182-208. dim == dim_out == N_FEAT in all uses, so res_conv is
    identity.
    """

    features: int = N_FEAT
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, time_emb):
        conv = Conv2d(self.features, kernel_size=3, dtype=self.dtype)  # shared weights
        te = Dense(self.features * 2, dtype=self.dtype)(jax.nn.silu(time_emb))
        scale, shift = jnp.split(te[:, None, None, :], 2, axis=-1)

        h = conv(x)
        h = h * (scale + 1) + shift
        h = jax.nn.silu(h)
        h = conv(h)  # second application of the SAME conv (shared weights)
        return h * 0.1 + x


class SR3ResBlock(nn.Module):
    """SR3 residual block: additive noise-level injection between the shared convs.

    hicedrn_sr3_Diff.py:245-265 (FeatureWiseAffine with use_affine_level=False).
    """

    features: int = N_FEAT
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, noise_emb):
        conv = Conv2d(self.features, kernel_size=3, dtype=self.dtype)  # shared weights
        h = conv(x)
        h = h + Dense(self.features, dtype=self.dtype)(noise_emb)[:, None, None, :]
        h = jax.nn.silu(h)
        h = conv(h)
        return h * 0.1 + x


class HicedrnLinearAttention(nn.Module):
    """Linear attention used by the attention variant (hicedrn_Diff.py:102-138).

    Pre-norm (channel LayerNorm), softmax-kernel linear attention, projection +
    post-norm, residual. heads=4, dim_head=32. The two einsum contractions are
    batched matmuls that XLA places on the MXU.
    """

    heads: int = 4
    dim_head: int = 32
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        residual = x
        hidden = self.heads * self.dim_head
        scale = self.dim_head**-0.5

        xn = ChannelLayerNorm()(x)
        qkv = Conv2d(hidden * 3, kernel_size=1, use_bias=False, dtype=self.dtype)(xn)
        # NHWC -> (b, heads, n, dim_head); torch packs channels as (heads, dim_head)
        qkv = qkv.reshape(b, h * w, 3, self.heads, self.dim_head)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # (b, n, heads, d)
        q = jnp.swapaxes(q, 1, 2)  # (b, heads, n, d)
        k = jnp.swapaxes(k, 1, 2)
        v = jnp.swapaxes(v, 1, 2)

        # reference: q softmax over the channel dim (d), k softmax over tokens (n)
        q = jax.nn.softmax(q, axis=-1)
        k = jax.nn.softmax(k, axis=-2)
        q = q * scale
        v = v / (h * w)

        # context[d, e] = sum_n k[n, d] * v[n, e]
        context = jnp.einsum(
            "bhnd,bhne->bhde", k, v, preferred_element_type=jnp.float32
        )
        # out[n, e] = sum_d context[d, e] * q[n, d]
        out = jnp.einsum(
            "bhde,bhnd->bhne", context, q, preferred_element_type=jnp.float32
        )
        out = jnp.swapaxes(out, 1, 2).reshape(b, h, w, hidden).astype(x.dtype)
        out = Conv2d(x.shape[-1], kernel_size=1, dtype=self.dtype)(out)
        out = ChannelLayerNorm()(out)
        return out + residual


class HicedrnDiff(nn.Module):
    """The hicedrn_Diff backbone (hicedrn_Diff.py:210-289).

    variant: 'base' | 'att' | 'sr3'.
    Call: model(x, time, x_self_cond) with x NHWC (b, 64, 64, channels); `time` is
    integer timesteps for base/att, or the continuous noise level (sqrt alpha-bar)
    for sr3.
    """

    channels: int = 1
    out_dim: Optional[int] = None
    number_resnet: int = 32
    self_condition: bool = False
    variant: str = "base"
    learned_sinusoidal_cond: bool = False
    learned_sinusoidal_dim: int = 16
    # n_feat, 256 in the reference (hicedrn_Diff.py:4); reducible for tests/CI
    features: int = N_FEAT
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, time, x_self_cond=None):
        assert self.variant in ("base", "att", "sr3")
        if self.self_condition:
            if x_self_cond is None:
                x_self_cond = jnp.zeros_like(x)
            # torch concatenates (cond, x) along channels (hicedrn_Diff.py:273)
            x = jnp.concatenate([x_self_cond, x], axis=-1)

        feat = self.features
        x = Conv2d(feat, kernel_size=3, dtype=self.dtype)(x)  # head
        r = x
        time_dim = feat * 4

        if self.variant == "sr3":
            emb = SR3PositionalEncoding(feat)(time)
            emb = Dense(time_dim, dtype=self.dtype)(emb)
            emb = jax.nn.gelu(emb, approximate=False)
            t_emb = Dense(time_dim, dtype=self.dtype)(emb)
        else:
            t_emb = TimeMLP(
                fourier_dim=feat,
                time_dim=time_dim,
                learned_sinusoidal=self.learned_sinusoidal_cond,
                learned_sinusoidal_dim=self.learned_sinusoidal_dim,
            )(time)
        t_emb = t_emb.astype(x.dtype)

        block_cls = SR3ResBlock if self.variant == "sr3" else HicedrnResBlock
        for i in range(self.number_resnet):
            x = block_cls(features=feat, dtype=self.dtype)(x, t_emb)
            if self.variant == "att" and (i + 1) % 2 == 0:
                x = HicedrnLinearAttention(dtype=self.dtype)(x)

        x = Conv2d(feat, kernel_size=3, dtype=self.dtype)(x)  # body_tail
        x = x + r
        out_dim = self.out_dim if self.out_dim is not None else self.channels
        out = Conv2d(out_dim, kernel_size=3, dtype=self.dtype)(x)  # tail
        return out.astype(jnp.float32)


class HicedrnGenerator(nn.Module):
    """Plain (non-diffusion) hicedrn Generator — the 'hiedsr' baseline backbone.

    hicedrn_Diff.py:10-54 / schicedrn_gan.py:26-62: head conv -> 32x
    (conv-relu-conv(shared) * 0.1 + x) -> trailing body conv -> global residual ->
    tail conv.
    """

    channels: int = 1
    number_blocks: int = 32
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        x = Conv2d(N_FEAT, kernel_size=3, dtype=self.dtype)(x)  # head
        r = x
        for _ in range(self.number_blocks):
            conv = Conv2d(N_FEAT, kernel_size=3, dtype=self.dtype)  # shared per block
            y = jax.nn.relu(conv(x))
            y = conv(y)
            x = y * 0.1 + x
        x = Conv2d(N_FEAT, kernel_size=3, dtype=self.dtype)(x)  # body tail conv
        x = x + r
        return Conv2d(self.channels, kernel_size=3, dtype=self.dtype)(x).astype(
            jnp.float32
        )
