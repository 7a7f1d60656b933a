"""Baseline (non-diffusion) model zoo, NHWC flax.

Re-designs of /root/reference/src/model/: hicplus.py (3-conv, unpadded ->
H-12), deephic.py (SRGAN-ish, swish+BN, tanh->[0,1]), hicsr.py (15-res-block
generator, unpadded final stack -> H-12, tanh), schicedrn_gan.py (hiedsr
generator == HicedrnGenerator in hicedrn.py + patch discriminator),
DAE_model.py (conv/deconv denoising autoencoder with skip adds), and
Unet_parts1.py (classic unet_2D, filters/4).

HiCARN: the reference imports `src/model/Hicarn.py` but the file is MISSING from
the repo (SURVEY.md quirk #6 — stard_metric_normal.py:17 crashes as shipped). We
provide a functional HiCARN-1-style cascading residual generator so the baseline
suite is actually runnable.

BatchNorm layers take a `train` flag; batch statistics live in the 'batch_stats'
collection per flax convention.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from hicdiff_tpu.models.common import Conv2d
from hicdiff_tpu.models.hicedrn import HicedrnGenerator  # the 'hiedsr' baseline

__all__ = [
    "HicPlus",
    "DeepHiC",
    "DeepHiCDiscriminator",
    "HiCSR",
    "HiCSRDiscriminator",
    "HiedsrDiscriminator",
    "DAE",
    "Unet2D",
    "HiCARN",
    "HicedrnGenerator",
]


def swish(x):
    return x * jax.nn.sigmoid(x)


class HicPlus(nn.Module):
    """hicplus.py:18-35: conv9(1->8) relu, conv1(8->8) relu, conv5(8->1) relu;
    NO padding, so output is H-12 x W-12 (the harness pads inputs by 6)."""

    @nn.compact
    def __call__(self, x):
        x = jax.nn.relu(Conv2d(8, kernel_size=9, padding=0)(x))
        x = jax.nn.relu(Conv2d(8, kernel_size=1, padding=0)(x))
        return jax.nn.relu(Conv2d(1, kernel_size=5, padding=0)(x))


class _BNResBlock(nn.Module):
    """deephic residualBlock: conv-bn-swish-conv-bn + x (deephic.py:11-23)."""

    channels: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = Conv2d(self.channels, 3)(x)
        h = nn.BatchNorm(use_running_average=not train)(h)
        h = swish(h)
        h = Conv2d(self.channels, 3)(h)
        h = nn.BatchNorm(use_running_average=not train)(h)
        return x + h


class DeepHiC(nn.Module):
    """deephic.py Generator (in_channel=1 in the live path): conv9 swish ->
    5 res blocks -> conv3-bn swish -> conv9 on (x+emb) -> (tanh+1)/2."""

    in_channel: int = 1
    resblock_num: int = 5

    @nn.compact
    def __call__(self, x, train: bool = False):
        emb = swish(Conv2d(64, kernel_size=9)(x))
        h = emb
        for _ in range(self.resblock_num):
            h = _BNResBlock(64)(h, train)
        h = Conv2d(64, kernel_size=3)(h)
        h = swish(nn.BatchNorm(use_running_average=not train)(h))
        out = Conv2d(self.in_channel, kernel_size=9)(h + emb)
        return (jnp.tanh(out) + 1) / 2


class DeepHiCDiscriminator(nn.Module):
    """deephic.py:47-78."""

    in_channel: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = lambda h: nn.BatchNorm(use_running_average=not train)(h)
        x = swish(Conv2d(64, 3)(x))
        x = swish(bn(nn.Conv(64, (3, 3), strides=2, padding=1)(x)))
        x = swish(bn(Conv2d(128, 3)(x)))
        x = swish(bn(nn.Conv(128, (3, 3), strides=2, padding=1)(x)))
        x = swish(bn(Conv2d(256, 3)(x)))
        x = swish(bn(nn.Conv(256, (3, 3), strides=2, padding=1)(x)))
        x = Conv2d(1, 1)(x)
        return jax.nn.sigmoid(x.mean(axis=(1, 2, 3)))


class HiCSR(nn.Module):
    """hicsr.py Generator: unpadded pre-block conv (H-2), 5..15 padded res
    blocks with BN, post conv+BN, then 5 unpadded convs (H-10 more) -> tanh.
    Net output H-12 (the harness pads by 6)."""

    num_res_blocks: int = 15

    @nn.compact
    def __call__(self, x, train: bool = False):
        first = jax.nn.relu(Conv2d(64, 3, padding=0)(x))
        h = first
        for _ in range(self.num_res_blocks):
            hh = Conv2d(64, 3)(h)
            hh = nn.BatchNorm(use_running_average=not train)(hh)
            hh = jax.nn.relu(hh)
            hh = Conv2d(64, 3)(hh)
            hh = nn.BatchNorm(use_running_average=not train)(hh)
            h = h + hh
        h = Conv2d(64, 3)(h)
        h = nn.BatchNorm(use_running_average=not train)(h)
        h = first + h
        for feats in (128, 128, 256, 256):
            h = Conv2d(feats, 3, padding=0)(h)
        h = Conv2d(1, 3, padding=0)(h)
        return jnp.tanh(h)


class HiCSRDiscriminator(nn.Module):
    """hicsr.py:64-95 (strided 4x4 convs, LeakyReLU 0.2)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        lrelu = lambda h: jax.nn.leaky_relu(h, 0.2)
        bn = lambda h: nn.BatchNorm(use_running_average=not train)(h)
        x = lrelu(nn.Conv(64, (4, 4), strides=2, padding=1, use_bias=False)(x))
        x = lrelu(bn(nn.Conv(128, (4, 4), strides=2, padding=1, use_bias=False)(x)))
        x = lrelu(bn(nn.Conv(256, (4, 4), strides=2, padding=1, use_bias=False)(x)))
        x = lrelu(bn(nn.Conv(512, (3, 3), strides=1, padding=1, use_bias=False)(x)))
        return nn.Conv(1, (1, 1), use_bias=False)(x)


class HiedsrDiscriminator(nn.Module):
    """schicedrn_gan.py:65-92 patch discriminator with sigmoid output."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        def cbl(h, feats, k, s):
            h = nn.Conv(feats, (k, k), strides=s, padding=1, use_bias=False)(h)
            h = nn.BatchNorm(use_running_average=not train)(h)
            return jax.nn.leaky_relu(h, 0.2)

        x = jax.nn.leaky_relu(Conv2d(64, 3)(x), 0.01)
        x = cbl(x, 64, 4, 2)
        x = cbl(x, 128, 3, 1)
        x = cbl(x, 128, 4, 2)
        x = cbl(x, 256, 3, 1)
        x = cbl(x, 256, 4, 2)
        x = cbl(x, 512, 3, 1)
        x = cbl(x, 512, 3, 1)
        return jax.nn.sigmoid(Conv2d(1, 3)(x))


class DAE(nn.Module):
    """DAE_model.py:7-50: 5 strided/same convs down, 5 deconvs up with skip adds
    every other layer, + input residual, tanh."""

    num_layers: int = 5
    num_features: int = 64

    @nn.compact
    def __call__(self, x):
        import math

        residual = x
        feats = self.num_features
        conv_feats = []
        h = x
        for i in range(self.num_layers):
            if i == 0:
                # torch Conv2d(k3, s2, p1) pads (1,1); XLA 'SAME' at stride 2
                # pads (0,1) — explicit padding keeps the grids aligned
                # (parity-tested vs DAE_model.py in test_baseline_parity.py)
                h = nn.Conv(feats, (3, 3), strides=2, padding=1)(h)
            else:
                h = Conv2d(feats, 3)(h)
            h = jax.nn.relu(h)
            if (i + 1) % 2 == 0 and len(conv_feats) < math.ceil(self.num_layers / 2) - 1:
                conv_feats.append(h)

        idx = 0
        for i in range(self.num_layers):
            if i < self.num_layers - 1:
                h = nn.ConvTranspose(feats, (3, 3), padding="SAME")(h)
                h = jax.nn.relu(h)
            else:
                # torch ConvTranspose2d(k3, s2, p1, output_padding=1) keeps
                # pads (1,2) of the dilated input; XLA 'SAME' distributes them
                # differently, so they are explicit (parity-tested)
                h = nn.ConvTranspose(
                    1, (3, 3), strides=(2, 2), padding=((1, 2), (1, 2))
                )(h)
            if (i + 1 + self.num_layers) % 2 == 0 and idx < len(conv_feats):
                h = h + conv_feats[-(idx + 1)]
                idx += 1
                h = jax.nn.relu(h)
        return jnp.tanh(h + residual)


# unet_2D init parity (Unet_parts1.py:94,10-69 init_params -> kaiming): torch
# kaiming_normal_(a=0, mode='fan_in') is a plain normal with var 2/fan_in;
# BatchNorm weight ~ N(1, 0.02), bias 0.
_kaiming = nn.initializers.variance_scaling(2.0, "fan_in", "normal")


def _bn_scale_init(key, shape, dtype=jnp.float32):
    return 1.0 + 0.02 * jax.random.normal(key, shape, dtype)


class _DoubleConv(nn.Module):
    """unetConv2 (Unet_parts1.py:72-99), kaiming-initialized (:94)."""

    out_channels: int
    mid_channels: Optional[int] = None
    use_bn: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        mid = self.mid_channels or self.out_channels
        x = nn.Conv(mid, (3, 3), padding=1, use_bias=False,
                    kernel_init=_kaiming)(x)
        if self.use_bn:
            x = nn.BatchNorm(use_running_average=not train,
                             scale_init=_bn_scale_init)(x)
        x = jax.nn.relu(x)
        x = nn.Conv(self.out_channels, (3, 3), padding=1, use_bias=False,
                    kernel_init=_kaiming)(x)
        if self.use_bn:
            x = nn.BatchNorm(use_running_average=not train,
                             scale_init=_bn_scale_init)(x)
        return jax.nn.relu(x)


class Unet2D(nn.Module):
    """unet_2D (Unet_parts1.py:154-227): filters [16,32,64,128,256] at
    feature_scale=4, maxpool downs, deconv ups with skip concat, sigmoid out."""

    feature_scale: int = 4
    n_classes: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        filters = [f // self.feature_scale for f in (64, 128, 256, 512, 1024)]
        pool = lambda h: nn.max_pool(h, (2, 2), strides=(2, 2))

        c1 = _DoubleConv(filters[0])(x, train)
        c2 = _DoubleConv(filters[1])(pool(c1), train)
        c3 = _DoubleConv(filters[2])(pool(c2), train)
        c4 = _DoubleConv(filters[3])(pool(c3), train)
        center = _DoubleConv(filters[4])(pool(c4), train)

        def up(skip, h, feats):
            h = nn.ConvTranspose(feats, (4, 4), strides=(2, 2), padding="SAME",
                                 kernel_init=_kaiming)(h)
            h = jnp.concatenate([h, skip], axis=-1)
            return _DoubleConv(feats)(h, train)

        u4 = up(c4, center, filters[3])
        u3 = up(c3, u4, filters[2])
        u2 = up(c2, u3, filters[1])
        u1 = up(c1, u2, filters[0])
        final = nn.Conv(self.n_classes, (1, 1), kernel_init=_kaiming)(u1)
        return jax.nn.sigmoid(final)


class HiCARN(nn.Module):
    """HiCARN-1-style cascading residual generator.

    The reference imports src/model/Hicarn.py which is ABSENT from the repo
    (SURVEY.md quirk #6); this is a functional equivalent of the published
    HiCARN-1 (Generator(num_channels=64)): entry conv, 5 cascading blocks (each
    two residual sub-blocks with 1x1 cascade fusions), exit convs.
    """

    num_channels: int = 64

    @nn.compact
    def __call__(self, x):
        c = self.num_channels

        def res_block(h):
            y = jax.nn.relu(Conv2d(c, 3)(h))
            y = Conv2d(c, 3)(y)
            return jax.nn.relu(y + h)

        def cascading_block(h):
            b0 = o0 = h
            b1 = res_block(o0)
            o1 = jax.nn.relu(Conv2d(c, 1)(jnp.concatenate([b0, b1], axis=-1)))
            b2 = res_block(o1)
            o2 = jax.nn.relu(Conv2d(c, 1)(jnp.concatenate([b0, b1, b2], axis=-1)))
            return o2

        h = Conv2d(c, 3)(x)
        entry = h
        blocks = [h]
        for _ in range(5):
            h = cascading_block(h)
            blocks.append(h)
            h = jax.nn.relu(Conv2d(c, 1)(jnp.concatenate(blocks, axis=-1)))
        h = Conv2d(c, 3)(h + entry)
        return Conv2d(1, 3)(h)
