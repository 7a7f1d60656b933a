"""Composite training losses for the GAN/SR baselines.

Re-designs of /root/reference/src/Utils/loss/{Hiedsr_loss,Hiedsrgan_loss,
deepLoss,fe_rec_loss}.py. The perceptual term in the reference uses
torchvision's ImageNet-pretrained VGG19[:35] / VGG16[:31] feature stacks; this
zero-egress image cannot download those weights, so the perceptual network is a
VGG-shaped feature extractor whose params are supplied by the caller — pass
`load_vgg_params(path)` output when pretrained weights are available on disk, or
`init_vgg_params(rng)` for a random (LeCun-init) feature extractor, which is a
documented, literature-supported stand-in (random VGG features still encode
useful perceptual structure). The loss weighting/arithmetics match the reference
exactly.

All image tensors here are NHWC.
"""
from __future__ import annotations

from typing import Callable, List, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = [
    "tv_loss",
    "VGGFeatures",
    "init_vgg_params",
    "load_vgg_params",
    "hiedsr_generator_loss",
    "hiedsr_gan_generator_loss",
    "deephic_generator_loss",
    "feature_reconstruction_loss",
]


def tv_loss(x: jnp.ndarray, weight: float = 1.0) -> jnp.ndarray:
    """Total-variation loss (Hiedsr_loss.py:31-46), NHWC."""
    b, h, w, c = x.shape
    count_h = (h - 1) * w * c
    count_w = h * (w - 1) * c
    h_tv = jnp.sum((x[:, 1:, :, :] - x[:, : h - 1, :, :]) ** 2)
    w_tv = jnp.sum((x[:, :, 1:, :] - x[:, :, : w - 1, :]) ** 2)
    return weight * 2 * (h_tv / count_h + w_tv / count_w) / b


# VGG19 feature config up to layer 35 (conv/M = maxpool), torchvision ordering
_VGG19_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
              512, 512, 512, 512, "M", 512, 512, 512, 512]
# VGG16 features up to layer 31
_VGG16_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
              512, 512, 512, "M", 512, 512, 512]


class VGGFeatures(nn.Module):
    """VGG-style convolutional feature stack (perceptual network).

    variant='vgg19_35' reproduces torchvision vgg19.features[:35] topology
    (Hiedsr_loss.py:10-11); 'vgg16_31' reproduces vgg16.features[:31]
    (deepLoss.py:8-9). Input is single-channel and is repeated to 3 channels
    like the reference's `.repeat([1,3,1,1])`.
    """

    variant: str = "vgg19_35"

    @nn.compact
    def __call__(self, x):
        cfg = _VGG19_CFG if self.variant == "vgg19_35" else _VGG16_CFG
        if x.shape[-1] == 1:
            x = jnp.tile(x, (1, 1, 1, 3))
        for v in cfg:
            if v == "M":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            else:
                x = nn.Conv(v, (3, 3), padding=1)(x)
                x = jax.nn.relu(x)
        return x


def init_vgg_params(rng, variant: str = "vgg19_35", image_size: int = 64):
    """Random (LeCun-init) perceptual-network params — the zero-egress
    stand-in for torchvision's ImageNet weights (module docstring)."""
    model = VGGFeatures(variant=variant)
    return model.init(rng, jnp.zeros((1, image_size, image_size, 1)))["params"]


def load_vgg_params(path: str):
    """Load saved VGGFeatures params (train.checkpoint msgpack layout) for
    when pretrained perceptual weights are available on disk."""
    from hicdiff_tpu.train.checkpoint import load_checkpoint

    ck = load_checkpoint(path)
    return ck["params"] if isinstance(ck, dict) and "params" in ck else ck


def _perception_loss(vgg_apply, out_images, target_images):
    out_feat = vgg_apply(out_images)
    target_feat = jax.lax.stop_gradient(vgg_apply(target_images))
    b = out_feat.shape[0]
    return jnp.mean(
        (out_feat.reshape(b, -1) - target_feat.reshape(b, -1)) ** 2
    )


def hiedsr_generator_loss(vgg_apply, out_images, target_images):
    """Hiedsr_loss.GeneratorLoss (no adversarial term):
    total = mse + 0.001*perception + 2e-8*tv. Returns (image, percep, tv, total)."""
    image_loss = jnp.mean((out_images - target_images) ** 2)
    perception = _perception_loss(vgg_apply, out_images, target_images)
    tv = tv_loss(out_images)
    total = image_loss + 0.001 * perception + 2e-8 * tv
    return image_loss, perception, tv, total


def hiedsr_gan_generator_loss(vgg_apply, out_labels, out_images, target_images,
                              weights=None):
    """Hiedsrgan_loss.GeneratorLoss: adds 2e-3 * (1 - D(out)).

    weights=None reproduces the reference arithmetic (plain batch means).
    With a (b,) 0/1 pad mask every term becomes a per-sample weighted mean so
    wrap-padded repeat rows contribute no gradient (out_labels must then be
    per-sample D scores, shape (b,) or broadcastable to it)."""
    if weights is None:
        adversarial = jnp.mean(1.0 - out_labels)
        image_loss = jnp.mean((out_images - target_images) ** 2)
        perception = _perception_loss(vgg_apply, out_images, target_images)
        tv = tv_loss(out_images)
    else:
        b = out_images.shape[0]
        wsum = jnp.maximum(jnp.sum(weights), 1.0)
        wmean = lambda per: jnp.sum(per * weights) / wsum
        adversarial = wmean(1.0 - jnp.reshape(out_labels, (b, -1)).mean(axis=-1))
        image_loss = wmean(
            jnp.mean((out_images - target_images) ** 2, axis=(1, 2, 3))
        )
        out_feat = vgg_apply(out_images).reshape(b, -1)
        target_feat = jax.lax.stop_gradient(vgg_apply(target_images)).reshape(b, -1)
        perception = wmean(jnp.mean((out_feat - target_feat) ** 2, axis=-1))
        # per-sample TV with the reference's count/b normalization preserved
        _, h, w, c = out_images.shape
        h_tv = jnp.sum(
            (out_images[:, 1:] - out_images[:, :-1]) ** 2, axis=(1, 2, 3)
        ) / ((h - 1) * w * c)
        w_tv = jnp.sum(
            (out_images[:, :, 1:] - out_images[:, :, :-1]) ** 2, axis=(1, 2, 3)
        ) / (h * (w - 1) * c)
        tv = wmean(2.0 * (h_tv + w_tv))
    total = image_loss + 0.001 * perception + 2e-8 * tv + 2e-3 * adversarial
    return image_loss, perception, tv, total


def deephic_generator_loss(vgg_apply, out_labels, out_images, target_images):
    """deepLoss.GeneratorLoss (VGG16): mse + 0.001*adv(detached) +
    0.006*perception + 2e-8*tv — scalar total only, like the reference."""
    adversarial = jax.lax.stop_gradient(jnp.mean(1.0 - out_labels))
    image_loss = jnp.mean((out_images - target_images) ** 2)
    perception = _perception_loss(vgg_apply, out_images, target_images)
    tv = tv_loss(out_images)
    return image_loss + 0.001 * adversarial + 0.006 * perception + 2e-8 * tv


def vae_latent_loss(
    encode_fn: Callable[[jnp.ndarray], Sequence[jnp.ndarray]],
    output: jnp.ndarray,
    target: jnp.ndarray,
) -> jnp.ndarray:
    """vae_loss.VaeLoss.forward (`src/Utils/loss/vae_loss.py:25-29`): MSE
    between the pretrained VAE-encoder means of output and target (the latent
    perceptual loss). `encode_fn` maps a patch batch to (mu, logvar) — bind it
    from a trained `models.vae.VAEModel` (the reference's `Models.VAE_Module`
    is a dead import; see that module's docstring). The target encoding is a
    fixed perceptual anchor, so gradients flow through the output branch only.
    """
    mu_out, _ = encode_fn(output)
    mu_target = jax.lax.stop_gradient(encode_fn(target)[0])
    return jnp.mean((mu_target - mu_out) ** 2)


def feature_reconstruction_loss(
    encoder_feats_fn: Callable[[jnp.ndarray], Sequence[jnp.ndarray]],
    prediction: jnp.ndarray,
    target: jnp.ndarray,
) -> jnp.ndarray:
    """fe_rec_loss.FeatureReconstructionLoss: sum of MSEs between DAE-encoder
    activations at several depths (layers [0..4]). `encoder_feats_fn` maps an
    image to the list of per-layer activations (built from a trained DAE)."""
    total = 0.0
    pred_feats = encoder_feats_fn(prediction)
    target_feats = [jax.lax.stop_gradient(f) for f in encoder_feats_fn(target)]
    for pf, tf in zip(pred_feats, target_feats):
        total = total + jnp.mean((pf - tf) ** 2)
    return total
