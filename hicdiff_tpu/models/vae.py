"""Convolutional VAE for Hi-C patches — the module the reference lost.

Re-designs `src/Utils/loss/vae_loss.py:8-29`: the reference's VaeLoss loads a
pretrained `Models.VAE_Module.VAE_Model` (hyperparams condensed_latent / gamma /
kld_weight / latent_dim / lr / pre_latent from a yaml) and scores MSE between
the encoder means of output and target — but `Models.VAE_Module` does not exist
anywhere in the reference tree (SURVEY.md §2.6: dead import), so the loss is
unrunnable as shipped. This module supplies a working VAE with the same
hyperparameter surface and a `get_z`-equivalent (`encode`) so the latent
perceptual loss (`metrics.losses.vae_latent_loss`) is a live, trainable
component here.

TPU notes: NHWC, everything shape-static and jit-able; the encoder is four
stride-2 3x3 convs (64x64 -> 4x4) feeding the pre-latent/latent dense pair, the
decoder mirrors with ConvTranspose. beta-VAE weighting (gamma * kld_weight)
follows the reference's hyperparameter names.
"""
from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class VAEModel(nn.Module):
    """VAE over (b, 64, 64, 1) patches in [-1, 1].

    Hyperparameter names mirror the reference yaml surface
    (`vae_loss.py:16-22`); `lr` is a training-driver concern and lives with the
    optimizer, not the module.
    """

    latent_dim: int = 128
    pre_latent: int = 512
    condensed_latent: int = 64  # bottleneck width of the conv stack's last stage
    gamma: float = 1.0
    kld_weight: float = 1e-3
    channels: int = 1

    def setup(self):
        widths = (32, 64, 64, self.condensed_latent)
        self.enc_convs = [
            nn.Conv(w, (3, 3), strides=(2, 2), name=f"enc{i}")
            for i, w in enumerate(widths)
        ]
        self.enc_dense = nn.Dense(self.pre_latent, name="enc_pre")
        self.mu_head = nn.Dense(self.latent_dim, name="mu")
        self.logvar_head = nn.Dense(self.latent_dim, name="logvar")
        self.dec_dense = nn.Dense(4 * 4 * self.condensed_latent, name="dec_pre")
        self.dec_convs = [
            nn.ConvTranspose(w, (3, 3), strides=(2, 2), name=f"dec{i}")
            for i, w in enumerate((64, 64, 32))
        ]
        self.dec_out = nn.ConvTranspose(
            self.channels, (3, 3), strides=(2, 2), name="dec_out"
        )

    def encode(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Return (mu, logvar) — the reference's `get_z(x)[1:]`."""
        h = x
        for conv in self.enc_convs:
            h = nn.silu(conv(h))
        h = h.reshape((h.shape[0], -1))
        h = nn.silu(self.enc_dense(h))
        return self.mu_head(h), self.logvar_head(h)

    def decode(self, z: jnp.ndarray) -> jnp.ndarray:
        h = nn.silu(self.dec_dense(z))
        h = h.reshape((h.shape[0], 4, 4, self.condensed_latent))
        for conv in self.dec_convs:
            h = nn.silu(conv(h))
        return jnp.tanh(self.dec_out(h))

    def get_z(
        self, x: jnp.ndarray, rng: jax.Array
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """(z, mu, logvar) with the reparameterization draw — reference
        `VaeLoss.forward`'s `pretrained_model.get_z` contract."""
        mu, logvar = self.encode(x)
        z = mu + jnp.exp(0.5 * logvar) * jax.random.normal(rng, mu.shape)
        return z, mu, logvar

    def __call__(self, x: jnp.ndarray, rng: jax.Array):
        z, mu, logvar = self.get_z(x, rng)
        return self.decode(z), mu, logvar

    def loss(self, x: jnp.ndarray, rng: jax.Array) -> jnp.ndarray:
        """beta-VAE ELBO: recon MSE + gamma*kld_weight*KL (hyperparam names
        from the reference yaml surface)."""
        recon, mu, logvar = self(x, rng)
        rec = jnp.mean((recon - x) ** 2)
        kld = -0.5 * jnp.mean(
            jnp.sum(1.0 + logvar - mu**2 - jnp.exp(logvar), axis=-1)
        )
        return rec + self.gamma * self.kld_weight * kld
