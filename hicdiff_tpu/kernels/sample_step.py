"""Fused DDPM posterior sampling step as a Pallas TPU kernel.

One reverse step outside the model forward is a chain of elementwise ops
(predict x0 from eps, clamp, posterior mean, sigma * noise add — reference
src/hicdiff.py:595-601) plus a fresh gaussian noise draw. The pure-JAX path
materializes the noise tensor from HBM; this kernel does the whole epilogue in
a single VMEM pass with on-chip PRNG (pltpu.prng_random_bits + Box-Muller), so
the only HBM traffic is x/eps in and x_next/x0 out.

This is a small fraction of a step's cost (the 32-block conv forward dominates
at ~96% MXU utilization), but it removes the noise round-trip and demonstrates
the kernels layer; it is exercised via engine.p_sample_step(..., fused=True).

Note: the kernel draws its own PRNG stream, so sampled trajectories differ
bitwise from the jax.random path while being statistically identical.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_posterior_step"]

_TWO_PI = 6.283185307179586


def _kernel(scalar_ref, seed_ref, x_ref, eps_ref, out_ref, x0_ref):
    # scalars: [a, b, c1, c2, sigma, noise_gate]; seed as a separate int32 slot
    # (a float32 slot would round seeds above 2^24 and collide noise streams)
    a = scalar_ref[0, 0]
    b = scalar_ref[0, 1]
    c1 = scalar_ref[0, 2]
    c2 = scalar_ref[0, 3]
    sigma = scalar_ref[0, 4]
    gate = scalar_ref[0, 5]
    pltpu.prng_seed(seed_ref[0, 0])

    x = x_ref[:]
    e = eps_ref[:]
    x0 = jnp.clip(a * x - b * e, -1.0, 1.0)
    mean = c1 * x0 + c2 * x

    # Box-Muller gaussian from two random draws, entirely on-chip.
    # The raw bits lower as int32 and Mosaic has no uint32->f32 cast, so mask
    # the sign bit and keep 24 high bits -> uniforms in [0, 1).
    def _uniform(bits):
        masked = jnp.bitwise_and(bits, jnp.int32(0x7FFFFFFF))
        return (masked >> 7).astype(jnp.float32) * (1.0 / 16777216.0)

    u1 = _uniform(pltpu.prng_random_bits(x.shape)) + 1e-7
    u2 = _uniform(pltpu.prng_random_bits(x.shape))
    z = jnp.sqrt(-2.0 * jnp.log(u1)) * jnp.cos(_TWO_PI * u2)

    out_ref[:] = mean + sigma * gate * z
    x0_ref[:] = x0


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_posterior_step(
    x: jnp.ndarray,
    eps: jnp.ndarray,
    sqrt_recip_acp_t,
    sqrt_recipm1_acp_t,
    post_coef1_t,
    post_coef2_t,
    post_log_var_t,
    noise_gate,
    seed,
    *,
    interpret: bool = False,
):
    """x_{t-1}, x0 from (x_t, predicted eps) and gathered schedule scalars.

    noise_gate is 1.0 for t>0, 0.0 at t==0 (zero final-step noise, hicdiff.py:599).
    """
    orig_shape = x.shape
    b = orig_shape[0]
    x2 = x.reshape(b, -1).astype(jnp.float32)
    e2 = eps.reshape(b, -1).astype(jnp.float32)
    sigma = jnp.exp(0.5 * post_log_var_t)
    scalars = jnp.stack(
        [
            sqrt_recip_acp_t,
            sqrt_recipm1_acp_t,
            post_coef1_t,
            post_coef2_t,
            sigma,
            noise_gate,
        ]
    ).reshape(1, 6).astype(jnp.float32)
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1, 1)

    # NB: the TPU interpreter (used for CPU tests) stubs prng_random_bits to
    # zeros — noise-dependent behavior is only real on hardware.
    out, x0 = pl.pallas_call(
        _kernel,
        out_shape=(
            jax.ShapeDtypeStruct(x2.shape, jnp.float32),
            jax.ShapeDtypeStruct(x2.shape, jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(scalars, seed_arr, x2, e2)
    return out.reshape(orig_shape), x0.reshape(orig_shape)
