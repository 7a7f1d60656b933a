"""DDRM posterior sampler, TPU-native.

Re-design of /root/reference/src/functions/denoising.py:11-111
(`efficient_generalized_steps`): the same spectral-space variational updates, but
expressed as one `jax.lax.scan` over the timestep sequence so the whole restoration
chain compiles to a single XLA program (the reference runs a Python loop with six
V/Vt transforms + one model forward per step).

Two entry styles:
  * `ddrm_sample` / `efficient_generalized_steps` — the whole chain as ONE
    jittable call (the parity-tested form);
  * `make_chunked_ddrm_sampler` — the same chain split into scan segments of
    bounded length, each a separate XLA execution, so long chains at large
    batch stay under the tunneled-TPU worker's ~3-min single-execution limit
    (CLAUDE.md). Bitwise identical to the one-shot form (same rng threading).

All spectral operators come from hicdiff_tpu.degrade.operators; `model_fn` is any
callable (x, t_batch) -> predicted noise, typically the inner backbone of a trained
unconditional GaussianDiffusion (inference.py:108-109 passes `diffusion.model`).
"""
from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from hicdiff_tpu.degrade.operators import HFunction

__all__ = [
    "efficient_generalized_steps",
    "ddrm_sample",
    "make_chunked_ddrm_sampler",
    "ddrm_truncation_timestep",
    "ddrm_auto_t_start",
]


def _compute_alpha_table(betas: jnp.ndarray) -> jnp.ndarray:
    """cumprod(1-beta) with a leading 1 so index t+1 == alpha-bar_t
    (denoising.py:6-9)."""
    return jnp.concatenate(
        [jnp.ones((1,), betas.dtype), jnp.cumprod(1.0 - betas)]
    )


def _chain_pieces(
    rng,
    model_fn: Callable,
    betas: jnp.ndarray,
    h_funcs: HFunction,
    y_0: jnp.ndarray,
    sigma_0: float,
    x_shape,
    seq: Sequence[int],
    etaB: float,
    etaA: float,
    etaC: float,
    exact_init: bool = False,
):
    """Build the (init, step) pair sharing one spectral context.

    Traceable — called inside jit by both the one-shot and chunked paths so
    the spectral math lives in exactly one place. `rng` is the chain key:
    per-step noise keys are fold_in(rng, timestep), independent of how the
    step axis is segmented.
    """
    b, h, w, c = x_shape
    d = c * h * w
    alpha_table = _compute_alpha_table(betas.astype(jnp.float32))

    singulars = h_funcs.singulars()  # (M,)
    m = singulars.shape[0]
    u_t_y = h_funcs.Ut(y_0)  # (B, My) with My <= M in general
    my = u_t_y.shape[-1]
    sig_head = singulars[:my]
    # guarded divide: zero-singular directions are never selected by case B's
    # mask (singulars*sigma_next > sigma_0), so the value there is irrelevant
    sig_inv_u_t_y = u_t_y / jnp.where(sig_head == 0, 1.0, sig_head)

    # Sigma padded to the full pixel dimension (denoising.py:15-16)
    Sigma = jnp.zeros((d,), jnp.float32).at[:m].set(singulars)
    safe_sing = jnp.where(singulars == 0, 1.0, singulars)

    def init(x):
        """Spectral-space init of x_T from y_0 (denoising.py:20-41)."""
        largest_alpha = alpha_table[seq[-1] + 1]
        largest_sigma = jnp.sqrt(1 - largest_alpha) / jnp.sqrt(largest_alpha)
        large_mask_m = singulars * largest_sigma > sigma_0  # (M,)

        inv_sing_zero = jnp.zeros((d,), jnp.float32)
        inv_sing_zero = inv_sing_zero.at[:m].set(
            jnp.where(large_mask_m, sigma_0 / safe_sing, 0.0)
        )

        init_y = jnp.zeros((b, d), jnp.float32)
        head_vals = jnp.where(
            large_mask_m[:my],
            u_t_y / jnp.where(sig_head == 0, 1.0, sig_head),
            0.0,
        )
        init_y = init_y.at[:, :my].set(head_vals)
        remaining_s = jnp.clip(largest_sigma**2 - inv_sing_zero**2, 0.0, None)
        init_y = init_y + jnp.sqrt(remaining_s)[None, :] * x.reshape(b, d)
        init_y = init_y / largest_sigma
        out = h_funcs.V(init_y).reshape(b, h, w, c)
        if exact_init:
            # The division above puts the spectral state on the x0+sigma*eps
            # scale divided by sigma; the step convention is
            # xt = sqrt(acp)*(x0 + sigma(t)*eps), so the exact xt is
            # sqrt(acp)*sigma * out = sqrt(1-acp) * out. The reference omits
            # this factor (denoising.py:39-41) — harmless at its only start
            # point t=T-1 where sqrt(1-acp) ~= 1 (0.99998 on the production
            # schedule), but ~0.1 at a truncated start t*=27, so the
            # truncation path applies it (PARITY #33).
            out = jnp.sqrt(1.0 - largest_alpha) * out
        return out

    def step(carry, pair):
        """One spectral update (denoising.py:48-104)."""
        xt, _ = carry
        i, j = pair[0], pair[1]
        at = alpha_table[i + 1]
        at_next = alpha_table[j + 1]

        t_batch = jnp.full((b,), i, dtype=jnp.int32)
        et = model_fn(xt, t_batch)
        x0_t = (xt - et * jnp.sqrt(1 - at)) / jnp.sqrt(at)

        sigma = jnp.sqrt(1 - at) / jnp.sqrt(at)
        sigma_next = jnp.sqrt(1 - at_next) / jnp.sqrt(at_next)

        v_t_x0 = h_funcs.Vt(x0_t)  # (B, D)
        svt_x0_head = (v_t_x0 * Sigma)[:, :my]
        v_t_et = h_funcs.Vt(et)

        cond_before_m = singulars * sigma_next > sigma_0  # (M,)
        cond_after_m = singulars * sigma_next < sigma_0
        cond_before = jnp.zeros((d,), bool).at[:m].set(cond_before_m)
        cond_after = jnp.zeros((d,), bool).at[:m].set(cond_after_m)

        std_nextC = sigma_next * etaC
        sigma_tilde_nextC = jnp.sqrt(sigma_next**2 - std_nextC**2)
        std_nextA = sigma_next * etaA
        sigma_tilde_nextA = jnp.sqrt(sigma_next**2 - std_nextA**2)

        ratio = jnp.where(singulars == 0, 0.0, sigma_0**2 / safe_sing**2)
        diff_sigma_nextB_m = jnp.sqrt(
            jnp.clip(sigma_next**2 - ratio * etaB**2, 0.0, None)
        )  # (M,)

        key = jax.random.fold_in(rng, i)
        kC, kA, kB = jax.random.split(key, 3)
        nC = jax.random.normal(kC, (b, d))
        nA = jax.random.normal(kA, (b, d))
        nB = jax.random.normal(kB, (b, my))

        # case C — unobserved spectral directions (denoising.py:92)
        vt_next = v_t_x0 + sigma_tilde_nextC * v_t_et + std_nextC * nC

        # case A — less noisy than y (denoising.py:95-96)
        resid_head = (u_t_y - svt_x0_head) / sigma_0  # (B, My)
        resid = jnp.zeros((b, d)).at[:, :my].set(resid_head)
        case_a = v_t_x0 + sigma_tilde_nextA * resid + std_nextA * nA
        vt_next = jnp.where(cond_after[None, :], case_a, vt_next)

        # case B — noisier than y (denoising.py:99-100)
        case_b_head = (
            sig_inv_u_t_y * etaB
            + (1 - etaB) * v_t_x0[:, :my]
            + diff_sigma_nextB_m[:my] * nB
        )
        case_b = jnp.zeros((b, d)).at[:, :my].set(case_b_head)
        vt_next = jnp.where(cond_before[None, :], case_b, vt_next)

        xt_next = (jnp.sqrt(at_next) * h_funcs.V(vt_next)).reshape(b, h, w, c)
        return (xt_next, x0_t), None

    return init, step


def ddrm_truncation_timestep(
    betas, sigma_0: float, singulars_min: float = 1.0
) -> int:
    """Smallest chain timestep whose noise level exceeds the measurement's.

    DDRM's spectral init (denoising.py:20-41) places every observed direction
    at `y/s + sqrt(sigma(t)^2 - (sigma_0/s)^2) * eps` whenever
    `s * sigma(t) > sigma_0`, where sigma(t) = sqrt(1-acp_t)/sqrt(acp_t) is
    the chain's noise coordinate. Starting the chain at the smallest t
    satisfying that inequality (for the operator's smallest nonzero singular
    value) makes the init exact-marginal — the measurement itself placed at
    its true noise level — so the T-1-t* higher-noise steps above it do no
    work and are skipped. This is the `-u 1` analog of the conditional
    `--t-start auto` rule (gaussian.GaussianDiffusion.truncation_timestep):
    for deno (all singulars 1) both rules solve acp(t*) ~= 1/(1+sigma_0^2).
    The inequality must be STRICT: the init mask `s * sigma > sigma_0`
    (denoising.py:24) falls back to a pure-noise init at equality.

    Host-side/static (numpy float64). Returns T-1 (the full chain) when the
    measurement is noisier than the whole schedule reaches.
    """
    betas64 = np.asarray(jax.device_get(betas), np.float64)
    acp = np.cumprod(1.0 - betas64)
    sig = np.sqrt(1.0 - acp) / np.sqrt(acp)  # sigma(t), t = 0..T-1, increasing
    ok = float(singulars_min) * sig > float(sigma_0)
    if not ok.any():
        return len(sig) - 1
    return int(np.argmax(ok))


def ddrm_auto_t_start(
    h_funcs: HFunction, betas, sigma_0: float, image_dim: int
):
    """Auto truncation start for an operator, or None when truncation is
    unsound for it.

    The exact-marginal argument behind `ddrm_truncation_timestep` covers the
    OBSERVED spectral directions only. Directions outside the operator's row
    space — zero singular values, or the `image_dim - len(singulars)` implicit
    missing directions of e.g. sr/cs/inpainting — are initialized by the
    spectral init (denoising.py:24-39) as sigma(t*) noise around ZERO, so the
    high-noise steps a truncated chain skips are exactly the phase where the
    prior synthesizes their content: truncating would leave near-zero garbage
    in the null space while the observed directions look fine. Returns the
    truncation timestep only for full-rank operators (every direction observed
    with a strictly positive singular value, e.g. deno/deblur); None otherwise,
    which callers must treat as "run the full chain".

    Host-side/static. `image_dim` is the flattened image dimension
    (channels * image_size**2).
    """
    s = np.asarray(jax.device_get(h_funcs.singulars()), np.float64)
    pos = s[s > 0]
    if pos.size < int(image_dim):
        return None
    return ddrm_truncation_timestep(
        betas, max(float(sigma_0), 1e-4), float(pos.min())
    )


def _build_seq(num_timesteps: int, timestep: int, t_start=None) -> list:
    """The chain's timestep sequence.

    Default (t_start None): the reference grid `range(0, T, T // timestep)`
    (metrics_diff.py:216-217). Truncated: an even grid over [0, t_start]
    with at most `timestep` entries, always ENDING exactly at t_start — the
    spectral init evaluates sigma(seq[-1]) and must sit at the exact-marginal
    timestep, not below it (below it the observed-direction mask flips and
    the init degrades to pure noise)."""
    if t_start is None:
        skip = max(num_timesteps // timestep, 1)
        return list(range(0, num_timesteps, skip))
    top = int(t_start)
    if not 0 <= top < num_timesteps:
        raise ValueError(
            f"t_start {top} outside [0, {num_timesteps})"
        )
    n = max(min(int(timestep), top + 1), 1)
    skip = max(-(-(top + 1) // n), 1)  # ceil: at most n entries pre-append
    seq = list(range(0, top + 1, skip))
    if seq[-1] != top:
        seq.append(top)
    return seq


def _step_pairs(seq: Sequence[int]) -> np.ndarray:
    """(t_i, t_next) rows in reverse-chain order (denoising.py:44-47)."""
    seq = [int(s) for s in seq]
    seq_next = [-1] + seq[:-1]
    return np.stack(
        [list(reversed(seq)), list(reversed(seq_next))], axis=1
    ).astype(np.int32)


def efficient_generalized_steps(
    rng,
    x: jnp.ndarray,
    seq: Sequence[int],
    model_fn: Callable,
    betas: jnp.ndarray,
    h_funcs: HFunction,
    y_0: jnp.ndarray,
    sigma_0: float,
    *,
    etaB: float = 1.0,
    etaA: float = 0.85,
    etaC: float = 0.85,
    exact_init: bool = False,
):
    """Run the DDRM chain. x is the (B, H, W, C) N(0,1) init; y_0 the degraded
    measurement batch. Returns (x_final, x0_pred_final)."""
    seq = list(int(s) for s in seq)
    init, step = _chain_pieces(
        rng, model_fn, betas, h_funcs, y_0, sigma_0, x.shape, seq,
        etaB, etaA, etaC, exact_init=exact_init,
    )
    x0_img = init(x)
    pairs = jnp.asarray(_step_pairs(seq))
    (x_final, x0_final), _ = jax.lax.scan(step, (x0_img, x0_img), pairs)
    return x_final, x0_final


def ddrm_sample(
    rng,
    model_fn: Callable,
    h_funcs: HFunction,
    y_0: jnp.ndarray,
    sigma_0: float,
    *,
    betas: jnp.ndarray,
    timestep: int = 1000,
    num_timesteps: int = 1000,
    etaB: float = 1.0,
    etaA: float = 0.85,
    etaC: float = 0.85,
    image_size: int = 64,
    channels: int = 1,
    t_start=None,
):
    """Harness-level entry matching metrics_diff.sample_image (metrics_diff.py:215-222):
    seq = range(0, num_timesteps, num_timesteps // timestep), x ~ N(0, I).

    `t_start` truncates the chain to [0, t_start] with an exact-marginal
    spectral init (see ddrm_truncation_timestep) — the measured-equal-quality
    fast path; None runs the reference's full-range grid."""
    seq = _build_seq(num_timesteps, timestep, t_start)
    b = y_0.shape[0]
    init_key, chain_key = jax.random.split(rng)
    x = jax.random.normal(init_key, (b, image_size, image_size, channels))
    return efficient_generalized_steps(
        chain_key, x, seq, model_fn, betas, h_funcs, y_0, sigma_0,
        etaB=etaB, etaA=etaA, etaC=etaC, exact_init=t_start is not None,
    )


def make_chunked_ddrm_sampler(
    model_fn: Callable,
    h_funcs: HFunction,
    sigma_0: float,
    *,
    betas: jnp.ndarray,
    timestep: int = 1000,
    num_timesteps: int = 1000,
    chunk_steps: int = 250,
    etaB: float = 1.0,
    etaA: float = 0.85,
    etaC: float = 0.85,
    image_size: int = 64,
    channels: int = 1,
    t_start=None,
):
    """Factory: `ddrm_sample` split into bounded scan segments.

    Returns fn(rng, y_0) -> x_final. Bitwise identical to
    ddrm_sample(...)[0] (same rng split, same fold_in(chain_key, t) step
    keys); the segments just partition the step axis so no single XLA
    execution exceeds `chunk_steps` model forwards (the ~3-min per-execution
    worker limit, CLAUDE.md). Segments dispatch asynchronously — no host
    sync, no pipeline bubble; at most two scan lengths are compiled.
    `t_start` truncates to [0, t_start] with the exact-marginal init
    (ddrm_truncation_timestep), matching ddrm_sample's truncated form.
    """
    if chunk_steps < 1:
        raise ValueError(f"chunk_steps must be >= 1, got {chunk_steps}")
    seq = _build_seq(num_timesteps, timestep, t_start)
    exact_init = t_start is not None
    pairs_np = _step_pairs(seq)

    @jax.jit
    def prologue(rng, y_0):
        init_key, chain_key = jax.random.split(rng)
        b = y_0.shape[0]
        x = jax.random.normal(init_key, (b, image_size, image_size, channels))
        init, _ = _chain_pieces(
            chain_key, model_fn, betas, h_funcs, y_0, sigma_0, x.shape, seq,
            etaB, etaA, etaC, exact_init=exact_init,
        )
        x0 = init(x)
        return chain_key, x0

    @jax.jit
    def seg(chain_key, carry, pairs, y_0):
        _, step = _chain_pieces(
            chain_key, model_fn, betas, h_funcs, y_0, sigma_0,
            carry[0].shape, seq, etaB, etaA, etaC,
        )
        return jax.lax.scan(step, carry, pairs)[0]

    # device-resident once: a per-call jnp.asarray would be one remote
    # transfer per segment per batch on the tunneled backend
    segments = tuple(
        jnp.asarray(pairs_np[i : i + chunk_steps])
        for i in range(0, len(pairs_np), chunk_steps)
    )

    def sample_fn(rng, y_0):
        chain_key, x0 = prologue(rng, y_0)
        carry = (x0, x0)
        for pairs in segments:
            carry = seg(chain_key, carry, pairs, y_0)
        return carry[0]

    return sample_fn
