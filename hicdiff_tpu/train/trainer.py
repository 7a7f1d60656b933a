"""Training loop: pjit'd data-parallel step over a 1-D device mesh.

Re-design of /root/reference/train.py:44-190 (`HiCDiff.fit_model`): Adam lr 2e-5,
L2 diffusion loss, best-checkpoint-by-val-loss + final checkpoint, per-epoch
train/val logging. New vs the reference (which is single-GPU, fp32, no resume):

  * the train step is one jitted function over a `Mesh(('data',))` — batches are
    sharded across chips, params replicated, gradient psum inserted by XLA;
  * ragged final batches are zero-padded with a weight mask so every device gets
    identical shapes (loss = weighted mean, numerically equal to the reference's
    running loss accounting);
  * deterministic PRNG threading (per-step fold_in);
  * optional bf16 compute dtype in the model, fp32 params and loss.
"""
from __future__ import annotations

import os
import time
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from hicdiff_tpu.diffusion.gaussian import GaussianDiffusion
from hicdiff_tpu.parallel.mesh import (
    make_mesh,
    pad_batch,
    replicate,
    shard_batch,
)
from hicdiff_tpu.train.checkpoint import checkpoint_name, save_checkpoint
from hicdiff_tpu.train.logging import MetricLogger

__all__ = ["Trainer"]


class Trainer:
    """Data-parallel diffusion trainer bound to an engine + optimizer."""

    def __init__(
        self,
        engine: GaussianDiffusion,
        lr: float = 2e-5,
        mesh=None,
        grad_accum: int = 1,
        ema_decay: float = 0.0,
    ):
        """ema_decay > 0 maintains an exponential moving average of the params
        (saved alongside checkpoints). The reference has NO EMA — the upstream
        lucidrains Trainer that had it was stripped (SURVEY.md §2.9) — so this is
        an opt-in quality tool, default off for parity."""
        self.engine = engine
        self.ema_decay = ema_decay
        self.optimizer = optax.adam(lr)
        self.mesh = mesh if mesh is not None else make_mesh()
        self.n_devices = int(np.prod([self.mesh.devices.size]))
        assert grad_accum == 1, "grad accumulation not needed at this model scale"

        eng = engine

        def weighted_loss(params, rng, batch, weights):
            x_in = batch if eng.mode == "uncond" else (batch[0], batch[1])
            per = eng.p_losses(params, rng, x_in, reduce=False)
            return jnp.sum(per * weights) / jnp.maximum(jnp.sum(weights), 1.0)

        decay = ema_decay

        def train_step(params, opt_state, ema, rng, batch, weights):
            loss, grads = jax.value_and_grad(weighted_loss)(
                params, rng, batch, weights
            )
            updates, opt_state = self.optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            if decay > 0:
                ema = jax.tree.map(
                    lambda e, p: decay * e + (1.0 - decay) * p, ema, params
                )
            return params, opt_state, ema, loss

        def eval_step(params, rng, batch, weights):
            return weighted_loss(params, rng, batch, weights)

        self._train_step = jax.jit(train_step, donate_argnums=(0, 1, 2))
        self._eval_step = jax.jit(eval_step)

    # ------------------------------------------------------------------ setup
    def init(self, rng) -> Tuple:
        params = self.engine.init_params(rng)
        opt_state = self.optimizer.init(params)
        params = replicate(self.mesh, params)
        opt_state = replicate(self.mesh, opt_state)
        return params, opt_state

    def _prep_batch(self, data, target, pad_to: int = 0):
        """Pad to a fixed batch size (ONE compiled shape for the whole run — a
        ragged final batch would otherwise trigger a full recompile) and shard.
        The pad target is rounded up to a multiple of the device count so the
        batch dim always shards evenly (e.g. pad_to=60 on 8 chips -> 64)."""
        nd = self.n_devices
        multiple = -(-max(pad_to, 1) // nd) * nd
        (data, target), weights = pad_batch((data, target), multiple)
        data, target, weights = shard_batch(self.mesh, data, target, weights)
        if self.engine.mode == "uncond":
            return target, weights
        return (data, target), weights

    def train_step(self, params, opt_state, rng, data, target, pad_to: int = 0):
        """Public single-step API: prep/shard one (data, target) numpy batch and
        run the jitted step. Returns (params, opt_state, loss). Persistent EMA
        is threaded by fit(); here a throwaway copy keeps the jitted step's
        tree structure valid when ema_decay > 0."""
        batch, weights = self._prep_batch(data, target, pad_to)
        ema = (
            jax.tree.map(jnp.copy, params)
            if self.ema_decay > 0
            else jnp.zeros(())
        )
        params, opt_state, _, loss = self._train_step(
            params, opt_state, ema, rng, batch, weights
        )
        return params, opt_state, float(loss)

    @staticmethod
    def _weighted_mean(losses, sizes):
        if not losses:
            return 0.0
        w = jnp.asarray(sizes, jnp.float32)
        return float(jnp.stack(losses) @ w) / max(sum(sizes), 1)

    # ------------------------------------------------------------------- fit
    def fit(
        self,
        params,
        opt_state,
        train_loader,
        val_loader,
        *,
        epochs: int,
        rng,
        logger: Optional[MetricLogger] = None,
        ckpt_dir: Optional[str] = None,
        ckpt_tag: str = "HiCedrn_cond_l2_lin",
        ckpt_meta: Optional[dict] = None,
        log_every: int = 0,
        start_step: int = 0,
        ckpt_throttle_s: float = 0.0,
        run_config: Optional[dict] = None,
    ):
        """Epoch loop with best/final checkpointing (train.py:109-190).
        start_step: resume counter (keeps the PRNG fold-in sequence disjoint
        from the finished steps; the reference has no resume at all).
        ckpt_throttle_s: minimum seconds between best-checkpoint writes. The
        reference writes on every new-best epoch; on a remote-tunneled backend
        each write fetches the full parameter set to the host, so frequent
        early-training improvements dominate wall-clock. The running best
        params are kept ON DEVICE and the true best is always written at the
        end of fit, so throttling only affects mid-run crash recovery."""
        best_loss = float("inf")
        # (params, ema, opt_state, step) device-side copies of the best epoch
        # — opt_state included so a bestg checkpoint restores a CONSISTENT
        # (params, Adam moments, count) triple for --resume
        best_state = None
        last_ckpt_time = 0.0
        meta = ckpt_meta or {}
        pad_to = getattr(train_loader, "batch_size", 0)
        step = start_step
        # decay == 0: a scalar placeholder — donating params twice (as both
        # arg 0 and arg 2) would double-donate the same buffers
        ema = (
            jax.tree.map(jnp.copy, params)
            if self.ema_decay > 0
            else jnp.zeros(())
        )
        def write_best():
            if ckpt_dir and best_state is not None:
                b_params, b_ema, b_opt, b_step = best_state
                save_checkpoint(
                    os.path.join(
                        ckpt_dir, checkpoint_name("bestg", tag=ckpt_tag, **meta)
                    ),
                    b_params,
                    b_opt,
                    b_step,
                    ema_params=b_ema if self.ema_decay > 0 else None,
                    run_config=run_config,
                )

        for epoch in range(1, epochs + 1):
            t0 = time.time()
            # keep per-step losses as device arrays and reduce ONCE per epoch
            # (a float() per step is a blocking round-trip on remote backends;
            # even unjitted adds would dispatch one remote op per step)
            losses, sizes = [], []
            for data, target, _, _ in train_loader:
                batch, weights = self._prep_batch(data, target, pad_to)
                key = jax.random.fold_in(rng, step)
                params, opt_state, ema, loss = self._train_step(
                    params, opt_state, ema, key, batch, weights
                )
                losses.append(loss)
                sizes.append(data.shape[0])
                step += 1
                if log_every and step % log_every == 0 and logger:
                    logger.log({"step": step, "train/step_loss": float(loss)})
            train_loss = self._weighted_mean(losses, sizes)

            losses, sizes = [], []
            for i, (data, target, _, _) in enumerate(val_loader):
                batch, weights = self._prep_batch(data, target, pad_to)
                key = jax.random.fold_in(rng, 10_000_000 + step + i)
                losses.append(self._eval_step(params, key, batch, weights))
                sizes.append(data.shape[0])
            val_loss = self._weighted_mean(losses, sizes)

            if val_loss < best_loss:
                best_loss = val_loss
                # device-side snapshot; host fetch deferred to write_best()
                best_state = (
                    jax.tree.map(jnp.copy, params),
                    jax.tree.map(jnp.copy, ema) if self.ema_decay > 0 else None,
                    jax.tree.map(jnp.copy, opt_state),
                    step,
                )
                now = time.time()
                if now - last_ckpt_time >= ckpt_throttle_s:
                    write_best()
                    last_ckpt_time = now
            if logger:
                logger.log(
                    {
                        "Epoch": epoch,
                        "train/loss": train_loss,
                        "valid/loss": val_loss,
                        "epoch_seconds": time.time() - t0,
                    }
                )
        write_best()  # the true best always lands on disk
        if ckpt_dir:
            save_checkpoint(
                os.path.join(
                    ckpt_dir, checkpoint_name("finalg", tag=ckpt_tag, **meta)
                ),
                params,
                opt_state,
                step,
                ema_params=ema if self.ema_decay > 0 else None,
                run_config=run_config,
            )
        return params, opt_state, best_loss
