"""Progressive-distillation tests on the 8-device virtual CPU mesh.

Grid alignment with the deployment sampler, loss decrease over a stage, and
the 1-step student's deployment-equivalence: inference at --sampling-steps 1
over the truncated grid is exactly one model call on sqrt(acp[t*]) * y.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from hicdiff_tpu.diffusion.gaussian import GaussianDiffusion
from hicdiff_tpu.models.hicedrn import HicedrnDiff
from hicdiff_tpu.train.distill import (
    ProgressiveDistiller,
    halving_stages,
    stage_grid,
)
from tests.test_trainer import FakeLoader


def make_cond_engine(t_start=5, size=16, timesteps=20):
    model = HicedrnDiff(self_condition=True, number_resnet=2)
    eng = GaussianDiffusion.create(
        model, image_size=size, timesteps=timesteps, loss_type="l2",
        beta_schedule="sigmoid", mode="cond",
    )
    return dataclasses.replace(eng, t_start=t_start)


def test_halving_stages():
    assert halving_stages(30) == [30, 15, 8, 4, 2, 1]
    assert halving_stages(1) == [1]


def test_stage_grid_matches_ddim_sampler_grid():
    """The student's training grid must be bitwise the grid ddim_sample uses
    (gaussian.py:412) — that is what makes a distilled checkpoint consumable
    by `inference.py --t-start auto --sampling-steps K` with no new code."""
    for top, k in [(29, 15), (29, 8), (29, 1), (5, 3), (499, 4)]:
        times = np.linspace(-1, top, k + 1).astype(int)[::-1]  # gaussian.py:412
        np.testing.assert_array_equal(stage_grid(top, k), times)


def test_distill_stage_loss_decreases():
    eng = make_cond_engine()
    rng = jax.random.PRNGKey(0)
    teacher = eng.init_params(rng)
    distiller = ProgressiveDistiller(eng, student_steps=3, lr=1e-3)
    loader = FakeLoader(n=16, batch=8)

    losses = []

    class Cap:
        def log(self, d):
            losses.append(d["distill/val_loss"])

    student, best = distiller.fit(
        teacher, loader, loader, steps=12, rng=rng, logger=Cap()
    )
    assert np.isfinite(best)
    assert losses[-1] <= losses[0] * 1.05  # decreasing (small tolerance)
    # student stays a valid parameter tree for the deployment sampler
    eng_k = dataclasses.replace(eng, sampling_timesteps=3)
    out = eng_k.ddim_sample(
        student, rng, jnp.zeros((2, 16, 16, 1), jnp.float32)
    )
    assert np.isfinite(np.asarray(out)).all()


def test_one_step_student_is_single_forward():
    """K=1 inference: ddim_sample truncated with sampling_timesteps=1 must
    equal one model_predictions call on the deterministic init — the exact
    function the 1-step student was trained as."""
    eng = make_cond_engine()
    eng1 = dataclasses.replace(eng, sampling_timesteps=1)
    rng = jax.random.PRNGKey(1)
    params = eng.init_params(rng)
    y = jnp.clip(
        jax.random.normal(jax.random.PRNGKey(2), (2, 16, 16, 1)) * 0.3, -1, 1
    )

    out = eng1.ddim_sample(params, rng, y)

    acp = jnp.take(eng.schedule.alphas_cumprod, eng.t_start)
    x_init = jnp.sqrt(acp) * y
    t = jnp.full((2,), eng.t_start, jnp.int32)
    preds = eng.model_predictions(params, x_init, t, y, clip_x_start=True)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(preds.pred_x_start), rtol=0, atol=1e-6
    )


def test_distilled_checkpoint_flows_through_chunked_sampler():
    """A stage checkpoint must run through the chunked dispatch path too."""
    eng = make_cond_engine()
    rng = jax.random.PRNGKey(0)
    params = eng.init_params(rng)
    eng_k = dataclasses.replace(eng, sampling_timesteps=2)
    y = jnp.clip(
        jax.random.normal(jax.random.PRNGKey(3), (4, 16, 16, 1)) * 0.3, -1, 1
    )
    direct = eng_k.ddim_sample(params, rng, y)
    chunked = eng_k.chunked_sampler(chunk_steps=1)(params, rng, y)
    np.testing.assert_allclose(
        np.asarray(direct), np.asarray(chunked), rtol=0, atol=1e-6
    )
