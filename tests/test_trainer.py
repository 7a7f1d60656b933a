"""Trainer tests on the 8-device virtual CPU mesh: sharded training step, padded
ragged batches, checkpoint save/load round-trip."""
import os

import jax
import jax.numpy as jnp
import numpy as np

from hicdiff_tpu.diffusion.gaussian import GaussianDiffusion
from hicdiff_tpu.models.hicedrn import HicedrnDiff
from hicdiff_tpu.parallel.mesh import make_mesh, pad_batch
from hicdiff_tpu.train.checkpoint import load_checkpoint, save_checkpoint
from hicdiff_tpu.train.trainer import Trainer


class FakeLoader:
    """Loader yielding (data, target, samp, info) NHWC batches; last batch ragged."""

    def __init__(self, n=20, batch=8, size=16, seed=0):
        rng = np.random.default_rng(seed)
        self.target = np.clip(
            rng.normal(0, 0.3, (n, size, size, 1)), -1, 1
        ).astype(np.float32)
        self.data = np.clip(
            self.target + 0.1 * rng.normal(size=self.target.shape), -1, 1
        ).astype(np.float32)
        self.batch = batch

    def __iter__(self):
        for lo in range(0, len(self.target), self.batch):
            sel = slice(lo, lo + self.batch)
            d, t = self.data[sel], self.target[sel]
            yield d, t, d.reshape(d.shape[0], -1), np.ones(d.shape[0], np.int64)


def make_engine(mode, size=16):
    model = HicedrnDiff(
        self_condition=(mode == "cond"), number_resnet=2
    )
    return GaussianDiffusion.create(
        model, image_size=size, timesteps=8, loss_type="l2",
        beta_schedule="cosine", mode=mode,
    )


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8


def test_pad_batch():
    arrs, w = pad_batch((np.ones((5, 2)), np.ones((5,))), 8)
    assert arrs[0].shape == (8, 2) and arrs[1].shape == (8,)
    np.testing.assert_array_equal(w, [1, 1, 1, 1, 1, 0, 0, 0])
    arrs, w = pad_batch((np.ones((8, 2)),), 8)
    assert arrs[0].shape == (8, 2) and w.sum() == 8


def test_trainer_conditional_loss_decreases(tmp_path):
    eng = make_engine("cond")
    trainer = Trainer(eng, lr=1e-3)
    rng = jax.random.PRNGKey(0)
    params, opt_state = trainer.init(rng)
    loader = FakeLoader()

    losses = []

    class CaptureLogger:
        def log(self, m):
            if "valid/loss" in m:
                losses.append(m["valid/loss"])

    params, opt_state, best = trainer.fit(
        params, opt_state, loader, loader, epochs=4,
        rng=jax.random.fold_in(rng, 1),
        logger=CaptureLogger(),
        ckpt_dir=str(tmp_path),
        ckpt_tag="test",
        ckpt_meta=dict(res=40000, chunk=16, cell_line="Human", cell_no=1),
    )
    assert len(losses) == 4
    assert losses[-1] < losses[0]
    assert best <= min(losses) + 1e-9
    # best + final checkpoints exist
    files = os.listdir(tmp_path)
    assert any(f.startswith("bestg_") for f in files)
    assert any(f.startswith("finalg_") for f in files)

    # checkpoint round-trip restores identical params
    best_file = [f for f in files if f.startswith("bestg_")][0]
    ck = load_checkpoint(os.path.join(tmp_path, best_file))
    restored_leaves = jax.tree.leaves(ck["params"])
    assert len(restored_leaves) == len(jax.tree.leaves(params))


def test_trainer_uncond(tmp_path):
    eng = make_engine("uncond")
    trainer = Trainer(eng, lr=1e-3)
    rng = jax.random.PRNGKey(0)
    params, opt_state = trainer.init(rng)
    loader = FakeLoader(n=8, batch=8)
    params, opt_state, best = trainer.fit(
        params, opt_state, loader, loader, epochs=1,
        rng=rng, ckpt_dir=None,
    )
    assert np.isfinite(best)


def test_checkpoint_roundtrip(tmp_path):
    params = {"a": jnp.arange(6, dtype=jnp.float32).reshape(2, 3)}
    p = str(tmp_path / "ck.msgpack")
    save_checkpoint(p, params, None, step=5)
    ck = load_checkpoint(p, like={"params": params, "opt_state": None, "step": 0})
    np.testing.assert_array_equal(np.asarray(ck["params"]["a"]), np.asarray(params["a"]))
    assert ck["step"] == 5


def test_checkpoint_partial_load_matches_full(tmp_path):
    """load_checkpoint(only=...) must decode the requested subtrees
    identically to the full restore while omitting the rest — the cold-CLI
    fast path (skips the Adam moments of a ~600 MB flagship checkpoint)."""
    params = {"w": jnp.arange(12, dtype=jnp.float32).reshape(3, 4),
              "b": jnp.ones((4,), jnp.bfloat16)}
    opt = {"mu": {"w": jnp.zeros((3, 4))}, "count": jnp.zeros((), jnp.int32)}
    ema = {"w": jnp.full((3, 4), 2.0), "b": jnp.zeros((4,), jnp.bfloat16)}
    p = str(tmp_path / "ck.msgpack")
    save_checkpoint(p, params, opt, step=7, ema_params=ema,
                    run_config=dict(sigma=0.1, schedule="sigmoid", mode="cond"))

    full = load_checkpoint(p)
    part = load_checkpoint(p, only={"params", "run_config"})
    assert set(part) == {"params", "run_config"}  # opt/ema/step skipped
    assert part["run_config"] == full["run_config"]
    for k in ("w", "b"):
        np.testing.assert_array_equal(
            np.asarray(part["params"][k]), np.asarray(full["params"][k])
        )
        assert part["params"][k].dtype == full["params"][k].dtype

    with_ema = load_checkpoint(p, only={"params", "ema_params"})
    np.testing.assert_array_equal(
        np.asarray(with_ema["ema_params"]["w"]), np.asarray(full["ema_params"]["w"])
    )
    # absent optional keys simply don't appear (older checkpoints)
    save_checkpoint(str(tmp_path / "old.msgpack"), params, None, step=1)
    old = load_checkpoint(str(tmp_path / "old.msgpack"),
                          only={"params", "ema_params", "run_config"})
    assert "run_config" not in old or old.get("run_config") is None
    np.testing.assert_array_equal(
        np.asarray(old["params"]["w"]), np.asarray(params["w"])
    )


def test_checkpoint_run_config_guard(tmp_path, capsys):
    """The reference checkpoint name encodes no sigma (train.py:185), so a
    retrain at a different noise level silently replaces the file; the stored
    run_config lets loaders catch exactly that (this burned a real session:
    a sigma-sweep retrain overwrote the sigma=0.1 flagship in place)."""
    from hicdiff_tpu.train.checkpoint import warn_run_config_mismatch

    params = {"a": jnp.zeros((2,))}
    p = str(tmp_path / "ck.msgpack")
    save_checkpoint(p, params, run_config=dict(sigma=0.01, schedule="sigmoid"))
    ck = load_checkpoint(p)
    bad = warn_run_config_mismatch(
        ck, dict(sigma=0.1, schedule="sigmoid", mode="cond"), p
    )
    assert bad == ["sigma"]  # mode absent in stored config -> ignored
    assert "sigma=0.01" in capsys.readouterr().out

    # checkpoints without run_config (older format) warn about nothing
    save_checkpoint(p, params)
    assert warn_run_config_mismatch(load_checkpoint(p), dict(sigma=0.1), p) == []


def test_uncond_checkpoint_sigma_mismatch_is_benign(tmp_path, capsys):
    """Unconditional training consumes only the clean targets
    (train/trainer.py _prep_batch), so the uncond DDRM prior is identical at
    every sigma — a sigma difference between checkpoint and run must neither
    warn at load nor trigger a save-time backup. A schedule difference (which
    DOES change the trained prior) still fires both guards."""
    import glob as _glob

    from hicdiff_tpu.train import checkpoint as ckpt_mod
    from hicdiff_tpu.train.checkpoint import warn_run_config_mismatch

    p = str(tmp_path / "bestg_40000_c64_s64_Human1_HiCedrn_uncond_l2_lin.msgpack")
    save_checkpoint(
        p, {"a": jnp.zeros((2,))},
        run_config=dict(sigma=0.1, schedule="linear", mode="uncond"),
    )
    ck = load_checkpoint(p)
    # DDRM restoration of a sigma=0.5 measurement with the sigma=0.1-prep prior
    assert warn_run_config_mismatch(
        ck, dict(sigma=0.5, schedule="linear", mode="uncond"), p
    ) == []
    assert "WARNING" not in capsys.readouterr().out
    # cond-mode expectations do NOT get the exemption
    assert warn_run_config_mismatch(
        ck, dict(sigma=0.5, schedule="linear", mode="cond"), p
    ) == ["sigma", "mode"]

    # save-time: an uncond re-prep at another sigma overwrites in place
    ckpt_mod._guarded_paths.clear()
    save_checkpoint(
        p, {"a": jnp.ones((2,))},
        run_config=dict(sigma=0.5, schedule="linear", mode="uncond"),
    )
    assert _glob.glob(p + ".prev-*") == []
    # ... but a schedule change still backs up the old prior
    save_checkpoint(
        p, {"a": jnp.ones((2,))},
        run_config=dict(sigma=0.5, schedule="sigmoid", mode="uncond"),
    )
    assert len(_glob.glob(p + ".prev-*")) == 1

    # the exemption requires BOTH sides to claim uncond explicitly: a
    # mode-less saver/loader (e.g. an external tool) gets the full guard —
    # defaulting it open would skip the sigma diff AND (mode being absent
    # from its keys) the mode diff, re-enabling the silent-overwrite incident
    assert warn_run_config_mismatch(
        load_checkpoint(p), dict(sigma=0.1), p
    ) == ["sigma"]
    ckpt_mod._guarded_paths.clear()
    save_checkpoint(
        p, {"a": jnp.ones((2,))}, run_config=dict(sigma=0.9),
    )
    assert len(_glob.glob(p + ".prev-*")) == 2


def test_save_time_guard_backs_up_divergent_checkpoint(tmp_path, capsys):
    """The load-time warning detects the sigma-sweep incident after the fact;
    the save-time guard makes it impossible: overwriting a checkpoint whose
    embedded run_config differs moves the old file to a .prev-* backup."""
    import glob as _glob

    from hicdiff_tpu.train import checkpoint as ckpt_mod

    p = str(tmp_path / "bestg_40000_c64_s64_Human1_HiCedrn_cond_l2_sig.msgpack")
    flagship = {"a": jnp.full((2,), 7.0)}
    save_checkpoint(p, flagship, run_config=dict(sigma=0.1, schedule="sigmoid"))

    # a fresh process (sweep retrain) saving sigma=0.01 under the same name
    ckpt_mod._guarded_paths.clear()
    save_checkpoint(
        p, {"a": jnp.zeros((2,))}, run_config=dict(sigma=0.01, schedule="sigmoid")
    )
    backups = _glob.glob(p + ".prev-*")
    assert len(backups) == 1 and "sig0.1" in backups[0]
    assert "preserved" in capsys.readouterr().out
    # the flagship weights survive in the backup; the new file is the retrain
    saved = load_checkpoint(backups[0])
    np.testing.assert_array_equal(np.asarray(saved["params"]["a"]), 7.0)
    assert load_checkpoint(p)["run_config"]["sigma"] == 0.01

    # same-config rewrites (the trainer's own best-checkpoint loop) do NOT
    # stack further backups — the guard runs once per (path, config)
    save_checkpoint(
        p, {"a": jnp.ones((2,))}, run_config=dict(sigma=0.01, schedule="sigmoid")
    )
    assert len(_glob.glob(p + ".prev-*")) == 1

    # an in-process config switch re-guards and backs up again
    save_checkpoint(
        p, {"a": jnp.ones((2,))}, run_config=dict(sigma=0.5, schedule="sigmoid")
    )
    assert len(_glob.glob(p + ".prev-*")) == 2


def test_save_time_guard_ignores_legacy_and_matching(tmp_path):
    """No run_config on either side, or matching configs -> plain overwrite."""
    import glob as _glob

    from hicdiff_tpu.train import checkpoint as ckpt_mod

    p = str(tmp_path / "ck.msgpack")
    save_checkpoint(p, {"a": jnp.zeros((2,))})  # legacy: no run_config
    ckpt_mod._guarded_paths.clear()
    save_checkpoint(p, {"a": jnp.ones((2,))}, run_config=dict(sigma=0.1))
    ckpt_mod._guarded_paths.clear()
    save_checkpoint(p, {"a": jnp.ones((2,))}, run_config=dict(sigma=0.1))
    assert _glob.glob(p + ".prev-*") == []
