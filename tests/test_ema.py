"""EMA trainer option: moving average tracks params, saved in checkpoints."""
import os

import jax
import jax.numpy as jnp
import numpy as np

from hicdiff_tpu.train.checkpoint import load_checkpoint
from hicdiff_tpu.train.trainer import Trainer
from tests.test_trainer import FakeLoader, make_engine


def test_ema_saved_and_distinct(tmp_path):
    eng = make_engine("cond")
    trainer = Trainer(eng, lr=1e-3, ema_decay=0.9)
    rng = jax.random.PRNGKey(0)
    params, opt_state = trainer.init(rng)
    loader = FakeLoader(n=16, batch=8)
    params, opt_state, _ = trainer.fit(
        params, opt_state, loader, loader, epochs=2, rng=rng,
        ckpt_dir=str(tmp_path), ckpt_tag="ema",
        ckpt_meta=dict(res=40000, chunk=16, cell_line="Human", cell_no=1),
    )
    files = [f for f in os.listdir(tmp_path) if f.startswith("finalg")]
    ck = load_checkpoint(os.path.join(tmp_path, files[0]))
    assert ck["ema_params"] is not None
    # EMA lags behind the live params (identical structure, different values)
    p_leaves = jax.tree.leaves(ck["params"])
    e_leaves = jax.tree.leaves(ck["ema_params"])
    assert len(p_leaves) == len(e_leaves)
    diffs = [float(np.abs(np.asarray(p) - np.asarray(e)).max())
             for p, e in zip(p_leaves, e_leaves)]
    assert max(diffs) > 0


def test_old_checkpoint_without_ema_loads(tmp_path):
    """Template-tolerant loading: checkpoints missing ema_params still load."""
    from flax import serialization

    payload = {"params": {"w": np.ones((2, 2), np.float32)},
               "opt_state": None, "step": 3}
    p = str(tmp_path / "old.msgpack")
    with open(p, "wb") as f:
        f.write(serialization.to_bytes(payload))
    ck = load_checkpoint(
        p, like={"params": {"w": jnp.zeros((2, 2))}, "opt_state": None,
                 "step": 0, "ema_params": None},
    )
    assert ck["step"] == 3 and ck["ema_params"] is None
    np.testing.assert_array_equal(np.asarray(ck["params"]["w"]), 1.0)
