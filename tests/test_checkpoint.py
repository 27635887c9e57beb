"""Checkpoint round-trips: params, optax states, feature banks."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from mimrl_tpu.core.checkpoint import CheckpointManager
from mimrl_tpu.core.config import MimrlConfig
from mimrl_tpu.train.optim import make_vmi_optimizer, set_learning_rate
from mimrl_tpu.train.steps import FeatureBank


def test_params_roundtrip(tmp_path):
    mgr = CheckpointManager(str(tmp_path))
    state = {"w": jnp.arange(6.0).reshape(2, 3), "b": jnp.ones(3)}
    mgr.save("latest", state)
    template = {"w": jnp.zeros((2, 3)), "b": jnp.zeros(3)}
    restored = mgr.restore("latest", template)
    assert np.allclose(np.asarray(restored["w"]), np.arange(6).reshape(2, 3))


def test_missing_returns_none(tmp_path):
    mgr = CheckpointManager(str(tmp_path))
    assert mgr.restore("latest", {}) is None
    assert not mgr.exists("latest")


def test_optax_state_roundtrip(tmp_path):
    cfg = MimrlConfig(learning_rate=0.1, optm="Adam")
    opt = make_vmi_optimizer(cfg)
    params = {"w": jnp.ones(4)}
    state = opt.init(params)
    # advance once so moments are non-trivial
    updates, state = opt.update({"w": jnp.full(4, 0.5)}, state, params)
    state = set_learning_rate(state, 0.031)

    mgr = CheckpointManager(str(tmp_path))
    mgr.save("latest", {"opt": state})
    template = {"opt": opt.init(params)}
    restored = mgr.restore("latest", template)["opt"]
    assert np.isclose(float(restored.hyperparams["learning_rate"]), 0.031)
    # restored state continues identically
    u1, _ = opt.update({"w": jnp.full(4, 0.2)}, state, params)
    u2, _ = opt.update({"w": jnp.full(4, 0.2)}, restored, params)
    assert np.allclose(np.asarray(u1["w"]), np.asarray(u2["w"]))


def test_feature_bank_roundtrip(tmp_path):
    bank = FeatureBank.create(8, 6, 4)
    bank = bank.write(0, jnp.arange(3.0), jnp.ones((3, 4)), jnp.ones((3, 4)),
                      jnp.ones((3, 4)), jnp.ones((3, 4)))
    mgr = CheckpointManager(str(tmp_path))
    mgr.save("latest", {"bank": bank})
    restored = mgr.restore("latest", {"bank": FeatureBank.create(8, 6, 4)})
    rb = restored["bank"]
    assert np.allclose(np.asarray(rb.C[:3, 0]), [0, 1, 2])
    assert np.allclose(np.asarray(rb.valid), np.asarray(bank.valid))


def test_config_sidecar(tmp_path):
    mgr = CheckpointManager(str(tmp_path))
    cfg = MimrlConfig(batch_size=99)
    mgr.save_config(cfg.to_json())
    loaded = mgr.load_config()
    assert loaded["batch_size"] == 99


def test_orbax_backend_roundtrip(tmp_path):
    """--ckpt_backend orbax: async save, optax-state fidelity, and
    cross-backend restore (orbax-written runs restore under either
    setting via format auto-detection)."""
    cfg = MimrlConfig(learning_rate=0.1, optm="Adam")
    opt = make_vmi_optimizer(cfg)
    params = {"w": jnp.ones(4)}
    state = opt.init(params)
    _, state = opt.update({"w": jnp.full(4, 0.5)}, state, params)
    bank = FeatureBank.create(8, 6, 4)
    snap = {"epoch": 3, "opt": state, "bank": bank,
            "params": {"w": jnp.arange(4.0)}}

    mgr = CheckpointManager(str(tmp_path), backend="orbax")
    mgr.save("latest", jax.device_get(snap))
    mgr.wait_until_finished()
    assert mgr.exists("latest")

    template = {"epoch": 0, "opt": opt.init(params),
                "bank": FeatureBank.create(8, 6, 4),
                "params": {"w": jnp.zeros(4)}}
    # restore through a DEFAULT-backend manager: format auto-detected
    restored = CheckpointManager(str(tmp_path)).restore("latest", template)
    assert restored["epoch"] == 3
    assert np.allclose(np.asarray(restored["params"]["w"]), np.arange(4))
    u1, _ = opt.update({"w": jnp.full(4, 0.2)}, state, params)
    u2, _ = opt.update({"w": jnp.full(4, 0.2)}, restored["opt"], params)
    assert np.allclose(np.asarray(u1["w"]), np.asarray(u2["w"]))


def test_newest_format_wins_on_restore(tmp_path):
    """If a run switched --ckpt_backend mid-life both formats coexist;
    restore() must load the most recently written snapshot, not blindly
    prefer msgpack."""
    import os
    import time as _time

    template = {"x": jnp.zeros(2)}
    # older msgpack...
    CheckpointManager(str(tmp_path)).save("latest", {"x": jnp.ones(2)})
    _time.sleep(0.05)
    # ...then a newer orbax snapshot
    mgr_o = CheckpointManager(str(tmp_path), backend="orbax")
    mgr_o.save("latest", {"x": jnp.full(2, 7.0)})
    mgr_o.wait_until_finished()
    os.utime(str(tmp_path / "latest_model.msgpack"),
             (0, os.path.getmtime(str(tmp_path / "latest_model.orbax")) - 10))
    restored = CheckpointManager(str(tmp_path)).restore("latest", template)
    assert np.allclose(np.asarray(restored["x"]), 7.0)

    # and the reverse: newer msgpack wins
    _time.sleep(0.05)
    CheckpointManager(str(tmp_path)).save("latest", {"x": jnp.full(2, 3.0)})
    restored = CheckpointManager(str(tmp_path)).restore("latest", template)
    assert np.allclose(np.asarray(restored["x"]), 3.0)


def test_sidecar_meta_beats_corrupted_mtimes(tmp_path):
    """The last-written-backend decision comes from the sidecar meta
    marker, so checkpoints copied/rsynced without mtime preservation
    still restore the correct format (mtimes alone would lie here)."""
    import os

    template = {"x": jnp.zeros(2)}
    CheckpointManager(str(tmp_path)).save("latest", {"x": jnp.ones(2)})
    mgr_o = CheckpointManager(str(tmp_path), backend="orbax")
    mgr_o.save("latest", {"x": jnp.full(2, 7.0)})
    mgr_o.wait_until_finished()
    # simulate an rsync that reset mtimes: msgpack now looks NEWER
    now = os.path.getmtime(str(tmp_path / "latest_model.orbax"))
    os.utime(str(tmp_path / "latest_model.msgpack"), (now + 100, now + 100))
    restored = CheckpointManager(str(tmp_path)).restore("latest", template)
    assert np.allclose(np.asarray(restored["x"]), 7.0)
    # marker file exists and names orbax as the last writer
    import json

    meta = json.load(open(tmp_path / "latest_model.meta.json"))
    assert meta["backend"] == "orbax" and meta["counter"] == 2


def test_bank_write_and_valid_mask():
    bank = FeatureBank.create(10, 7, 3)
    assert np.asarray(bank.valid).sum() == 7
    labels = jnp.asarray([1.0, 2.0])
    f = jnp.full((2, 3), 5.0)
    bank = bank.write(4, labels, f, f, f, f)
    assert np.allclose(np.asarray(bank.C)[4:6, 0], [1, 2])
    assert np.allclose(np.asarray(bank.F)[4:6], 5.0)
    assert np.allclose(np.asarray(bank.F)[:4], 0.0)
