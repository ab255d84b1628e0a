"""Checkpoint manager: save/restore round-trip + retention policy."""

import numpy as np
import jax.numpy as jnp

from vln_imagine_tpu.ckpt.manager import CheckpointManager


def _state(v):
    return {"params": {"a": jnp.full((3, 2), v), "b": jnp.arange(4)},
            "step": jnp.asarray(int(v))}


def test_roundtrip(tmp_path):
    mgr = CheckpointManager(str(tmp_path))
    st = _state(7.0)
    mgr.save_latest(st)
    back = mgr.load("latest_dict", _state(0.0))
    np.testing.assert_array_equal(np.asarray(back["params"]["a"]),
                                  np.asarray(st["params"]["a"]))
    assert int(back["step"]) == 7


def test_best_policy_spl_sr(tmp_path):
    mgr = CheckpointManager(str(tmp_path), select_metric="spl_sr")
    assert mgr.maybe_save_best(_state(1), "val_unseen", {"spl": 50, "sr": 60})
    assert not mgr.maybe_save_best(_state(2), "val_unseen",
                                   {"spl": 40, "sr": 50})
    assert mgr.maybe_save_best(_state(3), "val_unseen", {"spl": 60, "sr": 60})
    back = mgr.load("best_val_unseen", _state(0.0))
    assert int(back["step"]) == 3


def test_snapshot_naming_and_best_iteration(tmp_path):
    mgr = CheckpointManager(str(tmp_path))
    mgr.save_snapshot(_state(1), 2000, 65.0, 60.0, "val_unseen")
    mgr.save_snapshot(_state(2), 4000, 67.26, 62.02, "val_unseen")
    mgr.save_snapshot(_state(3), 6000, 60.0, 55.0, "val_unseen")
    names = mgr.list_snapshots()
    assert "iter_4000_SR_67.26_SPL_62.02_val_unseen" in names
    assert mgr.best_iteration("val_unseen") == \
        "iter_4000_SR_67.26_SPL_62.02_val_unseen"


def test_roundtrip_dataclass_state_with_optax(tmp_path):
    """TrainState-shaped restore: orbax returns field-name dicts for
    dataclasses/NamedTuples, whose flatten order differs from declaration
    order — a leaf-order zip scrambles step/params/opt_state silently
    (regression test for the structural _graft)."""
    import optax
    from flax import struct
    from typing import Any

    @struct.dataclass
    class TS:
        step: Any
        params: Any
        opt_state: Any
        critic_params: Any
        critic_opt_state: Any

    def make(v):
        params = {"params": {"w": jnp.full((2, 2), v), "b": jnp.full((3,), v + 1)}}
        cparams = {"params": {"w": jnp.full((2, 2), v + 2)}}
        tx = optax.chain(optax.clip_by_global_norm(40.0), optax.adamw(1e-3))
        ctx = optax.adamw(1e-3)
        return TS(step=jnp.asarray(int(v), jnp.int32), params=params,
                  opt_state=tx.init(params), critic_params=cparams,
                  critic_opt_state=ctx.init(cparams))

    mgr = CheckpointManager(str(tmp_path))
    mgr.save_latest(make(7.0))
    back = mgr.load("latest_dict", make(0.0))
    assert int(back.step) == 7
    np.testing.assert_array_equal(np.asarray(back.params["params"]["w"]),
                                  np.full((2, 2), 7.0))
    np.testing.assert_array_equal(np.asarray(back.params["params"]["b"]),
                                  np.full((3,), 8.0))
    np.testing.assert_array_equal(
        np.asarray(back.critic_params["params"]["w"]), np.full((2, 2), 9.0))
    # optimizer moments land in the right slots (zeros from init at save time)
    adam = back.opt_state[1][0]
    np.testing.assert_array_equal(np.asarray(adam.mu["params"]["w"]),
                                  np.zeros((2, 2)))


def test_load_with_donated_template(tmp_path):
    """Rollback after a donated train step: the in-memory template's buffers
    are deleted (only shape/dtype metadata remains readable), and
    load('latest_dict', dead_state) must still restore from disk."""
    mgr = CheckpointManager(str(tmp_path))
    st = _state(5.0)
    mgr.save_latest(st)
    for leaf in [st["params"]["a"], st["params"]["b"], st["step"]]:
        leaf.delete()  # what donate_argnums does to the caller's arrays
    back = mgr.load("latest_dict", st)
    np.testing.assert_array_equal(np.asarray(back["params"]["a"]),
                                  np.full((3, 2), 5.0))
    assert int(back["step"]) == 5
