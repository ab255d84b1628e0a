"""scripts/pretrain.py: argument wiring and config assembly (the full
training loop is exercised in-process by tests/test_pretrain.py; the CLI
itself compiles several minutes of XLA programs, so only the driver glue is
tested here)."""

import os
import sys
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))


def _parse(argv, monkeypatch):
    import pretrain as cli

    monkeypatch.setattr(sys, "argv", ["pretrain.py"] + argv)
    return cli.parse_args()


def test_default_hamt_task_mix(monkeypatch):
    args = _parse(["--synthetic"], monkeypatch)
    assert args.agent == "hamt" and args.image_prob_size == 1000


def test_duet_preset_overrides(monkeypatch):
    """--agent duet selects the 3-task mix (r2r_pretrain.json:43-50)."""
    from vln_imagine_tpu.config import duet_r2r_config, _replace

    cfg = duet_r2r_config()
    cfg = _replace(cfg, "pretrain", tasks=("mlm", "mrc", "sap"),
                   mix_ratio=(1, 1, 1), batch_size=64,
                   num_train_steps=100_000)
    assert cfg.pretrain.tasks == ("mlm", "mrc", "sap")
    assert cfg.pretrain.mix_ratio == (1, 1, 1)


def test_task_override_sets_uniform_mix(monkeypatch):
    args = _parse(["--synthetic", "--tasks", "mlm", "sap"], monkeypatch)
    assert args.tasks == ["mlm", "sap"] and args.mix_ratio is None
    # main() derives a uniform mix when --mix-ratio is omitted
    from vln_imagine_tpu.config import hamt_r2r_config, _replace

    cfg = _replace(hamt_r2r_config(), "pretrain",
                   tasks=tuple(args.tasks),
                   mix_ratio=tuple(args.mix_ratio or [1] * len(args.tasks)))
    assert cfg.pretrain.mix_ratio == (1, 1)


@pytest.mark.slow
def test_resume_graft_roundtrip(tmp_path):
    """model_step_N snapshots restore onto a PretrainState via the
    structural graft (the CLI's --resume path)."""
    import jax
    import numpy as np
    import orbax.checkpoint as ocp

    from vln_imagine_tpu.ckpt.manager import _graft
    from vln_imagine_tpu.config import tiny_test_config
    from vln_imagine_tpu.envx import synthetic_world, synthetic_episodes
    from vln_imagine_tpu.pretrain.trainer import HamtPretrainer

    cfg = tiny_test_config("hamt")
    world_np, _ = synthetic_world(
        num_scans=1, num_nodes=12, max_candidates=cfg.env.max_candidates,
        views=cfg.env.views, feat_dim=cfg.model.image_feat_size, seed=0)
    import jax.numpy as jnp
    world = jax.tree.map(jnp.asarray, world_np)
    ep = jax.tree.map(jnp.asarray, synthetic_episodes(
        world_np, batch=4, max_gt_path_len=cfg.env.max_gt_path_len,
        max_instr_len=cfg.env.max_instr_len,
        max_imaginations=cfg.model.max_imagination_len,
        vocab_size=cfg.model.vocab_size, feat_dim=cfg.model.hidden_size,
        seed=1))
    pt = HamtPretrainer(cfg, world, ep, image_prob_size=8)
    state = pt.init_state()
    ckpt = ocp.PyTreeCheckpointer()
    path = str(tmp_path / "model_step_0")
    ckpt.save(path, jax.tree.map(np.asarray, state), force=True)
    back = _graft(state, ckpt.restore(path))
    same = jax.tree.map(
        lambda a, b: bool(np.array_equal(np.asarray(a), np.asarray(b))),
        state.params, back.params)
    assert all(jax.tree.leaves(same))
    assert int(back.step) == int(state.step)
