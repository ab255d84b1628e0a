"""Golden-output numeric regression tests.

The released reference checkpoints are not available in this environment, so
checkpoint-parity is established structurally (tests/test_convert.py runs
real torch blocks through the converter).  These goldens pin OUR models'
outputs at fixed seeds so later rounds can refactor kernels/layout without
silently drifting numerics.  Regenerate deliberately with:
    python tests/test_golden.py regen
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

GOLDEN = os.path.join(os.path.dirname(__file__), "goldens.npz")


def _build():
    from vln_imagine_tpu.config import tiny_test_config
    from vln_imagine_tpu.envx import synthetic_world, synthetic_episodes
    from vln_imagine_tpu.train.rollout_hamt import rollout_hamt
    from vln_imagine_tpu.train.rollout_duet import rollout_duet
    from vln_imagine_tpu.train.trainer import HamtTrainer
    from vln_imagine_tpu.train.trainer_duet import DuetTrainer

    out = {}
    for agent in ("hamt", "duet"):
        cfg = tiny_test_config(agent)
        world_np, _ = synthetic_world(
            num_scans=1, num_nodes=14, max_candidates=cfg.env.max_candidates,
            views=cfg.env.views, feat_dim=cfg.model.image_feat_size, seed=11)
        world = jax.tree.map(jnp.asarray, world_np)
        ep = jax.tree.map(jnp.asarray, synthetic_episodes(
            world_np, batch=2, max_gt_path_len=cfg.env.max_gt_path_len,
            max_instr_len=cfg.env.max_instr_len,
            max_imaginations=cfg.model.max_imagination_len,
            vocab_size=cfg.model.vocab_size, feat_dim=cfg.model.hidden_size,
            seed=12))
        if agent == "hamt":
            tr = HamtTrainer(cfg, world, rng=jax.random.PRNGKey(42))
            state = tr.init_state(ep)
            res = rollout_hamt(tr.model, tr.critic, state.params, None,
                               world, ep, cfg, jax.random.PRNGKey(7),
                               feedback="teacher", train_ml=1.0,
                               train_rl=False, deterministic=True)
        else:
            tr = DuetTrainer(cfg, world, rng=jax.random.PRNGKey(42))
            state = tr.init_state(ep)
            res = rollout_duet(tr.model, state.params, world, ep, cfg,
                               jax.random.PRNGKey(7), feedback="teacher",
                               train_ml=1.0, deterministic=True)
        out[f"{agent}_ml_loss"] = np.asarray(res.ml_loss)
        out[f"{agent}_aux_loss"] = np.asarray(res.aux_loss)
        out[f"{agent}_logits_t0"] = np.asarray(res.logits[0])
        out[f"{agent}_paths"] = np.asarray(res.path_nodes)
    return out


@pytest.mark.slow
def test_rollout_numerics_match_goldens():
    assert os.path.exists(GOLDEN), \
        "goldens missing — run `python tests/test_golden.py regen`"
    want = dict(np.load(GOLDEN))
    got = _build()
    assert set(got) == set(want)
    for k in want:
        if k.endswith("_paths"):
            np.testing.assert_array_equal(got[k], want[k], err_msg=k)
        else:
            np.testing.assert_allclose(got[k], want[k], rtol=2e-4, atol=2e-4,
                                       err_msg=k)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "regen":
        np.savez(GOLDEN, **_build())
        print(f"wrote {GOLDEN}")
