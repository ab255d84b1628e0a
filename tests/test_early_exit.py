"""Early-exit eval (lax.while_loop) must trace the exact same per-step
program as the fixed-T scan — identical trajectories, just fewer steps."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vln_imagine_tpu.config import tiny_test_config
from vln_imagine_tpu.envx import synthetic_episodes, synthetic_world
from vln_imagine_tpu.train.rollout_duet import rollout_duet
from vln_imagine_tpu.train.rollout_hamt import rollout_hamt
from vln_imagine_tpu.train.trainer import HamtTrainer
from vln_imagine_tpu.train.trainer_duet import DuetTrainer


@pytest.mark.parametrize("agent", ["hamt", "duet"])
def test_early_exit_matches_scan(agent):
    cfg = tiny_test_config(agent)
    world_np, _ = synthetic_world(
        num_scans=2, num_nodes=20, max_candidates=cfg.env.max_candidates,
        views=cfg.env.views, feat_dim=cfg.model.image_feat_size, seed=7)
    world = jax.tree.map(jnp.asarray, world_np)
    ep = jax.tree.map(jnp.asarray, synthetic_episodes(
        world_np, batch=4, max_gt_path_len=cfg.env.max_gt_path_len,
        max_instr_len=cfg.env.max_instr_len,
        max_imaginations=cfg.model.max_imagination_len,
        vocab_size=cfg.model.vocab_size, feat_dim=cfg.model.hidden_size,
        seed=8))
    rng = jax.random.PRNGKey(0)
    if agent == "hamt":
        tr = HamtTrainer(cfg, world)
        state = tr.init_state(ep)

        def run(early):
            return rollout_hamt(tr.model, tr.critic, state.params, None,
                                world, ep, cfg, rng, feedback="argmax",
                                train_ml=None, deterministic=True,
                                early_exit=early)
    else:
        tr = DuetTrainer(cfg, world)
        state = tr.init_state(ep)

        def run(early):
            return rollout_duet(tr.model, state.params, world, ep, cfg, rng,
                                feedback="argmax", train_ml=None,
                                deterministic=True, early_exit=early)

    slow = run(False)
    fast = run(True)
    np.testing.assert_array_equal(np.asarray(slow.path_len),
                                  np.asarray(fast.path_len))
    np.testing.assert_array_equal(np.asarray(slow.path_nodes),
                                  np.asarray(fast.path_nodes))
    np.testing.assert_allclose(float(slow.aux_loss), float(fast.aux_loss),
                               rtol=1e-6)
