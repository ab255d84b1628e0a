"""HAMT model + rollout + trainer behaviour."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vln_imagine_tpu.config import tiny_test_config
from vln_imagine_tpu.envx import synthetic_world, synthetic_episodes
from vln_imagine_tpu.train.rollout_hamt import rollout_hamt
from vln_imagine_tpu.train.trainer import HamtTrainer


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_test_config("hamt")
    world_np, graphs = synthetic_world(
        num_scans=2, num_nodes=20, max_candidates=cfg.env.max_candidates,
        views=cfg.env.views, feat_dim=cfg.model.image_feat_size, seed=1)
    world = jax.tree.map(jnp.asarray, world_np)
    ep = jax.tree.map(jnp.asarray, synthetic_episodes(
        world_np, batch=4, max_gt_path_len=cfg.env.max_gt_path_len,
        max_instr_len=cfg.env.max_instr_len,
        max_imaginations=cfg.model.max_imagination_len,
        vocab_size=cfg.model.vocab_size, feat_dim=cfg.model.hidden_size,
        seed=2))
    trainer = HamtTrainer(cfg, world)
    state = trainer.init_state(ep)
    return cfg, world_np, world, ep, trainer, state


def test_eval_rollout_valid_paths(setup):
    cfg, world_np, world, ep, trainer, state = setup
    paths, lens = trainer.make_eval_step()(state.params, ep,
                                           jax.random.PRNGKey(0))
    paths, lens = np.asarray(paths), np.asarray(lens)
    adj = np.asarray(world_np.adj)
    adj_valid = np.asarray(world_np.adj_valid)
    scan = np.asarray(ep.scan)
    for b in range(ep.batch):
        assert 1 <= lens[b] <= cfg.env.max_action_len + 1
        p = paths[b, :lens[b]]
        assert p[0] == np.asarray(ep.start_node)[b]
        for a, c in zip(p[:-1], p[1:]):
            assert c in adj[scan[b], a][adj_valid[scan[b], a]]


def test_teacher_forcing_reproduces_gt(setup):
    cfg, _, world, ep, trainer, state = setup
    res = rollout_hamt(trainer.model, trainer.critic, state.params, None,
                       world, ep, cfg, jax.random.PRNGKey(1),
                       feedback="teacher", train_ml=1.0, train_rl=False,
                       deterministic=True)
    pn, pl = np.asarray(res.path_nodes), np.asarray(res.path_len)
    for b in range(ep.batch):
        assert pl[b] == np.asarray(ep.gt_len)[b]
        np.testing.assert_array_equal(
            pn[b, :pl[b]],
            np.asarray(ep.gt_path)[b, :pl[b]])
    assert np.isfinite(float(res.ml_loss)) and float(res.ml_loss) > 0
    assert np.isfinite(float(res.aux_loss))


def test_aux_loss_zero_when_no_imaginations(setup):
    cfg, _, world, ep, trainer, state = setup
    ep0 = ep.replace(imagine_mask=jnp.zeros_like(ep.imagine_mask),
                     np_weights=jnp.zeros_like(ep.np_weights))
    res = rollout_hamt(trainer.model, trainer.critic, state.params, None,
                       world, ep0, cfg, jax.random.PRNGKey(1),
                       feedback="teacher", train_ml=1.0, train_rl=False,
                       deterministic=True)
    assert float(res.aux_loss) == 0.0


@pytest.mark.slow
def test_train_step_updates_and_warmup_freeze(setup):
    cfg, _, world, ep, trainer, state = setup
    step = trainer.make_train_step("sample", donate=False)
    state2, metrics = step(state, ep, ep, jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["grad_norm"]) > 0
    delta = jax.tree_util.tree_flatten_with_path(jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()),
        state.params, state2.params))[0]
    aux = [v for p, v in delta
           if "image_proj" in str(p) or "imagine_embeddings" in str(p)]
    rest = [v for p, v in delta
            if "image_proj" not in str(p) and "imagine_embeddings" not in str(p)]
    # stage 1 of warm-up variant4: only aux modules train (main.py:229-239)
    assert max(aux) > 0
    assert max(rest) == 0.0


def test_rollout_deterministic_eval(setup):
    cfg, _, world, ep, trainer, state = setup
    f = trainer.make_eval_step()
    p1, l1 = f(state.params, ep, jax.random.PRNGKey(5))
    p2, l2 = f(state.params, ep, jax.random.PRNGKey(9))
    # argmax eval ignores the rng: trajectories identical
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))


def test_no_cand_backtrack_paths_never_revisit(setup):
    """--no_cand_backtrack (agent_cmt.py:549-558): candidates leading to
    already-visited nodes are -inf-masked, so a greedy path can never
    revisit a node (it stops instead once everything nearby is visited)."""
    from vln_imagine_tpu.config import _replace
    from vln_imagine_tpu.train.rollout_hamt import rollout_hamt

    cfg, _, world, ep, trainer, state = setup
    cfg_bt = _replace(cfg, "train", no_cand_backtrack=True)
    res = rollout_hamt(trainer.model, trainer.critic, state.params, None,
                       world, ep, cfg_bt, jax.random.PRNGKey(11),
                       feedback="argmax", train_ml=None, train_rl=False,
                       deterministic=True)
    pn, pl = np.asarray(res.path_nodes), np.asarray(res.path_len)
    for b in range(pn.shape[0]):
        walk = pn[b, : pl[b]]
        assert len(set(walk.tolist())) == len(walk), walk


def test_ob_type_cand_masks_view_tokens(setup):
    """--ob_type cand (agent_cmt.py:502): only candidates + [STOP] stay in
    the observation stream; the rollout still runs and the chosen actions
    stay within the candidate set."""
    from vln_imagine_tpu.config import _replace
    from vln_imagine_tpu.train.rollout_hamt import rollout_hamt

    cfg, world_np, world, ep, trainer, state = setup
    cfg_c = _replace(cfg, "env", ob_type="cand")
    res = rollout_hamt(trainer.model, trainer.critic, state.params, None,
                       world, ep, cfg_c, jax.random.PRNGKey(12),
                       feedback="argmax", train_ml=None, train_rl=False,
                       deterministic=True)
    pn, pl = np.asarray(res.path_nodes), np.asarray(res.path_len)
    adj = np.asarray(world_np.adj)
    adj_valid = np.asarray(world_np.adj_valid)
    scan = np.asarray(ep.scan)
    for b in range(pn.shape[0]):
        for a, c in zip(pn[b, : pl[b] - 1], pn[b, 1: pl[b]]):
            assert c in adj[scan[b], a][adj_valid[scan[b], a]], (b, a, c)
    # and the logits differ from the pano observation set (views removed
    # from attention changes the encoding)
    res_p = rollout_hamt(trainer.model, trainer.critic, state.params, None,
                         world, ep, cfg, jax.random.PRNGKey(12),
                         feedback="argmax", train_ml=None, train_rl=False,
                         deterministic=True)
    assert not np.allclose(np.asarray(res.logits), np.asarray(res_p.logits))
