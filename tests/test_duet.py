"""DUET model + rollout behaviour, incl. the fused-logit graph merge."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vln_imagine_tpu.config import tiny_test_config
from vln_imagine_tpu.envx import synthetic_world, synthetic_episodes
from vln_imagine_tpu.models.duet import fused_logit_merge
from vln_imagine_tpu.train.rollout_duet import rollout_duet
from vln_imagine_tpu.train.trainer_duet import DuetTrainer


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_test_config("duet")
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
    trainer = DuetTrainer(cfg, world)
    state = trainer.init_state(ep)
    return cfg, world_np, world, ep, trainer, state


def test_fused_logit_merge_matches_reference_loop():
    """Array merge vs a literal transcription of the reference's per-item
    loop semantics (vilmodel.py:1200-1217)."""
    rng = np.random.default_rng(0)
    B, G1, T1 = 3, 6, 5
    glob = rng.normal(size=(B, G1)).astype(np.float32)
    loc = rng.normal(size=(B, T1)).astype(np.float32)
    gmap_valid = np.ones((B, G1), bool)
    gmap_valid[:, 5] = [True, False, True]
    gmap_visited = np.zeros((B, G1), bool)
    gmap_visited[:, 1] = True
    gmap_visited[0, 2] = True
    vp_nav_valid = np.ones((B, T1), bool)
    vp_nav_valid[:, 4] = [False, True, False]
    # map: candidate token j -> gmap slot (or -1)
    cand_map = np.full((B, T1), -1)
    cand_map[0, 1:4] = [2, 3, 1]   # cand1->visited(2), cand2->unvis(3), cand3->visited(1)
    cand_map[1, 1:5] = [3, 4, 1, 2]
    cand_map[2, 1:4] = [4, 3, 1]

    c2g = np.zeros((B, G1, T1), bool)
    for b in range(B):
        for j in range(1, T1):
            g = cand_map[b, j]
            if g >= 0 and vp_nav_valid[b, j]:
                c2g[b, g, j] = True

    # host reference loop
    want = glob.copy()
    want[:, 0] += loc[:, 0]
    for b in range(B):
        bw = 0.0
        tmp = {}
        for j in range(1, T1):
            g = cand_map[b, j]
            if g < 0 or not vp_nav_valid[b, j]:
                continue
            if gmap_visited[b, g] and gmap_valid[b, g]:
                bw += loc[b, j]
            else:
                tmp[g] = loc[b, j]
        for g in range(1, G1):
            if gmap_valid[b, g] and not gmap_visited[b, g]:
                want[b, g] += tmp.get(g, bw)

    got = np.asarray(fused_logit_merge(
        jnp.asarray(glob), jnp.asarray(loc), jnp.asarray(gmap_visited),
        jnp.asarray(gmap_valid), jnp.asarray(vp_nav_valid), jnp.asarray(c2g)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


@pytest.mark.slow
def test_teacher_rollout_reaches_goal(setup):
    cfg, _, world, ep, trainer, state = setup
    res = rollout_duet(trainer.model, state.params, world, ep, cfg,
                       jax.random.PRNGKey(1), feedback="teacher",
                       train_ml=1.0, deterministic=True)
    pn, pl = np.asarray(res.path_nodes), np.asarray(res.path_len)
    gt = np.asarray(ep.gt_path)
    gl = np.asarray(ep.gt_len)
    for b in range(ep.batch):
        # teacher-forced prefix follows the gt path exactly; a stop-node
        # backtrack may extend it afterwards (agent.py:588-601)
        np.testing.assert_array_equal(pn[b, :gl[b]], gt[b, :gl[b]])
    assert float(res.ml_loss) > 0 and np.isfinite(float(res.ml_loss))


def test_eval_rollout_paths_are_graph_walks(setup):
    cfg, world_np, world, ep, trainer, state = setup
    paths, lens = trainer.make_eval_step()(state.params, ep,
                                           jax.random.PRNGKey(0))
    paths, lens = np.asarray(paths), np.asarray(lens)
    adj = np.asarray(world_np.adj)
    adj_valid = np.asarray(world_np.adj_valid)
    scan = np.asarray(ep.scan)
    for b in range(ep.batch):
        p = paths[b, :lens[b]]
        assert p[0] == np.asarray(ep.start_node)[b]
        for a, c in zip(p[:-1], p[1:]):
            assert c in adj[scan[b], a][adj_valid[scan[b], a]], (b, a, c)


@pytest.mark.slow
def test_rl_train_step(setup):
    """train_alg='rl' runs a working A2C (the reference's branch is inert:
    agent_base.py:213-220 passes train_rl=True but rollout ignores it)."""
    from vln_imagine_tpu.config import _replace

    cfg, _, world, ep, _, _ = setup
    cfg_rl = _replace(cfg, "train", train_alg="rl", gamma=0.9)
    trainer = DuetTrainer(cfg_rl, world)
    state = trainer.init_state(ep)
    assert state.critic_params is not None
    step = trainer.make_train_step(donate=False)
    state2, metrics = step(state, ep, ep, jax.random.PRNGKey(3))
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["rl_loss"]))
    assert float(metrics["rl_loss"]) != 0.0
    assert float(metrics["grad_norm"]) > 0
    deltas = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                          state.params, state2.params)
    assert max(jax.tree.leaves(deltas)) > 0
    c_deltas = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                            state.critic_params, state2.critic_params)
    assert max(jax.tree.leaves(c_deltas)) > 0


@pytest.mark.slow
def test_dagger_train_step(setup):
    cfg, _, world, ep, trainer, state = setup
    step = trainer.make_train_step(donate=False)
    state2, metrics = step(state, ep, ep, jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["grad_norm"]) > 0
    deltas = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                          state.params, state2.params)
    assert max(jax.tree.leaves(deltas)) > 0


@pytest.mark.slow
def test_expl_sample_rollout(setup):
    """expl_sample (agent.py:555-565): greedy w/ random exploration; actions
    stay within the valid action set and the rollout stays finite."""
    cfg, _, world, ep, trainer, state = setup
    res = rollout_duet(trainer.model, state.params, world, ep, cfg,
                       jax.random.PRNGKey(5), feedback="expl_sample",
                       train_ml=1.0, deterministic=True)
    assert np.isfinite(float(res.ml_loss))
    assert np.asarray(res.path_len).min() >= 1
    # every recorded action is the stop slot or a valid gmap slot
    acts = np.asarray(res.actions)
    assert (acts >= 0).all() and (acts <= cfg.env.max_gmap_nodes).all()


def test_act_visited_nodes_rollout(setup):
    """--act_visited_nodes (agent.py:109-113): only the current node counts
    as visited, so previously-visited graph nodes stay in the action set;
    paths remain graph-teleport walks and the visited-mask change reaches
    the model (different logits from the default)."""
    from vln_imagine_tpu.config import _replace

    cfg, world_np, world, ep, trainer, state = setup
    cfg_av = _replace(cfg, "train", act_visited_nodes=True)
    rng = jax.random.PRNGKey(21)
    res = rollout_duet(trainer.model, state.params, world, ep, cfg_av, rng,
                       feedback="argmax", train_ml=None, deterministic=True)
    # teacher forcing walks the multi-node gt path, so the true visited set
    # grows past {current} and the two maskings must diverge
    res_t = rollout_duet(trainer.model, state.params, world, ep, cfg_av, rng,
                         feedback="teacher", train_ml=1.0,
                         deterministic=True)
    res_t0 = rollout_duet(trainer.model, state.params, world, ep, cfg, rng,
                          feedback="teacher", train_ml=1.0,
                          deterministic=True)
    pn, pl = np.asarray(res.path_nodes), np.asarray(res.path_len)
    adj = np.asarray(world_np.adj)
    adj_valid = np.asarray(world_np.adj_valid)
    scan = np.asarray(ep.scan)
    for b in range(pn.shape[0]):
        for a, c in zip(pn[b, : pl[b] - 1], pn[b, 1: pl[b]]):
            assert c in adj[scan[b], a][adj_valid[scan[b], a]], (b, a, c)
    assert not np.array_equal(np.asarray(res_t.logits),
                              np.asarray(res_t0.logits))
