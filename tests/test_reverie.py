"""REVERIE/SOON object-grounding path through the DUET rollout."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vln_imagine_tpu.config import tiny_test_config, _replace
from vln_imagine_tpu.envx import synthetic_world, synthetic_episodes
from vln_imagine_tpu.envx import env as envx
from vln_imagine_tpu.train.rollout_duet import rollout_duet
from vln_imagine_tpu.train.trainer_duet import DuetTrainer


@pytest.fixture(scope="module")
def setup():
    cfg = _replace(tiny_test_config("duet"), "model", obj_feat_size=32)
    cfg = dataclasses.replace(cfg, dataset="reverie")
    world_np, graphs = synthetic_world(
        num_scans=1, num_nodes=16, max_candidates=cfg.env.max_candidates,
        views=cfg.env.views, feat_dim=cfg.model.image_feat_size, seed=5,
        max_objects=3, obj_feat_dim=32)
    ep_np = synthetic_episodes(
        world_np, batch=3, max_gt_path_len=cfg.env.max_gt_path_len,
        max_instr_len=cfg.env.max_instr_len,
        max_imaginations=cfg.model.max_imagination_len,
        vocab_size=cfg.model.vocab_size, feat_dim=cfg.model.hidden_size,
        seed=6)
    world = jax.tree.map(jnp.asarray, world_np)
    ep = jax.tree.map(jnp.asarray, ep_np)
    return cfg, world_np, world, ep, graphs


def test_observation_includes_object_tokens(setup):
    cfg, world_np, world, ep = setup[:4]
    state = envx.reset(world, ep, cfg.env.max_action_len)
    obs = envx.observe_duet(world, ep, state, cfg.model.angle_feat_size)
    K, V, Ko = world.max_candidates, world.views, world.max_objects
    assert obs.img.shape[1] == K + V + Ko
    nav = np.asarray(obs.nav_types)
    valid = np.asarray(obs.valid)
    # object slots have nav type 2 where valid
    obj_nav = nav[:, K + V:]
    obj_valid = np.asarray(obs.obj_valid)
    np.testing.assert_array_equal(obj_nav == 2, obj_valid)
    assert (valid[:, K + V:] == obj_valid).all()
    # object token count matches the world annotation at the start node
    for b in range(ep.batch):
        want = np.asarray(world_np.obj_valid)[
            np.asarray(ep.scan)[b], np.asarray(ep.start_node)[b]].sum()
        assert obj_valid[b].sum() == want


@pytest.mark.slow
def test_reverie_rollout_grounds_objects(setup):
    cfg, world_np, world, ep = setup[:4]
    trainer = DuetTrainer(cfg, world)
    state = trainer.init_state(ep)
    res = rollout_duet(trainer.model, state.params, world, ep, cfg,
                       jax.random.PRNGKey(0), feedback="teacher",
                       train_ml=1.0, deterministic=True)
    assert res.og_loss is not None and np.isfinite(float(res.og_loss))
    assert float(res.og_loss) > 0  # gt objects visible along teacher paths
    pred = np.asarray(res.pred_obj)
    # every episode ends and declares some visible object id
    obj_ids = np.asarray(world_np.obj_ids)
    for b in range(ep.batch):
        assert pred[b] >= -1
        if pred[b] >= 0:
            assert pred[b] in obj_ids  # a real object id from the world


@pytest.mark.slow
def test_reverie_train_step(setup):
    cfg, _, world, ep, _ = setup
    trainer = DuetTrainer(cfg, world)
    state = trainer.init_state(ep)
    step = trainer.make_train_step()
    state2, metrics = step(state, ep, ep, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["grad_norm"]) > 0


# ----------------------------------------------------------- HAMT (NavRefCMT)

@pytest.fixture(scope="module")
def hamt_setup():
    """HAMT REVERIE: NavRef has no imagination modules
    (reverie/vlnbert_navref.py), so imagination/aux-loss are off."""
    cfg = _replace(tiny_test_config("hamt"), "model", obj_feat_size=32,
                   imagine_enc_pano=False, use_cosine_aux_loss=False)
    cfg = dataclasses.replace(cfg, dataset="reverie")
    world_np, graphs = synthetic_world(
        num_scans=1, num_nodes=16, max_candidates=cfg.env.max_candidates,
        views=cfg.env.views, feat_dim=cfg.model.image_feat_size, seed=5,
        max_objects=3, obj_feat_dim=32)
    ep_np = synthetic_episodes(
        world_np, batch=3, max_gt_path_len=cfg.env.max_gt_path_len,
        max_instr_len=cfg.env.max_instr_len,
        max_imaginations=cfg.model.max_imagination_len,
        vocab_size=cfg.model.vocab_size, feat_dim=cfg.model.hidden_size,
        seed=6)
    world = jax.tree.map(jnp.asarray, world_np)
    ep = jax.tree.map(jnp.asarray, ep_np)
    return cfg, world_np, world, ep, graphs


def test_hamt_observation_has_object_segment(hamt_setup):
    cfg, world_np, world, ep = hamt_setup[:4]
    state = envx.reset(world, ep, cfg.env.max_action_len)
    obs = envx.observe_hamt(world, ep, state, cfg.model.angle_feat_size)
    assert obs.obj_img is not None
    Ko = world.max_objects
    assert obs.obj_img.shape[1] == Ko and obs.obj_valid.shape[1] == Ko
    # feature rows zeroed where invalid
    inv = ~np.asarray(obs.obj_valid)
    assert np.all(np.asarray(obs.obj_img)[inv] == 0)


def test_hamt_reverie_rollout_grounds_objects(hamt_setup):
    from vln_imagine_tpu.train.rollout_hamt import rollout_hamt
    from vln_imagine_tpu.train.trainer import HamtTrainer

    cfg, world_np, world, ep = hamt_setup[:4]
    trainer = HamtTrainer(cfg, world)
    state = trainer.init_state(ep)
    res = rollout_hamt(trainer.model, trainer.critic, state.params, None,
                       world, ep, cfg, jax.random.PRNGKey(0),
                       feedback="teacher", train_ml=1.0, train_rl=False,
                       deterministic=True)
    assert np.isfinite(float(res.og_loss))
    assert float(res.og_loss) > 0  # gt objects visible at teacher goals
    assert float(res.loss) > float(res.ml_loss)  # og term included
    pred = np.asarray(res.pred_obj)
    obj_ids = np.asarray(world_np.obj_ids)
    assert (pred >= -1).all()
    for b in range(ep.batch):
        if pred[b] >= 0:
            assert pred[b] in obj_ids


@pytest.mark.slow
def test_hamt_reverie_train_step(hamt_setup):
    from vln_imagine_tpu.train.trainer import HamtTrainer

    cfg, _, world, ep, _ = hamt_setup
    trainer = HamtTrainer(cfg, world)
    state = trainer.init_state(ep)
    step = trainer.make_train_step("sample", donate=False)
    _, metrics = step(state, ep, ep, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["grad_norm"]) > 0


def test_driver_validation_scores_grounding(hamt_setup, tmp_path):
    """End-to-end REVERIE validation through the driver: eval steps surface
    pred_obj and the object variant scoring (RGS/RGSPL) is applied."""
    from vln_imagine_tpu.driver import FinetuneDriver, SplitData

    cfg, world_np, world, ep = hamt_setup[:4]
    split = SplitData("val_unseen", ep, [f"i{k}" for k in range(ep.batch)])
    d = FinetuneDriver(cfg, world, split, [split], str(tmp_path),
                       graphs=hamt_setup[4])
    d.setup()
    score = d.validate(split, write_outputs=True)
    assert {"rgs", "rgspl", "sr", "spl"} <= set(score)
    assert all(np.isfinite(v) for v in score.values())
    # the submission carries the reference's predObjId field
    # (reverie/agent.py:24: str(objId), str(None) when nothing grounded)
    import json, os
    sub = json.load(open(os.path.join(str(tmp_path),
                                      "submit_val_unseen.json")))
    assert len(sub) == ep.batch
    for item in sub:
        assert "predObjId" in item and isinstance(item["predObjId"], str)
        assert "trajectory" in item


def test_reverie_config_presets():
    from vln_imagine_tpu.config import reverie_config

    duet = reverie_config("duet")
    assert duet.agent == "duet" and duet.model.obj_feat_size == 768
    assert duet.model.max_imagination_len == 1
    hamt = reverie_config("hamt")
    assert hamt.agent == "hamt" and hamt.model.obj_feat_size == 768
    assert not hamt.model.imagine_enc_pano
