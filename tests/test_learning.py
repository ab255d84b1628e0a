"""System-level learning test: IL training must drive SR far above the
untrained baseline on a memorizable synthetic world.  (On TPU the same run
reaches SR 100 within 100 iterations.)"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vln_imagine_tpu.config import tiny_test_config, _replace
from vln_imagine_tpu.envx import synthetic_world, synthetic_episodes
from vln_imagine_tpu.eval.metrics import eval_batch, trajectories_from_rollout
from vln_imagine_tpu.train.trainer import HamtTrainer


@pytest.mark.slow
def test_il_training_learns_to_navigate():
    cfg = tiny_test_config("hamt")
    cfg = _replace(cfg, "train", lr=3e-4, iters=200,
                   experimental_warmup=False)
    world_np, _ = synthetic_world(
        num_scans=1, num_nodes=14, max_candidates=cfg.env.max_candidates,
        views=cfg.env.views, feat_dim=cfg.model.image_feat_size, seed=0)
    world = jax.tree.map(jnp.asarray, world_np)
    ep_np = synthetic_episodes(
        world_np, batch=8, max_gt_path_len=cfg.env.max_gt_path_len,
        max_instr_len=cfg.env.max_instr_len,
        max_imaginations=cfg.model.max_imagination_len,
        vocab_size=cfg.model.vocab_size, feat_dim=cfg.model.hidden_size,
        seed=1)
    ep = jax.tree.map(jnp.asarray, ep_np)

    trainer = HamtTrainer(cfg, world)
    state = trainer.init_state(ep)
    ts = trainer.make_train_step("teacher")
    ev = trainer.make_eval_step()

    def sr(params):
        paths, lens = ev(params, ep, jax.random.PRNGKey(9))
        gts = [list(ep_np.gt_path[b, :ep_np.gt_len[b]]) for b in range(8)]
        avg, _ = eval_batch(np.asarray(world_np.dist), np.asarray(ep_np.scan),
                            trajectories_from_rollout(np.asarray(paths),
                                                      np.asarray(lens)), gts)
        return avg["sr"]

    sr0 = sr(state.params)
    rng = jax.random.PRNGKey(0)
    for i in range(150):
        rng, k = jax.random.split(rng)
        state, _ = ts(state, ep, ep, k)
    sr1 = sr(state.params)
    assert sr1 >= min(sr0 + 30, 90), (sr0, sr1)


def test_hash_tokenizer_fallback():
    from vln_imagine_tpu.data.tokenizer import HashTokenizer, get_tokenizer

    tok = HashTokenizer("bert-base-uncased")
    ids = tok.encode("walk past the sofa and stop.")
    assert ids[0] == tok.cls_token_id and ids[-1] == tok.sep_token_id
    assert all(4 <= i < tok.vocab_size for i in ids[1:-1])
    # deterministic
    assert ids == tok.encode("walk past the sofa and stop.")
    # truncation keeps the final [SEP]
    short = tok.encode("walk past the sofa and stop.", max_length=4)
    assert len(short) == 4 and short[-1] == tok.sep_token_id
    t = get_tokenizer("r2r")
    assert hasattr(t, "encode") or hasattr(t, "__call__")


@pytest.mark.slow
def test_duet_dagger_learns_to_navigate():
    """DUET dagger training (teacher-forced IL rollout + student-sampled
    rollout supervised by the SPL-optimal expert, agent_base.py:185-231 /
    agent.py:386-625 semantics) must drive SR far above the untrained
    baseline on a memorizable synthetic world — the HAMT learning test's
    mirror for the second flagship agent."""
    from vln_imagine_tpu.train.trainer_duet import DuetTrainer

    cfg = tiny_test_config("duet")
    cfg = _replace(cfg, "train", lr=3e-4, iters=200, train_alg="dagger",
                   experimental_warmup=False)
    world_np, _ = synthetic_world(
        num_scans=1, num_nodes=14, max_candidates=cfg.env.max_candidates,
        views=cfg.env.views, feat_dim=cfg.model.image_feat_size, seed=0)
    world = jax.tree.map(jnp.asarray, world_np)
    B = 8
    ep_np = synthetic_episodes(
        world_np, batch=B, max_gt_path_len=cfg.env.max_gt_path_len,
        max_instr_len=cfg.env.max_instr_len,
        max_imaginations=cfg.model.max_imagination_len,
        vocab_size=cfg.model.vocab_size, feat_dim=cfg.model.hidden_size,
        seed=1)
    ep = jax.tree.map(jnp.asarray, ep_np)

    trainer = DuetTrainer(cfg, world)
    state = trainer.init_state(ep)
    ts = trainer.make_train_step()
    ev = trainer.make_eval_step()

    def sr(params):
        paths, lens = ev(params, ep, jax.random.PRNGKey(9))[:2]
        gts = [list(ep_np.gt_path[b, :ep_np.gt_len[b]]) for b in range(B)]
        avg, _ = eval_batch(np.asarray(world_np.dist), np.asarray(ep_np.scan),
                            trajectories_from_rollout(np.asarray(paths),
                                                      np.asarray(lens)), gts)
        return avg["sr"]

    sr0 = sr(state.params)
    rng = jax.random.PRNGKey(0)
    for i in range(150):
        rng, k = jax.random.split(rng)
        state, metrics = ts(state, ep, ep, k)
    sr1 = sr(state.params)
    assert np.isfinite(float(metrics["loss"]))
    assert sr1 >= min(sr0 + 30, 90), (sr0, sr1)


@pytest.mark.slow
def test_reverie_grounding_learns():
    """NavRef-semantics REVERIE training (no_lang_ca, object segment with
    bbox positions, ob*hist head) must drive grounding accuracy far above
    the untrained baseline on a memorizable world — exercises the
    ObjectEmbeddings/ref_object gradients end to end."""
    import dataclasses

    cfg = _replace(tiny_test_config("hamt"), "model", obj_feat_size=24,
                   imagine_enc_pano=False, use_cosine_aux_loss=False,
                   no_lang_ca=True, act_pred_token="ob_hist")
    cfg = _replace(cfg, "train", lr=3e-4, iters=150,
                   experimental_warmup=False)
    cfg = dataclasses.replace(cfg, dataset="reverie")
    world_np, _ = synthetic_world(
        num_scans=1, num_nodes=14, max_candidates=cfg.env.max_candidates,
        views=cfg.env.views, feat_dim=cfg.model.image_feat_size, seed=2,
        max_objects=4, obj_feat_dim=24)
    world = jax.tree.map(jnp.asarray, world_np)
    B = 8
    ep_np = synthetic_episodes(
        world_np, batch=B, max_gt_path_len=cfg.env.max_gt_path_len,
        max_instr_len=cfg.env.max_instr_len,
        max_imaginations=cfg.model.max_imagination_len,
        vocab_size=cfg.model.vocab_size, feat_dim=cfg.model.hidden_size,
        seed=3)
    ep = jax.tree.map(jnp.asarray, ep_np)
    assert ep_np.gt_obj_id is not None

    trainer = HamtTrainer(cfg, world)
    state = trainer.init_state(ep)
    ts = trainer.make_train_step("teacher")

    def grounding_acc(params):
        _, _, pred_obj = trainer.make_eval_step()(params, ep,
                                                  jax.random.PRNGKey(9))
        return float(np.mean(np.asarray(pred_obj)
                             == np.asarray(ep_np.gt_obj_id)))

    acc0 = grounding_acc(state.params)
    key = jax.random.PRNGKey(4)
    for i in range(150):
        key, k = jax.random.split(key)
        state, metrics = ts(state, ep, ep, k)
    acc1 = grounding_acc(state.params)
    assert np.isfinite(float(metrics["loss"]))
    # memorizable batch: grounding should become (near-)perfect; the
    # untrained baseline is chance over the node's visible objects
    assert acc1 >= 0.75, (acc0, acc1)
    assert acc1 > acc0 + 0.2, (acc0, acc1)
