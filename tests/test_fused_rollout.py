"""Fused IL+RL rollout (feedback='mixed'): per-half numerical equivalence
with the separate teacher-forced and sampled rollouts it replaces."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vln_imagine_tpu.config import tiny_test_config, _replace
from vln_imagine_tpu.envx import synthetic_world, synthetic_episodes
from vln_imagine_tpu.train.rollout_hamt import rollout_hamt
from vln_imagine_tpu.train.trainer import HamtTrainer


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_test_config("hamt")
    world_np, _ = synthetic_world(
        num_scans=2, num_nodes=20, max_candidates=cfg.env.max_candidates,
        views=cfg.env.views, feat_dim=cfg.model.image_feat_size, seed=1)
    world = jax.tree.map(jnp.asarray, world_np)
    eps = []
    for seed in (2, 3):
        ep = synthetic_episodes(
            world_np, batch=3, max_gt_path_len=cfg.env.max_gt_path_len,
            max_instr_len=cfg.env.max_instr_len,
            max_imaginations=cfg.model.max_imagination_len,
            vocab_size=cfg.model.vocab_size, feat_dim=cfg.model.hidden_size,
            seed=seed)
        eps.append(jax.tree.map(jnp.asarray, ep))
    trainer = HamtTrainer(cfg, world)
    state = trainer.init_state(eps[0])
    return cfg, world, trainer, state, eps


def _roll(trainer, world, cfg, params, cparams, ep, rng, **kw):
    return rollout_hamt(trainer.model, trainer.critic, params, cparams,
                        world, ep, cfg, rng, deterministic=True, **kw)


@pytest.mark.slow
def test_all_il_mixed_matches_teacher(setup):
    cfg, world, trainer, state, (ep, _) = setup
    rng = jax.random.PRNGKey(0)
    il_m = jnp.ones((ep.batch,), bool)
    mixed = _roll(trainer, world, cfg, state.params, state.critic_params, ep,
                  rng, feedback="mixed", train_ml=0.2, train_rl=True,
                  il_mask=il_m)
    teach = _roll(trainer, world, cfg, state.params, None, ep, rng,
                  feedback="teacher", train_ml=0.2, train_rl=False)
    np.testing.assert_allclose(float(mixed.ml_loss), float(teach.ml_loss),
                               rtol=1e-6)
    np.testing.assert_allclose(float(mixed.aux_loss), float(teach.aux_loss),
                               rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(mixed.path_nodes),
                                  np.asarray(teach.path_nodes))
    assert float(mixed.rl_loss) == 0.0  # RL terms fully masked


@pytest.mark.slow
def test_all_rl_mixed_matches_sample(setup):
    cfg, world, trainer, state, (ep, _) = setup
    rng = jax.random.PRNGKey(4)
    il_m = jnp.zeros((ep.batch,), bool)
    mixed = _roll(trainer, world, cfg, state.params, state.critic_params, ep,
                  rng, feedback="mixed", train_ml=0.2, train_rl=True,
                  il_mask=il_m)
    samp = _roll(trainer, world, cfg, state.params, state.critic_params, ep,
                 rng, feedback="sample", train_ml=None, train_rl=True)
    np.testing.assert_array_equal(np.asarray(mixed.actions),
                                  np.asarray(samp.actions))
    np.testing.assert_allclose(float(mixed.rl_loss), float(samp.rl_loss),
                               rtol=1e-6)
    np.testing.assert_allclose(float(mixed.entropy_sum),
                               float(samp.entropy_sum), rtol=1e-6)
    assert float(mixed.ml_loss) == 0.0  # CE fully masked


@pytest.mark.slow
def test_fused_halves_match_separate_il(setup):
    """In a half/half fused batch the IL half's CE and both halves' aux
    losses equal the separate per-rollout values (the RL half's sampled
    trajectory differs only through the rng stream)."""
    cfg, world, trainer, state, (ep_il, ep_rl) = setup
    rng = jax.random.PRNGKey(7)
    ep = jax.tree.map(lambda a, b: jnp.concatenate([a, b], 0), ep_il, ep_rl)
    il_m = jnp.concatenate([jnp.ones(ep_il.batch, bool),
                            jnp.zeros(ep_rl.batch, bool)])
    mixed = _roll(trainer, world, cfg, state.params, state.critic_params, ep,
                  rng, feedback="mixed", train_ml=0.2, train_rl=True,
                  il_mask=il_m)
    teach = _roll(trainer, world, cfg, state.params, None, ep_il, rng,
                  feedback="teacher", train_ml=0.2, train_rl=False)
    samp = _roll(trainer, world, cfg, state.params, state.critic_params,
                 ep_rl, rng, feedback="sample", train_ml=None, train_rl=True)
    np.testing.assert_allclose(float(mixed.ml_loss), float(teach.ml_loss),
                               rtol=1e-6)
    # aux over the fused batch = aux(IL half) + aux(RL half)
    np.testing.assert_allclose(
        float(mixed.aux_loss),
        float(teach.aux_loss) + float(samp.aux_loss), rtol=1e-6)
    # IL items' trajectories are feedback-deterministic: identical in fusion
    np.testing.assert_array_equal(
        np.asarray(mixed.path_nodes)[: ep_il.batch],
        np.asarray(teach.path_nodes))
    assert np.isfinite(float(mixed.rl_loss))


@pytest.mark.slow
def test_fused_train_step_runs_and_updates(setup):
    from vln_imagine_tpu.config import _replace

    cfg, world, trainer, state, (ep_il, ep_rl) = setup
    cfg = _replace(cfg, "train", fused_sample_rollout=True)
    trainer = HamtTrainer(cfg, world)
    state = trainer.init_state(ep_il)
    step = trainer.make_train_step("sample", donate=False)
    new_state, metrics = step(state, ep_il, ep_rl, jax.random.PRNGKey(9))
    for k in ("loss", "ml_loss", "rl_loss", "aux_loss", "grad_norm"):
        assert np.isfinite(float(metrics[k])), k
    assert float(metrics["grad_norm"]) > 0
    changed = jax.tree.map(
        lambda a, b: bool(np.any(np.asarray(a) != np.asarray(b))),
        state.params, new_state.params)
    assert any(jax.tree.leaves(changed))
