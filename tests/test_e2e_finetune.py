"""ViT-in-the-loop imagination features inside the fine-tune step
(ModelConfig.e2e_imagination; BASELINE config 4).

The reference only runs ViT end-to-end during pre-training
(pretrain_src/model/image_vilmodel.py:40-59); here raw imagination images are
embedded by a flax ViT inside the same jitted train/eval program, either
frozen (stop-gradient + masked out of the optimizer) or trainable.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vln_imagine_tpu.config import _replace, tiny_test_config
from vln_imagine_tpu.envx import synthetic_episodes, synthetic_world
from vln_imagine_tpu.train.trainer import HamtTrainer
from vln_imagine_tpu.train.trainer_duet import DuetTrainer

IMG = 16  # tiny ViT: 16x16 images, patch 8 -> 4 patches


def _e2e_cfg(agent: str, mode: str):
    cfg = tiny_test_config(agent)
    cfg = _replace(cfg, "model", e2e_imagination=mode,
                   e2e_vit_image_size=IMG, e2e_vit_patch_size=8,
                   e2e_vit_layers=2, e2e_vit_heads=2)
    # plain optimizer: under warm-up variant4 the ViT sits in the 'rest'
    # group, frozen for the first 25% of iters, so step 0 wouldn't move it
    return _replace(cfg, "train", experimental_warmup=False)


def _world_and_ep(cfg, batch=2):
    world_np, _ = synthetic_world(
        num_scans=2, num_nodes=16, max_candidates=cfg.env.max_candidates,
        views=cfg.env.views, feat_dim=cfg.model.image_feat_size, seed=3)
    ep = synthetic_episodes(
        world_np, batch=batch, max_gt_path_len=cfg.env.max_gt_path_len,
        max_instr_len=cfg.env.max_instr_len,
        max_imaginations=cfg.model.max_imagination_len,
        vocab_size=cfg.model.vocab_size, feat_dim=cfg.model.hidden_size,
        seed=4, imagine_image_size=IMG)
    world = jax.tree.map(jnp.asarray, world_np)
    ep = jax.tree.map(jnp.asarray, ep)
    return world, ep


def _vit_delta(p1, p2):
    a = p1["params"]["imagine_vit"]
    b = p2["params"]["imagine_vit"]
    return max(jax.tree.leaves(jax.tree.map(
        lambda x, y: float(jnp.abs(x - y).max()), a, b)))


@pytest.mark.slow
@pytest.mark.parametrize("mode", ["frozen", "trainable"])
def test_hamt_e2e_imagination_train_step(mode):
    cfg = _e2e_cfg("hamt", mode)
    world, ep = _world_and_ep(cfg)
    trainer = HamtTrainer(cfg, world)
    state = trainer.init_state(ep)
    assert "imagine_vit" in state.params["params"]
    step = trainer.make_train_step("sample", donate=False)
    state2, metrics = step(state, ep, ep, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["grad_norm"]) > 0
    dv = _vit_delta(state.params, state2.params)
    if mode == "frozen":
        assert dv == 0.0, "frozen ViT params must not move"
    else:
        assert dv > 0.0, "trainable ViT params must move"
    # navigator params always move
    rest = {k: v for k, v in state.params["params"].items()
            if k != "imagine_vit"}
    rest2 = {k: v for k, v in state2.params["params"].items()
             if k != "imagine_vit"}
    d = max(jax.tree.leaves(jax.tree.map(
        lambda x, y: float(jnp.abs(x - y).max()), rest, rest2)))
    assert d > 0.0


def test_hamt_e2e_eval_runs():
    cfg = _e2e_cfg("hamt", "frozen")
    world, ep = _world_and_ep(cfg)
    trainer = HamtTrainer(cfg, world)
    state = trainer.init_state(ep)
    paths, lens = trainer.make_eval_step()(state.params, ep,
                                           jax.random.PRNGKey(1))
    assert np.asarray(lens).min() >= 1


@pytest.mark.slow
def test_duet_e2e_imagination_train_step():
    cfg = _e2e_cfg("duet", "frozen")
    world, ep = _world_and_ep(cfg)
    trainer = DuetTrainer(cfg, world)
    state = trainer.init_state(ep)
    assert "imagine_vit" in state.params["params"]
    step = trainer.make_train_step(donate=False)
    state2, metrics = step(state, ep, ep, jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["loss"]))
    assert _vit_delta(state.params, state2.params) == 0.0
