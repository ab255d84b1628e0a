"""Pre-training stacks: task batches, train/validate, weight transfer."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vln_imagine_tpu.config import tiny_test_config, _replace
from vln_imagine_tpu.envx import synthetic_world, synthetic_episodes
from vln_imagine_tpu.pretrain.trainer import DuetPretrainer, HamtPretrainer


def _setup(agent, tasks=None, mix=None):
    cfg = tiny_test_config(agent)
    if tasks:
        cfg = _replace(cfg, "pretrain", tasks=tasks, mix_ratio=mix)
    world_np, _ = synthetic_world(
        num_scans=2, num_nodes=20, max_candidates=cfg.env.max_candidates,
        views=cfg.env.views, feat_dim=cfg.model.image_feat_size, seed=1)
    ep = synthetic_episodes(
        world_np, batch=10, max_gt_path_len=cfg.env.max_gt_path_len,
        max_instr_len=cfg.env.max_instr_len,
        max_imaginations=cfg.model.max_imagination_len,
        vocab_size=cfg.model.vocab_size, feat_dim=cfg.model.hidden_size,
        seed=2)
    world = jax.tree.map(jnp.asarray, world_np)
    return cfg, world, world_np, ep


@pytest.fixture(scope="module")
def hamt_pt():
    cfg, world, _, ep = _setup("hamt")
    pt = HamtPretrainer(cfg, world, ep, image_prob_size=16)
    return pt, pt.init_state()


def test_hamt_task_batches_shapes(hamt_pt):
    pt, _ = hamt_pt
    for task in pt.cfg.pretrain.tasks:
        batch = pt.batcher.task_batch(task, 3)
        for key in pt.task_args[task]:
            assert key in batch, (task, key)
            assert batch[key].shape[0] in (3, batch["shuffled_pos_ids"].shape[0]
                                           if "shuffled_pos_ids" in batch
                                           else 3)


def test_mlm_masking_rules(hamt_pt):
    pt, _ = hamt_pt
    batch = pt.batcher.mlm_batch(np.arange(6))
    labels = batch["txt_labels"]
    assert (labels >= 0).any(axis=1).all()  # every item predicts something
    assert (labels[:, 0] == -1).all()       # [CLS] never masked
    # masked positions fall inside the valid text
    assert (batch["txt_masks"] | (labels == -1)).all()


@pytest.mark.slow
def test_hamt_pretrain_steps_and_validation(hamt_pt):
    pt, state = hamt_pt
    # the train step donates its input state; train on a copy so the
    # module-scoped fixture state stays alive for later tests
    state = jax.tree.map(jnp.copy, state)
    state, summary = pt.train(state, num_steps=8, batch_size=3)
    assert all(np.isfinite(v) for v in summary.values())
    val = pt.validate(state, batch_size=3, num_batches=1)
    assert set(val) == set(pt.cfg.pretrain.tasks)
    assert 0.0 <= val["mlm"]["acc"] <= 1.0


def test_sap_labels_match_teacher(hamt_pt):
    pt, _ = hamt_pt
    batch = pt.batcher.base_batch(np.arange(8), end_step=False)
    K = pt.batcher.K
    acts = batch["ob_action_viewindex"]
    # stop slot or a valid candidate slot
    for i, a in enumerate(acts):
        assert 0 <= a <= K
        if a < K:
            assert batch["ob_nav_types"][i, a] == 1


@pytest.mark.slow
def test_duet_pretrain_end_to_end():
    cfg, world, _, ep = _setup("duet", tasks=("mlm", "mrc", "sap"),
                               mix=(1, 1, 1))
    pt = DuetPretrainer(cfg, world, ep, image_prob_size=16)
    state = pt.init_state()
    state, summary = pt.train(state, num_steps=6, batch_size=3)
    assert all(np.isfinite(v) for v in summary.values())
    val = pt.validate(state, batch_size=3, num_batches=1)
    assert set(val) == {"mlm", "mrc", "sap"}


def test_pretrained_weights_transfer_to_finetune(hamt_pt):
    from vln_imagine_tpu.ckpt.transfer import init_finetune_from_pretrain
    from vln_imagine_tpu.train.trainer import HamtTrainer

    pt, state = hamt_pt
    cfg, world, _, ep = _setup("hamt")
    ep = jax.tree.map(jnp.asarray, ep)
    trainer = HamtTrainer(cfg, world)
    ft_state = trainer.init_state(ep)
    new_params, transferred, missing = init_finetune_from_pretrain(
        ft_state.params, state.params)
    assert transferred > 0
    # language embeddings must transfer
    np.testing.assert_array_equal(
        np.asarray(new_params["params"]["embeddings"]["word_embeddings"]
                   ["embedding"]),
        np.asarray(state.params["params"]["embeddings"]["word_embeddings"]
                   ["embedding"]))
    # imagination modules are finetune-only: they stay at init
    assert "imagine_embeddings" in {m for m, _ in missing} or \
        any("imagine" in m for m, _ in missing)


@pytest.mark.slow
def test_gradient_accumulation_updates_every_k():
    """PretrainConfig.gradient_accumulation_steps: params change only on
    every k-th micro-step, matching main_r2r.py:240-280 (loss/k per
    micro-batch + optimizer.step every k == one update on the mean grad)."""
    cfg, world, _, ep = _setup("hamt", tasks=("mlm",), mix=(1,))
    # warmup_steps=1 so the SECOND optimizer update has a real LR (the
    # linear warm-up makes the very first update lr=0 by construction)
    cfg = _replace(cfg, "pretrain", gradient_accumulation_steps=2,
                   warmup_steps=1)
    pt = HamtPretrainer(cfg, world, ep, image_prob_size=16, donate=False)
    state = pt.init_state()

    def snap(s):
        return jax.tree.map(np.asarray, s.params)

    # micro-steps 1..3: updates may only land on micro-step 2 (k=2)
    states = [state]
    for _ in range(4):
        s, _ = pt.train(states[-1], 1)
        states.append(s)
    p = [snap(s) for s in states]

    def unchanged(a, b):
        return all(np.array_equal(x, y) for x, y in zip(
            jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)))

    assert unchanged(p[0], p[1]), "no update on micro-step 1"
    assert unchanged(p[2], p[3]), "no update on micro-step 3"
    assert not unchanged(p[3], p[4]), \
        "params must update on the k-th micro-step (update #2, lr>0)"


def test_validation_uses_heldout_split():
    """validate(split=...) draws from the registered held-out batcher
    (main_r2r.py:303-316 validates seen/unseen, not the train loader)."""
    cfg, world, world_np, ep = _setup("hamt", tasks=("mlm",), mix=(1,))
    val_ep = synthetic_episodes(
        world_np, batch=6, max_gt_path_len=cfg.env.max_gt_path_len,
        max_instr_len=cfg.env.max_instr_len,
        max_imaginations=cfg.model.max_imagination_len,
        vocab_size=cfg.model.vocab_size, feat_dim=cfg.model.hidden_size,
        seed=77)
    pt = HamtPretrainer(cfg, world, ep, image_prob_size=16, donate=False)
    pt.add_validation_split("val_unseen", world, val_ep, seed=3)
    state = pt.init_state()
    out_val = pt.validate(state, batch_size=4, num_batches=2,
                          split="val_unseen")
    assert set(out_val) == {"mlm"}
    assert np.isfinite(out_val["mlm"]["loss"])
    # the val batcher is a distinct sampler over distinct episodes
    assert pt.val_batchers["val_unseen"] is not pt.batcher
