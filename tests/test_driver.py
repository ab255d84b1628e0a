"""Fine-tune driver loop: intervals, validation, checkpointing, recovery."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vln_imagine_tpu.config import tiny_test_config
from vln_imagine_tpu.driver import FinetuneDriver, SplitData
from vln_imagine_tpu.envx import synthetic_world, synthetic_episodes


@pytest.fixture(scope="module")
def driver(tmp_path_factory):
    cfg = tiny_test_config("hamt")
    world_np, graphs = synthetic_world(
        num_scans=2, num_nodes=18, max_candidates=cfg.env.max_candidates,
        views=cfg.env.views, feat_dim=cfg.model.image_feat_size, seed=0)
    tables = jax.tree.map(jnp.asarray, world_np)

    def split(name, n, seed):
        ep = synthetic_episodes(
            world_np, batch=n, max_gt_path_len=cfg.env.max_gt_path_len,
            max_instr_len=cfg.env.max_instr_len,
            max_imaginations=cfg.model.max_imagination_len,
            vocab_size=cfg.model.vocab_size,
            feat_dim=cfg.model.hidden_size, seed=seed)
        return SplitData(name, ep, [f"{name}_{i}" for i in range(n)])

    log_dir = str(tmp_path_factory.mktemp("run"))
    d = FinetuneDriver(cfg, tables, split("train", 12, 1),
                       [split("val_unseen", 6, 2)], log_dir, graphs=graphs)
    d.setup()
    return d


@pytest.mark.slow
def test_run_produces_checkpoints_and_logs(driver):
    driver.run(iters=4, log_every=2)
    assert os.path.exists(os.path.join(driver.log_dir, "train.txt"))
    assert os.path.exists(os.path.join(driver.log_dir, "metrics.jsonl"))
    assert os.path.isdir(os.path.join(driver.log_dir, "ckpts", "latest_dict"))
    assert os.path.isdir(os.path.join(driver.log_dir, "ckpts",
                                      "best_val_unseen"))


def test_validation_covers_every_item_once(driver):
    score = driver.validate(driver.val_splits[0])
    assert set(score) >= {"sr", "spl", "nDTW"}


def test_validation_writes_submission_and_metrics(driver):
    import json

    driver.validate(driver.val_splits[0], write_outputs=True)
    sub = os.path.join(driver.log_dir, "submit_val_unseen.json")
    ind = os.path.join(driver.log_dir, "individual_metrics_val_unseen.json")
    assert os.path.exists(sub) and os.path.exists(ind)
    with open(sub) as f:
        preds = json.load(f)
    assert len(preds) == 6  # every val item exactly once
    assert {"instr_id", "trajectory"} <= set(preds[0])
    vp, heading, elev = preds[0]["trajectory"][0]
    assert isinstance(vp, str) and isinstance(heading, float)


@pytest.mark.slow
def test_driver_runs_on_data_mesh(tmp_path):
    """Full driver loop with state replicated and batches sharded over the
    8-device virtual CPU mesh (the reference's DDP training)."""
    from vln_imagine_tpu.parallel.mesh import make_mesh

    cfg = tiny_test_config("hamt")
    world_np, _ = synthetic_world(
        num_scans=2, num_nodes=18, max_candidates=cfg.env.max_candidates,
        views=cfg.env.views, feat_dim=cfg.model.image_feat_size, seed=0)
    tables = jax.tree.map(jnp.asarray, world_np)

    def split(name, n, seed):
        ep = synthetic_episodes(
            world_np, batch=n, max_gt_path_len=cfg.env.max_gt_path_len,
            max_instr_len=cfg.env.max_instr_len,
            max_imaginations=cfg.model.max_imagination_len,
            vocab_size=cfg.model.vocab_size,
            feat_dim=cfg.model.hidden_size, seed=seed)
        return SplitData(name, ep, [f"{name}_{i}" for i in range(n)])

    mesh = make_mesh(data=2, model=1, devices=jax.devices()[:2])
    d = FinetuneDriver(cfg, tables, split("train", 8, 1),
                       [split("val_unseen", 4, 2)], str(tmp_path), mesh=mesh)
    d.setup()
    d.run(iters=2, log_every=2)
    assert os.path.isdir(os.path.join(d.log_dir, "ckpts", "latest_dict"))
    score = d.validate(d.val_splits[0])
    assert np.isfinite(score["sr"])


def test_failure_recovery_rolls_back(driver, monkeypatch):
    calls = {"n": 0}
    orig = driver.train_interval

    def flaky(n_iters):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("injected fault")
        return orig(n_iters)

    monkeypatch.setattr(driver, "train_interval", flaky)
    driver.run(iters=4, log_every=2, max_failures=2)
    assert calls["n"] >= 2  # retried after the injected fault
    with open(os.path.join(driver.log_dir, "train.txt")) as f:
        log = f.read()
    assert "injected fault" in log


@pytest.mark.slow
def test_aug_alternation_trains(driver):
    """--aug semantics (main.py:281-302): odd iterations of an interval draw
    batches from the aug split, whose episodes carry no imaginations; the
    fused train step handles both through the imagination masks without a
    second compile."""
    import dataclasses as dc

    from vln_imagine_tpu.data.annotations import RoundRobinSampler

    ep = driver.train_split.episodes
    aug_ep = dc.replace(
        ep, imagine_mask=np.zeros_like(np.asarray(ep.imagine_mask)))
    driver.aug_split = SplitData("aug", aug_ep, driver.train_split.instr_ids)
    driver.aug_sampler = RoundRobinSampler(
        np.asarray(aug_ep.scan).shape[0], driver.cfg.train.batch_size, 99)
    try:
        logs = driver.train_interval(2)   # iter 0 GT, iter 1 aug
        assert all(np.isfinite(v) for v in logs.values()), logs
    finally:
        driver.aug_split = None
        driver.aug_sampler = None


def test_masked_imagination_equals_disabled_modality():
    """An all-False imagine_mask equals imagine_enc_pano=False exactly: the
    additive -10000 mask underflows to zero attention weight in f32, so the
    masked modality contributes nothing (what lets one compiled step serve
    the reference's per-iteration imagine_enc_pano flip, main.py:289-300)."""
    import dataclasses as dc

    from vln_imagine_tpu.config import _replace
    from vln_imagine_tpu.train.rollout_hamt import rollout_hamt
    from vln_imagine_tpu.train.trainer import HamtTrainer

    cfg = tiny_test_config("hamt")
    world_np, _ = synthetic_world(
        num_scans=1, num_nodes=14, max_candidates=cfg.env.max_candidates,
        views=cfg.env.views, feat_dim=cfg.model.image_feat_size, seed=5)
    world = jax.tree.map(jnp.asarray, world_np)
    ep = jax.tree.map(jnp.asarray, synthetic_episodes(
        world_np, batch=3, max_gt_path_len=cfg.env.max_gt_path_len,
        max_instr_len=cfg.env.max_instr_len,
        max_imaginations=cfg.model.max_imagination_len,
        vocab_size=cfg.model.vocab_size, feat_dim=cfg.model.hidden_size,
        seed=6))
    ep_masked = dc.replace(ep,
                           imagine_mask=jnp.zeros_like(ep.imagine_mask))

    trainer = HamtTrainer(cfg, world)
    state = trainer.init_state(ep)
    rng = jax.random.PRNGKey(7)
    res_masked = rollout_hamt(
        trainer.model, trainer.critic, state.params, None, world, ep_masked,
        cfg, rng, feedback="teacher", train_ml=1.0, deterministic=True)
    cfg_off = _replace(cfg, "model", imagine_enc_pano=False,
                       use_cosine_aux_loss=False)
    from vln_imagine_tpu.models.hamt import HamtModel
    model_off = HamtModel(cfg_off.model,
                          feat_dropout=cfg_off.train.feat_dropout)
    res_off = rollout_hamt(
        model_off, trainer.critic, state.params, None, world, ep, cfg_off,
        rng, feedback="teacher", train_ml=1.0, deterministic=True)
    assert float(res_masked.aux_loss) == 0.0
    np.testing.assert_allclose(np.asarray(res_masked.logits),
                               np.asarray(res_off.logits),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(res_masked.path_nodes),
                                  np.asarray(res_off.path_nodes))


@pytest.mark.slow
def test_duet_detailed_output_submission(tmp_path):
    """--detailed_output (agent.py:597-601, main_nav.py:384): validation
    writes detail_<env>.json whose entries carry per-visited-node
    {'stop_prob': float} details keyed by real viewpoint ids."""
    import json

    from vln_imagine_tpu.config import _replace

    cfg = _replace(tiny_test_config("duet"), "train", detailed_output=True)
    world_np, graphs = synthetic_world(
        num_scans=2, num_nodes=18, max_candidates=cfg.env.max_candidates,
        views=cfg.env.views, feat_dim=cfg.model.image_feat_size, seed=3)
    tables = jax.tree.map(jnp.asarray, world_np)

    def split(name, n, seed):
        ep = synthetic_episodes(
            world_np, batch=n, max_gt_path_len=cfg.env.max_gt_path_len,
            max_instr_len=cfg.env.max_instr_len,
            max_imaginations=cfg.model.max_imagination_len,
            vocab_size=cfg.model.vocab_size,
            feat_dim=cfg.model.hidden_size, seed=seed)
        return SplitData(name, ep, [f"{name}_{i}" for i in range(n)])

    val = split("val_unseen", 6, 4)
    d = FinetuneDriver(cfg, tables, split("train", 8, 5), [val],
                       str(tmp_path), graphs=graphs)
    d.setup()
    d.state = d.trainer.init_state(
        jax.tree.map(jnp.asarray, val.episodes))
    d.validate(val, write_outputs=True)
    out = os.path.join(str(tmp_path), "detail_val_unseen.json")
    assert os.path.exists(out)
    preds = json.load(open(out))
    assert len(preds) == 6
    all_vps = {vp for g in graphs for vp in g.node_ids}
    for p in preds:
        assert p["details"], p["instr_id"]  # at least the start node
        for vp, dd in p["details"].items():
            assert vp in all_vps
            assert np.isfinite(dd["stop_prob"])


def test_validation_pipelining_matches_synchronous(driver, monkeypatch):
    """The pipelined eval dispatch (VLN_EVAL_PIPELINE in-flight window) is
    a pure scheduling change: per-item metrics are identical to fully
    synchronous depth-1 evaluation."""
    monkeypatch.setenv("VLN_EVAL_PIPELINE", "1")
    driver._rng = jax.random.PRNGKey(77)
    sync = driver.validate(driver.val_splits[0])
    monkeypatch.setenv("VLN_EVAL_PIPELINE", "16")
    driver._rng = jax.random.PRNGKey(77)
    pipe = driver.validate(driver.val_splits[0])
    assert sync == pipe


def test_nan_loss_triggers_rollback(driver, monkeypatch):
    """A non-finite interval loss is treated as an interval failure: the
    numerical-health guard raises and the driver rolls back to latest_dict
    instead of training on poisoned parameters."""
    calls = {"n": 0}
    orig = driver.train_interval

    def poisoned(n_iters):
        calls["n"] += 1
        if calls["n"] == 1:
            out = dict(orig(n_iters))
            out["loss"] = float("nan")
            return out
        return orig(n_iters)

    monkeypatch.setattr(driver, "train_interval", poisoned)
    driver.run(iters=4, log_every=2, max_failures=2)
    assert calls["n"] >= 2
    with open(os.path.join(driver.log_dir, "train.txt")) as f:
        log = f.read()
    assert "non-finite training metrics" in log


def test_validation_bucketing_matches_sequential(driver, monkeypatch):
    """Length-bucketed eval batching (VLN_EVAL_BUCKET) is pure scheduling:
    per-item metrics keyed by instr_id are identical to sequential order."""
    import json

    def per_item(bucket):
        monkeypatch.setenv("VLN_EVAL_BUCKET", bucket)
        driver._rng = jax.random.PRNGKey(5)
        driver.validate(driver.val_splits[0], write_outputs=True)
        path = os.path.join(driver.log_dir,
                            "individual_metrics_val_unseen.json")
        m = json.load(open(path))
        ids = m["instr_id"]
        return {ids[i]: {k: v[i] for k, v in m.items() if k != "instr_id"}
                for i in range(len(ids))}

    seq = per_item("0")
    buck = per_item("1")
    assert seq.keys() == buck.keys()
    for k in seq:
        assert seq[k] == buck[k], (k, seq[k], buck[k])
