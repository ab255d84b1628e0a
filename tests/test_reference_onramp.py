"""Released-checkpoint on-ramp (VERDICT r2 item 3).

The released weights arrive in the agent-save format —
{vln_bert, critic} x {epoch, state_dict, optimizer} in one torch file, with
DDP 'module.' prefixes when saved from a distributed run
(VLN-HAMT/finetune_src/r2r/agent_cmt.py:837-875; DUET heals the prefixes on
load, map_nav_src/r2r/agent_base.py:250-282).  These tests build synthetic
files in EXACTLY that format from live torch reference models, round-trip
them through ckpt.manager.load_reference_checkpoint for both agents, and
assert forward-logit equality against the torch source — so the day someone
mounts `iter_32000_SR_67.26_SPL_62.02_val_unseen` it loads with zero new
code (`scripts/train.py --init-from-reference <file.pt>`).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

import test_reference_parity_duet as PD
import test_reference_parity_hamt as PH
from vln_imagine_tpu.ckpt.manager import load_reference_checkpoint
from vln_imagine_tpu.models.bert import Critic
from vln_imagine_tpu.models.duet import DuetModel
from vln_imagine_tpu.models.hamt import HamtModel

TOL = dict(rtol=1e-4, atol=1e-4)


def _ddp(sd):
    """Simulate a state_dict saved from a DDP-wrapped module
    (torch prepends 'module.'; agent_cmt.py:62 wraps when world_size>1)."""
    return {"module." + k: v for k, v in sd.items()}


def _critic_state_dict(rng):
    """Reference Critic tensors under the exact agent-save key names: the
    critic is nn.Sequential(Linear(768,512), ReLU, Dropout, Linear(512,1))
    named 'state2value' (model_HAMT.py:289-300)."""
    return {
        "state2value.0.weight": torch.from_numpy(
            rng.standard_normal((512, 768)).astype(np.float32) * 0.02),
        "state2value.0.bias": torch.zeros(512),
        "state2value.3.weight": torch.from_numpy(
            rng.standard_normal((1, 512)).astype(np.float32) * 0.02),
        "state2value.3.bias": torch.zeros(1),
    }


def _critic_forward_np(sd, state):
    w0 = sd["state2value.0.weight"].numpy()
    b0 = sd["state2value.0.bias"].numpy()
    w1 = sd["state2value.3.weight"].numpy()
    b1 = sd["state2value.3.bias"].numpy()
    h = np.maximum(state @ w0.T + b0, 0.0)
    return (h @ w1.T + b1)[:, 0]


def _fake_optimizer_state(model):
    """A real torch AdamW state_dict — saved alongside weights by the agent
    (agent_cmt.py:845-851) and ignored by the on-ramp (fresh optax state)."""
    opt = torch.optim.AdamW(model.parameters(), lr=1e-5)
    return opt.state_dict()


@pytest.mark.slow
def test_hamt_agent_save_onramp(tmp_path):
    V = PH._import_ref_hamt()
    cfg = PH._my_config()
    torch.manual_seed(11)
    ref = V.NavCMT(PH._ref_config(cfg.model)).eval()
    rng = np.random.default_rng(0)
    critic_sd = _critic_state_dict(rng)

    path = str(tmp_path / "iter_32000_SR_67.26_SPL_62.02_val_unseen")
    torch.save({
        "vln_bert": {"epoch": 7, "state_dict": _ddp(ref.state_dict()),
                     "optimizer": _fake_optimizer_state(ref)},
        "critic": {"epoch": 7, "state_dict": _ddp(critic_sd),
                   "optimizer": {"state": {}, "param_groups": []}},
    }, path)

    out = load_reference_checkpoint(path, agent="hamt")
    assert out["epoch"] == 7
    assert not out["skipped"], f"unconverted keys: {out['skipped'][:8]}"

    # forward-logit parity of the loaded params against the torch source
    txt_ids = rng.integers(1, 1000, (2, 12)).astype(np.int64)
    txt_mask = np.ones((2, 12), bool)
    with torch.no_grad():
        want = ref("language", txt_ids=torch.from_numpy(txt_ids),
                   txt_masks=torch.from_numpy(txt_mask).float()).numpy()
    model = HamtModel(cfg.model, feat_dropout=0.0)
    got = np.asarray(model.apply(out["params"], jnp.asarray(txt_ids),
                                 jnp.asarray(txt_mask),
                                 method=HamtModel.language))
    np.testing.assert_allclose(got, want, **TOL)

    # critic values through the converted params match the torch tensors
    state_vec = rng.standard_normal((2, 768)).astype(np.float32)
    critic = Critic(cfg.model)
    got_v = np.asarray(critic.apply(out["critic_params"],
                                    jnp.asarray(state_vec)))
    np.testing.assert_allclose(got_v, _critic_forward_np(critic_sd,
                                                         state_vec), **TOL)


@pytest.mark.slow
def test_duet_agent_save_onramp(tmp_path):
    V = PD._import_ref_duet()
    cfg = PD._my_config()
    torch.manual_seed(13)
    ref = V.GlocalTextPathNavCMT(PD._ref_config(cfg.model)).eval()

    path = str(tmp_path / "iter_44000_SR_72.12_SPL_60.48_val_unseen")
    torch.save({
        "vln_bert": {"epoch": 3, "state_dict": _ddp(ref.state_dict()),
                     "optimizer": _fake_optimizer_state(ref)},
    }, path)

    out = load_reference_checkpoint(path, agent="duet")
    assert out["epoch"] == 3
    assert not out["skipped"], f"unconverted keys: {out['skipped'][:8]}"

    rng = np.random.default_rng(1)
    txt_ids = rng.integers(1, 1000, (2, 10)).astype(np.int64)
    txt_mask = np.ones((2, 10), bool)
    with torch.no_grad():
        want = ref("language", {
            "txt_ids": torch.from_numpy(txt_ids),
            "txt_masks": torch.from_numpy(txt_mask)}).numpy()
    model = DuetModel(cfg.model, feat_dropout=0.0)
    got = np.asarray(model.apply(out["params"], jnp.asarray(txt_ids),
                                 jnp.asarray(txt_mask),
                                 method=DuetModel.text))
    np.testing.assert_allclose(got, want, **TOL)


@pytest.mark.slow
def test_driver_init_from_reference(tmp_path):
    """The CLI path: FinetuneDriver.init_from_reference installs the
    released weights (+ critic) into the live state and rollout logits match
    a from-params apply — proving --init-from-reference needs no new code
    on first contact with a real file."""
    from vln_imagine_tpu.driver import FinetuneDriver, SplitData
    from vln_imagine_tpu.envx import synthetic_episodes, synthetic_world

    V = PH._import_ref_hamt()
    cfg = dataclasses.replace(PH._my_config(), dataset="r2r")
    from vln_imagine_tpu.config import _replace
    cfg = _replace(cfg, "env", max_candidates=6, max_nodes=12, views=12,
                   max_action_len=4, max_instr_len=12, max_gt_path_len=5)
    cfg = _replace(cfg, "train", batch_size=2, feat_dropout=0.0)

    torch.manual_seed(17)
    ref = V.NavCMT(PH._ref_config(cfg.model)).eval()
    rng = np.random.default_rng(2)
    path = str(tmp_path / "released.pt")
    torch.save({
        "vln_bert": {"epoch": 9, "state_dict": _ddp(ref.state_dict()),
                     "optimizer": _fake_optimizer_state(ref)},
        "critic": {"epoch": 9,
                   "state_dict": _ddp(_critic_state_dict(rng)),
                   "optimizer": {"state": {}, "param_groups": []}},
    }, path)

    world_np, graphs = synthetic_world(
        num_scans=1, num_nodes=12, max_candidates=cfg.env.max_candidates,
        views=cfg.env.views, feat_dim=cfg.model.image_feat_size, seed=3)
    ep = synthetic_episodes(
        world_np, batch=2, max_gt_path_len=cfg.env.max_gt_path_len,
        max_instr_len=cfg.env.max_instr_len,
        max_imaginations=cfg.model.max_imagination_len,
        vocab_size=cfg.model.vocab_size, feat_dim=cfg.model.hidden_size,
        seed=4)
    tables = jax.tree.map(jnp.asarray, world_np)
    train = SplitData("train", ep, ["a", "b"])
    driver = FinetuneDriver(cfg, tables, train, [], str(tmp_path / "logs"),
                            graphs=graphs)
    driver.setup()
    before = jax.device_get(jax.tree_util.tree_leaves(driver.state.params))
    info = driver.init_from_reference(path)
    assert info["epoch"] == 9 and not info["skipped"]
    after = jax.device_get(jax.tree_util.tree_leaves(driver.state.params))
    n_changed = sum(not np.array_equal(a, b)
                    for a, b in zip(before, after))
    # LayerNorm scales/biases are init-identical in both frameworks, so only
    # the weight matrices/embeddings visibly change; the logit-parity check
    # below is the actual correctness proof
    assert n_changed >= 100, (
        f"only {n_changed}/{len(before)} param leaves replaced")

    # the installed params run the product rollout and match the torch
    # language embedding on the episode's own instructions
    txt = np.asarray(ep.txt_ids).astype(np.int64)
    mask = np.asarray(ep.txt_mask)
    with torch.no_grad():
        want = ref("language", txt_ids=torch.from_numpy(txt),
                   txt_masks=torch.from_numpy(mask).float()).numpy()
    got = np.asarray(driver.trainer.model.apply(
        driver.state.params, jnp.asarray(txt), jnp.asarray(mask),
        method=HamtModel.language))
    np.testing.assert_allclose(got, want, **TOL)
    # critic installed too
    assert driver.state.critic_params is not None


@pytest.mark.slow
def test_bert_ckpt_file_pretrain_onramp(tmp_path):
    """The --bert_ckpt_file on-ramp: a flat torch pre-train state_dict
    (model_step_<N>.pt — 'module.' prefixes, shared weights under 'bert.',
    the next_action head at top level, pretrain-only heads present,
    NO imagination modules; the exact file get_vlnbert_models consumes,
    vlnbert_init.py:20-31) grafts into the fine-tune model: shared
    subtrees byte-equal, pretrain-only heads skipped, fine-tune-only
    modules left at init."""
    from vln_imagine_tpu.driver import FinetuneDriver, SplitData
    from vln_imagine_tpu.envx import synthetic_episodes, synthetic_world

    V = PH._import_ref_hamt()
    cfg = dataclasses.replace(PH._my_config(), dataset="r2r")
    from vln_imagine_tpu.config import _replace
    cfg = _replace(cfg, "env", max_candidates=6, max_nodes=12, views=12,
                   max_action_len=4, max_instr_len=12, max_gt_path_len=5)
    cfg = _replace(cfg, "train", batch_size=2, feat_dropout=0.0)

    torch.manual_seed(23)
    ref = V.NavCMT(PH._ref_config(cfg.model)).eval()
    # assemble the pretrain-save layout from the live torch model
    ft_only = ("imagine_embeddings", "image_proj",
               "contrastive_alignment_model")
    sd = {}
    for k, v in ref.state_dict().items():
        if k.startswith(ft_only):
            continue  # real pretrain checkpoints have no imagination code
        prefixed = k if k.startswith("next_action") else "bert." + k
        sd["module." + prefixed] = v
    # pretrain-only heads ride along and must be skipped, not crash
    sd["module.mlm_head.predictions.transform.dense.weight"] = \
        torch.zeros(8, 8)
    sd["module.itm_head.weight"] = torch.zeros(2, 8)
    path = str(tmp_path / "model_step_130000.pt")
    torch.save(sd, path)

    world_np, graphs = synthetic_world(
        num_scans=1, num_nodes=12, max_candidates=cfg.env.max_candidates,
        views=cfg.env.views, feat_dim=cfg.model.image_feat_size, seed=5)
    ep = synthetic_episodes(
        world_np, batch=2, max_gt_path_len=cfg.env.max_gt_path_len,
        max_instr_len=cfg.env.max_instr_len,
        max_imaginations=cfg.model.max_imagination_len,
        vocab_size=cfg.model.vocab_size, feat_dim=cfg.model.hidden_size,
        seed=6)
    tables = jax.tree.map(jnp.asarray, world_np)
    driver = FinetuneDriver(cfg, tables, SplitData("train", ep, ["a", "b"]),
                            [], str(tmp_path / "logs"), graphs=graphs)
    driver.setup()
    init_imagine = jax.device_get(
        driver.state.params["params"]["imagine_embeddings"])
    info = driver.init_from_bert_ckpt(path)
    assert info["transferred"] > 0
    # itm_head has no mapping at all -> skipped at conversion; mlm_head
    # converts (it matters for pretrain-model grafts) but the fine-tune
    # model has no mlm_head subtree, so it simply doesn't land
    assert any("itm_head" in k for k in info["skipped"])
    assert "mlm_head" not in driver.state.params["params"]
    # fine-tune-only imagination modules stayed at their init
    after_imagine = jax.device_get(
        driver.state.params["params"]["imagine_embeddings"])
    for a, b in zip(jax.tree_util.tree_leaves(init_imagine),
                    jax.tree_util.tree_leaves(after_imagine)):
        np.testing.assert_array_equal(a, b)
    assert any("imagine" in m for m, _ in info["missing"])

    # shared weights match the torch source: language forward parity
    txt = np.asarray(ep.txt_ids).astype(np.int64)
    mask = np.asarray(ep.txt_mask)
    with torch.no_grad():
        want = ref("language", txt_ids=torch.from_numpy(txt),
                   txt_masks=torch.from_numpy(mask).float()).numpy()
    got = np.asarray(driver.trainer.model.apply(
        driver.state.params, jnp.asarray(txt), jnp.asarray(mask),
        method=HamtModel.language))
    np.testing.assert_allclose(got, want, **TOL)
    # the transferred next_action head equals the torch head tensors
    head = jax.device_get(
        driver.state.params["params"]["next_action"])
    want_w = ref.state_dict()["next_action.net.0.weight"].numpy()
    leaves = {tuple(np.asarray(l).shape): np.asarray(l)
              for l in jax.tree_util.tree_leaves(head)}
    assert want_w.T.shape in leaves
    np.testing.assert_allclose(leaves[want_w.T.shape], want_w.T, **TOL)
