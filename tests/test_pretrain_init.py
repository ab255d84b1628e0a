"""BERT / LXMERT pre-training initialization on-ramp.

The reference starts pre-training from released torch weights with key
surgery (VLN-DUET/pretrain_src/train_r2r.py:110-139: LXMERT language layers
-> lang_encoder, x_layers DUPLICATED into local+global encoders,
cls.predictions -> mlm_head; VLN-HAMT/pretrain_src/main_r2r.py:131-147:
HF bert-base-uncased copied key-for-key).  These tests fabricate
numerically-known state_dicts in EXACTLY those file formats, run them
through ckpt.manager.load_pretrain_init + the shape-checked graft, and
assert tensor-level equality inside the live pretrainers.
"""

import numpy as np
import pytest
import torch

import jax

from vln_imagine_tpu.ckpt.manager import load_pretrain_init
from vln_imagine_tpu.ckpt.transfer import init_finetune_from_pretrain
from vln_imagine_tpu.config import tiny_test_config, _replace
from vln_imagine_tpu.envx import synthetic_world, synthetic_episodes

pytestmark = pytest.mark.slow


def _t(rng, *shape):
    return torch.from_numpy(rng.standard_normal(shape).astype(np.float32)
                            * 0.02)


def _bert_layer(rng, prefix, H, I):
    """One HF BertLayer's tensors under `prefix`."""
    sd = {}
    for name, shape in [
        ("attention.self.query.weight", (H, H)),
        ("attention.self.query.bias", (H,)),
        ("attention.self.key.weight", (H, H)),
        ("attention.self.key.bias", (H,)),
        ("attention.self.value.weight", (H, H)),
        ("attention.self.value.bias", (H,)),
        ("attention.output.dense.weight", (H, H)),
        ("attention.output.dense.bias", (H,)),
        ("attention.output.LayerNorm.weight", (H,)),
        ("attention.output.LayerNorm.bias", (H,)),
        ("intermediate.dense.weight", (I, H)),
        ("intermediate.dense.bias", (I,)),
        ("output.dense.weight", (H, I)),
        ("output.dense.bias", (H,)),
        ("output.LayerNorm.weight", (H,)),
        ("output.LayerNorm.bias", (H,)),
    ]:
        sd[f"{prefix}.{name}"] = _t(rng, *shape)
    return sd


def _lxrtx_layer(rng, prefix, H, I):
    """One LXMERT LXRTXLayer's tensors (model_LXRT.pth member names)."""
    sd = {}
    for side in ("lang", "visn"):
        for name, shape in [
            (f"{side}_self_att.self.query.weight", (H, H)),
            (f"{side}_self_att.self.query.bias", (H,)),
            (f"{side}_self_att.self.key.weight", (H, H)),
            (f"{side}_self_att.self.key.bias", (H,)),
            (f"{side}_self_att.self.value.weight", (H, H)),
            (f"{side}_self_att.self.value.bias", (H,)),
            (f"{side}_self_att.output.dense.weight", (H, H)),
            (f"{side}_self_att.output.dense.bias", (H,)),
            (f"{side}_self_att.output.LayerNorm.weight", (H,)),
            (f"{side}_self_att.output.LayerNorm.bias", (H,)),
            (f"{side}_inter.dense.weight", (I, H)),
            (f"{side}_inter.dense.bias", (I,)),
            (f"{side}_output.dense.weight", (H, I)),
            (f"{side}_output.dense.bias", (H,)),
            (f"{side}_output.LayerNorm.weight", (H,)),
            (f"{side}_output.LayerNorm.bias", (H,)),
        ]:
            sd[f"{prefix}.{name}"] = _t(rng, *shape)
    for name, shape in [
        ("visual_attention.att.query.weight", (H, H)),
        ("visual_attention.att.query.bias", (H,)),
        ("visual_attention.att.key.weight", (H, H)),
        ("visual_attention.att.key.bias", (H,)),
        ("visual_attention.att.value.weight", (H, H)),
        ("visual_attention.att.value.bias", (H,)),
        ("visual_attention.output.dense.weight", (H, H)),
        ("visual_attention.output.dense.bias", (H,)),
        ("visual_attention.output.LayerNorm.weight", (H,)),
        ("visual_attention.output.LayerNorm.bias", (H,)),
    ]:
        sd[f"{prefix}.{name}"] = _t(rng, *shape)
    return sd


def _embeddings(rng, prefix, H, V, P, T=2):
    return {
        f"{prefix}.word_embeddings.weight": _t(rng, V, H),
        f"{prefix}.position_embeddings.weight": _t(rng, P, H),
        f"{prefix}.token_type_embeddings.weight": _t(rng, T, H),
        f"{prefix}.LayerNorm.weight": _t(rng, H),
        f"{prefix}.LayerNorm.bias": _t(rng, H),
    }


def _cls_predictions(rng, prefix, H, V):
    return {
        f"{prefix}.transform.dense.weight": _t(rng, H, H),
        f"{prefix}.transform.dense.bias": _t(rng, H),
        f"{prefix}.transform.LayerNorm.weight": _t(rng, H),
        f"{prefix}.transform.LayerNorm.bias": _t(rng, H),
        f"{prefix}.bias": _t(rng, V),
        f"{prefix}.decoder.weight": _t(rng, V, H),  # tied -> must be skipped
    }


def _pretrainer(agent):
    from vln_imagine_tpu.pretrain.trainer import DuetPretrainer, HamtPretrainer

    cfg = tiny_test_config(agent)
    tasks = (("mlm", "sap") if agent == "hamt" else ("mlm", "mrc", "sap"))
    cfg = _replace(cfg, "pretrain", tasks=tasks,
                   mix_ratio=(1,) * len(tasks))
    world_np, _ = synthetic_world(
        num_scans=2, num_nodes=12, max_candidates=cfg.env.max_candidates,
        views=cfg.env.views, feat_dim=cfg.model.image_feat_size, seed=5)
    ep = synthetic_episodes(
        world_np, batch=6, max_gt_path_len=cfg.env.max_gt_path_len,
        max_instr_len=cfg.env.max_instr_len,
        max_imaginations=cfg.model.max_imagination_len,
        vocab_size=cfg.model.vocab_size, feat_dim=cfg.model.hidden_size,
        seed=6)
    cls = HamtPretrainer if agent == "hamt" else DuetPretrainer
    pt = cls(cfg, world_np, ep, image_prob_size=8)
    return cfg, pt, pt.init_state()


def _eq(flax_leaf, torch_tensor, transpose=False):
    want = torch_tensor.numpy()
    np.testing.assert_allclose(np.asarray(flax_leaf),
                               want.T if transpose else want,
                               rtol=1e-6, atol=1e-6)


def test_lxmert_init_duet_pretrain(tmp_path):
    cfg, pt, state = _pretrainer("duet")
    m = cfg.model
    H, I, V, P = (m.hidden_size, m.intermediate_size, m.vocab_size,
                  m.max_position_embeddings)
    rng = np.random.default_rng(0)
    sd = {}
    sd.update(_embeddings(rng, "bert.embeddings", H, V, P))
    for i in range(m.num_l_layers):
        sd.update(_bert_layer(rng, f"bert.encoder.layer.{i}", H, I))
    for i in range(m.num_x_layers):
        sd.update(_lxrtx_layer(rng, f"bert.encoder.x_layers.{i}", H, I))
    sd.update(_cls_predictions(rng, "cls.predictions", H, V))
    sd = {"module." + k: v for k, v in sd.items()}  # DDP-saved LXMERT
    path = str(tmp_path / "model_LXRT.pth")
    torch.save(sd, path)

    loaded = load_pretrain_init(path, agent="duet", source="auto")
    assert loaded["source"] == "lxmert"  # x_layers keys auto-detected
    assert all("decoder.weight" in k or "pooler" in k
               for k in loaded["skipped"]), loaded["skipped"][:8]
    new_params, transferred, missing = init_finetune_from_pretrain(
        state.params, loaded["params"])
    assert transferred > 0
    p = new_params["params"]

    # embeddings + mlm head landed
    _eq(p["embeddings"]["word_embeddings"]["embedding"],
        sd["module.bert.embeddings.word_embeddings.weight"])
    _eq(p["mlm_head"]["dense"]["kernel"],
        sd["module.cls.predictions.transform.dense.weight"], transpose=True)
    _eq(p["mlm_head"]["bias"], sd["module.cls.predictions.bias"])
    # language layers remapped onto lang_encoder
    _eq(p["lang_layer_0"]["attention"]["self"]["query"]["kernel"],
        sd["module.bert.encoder.layer.0.attention.self.query.weight"],
        transpose=True)
    # the LXMERT x-layers are DUPLICATED into local AND global encoders
    for enc in ("local_encoder", "global_encoder"):
        x = p[enc]["x_layer_0"]
        _eq(x["visual_attention"]["att"]["query"]["kernel"],
            sd["module.bert.encoder.x_layers.0.visual_attention.att"
               ".query.weight"], transpose=True)
        _eq(x["visn_self_att"]["self"]["value"]["kernel"],
            sd["module.bert.encoder.x_layers.0.visn_self_att.self"
               ".value.weight"], transpose=True)
        # the DUET pretrain model carries the lang side (use_lang2visn_attn)
        _eq(x["lang_self_att"]["self"]["query"]["kernel"],
            sd["module.bert.encoder.x_layers.0.lang_self_att.self"
               ".query.weight"], transpose=True)
        _eq(x["lang_output"]["dense"]["kernel"],
            sd["module.bert.encoder.x_layers.0.lang_output.dense.weight"],
            transpose=True)

    # the initialized pretrainer trains: one step per task, finite losses
    state = state.replace(params=new_params)
    state, summary = pt.train(state, num_steps=len(cfg.pretrain.tasks),
                              batch_size=3)
    assert all(np.isfinite(v) for v in summary.values()), summary


def test_bert_init_hamt_pretrain(tmp_path):
    cfg, pt, state = _pretrainer("hamt")
    m = cfg.model
    H, I, V, P = (m.hidden_size, m.intermediate_size, m.vocab_size,
                  m.max_position_embeddings)
    rng = np.random.default_rng(1)
    # HF bert-base-uncased AutoModel layout, copied verbatim by the
    # reference (main_r2r.py:131-147) — incl. the unused pooler
    sd = {}
    sd.update(_embeddings(rng, "embeddings", H, V, P))
    for i in range(m.num_l_layers):
        sd.update(_bert_layer(rng, f"encoder.layer.{i}", H, I))
    sd["pooler.dense.weight"] = _t(rng, H, H)
    sd["pooler.dense.bias"] = _t(rng, H)
    path = str(tmp_path / "bert_base_uncased.bin")
    torch.save(sd, path)

    loaded = load_pretrain_init(path, agent="hamt", source="auto")
    assert loaded["source"] == "bert"
    assert all("pooler" in k for k in loaded["skipped"]), loaded["skipped"]
    new_params, transferred, missing = init_finetune_from_pretrain(
        state.params, loaded["params"])
    assert transferred > 0
    p = new_params["params"]
    _eq(p["embeddings"]["word_embeddings"]["embedding"],
        sd["embeddings.word_embeddings.weight"])
    _eq(p["lang_layer_1"]["output"]["dense"]["kernel"],
        sd["encoder.layer.1.output.dense.weight"], transpose=True)
    _eq(p["lang_layer_0"]["attention"]["output"]["LayerNorm"]["ln"]["scale"],
        sd["encoder.layer.0.attention.output.LayerNorm.weight"])
    # x-layers / task heads are NOT in a bert init: left at their init
    assert any("x_layer" in mod for mod, _ in missing)

    state = state.replace(params=new_params)
    state, summary = pt.train(state, num_steps=2, batch_size=3)
    assert all(np.isfinite(v) for v in summary.values()), summary


def test_xlm_roberta_token_type_duplication(tmp_path):
    """xlm-roberta-base (the RxR recipe) ships a single token-type row; the
    loader duplicates it so the second row serves image embeddings, exactly
    train_r2r.py:115-118."""
    cfg, pt, state = _pretrainer("hamt")
    m = cfg.model
    H, I, V, P = (m.hidden_size, m.intermediate_size, m.vocab_size,
                  m.max_position_embeddings)
    rng = np.random.default_rng(2)
    sd = _embeddings(rng, "embeddings", H, V, P, T=1)  # ONE token-type row
    sd.update(_bert_layer(rng, "encoder.layer.0", H, I))
    path = str(tmp_path / "xlm_roberta_base.bin")
    torch.save(sd, path)

    loaded = load_pretrain_init(path, agent="hamt")
    new_params, transferred, _ = init_finetune_from_pretrain(
        state.params, loaded["params"])
    assert transferred > 0
    tt = np.asarray(new_params["params"]["embeddings"]
                    ["token_type_embeddings"]["embedding"])
    assert tt.shape[0] == 2
    np.testing.assert_array_equal(tt[0], tt[1])
    np.testing.assert_allclose(
        tt[0], sd["embeddings.token_type_embeddings.weight"][0].numpy(),
        rtol=1e-6, atol=1e-6)
