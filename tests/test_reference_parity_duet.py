"""Full-model numerical parity against the ACTUAL reference torch
GlocalTextPathNavCMT (VLN-DUET/map_nav_src/models/vilmodel.py).

Fixed random torch weights at a structurally-full configuration (9 language
layers, 4 cross layers per branch, 2 pre-norm pano layers, hidden 768) are
converted through ckpt/convert.py and every forward mode is compared:

- language    (forward_text :1075)
- imagine     (forward_imagination :1081, bypass)
- align_with_contrastive_loss (:591-655) incl. in-place projected overwrite
- panorama    (forward_panorama_per_step :1087-1131, pre-norm pano encoder
               with padding masks)
- navigation  (forward_navigation_per_step :1133-1235): global branch with
  sprel attention bias, local branch, dynamic sigmoid fusion, and the
  fused-logit graph merge — the reference's per-batch python loop
  (:1200-1217) against our masked-matmul fused_logit_merge.

Any numeric drift >=1e-4 fails.
"""

import dataclasses
import sys

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from vln_imagine_tpu.ckpt import convert as C
from vln_imagine_tpu.config import duet_r2r_config, _replace
from vln_imagine_tpu.models.duet import DuetModel

REF = "/root/reference/VLN-DUET/map_nav_src"

HIDDEN = 768
B, L_TXT, T_PANO, N_IMAG, G = 2, 16, 10, 4, 5  # G graph nodes + 1 stop slot

TOL = dict(rtol=1e-4, atol=1e-4)


def _import_ref_duet():
    for name in [n for n in sys.modules if n == "models" or
                 n.startswith("models.")]:
        del sys.modules[name]
    sys.path.insert(0, REF)
    try:
        import models.vilmodel as V  # noqa
    finally:
        sys.path.remove(REF)
    for name in [n for n in sys.modules if n == "models" or
                 n.startswith("models.")]:
        del sys.modules[name]
    return V


def _my_config():
    cfg = duet_r2r_config()
    return _replace(
        cfg, "model",
        hidden_size=HIDDEN, num_attention_heads=12, intermediate_size=1024,
        vocab_size=1000, max_position_embeddings=64,
        image_feat_size=768, angle_feat_size=4,
        num_l_layers=9, num_x_layers=4, num_pano_layers=2,
        max_imagination_len=N_IMAG, max_action_steps=100,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        pred_head_dropout_prob=0.0, compute_dtype="float32",
        fix_lang_embedding=False, fix_pano_embedding=False)


def _ref_config(mcfg):
    """Mutated BertConfig per VLN-DUET map_nav_src/models/vlnbert_init.py:13-77."""
    from transformers import BertConfig
    c = BertConfig(
        vocab_size=mcfg.vocab_size, hidden_size=mcfg.hidden_size,
        num_hidden_layers=2, num_attention_heads=mcfg.num_attention_heads,
        intermediate_size=mcfg.intermediate_size, hidden_act="gelu",
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        max_position_embeddings=mcfg.max_position_embeddings,
        type_vocab_size=mcfg.type_vocab_size, layer_norm_eps=1e-12)
    c.max_action_steps = mcfg.max_action_steps
    c.image_feat_size = mcfg.image_feat_size
    c.angle_feat_size = mcfg.angle_feat_size
    c.obj_feat_size = 0
    c.obj_loc_size = 3
    c.num_l_layers = mcfg.num_l_layers
    c.num_pano_layers = mcfg.num_pano_layers
    c.num_x_layers = mcfg.num_x_layers
    c.graph_sprels = mcfg.graph_sprels
    c.glocal_fuse = mcfg.fusion == "dynamic"
    c.fix_lang_embedding = mcfg.fix_lang_embedding
    c.fix_pano_embedding = mcfg.fix_pano_embedding
    c.fix_local_branch = mcfg.fix_local_branch
    c.update_lang_bert = not mcfg.fix_lang_embedding
    c.output_attentions = True
    c.pred_head_dropout_prob = 0.0
    c.use_lang2visn_attn = False
    c.imagine_enc_pano = mcfg.imagine_enc_pano
    c.max_imagination_len = mcfg.max_imagination_len
    c.fix_imagine_embeds = mcfg.fix_imagine_embeds
    c.bypass_imag_encoder = mcfg.bypass_imag_encoder
    c.use_cosine_aux_loss = mcfg.use_cosine_aux_loss
    c.concat_imagine_with = mcfg.concat_imagine_with
    c.fix_lang_inside_cosine_model = mcfg.fix_lang_inside_cosine_model
    c.aux_loss_type = mcfg.aux_loss_type
    c.infonce_temperature = mcfg.infonce_temperature
    c.no_loss_test = mcfg.no_loss_test
    c.dataset = "r2r"
    return c


@pytest.fixture(scope="module")
def pair():
    V = _import_ref_duet()
    cfg = _my_config()
    torch.manual_seed(13)
    ref = V.GlocalTextPathNavCMT(_ref_config(cfg.model)).eval()
    params, skipped = C.convert_state_dict(
        ref.state_dict(), C.duet_torch_to_flax_path)
    assert not skipped, f"unconverted reference keys: {skipped[:8]}"
    return ref, params, cfg


@pytest.fixture(scope="module")
def inputs():
    rng = np.random.default_rng(5)
    txt_ids = rng.integers(1, 1000, (B, L_TXT)).astype(np.int64)
    txt_mask = np.zeros((B, L_TXT), bool)
    txt_mask[0, :L_TXT] = True
    txt_mask[1, :12] = True
    imag = rng.standard_normal((B, N_IMAG, 768)).astype(np.float32)
    imag_mask = np.zeros((B, N_IMAG), bool)
    imag_mask[0, :4] = True
    imag_mask[1, :3] = True
    view_img = rng.standard_normal((B, T_PANO, 768)).astype(np.float32)
    loc = rng.standard_normal((B, T_PANO, 7)).astype(np.float32)  # angle+3
    nav_types = np.zeros((B, T_PANO), np.int64)
    nav_types[0, :4] = 1
    nav_types[1, :2] = 1
    view_lens = np.array([10, 8], np.int64)
    return dict(txt_ids=txt_ids, txt_mask=txt_mask, imag=imag,
                imag_mask=imag_mask, view_img=view_img, loc=loc,
                nav_types=nav_types, view_lens=view_lens, rng=rng)


def _t(x):
    return torch.from_numpy(np.asarray(x))


def _ref_text(ref, inp):
    with torch.no_grad():
        return ref("language", {"txt_ids": _t(inp["txt_ids"]),
                                "txt_masks": _t(inp["txt_mask"])}).numpy()


def test_text_mode(pair, inputs):
    ref, params, cfg = pair
    want = _ref_text(ref, inputs)
    model = DuetModel(cfg.model, feat_dropout=0.0)
    got = np.asarray(model.apply(
        params, jnp.asarray(inputs["txt_ids"]), jnp.asarray(inputs["txt_mask"]),
        method=DuetModel.text))
    np.testing.assert_allclose(got, want, **TOL)


def test_imagine_mode(pair, inputs):
    ref, params, cfg = pair
    with torch.no_grad():
        want = ref("imagine", {"imagine_feats": _t(inputs["imag"]),
                               "imagine_masks": _t(inputs["imag_mask"])}).numpy()
    model = DuetModel(cfg.model, feat_dropout=0.0)
    got = np.asarray(model.apply(
        params, jnp.asarray(inputs["imag"]), method=DuetModel.imagine))
    np.testing.assert_allclose(got, want, **TOL)


def test_align_mode(pair, inputs):
    ref, params, cfg = pair
    txt = _ref_text(ref, inputs)
    sub_instr_segs = [[(0, 7), (8, 11)] + [(0, 0)] * 2,
                      [(0, 9)] + [(0, 0)] * 3]
    noun_phrase_segs = [[[(1, 2), (4, 5)], []] + [[]] * 2,
                        [[(2, 4)]] + [[]] * 3]
    flags = [["True", "True", "False", "False"],
             ["True", "False", "False", "False"]]
    imag_t = _t(inputs["imag"]).clone()
    with torch.no_grad():
        loss_ref, new_ref = ref("align_with_contrastive_loss", {
            "align_txt_embeds": _t(txt), "txt_masks": _t(inputs["txt_mask"]),
            "align_imagine_embeds": imag_t,
            "imagine_masks": _t(inputs["imag_mask"]),
            "sub_instr_segs": sub_instr_segs, "sub_instr_imag_flag": flags,
            "noun_phrase_segs": noun_phrase_segs, "obs_instr_ids": ["a", "b"]})

    npw = np.zeros((B, N_IMAG, L_TXT), np.float32)
    for b in range(B):
        for i, nps in enumerate(noun_phrase_segs[b]):
            if flags[b][i] != "True" or not nps:
                continue
            total = sum(e - s + 1 for s, e in nps)
            for s, e in nps:
                npw[b, i, s:e + 1] = 1.0 / total

    model = DuetModel(cfg.model, feat_dropout=0.0)
    loss, new = model.apply(
        params, jnp.asarray(txt), jnp.asarray(inputs["txt_mask"]),
        jnp.asarray(inputs["imag"]), jnp.asarray(inputs["imag_mask"]),
        jnp.asarray(npw), method=DuetModel.align_with_contrastive_loss)
    np.testing.assert_allclose(float(loss), float(loss_ref), **TOL)
    np.testing.assert_allclose(np.asarray(new), new_ref.numpy(), **TOL)


def _ref_panorama(ref, inp):
    with torch.no_grad():
        pano, pano_masks = ref("panorama", {
            "view_img_fts": _t(inp["view_img"]), "obj_img_fts": None,
            "loc_fts": _t(inp["loc"]), "nav_types": _t(inp["nav_types"]),
            "view_lens": _t(inp["view_lens"]), "obj_lens": None})
    return pano.numpy(), pano_masks.numpy()


def test_panorama_mode(pair, inputs):
    ref, params, cfg = pair
    want, want_masks = _ref_panorama(ref, inputs)
    valid = np.arange(T_PANO)[None, :] < inputs["view_lens"][:, None]
    np.testing.assert_array_equal(valid, want_masks)
    model = DuetModel(cfg.model, feat_dropout=0.0)
    got = np.asarray(model.apply(
        params, jnp.asarray(inputs["view_img"]), jnp.asarray(inputs["loc"]),
        jnp.asarray(inputs["nav_types"]), jnp.asarray(valid),
        method=DuetModel.panorama_per_step))
    np.testing.assert_allclose(got[valid], want[valid], **TOL)


def _nav_scenario(inputs):
    """Synthetic topo-map state shared by both sides.

    gmap slot 0 = stop; nodes a..e.  Item 0: visited {a,b}, candidates
    {b(visited), c, d, e}.  Item 1: 4 valid slots, visited {a},
    candidates {b, c}."""
    rng = np.random.default_rng(9)
    Gp1, Tp1 = G + 1, T_PANO + 1
    gmap_vpids = [[None, "a", "b", "c", "d", "e"],
                  [None, "a", "b", "c", None, None]]
    gmap_valid = np.array([[True] * 6, [True] * 4 + [False] * 2])
    gmap_visited = np.array([
        [False, True, True, False, False, False],
        [False, True, False, False, False, False]])
    gmap_step_ids = np.array([[0, 1, 2, 0, 0, 0], [0, 1, 0, 0, 0, 0]],
                             np.int64)
    gmap_img = rng.standard_normal((B, Gp1, HIDDEN)).astype(np.float32)
    gmap_img[:, 0] = 0.0
    gmap_pos = rng.standard_normal((B, Gp1, 7)).astype(np.float32)
    d = rng.uniform(0.1, 1.0, (B, Gp1, Gp1)).astype(np.float32)
    gmap_pair_dists = (d + d.transpose(0, 2, 1)) / 2

    vp_cand_vpids = [[None, "b", "c", "d", "e"], [None, "b", "c"]]
    vp_img = rng.standard_normal((B, Tp1, HIDDEN)).astype(np.float32)
    vp_img[:, 0] = 0.0
    vp_pos = rng.standard_normal((B, Tp1, 14)).astype(np.float32)
    vp_valid = np.arange(Tp1)[None, :] <= inputs["view_lens"][:, None]
    vp_nav_valid = np.zeros((B, Tp1), bool)
    for b, cands in enumerate(vp_cand_vpids):
        vp_nav_valid[b, :len(cands)] = True

    cand_to_gmap = np.zeros((B, Gp1, Tp1), bool)
    for b in range(B):
        for j, vp in enumerate(vp_cand_vpids[b]):
            if j == 0 or vp is None:
                continue
            for g, gvp in enumerate(gmap_vpids[b]):
                if g > 0 and gvp == vp:
                    cand_to_gmap[b, g, j] = True
    return dict(gmap_vpids=gmap_vpids, gmap_valid=gmap_valid,
                gmap_visited=gmap_visited, gmap_step_ids=gmap_step_ids,
                gmap_img=gmap_img, gmap_pos=gmap_pos,
                gmap_pair_dists=gmap_pair_dists, vp_cand_vpids=vp_cand_vpids,
                vp_img=vp_img, vp_pos=vp_pos, vp_valid=vp_valid,
                vp_nav_valid=vp_nav_valid, cand_to_gmap=cand_to_gmap)


@pytest.mark.parametrize("imagine_on", [True, False])
def test_navigation_mode(pair, inputs, imagine_on):
    ref, params, cfg = pair
    sc = _nav_scenario(inputs)
    txt = _ref_text(ref, inputs)
    with torch.no_grad():
        imag = ref("imagine", {"imagine_feats": _t(inputs["imag"]),
                               "imagine_masks": _t(inputs["imag_mask"])}).numpy()

    ref.config.imagine_enc_pano = imagine_on
    try:
        batch = {
            "txt_embeds": _t(txt), "txt_masks": _t(inputs["txt_mask"]),
            "gmap_img_embeds": _t(sc["gmap_img"]),
            "gmap_step_ids": _t(sc["gmap_step_ids"]),
            "gmap_pos_fts": _t(sc["gmap_pos"]),
            "gmap_masks": _t(sc["gmap_valid"]),
            "gmap_pair_dists": _t(sc["gmap_pair_dists"]),
            "gmap_visited_masks": _t(sc["gmap_visited"]),
            "gmap_vpids": sc["gmap_vpids"],
            "vp_img_embeds": _t(sc["vp_img"]),
            "vp_pos_fts": _t(sc["vp_pos"]), "vp_masks": _t(sc["vp_valid"]),
            "vp_nav_masks": _t(sc["vp_nav_valid"]), "vp_obj_masks": None,
            "vp_cand_vpids": sc["vp_cand_vpids"],
            "imagine_embeds": _t(imag) if imagine_on else None,
            "imagine_masks": (_t(inputs["imag_mask"]) if imagine_on
                              else None)}
        with torch.no_grad():
            want = ref("navigation", batch)
    finally:
        ref.config.imagine_enc_pano = True

    mcfg = cfg.model if imagine_on else dataclasses.replace(
        cfg.model, imagine_enc_pano=False)
    model = DuetModel(mcfg, feat_dropout=0.0)
    ikw = {}
    if imagine_on:
        ikw = dict(imagine_embeds=jnp.asarray(imag),
                   imagine_mask=jnp.asarray(inputs["imag_mask"]))
    out = model.apply(
        params, jnp.asarray(txt), jnp.asarray(inputs["txt_mask"]),
        jnp.asarray(sc["gmap_img"]), jnp.asarray(sc["gmap_step_ids"]),
        jnp.asarray(sc["gmap_pos"]), jnp.asarray(sc["gmap_valid"]),
        jnp.asarray(sc["gmap_pair_dists"]), jnp.asarray(sc["gmap_visited"]),
        jnp.asarray(sc["vp_img"]), jnp.asarray(sc["vp_pos"]),
        jnp.asarray(sc["vp_valid"]), jnp.asarray(sc["vp_nav_valid"]),
        jnp.asarray(sc["cand_to_gmap"]),
        method=DuetModel.navigation_per_step, **ikw)

    g_ok = sc["gmap_valid"] & ~sc["gmap_visited"]
    np.testing.assert_allclose(np.asarray(out.global_logits)[g_ok],
                               want["global_logits"].numpy()[g_ok], **TOL)
    assert np.all(np.isneginf(want["global_logits"].numpy()[~g_ok]))
    assert np.all(np.asarray(out.global_logits)[~g_ok] <= -1e8)

    l_ok = sc["vp_nav_valid"]
    np.testing.assert_allclose(np.asarray(out.local_logits)[l_ok],
                               want["local_logits"].numpy()[l_ok], **TOL)
    np.testing.assert_allclose(np.asarray(out.fused_logits)[g_ok],
                               want["fused_logits"].numpy()[g_ok], **TOL)
    np.testing.assert_allclose(np.asarray(out.gmap_embeds),
                               want["gmap_embeds"].numpy(), **TOL)
    np.testing.assert_allclose(np.asarray(out.vp_embeds),
                               want["vp_embeds"].numpy(), **TOL)
