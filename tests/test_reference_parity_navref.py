"""Numerical parity against the ACTUAL torch NavRefCMT — the HAMT REVERIE
model (VLN-HAMT/finetune_src/reverie/vlnbert_navref.py), at its RELEASED
configuration (`run_reverie.sh:27` passes --no_lang_ca).

NavRefCMT differs from NavCMT in its object segment: a dedicated
ObjectEmbeddings module (img/ang/5-d-bbox-pos linear+LN branches, the
IMAGE module's shared nav-type embedding at type 2, token-type 1, final
LN, :11-41), the visual stream [hist; obs; obj] (:135-147), act_logits =
next_action(ob * hist[CLS]) (:150) and obj_logits = ref_object(obj *
txt[CLS]) (:151).

NOTE: in this reference snapshot LXRTXLayer.forward is BROKEN under
no_lang_ca — the imagination authors' attention-probs lines index a
1-tuple (vilmodel_cmt.py:438; their own comment at :1141 admits "this
might break no_lang_ca").  The torch side here therefore drives the REAL
torch modules through the layer's own cross_att/self_att/output_fc
submethods (the exact forward flow minus the crashing probs lines),
reproducing the upstream-HAMT semantics the released REVERIE checkpoints
were trained with: text is NEVER updated through the x-layers.
"""

import sys

import jax.numpy as jnp
import numpy as np
import pytest
import torch

import test_reference_parity_hamt as PH
from vln_imagine_tpu.ckpt import convert as C
from vln_imagine_tpu.models.hamt import HamtModel

pytestmark = pytest.mark.slow

REF = PH.REF
B, L_TXT, T_OBS, T_HIST, KO = 2, 14, 10, 3, 4
OBJ_DIM = 24
TOL = dict(rtol=1e-4, atol=1e-4)
_t = PH._t


def _import_navref():
    for name in [n for n in sys.modules if n in ("models", "vlnbert_navref")
                 or n.startswith("models.")]:
        del sys.modules[name]
    sys.path.insert(0, REF)
    sys.path.insert(0, REF + "/reverie")
    try:
        import vlnbert_navref as VR  # noqa
    finally:
        sys.path.remove(REF)
        sys.path.remove(REF + "/reverie")
    for name in [n for n in sys.modules if n == "models"
                 or n.startswith("models.")]:
        del sys.modules[name]
    return VR


@pytest.fixture(scope="module")
def pair():
    VR = _import_navref()
    cfg = PH._my_config(obj_feat_size=OBJ_DIM, imagine_enc_pano=False,
                        use_cosine_aux_loss=False, no_lang_ca=True)
    rcfg = PH._ref_config(cfg.model)
    rcfg.obj_feat_size = OBJ_DIM
    torch.manual_seed(41)
    ref = VR.NavRefCMT(rcfg).eval()
    params, skipped = C.convert_state_dict(ref.state_dict(),
                                           C.hamt_torch_to_flax_path)
    assert not skipped, f"unconverted NavRef keys: {skipped[:8]}"
    return ref, params, cfg


@pytest.fixture(scope="module")
def inputs():
    rng = np.random.default_rng(7)
    txt_ids = rng.integers(1, 1000, (B, L_TXT)).astype(np.int64)
    txt_mask = np.zeros((B, L_TXT), bool)
    txt_mask[0, :L_TXT] = True
    txt_mask[1, :9] = True
    ob_img = rng.standard_normal((B, T_OBS, 768)).astype(np.float32)
    ob_ang = rng.standard_normal((B, T_OBS, 4)).astype(np.float32)
    ob_nav = np.zeros((B, T_OBS), np.int64)
    ob_nav[0, :5] = 1
    ob_nav[0, 5] = 2
    ob_nav[1, :3] = 1
    ob_nav[1, 3] = 2
    ob_mask = np.zeros((B, T_OBS), bool)
    ob_mask[0, :9] = True
    ob_mask[1, :7] = True
    hist_img = rng.standard_normal((B, 768)).astype(np.float32)
    hist_ang = rng.standard_normal((B, 4)).astype(np.float32)
    pano_img = rng.standard_normal((B, 8, 768)).astype(np.float32)
    pano_ang = rng.standard_normal((B, 8, 4)).astype(np.float32)
    obj_feat = rng.standard_normal((B, KO, OBJ_DIM)).astype(np.float32)
    obj_ang = rng.standard_normal((B, KO, 4)).astype(np.float32)
    obj_pos = rng.uniform(0, 1, (B, KO, 5)).astype(np.float32)
    obj_mask = np.zeros((B, KO), bool)
    obj_mask[0, :3] = True
    obj_mask[1, :2] = True
    return dict(txt_ids=txt_ids, txt_mask=txt_mask, ob_img=ob_img,
                ob_ang=ob_ang, ob_nav=ob_nav, ob_mask=ob_mask,
                hist_img=hist_img, hist_ang=hist_ang, pano_img=pano_img,
                pano_ang=pano_ang, obj_feat=obj_feat, obj_ang=obj_ang,
                obj_pos=obj_pos, obj_mask=obj_mask)


def _neg(mask):
    m = torch.from_numpy(mask.astype(np.float32))
    return ((1.0 - m) * -10000.0).unsqueeze(1).unsqueeze(2)


def _ref_visual_navref(ref, inputs, txt, hist):
    """NavRefCMT.forward('visual') (vlnbert_navref.py:90-155), via the real
    submodules (the shipped wrapper crashes under no_lang_ca, see module
    docstring)."""
    hist_mask = np.ones((B, T_HIST), bool)
    with torch.no_grad():
        txt_embeds = _t(txt)
        hist_embeds = _t(hist)
        ext_txt = _neg(inputs["txt_mask"])
        ext_hist = _neg(hist_mask)
        ext_ob = _neg(inputs["ob_mask"])
        ext_obj = _neg(inputs["obj_mask"])

        ob_types = torch.ones(B, T_OBS, dtype=torch.long)
        ob_embeds = ref.img_embeddings(
            _t(inputs["ob_img"]), _t(inputs["ob_ang"]),
            ref.embeddings.token_type_embeddings(ob_types),
            nav_types=_t(inputs["ob_nav"]))

        obj_types = torch.ones(B, KO, dtype=torch.long)
        obj_navs = torch.full((B, KO), 2, dtype=torch.long)
        obj_embeds = ref.obj_embeddings(
            _t(inputs["obj_feat"]), _t(inputs["obj_ang"]),
            _t(inputs["obj_pos"]),
            ref.embeddings.token_type_embeddings(obj_types),
            ref.img_embeddings.nav_type_embedding(obj_navs))

        vision = torch.cat([hist_embeds, ob_embeds, obj_embeds], 1)
        ext_vision = torch.cat([ext_hist, ext_ob, ext_obj], -1)
        lang = txt_embeds
        for layer in ref.encoder.x_layers:
            la, va = layer.cross_att(lang, ext_txt, vision, ext_vision)
            la, va = layer.self_att(la, ext_txt, va, ext_vision)
            lang, vision = layer.output_fc(la[0], va[0])

        h = vision[:, :T_HIST]
        ob = vision[:, T_HIST:T_HIST + T_OBS]
        obj = vision[:, T_HIST + T_OBS:]
        act = ref.next_action(ob * h[:, :1]).squeeze(-1)
        objl = ref.ref_object(obj * lang[:, :1]).squeeze(-1)
        act = act.masked_fill(_t(inputs["ob_nav"]) == 0, -float("inf"))
        objl = objl.masked_fill(~_t(inputs["obj_mask"]), -float("inf"))
    return act.numpy(), objl.numpy(), lang.numpy(), h.numpy(), ob.numpy()


def _our_visual(model, params, inputs, txt_final, hist, obj_pos):
    hist_mask = np.ones((B, T_HIST), bool)
    # NavRef text path: every no_lang_ca stack slot = the final language
    # output (rollout_hamt applies the same broadcast for the object
    # variant)
    n_slots = model.config.num_x_layers + 1
    stack = jnp.broadcast_to(jnp.asarray(txt_final)[None],
                             (n_slots,) + txt_final.shape)
    return model.apply(
        params, stack, jnp.asarray(inputs["txt_mask"]),
        jnp.asarray(hist), jnp.asarray(hist_mask),
        jnp.asarray(inputs["ob_img"]), jnp.asarray(inputs["ob_ang"]),
        jnp.asarray(inputs["ob_nav"]), jnp.asarray(inputs["ob_mask"]),
        obj_img_feats=jnp.asarray(inputs["obj_feat"]),
        obj_ang_feats=jnp.asarray(inputs["obj_ang"]),
        obj_valid=jnp.asarray(inputs["obj_mask"]),
        obj_pos_feats=jnp.asarray(obj_pos),
        method=HamtModel.visual)


def test_navref_visual_parity(pair, inputs):
    ref, params, cfg = pair
    with torch.no_grad():
        # NavRefCMT's language mode returns ONLY the final layer (:66-80)
        txt = ref("language", txt_ids=_t(inputs["txt_ids"]),
                  txt_masks=_t(inputs["txt_mask"]).float()).numpy()
    hist = PH._ref_history(ref, inputs)
    act_ref, obj_ref, txt_ref, hist_ref, ob_ref = _ref_visual_navref(
        ref, inputs, txt, hist)

    model = HamtModel(cfg.model, feat_dropout=0.0)
    # our no_lang_ca language stack entry 0 is the final language output
    stack = np.asarray(model.apply(
        params, jnp.asarray(inputs["txt_ids"]),
        jnp.asarray(inputs["txt_mask"]), method=HamtModel.language))
    np.testing.assert_allclose(stack[0], txt, **TOL)

    out = _our_visual(model, params, inputs, txt, hist, inputs["obj_pos"])

    valid = inputs["ob_nav"] != 0
    np.testing.assert_allclose(np.asarray(out.act_logits)[valid],
                               act_ref[valid], **TOL)
    assert np.all(np.isneginf(act_ref[~valid]))
    assert np.all(np.asarray(out.act_logits)[~valid] <= -1e8)

    om = inputs["obj_mask"]
    np.testing.assert_allclose(np.asarray(out.obj_logits)[om],
                               obj_ref[om], **TOL)
    assert np.all(np.isneginf(obj_ref[~om]))
    assert np.all(np.asarray(out.obj_logits)[~om] <= -1e8)

    np.testing.assert_allclose(np.asarray(out.txt_embeds), txt_ref, **TOL)
    np.testing.assert_allclose(np.asarray(out.hist_embeds), hist_ref, **TOL)
    np.testing.assert_allclose(np.asarray(out.ob_embeds), ob_ref, **TOL)


def test_navref_obj_pos_branch_matters(pair, inputs):
    """The 5-d bbox position branch must actually influence the grounding
    logits — guards against silently zero-weighting it."""
    ref, params, cfg = pair
    with torch.no_grad():
        txt = ref("language", txt_ids=_t(inputs["txt_ids"]),
                  txt_masks=_t(inputs["txt_mask"]).float()).numpy()
    hist = PH._ref_history(ref, inputs)
    model = HamtModel(cfg.model, feat_dropout=0.0)
    a = np.asarray(_our_visual(model, params, inputs, txt, hist,
                               inputs["obj_pos"]).obj_logits)
    b = np.asarray(_our_visual(model, params, inputs, txt, hist,
                               np.zeros_like(inputs["obj_pos"])).obj_logits)
    om = inputs["obj_mask"]
    assert np.abs(a[om] - b[om]).max() > 1e-3


def _navref_step_torch(ref, txt, hist_buf, h_mask, obs):
    """One NavRefCMT 'visual' step on envx observations via the real torch
    submodules (see module docstring for why not ref('visual'))."""
    B2 = txt.shape[0]
    with torch.no_grad():
        ext_txt = ((1.0 - _t(np.asarray(obs["txt_mask"], np.float32)))
                   * -10000.0).unsqueeze(1).unsqueeze(2)
        ext_hist = ((1.0 - _t(h_mask.astype(np.float32)))
                    * -10000.0).unsqueeze(1).unsqueeze(2)
        ext_ob = ((1.0 - _t(np.asarray(obs["ob_mask"], np.float32)))
                  * -10000.0).unsqueeze(1).unsqueeze(2)
        ext_obj = ((1.0 - _t(np.asarray(obs["obj_mask"], np.float32)))
                   * -10000.0).unsqueeze(1).unsqueeze(2)

        T_ob = obs["ob_img"].shape[1]
        Ko = obs["obj_feat"].shape[1]
        ob_embeds = ref.img_embeddings(
            _t(obs["ob_img"]), _t(obs["ob_ang"]),
            ref.embeddings.token_type_embeddings(
                torch.ones(B2, T_ob, dtype=torch.long)),
            nav_types=_t(obs["ob_nav"]).long())
        obj_embeds = ref.obj_embeddings(
            _t(obs["obj_feat"]), _t(obs["obj_ang"]), _t(obs["obj_pos"]),
            ref.embeddings.token_type_embeddings(
                torch.ones(B2, Ko, dtype=torch.long)),
            ref.img_embeddings.nav_type_embedding(
                torch.full((B2, Ko), 2, dtype=torch.long)))

        vision = torch.cat([hist_buf, ob_embeds, obj_embeds], 1)
        ext_vision = torch.cat([ext_hist, ext_ob, ext_obj], -1)
        lang = _t(txt)
        T_HIST_ = hist_buf.shape[1]
        for layer in ref.encoder.x_layers:
            la, va = layer.cross_att(lang, ext_txt, vision, ext_vision)
            la, va = layer.self_att(la, ext_txt, va, ext_vision)
            lang, vision = layer.output_fc(la[0], va[0])
        h = vision[:, :T_HIST_]
        ob = vision[:, T_HIST_:T_HIST_ + T_ob]
        obj = vision[:, T_HIST_ + T_ob:]
        act = ref.next_action(ob * h[:, :1]).squeeze(-1)
        objl = ref.ref_object(obj * lang[:, :1]).squeeze(-1)
        act = act.masked_fill(_t(obs["ob_nav"]).long() == 0, -float("inf"))
        objl = objl.masked_fill(~_t(obs["obj_mask"]), -float("inf"))
    return act.numpy(), objl.numpy()


def test_navref_whole_episode_parity(pair):
    """WHOLE-EPISODE NavRef parity: the REVERIE rollout program (objects in
    the visual stream, grounding recorded at stop time, reverie/agent.py
    :299-304) against a reference-shaped torch loop over the same compiled
    env — per-step act logits, greedy actions, trajectories AND the final
    grounded object ids must agree."""
    import dataclasses

    from vln_imagine_tpu.config import _replace
    from vln_imagine_tpu.envx import env as envx
    from vln_imagine_tpu.envx import synthetic_world, synthetic_episodes
    from vln_imagine_tpu.train.rollout_hamt import rollout_hamt

    ref, params, cfg = pair
    T, B2 = 5, 2
    cfg = _replace(cfg, "env", max_nodes=20, max_candidates=6, views=12,
                   max_action_len=T, max_gt_path_len=5,
                   max_instr_len=L_TXT)
    cfg = dataclasses.replace(cfg, dataset="reverie")
    world_np, _ = synthetic_world(
        num_scans=1, num_nodes=20, max_candidates=6, views=12,
        feat_dim=768, seed=43, max_objects=KO, obj_feat_dim=OBJ_DIM)
    ep_np = synthetic_episodes(
        world_np, batch=B2, max_gt_path_len=5, max_instr_len=L_TXT,
        max_imaginations=2, vocab_size=1000, feat_dim=768, seed=44)
    import jax
    world = jax.tree.map(jnp.asarray, world_np)
    ep = jax.tree.map(jnp.asarray, ep_np)
    K = world_np.max_candidates

    model = HamtModel(cfg.model, feat_dropout=0.0)
    res = rollout_hamt(model, None, params, None, world, ep, cfg,
                       jax.random.PRNGKey(0), feedback="argmax",
                       train_ml=None, train_rl=False, deterministic=True,
                       max_steps=T, early_exit=False)
    logits_seq = np.asarray(res.logits)
    actions_seq = np.asarray(res.actions)

    with torch.no_grad():
        txt = ref("language", txt_ids=_t(np.asarray(ep.txt_ids)),
                  txt_masks=_t(np.asarray(ep.txt_mask)).float()).numpy()
        h0 = ref("history").expand(B2, -1)
    H = txt.shape[-1]
    hist_buf = torch.zeros(B2, T + 1, H)
    hist_buf[:, 0] = h0
    h_len = np.ones(B2, np.int64)
    st = envx.reset(world, ep, T)
    nodes_walk = [np.asarray(st.node).copy()]
    obj_pred = np.full((B2,), -1, np.int64)
    moved = np.zeros(B2, bool)
    for t in range(T):
        ended_pre = np.asarray(st.ended).copy()
        obs = envx.observe_hamt(world, ep, st, cfg.model.angle_feat_size)
        h_mask = np.arange(T + 1)[None, :] < h_len[:, None]
        od = dict(txt_mask=np.asarray(ep.txt_mask),
                  ob_img=np.asarray(obs.img), ob_ang=np.asarray(obs.ang),
                  ob_nav=np.asarray(obs.nav_types),
                  ob_mask=np.asarray(obs.valid),
                  obj_feat=np.asarray(obs.obj_img),
                  obj_ang=np.asarray(obs.obj_ang),
                  obj_pos=np.asarray(obs.obj_pos),
                  obj_mask=np.asarray(obs.obj_valid))
        act_ref, obj_ref = _navref_step_torch(ref, txt, hist_buf, h_mask, od)

        valid = (od["ob_nav"] != 0) & od["ob_mask"]
        np.testing.assert_allclose(logits_seq[t][valid], act_ref[valid],
                                   **TOL, err_msg=f"step {t} logits")
        a_t = act_ref.argmax(-1)
        np.testing.assert_array_equal(a_t, actions_seq[t],
                                      err_msg=f"step {t} actions")

        stop_sel = (a_t == np.asarray(obs.stop_slot)) & ~ended_pre
        stopping = stop_sel | ((t == T - 1) & ~ended_pre)
        any_obj = od["obj_mask"].any(1)
        best = np.asarray(obs.obj_ids)[
            np.arange(B2),
            np.where(od["obj_mask"], obj_ref, -np.inf).argmax(1)]
        obj_pred = np.where(stopping & any_obj, best, obj_pred)

        is_stop = stop_sel | ended_pre
        a_env = np.where(is_stop, K, a_t).astype(np.int32)
        moved |= ~is_stop

        hist_img, pano_img, pano_ang, prev_ang = envx.history_inputs(
            world, ep, st, jnp.asarray(np.where(is_stop, -1, a_env)),
            cfg.model.angle_feat_size)
        with torch.no_grad():
            h_tok = ref("history",
                        hist_img_feats=_t(np.asarray(hist_img)),
                        hist_ang_feats=_t(np.asarray(prev_ang)),
                        hist_pano_img_feats=_t(np.asarray(pano_img)),
                        hist_pano_ang_feats=_t(np.asarray(pano_ang)),
                        ob_step_ids=torch.full((B2,), t, dtype=torch.long))
        for b in range(B2):
            if not ended_pre[b]:
                hist_buf[b, h_len[b]] = h_tok[b]
                h_len[b] += 1
        st = envx.step_hamt(world, ep, st, jnp.asarray(a_env))
        nodes_walk.append(np.asarray(st.node).copy())

    assert moved.any(), "degenerate scenario: nobody moved"
    # grounded objects and trajectories agree
    np.testing.assert_array_equal(np.asarray(res.pred_obj), obj_pred)
    pn, pl = np.asarray(res.path_nodes), np.asarray(res.path_len)
    walk = np.stack(nodes_walk, 1)
    for b in range(B2):
        np.testing.assert_array_equal(pn[b, :pl[b]], walk[b, :pl[b]],
                                      err_msg=f"item {b} trajectory")
