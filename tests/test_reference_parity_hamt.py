"""Full-model numerical parity against the ACTUAL reference torch NavCMT.

The reference implementation (VLN-HAMT/finetune_src/models/vilmodel_cmt.py)
is importable in this environment.  We instantiate it with fixed random
weights at a structurally-full configuration (all 9 language layers, 4 cross
layers, 2 pano layers, hidden 768), convert the torch state_dict through
ckpt/convert.py, and assert end-to-end agreement of every forward mode:

- language   (vilmodel_cmt.py:1008-1030)
- history    (initial CLS token + per-step embedding, :1033-1038, :546-618)
- imagine    (bypass :620-631 and full encoder :634-703)
- align_with_contrastive_loss (cosine, :730-790) incl. the in-place
  projected-embedding overwrite (:781)
- visual     (:1056-1205) for concat_imagine_with language/visual/off and
  every act_pred_token variant, plus the txt[CLS]*hist[CLS] critic state
  (model_HAMT.py:86)

Any numeric drift >=1e-4 fails.  This turns the per-block parity of
tests/test_convert.py into proven full-model parity: a converted released
checkpoint runs the same function here as it does in the reference.
"""

import dataclasses
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from vln_imagine_tpu.ckpt import convert as C
from vln_imagine_tpu.config import hamt_r2r_config, _replace
from vln_imagine_tpu.models.hamt import HamtModel

REF = "/root/reference/VLN-HAMT/finetune_src"

# Structurally full (every layer present, real hidden width) but with small
# vocab/sequence capacities so the whole file runs in seconds on CPU.
HIDDEN = 768          # must be 768: the reference MLPProjectionHead input is
                      # hardcoded 768 (vilmodel_cmt.py:733)
L_TXT, T_OBS, T_HIST, N_IMAG = 20, 12, 3, 6
B = 2

TOL = dict(rtol=1e-4, atol=1e-4)


def _import_ref_hamt():
    """Import the reference model package, isolated from any other
    'models' package a sibling test may have imported."""
    for name in [n for n in sys.modules if n == "models" or
                 n.startswith("models.")]:
        del sys.modules[name]
    sys.path.insert(0, REF)
    try:
        import models.vilmodel_cmt as V  # noqa
    finally:
        sys.path.remove(REF)
    for name in [n for n in sys.modules if n == "models" or
                 n.startswith("models.")]:
        del sys.modules[name]
    return V


def _my_config(**model_overrides):
    base = dict(
        hidden_size=HIDDEN, num_attention_heads=12, intermediate_size=1024,
        vocab_size=1000, max_position_embeddings=64,
        image_feat_size=768, angle_feat_size=4,
        num_l_layers=9, num_x_layers=4, num_pano_layers=2,
        max_imagination_len=N_IMAG, max_action_steps=50,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        pred_head_dropout_prob=0.0, compute_dtype="float32",
        fix_lang_embedding=False, fix_hist_embedding=False)
    base.update(model_overrides)
    return _replace(hamt_r2r_config(), "model", **base)


def _ref_config(mcfg):
    """Assemble the mutated BertConfig exactly as
    vlnbert_init.py:37-76 does (w/o the HF download)."""
    from transformers import BertConfig
    c = BertConfig(
        vocab_size=mcfg.vocab_size, hidden_size=mcfg.hidden_size,
        num_hidden_layers=2,  # only pano sub-encoders copy+override this
        num_attention_heads=mcfg.num_attention_heads,
        intermediate_size=mcfg.intermediate_size, hidden_act="gelu",
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        max_position_embeddings=mcfg.max_position_embeddings,
        type_vocab_size=mcfg.type_vocab_size, layer_norm_eps=1e-12)
    c.image_feat_size = mcfg.image_feat_size
    c.angle_feat_size = mcfg.angle_feat_size
    c.num_l_layers = mcfg.num_l_layers
    c.num_r_layers = 0
    c.num_h_layers = 0
    c.num_x_layers = mcfg.num_x_layers
    c.hist_enc_pano = True
    c.num_h_pano_layers = mcfg.num_pano_layers
    c.fix_lang_embedding = mcfg.fix_lang_embedding
    c.fix_hist_embedding = mcfg.fix_hist_embedding
    c.fix_obs_embedding = mcfg.fix_obs_embedding
    c.update_lang_bert = not mcfg.fix_lang_embedding
    c.output_attentions = True
    c.pred_head_dropout_prob = 0.0
    c.no_lang_ca = mcfg.no_lang_ca
    c.act_pred_token = mcfg.act_pred_token
    c.max_action_steps = mcfg.max_action_steps
    c.imagine_enc_pano = mcfg.imagine_enc_pano
    c.max_imagination_len = mcfg.max_imagination_len
    c.fix_imagine_embeds = mcfg.fix_imagine_embeds
    c.bypass_imag_encoder = mcfg.bypass_imag_encoder
    c.use_cosine_aux_loss = mcfg.use_cosine_aux_loss
    c.aux_loss_type = mcfg.aux_loss_type
    c.infonce_temperature = mcfg.infonce_temperature
    c.contrastive_margin_value = mcfg.contrastive_margin_value
    c.concat_imagine_with = mcfg.concat_imagine_with
    c.no_loss_test = mcfg.no_loss_test
    return c


@pytest.fixture(scope="module")
def pair():
    """(torch NavCMT, converted flax params, my Config) with shared weights."""
    V = _import_ref_hamt()
    cfg = _my_config()
    torch.manual_seed(7)
    ref = V.NavCMT(_ref_config(cfg.model)).eval()
    params, skipped = C.convert_state_dict(
        ref.state_dict(), C.hamt_torch_to_flax_path)
    assert not skipped, f"unconverted reference keys: {skipped[:8]}"
    return ref, params, cfg


@pytest.fixture(scope="module")
def inputs():
    rng = np.random.default_rng(3)
    txt_ids = rng.integers(1, 1000, (B, L_TXT)).astype(np.int64)
    txt_mask = np.zeros((B, L_TXT), bool)
    txt_mask[0, :L_TXT] = True
    txt_mask[1, :15] = True
    ob_img = rng.standard_normal((B, T_OBS, 768)).astype(np.float32)
    ob_ang = rng.standard_normal((B, T_OBS, 4)).astype(np.float32)
    ob_nav = np.zeros((B, T_OBS), np.int64)
    ob_nav[0, :7] = 1
    ob_nav[0, 7] = 2
    ob_nav[1, :5] = 1
    ob_nav[1, 5] = 2
    ob_mask = np.zeros((B, T_OBS), bool)
    ob_mask[0, :12] = True   # includes 4 valid non-candidate pano views
    ob_mask[1, :9] = True    # includes 3 valid non-candidate pano views
    imag = rng.standard_normal((B, N_IMAG, 768)).astype(np.float32)
    imag_mask = np.zeros((B, N_IMAG), bool)
    imag_mask[0, :6] = True
    imag_mask[1, :4] = True
    hist_img = rng.standard_normal((B, 768)).astype(np.float32)
    hist_ang = rng.standard_normal((B, 4)).astype(np.float32)
    pano_img = rng.standard_normal((B, 8, 768)).astype(np.float32)
    pano_ang = rng.standard_normal((B, 8, 4)).astype(np.float32)
    return dict(txt_ids=txt_ids, txt_mask=txt_mask, ob_img=ob_img,
                ob_ang=ob_ang, ob_nav=ob_nav, ob_mask=ob_mask, imag=imag,
                imag_mask=imag_mask, hist_img=hist_img, hist_ang=hist_ang,
                pano_img=pano_img, pano_ang=pano_ang)


def _t(x):
    return torch.from_numpy(np.asarray(x))


def _ref_language(ref, inp):
    with torch.no_grad():
        return ref("language", txt_ids=_t(inp["txt_ids"]),
                   txt_masks=_t(inp["txt_mask"]).float()).numpy()


def _ref_history(ref, inp):
    """[initial CLS, step0, step1] as the rollout builds them
    (agent_cmt.py:492, :596-605)."""
    with torch.no_grad():
        h0 = ref("history").expand(B, -1).numpy()
        steps = []
        for sid in (0, 1):
            steps.append(ref(
                "history", hist_img_feats=_t(inp["hist_img"]),
                hist_ang_feats=_t(inp["hist_ang"]),
                hist_pano_img_feats=_t(inp["pano_img"]),
                hist_pano_ang_feats=_t(inp["pano_ang"]),
                ob_step_ids=torch.full((B,), sid, dtype=torch.long)).numpy())
    return np.stack([h0] + steps, axis=1)  # [B, 3, H]


def _my_history(model, params, inp):
    h0 = model.apply(params, B, method=HamtModel.history_initial)
    steps = [model.apply(
        params, jnp.asarray(inp["hist_img"]), jnp.asarray(inp["hist_ang"]),
        sid, jnp.asarray(inp["pano_img"]), jnp.asarray(inp["pano_ang"]),
        method=HamtModel.history_step) for sid in (0, 1)]
    return np.stack([np.asarray(h0)] + [np.asarray(s) for s in steps], axis=1)


def test_language_mode(pair, inputs):
    ref, params, cfg = pair
    want = _ref_language(ref, inputs)
    model = HamtModel(cfg.model, feat_dropout=0.0)
    got = np.asarray(model.apply(
        params, jnp.asarray(inputs["txt_ids"]), jnp.asarray(inputs["txt_mask"]),
        method=HamtModel.language))
    np.testing.assert_allclose(got, want, **TOL)


def test_history_mode(pair, inputs):
    ref, params, cfg = pair
    want = _ref_history(ref, inputs)
    model = HamtModel(cfg.model, feat_dropout=0.0)
    got = _my_history(model, params, inputs)
    np.testing.assert_allclose(got, want, **TOL)


def test_imagine_bypass(pair, inputs):
    ref, params, cfg = pair
    with torch.no_grad():
        want = ref("imagine", imagine_pano_img_feats=_t(inputs["imag"])).numpy()
    model = HamtModel(cfg.model, feat_dropout=0.0)
    got = np.asarray(model.apply(
        params, jnp.asarray(inputs["imag"]), method=HamtModel.imagine))
    np.testing.assert_allclose(got, want, **TOL)


@pytest.mark.slow
def test_imagine_full_encoder(inputs):
    """Non-bypass ImagineEmbeddings (vilmodel_cmt.py:634-703)."""
    V = _import_ref_hamt()
    # the reference asserts imagine_len < max_imagination_len strictly (:685)
    cfg = _my_config(bypass_imag_encoder=False,
                     max_imagination_len=N_IMAG + 2)
    torch.manual_seed(11)
    ref = V.NavCMT(_ref_config(cfg.model)).eval()
    params, skipped = C.convert_state_dict(
        ref.state_dict(), C.hamt_torch_to_flax_path)
    assert not skipped, skipped[:8]
    with torch.no_grad():
        want = ref("imagine", imagine_pano_img_feats=_t(inputs["imag"]),
                   imagine_masks=_t(inputs["imag_mask"])).numpy()
    model = HamtModel(cfg.model, feat_dropout=0.0)
    got = np.asarray(model.apply(
        params, jnp.asarray(inputs["imag"]), jnp.asarray(inputs["imag_mask"]),
        method=HamtModel.imagine))
    np.testing.assert_allclose(got, want, **TOL)


def test_align_cosine(pair, inputs):
    """Cosine alignment loss + the in-place projected-embed overwrite
    (vilmodel_cmt.py:750-790).  The reference consumes python lists of
    sub-instruction/noun-phrase token spans; ours consumes the equivalent
    precomputed per-row token-weight matrix."""
    ref, params, cfg = pair
    txt = _ref_language(ref, inputs)

    # two imaginations for item 0 (one with 2 noun phrases, one with none ->
    # skipped), one for item 1; remaining rows flagged False
    sub_instr_segs = [[(0, 8), (9, 14)] + [(0, 0)] * 4,
                      [(0, 9)] + [(0, 0)] * 5]
    noun_phrase_segs = [[[(1, 2), (5, 6)], []] + [[]] * 4,
                        [[(3, 5)]] + [[]] * 5]
    flags = [["True", "True"] + ["False"] * 4, ["True"] + ["False"] * 5]

    imag_t = _t(inputs["imag"]).clone()
    with torch.no_grad():
        loss_ref, new_imag_ref = ref(
            "align_with_contrastive_loss",
            align_txt_embeds=_t(txt), txt_masks=_t(inputs["txt_mask"]),
            align_imagine_embeds=imag_t, imagine_masks=_t(inputs["imag_mask"]),
            sub_instr_segs=sub_instr_segs, sub_instr_imag_flag=flags,
            noun_phrase_segs=noun_phrase_segs, obs_instr_ids=["a", "b"])

    # np_weights[b, i, l]: uniform over that row's noun-phrase tokens
    npw = np.zeros((B, N_IMAG, L_TXT), np.float32)
    for b in range(B):
        for i, nps in enumerate(noun_phrase_segs[b]):
            if flags[b][i] != "True" or not nps:
                continue
            total = sum(e - s + 1 for s, e in nps)
            for s, e in nps:
                npw[b, i, s:e + 1] = 1.0 / total

    model = HamtModel(cfg.model, feat_dropout=0.0)
    loss, new_imag = model.apply(
        params, jnp.asarray(txt), jnp.asarray(inputs["txt_mask"]),
        jnp.asarray(inputs["imag"]), jnp.asarray(inputs["imag_mask"]),
        jnp.asarray(npw), method=HamtModel.align_with_contrastive_loss)

    np.testing.assert_allclose(float(loss), float(loss_ref), **TOL)
    np.testing.assert_allclose(np.asarray(new_imag), new_imag_ref.numpy(),
                               **TOL)


def _run_visual(ref, params, cfg, inputs, txt, hist, imag):
    """Both sides' 'visual' forward on identical upstream embeddings."""
    hist_mask = np.ones((B, T_HIST), bool)
    with torch.no_grad():
        kw = {}
        if cfg.model.imagine_enc_pano:
            kw = dict(imagine_embeds=_t(imag),
                      imagine_masks=_t(inputs["imag_mask"]).float())
        act_ref, txt_ref, hist_ref, ob_ref = ref(
            "visual", txt_embeds=_t(txt),
            txt_masks=_t(inputs["txt_mask"]).float(),
            hist_embeds=_t(hist), hist_masks=_t(hist_mask).float(),
            ob_img_feats=_t(inputs["ob_img"]),
            ob_ang_feats=_t(inputs["ob_ang"]),
            ob_nav_types=_t(inputs["ob_nav"]),
            ob_masks=_t(inputs["ob_mask"]).float(), **kw)

    model = HamtModel(cfg.model, feat_dropout=0.0)
    ikw = {}
    if cfg.model.imagine_enc_pano:
        ikw = dict(imagine_embeds=jnp.asarray(imag),
                   imagine_mask=jnp.asarray(inputs["imag_mask"]))
    out = model.apply(
        params, jnp.asarray(txt), jnp.asarray(inputs["txt_mask"]),
        jnp.asarray(hist), jnp.asarray(hist_mask),
        jnp.asarray(inputs["ob_img"]), jnp.asarray(inputs["ob_ang"]),
        jnp.asarray(inputs["ob_nav"]), jnp.asarray(inputs["ob_mask"]),
        method=HamtModel.visual, **ikw)
    return (act_ref.numpy(), txt_ref.numpy(), hist_ref.numpy(),
            ob_ref.numpy()), out


@pytest.mark.parametrize("concat", ["language", "visual", "off"])
def test_visual_mode(pair, inputs, concat):
    ref, params, cfg = pair
    if concat == "off":
        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model, imagine_enc_pano=False))
        ref.config.imagine_enc_pano = False
    else:
        ref.config.imagine_enc_pano = True
        ref.config.concat_imagine_with = concat
        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model,
                                           concat_imagine_with=concat))
    try:
        model = HamtModel(cfg.model, feat_dropout=0.0)
        txt = _ref_language(ref, inputs)
        hist = _ref_history(ref, inputs)
        with torch.no_grad():
            imag = ref("imagine",
                       imagine_pano_img_feats=_t(inputs["imag"])).numpy()
        (act_ref, txt_ref, hist_ref, ob_ref), out = _run_visual(
            ref, params, cfg, inputs, txt, hist, imag)
    finally:
        ref.config.imagine_enc_pano = True
        ref.config.concat_imagine_with = "language"

    valid_logits = inputs["ob_nav"] != 0
    np.testing.assert_allclose(np.asarray(out.act_logits)[valid_logits],
                               act_ref[valid_logits], **TOL)
    assert np.all(np.asarray(out.act_logits)[~valid_logits] <= -1e8)
    assert np.all(np.isneginf(act_ref[~valid_logits]))
    np.testing.assert_allclose(np.asarray(out.txt_embeds), txt_ref, **TOL)
    np.testing.assert_allclose(np.asarray(out.hist_embeds), hist_ref, **TOL)
    np.testing.assert_allclose(np.asarray(out.ob_embeds), ob_ref, **TOL)
    # critic state txt[CLS] * hist[CLS] (model_HAMT.py:86)
    np.testing.assert_allclose(np.asarray(out.state),
                               txt_ref[:, 0] * hist_ref[:, 0], **TOL)


@pytest.mark.parametrize("act_pred_token",
                         ["ob", "ob_txt", "ob_hist", "ob_txt_hist",
                          "ob_imagine_text"])
@pytest.mark.slow
def test_act_pred_token_variants(pair, inputs, act_pred_token):
    """Every head-input variant (vilmodel_cmt.py:1187-1199) on shared
    weights."""
    ref, params, cfg = pair
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model,
                                       act_pred_token=act_pred_token))
    ref.config.act_pred_token = act_pred_token
    try:
        txt = _ref_language(ref, inputs)
        hist = _ref_history(ref, inputs)
        with torch.no_grad():
            imag = ref("imagine",
                       imagine_pano_img_feats=_t(inputs["imag"])).numpy()
        (act_ref, *_), out = _run_visual(ref, params, cfg, inputs, txt, hist,
                                         imag)
    finally:
        ref.config.act_pred_token = "ob_txt"
    valid = inputs["ob_nav"] != 0
    np.testing.assert_allclose(np.asarray(out.act_logits)[valid],
                               act_ref[valid], **TOL)


def test_one_rollout_step_on_envx_observations(pair):
    """One full greedy rollout step: compiled-env observations (envx) feed
    BOTH models — the flax HamtModel and the actual reference torch NavCMT —
    and the action logits, embeddings, chosen actions and resulting env
    transition must agree.  This pins the observation conventions (angle
    features, nav types, -10000 masks, [cands|STOP|views] layout) to the
    reference forward, not just the isolated modules."""
    from vln_imagine_tpu.envx import env as envx
    from vln_imagine_tpu.envx import synthetic_world, synthetic_episodes

    ref, params, cfg = pair
    B2 = 2
    world_np, _ = synthetic_world(
        num_scans=1, num_nodes=20, max_candidates=6, views=12,
        feat_dim=768, seed=21)
    ep_np = synthetic_episodes(
        world_np, batch=B2, max_gt_path_len=5, max_instr_len=L_TXT,
        max_imaginations=N_IMAG, vocab_size=1000, feat_dim=HIDDEN, seed=22)
    world = jax.tree.map(jnp.asarray, world_np)
    ep = jax.tree.map(jnp.asarray, ep_np)

    state0 = envx.reset(world, ep, max_action_len=8)
    obs = envx.observe_hamt(world, ep, state0, angle_feat_size=4)

    model = HamtModel(cfg.model, feat_dropout=0.0)
    txt = model.apply(params, ep.txt_ids, ep.txt_mask,
                      method=HamtModel.language)
    imag = model.apply(params, ep.imagine_feats, method=HamtModel.imagine)
    h0 = model.apply(params, B2, method=HamtModel.history_initial)
    out = model.apply(
        params, txt, ep.txt_mask, h0[:, None, :], jnp.ones((B2, 1), bool),
        obs.img, obs.ang, obs.nav_types, obs.valid,
        imagine_embeds=imag, imagine_mask=ep.imagine_mask,
        method=HamtModel.visual)

    with torch.no_grad():
        txt_t = ref("language", txt_ids=_t(np.asarray(ep.txt_ids)),
                    txt_masks=_t(np.asarray(ep.txt_mask)).float())
        imag_t = ref("imagine",
                     imagine_pano_img_feats=_t(np.asarray(ep.imagine_feats)))
        h0_t = ref("history").expand(B2, -1).unsqueeze(1)
        act_ref, txt_ref, hist_ref, ob_ref = ref(
            "visual", txt_embeds=txt_t,
            txt_masks=_t(np.asarray(ep.txt_mask)).float(),
            hist_embeds=h0_t, hist_masks=torch.ones(B2, 1),
            ob_img_feats=_t(np.asarray(obs.img)),
            ob_ang_feats=_t(np.asarray(obs.ang)),
            ob_nav_types=_t(np.asarray(obs.nav_types)).long(),
            ob_masks=_t(np.asarray(obs.valid)).float(),
            imagine_embeds=imag_t,
            imagine_masks=_t(np.asarray(ep.imagine_mask)).float())

    nav = np.asarray(obs.nav_types)
    valid = (nav != 0) & np.asarray(obs.valid)
    np.testing.assert_allclose(np.asarray(out.act_logits)[valid],
                               act_ref.numpy()[valid], **TOL)
    np.testing.assert_allclose(np.asarray(out.ob_embeds), ob_ref.numpy(),
                               **TOL)
    np.testing.assert_allclose(np.asarray(out.state),
                               txt_ref.numpy()[:, 0] * hist_ref.numpy()[:, 0],
                               **TOL)

    # same greedy action, and the env transition lands on that candidate
    mine = np.asarray(jnp.argmax(out.act_logits, -1))
    theirs = act_ref.numpy().argmax(-1)
    np.testing.assert_array_equal(mine, theirs)
    state1 = envx.step_hamt(world, ep, state0, jnp.asarray(mine))
    adj = np.asarray(world_np.adj)
    scans = np.asarray(ep_np.scan)
    nodes0 = np.asarray(state0.node)
    K = world_np.max_candidates
    for b in range(B2):
        want = (nodes0[b] if mine[b] >= K
                else adj[scans[b], nodes0[b], mine[b]])
        assert int(np.asarray(state1.node)[b]) == int(want)


@pytest.mark.slow
def test_whole_episode_rollout_parity(pair):
    """WHOLE-EPISODE greedy parity: the product rollout program
    (rollout_hamt: one lax.scan over the compiled env) against a
    reference-shaped torch loop (per-step envx observations -> NavCMT
    'visual' -> argmax -> 'history' append with the fixed hist buffer +
    mask -> env transition, agent_cmt.py:371-658).  Shared converted
    weights; per-step action logits within 1e-4 for all T steps, identical
    greedy actions, identical trajectory and path lengths.  This is where
    cross-step drift (history accumulation, step-id embeddings, stop
    bookkeeping) would surface — one-step parity cannot catch it."""
    from vln_imagine_tpu.envx import env as envx
    from vln_imagine_tpu.envx import synthetic_world, synthetic_episodes
    from vln_imagine_tpu.train.rollout_hamt import rollout_hamt

    ref, params, cfg = pair
    # skip the align overwrite on both sides: the torch align consumes
    # sub-instruction span metadata this synthetic world doesn't carry
    # (the align math itself is pinned by test_align_cosine)
    cfg = _replace(cfg, "model", use_cosine_aux_loss=False)
    T, B2 = 6, 2
    world_np, _ = synthetic_world(
        num_scans=1, num_nodes=20, max_candidates=6, views=12,
        feat_dim=768, seed=41)
    ep_np = synthetic_episodes(
        world_np, batch=B2, max_gt_path_len=5, max_instr_len=L_TXT,
        max_imaginations=N_IMAG, vocab_size=1000, feat_dim=HIDDEN, seed=42)
    world = jax.tree.map(jnp.asarray, world_np)
    ep = jax.tree.map(jnp.asarray, ep_np)
    K = world_np.max_candidates

    model = HamtModel(cfg.model, feat_dropout=0.0)
    res = rollout_hamt(model, None, params, None, world, ep, cfg,
                       jax.random.PRNGKey(0), feedback="argmax",
                       train_ml=None, train_rl=False, deterministic=True,
                       max_steps=T, early_exit=False)
    logits_seq = np.asarray(res.logits)      # [T, B, T_obs]
    actions_seq = np.asarray(res.actions)    # [T, B]

    # ---- reference-shaped torch loop over the same compiled env ----------
    with torch.no_grad():
        txt_t = ref("language", txt_ids=_t(np.asarray(ep.txt_ids)),
                    txt_masks=_t(np.asarray(ep.txt_mask)).float())
        imag_t = ref("imagine",
                     imagine_pano_img_feats=_t(np.asarray(ep.imagine_feats)))
        h0_t = ref("history").expand(B2, -1)
    hist_buf = torch.zeros(B2, T + 1, HIDDEN)
    hist_buf[:, 0] = h0_t
    h_len = np.ones(B2, np.int64)
    st = envx.reset(world, ep, T)
    nodes_walk = [np.asarray(st.node).copy()]
    for t in range(T):
        ended_pre = np.asarray(st.ended).copy()
        obs = envx.observe_hamt(world, ep, st, cfg.model.angle_feat_size)
        h_mask = np.arange(T + 1)[None, :] < h_len[:, None]
        with torch.no_grad():
            act_ref, _, _, _ = ref(
                "visual", txt_embeds=txt_t,
                txt_masks=_t(np.asarray(ep.txt_mask)).float(),
                hist_embeds=hist_buf, hist_masks=_t(h_mask).float(),
                ob_img_feats=_t(np.asarray(obs.img)),
                ob_ang_feats=_t(np.asarray(obs.ang)),
                ob_nav_types=_t(np.asarray(obs.nav_types)).long(),
                ob_masks=_t(np.asarray(obs.valid)).float(),
                imagine_embeds=imag_t,
                imagine_masks=_t(np.asarray(ep.imagine_mask)).float())
        valid = (np.asarray(obs.nav_types) != 0) & np.asarray(obs.valid)
        np.testing.assert_allclose(logits_seq[t][valid],
                                   act_ref.numpy()[valid], **TOL,
                                   err_msg=f"step {t} logits")
        a_t = act_ref.numpy().argmax(-1)
        np.testing.assert_array_equal(a_t, actions_seq[t],
                                      err_msg=f"step {t} actions")

        stop_sel = (a_t == np.asarray(obs.stop_slot)) & ~ended_pre
        is_stop = stop_sel | ended_pre
        a_env = np.where(is_stop, K, a_t).astype(np.int32)

        # history token for time t (appended before the transition,
        # frozen once ended — agent_cmt.py:596-609)
        hist_img, pano_img, pano_ang, prev_ang = envx.history_inputs(
            world, ep, st, jnp.asarray(np.where(is_stop, -1, a_env)),
            cfg.model.angle_feat_size)
        with torch.no_grad():
            h_tok = ref("history", hist_img_feats=_t(np.asarray(hist_img)),
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

    # identical trajectories: the torch-driven walk reproduces the product
    # rollout's recorded path exactly
    pn, pl = np.asarray(res.path_nodes), np.asarray(res.path_len)
    walk = np.stack(nodes_walk, 1)           # [B, T+1]
    for b in range(B2):
        # recorded path = walk truncated at the stop transition
        np.testing.assert_array_equal(
            pn[b, : pl[b]],
            walk[b, : pl[b]],
            err_msg=f"item {b} trajectory")
        # after stopping the walk holds position
        assert (walk[b, pl[b] - 1 :] == walk[b, pl[b] - 1]).all()
