"""HAMT-Imagine: history-aware cross-modal transformer, TPU-first.

Functional rebuild of NavCMT (VLN-HAMT/finetune_src/models/vilmodel_cmt.py:
966-1205) and its VLNBertCMT wrapper (models/model_HAMT.py:13-97).  The
reference multiplexes five modes through one forward(); here each mode is a
named method on one flax module so the rollout can jit them together inside a
single lax.scan program:

- language  (vilmodel_cmt.py:1008-1030)
- history   (per-step embedding, :1033-1038 + HistoryEmbeddings :546-618)
- imagine   (:1040-1048, bypass variant :620-631 used by released configs)
- align_with_contrastive_loss (:1050-1053 / AlignWithContrastiveLoss :730-790)
  — the python double loop over (batch x sub-instructions) becomes one masked
  segment-mean matmul over precomputed noun-phrase weight rows
- visual    (:1056-1205), concat_imagine_with='language' released layout:
  cross-modal streams are [txt; imagine] x [hist; obs]
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from vln_imagine_tpu.config import ModelConfig
from vln_imagine_tpu.models.bert import (
    BertEmbeddings,
    BertEncoder,
    BertLayer,
    LXRTXLayer,
    LayerNorm12,
    MLPProjectionHead,
    NextActionPrediction,
    _dtype,
)
from vln_imagine_tpu.models.vit import extract_imagine_features, make_imagine_vit
from vln_imagine_tpu.ops.masks import extend_neg_mask, mask_logits


class ImageEmbeddings(nn.Module):
    """img/angle linear+LN + nav-type + token-type -> LN -> dropout
    (vilmodel_cmt.py:521-544).  Setup-style so the nav-type table can be
    shared with the object segment (NavRefCMT feeds objects the IMAGE
    module's nav_type_embedding, vlnbert_navref.py:127-130)."""

    config: ModelConfig

    def setup(self):
        cfg = self.config
        dt = _dtype(cfg)
        self.img_linear = nn.Dense(cfg.hidden_size, dtype=dt)
        self.img_layer_norm = LayerNorm12()
        self.ang_linear = nn.Dense(cfg.hidden_size, dtype=dt)
        self.ang_layer_norm = LayerNorm12()
        self.nav_type_embedding = nn.Embed(3, cfg.hidden_size, dtype=dt)
        self.layer_norm = LayerNorm12()
        self.dropout = nn.Dropout(cfg.hidden_dropout_prob)

    def embed_nav_types(self, nav_types):
        return self.nav_type_embedding(nav_types)

    def __call__(self, img_feat, ang_feat, type_embeddings, nav_types=None,
                 deterministic=True):
        x = self.img_layer_norm(self.img_linear(img_feat)) \
            + self.ang_layer_norm(self.ang_linear(ang_feat)) \
            + type_embeddings
        if nav_types is not None:
            x = x + self.nav_type_embedding(nav_types)
        x = self.layer_norm(x)
        return self.dropout(x, deterministic=deterministic)


class ObjectEmbeddings(nn.Module):
    """REVERIE object tokens (NavRefCMT ObjectEmbeddings,
    vlnbert_navref.py:11-41): img/ang/5-d-bbox-pos linear+LN branches plus
    the SHARED image nav-type embedding (type 2) and token-type embedding,
    final LN -> dropout."""

    config: ModelConfig

    def setup(self):
        cfg = self.config
        dt = _dtype(cfg)
        self.img_linear = nn.Dense(cfg.hidden_size, dtype=dt)
        self.img_layer_norm = LayerNorm12()
        self.ang_linear = nn.Dense(cfg.hidden_size, dtype=dt)
        self.ang_layer_norm = LayerNorm12()
        self.pos_linear = nn.Dense(cfg.hidden_size, dtype=dt)
        self.pos_layer_norm = LayerNorm12()
        self.layer_norm = LayerNorm12()
        self.dropout = nn.Dropout(cfg.hidden_dropout_prob)

    def __call__(self, obj_feat, obj_ang, obj_pos, type_embeddings,
                 nav_type_embeddings, deterministic=True):
        x = self.img_layer_norm(self.img_linear(obj_feat)) \
            + self.ang_layer_norm(self.ang_linear(obj_ang)) \
            + self.pos_layer_norm(self.pos_linear(obj_pos)) \
            + nav_type_embeddings + type_embeddings
        x = self.layer_norm(x)
        return self.dropout(x, deterministic=deterministic)


class HistoryEmbeddings(nn.Module):
    """Per-step history token (vilmodel_cmt.py:546-618): current-view +
    prev-action-angle linears + step position + type embedding, plus a
    2-layer pano sub-encoder mean-pooled over the 36 views."""

    config: ModelConfig

    def setup(self):
        cfg = self.config
        dt = _dtype(cfg)
        self.cls_token = self.param(
            "cls_token", nn.initializers.zeros, (1, 1, cfg.hidden_size))
        self.img_linear = nn.Dense(cfg.hidden_size, dtype=dt)
        self.img_layer_norm = LayerNorm12()
        self.ang_linear = nn.Dense(cfg.hidden_size, dtype=dt)
        self.ang_layer_norm = LayerNorm12()
        self.position_embeddings = nn.Embed(
            cfg.max_action_steps, cfg.hidden_size, dtype=dt)
        self.type_embedding = nn.Embed(1, cfg.hidden_size, dtype=dt)
        self.layer_norm = LayerNorm12()
        self.dropout = nn.Dropout(cfg.hidden_dropout_prob)
        self.pano_img_linear = nn.Dense(cfg.hidden_size, dtype=dt)
        self.pano_img_layer_norm = LayerNorm12()
        self.pano_ang_linear = nn.Dense(cfg.hidden_size, dtype=dt)
        self.pano_ang_layer_norm = LayerNorm12()
        self.pano_encoder = BertEncoder(cfg, num_layers=cfg.num_pano_layers)

    def initial(self, batch_size: int, deterministic=True):
        """The [CLS]-style step-0 global history token (:592-595)."""
        type_emb = self.type_embedding(jnp.zeros((batch_size,), jnp.int32))
        x = self.cls_token[0, 0][None, :] + type_emb
        return self.dropout(self.layer_norm(x), deterministic=deterministic)

    def __call__(self, img_feats, ang_feats, step_ids, pano_img_feats,
                 pano_ang_feats, deterministic=True):
        B = img_feats.shape[0]
        type_emb = self.type_embedding(jnp.zeros((B,), jnp.int32))
        x = (self.img_layer_norm(self.img_linear(img_feats))
             + self.ang_layer_norm(self.ang_linear(ang_feats))
             + self.position_embeddings(step_ids)
             + type_emb)
        pano = (self.pano_img_layer_norm(self.pano_img_linear(pano_img_feats))
                + self.pano_ang_layer_norm(self.pano_ang_linear(pano_ang_feats)))
        pano = self.dropout(pano, deterministic=deterministic)
        zero_mask = jnp.zeros((B, 1, 1, pano.shape[1]), pano.dtype)
        pano = self.pano_encoder(pano, zero_mask, deterministic=deterministic)
        x = x + jnp.mean(pano, axis=1)
        return self.dropout(self.layer_norm(x), deterministic=deterministic)


class BypassImagineEmbeddings(nn.Module):
    """features + type embedding (vilmodel_cmt.py:620-631); the path used by
    all released configs (--bypass_imag_encoder)."""

    config: ModelConfig

    @nn.compact
    def __call__(self, imagine_feat):
        cfg = self.config
        type_emb = nn.Embed(1, cfg.hidden_size, dtype=_dtype(cfg),
                            name="type_embedding")(
            jnp.zeros((imagine_feat.shape[0], 1), jnp.int32))
        return imagine_feat + type_emb


class ImagineEmbeddings(nn.Module):
    """Full imagination encoder (vilmodel_cmt.py:634-703): position + type
    embedding, linear+LN, pano sub-encoder with padding masks."""

    config: ModelConfig

    @nn.compact
    def __call__(self, feats, imagine_mask, deterministic=True):
        cfg = self.config
        dt = _dtype(cfg)
        B, I, _ = feats.shape
        pos = nn.Embed(cfg.max_imagination_len, cfg.hidden_size, dtype=dt,
                       name="position_embeddings")(
            jnp.broadcast_to(jnp.arange(I)[None, :], (B, I)))
        typ = nn.Embed(1, cfg.hidden_size, dtype=dt, name="type_embedding")(
            jnp.zeros((B, I), jnp.int32))
        x = feats + pos + typ
        x = LayerNorm12(name="pano_img_layer_norm")(
            nn.Dense(cfg.hidden_size, dtype=dt, name="pano_img_linear")(x))
        x = nn.Dropout(cfg.hidden_dropout_prob,
                       deterministic=deterministic)(x)
        x = BertEncoder(cfg, num_layers=cfg.num_pano_layers,
                        name="pano_encoder")(
            x, extend_neg_mask(imagine_mask), deterministic=deterministic)
        x = LayerNorm12(name="layer_norm")(x)
        return nn.Dropout(cfg.hidden_dropout_prob, deterministic=deterministic)(x)


def contrastive_alignment_loss(proj, mean_np, valid, aux_loss_type="cosine",
                               temperature=0.3, margin=1.0, groups=None):
    """Imagination-text alignment losses over [B, I, H] projections.

    - 'cosine': mean over valid rows of 1 - cos(proj, mean_np)
      (AlignWithContrastiveLoss, vilmodel_cmt.py:777-788)
    - 'infonce': CE of the positive against cross-batch noun-phrase-mean
      negatives at `temperature` (compute_contrastive_loss_infonce :793-823)
    - 'margin': pos loss + mean hinge(margin + neg_sim - pos_sim)
      (compute_contrastive_loss_margin :825-856)

    groups: optional [B] i32 labels for fused multi-rollout batches (e.g. the
    IL and RL halves of one train step packed into one batch).  The loss is
    then the SUM of each group's independently normalized loss, and
    contrastive negatives are restricted to the same group — exactly what two
    separate per-rollout calls would produce (the reference runs the aux loss
    once per rollout and accumulates, agent_cmt.py:437-462).
    """
    B, I, _ = proj.shape
    f32 = jnp.float32

    def unit(x):
        x = x.astype(f32)
        return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True),
                               1e-8)

    pn, mn = unit(proj), unit(mean_np)
    pos_sim = jnp.sum(pn * mn, axis=-1)                    # [B, I]

    def grouped_mean(per_row):                             # [B, I] -> scalar
        if groups is None:
            return jnp.sum(per_row * valid) / jnp.maximum(jnp.sum(valid), 1)
        total = jnp.asarray(0.0, f32)
        for g in (0, 1):
            in_g = (groups == g)[:, None] & (valid > 0)
            total = total + jnp.sum(jnp.where(in_g, per_row, 0.0)) \
                / jnp.maximum(jnp.sum(in_g), 1)
        return total

    if aux_loss_type == "cosine":
        return grouped_mean(1.0 - pos_sim)

    # similarity of every projection to every batch item's noun-phrase means
    sim = jnp.einsum("bih,cjh->bicj", pn, mn)              # [B, I, B, I]
    # negatives: valid rows of *other* batch items (vilmodel_cmt.py:907),
    # same-group only when a fused batch carries group labels
    other = (jnp.arange(B)[:, None] != jnp.arange(B)[None, :])  # [B, C]
    if groups is not None:
        other = other & (groups[:, None] == groups[None, :])
    neg_mask = other[:, None, :, None] & valid[None, None, :, :]
    neg_mask = jnp.broadcast_to(neg_mask, sim.shape)

    if aux_loss_type == "infonce":
        logits_pos = pos_sim / temperature                 # [B, I]
        logits_neg = jnp.where(neg_mask, sim / temperature, -jnp.inf)
        flat_neg = logits_neg.reshape(B, I, -1)
        all_logits = jnp.concatenate([logits_pos[..., None], flat_neg], -1)
        m = jnp.max(all_logits, axis=-1, keepdims=True)
        lse = m[..., 0] + jnp.log(jnp.sum(jnp.exp(all_logits - m), -1))
        return grouped_mean(lse - logits_pos)
    if aux_loss_type == "margin":
        hinge = jnp.maximum(margin + sim - pos_sim[:, :, None, None], 0.0)
        n_neg = jnp.maximum(jnp.sum(neg_mask, axis=(2, 3)), 1)
        neg_loss = jnp.sum(jnp.where(neg_mask, hinge, 0.0), (2, 3)) / n_neg
        return grouped_mean((1.0 - pos_sim) + neg_loss)
    raise ValueError(aux_loss_type)


class VisualOut(NamedTuple):
    act_logits: jnp.ndarray   # [B, T_obs]
    txt_embeds: jnp.ndarray   # [B, L, H]
    hist_embeds: jnp.ndarray  # [B, T, H]
    ob_embeds: jnp.ndarray    # [B, T_obs, H]
    state: jnp.ndarray        # [B, H] critic state txt[CLS] * hist[CLS]
    obj_logits: jnp.ndarray | None = None  # [B, Ko] REVERIE grounding


class HamtModel(nn.Module):
    """NavCMT + the VLNBertCMT wrapper's env-feature dropout, one flax module."""

    config: ModelConfig
    feat_dropout: float = 0.4

    def setup(self):
        cfg = self.config
        self.embeddings = BertEmbeddings(cfg)
        self.img_embeddings = ImageEmbeddings(cfg)
        self.hist_embeddings = HistoryEmbeddings(cfg)
        if cfg.imagine_enc_pano:
            if cfg.bypass_imag_encoder:
                self.imagine_embeddings = BypassImagineEmbeddings(cfg)
            else:
                self.imagine_embeddings = ImagineEmbeddings(cfg)
            if cfg.use_cosine_aux_loss or cfg.no_loss_test:
                self.image_proj = MLPProjectionHead(cfg)
            if cfg.e2e_imagination != "off":
                self.imagine_vit = make_imagine_vit(cfg)
        self.lang_layers = [
            BertLayer(cfg, name=f"lang_layer_{i}")
            for i in range(cfg.num_l_layers)]
        self.x_layers = [
            LXRTXLayer(cfg, name=f"x_layer_{i}")
            for i in range(cfg.num_x_layers)]
        self.next_action = NextActionPrediction(cfg)
        if cfg.obj_feat_size > 0:
            # REVERIE object segment (NavRefCMT: ObjectEmbeddings
            # vlnbert_navref.py:11-41 + ref_object head :56,153) incl. the
            # 5-d normalized bbox position branch (get_obj_local_pos,
            # reverie/data_utils.py:25-31)
            self.obj_embeddings = ObjectEmbeddings(cfg)
            self.ref_object = NextActionPrediction(cfg)
        self.drop_env = nn.Dropout(self.feat_dropout)

    # ------------------------------------------------------------------ modes
    def language(self, txt_ids, txt_mask, deterministic=True):
        cfg = self.config
        ext = extend_neg_mask(txt_mask)
        x = self.embeddings(txt_ids, deterministic=deterministic)
        for layer in self.lang_layers:
            x = layer(x, ext, deterministic=deterministic)
        if cfg.fix_lang_embedding:
            x = jax.lax.stop_gradient(x)
        if cfg.no_lang_ca:
            if cfg.obj_feat_size > 0:
                # NavRefCMT (vlnbert_navref.py:66-80,143): its language
                # mode returns only the final layer and the text never
                # updates through the x-layers — every stack slot is the
                # same final output; the per-layer lang branches below
                # would be computed and immediately discarded
                return jnp.broadcast_to(
                    x[None], (1 + len(self.x_layers),) + x.shape)
            # language is static during cross-modal encoding: precompute each
            # x-layer's lang self-att branch over the BASE text embedding
            # (vilmodel_cmt.py:1022-1029 — the reference intentionally does
            # not chain them) and return [1+X, B, L, H]
            outs = [x]
            for layer in self.x_layers:
                s = layer.lang_self_att_branch(x, ext, deterministic)
                outs.append(s)
            return jnp.stack(outs, axis=0)
        return x

    def history_initial(self, batch_size: int, deterministic=True):
        h = self.hist_embeddings.initial(batch_size, deterministic)
        if self.config.fix_hist_embedding:
            h = jax.lax.stop_gradient(h)
        return h

    def history_step(self, hist_img_feats, prev_act_angle, step_id,
                     pano_img_feats, pano_ang_feats, deterministic=True):
        """One new history token for time `step_id` (agent_cmt.py:596-605)."""
        hist_img_feats = self.drop_env(hist_img_feats,
                                       deterministic=deterministic)
        pano_img_feats = self.drop_env(pano_img_feats,
                                       deterministic=deterministic)
        B = hist_img_feats.shape[0]
        step_ids = jnp.broadcast_to(jnp.asarray(step_id, jnp.int32), (B,))
        h = self.hist_embeddings(hist_img_feats, prev_act_angle, step_ids,
                                 pano_img_feats, pano_ang_feats, deterministic)
        if self.config.fix_hist_embedding:
            h = jax.lax.stop_gradient(h)
        return h

    def imagine(self, imagine_feats, imagine_mask=None, deterministic=True):
        cfg = self.config
        if cfg.e2e_imagination != "off":
            # imagine_feats is raw images [B, I, Hp, Wp, 3]: extract class-
            # token features with the in-model ViT (BASELINE config 4)
            imagine_feats = extract_imagine_features(
                self.imagine_vit, imagine_feats, cfg, deterministic)
        imagine_feats = self.drop_env(imagine_feats,
                                      deterministic=deterministic)
        if cfg.bypass_imag_encoder:
            out = self.imagine_embeddings(imagine_feats)
        else:
            out = self.imagine_embeddings(imagine_feats, imagine_mask,
                                          deterministic)
        if cfg.fix_imagine_embeds:
            out = jax.lax.stop_gradient(out)
        return out

    def align_with_contrastive_loss(self, txt_embeds, txt_mask, imagine_embeds,
                                    imagine_mask, np_weights,
                                    deterministic=True, groups=None):
        """Alignment of projected imagination embeddings to the mean
        noun-phrase token embedding of their sub-instruction, as one matmul.

        np_weights[b, i] is a distribution over instruction tokens (1/n on the
        noun-phrase tokens of sub-instruction i, 0 elsewhere; all-zero when the
        sub-instruction has no noun phrases).  Returns (loss, new_imagine):
        valid rows are overwritten with their projection, reproducing the
        reference's in-place update (vilmodel_cmt.py:781) that feeds
        *projected* embeddings to the navigator.

        aux_loss_type selects cosine (AlignWithContrastiveLoss :730-790),
        InfoNCE or margin (AlignWithContrastiveLossWithNegativeSamples
        :858-950 + :793-856).  Negatives for the contrastive variants are the
        other batch items' noun-phrase means (the reference enumerates
        individual noun phrases; here one mean per imagination row — same
        pool granularity as the positives)."""
        proj = self.image_proj(imagine_embeds, deterministic=deterministic)
        mean_np = jnp.einsum("bil,blh->bih", np_weights.astype(txt_embeds.dtype),
                             txt_embeds)
        valid = imagine_mask & (jnp.sum(np_weights, axis=-1) > 0)
        loss = contrastive_alignment_loss(
            proj, mean_np, valid, self.config.aux_loss_type,
            self.config.infonce_temperature,
            self.config.contrastive_margin_value, groups=groups)
        new_imagine = jnp.where(valid[:, :, None], proj, imagine_embeds)
        return loss, new_imagine

    def visual(self, txt_embeds, txt_mask, hist_embeds, hist_mask,
               ob_img_feats, ob_ang_feats, ob_nav_types, ob_valid,
               imagine_embeds=None, imagine_mask=None,
               obj_img_feats=None, obj_ang_feats=None, obj_valid=None,
               obj_pos_feats=None, deterministic=True):
        """Per-step cross-modal encoding + action logits
        (vilmodel_cmt.py:1056-1205).  With object inputs (REVERIE,
        vlnbert_navref.py:90-155) the visual stream is [hist; obs; obj] and
        obj_logits = ref_object(obj_embeds * txt[CLS]) masked by obj_valid."""
        cfg = self.config
        no_ca = cfg.no_lang_ca
        if no_ca:
            assert not (cfg.imagine_enc_pano
                        and cfg.concat_imagine_with == "language"), \
                "no_lang_ca + language-concat imagination is unsupported " \
                "(the reference path is inconsistent for this combo)"
            txt_stack, txt_embeds = txt_embeds, txt_embeds[0]
        ext_txt = extend_neg_mask(txt_mask)
        ext_hist = extend_neg_mask(hist_mask)
        ext_ob = extend_neg_mask(ob_valid)

        ob_img_feats = self.drop_env(ob_img_feats, deterministic=deterministic)
        B, T_obs = ob_nav_types.shape
        type_emb = self.embeddings.token_type_embedding(
            jnp.ones((B, T_obs), jnp.int32))
        ob_embeds = self.img_embeddings(
            ob_img_feats, ob_ang_feats, type_emb, ob_nav_types, deterministic)
        if cfg.fix_obs_embedding:
            ob_embeds = jax.lax.stop_gradient(ob_embeds)

        hist_len = hist_embeds.shape[1]
        visn = jnp.concatenate([hist_embeds, ob_embeds], axis=1)
        visn_mask = jnp.concatenate([ext_hist, ext_ob], axis=-1)

        Ko = 0
        if cfg.obj_feat_size > 0 and obj_img_feats is not None:
            Ko = obj_img_feats.shape[1]
            obj_img_feats = self.drop_env(obj_img_feats,
                                          deterministic=deterministic)
            obj_type = self.embeddings.token_type_embedding(
                jnp.ones((B, Ko), jnp.int32))
            if obj_pos_feats is None:  # tables without bbox positions
                obj_pos_feats = jnp.zeros((B, Ko, 5), obj_img_feats.dtype)
            # objects carry the STOP nav type from the IMAGE module's
            # shared embedding table (vlnbert_navref.py:127-130)
            obj_nav = self.img_embeddings.embed_nav_types(
                jnp.full((B, Ko), 2, jnp.int32))
            obj_embeds = self.obj_embeddings(
                obj_img_feats, obj_ang_feats, obj_pos_feats, obj_type,
                obj_nav, deterministic)
            visn = jnp.concatenate([visn, obj_embeds], axis=1)
            visn_mask = jnp.concatenate(
                [visn_mask, extend_neg_mask(obj_valid)], axis=-1)

        if cfg.imagine_enc_pano and cfg.concat_imagine_with == "language":
            lang = jnp.concatenate([txt_embeds, imagine_embeds], axis=1)
            lang_mask = jnp.concatenate(
                [ext_txt, extend_neg_mask(imagine_mask)], axis=-1)
        elif cfg.imagine_enc_pano and cfg.concat_imagine_with == "visual":
            visn = jnp.concatenate([visn, imagine_embeds], axis=1)
            visn_mask = jnp.concatenate(
                [visn_mask, extend_neg_mask(imagine_mask)], axis=-1)
            lang, lang_mask = txt_embeds, ext_txt
        else:
            lang, lang_mask = txt_embeds, ext_txt

        for li, layer in enumerate(self.x_layers):
            if no_ca:
                lang = txt_stack[li]  # per-layer static text (:1119-1121)
            lang, visn = layer(lang, lang_mask, visn, visn_mask,
                               deterministic=deterministic)

        hist_out = visn[:, :hist_len]
        ob_out = visn[:, hist_len:hist_len + T_obs]
        txt_len = txt_embeds.shape[1]
        txt_out = lang[:, :txt_len]
        imagine_out = lang[:, txt_len:] if (
            cfg.imagine_enc_pano and cfg.concat_imagine_with == "language"
        ) else (imagine_embeds if imagine_embeds is not None else None)

        if no_ca and Ko:
            # NavRefCMT hardcodes next_action(ob * hist[CLS]) regardless of
            # flags (vlnbert_navref.py:150); the released REVERIE recipe
            # runs it with --no_lang_ca (run_reverie.sh:27)
            head_in = ob_out * hist_out[:, :1]
        elif no_ca:
            head_in = ob_out  # (:1187-1188)
        elif cfg.act_pred_token == "ob_txt":
            head_in = ob_out * txt_out[:, :1]
        elif cfg.act_pred_token == "ob":
            head_in = ob_out
        elif cfg.act_pred_token == "ob_hist":
            head_in = ob_out * hist_out[:, :1]
        elif cfg.act_pred_token == "ob_txt_hist":
            head_in = ob_out * (txt_out[:, :1] + hist_out[:, :1])
        elif cfg.act_pred_token == "ob_imagine_text":
            head_in = ob_out * (txt_out[:, :1] +
                                jnp.mean(imagine_out, axis=1, keepdims=True))
        else:
            raise ValueError(cfg.act_pred_token)

        logits = self.next_action(head_in, deterministic=deterministic)[..., 0]
        logits = mask_logits(logits, (ob_nav_types != 0) & ob_valid)
        # critic state: txt[CLS] * hist[CLS], or hist[CLS] under no_lang_ca
        # (model_HAMT.py:83-86)
        state = hist_out[:, 0] if no_ca else txt_out[:, 0] * hist_out[:, 0]
        obj_logits = None
        if Ko:
            obj_out = visn[:, hist_len + T_obs: hist_len + T_obs + Ko]
            obj_logits = self.ref_object(
                obj_out * txt_out[:, :1], deterministic=deterministic)[..., 0]
            obj_logits = mask_logits(obj_logits, obj_valid)
        return VisualOut(logits, txt_out, hist_out, ob_out, state, obj_logits)
