"""DUET-Imagine: dual-scale global-topo-map + local-pano graph transformer.

Functional rebuild of GlocalTextPathNavCMT
(VLN-DUET/map_nav_src/models/vilmodel.py:1022-1289) and its VLNBert wrapper
(models/model.py:12-62):

- text     (forward_text :1075)
- imagine  (forward_imagination :1081, bypass)
- align    (AlignWithContrastiveLoss :591-655, vectorized; optional
  stop-gradient on text per --fix_lang_inside_cosine_model :1249)
- panorama (forward_panorama_per_step :1087-1131: img+loc+navtype+type embeds
  -> 2-layer pre-norm pano encoder)
- navigation (forward_navigation_per_step :1133-1235: global branch with
  step/pos embeddings + sprel-biased cross-modal encoder, local branch with
  [stop]+pano tokens + 14-d vp pos features, dynamic sigmoid fusion, and the
  fused-logit graph merge — the per-batch python loop :1200-1217 becomes
  masked matmul/scatter arithmetic)
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from vln_imagine_tpu.config import ModelConfig
from vln_imagine_tpu.models.bert import (
    BertEmbeddings,
    BertLayer,
    ClsPrediction,
    GraphLXRTXLayer,
    LayerNorm12,
    MLPProjectionHead,
    PreNormEncoder,
    _dtype,
)
from vln_imagine_tpu.models.hamt import BypassImagineEmbeddings
from vln_imagine_tpu.models.vit import extract_imagine_features, make_imagine_vit
from vln_imagine_tpu.ops.masks import extend_neg_mask, mask_logits


class CrossmodalEncoder(nn.Module):
    """num_x_layers GraphLXRTXLayers (vilmodel.py:436-453)."""

    config: ModelConfig

    def setup(self):
        self.layers = [GraphLXRTXLayer(self.config, name=f"x_layer_{i}")
                       for i in range(self.config.num_x_layers)]

    def __call__(self, txt_embeds, txt_mask, img_embeds, img_mask,
                 graph_sprels=None, deterministic=True):
        ext_txt = extend_neg_mask(txt_mask)
        ext_img = extend_neg_mask(img_mask)
        for layer in self.layers:
            img_embeds = layer(txt_embeds, ext_txt, img_embeds, ext_img,
                               graph_sprels=graph_sprels,
                               deterministic=deterministic)
        return img_embeds

    def lang2visn_stack(self, txt_embeds, txt_mask, img_embeds, img_mask,
                        deterministic=True):
        """Language-queries-visual stack used by the pre-training MLM
        context (pretrain vilmodel.py:724-745)."""
        ext_txt = extend_neg_mask(txt_mask)
        ext_img = extend_neg_mask(img_mask)
        for layer in self.layers:
            txt_embeds = layer.lang2visn(txt_embeds, ext_txt, img_embeds,
                                         ext_img, deterministic)
        return txt_embeds


class NavOut(NamedTuple):
    global_logits: jnp.ndarray  # [B, G+1] (slot 0 = stop)
    local_logits: jnp.ndarray   # [B, T_pano+1] (slot 0 = stop)
    fused_logits: jnp.ndarray   # [B, G+1]
    gmap_embeds: jnp.ndarray
    vp_embeds: jnp.ndarray
    obj_logits: Optional[jnp.ndarray] = None  # [B, T_pano+1] (REVERIE/SOON)


class DuetModel(nn.Module):
    config: ModelConfig
    feat_dropout: float = 0.4

    def setup(self):
        cfg = self.config
        dt = _dtype(cfg)
        self.embeddings = BertEmbeddings(cfg)
        self.lang_layers = [BertLayer(cfg, name=f"lang_layer_{i}")
                            for i in range(cfg.num_l_layers)]
        # image embeddings (vilmodel.py:455-526)
        self.img_linear = nn.Dense(cfg.hidden_size, dtype=dt)
        self.img_layer_norm = LayerNorm12()
        self.loc_linear = nn.Dense(cfg.hidden_size, dtype=dt)
        self.loc_layer_norm = LayerNorm12()
        self.nav_type_embedding = nn.Embed(3, cfg.hidden_size, dtype=dt)
        self.img_final_norm = LayerNorm12()
        self.img_dropout = nn.Dropout(cfg.hidden_dropout_prob)
        self.pano_encoder = PreNormEncoder(cfg, cfg.num_pano_layers,
                                           final_norm=True)
        # local branch (vilmodel.py:528-560)
        self.vp_pos_linear = nn.Dense(cfg.hidden_size, dtype=dt)
        self.vp_pos_norm = LayerNorm12()
        self.local_encoder = CrossmodalEncoder(cfg)
        # global branch (vilmodel.py:923-1006)
        self.gmap_pos_linear = nn.Dense(cfg.hidden_size, dtype=dt)
        self.gmap_pos_norm = LayerNorm12()
        self.gmap_step_embeddings = nn.Embed(
            cfg.max_action_steps, cfg.hidden_size, dtype=dt)
        self.global_encoder = CrossmodalEncoder(cfg)
        if cfg.graph_sprels:
            self.sprel_linear = nn.Dense(1, dtype=dt)
        # heads
        self.global_sap_head = ClsPrediction(cfg)
        self.local_sap_head = ClsPrediction(cfg)
        if cfg.glocal_fuse:
            self.sap_fuse_linear = ClsPrediction(cfg,
                                                 input_size=2 * cfg.hidden_size)
        if cfg.obj_feat_size > 0:
            self.og_head = ClsPrediction(cfg)
            if cfg.obj_feat_size != cfg.image_feat_size:
                self.obj_linear = nn.Dense(cfg.hidden_size, dtype=dt)
                self.obj_layer_norm = LayerNorm12()
        if cfg.imagine_enc_pano:
            if cfg.bypass_imag_encoder:
                self.imagine_embeddings = BypassImagineEmbeddings(cfg)
            else:
                # the DUET reference ships only the bypass embeddings
                # (vilmodel.py:562 — no ImagineEmbeddings counterpart);
                # fail loudly instead of AttributeError at first apply
                raise ValueError(
                    "DuetModel supports bypass_imag_encoder=True only "
                    "(the non-bypass pano imagination encoder exists in "
                    "the HAMT stack alone)")
            if cfg.use_cosine_aux_loss or cfg.no_loss_test:
                self.image_proj = MLPProjectionHead(cfg)
            if cfg.e2e_imagination != "off":
                self.imagine_vit = make_imagine_vit(cfg)
        self.drop_env = nn.Dropout(self.feat_dropout)

    # ------------------------------------------------------------------ modes
    def text(self, txt_ids, txt_mask, deterministic=True):
        cfg = self.config
        x = self.embeddings(txt_ids, deterministic=deterministic)
        ext = extend_neg_mask(txt_mask)
        for layer in self.lang_layers:
            x = layer(x, ext, deterministic=deterministic)
        if cfg.fix_lang_embedding or cfg.fix_local_branch or \
                not cfg.update_lang_bert:
            x = jax.lax.stop_gradient(x)
        return x

    def imagine(self, imagine_feats, deterministic=True):
        if self.config.e2e_imagination != "off":
            # raw images [B, I, Hp, Wp, 3] -> in-model ViT class tokens
            imagine_feats = extract_imagine_features(
                self.imagine_vit, imagine_feats, self.config, deterministic)
        imagine_feats = self.drop_env(imagine_feats,
                                      deterministic=deterministic)
        return self.imagine_embeddings(imagine_feats)

    def align_with_contrastive_loss(self, txt_embeds, txt_mask, imagine_embeds,
                                    imagine_mask, np_weights,
                                    deterministic=True):
        """Identical math to the HAMT version (see models/hamt.py), with the
        DUET option of detaching the text stream (vilmodel.py:1249-1255)."""
        from vln_imagine_tpu.models.hamt import contrastive_alignment_loss

        if self.config.fix_lang_inside_cosine_model:
            txt_embeds = jax.lax.stop_gradient(txt_embeds)
        proj = self.image_proj(imagine_embeds, deterministic=deterministic)
        mean_np = jnp.einsum("bil,blh->bih",
                             np_weights.astype(txt_embeds.dtype), txt_embeds)
        valid = imagine_mask & (jnp.sum(np_weights, axis=-1) > 0)
        loss = contrastive_alignment_loss(
            proj, mean_np, valid, self.config.aux_loss_type,
            self.config.infonce_temperature,
            self.config.contrastive_margin_value)
        new_imagine = jnp.where(valid[:, :, None], proj, imagine_embeds)
        return loss, new_imagine

    def panorama_per_step(self, view_img_fts, loc_fts, nav_types, valid,
                          deterministic=True):
        """[B, T_pano, Df] view features (+[B, T_pano, A+3] loc feats) ->
        pano token embeddings (vilmodel.py:1087-1131)."""
        cfg = self.config
        view_img_fts = self.drop_env(view_img_fts, deterministic=deterministic)
        x = self.img_layer_norm(self.img_linear(view_img_fts))
        x = (x + self.loc_layer_norm(self.loc_linear(loc_fts))
             + self.nav_type_embedding(nav_types)
             + self.embeddings.token_type_embedding(
                 jnp.ones((1, 1), jnp.int32)))
        x = self.img_final_norm(x)
        x = self.img_dropout(x, deterministic=deterministic)
        x = self.pano_encoder(x, key_padding_mask=valid,
                              deterministic=deterministic)
        if cfg.fix_pano_embedding or cfg.fix_local_branch:
            x = jax.lax.stop_gradient(x)
        return x

    def navigation_per_step(
        self, txt_embeds, txt_mask,
        gmap_img_embeds, gmap_step_ids, gmap_pos_fts, gmap_valid,
        gmap_pair_dists, gmap_visited,
        vp_img_embeds, vp_pos_fts, vp_valid, vp_nav_valid,
        cand_to_gmap,       # [B, G+1, T_pano+1] bool: gmap slot g matches vp slot j
        imagine_embeds=None, imagine_mask=None, vp_obj_valid=None,
        deterministic=True,
    ) -> NavOut:
        cfg = self.config

        # ---- global branch inputs (vilmodel.py:1141-1149)
        gmap_embeds = (gmap_img_embeds
                       + self.gmap_step_embeddings(gmap_step_ids)
                       + self.gmap_pos_norm(self.gmap_pos_linear(gmap_pos_fts)))
        graph_sprels = None
        if cfg.graph_sprels:
            graph_sprels = self.sprel_linear(
                gmap_pair_dists[..., None].astype(_dtype(cfg)))[..., 0][:, None]

        # ---- local branch inputs (vilmodel.py:1152)
        vp_embeds = vp_img_embeds + self.vp_pos_norm(
            self.vp_pos_linear(vp_pos_fts))

        # ---- cross-modal context: [txt; imagine] (vilmodel.py:1154-1166)
        if cfg.imagine_enc_pano and cfg.concat_imagine_with == "language":
            ctx = jnp.concatenate([txt_embeds, imagine_embeds], axis=1)
            ctx_mask = jnp.concatenate([txt_mask, imagine_mask], axis=1)
        else:
            ctx, ctx_mask = txt_embeds, txt_mask

        gmap_embeds = self.global_encoder(ctx, ctx_mask, gmap_embeds,
                                          gmap_valid, graph_sprels,
                                          deterministic)
        vp_embeds = self.local_encoder(ctx, ctx_mask, vp_embeds, vp_valid,
                                       None, deterministic)

        # ---- fusion weights (vilmodel.py:1182-1197).  The reference derives
        # glocal_fuse from fusion=='dynamic' (vlnbert_init.py:59-70): only
        # the dynamic mode uses the learned sigmoid; 'avg'/'local'/'global'
        # weigh both branches 0.5 regardless of the glocal_fuse default.
        if cfg.glocal_fuse and cfg.fusion == "dynamic":
            fuse = jax.nn.sigmoid(self.sap_fuse_linear(
                jnp.concatenate([gmap_embeds[:, 0], vp_embeds[:, 0]], -1)))
        else:
            fuse = jnp.full((gmap_embeds.shape[0], 1), 0.5,
                            gmap_embeds.dtype)

        global_logits = self.global_sap_head(gmap_embeds)[..., 0] * fuse
        global_logits = mask_logits(global_logits, ~gmap_visited & gmap_valid)
        local_logits = self.local_sap_head(vp_embeds)[..., 0] * (1 - fuse)
        local_logits = mask_logits(local_logits, vp_nav_valid)

        fused = fused_logit_merge(global_logits, local_logits, gmap_visited,
                                  gmap_valid, vp_nav_valid, cand_to_gmap)

        # object grounding logits (REVERIE/SOON; vilmodel.py:1221-1225)
        obj_logits = None
        if cfg.obj_feat_size > 0 and vp_obj_valid is not None:
            obj_logits = self.og_head(vp_embeds)[..., 0]
            obj_logits = mask_logits(obj_logits, vp_obj_valid)

        return NavOut(global_logits=global_logits, local_logits=local_logits,
                      fused_logits=fused, gmap_embeds=gmap_embeds,
                      vp_embeds=vp_embeds, obj_logits=obj_logits)


def fused_logit_merge(global_logits, local_logits, gmap_visited, gmap_valid,
                      vp_nav_valid, cand_to_gmap):
    """Graph-aware fusion of local candidate logits into global node logits —
    array form of the python loop at vilmodel.py:1200-1217.

    cand_to_gmap[b, g, j]: True when gmap slot g (g>0) is the same viewpoint
    as local vp token j (j>0; j=0 is stop).  A local candidate that maps to a
    *visited* gmap node contributes to the shared backtrack logit bw; each
    unvisited gmap node adds its matching candidate's logit, or bw if no
    candidate reaches it directly."""
    fused = global_logits
    fused = fused.at[:, 0].add(local_logits[:, 0])

    j_valid = vp_nav_valid.at[:, 0].set(False)       # candidate tokens only
    local_val = jnp.where(j_valid, local_logits, 0.0)

    # candidate j maps to a visited gmap node?
    cand_hits_visited = jnp.einsum(
        "bgj,bg->bj", cand_to_gmap.astype(jnp.float32),
        (gmap_visited & gmap_valid).astype(jnp.float32)) > 0
    bw = jnp.sum(jnp.where(cand_hits_visited & j_valid, local_val, 0.0),
                 axis=1)

    cand_unvisited = j_valid & ~cand_hits_visited
    contrib = jnp.einsum("bgj,bj->bg", cand_to_gmap.astype(jnp.float32),
                         jnp.where(cand_unvisited, local_val, 0.0))
    has_match = jnp.einsum("bgj,bj->bg", cand_to_gmap.astype(jnp.float32),
                           cand_unvisited.astype(jnp.float32)) > 0

    g_unvisited = gmap_valid & ~gmap_visited
    g_unvisited = g_unvisited.at[:, 0].set(False)
    add = jnp.where(has_match, contrib, bw[:, None]) * g_unvisited
    return fused + add.astype(fused.dtype)
