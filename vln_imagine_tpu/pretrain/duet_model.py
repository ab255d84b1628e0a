"""DUET pre-training model: path-trajectory backbone + MLM/MRC/SAP heads.

Rebuild of GlocalTextPathCMT + GlocalTextPathCMTPreTraining
(VLN-DUET/pretrain_src/model/vilmodel.py:648-747, pretrain_cmt.py:38-365).
Param names match vln_imagine_tpu.models.duet.DuetModel so pre-trained
weights initialise fine-tuning by subtree copy.

The reference aggregates topo-map node features from the stored trajectory
with per-item python dicts (vilmodel.py:938-972); here the data pipeline
precomputes a row-normalised aggregation matrix Agg[B, G, T*Tp] (visited node
-> its own last-visit pano tokens averaged; unvisited -> mean over candidate
occurrences) and the model reduces it with one matmul.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from vln_imagine_tpu.config import ModelConfig
from vln_imagine_tpu.models.bert import (
    BertEmbeddings,
    BertLayer,
    ClsPrediction,
    LayerNorm12,
    PreNormEncoder,
    _dtype,
)
from vln_imagine_tpu.models.duet import CrossmodalEncoder, fused_logit_merge
from vln_imagine_tpu.ops.masks import extend_neg_mask, mask_logits
from vln_imagine_tpu.pretrain.hamt_model import MLMHead, MLPHead


class DuetPretrainModel(nn.Module):
    config: ModelConfig
    image_prob_size: int = 1000
    tasks: tuple = ("mlm", "mrc", "sap")

    def setup(self):
        cfg = self.config
        dt = _dtype(cfg)
        self.embeddings = BertEmbeddings(cfg)
        self.lang_layers = [BertLayer(cfg, name=f"lang_layer_{i}")
                            for i in range(cfg.num_l_layers)]
        self.img_linear = nn.Dense(cfg.hidden_size, dtype=dt)
        self.img_layer_norm = LayerNorm12()
        self.loc_linear = nn.Dense(cfg.hidden_size, dtype=dt)
        self.loc_layer_norm = LayerNorm12()
        self.nav_type_embedding = nn.Embed(3, cfg.hidden_size, dtype=dt)
        self.img_final_norm = LayerNorm12()
        self.img_dropout = nn.Dropout(cfg.hidden_dropout_prob)
        self.pano_encoder = PreNormEncoder(cfg, cfg.num_pano_layers,
                                           final_norm=True)
        self.vp_pos_linear = nn.Dense(cfg.hidden_size, dtype=dt)
        self.vp_pos_norm = LayerNorm12()
        self.local_encoder = CrossmodalEncoder(cfg)
        self.gmap_pos_linear = nn.Dense(cfg.hidden_size, dtype=dt)
        self.gmap_pos_norm = LayerNorm12()
        self.gmap_step_embeddings = nn.Embed(
            cfg.max_action_steps, cfg.hidden_size, dtype=dt)
        self.global_encoder = CrossmodalEncoder(cfg)
        if cfg.graph_sprels:
            self.sprel_linear = nn.Dense(1, dtype=dt)
        if "mlm" in self.tasks:
            self.mlm_head = MLMHead(cfg)
        if "mrc" in self.tasks:
            self.image_classifier = MLPHead(cfg, self.image_prob_size,
                                            dropout=False)
        if "sap" in self.tasks:
            self.global_sap_head = ClsPrediction(cfg)
            self.local_sap_head = ClsPrediction(cfg)
            if cfg.glocal_fuse:
                self.sap_fuse_linear = ClsPrediction(
                    cfg, input_size=2 * cfg.hidden_size)
        if "og" in self.tasks:
            self.og_head = ClsPrediction(cfg)

    # ----------------------------------------------------------- backbone
    def _text(self, txt_ids, txt_masks, deterministic):
        x = self.embeddings(txt_ids, deterministic=deterministic)
        ext = extend_neg_mask(txt_masks)
        for layer in self.lang_layers:
            x = layer(x, ext, deterministic=deterministic)
        return x

    def _traj_pano(self, traj_img, traj_loc, traj_nav, traj_valid,
                   deterministic):
        """Per-step pano token embeddings for the whole trajectory
        (ImageEmbeddings.forward, vilmodel.py:484-526). [B, T, Tp, *]."""
        B, T, Tp = traj_nav.shape
        flat = lambda x: x.reshape((B * T,) + x.shape[2:])  # noqa: E731
        x = self.img_layer_norm(self.img_linear(flat(traj_img)))
        x = (x + self.loc_layer_norm(self.loc_linear(flat(traj_loc)))
             + self.nav_type_embedding(flat(traj_nav))
             + self.embeddings.token_type_embedding(
                 jnp.ones((1, 1), jnp.int32)))
        x = self.img_final_norm(x)
        x = self.img_dropout(x, deterministic=deterministic)
        x = self.pano_encoder(x, key_padding_mask=flat(traj_valid),
                              deterministic=deterministic)
        return x.reshape(B, T, Tp, -1)

    def _gmap_inputs(self, traj_embeds, agg, gmap_step_ids, gmap_pos_fts):
        """[stop] + aggregated node embeddings + step/pos embeddings
        (GlobalMapEncoder.gmap_input_embedding, vilmodel.py:974-985)."""
        B, T, Tp, H = traj_embeds.shape
        flat = traj_embeds.reshape(B, T * Tp, H)
        gmap_nodes = jnp.einsum("bgt,bth->bgh", agg.astype(flat.dtype), flat)
        gmap_img = jnp.concatenate(
            [jnp.zeros((B, 1, H), flat.dtype), gmap_nodes], axis=1)
        return (gmap_img + self.gmap_step_embeddings(gmap_step_ids)
                + self.gmap_pos_norm(self.gmap_pos_linear(gmap_pos_fts)))

    def _vp_inputs(self, traj_embeds, vp_pos_fts):
        """[stop] + last-step pano tokens + vp pos embedding
        (LocalVPEncoder.vp_input_embedding, vilmodel.py:537-551)."""
        B, T, Tp, H = traj_embeds.shape
        last = traj_embeds[:, -1]
        vp_img = jnp.concatenate([jnp.zeros((B, 1, H), last.dtype), last], 1)
        return vp_img + self.vp_pos_norm(self.vp_pos_linear(vp_pos_fts))

    def _sprel(self, gmap_pair_dists):
        if not self.config.graph_sprels:
            return None
        return self.sprel_linear(
            gmap_pair_dists[..., None].astype(_dtype(self.config)))[..., 0][:, None]

    # -------------------------------------------------------------- tasks
    def forward_mlm(self, txt_ids, txt_masks, txt_labels,
                    traj_img, traj_loc, traj_nav, traj_valid, agg,
                    gmap_step_ids, gmap_pos_fts, gmap_valid,
                    vp_pos_fts, vp_valid, deterministic=True):
        """Language queries both branches via lang2visn; summed text streams
        feed the MLM head (pretrain vilmodel.py:700-747)."""
        txt = self._text(txt_ids, txt_masks, deterministic)
        ext_txt = extend_neg_mask(txt_masks)
        traj = self._traj_pano(traj_img, traj_loc, traj_nav, traj_valid,
                               deterministic)
        gmap_in = self._gmap_inputs(traj, agg, gmap_step_ids, gmap_pos_fts)
        vp_in = self._vp_inputs(traj, vp_pos_fts)

        del ext_txt
        gmap_txt = self.global_encoder.lang2visn_stack(
            txt, txt_masks, gmap_in, gmap_valid, deterministic)
        vp_txt = self.local_encoder.lang2visn_stack(
            txt, txt_masks, vp_in, vp_valid, deterministic)
        out = gmap_txt + vp_txt
        word_emb = self.embeddings.word_embeddings.embedding
        logits = self.mlm_head(out, word_emb)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
        is_masked = txt_labels >= 0
        tgt = jnp.clip(txt_labels, 0, logits.shape[-1] - 1)
        ce = -jnp.take_along_axis(logp, tgt[..., None], -1)[..., 0]
        n = jnp.sum(is_masked)
        correct = jnp.sum((jnp.argmax(logits, -1) == tgt) & is_masked)
        return jnp.sum(ce * is_masked), n, correct

    def _encode_both(self, txt_masks, txt, traj, agg, gmap_step_ids,
                     gmap_pos_fts, gmap_valid, gmap_pair_dists, vp_pos_fts,
                     vp_valid, deterministic):
        gmap_in = self._gmap_inputs(traj, agg, gmap_step_ids, gmap_pos_fts)
        vp_in = self._vp_inputs(traj, vp_pos_fts)
        gmap_embeds = self.global_encoder(
            txt, txt_masks, gmap_in, gmap_valid,
            self._sprel(gmap_pair_dists), deterministic)
        vp_embeds = self.local_encoder(txt, txt_masks, vp_in, vp_valid, None,
                                       deterministic)
        return gmap_embeds, vp_embeds

    def forward_mrc(self, txt_ids, txt_masks,
                    traj_img, traj_loc, traj_nav, traj_valid, agg,
                    gmap_step_ids, gmap_pos_fts, gmap_valid, gmap_pair_dists,
                    vp_pos_fts, vp_valid,
                    vp_view_mrc_masks, vp_view_probs, deterministic=True):
        """KL on masked last-step view tokens (pretrain_cmt.py:159-268);
        features of masked views are zeroed by the data pipeline."""
        txt = self._text(txt_ids, txt_masks, deterministic)
        traj = self._traj_pano(traj_img, traj_loc, traj_nav, traj_valid,
                               deterministic)
        _, vp_embeds = self._encode_both(
            txt_masks, txt, traj, agg, gmap_step_ids, gmap_pos_fts,
            gmap_valid, gmap_pair_dists, vp_pos_fts, vp_valid, deterministic)
        view_embeds = vp_embeds[:, 1:]  # drop stop token
        pred = self.image_classifier(view_embeds, deterministic=deterministic)
        logp = jax.nn.log_softmax(pred.astype(jnp.float32), -1)
        p = vp_view_probs
        kl = jnp.sum(p * (jnp.log(jnp.clip(p, 1e-12)) - logp), -1)
        n = jnp.sum(vp_view_mrc_masks)
        correct = jnp.sum((jnp.argmax(pred, -1) == jnp.argmax(p, -1))
                          & vp_view_mrc_masks)
        return jnp.sum(kl * vp_view_mrc_masks), n, correct

    def forward_sap(self, txt_ids, txt_masks,
                    traj_img, traj_loc, traj_nav, traj_valid, agg,
                    gmap_step_ids, gmap_pos_fts, gmap_valid, gmap_pair_dists,
                    gmap_visited, vp_pos_fts, vp_valid, vp_nav_valid,
                    cand_to_gmap, global_act_labels, local_act_labels,
                    deterministic=True):
        """global + local + fused CE (pretrain_cmt.py:212-286)."""
        cfg = self.config
        txt = self._text(txt_ids, txt_masks, deterministic)
        traj = self._traj_pano(traj_img, traj_loc, traj_nav, traj_valid,
                               deterministic)
        gmap_embeds, vp_embeds = self._encode_both(
            txt_masks, txt, traj, agg, gmap_step_ids, gmap_pos_fts,
            gmap_valid, gmap_pair_dists, vp_pos_fts, vp_valid, deterministic)

        if cfg.glocal_fuse:
            fuse = jax.nn.sigmoid(self.sap_fuse_linear(
                jnp.concatenate([gmap_embeds[:, 0], vp_embeds[:, 0]], -1)))
        else:
            fuse = jnp.full((txt.shape[0], 1), 0.5, txt.dtype)
        global_logits = self.global_sap_head(gmap_embeds)[..., 0] * fuse
        global_logits = mask_logits(global_logits, ~gmap_visited & gmap_valid)
        local_logits = self.local_sap_head(vp_embeds)[..., 0] * (1 - fuse)
        local_logits = mask_logits(local_logits, vp_nav_valid)
        fused = fused_logit_merge(global_logits, local_logits, gmap_visited,
                                  gmap_valid, vp_nav_valid, cand_to_gmap)

        def ce(logits, labels):
            logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
            return -jnp.take_along_axis(logp, labels[:, None], 1)[:, 0]

        losses = (ce(global_logits, global_act_labels)
                  + ce(local_logits, local_act_labels)
                  + ce(fused, global_act_labels))
        B = txt_ids.shape[0]
        correct = jnp.sum(jnp.argmax(fused, -1) == global_act_labels)
        return jnp.sum(losses), B, correct

    def forward_og(self, txt_ids, txt_masks,
                   traj_img, traj_loc, traj_nav, traj_valid, agg,
                   gmap_step_ids, gmap_pos_fts, gmap_valid, gmap_pair_dists,
                   vp_pos_fts, vp_valid, vp_obj_valid, obj_labels,
                   deterministic=True):
        """Object grounding CE on last-step object tokens
        (pretrain_cmt.py:288-320 forward_og); labels -100 = no visible gt."""
        import jax
        import jax.numpy as jnp
        from vln_imagine_tpu.ops.masks import mask_logits

        txt = self._text(txt_ids, txt_masks, deterministic)
        traj = self._traj_pano(traj_img, traj_loc, traj_nav, traj_valid,
                               deterministic)
        _, vp_embeds = self._encode_both(
            txt_masks, txt, traj, agg, gmap_step_ids, gmap_pos_fts,
            gmap_valid, gmap_pair_dists, vp_pos_fts, vp_valid, deterministic)
        logits = self.og_head(vp_embeds)[..., 0]
        logits = mask_logits(logits, vp_obj_valid)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
        has = obj_labels >= 0
        tgt = jnp.clip(obj_labels, 0, logits.shape[1] - 1)
        ce = -jnp.take_along_axis(logp, tgt[:, None], 1)[:, 0]
        n = jnp.sum(has)
        correct = jnp.sum((jnp.argmax(logits, -1) == tgt) & has)
        return jnp.sum(ce * has), n, correct
