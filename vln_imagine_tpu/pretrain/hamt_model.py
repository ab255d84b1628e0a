"""HAMT pre-training model: backbone + 6 proxy-task heads.

Rebuild of NavPreTrainedModel + MultiStepNavCMTPreTraining
(VLN-HAMT/pretrain_src/model/vilmodel.py:578-724, pretrain_cmt.py:13-262).
The backbone reuses the same flax submodules (and param names) as the
fine-tune HamtModel, so pre-trained weights initialise fine-tuning by
subtree copy — replacing the reference's checkpoint-key remapping
(finetune_src/models/vlnbert_init.py:20-31).

Tasks: mlm (masked LM, tied decoder weights), sap (single-step action
prediction), sar (action heading/elevation/progress regression), sprel
(relative heading/elevation regression between views), mrc (masked region
classification against ViT class probs, KL), itm (instruction-trajectory
matching with in-batch + shuffled-order negatives).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from vln_imagine_tpu.config import ModelConfig
from vln_imagine_tpu.models.bert import (
    BertEmbeddings,
    BertLayer,
    LayerNorm12,
    LXRTXLayer,
    NextActionPrediction,
    _dtype,
    gelu_erf,
)
from vln_imagine_tpu.models.hamt import HistoryEmbeddings, ImageEmbeddings
from vln_imagine_tpu.ops.masks import extend_neg_mask, mask_logits


class MLMHead(nn.Module):
    """BertLMPredictionHead: transform + tied decoder + bias
    (vilmodel_cmt.py:274-290)."""

    config: ModelConfig

    @nn.compact
    def __call__(self, hidden, word_embedding: jnp.ndarray):
        cfg = self.config
        x = nn.Dense(cfg.hidden_size, dtype=_dtype(cfg), name="dense")(hidden)
        x = gelu_erf(x)
        x = LayerNorm12(name="LayerNorm")(x)
        bias = self.param("bias", nn.initializers.zeros, (cfg.vocab_size,))
        # decoder weights tied to the word embedding (pretrain_cmt.py:96-99)
        logits = jnp.einsum("...h,vh->...v", x,
                            word_embedding.astype(x.dtype))
        return logits + bias


class MLPHead(nn.Module):
    """Linear -> ReLU -> LN -> [dropout] -> Linear(out_dim)
    (pretrain_cmt.py:13-71 family)."""

    config: ModelConfig
    out_dim: int
    dropout: bool = True

    @nn.compact
    def __call__(self, x, deterministic=True):
        cfg = self.config
        x = nn.Dense(cfg.hidden_size, dtype=_dtype(cfg), name="dense0")(x)
        x = jax.nn.relu(x)
        x = LayerNorm12(name="LayerNorm")(x)
        if self.dropout:
            x = nn.Dropout(cfg.pred_head_dropout_prob,
                           deterministic=deterministic)(x)
        return nn.Dense(self.out_dim, dtype=_dtype(cfg), name="dense1")(x)


class HamtPretrainModel(nn.Module):
    config: ModelConfig
    image_prob_size: int = 1000  # ViT class-probability dim (config/r2r_model_config.json)
    tasks: tuple = ("mlm", "sap", "sar", "sprel", "mrc", "itm")

    def setup(self):
        cfg = self.config
        self.embeddings = BertEmbeddings(cfg)
        self.img_embeddings = ImageEmbeddings(cfg)
        self.hist_embeddings = HistoryEmbeddings(cfg)
        self.lang_layers = [BertLayer(cfg, name=f"lang_layer_{i}")
                            for i in range(cfg.num_l_layers)]
        self.x_layers = [LXRTXLayer(cfg, name=f"x_layer_{i}")
                         for i in range(cfg.num_x_layers)]
        if "mlm" in self.tasks:
            self.mlm_head = MLMHead(cfg)
        if "sap" in self.tasks:
            self.next_action = NextActionPrediction(cfg)
        if "sar" in self.tasks:
            self.regress_action = MLPHead(cfg, 3)
        if "sprel" in self.tasks:
            self.sprel_head = MLPHead(cfg, 2)
        if "mrc" in self.tasks:
            self.image_classifier = MLPHead(cfg, self.image_prob_size,
                                            dropout=False)
        if "itm" in self.tasks:
            self.itm_head = MLPHead(cfg, 1, dropout=False)

    # ----------------------------------------------------------- backbone
    def _text(self, txt_ids, deterministic):
        return self.embeddings(txt_ids, deterministic=deterministic)

    def _history_tokens(self, hist_img_fts, hist_ang_fts, hist_pano_img_fts,
                        hist_pano_ang_fts, deterministic, pos_ids=None):
        """[CLS-global] + per-step history tokens, [B, T+1, H]
        (pretrain vilmodel.py:520-575)."""
        B, T = hist_img_fts.shape[:2]
        cls = self.hist_embeddings.initial(B, deterministic)

        def flat(x):
            return x.reshape((B * T,) + x.shape[2:])

        if pos_ids is None:
            step_ids = jnp.tile(jnp.arange(T, dtype=jnp.int32), B)
        else:
            step_ids = pos_ids.reshape(B * T)
        toks = self.hist_embeddings(
            flat(hist_img_fts), flat(hist_ang_fts), step_ids,
            flat(hist_pano_img_fts), flat(hist_pano_ang_fts), deterministic)
        toks = toks.reshape(B, T, -1)
        return jnp.concatenate([cls[:, None, :], toks], axis=1)

    def backbone(self, txt_ids, txt_masks,
                 hist_img_fts, hist_ang_fts, hist_pano_img_fts,
                 hist_pano_ang_fts, hist_masks,
                 ob_img_fts=None, ob_ang_fts=None, ob_nav_types=None,
                 ob_masks=None, deterministic=True):
        """NavPreTrainedModel.forward (pretrain vilmodel.py:591-638)."""
        cfg = self.config
        ext_txt = extend_neg_mask(txt_masks)
        txt = self._text(txt_ids, deterministic)
        for layer in self.lang_layers:
            txt = layer(txt, ext_txt, deterministic=deterministic)

        hist = self._history_tokens(hist_img_fts, hist_ang_fts,
                                    hist_pano_img_fts, hist_pano_ang_fts,
                                    deterministic)
        ext_hist = extend_neg_mask(hist_masks)

        ob = None
        ext_ob = None
        if ob_img_fts is not None:
            B, T_obs = ob_nav_types.shape
            type_emb = self.embeddings.token_type_embedding(
                jnp.ones((B, 1), jnp.int32))
            ob = self.img_embeddings(ob_img_fts, ob_ang_fts, type_emb,
                                     ob_nav_types, deterministic)
            ext_ob = extend_neg_mask(ob_masks)

        hist_len = hist.shape[1]
        if ob is None:
            visn, visn_mask = hist, ext_hist
        else:
            visn = jnp.concatenate([hist, ob], axis=1)
            visn_mask = jnp.concatenate([ext_hist, ext_ob], axis=-1)
        for layer in self.x_layers:
            txt, visn = layer(txt, ext_txt, visn, visn_mask,
                              deterministic=deterministic)
        hist_out = visn[:, :hist_len]
        ob_out = visn[:, hist_len:] if ob is not None else None
        return txt, hist_out, ob_out

    # -------------------------------------------------------------- tasks
    def forward_mlm(self, txt_ids, txt_masks, hist_img_fts, hist_ang_fts,
                    hist_pano_img_fts, hist_pano_ang_fts, hist_masks,
                    txt_labels, deterministic=True):
        """Per-token CE on masked positions (pretrain_cmt.py:142-159);
        labels -1 = unmasked. Returns (loss_sum, n_predictions, n_correct)."""
        txt, _, _ = self.backbone(
            txt_ids, txt_masks, hist_img_fts, hist_ang_fts,
            hist_pano_img_fts, hist_pano_ang_fts, hist_masks,
            deterministic=deterministic)
        word_emb = self.embeddings.word_embeddings.embedding
        logits = self.mlm_head(txt, word_emb)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
        is_masked = txt_labels >= 0
        tgt = jnp.clip(txt_labels, 0, logits.shape[-1] - 1)
        ce = -jnp.take_along_axis(logp, tgt[..., None], -1)[..., 0]
        n = jnp.sum(is_masked)
        correct = jnp.sum((jnp.argmax(logits, -1) == tgt) & is_masked)
        return jnp.sum(ce * is_masked), n, correct

    def forward_sap(self, txt_ids, txt_masks, hist_img_fts, hist_ang_fts,
                    hist_pano_img_fts, hist_pano_ang_fts, hist_masks,
                    ob_img_fts, ob_ang_fts, ob_nav_types, ob_masks,
                    act_labels, deterministic=True):
        """CE over observation tokens (pretrain_cmt.py:167-183)."""
        txt, _, ob = self.backbone(
            txt_ids, txt_masks, hist_img_fts, hist_ang_fts,
            hist_pano_img_fts, hist_pano_ang_fts, hist_masks,
            ob_img_fts, ob_ang_fts, ob_nav_types, ob_masks,
            deterministic=deterministic)
        logits = self.next_action(ob * txt[:, :1],
                                  deterministic=deterministic)[..., 0]
        logits = mask_logits(logits, (ob_nav_types != 0) & ob_masks)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
        ce = -jnp.take_along_axis(logp, act_labels[:, None], 1)[:, 0]
        correct = jnp.sum(jnp.argmax(logits, -1) == act_labels)
        return jnp.sum(ce), act_labels.shape[0], correct

    def forward_sar(self, txt_ids, txt_masks, hist_img_fts, hist_ang_fts,
                    hist_pano_img_fts, hist_pano_ang_fts, hist_masks,
                    ob_img_fts, ob_ang_fts, ob_nav_types, ob_masks,
                    ob_act_angles, ob_progress, deterministic=True):
        """MSE on (heading, elevation, progress) from txt[CLS]
        (pretrain_cmt.py:185-200)."""
        txt, _, _ = self.backbone(
            txt_ids, txt_masks, hist_img_fts, hist_ang_fts,
            hist_pano_img_fts, hist_pano_ang_fts, hist_masks,
            ob_img_fts, ob_ang_fts, ob_nav_types, ob_masks,
            deterministic=deterministic)
        pred = self.regress_action(txt[:, 0], deterministic=deterministic)
        target = jnp.concatenate([ob_act_angles, ob_progress[:, None]], -1)
        err = (pred.astype(jnp.float32) - target) ** 2
        return jnp.sum(err), err.size, jnp.sum(err)

    def forward_sprel(self, txt_ids, txt_masks, hist_img_fts, hist_ang_fts,
                      hist_pano_img_fts, hist_pano_ang_fts, hist_masks,
                      ob_img_fts, ob_ang_fts, ob_nav_types, ob_masks,
                      sp_anchor_idxs, sp_targets, deterministic=True):
        """MSE on relative (heading, elevation) of every view vs an anchor
        view (pretrain_cmt.py:202-222)."""
        txt, _, ob = self.backbone(
            txt_ids, txt_masks, hist_img_fts, hist_ang_fts,
            hist_pano_img_fts, hist_pano_ang_fts, hist_masks,
            ob_img_fts, ob_ang_fts, ob_nav_types, ob_masks,
            deterministic=deterministic)
        anchor = jnp.take_along_axis(
            ob, sp_anchor_idxs[:, None, None].repeat(ob.shape[-1], -1), 1)
        V = sp_targets.shape[1]
        cat = jnp.concatenate(
            [jnp.broadcast_to(anchor, ob[:, :V].shape), ob[:, :V]], -1)
        pred = self.sprel_head(cat, deterministic=deterministic)
        err = (pred.astype(jnp.float32) - sp_targets) ** 2
        return jnp.sum(err), err.size, jnp.sum(err)

    def forward_mrc(self, txt_ids, txt_masks, hist_img_fts, hist_ang_fts,
                    hist_pano_img_fts, hist_pano_ang_fts, hist_masks,
                    hist_mrc_masks, hist_img_probs, deterministic=True):
        """KL(predicted region distribution || ViT probs) on masked history
        steps (pretrain_cmt.py:224-243)."""
        _, hist, _ = self.backbone(
            txt_ids, txt_masks, hist_img_fts, hist_ang_fts,
            hist_pano_img_fts, hist_pano_ang_fts, hist_masks,
            deterministic=deterministic)
        steps = hist[:, 1:]  # drop the global token
        pred = self.image_classifier(steps, deterministic=deterministic)
        logp = jax.nn.log_softmax(pred.astype(jnp.float32), -1)
        p = hist_img_probs
        kl = jnp.sum(p * (jnp.log(jnp.clip(p, 1e-12)) - logp), -1)
        n = jnp.sum(hist_mrc_masks)
        # accuracy proxy: argmax agreement on masked steps
        correct = jnp.sum((jnp.argmax(pred, -1) == jnp.argmax(p, -1))
                          & hist_mrc_masks)
        return jnp.sum(kl * hist_mrc_masks), n, correct

    def forward_itm(self, txt_ids, txt_masks, hist_img_fts, hist_ang_fts,
                    hist_pano_img_fts, hist_pano_ang_fts, hist_masks,
                    neg_idxs, shuffled_pos_ids, deterministic=True):
        """Instruction-trajectory matching (pretrain vilmodel.py:640-724,
        pretrain_cmt.py:245-262): positive + in-batch negatives (neg_idxs
        [B, K1]) + order-shuffled negatives (shuffled_pos_ids [K2, B, T]);
        CE with the positive at index 0."""
        cfg = self.config
        ext_txt = extend_neg_mask(txt_masks)
        txt = self._text(txt_ids, deterministic)
        for layer in self.lang_layers:
            txt = layer(txt, ext_txt, deterministic=deterministic)

        def hist_tokens(pos_ids=None):
            return self._history_tokens(
                hist_img_fts, hist_ang_fts, hist_pano_img_fts,
                hist_pano_ang_fts, deterministic, pos_ids=pos_ids)

        pos_hist = hist_tokens()
        cands = [pos_hist]
        cand_masks = [hist_masks]
        K1 = neg_idxs.shape[1]
        for k in range(K1):
            cands.append(pos_hist[neg_idxs[:, k]])
            cand_masks.append(hist_masks[neg_idxs[:, k]])
        K2 = shuffled_pos_ids.shape[0]
        for k in range(K2):
            cands.append(hist_tokens(pos_ids=shuffled_pos_ids[k]))
            cand_masks.append(hist_masks)

        n_cand = len(cands)
        B = txt_ids.shape[0]
        visn = jnp.concatenate(cands, axis=0)
        visn_mask = extend_neg_mask(jnp.concatenate(cand_masks, axis=0))
        txt_rep = jnp.tile(txt, (n_cand, 1, 1))
        txt_mask_rep = jnp.tile(ext_txt, (n_cand, 1, 1, 1))
        for layer in self.x_layers:
            txt_rep, visn = layer(txt_rep, txt_mask_rep, visn, visn_mask,
                                  deterministic=deterministic)
        fused = txt_rep[:, 0] * visn[:, 0]
        scores = self.itm_head(fused, deterministic=deterministic)[..., 0]
        scores = scores.reshape(n_cand, B).T  # [B, 1+negs], positive first
        logp = jax.nn.log_softmax(scores.astype(jnp.float32), -1)
        ce = -logp[:, 0]
        correct = jnp.sum(jnp.argmax(scores, -1) == 0)
        return jnp.sum(ce), B, correct
