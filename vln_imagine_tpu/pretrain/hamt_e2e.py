"""End-to-end image pre-training: ViT backbone inside the training step.

Rebuild of NavTHORImagePreTrainedModel
(VLN-HAMT/pretrain_src/model/image_vilmodel.py:22-209, driver
main_r2r_image.py): instead of precomputed HDF5 features, raw panorama /
observation images are embedded by an in-model ViT-B/16.  As in the
reference's `forward_vision_backbone` (:40-59), the *history panoramas*
(6-D tensors) run under stop-gradient (torch.no_grad + detach) while the
per-step history views and the current observation images keep gradients.
All six proxy tasks (mlm/mrc/sap/sar/sprel/itm) run with the ViT in the
loop, matching data/image_tasks.py:16-508.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from vln_imagine_tpu.config import ModelConfig
from vln_imagine_tpu.models.vit import ViTConfig, VisionTransformer
from vln_imagine_tpu.pretrain.hamt_model import HamtPretrainModel


class HamtE2EPretrainModel(nn.Module):
    config: ModelConfig
    vit_config: Optional[ViTConfig] = None
    image_prob_size: int = 1000
    tasks: tuple = ("mlm", "sap", "sar", "sprel", "mrc", "itm")

    def setup(self):
        self.vit = VisionTransformer(self.vit_config or ViTConfig())
        self.head_model = HamtPretrainModel(
            self.config, image_prob_size=self.image_prob_size,
            tasks=self.tasks)

    def _embed(self, images, deterministic, stop_grad: bool):
        """[..., H, W, 3] -> [..., D] class-token features."""
        lead = images.shape[:-3]
        flat = images.reshape((-1,) + images.shape[-3:])
        feats, _ = self.vit(flat, deterministic=deterministic)
        feats = feats.reshape(lead + (feats.shape[-1],))
        return jax.lax.stop_gradient(feats) if stop_grad else feats

    def forward_mlm(self, txt_ids, txt_masks, hist_images, hist_ang_fts,
                    hist_pano_images, hist_pano_ang_fts, hist_masks,
                    txt_labels, deterministic=True):
        hist_img_fts, hist_pano_fts, _ = self._hist_and_obs(
            hist_images, hist_pano_images, None, deterministic)
        return self.head_model.forward_mlm(
            txt_ids, txt_masks, hist_img_fts, hist_ang_fts, hist_pano_fts,
            hist_pano_ang_fts, hist_masks, txt_labels, deterministic)

    def _hist_and_obs(self, hist_images, hist_pano_images, ob_images,
                      deterministic):
        """Only the history PANORAMAS are frozen (image_vilmodel.py:40-59:
        the 6-D pano tensors run under torch.no_grad + detach); per-step
        history views and observation images fine-tune the ViT."""
        hist_img_fts = self._embed(hist_images, deterministic,
                                   stop_grad=False)
        hist_pano_fts = self._embed(hist_pano_images, deterministic,
                                    stop_grad=True)
        ob_img_fts = (None if ob_images is None else
                      self._embed(ob_images, deterministic, stop_grad=False))
        return hist_img_fts, hist_pano_fts, ob_img_fts

    def forward_sap(self, txt_ids, txt_masks, hist_images, hist_ang_fts,
                    hist_pano_images, hist_pano_ang_fts, hist_masks,
                    ob_images, ob_ang_fts, ob_nav_types, ob_masks,
                    act_labels, deterministic=True):
        hist_img_fts, hist_pano_fts, ob_img_fts = self._hist_and_obs(
            hist_images, hist_pano_images, ob_images, deterministic)
        return self.head_model.forward_sap(
            txt_ids, txt_masks, hist_img_fts, hist_ang_fts, hist_pano_fts,
            hist_pano_ang_fts, hist_masks, ob_img_fts, ob_ang_fts,
            ob_nav_types, ob_masks, act_labels, deterministic)

    def forward_sar(self, txt_ids, txt_masks, hist_images, hist_ang_fts,
                    hist_pano_images, hist_pano_ang_fts, hist_masks,
                    ob_images, ob_ang_fts, ob_nav_types, ob_masks,
                    ob_act_angles, ob_progress, deterministic=True):
        """Action heading/elevation/progress regression over raw images
        (SarImageDataset, image_tasks.py:253-351)."""
        hist_img_fts, hist_pano_fts, ob_img_fts = self._hist_and_obs(
            hist_images, hist_pano_images, ob_images, deterministic)
        return self.head_model.forward_sar(
            txt_ids, txt_masks, hist_img_fts, hist_ang_fts, hist_pano_fts,
            hist_pano_ang_fts, hist_masks, ob_img_fts, ob_ang_fts,
            ob_nav_types, ob_masks, ob_act_angles, ob_progress, deterministic)

    def forward_sprel(self, txt_ids, txt_masks, hist_images, hist_ang_fts,
                      hist_pano_images, hist_pano_ang_fts, hist_masks,
                      ob_images, ob_ang_fts, ob_nav_types, ob_masks,
                      sp_anchor_idxs, sp_targets, deterministic=True):
        """Relative heading/elevation regression between views
        (SprelImageDataset, image_tasks.py:353-451)."""
        hist_img_fts, hist_pano_fts, ob_img_fts = self._hist_and_obs(
            hist_images, hist_pano_images, ob_images, deterministic)
        return self.head_model.forward_sprel(
            txt_ids, txt_masks, hist_img_fts, hist_ang_fts, hist_pano_fts,
            hist_pano_ang_fts, hist_masks, ob_img_fts, ob_ang_fts,
            ob_nav_types, ob_masks, sp_anchor_idxs, sp_targets, deterministic)

    def forward_mrc(self, txt_ids, txt_masks, hist_images, hist_ang_fts,
                    hist_pano_images, hist_pano_ang_fts, hist_masks,
                    hist_mrc_masks, hist_img_probs, deterministic=True):
        """Masked region classification on raw images: masking is applied to
        the BACKBONE OUTPUT features, zero-filled (image_vilmodel.py:83-85),
        with soft ViT class-prob targets (MrcImageDataset,
        image_tasks.py:81-155)."""
        hist_img_fts, hist_pano_fts, _ = self._hist_and_obs(
            hist_images, hist_pano_images, None, deterministic)
        hist_img_fts = jnp.where(hist_mrc_masks[..., None], 0.0, hist_img_fts)
        hist_pano_fts = jnp.where(hist_mrc_masks[..., None, None], 0.0,
                                  hist_pano_fts)
        return self.head_model.forward_mrc(
            txt_ids, txt_masks, hist_img_fts, hist_ang_fts, hist_pano_fts,
            hist_pano_ang_fts, hist_masks, hist_mrc_masks, hist_img_probs,
            deterministic)

    def forward_itm(self, txt_ids, txt_masks, hist_images, hist_ang_fts,
                    hist_pano_images, hist_pano_ang_fts, hist_masks,
                    neg_idxs, shuffled_pos_ids, deterministic=True):
        """Instruction-trajectory matching with in-batch + shuffled-order
        negatives over raw images (ItmImageDataset, image_tasks.py:452-508,
        image_vilmodel.py:125-208)."""
        hist_img_fts, hist_pano_fts, _ = self._hist_and_obs(
            hist_images, hist_pano_images, None, deterministic)
        return self.head_model.forward_itm(
            txt_ids, txt_masks, hist_img_fts, hist_ang_fts, hist_pano_fts,
            hist_pano_ang_fts, hist_masks, neg_idxs, shuffled_pos_ids,
            deterministic)
