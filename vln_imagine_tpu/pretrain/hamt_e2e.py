"""End-to-end image pre-training: ViT backbone inside the training step.

Rebuild of NavTHORImagePreTrainedModel
(VLN-HAMT/pretrain_src/model/image_vilmodel.py:22-209, driver
main_r2r_image.py): instead of precomputed HDF5 features, raw panorama /
observation images are embedded by an in-model ViT-B/16.  As in the
reference's `forward_vision_backbone` (:40-59), the *history* panoramas run
under stop-gradient (no_grad) while the current step's observation images
keep gradients, so the ViT fine-tunes on the supervised step only.
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
        hist_img_fts = self._embed(hist_images, deterministic, stop_grad=True)
        hist_pano_fts = self._embed(hist_pano_images, deterministic,
                                    stop_grad=True)
        return self.head_model.forward_mlm(
            txt_ids, txt_masks, hist_img_fts, hist_ang_fts, hist_pano_fts,
            hist_pano_ang_fts, hist_masks, txt_labels, deterministic)

    def forward_sap(self, txt_ids, txt_masks, hist_images, hist_ang_fts,
                    hist_pano_images, hist_pano_ang_fts, hist_masks,
                    ob_images, ob_ang_fts, ob_nav_types, ob_masks,
                    act_labels, deterministic=True):
        # history frozen, current observation fine-tunes the ViT
        # (image_vilmodel.py:40-59)
        hist_img_fts = self._embed(hist_images, deterministic, stop_grad=True)
        hist_pano_fts = self._embed(hist_pano_images, deterministic,
                                    stop_grad=True)
        ob_img_fts = self._embed(ob_images, deterministic, stop_grad=False)
        return self.head_model.forward_sap(
            txt_ids, txt_masks, hist_img_fts, hist_ang_fts, hist_pano_fts,
            hist_pano_ang_fts, hist_masks, ob_img_fts, ob_ang_fts,
            ob_nav_types, ob_masks, act_labels, deterministic)
