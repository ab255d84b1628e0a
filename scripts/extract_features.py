#!/usr/bin/env python
"""Offline / on-demand ViT feature extraction (BASELINE config 4).

Replaces the reference's external HDF5 feature-precompute step: raw 36-view
panorama images (and imagination images) are embedded by the flax ViT-B/16 on
TPU and written either to a compiled-world feature table (.npy, fed straight
into WorldTables.feat) or a native mmap feature bank for serving.

  python scripts/extract_features.py --images panos.npy --out feats.npy \\
      [--vit-ckpt timm_vit.pt] [--bank]

`--images`: .npy of uint8 [N_nodes, V, H, W, 3] (or [N, H, W, 3] for
imagination images).  Without --vit-ckpt a randomly initialised ViT is used
(pipeline smoke-testing only).
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--images", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--vit-ckpt", help="timm vit_base_patch16_224 torch ckpt")
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--bank", action="store_true",
                   help="write a native mmap feature bank instead of .npy")
    args = p.parse_args()

    from vln_imagine_tpu.models.vit import FeatureExtractor, ViTConfig, \
        preprocess

    if args.vit_ckpt:
        import torch

        from vln_imagine_tpu.ckpt.convert import (
            convert_state_dict,
            vit_torch_to_flax_path,
        )

        sd = torch.load(args.vit_ckpt, map_location="cpu")
        if "state_dict" in sd:
            sd = sd["state_dict"]
        params, skipped = convert_state_dict(sd, vit_torch_to_flax_path)
        if skipped:
            print(f"note: skipped {len(skipped)} non-backbone keys")
        extractor = FeatureExtractor(params, ViTConfig(),
                                     batch_size=args.batch_size)
    else:
        print("WARNING: no --vit-ckpt; using a randomly initialised ViT")
        extractor = FeatureExtractor.random_init(batch_size=args.batch_size)

    images = np.load(args.images)
    x = preprocess(images) if images.dtype == np.uint8 else images
    if x.ndim == 5:
        feats = extractor.extract_panoramas(x)
    else:
        feats = extractor.extract(x)
    print(f"extracted {feats.shape} features")

    if args.bank:
        from vln_imagine_tpu.native import FeatureBank

        FeatureBank.write(args.out, feats.reshape(feats.shape[0], -1))
        print(f"wrote mmap bank {args.out}")
    else:
        np.save(args.out, feats)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
