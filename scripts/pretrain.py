#!/usr/bin/env python
"""Pre-training entry point (the reference's VLN-HAMT/pretrain_src/main_r2r.py
and VLN-DUET/pretrain_src/train_r2r.py drivers).

Task-mixing proxy-task pre-training over stored trajectories: HAMT runs the
6-task mix (mlm/sap/sar/sprel/mrc/itm 5:1:1:1:2:2, config/pretrain_r2r.json),
DUET the 3-task mix (mlm/mrc/sap 1:1:1, config/r2r_pretrain.json).  Model
snapshots (`model_step_<N>`, the reference's ModelSaver naming,
pretrain_src/utils/save.py:23-46) can be grafted into fine-tuning with
ckpt.transfer.init_finetune_from_pretrain.

Real data:
  python scripts/pretrain.py --agent hamt --connectivity-dir .../connectivity \\
      --anno-dir .../annotations --img-features .../vit_features.hdf5 \\
      --steps 200000

Synthetic smoke run (no datasets needed):
  python scripts/pretrain.py --agent hamt --synthetic --steps 50 \\
      --log-steps 10 --valid-steps 25
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
# sibling scripts/train.py provides the split builders; put scripts/ first so
# `from train import ...` resolves it under `python -m` / embedding too
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--agent", choices=["hamt", "duet"], default="hamt")
    p.add_argument("--dataset", default="r2r",
                   choices=["r2r", "r4r", "rxr", "reverie", "soon"])
    p.add_argument("--log-dir", default="logs/pretrain")
    p.add_argument("--steps", type=int, default=None,
                   help="total optimizer steps (default: config budget)")
    p.add_argument("--log-steps", type=int, default=None)
    p.add_argument("--valid-steps", type=int, default=None)
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--lr", type=float, default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--tasks", nargs="+", default=None,
                   help="override task list, e.g. --tasks mlm sap")
    p.add_argument("--mix-ratio", nargs="+", type=int, default=None)
    p.add_argument("--image-prob-size", type=int, default=1000,
                   help="ViT class-prob size for MRC soft labels "
                        "(r2r_model_config.json image_prob_size)")
    # data
    p.add_argument("--grad-accum", type=int, default=None,
                   help="gradient accumulation micro-steps per optimizer "
                        "update (main_r2r.py:240-280)")
    # E2E image pre-training: raw panorama pixels + in-model ViT, the
    # reference's main_r2r_image.py driver (VLN-HAMT/pretrain_src/
    # main_r2r_image.py:1-585); --raw-panorama-bank implies --e2e
    p.add_argument("--e2e", action="store_true",
                   help="six-task E2E image pre-training with the ViT in "
                        "the loop (main_r2r_image.py); with --synthetic a "
                        "random in-memory panorama bank is fabricated")
    p.add_argument("--raw-panorama-bank",
                   help="mmap'd .npy [S, N, V, h, w, 3] of preprocessed "
                        "panorama views aligned with the compiled world "
                        "(RawPanoramaBank; replaces the reference's LMDB "
                        "raw-image store, pretrain_src/data/image_data.py)")
    p.add_argument("--image-size", type=int, default=224,
                   help="E2E input image side (ViT-B/16 default 224)")
    p.add_argument("--vit-init",
                   help="timm vit_base_patch16_224 state_dict (.pth) to "
                        "initialize the in-model ViT from "
                        "(main_r2r_image.py loads the same backbone)")
    p.add_argument("--vit-layers", type=int, default=12)
    p.add_argument("--vit-hidden", type=int, default=768)
    p.add_argument("--vit-heads", type=int, default=12)
    p.add_argument("--vit-patch", type=int, default=16)
    # data
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--connectivity-dir")
    p.add_argument("--anno-dir")
    p.add_argument("--img-features")
    p.add_argument("--split", default="train")
    p.add_argument("--no-prefetch", action="store_true",
                   help="disable the native async feature-bank prefetcher "
                        "on the real-data path")
    p.add_argument("--val-splits", nargs="*", default=None,
                   help="held-out validation splits (reference default: "
                        "val_seen val_unseen, main_r2r.py:303-316)")
    p.add_argument("--resume")
    p.add_argument("--init-ckpt",
                   help="torch BERT / LXMERT weights (.pt/.pth/.bin "
                        "state_dict) to initialize pre-training from — the "
                        "reference's --init_pretrained surgery "
                        "(train_r2r.py:110-139, main_r2r.py:131-147)")
    p.add_argument("--init-pretrained", default="auto",
                   choices=["auto", "bert", "bert-verbatim", "lxmert"],
                   help="format of --init-ckpt (auto-detects LXMERT); "
                        "'bert-verbatim' reproduces the reference's "
                        "embeddings-only BERT transfer for DUET "
                        "(train_r2r.py:110-119) instead of also remapping "
                        "the language layers")
    return p.parse_args()


def main():
    from vln_imagine_tpu.platform import apply_platform_env
    apply_platform_env()
    args = parse_args()
    from vln_imagine_tpu.config import duet_r2r_config, hamt_r2r_config, \
        tiny_test_config, _replace
    from vln_imagine_tpu.utils.logger import write_to_record_file

    if args.synthetic:
        cfg = tiny_test_config(args.agent)
    else:
        cfg = hamt_r2r_config() if args.agent == "hamt" else duet_r2r_config()
    cfg = cfg.replace(dataset=args.dataset)
    if args.raw_panorama_bank:
        args.e2e = True
    if args.e2e:
        # the E2E image driver is HAMT-only in the reference
        # (main_r2r_image.py); features come out of the in-model ViT, so the
        # cross-modal image width must equal the ViT hidden size
        if args.agent != "hamt":
            raise SystemExit("--e2e is the HAMT image pre-training driver "
                             "(main_r2r_image.py has no DUET sibling)")
        cfg = _replace(cfg, "model", image_feat_size=args.vit_hidden)
    if args.agent == "duet":
        # DUET pretrain task set (r2r_pretrain.json:43-50)
        cfg = _replace(cfg, "pretrain", tasks=("mlm", "mrc", "sap"),
                       mix_ratio=(1, 1, 1), batch_size=64,
                       num_train_steps=100_000)
    overrides = {"seed": args.seed}
    if args.steps is not None:
        overrides["num_train_steps"] = args.steps
    if args.log_steps is not None:
        overrides["log_steps"] = args.log_steps
    if args.valid_steps is not None:
        overrides["valid_steps"] = args.valid_steps
    if args.batch_size is not None:
        overrides["batch_size"] = args.batch_size
    if args.lr is not None:
        overrides["lr"] = args.lr
    if args.tasks is not None:
        overrides["tasks"] = tuple(args.tasks)
        overrides["mix_ratio"] = tuple(
            args.mix_ratio or [1] * len(args.tasks))
    elif args.mix_ratio is not None:
        overrides["mix_ratio"] = tuple(args.mix_ratio)
    if args.grad_accum is not None:
        overrides["gradient_accumulation_steps"] = args.grad_accum
    cfg = _replace(cfg, "pretrain", **overrides)

    # trajectory source: the train-split episodes over the compiled world
    # (MultiStepNavData loads the same annotations offline, r2r_data.py:95)
    from train import build_real, build_synthetic  # sibling scripts/train.py
    val_splits = []
    if args.synthetic:
        tables, train, vals, _ = build_synthetic(cfg)
        if args.val_splits is not None:
            val_splits = [v for v in vals if v.name in args.val_splits]
    else:
        val_names = (args.val_splits if args.val_splits is not None
                     else ["val_seen", "val_unseen"])
        args.splits = [args.split] + val_names
        args.imagine_features = None
        args.sub_instr_file = getattr(args, "sub_instr_file", None)
        args.generated_flag_file = getattr(args, "generated_flag_file", None)
        args.aug = None  # aug alternation is a fine-tune concept
        cfg, tables, train, val_splits, _, _ = build_real(cfg, args)

    from vln_imagine_tpu.pretrain.trainer import DuetPretrainer, HamtPretrainer
    cls = HamtPretrainer if args.agent == "hamt" else DuetPretrainer
    extra = {}
    if not args.synthetic and not args.no_prefetch and not args.e2e:
        # default real-data path for BOTH stacks: write the feature table to
        # an mmap bank and overlap per-batch row gathers with device compute
        # via the native BankPrefetcher (PrefetchLoader parity — it wraps the
        # HAMT and DUET loaders alike, loader.py:90-124)
        import numpy as _np

        from vln_imagine_tpu.native import FeatureBank
        os.makedirs(args.log_dir, exist_ok=True)
        bank_path = os.path.join(args.log_dir, "feature_bank.f32")
        feat = _np.asarray(tables.feat)      # [S, N, V, Df]
        S, N = feat.shape[:2]
        extra["feature_bank"] = FeatureBank.write(
            bank_path, feat.reshape(S * N, -1))
    if args.e2e:
        import numpy as _np

        from vln_imagine_tpu.models.vit import ViTConfig
        from vln_imagine_tpu.pretrain.trainer import E2EPretrainer
        vit_cfg = ViTConfig(image_size=args.image_size,
                            patch_size=args.vit_patch,
                            hidden_size=args.vit_hidden,
                            num_layers=args.vit_layers,
                            num_heads=args.vit_heads)
        if args.raw_panorama_bank:
            from vln_imagine_tpu.data.features import RawPanoramaBank
            images = RawPanoramaBank(args.raw_panorama_bank, args.image_size)
        else:
            if not args.synthetic:
                raise SystemExit("--e2e needs --raw-panorama-bank "
                                 "(or --synthetic for a smoke run)")
            # fabricated in-memory panorama bank, same indexing as the mmap
            S, N, V = _np.asarray(tables.feat).shape[:3]
            images = _np.random.default_rng(args.seed).standard_normal(
                (S, N, V, args.image_size, args.image_size, 3)
            ).astype(_np.float32)
        pt = E2EPretrainer(cfg, tables, train.episodes, images,
                           vit_config=vit_cfg,
                           image_prob_size=args.image_prob_size,
                           seed=args.seed)
    else:
        pt = cls(cfg, tables, train.episodes,
                 image_prob_size=args.image_prob_size, seed=args.seed,
                 **extra)
    for v in val_splits:
        pt.add_validation_split(v.name, tables, v.episodes, seed=args.seed)
    state = pt.init_state()
    if args.e2e and args.vit_init:
        # timm ViT-B/16 backbone weights into the in-model ViT
        # (main_r2r_image.py loads the same released backbone)
        import jax
        import jax.numpy as jnp
        import torch

        from vln_imagine_tpu.ckpt.convert import (convert_state_dict,
                                                  vit_torch_to_flax_path)
        # weights_only: a checkpoint path is untrusted input; never let
        # torch.load unpickle arbitrary objects from it
        sd = torch.load(args.vit_init, map_location="cpu",
                        weights_only=True)
        for key in ("state_dict", "model", "module"):
            if isinstance(sd, dict) and isinstance(sd.get(key), dict):
                sd = sd[key]
        tree, skipped = convert_state_dict(sd, vit_torch_to_flax_path)
        cur_vit = state.params["params"]["vit"]

        def _graft(path, c, s):
            # tree.map only checks tree STRUCTURE; a same-depth ViT with a
            # different image_size/pos-embed length would otherwise load
            # here and fail later with an opaque apply-time error
            if tuple(c.shape) != tuple(s.shape):
                name = jax.tree_util.keystr(path)
                raise ValueError(
                    f"--vit-init shape mismatch at {name}: checkpoint "
                    f"{tuple(s.shape)} vs model {tuple(c.shape)} (wrong "
                    "image_size / patch geometry?)")
            return jnp.asarray(s, dtype=c.dtype)

        new_vit = jax.tree_util.tree_map_with_path(
            _graft, cur_vit, tree["params"])
        params = dict(state.params)
        params["params"] = dict(params["params"], vit=new_vit)
        state = state.replace(params=params)
        print(f"initialized ViT from {args.vit_init}: "
              f"{len(jax.tree.leaves(new_vit))} leaves, "
              f"{len(skipped)} source keys skipped")
    if args.init_ckpt:
        from vln_imagine_tpu.ckpt.manager import load_pretrain_init
        from vln_imagine_tpu.ckpt.transfer import init_finetune_from_pretrain
        loaded = load_pretrain_init(args.init_ckpt, agent=args.agent,
                                    source=args.init_pretrained)
        new_params, transferred, missing = init_finetune_from_pretrain(
            state.params, loaded["params"])
        assert transferred > 0, (
            f"no subtree of {args.init_ckpt} matched the {args.agent} "
            "pretrain model")
        state = state.replace(params=new_params)
        print(f"initialized from {loaded['source']} weights "
              f"{args.init_ckpt}: {transferred} leaves transferred, "
              f"{len(loaded['skipped'])} source keys skipped")

    os.makedirs(args.log_dir, exist_ok=True)
    import orbax.checkpoint as ocp
    import jax
    import numpy as np
    ckpt = ocp.PyTreeCheckpointer()
    if args.resume:
        from vln_imagine_tpu.ckpt.manager import _graft
        state = _graft(state, ckpt.restore(os.path.abspath(args.resume)))
    record = os.path.join(args.log_dir, "pretrain.txt")

    def log(msg):
        write_to_record_file(str(msg), record)

    pcfg = cfg.pretrain
    # state.step counts micro-steps; the training budget counts optimizer
    # updates (reference global_step), so scale by the accumulation factor
    accum = max(pcfg.gradient_accumulation_steps, 1)
    total_micro = pcfg.num_train_steps * accum
    done = int(state.step)
    while done < total_micro:
        chunk = min(pcfg.valid_steps * accum, total_micro - done)
        state, summary = pt.train(state, chunk,
                                  log_every=pcfg.log_steps * accum,
                                  log_fn=log)
        done = int(state.step)
        for vname in (pt.val_batchers or {None: None}):
            metrics = pt.validate(state, split=vname)
            tag = f" [{vname}]" if vname else ""
            log(f"valid @ step {done}{tag}: "
                + "  ".join(f"{t} loss={m['loss']:.4f} acc={m['acc']:.4f}"
                            for t, m in metrics.items()))
        path = os.path.join(os.path.abspath(args.log_dir),
                            f"model_step_{done}")
        ckpt.save(path, jax.tree.map(np.asarray, state), force=True)
        log(f"saved {path}")


if __name__ == "__main__":
    main()
