"""Task-mixing pre-training loop.

Rebuild of the reference driver (VLN-HAMT/pretrain_src/main_r2r.py:40-530):
MetaLoader multinomial task draw -> per-task forward/loss -> grad-accum ->
warmup-linear LR with clip 5.0 -> periodic per-task validation.  Each task
gets one jitted step function (XLA specialises per task shapes); the mixing
itself is a host-side shared-PRNG draw, replacing the dist.broadcast of the
task id (pretrain_src/data/loader.py:56-59).
"""

from __future__ import annotations

import functools
import time
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from vln_imagine_tpu.config import Config
from vln_imagine_tpu.envx.tables import EpisodeBatch, WorldTables
from vln_imagine_tpu.pretrain.data import MetaSampler, TrajectoryBatcher
from vln_imagine_tpu.pretrain.hamt_model import HamtPretrainModel
from vln_imagine_tpu.train.optim import pretrain_optimizer


@struct.dataclass
class PretrainState:
    step: jnp.ndarray
    params: Any
    opt_state: Any


TASK_ARGS = {
    "mlm": ("txt_ids", "txt_masks", "hist_img_fts", "hist_ang_fts",
            "hist_pano_img_fts", "hist_pano_ang_fts", "hist_masks",
            "txt_labels"),
    "sap": ("txt_ids", "txt_masks", "hist_img_fts", "hist_ang_fts",
            "hist_pano_img_fts", "hist_pano_ang_fts", "hist_masks",
            "ob_img_fts", "ob_ang_fts", "ob_nav_types", "ob_masks",
            "ob_action_viewindex"),
    "sar": ("txt_ids", "txt_masks", "hist_img_fts", "hist_ang_fts",
            "hist_pano_img_fts", "hist_pano_ang_fts", "hist_masks",
            "ob_img_fts", "ob_ang_fts", "ob_nav_types", "ob_masks",
            "ob_action_angles", "ob_progress"),
    "sprel": ("txt_ids", "txt_masks", "hist_img_fts", "hist_ang_fts",
              "hist_pano_img_fts", "hist_pano_ang_fts", "hist_masks",
              "ob_img_fts", "ob_ang_fts", "ob_nav_types", "ob_masks",
              "sp_anchor_idxs", "sp_targets"),
    "mrc": ("txt_ids", "txt_masks", "hist_img_fts", "hist_ang_fts",
            "hist_pano_img_fts", "hist_pano_ang_fts", "hist_masks",
            "hist_mrc_masks", "hist_img_probs"),
    "itm": ("txt_ids", "txt_masks", "hist_img_fts", "hist_ang_fts",
            "hist_pano_img_fts", "hist_pano_ang_fts", "hist_masks",
            "neg_idxs", "shuffled_pos_ids"),
}


# E2E raw-image variants: identical layouts with pixel tensors in place of
# the precomputed features (data/image_tasks.py collates)
_E2E_RENAME = {"hist_img_fts": "hist_images",
               "hist_pano_img_fts": "hist_pano_images",
               "ob_img_fts": "ob_images"}
E2E_TASK_ARGS = {task: tuple(_E2E_RENAME.get(k, k) for k in args)
                 for task, args in TASK_ARGS.items()}


DUET_TASK_ARGS = {
    "mlm": ("txt_ids", "txt_masks", "txt_labels", "traj_img", "traj_loc",
            "traj_nav", "traj_valid", "agg", "gmap_step_ids", "gmap_pos_fts",
            "gmap_valid", "vp_pos_fts", "vp_valid"),
    "mrc": ("txt_ids", "txt_masks", "traj_img", "traj_loc", "traj_nav",
            "traj_valid", "agg", "gmap_step_ids", "gmap_pos_fts",
            "gmap_valid", "gmap_pair_dists", "vp_pos_fts", "vp_valid",
            "vp_view_mrc_masks", "vp_view_probs"),
    "sap": ("txt_ids", "txt_masks", "traj_img", "traj_loc", "traj_nav",
            "traj_valid", "agg", "gmap_step_ids", "gmap_pos_fts",
            "gmap_valid", "gmap_pair_dists", "gmap_visited", "vp_pos_fts",
            "vp_valid", "vp_nav_valid", "cand_to_gmap", "global_act_labels",
            "local_act_labels"),
    "og": ("txt_ids", "txt_masks", "traj_img", "traj_loc", "traj_nav",
           "traj_valid", "agg", "gmap_step_ids", "gmap_pos_fts",
           "gmap_valid", "gmap_pair_dists", "vp_pos_fts", "vp_valid",
           "vp_obj_valid", "obj_labels"),
}


class BasePretrainer:
    task_args: dict[str, tuple]
    model_cls: type

    def __init__(self, cfg: Config, donate: bool = True):
        pcfg = cfg.pretrain
        self.cfg = cfg
        # donate=False keeps input states alive for callers that reuse them
        # (mirrors make_train_step's escape hatch in train/trainer.py)
        self.donate = donate
        self.sampler = MetaSampler(pcfg.tasks, pcfg.mix_ratio, pcfg.seed)
        self.tx = pretrain_optimizer(pcfg.lr, pcfg.warmup_steps,
                                     pcfg.num_train_steps,
                                     max_grad_norm=pcfg.max_grad_norm)
        if pcfg.gradient_accumulation_steps > 1:
            # accumulate k micro-batch gradients, update every k-th call
            # (main_r2r.py:240-280: loss/k each micro-step + step every k ==
            # one update on the mean gradient; the LR schedule advances per
            # update, which MultiSteps' inner-count semantics reproduce)
            self.tx = optax.MultiSteps(
                self.tx, every_k_schedule=pcfg.gradient_accumulation_steps)
        self._rng = jax.random.PRNGKey(pcfg.seed)
        self._steps: dict[str, Callable] = {}
        self._evals: dict[str, Callable] = {}
        # named validation batchers over held-out splits
        # (main_r2r.py:303-316 validates seen + unseen every valid_steps)
        self.val_batchers: dict[str, Any] = {}

    def init_state(self) -> PretrainState:
        rng, self._rng = jax.random.split(self._rng)
        batches = {t: self.batcher.task_batch(t, 2)
                   for t in self.cfg.pretrain.tasks}

        def init_all(mdl):
            for t, batch in batches.items():
                args = tuple(jnp.asarray(batch[k]) for k in self.task_args[t])
                getattr(mdl, f"forward_{t}")(*args)
            return None

        params = self.model.init(rng, method=init_all)
        return PretrainState(step=jnp.zeros([], jnp.int32), params=params,
                             opt_state=self.tx.init(params))

    def _task_fn(self, task: str):
        return getattr(self.model_cls, f"forward_{task}")

    def _train_step(self, task: str):
        if task in self._steps:
            return self._steps[task]
        model, tx = self.model, self.tx
        method = self._task_fn(task)

        # state donation: in-place param/opt-state update (see train/trainer.py)
        @functools.partial(jax.jit,
                           donate_argnums=(0,) if self.donate else ())
        def step(state: PretrainState, rng, *args):
            def loss_fn(params):
                loss_sum, n, correct = model.apply(
                    params, *args, method=method, deterministic=False,
                    rngs={"dropout": rng})
                return loss_sum / jnp.maximum(n, 1), (n, correct)

            (loss, (n, correct)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            updates, opt_state = tx.update(grads, state.opt_state,
                                           state.params)
            params = optax.apply_updates(state.params, updates)
            return PretrainState(state.step + 1, params, opt_state), {
                "loss": loss, "n": n, "correct": correct}

        self._steps[task] = step
        return step

    def _eval_step(self, task: str):
        if task in self._evals:
            return self._evals[task]
        model = self.model
        method = self._task_fn(task)

        @jax.jit
        def step(params, *args):
            loss_sum, n, correct = model.apply(params, *args, method=method,
                                               deterministic=True)
            return loss_sum, n, correct

        self._evals[task] = step
        return step

    # ------------------------------------------------------------------ api
    def train(self, state: PretrainState, num_steps: int,
              batch_size: int | None = None, log_every: int = 0,
              log_fn=print) -> tuple[PretrainState, dict]:
        bsz = batch_size or self.cfg.pretrain.batch_size
        stats: dict[str, list] = {}
        t0 = time.time()
        examples = 0
        for i in range(num_steps):
            task = self.sampler.draw()
            batch = self.batcher.task_batch(task, bsz)
            args = tuple(jnp.asarray(batch[k]) for k in self.task_args[task])
            rng, self._rng = jax.random.split(self._rng)
            state, metrics = self._train_step(task)(state, rng, *args)
            # defer device sync: next host batch builds while the TPU runs
            stats.setdefault(task, []).append(metrics["loss"])
            examples += bsz
            if log_every and (i + 1) % log_every == 0:
                ex_per_s = examples / (time.time() - t0)
                means = {t: round(float(np.mean(jax.device_get(v))), 4)
                         for t, v in stats.items()}
                log_fn(f"step {int(state.step)}: {means}  "
                       f"({ex_per_s:.1f} ex/s)")
        summary = {t: float(np.mean(jax.device_get(v)))
                   for t, v in stats.items()}
        return state, summary

    def add_validation_split(self, name: str, world: WorldTables,
                             ep: EpisodeBatch, seed: int = 0) -> None:
        """Register a held-out split (e.g. 'val_seen'/'val_unseen') for
        validate(); mirrors the reference's val/val2 dataloaders
        (main_r2r.py:160-188,303-316)."""
        self.val_batchers[name] = self._make_batcher(world, ep, seed)

    def validate(self, state: PretrainState, batch_size: int = 8,
                 num_batches: int = 4, split: str | None = None) -> dict:
        """Per-task loss/accuracy (main_r2r.py validate_* :303-316) on the
        named held-out split, or — when no split was registered — on the
        training batcher (smoke-test mode only)."""
        if split is not None:
            batcher = self.val_batchers[split]
        elif self.val_batchers:
            batcher = next(iter(self.val_batchers.values()))
        else:
            batcher = self.batcher
        out = {}
        for task in self.cfg.pretrain.tasks:
            tot_loss = tot_n = tot_correct = 0.0
            for _ in range(num_batches):
                batch = batcher.task_batch(task, batch_size)
                args = tuple(jnp.asarray(batch[k]) for k in self.task_args[task])
                loss_sum, n, correct = self._eval_step(task)(state.params,
                                                             *args)
                tot_loss += float(loss_sum)
                tot_n += float(n)
                tot_correct += float(correct)
            out[task] = {"loss": tot_loss / max(tot_n, 1),
                         "acc": tot_correct / max(tot_n, 1)}
        return out


class HamtPretrainer(BasePretrainer):
    task_args = TASK_ARGS
    model_cls = HamtPretrainModel

    def __init__(self, cfg: Config, world: WorldTables, ep: EpisodeBatch,
                 image_prob_size: int = 64, seed: int | None = None,
                 donate: bool = True, feature_bank=None):
        super().__init__(cfg, donate=donate)
        self._image_prob_size = image_prob_size
        # native async prefetcher over an mmap feature bank: the default on
        # the real-data path (scripts/pretrain.py writes the bank), opt-in
        # for synthetic runs
        self._feature_bank = feature_bank
        self.model = HamtPretrainModel(cfg.model,
                                       image_prob_size=image_prob_size,
                                       tasks=tuple(cfg.pretrain.tasks))
        self.batcher = self._make_batcher(
            world, ep, seed if seed is not None else cfg.pretrain.seed)

    def _make_batcher(self, world: WorldTables, ep: EpisodeBatch, seed: int):
        kw = dict(max_hist_len=self.cfg.env.max_action_len,
                  angle_feat_size=self.cfg.model.angle_feat_size,
                  image_prob_size=self._image_prob_size,
                  vocab_size=self.cfg.model.vocab_size, seed=seed,
                  mlm_prob=self.cfg.pretrain.mlm_prob,
                  mrc_prob=self.cfg.pretrain.mrc_prob)
        if self._feature_bank is not None:
            from vln_imagine_tpu.pretrain.data import \
                PrefetchTrajectoryBatcher
            return PrefetchTrajectoryBatcher(world, ep, self._feature_bank,
                                             **kw)
        return TrajectoryBatcher(world, ep, **kw)


class DuetPretrainer(BasePretrainer):
    """DUET 3-task pre-training (VLN-DUET/pretrain_src/train_r2r.py:39-457,
    config/r2r_pretrain.json: mlm/mrc/sap 1:1:1)."""

    task_args = DUET_TASK_ARGS

    def __init__(self, cfg: Config, world: WorldTables, ep: EpisodeBatch,
                 image_prob_size: int = 64, seed: int | None = None,
                 donate: bool = True, feature_bank=None):
        from vln_imagine_tpu.pretrain.duet_model import DuetPretrainModel

        super().__init__(cfg, donate=donate)
        self.model_cls = DuetPretrainModel
        # native async prefetcher over an mmap feature bank: the default on
        # the real-data path, same as HamtPretrainer (the reference
        # PrefetchLoader covers both stacks, pretrain_src/data/loader.py:90)
        self._feature_bank = feature_bank
        # the pretrain model always carries the lang-side x-layer blocks:
        # MLM contextualizes text over both branches via lang2visn
        # (pretrain config/r2r_model_config.json:32, vilmodel.py:370-374)
        import dataclasses as _dc
        mcfg = _dc.replace(cfg.model, use_lang2visn_attn=True)
        self.model = DuetPretrainModel(mcfg,
                                       image_prob_size=image_prob_size,
                                       tasks=tuple(cfg.pretrain.tasks))
        self._image_prob_size = image_prob_size
        self.batcher = self._make_batcher(
            world, ep, seed if seed is not None else cfg.pretrain.seed)

    def _make_batcher(self, world: WorldTables, ep: EpisodeBatch, seed: int):
        from vln_imagine_tpu.pretrain.duet_data import (
            DuetTrajectoryBatcher, PrefetchDuetTrajectoryBatcher)
        kw = dict(max_hist_len=self.cfg.env.max_action_len,
                  max_gmap_nodes=self.cfg.env.max_gmap_nodes,
                  angle_feat_size=self.cfg.model.angle_feat_size,
                  image_prob_size=self._image_prob_size,
                  vocab_size=self.cfg.model.vocab_size, seed=seed,
                  mlm_prob=self.cfg.pretrain.mlm_prob)
        if self._feature_bank is not None:
            return PrefetchDuetTrajectoryBatcher(world, ep,
                                                 self._feature_bank, **kw)
        return DuetTrajectoryBatcher(world, ep, **kw)


class E2EPretrainer(BasePretrainer):
    """Six-task E2E image pre-training with the ViT in the loop
    (VLN-HAMT/pretrain_src/main_r2r_image.py + data/image_tasks.py):
    task batches carry raw panorama pixels from a RawPanoramaBank (or any
    [S, N, V, h, w, 3]-indexable array) and HamtE2EPretrainModel embeds
    them with its in-model ViT each step."""

    task_args = E2E_TASK_ARGS

    def __init__(self, cfg: Config, world: WorldTables, ep: EpisodeBatch,
                 images, vit_config=None, image_prob_size: int = 64,
                 seed: int | None = None, donate: bool = True):
        from vln_imagine_tpu.pretrain.data import E2EImageBatcher
        from vln_imagine_tpu.pretrain.hamt_e2e import HamtE2EPretrainModel

        super().__init__(cfg, donate=donate)
        self.model_cls = HamtE2EPretrainModel
        self._image_prob_size = image_prob_size
        self._images = images
        self.model = HamtE2EPretrainModel(
            cfg.model, vit_config=vit_config,
            image_prob_size=image_prob_size, tasks=tuple(cfg.pretrain.tasks))
        self.batcher = self._make_batcher(
            world, ep, seed if seed is not None else cfg.pretrain.seed)

    def _make_batcher(self, world: WorldTables, ep: EpisodeBatch, seed: int):
        from vln_imagine_tpu.pretrain.data import E2EImageBatcher
        return E2EImageBatcher(
            world, ep, self._images, max_hist_len=self.cfg.env.max_action_len,
            angle_feat_size=self.cfg.model.angle_feat_size,
            image_prob_size=self._image_prob_size,
            vocab_size=self.cfg.model.vocab_size, seed=seed,
            mlm_prob=self.cfg.pretrain.mlm_prob,
            mrc_prob=self.cfg.pretrain.mrc_prob)
