"""Fine-tune training driver: the main.py train/valid loop.

Rebuild of VLN-HAMT/finetune_src/r2r/main.py:138-461 (HAMT) /
VLN-DUET/map_nav_src/r2r/main_nav.py (DUET): train in log_every intervals,
validate each val split greedily, keep best (spl+sr for HAMT, spl for DUET) /
latest / periodic snapshots, append record files and scalar logs.  The
3-stage warm-up lives inside the optimizer schedule (train/optim.py), so the
driver needs none of the reference's per-interval LR/freeze mutation
(main.py:200-278) — its runtime assertions live in tests/test_warmup.py.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from vln_imagine_tpu.ckpt.manager import CheckpointManager
from vln_imagine_tpu.config import Config
from vln_imagine_tpu.data.annotations import EvalSampler, RoundRobinSampler
from vln_imagine_tpu.envx.tables import EpisodeBatch, WorldTables
from vln_imagine_tpu.eval.metrics import eval_batch
from vln_imagine_tpu.utils.logger import (
    MetricsWriter,
    dump_args,
    write_to_record_file,
)


@dataclass
class SplitData:
    name: str
    episodes: EpisodeBatch          # full split, host-side arrays
    instr_ids: list = field(default_factory=list)
    # NDH (cvdn): the annotated goal-pano node indices per item, used by
    # goal-progress eval (NDHNavBatch, VLN-HAMT/finetune_src/cvdn/env.py:91-130)
    end_panos: list | None = None


def _take(ep: EpisodeBatch, idxs: np.ndarray) -> EpisodeBatch:
    # numpy gather only: device placement happens in _place_batch (mesh
    # sharding) or at jit dispatch (single device) — one H2D copy either way
    return jax.tree.map(lambda x: np.asarray(x)[idxs], ep)


class FinetuneDriver:
    def __init__(self, cfg: Config, tables: WorldTables,
                 train_split: SplitData, val_splits: list[SplitData],
                 log_dir: str, rng=None, graphs=None, mesh=None,
                 aug_split: SplitData | None = None):
        self.cfg = cfg
        self.tables = tables
        # host ScanGraphs (scan index -> graph): needed only to emit
        # submit_<env>.json with real viewpoint ids/poses (main.py:416-421)
        self.graphs = graphs
        # optional jax.sharding.Mesh (parallel.mesh.make_mesh): batch axes
        # shard over 'data' (the reference's DDP, utils/distributed.py),
        # large kernels over 'model' when model>1; XLA inserts the gradient
        # reductions.  When no mesh object is passed, MeshConfig decides
        # (data_parallelism 0 = single device, -1 = all devices on data).
        if mesh is None and cfg.mesh.data_parallelism != 0:
            from vln_imagine_tpu.parallel.mesh import make_mesh
            mesh = make_mesh(data=cfg.mesh.data_parallelism,
                             model=cfg.mesh.model_parallelism)
        self.mesh = mesh
        self.train_split = train_split
        self.val_splits = val_splits
        self.log_dir = log_dir
        os.makedirs(log_dir, exist_ok=True)
        dump_args(cfg, log_dir)
        self.writer = MetricsWriter(log_dir)
        self.record_file = os.path.join(log_dir, "train.txt")
        self.ckpt = CheckpointManager(
            os.path.join(log_dir, "ckpts"),
            select_metric="spl_sr" if cfg.agent == "hamt" else "spl")
        self._rng = rng if rng is not None else jax.random.PRNGKey(
            cfg.train.seed)

        if cfg.agent == "hamt":
            from vln_imagine_tpu.train.trainer import HamtTrainer
            self.trainer = HamtTrainer(cfg, tables)
            # train_alg 'sample' = IL+RL (agent_cmt.py:799-832);
            # 'imitation' = teacher-forced CE only
            self._feedback = ("teacher"
                              if cfg.train.train_alg == "imitation"
                              else "sample")
        else:
            from vln_imagine_tpu.train.trainer_duet import DuetTrainer
            self.trainer = DuetTrainer(cfg, tables)
            self._feedback = None  # train_alg drives it
        self.sampler = RoundRobinSampler(
            train_split.episodes.scan.shape[0], cfg.train.batch_size,
            cfg.train.seed)
        # augmented-data split (main.py:98-108,281-302): training alternates
        # one GT iteration with one augmented iteration.  Aug episodes carry
        # no imaginations (imagine_mask all False) — with every imagination
        # token masked the additive -10000 attention masks zero its
        # contribution, matching the reference's imagine_enc_pano=False flip
        # without a second compiled train step.
        self.aug_split = aug_split
        self.aug_sampler = (RoundRobinSampler(
            aug_split.episodes.scan.shape[0], cfg.train.batch_size,
            cfg.train.seed + 1) if aug_split is not None else None)
        self.state = None
        self._train_step: Callable | None = None
        self._eval_step: Callable | None = None

    # ------------------------------------------------------------------ init
    def setup(self, init_params: Any | None = None):
        # shapes-only example batch; wrap when the split is smaller than
        # the batch (e.g. --eval-only drills over a handful of episodes)
        example = _take(self.train_split.episodes,
                        np.arange(self.cfg.train.batch_size)
                        % self.train_split.episodes.scan.shape[0])
        self.state = self.trainer.init_state(example)
        if init_params is not None:
            self.state = self.state.replace(params=init_params)
        if self.mesh is not None:
            from vln_imagine_tpu.parallel.mesh import (
                param_shardings, replicate)
            n_data = self.mesh.shape["data"]
            assert self.cfg.train.batch_size % n_data == 0, (
                f"the data axis ({n_data}) must divide the batch size "
                f"({self.cfg.train.batch_size})")
            p_shard = param_shardings(self.state.params, self.mesh)
            params = jax.tree.map(jax.device_put, self.state.params, p_shard)
            self.state = replicate(
                self.state.replace(params=None), self.mesh
            ).replace(params=params)
        if self.cfg.agent == "hamt":
            self._train_step = self.trainer.make_train_step(self._feedback)
        else:
            self._train_step = self.trainer.make_train_step()
        # DUET --detailed_output: the eval step also returns the final
        # per-gmap-node stop table for the 'details' submission field
        self._eval_detailed = (self.cfg.agent == "duet"
                               and self.cfg.train.detailed_output)
        self._eval_step = (self.trainer.make_eval_step(detailed=True)
                           if self._eval_detailed
                           else self.trainer.make_eval_step())

    def _place_batch(self, ep: EpisodeBatch) -> EpisodeBatch:
        if self.mesh is None:
            return ep  # numpy leaves; jit transfers at dispatch
        from vln_imagine_tpu.parallel.mesh import shard_batch
        return shard_batch(ep, self.mesh)

    def _place_state(self, state):
        """Re-apply the mesh layout to a restored (host numpy) state: without
        this, resume/rollback under a mesh would leave TP-sharded kernels
        fully replicated (layout change + recompile + extra HBM)."""
        if self.mesh is None:
            return state
        from vln_imagine_tpu.parallel.mesh import param_shardings, replicate
        p_shard = param_shardings(state.params, self.mesh)
        params = jax.tree.map(jax.device_put, state.params, p_shard)
        return replicate(state.replace(params=None),
                         self.mesh).replace(params=params)

    def load_checkpoint(self, name: str):
        """Restore `name` into the current state with the mesh layout."""
        self.state = self._place_state(self.ckpt.load(name, self.state))
        return self.state

    def init_from_reference(self, path: str) -> dict:
        """Initialize from a released torch agent checkpoint — the
        {vln_bert, critic} x {epoch, state_dict, optimizer} format the
        reference agents save (agent_cmt.py:837-875), including DDP
        'module.' prefix healing (agent_base.py:250-282).  Optimizer states
        are rebuilt fresh (the reference's load defaults to
        resume_optimizer=False too).  Returns {'epoch', 'skipped'}."""
        import numpy as np

        from vln_imagine_tpu.ckpt.convert import verify_converted
        from vln_imagine_tpu.ckpt.manager import load_reference_checkpoint

        assert self.state is not None, "setup() before init_from_reference()"
        loaded = load_reference_checkpoint(path, agent=self.cfg.agent)

        def graft(ex, src):
            if isinstance(ex, dict):
                return {k: graft(v, src[k]) for k, v in ex.items()}
            return np.asarray(src, dtype=ex.dtype)

        host = jax.device_get(self.state.params)
        problems = verify_converted(loaded["params"], host)
        assert not problems, (
            f"reference checkpoint '{path}' does not cover this model: "
            + "; ".join(problems[:8]))
        state = self.state.replace(params=graft(host, loaded["params"]))
        if loaded.get("critic_params") is not None and \
                getattr(self.state, "critic_params", None) is not None:
            c_host = jax.device_get(self.state.critic_params)
            state = state.replace(
                critic_params=graft(c_host, loaded["critic_params"]))
        self.state = self._place_state(state)
        return {"epoch": loaded.get("epoch"),
                "skipped": loaded.get("skipped", [])}

    def init_from_bert_ckpt(self, path: str) -> dict:
        """The reference's --bert_ckpt_file on-ramp: initialize the
        navigator from a released torch pre-train checkpoint (flat
        model_step_<N>.pt state_dict, vlnbert_init.py:20-31 incl.
        'module.' healing and the next_action head transfer).  Shared
        submodules take the pre-trained values; fine-tune-only modules
        (imagination, aux head, critic) stay at init; pretrain-only heads
        are skipped.  Returns {'transferred', 'missing', 'skipped'}."""
        from vln_imagine_tpu.ckpt.manager import load_reference_pretrain
        from vln_imagine_tpu.ckpt.transfer import init_finetune_from_pretrain

        assert self.state is not None, "setup() before init_from_bert_ckpt()"
        loaded = load_reference_pretrain(path, agent=self.cfg.agent)
        host = jax.device_get(self.state.params)
        new_params, transferred, missing = init_finetune_from_pretrain(
            host, loaded["params"])
        assert transferred > 0, (
            f"no parameter subtree of '{path}' matched the "
            f"{self.cfg.agent} fine-tune model")
        self.state = self._place_state(self.state.replace(params=new_params))
        return {"transferred": transferred, "missing": missing,
                "skipped": loaded["skipped"]}

    def init_from_pretrain(self, path: str) -> dict:
        """Initialize the navigator from a pre-training snapshot
        (`model_step_<N>` written by scripts/pretrain.py — the reference's
        ModelSaver file, pretrain_src/utils/save.py:23-46, consumed at
        fine-tune model construction via vlnbert_init.py:20-31 /
        main_r2r.py:303-316).  Shared submodules take the pre-trained
        values; fine-tune-only modules (imagination, critic, aux head) stay
        at init.  Returns {'transferred', 'missing'}."""
        import orbax.checkpoint as ocp

        from vln_imagine_tpu.ckpt.transfer import init_finetune_from_pretrain

        assert self.state is not None, "setup() before init_from_pretrain()"
        restored = ocp.PyTreeCheckpointer().restore(os.path.abspath(path))
        host = jax.device_get(self.state.params)
        new_params, transferred, missing = init_finetune_from_pretrain(
            host, restored["params"])
        assert transferred > 0, (
            f"no parameter subtree of '{path}' matched the "
            f"{self.cfg.agent} fine-tune model")
        self.state = self._place_state(
            self.state.replace(params=new_params))
        return {"transferred": transferred, "missing": missing}

    # ----------------------------------------------------------------- train
    def train_interval(self, n_iters: int) -> dict:
        logs: dict[str, list] = {}
        for it in range(n_iters):
            # with an aug split: odd iterations draw augmented batches
            # (main.py:285-302's 1 GT / 1 aug alternation)
            use_aug = self.aug_split is not None and it % 2 == 1
            sampler = self.aug_sampler if use_aug else self.sampler
            split = self.aug_split if use_aug else self.train_split
            i1 = sampler.next_batch()
            i2 = sampler.next_batch()
            ep1 = self._place_batch(_take(split.episodes, i1))
            ep2 = self._place_batch(_take(split.episodes, i2))
            rng, self._rng = jax.random.split(self._rng)
            self.state, metrics = self._train_step(self.state, ep1, ep2, rng)
            # keep metrics on-device during the interval: converting per step
            # would synchronise with the device and serialise host batch
            # assembly against the TPU (the reference's PrefetchLoader overlap,
            # pretrain_src/data/loader.py:90-124, falls out of async dispatch)
            for k, v in metrics.items():
                logs.setdefault(k, []).append(v)
        return {k: float(np.mean(jax.device_get(v))) for k, v in logs.items()}

    # ------------------------------------------------------------------ eval
    def validate(self, split: SplitData, batch_size: int | None = None,
                 write_outputs: bool = False) -> dict:
        bs = (batch_size or self.cfg.train.eval_batch_size
              or self.cfg.train.batch_size)
        n = split.episodes.scan.shape[0]
        # a batch bigger than the split only pads compute (EvalSampler wraps)
        bs = max(min(bs, n), 1)
        if self.mesh is not None:
            # keep the leading axis shardable over the data axis
            n_data = self.mesh.shape["data"]
            bs = max(bs // n_data * n_data, n_data)
        paths, gts, scans, kept_ids, kept_idx = [], [], [], [], []
        extra = []  # pred_obj (reverie/soon) or declared midstop (r2r_back)
        details = []  # per-item {node: stop_score} (--detailed_output)
        # pipelined dispatch: keep a window of eval programs in flight so
        # device compute, host batch packing and result post-processing
        # overlap — syncing right after each dispatch serializes one tunnel
        # round-trip per batch (jax dispatch is async; only the np.asarray
        # below blocks).  Window bounds queued inputs' device memory.
        from collections import deque
        # default 4: enough to hide dispatch/host latency, bounded device
        # memory for the queued batches (16 placed DUET batches can matter
        # on a memory-tight chip); VLN_EVAL_PIPELINE=1 is fully synchronous
        depth = max(int(os.environ.get("VLN_EVAL_PIPELINE", "4")), 1)
        # length bucketing (VLN_EVAL_BUCKET=0 disables): the early-exit
        # while_loop runs every batch to its SLOWEST episode, so grouping
        # episodes by expected length (gt path length as the proxy) cuts the
        # steps wasted on already-ended items.  Pure scheduling: each item's
        # rollout is independent of its batchmates (ended items are frozen),
        # so per-item results are identical to sequential order.
        if os.environ.get("VLN_EVAL_BUCKET", "1") != "0" and n > bs:
            gt_len = np.asarray(split.episodes.gt_len)
            perm = np.argsort(gt_len, kind="stable").astype(np.int64)
        else:
            perm = np.arange(n, dtype=np.int64)
        inflight: deque = deque()
        sampler = iter(EvalSampler(n, bs))
        exhausted = False
        while inflight or not exhausted:
            while not exhausted and len(inflight) < depth:
                nxt = next(sampler, None)
                if nxt is None:
                    exhausted = True
                    break
                pos, fresh = nxt
                idxs = perm[pos]
                ep = self._place_batch(_take(split.episodes, idxs))
                rng, self._rng = jax.random.split(self._rng)
                inflight.append(
                    (idxs, fresh, self._eval_step(self.state.params, ep, rng)))
            if not inflight:
                break
            idxs, fresh, out = inflight.popleft()
            det = None
            if self._eval_detailed:
                det = tuple(np.asarray(x) for x in out[-1])
                out = out[:-1]
            pn, pl = np.asarray(out[0]), np.asarray(out[1])
            po = (np.asarray(out[2])
                  if len(out) > 2 and out[2] is not None else None)
            for j, keep in enumerate(fresh):
                if not keep:
                    continue
                b = idxs[j]
                paths.append(list(pn[j, :pl[j]]))
                gt = np.asarray(split.episodes.gt_path)[b]
                gl = int(np.asarray(split.episodes.gt_len)[b])
                gts.append(list(gt[:gl]))
                scans.append(int(np.asarray(split.episodes.scan)[b]))
                kept_ids.append(split.instr_ids[b] if split.instr_ids else b)
                kept_idx.append(b)
                if po is not None:
                    extra.append(int(po[j]))
                if det is not None:
                    nodes, scores, valid = det
                    details.append({int(n): float(s) for n, s, v in
                                    zip(nodes[j], scores[j], valid[j]) if v})
        if extra and split.episodes.gt_obj_id is not None:
            # REVERIE/SOON: object-navigation scoring (success = stop at any
            # viewpoint the gt object is visible from; RGS/RGSPL grounding)
            avg, per = self._eval_object_split(split, scans, paths, gts,
                                               kept_ids, kept_idx, extra)
        elif self.cfg.dataset == "r2r_back" and \
                split.episodes.midstop is not None:
            from vln_imagine_tpu.variants import eval_batch_variant
            gt_mid = np.asarray(split.episodes.midstop)
            avg, per = eval_batch_variant(
                "r2r_back", np.asarray(self.tables.dist), np.asarray(scans),
                paths, gt_paths=gts,
                midstops=[(m if m >= 0 else None) for m in extra],
                gt_midstops=[int(gt_mid[b]) for b in kept_idx],
                instr_ids=kept_ids)
        elif self.cfg.dataset == "cvdn" and split.end_panos is not None:
            from vln_imagine_tpu.variants import eval_batch_variant
            avg, per = eval_batch_variant(
                "cvdn", np.asarray(self.tables.dist), np.asarray(scans),
                paths, gt_paths=gts,
                end_panos=[split.end_panos[b] for b in kept_idx],
                instr_ids=kept_ids)
        else:
            avg, per = eval_batch(np.asarray(self.tables.dist),
                                  np.asarray(scans), paths, gts, kept_ids)
        if write_outputs:
            # submit_<env>.json + individual_metrics_<env>.json
            # (main.py:410-421); the submission needs host graphs for real
            # viewpoint ids/poses
            from vln_imagine_tpu.eval.submission import (
                write_individual_metrics,
                write_submission,
            )
            write_individual_metrics(
                os.path.join(self.log_dir,
                             f"individual_metrics_{split.name}.json"), per)
            if self.graphs is not None:
                headings = np.asarray(split.episodes.start_heading)[kept_idx]
                prefix = "detail" if details else "submit"  # main_nav.py:384
                is_obj = (extra and
                          split.episodes.gt_obj_id is not None)
                write_submission(
                    os.path.join(self.log_dir,
                                 f"{prefix}_{split.name}.json"),
                    self.graphs, np.asarray(scans), paths, kept_ids, headings,
                    details=details or None,
                    pred_obj_ids=extra if is_obj else None)
        return avg

    def _eval_object_split(self, split, scans, paths, gts, kept_ids,
                           kept_idx, pred_objs):
        from vln_imagine_tpu.variants import eval_batch_variant

        gt_obj = np.asarray(split.episodes.gt_obj_id)
        obj_ids = np.asarray(self.tables.obj_ids)       # [S, N, Ko]
        obj_valid = np.asarray(self.tables.obj_valid)
        gt_objs, goal_vps = [], []
        for i, b in enumerate(kept_idx):
            g = int(gt_obj[b])
            gt_objs.append(g)
            visible = (obj_ids[scans[i]] == g) & obj_valid[scans[i]]
            vps = list(np.nonzero(np.any(visible, axis=-1))[0])
            # fall back to the annotated goal if the object table lacks it
            goal_vps.append(vps if vps else [gts[i][-1]])
        variant = self.cfg.dataset if self.cfg.dataset in ("reverie", "soon") \
            else "reverie"
        return eval_batch_variant(
            variant, np.asarray(self.tables.dist), np.asarray(scans), paths,
            gt_paths=gts, goal_viewpoints=goal_vps, pred_objs=pred_objs,
            gt_objs=gt_objs, instr_ids=kept_ids)

    # ------------------------------------------------------------------ loop
    def run(self, iters: int | None = None, log_every: int | None = None,
            max_failures: int = 3):
        """Training loop.  The reference has no failure handling (recovery is
        manual via --resume_file, SURVEY §5); here transient interval
        failures roll back to the latest checkpoint up to `max_failures`
        times before re-raising."""
        cfg = self.cfg
        iters = iters or cfg.train.iters
        log_every = log_every or cfg.train.log_every
        if self.state is None:
            self.setup()
        # seed the rollback target: without it, a first-interval failure
        # (e.g. the non-finite-loss guard firing before any save) would
        # "roll back" to nothing and keep training the poisoned in-memory
        # state for max_failures more intervals
        self.ckpt.save_latest(self.state)
        start = time.time()
        failures = 0
        # profiling: VLN_PROFILE_DIR=<dir> captures an XLA/TPU trace of the
        # first interval (inspect with tensorboard / xprof).  The reference
        # offers only a tic/toc Timer (utils/logger.py:28-57).
        profile_dir = os.environ.get("VLN_PROFILE_DIR")
        for idx in range(0, iters, log_every):
            interval = min(log_every, iters - idx)
            it = idx + interval
            try:
                if profile_dir and idx == 0:
                    with jax.profiler.trace(profile_dir):
                        train_metrics = self.train_interval(interval)
                else:
                    train_metrics = self.train_interval(interval)
                # numerical-health guard: a NaN/inf interval loss would not
                # raise on its own — once params are poisoned every later
                # step is garbage, so treat it as an interval failure and
                # take the same rollback path (checked once per interval at
                # the existing host sync; no per-step device syncs added).
                # Only loss metrics gate the rollback: an auxiliary metric
                # can be legitimately NaN for an interval (e.g. a mean over
                # an empty supervision subset) without touching params.
                bad = {k: v for k, v in train_metrics.items()
                       if "loss" in k and not np.isfinite(v)}
                if bad:
                    raise FloatingPointError(
                        f"non-finite training metrics {bad}")
                failures = 0
            except Exception as e:  # noqa: BLE001 - deliberate recovery scope
                failures += 1
                write_to_record_file(
                    f"[failure {failures}/{max_failures}] interval at iter "
                    f"{idx} failed: {type(e).__name__}: {e}",
                    self.record_file, verbose=True)
                if failures > max_failures:
                    raise
                try:
                    self.load_checkpoint("latest_dict")
                    write_to_record_file("rolled back to latest_dict",
                                         self.record_file, verbose=True)
                except Exception:
                    write_to_record_file(
                        "no checkpoint to roll back to; continuing with the "
                        "in-memory state", self.record_file, verbose=True)
                continue
            self.writer.add_scalars(train_metrics, it, prefix="loss")
            loss_str = f"iter {it}"
            for split in self.val_splits:
                score = self.validate(split)
                self.writer.add_scalars(score, it, prefix=split.name)
                loss_str += f", {split.name} " + ", ".join(
                    f"{k}: {v:.2f}" for k, v in score.items())
                if split.name.startswith("val_unseen"):
                    if it % 2000 == 0:
                        self.ckpt.save_snapshot(self.state, it, score["sr"],
                                                score["spl"], split.name)
                    self.ckpt.maybe_save_best(self.state, split.name, score)
            self.ckpt.save_latest(self.state)
            write_to_record_file(
                f"[{time.time() - start:.0f}s] {loss_str} | "
                + ", ".join(f"{k}={v:.4f}" for k, v in train_metrics.items()),
                self.record_file, verbose=True)
        return self.state
