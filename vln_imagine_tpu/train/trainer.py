"""HAMT fine-tune training: one jitted update step + host-side loop.

One call = one reference iteration (agent_cmt.py:799-832): under 'sample'
feedback an IL rollout (teacher forcing, weight ml_weight) plus an RL rollout
(sampled actions, A2C) share a single backward; under 'teacher' feedback only
the IL rollout runs.  Gradients for the navigator and the critic are taken
jointly (two optax states replace the reference's two torch optimizers), grads
clip at 40 for the navigator inside its optax chain, and the 3-stage warm-up
lives in the optimizer schedule (see train/optim.py).
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct

from vln_imagine_tpu.config import Config
from vln_imagine_tpu.envx.tables import EpisodeBatch, WorldTables
from vln_imagine_tpu.models.bert import Critic
from vln_imagine_tpu.models.hamt import HamtModel
from vln_imagine_tpu.train.optim import (
    freeze_module, plain_optimizer, warmup_variant4_optimizer)
from vln_imagine_tpu.train.rollout_hamt import rollout_hamt


@struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    opt_state: Any
    critic_params: Any
    critic_opt_state: Any


class HamtTrainer:
    def __init__(self, cfg: Config, tables: WorldTables, rng=None):
        self.cfg = cfg
        self.model = HamtModel(cfg.model, feat_dropout=cfg.train.feat_dropout)
        self.critic = Critic(cfg.model)
        self.tables = tables
        if cfg.train.experimental_warmup and \
                cfg.train.experimental_warmup_type == "variant4" and \
                cfg.model.imagine_enc_pano and cfg.model.use_cosine_aux_loss:
            self._tx_builder = warmup_variant4_optimizer(
                cfg.train.lr, cfg.train.iters, cfg.train.optim,
                cfg.train.max_grad_norm,
                stage1_iters=cfg.train.warmup_stage1_iters,
                stage2_iters=cfg.train.warmup_stage2_iters,
                weight_decay=cfg.train.weight_decay)
        else:
            tx = plain_optimizer(cfg.train.lr, cfg.train.optim,
                                 cfg.train.max_grad_norm,
                                 weight_decay=cfg.train.weight_decay)
            self._tx_builder = lambda params: tx
        if cfg.model.e2e_imagination == "frozen":
            inner_builder = self._tx_builder
            self._tx_builder = lambda params: freeze_module(
                inner_builder(params), "imagine_vit")
        self.critic_tx = plain_optimizer(cfg.train.lr, cfg.train.optim,
                                         max_grad_norm=None)
        self.tx = None
        self._rng = rng if rng is not None else jax.random.PRNGKey(
            cfg.train.seed)

    # ------------------------------------------------------------------ init
    def init_state(self, example_ep: EpisodeBatch) -> TrainState:
        rng, self._rng = jax.random.split(self._rng)
        ep1 = jax.tree.map(lambda x: x[:1], example_ep)
        variables = _init_params(self.model, self.cfg, self.tables, ep1, rng)
        critic_vars = self.critic.init(
            rng, jnp.zeros((1, self.cfg.model.hidden_size)))
        self.tx = self._tx_builder(variables)
        return TrainState(
            step=jnp.zeros([], jnp.int32),
            params=variables,
            opt_state=self.tx.init(variables),
            critic_params=critic_vars,
            critic_opt_state=self.critic_tx.init(critic_vars),
        )

    # ------------------------------------------------------------- train step
    def make_train_step(self, feedback: str = "sample", donate: bool = True):
        cfg, model, critic, tables = self.cfg, self.model, self.critic, self.tables
        tx, critic_tx = self.tx, self.critic_tx
        assert tx is not None, "call init_state first"
        ml_w = cfg.train.ml_weight
        teacher_w = cfg.train.teacher_weight
        # teacher-forced rollouts stop by the end of the annotated path, so
        # they need only max_gt_path_len scan steps (the reference's
        # early-exit `break`, agent_cmt.py:658-659); cvdn supervises with
        # shortest paths of unbounded annotated length
        t_il = (cfg.env.max_action_len if cfg.dataset == "cvdn"
                else min(cfg.env.max_gt_path_len, cfg.env.max_action_len))

        def loss_fn(params, critic_params, ep_il, ep_rl, rng):
            r1, r2 = jax.random.split(rng)
            metrics = {}
            loss = 0.0
            if feedback == "teacher":
                res = rollout_hamt(model, critic, params, critic_params,
                                   tables, ep_il, cfg, r1,
                                   feedback="teacher", train_ml=teacher_w,
                                   train_rl=False, deterministic=False,
                                   max_steps=t_il)
                loss += res.loss
                metrics.update(ml_loss=res.ml_loss, aux_loss=res.aux_loss,
                               rl_loss=jnp.asarray(0.0),
                               entropy=jnp.asarray(0.0))
            elif feedback == "sample":
                if ml_w != 0 and cfg.train.fused_sample_rollout:
                    # one fused batch-2B rollout: teacher-forced IL half +
                    # sampled A2C half, losses identical to the two-rollout
                    # path per half (see TrainConfig.fused_sample_rollout
                    # for when this pays off)
                    ep = jax.tree.map(
                        lambda a, b: jnp.concatenate([a, b], 0), ep_il, ep_rl)
                    il_m = jnp.concatenate(
                        [jnp.ones(ep_il.batch, bool),
                         jnp.zeros(ep_rl.batch, bool)])
                    res = rollout_hamt(model, critic, params, critic_params,
                                       tables, ep, cfg, r1,
                                       feedback="mixed", train_ml=ml_w,
                                       train_rl=True, deterministic=False,
                                       il_mask=il_m)
                    loss += res.loss
                    metrics.update(ml_loss=res.ml_loss, aux_loss=res.aux_loss,
                                   rl_loss=res.rl_loss,
                                   entropy=res.entropy_sum)
                    return loss, metrics
                if ml_w != 0:
                    res_il = rollout_hamt(model, critic, params, critic_params,
                                          tables, ep_il, cfg, r1,
                                          feedback="teacher", train_ml=ml_w,
                                          train_rl=False, deterministic=False,
                                          max_steps=t_il)
                    loss += res_il.loss
                    metrics.update(ml_loss=res_il.ml_loss,
                                   aux_loss=res_il.aux_loss)
                res_rl = rollout_hamt(model, critic, params, critic_params,
                                      tables, ep_rl, cfg, r2,
                                      feedback="sample", train_ml=None,
                                      train_rl=True, deterministic=False)
                loss += res_rl.loss
                metrics.update(rl_loss=res_rl.rl_loss,
                               entropy=res_rl.entropy_sum)
            else:
                raise ValueError(feedback)
            return loss, metrics

        # donate the state: params + two optimizer states are ~3x model size
        # of HBM traffic per step that XLA can update in place (13% step-time
        # win at reference scale); callers must treat the passed-in state as
        # consumed, or build the step with donate=False
        @functools.partial(jax.jit, donate_argnums=(0,) if donate else ())
        def train_step(state: TrainState, ep_il: EpisodeBatch,
                       ep_rl: EpisodeBatch, rng):
            (loss, metrics), (g_model, g_critic) = jax.value_and_grad(
                loss_fn, argnums=(0, 1), has_aux=True)(
                state.params, state.critic_params, ep_il, ep_rl, rng)
            updates, opt_state = tx.update(g_model, state.opt_state,
                                           state.params)
            params = optax.apply_updates(state.params, updates)
            c_updates, c_opt_state = critic_tx.update(
                g_critic, state.critic_opt_state, state.critic_params)
            critic_params = optax.apply_updates(state.critic_params, c_updates)
            metrics["loss"] = loss
            metrics["grad_norm"] = optax.global_norm(g_model)
            return TrainState(
                step=state.step + 1, params=params, opt_state=opt_state,
                critic_params=critic_params, critic_opt_state=c_opt_state,
            ), metrics

        return train_step

    # ------------------------------------------------------------------ eval
    def make_eval_step(self):
        cfg, model, critic, tables = self.cfg, self.model, self.critic, self.tables
        use_obj = (cfg.model.obj_feat_size > 0
                   and tables.obj_feat is not None)

        @jax.jit
        def eval_step(params, ep: EpisodeBatch, rng):
            res = rollout_hamt(model, critic, params, None, tables, ep, cfg,
                               rng, feedback="argmax", train_ml=None,
                               train_rl=False, deterministic=True,
                               early_exit=True)
            if use_obj:
                # REVERIE/SOON: the grounded object id per item (for RGS)
                return res.path_nodes, res.path_len, res.pred_obj
            if cfg.dataset == "r2r_back":
                # the declared midstop node (-1 when never declared), scored
                # by eval_item_r2r_back (R2RBackBatch._eval_item env.py:480)
                return res.path_nodes, res.path_len, res.midstop
            return res.path_nodes, res.path_len

        return eval_step


def _init_params(model: HamtModel, cfg: Config, tables: WorldTables,
                 ep1: EpisodeBatch, rng):
    """Initialize every mode's parameters with one tiny tracing pass."""
    from vln_imagine_tpu.envx import env as envx

    mcfg, ecfg = cfg.model, cfg.env
    state = envx.reset(tables, ep1, ecfg.max_action_len)
    obs = envx.observe_hamt(tables, ep1, state, mcfg.angle_feat_size)

    def init_all(mdl):
        txt = mdl.language(ep1.txt_ids, ep1.txt_mask)
        h0 = mdl.history_initial(1)
        hist_buf = h0[:, None, :]
        hist_mask = jnp.ones((1, 1), bool)
        imagine = None
        if mcfg.imagine_enc_pano:
            imag_in = (ep1.imagine_images if mcfg.e2e_imagination != "off"
                       else ep1.imagine_feats)
            imagine = mdl.imagine(imag_in, ep1.imagine_mask)
            if mcfg.use_cosine_aux_loss:
                _, imagine = mdl.align_with_contrastive_loss(
                    txt, ep1.txt_mask, imagine, ep1.imagine_mask,
                    ep1.np_weights)
        hist_img, pano_img, pano_ang, prev_ang = envx.history_inputs(
            tables, ep1, state, jnp.zeros((1,), jnp.int32),
            mcfg.angle_feat_size)
        mdl.history_step(hist_img, prev_ang, 0, pano_img, pano_ang)
        obj_kw = {}
        if mcfg.obj_feat_size > 0 and tables.obj_feat is not None:
            obj_kw = dict(obj_img_feats=obs.obj_img,
                          obj_ang_feats=obs.obj_ang, obj_valid=obs.obj_valid)
        mdl.visual(txt, ep1.txt_mask, hist_buf, hist_mask, obs.img, obs.ang,
                   obs.nav_types, obs.valid, imagine_embeds=imagine,
                   imagine_mask=ep1.imagine_mask, **obj_kw)
        return None

    return model.init(rng, method=init_all)
