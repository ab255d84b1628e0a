"""DUET fine-tune training: jitted update step.

One call = one reference iteration (VLN-DUET/map_nav_src/r2r/agent_base.py:
185-231): train_alg 'imitation' runs a single teacher-forced rollout;
'dagger' (released R2R config) adds a student-sampled rollout supervised by
the SPL-optimal expert with weight 1.  train_alg 'rl' adds an IL rollout plus
a sampled A2C rollout with a critic — the reference declares this dispatch
and a Critic but its rollout ignores `train_rl` (the branch is inert); here
it is a working A2C (see rollout_duet).
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct

from vln_imagine_tpu.config import Config
from vln_imagine_tpu.envx import env as envx
from vln_imagine_tpu.envx.tables import EpisodeBatch, WorldTables
from vln_imagine_tpu.models.bert import Critic
from vln_imagine_tpu.models.duet import DuetModel
from vln_imagine_tpu.train.optim import (
    freeze_module, plain_optimizer, warmup_variant4_optimizer)
from vln_imagine_tpu.train.rollout_duet import rollout_duet


@struct.dataclass
class DuetTrainState:
    step: jnp.ndarray
    params: Any
    opt_state: Any
    critic_params: Any = None      # train_alg='rl' only
    critic_opt_state: Any = None


class DuetTrainer:
    def __init__(self, cfg: Config, tables: WorldTables, rng=None):
        self.cfg = cfg
        self.model = DuetModel(cfg.model, feat_dropout=cfg.train.feat_dropout)
        self.critic = Critic(cfg.model)
        self.critic_tx = plain_optimizer(cfg.train.lr, cfg.train.optim,
                                         max_grad_norm=None)
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
        self.tx = None
        self._rng = rng if rng is not None else jax.random.PRNGKey(
            cfg.train.seed)

    def init_state(self, example_ep: EpisodeBatch) -> DuetTrainState:
        rng, self._rng = jax.random.split(self._rng)
        ep1 = jax.tree.map(lambda x: x[:1], example_ep)
        params = _init_duet_params(self.model, self.cfg, self.tables, ep1, rng)
        self.tx = self._tx_builder(params)
        critic_params = critic_opt_state = None
        if self.cfg.train.train_alg == "rl":
            critic_params = self.critic.init(
                rng, jnp.zeros((1, self.cfg.model.hidden_size)))
            critic_opt_state = self.critic_tx.init(critic_params)
        return DuetTrainState(step=jnp.zeros([], jnp.int32), params=params,
                              opt_state=self.tx.init(params),
                              critic_params=critic_params,
                              critic_opt_state=critic_opt_state)

    def make_train_step(self, donate: bool = True):
        cfg, model, tables = self.cfg, self.model, self.tables
        critic, critic_tx = self.critic, self.critic_tx
        tx = self.tx
        assert tx is not None
        alg = cfg.train.train_alg
        ml_w = cfg.train.ml_weight
        if alg == "rl" and cfg.train.gamma == 0.0:
            # the DUET presets inherit gamma=0 from the released dagger
            # config; with it the A2C returns collapse to one-step rewards
            raise ValueError(
                "train_alg='rl' needs a nonzero discount: set "
                "cfg.train.gamma (HAMT uses 0.9)")
        t_il = (cfg.env.max_action_len if cfg.dataset == "cvdn"
                else min(cfg.env.max_gt_path_len, cfg.env.max_action_len))

        def loss_fn(params, critic_params, ep_il, ep_student, rng):
            r1, r2 = jax.random.split(rng)
            metrics = {}
            loss = 0.0
            if alg == "imitation":
                res = rollout_duet(model, params, tables, ep_il, cfg, r1,
                                   feedback="teacher", train_ml=1.0,
                                   deterministic=False, max_steps=t_il)
                loss += res.loss
                metrics.update(ml_loss=res.ml_loss, aux_loss=res.aux_loss)
            elif alg == "dagger":
                if ml_w != 0:
                    res_il = rollout_duet(model, params, tables, ep_il, cfg,
                                          r1, feedback="teacher",
                                          train_ml=ml_w, deterministic=False,
                                          max_steps=t_il)
                    loss += res_il.loss
                    metrics.update(ml_loss=res_il.ml_loss,
                                   aux_loss=res_il.aux_loss)
                dg_fb = ("expl_sample" if cfg.train.expl_sample
                         else "sample")  # agent_base.py:211
                res_dg = rollout_duet(model, params, tables, ep_student, cfg,
                                      r2, feedback=dg_fb, train_ml=1.0,
                                      deterministic=False)
                loss += res_dg.loss
                metrics.update(dagger_loss=res_dg.ml_loss,
                               entropy=res_dg.entropy_sum)
            elif alg == "rl":
                if ml_w != 0:
                    res_il = rollout_duet(model, params, tables, ep_il, cfg,
                                          r1, feedback="teacher",
                                          train_ml=ml_w, deterministic=False,
                                          max_steps=t_il)
                    loss += res_il.loss
                    metrics.update(ml_loss=res_il.ml_loss,
                                   aux_loss=res_il.aux_loss)
                res_rl = rollout_duet(model, params, tables, ep_student, cfg,
                                      r2, feedback="sample", train_ml=None,
                                      deterministic=False, critic=critic,
                                      critic_params=critic_params,
                                      train_rl=True)
                loss += res_rl.loss
                metrics.update(rl_loss=res_rl.rl_loss,
                               entropy=res_rl.entropy_sum)
            else:
                raise ValueError(alg)
            return loss, metrics

        donate_args = (0,) if donate else ()
        if alg == "rl":
            # state donation: in-place param/opt-state update (see trainer.py)
            @functools.partial(jax.jit, donate_argnums=donate_args)
            def train_step(state: DuetTrainState, ep_il, ep_student, rng):
                (loss, metrics), (g_model, g_critic) = jax.value_and_grad(
                    loss_fn, argnums=(0, 1), has_aux=True)(
                    state.params, state.critic_params, ep_il, ep_student, rng)
                updates, opt_state = tx.update(g_model, state.opt_state,
                                               state.params)
                params = optax.apply_updates(state.params, updates)
                c_updates, c_opt_state = critic_tx.update(
                    g_critic, state.critic_opt_state, state.critic_params)
                critic_params = optax.apply_updates(state.critic_params,
                                                    c_updates)
                metrics["loss"] = loss
                metrics["grad_norm"] = optax.global_norm(g_model)
                return DuetTrainState(
                    step=state.step + 1, params=params, opt_state=opt_state,
                    critic_params=critic_params,
                    critic_opt_state=c_opt_state), metrics
        else:
            @functools.partial(jax.jit, donate_argnums=donate_args)
            def train_step(state: DuetTrainState, ep_il, ep_student, rng):
                (loss, metrics), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(state.params, None, ep_il,
                                           ep_student, rng)
                updates, opt_state = tx.update(grads, state.opt_state,
                                               state.params)
                params = optax.apply_updates(state.params, updates)
                metrics["loss"] = loss
                metrics["grad_norm"] = optax.global_norm(grads)
                return DuetTrainState(step=state.step + 1, params=params,
                                      opt_state=opt_state), metrics

        return train_step

    def make_eval_step(self, detailed: bool = False):
        """detailed: also return the final per-gmap-node stop table
        (--detailed_output, agent.py:597-601) as one trailing
        (nodes, scores, valid) element."""
        cfg, model, tables = self.cfg, self.model, self.tables
        use_obj = (cfg.model.obj_feat_size > 0
                   and tables.obj_feat is not None)

        @jax.jit
        def eval_step(params, ep: EpisodeBatch, rng):
            res = rollout_duet(model, params, tables, ep, cfg, rng,
                               feedback="argmax", train_ml=None,
                               deterministic=True, early_exit=True)
            out = (res.path_nodes, res.path_len)
            if use_obj:
                # REVERIE/SOON: the grounded object id per item (for RGS)
                out = out + (res.pred_obj,)
            if detailed:
                out = out + ((res.stop_nodes, res.stop_scores,
                              res.stop_valid),)
            return out

        return eval_step


def _init_duet_params(model: DuetModel, cfg: Config, tables: WorldTables,
                      ep1: EpisodeBatch, rng):
    from vln_imagine_tpu.envx import gmap as G

    mcfg, ecfg = cfg.model, cfg.env
    state = envx.reset(tables, ep1, ecfg.max_action_len)
    obs = envx.observe_duet(tables, ep1, state, mcfg.angle_feat_size)
    B = 1
    H = mcfg.hidden_size
    Gcap = ecfg.max_gmap_nodes
    Tp = obs.img.shape[1]

    def init_all(mdl):
        txt = mdl.text(ep1.txt_ids, ep1.txt_mask)
        imagine = None
        if mcfg.imagine_enc_pano:
            imag_in = (ep1.imagine_images if mcfg.e2e_imagination != "off"
                       else ep1.imagine_feats)
            imagine = mdl.imagine(imag_in)
            if mcfg.use_cosine_aux_loss:
                _, imagine = mdl.align_with_contrastive_loss(
                    txt, ep1.txt_mask, imagine, ep1.imagine_mask,
                    ep1.np_weights)
        pano = mdl.panorama_per_step(obs.img, obs.loc, obs.nav_types,
                                     obs.valid)
        mdl.navigation_per_step(
            txt, ep1.txt_mask,
            jnp.zeros((B, Gcap + 1, H), pano.dtype),
            jnp.zeros((B, Gcap + 1), jnp.int32),
            jnp.zeros((B, Gcap + 1, mcfg.angle_feat_size + 3)),
            jnp.ones((B, Gcap + 1), bool),
            jnp.zeros((B, Gcap + 1, Gcap + 1)),
            jnp.zeros((B, Gcap + 1), bool),
            jnp.concatenate([jnp.zeros((B, 1, H), pano.dtype), pano], 1),
            jnp.zeros((B, Tp + 1, 14)),
            jnp.ones((B, Tp + 1), bool),
            jnp.ones((B, Tp + 1), bool),
            jnp.zeros((B, Gcap + 1, Tp + 1), bool),
            imagine_embeds=imagine, imagine_mask=ep1.imagine_mask,
            vp_obj_valid=(jnp.zeros((B, Tp + 1), bool)
                          if mcfg.obj_feat_size > 0 else None))
        return None

    del G
    return model.init(rng, method=init_all)
