"""Batched HAMT episode rollout as one XLA program.

The reference's rollout (VLN-HAMT/finetune_src/r2r/agent_cmt.py:371-759) is a
python loop that alternates host-side feature packing, per-item C++ simulator
calls, and CUDA forwards.  Here the whole episode — language/imagine/align
prologue, per-step visual forward, action selection, history update, env
transition, reward shaping, and the A2C backward pass — is a pure function of
arrays, with the time axis expressed as jax.lax.scan, so train and eval each
compile to a single program.

Semantics parity notes:
- teacher CE uses sum reduction then * ml_weight / batch
  (agent_cmt.py:105,547,747)
- items that pick STOP still append one history token but freeze afterwards
  (:586-609); hist length counting matches :607-609
- RL reward shaping: +-2 terminal w/ nDTW bonus, +-1 move shaping with
  delta-nDTW, near-miss penalty (:615-653); the partial-path nDTW uses the
  incremental DTW row from envx.env
- A2C: discounted returns seeded with the critic value of the final state for
  unfinished items, 0.5 L2 critic loss, entropy bonus under 'sample'
  (:661-744)
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from vln_imagine_tpu.config import Config
from vln_imagine_tpu.envx import env as envx
from vln_imagine_tpu.envx.tables import EnvState, EpisodeBatch, WorldTables
from vln_imagine_tpu.models.bert import Critic
from vln_imagine_tpu.models.hamt import HamtModel
from vln_imagine_tpu.ops.masks import LOGIT_NEG_INF


class RolloutResult(NamedTuple):
    loss: jnp.ndarray            # scalar total loss (IL + RL + aux)
    ml_loss: jnp.ndarray         # scalar
    rl_loss: jnp.ndarray         # scalar
    aux_loss: jnp.ndarray        # scalar cosine contrastive loss
    path_nodes: jnp.ndarray      # [B, T+1]
    path_len: jnp.ndarray        # [B]
    logits: jnp.ndarray          # [T, B, T_obs]
    actions: jnp.ndarray         # [T, B]
    entropy_sum: jnp.ndarray     # scalar (log metric)
    midstop: jnp.ndarray = None  # [B] i32 declared midstop (r2r_back; -1 none)
    og_loss: jnp.ndarray = None  # scalar REVERIE grounding CE
    pred_obj: jnp.ndarray = None  # [B] i32 predicted object id at stop (-1)


def _select_action(logits, valid, teacher, feedback: str, rng, il_mask=None):
    """Action slot per feedback mode (agent_cmt.py:560-577).

    'mixed' packs a teacher-forced IL half and a sampled RL half into one
    fused batch: items with il_mask take the teacher action, the rest
    sample (one rollout instead of two sequential ones per train step)."""
    if feedback == "teacher":
        return teacher, jnp.zeros(logits.shape[:1]), jnp.zeros(logits.shape[:1])
    logp = jax.nn.log_softmax(
        jnp.where(valid, logits, LOGIT_NEG_INF).astype(jnp.float32), axis=-1)
    probs = jnp.exp(logp)
    entropy = -jnp.sum(jnp.where(valid, probs * logp, 0.0), axis=-1)
    if feedback == "argmax":
        a = jnp.argmax(logp, axis=-1)
    elif feedback == "sample":
        a = jax.random.categorical(rng, logp, axis=-1)
    elif feedback == "mixed":
        a = jnp.where(il_mask, teacher,
                      jax.random.categorical(rng, logp, axis=-1))
    else:
        raise ValueError(feedback)
    chosen_logp = jnp.take_along_axis(
        logp, jnp.clip(a, 0, logp.shape[1] - 1)[:, None], axis=1)[:, 0]
    return a.astype(jnp.int32), chosen_logp, entropy


def rollout_hamt(
    model: HamtModel,
    critic: Critic,
    params: Any,
    critic_params: Any,
    tables: WorldTables,
    ep: EpisodeBatch,
    cfg: Config,
    rng: jax.Array,
    feedback: str = "teacher",
    train_ml: float | None = 1.0,
    train_rl: bool = False,
    deterministic: bool = True,
    max_steps: int | None = None,
    early_exit: bool = False,
    il_mask: jax.Array | None = None,
    unroll: bool = False,
) -> RolloutResult:
    if feedback in ("teacher", "argmax"):
        train_rl = False
    if feedback == "mixed":
        assert il_mask is not None, "feedback='mixed' needs il_mask"
    else:
        il_mask = None
    il_m = il_mask  # [B] bool: True = teacher-forced IL item (fused batch)
    mcfg, tcfg, ecfg = cfg.model, cfg.train, cfg.env
    B = ep.batch
    T = max_steps or ecfg.max_action_len
    K = tables.max_candidates
    ignore = tcfg.ignoreid
    # r2r_back (Seq2SeqBackAgent, agent_r2rback.py:100-276): the first stop
    # records the midstop and the episode continues; the second stop ends it.
    # Reward distances target the midstop until the first stop, then the
    # return destination (the 2-tuple 'distance' in R2RBackBatch._get_obs).
    two_phase = cfg.dataset == "r2r_back" and ep.midstop is not None
    # REVERIE object grounding (NavRefCMTAgent, reverie/agent.py:141-165,
    # 271-304): per-step ref CE supervised at the goal viewpoint, predicted
    # object recorded when the item stops
    use_obj = (mcfg.obj_feat_size > 0 and tables.obj_feat is not None
               and ep.gt_obj_id is not None)

    def apply(method, *args, rngs_key=None, **kw):
        rngs = {"dropout": rngs_key} if rngs_key is not None else None
        return model.apply(params, *args, method=method, rngs=rngs,
                           deterministic=deterministic, **kw)

    rng, r_lang, r_imag, r_align, r_hist0 = jax.random.split(rng, 5)

    # ---- per-episode prologue (once; agent_cmt.py:392-496) -----------------
    txt_embeds = apply(HamtModel.language, ep.txt_ids, ep.txt_mask,
                       rngs_key=r_lang)
    # NavRef (objects + no_lang_ca): HamtModel.language already returns the
    # broadcast-final-output stack (vlnbert_navref.py text semantics)
    aux_loss = jnp.asarray(0.0)
    imagine_embeds = None
    if mcfg.imagine_enc_pano:
        imag_in = (ep.imagine_images if mcfg.e2e_imagination != "off"
                   else ep.imagine_feats)
        if imag_in is None:
            if mcfg.e2e_imagination != "off":
                raise ValueError(
                    "e2e_imagination is on but EpisodeBatch.imagine_images "
                    "is None — load raw images (RawImaginationImageBank / "
                    "synthetic_episodes(imagine_image_size=...))")
            raise ValueError(
                "imagine_enc_pano is on but EpisodeBatch.imagine_feats is "
                "None — load precomputed imagination features "
                "(ImaginationImageFeaturesDB) or disable imagination")
        imagine_embeds = apply(HamtModel.imagine, imag_in,
                               ep.imagine_mask, rngs_key=r_imag)
        if mcfg.use_cosine_aux_loss:
            # fused batches: per-half normalization + same-half negatives,
            # reproducing the reference's one-aux-call-per-rollout accumulation
            groups = (None if il_m is None
                      else (~il_m).astype(jnp.int32))
            aux_loss, imagine_embeds = apply(
                HamtModel.align_with_contrastive_loss, txt_embeds, ep.txt_mask,
                imagine_embeds, ep.imagine_mask, ep.np_weights,
                rngs_key=r_align, groups=groups)

    h0 = apply(HamtModel.history_initial, B, rngs_key=r_hist0)
    hist_buf = jnp.zeros((B, T + 1, mcfg.hidden_size), h0.dtype)
    hist_buf = hist_buf.at[:, 0].set(h0)
    hist_len = jnp.ones((B,), jnp.int32)

    state0 = envx.reset(tables, ep, T)
    dtw_row0 = envx.dtw_init(tables, ep)
    last_dist0 = envx.distance_to_goal(tables, ep, state0.node)
    last_ndtw0 = envx.dtw_ndtw(dtw_row0, ep, ecfg.error_margin)

    def visual_forward(st: EnvState, h_buf, h_len, rkey):
        obs = envx.observe_hamt(tables, ep, st, mcfg.angle_feat_size)
        if ecfg.ob_type == "cand":
            # candidates + [STOP] only: the unclaimed pano views drop out of
            # the observation stream (agent_cmt.py:502 _candidate_variable)
            obs = obs._replace(valid=obs.valid & (obs.nav_types != 0))
        obj_kw = {}
        if use_obj:
            obj_kw = dict(obj_img_feats=obs.obj_img,
                          obj_ang_feats=obs.obj_ang, obj_valid=obs.obj_valid,
                          obj_pos_feats=obs.obj_pos)
        h_mask = jnp.arange(T + 1)[None, :] < h_len[:, None]
        out = apply(HamtModel.visual, txt_embeds, ep.txt_mask, h_buf, h_mask,
                    obs.img, obs.ang, obs.nav_types, obs.valid,
                    imagine_embeds=imagine_embeds, imagine_mask=ep.imagine_mask,
                    rngs_key=rkey, **obj_kw)
        return obs, out

    def step_fn(carry, t):
        (st, h_buf, h_len, dtw_row, last_dist, last_ndtw, first_ended,
         midstop_pred, obj_pred, ml_acc, og_acc, ent_acc, key) = carry
        key, k_vis, k_act, k_hist = jax.random.split(key, 4)

        obs, out = visual_forward(st, h_buf, h_len, k_vis)
        # CVDN/NDH supervises with the shortest path to the sampled goal
        # (cvdn env stores endpoints only); others follow the annotated path
        teacher = envx.teacher_hamt(tables, ep, st, t, ignore,
                                    shortest_teacher=(cfg.dataset == "cvdn"))

        # IL: summed CE with ignore index from the UNMASKED logits — the
        # reference computes ml_loss before the no_cand_backtrack
        # masked_fill_ (agent_cmt.py:547 vs :549-558): under
        # feedback='sample' the teacher can legitimately target a visited
        # candidate once the agent strays (and always does in r2r_back's
        # return phase), so masking first would inject ~1e9-scale CE terms
        if train_ml is not None:
            logp = jax.nn.log_softmax(out.act_logits.astype(jnp.float32), -1)
            tgt = jnp.clip(teacher, 0, logp.shape[1] - 1)
            ce = -jnp.take_along_axis(logp, tgt[:, None], axis=1)[:, 0]
            ce_skip = teacher == ignore
            if il_m is not None:
                ce_skip = ce_skip | ~il_m   # CE supervises the IL half only
            ml_acc = ml_acc + jnp.sum(jnp.where(ce_skip, 0.0, ce))

        if tcfg.no_cand_backtrack:
            # mask candidates leading to already-visited nodes (incl. the
            # current one) for action selection / RL log-probs only,
            # agent_cmt.py:549-558; LOGIT_NEG_INF instead of the reference's
            # -inf keeps sampling entropy finite (softmax still gives
            # exactly-zero probability in f32); the [STOP] slot stays open
            cand_nodes = tables.adj[ep.scan[:, None],
                                    st.node[:, None],
                                    jnp.arange(K)[None, :]]       # [B, K]
            pos_ok = (jnp.arange(st.path_nodes.shape[1])[None, :]
                      < st.path_len[:, None])                     # [B, P]
            bt = jnp.any((st.path_nodes[:, None, :] == cand_nodes[:, :, None])
                         & pos_ok[:, None, :], axis=-1)           # [B, K]
            T_obs = out.act_logits.shape[1]
            bt_full = jnp.pad(bt, ((0, 0), (0, T_obs - K)))
            out = out._replace(
                act_logits=jnp.where(bt_full, LOGIT_NEG_INF,
                                     out.act_logits))

        a_t, logp_a, entropy = _select_action(
            out.act_logits, (obs.nav_types != 0) & obs.valid, teacher,
            feedback, k_act, il_mask=il_m)
        ent_skip = st.ended if il_m is None else (st.ended | il_m)
        ent_acc = ent_acc + jnp.sum(jnp.where(ent_skip, 0.0, entropy))

        # stop selected this step / teacher says ignore
        stop_sel = ((a_t == obs.stop_slot) | (a_t == ignore)) & ~st.ended
        is_stop = stop_sel | st.ended
        a_env = jnp.where(is_stop, K, a_t).astype(jnp.int32)

        if use_obj:
            # ref CE when the teacher stops here (= at the goal viewpoint,
            # reverie/agent.py:150-158); predicted object recorded the step
            # the item stops, incl. the forced stop at t == T-1 (:299-304)
            gt_match = (obs.obj_ids == ep.gt_obj_id[:, None]) & obs.obj_valid
            has_gt = jnp.any(gt_match, axis=1)
            gt_k = jnp.argmax(gt_match, axis=1)
            og_logp = jax.nn.log_softmax(
                jnp.where(obs.obj_valid, out.obj_logits,
                          LOGIT_NEG_INF).astype(jnp.float32), axis=-1)
            if train_ml is not None:
                sup = (teacher == obs.stop_slot) & ~st.ended & has_gt
                if il_m is not None:
                    sup = sup & il_m  # grounding CE covers the IL half only
                og_ce = -jnp.take_along_axis(og_logp, gt_k[:, None], 1)[:, 0]
                og_acc = og_acc + jnp.sum(jnp.where(sup, og_ce, 0.0))
            any_obj = jnp.any(obs.obj_valid, axis=1)
            best_id = jnp.take_along_axis(
                obs.obj_ids, jnp.argmax(og_logp, axis=1)[:, None], 1)[:, 0]
            stopping = stop_sel | ((t == T - 1) & ~st.ended)
            obj_pred = jnp.where(stopping & any_obj, best_id, obj_pred)

        if two_phase:
            midstop_pred = jnp.where(stop_sel & ~first_ended, st.node,
                                     midstop_pred)

        # history token for time t (appended before the env transition)
        hist_img, pano_img, pano_ang, prev_ang = envx.history_inputs(
            tables, ep, st, jnp.where(is_stop, -1, a_env), mcfg.angle_feat_size)
        h_tok = apply(HamtModel.history_step, hist_img, prev_ang, t,
                      pano_img, pano_ang, rngs_key=k_hist)
        write_pos = h_len
        grow = ~st.ended  # just-stopped items still record one token (:607-609)
        h_buf = jnp.where(
            ((jnp.arange(T + 1)[None, :] == write_pos[:, None]) & grow[:, None]
             )[:, :, None],
            h_tok[:, None, :], h_buf)
        h_len = jnp.where(grow, h_len + 1, h_len)

        ended_pre = st.ended
        st2 = envx.step_hamt(tables, ep, st, a_env)
        if two_phase:
            # first stop records the midstop but keeps going (:275-276)
            ended_new = ended_pre | (stop_sel & first_ended)
            st2 = st2.replace(ended=ended_new)
        moved = ~is_stop & ~ended_pre

        if train_rl:
            # reward shaping on the updated pose (agent_cmt.py:615-653);
            # r2r_back targets the midstop first, then the return destination.
            # Statically skipped for IL/eval rollouts — the DTW/distance work
            # would otherwise stay live through the scan carry.
            if two_phase:
                phase_goal = jnp.where(first_ended, ep.goal, ep.midstop)
                dist = tables.dist[ep.scan, st2.node, phase_goal]
            else:
                dist = envx.distance_to_goal(tables, ep, st2.node)
            new_row = envx.dtw_push(tables, ep, dtw_row, st2.node)
            dtw_row = jnp.where(moved[:, None], new_row, dtw_row)
            ndtw = envx.dtw_ndtw(dtw_row, ep, ecfg.error_margin)
            stop_rew = jnp.where(dist < 3.0, 2.0 + ndtw * 2.0, -2.0)
            delta = -(dist - last_dist)
            ndtw_rew = ndtw - last_ndtw
            move_rew = jnp.where(delta > 0.0, 1.0 + ndtw_rew,
                                 jnp.where(delta < 0.0, -1.0 + ndtw_rew, 0.0))
            move_rew = move_rew - jnp.where(
                (last_dist <= 1.0) & (dist - last_dist > 0.0),
                (1.0 - last_dist) * 2.0, 0.0)
            reward = jnp.where(ended_pre, 0.0,
                               jnp.where(is_stop, stop_rew, move_rew))
            if two_phase:
                # failing to reach the midstop ends the episode (:252)
                st2 = st2.replace(ended=st2.ended
                                  | (stop_sel & ~first_ended & (dist >= 3.0)))
            last_dist = jnp.where(ended_pre, last_dist, dist)
            last_ndtw = jnp.where(moved, ndtw, last_ndtw)
        else:
            reward = jnp.zeros((B,))
        mask = jnp.where(ended_pre, 0.0, 1.0)
        if il_m is not None:
            # RL terms (policy/critic/entropy) cover the sampled half only
            mask = mask * (~il_m)
        first_ended = first_ended | stop_sel

        carry = (st2, h_buf, h_len, dtw_row, last_dist, last_ndtw,
                 first_ended, midstop_pred, obj_pred, ml_acc, og_acc,
                 ent_acc, key)
        ys = (out.act_logits, a_t, logp_a, entropy, out.state, reward, mask)
        return carry, ys

    rng, k_scan = jax.random.split(rng)
    if two_phase:
        last_dist0 = tables.dist[ep.scan, state0.node, ep.midstop]
    carry0 = (state0, hist_buf, hist_len, dtw_row0, last_dist0, last_ndtw0,
              jnp.zeros((B,), bool), jnp.full((B,), -1, jnp.int32),
              jnp.full((B,), -1, jnp.int32),
              jnp.asarray(0.0), jnp.asarray(0.0), jnp.asarray(0.0), k_scan)
    if early_exit:
        # inference-only: a while_loop stops as soon as every episode has
        # ended (the reference's python `break`, agent_cmt.py:658-659),
        # skipping ~half the per-step forwards vs the fixed-T scan.  No
        # per-step ys are stacked, so this is not differentiable.
        assert train_ml is None and not train_rl, \
            "early_exit is for inference rollouts only"

        def cond_fn(tc):
            t, carry = tc
            return (t < T) & jnp.any(~carry[0].ended)

        def body_fn(tc):
            t, carry = tc
            carry, _ = step_fn(carry, t)
            return t + 1, carry

        _, carry = jax.lax.while_loop(
            cond_fn, body_fn, (jnp.asarray(0, jnp.int32), carry0))
        (stateT, _, _, _, _, _, _, midstop_pred, obj_pred, _, _, ent_acc,
         _) = carry
        loss = (mcfg.cosine_weight * aux_loss if mcfg.use_cosine_aux_loss
                else jnp.asarray(0.0))
        return RolloutResult(
            loss=loss, ml_loss=jnp.asarray(0.0), rl_loss=jnp.asarray(0.0),
            aux_loss=aux_loss, path_nodes=stateT.path_nodes,
            path_len=stateT.path_len, logits=None, actions=None,
            entropy_sum=ent_acc, midstop=midstop_pred,
            og_loss=jnp.asarray(0.0), pred_obj=obj_pred)

    # unroll: emit T copies of the step body instead of one while-loop body —
    # only used by bench.py's FLOP accounting (HLO cost analysis counts a
    # loop body ONCE regardless of trip count, so exact per-program FLOPs
    # need the unrolled graph); the compiled math is identical
    carry, ys = jax.lax.scan(step_fn, carry0, jnp.arange(T),
                             unroll=T if unroll else 1)
    (stateT, hist_bufT, hist_lenT, _, _, _, _, midstop_pred, obj_pred,
     ml_acc, og_acc, ent_acc, _) = carry
    logits_seq, actions, logps, entropys, states, rewards, masks = ys

    ml_loss = jnp.asarray(0.0)
    loss = mcfg.cosine_weight * aux_loss if mcfg.use_cosine_aux_loss else jnp.asarray(0.0)
    og_loss = jnp.asarray(0.0)
    if train_ml is not None:
        # per-rollout batch normalization (agent_cmt.py:747): in a fused
        # batch the CE divides by the IL half's size, not the full batch
        n_il = B if il_m is None else jnp.maximum(jnp.sum(il_m), 1)
        ml_loss = ml_acc * train_ml / n_il
        loss = loss + ml_loss
        if use_obj:
            # ref_loss / batch, unweighted by ml_weight (reverie/agent.py:449)
            og_loss = og_acc / n_il
            loss = loss + og_loss

    rl_loss = jnp.asarray(0.0)
    if train_rl:
        rng, k_last, k_cv, k_cs = jax.random.split(rng, 4)
        crngs = (None if deterministic else {"dropout": k_cv})
        _, last_out = visual_forward(stateT, hist_bufT, hist_lenT, k_last)
        last_value = jax.lax.stop_gradient(
            critic.apply(critic_params, last_out.state,
                         deterministic=deterministic, rngs=crngs))
        discount0 = jnp.where(stateT.ended, 0.0,
                              last_value.astype(jnp.float32))

        # one batched critic call over all T*B step states (instead of one
        # tiny MLP per reverse-scan iteration: same values, no sequential
        # critic chain in the compiled graph)
        T_, B_ = rewards.shape
        values = critic.apply(
            critic_params, states.reshape(T_ * B_, -1),
            deterministic=deterministic,
            rngs=None if deterministic else {"dropout": k_cs}
        ).astype(jnp.float32).reshape(T_, B_)

        def a2c_step(disc, ys_t):
            logp_t, v, reward_t, mask_t = ys_t
            disc = disc * tcfg.gamma + reward_t
            adv = jax.lax.stop_gradient(disc - v)
            pol = jnp.sum(-logp_t * adv * mask_t)
            cri = jnp.sum(((disc - v) ** 2) * mask_t) * 0.5
            step_loss = pol + cri
            return disc, step_loss

        # reverse-time A2C pass (agent_cmt.py:712-732)
        _, step_losses = jax.lax.scan(
            a2c_step, discount0, (logps, values, rewards, masks), reverse=True)
        rl_loss = jnp.sum(step_losses)
        if feedback in ("sample", "mixed"):
            rl_loss = rl_loss + jnp.sum(
                -tcfg.entropy_loss_weight * entropys * masks)
        total = jnp.sum(masks)
        n_rl = B if il_m is None else jnp.maximum(jnp.sum(~il_m), 1)
        if tcfg.normalize_loss == "total":
            rl_loss = rl_loss / jnp.maximum(total, 1.0)
        elif tcfg.normalize_loss == "batch":
            rl_loss = rl_loss / n_rl
        loss = loss + rl_loss

    return RolloutResult(
        loss=loss, ml_loss=ml_loss, rl_loss=rl_loss, aux_loss=aux_loss,
        path_nodes=stateT.path_nodes, path_len=stateT.path_len,
        logits=logits_seq, actions=actions, entropy_sum=ent_acc,
        midstop=midstop_pred, og_loss=og_loss, pred_obj=obj_pred)


def make_eval_fn(model, critic, tables, cfg):
    """Jitted greedy-eval rollout: params, episodes -> trajectories."""

    @functools.partial(jax.jit, static_argnames=())
    def eval_fn(params, ep: EpisodeBatch, rng):
        res = rollout_hamt(model, critic, params, None, tables, ep, cfg, rng,
                           feedback="argmax", train_ml=None, train_rl=False,
                           deterministic=True, early_exit=True)
        return res.path_nodes, res.path_len

    return eval_fn
