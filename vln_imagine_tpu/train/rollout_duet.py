"""Batched DUET episode rollout as one XLA program.

Rebuild of GMapNavAgent.rollout (VLN-DUET/map_nav_src/r2r/agent.py:386-625):
per step the agent encodes the panorama, folds it into the topological map
(array GmapState replaces the per-item python GraphMap), runs the dual-scale
navigation forward, and *teleports* to the chosen map node along the
observed-graph shortest path.  The trajectory (including multi-hop teleports
and the final stop-node backtrack, agent.py:588-601) is recorded on-device in
a fixed-capacity node buffer.

Index conventions: model-level gmap sequences are [stop] + gmap slots, so
model index j corresponds to gmap slot j-1; local vp sequences are
[stop] + pano tokens, pano slot j-1 (candidates live in pano slots [0..K)).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from vln_imagine_tpu.config import Config
from vln_imagine_tpu.envx import env as envx
from vln_imagine_tpu.envx import gmap as G
from vln_imagine_tpu.envx.tables import INF, EpisodeBatch, WorldTables
from vln_imagine_tpu.models.duet import DuetModel
from vln_imagine_tpu.ops.angles import view_elevation, view_heading
from vln_imagine_tpu.ops.masks import LOGIT_NEG_INF

MAX_TELEPORT_HOPS = 6
MAX_BACKTRACK_HOPS = 8
MAX_EXPERT_HOPS = 8  # nDTW expert path-extension horizon


class DuetRolloutResult(NamedTuple):
    loss: jnp.ndarray
    ml_loss: jnp.ndarray
    aux_loss: jnp.ndarray
    path_nodes: jnp.ndarray  # [B, PB]
    path_len: jnp.ndarray    # [B]
    logits: jnp.ndarray      # [T, B, G+1]
    actions: jnp.ndarray     # [T, B]
    entropy_sum: jnp.ndarray
    og_loss: jnp.ndarray = None   # scalar object-grounding CE (REVERIE/SOON)
    pred_obj: jnp.ndarray = None  # [B] predicted object id at the stop node
    rl_loss: jnp.ndarray = None   # scalar A2C loss (train_alg='rl' only)
    # final per-gmap-slot stop data (--detailed_output, agent.py:597-601)
    stop_nodes: jnp.ndarray = None   # [B, Gcap] node id per slot (-1 empty)
    stop_scores: jnp.ndarray = None  # [B, Gcap] stop logit per slot
    stop_valid: jnp.ndarray = None   # [B, Gcap] slot valid & visited


def path_buffer_len(cfg: Config) -> int:
    return (1 + cfg.env.max_action_len * MAX_TELEPORT_HOPS
            + MAX_BACKTRACK_HOPS)


def _append_path(path, path_len, nodes, valid):
    """Append `nodes` (masked by `valid`) to the per-item path buffer.

    The buffer's LAST column is a dedicated trash slot (allocated over the
    content capacity): masked lanes and overflow writes land there, so they
    can never collide with a genuine write to the final content column
    (duplicate-index scatter order is unspecified)."""
    B, PBt = path.shape
    cap = PBt - 1  # content columns [0, cap)
    offs = jnp.cumsum(valid, axis=1) - 1
    pos = jnp.where(valid, jnp.minimum(path_len[:, None] + offs, cap), cap)
    path = path.at[jnp.arange(B)[:, None], pos].set(
        jnp.where(valid, nodes, path[:, -1:]))
    return path, jnp.minimum(path_len + jnp.sum(valid, axis=1), cap)


def rollout_duet(
    model: DuetModel,
    params: Any,
    tables: WorldTables,
    ep: EpisodeBatch,
    cfg: Config,
    rng: jax.Array,
    feedback: str = "teacher",
    train_ml: float | None = 1.0,
    deterministic: bool = True,
    max_steps: int | None = None,
    critic: Any = None,
    critic_params: Any = None,
    train_rl: bool = False,
    early_exit: bool = False,
    unroll: bool = False,
) -> DuetRolloutResult:
    # A2C for DUET: the reference declares a `train_alg='rl'` dispatch and a
    # Critic (agent_base.py:213-220, agent.py:34) but its rollout ignores
    # `train_rl` entirely — the branch is inert.  Here it is a working A2C
    # matching HAMT's semantics (agent_cmt.py:615-744): distance+nDTW reward
    # shaping on the teleported node, reverse-scan discounted returns, 0.5 L2
    # critic loss, entropy bonus.  Critic state is gmap[CLS] * vp[CLS]
    # (mirroring HAMT's txt[CLS]*hist[CLS] fusion, model_HAMT.py:86).
    if feedback in ("teacher", "argmax"):
        train_rl = False
    mcfg, tcfg, ecfg = cfg.model, cfg.train, cfg.env
    B = ep.batch
    T = max_steps or ecfg.max_action_len
    K = tables.max_candidates
    Gcap = ecfg.max_gmap_nodes
    N = tables.max_nodes
    H = mcfg.hidden_size
    PB = path_buffer_len(cfg)
    ignore = tcfg.ignoreid
    b_idx = jnp.arange(B)

    def apply(method, *args, rngs_key=None, **kw):
        rngs = {"dropout": rngs_key} if rngs_key is not None else None
        return model.apply(params, *args, method=method, rngs=rngs,
                           deterministic=deterministic, **kw)

    rng, r_txt, r_imag, r_align = jax.random.split(rng, 4)
    txt_embeds = apply(DuetModel.text, ep.txt_ids, ep.txt_mask,
                       rngs_key=r_txt)
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
        imagine_embeds = apply(DuetModel.imagine, imag_in, rngs_key=r_imag)
        if mcfg.use_cosine_aux_loss:
            aux_loss, imagine_embeds = apply(
                DuetModel.align_with_contrastive_loss, txt_embeds, ep.txt_mask,
                imagine_embeds, ep.imagine_mask, ep.np_weights,
                rngs_key=r_align)

    # ---- initial graph: start node + its candidates (agent.py:396-398)
    state0 = envx.reset(tables, ep, T)
    gm = G.gmap_init(B, Gcap, N, H)
    obs0 = envx.observe_duet(tables, ep, state0, mcfg.angle_feat_size)
    all_active = jnp.ones((B,), bool)
    gm = G.add_nodes(gm, state0.node[:, None], jnp.ones((B, 1), bool))
    gm = G.add_nodes(gm, obs0.cand_nodes, obs0.cand_valid)
    edge_w = _edge_weights(tables, ep, state0.node, obs0.cand_nodes)
    gm = G.add_edges(gm, state0.node, obs0.cand_nodes, edge_w, obs0.cand_valid)
    gm = G.relax(gm, state0.node, all_active)

    path0 = jnp.zeros((B, PB + 1), jnp.int32)  # +1: trash column
    path0 = path0.at[:, 0].set(ep.start_node)
    plen0 = jnp.ones((B,), jnp.int32)
    dtw_row0 = envx.dtw_init(tables, ep)

    goal = ep.goal
    dist_full = tables.dist  # [S, N, N]
    expert_policy = cfg.train.expert_policy
    use_obj = (mcfg.obj_feat_size > 0 and tables.obj_feat is not None
               and ep.gt_obj_id is not None)
    Ko = tables.max_objects if use_obj else 0

    def _dtw_extend(row, hop_nodes, hop_valid):
        """Fold a sequence of appended path nodes into the DTW row."""
        def body(i, r):
            new_r = envx.dtw_push(tables, ep, r, hop_nodes[:, i])
            return jnp.where(hop_valid[:, i][:, None], new_r, r)
        return jax.lax.fori_loop(0, hop_nodes.shape[1], body, row)

    def step_fn(carry, t):
        (st, gm, obs, path, plen, dtw_row, last_dist, last_ndtw, node_obj,
         pred_obj, ml_acc, og_acc, ent_acc, key) = carry
        # `obs` observes the CURRENT state: computed once per step and
        # carried — the end-of-body observation of the new node doubles as
        # the next iteration's input (halves the per-step feature gathers)
        key, k_pano, k_nav, k_act = jax.random.split(key, 4)
        active = ~st.ended

        gm = G.set_visited(gm, st.node, t, active)

        pano = apply(DuetModel.panorama_per_step, obs.img, obs.loc,
                     obs.nav_types, obs.valid, rngs_key=k_pano)
        denom = jnp.maximum(jnp.sum(obs.valid, 1, keepdims=True), 1)
        avg_pano = jnp.sum(pano * obs.valid[:, :, None], axis=1) / denom

        gm = G.update_embeds(gm, st.node, avg_pano, obs.cand_nodes,
                             pano[:, :K], obs.cand_valid, active)

        # ---------------- model inputs ([stop] + gmap slots)
        gvalid_s = gm.valid()[:, :Gcap]                    # slot validity
        gnodes = gm.node_ids[:, :Gcap]
        gvisited_s = gm.visited[:, :Gcap]
        gsteps_s = gm.step_ids[:, :Gcap]

        gmap_img = jnp.concatenate(
            [jnp.zeros((B, 1, H), pano.dtype),
             G.node_embeds(gm)[:, :Gcap].astype(pano.dtype)], axis=1)
        gmap_step_ids = jnp.concatenate(
            [jnp.zeros((B, 1), jnp.int32), gsteps_s], axis=1)
        gmap_valid = jnp.concatenate([jnp.ones((B, 1), bool), gvalid_s], 1)
        cur_slot = jnp.take_along_axis(gm.slot_of, st.node[:, None], 1)[:, 0]
        if tcfg.act_visited_nodes:
            # --act_visited_nodes (agent.py:107-122): only the CURRENT node
            # counts as visited — every other graph node stays actionable.
            # The reference builds gmap_visited_masks from this partition
            # and feeds the SAME mask to _teacher_action_r4r and
            # no_vp_left, so the dagger teacher and forced stops below use
            # act_visited_s too, not the true visited set
            act_visited_s = (jnp.arange(Gcap)[None, :]
                             == cur_slot[:, None]) & gvalid_s
        else:
            act_visited_s = gvisited_s & gvalid_s
        gmap_visited = jnp.concatenate([jnp.zeros((B, 1), bool),
                                        act_visited_s], 1)

        cur_heading = view_heading(st.view_index, tables.views)
        cur_elev = view_elevation(st.view_index, tables.views)
        obs_dist = gm.dist[b_idx[:, None], cur_slot[:, None],
                           jnp.arange(Gcap)[None, :]]
        obs_hops = gm.hops[b_idx[:, None], cur_slot[:, None],
                           jnp.arange(Gcap)[None, :]]
        obs_dist = jnp.where(obs_dist >= INF / 2, 0.0, obs_dist)
        obs_hops = jnp.where(obs_hops >= 10**5, 0, obs_hops)
        gpos = envx.rel_pos_features(tables, ep, st.node, cur_heading,
                                     cur_elev, gnodes, obs_dist,
                                     obs_hops.astype(jnp.float32),
                                     mcfg.angle_feat_size)
        gpos = gpos * gvalid_s[:, :, None]
        gmap_pos = jnp.concatenate(
            [jnp.zeros((B, 1, gpos.shape[-1]), gpos.dtype), gpos], axis=1)
        pair = G.pair_dists(gm)[:, :Gcap, :Gcap]
        gmap_pair = jnp.zeros((B, Gcap + 1, Gcap + 1), pair.dtype)
        gmap_pair = gmap_pair.at[:, 1:, 1:].set(pair)

        # local vp branch: [stop] + pano tokens (agent.py:173-207)
        Tp = pano.shape[1]
        vp_img = jnp.concatenate([jnp.zeros((B, 1, H), pano.dtype), pano], 1)
        start_slot7 = _vp_pos7(tables, ep, st.node, cur_heading, cur_elev,
                               ep.start_node[:, None], gm, b_idx, mcfg)[:, 0]
        cand_pos7 = _vp_pos7(tables, ep, st.node, cur_heading, cur_elev,
                             obs.cand_nodes, gm, b_idx, mcfg)
        vp_pos = jnp.zeros((B, Tp + 1, 14), start_slot7.dtype)
        vp_pos = vp_pos + jnp.pad(start_slot7, ((0, 0), (0, 7)))[:, None, :]
        vp_pos = vp_pos.at[:, 1:K + 1, 7:].set(
            cand_pos7 * obs.cand_valid[:, :, None])
        vp_valid = jnp.concatenate([jnp.ones((B, 1), bool), obs.valid], 1)
        vp_nav_valid = jnp.concatenate(
            [jnp.ones((B, 1), bool), obs.nav_types == 1], 1)

        # candidate (vp token j>0) <-> gmap slot matching
        cand_slot = jnp.take_along_axis(
            gm.slot_of, jnp.maximum(obs.cand_nodes, 0), 1)     # [B, K]
        c2g = (jnp.arange(Gcap)[None, :, None] == cand_slot[:, None, :]) \
            & obs.cand_valid[:, None, :] & (cand_slot >= 0)[:, None, :]
        cand_to_gmap = jnp.zeros((B, Gcap + 1, Tp + 1), bool)
        cand_to_gmap = cand_to_gmap.at[:, 1:, 1:K + 1].set(c2g)

        vp_obj_valid = None
        if use_obj:
            vp_obj_valid = jnp.concatenate(
                [jnp.zeros((B, 1), bool), obs.nav_types == 2], axis=1)
        out = apply(DuetModel.navigation_per_step,
                    txt_embeds, ep.txt_mask,
                    gmap_img, gmap_step_ids, gmap_pos, gmap_valid,
                    gmap_pair, gmap_visited,
                    vp_img, vp_pos, vp_valid, vp_nav_valid, cand_to_gmap,
                    imagine_embeds=imagine_embeds,
                    imagine_mask=ep.imagine_mask,
                    vp_obj_valid=vp_obj_valid, rngs_key=k_nav)

        if use_obj:
            # object grounding: per-step prediction at the current node and
            # CE against the gt object when visible (reverie agent
            # `_teacher_object` + og logits)
            obj_tok0 = 1 + K + tables.views  # first object token in vp seq
            obj_lg = out.obj_logits[:, obj_tok0: obj_tok0 + Ko]
            best_k = jnp.argmax(obj_lg, axis=1)
            best_id = jnp.take_along_axis(obs.obj_ids, best_k[:, None],
                                          1)[:, 0]
            store = jnp.where(active, cur_slot, gm.trash)
            node_obj = node_obj.at[b_idx, store].set(
                jnp.where(store == gm.trash, node_obj[:, -1], best_id))
            gt_match = (obs.obj_ids == ep.gt_obj_id[:, None]) & obs.obj_valid
            has_gt = jnp.any(gt_match, axis=1)
            gt_k = jnp.argmax(gt_match, axis=1)
            og_logp = jax.nn.log_softmax(
                jnp.where(obs.obj_valid, obj_lg, LOGIT_NEG_INF
                          ).astype(jnp.float32), -1)
            og_ce = -jnp.take_along_axis(og_logp, gt_k[:, None], 1)[:, 0]
            og_acc = og_acc + jnp.sum(
                jnp.where(active & has_gt, og_ce, 0.0))

        if mcfg.fusion == "local":
            nav_logits = out.local_logits
        elif mcfg.fusion == "global":
            nav_logits = out.global_logits
        else:
            nav_logits = out.fused_logits

        probs = jax.nn.softmax(nav_logits.astype(jnp.float32), axis=-1)
        # record per-node stop score at the current node (agent.py:515-520)
        stop_tgt = jnp.where(active, cur_slot, gm.trash)
        gm = gm.replace(stop_scores=gm.stop_scores.at[b_idx, stop_tgt].set(
            jnp.where(stop_tgt == gm.trash, gm.stop_scores[:, -1],
                      probs[:, 0])))

        # ---------------- teacher (agent.py:241-287, _teacher_action_r4r)
        no_vp_left = ~jnp.any(gvalid_s & ~act_visited_s, axis=1)
        if mcfg.fusion == "local":
            # local action space: [stop] + current candidates (the reference
            # passes vp_cand_vpids as nav_vpids under fusion='local',
            # agent.py:521-529), so targets index candidate tokens 1..K
            if feedback == "teacher":
                tgt_node_l = jnp.take_along_axis(
                    ep.gt_path, jnp.broadcast_to(
                        jnp.clip(t + 1, 0, ep.gt_path.shape[1] - 1),
                        (B,))[:, None], axis=1)[:, 0]
                match = (obs.cand_nodes == tgt_node_l[:, None]) \
                    & obs.cand_valid
                slot = jnp.argmax(match, axis=1) + 1
                has_match = jnp.any(match, axis=1)
                is_stop = t >= ep.gt_len - 1
                teacher = jnp.where(is_stop, 0,
                                    jnp.where(has_match, slot, ignore))
            else:
                if expert_policy == "ndtw":
                    rows_c = jnp.broadcast_to(
                        dtw_row[:, None, :], (B, K) + dtw_row.shape[1:])
                    rows_c = envx.dtw_push_multi(tables, ep, rows_c,
                                                 obs.cand_nodes)
                    ndtw_c = envx.dtw_ndtw_multi(rows_c, ep,
                                                 ecfg.error_margin)
                    ccost = jnp.where(obs.cand_valid, -ndtw_c, INF)
                else:  # 'spl'
                    ccost = (dist_full[ep.scan[:, None], obs.cand_nodes,
                                       goal[:, None]]
                             + dist_full[ep.scan[:, None], st.node[:, None],
                                         obs.cand_nodes])
                    ccost = jnp.where(obs.cand_valid, ccost, INF)
                slot = jnp.argmin(ccost, axis=1) + 1
                any_choice = jnp.any(obs.cand_valid, axis=1)
                teacher = jnp.where(st.node == goal, 0,
                                    jnp.where(any_choice, slot, ignore))
        elif feedback == "teacher":
            tgt_node = jnp.take_along_axis(
                ep.gt_path, jnp.broadcast_to(
                    jnp.clip(t + 1, 0, ep.gt_path.shape[1] - 1),
                    (B,))[:, None], axis=1)[:, 0]
            match = (gnodes == tgt_node[:, None]) & gvalid_s
            slot = jnp.argmax(match, axis=1) + 1
            has_match = jnp.any(match, axis=1)
            is_stop = t >= ep.gt_len - 1
            # a missing target means the map buffer overflowed: supervising
            # against a masked logit would inject a huge bogus CE, so ignore
            teacher = jnp.where(is_stop, 0,
                                jnp.where(has_match, slot, ignore))
        else:
            cand_ok = gvalid_s & ~act_visited_s
            if expert_policy == "ndtw":
                # score each unvisited node by the nDTW of the trajectory
                # extended along the full-graph shortest path to it
                # (agent.py:270-277)
                rows = jnp.broadcast_to(dtw_row[:, None, :],
                                        (B, Gcap) + dtw_row.shape[1:])
                cur_m = jnp.broadcast_to(st.node[:, None], (B, Gcap))

                def hop(_, hc):
                    rows, cur_m, done = hc
                    nxt = tables.next_hop[ep.scan[:, None], cur_m, gnodes]
                    stepping = ~done & (cur_m != gnodes)
                    nxt = jnp.where(stepping, nxt, cur_m)
                    new_rows = envx.dtw_push_multi(tables, ep, rows, nxt)
                    rows = jnp.where(stepping[..., None], new_rows, rows)
                    done = done | (nxt == gnodes)
                    return rows, nxt, done

                rows, _, _ = jax.lax.fori_loop(
                    0, MAX_EXPERT_HOPS, hop,
                    (rows, cur_m, jnp.zeros((B, Gcap), bool)))
                ndtw_g = envx.dtw_ndtw_multi(rows, ep, ecfg.error_margin)
                cand_cost = jnp.where(cand_ok, -ndtw_g, INF)
            else:  # 'spl'
                cand_cost = (dist_full[ep.scan[:, None], gnodes,
                                       goal[:, None]]
                             + dist_full[ep.scan[:, None], st.node[:, None],
                                         gnodes])
                cand_cost = jnp.where(cand_ok, cand_cost, INF)
            slot = jnp.argmin(cand_cost, axis=1) + 1
            any_choice = jnp.any(cand_ok, axis=1)
            teacher = jnp.where(st.node == goal, 0,
                                jnp.where(any_choice, slot, ignore))
        teacher = jnp.where(st.ended, ignore, teacher)

        if train_ml is not None:
            logp = jax.nn.log_softmax(nav_logits.astype(jnp.float32), -1)
            tgt = jnp.clip(teacher, 0, logp.shape[1] - 1)
            ce = -jnp.take_along_axis(logp, tgt[:, None], 1)[:, 0]
            ml_acc = ml_acc + jnp.sum(jnp.where(teacher == ignore, 0.0, ce))

        # ---------------- action selection (agent.py:545-575)
        valid_act = gmap_valid & ~gmap_visited if mcfg.fusion != "local" \
            else vp_nav_valid
        valid_act = valid_act.at[:, 0].set(True)
        if feedback == "teacher":
            a_t = teacher
            ent = jnp.zeros((B,))
            logp_a = jnp.zeros((B,))
        else:
            logp = jax.nn.log_softmax(
                jnp.where(valid_act, nav_logits, LOGIT_NEG_INF
                          ).astype(jnp.float32), -1)
            p = jnp.exp(logp)
            ent = -jnp.sum(jnp.where(valid_act, p * logp, 0.0), -1)
            if feedback == "argmax":
                a_t = jnp.argmax(logp, -1).astype(jnp.int32)
            elif feedback == "sample":
                a_t = jax.random.categorical(k_act, logp, -1).astype(jnp.int32)
            elif feedback == "expl_sample":
                # greedy action, replaced w.p. 1-expl_max_ratio by a uniform
                # draw over the valid actions (agent.py:555-565)
                k_expl, k_pick = jax.random.split(k_act)
                a_greedy = jnp.argmax(logp, -1).astype(jnp.int32)
                explore = (jax.random.uniform(k_expl, (B,))
                           > tcfg.expl_max_ratio)
                uni = jnp.where(valid_act, 0.0, LOGIT_NEG_INF)
                a_rand = jax.random.categorical(k_pick, uni, -1
                                                ).astype(jnp.int32)
                a_t = jnp.where(explore, a_rand, a_greedy)
            else:
                raise ValueError(feedback)
            logp_a = jnp.take_along_axis(logp, a_t[:, None], 1)[:, 0]
        ent_acc = ent_acc + jnp.sum(jnp.where(st.ended, 0.0, ent))

        # stop rule (agent.py:570-575): training stops at the gt goal,
        # inference stops on predicted stop.  Under A2C the policy must learn
        # its own stop, so the sampled stop action is honoured.
        if train_rl or feedback not in ("teacher", "sample"):
            a_t_stop = a_t == 0
            end_in_place = jnp.zeros((B,), bool)
        else:
            a_t_stop = st.node == jnp.take_along_axis(
                ep.gt_path, (ep.gt_len - 1)[:, None], 1)[:, 0]
            # a *sampled* stop away from the goal ends the episode in place
            # with no stop-score backtrack (reference: nav_vpids[0] is None,
            # so cpu_a_t=None only sets `ended`, agent.py:584,610 — the
            # just_ended backtrack branch never fires for it)
            end_in_place = ((a_t == 0) & ~a_t_stop
                            if feedback == "sample"
                            else jnp.zeros((B,), bool))
        stop_now = (a_t_stop | st.ended | no_vp_left
                    | (a_t == ignore) | (t == T - 1) | end_in_place)
        just_ended = stop_now & ~st.ended

        if mcfg.fusion == "local":
            # a_t-1 indexes the current candidate list, not gmap slots
            cand_idx = jnp.clip(a_t - 1, 0, K - 1)
            move_tgt = jnp.take_along_axis(obs.cand_nodes,
                                           cand_idx[:, None], 1)[:, 0]
        else:
            tgt_slot = jnp.clip(a_t - 1, 0, Gcap - 1)
            move_tgt = jnp.take_along_axis(gnodes, tgt_slot[:, None],
                                           1)[:, 0]
        tgt_node = jnp.where(stop_now, st.node, move_tgt)

        # ---------------- teleport along the observed path (agent.py:289-305)
        hop_nodes, hop_valid = G.follow_path(gm, st.node, tgt_node,
                                             MAX_TELEPORT_HOPS)
        moving = ~stop_now & ~st.ended
        hop_valid = hop_valid & moving[:, None]
        # hop-cap guard: the agent occupies tgt_node regardless, so when the
        # observed path is longer than the cap, force the endpoint into the
        # recorded trajectory (a gap mid-path beats a wrong endpoint — the
        # endpoint decides success/SPL; the reference appends the full path)
        reached = jnp.any((hop_nodes == tgt_node[:, None]) & hop_valid, 1)
        need_fix = moving & ~reached
        hop_nodes = hop_nodes.at[:, -1].set(
            jnp.where(need_fix, tgt_node, hop_nodes[:, -1]))
        hop_valid = hop_valid.at[:, -1].set(hop_valid[:, -1] | need_fix)
        path, plen = _append_path(path, plen, hop_nodes, hop_valid)
        dtw_row = _dtw_extend(dtw_row, hop_nodes, hop_valid)

        n_hops = jnp.sum(hop_valid, axis=1)
        last_idx = jnp.maximum(n_hops - 2, 0)
        prev_node = jnp.where(
            n_hops >= 2,
            jnp.take_along_axis(hop_nodes, last_idx[:, None], 1)[:, 0],
            st.node)
        new_node = jnp.where(moving, tgt_node, st.node)
        # adopt the discretized view of the final approach edge
        adj_prev = tables.adj[ep.scan, prev_node]
        pid_prev = tables.cand_pointid[ep.scan, prev_node]
        k_match = jnp.argmax(adj_prev == new_node[:, None], axis=1)
        new_view = jnp.take_along_axis(pid_prev, k_match[:, None], 1)[:, 0]
        new_view = jnp.where(moving, new_view, st.view_index)

        # ---------------- stop-node backtrack for just-ended items
        # (agent.py:588-601): jump to the highest-stop-score visited node
        best_stop_slot = jnp.argmax(
            jnp.where(gm.valid() & gm.visited, gm.stop_scores, -jnp.inf), 1)
        best_stop_node = jnp.take_along_axis(gm.node_ids,
                                             best_stop_slot[:, None], 1)[:, 0]
        has_score = jnp.any(jnp.isfinite(
            jnp.where(gm.valid() & gm.visited, gm.stop_scores, -jnp.inf)), 1)
        do_back = (just_ended & ~end_in_place & has_score
                   & (best_stop_node != st.node))
        back_nodes, back_valid = G.follow_path(gm, st.node, best_stop_node,
                                               MAX_BACKTRACK_HOPS)
        back_valid = back_valid & do_back[:, None]
        b_reached = jnp.any(
            (back_nodes == best_stop_node[:, None]) & back_valid, 1)
        b_fix = do_back & ~b_reached
        back_nodes = back_nodes.at[:, -1].set(
            jnp.where(b_fix, best_stop_node, back_nodes[:, -1]))
        back_valid = back_valid.at[:, -1].set(back_valid[:, -1] | b_fix)
        path, plen = _append_path(path, plen, back_nodes, back_valid)
        dtw_row = _dtw_extend(dtw_row, back_nodes, back_valid)
        if use_obj:
            stop_slot_final = jnp.where(has_score & just_ended
                                        & ~end_in_place,
                                        best_stop_slot,
                                        jnp.take_along_axis(
                                            gm.slot_of, st.node[:, None],
                                            1)[:, 0])
            stop_slot_final = jnp.clip(stop_slot_final, 0, gm.trash)
            chosen = jnp.take_along_axis(node_obj, stop_slot_final[:, None],
                                         1)[:, 0]
            pred_obj = jnp.where(just_ended, chosen, pred_obj)

        st2 = st.replace(node=new_node, view_index=new_view,
                         ended=st.ended | stop_now, step=st.step + 1)

        ended_pre = st.ended
        just_stopped = just_ended
        if train_rl:
            # reward shaping on the effective post-teleport node (the
            # backtracked stop node for just-ended items); same schedule as
            # HAMT (agent_cmt.py:615-653) — dtw_row already folded in the
            # teleport and backtrack hops
            eff_node = jnp.where(do_back, best_stop_node, new_node)
            dist = dist_full[ep.scan, eff_node, goal]
            ndtw = envx.dtw_ndtw(dtw_row, ep, ecfg.error_margin)
            stop_rew = jnp.where(dist < 3.0, 2.0 + ndtw * 2.0, -2.0)
            delta = -(dist - last_dist)
            ndtw_rew = ndtw - last_ndtw
            move_rew = jnp.where(delta > 0.0, 1.0 + ndtw_rew,
                                 jnp.where(delta < 0.0, -1.0 + ndtw_rew, 0.0))
            move_rew = move_rew - jnp.where(
                (last_dist <= 1.0) & (delta < 0.0),
                (1.0 - last_dist) * 2.0, 0.0)
            reward = jnp.where(ended_pre, 0.0,
                               jnp.where(just_stopped, stop_rew, move_rew))
            last_dist = jnp.where(ended_pre, last_dist, dist)
            last_ndtw = jnp.where(ended_pre, last_ndtw, ndtw)
        else:
            reward = jnp.zeros((B,))
        rl_mask = jnp.where(ended_pre, 0.0, 1.0)
        state_vec = (out.gmap_embeds[:, 0]
                     * out.vp_embeds[:, 0]).astype(jnp.float32)

        # ---------------- observe the new node, grow the graph
        obs2 = envx.observe_duet(tables, ep, st2, mcfg.angle_feat_size)
        active2 = ~st2.ended
        gm = G.add_nodes(gm, st2.node[:, None], active2[:, None])
        gm = G.add_nodes(gm, obs2.cand_nodes,
                         obs2.cand_valid & active2[:, None])
        w2 = _edge_weights(tables, ep, st2.node, obs2.cand_nodes)
        gm = G.add_edges(gm, st2.node, obs2.cand_nodes, w2,
                         obs2.cand_valid & active2[:, None])
        gm = G.relax(gm, st2.node, active2)

        carry = (st2, gm, obs2, path, plen, dtw_row, last_dist, last_ndtw,
                 node_obj, pred_obj, ml_acc, og_acc, ent_acc, key)
        return carry, (nav_logits, a_t, logp_a, ent, state_vec, reward,
                       rl_mask)

    rng, k_scan = jax.random.split(rng)
    node_obj0 = jnp.full((B, Gcap + 1), -1, jnp.int32)
    pred_obj0 = jnp.full((B,), -1, jnp.int32)
    last_dist0 = envx.distance_to_goal(tables, ep, state0.node)
    last_ndtw0 = envx.dtw_ndtw(dtw_row0, ep, ecfg.error_margin)
    carry0 = (state0, gm, obs0, path0, plen0, dtw_row0, last_dist0,
              last_ndtw0, node_obj0, pred_obj0,
              jnp.asarray(0.0), jnp.asarray(0.0), jnp.asarray(0.0), k_scan)
    if early_exit:
        # inference-only while_loop: stop once every episode has ended
        # instead of running the full fixed-T scan (see rollout_hamt)
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
        (stT, gmT, _, pathT, plenT, _, _, _, _, pred_objT, _, _, ent_acc,
         _) = carry
        pathT = pathT.at[:, -1].set(0)  # trash column: deterministic output
        loss = (mcfg.cosine_weight * aux_loss if mcfg.use_cosine_aux_loss
                else jnp.asarray(0.0))
        return DuetRolloutResult(
            loss=loss, ml_loss=jnp.asarray(0.0), aux_loss=aux_loss,
            path_nodes=pathT, path_len=plenT, logits=None, actions=None,
            entropy_sum=ent_acc, og_loss=jnp.asarray(0.0),
            pred_obj=pred_objT, rl_loss=jnp.asarray(0.0),
            stop_nodes=gmT.node_ids[:, :Gcap],
            stop_scores=gmT.stop_scores[:, :Gcap],
            stop_valid=(gmT.valid() & gmT.visited)[:, :Gcap])

    # Rematerialize each step when the rollout will be differentiated:
    # a step's full dual-scale forward (pano encoder + global/local
    # branches over <=Gcap gmap nodes with the 200-token instruction as
    # cross-attn context) stores far more than one chip's HBM across
    # T steps x 2 rollouts (dagger), so recompute it in the backward pass
    # instead (standard TPU FLOPs-for-HBM trade).
    body = jax.checkpoint(step_fn) if (train_ml is not None or train_rl) \
        else step_fn
    # unroll: see rollout_hamt — bench.py FLOP accounting only (HLO cost
    # analysis counts a loop body once; the unrolled graph makes it exact)
    carry, ys = jax.lax.scan(body, carry0, jnp.arange(T),
                             unroll=T if unroll else 1)
    (stT, gmT, _, pathT, plenT, _, _, _, _, pred_objT, ml_acc, og_acc,
     ent_acc, _) = carry
    pathT = pathT.at[:, -1].set(0)  # trash column: deterministic output
    logits_seq, actions, logps, entropys, states, rewards, masks = ys

    ml_loss = jnp.asarray(0.0)
    og_loss = jnp.asarray(0.0)
    loss = mcfg.cosine_weight * aux_loss if mcfg.use_cosine_aux_loss \
        else jnp.asarray(0.0)
    if train_ml is not None:
        ml_loss = ml_acc * train_ml / B
        loss = loss + ml_loss
        if use_obj:
            og_loss = og_acc * train_ml / B
            loss = loss + og_loss

    rl_loss = jnp.asarray(0.0)
    if train_rl:
        # every item is forced to end by t == T-1 (stop_now includes it), so
        # the bootstrap value of the post-episode state is always zero
        rng, k_cs = jax.random.split(rng)
        crngs = None if deterministic else {"dropout": k_cs}

        # one batched critic call over all T*B step states (no sequential
        # tiny-MLP chain inside the reverse scan; fresh dropout mask per
        # (t, b) row, matching the reference's per-step torch calls)
        T_, B_ = rewards.shape
        values = critic.apply(
            critic_params, states.reshape(T_ * B_, -1),
            deterministic=deterministic,
            rngs=crngs).astype(jnp.float32).reshape(T_, B_)

        def a2c_step(disc, ys_t):
            logp_t, v, reward_t, mask_t = ys_t
            disc = disc * tcfg.gamma + reward_t
            adv = jax.lax.stop_gradient(disc - v)
            pol = jnp.sum(-logp_t * adv * mask_t)
            cri = jnp.sum(((disc - v) ** 2) * mask_t) * 0.5
            return disc, pol + cri

        _, step_losses = jax.lax.scan(
            a2c_step, jnp.zeros((B,)), (logps, values, rewards, masks),
            reverse=True)
        rl_loss = jnp.sum(step_losses)
        if feedback == "sample":
            rl_loss = rl_loss + jnp.sum(
                -tcfg.entropy_loss_weight * entropys * masks)
        total = jnp.sum(masks)
        if tcfg.normalize_loss == "total":
            rl_loss = rl_loss / jnp.maximum(total, 1.0)
        elif tcfg.normalize_loss == "batch":
            rl_loss = rl_loss / B
        loss = loss + rl_loss

    return DuetRolloutResult(
        loss=loss, ml_loss=ml_loss, aux_loss=aux_loss,
        path_nodes=pathT, path_len=plenT, logits=logits_seq, actions=actions,
        entropy_sum=ent_acc, og_loss=og_loss, pred_obj=pred_objT,
        rl_loss=rl_loss, stop_nodes=gmT.node_ids[:, :Gcap],
        stop_scores=gmT.stop_scores[:, :Gcap],
        stop_valid=(gmT.valid() & gmT.visited)[:, :Gcap])


def _edge_weights(tables, ep, src_node, dst_nodes):
    """Straight-line distances (calc_position_distance, graph_utils.py:7-13)."""
    xyz = tables.node_xyz[ep.scan]
    a = jnp.take_along_axis(xyz, src_node[:, None, None].repeat(3, -1),
                            1)[:, 0]
    bpos = jnp.take_along_axis(xyz, dst_nodes[:, :, None].repeat(3, -1), 1)
    return jnp.linalg.norm(bpos - a[:, None, :], axis=-1)


def _vp_pos7(tables, ep, cur_node, cur_heading, cur_elev, targets, gm, b_idx,
             mcfg):
    """7-d rel-pos features for vp targets via the observed graph."""
    cur_slot = jnp.take_along_axis(gm.slot_of, cur_node[:, None], 1)[:, 0]
    t_slot = jnp.take_along_axis(gm.slot_of, jnp.maximum(targets, 0), 1)
    t_slot = jnp.where(t_slot >= 0, t_slot, gm.trash)
    od = gm.dist[b_idx[:, None], cur_slot[:, None], t_slot]
    oh = gm.hops[b_idx[:, None], cur_slot[:, None], t_slot]
    od = jnp.where(od >= INF / 2, 0.0, od)
    oh = jnp.where(oh >= 10**5, 0, oh)
    return envx.rel_pos_features(tables, ep, cur_node, cur_heading, cur_elev,
                                 targets, od, oh.astype(jnp.float32),
                                 mcfg.angle_feat_size)
