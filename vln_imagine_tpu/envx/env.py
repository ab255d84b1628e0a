"""Functional batched environment: pure (tables, state) -> arrays transforms.

Everything here is shape-static and jit/vmap/scan-friendly. These functions
replace the per-step host work of the reference:

- observation assembly `_get_obs` + `make_candidate`
  (VLN-HAMT/finetune_src/r2r/env.py:221-342)
- feature packing `_cand_pano_feature_variable` (r2r/agent_cmt.py:130-176)
- simulator stepping `make_equiv_action` (agent_cmt.py:336-369): the
  up/down/right micro-turns collapse into a single table lookup since only the
  terminal discretized pose matters
- teacher extraction `_teacher_path_action` / `_teacher_action`
  (env.py:293-307, agent_cmt.py:315-334)
- per-step DTW reward shaping (agent_cmt.py:615-653, eval_utils.py:74-94)

Observation token layout (fixed, mask-equivalent to the reference's dense
packing; obs tokens carry no position embedding so layouts are interchangeable
up to masking): slots [0..K-1] candidates, slot K = STOP, slots [K+1..K+V]
the 36 panorama views (views already claimed by a candidate are masked out).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from vln_imagine_tpu.envx.tables import (
    INF,
    EnvState,
    EpisodeBatch,
    WorldTables,
    snap_heading_to_view,
)
from vln_imagine_tpu.ops.angles import angle_feature, view_elevation, view_heading


class HamtObs(NamedTuple):
    img: jnp.ndarray        # [B, T_obs, Df]
    ang: jnp.ndarray        # [B, T_obs, A]
    nav_types: jnp.ndarray  # [B, T_obs] i32 (0 pano, 1 candidate, 2 stop)
    valid: jnp.ndarray      # [B, T_obs] bool
    cand_valid: jnp.ndarray  # [B, K] bool
    stop_slot: int          # == K
    # REVERIE object segment (separate token bank, NavRefCMT
    # `_object_variable` reverie/agent.py:125-139)
    obj_img: Optional[jnp.ndarray] = None    # [B, Ko, Do] (obj feature dim,
    # NOT padded to the view dim — NavRef's obj_linear is [Do -> H])
    obj_ang: Optional[jnp.ndarray] = None    # [B, Ko, A]
    obj_ids: Optional[jnp.ndarray] = None    # [B, Ko] i32
    obj_valid: Optional[jnp.ndarray] = None  # [B, Ko] bool
    obj_pos: Optional[jnp.ndarray] = None    # [B, Ko, 5] normalized bbox


def obs_tokens(max_candidates: int, views: int) -> int:
    return max_candidates + 1 + views


def reset(tables: WorldTables, ep: EpisodeBatch, max_action_len: int) -> EnvState:
    B = ep.batch
    view = snap_heading_to_view(ep.start_heading, tables.views)
    path = jnp.zeros((B, max_action_len + 1), jnp.int32)
    path = path.at[:, 0].set(ep.start_node)
    return EnvState(
        node=ep.start_node,
        view_index=view,
        ended=jnp.zeros((B,), bool),
        step=jnp.asarray(0, jnp.int32),
        path_nodes=path,
        path_len=jnp.ones((B,), jnp.int32),
    )


def _gather_sn(table: jnp.ndarray, scan: jnp.ndarray, node: jnp.ndarray):
    """table[S, N, ...] gathered at per-item (scan, node) -> [B, ...]."""
    return table[scan, node]


def candidate_info(tables: WorldTables, ep: EpisodeBatch, state: EnvState):
    """Per-candidate neighbour id / validity / view id / absolute angles."""
    scan, node = ep.scan, state.node
    return (
        _gather_sn(tables.adj, scan, node),
        _gather_sn(tables.adj_valid, scan, node),
        _gather_sn(tables.cand_pointid, scan, node),
        _gather_sn(tables.cand_heading, scan, node),
        _gather_sn(tables.cand_elevation, scan, node),
    )


def pano_rel_angles(view_index: jnp.ndarray, views: int, angle_feat_size: int):
    """[B, V, A] angle features of the V views relative to the current view's
    heading (elevation absolute) — get_all_point_angle_feature semantics
    (data_utils.py:506-535)."""
    v = jnp.arange(views)
    abs_h = view_heading(v, views)[None, :]
    abs_e = view_elevation(v, views)[None, :]
    base_h = view_heading(view_index, views)[:, None]
    return angle_feature(abs_h - base_h, abs_e, angle_feat_size)


def observe_hamt(tables: WorldTables, ep: EpisodeBatch, state: EnvState,
                 angle_feat_size: int = 4) -> HamtObs:
    """Build the fixed-layout observation token bank for one step."""
    assert tables.feat is not None, "observe_hamt needs view features"
    B = ep.batch
    V = tables.views
    K = tables.max_candidates
    Df = tables.feat.shape[-1]

    adj, adj_valid, pointid, c_head, c_elev = candidate_info(tables, ep, state)
    node_feat = _gather_sn(tables.feat, ep.scan, state.node)  # [B, V, Df]

    base_h = view_heading(state.view_index, V)[:, None]
    cand_img = jnp.take_along_axis(node_feat, pointid[:, :, None], axis=1)
    cand_ang = angle_feature(c_head - base_h, c_elev, angle_feat_size)
    cand_img = jnp.where(adj_valid[:, :, None], cand_img, 0.0)
    cand_ang = jnp.where(adj_valid[:, :, None], cand_ang, 0.0)

    pano_ang = pano_rel_angles(state.view_index, V, angle_feat_size)
    # views claimed by at least one valid candidate are masked from the pano set
    onehot = jax.nn.one_hot(pointid, V, dtype=jnp.bool_)  # [B, K, V]
    used = jnp.any(onehot & adj_valid[:, :, None], axis=1)  # [B, V]

    A = cand_ang.shape[-1]
    img = jnp.concatenate(
        [cand_img, jnp.zeros((B, 1, Df), cand_img.dtype), node_feat], axis=1)
    ang = jnp.concatenate(
        [cand_ang, jnp.zeros((B, 1, A), cand_ang.dtype), pano_ang], axis=1)
    nav = jnp.concatenate(
        [adj_valid.astype(jnp.int32),
         jnp.full((B, 1), 2, jnp.int32),
         jnp.zeros((B, V), jnp.int32)], axis=1)
    valid = jnp.concatenate(
        [adj_valid, jnp.ones((B, 1), bool), ~used], axis=1)

    obj_img = obj_ang = obj_ids = obj_valid = obj_pos = None
    if tables.obj_feat is not None:
        o_feat = _gather_sn(tables.obj_feat, ep.scan, state.node)
        o_ang = _gather_sn(tables.obj_ang, ep.scan, state.node)
        obj_valid = _gather_sn(tables.obj_valid, ep.scan, state.node)
        obj_ids = _gather_sn(tables.obj_ids, ep.scan, state.node)
        # object features keep their OWN dim: NavRefCMT's obj img_linear is
        # [obj_feat_size -> H] (vlnbert_navref.py:17), so padding to the
        # view-feature dim would make from-scratch models incompatible with
        # converted reference checkpoints
        obj_img = o_feat * obj_valid[:, :, None]
        obj_ang = angle_feature(o_ang[..., 0] - base_h, o_ang[..., 1],
                                angle_feat_size)
        if tables.obj_pos is not None:
            obj_pos = _gather_sn(tables.obj_pos, ep.scan, state.node) \
                * obj_valid[:, :, None]
    return HamtObs(img=img, ang=ang, nav_types=nav, valid=valid,
                   cand_valid=adj_valid, stop_slot=K,
                   obj_img=obj_img, obj_ang=obj_ang, obj_ids=obj_ids,
                   obj_valid=obj_valid, obj_pos=obj_pos)


def history_inputs(tables: WorldTables, ep: EpisodeBatch, state: EnvState,
                   action_slot: jnp.ndarray, angle_feat_size: int = 4):
    """Inputs for the per-step history embedding (agent_cmt.py:198-215,589-594):
    current-view feature, full pano features + relative angles, and the chosen
    candidate's angle feature as prev-action angle (zero on stop)."""
    V = tables.views
    node_feat = _gather_sn(tables.feat, ep.scan, state.node)
    hist_img = jnp.take_along_axis(
        node_feat, state.view_index[:, None, None], axis=1)[:, 0]
    pano_ang = pano_rel_angles(state.view_index, V, angle_feat_size)

    _, adj_valid, _, c_head, c_elev = candidate_info(tables, ep, state)
    base_h = view_heading(state.view_index, V)[:, None]
    cand_ang = angle_feature(c_head - base_h, c_elev, angle_feat_size)
    K = adj_valid.shape[1]
    slot = jnp.clip(action_slot, 0, K - 1)
    is_move = (action_slot >= 0) & (action_slot < K)
    prev_act_angle = jnp.where(
        is_move[:, None],
        jnp.take_along_axis(cand_ang, slot[:, None, None].repeat(
            cand_ang.shape[-1], axis=2), axis=1)[:, 0],
        0.0)
    return hist_img, node_feat, pano_ang, prev_act_angle


def step_hamt(tables: WorldTables, ep: EpisodeBatch, state: EnvState,
              action_slot: jnp.ndarray) -> EnvState:
    """Apply candidate-slot actions. slot == K (stop) or ended items hold
    position; moving items jump to the neighbour and adopt its closest-view
    pose, exactly the terminal pose of make_equiv_action's turn sequence
    (agent_cmt.py:336-369)."""
    adj, adj_valid, pointid, _, _ = candidate_info(tables, ep, state)
    K = adj.shape[1]
    slot = jnp.clip(action_slot, 0, K - 1)
    take = jnp.take_along_axis
    tgt_node = take(adj, slot[:, None], axis=1)[:, 0]
    tgt_view = take(pointid, slot[:, None], axis=1)[:, 0]
    valid_move = (take(adj_valid, slot[:, None], axis=1)[:, 0]
                  & (action_slot >= 0) & (action_slot < K) & ~state.ended)

    node = jnp.where(valid_move, tgt_node, state.node)
    view = jnp.where(valid_move, tgt_view, state.view_index)
    new_len = jnp.where(valid_move, state.path_len + 1, state.path_len)
    path = jnp.where(
        (jnp.arange(state.path_nodes.shape[1])[None, :] == state.path_len[:, None])
        & valid_move[:, None],
        node[:, None], state.path_nodes)
    ended = state.ended | (action_slot == K) | (action_slot < 0)
    return state.replace(node=node, view_index=view, ended=ended,
                         step=state.step + 1, path_nodes=path, path_len=new_len)


def teacher_hamt(tables: WorldTables, ep: EpisodeBatch, state: EnvState,
                 t: jnp.ndarray, ignore_id: int,
                 shortest_teacher: bool = False) -> jnp.ndarray:
    """Teacher action slot. Time-indexed gt-path teacher by default
    (env.py:293-307): target = gt_path[t+1] (stop once t reaches the end);
    shortest_teacher follows the next hop towards the goal (env.py:213-219).
    Returns K (stop slot) to stop, ignore_id for ended items."""
    adj, adj_valid, _, _, _ = candidate_info(tables, ep, state)
    K = adj.shape[1]
    P = ep.gt_path.shape[1]
    goal = ep.goal

    if shortest_teacher:
        is_stop = state.node == goal
        target = tables.next_hop[ep.scan, state.node, goal]
    else:
        is_stop = t >= ep.gt_len - 1
        idx = jnp.broadcast_to(jnp.clip(t + 1, 0, P - 1), (ep.batch,))
        target = jnp.take_along_axis(ep.gt_path, idx[:, None], axis=1)[:, 0]

    match = adj_valid & (adj == target[:, None])
    slot = jnp.argmax(match, axis=1)
    has_match = jnp.any(match, axis=1)
    a = jnp.where(is_stop | ~has_match, K, slot)
    return jnp.where(state.ended, ignore_id, a)


def distance_to_goal(tables: WorldTables, ep: EpisodeBatch,
                     node: jnp.ndarray) -> jnp.ndarray:
    return tables.dist[ep.scan, node, ep.goal]


class DuetObs(NamedTuple):
    img: jnp.ndarray        # [B, T_pano, Df]
    loc: jnp.ndarray        # [B, T_pano, A+3] (angle feats + [1,1,1] box)
    nav_types: jnp.ndarray  # [B, T_pano] i32 (0 pano, 1 candidate, 2 object)
    valid: jnp.ndarray      # [B, T_pano] bool
    cand_nodes: jnp.ndarray  # [B, K] neighbour node id
    cand_valid: jnp.ndarray  # [B, K]
    obj_ids: Optional[jnp.ndarray] = None    # [B, Ko] dataset object ids
    obj_valid: Optional[jnp.ndarray] = None  # [B, Ko]


def observe_duet(tables: WorldTables, ep: EpisodeBatch, state: EnvState,
                 angle_feat_size: int = 4) -> DuetObs:
    """DUET pano token bank (no STOP token; the local branch prepends it):
    slots [0..K-1] candidates, [K..K+V-1] panorama views; views claimed by a
    candidate are masked (agent.py:53-96 `_panorama_feature_variable`)."""
    assert tables.feat is not None
    B = ep.batch
    V = tables.views
    Df = tables.feat.shape[-1]

    adj, adj_valid, pointid, c_head, c_elev = candidate_info(tables, ep, state)
    node_feat = _gather_sn(tables.feat, ep.scan, state.node)

    base_h = view_heading(state.view_index, V)[:, None]
    cand_img = jnp.take_along_axis(node_feat, pointid[:, :, None], axis=1)
    cand_ang = angle_feature(c_head - base_h, c_elev, angle_feat_size)
    cand_img = jnp.where(adj_valid[:, :, None], cand_img, 0.0)
    cand_ang = jnp.where(adj_valid[:, :, None], cand_ang, 0.0)

    pano_ang = pano_rel_angles(state.view_index, V, angle_feat_size)
    onehot = jax.nn.one_hot(pointid, V, dtype=jnp.bool_)
    used = jnp.any(onehot & adj_valid[:, :, None], axis=1)

    img = jnp.concatenate([cand_img, node_feat], axis=1)
    ang = jnp.concatenate([cand_ang, pano_ang], axis=1)
    box = jnp.ones(ang.shape[:2] + (3,), ang.dtype)  # [1,1,1] (agent.py:77)
    loc = jnp.concatenate([ang, box], axis=-1)
    K = adj_valid.shape[1]
    nav = jnp.concatenate([adj_valid.astype(jnp.int32),
                           jnp.zeros((B, V), jnp.int32)], axis=1)
    valid = jnp.concatenate([adj_valid, ~used], axis=1)

    obj_ids = obj_valid = None
    if tables.obj_feat is not None:
        # REVERIE/SOON: object tokens after the views, nav type 2
        # (reverie agent `_object_variable`, obj dims padded/truncated to Df)
        o_feat = _gather_sn(tables.obj_feat, ep.scan, state.node)
        o_ang = _gather_sn(tables.obj_ang, ep.scan, state.node)
        obj_valid = _gather_sn(tables.obj_valid, ep.scan, state.node)
        obj_ids = _gather_sn(tables.obj_ids, ep.scan, state.node)
        Do = o_feat.shape[-1]
        if Do < Df:
            o_feat = jnp.pad(o_feat, ((0, 0), (0, 0), (0, Df - Do)))
        else:
            o_feat = o_feat[..., :Df]
        o_ang_f = angle_feature(o_ang[..., 0] - base_h, o_ang[..., 1],
                                angle_feat_size)
        o_loc = jnp.concatenate(
            [o_ang_f, jnp.ones(o_ang_f.shape[:2] + (3,), o_ang_f.dtype)], -1)
        img = jnp.concatenate([img, o_feat * obj_valid[:, :, None]], 1)
        loc = jnp.concatenate([loc, o_loc], 1)
        nav = jnp.concatenate(
            [nav, jnp.full(obj_valid.shape, 2, jnp.int32) * obj_valid], 1)
        valid = jnp.concatenate([valid, obj_valid], 1)

    loc = loc * valid[:, :, None]
    return DuetObs(img=img, loc=loc, nav_types=nav, valid=valid,
                   cand_nodes=adj, cand_valid=adj_valid,
                   obj_ids=obj_ids, obj_valid=obj_valid)


def rel_pos_features(tables: WorldTables, ep: EpisodeBatch,
                     cur_node: jnp.ndarray, cur_heading: jnp.ndarray,
                     cur_elevation: jnp.ndarray, target_nodes: jnp.ndarray,
                     obs_dist: jnp.ndarray, obs_hops: jnp.ndarray,
                     angle_feat_size: int = 4) -> jnp.ndarray:
    """DUET 7-d relative position features from the current pose to each
    target node: angle feats of (heading, elevation) + [line_dist/30,
    shortest_dist/30, path_steps/10] (graph_utils.py:127-148)."""
    xyz = tables.node_xyz[ep.scan]                       # [B, N, 3]
    cur = jnp.take_along_axis(xyz, cur_node[:, None, None].repeat(3, -1),
                              axis=1)[:, 0]              # [B, 3]
    tgt = jnp.take_along_axis(
        xyz, target_nodes[:, :, None].repeat(3, -1), axis=1)  # [B, M, 3]
    d = tgt - cur[:, None, :]
    xy = jnp.maximum(jnp.sqrt(d[..., 0] ** 2 + d[..., 1] ** 2), 1e-8)
    xyz_dist = jnp.maximum(jnp.linalg.norm(d, axis=-1), 1e-8)
    heading = jnp.arctan2(d[..., 0], d[..., 1]) - cur_heading[:, None]
    elevation = jnp.arcsin(jnp.clip(d[..., 2] / xyz_dist, -1, 1)) \
        - cur_elevation[:, None]
    del xy
    ang = angle_feature(heading, elevation, angle_feat_size)
    rel = jnp.stack([xyz_dist / 30.0, obs_dist / 30.0, obs_hops / 10.0], -1)
    return jnp.concatenate([ang, rel.astype(ang.dtype)], axis=-1)


# ---------------------------------------------------------------------------
# Incremental DTW for per-step nDTW reward shaping (eval_utils.py:74-94).
# The DTW table over (prediction x reference) grows one row per action, so the
# rollout carries only the last row [B, P+1].
# ---------------------------------------------------------------------------

def dtw_init(tables: WorldTables, ep: EpisodeBatch) -> jnp.ndarray:
    """Row for the length-1 prediction [start]."""
    B = ep.batch
    P = ep.gt_path.shape[1]
    row0 = jnp.full((B, P + 1), INF).at[:, 0].set(0.0)
    return dtw_push(tables, ep, row0, ep.start_node)


def dtw_push(tables: WorldTables, ep: EpisodeBatch, row: jnp.ndarray,
             new_node: jnp.ndarray) -> jnp.ndarray:
    """Append one prediction node: row_i -> row_{i+1}."""
    P = ep.gt_path.shape[1]
    cost = tables.dist[ep.scan[:, None], new_node[:, None], ep.gt_path]  # [B,P]
    new_row = jnp.full_like(row, INF)

    def body(j, acc):
        best_prev = jnp.minimum(jnp.minimum(row[:, j], row[:, j - 1]),
                                acc[:, j - 1])
        return acc.at[:, j].set(cost[:, j - 1] + best_prev)

    return jax.lax.fori_loop(1, P + 1, body, new_row)


def dtw_ndtw(row: jnp.ndarray, ep: EpisodeBatch,
             threshold: float = 3.0) -> jnp.ndarray:
    """nDTW of the current prediction against the (masked) reference."""
    dtw = jnp.take_along_axis(row, ep.gt_len[:, None], axis=1)[:, 0]
    return jnp.exp(-dtw / (threshold * ep.gt_len.astype(jnp.float32)))


def dtw_push_multi(tables: WorldTables, ep: EpisodeBatch, rows: jnp.ndarray,
                   new_nodes: jnp.ndarray) -> jnp.ndarray:
    """Vectorized dtw_push over M hypothetical extensions per item:
    rows [B, M, P+1], new_nodes [B, M] -> updated rows.  Used by the DUET
    nDTW expert policy (agent.py:270-277) to score every map node's
    path-extension in parallel."""
    P = ep.gt_path.shape[1]
    cost = tables.dist[ep.scan[:, None, None], new_nodes[:, :, None],
                       ep.gt_path[:, None, :]]          # [B, M, P]
    new_rows = jnp.full_like(rows, INF)

    def body(j, acc):
        best_prev = jnp.minimum(jnp.minimum(rows[..., j], rows[..., j - 1]),
                                acc[..., j - 1])
        return acc.at[..., j].set(cost[..., j - 1] + best_prev)

    return jax.lax.fori_loop(1, P + 1, body, new_rows)


def dtw_ndtw_multi(rows: jnp.ndarray, ep: EpisodeBatch,
                   threshold: float = 3.0) -> jnp.ndarray:
    """[B, M, P+1] rows -> [B, M] nDTW values."""
    B, M, _ = rows.shape
    dtw = jnp.take_along_axis(
        rows, jnp.broadcast_to(ep.gt_len[:, None, None], (B, M, 1)),
        axis=2)[..., 0]
    return jnp.exp(-dtw / (threshold * ep.gt_len[:, None].astype(jnp.float32)))
