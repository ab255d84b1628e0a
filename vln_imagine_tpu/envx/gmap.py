"""Array-based topological GraphMap for the DUET agent.

The reference maintains one python GraphMap per batch item — dict node
positions, an incremental string-keyed Floyd-Warshall, running-mean node
embeddings (VLN-DUET/map_nav_src/models/graph_utils.py:43-148).  Here the maps
for the whole batch are one pytree of fixed-capacity arrays so the episode
stays inside lax.scan:

- slots [0..G): insertion-ordered node buffer per item; `slot_of[b, n]` maps a
  scan node id to its slot (-1 when absent)
- `dist/nxt/hops` [B, G, G]: observed-subgraph shortest paths maintained by
  the same incremental relaxation as FloydGraph.update (relax only through
  nodes as they are visited) with next-hop reconstruction replacing the
  recursive midpoint `path()` (graph_utils.py:76-92)
- an extra trash slot (index G) absorbs writes for masked-out lanes, keeping
  every scatter shape-static

All functions are pure (state in, state out).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from vln_imagine_tpu.envx.tables import INF

MAX_DIST = 30.0  # pos-feature normalisers (graph_utils.py:4-5)
MAX_STEP = 10.0


@struct.dataclass
class GmapState:
    node_ids: jnp.ndarray   # [B, G+1] i32 (slot G = trash)
    slot_of: jnp.ndarray    # [B, N+1] i32, -1 when absent (column N = trash)
    count: jnp.ndarray      # [B] i32
    visited: jnp.ndarray    # [B, G+1] bool
    step_ids: jnp.ndarray   # [B, G+1] i32
    emb_sum: jnp.ndarray    # [B, G+1, H] f32
    emb_cnt: jnp.ndarray    # [B, G+1] f32
    dist: jnp.ndarray       # [B, G+1, G+1] f32
    nxt: jnp.ndarray        # [B, G+1, G+1] i32 (slot index of next hop)
    hops: jnp.ndarray       # [B, G+1, G+1] i32
    stop_scores: jnp.ndarray  # [B, G+1] f32 (per-node stop prob)

    @property
    def capacity(self) -> int:
        return self.node_ids.shape[1] - 1

    @property
    def trash(self) -> int:
        return self.node_ids.shape[1] - 1

    def valid(self) -> jnp.ndarray:
        """[B, G+1] slot validity."""
        G1 = self.node_ids.shape[1]
        return jnp.arange(G1)[None, :] < self.count[:, None]


def gmap_init(batch: int, capacity: int, max_nodes: int,
              hidden: int) -> GmapState:
    G1 = capacity + 1
    dist = jnp.full((batch, G1, G1), INF)
    eye = jnp.eye(G1, dtype=bool)
    dist = jnp.where(eye[None], 0.0, dist)
    nxt = jnp.where(eye[None], jnp.arange(G1)[None, :, None], -1).astype(jnp.int32)
    hops = jnp.where(eye[None], 0, 10**6).astype(jnp.int32)
    return GmapState(
        node_ids=jnp.zeros((batch, G1), jnp.int32),
        # one trash column so masked scatter lanes never collide with a
        # genuine write to node id 0 (duplicate-index scatter order is
        # unspecified)
        slot_of=jnp.full((batch, max_nodes + 1), -1, jnp.int32),
        count=jnp.zeros((batch,), jnp.int32),
        visited=jnp.zeros((batch, G1), bool),
        step_ids=jnp.zeros((batch, G1), jnp.int32),
        emb_sum=jnp.zeros((batch, G1, hidden)),
        emb_cnt=jnp.zeros((batch, G1)),
        dist=dist, nxt=nxt, hops=hops,
        stop_scores=jnp.full((batch, G1), -jnp.inf),
    )


def _b(batch):
    return jnp.arange(batch)


def add_nodes(st: GmapState, nodes: jnp.ndarray, valid: jnp.ndarray
              ) -> GmapState:
    """Insert nodes[b, m] (mutually distinct per item) that are absent.
    Masked or existing entries write idempotently / to the trash slot."""
    B, M = nodes.shape
    existing = jnp.take_along_axis(st.slot_of, nodes, axis=1)  # [B, M]
    is_new = valid & (existing < 0)
    new_slot = st.count[:, None] + jnp.cumsum(is_new, axis=1) - 1
    overflow = new_slot >= st.capacity
    target = jnp.where(is_new & ~overflow, new_slot,
                       jnp.where(valid & (existing >= 0), existing, st.trash))
    b = _b(B)[:, None]
    node_ids = st.node_ids.at[b, target].set(
        jnp.where(target == st.trash, st.node_ids[:, -1:], nodes))
    # masked lanes write the trash column (not node id 0 — a same-call
    # genuine insert of node 0 would race it with unspecified winner)
    n_trash = st.slot_of.shape[1] - 1
    slot_of = st.slot_of.at[b, jnp.where(valid & ~overflow, nodes,
                                         n_trash)].set(
        jnp.where(valid & ~overflow, target, st.slot_of[:, -1:]))
    count = jnp.minimum(st.count + jnp.sum(is_new & ~overflow, axis=1),
                        st.capacity)
    return st.replace(node_ids=node_ids, slot_of=slot_of, count=count)


def add_edges(st: GmapState, src_node: jnp.ndarray, dst_nodes: jnp.ndarray,
              weights: jnp.ndarray, valid: jnp.ndarray) -> GmapState:
    """Undirected edges src->dst_k with euclidean weights
    (GraphMap.update_graph, graph_utils.py:106-112)."""
    B, K = dst_nodes.shape
    b = _b(B)
    s = jnp.take_along_axis(st.slot_of, src_node[:, None], axis=1)  # [B,1]
    d = jnp.take_along_axis(st.slot_of, dst_nodes, axis=1)          # [B,K]
    ok = valid & (s >= 0) & (d >= 0)
    s_idx = jnp.where(ok, jnp.broadcast_to(s, (B, K)), st.trash)
    d_idx = jnp.where(ok, d, st.trash)

    cur = st.dist[b[:, None], s_idx, d_idx]
    better = ok & (weights < cur)
    s_w = jnp.where(better, s_idx, st.trash)
    d_w = jnp.where(better, d_idx, st.trash)
    dist = st.dist.at[b[:, None], s_w, d_w].min(weights)
    dist = dist.at[b[:, None], d_w, s_w].min(weights)
    nxt = st.nxt.at[b[:, None], s_w, d_w].set(d_w)
    nxt = nxt.at[b[:, None], d_w, s_w].set(s_w)
    hops = st.hops.at[b[:, None], s_w, d_w].set(1)
    hops = hops.at[b[:, None], d_w, s_w].set(1)
    # trash row/col self-heal: keep trash-to-trash at 0/identity
    return st.replace(dist=dist, nxt=nxt, hops=hops)


def relax(st: GmapState, k_node: jnp.ndarray, active: jnp.ndarray
          ) -> GmapState:
    """One Floyd relaxation through the (just visited) node k
    (FloydGraph.update, graph_utils.py:62-71)."""
    B = k_node.shape[0]
    b = _b(B)
    k = jnp.take_along_axis(st.slot_of, k_node[:, None], axis=1)[:, 0]
    k = jnp.where(active & (k >= 0), k, st.trash)
    dk = st.dist[b, :, k]                   # [B, G+1] distances x->k
    hk = st.hops[b, :, k]
    alt = dk[:, :, None] + dk[:, None, :]
    better = (alt < st.dist) & active[:, None, None]
    # do not touch trash row/col or diagonal
    G1 = st.dist.shape[1]
    keep = (jnp.arange(G1) == st.trash)
    better = better & ~keep[None, :, None] & ~keep[None, None, :]
    dist = jnp.where(better, alt, st.dist)
    nxt_xk = st.nxt[b, :, k]                # [B, G+1]
    nxt = jnp.where(better, nxt_xk[:, :, None], st.nxt)
    hops = jnp.where(better, hk[:, :, None] + hk[:, None, :], st.hops)
    return st.replace(dist=dist, nxt=nxt, hops=hops)


def set_visited(st: GmapState, node: jnp.ndarray, t, active: jnp.ndarray
                ) -> GmapState:
    B = node.shape[0]
    b = _b(B)
    s = jnp.take_along_axis(st.slot_of, node[:, None], axis=1)[:, 0]
    s = jnp.where(active & (s >= 0), s, st.trash)
    visited = st.visited.at[b, s].set(jnp.where(s == st.trash,
                                                st.visited[:, -1], True))
    step_ids = st.step_ids.at[b, s].set(
        jnp.where(s == st.trash, st.step_ids[:, -1], t + 1))
    return st.replace(visited=visited, step_ids=step_ids)


def update_embeds(st: GmapState, cur_node, avg_embed, cand_nodes, cand_embeds,
                  cand_valid, active) -> GmapState:
    """Visited current node: rewrite with the averaged pano embedding;
    unvisited candidates: accumulate their view embedding
    (agent.py:471-479, graph_utils.py:114-125)."""
    B, K = cand_nodes.shape
    b = _b(B)
    s = jnp.take_along_axis(st.slot_of, cur_node[:, None], axis=1)[:, 0]
    s = jnp.where(active & (s >= 0), s, st.trash)
    emb_sum = st.emb_sum.at[b, s].set(
        jnp.where((s == st.trash)[:, None], st.emb_sum[:, -1], avg_embed))
    emb_cnt = st.emb_cnt.at[b, s].set(jnp.where(s == st.trash,
                                                st.emb_cnt[:, -1], 1.0))

    d = jnp.take_along_axis(st.slot_of, cand_nodes, axis=1)  # [B,K]
    d_vis = jnp.take_along_axis(st.visited, jnp.maximum(d, 0), axis=1)
    ok = cand_valid & active[:, None] & (d >= 0) & ~d_vis
    d_idx = jnp.where(ok, d, st.trash)
    emb_sum = emb_sum.at[b[:, None], d_idx].add(
        jnp.where(ok[:, :, None], cand_embeds, 0.0))
    emb_cnt = emb_cnt.at[b[:, None], d_idx].add(jnp.where(ok, 1.0, 0.0))
    return st.replace(emb_sum=emb_sum, emb_cnt=emb_cnt)


def node_embeds(st: GmapState) -> jnp.ndarray:
    """[B, G+1, H] running-mean embeddings (get_node_embed)."""
    return st.emb_sum / jnp.maximum(st.emb_cnt[:, :, None], 1.0)


def follow_path(st: GmapState, src_node: jnp.ndarray, dst_node: jnp.ndarray,
                max_hops: int):
    """Observed-graph path src -> dst as slot-index hops.

    Returns (nodes [B, max_hops] i32 node ids after src, valid [B, max_hops])
    — the FloydGraph.path() equivalent (graph_utils.py:76-92) via next-hop
    chasing instead of recursive midpoints."""
    B = src_node.shape[0]
    b = _b(B)
    s = jnp.take_along_axis(st.slot_of, src_node[:, None], axis=1)[:, 0]
    d = jnp.take_along_axis(st.slot_of, dst_node[:, None], axis=1)[:, 0]
    s = jnp.where(s >= 0, s, st.trash)
    d = jnp.where(d >= 0, d, st.trash)

    def body(i, carry):
        cur, nodes, valid = carry
        done = cur == d
        nxt_slot = st.nxt[b, cur, d]
        nxt_slot = jnp.where(done | (nxt_slot < 0), cur, nxt_slot)
        step_valid = ~done & (nxt_slot != cur)
        nodes = nodes.at[:, i].set(
            jnp.take_along_axis(st.node_ids, nxt_slot[:, None], axis=1)[:, 0])
        valid = valid.at[:, i].set(step_valid)
        return nxt_slot, nodes, valid

    nodes0 = jnp.zeros((B, max_hops), jnp.int32)
    valid0 = jnp.zeros((B, max_hops), bool)
    _, nodes, valid = jax.lax.fori_loop(0, max_hops, body, (s, nodes0, valid0))
    return nodes, valid


def pair_dists(st: GmapState) -> jnp.ndarray:
    """[B, G+1, G+1] observed distances with INF/trash zeroed — input to the
    sprel attention bias (agent.py:137-141)."""
    d = jnp.where(st.dist >= INF / 2, 0.0, st.dist)
    v = st.valid()
    return d * v[:, :, None] * v[:, None, :]
