"""Array world model: the Matterport viewpoint graph as dense per-scan tables.

The reference drives one MatterSim C++ simulator per batch slot in graph-only
mode (rendering disabled; VLN-HAMT/finetune_src/r2r/env.py:50-61) and re-derives
candidates/shortest paths with python dicts + networkx (env.py:170-291).  Here
the whole world is compiled offline into fixed-shape arrays so that an entire
batched episode — observation assembly, action prediction, state transition,
teacher lookup, reward shaping — runs inside one XLA program via lax.scan.

Shape glossary: S scans, N max nodes per scan, K max candidates (graph degree),
V discretized views (36), P max ground-truth path length, L max instruction
tokens, I max imaginations, B batch.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np
from flax import struct

INF = 1.0e9


@struct.dataclass
class WorldTables:
    """Static per-scan navigation tables (compiled once, device-resident)."""

    node_xyz: jnp.ndarray      # [S, N, 3] f32 viewpoint positions
    node_valid: jnp.ndarray    # [S, N] bool
    adj: jnp.ndarray           # [S, N, K] i32 neighbour node id (0 if invalid)
    adj_valid: jnp.ndarray     # [S, N, K] bool
    cand_pointid: jnp.ndarray  # [S, N, K] i32 closest discretized view index
    cand_heading: jnp.ndarray  # [S, N, K] f32 absolute heading to neighbour
    cand_elevation: jnp.ndarray  # [S, N, K] f32 absolute elevation to neighbour
    dist: jnp.ndarray          # [S, N, N] f32 all-pairs geodesic distance
    next_hop: jnp.ndarray      # [S, N, N] i32 next node on shortest path
    hops: jnp.ndarray          # [S, N, N] i32 number of edges on shortest path
    feat: Optional[jnp.ndarray] = None  # [S, N, V, Df] f32 view features
    # REVERIE/SOON object annotations (None for object-free tasks)
    obj_feat: Optional[jnp.ndarray] = None   # [S, N, Ko, Do] f32
    obj_ang: Optional[jnp.ndarray] = None    # [S, N, Ko, 2] heading/elev
    obj_valid: Optional[jnp.ndarray] = None  # [S, N, Ko] bool
    obj_ids: Optional[jnp.ndarray] = None    # [S, N, Ko] i32 dataset obj id
    obj_pos: Optional[jnp.ndarray] = None    # [S, N, Ko, 5] normalized bbox
    # (x1,y1,x2,y2,area — get_obj_local_pos, reverie/data_utils.py:25-31)

    @property
    def max_objects(self) -> int:
        return 0 if self.obj_feat is None else self.obj_feat.shape[2]

    @property
    def num_scans(self) -> int:
        return self.node_xyz.shape[0]

    @property
    def max_nodes(self) -> int:
        return self.node_xyz.shape[1]

    @property
    def max_candidates(self) -> int:
        return self.adj.shape[2]

    @property
    def views(self) -> int:
        return self.feat.shape[2] if self.feat is not None else 36


@struct.dataclass
class EpisodeBatch:
    """Per-episode static inputs (one R2R instruction per batch slot)."""

    scan: jnp.ndarray          # [B] i32 scan index
    start_node: jnp.ndarray    # [B] i32
    start_heading: jnp.ndarray  # [B] f32 (radians, pre-snap)
    gt_path: jnp.ndarray       # [B, P] i32, padded by repeating the goal
    gt_len: jnp.ndarray        # [B] i32
    txt_ids: jnp.ndarray       # [B, L] i32
    txt_mask: jnp.ndarray      # [B, L] bool
    imagine_feats: jnp.ndarray  # [B, I, Df] f32
    imagine_mask: jnp.ndarray  # [B, I] bool (generated-flag per sub-instruction)
    np_weights: jnp.ndarray    # [B, I, L] f32 noun-phrase mean weights
    # (row i sums to 1 over the noun-phrase tokens of sub-instruction i; used by
    #  the contrastive aux loss, replacing the python double loop in
    #  vilmodel_cmt.py:750-790)
    midstop: Optional[jnp.ndarray] = None  # [B] i32 r2r_back turn-around node
    gt_obj_id: Optional[jnp.ndarray] = None  # [B] i32 REVERIE/SOON target obj
    # [B, I, Hp, Wp, 3] raw (preprocessed) imagination images, used instead of
    # imagine_feats when ModelConfig.e2e_imagination != 'off'
    imagine_images: Optional[jnp.ndarray] = None

    @property
    def batch(self) -> int:
        return self.scan.shape[0]

    @property
    def goal(self) -> jnp.ndarray:
        return self.gt_path[jnp.arange(self.batch), self.gt_len - 1]


@struct.dataclass
class EnvState:
    """Dynamic rollout state — a pytree of fixed-shape arrays carried through
    jax.lax.scan over the episode time axis."""

    node: jnp.ndarray        # [B] i32 current viewpoint
    view_index: jnp.ndarray  # [B] i32 current discretized view (0..V-1)
    ended: jnp.ndarray       # [B] bool
    step: jnp.ndarray        # [] i32 global time step
    path_nodes: jnp.ndarray  # [B, T+1] i32 visited node per action step
    path_len: jnp.ndarray    # [B] i32 number of valid entries in path_nodes


def snap_heading_to_view(heading: jnp.ndarray, views: int = 36) -> jnp.ndarray:
    """Discretize an arbitrary start heading onto the horizon row, as MatterSim
    does with setDiscretizedViewingAngles(True) (env.py:57)."""
    per_row = views // 3
    col = jnp.round(heading / (2.0 * np.pi / per_row)).astype(jnp.int32) % per_row
    return per_row + col  # horizon row (elevation 0)
