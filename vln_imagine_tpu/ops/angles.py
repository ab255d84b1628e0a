"""Discretized-viewpoint angle features, without a simulator.

The reference derives these by stepping a MatterSim camera through all 36 views
(VLN-HAMT/finetune_src/r2r/data_utils.py:506-535).  The simulator's discretized
geometry is closed-form: view index ``ix`` in [0, 36) has absolute heading
``(ix % 12) * 30deg`` and elevation ``(ix // 12 - 1) * 30deg`` (rows: down,
horizon, up — env.py:76-79).  The 4-d angle feature is
``[sin(h), cos(h), sin(e), cos(e)]`` tiled to ``angle_feat_size``
(data_utils.py:481-484).
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

RAD30 = math.radians(30.0)


def view_heading(view_index, views: int = 36):
    """Absolute heading (radians) of a discretized view index."""
    per_row = views // 3
    return (view_index % per_row) * (2.0 * math.pi / per_row)


def view_elevation(view_index, views: int = 36):
    """Absolute elevation (radians): -30 / 0 / +30 degrees by row."""
    per_row = views // 3
    return (view_index // per_row - 1) * RAD30


def angle_feature(heading, elevation, angle_feat_size: int = 4):
    """[sin h, cos h, sin e, cos e] tiled to angle_feat_size; last-dim output."""
    heading, elevation = jnp.broadcast_arrays(heading, elevation)
    base = jnp.stack(
        [jnp.sin(heading), jnp.cos(heading), jnp.sin(elevation), jnp.cos(elevation)],
        axis=-1,
    )
    reps = angle_feat_size // 4
    if reps > 1:
        base = jnp.concatenate([base] * reps, axis=-1)
    return base


def all_point_angle_feature(angle_feat_size: int = 4, views: int = 36) -> np.ndarray:
    """[views, views, angle_feat_size]: for each base view b, the angle features
    of every view ix *relative to b's heading* (elevation stays absolute).

    Matches get_all_point_angle_feature (data_utils.py:531-535, the
    minus_elevation=False default used by R2RBatch at env.py:158)."""
    ix = np.arange(views)
    per_row = views // 3
    abs_heading = (ix % per_row) * (2.0 * math.pi / per_row)
    abs_elev = (ix // per_row - 1) * RAD30
    out = np.zeros((views, views, angle_feat_size), np.float32)
    for b in range(views):
        base_heading = (b % per_row) * (2.0 * math.pi / per_row)
        h = abs_heading - base_heading
        e = abs_elev
        feat = np.stack([np.sin(h), np.cos(h), np.sin(e), np.cos(e)], axis=-1)
        out[b] = np.concatenate([feat] * (angle_feat_size // 4), axis=-1)
    return out
