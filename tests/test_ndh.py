"""CVDN/NDH data path: dialog episodes + shortest-path teacher."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from vln_imagine_tpu.config import tiny_test_config
from vln_imagine_tpu.data.annotations import ndh_episodes_from_annotations
from vln_imagine_tpu.envx import env as envx
from vln_imagine_tpu.envx.synthetic import random_scan_graph
from vln_imagine_tpu.envx.compiler import compile_world
from vln_imagine_tpu.variants import eval_item_ndh


def test_ndh_episodes_and_shortest_teacher():
    cfg = dataclasses.replace(tiny_test_config("hamt"), dataset="cvdn")
    rng = np.random.default_rng(2)
    g = random_scan_graph(rng, "sc", 14)
    world_np = compile_world([g], max_candidates=cfg.env.max_candidates,
                             views=cfg.env.views)
    S, N = world_np.node_xyz.shape[:2]
    feat = rng.standard_normal((S, N, cfg.env.views,
                                cfg.model.image_feat_size)).astype(np.float32)
    world = jax.tree.map(jnp.asarray, world_np.replace(feat=feat))

    items = [{
        "scan": "sc", "inst_idx": 7,
        "start_pano": g.node_ids[0], "start_heading": 1.0,
        "end_panos": [g.node_ids[5], g.node_ids[9]],
        "instr_encoding": [1, 11, 12, 13, 14],  # pre-encoded dialog
        "nav_steps": [g.node_ids[0], g.node_ids[2]], "nav_idx": 0,
    }]
    ep_np, ids, end_panos = ndh_episodes_from_annotations(
        items, [g], cfg.env.max_instr_len, cfg.env.max_gt_path_len,
        cfg.model.max_imagination_len, rng=np.random.default_rng(0))
    assert ids == ["7"]
    assert set(end_panos[0]) == {5, 9}
    goal = int(np.asarray(ep_np.goal)[0])
    assert goal in (5, 9)

    # shortest teacher drives the agent to the sampled goal
    ep = jax.tree.map(jnp.asarray, ep_np)
    state = envx.reset(world, ep, cfg.env.max_action_len)
    for t in range(cfg.env.max_action_len):
        a = envx.teacher_hamt(world, ep, state, jnp.asarray(t), -100,
                              shortest_teacher=True)
        state = envx.step_hamt(world, ep, state, a)
    assert int(np.asarray(state.node)[0]) == goal

    # goal-progress eval over the traversed path
    path = list(np.asarray(state.path_nodes)[0, :np.asarray(state.path_len)[0]])
    s = eval_item_ndh(np.asarray(world_np.dist)[0], path, end_panos[0])
    assert s["gp"] > 0 or s["success"] == 1.0


def test_sampled_goal_gt_path_is_true_shortest_path():
    """The sampled-goal supervision path must be the full shortest path, not
    a [start, end] stub — nDTW/SDTW metrics and DTW reward shaping score
    against gt_path (NDHNavBatch resolves the actual path via its nav graph,
    cvdn/env.py:30-45)."""
    cfg = dataclasses.replace(tiny_test_config("hamt"), dataset="cvdn")
    rng = np.random.default_rng(4)
    g = random_scan_graph(rng, "sc", 18)
    world_np = compile_world([g], max_candidates=cfg.env.max_candidates,
                             views=cfg.env.views)
    dist = np.asarray(world_np.dist)[0]
    adjacency = {(a, b) for a, b in g.edges} | {(b, a) for a, b in g.edges}

    items = [{
        "scan": "sc", "inst_idx": i,
        "start_pano": g.node_ids[i], "start_heading": 0.0,
        "end_panos": [g.node_ids[17 - i]],
        "instr_encoding": [1, 2, 3],
    } for i in range(6)]
    ep_np, _, end_panos = ndh_episodes_from_annotations(
        items, [g], cfg.env.max_instr_len, cfg.env.max_gt_path_len,
        cfg.model.max_imagination_len, rng=np.random.default_rng(0))

    gt_path = np.asarray(ep_np.gt_path)
    gt_len = np.asarray(ep_np.gt_len)
    for b in range(len(items)):
        path = list(gt_path[b, :gt_len[b]])
        goal = end_panos[b][0]
        # clipped at max_gt_path_len: check the prefix is still optimal
        assert path[0] == b
        for u, v in zip(path, path[1:]):
            assert (int(u), int(v)) in adjacency, "gt path is not a graph walk"
        if path[-1] == goal:
            # full path fit inside max_gt_path_len: its walked length must
            # equal the shortest geodesic distance (optimality)
            walked = sum(dist[int(u), int(v)]
                         for u, v in zip(path, path[1:]))
            assert np.isclose(walked, dist[b, goal], atol=1e-4), \
                "gt path is not the shortest path"
