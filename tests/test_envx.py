"""Compiled environment: tables, stepping, teacher, DTW — cross-checked against
the host reference simulator and brute-force graph algorithms."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vln_imagine_tpu.envx import synthetic_world, synthetic_episodes
from vln_imagine_tpu.envx import env as envx
from vln_imagine_tpu.envx.compiler import closest_view, heading_elevation
from vln_imagine_tpu.envx.hostsim import GraphSimulator
from vln_imagine_tpu.envx.tables import INF
from vln_imagine_tpu.eval.metrics import cal_dtw


@pytest.fixture(scope="module")
def world_graphs():
    world, graphs = synthetic_world(num_scans=2, num_nodes=20, feat_dim=8, seed=3)
    return jax.tree.map(jnp.asarray, world), graphs


@pytest.fixture(scope="module")
def episodes(world_graphs):
    world, _ = world_graphs
    return synthetic_episodes(world, batch=6, max_gt_path_len=8,
                              max_instr_len=12, vocab_size=64, seed=7)


def dijkstra(n, edges, xyz, src):
    import heapq
    adj = [[] for _ in range(n)]
    for a, b in edges:
        w = float(np.linalg.norm(xyz[a] - xyz[b]))
        adj[a].append((b, w))
        adj[b].append((a, w))
    dist = [float("inf")] * n
    dist[src] = 0.0
    pq = [(0.0, src)]
    while pq:
        d, u = heapq.heappop(pq)
        if d > dist[u] + 1e-12:
            continue
        for v, w in adj[u]:
            if d + w < dist[v] - 1e-12:
                dist[v] = d + w
                heapq.heappush(pq, (d + w, v))
    return dist


def test_floyd_matches_dijkstra(world_graphs):
    world, graphs = world_graphs
    g = graphs[0]
    for src in range(0, g.num_nodes, 5):
        ref = dijkstra(g.num_nodes, g.edges, g.xyz, src)
        got = np.asarray(world.dist)[0, src, :g.num_nodes]
        np.testing.assert_allclose(got, ref, rtol=1e-5)


def test_next_hop_reconstructs_shortest_path(world_graphs):
    world, graphs = world_graphs
    g = graphs[0]
    dist = np.asarray(world.dist)[0]
    nxt = np.asarray(world.next_hop)[0]
    for a in range(0, g.num_nodes, 3):
        for b in range(0, g.num_nodes, 4):
            cur, total, steps = a, 0.0, 0
            while cur != b:
                n = nxt[cur, b]
                total += dist[cur, n]
                cur = int(n)
                steps += 1
                assert steps <= g.num_nodes
            assert abs(total - dist[a, b]) < 1e-4


def test_hops_match_path_reconstruction(world_graphs):
    world, graphs = world_graphs
    g = graphs[0]
    nxt = np.asarray(world.next_hop)[0]
    hops = np.asarray(world.hops)[0]
    for a in range(0, g.num_nodes, 4):
        for b in range(0, g.num_nodes, 5):
            cur, steps = a, 0
            while cur != b:
                cur = int(nxt[cur, b])
                steps += 1
            assert hops[a, b] == steps


def test_candidate_tables_match_hostsim(world_graphs):
    world, graphs = world_graphs
    g = graphs[0]
    sim = GraphSimulator({g.scan_id: g})
    adj = np.asarray(world.adj)[0]
    adj_valid = np.asarray(world.adj_valid)[0]
    pid = np.asarray(world.cand_pointid)[0]
    for node in range(0, g.num_nodes, 2):
        sim.newEpisode(g.scan_id, g.node_ids[node], 0.0)
        cands = sim.candidates()
        table = {int(adj[node, k]): int(pid[node, k])
                 for k in range(adj.shape[1]) if adj_valid[node, k]}
        assert len(cands) == len(table)
        for vid, (pointid, h, e) in cands.items():
            j = g.id_to_index[vid]
            assert table[j] == pointid


def test_closest_view_selection():
    # heading 0 elevation 0 -> view 12 (horizon row start)
    assert closest_view(0.0, 0.0) == 12
    # heading 90deg -> column 3 of horizon row
    assert closest_view(np.pi / 2, 0.0) == 15
    # looking up 25deg -> top row
    assert closest_view(0.0, np.radians(25)) == 24
    # looking down -> bottom row
    assert closest_view(0.0, np.radians(-20)) == 0
    # wraps negative headings
    assert closest_view(-np.pi / 6, 0.0) == 23


def test_heading_convention_matches_reference():
    # the simulator's transposed axes: +y is heading 0, +x is heading pi/2
    h, e = heading_elevation(np.zeros(3), np.array([0.0, 1.0, 0.0]))
    assert abs(h) < 1e-9 and abs(e) < 1e-9
    h, _ = heading_elevation(np.zeros(3), np.array([1.0, 0.0, 0.0]))
    assert abs(h - np.pi / 2) < 1e-9
    _, e = heading_elevation(np.zeros(3), np.array([0.0, 1.0, 1.0]))
    assert abs(e - np.pi / 4) < 1e-9


def test_reset_and_observe_shapes(world_graphs, episodes):
    world, _ = world_graphs
    ep = jax.tree.map(jnp.asarray, episodes)
    state = envx.reset(world, ep, max_action_len=6)
    obs = envx.observe_hamt(world, ep, state)
    B, K, V = ep.batch, world.max_candidates, world.views
    assert obs.img.shape == (B, K + 1 + V, world.feat.shape[-1])
    assert obs.ang.shape == (B, K + 1 + V, 4)
    # valid-token count == n_cand + 1 + (V - used views), as in the reference
    adj_valid = np.asarray(world.adj_valid)[np.asarray(ep.scan),
                                            np.asarray(state.node)]
    pid = np.asarray(world.cand_pointid)[np.asarray(ep.scan),
                                         np.asarray(state.node)]
    for b in range(B):
        used = {int(p) for p, v in zip(pid[b], adj_valid[b]) if v}
        expect = int(adj_valid[b].sum()) + 1 + V - len(used)
        assert int(np.asarray(obs.valid)[b].sum()) == expect
    # nav types: candidates 1, stop 2, pano 0
    nav = np.asarray(obs.nav_types)
    assert (nav[:, K] == 2).all()
    assert set(np.unique(nav[:, :K])) <= {0, 1}


def test_step_moves_to_neighbor(world_graphs, episodes):
    world, _ = world_graphs
    ep = jax.tree.map(jnp.asarray, episodes)
    state = envx.reset(world, ep, max_action_len=6)
    K = world.max_candidates
    # take candidate slot 0 (always valid: every node has degree >= 1)
    a = jnp.zeros((ep.batch,), jnp.int32)
    s2 = envx.step_hamt(world, ep, state, a)
    adj = np.asarray(world.adj)[np.asarray(ep.scan), np.asarray(state.node)]
    np.testing.assert_array_equal(np.asarray(s2.node), adj[:, 0])
    pid = np.asarray(world.cand_pointid)[np.asarray(ep.scan),
                                         np.asarray(state.node)]
    np.testing.assert_array_equal(np.asarray(s2.view_index), pid[:, 0])
    assert (np.asarray(s2.path_len) == 2).all()
    np.testing.assert_array_equal(np.asarray(s2.path_nodes)[:, 1],
                                  np.asarray(s2.node))
    # stop action ends the episode and freezes the pose
    s3 = envx.step_hamt(world, ep, s2, jnp.full((ep.batch,), K, jnp.int32))
    assert np.asarray(s3.ended).all()
    np.testing.assert_array_equal(np.asarray(s3.node), np.asarray(s2.node))
    # actions after end are ignored
    s4 = envx.step_hamt(world, ep, s3, jnp.zeros((ep.batch,), jnp.int32))
    np.testing.assert_array_equal(np.asarray(s4.node), np.asarray(s3.node))
    assert (np.asarray(s4.path_len) == 2).all()


def test_teacher_follows_gt_path(world_graphs, episodes):
    world, _ = world_graphs
    ep = jax.tree.map(jnp.asarray, episodes)
    state = envx.reset(world, ep, max_action_len=6)
    ignore = -100
    gt_path = np.asarray(ep.gt_path)
    gt_len = np.asarray(ep.gt_len)
    K = world.max_candidates
    for t in range(6):
        a = np.asarray(envx.teacher_hamt(world, ep, state, jnp.asarray(t), ignore))
        for b in range(ep.batch):
            if np.asarray(state.ended)[b]:
                assert a[b] == ignore
            elif t >= gt_len[b] - 1:
                assert a[b] == K
        state = envx.step_hamt(world, ep, state, jnp.asarray(a))
        for b in range(ep.batch):
            if a[b] not in (ignore, K):
                assert int(np.asarray(state.node)[b]) == gt_path[b, t + 1]
    # after following the teacher, every item sits on its goal
    np.testing.assert_array_equal(np.asarray(state.node), np.asarray(ep.goal))


def test_shortest_teacher_reaches_goal(world_graphs, episodes):
    world, _ = world_graphs
    ep = jax.tree.map(jnp.asarray, episodes)
    state = envx.reset(world, ep, max_action_len=8)
    for t in range(8):
        a = envx.teacher_hamt(world, ep, state, jnp.asarray(t), -100,
                              shortest_teacher=True)
        state = envx.step_hamt(world, ep, state, a)
    np.testing.assert_array_equal(np.asarray(state.node), np.asarray(ep.goal))


def test_incremental_dtw_matches_full(world_graphs, episodes):
    world, _ = world_graphs
    ep = jax.tree.map(jnp.asarray, episodes)
    state = envx.reset(world, ep, max_action_len=6)
    row = envx.dtw_init(world, ep)
    dist = np.asarray(world.dist)
    paths = [[int(n)] for n in np.asarray(ep.start_node)]
    rng = np.random.default_rng(0)
    for t in range(5):
        # random valid candidate moves
        adj_valid = np.asarray(world.adj_valid)[np.asarray(ep.scan),
                                                np.asarray(state.node)]
        a = np.array([rng.choice(np.flatnonzero(v)) for v in adj_valid],
                     np.int32)
        state = envx.step_hamt(world, ep, state, jnp.asarray(a))
        for b in range(ep.batch):
            paths[b].append(int(np.asarray(state.node)[b]))
        row = envx.dtw_push(world, ep, row, state.node)
        ndtw = np.asarray(envx.dtw_ndtw(row, ep))
        for b in range(ep.batch):
            gt = list(np.asarray(ep.gt_path)[b, :np.asarray(ep.gt_len)[b]])
            ref = cal_dtw(dist[np.asarray(ep.scan)[b]], paths[b], gt)["nDTW"]
            assert abs(ndtw[b] - ref) < 1e-4, (t, b)


def test_episode_gt_paths_are_shortest(world_graphs, episodes):
    world, _ = world_graphs
    dist = np.asarray(world.dist)
    for b in range(episodes.batch):
        s = episodes.scan[b]
        gt = episodes.gt_path[b, :episodes.gt_len[b]]
        total = sum(dist[s, a, c] for a, c in zip(gt[:-1], gt[1:]))
        assert abs(total - dist[s, gt[0], gt[-1]]) < 1e-4
        assert (dist[s, gt[0], gt[-1]] < INF / 2)
