"""Array GraphMap vs a host-side incremental-Floyd mirror."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vln_imagine_tpu.envx import gmap as G
from vln_imagine_tpu.envx.tables import INF


class HostFloyd:
    """Reference semantics of the incremental FloydGraph
    (VLN-DUET/map_nav_src/models/graph_utils.py:43-92): add undirected edges,
    relax only through explicitly visited nodes."""

    def __init__(self):
        self.d = {}
        self.visited = []

    def key(self, a, b):
        return (a, b)

    def dist(self, a, b):
        if a == b:
            return 0.0
        return self.d.get((a, b), float("inf"))

    def add_edge(self, a, b, w):
        if w < self.dist(a, b):
            self.d[(a, b)] = w
            self.d[(b, a)] = w

    def relax(self, k, nodes):
        for x in nodes:
            for y in nodes:
                if x != y:
                    alt = self.dist(x, k) + self.dist(k, y)
                    if alt < self.dist(x, y):
                        self.d[(x, y)] = alt
                        self.d[(y, x)] = alt
        self.visited.append(k)


@pytest.fixture(scope="module")
def random_walk_case():
    rng = np.random.default_rng(0)
    n = 10
    xyz = rng.uniform(0, 10, (n, 3))
    # a random connected-ish edge set
    edges = set()
    for i in range(1, n):
        j = int(rng.integers(0, i))
        edges.add((j, i))
    for _ in range(6):
        a, b = rng.integers(0, n, 2)
        if a != b:
            edges.add((min(a, b), max(a, b)))
    w = {e: float(np.linalg.norm(xyz[e[0]] - xyz[e[1]])) for e in edges}
    neigh = {i: [] for i in range(n)}
    for (a, b) in edges:
        neigh[a].append(b)
        neigh[b].append(a)
    return n, w, neigh


def test_incremental_floyd_matches_host(random_walk_case):
    n, w, neigh = random_walk_case
    B, cap = 1, 16
    st = G.gmap_init(B, cap, n, 4)
    host = HostFloyd()
    seen = set()

    rng = np.random.default_rng(1)
    cur = 0
    for step in range(8):
        cands = neigh[cur]
        nodes = [cur] + [c for c in cands if True]
        seen.update(nodes)
        st = G.add_nodes(st, jnp.asarray([[cur]], jnp.int32),
                         jnp.ones((1, 1), bool))
        carr = jnp.asarray([cands + [0] * (6 - len(cands))], jnp.int32)
        cvalid = jnp.asarray([[True] * len(cands) + [False] * (6 - len(cands))])
        st = G.add_nodes(st, carr, cvalid)
        ws = jnp.asarray([[w.get((min(cur, c), max(cur, c)), 0.0)
                           for c in cands] + [0.0] * (6 - len(cands))])
        st = G.add_edges(st, jnp.asarray([cur], jnp.int32), carr, ws, cvalid)
        st = G.relax(st, jnp.asarray([cur], jnp.int32), jnp.ones((1,), bool))

        for c in cands:
            host.add_edge(cur, c, w[(min(cur, c), max(cur, c))])
        host.relax(cur, sorted(seen))

        # compare all-pairs over seen nodes
        slot_of = np.asarray(st.slot_of)[0]
        dist = np.asarray(st.dist)[0]
        for a in seen:
            for b in seen:
                got = dist[slot_of[a], slot_of[b]]
                want = host.dist(a, b)
                if want == float("inf"):
                    assert got >= INF / 2, (a, b, got)
                else:
                    assert abs(got - want) < 1e-4, (step, a, b, got, want)
        cur = int(rng.choice(cands))


def test_follow_path_consistent_with_dist(random_walk_case):
    n, w, neigh = random_walk_case
    st = G.gmap_init(1, 16, n, 4)
    # add everything, visit everything (full graph)
    for cur in range(n):
        cands = neigh[cur]
        st = G.add_nodes(st, jnp.asarray([[cur]], jnp.int32),
                         jnp.ones((1, 1), bool))
        carr = jnp.asarray([cands + [0] * (8 - len(cands))], jnp.int32)
        cvalid = jnp.asarray([[True] * len(cands) + [False] * (8 - len(cands))])
        st = G.add_nodes(st, carr, cvalid)
        ws = jnp.asarray([[w.get((min(cur, c), max(cur, c)), 0.0)
                           for c in cands] + [0.0] * (8 - len(cands))])
        st = G.add_edges(st, jnp.asarray([cur], jnp.int32), carr, ws, cvalid)
    for cur in range(n):
        st = G.relax(st, jnp.asarray([cur], jnp.int32), jnp.ones((1,), bool))

    slot_of = np.asarray(st.slot_of)[0]
    dist = np.asarray(st.dist)[0]
    for src in range(0, n, 2):
        for dst in range(1, n, 3):
            nodes, valid = G.follow_path(st, jnp.asarray([src], jnp.int32),
                                         jnp.asarray([dst], jnp.int32), 12)
            nodes = np.asarray(nodes)[0]
            valid = np.asarray(valid)[0]
            path = [src] + [int(x) for x, v in zip(nodes, valid) if v]
            if src == dst:
                assert len(path) == 1
                continue
            assert path[-1] == dst
            total = sum(w[(min(a, b), max(a, b))]
                        for a, b in zip(path[:-1], path[1:]))
            assert abs(total - dist[slot_of[src], slot_of[dst]]) < 1e-4


def test_add_nodes_dedup_and_count():
    st = G.gmap_init(2, 8, 10, 4)
    st = G.add_nodes(st, jnp.asarray([[3, 5], [7, 7]], jnp.int32),
                     jnp.asarray([[True, True], [True, False]]))
    assert np.asarray(st.count).tolist() == [2, 1]
    # re-adding existing nodes changes nothing
    st2 = G.add_nodes(st, jnp.asarray([[5, 3], [7, 2]], jnp.int32),
                      jnp.asarray([[True, True], [True, True]]))
    assert np.asarray(st2.count).tolist() == [2, 2]
    assert np.asarray(st2.slot_of)[0, 3] == 0
    assert np.asarray(st2.slot_of)[0, 5] == 1
    assert np.asarray(st2.slot_of)[1, 2] == 1


def test_add_node_zero_with_masked_lanes():
    """Inserting node id 0 in the same call as masked lanes must not race:
    masked lanes used to scatter a stale value to slot_of[:, 0], and
    duplicate-index scatter order is unspecified (regression for the
    slot_of trash column)."""
    st = G.gmap_init(1, 8, 10, 4)
    nodes = jnp.asarray([[0, 4, 2, 6]], jnp.int32)
    valid = jnp.asarray([[True, False, True, False]])
    st = G.add_nodes(st, nodes, valid)
    assert int(np.asarray(st.count)[0]) == 2
    assert int(np.asarray(st.slot_of)[0, 0]) == 0   # node 0 -> slot 0
    assert int(np.asarray(st.slot_of)[0, 2]) == 1
    assert int(np.asarray(st.slot_of)[0, 4]) == -1  # masked lanes untouched
    assert int(np.asarray(st.node_ids)[0, 0]) == 0


def test_update_embeds_running_mean():
    st = G.gmap_init(1, 8, 10, 2)
    st = G.add_nodes(st, jnp.asarray([[0, 1, 2]], jnp.int32),
                     jnp.ones((1, 3), bool))
    active = jnp.ones((1,), bool)
    cand = jnp.asarray([[1, 2]], jnp.int32)
    cvalid = jnp.ones((1, 2), bool)
    e1 = jnp.asarray([[[1.0, 1.0], [3.0, 3.0]]])
    st = G.update_embeds(st, jnp.asarray([0], jnp.int32),
                         jnp.asarray([[9.0, 9.0]]), cand, e1, cvalid, active)
    e2 = jnp.asarray([[[5.0, 5.0], [1.0, 1.0]]])
    st = G.update_embeds(st, jnp.asarray([0], jnp.int32),
                         jnp.asarray([[7.0, 7.0]]), cand, e2, cvalid, active)
    emb = np.asarray(G.node_embeds(st))[0]
    slot = np.asarray(st.slot_of)[0]
    # visited node rewritten each time
    np.testing.assert_allclose(emb[slot[0]], [7.0, 7.0])
    # unvisited candidates accumulate a running mean
    np.testing.assert_allclose(emb[slot[1]], [3.0, 3.0])
    np.testing.assert_allclose(emb[slot[2]], [2.0, 2.0])
