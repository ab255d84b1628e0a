"""WHOLE-EPISODE DUET parity against the live torch GlocalTextPathNavCMT.

The one-step parity tests (test_reference_parity_duet.py) prove the model
math on shared inputs; this proves the per-step INPUT BUILDING — the topo
map bookkeeping our fixed-capacity GmapState performs inside one XLA scan —
against a faithful torch-side mirror of the reference agent's rollout
(VLN-DUET/map_nav_src/r2r/agent.py:386-625): dict GraphMap + incremental
FloydGraph (graph_utils.py:43-170), running-mean node embeds, step ids,
[None]+visited+unvisited gmap assembly (:98-171), vp variables (:173-207),
teleport along the observed path with the discretized approach view
(:289-305) and the final stop-score backtrack (:588-601).

Both sides share converted weights and navigate the same synthetic world
greedily; per-step fused logits (matched BY NODE ID — the reference
reorders its gmap sequence every step, ours is slot-stable; logits must be
order-invariant), chosen nodes, recorded stop scores and the final
trajectories must agree.
"""

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

import test_reference_parity_duet as PD
from vln_imagine_tpu.ckpt import convert as C
from vln_imagine_tpu.config import _replace
from vln_imagine_tpu.envx import env as envx
from vln_imagine_tpu.envx import synthetic_world, synthetic_episodes
from vln_imagine_tpu.models.duet import DuetModel
from vln_imagine_tpu.train.rollout_duet import rollout_duet

pytestmark = pytest.mark.slow

B, T, VIEWS, K, NODES = 2, 5, 12, 6, 14
TOL = dict(rtol=1e-3, atol=1e-3)
_t = PD._t


# ---------------------------------------------------------------- mirrors
class MirrorFloyd:
    """FloydGraph semantics (graph_utils.py:43-92): incremental relax
    through each newly visited node; recursive midpoint paths."""

    BIG = 95959595.0

    def __init__(self):
        self.dis: dict = {}
        self.mid: dict = {}
        self.vis: set = set()

    def _d(self, x, y):
        return self.dis.get(x, {}).get(y, self.BIG)

    def distance(self, x, y):
        return 0.0 if x == y else self._d(x, y)

    def add_edge(self, x, y, d):
        if d < self._d(x, y):
            self.dis.setdefault(x, {})[y] = d
            self.dis.setdefault(y, {})[x] = d
            self.mid.setdefault(x, {})[y] = None
            self.mid.setdefault(y, {})[x] = None

    def update(self, k):
        nodes = list(self.dis)
        for x in nodes:
            for y in nodes:
                if x != y and self._d(x, k) + self._d(k, y) < self._d(x, y):
                    nd = self._d(x, k) + self._d(k, y)
                    self.dis[x][y] = self.dis[y][x] = nd
                    self.mid.setdefault(x, {})[y] = k
                    self.mid.setdefault(y, {})[x] = k
        self.vis.add(k)

    def visited(self, k):
        return k in self.vis

    def path(self, x, y):
        if x == y:
            return []
        k = self.mid[x][y]
        if k is None:
            return [y]
        return self.path(x, k) + self.path(k, y)


def _angle_fts(h, e, size=4):
    out = np.stack([np.sin(h), np.cos(h), np.sin(e), np.cos(e)], -1)
    return np.tile(out, size // 4).astype(np.float32)


def _rel_pos(xyz, cur, vp, base_h, base_e):
    d = xyz[vp] - xyz[cur]
    xy = max(float(np.hypot(d[0], d[1])), 1e-8)
    dist = max(float(np.linalg.norm(d)), 1e-8)
    h = float(np.arcsin(np.clip(d[0] / xy, -1, 1)))
    if d[1] < 0:
        h = np.pi - h
    e = float(np.arcsin(np.clip(d[2] / dist, -1, 1)))
    return h - base_h, e - base_e, float(np.linalg.norm(d))


class MirrorGmap:
    """GraphMap semantics (graph_utils.py:94-170)."""

    def __init__(self, start, xyz):
        self.start = start
        self.xyz = xyz
        self.positions: dict = {}   # insertion-ordered node set
        self.graph = MirrorFloyd()
        self.embeds: dict = {}      # node -> [sum tensor, count]
        self.step_ids: dict = {}
        self.stop_scores: dict = {}

    def update_graph(self, node, cands):
        self.positions[node] = True
        for c in cands:
            self.positions[c] = True
            self.graph.add_edge(node, c,
                                float(np.linalg.norm(self.xyz[c]
                                                     - self.xyz[node])))
        self.graph.update(node)

    def update_embed(self, vp, emb, rewrite=False):
        if rewrite or vp not in self.embeds:
            self.embeds[vp] = [emb.clone(), 1]
        else:
            self.embeds[vp][0] += emb
            self.embeds[vp][1] += 1

    def get_embed(self, vp):
        return self.embeds[vp][0] / self.embeds[vp][1]

    def pos_fts(self, cur, vpids, base_h, base_e):
        out = np.zeros((len(vpids), 7), np.float32)
        for i, vp in enumerate(vpids):
            if vp is None:
                continue
            h, e, line = _rel_pos(self.xyz, cur, vp, base_h, base_e)
            out[i, :4] = _angle_fts(np.float64(h), np.float64(e))
            out[i, 4:] = (line / 30.0, self.graph.distance(cur, vp) / 30.0,
                          len(self.graph.path(cur, vp)) / 10.0)
        return out


@pytest.fixture(scope="module")
def episode_setup():
    V = PD._import_ref_duet()
    cfg = PD._my_config()
    cfg = _replace(cfg, "model", use_cosine_aux_loss=False,
                   max_imagination_len=4)
    cfg = _replace(cfg, "env", max_nodes=NODES, max_candidates=K,
                   views=VIEWS, max_action_len=T, max_instr_len=PD.L_TXT,
                   max_gt_path_len=5, max_gmap_nodes=NODES)
    cfg = dataclasses.replace(cfg, dataset="r2r")
    # seed 53 chosen for episode richness: the greedy policy runs the FULL
    # 5-step horizon with multi-hop teleports through visited nodes and a
    # final stop-score backtrack in both batch items (trajectories of 8-9
    # nodes over the 14-node scan)
    torch.manual_seed(53)
    ref = V.GlocalTextPathNavCMT(PD._ref_config(cfg.model)).eval()
    params, skipped = C.convert_state_dict(ref.state_dict(),
                                           C.duet_torch_to_flax_path)
    assert not skipped, skipped[:8]
    world_np, _ = synthetic_world(
        num_scans=1, num_nodes=NODES, max_candidates=K, views=VIEWS,
        feat_dim=cfg.model.image_feat_size, seed=21)
    ep_np = synthetic_episodes(
        world_np, batch=B, max_gt_path_len=cfg.env.max_gt_path_len,
        max_instr_len=PD.L_TXT, max_imaginations=4,
        vocab_size=cfg.model.vocab_size, feat_dim=cfg.model.hidden_size,
        seed=22)
    return ref, params, cfg, world_np, ep_np


def _mirror_rollout(ref, cfg, w, ep):
    """The reference agent's greedy rollout, mirrored over our world."""
    A = cfg.model.angle_feat_size
    xyz = np.asarray(w.node_xyz)[0]
    adj = np.asarray(w.adj)[0]
    adj_valid = np.asarray(w.adj_valid)[0]
    pointid = np.asarray(w.cand_pointid)[0]
    scan0 = np.zeros((B,), np.int64)

    with torch.no_grad():
        txt = ref("language", {"txt_ids": _t(np.asarray(ep.txt_ids)),
                               "txt_masks": _t(np.asarray(ep.txt_mask))})
        imag = ref("imagine", {"imagine_feats": _t(np.asarray(
            ep.imagine_feats)), "imagine_masks": _t(np.asarray(
                ep.imagine_mask))})

    cur = list(np.asarray(ep.start_node))
    view = list(np.asarray(envx.snap_heading_to_view(
        jnp.asarray(ep.start_heading), VIEWS)))
    ended = [False] * B
    gmaps = [MirrorGmap(cur[b], xyz) for b in range(B)]
    traj = [[int(cur[b])] for b in range(B)]
    for b in range(B):
        cands = [int(c) for c, v in zip(adj[cur[b]], adj_valid[cur[b]]) if v]
        gmaps[b].update_graph(int(cur[b]), cands)

    state0 = envx.reset(jax.tree.map(jnp.asarray, w),
                        jax.tree.map(jnp.asarray, ep), T)
    steps = []
    for t in range(T):
        for b in range(B):
            if not ended[b]:
                gmaps[b].step_ids[int(cur[b])] = t + 1

        st = state0.replace(node=jnp.asarray(np.asarray(cur, np.int32)),
                            view_index=jnp.asarray(np.asarray(view,
                                                              np.int32)))
        obs = jax.tree.map(np.asarray, envx.observe_duet(
            jax.tree.map(jnp.asarray, w), jax.tree.map(jnp.asarray, ep), st,
            A))

        # pano inputs compacted exactly like _panorama_feature_variable
        tok_img, tok_loc, tok_nav, cand_lists, lens = [], [], [], [], []
        for b in range(B):
            imgs, locs, navs, cands = [], [], [], []
            for k in range(K):
                if obs.cand_valid[b, k]:
                    imgs.append(obs.img[b, k])
                    locs.append(obs.loc[b, k])
                    navs.append(1)
                    cands.append(int(obs.cand_nodes[b, k]))
            for v in range(VIEWS):
                if obs.valid[b, K + v]:
                    imgs.append(obs.img[b, K + v])
                    locs.append(obs.loc[b, K + v])
                    navs.append(0)
            tok_img.append(np.stack(imgs))
            tok_loc.append(np.stack(locs))
            tok_nav.append(np.asarray(navs, np.int64))
            cand_lists.append(cands)
            lens.append(len(imgs))
        L = max(lens)
        view_img = np.zeros((B, L, tok_img[0].shape[-1]), np.float32)
        loc_fts = np.zeros((B, L, tok_loc[0].shape[-1]), np.float32)
        nav_types = np.zeros((B, L), np.int64)
        for b in range(B):
            view_img[b, :lens[b]] = tok_img[b]
            loc_fts[b, :lens[b]] = tok_loc[b]
            nav_types[b, :lens[b]] = tok_nav[b]
        with torch.no_grad():
            pano, pano_masks = ref("panorama", {
                "view_img_fts": _t(view_img), "obj_img_fts": None,
                "loc_fts": _t(loc_fts), "nav_types": _t(nav_types),
                "view_lens": _t(np.asarray(lens, np.int64)),
                "obj_lens": None})
            avg = (torch.sum(pano * pano_masks.unsqueeze(2), 1)
                   / torch.sum(pano_masks, 1, keepdim=True))

        for b in range(B):
            if ended[b]:
                continue
            gmaps[b].update_embed(int(cur[b]), avg[b], rewrite=True)
            for j, cnode in enumerate(cand_lists[b]):
                if not gmaps[b].graph.visited(cnode):
                    gmaps[b].update_embed(cnode, pano[b, j])

        # gmap variable ([None] + visited + unvisited, agent.py:98-171)
        gvpids, gsteps, gembeds, gpos, gpairs, gvis, no_vp_left = \
            [], [], [], [], [], [], []
        for b in range(B):
            vis = [n for n in gmaps[b].positions
                   if gmaps[b].graph.visited(n)]
            unv = [n for n in gmaps[b].positions
                   if not gmaps[b].graph.visited(n)]
            no_vp_left.append(len(unv) == 0)
            vpids = [None] + vis + unv
            gvpids.append(vpids)
            gvis.append([False] + [True] * len(vis) + [False] * len(unv))
            gsteps.append([gmaps[b].step_ids.get(vp, 0) for vp in vpids])
            emb = [gmaps[b].get_embed(vp) for vp in vpids[1:]]
            gembeds.append(torch.stack([torch.zeros_like(emb[0])] + emb, 0))
            base_h = (view[b] % (VIEWS // 3)) * 2 * math.pi / (VIEWS // 3)
            base_e = (view[b] // (VIEWS // 3) - 1) * math.radians(30.0)
            gpos.append(gmaps[b].pos_fts(int(cur[b]), vpids, base_h, base_e))
            n = len(vpids)
            pair = np.zeros((n, n), np.float32)
            for i in range(1, n):
                for j in range(i + 1, n):
                    pair[i, j] = pair[j, i] = gmaps[b].graph.distance(
                        vpids[i], vpids[j])
            gpairs.append(pair)
        GL = max(len(v) for v in gvpids)
        gmap_img = torch.zeros((B, GL, gembeds[0].shape[-1]))
        gmap_steps = np.zeros((B, GL), np.int64)
        gmap_pos = np.zeros((B, GL, 7), np.float32)
        gmap_pair = np.zeros((B, GL, GL), np.float32)
        gmap_vism = np.zeros((B, GL), bool)
        gmap_mask = np.zeros((B, GL), bool)
        for b in range(B):
            n = len(gvpids[b])
            gmap_img[b, :n] = gembeds[b]
            gmap_steps[b, :n] = gsteps[b]
            gmap_pos[b, :n] = gpos[b]
            gmap_pair[b, :n, :n] = gpairs[b]
            gmap_vism[b, :n] = gvis[b]
            gmap_mask[b, :n] = True

        # vp variable (agent.py:173-207)
        vp_img = torch.cat([torch.zeros_like(pano[:, :1]), pano], 1)
        vp_pos = np.zeros((B, vp_img.shape[1], 14), np.float32)
        for b in range(B):
            base_h = (view[b] % (VIEWS // 3)) * 2 * math.pi / (VIEWS // 3)
            base_e = (view[b] // (VIEWS // 3) - 1) * math.radians(30.0)
            start_fts = gmaps[b].pos_fts(int(cur[b]), [gmaps[b].start],
                                         base_h, base_e)
            cand_fts = gmaps[b].pos_fts(int(cur[b]), cand_lists[b],
                                        base_h, base_e)
            vp_pos[b, :, :7] = start_fts
            vp_pos[b, 1:len(cand_fts) + 1, 7:] = cand_fts
        vp_mask = np.zeros((B, vp_img.shape[1]), bool)
        vp_nav = np.zeros((B, vp_img.shape[1]), bool)
        for b in range(B):
            vp_mask[b, :lens[b] + 1] = True
            vp_nav[b, 0] = True
            vp_nav[b, 1:L + 1] = nav_types[b] == 1

        batch = {
            "txt_embeds": txt, "txt_masks": _t(np.asarray(ep.txt_mask)),
            "gmap_img_embeds": gmap_img, "gmap_step_ids": _t(gmap_steps),
            "gmap_pos_fts": _t(gmap_pos), "gmap_masks": _t(gmap_mask),
            "gmap_pair_dists": _t(gmap_pair),
            "gmap_visited_masks": _t(gmap_vism), "gmap_vpids": gvpids,
            "vp_img_embeds": vp_img, "vp_pos_fts": _t(vp_pos),
            "vp_masks": _t(vp_mask), "vp_nav_masks": _t(vp_nav),
            "vp_obj_masks": None,
            "vp_cand_vpids": [[None] + c for c in cand_lists],
            "imagine_embeds": imag,
            "imagine_masks": _t(np.asarray(ep.imagine_mask))}
        with torch.no_grad():
            nav = ref("navigation", batch)
        fused = nav["fused_logits"].numpy()

        rec = {"active": [not e for e in ended], "logits": [], "action": []}
        for b in range(B):
            rec["logits"].append(
                {vp: float(fused[b, g]) for g, vp in enumerate(gvpids[b])
                 if g == 0 or not gmap_vism[b, g]})
        # stop score bookkeeping (agent.py:515-520)
        probs = torch.softmax(nav["fused_logits"], 1).numpy()
        for b in range(B):
            if not ended[b]:
                gmaps[b].stop_scores[int(cur[b])] = float(probs[b, 0])

        a_t = fused.argmax(1)
        just_ended = [False] * B
        cpu_a = []
        for b in range(B):
            stop = a_t[b] == 0
            if stop or ended[b] or no_vp_left[b] or t == T - 1:
                cpu_a.append(None)
                if not ended[b]:
                    just_ended[b] = True
            else:
                cpu_a.append(gvpids[b][a_t[b]])
            # the RAW greedy choice (pre forced-stop), comparable to our
            # rollout's recorded a_t
            rec["action"].append(None if stop else gvpids[b][a_t[b]])
        steps.append(rec)

        # teleport + stop-backtrack (agent.py:289-305, 588-601)
        for b in range(B):
            if cpu_a[b] is not None:
                seg = gmaps[b].graph.path(int(cur[b]), cpu_a[b])
                traj[b].extend(seg)
                # discretized approach view from the previous path node
                # (make_equiv_action :299-303)
                prev = seg[-2] if len(seg) >= 2 else traj[b][-len(seg) - 1]
                k = int(np.flatnonzero((adj[prev] == cpu_a[b])
                                       & adj_valid[prev])[0])
                view[b] = int(pointid[prev, k])
                cur[b] = cpu_a[b]
            if not ended[b] and just_ended[b]:
                best, score = None, -float("inf")
                for n, s in gmaps[b].stop_scores.items():
                    if s > score:
                        best, score = n, s
                if best is not None and int(cur[b]) != best:
                    traj[b].extend(gmaps[b].graph.path(int(cur[b]), best))
        # grow graphs with the new node's candidates
        for b in range(B):
            if not ended[b] and cpu_a[b] is not None:
                cands = [int(c) for c, v in zip(adj[cur[b]],
                                                adj_valid[cur[b]]) if v]
                gmaps[b].update_graph(int(cur[b]), cands)
        for b in range(B):
            ended[b] = ended[b] or cpu_a[b] is None
        if all(ended):
            break
    return steps, traj, [dict(g.stop_scores) for g in gmaps]


def test_whole_episode_parity(episode_setup):
    ref, params, cfg, world_np, ep_np = episode_setup
    steps, traj, mirror_scores = _mirror_rollout(ref, cfg, world_np, ep_np)
    # the scenario must be non-trivial: full horizon, real movement,
    # multi-hop teleports (trajectory longer than steps+1)
    assert len(steps) == T
    assert all(len(tr) >= 6 for tr in traj), [len(tr) for tr in traj]

    tables = jax.tree.map(jnp.asarray, world_np)
    ep = jax.tree.map(jnp.asarray, ep_np)
    model = DuetModel(cfg.model, feat_dropout=0.0)
    res = rollout_duet(model, params, tables, ep, cfg,
                       jax.random.PRNGKey(0), feedback="argmax",
                       train_ml=None, deterministic=True)
    logits = np.asarray(res.logits)          # [T, B, G+1]
    actions = np.asarray(res.actions)        # [T, B]
    slot_nodes = np.asarray(res.stop_nodes)  # [B, Gcap] final slot -> node
    path_nodes = np.asarray(res.path_nodes)
    path_len = np.asarray(res.path_len)

    def _slot(b, vp):
        # slots fill as a contiguous prefix (add_nodes appends) and empty
        # slots read node id 0, so the FIRST occurrence is the real slot
        slots = np.flatnonzero(slot_nodes[b] == vp)
        assert len(slots) >= 1, (vp, slot_nodes[b])
        return int(slots[0])

    def our_logit(t, b, vp):
        if vp is None:
            return float(logits[t, b, 0])
        return float(logits[t, b, 1 + _slot(b, vp)])

    for t, rec in enumerate(steps):
        for b in range(B):
            if not rec["active"][b]:
                continue
            for vp, want in rec["logits"][b].items():
                got = our_logit(t, b, vp)
                np.testing.assert_allclose(got, want, err_msg=f"t{t} b{b} "
                                           f"vp{vp}", **TOL)
            # identical greedy decision, mapped to node ids
            a = int(actions[t, b])
            got_node = None if a == 0 else int(slot_nodes[b, a - 1])
            assert got_node == rec["action"][b], (t, b)

    # final trajectories identical node-for-node
    for b in range(B):
        ours = [int(n) for n in path_nodes[b, :path_len[b]]]
        assert ours == traj[b], (b, ours, traj[b])

    # recorded per-node stop scores agree (agent.py:515-520 bookkeeping)
    stop_scores = np.asarray(res.stop_scores)
    stop_valid = np.asarray(res.stop_valid)
    for b in range(B):
        scored = {int(slot_nodes[b, s]): float(stop_scores[b, s])
                  for s in np.flatnonzero(stop_valid[b])
                  if s == _slot(b, int(slot_nodes[b, s]))}
        assert set(scored) == set(mirror_scores[b]), (
            b, set(scored), set(mirror_scores[b]))
        for vp, want in mirror_scores[b].items():
            np.testing.assert_allclose(scored[vp], want, **TOL)
