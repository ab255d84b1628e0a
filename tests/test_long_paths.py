"""Long-path variant capacities (r4r/rxr/cvdn/soon).

The reference's python env has no fixed gt-path buffer, so R4R's joined
~10-15-node paths, RxR and NDH shortest paths flow through untouched; our
fixed-shape design must size the buffer per dataset and refuse to silently
truncate (truncation shifts gt_path[-1] — the goal the teacher and reward
shaping steer toward — onto an intermediate node and corrupts nDTW/SDTW).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vln_imagine_tpu.config import (
    cvdn_config,
    r4r_config,
    rxr_config,
    soon_config,
    tiny_test_config,
)
from vln_imagine_tpu.data.annotations import (
    AuxMetadata,
    episodes_from_annotations,
    ndh_episodes_from_annotations,
)
from vln_imagine_tpu.envx import env as envx
from vln_imagine_tpu.envx.compiler import ScanGraph, compile_world
from vln_imagine_tpu.eval.metrics import eval_item


def _chain_graph(n: int) -> ScanGraph:
    """A line graph: the unique shortest path 0..n-1 is n nodes long."""
    xyz = np.stack([np.arange(n) * 2.0, np.zeros(n), np.zeros(n)], 1)
    return ScanGraph("chain", [f"chain_vp{i:04d}" for i in range(n)],
                     xyz, [(i, i + 1) for i in range(n - 1)])


def _long_path_setup(P: int):
    cfg = dataclasses.replace(tiny_test_config("hamt"), dataset="r4r")
    cfg = dataclasses.replace(
        cfg, env=dataclasses.replace(cfg.env, max_gt_path_len=P,
                                     max_action_len=15, max_nodes=16))
    g = _chain_graph(16)
    world_np = compile_world([g], max_candidates=cfg.env.max_candidates,
                             views=cfg.env.views)
    items = [{
        "scan": "chain", "instr_id": "77_0", "heading": 0.0,
        "path": [g.node_ids[i] for i in range(15)],  # 15-node R4R-ish path
        "instr_encoding": [1, 5, 6, 2],
    }]
    return cfg, g, world_np, items


def test_truncation_refused_at_r2r_capacity():
    """A 15-node gt path must raise at the r2r default buffer (8), naming
    the item — never silently clip (ADVICE r2: annotations.py [:P])."""
    cfg, g, world_np, items = _long_path_setup(P=8)
    with pytest.raises(ValueError, match="77_0.*max_gt_path_len=8"):
        episodes_from_annotations(items, [g], AuxMetadata(),
                                  cfg.env.max_instr_len, 8,
                                  cfg.model.max_imagination_len,
                                  imagine_feat_dim=8)


def test_long_gt_path_survives_into_teacher_and_ndtw():
    """With the r4r-sized buffer a 15-node path survives end-to-end: the
    teacher walks all 14 hops to the true goal and the resulting trajectory
    scores nDTW == 1 against the untruncated gt."""
    cfg, g, world_np, items = _long_path_setup(P=16)
    ep_np, _ = episodes_from_annotations(
        items, [g], AuxMetadata(), cfg.env.max_instr_len, 16,
        cfg.model.max_imagination_len, imagine_feat_dim=8)
    assert int(ep_np.gt_len[0]) == 15
    np.testing.assert_array_equal(np.asarray(ep_np.gt_path)[0, :15],
                                  np.arange(15))
    assert int(np.asarray(ep_np.goal)[0]) == 14  # the true goal, not node 7

    world = jax.tree.map(jnp.asarray, world_np)
    ep = jax.tree.map(jnp.asarray, ep_np)
    state = envx.reset(world, ep, cfg.env.max_action_len)
    for t in range(cfg.env.max_action_len):
        a = envx.teacher_hamt(world, ep, state, jnp.asarray(t), -100)
        # teacher must never emit ignore mid-path on an exact gt walk
        assert int(np.asarray(a)[0]) != -100
        state = envx.step_hamt(world, ep, state, a)
    assert int(np.asarray(state.node)[0]) == 14

    plen = int(np.asarray(state.path_len)[0])
    path = list(np.asarray(state.path_nodes)[0, :plen])
    assert path == list(range(15))
    dist = np.asarray(world_np.dist)[0]
    scores = eval_item(dist, path, list(np.asarray(ep_np.gt_path)[0, :15]))
    assert scores["success"] == 1.0
    assert scores["nDTW"] == pytest.approx(1.0)


def test_variant_presets_capacities():
    """--dataset r4r|rxr|cvdn|soon picks capacities sized to the variant
    (reference caps: run_r4r.sh:36-37, run_soon.sh:39-41,
    cvdn/parser.py:32-33)."""
    r4r = r4r_config("duet")
    assert r4r.env.max_gt_path_len >= 15
    assert r4r.env.max_action_len == 15 and r4r.env.max_instr_len == 200
    assert r4r_config("hamt").env.max_instr_len == 60

    rxr = rxr_config()
    assert rxr.env.max_gt_path_len >= 20 and rxr.env.max_instr_len == 250

    cvdn = cvdn_config()
    assert cvdn.env.max_gt_path_len >= 25 and cvdn.env.max_instr_len == 80

    soon = soon_config()
    assert soon.env.max_action_len == 20 and soon.env.max_instr_len == 100
    assert soon.env.max_gt_path_len >= 20
    assert soon.model.obj_feat_size > 0  # inherits REVERIE object stream


def test_train_cli_routes_variant_presets(monkeypatch):
    """scripts/train.py --dataset r4r/cvdn/soon resolves the sized preset
    before touching data."""
    import importlib.util
    import os
    import sys

    spec = importlib.util.spec_from_file_location(
        "train_cli", os.path.join(os.path.dirname(__file__), "..",
                                  "scripts", "train.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    for ds, check in [
        ("r4r", lambda c: c.env.max_gt_path_len >= 15),
        ("cvdn", lambda c: c.env.max_gt_path_len >= 25),
        ("soon", lambda c: c.env.max_action_len == 20),
    ]:
        monkeypatch.setattr(sys, "argv",
                            ["train.py", "--agent", "duet" if ds != "cvdn"
                             else "hamt", "--dataset", ds])
        args = mod.parse_args()
        # replicate main()'s preset resolution (data loading not needed)
        from vln_imagine_tpu.config import (cvdn_config as _c,
                                            r4r_config as _r,
                                            soon_config as _s)
        cfg = {"r4r": lambda: _r(args.agent), "cvdn": _c, "soon": _s}[ds]()
        assert check(cfg), ds
        assert cfg.dataset == ds


def test_ndh_sampled_path_clamps_with_warning():
    """NDH opts into an explicit clamp (goals are resampled per call and
    scored via end_panos): an overflowing sampled shortest path warns
    instead of raising (ADVICE r2 high)."""
    g = _chain_graph(12)
    items = [{
        "scan": "chain", "inst_idx": 3, "start_pano": g.node_ids[0],
        "end_panos": [g.node_ids[11]], "start_heading": 0.0,
        "instr_encoding": [1, 2, 3],
    }]
    with pytest.warns(UserWarning, match="clamping gt path"):
        ep, _, _ = ndh_episodes_from_annotations(
            items, [g], max_instr_len=8, max_gt_path_len=6,
            max_imaginations=2, rng=np.random.default_rng(0))
    assert int(np.asarray(ep.gt_len)[0]) == 6


def test_config_presets_roundtrip_json():
    from vln_imagine_tpu.config import config_from_json, config_to_json

    for cfg in (r4r_config(), rxr_config(), cvdn_config(), soon_config()):
        back = config_from_json(config_to_json(cfg))
        assert back.env == cfg.env and back.dataset == cfg.dataset
