"""Real REVERIE object data pipeline on schema-faithful fixtures:
ObjectFeatureDB (HDF5 + attrs) -> build_object_tables -> WorldTables ->
driver.validate producing RGS/RGSPL, plus load_obj2vps and the REVERIE
annotation instr_id scheme (reverie/data_utils.py:9-124)."""

import dataclasses
import json

import h5py
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vln_imagine_tpu.config import tiny_test_config, _replace
from vln_imagine_tpu.data.annotations import (
    AuxMetadata,
    episodes_from_annotations,
)
from vln_imagine_tpu.data.features import (
    ObjectFeatureDB,
    build_object_tables,
    load_obj2vps,
)
from vln_imagine_tpu.envx.compiler import compile_world
from vln_imagine_tpu.envx.synthetic import random_scan_graph

OBJ_DIM = 16


@pytest.fixture(scope="module")
def fixture_data(tmp_path_factory):
    """One scan, objects at three viewpoints, REVERIE HDF5 schema:
    '<scan>_<vp>' datasets with attrs directions/sizes/obj_ids."""
    tmp = tmp_path_factory.mktemp("reverie")
    rng = np.random.default_rng(11)
    g = random_scan_graph(rng, "sc", 12)

    # object 101 visible from nodes 3 and 5; object 202 from node 5 only
    placements = {
        g.node_ids[3]: [101],
        g.node_ids[5]: [101, 202],
        g.node_ids[7]: [303],
    }
    obj_file = tmp / "obj_feats.hdf5"
    with h5py.File(obj_file, "w") as f:
        for vp, ids in placements.items():
            k = len(ids)
            d = f.create_dataset(f"sc_{vp}",
                                 data=rng.standard_normal((k, OBJ_DIM))
                                 .astype(np.float32))
            d.attrs["directions"] = rng.uniform(-1, 1, (k, 2)).astype(
                np.float32)
            d.attrs["sizes"] = np.tile([[320, 240]], (k, 1)).astype(
                np.float32)
            d.attrs["obj_ids"] = np.asarray([str(i).encode() for i in ids])

    bbox = {}
    for vp, ids in placements.items():
        bbox[f"sc_{vp}"] = {str(i): {"visible_pos": [1]} for i in ids}
    # an entry with no visible positions must be excluded
    bbox[f"sc_{g.node_ids[0]}"] = {"999": {"visible_pos": []}}
    bbox_file = tmp / "BBoxes.json"
    bbox_file.write_text(json.dumps(bbox))
    return g, placements, str(obj_file), str(bbox_file)


def test_object_feature_db_and_tables(fixture_data):
    g, placements, obj_file, _ = fixture_data
    db = ObjectFeatureDB(obj_file, OBJ_DIM)
    fts, attrs = db.load_feature("sc", g.node_ids[5])
    assert fts.shape == (2, OBJ_DIM)
    assert db.box_features(attrs).shape == (2, 3)
    # missing viewpoint -> zero objects (reference returns empty)
    fts0, _ = db.load_feature("sc", g.node_ids[1])
    assert fts0.shape == (0, OBJ_DIM)

    o_feat, o_ang, o_valid, o_ids, o_pos, id_of = build_object_tables(
        db, [g], max_objects=4, obj_feat_dim=OBJ_DIM)
    assert o_feat.shape == (1, 12, 4, OBJ_DIM)
    # 5-d normalized bbox positions (x1,y1,x2,y2,area), valid rows only.
    # The fixture is a DUET-format 'sizes' store ([320, 240] extents):
    # x1=y1=0 degenerate corners, x2=320/640, y2=240/480, area=x2*y2
    assert o_pos.shape == (1, 12, 4, 5)
    want_row = np.asarray([0.0, 0.0, 320 / 640, 240 / 480,
                           (320 * 240) / (640 * 480)], np.float32)
    for j in range(int(o_valid[0, 5].sum())):
        np.testing.assert_allclose(o_pos[0, 5, j], want_row, rtol=1e-6)
    assert np.all(o_pos[~o_valid] == 0)
    assert o_valid[0, 5].sum() == 2
    assert set(o_ids[0, 5][o_valid[0, 5]]) == {101, 202}
    assert o_valid[0, 1].sum() == 0
    assert np.all(np.abs(o_ang[0, 5, :2]) <= 1.0)


def test_load_obj2vps(fixture_data):
    g, placements, _, bbox_file = fixture_data
    obj2vps = load_obj2vps(bbox_file)
    assert set(obj2vps["sc_101"]) == {g.node_ids[3], g.node_ids[5]}
    assert obj2vps["sc_202"] == [g.node_ids[5]]
    assert "sc_999" not in obj2vps  # no visible positions


@pytest.mark.slow
def test_reverie_validate_round_trip(fixture_data):
    """Full round trip: fixture object HDF5 -> WorldTables -> REVERIE
    annotations (objId targets) -> driver.validate emits rgs/rgspl
    (reverie/env.py:356-380 eval fields)."""
    g, placements, obj_file, _ = fixture_data
    cfg = tiny_test_config("duet").replace(dataset="reverie")
    cfg = _replace(cfg, "model", obj_feat_size=OBJ_DIM, max_imagination_len=1)
    cfg = _replace(cfg, "train", batch_size=2)

    rng = np.random.default_rng(3)
    world_np = compile_world([g], max_candidates=cfg.env.max_candidates,
                             views=cfg.env.views)
    S, N = world_np.node_xyz.shape[:2]
    feat = rng.standard_normal(
        (S, N, cfg.env.views, cfg.model.image_feat_size)).astype(np.float32)
    db = ObjectFeatureDB(obj_file, OBJ_DIM)
    o_feat, o_ang, o_valid, o_ids, o_pos, id_of = build_object_tables(
        db, [g], max_objects=4, obj_feat_dim=OBJ_DIM, max_nodes=N)
    world_np = world_np.replace(feat=feat, obj_feat=o_feat, obj_ang=o_ang,
                                obj_valid=o_valid, obj_ids=o_ids,
                                obj_pos=o_pos)
    tables = jax.tree.map(jnp.asarray, world_np)

    # REVERIE-style annotation items: path ends where the object is visible
    items = [
        {"instr_id": "10_101_0", "scan": "sc", "objId": "101",
         "path": [g.node_ids[0], g.node_ids[3]],
         "instr_encoding": [1, 5, 6], "heading": 0.0},
        {"instr_id": "11_202_0", "scan": "sc", "objId": "202",
         "path": [g.node_ids[1], g.node_ids[5]],
         "instr_encoding": [1, 7], "heading": 0.0},
    ]
    ep, ids = episodes_from_annotations(
        items, [g], AuxMetadata(), cfg.env.max_instr_len,
        cfg.env.max_gt_path_len, cfg.model.max_imagination_len,
        imagine_feat_dim=cfg.model.hidden_size)
    assert ep.gt_obj_id is not None
    np.testing.assert_array_equal(np.asarray(ep.gt_obj_id), [101, 202])

    from vln_imagine_tpu.driver import FinetuneDriver, SplitData
    split = SplitData("val_seen", ep, ids)
    drv = FinetuneDriver(cfg, tables, split, [split],
                         log_dir="/tmp/test_reverie_data_logs")
    drv.setup()
    score = drv.validate(split)
    assert "rgs" in score and "rgspl" in score
    assert 0.0 <= score["rgs"] <= 100.0


def test_hamt_format_object_store(tmp_path, fixture_data):
    """The HAMT REVERIE store (load_obj_database format,
    reverie/data_utils.py:33-43: obj_ids/bboxes(xywh)/viewindexs, no
    directions/sizes): angles derive from the discretized viewindex
    (reverie/env.py:189-193) and positions from get_obj_local_pos
    (data_utils.py:25-31)."""
    g = fixture_data[0]
    path = str(tmp_path / "hamt_obj.h5")
    vp = g.node_ids[5]
    with h5py.File(path, "w") as f:
        d = f.create_dataset(f"sc_{vp}",
                             data=np.ones((2, OBJ_DIM), np.float32))
        d.attrs["obj_ids"] = np.asarray([b"7", b"9"])
        d.attrs["bboxes"] = np.asarray([[64, 48, 128, 96],
                                        [320, 240, 64, 48]], np.float32)
        d.attrs["viewindexs"] = np.asarray([14, 25], np.int64)
    db = ObjectFeatureDB(path, OBJ_DIM)
    o_feat, o_ang, o_valid, o_ids, o_pos, _ = build_object_tables(
        db, [g], max_objects=3, obj_feat_dim=OBJ_DIM, bbox_format="xywh")
    assert o_valid[0, 5].sum() == 2
    # viewindex 14: heading (14%12)*30deg, elevation (14//12-1)*30deg
    np.testing.assert_allclose(o_ang[0, 5, 0],
                               [np.radians(60.0), 0.0], atol=1e-6)
    np.testing.assert_allclose(o_ang[0, 5, 1],
                               [np.radians(30.0), np.radians(30.0)],
                               atol=1e-6)
    # xywh -> (x1/640, y1/480, (x1+w)/640, (y1+h)/480, wh/(640*480))
    np.testing.assert_allclose(
        o_pos[0, 5, 0],
        [64 / 640, 48 / 480, 192 / 640, 144 / 480,
         128 * 96 / (640 * 480)], rtol=1e-6)
