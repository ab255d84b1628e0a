"""Schema-faithful loader fixtures for the task variants: RxR jsonl,
r2r_back ReturnBack annotations with midstops, and CVDN dialog files —
each through load_instr_datasets/construct_instrs into episode arrays
(VERDICT round-1 item 4: the variants must be proven on real file schemas,
not only synthetic episodes)."""

import json

import numpy as np

from vln_imagine_tpu.data.annotations import (
    AuxMetadata,
    construct_instrs,
    episodes_from_annotations,
    ndh_episodes_from_annotations,
)
from vln_imagine_tpu.envx.synthetic import random_scan_graph


def _graph():
    return random_scan_graph(np.random.default_rng(0), "sc", 10)


def test_rxr_jsonl_loader(tmp_path):
    """RxR guide annotations arrive as jsonl with instruction_id +
    pre-encoded xlmr text (data_utils.py:66-71 schema)."""
    g = _graph()
    rows = [
        {"instruction_id": 9650, "path_id": 4332, "scan": "sc",
         "path": [g.node_ids[0], g.node_ids[1]], "heading": 0.2,
         "instruction": "camine hacia la puerta",
         "instr_encoding": [0, 55, 66, 77, 2]},
        {"instruction_id": 9651, "scan": "sc",
         "path": [g.node_ids[2], g.node_ids[3]], "heading": 1.0,
         "instruction": "turn around", "instr_encoding": [0, 88, 2]},
    ]
    anno = tmp_path / "anno"
    anno.mkdir()
    (anno / "rxr_val_unseen_guide_enc_xlmr.jsonl").write_text(
        "\n".join(json.dumps(r) for r in rows) + "\n")

    items = construct_instrs(str(anno), "rxr", ["val_unseen"])
    assert [it["instr_id"] for it in items] == ["4332_9650", "9651"]
    ep, ids = episodes_from_annotations(
        items, [g], AuxMetadata(), max_instr_len=8, max_gt_path_len=4,
        max_imaginations=2, imagine_feat_dim=8)
    assert ids == ["4332_9650", "9651"]
    np.testing.assert_array_equal(np.asarray(ep.txt_ids)[0, :5],
                                  rows[0]["instr_encoding"])
    np.testing.assert_array_equal(np.asarray(ep.gt_len), [2, 2])


def test_r2r_back_returnback_loader(tmp_path):
    """ReturnBack/R2R_<split>_enc.json carries a 'midstop' viewpoint per
    path (R2RBackBatch reads it, VLN-HAMT finetune env.py:434-435); it must
    reach EpisodeBatch.midstop as a node index."""
    g = _graph()
    item = {
        "scan": "sc", "path_id": 77, "heading": 0.0,
        "path": [g.node_ids[0], g.node_ids[4], g.node_ids[0]],
        "midstop": g.node_ids[4],
        "instructions": ["go there and come back"],
        "instr_encodings": [[1, 9, 8, 2]],
    }
    anno = tmp_path / "anno"
    (anno / "ReturnBack").mkdir(parents=True)
    (anno / "ReturnBack" / "R2R_val_seen_enc.json").write_text(
        json.dumps([item]))

    items = construct_instrs(str(anno), "r2r_back", ["val_seen"])
    assert items[0]["midstop"] == g.node_ids[4]
    ep, _ = episodes_from_annotations(
        items, [g], AuxMetadata(), max_instr_len=8, max_gt_path_len=4,
        max_imaginations=2, imagine_feat_dim=8)
    assert ep.midstop is not None
    assert int(np.asarray(ep.midstop)[0]) == 4


def test_soon_jsonl_loader(tmp_path):
    """SOON bert_enc jsonl: per-instruction dicts with 'full' text variants
    and goal bboxes carrying pseudo obj labels (soon/data_utils.py:27-70);
    the goal-viewpoint pseudo label becomes the grounding target objId
    (soon/env.py:257-264)."""
    g = _graph()
    end_vp = g.node_ids[3]
    item = {
        "path_id": 55, "scan": "sc", "heading": 0.5,
        "path": [g.node_ids[0], g.node_ids[3]],
        "instructions": [{"full": "find the red lamp in the study"}],
        "instr_encodings": [{"full": [1, 21, 22, 23, 2]}],
        "bboxes": [
            {"image_id": end_vp,
             "pseudo_label": {"obj_id": 7, "idx": 0}},
            {"image_id": g.node_ids[5], "pseudo_label": None},
        ],
    }
    anno = tmp_path / "anno"
    (anno / "bert_enc").mkdir(parents=True)
    (anno / "bert_enc" / "val_unseen_house_enc_pseudo_obj_label.jsonl"
     ).write_text(json.dumps(item) + "\n")

    items = construct_instrs(str(anno), "soon", ["val_unseen_house"])
    assert items[0]["instr_id"] == "55_0"
    assert items[0]["instruction"] == "find the red lamp in the study"
    assert items[0]["instr_encoding"] == [1, 21, 22, 23, 2]
    assert items[0]["end_image_ids"] == [end_vp, g.node_ids[5]]
    assert items[0]["objId"] == 7  # pseudo label at the goal viewpoint

    ep, ids = episodes_from_annotations(
        items, [g], AuxMetadata(), max_instr_len=8, max_gt_path_len=4,
        max_imaginations=2, imagine_feat_dim=8)
    assert ids == ["55_0"]
    assert ep.gt_obj_id is not None
    assert int(np.asarray(ep.gt_obj_id)[0]) == 7


def test_cvdn_dialog_loader(tmp_path):
    """CVDN NDH files: pre-encoded dialog history, start pano + end_panos
    (cvdn/main.py:24-27, env.py:30-45); goal-progress lists and full
    shortest-path supervision come out of the episode builder."""
    g = _graph()
    item = {
        "inst_idx": 321, "scan": "sc",
        "start_pano": g.node_ids[0],
        "end_panos": [g.node_ids[6]],
        "start_heading": 2.0,
        "instr_encoding": [1, 40, 41, 42, 2],
        "nav_steps": [g.node_ids[0], g.node_ids[1]],
    }
    anno = tmp_path / "anno"
    anno.mkdir()
    (anno / "val_seen_enc.json").write_text(json.dumps([item]))

    from vln_imagine_tpu.data.annotations import load_instr_datasets
    raw = load_instr_datasets(str(anno), "cvdn", ["val_seen"])
    ep, ids, end_panos = ndh_episodes_from_annotations(
        raw, [g], max_instr_len=8, max_gt_path_len=6, max_imaginations=2,
        rng=np.random.default_rng(1))
    assert ids == ["321"]
    assert end_panos[0] == [6]
    # supervision path reaches (or heads toward) the sampled goal pano and
    # is a contiguous walk
    path = list(np.asarray(ep.gt_path)[0, : int(np.asarray(ep.gt_len)[0])])
    adjacency = {(a, b) for a, b in g.edges} | {(b, a) for a, b in g.edges}
    assert path[0] == 0
    for u, v in zip(path, path[1:]):
        assert (int(u), int(v)) in adjacency
