"""Data layer: annotations, samplers, metadata tools, feature scattering."""

import json

import numpy as np
import pytest

from vln_imagine_tpu.data import annotations as A
from vln_imagine_tpu.data import nlp_tools as N
from vln_imagine_tpu.data.features import (
    InMemoryFeaturesDB,
    build_imagination_arrays,
)
from vln_imagine_tpu.envx.synthetic import random_scan_graph


def test_construct_instrs_splits_instructions(tmp_path):
    anno = [{
        "path_id": 4332, "scan": "sc1",
        "path": ["a", "b", "c"], "heading": 1.0,
        "instructions": ["go one", "go two", "go three", "go four"],
        "instr_encodings": [[1, 5, 6], [1, 7, 8], [1, 9, 10], [1, 11, 12]],
    }]
    with open(tmp_path / "R2R_val_seen_enc.json", "w") as f:
        json.dump(anno, f)
    items = A.construct_instrs(str(tmp_path), "r2r", ["val_seen"])
    # at most 3 instructions per path (data_utils.py:100-102)
    assert len(items) == 3
    assert items[0]["instr_id"] == "4332_0"
    assert items[2]["instr_encoding"] == [1, 9, 10]
    assert "instructions" not in items[0]


def test_episodes_from_annotations_arrays():
    rng = np.random.default_rng(0)
    g = random_scan_graph(rng, "sc1", 10)
    items = [{
        "instr_id": "1_0", "scan": "sc1",
        "path": [g.node_ids[0], g.node_ids[1]],
        "heading": 0.5, "instr_encoding": [1, 4, 5, 6],
    }]
    meta = A.AuxMetadata(
        sub_instr_segs={"1_0": [(1, 3)]},
        noun_phrase_segs={"1_0": [[(2, 3)]]},
        generated_flags={"1_0": ["True"]},
    )
    ep, ids = A.episodes_from_annotations(items, [g], meta,
                                          max_instr_len=8, max_gt_path_len=4,
                                          max_imaginations=2)
    assert ids == ["1_0"]
    assert ep.gt_len[0] == 2
    assert ep.txt_mask[0].sum() == 4
    # noun-phrase weights: 1/2 over tokens 2..3, imagination 0 flagged
    np.testing.assert_allclose(ep.np_weights[0, 0, 2:4], 0.5)
    assert ep.np_weights[0, 0].sum() == 1.0
    assert ep.imagine_mask[0, 0] and not ep.imagine_mask[0, 1]


def test_round_robin_sampler_wraps_with_reshuffle():
    s = A.RoundRobinSampler(5, 2, seed=1)
    seen = []
    for _ in range(5):
        b = s.next_batch()
        assert len(b) == 2
        seen.extend(b.tolist())
    # 10 draws cover the 5 items exactly twice
    assert sorted(seen).count(0) == 2
    assert len(seen) == 10


def test_eval_sampler_looped_detection():
    s = A.EvalSampler(5, 2)
    picked = []
    for idxs, fresh in s:
        picked.extend(np.asarray(idxs)[fresh].tolist())
    assert sorted(picked) == [0, 1, 2, 3, 4]  # each item exactly once


def test_eval_sampler_batch_larger_than_split():
    # bs > n (mesh rounding can raise bs above a tiny split): the wrapped
    # duplicates inside ONE batch must not be fresh twice
    s = A.EvalSampler(3, 8)
    batches = list(s)
    assert len(batches) == 1
    idxs, fresh = batches[0]
    picked = np.asarray(idxs)[fresh].tolist()
    assert sorted(picked) == [0, 1, 2]


def test_find_best_segment_exact_match():
    instr = ["[CLS]", "walk", "past", "the", "sofa", ".", "stop", "[SEP]"]
    start, end, score = N.find_best_segment(instr, ["walk", "past", "the",
                                                    "sofa"])
    assert (start, end) == (1, 5)
    assert score == 100.0


def test_merge_subword_tokens():
    merged, mapping = N.merge_subword_tokens(["book", "##shelf", "near",
                                              "stair", "##case"])
    assert merged == ["bookshelf", "near", "staircase"]
    assert mapping == [0, 2, 3]


def test_noun_phrase_metadata_schema():
    instr = ["[CLS]", "walk", "to", "the", "book", "##shelf", ".", "stop",
             "at", "the", "sofa", "[SEP]"]
    subs = [["walk", "to", "the", "book", "##shelf"],
            ["stop", "at", "the", "sofa"]]
    rec = N.build_sub_instr_metadata("7_1", instr, subs, path_id=7)
    assert rec["instruction_id"] == "7_1"
    assert len(rec["instr_segmentation_indices"]) == 2
    assert len(rec["noun_phrase_indices"]) == 2
    lo, hi = rec["instr_segmentation_indices"][0]
    assert instr[lo:hi + 1] == ["walk", "to", "the", "book", "##shelf"]
    # noun phrase indices are absolute into the instruction
    for spans, (slo, shi) in zip(rec["noun_phrase_indices"],
                                 rec["instr_segmentation_indices"]):
        for (a, b) in spans:
            assert slo <= a <= b <= shi


def test_imagination_scatter_matches_flags():
    db = InMemoryFeaturesDB({
        "i1": np.arange(6, dtype=np.float32).reshape(2, 3),
        "i2": np.zeros((0, 3), np.float32),
    })
    flags = {"i1": ["True", "False", "True"], "i2": ["False", "False"]}
    feats, mask = build_imagination_arrays(db, ["i1", "i2"], flags,
                                           max_imaginations=4, feat_dim=3)
    # i1: features land at sub-instruction slots 0 and 2
    np.testing.assert_array_equal(mask[0], [True, False, True, False])
    np.testing.assert_allclose(feats[0, 0], [0, 1, 2])
    np.testing.assert_allclose(feats[0, 2], [3, 4, 5])
    assert not mask[1].any()


def test_reverie_np_weights_uniform_over_tokens():
    from vln_imagine_tpu.data.annotations import reverie_np_weights

    mask = np.array([[True, True, True, False],
                     [True, False, False, False]])
    w = reverie_np_weights(mask, max_imaginations=3)
    assert w.shape == (2, 3, 4)
    np.testing.assert_allclose(w[0, 0], [1 / 3, 1 / 3, 1 / 3, 0])
    np.testing.assert_allclose(w[1, 0], [1, 0, 0, 0])
    assert (w[:, 1:] == 0).all()


def test_raw_image_bank_scatter(tmp_path):
    """RawImaginationImageBank.batch_images uses the same generated-flag
    scatter as build_imagination_arrays (shared helper)."""
    from vln_imagine_tpu.data.features import RawImaginationImageBank

    hw = 4
    bank = np.stack([np.full((hw, hw, 3), v, np.float32) for v in (1, 2, 3)])
    path = str(tmp_path / "bank.npy")
    np.save(path, bank)
    index = {"i1": (0, 2), "i2": (2, 3)}
    b = RawImaginationImageBank(path, index, image_size=hw)
    flags = {"i1": ["True", "False", "True"], "i2": ["True"]}
    imgs, mask = b.batch_images(["i1", "i2"], flags, max_imaginations=4)
    np.testing.assert_array_equal(mask[0], [True, False, True, False])
    np.testing.assert_array_equal(mask[1], [True, False, False, False])
    assert imgs[0, 0, 0, 0, 0] == 1 and imgs[0, 2, 0, 0, 0] == 2
    assert imgs[1, 0, 0, 0, 0] == 3
    assert (imgs[0, 1] == 0).all()


def test_imagination_v1_dense_packing():
    """V1 format (_create_diffusion_imaginations, agent_cmt.py:217-246):
    features packed densely from slot 0, first-n mask, no flag JSON."""
    from vln_imagine_tpu.data.features import build_imagination_arrays_v1

    db = InMemoryFeaturesDB({
        "i1": np.arange(6, dtype=np.float32).reshape(2, 3),
        "i2": np.arange(12, dtype=np.float32).reshape(4, 3),
    })
    feats, mask = build_imagination_arrays_v1(db, ["i1", "i2"],
                                              max_imaginations=3, feat_dim=3)
    np.testing.assert_array_equal(mask, [[True, True, False],
                                         [True, True, True]])
    np.testing.assert_allclose(feats[0, 0], [0, 1, 2])
    np.testing.assert_allclose(feats[0, 2], [0, 0, 0])
    # overflow rows beyond max_imaginations are dropped
    np.testing.assert_allclose(feats[1, 2], [6, 7, 8])


def test_episodes_respect_v1_mask_override():
    from vln_imagine_tpu.data.annotations import (
        AuxMetadata, episodes_from_annotations)
    from vln_imagine_tpu.envx.synthetic import random_scan_graph

    g = random_scan_graph(np.random.default_rng(0), "sc", 8)
    items = [{"instr_id": "1_0", "scan": "sc",
              "path": [g.node_ids[0], g.node_ids[1]],
              "instr_encoding": [1, 2, 3]}]
    override = np.array([[True, True, False, False]])
    ep, _ = episodes_from_annotations(
        items, [g], AuxMetadata(), max_instr_len=8, max_gt_path_len=4,
        max_imaginations=4, imagine_mask_override=override)
    np.testing.assert_array_equal(np.asarray(ep.imagine_mask), override)


def test_episodes_populate_midstop():
    """r2r_back annotations carry a 'midstop' viewpoint per item
    (R2RBackBatch, VLN-HAMT/finetune_src/r2r/env.py:434-435)."""
    from vln_imagine_tpu.data.annotations import (
        AuxMetadata, episodes_from_annotations)
    from vln_imagine_tpu.envx.synthetic import random_scan_graph

    g = random_scan_graph(np.random.default_rng(1), "sc", 8)
    items = [{"instr_id": "1_0", "scan": "sc",
              "path": [g.node_ids[0], g.node_ids[3], g.node_ids[0]],
              "midstop": g.node_ids[3], "instr_encoding": [1, 2]},
             {"instr_id": "2_0", "scan": "sc",
              "path": [g.node_ids[2], g.node_ids[4], g.node_ids[2]],
              "midstop": g.node_ids[4], "instr_encoding": [3]}]
    ep, _ = episodes_from_annotations(
        items, [g], AuxMetadata(), max_instr_len=8, max_gt_path_len=4,
        max_imaginations=2)
    assert ep.midstop is not None
    np.testing.assert_array_equal(np.asarray(ep.midstop), [3, 4])
