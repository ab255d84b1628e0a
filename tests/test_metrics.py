"""Navigation metrics against hand-computed values on a line graph."""

import numpy as np
import pytest

from vln_imagine_tpu.eval import metrics as M


@pytest.fixture(scope="module")
def line_dist():
    # 6 nodes on a line, 2m apart: dist[i, j] = 2|i - j|
    n = 6
    idx = np.arange(n)
    return 2.0 * np.abs(idx[:, None] - idx[None, :])


def test_perfect_path(line_dist):
    gt = [0, 1, 2, 3]
    s = M.eval_item(line_dist, gt, gt)
    assert s["nav_error"] == 0.0
    assert s["success"] == 1.0
    assert s["spl"] == 1.0
    assert s["oracle_success"] == 1.0
    assert abs(s["nDTW"] - 1.0) < 1e-9
    assert abs(s["SDTW"] - 1.0) < 1e-9
    assert abs(s["CLS"] - 1.0) < 1e-9
    assert s["trajectory_steps"] == 3
    assert s["trajectory_lengths"] == 6.0


def test_stop_short(line_dist):
    gt = [0, 1, 2, 3]
    path = [0, 1, 2]
    s = M.eval_item(line_dist, path, gt)
    assert s["nav_error"] == 2.0           # 2m from node 3
    assert s["success"] == 1.0             # within 3m margin
    # spl = success * gt_len / max(traj_len, gt_len) = 6 / max(4, 6)
    assert abs(s["spl"] - 1.0) < 1e-9      # max(4,6)=6 -> 6/6
    assert s["oracle_error"] == 2.0


def test_overshoot_spl_penalty(line_dist):
    gt = [0, 1, 2]
    path = [0, 1, 2, 3, 2]                 # wanders then returns
    s = M.eval_item(line_dist, path, gt)
    assert s["success"] == 1.0
    assert abs(s["spl"] - 4.0 / 8.0) < 1e-9


def test_failure_far_away(line_dist):
    gt = [0, 1, 2, 3, 4, 5]
    path = [0, 1]
    s = M.eval_item(line_dist, path, gt)
    assert s["nav_error"] == 8.0
    assert s["success"] == 0.0
    assert s["spl"] == 0.0
    assert s["SDTW"] == 0.0
    assert s["nDTW"] > 0.0


def test_dtw_hand_computed(line_dist):
    # prediction [0], reference [0, 1]: dtw = d(0,0) + d(0,1) = 0 + 2
    out = M.cal_dtw(line_dist, [0], [0, 1])
    assert abs(out["DTW"] - 2.0) < 1e-9
    assert abs(out["nDTW"] - np.exp(-2.0 / (3.0 * 2))) < 1e-9


def test_cls_hand_computed(line_dist):
    # path == reference -> coverage 1, score 1
    assert abs(M.cal_cls(line_dist, [0, 1, 2], [0, 1, 2]) - 1.0) < 1e-9
    # empty-movement path far from route
    cls = M.cal_cls(line_dist, [0], [0, 1, 2])
    cov = np.mean([1.0, np.exp(-2 / 3), np.exp(-4 / 3)])
    expected = cov * 4.0
    score = expected / (expected + abs(expected - 0.0))
    assert abs(cls - cov * score) < 1e-9


def test_eval_batch_aggregates(line_dist):
    dist_tables = np.stack([line_dist, line_dist])
    scans = np.array([0, 1])
    avg, per = M.eval_batch(dist_tables, scans, [[0, 1, 2], [0, 1]],
                            [[0, 1, 2], [0, 1, 2, 3, 4, 5]])
    assert avg["sr"] == 50.0
    assert len(per["success"]) == 2
    assert set(avg) == {"steps", "lengths", "nav_error", "oracle_error", "sr",
                        "oracle_sr", "spl", "nDTW", "SDTW", "CLS"}


def test_oracle_error_closest_point(line_dist):
    gt = [0, 5]
    path = [0, 1, 2, 3, 2, 1, 0]
    s = M.eval_item(line_dist, path, gt)
    assert s["oracle_error"] == 4.0  # node 3 was closest to node 5
    assert s["nav_error"] == 10.0
