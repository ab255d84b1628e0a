"""Task-variant evaluation plugins."""

import numpy as np
import pytest

from vln_imagine_tpu import variants as V


@pytest.fixture(scope="module")
def line_dist():
    idx = np.arange(8)
    return 2.0 * np.abs(idx[:, None] - idx[None, :])


def test_r2r_back_requires_both_stops(line_dist):
    gt = [0, 1, 2, 3]
    # correct midstop near node 2, correct end near node 3
    s = V.eval_item_r2r_back(line_dist, [0, 1, 2, 3], gt, midstop=2,
                             gt_midstop=2)
    assert s["success"] == 1.0
    # correct end, wrong midstop -> failure
    s = V.eval_item_r2r_back(line_dist, [0, 1, 2, 3], gt, midstop=0,
                             gt_midstop=5)
    assert s["success"] == 0.0
    # no midstop declared -> failure
    s = V.eval_item_r2r_back(line_dist, [0, 1, 2, 3], gt, midstop=None,
                             gt_midstop=2)
    assert s["success"] == 0.0


def test_ndh_goal_progress(line_dist):
    # goals at 5 and 6; agent walks 0->3
    s = V.eval_item_ndh(line_dist, [0, 1, 2, 3], end_panos=[5, 6])
    assert s["success"] == 0.0
    # gp = dist(0, 5) - dist(3, 5) = 10 - 4
    assert abs(s["gp"] - 6.0) < 1e-9
    s2 = V.eval_item_ndh(line_dist, [0, 1, 2, 3, 4, 5], end_panos=[5, 6])
    assert s2["success"] == 1.0
    assert abs(s2["gp"] - 10.0) < 1e-9


def test_reverie_rgs(line_dist):
    gt = [0, 1, 2]
    s = V.eval_item_reverie(line_dist, [0, 1, 2], gt,
                            goal_viewpoints=[2, 3], pred_obj=7, gt_obj=7)
    assert s["success"] == 1.0 and s["rgs"] == 1.0
    assert abs(s["rgspl"] - 1.0) < 1e-9
    s = V.eval_item_reverie(line_dist, [0, 1, 2], gt,
                            goal_viewpoints=[2, 3], pred_obj=4, gt_obj=7)
    assert s["success"] == 1.0 and s["rgs"] == 0.0
    s = V.eval_item_reverie(line_dist, [0, 1], gt,
                            goal_viewpoints=[2, 3], pred_obj=7, gt_obj=7)
    assert s["success"] == 0.0
    assert s["oracle_success"] == 0.0


def test_variant_registry_complete():
    assert set(V.VARIANTS) == {"r2r", "r2r_back", "r4r", "rxr", "cvdn",
                               "reverie", "soon"}
    assert V.VARIANTS["rxr"].tokenizer == "xlm-roberta-base"
    assert V.VARIANTS["reverie"].uses_objects


def test_eval_batch_variant_dispatch(line_dist):
    tables = np.stack([line_dist, line_dist])
    avg, per = V.eval_batch_variant(
        "cvdn", tables, np.array([0, 1]),
        paths=[[0, 1, 2], [0, 5]], end_panos=[[2], [5]])
    assert avg["sr"] == 100.0
    avg, per = V.eval_batch_variant(
        "reverie", tables, np.array([0]), paths=[[0, 1, 2]],
        gt_paths=[[0, 1, 2]], goal_viewpoints=[[2]],
        pred_objs=[1], gt_objs=[1])
    assert avg["rgs"] == 100.0


def test_duet_object_logits():
    """og_head produces masked object logits when obj_feat_size > 0."""
    import jax
    import jax.numpy as jnp
    from vln_imagine_tpu.config import tiny_test_config, _replace
    from vln_imagine_tpu.models.duet import DuetModel

    cfg = _replace(tiny_test_config("duet"), "model", obj_feat_size=32).model
    model = DuetModel(cfg)
    B, L, G, Tp, H = 2, 6, 5, 8, cfg.hidden_size
    A = cfg.angle_feat_size

    def run(mdl):
        txt = jnp.ones((B, L, H))
        return mdl.navigation_per_step(
            txt, jnp.ones((B, L), bool),
            jnp.zeros((B, G + 1, H)), jnp.zeros((B, G + 1), jnp.int32),
            jnp.zeros((B, G + 1, A + 3)), jnp.ones((B, G + 1), bool),
            jnp.zeros((B, G + 1, G + 1)), jnp.zeros((B, G + 1), bool),
            jnp.zeros((B, Tp + 1, H)), jnp.zeros((B, Tp + 1, 14)),
            jnp.ones((B, Tp + 1), bool), jnp.ones((B, Tp + 1), bool),
            jnp.zeros((B, G + 1, Tp + 1), bool),
            imagine_embeds=jnp.zeros((B, 2, H)),
            imagine_mask=jnp.ones((B, 2), bool),
            vp_obj_valid=jnp.asarray([[False] * 6 + [True] * 3,
                                      [False] * 9]))

    params = model.init(jax.random.PRNGKey(0), method=run)
    out = model.apply(params, method=run)
    assert out.obj_logits is not None
    obj = np.asarray(out.obj_logits)
    assert (obj[0, :6] < -1e8).all() and (obj[0, 6:] > -1e8).all()
    assert (obj[1] < -1e8).all()
