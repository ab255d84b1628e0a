"""End-to-end image pretraining: ViT-in-the-loop with frozen history."""

import jax
import jax.numpy as jnp
import numpy as np

from vln_imagine_tpu.config import tiny_test_config, _replace
from vln_imagine_tpu.models.vit import ViTConfig
from vln_imagine_tpu.pretrain.hamt_e2e import HamtE2EPretrainModel
import pytest


@pytest.mark.slow
def test_e2e_sap_grads_flow_through_obs_only():
    cfg = _replace(tiny_test_config("hamt"), "model",
                   image_feat_size=48).model
    vit_cfg = ViTConfig(image_size=32, patch_size=16, hidden_size=48,
                        num_layers=1, num_heads=4, compute_dtype="float32")
    model = HamtE2EPretrainModel(cfg, vit_config=vit_cfg,
                                 image_prob_size=8, tasks=("sap",))
    rng = np.random.default_rng(0)
    B, T, V, T_obs = 2, 3, 4, 6
    S = 32
    args = dict(
        txt_ids=jnp.asarray(rng.integers(1, 50, (B, 8))),
        txt_masks=jnp.ones((B, 8), bool),
        hist_images=jnp.asarray(rng.standard_normal((B, T, S, S, 3)),
                                jnp.float32),
        hist_ang_fts=jnp.zeros((B, T, 4)),
        hist_pano_images=jnp.asarray(
            rng.standard_normal((B, T, V, S, S, 3)), jnp.float32),
        hist_pano_ang_fts=jnp.zeros((B, T, V, 4)),
        hist_masks=jnp.ones((B, T + 1), bool),
        ob_images=jnp.asarray(rng.standard_normal((B, T_obs, S, S, 3)),
                              jnp.float32),
        ob_ang_fts=jnp.zeros((B, T_obs, 4)),
        ob_nav_types=jnp.asarray([[1, 1, 2, 0, 0, 0]] * B),
        ob_masks=jnp.ones((B, T_obs), bool),
        act_labels=jnp.zeros((B,), jnp.int32),
    )
    params = model.init(jax.random.PRNGKey(0), **args,
                        method=HamtE2EPretrainModel.forward_sap)

    def loss_fn(p):
        s, n, _ = model.apply(p, **args,
                              method=HamtE2EPretrainModel.forward_sap)
        return s / n

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    # the ViT receives gradients (through the observation branch only)
    vit_grads = grads["params"]["vit"]
    g = max(float(jnp.abs(x).max()) for x in jax.tree.leaves(vit_grads))
    assert g > 0

    # gradient placement matches image_vilmodel.py:40-59: the history
    # PANORAMAS are stop-gradient (no grads reach their pixels) while the
    # per-step history views DO back-propagate into the ViT
    model_mlm = HamtE2EPretrainModel(cfg, vit_config=vit_cfg,
                                     image_prob_size=8, tasks=("mlm",))
    mlm_args = {k: v for k, v in args.items()
                if not k.startswith(("ob_", "act_"))}
    mlm_args["txt_labels"] = jnp.where(
        jnp.arange(8)[None, :] == 2, args["txt_ids"], -1)
    p2 = model_mlm.init(jax.random.PRNGKey(1), **mlm_args,
                        method=HamtE2EPretrainModel.forward_mlm)

    def loss_wrt_images(hist_images, hist_pano_images):
        kw = dict(mlm_args, hist_images=hist_images,
                  hist_pano_images=hist_pano_images)
        s, n, _ = model_mlm.apply(p2, **kw,
                                  method=HamtE2EPretrainModel.forward_mlm)
        return s / n

    g_hist, g_pano = jax.grad(loss_wrt_images, argnums=(0, 1))(
        mlm_args["hist_images"], mlm_args["hist_pano_images"])
    assert float(jnp.abs(g_hist).max()) > 0, \
        "per-step history views must back-prop into the ViT"
    assert float(jnp.abs(g_pano).max()) == 0.0, \
        "history panoramas must be frozen (torch.no_grad)"


@pytest.mark.slow
def test_e2e_six_task_pretrain_run():
    """All six image tasks (mlm/sap/sar/sprel/mrc/itm,
    data/image_tasks.py:16-508) train end-to-end with the ViT in the loop,
    batched from a raw panorama bank."""
    from vln_imagine_tpu.config import tiny_test_config
    from vln_imagine_tpu.envx import synthetic_world, synthetic_episodes
    from vln_imagine_tpu.pretrain.trainer import E2EPretrainer

    cfg = tiny_test_config("hamt")
    cfg = _replace(cfg, "model", image_feat_size=48)
    cfg = _replace(cfg, "pretrain",
                   tasks=("mlm", "sap", "sar", "sprel", "mrc", "itm"),
                   mix_ratio=(1, 1, 1, 1, 1, 1), batch_size=2)
    vit_cfg = ViTConfig(image_size=16, patch_size=8, hidden_size=48,
                        num_layers=1, num_heads=4, compute_dtype="float32")
    rng = np.random.default_rng(0)
    world_np, _ = synthetic_world(
        num_scans=1, num_nodes=10, max_candidates=cfg.env.max_candidates,
        views=cfg.env.views, feat_dim=cfg.model.image_feat_size, seed=1)
    ep = synthetic_episodes(
        world_np, batch=4, max_gt_path_len=cfg.env.max_gt_path_len,
        max_instr_len=cfg.env.max_instr_len,
        max_imaginations=cfg.model.max_imagination_len,
        vocab_size=cfg.model.vocab_size, feat_dim=cfg.model.hidden_size,
        seed=2)
    S, N, V = world_np.feat.shape[:3]
    # in-memory stand-in for a RawPanoramaBank mmap ([S, N, V, h, w, 3])
    images = rng.standard_normal((S, N, V, 16, 16, 3)).astype(np.float32)

    import jax.numpy as jnp
    world = jax.tree.map(jnp.asarray, world_np)
    pt = E2EPretrainer(cfg, world, ep, images, vit_config=vit_cfg,
                       image_prob_size=8, donate=False)
    # every task produces a well-formed raw-image batch
    for task in cfg.pretrain.tasks:
        b = pt.batcher.task_batch(task, 2)
        assert "hist_images" in b and b["hist_images"].ndim == 5
        assert "hist_img_fts" not in b
    state = pt.init_state()
    state, summary = pt.train(state, len(cfg.pretrain.tasks) * 2)
    assert all(np.isfinite(v) for v in summary.values()), summary
    out = pt.validate(state, batch_size=2, num_batches=1)
    assert set(out) == set(cfg.pretrain.tasks)
