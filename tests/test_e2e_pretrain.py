"""End-to-end image pretraining: ViT-in-the-loop with frozen history."""

import jax
import jax.numpy as jnp
import numpy as np

from vln_imagine_tpu.config import tiny_test_config, _replace
from vln_imagine_tpu.models.vit import ViTConfig
from vln_imagine_tpu.pretrain.hamt_e2e import HamtE2EPretrainModel


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

    # with only frozen-history usage (mlm), the ViT gets zero gradients
    model_mlm = HamtE2EPretrainModel(cfg, vit_config=vit_cfg,
                                     image_prob_size=8, tasks=("mlm",))
    mlm_args = {k: v for k, v in args.items()
                if not k.startswith(("ob_", "act_"))}
    mlm_args["txt_labels"] = jnp.where(
        jnp.arange(8)[None, :] == 2, args["txt_ids"], -1)
    p2 = model_mlm.init(jax.random.PRNGKey(1), **mlm_args,
                        method=HamtE2EPretrainModel.forward_mlm)

    def loss_mlm(p):
        s, n, _ = model_mlm.apply(p, **mlm_args,
                                  method=HamtE2EPretrainModel.forward_mlm)
        return s / n

    _, g2 = jax.value_and_grad(loss_mlm)(p2)
    gv = max(float(jnp.abs(x).max())
             for x in jax.tree.leaves(g2["params"]["vit"]))
    assert gv == 0.0
