"""Warm-up variant4 invariants as unit tests.

The reference validates its 3-group optimizer at runtime every interval
(TestWarmupRoutine, VLN-HAMT/finetune_src/r2r/test_warmup_optimizer.py:3-105,
asserted in main.py:209-278): the groups exactly partition the model, no
parameter appears twice, per-stage learning rates match, per-stage
trainability matches.  Here the same invariants are checked against the optax
implementation (train/optim.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from vln_imagine_tpu.train.optim import (
    AUX_GROUPS,
    _staged_schedule,
    freeze_until,
    label_hamt_params,
    warmup_variant4_optimizer,
)


def _params():
    return {"params": {
        "image_proj": {"fc1": {"kernel": jnp.ones((4, 4))}},
        "imagine_embeddings": {"type_embedding":
                               {"embedding": jnp.ones((1, 4))}},
        "embeddings": {"word_embeddings": {"embedding": jnp.ones((8, 4))}},
        "x_layer_0": {"visual_attention":
                      {"att": {"query": {"kernel": jnp.ones((4, 4)),
                                         "bias": jnp.zeros(4)}}}},
    }}


def test_labels_partition_params_exactly():
    """parameter_count_matches / validate_all_params_are_accounted /
    ensure_no_duplicate_params (test_warmup_optimizer.py:7-23)."""
    params = _params()
    labels = label_hamt_params(params)
    flat_p = jax.tree_util.tree_leaves(params)
    flat_l = jax.tree_util.tree_leaves(labels)
    assert len(flat_p) == len(flat_l)  # one label per parameter, no dups
    assert set(flat_l) <= {"contrastive", "imagine", "rest"}
    # group membership by module
    lab = labels["params"]
    assert set(jax.tree_util.tree_leaves(lab["image_proj"])) == \
        {"contrastive"}
    assert set(jax.tree_util.tree_leaves(lab["imagine_embeddings"])) == \
        {"imagine"}
    assert set(jax.tree_util.tree_leaves(lab["embeddings"])) == {"rest"}
    assert set(jax.tree_util.tree_leaves(lab["x_layer_0"])) == {"rest"}


def test_stage_learning_rates():
    """main.py:204-205: contrastive lrs (10x, 5x, 0.1x) and bert lrs
    (base-but-frozen, 0.1x, 0.1x)."""
    lr, iters = 1e-5, 100_000
    aux = _staged_schedule(iters // 4, iters // 2, lr, (10.0, 5.0, 0.1))
    rest = _staged_schedule(iters // 4, iters // 2, lr, (1.0, 0.1, 0.1))
    assert np.isclose(aux(0), lr * 10)
    assert np.isclose(aux(24_999), lr * 10)
    assert np.isclose(aux(25_000), lr * 5)
    assert np.isclose(aux(49_999), lr * 5)
    assert np.isclose(aux(50_000), lr * 0.1)
    assert np.isclose(rest(0), lr)
    assert np.isclose(rest(25_000), lr * 0.1)
    assert np.isclose(rest(99_999), lr * 0.1)
    # stage 3: all groups share the same lr (main.py:253)
    assert np.isclose(aux(70_000), rest(70_000))


def test_freeze_until_preserves_inner_state():
    """torch requires_grad=False semantics: frozen params receive no moment
    updates, and unfreeze at exactly 0.25 * iters (main.py:229-245)."""
    tx = freeze_until(optax.sgd(1.0), unfreeze_step=3)
    params = {"w": jnp.ones(3)}
    state = tx.init(params)
    g = {"w": jnp.ones(3)}
    for step in range(5):
        updates, state = tx.update(g, state, params)
        if step < 3:
            assert float(jnp.abs(updates["w"]).max()) == 0.0, step
        else:
            assert float(jnp.abs(updates["w"]).max()) > 0.0, step


def test_variant4_stagewise_trainability():
    """Drive the full optimizer across the stage-1 boundary: aux groups
    update from step 0, 'rest' only after 25% of iters."""
    total = 8
    build = warmup_variant4_optimizer(1e-2, total_iters=total,
                                      max_grad_norm=1e9)
    params = _params()
    tx = build(params)
    state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)

    def moved(updates, module):
        return max(float(jnp.abs(x).max()) for x in
                   jax.tree_util.tree_leaves(updates["params"][module]))

    for step in range(4):
        updates, state = tx.update(grads, state, params)
        assert moved(updates, "image_proj") > 0
        assert moved(updates, "imagine_embeddings") > 0
        if step < 2:  # 0.25 * 8 = 2
            assert moved(updates, "embeddings") == 0.0, step
            assert moved(updates, "x_layer_0") == 0.0, step
        else:
            assert moved(updates, "embeddings") > 0, step
