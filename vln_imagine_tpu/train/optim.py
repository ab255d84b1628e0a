"""Optimizers: the three-group imagination warm-up (variant4) and friends.

The reference builds a 3-group torch optimizer over {contrastive alignment
model, imagine embeddings, everything else} (agent_cmt.py:82-101) and mutates
group learning rates / requires_grad per training stage in the driver
(main.py:200-278):

  stage1 (idx < 0.25*iters):  aux groups lr*10, trainable; rest frozen
  stage2 (0.25 - 0.5*iters):  aux groups lr*5;  rest lr*0.1
  stage3 (>= 0.5*iters):      every group lr*0.1

Here the same schedule is a pure optax transform: per-group Adam chains with
step-indexed learning-rate schedules, and a freeze wrapper that leaves inner
optimizer state untouched before the unfreeze step (matching torch's
requires_grad=False semantics, where frozen params receive no moment updates).
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax


AUX_GROUPS = ("image_proj", "imagine_embeddings")


def label_hamt_params(params: Any) -> Any:
    """Label each leaf by warm-up group based on its top-level module name."""

    def label_tree(tree, label):
        return jax.tree.map(lambda _: label, tree)

    inner = params["params"] if "params" in params else params
    labels = {}
    for k, v in inner.items():
        if k == "image_proj":
            labels[k] = label_tree(v, "contrastive")
        elif k == "imagine_embeddings":
            labels[k] = label_tree(v, "imagine")
        else:
            labels[k] = label_tree(v, "rest")
    return {"params": labels} if "params" in params else labels


def freeze_module(tx: optax.GradientTransformation,
                  module: str) -> optax.GradientTransformation:
    """Permanently mask one top-level module out of `tx` (zero updates, so
    e.g. AdamW weight decay cannot drift params whose grads are stopped) —
    used for ModelConfig.e2e_imagination == 'frozen'."""

    def label(params):
        inner = params["params"] if "params" in params else params
        labels = {}
        for k, v in inner.items():
            lbl = "frozen" if k == module else "train"
            labels[k] = jax.tree.map(lambda _, s=lbl: s, v)
        return {"params": labels} if "params" in params else labels

    return optax.multi_transform(
        {"frozen": optax.set_to_zero(), "train": tx}, label)


class FreezeState(NamedTuple):
    inner: Any
    count: jnp.ndarray


def freeze_until(inner: optax.GradientTransformation,
                 unfreeze_step: int) -> optax.GradientTransformation:
    """Zero updates and untouched inner state before `unfreeze_step`."""

    def init(params):
        return FreezeState(inner.init(params), jnp.zeros([], jnp.int32))

    def update(updates, state, params=None):
        def frozen(_):
            zeros = jax.tree.map(jnp.zeros_like, updates)
            return zeros, state.inner

        def active(_):
            return inner.update(updates, state.inner, params)

        new_updates, new_inner = jax.lax.cond(
            state.count >= unfreeze_step, active, frozen, None)
        return new_updates, FreezeState(new_inner, state.count + 1)

    return optax.GradientTransformation(init, update)


def _staged_schedule(stage1_end: int, stage2_end: int, base_lr: float,
                     stage_lrs: tuple[float, float, float]) -> Callable:
    s1, s2, s3 = stage_lrs

    def schedule(count):
        c = jnp.asarray(count)
        return jnp.where(c < stage1_end, base_lr * s1,
                         jnp.where(c < stage2_end, base_lr * s2,
                                   base_lr * s3))

    return schedule


def _adam_like(name: str, lr: Callable | float,
               weight_decay: float = 0.0) -> optax.GradientTransformation:
    """Optimizer family matching the reference's optim/ directory:
    adam/adamw/rms/sgd (agent_cmt.py:69-78), radam (pretrain_src/optim/
    adamw.py sibling RAdam), ralamb (RAdam + LARS trust ratio),
    rangerlars (Ralamb + Lookahead, optim/rangerlars.py)."""
    if name in ("adam", "adamw"):
        tx = optax.scale_by_adam(eps=1e-8)
    elif name == "radam":
        tx = optax.scale_by_radam()
    elif name == "ralamb":
        tx = optax.chain(optax.scale_by_radam(),
                         optax.scale_by_trust_ratio())
    elif name == "rangerlars":
        # Lookahead applied at the chain level via lookahead_wrapper below;
        # the inner update is Ralamb.
        tx = optax.chain(optax.scale_by_radam(),
                         optax.scale_by_trust_ratio())
    elif name == "rms":
        tx = optax.scale_by_rms()
    elif name == "sgd":
        tx = optax.identity()
    else:
        raise ValueError(name)
    parts = [tx]
    if weight_decay:
        parts.append(optax.add_decayed_weights(weight_decay))
    if callable(lr):
        parts.append(optax.scale_by_schedule(lambda c: -lr(c)))
    else:
        parts.append(optax.scale(-lr))
    return optax.chain(*parts)


def warmup_variant4_optimizer(base_lr: float, total_iters: int,
                              optim: str = "adamw",
                              max_grad_norm: float = 40.0,
                              stage1_iters: int = -1,
                              stage2_iters: int = -1,
                              weight_decay: float = 0.0,
                              ) -> Callable[[Any], optax.GradientTransformation]:
    """Returns params -> GradientTransformation implementing the 3-stage
    schedule. Clip-by-global-norm 40 applied first (agent_cmt.py:794).

    stage1_iters / stage2_iters are the stage END boundaries
    (TrainConfig.warmup_stage{1,2}_iters); -1 reproduces the reference's
    hardcoded fractions 0.25*iters / 0.5*iters (main.py:230,244)."""

    stage1_end = stage1_iters if stage1_iters >= 0 else int(0.25 * total_iters)
    stage2_end = stage2_iters if stage2_iters >= 0 else int(0.5 * total_iters)
    assert stage1_end <= stage2_end, (stage1_end, stage2_end)
    aux_sched = _staged_schedule(stage1_end, stage2_end, base_lr,
                                 (10.0, 5.0, 0.1))
    rest_sched = _staged_schedule(stage1_end, stage2_end, base_lr,
                                  (1.0, 0.1, 0.1))

    def build(params):
        labels = label_hamt_params(params)
        tx = optax.multi_transform(
            {
                "contrastive": _adam_like(optim, aux_sched, weight_decay),
                "imagine": _adam_like(optim, aux_sched, weight_decay),
                "rest": freeze_until(
                    _adam_like(optim, rest_sched, weight_decay), stage1_end),
            },
            labels,
        )
        return optax.chain(optax.clip_by_global_norm(max_grad_norm), tx)

    return build


def plain_optimizer(base_lr: float, optim: str = "adamw",
                    max_grad_norm: float | None = 40.0,
                    weight_decay: float = 0.0) -> optax.GradientTransformation:
    parts = []
    if max_grad_norm:
        parts.append(optax.clip_by_global_norm(max_grad_norm))
    parts.append(_adam_like(optim, base_lr, weight_decay))
    tx = optax.chain(*parts)
    if optim == "rangerlars":
        tx = lookahead_wrapper(tx)
    return tx


class _LookaheadState(NamedTuple):
    inner: Any
    slow: Any
    count: jnp.ndarray


def lookahead_wrapper(inner: optax.GradientTransformation, k: int = 6,
                      alpha: float = 0.5) -> optax.GradientTransformation:
    """Lookahead (pretrain_src/optim/lookahead.py): every k fast steps, pull
    the slow weights alpha of the way towards the fast weights and reset.
    Expressed on the update stream: the emitted update every k-th step
    includes the slow-weight correction."""

    def init(params):
        return _LookaheadState(inner.init(params),
                               jax.tree.map(jnp.asarray, params),
                               jnp.zeros([], jnp.int32))

    def update(updates, state, params=None):
        fast_updates, inner_state = inner.update(updates, state.inner, params)
        count = state.count + 1
        sync = (count % k) == 0

        def on_sync(_):
            # fast params after this step
            fast = jax.tree.map(lambda p, u: p + u, params, fast_updates)
            new_slow = jax.tree.map(
                lambda s, f: s + alpha * (f - s), state.slow, fast)
            # emitted update moves params to the new slow weights
            out = jax.tree.map(lambda s, p: s - p, new_slow, params)
            return out, new_slow

        def no_sync(_):
            return fast_updates, state.slow

        out, slow = jax.lax.cond(sync, on_sync, no_sync, None)
        return out, _LookaheadState(inner_state, slow, count)

    return optax.GradientTransformation(init, update)


def warmup_linear_schedule(base_lr: float, warmup_steps: int,
                           total_steps: int) -> Callable:
    """Pretraining LR: linear warm-up then linear decay
    (pretrain_src/optim/sched.py:15-30)."""

    def schedule(count):
        c = jnp.asarray(count, jnp.float32)
        warm = base_lr * c / max(warmup_steps, 1)
        decay = base_lr * jnp.maximum(
            0.0, (total_steps - c) / max(1, total_steps - warmup_steps))
        return jnp.where(c < warmup_steps, warm, decay)

    return schedule


def pretrain_optimizer(base_lr: float, warmup_steps: int, total_steps: int,
                       weight_decay: float = 0.01,
                       max_grad_norm: float = 5.0) -> optax.GradientTransformation:
    """AdamW with no-decay split for bias/LayerNorm params
    (pretrain_src/optim/misc.py:12-37) and warmup-linear schedule."""
    sched = warmup_linear_schedule(base_lr, warmup_steps, total_steps)

    def decay_mask(params):
        def is_decay(path):
            last = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
            return last not in ("bias", "scale")  # flax LN weight is 'scale'
        return jax.tree_util.tree_map_with_path(
            lambda p, _: is_decay(p), params)

    return optax.chain(
        optax.clip_by_global_norm(max_grad_norm),
        optax.scale_by_adam(b1=0.9, b2=0.98, eps=1e-6),
        optax.masked(optax.add_decayed_weights(weight_decay), decay_mask),
        optax.scale_by_schedule(lambda c: -sched(c)),
    )
