"""Mask utilities.

The reference encodes padding with additive masks ``(1 - m) * -10000`` applied
before softmax (VLN-HAMT/finetune_src/models/vilmodel_cmt.py:1010-1012,
VLN-DUET/map_nav_src/models/ops.py:25-33) and fills invalid action logits with
``-inf`` (vilmodel_cmt.py:1200).  We keep the exact -10000 constant for
checkpoint-parity of attention outputs.
"""

from __future__ import annotations

import jax.numpy as jnp

NEG_INF_MASK = -10000.0
LOGIT_NEG_INF = -1e9  # stand-in for -inf in masked logits; safe under softmax/CE


def length_to_mask(lengths: jnp.ndarray, size: int) -> jnp.ndarray:
    """[B] lengths -> [B, size] bool validity mask (True = valid).

    Equivalent to ``length2mask(...).logical_not()`` in the reference
    (VLN-HAMT/finetune_src/utils/misc.py:9-15, inverted sense).
    """
    pos = jnp.arange(size, dtype=lengths.dtype)
    return pos[None, :] < lengths[:, None]


def extend_neg_mask(mask: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """[B, L] bool/int mask -> [B, 1, 1, L] additive mask (0 valid, -10000 pad).

    Matches extend_neg_masks (VLN-DUET/map_nav_src/models/ops.py:25-33)."""
    m = mask.astype(dtype)
    return (1.0 - m[:, None, None, :]) * NEG_INF_MASK


def masked_softmax(logits: jnp.ndarray, mask: jnp.ndarray, axis: int = -1):
    """Softmax over valid entries; invalid entries get probability 0."""
    x = jnp.where(mask, logits, LOGIT_NEG_INF).astype(jnp.float32)
    x = x - jnp.max(x, axis=axis, keepdims=True)
    e = jnp.exp(x) * mask.astype(jnp.float32)
    return e / jnp.maximum(jnp.sum(e, axis=axis, keepdims=True), 1e-20)


def mask_logits(logits: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """Fill invalid entries with a large negative value
    (reference: ``masked_fill_(-inf)``, vilmodel_cmt.py:1200)."""
    return jnp.where(valid, logits, jnp.asarray(LOGIT_NEG_INF, logits.dtype))
