"""Contrastive alignment losses vs direct per-item reference computation."""

import jax.numpy as jnp
import numpy as np
import pytest

from vln_imagine_tpu.models.hamt import contrastive_alignment_loss


def _case(B=3, I=2, H=8, seed=0):
    rng = np.random.default_rng(seed)
    proj = rng.standard_normal((B, I, H)).astype(np.float32)
    mean_np = rng.standard_normal((B, I, H)).astype(np.float32)
    valid = rng.random((B, I)) < 0.7
    valid[0, 0] = True  # at least one valid
    return proj, mean_np, valid


def _unit(x):
    return x / np.maximum(np.linalg.norm(x, axis=-1, keepdims=True), 1e-8)


def test_cosine_matches_loop():
    proj, mean_np, valid = _case()
    got = float(contrastive_alignment_loss(
        jnp.asarray(proj), jnp.asarray(mean_np), jnp.asarray(valid),
        "cosine"))
    pn, mn = _unit(proj), _unit(mean_np)
    losses = [1.0 - float(pn[b, i] @ mn[b, i])
              for b in range(3) for i in range(2) if valid[b, i]]
    assert abs(got - np.mean(losses)) < 1e-6


def test_infonce_matches_loop():
    proj, mean_np, valid = _case(seed=1)
    temp = 0.3
    got = float(contrastive_alignment_loss(
        jnp.asarray(proj), jnp.asarray(mean_np), jnp.asarray(valid),
        "infonce", temperature=temp))
    pn, mn = _unit(proj), _unit(mean_np)
    losses = []
    B, I = valid.shape
    for b in range(B):
        negs = [mn[c, j] for c in range(B) if c != b
                for j in range(I) if valid[c, j]]
        for i in range(I):
            if not valid[b, i]:
                continue
            sims = [float(pn[b, i] @ mn[b, i])] + \
                [float(pn[b, i] @ ng) for ng in negs]
            logits = np.asarray(sims) / temp
            ce = -(logits[0] - (np.log(np.sum(np.exp(logits - logits.max())))
                                + logits.max()))
            losses.append(ce)
    assert abs(got - np.mean(losses)) < 1e-5


def test_margin_matches_loop():
    proj, mean_np, valid = _case(seed=2)
    margin = 0.5
    got = float(contrastive_alignment_loss(
        jnp.asarray(proj), jnp.asarray(mean_np), jnp.asarray(valid),
        "margin", margin=margin))
    pn, mn = _unit(proj), _unit(mean_np)
    losses = []
    B, I = valid.shape
    for b in range(B):
        negs = [mn[c, j] for c in range(B) if c != b
                for j in range(I) if valid[c, j]]
        for i in range(I):
            if not valid[b, i]:
                continue
            pos = float(pn[b, i] @ mn[b, i])
            hinges = [max(margin + float(pn[b, i] @ ng) - pos, 0.0)
                      for ng in negs]
            losses.append((1.0 - pos) +
                          (np.mean(hinges) if hinges else 0.0))
    assert abs(got - np.mean(losses)) < 1e-6


def test_no_valid_rows_zero_loss():
    proj, mean_np, _ = _case()
    valid = np.zeros((3, 2), bool)
    for kind in ("cosine", "infonce", "margin"):
        v = float(contrastive_alignment_loss(
            jnp.asarray(proj), jnp.asarray(mean_np), jnp.asarray(valid),
            kind))
        assert v == 0.0, kind
