"""Pallas fused attention: exact parity against the unfused oracle in
interpreter mode (CPU), plus vjp correctness via the fallback path."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from vln_imagine_tpu.ops import attention as A


def _interp_forward(q, k, v, bias, scale):
    B, H, Lq, D = q.shape
    Lk = k.shape[2]
    return pl.pallas_call(
        functools.partial(A._fwd_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct((B, H, Lq, D), q.dtype),
        grid=(B,),
        in_specs=A._specs(H, Lq, Lk, D, bias.shape[1]),
        out_specs=pl.BlockSpec((1, H, Lq, D), lambda i: (i, 0, 0, 0)),
        interpret=True,
    )(q, k, v, bias)


def _case(B=2, H=3, Lq=10, Lk=7, D=32, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((B, H, Lq, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, H, Lk, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, H, Lk, D)), jnp.float32)
    mask = rng.random((B, 1, 1, Lk)) < 0.75
    bias = jnp.asarray(
        np.where(mask, 0.0, -10000.0) * np.ones((B, 1, Lq, Lk)), jnp.float32)
    return q, k, v, bias


def test_kernel_matches_oracle_interpret():
    q, k, v, bias = _case()
    scale = 1.0 / np.sqrt(q.shape[-1])
    got = _interp_forward(q, k, v, bias, scale)
    want = A.reference_attention(q, k, v, bias, scale)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_kernel_per_head_bias_interpret():
    q, k, v, _ = _case()
    B, H, Lq, _ = q.shape
    Lk = k.shape[2]
    rng = np.random.default_rng(3)
    bias = jnp.asarray(rng.standard_normal((B, H, Lq, Lk)), jnp.float32)
    scale = 0.125
    got = _interp_forward(q, k, v, bias, scale)
    want = A.reference_attention(q, k, v, bias, scale)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_bwd_kernel_matches_autodiff_interpret():
    q, k, v, bias = _case(B=1, H=2, Lq=6, Lk=5, D=32)
    scale = 1.0 / np.sqrt(q.shape[-1])
    g = jnp.ones((1, 2, 6, 32), jnp.float32) * 0.3

    def interp_bwd(q, k, v, bias, g):
        B, H, Lq, D = q.shape
        Lk = k.shape[2]
        in_specs = A._specs(H, Lq, Lk, D, bias.shape[1])
        in_specs.append(pl.BlockSpec((1, H, Lq, D), lambda i: (i, 0, 0, 0)))
        return pl.pallas_call(
            functools.partial(A._bwd_kernel, scale=scale),
            out_shape=(jax.ShapeDtypeStruct((B, H, Lq, D), q.dtype),
                       jax.ShapeDtypeStruct((B, H, Lk, D), k.dtype),
                       jax.ShapeDtypeStruct((B, H, Lk, D), v.dtype)),
            grid=(B,),
            in_specs=in_specs,
            out_specs=(pl.BlockSpec((1, H, Lq, D), lambda i: (i, 0, 0, 0)),
                       pl.BlockSpec((1, H, Lk, D), lambda i: (i, 0, 0, 0)),
                       pl.BlockSpec((1, H, Lk, D), lambda i: (i, 0, 0, 0))),
            interpret=True,
        )(q, k, v, bias, g)

    got = interp_bwd(q, k, v, bias, g)
    want = jax.vjp(
        lambda q, k, v: A.reference_attention(q, k, v, bias, scale),
        q, k, v)[1](g)
    for a, b, n in zip(got, want, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5, err_msg=f"d{n}")


def test_fused_attention_falls_back_on_cpu():
    q, k, v, bias = _case()
    out = A.fused_attention(q, k, v, bias, 0.125)
    want = A.reference_attention(q, k, v, bias, 0.125)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), rtol=1e-6)


# --------------------------------------------------------------- dropout path
# The TPU PRNG does not lower in CPU interpreter mode, so these run the
# dropout kernels with the deterministic position-hash bits source
# (A._hash_mask_bits) — identical kernel math, including the backward pass
# regenerating the mask instead of loading it.

def _dropout_oracle(q, k, v, bias, scale, rate):
    """Per-batch-cell unfused attention with the same hash mask."""
    outs = []
    for b in range(q.shape[0]):
        s = jnp.einsum("hqd,hkd->hqk", q[b].astype(jnp.float32),
                       k[b].astype(jnp.float32)) * scale
        s = s + bias[b].astype(jnp.float32)
        p = jax.nn.softmax(s, axis=-1)
        p = p * A._dropout_mask(p.shape, rate, A._hash_mask_bits)
        outs.append(jnp.einsum("hqk,hkd->hqd", p, v[b].astype(jnp.float32)))
    return jnp.stack(outs).astype(q.dtype)


def test_dropout_kernel_forward_matches_oracle_interpret():
    q, k, v, bias = _case()
    bias = jnp.broadcast_to(bias, (q.shape[0], 1, q.shape[2], k.shape[2]))
    scale, rate = 1.0 / np.sqrt(q.shape[-1]), 0.25
    seed = jnp.asarray([7], jnp.int32)
    got, _ = A._pallas_attention_dropout_fwd(
        q, k, v, bias, seed, scale, rate,
        bits_fn=A._hash_mask_bits, interpret=True)
    want = _dropout_oracle(q, k, v, bias, scale, rate)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_dropout_kernel_zero_rate_matches_plain_kernel_interpret():
    q, k, v, bias = _case(seed=5)
    bias = jnp.broadcast_to(bias, (q.shape[0], 1, q.shape[2], k.shape[2]))
    scale = 0.125
    seed = jnp.asarray([3], jnp.int32)
    got, _ = A._pallas_attention_dropout_fwd(
        q, k, v, bias, seed, scale, 0.0,
        bits_fn=A._hash_mask_bits, interpret=True)
    want = _interp_forward(q, k, v, bias, scale)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


def test_dropout_kernel_backward_matches_autodiff_interpret():
    q, k, v, bias = _case(B=2, H=2, Lq=6, Lk=5, D=32, seed=9)
    bias = jnp.broadcast_to(bias, (q.shape[0], 2, q.shape[2], k.shape[2]))
    scale, rate = 1.0 / np.sqrt(q.shape[-1]), 0.25
    seed = jnp.asarray([11], jnp.int32)
    rng = np.random.default_rng(2)
    g = jnp.asarray(rng.standard_normal(q.shape), jnp.float32)

    res = (q, k, v, bias, seed)
    dq, dk, dv, _, _ = A._pallas_attention_dropout_bwd(
        scale, rate, res, g, bits_fn=A._hash_mask_bits, interpret=True)
    want = jax.vjp(
        lambda q, k, v: _dropout_oracle(q, k, v, bias, scale, rate),
        q, k, v)[1](g)
    for a, b, n in zip((dq, dk, dv), want, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5, err_msg=f"d{n}")


def test_hash_mask_keep_rate():
    m = np.asarray(A._dropout_mask((8, 32, 128), 0.3, A._hash_mask_bits))
    keep = (m > 0).mean()
    assert abs(keep - 0.7) < 0.02
    np.testing.assert_allclose(m[m > 0], 1.0 / 0.7, rtol=1e-6)


# ---------------------------------------------------------------- path gate
# MHAttention routes per call (models/bert.py): deterministic (eval) calls
# always take the transpose-free packed-QKV XLA path (measured faster at
# every batch size once QKV was packed); the pallas kernel serves
# dropout-active training calls below the batch cutoff, where in-kernel
# probs dropout keeps attention fused.

def test_attention_path_gate(monkeypatch):
    import dataclasses

    from vln_imagine_tpu.config import ModelConfig
    from vln_imagine_tpu.models.bert import MHAttention
    from vln_imagine_tpu.ops import attention as ops_attention

    cfg = ModelConfig(hidden_size=32, num_attention_heads=4,
                      intermediate_size=64, compute_dtype="float32",
                      attention_probs_dropout_prob=0.1,
                      use_pallas_attention=True,
                      pallas_attention_batch_cutoff=4)
    calls = []
    real = ops_attention.fused_attention

    def spy(*args, **kwargs):
        calls.append(args[0].shape[0])
        return real(*args, **kwargs)

    monkeypatch.setattr(ops_attention, "fused_attention", spy)
    rng = np.random.default_rng(0)
    x_small = jnp.asarray(rng.standard_normal((2, 6, 32)), jnp.float32)
    x_large = jnp.asarray(rng.standard_normal((4, 6, 32)), jnp.float32)

    def run(cfg, x, train=False):
        mod = MHAttention(cfg)
        params = mod.init(jax.random.PRNGKey(0), x, x)
        if train:
            return mod.apply(params, x, x, None, False,
                             rngs={"dropout": jax.random.PRNGKey(1)})
        return mod.apply(params, x, x)

    run(cfg, x_small)
    assert calls == [], "deterministic calls must take the XLA path"
    run(cfg, x_small, train=True)
    assert calls == [2], "dropout-active below the cutoff must take pallas"
    calls.clear()
    run(cfg, x_large, train=True)
    assert calls == [], "dropout-active at/above the cutoff must take XLA"
    # the gated eval program IS the pallas-off program, bit for bit
    out_gated = run(cfg, x_large)
    out_off = run(dataclasses.replace(cfg, use_pallas_attention=False),
                  x_large)
    np.testing.assert_array_equal(np.asarray(out_gated), np.asarray(out_off))
