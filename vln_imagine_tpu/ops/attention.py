"""Pallas TPU fused multi-head attention.

VLN sequences are short — instruction <=250 tokens (+<=20 imagination), <=51
observation tokens, <=16 history tokens, <=65 map nodes — so ALL heads of one
batch item fit in VMEM at once.  The kernel fuses QK^T -> bias add -> softmax
-> PV for a whole [H, Lq, Lk] score block per grid cell (grid = batch), which
measured faster than both a per-(batch, head) grid (8x fewer grid dispatches)
and the unfused XLA path at reference shapes (B8 H12 Lq80 Lk52 D64 bf16:
306us vs 326us XLA on v5e).

A custom VJP runs the standard attention backward as a second fused kernel.
`fused_attention` falls back to pure jnp on non-TPU backends and for shapes
the kernel does not support.  MHAttention in models/bert.py routes here
whenever ModelConfig.use_pallas_attention is set (the default): eval calls
use the plain kernels, dropout-active training calls use the dropout
kernels, which draw the attention-probs mask from the TPU per-core PRNG and
regenerate it in the backward kernel.

Replaces (functionally) BertSelfAttention / BertOutAttention matmul chains,
VLN-HAMT/finetune_src/models/vilmodel_cmt.py:100-134,326-353.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# batch-dim'd dot_general helpers: operands [H, L, D]
_QK = (((2,), (2,)), ((0,), (0,)))   # q[h,lq,d] x k[h,lk,d] -> [h,lq,lk]
_PV = (((2,), (1,)), ((0,), (0,)))   # p[h,lq,lk] x v[h,lk,d] -> [h,lq,d]
_SK = (((2,), (1,)), ((0,), (0,)))   # ds[h,lq,lk] x k[h,lk,d] -> [h,lq,d]
_ST = (((1,), (1,)), ((0,), (0,)))   # ds[h,lq,lk]^T-contract -> [h,lk,*]


def _supported(q, k, bias):
    if jax.default_backend() != "tpu":
        return False
    _, H, Lq, D = q.shape
    Lk = k.shape[2]
    # f32 score block per cell must fit VMEM alongside q/k/v tiles
    return D in (32, 64, 128) and H * Lq * Lk * 4 <= 6 * 2 ** 20


def _softmax_probs(q, k, bias, scale):
    s = jax.lax.dot_general(q, k, _QK,
                            preferred_element_type=jnp.float32) * scale
    s = s + bias.astype(jnp.float32)       # [1|H, Lq, Lk] broadcasts over H
    s = s - jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s)
    return e / jnp.sum(e, axis=-1, keepdims=True)


def _fwd_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, scale):
    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0]
    p = _softmax_probs(q, k, bias_ref[0], scale)
    o_ref[0] = jax.lax.dot_general(
        p.astype(v.dtype), v, _PV,
        preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, bias_ref, do_ref,
                dq_ref, dk_ref, dv_ref, *, scale):
    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)
    p = _softmax_probs(q, k, bias_ref[0], scale)

    dp = jax.lax.dot_general(do, v, _QK, preferred_element_type=jnp.float32)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq_ref[0] = (jax.lax.dot_general(
        ds, k, _SK, preferred_element_type=jnp.float32) * scale
    ).astype(dq_ref.dtype)
    dk_ref[0] = (jax.lax.dot_general(
        ds, q, _ST, preferred_element_type=jnp.float32) * scale
    ).astype(dk_ref.dtype)
    dv_ref[0] = jax.lax.dot_general(
        p, do, _ST, preferred_element_type=jnp.float32).astype(dv_ref.dtype)


# ---------------------------------------------------------------------------
# In-kernel attention-probs dropout.  The reference drops attention probs
# after softmax (BertSelfAttention, vilmodel_cmt.py:118-123); fusing the mask
# into the kernel keeps the *training* attention on the fused path instead of
# falling back to unfused XLA whenever dropout is active.  The backward kernel
# regenerates the identical mask from the same seed (per-core PRNG is
# deterministic given prng_seed), so no [H, Lq, Lk] mask ever round-trips
# through HBM.
# ---------------------------------------------------------------------------


def _prng_mask_bits(shape):
    return pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)


def _hash_mask_bits(shape):
    """Deterministic position-hash bits: CPU-interpretable stand-in for the
    TPU PRNG so interpreter-mode tests exercise the same kernel math."""
    x = jnp.zeros(shape, jnp.uint32)
    for axis, mult in zip(range(len(shape)), (2654435761, 40503, 69069)):
        x = x ^ (jax.lax.broadcasted_iota(jnp.uint32, shape, axis)
                 * jnp.uint32(mult))
    x = (x ^ (x >> 15)) * jnp.uint32(0x2C1B3C6D)
    x = (x ^ (x >> 12)) * jnp.uint32(0x297A2D39)
    return x ^ (x >> 15)


def _dropout_mask(shape, rate, bits_fn):
    keep = bits_fn(shape) >= jnp.uint32(round(rate * (2 ** 32)))
    return keep.astype(jnp.float32) / (1.0 - rate)


def _fwd_dropout_kernel(seed_ref, q_ref, k_ref, v_ref, bias_ref, o_ref, *,
                        scale, rate, bits_fn):
    if bits_fn is _prng_mask_bits:
        pltpu.prng_seed(seed_ref[0], pl.program_id(0))
    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0]
    p = _softmax_probs(q, k, bias_ref[0], scale)
    p = p * _dropout_mask(p.shape, rate, bits_fn)
    o_ref[0] = jax.lax.dot_general(
        p.astype(v.dtype), v, _PV,
        preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _bwd_dropout_kernel(seed_ref, q_ref, k_ref, v_ref, bias_ref, do_ref,
                        dq_ref, dk_ref, dv_ref, *, scale, rate, bits_fn):
    if bits_fn is _prng_mask_bits:
        pltpu.prng_seed(seed_ref[0], pl.program_id(0))
    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)
    p = _softmax_probs(q, k, bias_ref[0], scale)
    m = _dropout_mask(p.shape, rate, bits_fn)  # same bits as forward

    dp = jax.lax.dot_general(do, v, _QK, preferred_element_type=jnp.float32)
    dp = dp * m                         # grad through probs-dropout
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq_ref[0] = (jax.lax.dot_general(
        ds, k, _SK, preferred_element_type=jnp.float32) * scale
    ).astype(dq_ref.dtype)
    dk_ref[0] = (jax.lax.dot_general(
        ds, q, _ST, preferred_element_type=jnp.float32) * scale
    ).astype(dk_ref.dtype)
    dv_ref[0] = jax.lax.dot_general(
        p * m, do, _ST, preferred_element_type=jnp.float32).astype(dv_ref.dtype)


def _seed_spec():
    return pl.BlockSpec(memory_space=pltpu.SMEM)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _pallas_attention_dropout(q, k, v, bias, seed, scale, rate):
    return _pallas_attention_dropout_fwd(q, k, v, bias, seed, scale, rate)[0]


def _pallas_attention_dropout_fwd(q, k, v, bias, seed, scale, rate,
                                  bits_fn=_prng_mask_bits, interpret=False):
    B, H, Lq, D = q.shape
    Lk = k.shape[2]
    out = pl.pallas_call(
        functools.partial(_fwd_dropout_kernel, scale=scale, rate=rate,
                          bits_fn=bits_fn),
        out_shape=jax.ShapeDtypeStruct((B, H, Lq, D), q.dtype),
        grid=(B,),
        in_specs=[_seed_spec()] + _specs(H, Lq, Lk, D, bias.shape[1]),
        out_specs=pl.BlockSpec((1, H, Lq, D), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(seed, q, k, v, bias)
    return out, (q, k, v, bias, seed)


def _pallas_attention_dropout_bwd(scale, rate, res, g,
                                  bits_fn=_prng_mask_bits, interpret=False):
    q, k, v, bias, seed = res
    B, H, Lq, D = q.shape
    Lk = k.shape[2]
    in_specs = [_seed_spec()] + _specs(H, Lq, Lk, D, bias.shape[1])
    in_specs.append(pl.BlockSpec((1, H, Lq, D), lambda i: (i, 0, 0, 0),
                                 memory_space=pltpu.VMEM))
    spec_q = pl.BlockSpec((1, H, Lq, D), lambda i: (i, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    spec_k = pl.BlockSpec((1, H, Lk, D), lambda i: (i, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_dropout_kernel, scale=scale, rate=rate,
                          bits_fn=bits_fn),
        out_shape=(
            jax.ShapeDtypeStruct((B, H, Lq, D), q.dtype),
            jax.ShapeDtypeStruct((B, H, Lk, D), k.dtype),
            jax.ShapeDtypeStruct((B, H, Lk, D), v.dtype),
        ),
        grid=(B,),
        in_specs=in_specs,
        out_specs=(spec_q, spec_k, spec_k),
        interpret=interpret,
    )(seed, q, k, v, bias, g)
    return dq, dk, dv, None, None


_pallas_attention_dropout.defvjp(
    lambda q, k, v, b, s, sc, r: _pallas_attention_dropout_fwd(
        q, k, v, b, s, sc, r),
    _pallas_attention_dropout_bwd)


def _specs(H, Lq, Lk, D, bias_heads):
    def m(i):
        return (i, 0, 0, 0)

    return [
        pl.BlockSpec((1, H, Lq, D), m, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, H, Lk, D), m, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, H, Lk, D), m, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bias_heads, Lq, Lk), m, memory_space=pltpu.VMEM),
    ]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _pallas_attention(q, k, v, bias, scale):
    return _pallas_attention_fwd(q, k, v, bias, scale)[0]


def _pallas_attention_fwd(q, k, v, bias, scale):
    B, H, Lq, D = q.shape
    Lk = k.shape[2]
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct((B, H, Lq, D), q.dtype),
        grid=(B,),
        in_specs=_specs(H, Lq, Lk, D, bias.shape[1]),
        out_specs=pl.BlockSpec((1, H, Lq, D), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
    )(q, k, v, bias)
    return out, (q, k, v, bias)


def _pallas_attention_bwd(scale, res, g):
    q, k, v, bias = res
    B, H, Lq, D = q.shape
    Lk = k.shape[2]
    in_specs = _specs(H, Lq, Lk, D, bias.shape[1])
    in_specs.append(pl.BlockSpec((1, H, Lq, D), lambda i: (i, 0, 0, 0),
                                 memory_space=pltpu.VMEM))
    spec_q = pl.BlockSpec((1, H, Lq, D), lambda i: (i, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    spec_k = pl.BlockSpec((1, H, Lk, D), lambda i: (i, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale),
        out_shape=(
            jax.ShapeDtypeStruct((B, H, Lq, D), q.dtype),
            jax.ShapeDtypeStruct((B, H, Lk, D), k.dtype),
            jax.ShapeDtypeStruct((B, H, Lk, D), v.dtype),
        ),
        grid=(B,),
        in_specs=in_specs,
        out_specs=(spec_q, spec_k, spec_k),
    )(q, k, v, bias, g)
    return dq, dk, dv, None


_pallas_attention.defvjp(
    lambda q, k, v, b, s: _pallas_attention_fwd(q, k, v, b, s),
    _pallas_attention_bwd)


def reference_attention(q, k, v, bias, scale):
    """Unfused jnp attention — fallback path and parity oracle."""
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                   preferred_element_type=jnp.float32) * scale
    if bias is not None:
        s = s + bias.astype(jnp.float32)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


def fused_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    bias: jnp.ndarray | None, scale: float,
                    dropout_rate: float = 0.0,
                    dropout_rng: jax.Array | None = None) -> jnp.ndarray:
    """[B, H, Lq, D] x [B, H, Lk, D] -> [B, H, Lq, D].

    bias: additive [B, 1|H, Lq, Lk] (the reference's -10000 padding masks
    and/or sprel biases), broadcast over heads when the second dim is 1.

    dropout_rate > 0 (training) applies attention-probs dropout *inside* the
    kernel from the TPU per-core PRNG seeded by `dropout_rng`; the mask is
    regenerated in the backward kernel rather than stored.  The mask stream
    differs from jax.random's — equivalent as a regularizer, not bitwise."""
    B, H, Lq, _ = q.shape
    Lk = k.shape[2]
    if bias is None:
        bias_b = jnp.zeros((B, 1, Lq, Lk), jnp.float32)
    else:
        bias_b = jnp.broadcast_to(bias, (B, bias.shape[1], Lq, Lk))
    if _supported(q, k, bias_b):
        if dropout_rate > 0.0 and dropout_rng is not None:
            seed = jax.random.bits(
                dropout_rng, (1,), jnp.uint32).astype(jnp.int32)
            return _pallas_attention_dropout(q, k, v, bias_b, seed, scale,
                                             float(dropout_rate))
        return _pallas_attention(q, k, v, bias_b, scale)
    out, _ = _unfused_dropout_attention(q, k, v, bias, scale, dropout_rate,
                                        dropout_rng)
    return out


def _unfused_dropout_attention(q, k, v, bias, scale, rate, rng):
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                   preferred_element_type=jnp.float32) * scale
    if bias is not None:
        s = s + bias.astype(jnp.float32)
    p = jax.nn.softmax(s, axis=-1)
    if rate > 0.0 and rng is not None:
        keep = jax.random.bernoulli(rng, 1.0 - rate, p.shape)
        p = p * keep / (1.0 - rate)
    out = jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v,
                     preferred_element_type=jnp.float32).astype(q.dtype)
    return out, p
