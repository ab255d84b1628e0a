"""BERT / LXMERT transformer blocks in flax.linen, numerically matching the
reference's from-scratch torch blocks (VLN-HAMT/finetune_src/models/
vilmodel_cmt.py:44-520 and VLN-DUET/map_nav_src/models/vilmodel.py:44-453):

- exact erf GELU (vilmodel_cmt.py:27-33)
- LayerNorm eps 1e-12, post-LN residual blocks
- additive attention masks, 0 for valid / -10000 for padding
- optional additive attention bias (DUET graph_sprels, vilmodel.py:392-394)

Module/param names mirror the torch module tree so checkpoint conversion is a
mechanical key rename + transpose (see vln_imagine_tpu/ckpt/convert.py).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from vln_imagine_tpu.config import ModelConfig


def gelu_erf(x: jnp.ndarray) -> jnp.ndarray:
    """x * 0.5 * (1 + erf(x / sqrt(2))) — the reference's gelu
    (vilmodel_cmt.py:27-33), NOT the tanh approximation."""
    return jax.nn.gelu(x, approximate=False)


ACT2FN = {
    "gelu": gelu_erf,
    "gelu_erf": gelu_erf,
    "relu": jax.nn.relu,
    "swish": jax.nn.swish,
}


def _dtype(cfg: ModelConfig):
    return jnp.dtype(cfg.compute_dtype)


class LayerNorm12(nn.Module):
    """LayerNorm with eps 1e-12, computed in float32."""

    @nn.compact
    def __call__(self, x):
        out = nn.LayerNorm(epsilon=1e-12, dtype=jnp.float32, name="ln")(x)
        return out.astype(x.dtype)


def attention_core(q, k, v, bias, dropout_rate, deterministic, rng, head_dim):
    """Multi-head attention given [B, H, L, D] q/k/v and [B, 1|H, Lq, Lk]
    additive bias. Softmax and score accumulation in f32."""
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32)
    scores = scores / jnp.sqrt(jnp.asarray(head_dim, jnp.float32))
    if bias is not None:
        scores = scores + bias.astype(jnp.float32)
    probs = jax.nn.softmax(scores, axis=-1)
    if dropout_rate > 0.0 and not deterministic:
        keep = jax.random.bernoulli(rng, 1.0 - dropout_rate, probs.shape)
        probs = probs * keep / (1.0 - dropout_rate)
    ctx = jnp.einsum("bhqk,bhkd->bhqd", probs.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    return ctx.astype(v.dtype), probs


def attention_core_blhd(q, k, v, bias, dropout_rate, deterministic, rng,
                        head_dim):
    """attention_core on [B, L, H, D] q/k/v — no explicit head transposes.

    In the per-step rollout programs the [B,L,H,D] -> [B,H,L,D] relayout
    copies around every attention op dominated device time (~30% of the eval
    program at batch 128); expressing the contractions directly on the
    projection layout lets XLA fold the relayout into the matmuls."""
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32)
    scores = scores / jnp.sqrt(jnp.asarray(head_dim, jnp.float32))
    if bias is not None:
        scores = scores + bias.astype(jnp.float32)
    probs = jax.nn.softmax(scores, axis=-1)
    if dropout_rate > 0.0 and not deterministic:
        keep = jax.random.bernoulli(rng, 1.0 - dropout_rate, probs.shape)
        probs = probs * keep / (1.0 - dropout_rate)
    ctx = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    return ctx.astype(v.dtype), probs


class DenseParams(nn.Module):
    """Parameter-only stand-in for nn.Dense: declares the same
    {kernel, bias} leaves under the module name (checkpoint-compatible) but
    hands the arrays back so the caller can pack several projections into
    one wide matmul."""

    features: int

    @nn.compact
    def __call__(self, in_features: int):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (in_features, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return kernel, bias


class MHAttention(nn.Module):
    """Q/K/V projection + attention. ctx (key/value source) may differ from the
    query stream (BertOutAttention, vilmodel_cmt.py:302-353).

    The three projections are packed into one (self-attention) or two
    (cross-attention) wide matmuls: the kernel concat is loop-invariant, so
    XLA hoists it out of the episode scan and each step runs 1-2 large
    matmuls instead of 3 narrow ones.  Per-column-block results are
    identical to separate Dense calls."""

    config: ModelConfig

    @nn.compact
    def __call__(self, hidden, context, bias=None, deterministic=True):
        cfg = self.config
        h, d = cfg.num_attention_heads, cfg.head_dim
        dt = _dtype(cfg)
        wq, bq = DenseParams(cfg.hidden_size, name="query")(hidden.shape[-1])
        wk, bk = DenseParams(cfg.hidden_size, name="key")(context.shape[-1])
        wv, bv = DenseParams(cfg.hidden_size, name="value")(context.shape[-1])
        if hidden is context:
            w = jnp.concatenate([wq, wk, wv], axis=1).astype(dt)
            b = jnp.concatenate([bq, bk, bv]).astype(dt)
            qkv = hidden.astype(dt) @ w + b
            q, k, v = jnp.split(qkv, 3, axis=-1)
        else:
            q = hidden.astype(dt) @ wq.astype(dt) + bq.astype(dt)
            wkv = jnp.concatenate([wk, wv], axis=1).astype(dt)
            bkv = jnp.concatenate([bk, bv]).astype(dt)
            kv = context.astype(dt) @ wkv + bkv
            k, v = jnp.split(kv, 2, axis=-1)

        def heads(x):
            b_, l, _ = x.shape
            return x.reshape(b_, l, h, d)

        drop_active = cfg.attention_probs_dropout_prob > 0.0 and not deterministic
        rng = self.make_rng("dropout") if drop_active else None
        # Path choice, measured full-rollout on v5e at reference scale (see
        # README Performance): with the QKV projections packed into one
        # matmul, the transpose-free XLA path wins every deterministic
        # (eval) call at every batch size, so the pallas kernel is reserved
        # for dropout-active (training) calls — there the in-kernel probs
        # dropout keeps attention fused where the XLA path materializes the
        # probs for the dropout mask.  Above the batch cutoff the
        # [B,L,h,d]->[B,h,L,d] relayout transposes around the kernel cost
        # more than that fusion saves (shapes are static under jit, so both
        # conditions are trace-time branches).
        if (cfg.use_pallas_attention and drop_active
                and hidden.shape[0] < cfg.pallas_attention_batch_cutoff):
            # dropout-active calls stay fused: the kernel draws the probs-
            # dropout mask from the TPU per-core PRNG (ops/attention.py)
            from vln_imagine_tpu.ops.attention import fused_attention
            bhld = lambda x: heads(x).transpose(0, 2, 1, 3)  # noqa: E731
            ctx = fused_attention(
                bhld(q), bhld(k), bhld(v), bias, 1.0 / (d ** 0.5),
                dropout_rate=(cfg.attention_probs_dropout_prob
                              if drop_active else 0.0),
                dropout_rng=rng)
            b_, _, lq, _ = ctx.shape
            return ctx.transpose(0, 2, 1, 3).reshape(b_, lq, cfg.hidden_size)
        ctx, _ = attention_core_blhd(
            heads(q), heads(k), heads(v), bias,
            cfg.attention_probs_dropout_prob, deterministic, rng, d)
        b_, lq = ctx.shape[:2]
        return ctx.reshape(b_, lq, cfg.hidden_size)


class SelfOutput(nn.Module):
    """dense -> dropout -> LN(x + residual) (BertSelfOutput, :137-148)."""

    config: ModelConfig

    @nn.compact
    def __call__(self, hidden, residual, deterministic=True):
        cfg = self.config
        hidden = nn.Dense(cfg.hidden_size, dtype=_dtype(cfg), name="dense")(hidden)
        hidden = nn.Dropout(cfg.hidden_dropout_prob, deterministic=deterministic)(hidden)
        return LayerNorm12(name="LayerNorm")(hidden + residual)


class BertAttention(nn.Module):
    """Self-attention block (BertAttention, :151-161)."""

    config: ModelConfig

    @nn.compact
    def __call__(self, x, mask, bias=None, deterministic=True):
        full_bias = mask if bias is None else (mask + bias if mask is not None else bias)
        ctx = MHAttention(self.config, name="self")(
            x, x, full_bias, deterministic=deterministic)
        return SelfOutput(self.config, name="output")(ctx, x, deterministic)


class BertXAttention(nn.Module):
    """Cross-attention block (BertXAttention, :355-364)."""

    config: ModelConfig

    @nn.compact
    def __call__(self, x, ctx, ctx_mask=None, deterministic=True):
        out = MHAttention(self.config, name="att")(x, ctx, ctx_mask, deterministic)
        return SelfOutput(self.config, name="output")(out, x, deterministic)


class BertIntermediate(nn.Module):
    config: ModelConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        x = nn.Dense(cfg.intermediate_size, dtype=_dtype(cfg), name="dense")(x)
        return ACT2FN[cfg.hidden_act](x)


class BertOutput(nn.Module):
    config: ModelConfig

    @nn.compact
    def __call__(self, x, residual, deterministic=True):
        cfg = self.config
        x = nn.Dense(cfg.hidden_size, dtype=_dtype(cfg), name="dense")(x)
        x = nn.Dropout(cfg.hidden_dropout_prob, deterministic=deterministic)(x)
        return LayerNorm12(name="LayerNorm")(x + residual)


class BertLayer(nn.Module):
    """attention -> intermediate -> output (BertLayer, :193-206)."""

    config: ModelConfig

    @nn.compact
    def __call__(self, x, mask, bias=None, deterministic=True):
        attn = BertAttention(self.config, name="attention")(
            x, mask, bias, deterministic)
        inter = BertIntermediate(self.config, name="intermediate")(attn)
        return BertOutput(self.config, name="output")(inter, attn, deterministic)


class BertEncoder(nn.Module):
    """Stack of BertLayer (BertEncoder, :209-239)."""

    config: ModelConfig
    num_layers: int

    @nn.compact
    def __call__(self, x, mask, deterministic=True):
        for i in range(self.num_layers):
            x = BertLayer(self.config, name=f"layer_{i}")(
                x, mask, deterministic=deterministic)
        return x


class BertEmbeddings(nn.Module):
    """word + position + token-type embeddings -> LN -> dropout
    (BertEmbeddings, :44-73)."""

    config: ModelConfig

    def setup(self):
        cfg = self.config
        self.word_embeddings = nn.Embed(
            cfg.vocab_size, cfg.hidden_size, dtype=_dtype(cfg))
        self.position_embeddings = nn.Embed(
            cfg.max_position_embeddings, cfg.hidden_size, dtype=_dtype(cfg))
        self.token_type_embeddings = nn.Embed(
            cfg.type_vocab_size, cfg.hidden_size, dtype=_dtype(cfg))
        self.LayerNorm = LayerNorm12()
        self.dropout = nn.Dropout(cfg.hidden_dropout_prob)

    def __call__(self, input_ids, token_type_ids=None, position_ids=None,
                 deterministic=True):
        _, L = input_ids.shape
        if position_ids is None:
            position_ids = jnp.arange(L)[None, :]
        if token_type_ids is None:
            token_type_ids = jnp.zeros_like(input_ids)
        x = (self.word_embeddings(input_ids)
             + self.position_embeddings(position_ids)
             + self.token_type_embeddings(token_type_ids))
        x = self.LayerNorm(x)
        return self.dropout(x, deterministic=deterministic)

    def token_type_embedding(self, token_type_ids):
        """Standalone lookup used by image embeddings
        (vilmodel_cmt.py:1074-1076)."""
        return self.token_type_embeddings(token_type_ids)


class LXRTXLayer(nn.Module):
    """HAMT bidirectional cross-modal layer (vilmodel_cmt.py:366-445):
    shared cross-attn applied both ways, then per-stream self-attn + FFN.
    Setup-based so the no_lang_ca language branch can be invoked standalone
    (vilmodel_cmt.py:1024-1028)."""

    config: ModelConfig

    def setup(self):
        cfg = self.config
        self.visual_attention = BertXAttention(cfg)
        self.lang_self_att = BertAttention(cfg)
        self.lang_inter = BertIntermediate(cfg)
        self.lang_output = BertOutput(cfg)
        self.visn_self_att = BertAttention(cfg)
        self.visn_inter = BertIntermediate(cfg)
        self.visn_output = BertOutput(cfg)

    def __call__(self, lang, lang_mask, visn, visn_mask, deterministic=True):
        cfg = self.config
        if cfg.no_lang_ca:
            lang_x = lang
        else:
            lang_x = self.visual_attention(lang, visn, visn_mask,
                                           deterministic)
        visn_x = self.visual_attention(visn, lang, lang_mask, deterministic)

        if not cfg.no_lang_ca:
            lang_s = self.lang_self_att(lang_x, lang_mask,
                                        deterministic=deterministic)
        else:
            lang_s = lang_x
        visn_s = self.visn_self_att(visn_x, visn_mask,
                                    deterministic=deterministic)

        if not cfg.no_lang_ca:
            lang_i = self.lang_inter(lang_s)
            lang_o = self.lang_output(lang_i, lang_s, deterministic)
        else:
            lang_o = lang_s
        visn_i = self.visn_inter(visn_s)
        visn_o = self.visn_output(visn_i, visn_s, deterministic)
        return lang_o, visn_o

    def lang_self_att_branch(self, lang, lang_mask, deterministic=True):
        """Standalone language self-att + FFN (used only under no_lang_ca,
        vilmodel_cmt.py:1024-1028)."""
        s = self.lang_self_att(lang, lang_mask, deterministic=deterministic)
        i = self.lang_inter(s)
        return self.lang_output(i, s, deterministic)


class GraphLXRTXLayer(nn.Module):
    """DUET cross-modal layer (vilmodel.py:366-412): visual queries language,
    then graph-sprel-biased self-attention + FFN.  The language-side blocks
    exist only under config.use_lang2visn_attn (vilmodel.py:370-374) — true
    for the pre-training model whose MLM runs the lang2visn direction
    (pretrain config/r2r_model_config.json:32), false for the navigation
    model, whose released checkpoints carry no lang-side keys."""

    config: ModelConfig

    def setup(self):
        cfg = self.config
        self.visual_attention = BertXAttention(cfg)
        self.visn_self_att = BertAttention(cfg)
        self.visn_inter = BertIntermediate(cfg)
        self.visn_output = BertOutput(cfg)
        if cfg.use_lang2visn_attn:
            self.lang_self_att = BertAttention(cfg)
            self.lang_inter = BertIntermediate(cfg)
            self.lang_output = BertOutput(cfg)

    def __call__(self, lang, lang_mask, visn, visn_mask, graph_sprels=None,
                 deterministic=True):
        visn_x = self.visual_attention(visn, lang, lang_mask, deterministic)
        bias = graph_sprels  # [B, 1, L, L] additive, added to the mask (:392-394)
        visn_s = self.visn_self_att(visn_x, visn_mask, bias, deterministic)
        visn_i = self.visn_inter(visn_s)
        return self.visn_output(visn_i, visn_s, deterministic)

    def lang2visn(self, lang, lang_mask, visn, visn_mask, deterministic=True):
        """forward_lang2visn (vilmodel.py:401-412)."""
        lang_x = self.visual_attention(lang, visn, visn_mask, deterministic)
        lang_s = self.lang_self_att(lang_x, lang_mask,
                                    deterministic=deterministic)
        lang_i = self.lang_inter(lang_s)
        return self.lang_output(lang_i, lang_s, deterministic)


class PreNormEncoderLayer(nn.Module):
    """DETR-style pre-norm transformer encoder layer
    (VLN-DUET/map_nav_src/models/transformer.py:135-192, forward_pre with
    gelu activation per ops.py:11-23)."""

    config: ModelConfig

    @nn.compact
    def __call__(self, src, key_padding_mask=None, deterministic=True):
        cfg = self.config
        dt = _dtype(cfg)
        src2 = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm1")(src).astype(dt)
        bias = None
        if key_padding_mask is not None:
            # True = valid; MultiheadAttention masks with -inf on pads.
            bias = jnp.where(key_padding_mask[:, None, None, :], 0.0, -1e9)
        ctx = MHAttention(cfg, name="self_attn")(src2, src2, bias, deterministic)
        # torch nn.MultiheadAttention applies an output projection internally
        ctx = nn.Dense(cfg.hidden_size, dtype=dt, name="out_proj")(ctx)
        src = src + nn.Dropout(cfg.hidden_dropout_prob,
                               deterministic=deterministic)(ctx)
        src2 = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm2")(src).astype(dt)
        ff = nn.Dense(cfg.intermediate_size, dtype=dt, name="linear1")(src2)
        ff = ACT2FN[cfg.hidden_act](ff)
        ff = nn.Dropout(cfg.hidden_dropout_prob, deterministic=deterministic)(ff)
        ff = nn.Dense(cfg.hidden_size, dtype=dt, name="linear2")(ff)
        return src + nn.Dropout(cfg.hidden_dropout_prob,
                                deterministic=deterministic)(ff)


class PreNormEncoder(nn.Module):
    """Stack of pre-norm layers with optional final LayerNorm
    (create_transformer_encoder, ops.py:11-23; norm eps 1e-12)."""

    config: ModelConfig
    num_layers: int
    final_norm: bool = True

    @nn.compact
    def __call__(self, src, key_padding_mask=None, deterministic=True):
        for i in range(self.num_layers):
            src = PreNormEncoderLayer(self.config, name=f"layer_{i}")(
                src, key_padding_mask, deterministic)
        if self.final_norm:
            src = LayerNorm12(name="norm")(src)
        return src


class NextActionPrediction(nn.Module):
    """Linear -> ReLU -> LN -> Dropout -> Linear(1)
    (vilmodel_cmt.py:953-963)."""

    config: ModelConfig

    @nn.compact
    def __call__(self, x, deterministic=True):
        cfg = self.config
        x = nn.Dense(cfg.hidden_size, dtype=_dtype(cfg), name="dense0")(x)
        x = jax.nn.relu(x)
        x = LayerNorm12(name="LayerNorm")(x)
        x = nn.Dropout(cfg.pred_head_dropout_prob,
                       deterministic=deterministic)(x)
        return nn.Dense(1, dtype=_dtype(cfg), name="dense1")(x)


class ClsPrediction(nn.Module):
    """Linear -> ReLU -> LN -> Linear(1) (DUET vilmodel.py:1009-1020)."""

    config: ModelConfig
    input_size: Optional[int] = None

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        x = nn.Dense(cfg.hidden_size, dtype=_dtype(cfg), name="dense0")(x)
        x = jax.nn.relu(x)
        x = LayerNorm12(name="LayerNorm")(x)
        return nn.Dense(1, dtype=_dtype(cfg), name="dense1")(x)


class MLPProjectionHead(nn.Module):
    """768 -> 512 -> 512 -> hidden, bias-free, ReLU, dropout 0.15
    (vilmodel_cmt.py:714-728)."""

    config: ModelConfig
    hidden_dim: int = 512

    @nn.compact
    def __call__(self, x, deterministic=True):
        cfg = self.config
        x = nn.Dropout(0.15, deterministic=deterministic)(x)
        x = jax.nn.relu(nn.Dense(self.hidden_dim, use_bias=False,
                                 dtype=_dtype(cfg), name="fc1")(x))
        x = jax.nn.relu(nn.Dense(self.hidden_dim, use_bias=False,
                                 dtype=_dtype(cfg), name="fc2")(x))
        return nn.Dense(cfg.hidden_size, use_bias=False, dtype=_dtype(cfg),
                        name="fc3")(x)


class Critic(nn.Module):
    """768 -> 512 -> 1 value head (model_HAMT.py:289-300)."""

    config: ModelConfig
    dropout: float = 0.5

    @nn.compact
    def __call__(self, state, deterministic=True):
        cfg = self.config
        x = nn.Dense(512, dtype=_dtype(cfg), name="fc0")(state)
        x = jax.nn.relu(x)
        x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        return nn.Dense(1, dtype=_dtype(cfg), name="fc1")(x).squeeze(-1)
