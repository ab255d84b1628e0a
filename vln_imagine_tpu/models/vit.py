"""Vision Transformer (ViT-B/16) in flax for on-device feature extraction.

Rebuild of the vendored timm ViT
(VLN-HAMT/pretrain_src/model/vision_transformer.py:135-720) used two ways by
the reference: offline, to precompute the HDF5 view/imagination features
consumed by ImageFeaturesDB, and in-model for end-to-end pre-training
(model/image_vilmodel.py:22-209).  Here extraction is a jitted batched
forward so 36-view panoramas and imagination images can be embedded on-TPU,
replacing the host HDF5 path (BASELINE config 4).

Architecture (timm vit_base_patch16_224): conv patch embed, prepended class
token, learned position embeddings, pre-norm blocks (LN eps 1e-6, exact-erf
GELU), final LayerNorm; `forward_features` returns the class token embedding.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from vln_imagine_tpu.models.bert import gelu_erf


class ViTConfig:
    def __init__(self, image_size=224, patch_size=16, hidden_size=768,
                 num_layers=12, num_heads=12, mlp_ratio=4.0,
                 compute_dtype="bfloat16"):
        self.image_size = image_size
        self.patch_size = patch_size
        self.hidden_size = hidden_size
        self.num_layers = num_layers
        self.num_heads = num_heads
        self.mlp_dim = int(hidden_size * mlp_ratio)
        self.compute_dtype = jnp.dtype(compute_dtype)
        self.num_patches = (image_size // patch_size) ** 2


class ViTBlock(nn.Module):
    cfg: ViTConfig

    @nn.compact
    def __call__(self, x, deterministic=True):
        cfg = self.cfg
        dt = cfg.compute_dtype
        h = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm1")(x)
        h = h.astype(dt)
        B, L, D = h.shape
        heads, hd = cfg.num_heads, cfg.hidden_size // cfg.num_heads
        qkv = nn.Dense(3 * cfg.hidden_size, dtype=dt, name="qkv")(h)
        q, k, v = jnp.split(qkv.reshape(B, L, 3, heads, hd)
                            .transpose(2, 0, 3, 1, 4), 3, axis=0)
        q, k, v = q[0], k[0], v[0]
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                       preferred_element_type=jnp.float32) / np.sqrt(hd)
        p = jax.nn.softmax(s, axis=-1).astype(dt)
        ctx = jnp.einsum("bhqk,bhkd->bhqd", p, v,
                         preferred_element_type=jnp.float32).astype(dt)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(B, L, D)
        ctx = nn.Dense(cfg.hidden_size, dtype=dt, name="proj")(ctx)
        x = x + ctx

        h = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm2")(x)
        h = h.astype(dt)
        h = nn.Dense(cfg.mlp_dim, dtype=dt, name="fc1")(h)
        h = gelu_erf(h)
        h = nn.Dense(cfg.hidden_size, dtype=dt, name="fc2")(h)
        return x + h


class VisionTransformer(nn.Module):
    cfg: ViTConfig

    @nn.compact
    def __call__(self, images, deterministic=True):
        """images: [B, H, W, 3] float (already normalised) ->
        (cls_feature [B, D], tokens [B, 1+P, D])."""
        cfg = self.cfg
        dt = cfg.compute_dtype
        x = nn.Conv(cfg.hidden_size,
                    kernel_size=(cfg.patch_size, cfg.patch_size),
                    strides=(cfg.patch_size, cfg.patch_size),
                    dtype=dt, name="patch_embed")(images.astype(dt))
        B = x.shape[0]
        x = x.reshape(B, -1, cfg.hidden_size)
        cls = self.param("cls_token", nn.initializers.zeros,
                         (1, 1, cfg.hidden_size))
        x = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(dt), (B, 1, cfg.hidden_size)), x], 1)
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, 1 + cfg.num_patches, cfg.hidden_size))
        x = x + pos.astype(dt)
        for i in range(cfg.num_layers):
            x = ViTBlock(cfg, name=f"block_{i}")(x, deterministic)
        x = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm")(x)
        return x[:, 0], x


def make_imagine_vit(model_cfg) -> "VisionTransformer":
    """ViT submodule for in-step imagination feature extraction
    (ModelConfig.e2e_imagination).  Hidden size tracks the navigator's so the
    class token feeds BypassImagineEmbeddings directly."""
    assert model_cfg.hidden_size % model_cfg.e2e_vit_heads == 0, (
        f"e2e_vit_heads={model_cfg.e2e_vit_heads} must divide "
        f"hidden_size={model_cfg.hidden_size}")
    return VisionTransformer(ViTConfig(
        image_size=model_cfg.e2e_vit_image_size,
        patch_size=model_cfg.e2e_vit_patch_size,
        hidden_size=model_cfg.hidden_size,
        num_layers=model_cfg.e2e_vit_layers,
        num_heads=model_cfg.e2e_vit_heads,
        compute_dtype=model_cfg.compute_dtype))


def extract_imagine_features(vit: "VisionTransformer", images, model_cfg,
                             deterministic=True):
    """[B, I, Hp, Wp, 3] raw (preprocessed) images -> [B, I, H] class-token
    features, inside the caller's jit.  'frozen' stops gradients so the
    backward pass skips the ViT entirely."""
    B, I = images.shape[:2]
    flat = images.reshape((B * I,) + images.shape[2:])
    cls, _ = vit(flat, deterministic)
    feats = cls.reshape(B, I, -1).astype(jnp.float32)
    if model_cfg.e2e_imagination == "frozen":
        feats = jax.lax.stop_gradient(feats)
    return feats


IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def preprocess(images_uint8: np.ndarray) -> np.ndarray:
    """[., H, W, 3] uint8 -> normalised float32 (timm default transform)."""
    x = images_uint8.astype(np.float32) / 255.0
    return (x - IMAGENET_MEAN) / IMAGENET_STD


class FeatureExtractor:
    """Jitted batched ViT feature extraction for panoramas / imaginations."""

    def __init__(self, params, cfg: ViTConfig | None = None,
                 batch_size: int = 64):
        self.cfg = cfg or ViTConfig()
        self.model = VisionTransformer(self.cfg)
        self.params = params
        self.batch_size = batch_size
        self._fn = jax.jit(
            lambda p, x: self.model.apply(p, x, deterministic=True)[0])

    @classmethod
    def random_init(cls, rng=None, cfg: ViTConfig | None = None,
                    **kw) -> "FeatureExtractor":
        cfg = cfg or ViTConfig()
        model = VisionTransformer(cfg)
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        params = model.init(
            rng, jnp.zeros((1, cfg.image_size, cfg.image_size, 3)))
        return cls(params, cfg, **kw)

    def extract(self, images: np.ndarray) -> np.ndarray:
        """[N, H, W, 3] preprocessed -> [N, D] class-token features, batched
        to bound device memory."""
        outs = []
        for i in range(0, len(images), self.batch_size):
            chunk = jnp.asarray(images[i: i + self.batch_size])
            outs.append(np.asarray(self._fn(self.params, chunk)))
        return np.concatenate(outs, 0) if outs else np.zeros(
            (0, self.cfg.hidden_size), np.float32)

    def extract_panoramas(self, pano_images: np.ndarray) -> np.ndarray:
        """[N_nodes, V, H, W, 3] -> [N_nodes, V, D]."""
        n, v = pano_images.shape[:2]
        flat = pano_images.reshape((n * v,) + pano_images.shape[2:])
        return self.extract(flat).reshape(n, v, -1)
