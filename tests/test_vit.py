"""ViT: shapes, extraction API, converted-weight parity vs a torch ViT."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as tnn

from vln_imagine_tpu.ckpt import convert as C
from vln_imagine_tpu.models.vit import (
    FeatureExtractor,
    ViTConfig,
    VisionTransformer,
    preprocess,
)

torch.manual_seed(0)


def tiny_cfg():
    return ViTConfig(image_size=32, patch_size=16, hidden_size=48,
                     num_layers=2, num_heads=4, compute_dtype="float32")


class TorchViT(tnn.Module):
    """timm-style ViT from torch.nn primitives, timm key names."""

    def __init__(self, cfg: ViTConfig):
        super().__init__()
        d = cfg.hidden_size
        self.cls_token = tnn.Parameter(torch.randn(1, 1, d) * 0.02)
        self.pos_embed = tnn.Parameter(
            torch.randn(1, 1 + cfg.num_patches, d) * 0.02)
        self.patch_embed = tnn.Module()
        self.patch_embed.proj = tnn.Conv2d(3, d, cfg.patch_size,
                                           cfg.patch_size)
        self.blocks = tnn.ModuleList()
        for _ in range(cfg.num_layers):
            blk = tnn.Module()
            blk.norm1 = tnn.LayerNorm(d, eps=1e-6)
            blk.attn = tnn.Module()
            blk.attn.qkv = tnn.Linear(d, 3 * d)
            blk.attn.proj = tnn.Linear(d, d)
            blk.norm2 = tnn.LayerNorm(d, eps=1e-6)
            blk.mlp = tnn.Module()
            blk.mlp.fc1 = tnn.Linear(d, cfg.mlp_dim)
            blk.mlp.fc2 = tnn.Linear(cfg.mlp_dim, d)
            self.blocks.append(blk)
        self.norm = tnn.LayerNorm(d, eps=1e-6)
        self.cfg = cfg

    def forward(self, x):  # x: [B, 3, H, W]
        cfg = self.cfg
        B = x.shape[0]
        x = self.patch_embed.proj(x).flatten(2).transpose(1, 2)
        x = torch.cat([self.cls_token.expand(B, -1, -1), x], 1)
        x = x + self.pos_embed
        heads = cfg.num_heads
        hd = cfg.hidden_size // heads
        for blk in self.blocks:
            h = blk.norm1(x)
            qkv = blk.attn.qkv(h).reshape(B, -1, 3, heads, hd).permute(
                2, 0, 3, 1, 4)
            q, k, v = qkv[0], qkv[1], qkv[2]
            s = (q @ k.transpose(-1, -2)) / np.sqrt(hd)
            ctx = (torch.softmax(s, -1) @ v).permute(0, 2, 1, 3).reshape(
                B, -1, cfg.hidden_size)
            x = x + blk.attn.proj(ctx)
            h = blk.norm2(x)
            x = x + blk.mlp.fc2(torch.nn.functional.gelu(blk.mlp.fc1(h)))
        return self.norm(x)[:, 0]


def test_vit_parity_via_converter():
    cfg = tiny_cfg()
    tv = TorchViT(cfg).eval()
    params, skipped = C.convert_state_dict(tv.state_dict(),
                                           C.vit_torch_to_flax_path)
    assert not skipped, skipped

    rng = np.random.default_rng(0)
    img = rng.standard_normal((2, cfg.image_size, cfg.image_size, 3)
                              ).astype(np.float32)
    with torch.no_grad():
        want = tv(torch.from_numpy(img.transpose(0, 3, 1, 2))).numpy()
    model = VisionTransformer(cfg)
    got, _ = model.apply(params, jnp.asarray(img))
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)


def test_extractor_shapes():
    cfg = tiny_cfg()
    ex = FeatureExtractor.random_init(cfg=cfg, batch_size=3)
    imgs = preprocess(np.random.default_rng(1).integers(
        0, 255, (4, cfg.image_size, cfg.image_size, 3), dtype=np.uint8))
    feats = ex.extract(imgs)
    assert feats.shape == (4, cfg.hidden_size)
    panos = imgs[None].repeat(2, axis=0)
    pf = ex.extract_panoramas(panos)
    assert pf.shape == (2, 4, cfg.hidden_size)
    # batching does not change results
    ex1 = FeatureExtractor(ex.params, cfg, batch_size=64)
    np.testing.assert_allclose(feats, ex1.extract(imgs), rtol=1e-5, atol=1e-5)
