"""Checkpoint conversion: numerical parity against torch blocks and full
param-tree coverage for both agents."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as tnn

from vln_imagine_tpu.ckpt import convert as C
from vln_imagine_tpu.config import tiny_test_config
from vln_imagine_tpu.models import bert as B

torch.manual_seed(0)


def _np(x):
    return x.detach().cpu().numpy()


class TorchBertLayer(tnn.Module):
    """Standard post-LN BERT layer built from torch.nn primitives, with the
    reference's key names (attention.self.query, ..., output.LayerNorm)."""

    def __init__(self, h, heads, inter):
        super().__init__()
        self.h, self.heads = h, heads

        class A(tnn.Module):
            def __init__(self):
                super().__init__()
                self.query = tnn.Linear(h, h)
                self.key = tnn.Linear(h, h)
                self.value = tnn.Linear(h, h)

        class O(tnn.Module):
            def __init__(self):
                super().__init__()
                self.dense = tnn.Linear(h, h)
                self.LayerNorm = tnn.LayerNorm(h, eps=1e-12)

        class Att(tnn.Module):
            def __init__(self):
                super().__init__()
                self.self = A()
                self.output = O()

        class Inter(tnn.Module):
            def __init__(self):
                super().__init__()
                self.dense = tnn.Linear(h, inter)

        self.attention = Att()
        self.intermediate = Inter()
        self.output = tnn.Module()
        self.output.dense = tnn.Linear(inter, h)
        self.output.LayerNorm = tnn.LayerNorm(h, eps=1e-12)

    def forward(self, x, mask):
        h, heads = self.h, self.heads
        d = h // heads
        B_, L, _ = x.shape

        def split(t):
            return t.view(B_, L, heads, d).permute(0, 2, 1, 3)

        s = self.attention.self
        q, k, v = split(s.query(x)), split(s.key(x)), split(s.value(x))
        scores = q @ k.transpose(-1, -2) / np.sqrt(d) + mask
        probs = torch.softmax(scores, dim=-1)
        ctx = (probs @ v).permute(0, 2, 1, 3).reshape(B_, L, h)
        attn = self.attention.output.LayerNorm(
            self.attention.output.dense(ctx) + x)
        inter = torch.nn.functional.gelu(self.intermediate.dense(attn))
        return self.output.LayerNorm(self.output.dense(inter) + attn)


def test_bert_layer_parity_via_converter():
    cfg = tiny_test_config().model
    h, heads, inter = cfg.hidden_size, cfg.num_attention_heads, \
        cfg.intermediate_size
    tl = TorchBertLayer(h, heads, inter).eval()
    sd = {f"encoder.layer.0.{k}": v for k, v in tl.state_dict().items()}
    params, skipped = C.convert_state_dict(sd, C.hamt_torch_to_flax_path)
    assert not skipped
    layer_params = {"params": params["params"]["lang_layer_0"]}

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 9, h)).astype(np.float32)
    mask = np.zeros((2, 1, 1, 9), np.float32)
    mask[:, :, :, 7:] = -10000.0

    with torch.no_grad():
        want = _np(tl(torch.from_numpy(x), torch.from_numpy(mask)))
    layer = B.BertLayer(cfg)
    got = np.asarray(layer.apply(layer_params, jnp.asarray(x),
                                 jnp.asarray(mask)))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_prenorm_layer_parity_via_converter():
    cfg = tiny_test_config().model
    h, heads, inter = cfg.hidden_size, cfg.num_attention_heads, \
        cfg.intermediate_size
    tl = tnn.TransformerEncoderLayer(
        h, heads, dim_feedforward=inter, dropout=0.0, activation="gelu",
        batch_first=True, norm_first=True).eval()
    sd = {f"img_embeddings.pano_encoder.layers.0.{k}": v
          for k, v in tl.state_dict().items()}
    params, skipped = C.convert_state_dict(sd, C.duet_torch_to_flax_path)
    assert not skipped, skipped
    layer_params = {"params": params["params"]["pano_encoder"]["layer_0"]}

    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 7, h)).astype(np.float32)
    with torch.no_grad():
        want = _np(tl(torch.from_numpy(x)))
    # torch layer norm eps is 1e-5 as in the flax PreNormEncoderLayer
    layer = B.PreNormEncoderLayer(cfg)
    got = np.asarray(layer.apply(layer_params, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_prenorm_layer_parity_with_padding_mask():
    cfg = tiny_test_config().model
    h, heads, inter = cfg.hidden_size, cfg.num_attention_heads, \
        cfg.intermediate_size
    tl = tnn.TransformerEncoderLayer(
        h, heads, dim_feedforward=inter, dropout=0.0, activation="gelu",
        batch_first=True, norm_first=True).eval()
    sd = {f"img_embeddings.pano_encoder.layers.0.{k}": v
          for k, v in tl.state_dict().items()}
    params, _ = C.convert_state_dict(sd, C.duet_torch_to_flax_path)
    layer_params = {"params": params["params"]["pano_encoder"]["layer_0"]}

    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 7, h)).astype(np.float32)
    valid = np.ones((2, 7), bool)
    valid[:, 5:] = False
    with torch.no_grad():
        want = _np(tl(torch.from_numpy(x),
                      src_key_padding_mask=torch.from_numpy(~valid)))
    layer = B.PreNormEncoderLayer(cfg)
    got = np.asarray(layer.apply(layer_params, jnp.asarray(x),
                                 jnp.asarray(valid)))
    np.testing.assert_allclose(got[valid], want[valid], rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("agent", ["hamt", "duet"])
def test_full_tree_coverage(agent):
    """Every flax param is produced by converting a synthetic torch state
    dict with the reference's key inventory, at matching shapes."""
    from vln_imagine_tpu.envx import synthetic_world, synthetic_episodes

    cfg = tiny_test_config(agent)
    world_np, _ = synthetic_world(
        num_scans=1, num_nodes=12, max_candidates=cfg.env.max_candidates,
        views=cfg.env.views, feat_dim=cfg.model.image_feat_size, seed=0)
    world = jax.tree.map(jnp.asarray, world_np)
    ep = jax.tree.map(jnp.asarray, synthetic_episodes(
        world_np, batch=1, max_gt_path_len=cfg.env.max_gt_path_len,
        max_instr_len=cfg.env.max_instr_len,
        max_imaginations=cfg.model.max_imagination_len,
        vocab_size=cfg.model.vocab_size, feat_dim=cfg.model.hidden_size,
        seed=1))
    if agent == "hamt":
        from vln_imagine_tpu.train.trainer import HamtTrainer
        state = HamtTrainer(cfg, world).init_state(ep)
        key_fn = C.hamt_torch_to_flax_path
    else:
        from vln_imagine_tpu.train.trainer_duet import DuetTrainer
        state = DuetTrainer(cfg, world).init_state(ep)
        key_fn = C.duet_torch_to_flax_path
    target = jax.tree.map(np.asarray, state.params)

    sd = synthetic_torch_state_dict(target, agent)
    params, skipped = C.convert_state_dict(sd, key_fn)
    assert not skipped, skipped[:5]
    problems = C.verify_converted(params, target)
    assert not problems, problems[:10]


def synthetic_torch_state_dict(flax_params: dict, agent: str) -> dict:
    """Reverse-map a flax tree into reference-named torch tensors (the
    inverse inventory of convert.py's forward rules)."""
    out = {}

    def rev_block(flax_name: str) -> str | None:
        if agent == "hamt":
            tbl = [
                (r"^lang_layer_(\d+)", r"encoder.layer.\1"),
                (r"^x_layer_(\d+)", r"encoder.x_layers.\1"),
                (r"^hist_embeddings/pano_encoder/layer_(\d+)",
                 r"hist_embeddings.pano_encoder.layer.\1"),
                (r"^image_proj", "contrastive_alignment_model.image_proj"),
                (r"^next_action/dense0", "next_action.net.0"),
                (r"^next_action/LayerNorm/ln", "next_action.net.2"),
                (r"^next_action/dense1", "next_action.net.4"),
            ]
        else:
            tbl = [
                (r"^lang_layer_(\d+)", r"lang_encoder.layer.\1"),
                (r"^pano_encoder/norm/ln", "img_embeddings.pano_encoder.norm"),
                (r"^pano_encoder/layer_(\d+)",
                 r"img_embeddings.pano_encoder.layers.\1"),
                (r"^(img|loc|obj)_linear", r"img_embeddings.\1_linear"),
                (r"^(img|loc|obj)_layer_norm/ln",
                 r"img_embeddings.\1_layer_norm"),
                (r"^nav_type_embedding", "img_embeddings.nav_type_embedding"),
                (r"^img_final_norm/ln", "img_embeddings.layer_norm"),
                (r"^vp_pos_linear", "local_encoder.vp_pos_embeddings.0"),
                (r"^vp_pos_norm/ln", "local_encoder.vp_pos_embeddings.1"),
                (r"^local_encoder/x_layer_(\d+)",
                 r"local_encoder.encoder.x_layers.\1"),
                (r"^gmap_pos_linear", "global_encoder.gmap_pos_embeddings.0"),
                (r"^gmap_pos_norm/ln", "global_encoder.gmap_pos_embeddings.1"),
                (r"^gmap_step_embeddings",
                 "global_encoder.gmap_step_embeddings"),
                (r"^sprel_linear", "global_encoder.sprel_linear"),
                (r"^global_encoder/x_layer_(\d+)",
                 r"global_encoder.encoder.x_layers.\1"),
                (r"^(global_sap_head|local_sap_head|sap_fuse_linear|og_head)"
                 r"/dense0", r"\1.net.0"),
                (r"^(global_sap_head|local_sap_head|sap_fuse_linear|og_head)"
                 r"/LayerNorm/ln", r"\1.net.2"),
                (r"^(global_sap_head|local_sap_head|sap_fuse_linear|og_head)"
                 r"/dense1", r"\1.net.3"),
                (r"^image_proj", "contrastive_alignment_model.image_proj"),
            ]
        import re
        for pat, repl in tbl:
            if re.match(pat, flax_name):
                return re.sub(pat, repl, flax_name)
        return flax_name

    def walk(tree, path):
        for k, v in tree.items():
            if isinstance(v, dict):
                walk(v, path + (k,))
                continue
            p = "/".join(path + (k,))
            p = rev_block(p)
            p = p.replace("/ln/scale", ".weight").replace("/ln/bias", ".bias")
            if p.endswith("/embedding"):
                p = p[: -len("/embedding")] + ".weight"
            elif p.endswith("/kernel"):
                p = p[: -len("/kernel")] + ".weight"
                v = np.asarray(v).T
            elif p.endswith("/scale"):
                p = p[: -len("/scale")] + ".weight"
            elif p.endswith("/bias"):
                p = p[: -len("/bias")] + ".bias"
            elif p.endswith("/cls_token"):
                p = p[: -len("/cls_token")] + ".cls_token"
            elif p.endswith("/weight"):
                p = p[: -len("/weight")] + ".weight"
            p = p.replace("/", ".")
            # DUET pano MultiheadAttention packs qkv
            import re as _re
            m = _re.match(
                r"^(img_embeddings\.pano_encoder\.layers\.\d+)\."
                r"self_attn\.(query|key|value)\.(weight|bias)$", p)
            if m:
                base, which, kind = m.groups()
                key = f"{base}.self_attn.in_proj_{kind}"
                idx = {"query": 0, "key": 1, "value": 2}[which]
                arr = np.asarray(v)
                H = arr.shape[-1] if kind == "bias" else arr.shape[0]
                cur = out.get(key)
                if cur is None:
                    cur = np.zeros((3 * H,) + arr.shape[1:], arr.dtype)
                cur[idx * H:(idx + 1) * H] = arr
                out[key] = cur
                continue
            m = _re.match(
                r"^(img_embeddings\.pano_encoder\.layers\.\d+)\."
                r"out_proj\.(weight|bias)$", p)
            if m:
                p = f"{m.group(1)}.self_attn.out_proj.{m.group(2)}"
            out[p] = np.asarray(v)

    walk(flax_params["params"], ())
    return out
