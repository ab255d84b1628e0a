"""PyTorch checkpoint conversion: reference state_dicts -> flax param trees.

Covers the released fine-tune checkpoints of both stacks
(saved as {vln_bert, critic} x {epoch, state_dict, optimizer},
VLN-HAMT/finetune_src/r2r/agent_cmt.py:837-852) and the pre-trained inits
(vlnbert_init.py:20-31 key healing: strip 'module.', prefix bare
'next_action' with 'bert.').

Conversion rules:
- torch nn.Linear weight [out, in]   -> flax Dense kernel [in, out] (transpose)
- torch nn.Embedding weight          -> flax Embed embedding
- torch nn.LayerNorm weight/bias     -> flax LayerNorm scale/bias
- torch nn.MultiheadAttention (DUET pano encoder, transformer.py:138):
  in_proj_weight [3H, H] splits into query/key/value kernels; out_proj maps
  to the explicit out_proj Dense
- nn.Sequential heads map by index (NextActionPrediction net.{0,2,4},
  ClsPrediction net.{0,2,3}, Critic state2value.{0,3})
"""

from __future__ import annotations

import re
from typing import Any, Callable

import numpy as np


def _seq_rules(prefix: str, out: str, mapping: dict[int, str]):
    """nn.Sequential index -> named flax submodule."""
    rules = []
    for idx, name in mapping.items():
        rules.append((rf"{prefix}\.net\.{idx}\.(weight|bias)$",
                      rf"{out}/{name}/\1"))
    return rules


_BERT_LAYER = [
    (r"attention\.self\.(query|key|value)\.(weight|bias)$",
     r"attention/self/\1/\2"),
    (r"attention\.output\.dense\.(weight|bias)$", r"attention/output/dense/\1"),
    (r"attention\.output\.LayerNorm\.(weight|bias)$",
     r"attention/output/LayerNorm/ln/\1"),
    (r"intermediate\.dense\.(weight|bias)$", r"intermediate/dense/\1"),
    (r"output\.dense\.(weight|bias)$", r"output/dense/\1"),
    (r"output\.LayerNorm\.(weight|bias)$", r"output/LayerNorm/ln/\1"),
]

_X_LAYER = [
    (r"visual_attention\.att\.(query|key|value)\.(weight|bias)$",
     r"visual_attention/att/\1/\2"),
    (r"visual_attention\.output\.dense\.(weight|bias)$",
     r"visual_attention/output/dense/\1"),
    (r"visual_attention\.output\.LayerNorm\.(weight|bias)$",
     r"visual_attention/output/LayerNorm/ln/\1"),
    (r"(lang|visn)_self_att\.self\.(query|key|value)\.(weight|bias)$",
     r"\1_self_att/self/\2/\3"),
    (r"(lang|visn)_self_att\.output\.dense\.(weight|bias)$",
     r"\1_self_att/output/dense/\2"),
    (r"(lang|visn)_self_att\.output\.LayerNorm\.(weight|bias)$",
     r"\1_self_att/output/LayerNorm/ln/\2"),
    (r"(lang|visn)_inter\.dense\.(weight|bias)$", r"\1_inter/dense/\2"),
    (r"(lang|visn)_output\.dense\.(weight|bias)$", r"\1_output/dense/\2"),
    (r"(lang|visn)_output\.LayerNorm\.(weight|bias)$",
     r"\1_output/LayerNorm/ln/\2"),
]

_EMBEDDINGS = [
    (r"^embeddings\.(word|position|token_type)_embeddings\.weight$",
     r"embeddings/\1_embeddings/embedding"),
    (r"^embeddings\.LayerNorm\.(weight|bias)$", r"embeddings/LayerNorm/ln/\1"),
]

_PRENORM_LAYER = [
    (r"self_attn\.out_proj\.(weight|bias)$", r"out_proj/\1"),
    (r"linear(1|2)\.(weight|bias)$", r"linear\1/\2"),
    (r"norm(1|2)\.(weight|bias)$", r"norm\1/\2"),
    # in_proj handled specially (split into q/k/v)
]


def _apply_block(rules, key):
    for pat, repl in rules:
        m = re.search(pat, key)
        if m:
            return re.sub(pat, repl, key[m.start():])
    return None


def hamt_torch_to_flax_path(key: str) -> str | None:
    """NavCMT torch key -> flax param path (slash-separated), or None if the
    key is intentionally dropped (unused heads etc.)."""
    key = re.sub(r"^module\.", "", key)
    key = re.sub(r"^(bert|vln_bert)\.", "", key)

    for pat, repl in _EMBEDDINGS:
        if re.match(pat, key):
            return re.sub(pat, repl, key)

    m = re.match(r"^encoder\.layer\.(\d+)\.(.*)$", key)
    if m:
        rest = _apply_block(_BERT_LAYER, m.group(2))
        return f"lang_layer_{m.group(1)}/{rest}" if rest else None
    m = re.match(r"^encoder\.x_layers\.(\d+)\.(.*)$", key)
    if m:
        rest = _apply_block(_X_LAYER, m.group(2))
        return f"x_layer_{m.group(1)}/{rest}" if rest else None
    m = re.match(r"^encoder\.(h|r)_layers\.", key)
    if m:
        return None  # 0 layers in every released config

    m = re.match(r"^img_embeddings\.(img|ang)_linear\.(weight|bias)$", key)
    if m:
        return f"img_embeddings/{m.group(1)}_linear/{m.group(2)}"
    m = re.match(r"^img_embeddings\.(img|ang)_layer_norm\.(weight|bias)$", key)
    if m:
        return f"img_embeddings/{m.group(1)}_layer_norm/ln/{m.group(2)}"
    if key == "img_embeddings.nav_type_embedding.weight":
        return "img_embeddings/nav_type_embedding/embedding"
    m = re.match(r"^img_embeddings\.layer_norm\.(weight|bias)$", key)
    if m:
        return f"img_embeddings/layer_norm/ln/{m.group(1)}"

    if key == "hist_embeddings.cls_token":
        return "hist_embeddings/cls_token"
    m = re.match(
        r"^hist_embeddings\.(pano_img|pano_ang|img|ang)_linear\.(weight|bias)$",
        key)
    if m:
        return f"hist_embeddings/{m.group(1)}_linear/{m.group(2)}"
    m = re.match(
        r"^hist_embeddings\.(pano_img|pano_ang|img|ang)_layer_norm\.(weight|bias)$",
        key)
    if m:
        return f"hist_embeddings/{m.group(1)}_layer_norm/ln/{m.group(2)}"
    if key == "hist_embeddings.position_embeddings.weight":
        return "hist_embeddings/position_embeddings/embedding"
    if key == "hist_embeddings.type_embedding.weight":
        return "hist_embeddings/type_embedding/embedding"
    m = re.match(r"^hist_embeddings\.layer_norm\.(weight|bias)$", key)
    if m:
        return f"hist_embeddings/layer_norm/ln/{m.group(1)}"
    m = re.match(r"^hist_embeddings\.pano_encoder\.layer\.(\d+)\.(.*)$", key)
    if m:
        rest = _apply_block(_BERT_LAYER, m.group(2))
        return (f"hist_embeddings/pano_encoder/layer_{m.group(1)}/{rest}"
                if rest else None)

    if key == "imagine_embeddings.type_embedding.weight":
        return "imagine_embeddings/type_embedding/embedding"
    m = re.match(r"^imagine_embeddings\.(.*)$", key)
    if m:  # full (non-bypass) imagine encoder
        sub = m.group(1)
        if sub == "position_embeddings.weight":
            return "imagine_embeddings/position_embeddings/embedding"
        mm = re.match(r"pano_img_linear\.(weight|bias)$", sub)
        if mm:
            return f"imagine_embeddings/pano_img_linear/{mm.group(1)}"
        mm = re.match(r"(pano_img_layer_norm|layer_norm)\.(weight|bias)$", sub)
        if mm:
            return f"imagine_embeddings/{mm.group(1)}/ln/{mm.group(2)}"
        mm = re.match(r"pano_encoder\.layer\.(\d+)\.(.*)$", sub)
        if mm:
            rest = _apply_block(_BERT_LAYER, mm.group(2))
            return (f"imagine_embeddings/pano_encoder/layer_{mm.group(1)}/{rest}"
                    if rest else None)
        return None

    m = re.match(
        r"^contrastive_alignment_model\.image_proj\.fc([123])\.weight$", key)
    if m:
        return f"image_proj/fc{m.group(1)}/weight"

    for head in ("next_action", "ref_object"):
        for rule in _seq_rules(head, head,
                               {0: "dense0", 2: "LayerNorm/ln", 4: "dense1"}):
            mm = re.match("^" + rule[0], key)
            if mm:
                return re.sub(rule[0], rule[1], key)

    # NavRefCMT object segment (vlnbert_navref.py:11-41)
    m = re.match(r"^obj_embeddings\.(img|ang|pos)_linear\.(weight|bias)$",
                 key)
    if m:
        return f"obj_embeddings/{m.group(1)}_linear/{m.group(2)}"
    m = re.match(r"^obj_embeddings\.(img|ang|pos)_layer_norm"
                 r"\.(weight|bias)$", key)
    if m:
        return f"obj_embeddings/{m.group(1)}_layer_norm/ln/{m.group(2)}"
    m = re.match(r"^obj_embeddings\.layer_norm\.(weight|bias)$", key)
    if m:
        return f"obj_embeddings/layer_norm/ln/{m.group(1)}"

    if key in ("pooler.dense.weight", "pooler.dense.bias"):
        return None  # BertPooler exists in BERT inits but is unused
    p = _mlm_head_path(key)
    if p is not None:
        return p
    return None


def _mlm_head_path(key: str) -> str | None:
    """BertLMPredictionHead keys ('cls.predictions.*' in HF BERT,
    'mlm_head.predictions.*' after the reference's pretrain remap,
    train_r2r.py:134-136) -> our tied MLMHead params.  The decoder weight is
    tied to the word embedding (pretrain_cmt.py:96-99) and the decoder bias
    duplicates 'bias', so both are intentionally dropped."""
    m = re.match(r"^(?:cls|mlm_head)\.predictions\.(.*)$", key)
    if not m:
        return None
    rest = m.group(1)
    if rest == "bias":
        return "mlm_head/bias"
    mm = re.match(r"^transform\.dense\.(weight|bias)$", rest)
    if mm:
        return f"mlm_head/dense/{mm.group(1)}"
    mm = re.match(r"^transform\.LayerNorm\.(weight|bias)$", rest)
    if mm:
        return f"mlm_head/LayerNorm/ln/{mm.group(1)}"
    return None


def lxmert_remap(state_dict: dict) -> dict:
    """model_LXRT.pth -> GlocalTextPathCMT key space, exactly the
    reference's LXMERT init surgery (train_r2r.py:120-139): language layers
    to lang_encoder, the 5 LXMERT x-layers DUPLICATED into both the local
    and the global cross-modal encoders, cls.predictions to mlm_head."""
    out = {}
    for k, v in state_dict.items():
        k = k.replace("module.", "")
        if "bert.encoder.layer" in k:
            out[k.replace("bert.encoder.layer",
                          "bert.lang_encoder.layer")] = v
        elif "bert.encoder.x_layers" in k:
            out[k.replace("bert.encoder.x_layers",
                          "bert.local_encoder.encoder.x_layers")] = v
            out[k.replace("bert.encoder.x_layers",
                          "bert.global_encoder.encoder.x_layers")] = v
        elif "cls.predictions" in k:
            out[k.replace("cls.predictions", "mlm_head.predictions")] = v
        else:
            out[k] = v
    return out


def bert_remap_for_duet(state_dict: dict) -> dict:
    """HF bert-base-uncased keys -> GlocalTextPathCMT key space.  NOTE: the
    reference's 'bert' init branch copies HF names verbatim
    (train_r2r.py:110-119), where 'encoder.layer.*' matches nothing in the
    DUET model — only the embeddings actually transfer there.  Here the
    language layers are remapped onto lang_encoder so a BERT init
    initializes them too (strictly more weights transferred; embeddings
    behave identically)."""
    return {k.replace("module.", "").replace("encoder.layer.",
                                             "lang_encoder.layer."): v
            for k, v in state_dict.items()}


def duet_torch_to_flax_path(key: str) -> str | None:
    """GlocalTextPathNavCMT torch key -> flax param path."""
    key = re.sub(r"^module\.", "", key)
    key = re.sub(r"^(bert|vln_bert)\.", "", key)

    for pat, repl in _EMBEDDINGS:
        if re.match(pat, key):
            return re.sub(pat, repl, key)

    m = re.match(r"^lang_encoder\.layer\.(\d+)\.(.*)$", key)
    if m:
        rest = _apply_block(_BERT_LAYER, m.group(2))
        return f"lang_layer_{m.group(1)}/{rest}" if rest else None

    m = re.match(r"^img_embeddings\.(img|loc|obj)_linear\.(weight|bias)$", key)
    if m:
        return f"{m.group(1)}_linear/{m.group(2)}"
    m = re.match(r"^img_embeddings\.(img|loc|obj)_layer_norm\.(weight|bias)$",
                 key)
    if m:
        return f"{m.group(1)}_layer_norm/ln/{m.group(2)}"
    if key == "img_embeddings.nav_type_embedding.weight":
        return "nav_type_embedding/embedding"
    m = re.match(r"^img_embeddings\.layer_norm\.(weight|bias)$", key)
    if m:
        return f"img_final_norm/ln/{m.group(1)}"
    m = re.match(r"^img_embeddings\.pano_encoder\.layers\.(\d+)\.(.*)$", key)
    if m:
        rest = _apply_block(_PRENORM_LAYER, m.group(2))
        return (f"pano_encoder/layer_{m.group(1)}/{rest}" if rest else
                # in_proj split handled by the converter body
                f"pano_encoder/layer_{m.group(1)}/__{m.group(2)}")
    m = re.match(r"^img_embeddings\.pano_encoder\.norm\.(weight|bias)$", key)
    if m:
        return f"pano_encoder/norm/ln/{m.group(1)}"

    m = re.match(r"^local_encoder\.vp_pos_embeddings\.0\.(weight|bias)$", key)
    if m:
        return f"vp_pos_linear/{m.group(1)}"
    m = re.match(r"^local_encoder\.vp_pos_embeddings\.1\.(weight|bias)$", key)
    if m:
        return f"vp_pos_norm/ln/{m.group(1)}"
    m = re.match(r"^local_encoder\.encoder\.x_layers\.(\d+)\.(.*)$", key)
    if m:
        rest = _apply_block(_X_LAYER, m.group(2))
        return f"local_encoder/x_layer_{m.group(1)}/{rest}" if rest else None

    m = re.match(r"^global_encoder\.gmap_pos_embeddings\.0\.(weight|bias)$",
                 key)
    if m:
        return f"gmap_pos_linear/{m.group(1)}"
    m = re.match(r"^global_encoder\.gmap_pos_embeddings\.1\.(weight|bias)$",
                 key)
    if m:
        return f"gmap_pos_norm/ln/{m.group(1)}"
    if key == "global_encoder.gmap_step_embeddings.weight":
        return "gmap_step_embeddings/embedding"
    m = re.match(r"^global_encoder\.sprel_linear\.(weight|bias)$", key)
    if m:
        return f"sprel_linear/{m.group(1)}"
    m = re.match(r"^global_encoder\.encoder\.x_layers\.(\d+)\.(.*)$", key)
    if m:
        rest = _apply_block(_X_LAYER, m.group(2))
        return f"global_encoder/x_layer_{m.group(1)}/{rest}" if rest else None

    for head in ("global_sap_head", "local_sap_head", "sap_fuse_linear",
                 "og_head"):
        for rule in _seq_rules(head, head,
                               {0: "dense0", 2: "LayerNorm/ln", 3: "dense1"}):
            if re.match("^" + rule[0], key):
                return re.sub(rule[0], rule[1], key)

    if key == "imagine_embeddings.type_embedding.weight":
        return "imagine_embeddings/type_embedding/embedding"
    m = re.match(
        r"^contrastive_alignment_model\.image_proj\.fc([123])\.weight$", key)
    if m:
        return f"image_proj/fc{m.group(1)}/weight"
    p = _mlm_head_path(key)
    if p is not None:
        return p
    return None


def vit_torch_to_flax_path(key: str) -> str | None:
    """timm vit_base_patch16_224 state-dict key -> flax path
    (models/vit.py; reference vendored ViT at
    VLN-HAMT/pretrain_src/model/vision_transformer.py)."""
    key = re.sub(r"^module\.", "", key)
    if key in ("cls_token", "pos_embed"):
        return key
    m = re.match(r"^patch_embed\.proj\.(weight|bias)$", key)
    if m:
        return f"patch_embed/__conv_{m.group(1)}"
    m = re.match(r"^blocks\.(\d+)\.(.*)$", key)
    if m:
        i, rest = m.group(1), m.group(2)
        tbl = [
            (r"^norm(1|2)\.(weight|bias)$", r"norm\1/\2"),
            (r"^attn\.qkv\.(weight|bias)$", r"qkv/\1"),
            (r"^attn\.proj\.(weight|bias)$", r"proj/\1"),
            (r"^mlp\.fc(1|2)\.(weight|bias)$", r"fc\1/\2"),
        ]
        for pat, repl in tbl:
            if re.match(pat, rest):
                return f"block_{i}/" + re.sub(pat, repl, rest)
        return None
    m = re.match(r"^norm\.(weight|bias)$", key)
    if m:
        return f"norm/{m.group(1)}"
    if key in ("head.weight", "head.bias", "pre_logits.fc.weight",
               "pre_logits.fc.bias"):
        return None  # classification head unused for feature extraction
    return None


def critic_torch_to_flax_path(key: str) -> str | None:
    key = re.sub(r"^module\.", "", key)
    m = re.match(r"^state2value\.0\.(weight|bias)$", key)
    if m:
        return f"fc0/{m.group(1)}"
    m = re.match(r"^state2value\.3\.(weight|bias)$", key)
    if m:
        return f"fc1/{m.group(1)}"
    return None


def _set_path(tree: dict, path: str, value: np.ndarray):
    parts = path.split("/")
    node = tree
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = value


def convert_state_dict(
    state_dict: dict[str, Any],
    key_fn: Callable[[str], str | None],
) -> tuple[dict, list[str]]:
    """torch state_dict -> {'params': tree}; returns (tree, skipped_keys).

    Values may be torch tensors or numpy arrays."""
    params: dict = {}
    skipped: list[str] = []
    pending_inproj: dict[str, dict[str, np.ndarray]] = {}

    def to_np(v):
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        return np.asarray(v)

    for key, val in state_dict.items():
        path = key_fn(key)
        if path is None:
            skipped.append(key)
            continue
        v = to_np(val)
        leaf = path.split("/")[-1]
        if "__self_attn.in_proj_" in path:
            base = path.split("/__")[0]
            kind = "weight" if path.endswith("in_proj_weight") else "bias"
            pending_inproj.setdefault(base, {})[kind] = v
            continue
        if leaf == "__conv_weight":
            # torch conv [out, in, kh, kw] -> flax [kh, kw, in, out]
            _set_path(params, path.rsplit("/", 1)[0] + "/kernel",
                      v.transpose(2, 3, 1, 0))
        elif leaf == "__conv_bias":
            _set_path(params, path.rsplit("/", 1)[0] + "/bias", v)
        elif leaf == "weight":
            parent = path.rsplit("/", 2)[-2] if "/" in path else ""
            if parent == "ln" or v.ndim == 1 or \
                    path.endswith(("norm1/weight", "norm2/weight")):
                # LayerNorm weight -> scale
                _set_path(params, path.rsplit("/", 1)[0] + "/scale", v)
            elif v.ndim == 2:
                _set_path(params, path.rsplit("/", 1)[0] + "/kernel", v.T)
            else:
                _set_path(params, path.rsplit("/", 1)[0] + "/embedding", v)
        elif leaf == "embedding":
            _set_path(params, path, v)
        elif leaf == "cls_token":
            _set_path(params, path, v)
        else:  # bias
            _set_path(params, path, v)

    # split packed qkv projections (DUET pano MultiheadAttention)
    for base, parts in pending_inproj.items():
        w = parts.get("weight")
        bias = parts.get("bias")
        H = w.shape[1]
        for i, name in enumerate(("query", "key", "value")):
            _set_path(params, f"{base}/self_attn/{name}/kernel",
                      w[i * H:(i + 1) * H].T)
            if bias is not None:
                _set_path(params, f"{base}/self_attn/{name}/bias",
                          bias[i * H:(i + 1) * H])

    return {"params": params}, skipped


def verify_converted(params: dict, target_params: dict) -> list[str]:
    """Paths present in the model but missing/mismatched in the conversion."""
    problems = []

    def walk(a, b, path):
        if isinstance(b, dict):
            for k, v in b.items():
                walk(a.get(k, {}) if isinstance(a, dict) else {}, v,
                     path + (k,))
        else:
            loc = "/".join(path)
            if not isinstance(a, np.ndarray) and not hasattr(a, "shape"):
                problems.append(f"missing: {loc}")
            elif tuple(np.shape(a)) != tuple(np.shape(b)):
                problems.append(
                    f"shape {loc}: {np.shape(a)} vs model {np.shape(b)}")

    walk(params.get("params", {}), target_params.get("params", {}), ())
    return problems
