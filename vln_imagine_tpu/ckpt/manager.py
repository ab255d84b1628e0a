"""Checkpoint persistence with the reference's retention policy.

Reference behaviour (VLN-HAMT/finetune_src/r2r/main.py:347-359,
agent_cmt.py:837-875): `best_<env>` whenever spl+sr improves (DUET: spl,
main_nav.py:347-351), `latest_dict` every interval, and a full snapshot every
2000 iters under all_ckpts/iter_<i>_SR_<sr>_SPL_<spl>_<env>; checkpoints
bundle {model, critic} x {epoch, state_dict, optimizer}.

Implementation: orbax PyTreeCheckpointer per save slot.  Also provides
`load_reference_checkpoint` for the released torch .pt files via
ckpt/convert.py.
"""

from __future__ import annotations

import json
import os
import re
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, ckpt_dir: str, select_metric: str = "spl_sr"):
        """select_metric: 'spl_sr' (HAMT, main.py:352) or 'spl'
        (DUET, main_nav.py:347)."""
        self.dir = os.path.abspath(ckpt_dir)
        os.makedirs(self.dir, exist_ok=True)
        self.select_metric = select_metric
        self._ckpt = ocp.PyTreeCheckpointer()
        self.best_score: dict[str, float] = {}

    # ------------------------------------------------------------------ save
    def _save(self, path: str, state: Any):
        path = os.path.join(self.dir, path)
        self._ckpt.save(path, jax.tree.map(np.asarray, state), force=True)

    def save_latest(self, state: Any):
        self._save("latest_dict", state)

    def save_snapshot(self, state: Any, iteration: int, sr: float, spl: float,
                      env_name: str):
        self._save(
            f"all_ckpts/iter_{iteration}_SR_{sr:.2f}_SPL_{spl:.2f}_{env_name}",
            state)

    def maybe_save_best(self, state: Any, env_name: str,
                        metrics: dict) -> bool:
        score = (metrics["spl"] + metrics["sr"]
                 if self.select_metric == "spl_sr" else metrics["spl"])
        if score >= self.best_score.get(env_name, float("-inf")):
            self.best_score[env_name] = score
            self._save(f"best_{env_name}", state)
            with open(os.path.join(self.dir, f"best_{env_name}.json"),
                      "w") as f:
                json.dump(metrics, f)
            return True
        return False

    # ------------------------------------------------------------------ load
    def load(self, name: str, example_state: Any) -> Any:
        path = os.path.join(self.dir, name)
        restored = self._ckpt.restore(path)
        # the structural walk ignores restored subtrees the example lacks;
        # a count mismatch means the checkpoint belongs to a different model
        n_ex = len(jax.tree_util.tree_leaves(example_state))
        n_re = len(jax.tree_util.tree_leaves(restored))
        assert n_ex == n_re, (
            f"checkpoint '{name}' has {n_re} leaves, expected {n_ex} — "
            "it was saved from a differently-configured model")
        return _graft(example_state, restored)

    def list_snapshots(self) -> list[str]:
        root = os.path.join(self.dir, "all_ckpts")
        if not os.path.isdir(root):
            return []
        return sorted(os.listdir(root))

    def best_iteration(self, env_name: str) -> str | None:
        """Parse the iteration out of snapshot names like the released
        `iter_32000_SR_67.26_SPL_62.02_val_unseen`."""
        best, best_score = None, float("-inf")
        for name in self.list_snapshots():
            m = re.match(r"iter_(\d+)_SR_([\d.]+)_SPL_([\d.]+)_" + env_name,
                         name)
            if m:
                score = float(m.group(2)) + float(m.group(3))
                if score > best_score:
                    best, best_score = name, score
        return best


def _graft(example: Any, restored: Any) -> Any:
    """Shape restored arrays onto the example pytree structure.

    Orbax restores plain nested containers: dataclasses (TrainState,
    PretrainState) and NamedTuples (optax states) come back as dicts keyed by
    field name, tuples/lists as lists, zero-leaf nodes (optax EmptyState) as
    None.  A flatten-order zip would silently scramble leaves — dict keys
    flatten sorted while dataclass fields flatten in declaration order — so
    walk the two trees structurally instead.

    Only dtype metadata is read off example leaves: after a donated train
    step the in-memory state's buffers are deleted (data access raises), but
    shape/dtype stay readable, so rollback-from-checkpoint still works.
    """
    import dataclasses
    from collections.abc import Mapping

    if example is None:
        return None
    if restored is None:
        # zero-leaf subtree (e.g. optax EmptyState): nothing stored on disk
        return example
    if isinstance(example, Mapping):
        out = {k: _graft(v, restored[k]) for k, v in example.items()}
        return out if isinstance(example, dict) else type(example)(out)
    if dataclasses.is_dataclass(example) and not isinstance(example, type):
        kw = {f.name: _graft(getattr(example, f.name), restored[f.name])
              for f in dataclasses.fields(example)}
        return dataclasses.replace(example, **kw)
    if isinstance(example, tuple) and hasattr(example, "_fields"):
        # NamedTuple (optax states): stored as a field-name dict
        get = (restored.__getitem__ if isinstance(restored, Mapping)
               else lambda f: restored[example._fields.index(f)])
        return type(example)(*[_graft(getattr(example, f), get(f))
                               for f in example._fields])
    if isinstance(example, (list, tuple)):
        assert len(example) == len(restored), (
            f"checkpoint node has {len(restored)} entries, "
            f"expected {len(example)}")
        vals = [_graft(e, r) for e, r in zip(example, restored)]
        return type(example)(vals)
    dtype = getattr(example, "dtype", None)
    arr = np.asarray(restored)
    return arr.astype(dtype) if dtype is not None else arr


def load_reference_checkpoint(path: str, agent: str = "hamt"):
    """Load a released torch checkpoint
    ({vln_bert, critic} x {epoch, state_dict, optimizer},
    agent_cmt.py:837-852) into flax param trees."""
    import torch

    from vln_imagine_tpu.ckpt import convert as C

    states = torch.load(path, map_location="cpu", weights_only=False)
    out = {}
    if "vln_bert" in states:
        key_fn = (C.hamt_torch_to_flax_path if agent == "hamt"
                  else C.duet_torch_to_flax_path)
        params, skipped = C.convert_state_dict(
            states["vln_bert"]["state_dict"], key_fn)
        out["params"] = params
        out["skipped"] = skipped
        out["epoch"] = states["vln_bert"].get("epoch")
    if "critic" in states:
        critic_params, _ = C.convert_state_dict(
            states["critic"]["state_dict"], C.critic_torch_to_flax_path)
        out["critic_params"] = critic_params
    return out


def load_reference_pretrain(path: str, agent: str = "hamt"):
    """Load a released torch PRE-TRAIN checkpoint (the flat
    model_step_<N>.pt state_dict ModelSaver writes,
    pretrain_src/utils/save.py:23-46 — the file the reference feeds to
    --bert_ckpt_file, vlnbert_init.py:20-31) into a partial flax param
    tree.  'module.'/'bert.' prefixes are healed by the key maps;
    pretrain-only heads (mlm/mrc/itm/...) land in 'skipped' and the
    fine-tune-only modules are absent — graft with
    ckpt.transfer.init_finetune_from_pretrain."""
    import torch

    from vln_imagine_tpu.ckpt import convert as C

    states = torch.load(path, map_location="cpu", weights_only=False)
    assert "vln_bert" not in states, (
        f"'{path}' is an agent-save checkpoint; use "
        "load_reference_checkpoint for it")
    key_fn = (C.hamt_torch_to_flax_path if agent == "hamt"
              else C.duet_torch_to_flax_path)
    params, skipped = C.convert_state_dict(states, key_fn)
    return {"params": params, "skipped": skipped}


def load_pretrain_init(path: str, agent: str = "hamt",
                       source: str = "auto"):
    """BERT / LXMERT torch weights -> partial flax param tree for STARTING
    pre-training (the reference's --init_pretrained surgery:
    VLN-DUET/pretrain_src/train_r2r.py:110-139, HAMT main_r2r.py:131-147).
    source: 'bert' (HF bert-base-uncased state_dict), 'lxmert'
    (model_LXRT.pth), or 'auto' (detects LXMERT by its x_layers keys).
    Graft the result with ckpt.transfer.init_finetune_from_pretrain.

    For DUET, 'bert' deliberately improves on the reference: the
    reference's bert branch copies HF names verbatim (train_r2r.py:110-119)
    where 'encoder.layer.*' matches nothing in the model, so only the
    embeddings transfer.  Here the language layers are remapped onto
    lang_encoder too.  source='bert-verbatim' reproduces the reference's
    embeddings-only transfer exactly for trajectory-parity runs."""
    import torch

    from vln_imagine_tpu.ckpt import convert as C

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    if source == "auto":
        source = ("lxmert" if any("encoder.x_layers" in k for k in sd)
                  else "bert")
    # xlm-roberta-base (RxR recipe) ships ONE token-type row; the second row
    # is for image embeddings — duplicate exactly as train_r2r.py:115-118
    tt = next((k for k in sd if k.endswith(
        "embeddings.token_type_embeddings.weight")), None)
    if tt is not None and sd[tt].shape[0] == 1:
        sd = dict(sd)
        sd[tt] = torch.cat([sd[tt]] * 2, 0)
    if source == "lxmert":
        assert agent == "duet", "LXMERT init is the DUET recipe"
        sd = C.lxmert_remap(sd)
    elif agent == "duet" and source == "bert-verbatim":
        # reference-exact: keep HF names verbatim so only embeddings match
        sd = {k.replace("module.", ""): v for k, v in sd.items()}
    elif agent == "duet":
        sd = C.bert_remap_for_duet(sd)
    key_fn = (C.hamt_torch_to_flax_path if agent == "hamt"
              else C.duet_torch_to_flax_path)
    params, skipped = C.convert_state_dict(sd, key_fn)
    return {"params": params, "skipped": skipped, "source": source}
