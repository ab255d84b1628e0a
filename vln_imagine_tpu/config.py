"""Unified typed configuration tree.

The reference spreads configuration over three surfaces: ~60 argparse flags
(VLN-HAMT/finetune_src/r2r/parser.py:8-217), pretrain JSON overlays
(VLN-HAMT/pretrain_src/config/pretrain_r2r.json) and a mutated HuggingFace
PretrainedConfig (VLN-HAMT/finetune_src/models/vlnbert_init.py:37-76).  Here a
single dataclass tree covers all of them; presets reproduce the released run
configurations (scripts/run_r2r.sh in both stacks).
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any


@dataclass(frozen=True)
class ModelConfig:
    """Transformer core configuration.

    Mirrors the fields the reference reads off its mutated BertConfig
    (VLN-HAMT/finetune_src/models/vlnbert_init.py:37-76 and
    VLN-DUET/map_nav_src/models/vlnbert_init.py:13-77).
    """

    vocab_size: int = 30522
    hidden_size: int = 768
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    # LayerNorm eps is not a knob: BERT blocks are pinned at 1e-12 and DETR
    # pre-norm blocks at 1e-5 (models/bert.py) to hold checkpoint parity.
    hidden_dropout_prob: float = 0.1
    attention_probs_dropout_prob: float = 0.1
    pred_head_dropout_prob: float = 0.1
    hidden_act: str = "gelu_erf"  # exact erf gelu (vilmodel_cmt.py:27-33)

    # LXMERT-style layer counts (9 lang / 0 hist / 0 obs / 4 cross).
    num_l_layers: int = 9
    num_r_layers: int = 0
    num_h_layers: int = 0
    num_x_layers: int = 4
    num_pano_layers: int = 2  # HAMT hist pano sub-encoder / DUET pano encoder

    image_feat_size: int = 768
    angle_feat_size: int = 4
    obj_feat_size: int = 0

    max_action_steps: int = 50  # HAMT 50, DUET 100 (step-position vocab)

    # Behavioural switches shared by both stacks.
    no_lang_ca: bool = False
    update_lang_bert: bool = True
    fix_lang_embedding: bool = False
    fix_hist_embedding: bool = False
    fix_obs_embedding: bool = False
    fix_pano_embedding: bool = False
    fix_local_branch: bool = False
    act_pred_token: str = "ob_txt"  # HAMT head variants (vilmodel_cmt.py:1187-1199)

    # DUET-specific.
    graph_sprels: bool = True
    glocal_fuse: bool = True  # dynamic fusion sigma(W[gmap_cls; vp_cls])
    use_lang2visn_attn: bool = False
    fusion: str = "dynamic"  # local | global | avg | dynamic

    # Imagination modality (both stacks; parser.py:107-129).
    imagine_enc_pano: bool = True
    imagination_data_v2: bool = True
    bypass_imag_encoder: bool = True
    max_imagination_len: int = 20
    use_cosine_aux_loss: bool = True
    aux_loss_type: str = "cosine"  # cosine | infonce | margin
    cosine_weight: float = 0.5
    infonce_temperature: float = 0.3
    contrastive_margin_value: float = 1.0
    concat_imagine_with: str = "language"  # language | visual
    fix_imagine_embeds: bool = False
    fix_lang_inside_cosine_model: bool = False  # DUET: detach txt in aux loss
    no_loss_test: bool = False

    # On-the-fly imagination feature extraction (BASELINE config 4): run a
    # flax ViT inside the jitted fine-tune step on raw (preprocessed)
    # imagination images carried in EpisodeBatch.imagine_images, instead of
    # reading precomputed features.  'frozen' stops gradients and masks the
    # ViT out of the optimizer; 'trainable' fine-tunes it with the navigator.
    # (The reference only ever runs ViT-in-the-loop during pre-training,
    # pretrain_src/model/image_vilmodel.py:40-59; this extends it to the
    # fine-tune step.)
    e2e_imagination: str = "off"  # off | frozen | trainable
    e2e_vit_image_size: int = 224
    e2e_vit_patch_size: int = 16
    e2e_vit_layers: int = 12
    e2e_vit_heads: int = 12

    # Numerics: params always f32; matmul/attention compute dtype.
    compute_dtype: str = "bfloat16"
    # Fused pallas attention (TPU only; self-gates on backend + shape
    # support and falls back to the XLA path elsewhere).  Since the QKV
    # projections were packed into one matmul the transpose-free XLA path
    # wins every deterministic (eval) call at every batch size (measured
    # full-rollout A/B on v5e, see README Performance), so the kernel is
    # used only for dropout-active training calls, where drawing the
    # probs-dropout mask from the TPU per-core PRNG inside the kernel keeps
    # attention fused (models/bert.py MHAttention gates per call).
    use_pallas_attention: bool = True
    # Even for dropout-active calls, above this batch the relayout
    # transposes around the fused kernel cost more than the in-kernel
    # dropout saves; batches at or above the cutoff take the XLA path.
    pallas_attention_batch_cutoff: int = 64

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads


@dataclass(frozen=True)
class EnvConfig:
    """Compiled-environment capacities (fixed shapes for XLA)."""

    views: int = 36  # discretized 30-degree viewpoints
    max_candidates: int = 14  # max graph degree observed in MP3D is ~13
    # obs token capacity is derived: max_candidates + 1 (stop) + views
    # (envx.env.obs_tokens)
    max_nodes: int = 352  # max viewpoints per scan (padded across scans)
    max_action_len: int = 15  # HAMT episode cap (DUET also 15 in released cfg)
    max_instr_len: int = 60  # HAMT 60, DUET 200
    max_gt_path_len: int = 8  # R2R ground-truth paths are 4-7 nodes
    max_gmap_nodes: int = 96  # DUET topo-map node buffer (worst case ~1+T*K)
    error_margin: float = 3.0  # success threshold in metres (env.py:28)
    # HAMT observation token set (parser.py --ob_type, agent_cmt.py:499-503):
    # 'pano' = candidates + [STOP] + remaining pano views (released configs);
    # 'cand' = candidates + [STOP] only (views masked out of the obs stream)
    ob_type: str = "pano"


@dataclass(frozen=True)
class TrainConfig:
    lr: float = 1e-5
    optim: str = "adamw"
    weight_decay: float = 0.0
    batch_size: int = 8
    # Greedy-eval batch size (0 = use batch_size).  Eval is per-item
    # independent, so large batches are pure occupancy: the per-step
    # matmuls at bs 8 are [8*37, 768] slivers that leave the MXU mostly
    # idle (bench.py utilization_sweep measures the curve).  The released
    # full-scale presets set 128; tiny test configs keep 0.
    eval_batch_size: int = 0
    iters: int = 100_000
    log_every: int = 2000
    max_grad_norm: float = 40.0
    feat_dropout: float = 0.4
    # mask action logits of candidates whose node was already visited
    # (parser.py --no_cand_backtrack, agent_cmt.py:549-558)
    no_cand_backtrack: bool = False
    # DUET: only the current node counts as visited for the action mask —
    # revisiting graph nodes is allowed (--act_visited_nodes, agent.py:109)
    act_visited_nodes: bool = False
    # DUET: submissions carry per-node stop logits as 'details' and are
    # written as detail_<env>.json (--detailed_output, main_nav.py:384)
    detailed_output: bool = False
    ml_weight: float = 0.2
    teacher_weight: float = 1.0
    gamma: float = 0.9  # A2C discount (HAMT; DUET released config uses 0)
    entropy_loss_weight: float = 0.01
    normalize_loss: str = "total"  # total | batch | none
    ignoreid: int = -100
    train_alg: str = "imitation"  # imitation | dagger | rl (DUET), sample (HAMT IL+RL)
    expert_policy: str = "spl"  # spl | ndtw (DUET teacher)
    # DUET dagger exploration sampling (parser.py:19-20, agent.py:555-565):
    # greedy action, replaced by a uniform valid action w.p. 1-expl_max_ratio
    expl_sample: bool = False
    expl_max_ratio: float = 0.6
    # Pack the teacher-forced IL half and the sampled (RL) half of a train
    # step into ONE fused rollout of batch 2B instead of two sequential
    # batch-B rollouts.  The losses are numerically identical per half (aux
    # loss normalizes per half, CE/RL mask the other half).  Off by default:
    # at R2R shapes the separate IL rollout scans only max_gt_path_len (8)
    # steps while the fused rollout must scan the full RL horizon (15) for
    # everything, and the measured step time is 184ms fused vs 164ms
    # separate (bs 8, v5e).  Worth enabling only when the IL and RL horizons
    # are close (e.g. cvdn, where the IL scan already runs max_action_len).
    fused_sample_rollout: bool = False
    # Three-stage imagination warm-up (parser.py:112-113, main.py:200-278).
    experimental_warmup: bool = True
    experimental_warmup_type: str = "variant4"
    # stage END boundaries of the variant4 warm-up; -1 reproduces the
    # reference's hardcoded 0.25*iters / 0.5*iters (main.py:230,244)
    warmup_stage1_iters: int = -1  # train aux/imagine modules only until here
    warmup_stage2_iters: int = -1  # rest unfrozen at reduced lr until here
    seed: int = 0


@dataclass(frozen=True)
class PretrainConfig:
    """Task-mixing pretrain loop (pretrain_src/config/pretrain_r2r.json)."""

    tasks: tuple[str, ...] = ("mlm", "sap", "sar", "sprel", "mrc", "itm")
    mix_ratio: tuple[int, ...] = (5, 1, 1, 1, 2, 2)
    lr: float = 5e-5
    batch_size: int = 16
    num_train_steps: int = 200_000
    warmup_steps: int = 10_000
    gradient_accumulation_steps: int = 1
    max_grad_norm: float = 5.0
    log_steps: int = 1000
    valid_steps: int = 5000
    mlm_prob: float = 0.15
    mrc_prob: float = 0.15
    seed: int = 0


@dataclass(frozen=True)
class MeshConfig:
    """Device-mesh shape: axes are always ('data', 'model') — DP over the
    batch x TP over heads/ffn (parallel/mesh.py).  The CLI's --mesh-data /
    --mesh-model flags write here; FinetuneDriver reads it when no explicit
    mesh object is passed."""

    data_parallelism: int = 0  # 0: no mesh; -1: all devices on data axis
    model_parallelism: int = 1


@dataclass(frozen=True)
class Config:
    model: ModelConfig = field(default_factory=ModelConfig)
    env: EnvConfig = field(default_factory=EnvConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    pretrain: PretrainConfig = field(default_factory=PretrainConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)
    agent: str = "hamt"  # hamt | duet
    dataset: str = "r2r"  # r2r | r2r_back | r4r | rxr | cvdn | reverie | soon

    def replace(self, **kw: Any) -> "Config":
        return dataclasses.replace(self, **kw)


def _replace(cfg: Config, path: str, **kw: Any) -> Config:
    sub = dataclasses.replace(getattr(cfg, path), **kw)
    return dataclasses.replace(cfg, **{path: sub})


def hamt_r2r_config() -> Config:
    """Released HAMT-Imagine R2R configuration
    (VLN-HAMT/finetune_src/scripts/run_r2r.sh:1-83)."""
    cfg = Config(agent="hamt")
    cfg = _replace(
        cfg, "model",
        fix_lang_embedding=True, fix_hist_embedding=True,
        max_action_steps=50, act_pred_token="ob_txt",
    )
    cfg = _replace(cfg, "env", max_instr_len=60)
    # IL (teacher-forced, ml_weight) + sampled A2C per iteration
    # (agent_cmt.py:807-832, feedback='sample').  eval_batch_size: greedy
    # eval is per-item independent, so batching is pure occupancy; 64 is
    # the measured throughput peak of the fixed-horizon rollout on v5e
    # (sweep 8/32/64/128/512 -> 404/476/483/446/333 eps/s,
    # bench_full.json utilization_sweep.hamt, r05.  The reference
    # evaluates at train bs 8, main.py:329-344 — its rollout is a host loop)
    cfg = _replace(cfg, "train", train_alg="sample", eval_batch_size=64)
    return cfg


def duet_r2r_config() -> Config:
    """Released DUET-Imagine R2R configuration
    (VLN-DUET/map_nav_src/scripts/run_r2r.sh:1-87)."""
    cfg = Config(agent="duet")
    cfg = _replace(
        cfg, "model",
        max_action_steps=100, graph_sprels=True, glocal_fuse=True,
        fix_lang_inside_cosine_model=True, fusion="dynamic",
    )
    cfg = _replace(cfg, "env", max_instr_len=200)
    # eval_batch_size 64: the DUET fixed-horizon eval sweep on v5e peaks at
    # batch 64 (242/289/305/269 eps/s at 8/32/64/128 — bench_full.json
    # utilization_sweep.duet, r05) and regresses past it, same shape as the
    # HAMT curve above
    cfg = _replace(cfg, "train", train_alg="dagger", gamma=0.0,
                   eval_batch_size=64)
    return cfg


def rxr_config() -> Config:
    """RxR multilingual preset (HAMT stack, xlm-roberta text:
    vlnbert_init.py:6-11, pretrain config/rxr_xlm_model_config.json).

    RxR guide paths are much longer than R2R's 4-7 nodes (up to ~20), so the
    gt-path buffer and the episode horizon are sized up — a too-small
    max_gt_path_len would silently shift gt_path[-1] off the true goal,
    corrupting the teacher, DTW reward shaping and nDTW/SDTW metrics."""
    cfg = hamt_r2r_config().replace(dataset="rxr")
    cfg = _replace(cfg, "model", vocab_size=250_002,
                   max_position_embeddings=512, type_vocab_size=2)
    cfg = _replace(cfg, "env", max_instr_len=250, max_gt_path_len=20,
                   max_action_len=20)
    return cfg


def r4r_config(agent: str = "duet") -> Config:
    """R4R preset: paths are two joined R2R paths (~10-15 nodes), so the
    gt-path buffer grows while the action horizon stays 15
    (VLN-DUET/map_nav_src/scripts/run_r4r.sh:29,36-37: --expert_policy spl
    --max_action_len 15 --max_instr_len 200)."""
    cfg = (duet_r2r_config() if agent == "duet"
           else hamt_r2r_config()).replace(dataset="r4r")
    cfg = _replace(cfg, "env", max_gt_path_len=16, max_action_len=15,
                   max_instr_len=200 if agent == "duet" else 60)
    return cfg


def cvdn_config() -> Config:
    """CVDN/NDH preset (HAMT stack, finetune_src/cvdn/parser.py:32-33:
    --max_instr_len 80 --max_action_len 15).  NDH supervision paths are the
    full shortest path to a sampled goal pano (cvdn/env.py:30-45) and
    routinely exceed 8 nodes, so the gt-path buffer is sized to the NDH
    path-length distribution; episodes_from_annotations raises (rather than
    silently truncating) if a path still overflows."""
    cfg = hamt_r2r_config().replace(dataset="cvdn")
    cfg = _replace(cfg, "env", max_instr_len=80, max_gt_path_len=25,
                   max_action_len=15)
    return cfg


def soon_config() -> Config:
    """SOON preset (DUET stack, map_nav_src/scripts/run_soon.sh:39-41:
    --max_action_len 20 --max_instr_len 100 --max_objects 100); SOON
    trajectories run longer than R2R's, hence the 20-step horizon and a
    larger gt-path buffer."""
    cfg = reverie_config("duet").replace(dataset="soon")
    cfg = _replace(cfg, "env", max_instr_len=100, max_action_len=20,
                   max_gt_path_len=24)
    return cfg


def reverie_config(agent: str = "duet") -> Config:
    """REVERIE object-grounding presets.

    agent='duet': DUET stack w/ objects + the single-imagination REVERIE
    variant (map_nav_src/scripts/run_reverie.sh, vilmodel.py:781-888).
    agent='hamt': NavRefCMT (finetune_src/reverie/vlnbert_navref.py) — a
    separate object token segment in the visual stream and a ref_object
    grounding head; the reference NavRef model carries no imagination
    modules, so imagination/aux-loss are off."""
    if agent == "duet":
        cfg = duet_r2r_config().replace(dataset="reverie")
        cfg = _replace(cfg, "model", obj_feat_size=768, max_imagination_len=1)
        # run_reverie.sh: --max_instr_len 200; run_soon.sh uses 100 and
        # --max_objects 100 (override per dataset from the CLI)
        cfg = _replace(cfg, "env", max_instr_len=200)
    else:
        cfg = hamt_r2r_config().replace(dataset="reverie")
        # released NavRef recipe (scripts/run_reverie.sh): --no_lang_ca is
        # PASSED (text never updates through the x-layers) and
        # --fix_lang_embedding/--fix_hist_embedding are NOT (unlike the R2R
        # recipe, REVERIE fine-tunes both); NavRefCMT hardcodes act_logits =
        # next_action(ob * hist[CLS]) (vlnbert_navref.py:150)
        cfg = _replace(cfg, "model", obj_feat_size=768,
                       imagine_enc_pano=False, use_cosine_aux_loss=False,
                       no_lang_ca=True, fix_lang_embedding=False,
                       fix_hist_embedding=False, act_pred_token="ob_hist")
        # finetune_src/scripts/run_reverie.sh: --max_instr_len 60
        cfg = _replace(cfg, "env", max_instr_len=60)
    return cfg


def tiny_test_config(agent: str = "hamt") -> Config:
    """Small shapes for unit tests / CPU mesh dry-runs."""
    cfg = hamt_r2r_config() if agent == "hamt" else duet_r2r_config()
    cfg = _replace(
        cfg, "model",
        hidden_size=64, num_attention_heads=4, intermediate_size=128,
        num_l_layers=2, num_x_layers=2, num_pano_layers=1,
        image_feat_size=32, vocab_size=128, max_position_embeddings=64,
        max_imagination_len=4, max_action_steps=16,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        pred_head_dropout_prob=0.0, compute_dtype="float32",
        e2e_vit_image_size=16, e2e_vit_patch_size=8, e2e_vit_layers=2,
        e2e_vit_heads=4,
    )
    cfg = _replace(
        cfg, "env",
        max_candidates=7, max_nodes=24, views=12,
        max_action_len=6, max_instr_len=16, max_gt_path_len=6,
        max_gmap_nodes=24,
    )
    cfg = _replace(cfg, "train", batch_size=2, feat_dropout=0.0)
    return cfg


def config_to_json(cfg: Config) -> str:
    return json.dumps(dataclasses.asdict(cfg), indent=2, default=str)


def config_from_json(text: str) -> Config:
    raw = json.loads(text)

    def build(cls, data):
        fields = {f.name: f for f in dataclasses.fields(cls)}
        kwargs = {}
        for k, v in data.items():
            if k not in fields:
                continue
            ftype = fields[k].type
            if isinstance(v, dict):
                sub_cls = {
                    "model": ModelConfig, "env": EnvConfig, "train": TrainConfig,
                    "pretrain": PretrainConfig, "mesh": MeshConfig,
                }.get(k)
                kwargs[k] = build(sub_cls, v) if sub_cls else v
            elif isinstance(v, list):
                kwargs[k] = tuple(v)
            else:
                kwargs[k] = v
        del ftype
        return cls(**kwargs)

    return build(Config, raw)
