"""Throughput benchmark at reference scale (hidden 768, 9L+4X, batch 8,
36-view obs, 15-step episodes, 60-token instructions, 20 imagination tokens).

Prints ONE JSON line.  Primary metric: HAMT-Imagine greedy-eval episodes/sec
on one chip.  vs_baseline is MEASURED, not assumed: the ACTUAL reference
torch NavCMT (VLN-HAMT/finetune_src/models/vilmodel_cmt.py, importable in
this environment) is driven through the same greedy rollout over the same
synthetic world on this host's CPU (graph-only host sim in place of
MatterSim, faithful per-step numpy obs packing per agent_cmt.py:498-658).

Because the reference cannot run on TPU, the line also carries
`same_host_vs_baseline`: our jax path pinned to this host's CPU against the
torch reference on the same CPU — the hardware-normalized anchor — plus the
DUET eval and both train-step metrics under `extras`.
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

REF_HAMT = "/root/reference/VLN-HAMT/finetune_src"

BATCH = 8
STEPS = 15
L_TXT = 60
N_IMAG = 20


def _world_and_episodes(cfg, batch: int = BATCH):
    from vln_imagine_tpu.envx import synthetic_world, synthetic_episodes

    world_np, graphs = synthetic_world(
        num_scans=2, num_nodes=96, max_candidates=cfg.env.max_candidates,
        views=36, feat_dim=cfg.model.image_feat_size, seed=0)
    ep_np = synthetic_episodes(
        world_np, batch=batch, max_gt_path_len=cfg.env.max_gt_path_len,
        max_instr_len=cfg.env.max_instr_len,
        max_imaginations=cfg.model.max_imagination_len,
        vocab_size=cfg.model.vocab_size, feat_dim=cfg.model.hidden_size,
        seed=1)
    return world_np, graphs, ep_np


# peak per-chip specs for MFU / roofline accounting (bf16 matmul peak,
# HBM bandwidth); device_kind prefixes as reported by jax
_CHIP_PEAKS = {
    "TPU v5 lite": (197e12, 819e9),    # v5e
    "TPU v5e": (197e12, 819e9),
    "TPU v5p": (459e12, 2765e9),
    "TPU v4": (275e12, 1228e9),
    "TPU v6 lite": (918e12, 1640e9),   # v6e (Trillium)
}


def _chip_peaks():
    kind = jax.devices()[0].device_kind
    for prefix, peaks in _CHIP_PEAKS.items():
        if kind.startswith(prefix):
            return peaks
    return None, None


def _make_cost_model(costs: dict):
    """costs: {batch: {flops_t1, flops_t2, bytes_t1, bytes_t2}} from the
    flops: lanes.  Returns f(B, T) -> (flops, bytes) using
    cost(B, T) = Pw + B*Pa + T*(Bw + B*Ba): the two unroll depths separate
    prologue from per-step body, the two batch sizes separate B-independent
    weight traffic from per-item activation traffic.  With one batch point
    the model is linear in B (exact for flops; bytes then overcount the
    weight term at large B)."""
    def solve(key):
        pts = {}
        for b, c in costs.items():
            body = c[f"{key}_t2"] - c[f"{key}_t1"]
            pts[b] = (c[f"{key}_t1"] - body, body)  # (prologue, body)
        if len(pts) >= 2:
            (b0, (p0, s0)), (b1, (p1, s1)) = sorted(pts.items())[:2]
            sa = (s1 - s0) / (b1 - b0)
            pa = (p1 - p0) / (b1 - b0)
            sw, pw = s0 - b0 * sa, p0 - b0 * pa
            return lambda B, T: pw + B * pa + T * (sw + B * sa)
        (b0, (p0, s0)), = pts.items()
        return lambda B, T: (p0 + T * s0) * (B / b0)

    f, by = solve("flops"), solve("bytes")
    return lambda B, T: (f(B, T), by(B, T))


def _program_costs(jitted, *args):
    """flops + bytes accessed of one compiled program via XLA cost analysis
    (None, None when the backend doesn't report them)."""
    try:
        ca = jitted.lower(*args).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0] if ca else {}
        flops = ca.get("flops")
        byts = ca.get("bytes accessed")
        return (float(flops) if flops else None,
                float(byts) if byts else None)
    except Exception as e:  # noqa: BLE001 - cost analysis is best-effort
        print(f"# cost_analysis failed: {e!r}", file=sys.stderr)
        return None, None


def _time_fn(fn, iters):
    out = fn(0)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(iters):
        out = fn(i + 1)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def _cpu_init(trainer_cls, cfg, world_np, ep_np):
    """Initialize params/optimizer state on the host CPU (7x faster than
    tracing the init program over the TPU tunnel on this 1-core host) and
    hand the state back as host arrays."""
    from vln_imagine_tpu.config import _replace

    cpu = jax.devices("cpu")[0]
    cfg_cpu = _replace(cfg, "model", use_pallas_attention=False)
    with jax.default_device(cpu):
        world_c = jax.tree.map(
            lambda x: jax.device_put(jnp.asarray(x), cpu), world_np)
        ep_c = jax.tree.map(
            lambda x: jax.device_put(jnp.asarray(x), cpu), ep_np)
        trainer = trainer_cls(cfg_cpu, world_c)
        state = trainer.init_state(ep_c)
    return jax.tree.map(np.asarray, state)


class _AgentLane:
    """One agent's measurement lane on a device: CPU-side init (fast on this
    1-core host) + device transfer, then eval/train timings on demand."""

    def __init__(self, agent: str, device=None, batch: int = BATCH):
        from vln_imagine_tpu.config import (duet_r2r_config, hamt_r2r_config,
                                            _replace)
        from vln_imagine_tpu.train.trainer import HamtTrainer
        from vln_imagine_tpu.train.trainer_duet import DuetTrainer

        self.agent = agent
        self.batch = batch
        self.on_cpu = device == "cpu"
        self.dev = jax.devices("cpu")[0] if self.on_cpu else jax.devices()[0]
        maker = hamt_r2r_config if agent == "hamt" else duet_r2r_config
        trainer_cls = HamtTrainer if agent == "hamt" else DuetTrainer
        # CPU lane runs f32: bf16 is emulated (slow) on CPU and the torch
        # reference baseline is f32, so f32 keeps the anchor apples-to-apples
        cfg = _replace(maker(), "model", vocab_size=30522,
                       use_pallas_attention=not self.on_cpu,
                       **({"compute_dtype": "float32"} if self.on_cpu
                          else {}))
        world_np, _, ep_np = _world_and_episodes(cfg, batch=batch)
        state = _cpu_init(trainer_cls, cfg, world_np, ep_np)
        dev = self.dev
        self.world = jax.tree.map(
            lambda x: jax.device_put(jnp.asarray(x), dev), world_np)
        self.ep = jax.tree.map(
            lambda x: jax.device_put(jnp.asarray(x), dev), ep_np)
        self.state = jax.tree.map(lambda x: jax.device_put(x, dev), state)
        self.trainer = trainer_cls(cfg, self.world)
        self.trainer.tx = self.trainer._tx_builder(self.state.params)

    def eval_eps(self, iters: int, fixed_horizon: bool = False) -> float:
        """fixed_horizon: run all STEPS steps (no early exit) — used for the
        same-host anchor so both frameworks do identical work regardless of
        what the random-weight policy's stop behaviour happens to be."""
        with jax.default_device(self.dev):
            if fixed_horizon and self.agent == "hamt":
                from vln_imagine_tpu.train.rollout_hamt import rollout_hamt
                trainer, world, cfg = self.trainer, self.world, self.trainer.cfg

                @jax.jit
                def step(params, ep, rng):
                    res = rollout_hamt(trainer.model, trainer.critic, params,
                                       None, world, ep, cfg, rng,
                                       feedback="argmax", train_ml=None,
                                       train_rl=False, deterministic=True,
                                       early_exit=False)
                    return res.path_nodes, res.path_len
            elif fixed_horizon:
                from vln_imagine_tpu.train.rollout_duet import rollout_duet
                trainer, world, cfg = self.trainer, self.world, self.trainer.cfg

                @jax.jit
                def step(params, ep, rng):
                    res = rollout_duet(trainer.model, params, world, ep, cfg,
                                       rng, feedback="argmax", train_ml=None,
                                       deterministic=True, early_exit=False)
                    return res.path_nodes, res.path_len
            else:
                step = self.trainer.make_eval_step()
            rng = jax.random.PRNGKey(0)
            dt = _time_fn(
                lambda i: step(self.state.params, self.ep,
                               jax.random.fold_in(rng, i)), iters)
            self._last_step = step
            self._last_dt = dt
        return self.batch / dt

    def eval_costs(self):
        """XLA cost analysis of the last-timed eval program: (flops, bytes)
        per program execution; call after eval_eps."""
        rng = jax.random.PRNGKey(0)
        return _program_costs(self._last_step, self.state.params, self.ep,
                              rng)

    def unrolled_costs(self, T: int):
        """(flops, bytes) of the fixed-horizon eval program UNROLLED to T
        steps, with pallas attention off so HLO cost analysis counts the
        attention math (custom calls report zero).  HLO cost analysis counts
        a loop body once regardless of trip count, so exact per-program
        numbers come from differencing two short unrolled programs:
        body = c(2) - c(1), prologue = c(1) - body (bench main).  Compiled,
        never executed."""
        from vln_imagine_tpu.config import _replace
        from vln_imagine_tpu.train.rollout_duet import rollout_duet
        from vln_imagine_tpu.train.rollout_hamt import rollout_hamt

        cfg = _replace(self.trainer.cfg, "model", use_pallas_attention=False)
        cls = type(self.trainer)
        shadow = cls(cfg, self.world)
        if self.agent == "hamt":
            @jax.jit
            def fn(params, ep, rng):
                res = rollout_hamt(shadow.model, shadow.critic, params, None,
                                   self.world, ep, cfg, rng,
                                   feedback="argmax", train_ml=None,
                                   train_rl=False, deterministic=True,
                                   early_exit=False, max_steps=T, unroll=True)
                return res.path_nodes, res.path_len
        else:
            @jax.jit
            def fn(params, ep, rng):
                res = rollout_duet(shadow.model, params, self.world, ep, cfg,
                                   rng, feedback="argmax", train_ml=None,
                                   deterministic=True, early_exit=False,
                                   max_steps=T, unroll=True)
                return res.path_nodes, res.path_len
        return _program_costs(fn, self.state.params, self.ep,
                              jax.random.PRNGKey(0))

    def train_ms(self, iters: int = 10) -> float:
        with jax.default_device(self.dev):
            if self.agent == "hamt":
                step = self.trainer.make_train_step("sample", donate=False)
            else:
                step = self.trainer.make_train_step(donate=False)
            # both agents: (state, ep_il, ep_rl/student, rng)
            fn = lambda i: step(self.state, self.ep, self.ep,  # noqa: E731
                                jax.random.fold_in(
                                    jax.random.PRNGKey(1), i))[1]
            dt = _time_fn(fn, iters)
        return dt * 1000.0

    def _fixed_train_step(self, T: int, unroll: bool = False,
                          pallas: bool = True):
        """A jitted train step (fwd + bwd + optimizer update) whose BOTH
        rollouts run a uniform fixed horizon T, mirroring the product loss
        structure (trainer.py:100-153 / trainer_duet.py:102-148: teacher IL
        rollout + sampled RL/dagger rollout) but with one horizon so
        cost(T) = prologue + T*body holds for unrolled-program differencing
        (same method as unrolled_costs)."""
        import optax

        from vln_imagine_tpu.config import _replace
        from vln_imagine_tpu.train.rollout_duet import rollout_duet
        from vln_imagine_tpu.train.rollout_hamt import rollout_hamt

        cfg = self.trainer.cfg
        if not pallas:
            cfg = _replace(cfg, "model", use_pallas_attention=False)
        shadow = type(self.trainer)(cfg, self.world)
        shadow.tx = shadow._tx_builder(self.state.params)
        tx, world = shadow.tx, self.world

        if self.agent == "hamt":
            model, critic, critic_tx = (shadow.model, shadow.critic,
                                        shadow.critic_tx)

            def loss_fn(params, critic_params, ep, rng):
                r1, r2 = jax.random.split(rng)
                res_il = rollout_hamt(
                    model, critic, params, critic_params, world, ep, cfg, r1,
                    feedback="teacher", train_ml=cfg.train.ml_weight,
                    train_rl=False, deterministic=False, max_steps=T,
                    unroll=unroll)
                res_rl = rollout_hamt(
                    model, critic, params, critic_params, world, ep, cfg, r2,
                    feedback="sample", train_ml=None, train_rl=True,
                    deterministic=False, max_steps=T, unroll=unroll)
                return res_il.loss + res_rl.loss

            @jax.jit
            def step(state, ep, rng):
                loss, (g, gc) = jax.value_and_grad(loss_fn, argnums=(0, 1))(
                    state.params, state.critic_params, ep, rng)
                updates, _ = tx.update(g, state.opt_state, state.params)
                params = optax.apply_updates(state.params, updates)
                c_up, _ = critic_tx.update(gc, state.critic_opt_state,
                                           state.critic_params)
                cparams = optax.apply_updates(state.critic_params, c_up)
                return loss, params, cparams
        else:
            model = shadow.model

            def loss_fn(params, ep, rng):
                r1, r2 = jax.random.split(rng)
                res_il = rollout_duet(
                    model, params, world, ep, cfg, r1, feedback="teacher",
                    train_ml=cfg.train.ml_weight, deterministic=False,
                    max_steps=T, unroll=unroll)
                res_dg = rollout_duet(
                    model, params, world, ep, cfg, r2, feedback="sample",
                    train_ml=1.0, deterministic=False, max_steps=T,
                    unroll=unroll)
                return res_il.loss + res_dg.loss

            @jax.jit
            def step(state, ep, rng):
                loss, g = jax.value_and_grad(loss_fn)(state.params, ep, rng)
                updates, _ = tx.update(g, state.opt_state, state.params)
                params = optax.apply_updates(state.params, updates)
                return loss, params
        return step

    def train_fixed_ms(self, iters: int = 8, T: int = STEPS) -> float:
        """Wall ms/step of the fixed-horizon train program (the timing half
        of the train-MFU measurement; pair with train_unrolled_costs)."""
        with jax.default_device(self.dev):
            step = self._fixed_train_step(T=T)
            rng = jax.random.PRNGKey(2)
            dt = _time_fn(
                lambda i: step(self.state, self.ep,
                               jax.random.fold_in(rng, i)), iters)
        return dt * 1000.0

    def train_unrolled_costs(self, T: int):
        """(flops, bytes) of the fixed-horizon train program unrolled to T
        steps (pallas off so HLO cost analysis counts the attention math).
        Compiled, never executed."""
        fn = self._fixed_train_step(T=T, unroll=True, pallas=False)
        return _program_costs(fn, self.state, self.ep, jax.random.PRNGKey(2))


def measure_reference_torch_cpu(max_seconds: float = 150.0):
    """Greedy-eval episodes/sec of the ACTUAL reference torch NavCMT on this
    host CPU over the same synthetic world: language + imagine once, then
    per-step numpy obs packing -> 'visual' forward -> argmax -> 'history'
    update -> host-sim step (agent_cmt.py:371-658 shape of work)."""
    import torch

    for name in [n for n in sys.modules
                 if n == "models" or n.startswith("models.")]:
        del sys.modules[name]
    sys.path.insert(0, REF_HAMT)
    try:
        from models.vilmodel_cmt import NavCMT
    finally:
        sys.path.remove(REF_HAMT)
    from transformers import BertConfig

    from vln_imagine_tpu.config import hamt_r2r_config, _replace

    cfg = _replace(hamt_r2r_config(), "model", vocab_size=30522)
    world_np, graphs, ep_np = _world_and_episodes(cfg)

    c = BertConfig(vocab_size=30522, hidden_size=768, num_hidden_layers=2,
                   num_attention_heads=12, intermediate_size=3072,
                   hidden_act="gelu", hidden_dropout_prob=0.1,
                   attention_probs_dropout_prob=0.1, type_vocab_size=2,
                   layer_norm_eps=1e-12)
    c.image_feat_size = 768
    c.angle_feat_size = 4
    c.num_l_layers, c.num_r_layers, c.num_h_layers, c.num_x_layers = 9, 0, 0, 4
    c.hist_enc_pano, c.num_h_pano_layers = True, 2
    c.fix_lang_embedding = c.fix_hist_embedding = c.fix_obs_embedding = False
    c.update_lang_bert = True
    c.output_attentions = True
    c.pred_head_dropout_prob = 0.1
    c.no_lang_ca = False
    c.act_pred_token = "ob_txt"
    c.max_action_steps = 50
    c.imagine_enc_pano = True
    c.max_imagination_len = N_IMAG
    c.fix_imagine_embeds = False
    c.bypass_imag_encoder = True
    c.use_cosine_aux_loss = True
    c.aux_loss_type = "cosine"
    c.infonce_temperature = 0.3
    c.contrastive_margin_value = 1.0
    c.concat_imagine_with = "language"
    c.no_loss_test = False
    torch.manual_seed(0)  # deterministic weights -> deterministic work
    model = NavCMT(c).eval()

    from vln_imagine_tpu.envx.hostsim import GraphSimulator

    feat = np.asarray(world_np.feat)        # [S, N, V, 768]
    adj = np.asarray(world_np.adj)
    adj_valid = np.asarray(world_np.adj_valid)
    pointid = np.asarray(world_np.cand_pointid)
    heading = np.asarray(world_np.cand_heading)
    elev = np.asarray(world_np.cand_elevation)
    scans = np.asarray(ep_np.scan)
    starts = np.asarray(ep_np.start_node)
    V, K = 36, adj.shape[-1]

    rng = np.random.default_rng(0)
    txt_ids = torch.from_numpy(np.asarray(ep_np.txt_ids)[:, :L_TXT]).long()
    txt_masks = torch.from_numpy(np.asarray(ep_np.txt_mask)[:, :L_TXT]).float()
    imag = torch.from_numpy(
        rng.standard_normal((BATCH, N_IMAG, 768)).astype(np.float32))
    imag_mask = torch.from_numpy(np.asarray(ep_np.imagine_mask)).float()

    sims = [GraphSimulator({g.scan_id: g for g in graphs}) for _ in
            range(BATCH)]

    def pack_obs(nodes):
        """Faithful _cand_pano_feature_variable packing (agent_cmt.py:130):
        candidates + [STOP] + unclaimed pano views, feature+angle per token,
        assembled in numpy per item then padded + copied to torch."""
        per_img, per_ang, per_nav = [], [], []
        for b in range(BATCH):
            s, n = scans[b], nodes[b]
            f = feat[s, n]
            cand_k = np.flatnonzero(adj_valid[s, n])
            used = set(int(pointid[s, n, k]) for k in cand_k)
            rest = [v for v in range(V) if v not in used]
            img = np.concatenate(
                [f[pointid[s, n, cand_k]], np.zeros((1, 768), np.float32),
                 f[rest]], 0)
            ang = np.zeros((img.shape[0], 4), np.float32)
            ang[:len(cand_k), 0] = np.sin(heading[s, n, cand_k])
            ang[:len(cand_k), 1] = np.cos(heading[s, n, cand_k])
            ang[:len(cand_k), 2] = np.sin(elev[s, n, cand_k])
            nav = np.zeros((img.shape[0],), np.int64)
            nav[:len(cand_k)] = 1
            nav[len(cand_k)] = 2
            per_img.append(img)
            per_ang.append(ang)
            per_nav.append(nav)
        T_obs = max(x.shape[0] for x in per_img)
        ob_img = np.zeros((BATCH, T_obs, 768), np.float32)
        ob_ang = np.zeros((BATCH, T_obs, 4), np.float32)
        ob_nav = np.zeros((BATCH, T_obs), np.int64)
        ob_mask = np.zeros((BATCH, T_obs), np.float32)
        for b in range(BATCH):
            L = per_img[b].shape[0]
            ob_img[b, :L] = per_img[b]
            ob_ang[b, :L] = per_ang[b]
            ob_nav[b, :L] = per_nav[b]
            ob_mask[b, :L] = 1.0
        return (torch.from_numpy(ob_img), torch.from_numpy(ob_ang),
                torch.from_numpy(ob_nav), torch.from_numpy(ob_mask))

    episodes = 0
    t0 = time.perf_counter()
    with torch.no_grad():
        while time.perf_counter() - t0 < max_seconds and episodes < 2 * BATCH:
            nodes = starts.copy()
            for b in range(BATCH):
                g = graphs[scans[b]]
                sims[b].newEpisode(g.scan_id, g.node_ids[nodes[b]], 0.0, 0.0)
            txt = model("language", txt_ids=txt_ids, txt_masks=txt_masks)
            imagine = model("imagine", imagine_pano_img_feats=imag)
            hist = model("history").expand(BATCH, -1).unsqueeze(1)
            ended = np.zeros(BATCH, bool)
            for t in range(STEPS):
                ob_img, ob_ang, ob_nav, ob_mask = pack_obs(nodes)
                act_logits, _, _, _ = model(
                    "visual", txt_embeds=txt, txt_masks=txt_masks,
                    hist_embeds=hist,
                    hist_masks=torch.ones(BATCH, hist.size(1)),
                    ob_img_feats=ob_img, ob_ang_feats=ob_ang,
                    ob_nav_types=ob_nav, ob_masks=ob_mask,
                    imagine_embeds=imagine, imagine_masks=imag_mask)
                acts = act_logits.argmax(-1).numpy()
                new_hist = model(
                    "history",
                    hist_img_feats=ob_img[:, 0],
                    hist_ang_feats=ob_ang[:, 0],
                    hist_pano_img_feats=torch.from_numpy(
                        feat[scans, nodes]),
                    hist_pano_ang_feats=torch.zeros(BATCH, V, 4),
                    ob_step_ids=torch.full((BATCH,), t, dtype=torch.long))
                hist = torch.cat([hist, new_hist.unsqueeze(1)], 1)
                for b in range(BATCH):
                    if ended[b]:
                        continue
                    s, n = scans[b], nodes[b]
                    cand_k = np.flatnonzero(adj_valid[s, n])
                    if acts[b] >= len(cand_k) or ob_nav[b, acts[b]] != 1:
                        ended[b] = True  # stop token or non-candidate
                        continue
                    nxt = int(adj[s, n, cand_k[acts[b]]])
                    sims[b].makeAction(0, float(heading[s, n,
                                                        cand_k[acts[b]]]), 0.0)
                    nodes[b] = nxt
                # NO early break: run the full fixed horizon so the measured
                # work matches the jax lanes (which pad every episode to
                # STEPS steps); ended items still get batched forwards,
                # exactly like the padded XLA program.
            episodes += BATCH
    dt = time.perf_counter() - t0
    return episodes / dt


_partial: dict = {}


def _emit_partial(signum=None, frame=None):
    """Hard-deadline fallback (SIGALRM): a blocked device call over the TPU
    tunnel cannot be preempted by the python-level budget guards, so always
    emit a JSON line with whatever was measured before the deadline."""
    record = {
        "metric": "hamt_eval_episodes_per_sec_per_chip",
        "value": _partial.get("value"),
        "unit": "episodes/s",
        "vs_baseline": _partial.get("vs_baseline"),
        "tunnel_stall": True,
        "note": "partial: hard deadline hit (TPU tunnel stall); "
                f"stages done: {sorted(_partial)}",
    }
    try:
        record = _merge_full_run(record, _partial.get("device_kind"))
    except Exception:
        pass
    print(json.dumps(record), flush=True)
    # exit clean only when a headline value was actually measured; a stall
    # before any measurement is a failed run (the JSON flags carry the
    # environmental context either way)
    os._exit(0 if _partial.get("value") is not None else 2)


def _enable_cache():
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/vln_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass


_FULL_RUN_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "bench_full.json")


def _code_hash():
    """Content hash over everything that shapes the measured programs, so a
    cached full-run artifact is only ever merged into a budgeted run of the
    SAME code (any compute-path edit invalidates it)."""
    import hashlib

    root = os.path.dirname(os.path.abspath(__file__))
    h = hashlib.sha256()
    paths = [os.path.abspath(__file__)]
    pkg = os.path.join(root, "vln_imagine_tpu")
    for dirpath, _, names in sorted(os.walk(pkg)):
        for n in sorted(names):
            if n.endswith(".py"):
                paths.append(os.path.join(dirpath, n))
    for p in paths:
        with open(p, "rb") as f:
            h.update(p.encode())
            h.update(f.read())
    return h.hexdigest()[:16]


MERGE_MAX_AGE_DAYS = 14


def _merge_full_run(record, device_kind=None):
    """Fill lanes the soft budget cut with measurements from this round's
    unbudgeted `bench.py --full` run of the SAME code on the SAME chip
    (bench_full.json).  Every merged field is named in
    record['merged_from_full_run'] with the capture timestamp — nothing is
    fabricated, it is a measurement cache keyed on (code hash, device kind)
    with a capture-age bound."""
    try:
        with open(_FULL_RUN_PATH) as f:
            full = json.load(f)
    except Exception:
        return record
    if full.get("code_hash") != _code_hash():
        return record
    # SAME-chip guard: the full run records its device_kind; refuse to merge
    # when it is absent or doesn't match the chip this run just probed
    if not full.get("device_kind") or (device_kind is not None and
                                       full["device_kind"] != device_kind):
        return record
    try:
        import datetime

        captured = datetime.datetime.fromisoformat(full["captured_at"])
        age = datetime.datetime.now(datetime.timezone.utc) - captured
        if age > datetime.timedelta(days=MERGE_MAX_AGE_DAYS):
            return record
    except Exception:
        return record
    src = full.get("record", {})
    merged = []

    def fill(dst, ref, prefix):
        for k, v in ref.items():
            if isinstance(v, dict) and isinstance(dst.get(k), dict):
                fill(dst[k], v, f"{prefix}{k}.")
            elif dst.get(k) is None and v is not None:
                dst[k] = v
                merged.append(f"{prefix}{k}")

    for key in ("baseline", "extras"):
        if isinstance(src.get(key), dict):
            record.setdefault(key, {})
            if isinstance(record[key], dict):
                fill(record[key], src[key], key + ".")
    if record.get("utilization_sweep") is None and \
            src.get("utilization_sweep") is not None:
        record["utilization_sweep"] = src["utilization_sweep"]
        merged.append("utilization_sweep")
    # vs_baseline is fixed_horizon/torch_cpu: merge it only when BOTH of its
    # inputs also come from the full run (otherwise the ratio would mix this
    # run's numbers with the cache's)
    if (record.get("vs_baseline") is None
            and src.get("vs_baseline") is not None
            and "baseline.ours_tpu_fixed_horizon_eps_per_sec" in merged
            and "baseline.reference_torch_cpu_eps_per_sec" in merged):
        record["vs_baseline"] = src["vs_baseline"]
        merged.append("vs_baseline")
    if merged:
        record["merged_from_full_run"] = {
            "captured_at": full.get("captured_at"),
            "code_hash": full.get("code_hash"),
            "fields": merged,
            "note": "lanes the soft budget cut, measured by this round's "
                    "unbudgeted `bench.py --full` run of the same code on "
                    "the same chip",
        }
    return record


def _fixed_from_sweep(sweep, batch=BATCH):
    """The sweep's batch-BATCH hamt point measures the SAME program as the
    hamt_fixed lane (fixed-horizon eval at BATCH); when that lane was cut by
    a cold-cache compile timeout, the sweep measurement stands in."""
    for p in sweep.get("hamt") or []:
        if p.get("batch") == batch and p.get("value"):
            return p["value"]
    return None


def _force_cpu():
    """CPU-only lanes must never touch the (possibly stalled) TPU backend.
    The axon site config overrides JAX_PLATFORMS, so go through jax.config."""
    jax.config.update("jax_platforms", "cpu")


def _lane_main(lane: str):
    """One measurement in a fresh process.  Interleaving different compiled
    programs over the TPU tunnel poisons the next program's steady state
    4-15x (program reload), so every lane beyond the headline runs alone in
    its own process and reports one JSON line on stdout."""
    _enable_cache()
    seconds = float(os.environ.get("VLN_LANE_SECONDS", "60"))
    if lane == "probe":
        # liveness: one tiny transfer + op + READBACK; no compile-heavy
        # work.  The readback matters: a half-wedged tunnel can accept
        # host->device transfers and execute programs while the
        # device->host direction hangs forever (observed r05) — without it
        # every timing lane would pass the probe then stall on its first
        # fetch until the hard-deadline alarm
        x = jax.device_put(jnp.arange(8.0))
        got = float(np.asarray(jax.block_until_ready(x + 1.0))[3])
        out = {"lane": lane, "ok": got == 4.0,
               "platform": jax.devices()[0].platform,
               "device_kind": jax.devices()[0].device_kind}
    elif lane == "torch_cpu":
        _force_cpu()
        out = {"lane": lane,
               "value": measure_reference_torch_cpu(max_seconds=seconds)}
    elif lane == "jax_cpu":
        _force_cpu()
        out = {"lane": lane,
               "value": _AgentLane("hamt", device="cpu").eval_eps(
                   2, fixed_horizon=True)}
    elif lane == "hamt_fixed":
        iters = int(os.environ.get("VLN_FIXED_ITERS", "10"))
        out = {"lane": lane,
               "value": _AgentLane("hamt").eval_eps(iters,
                                                    fixed_horizon=True)}
    elif lane == "hamt_train":
        out = {"lane": lane, "value": _AgentLane("hamt").train_ms()}
    elif lane == "duet_eval":
        out = {"lane": lane, "value": _AgentLane("duet").eval_eps(20)}
    elif lane == "duet_train":
        out = {"lane": lane, "value": _AgentLane("duet").train_ms()}
    elif lane.startswith("flops:"):
        # flops:<agent>:<batch> — cost analysis of the fixed-horizon eval
        # program unrolled to 1 and 2 steps (pallas off): main() derives
        # body = c2 - c1, prologue = c1 - body, then scales across the
        # sweep's batch sizes / the full horizon
        _, agent_name, bs = lane.split(":")
        al = _AgentLane(agent_name, batch=int(bs))
        f1, b1 = al.unrolled_costs(1)
        f2, b2 = al.unrolled_costs(2)
        out = {"lane": lane, "value": f2, "batch": int(bs),
               "flops_t1": f1, "flops_t2": f2,
               "bytes_t1": b1, "bytes_t2": b2}
    elif lane.startswith("trainflops:"):
        # trainflops:<agent>:<batch> — cost analysis of the fixed-horizon
        # TRAIN program (fwd+bwd+update) unrolled to 1 and 2 steps
        _, agent_name, bs = lane.split(":")
        al = _AgentLane(agent_name, batch=int(bs))
        f1, b1 = al.train_unrolled_costs(1)
        f2, b2 = al.train_unrolled_costs(2)
        out = {"lane": lane, "value": f2, "batch": int(bs),
               "flops_t1": f1, "flops_t2": f2,
               "bytes_t1": b1, "bytes_t2": b2}
    elif lane.startswith("trainfixed:"):
        # trainfixed:<agent>:<batch> — ms/step of the fixed-horizon train
        # program (the timing half of the train-MFU point)
        _, agent_name, bs = lane.split(":")
        bs = int(bs)
        al = _AgentLane(agent_name, batch=bs)
        ms = al.train_fixed_ms(iters=max(3, min(8, 256 // bs)))
        out = {"lane": lane, "value": ms, "batch": bs, "program_ms": ms}
    elif lane.startswith("sweep:"):
        # sweep:<agent>:<batch> — fixed-horizon eval throughput at one
        # batch size (MFU/bytes are derived in main() from the flops: lanes)
        _, agent_name, bs = lane.split(":")
        bs = int(bs)
        al = _AgentLane(agent_name, batch=bs)
        iters = max(3, min(20, 4096 // bs))
        eps = al.eval_eps(iters, fixed_horizon=True)
        out = {"lane": lane, "value": eps, "batch": bs,
               "program_ms": round(al._last_dt * 1e3, 3)}
    else:
        raise SystemExit(f"unknown lane {lane}")
    print(json.dumps(out), flush=True)


def _run_lane(lane: str, timeout_s: float, seconds: float | None = None):
    """Run `bench.py --lane <lane>` in a subprocess; returns its 'value'
    (or the parsed dict for the probe), None on failure/timeout."""
    import subprocess

    env = dict(os.environ)
    if seconds is not None:
        env["VLN_LANE_SECONDS"] = str(seconds)
    try:
        res = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--lane", lane],
            capture_output=True, text=True, timeout=timeout_s, env=env)
        sys.stderr.write(res.stderr)
        for line in reversed(res.stdout.strip().splitlines()):
            if line.startswith("{"):
                parsed = json.loads(line)
                if lane == "probe" or lane.startswith(
                        ("sweep:", "flops:", "trainflops:", "trainfixed:")):
                    return parsed
                return parsed.get("value")
    except Exception as e:  # noqa: BLE001 - bench must always print
        print(f"# lane {lane} failed: {e!r}", file=sys.stderr)
    return None


def main(full: bool = False):
    _enable_cache()
    t_start = time.perf_counter()
    budget_s = float(os.environ.get("VLN_BENCH_BUDGET_S",
                                    "14400" if full else "520"))
    try:
        import signal

        signal.signal(signal.SIGALRM, _emit_partial)
        # leave headroom over the soft budget for one slow compile
        signal.alarm(int(budget_s * 2))
    except Exception:
        pass

    def left():
        return budget_s - (time.perf_counter() - t_start)

    def mark(stage):
        print(f"# bench +{time.perf_counter() - t_start:.0f}s: {stage}",
              file=sys.stderr)

    # 0. fail-fast pre-flight: a stalled TPU tunnel must cost minutes, not
    # the whole 2x-budget alarm (BENCH_r02 post-mortem).  The window is
    # 300 s (plus one retry) in --full mode and a single 240 s in budgeted
    # mode: a degraded-but-live tunnel was measured r05 taking 2m45s just
    # for the backend handshake on an otherwise idle host, so 90 s turned
    # a capturable chip into a false tunnel-down verdict; a budgeted run
    # keeps the single shorter shot so a genuinely dead tunnel still
    # leaves time for the CPU anchor.  On real failure, measure the
    # same-host CPU anchor (torch reference vs our jax path on this
    # host's CPU) so the artifact carries a real measured ratio.
    probe = _run_lane("probe", timeout_s=300 if full else 240)
    if full and not (probe and probe.get("ok")):
        mark("device probe failed once - retrying")
        probe = _run_lane("probe", timeout_s=300)
    if not (probe and probe.get("ok")):
        mark("device probe FAILED - tunnel unreachable, CPU anchor fallback")
        torch_eps = _run_lane("torch_cpu", timeout_s=max(left() / 2, 60),
                              seconds=60)
        jax_eps = _run_lane("jax_cpu", timeout_s=max(left() - 30, 60))
        record = {
            "metric": "hamt_eval_episodes_per_sec_per_chip",
            "value": None,
            "unit": "episodes/s",
            "vs_baseline": None,
            "tunnel_down": True,
            "note": "TPU tunnel unreachable (90 s device probe timed out); "
                    "same-host CPU anchor measured instead",
            "baseline": {
                "reference_torch_cpu_eps_per_sec": (round(torch_eps, 3)
                                                    if torch_eps else None),
                "ours_jax_cpu_eps_per_sec": (round(jax_eps, 3)
                                             if jax_eps else None),
                "same_host_vs_baseline": (round(jax_eps / torch_eps, 2)
                                          if torch_eps and jax_eps else None),
            },
        }
        print(json.dumps(record), flush=True)
        # no headline value was measured: exit nonzero so callers keying on
        # status see a failed run; the JSON's tunnel_down flag carries the
        # environmental context
        raise SystemExit(2)
    mark(f"device probe ok ({probe.get('platform')})")

    _partial["device_kind"] = probe.get("device_kind")

    # 1. the headline metric, alone in this process: the product eval path
    # (early-exit while_loop).  Everything else runs in its own subprocess
    # so tunnel program-interleave cannot depress any steady state.
    # Budgeted runs use 8 iterations (the per-iteration value is stable and
    # compile dominates the lane's wall time; BENCH_r04 spent ~300 s here
    # and starved every other lane); --full keeps 20.
    hamt = _AgentLane("hamt")
    mark("hamt lane ready")
    value = hamt.eval_eps(20 if full else 8)
    _partial["value"] = round(value, 2)
    mark("hamt eval done")

    # 2. fixed-horizon run of the same rollout for the like-for-like
    # vs_baseline ratio (early exit depends on where the random-weight
    # policy happens to stop; fixed horizon is stable work), then the torch
    # reference anchor.  Both lanes gate the headline ratio, so they come
    # before the extras, and the torch anchor keeps a RESERVED minimum the
    # fixed-horizon lane's timeout cannot eat.
    TORCH_RESERVE = 90.0
    fixed_eps = None
    if left() > 120:
        if not full:
            os.environ.setdefault("VLN_FIXED_ITERS", "5")
        # full mode raises the cap: the r05 full run measured a cold-cache
        # fixed-horizon compile over the tunnel at >300 s
        fixed_eps = _run_lane(
            "hamt_fixed",
            timeout_s=max(min(left() - TORCH_RESERVE,
                              900 if full else 300), 150))
        mark("hamt fixed-horizon eval done")
    torch_cpu_eps = None
    jax_cpu_eps = None
    if os.environ.get("VLN_BENCH_SKIP_BASELINE") != "1" and left() > 30:
        torch_cpu_eps = _run_lane(
            "torch_cpu", timeout_s=max(left(), 45),
            seconds=min(60.0, max(left() - 20.0, 20.0)))
        if torch_cpu_eps:
            _partial["vs_baseline"] = round(
                (fixed_eps or value) / torch_cpu_eps, 2)
        mark("torch baseline done")

    # 3. extras, best effort under the remaining budget, one process each
    # (compiles are persistent-cached in /tmp/vln_jax_cache, so repeat runs
    # always finish)
    chip = {}
    for lane, key, need in [("hamt_train", "hamt_train_step_ms", 90),
                            ("duet_eval", "duet_eval_eps_per_sec", 90),
                            ("duet_train", "duet_train_step_ms", 60)]:
        if left() > need:
            got = _run_lane(lane, timeout_s=left())
            if got is not None:
                chip[key] = got
            mark(f"{lane} done")
    # 4. utilization sweep: fixed-horizon eval at growing batch sizes plus
    # exact FLOP/byte models from unrolled-program cost analysis -> MFU /
    # HBM-bandwidth utilization and the batch-scaling curve (is the chip
    # launch-bound or compute-bound?).  HLO cost analysis counts loop bodies
    # once, so per-program totals come from the flops: lanes' two-step
    # unrolled programs: body = c(2)-c(1), prologue = c(1)-body; measuring
    # at B=8 and B=32 separates the B-independent weight traffic from the
    # per-item activation traffic (cost(B,T) = Pw + B*Pa + T*(Bw + B*Ba)).
    T_FULL = 15  # max_action_len in both released presets
    peak_f, peak_b = None, None
    sweep = {}
    for agent_name, sizes in (("hamt", (8, 32, 64, 128, 512)),
                              ("duet", (8, 32, 64, 128))):
        cost_model = None
        costs = {}
        for cb in (8, 32):
            if left() < 120:
                break
            got = _run_lane(f"flops:{agent_name}:{cb}", timeout_s=left())
            if got and got.get("flops_t1") and got.get("flops_t2"):
                costs[cb] = got
            mark(f"flops {agent_name} B={cb} done")
        if costs:
            cost_model = _make_cost_model(costs)
        for bs in sizes:
            if left() < 75:
                break
            got = _run_lane(f"sweep:{agent_name}:{bs}", timeout_s=left())
            if got is not None:
                point = {k: got.get(k) for k in ("batch", "value",
                                                 "program_ms")}
                dt = (got.get("program_ms") or 0) / 1e3
                if cost_model and dt > 0:
                    if peak_f is None:
                        peak_f, peak_b = _chip_peaks()
                    flops, byts = cost_model(bs, T_FULL)
                    point["flops"] = flops
                    point["bytes_accessed"] = byts
                    point["mfu"] = (round(flops / dt / peak_f, 4)
                                    if flops and peak_f else None)
                    point["hbm_util"] = (round(byts / dt / peak_b, 4)
                                         if byts and peak_b else None)
                    point["arith_intensity"] = (round(flops / byts, 2)
                                                if flops and byts else None)
                sweep.setdefault(agent_name, []).append(point)
            mark(f"sweep {agent_name} bs={bs} done")
    # 4b. train-step cost analysis: the fixed-horizon TRAIN program (fwd +
    # bwd + optimizer update, both rollouts at T=15) timed and cost-modelled
    # the same way, so the sweep answers "is TRAINING efficient" too.  The
    # trainflops lanes unroll to 1 and 2 steps; c(2)-c(1) counts one extra
    # body of BOTH rollouts, so cost_model(B, 15) is the full program.
    for agent_name in ("hamt", "duet"):
        costs = {}
        for cb in (8, 32):
            if left() < 200:
                break
            got = _run_lane(f"trainflops:{agent_name}:{cb}",
                            timeout_s=left())
            if got and got.get("flops_t1") and got.get("flops_t2"):
                costs[cb] = got
            mark(f"trainflops {agent_name} B={cb} done")
        cost_model = _make_cost_model(costs) if costs else None
        for bs in (8, 64):
            if left() < 150:
                break
            got = _run_lane(f"trainfixed:{agent_name}:{bs}",
                            timeout_s=left())
            if got and got.get("value"):
                dt = got["value"] / 1e3
                point = {"batch": bs, "step_ms": round(got["value"], 1)}
                if cost_model and dt > 0:
                    if peak_f is None:
                        peak_f, peak_b = _chip_peaks()
                    flops, byts = cost_model(bs, T_FULL)
                    point["flops"] = flops
                    point["bytes_accessed"] = byts
                    point["mfu"] = (round(flops / dt / peak_f, 4)
                                    if flops and peak_f else None)
                    point["hbm_util"] = (round(byts / dt / peak_b, 4)
                                         if byts and peak_b else None)
                    point["arith_intensity"] = (round(flops / byts, 2)
                                                if flops and byts else None)
                sweep.setdefault(f"{agent_name}_train", []).append(point)
            mark(f"trainfixed {agent_name} bs={bs} done")
    if left() > 60:
        jax_cpu_eps = _run_lane("jax_cpu", timeout_s=left())
        mark("jax-cpu anchor done")

    # the sweep's batch-8 hamt point IS the fixed-horizon program: route it
    # into baseline.ours_tpu_fixed_horizon_eps_per_sec / vs_baseline when the
    # dedicated lane was cut by a compile timeout
    if fixed_eps is None:
        fixed_eps = _fixed_from_sweep(sweep)

    record = {
        "metric": "hamt_eval_episodes_per_sec_per_chip",
        "value": round(value, 2),
        "unit": "episodes/s",
        "device_kind": probe.get("device_kind"),
        # measured like-for-like: our fixed-horizon chip throughput vs the
        # actual torch reference at the same fixed horizon on this host CPU
        # (falls back to the early-exit headline if fixed-horizon timed out)
        "vs_baseline": (round((fixed_eps or value) / torch_cpu_eps, 2)
                        if torch_cpu_eps else None),
        "baseline": {
            "ours_tpu_fixed_horizon_eps_per_sec": (round(fixed_eps, 2)
                                                   if fixed_eps else None),
            "reference_torch_cpu_eps_per_sec": (round(torch_cpu_eps, 3)
                                                if torch_cpu_eps else None),
            "ours_jax_cpu_eps_per_sec": (round(jax_cpu_eps, 3)
                                         if jax_cpu_eps else None),
            # same-hardware anchor: our jax path vs the torch reference,
            # both on this host's CPU
            "same_host_vs_baseline": (round(jax_cpu_eps / torch_cpu_eps, 2)
                                      if torch_cpu_eps and jax_cpu_eps
                                      else None),
            "note": "reference measured with the ACTUAL NavCMT torch model "
                    "(random weights) greedy rollout over the same synthetic "
                    "world; the reference cannot run on TPU",
        },
        "extras": {
            "duet_eval_episodes_per_sec_per_chip": round(
                chip["duet_eval_eps_per_sec"], 2)
            if "duet_eval_eps_per_sec" in chip else None,
            "hamt_train_step_ms": round(chip["hamt_train_step_ms"], 1)
            if "hamt_train_step_ms" in chip else None,
            "duet_train_step_ms": round(chip["duet_train_step_ms"], 1)
            if "duet_train_step_ms" in chip else None,
        },
        # fixed-horizon eval batch-scaling curve with per-program XLA cost
        # analysis: value = episodes/s, mfu = flops/s over the chip's bf16
        # peak, hbm_util = bytes/s over peak HBM bandwidth
        "utilization_sweep": sweep or None,
    }
    try:
        import signal

        signal.alarm(0)
    except Exception:
        pass
    if full:
        import datetime

        with open(_FULL_RUN_PATH, "w") as f:
            json.dump({"captured_at":
                       datetime.datetime.now(datetime.timezone.utc)
                       .isoformat(timespec="seconds"),
                       "code_hash": _code_hash(),
                       "device_kind": probe.get("device_kind"),
                       "record": record}, f, indent=1)
    else:
        record = _merge_full_run(record, probe.get("device_kind"))
    print(json.dumps(record))


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--lane":
        _lane_main(sys.argv[2])
    else:
        main(full="--full" in sys.argv[1:])
