"""Throughput benchmark: HAMT-Imagine greedy-eval episodes/sec at reference
scale (hidden 768, 9L+4X, batch 8, 36-view obs, 15-step episodes, 60-token
instructions, 20 imagination tokens) on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference publishes no throughput numbers (BASELINE.md).  We
anchor vs_baseline to an estimated 10 episodes/sec for the PyTorch reference
on A100 (bs 8: ~15 sequential per-step CUDA forwards plus per-item MatterSim
calls and numpy packing per episode batch).  vs_baseline = value / 10.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

ASSUMED_BASELINE_EPS_PER_SEC = 10.0


def main():
    # persistent compile cache: repeat bench runs skip the ~1 min XLA compile
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/vln_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    from vln_imagine_tpu.config import hamt_r2r_config, _replace
    from vln_imagine_tpu.envx import synthetic_world, synthetic_episodes
    from vln_imagine_tpu.train.trainer import HamtTrainer

    cfg = hamt_r2r_config()
    cfg = _replace(cfg, "model", vocab_size=30522)
    batch = cfg.train.batch_size  # 8, as in the released config

    world_np, _ = synthetic_world(
        num_scans=2, num_nodes=96, max_candidates=cfg.env.max_candidates,
        views=36, feat_dim=cfg.model.image_feat_size, seed=0)
    ep_np = synthetic_episodes(
        world_np, batch=batch, max_gt_path_len=cfg.env.max_gt_path_len,
        max_instr_len=cfg.env.max_instr_len,
        max_imaginations=cfg.model.max_imagination_len,
        vocab_size=cfg.model.vocab_size, feat_dim=cfg.model.hidden_size,
        seed=1)
    world = jax.tree.map(jnp.asarray, world_np)
    ep = jax.tree.map(jnp.asarray, ep_np)

    trainer = HamtTrainer(cfg, world)
    state = trainer.init_state(ep)
    eval_step = trainer.make_eval_step()
    rng = jax.random.PRNGKey(0)

    # compile + warmup
    out = eval_step(state.params, ep, rng)
    jax.block_until_ready(out)

    iters = 20
    t0 = time.perf_counter()
    for i in range(iters):
        out = eval_step(state.params, ep, jax.random.fold_in(rng, i))
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    eps_per_sec = batch * iters / dt
    print(json.dumps({
        "metric": "hamt_eval_episodes_per_sec_per_chip",
        "value": round(eps_per_sec, 2),
        "unit": "episodes/s",
        "vs_baseline": round(eps_per_sec / ASSUMED_BASELINE_EPS_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
