"""Real 2-process jax.distributed execution of the multi-host branches.

Every function in parallel/distributed.py forks on process_count()==1; this
launches TWO actual jax.distributed processes on the CPU backend and runs
all_gather_objects (padded-byte encode/decode across unequal payload sizes),
reduce_dict, shard_indices and merge_results across them — the reference's
NCCL collectives path (VLN-HAMT/finetune_src/utils/distributed.py:90-157)
exercised for real instead of only its single-process fallback.
"""

import json
import os
import socket
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

_WORKER = r"""
import json, sys
import jax
jax.config.update("jax_platforms", "cpu")  # site config overrides the env var
coord, nproc, pid, out_path = sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]
jax.distributed.initialize(coord, nproc, pid)
assert jax.process_count() == nproc

from vln_imagine_tpu.parallel.distributed import (
    all_gather_objects, is_default_process, merge_results, reduce_dict,
    shard_indices)

# unequal payload sizes force the pad/size-exchange path (distributed.py:96-130)
mine = {"rank": pid, "preds": [{"instr_id": f"i{pid}_{j}", "v": j}
                               for j in range(2 + 3 * pid)]}
gathered = all_gather_objects(mine)

reduced = reduce_dict({"loss": 1.0 + pid, "n": 10.0 * (pid + 1)}, average=True)
summed = reduce_dict({"loss": 1.0 + pid}, average=False)

sl = shard_indices(10)
merged = merge_results([g["preds"] for g in gathered])

result = {
    "pid": pid,
    "default": is_default_process(),
    "ranks": [g["rank"] for g in gathered],
    "n_preds": [len(g["preds"]) for g in gathered],
    "reduced": reduced,
    "summed": summed,
    "shard": [sl.start, sl.stop],
    "merged_ids": sorted(m["instr_id"] for m in merged),
}
with open(out_path, "w") as f:
    json.dump(result, f)
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_collectives(tmp_path):
    port = _free_port()
    coord = f"127.0.0.1:{port}"
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    env = dict(os.environ,
               PYTHONPATH=os.path.dirname(os.path.dirname(__file__)))
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    procs = []
    outs = []
    for pid in range(2):
        out = tmp_path / f"out{pid}.json"
        outs.append(out)
        procs.append(subprocess.Popen(
            [sys.executable, str(worker), coord, "2", str(pid), str(out)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT))
    tails = []
    for p in procs:
        stdout, _ = p.communicate(timeout=420)
        tails.append(stdout.decode(errors="replace")[-2000:])
    for p, tail in zip(procs, tails):
        assert p.returncode == 0, tail
    results = [json.loads(o.read_text()) for o in outs]

    for pid, r in enumerate(results):
        assert r["default"] == (pid == 0)
        # object gather saw both hosts' (differently sized) payloads in order
        assert r["ranks"] == [0, 1]
        assert r["n_preds"] == [2, 5]
        # reduce_dict: mean over hosts / plain sum
        assert r["reduced"] == {"loss": 1.5, "n": 15.0}
        assert r["summed"] == {"loss": 3.0}
        assert r["merged_ids"] == sorted(
            [f"i0_{j}" for j in range(2)] + [f"i1_{j}" for j in range(5)])
    # contiguous host shards: [0,5) and [5,None) over 10 items
    assert results[0]["shard"] == [0, 5]
    assert results[1]["shard"] == [5, None]


_TRAIN_WORKER = r"""
import json, sys
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/vln_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
coord, nproc, pid, out_path = sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]
jax.distributed.initialize(coord, nproc, pid)

import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from vln_imagine_tpu.config import tiny_test_config
from vln_imagine_tpu.envx import synthetic_world, synthetic_episodes
from vln_imagine_tpu.parallel.mesh import make_mesh
from vln_imagine_tpu.train.trainer import HamtTrainer

assert jax.process_count() == nproc
devices = jax.devices()              # GLOBAL device list across processes
assert len(devices) == nproc
mesh = make_mesh(data=nproc, model=1, devices=devices)

cfg = tiny_test_config("hamt")
world_np, _ = synthetic_world(
    num_scans=2, num_nodes=20, max_candidates=cfg.env.max_candidates,
    views=cfg.env.views, feat_dim=cfg.model.image_feat_size, seed=1)
ep_np = synthetic_episodes(
    world_np, batch=4, max_gt_path_len=cfg.env.max_gt_path_len,
    max_instr_len=cfg.env.max_instr_len,
    max_imaginations=cfg.model.max_imagination_len,
    vocab_size=cfg.model.vocab_size, feat_dim=cfg.model.hidden_size, seed=2)

# params identical on both hosts (same seed init), replicated over the mesh
trainer = HamtTrainer(cfg, jax.tree.map(jnp.asarray, world_np))
state = trainer.init_state(jax.tree.map(jnp.asarray, ep_np))
rep = NamedSharding(mesh, P())
state = jax.tree.map(lambda x: jax.device_put(np.asarray(x), rep), state)

# each host contributes ITS OWN half of the global batch
def shard(x):
    x = np.asarray(x)
    if x.ndim == 0:
        return jax.device_put(x, rep)
    local = x[pid * 2:(pid + 1) * 2]
    return jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("data", *([None] * (x.ndim - 1)))), local)

ep = jax.tree.map(shard, ep_np)
step = trainer.make_train_step("sample", donate=False)
new_state, metrics = step(state, ep, ep, jax.random.PRNGKey(3))
out = {
    "pid": pid,
    "metrics": {k: float(v) for k, v in metrics.items()},
    # fingerprint of the updated (replicated) params, identical across hosts
    "param_sum": float(sum(jnp.sum(jnp.abs(l.astype(jnp.float32)))
                           for l in jax.tree.leaves(new_state.params))),
}
with open(out_path, "w") as f:
    json.dump(out, f)
"""


def test_two_process_data_parallel_train_step(tmp_path):
    """DDP equivalence, executed for real: ONE jitted IL+RL train step over
    a global 2-process mesh (each host feeding its own half of the batch via
    make_array_from_process_local_data) produces the same loss and the same
    updated parameters as the single-process step on the full batch — the
    gradient all-reduce the reference gets from torch DDP
    (agent_cmt.py:62-63) here falls out of GSPMD sharding propagation."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vln_imagine_tpu.config import tiny_test_config
    from vln_imagine_tpu.envx import synthetic_world, synthetic_episodes
    from vln_imagine_tpu.train.trainer import HamtTrainer

    port = _free_port()
    worker = tmp_path / "train_worker.py"
    worker.write_text(_TRAIN_WORKER)
    env = dict(os.environ,
               PYTHONPATH=os.path.dirname(os.path.dirname(__file__)))
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    procs, outs = [], []
    for pid in range(2):
        out = tmp_path / f"train_out{pid}.json"
        outs.append(out)
        procs.append(subprocess.Popen(
            [sys.executable, str(worker), f"127.0.0.1:{port}", "2",
             str(pid), str(out)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT))
    tails = []
    for p in procs:
        stdout, _ = p.communicate(timeout=540)
        tails.append(stdout.decode(errors="replace")[-2500:])
    for p, tail in zip(procs, tails):
        assert p.returncode == 0, tail
    results = [json.loads(o.read_text()) for o in outs]

    # both hosts observe the identical global loss and identical new params
    assert results[0]["metrics"] == results[1]["metrics"]
    assert results[0]["param_sum"] == results[1]["param_sum"]

    # single-process ground truth on the same full batch
    cfg = tiny_test_config("hamt")
    world_np, _ = synthetic_world(
        num_scans=2, num_nodes=20, max_candidates=cfg.env.max_candidates,
        views=cfg.env.views, feat_dim=cfg.model.image_feat_size, seed=1)
    ep_np = synthetic_episodes(
        world_np, batch=4, max_gt_path_len=cfg.env.max_gt_path_len,
        max_instr_len=cfg.env.max_instr_len,
        max_imaginations=cfg.model.max_imagination_len,
        vocab_size=cfg.model.vocab_size, feat_dim=cfg.model.hidden_size,
        seed=2)
    trainer = HamtTrainer(cfg, jax.tree.map(jnp.asarray, world_np))
    ep = jax.tree.map(jnp.asarray, ep_np)
    state = trainer.init_state(ep)
    new_state, metrics = trainer.make_train_step("sample", donate=False)(
        state, ep, ep, jax.random.PRNGKey(3))
    want = {k: float(v) for k, v in metrics.items()}
    got = results[0]["metrics"]
    assert set(got) == set(want)
    for k in want:
        np.testing.assert_allclose(got[k], want[k], rtol=2e-4, atol=2e-4,
                                   err_msg=k)
    want_sum = float(sum(jnp.sum(jnp.abs(l.astype(jnp.float32)))
                         for l in jax.tree.leaves(new_state.params)))
    np.testing.assert_allclose(results[0]["param_sum"], want_sum,
                               rtol=2e-5)
