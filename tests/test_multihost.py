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
