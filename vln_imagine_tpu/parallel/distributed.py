"""Multi-host distributed utilities.

Rebuild of utils/distributed.py (VLN-HAMT/finetune_src/utils/distributed.py):
the reference's NCCL process group with file:// rendezvous, pickled-tensor
all_gather of python objects (:90-130), reduce_dict (:133-157) and
merge_dist_results (:160) become jax.distributed + multihost utilities; the
in-step gradient all-reduce needs no code at all — XLA inserts it from the
sharding annotations.
"""

from __future__ import annotations

import pickle
from typing import Any, Sequence

import jax
import numpy as np


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None):
    """jax.distributed.initialize replaces init_process_group's file://
    rendezvous hack (distributed.py:21,56-71).  No-op on single process."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(coordinator_address, num_processes, process_id)


def is_default_process() -> bool:
    """is_default_gpu equivalent (distributed.py:74-78)."""
    return jax.process_index() == 0


def shard_indices(n: int, process_id: int | None = None,
                  num_processes: int | None = None) -> slice:
    """Per-host dataset shard (sel_data_idxs, main.py:130 / env.py:135-143):
    contiguous split with the last host absorbing the remainder."""
    p = jax.process_index() if process_id is None else process_id
    w = jax.process_count() if num_processes is None else num_processes
    per = n // w
    start = per * p
    end = None if p == w - 1 else start + per
    return slice(start, end)


def _encode_payload(obj: Any) -> np.ndarray:
    """pickle -> uint8 vector (the reference's ByteTensor encoding,
    distributed.py:96-103)."""
    return np.frombuffer(pickle.dumps(obj), np.uint8)


def _pad_payload(payload: np.ndarray, max_size: int) -> np.ndarray:
    padded = np.zeros(max_size, np.uint8)
    padded[: payload.size] = payload
    return padded


def _decode_payloads(gathered: np.ndarray, sizes: np.ndarray) -> list[Any]:
    """[W, max_size] padded byte rows + per-row sizes -> objects
    (distributed.py:120-130)."""
    return [pickle.loads(gathered[i, : int(sizes[i])].tobytes())
            for i in range(len(sizes))]


def all_gather_objects(obj: Any) -> list[Any]:
    """Gather arbitrary picklable objects from every host
    (distributed.py:90-130: pickle -> padded byte tensors -> all_gather).
    Implemented over multihost_utils' array gather; the encode/pad/decode
    byte path is shared with the single-process branch so it is exercised
    on every call (and unit-testable without multiple hosts)."""
    payload = _encode_payload(obj)
    if jax.process_count() == 1:
        sizes = np.asarray([payload.size], np.int64)
        gathered = _pad_payload(payload, int(payload.size))[None, :]
        return _decode_payloads(gathered, sizes)
    from jax.experimental import multihost_utils

    size = np.asarray([payload.size], np.int32)
    sizes = np.asarray(multihost_utils.process_allgather(size)).reshape(-1)
    padded = _pad_payload(payload, int(sizes.max()))
    gathered = np.asarray(multihost_utils.process_allgather(padded))
    return _decode_payloads(gathered, sizes)


def merge_results(results_per_host: Sequence[Sequence[dict]],
                  key: str = "instr_id") -> list[dict]:
    """merge_dist_results (distributed.py:160-166) with de-duplication by
    instruction id (hosts may overlap on the wrapped tail of eval shards)."""
    seen = set()
    out = []
    for host_results in results_per_host:
        for item in host_results:
            k = item.get(key)
            if k in seen:
                continue
            seen.add(k)
            out.append(item)
    return out


def reduce_dict(metrics: dict[str, float], average: bool = True
                ) -> dict[str, float]:
    """Cross-host scalar reduction (distributed.py:133-157)."""
    if jax.process_count() == 1:
        return dict(metrics)
    from jax.experimental import multihost_utils

    keys = sorted(metrics)
    vals = np.asarray([float(metrics[k]) for k in keys], np.float32)
    summed = np.asarray(
        multihost_utils.process_allgather(vals)).sum(axis=0)
    if average:
        summed = summed / jax.process_count()
    return dict(zip(keys, summed.tolist()))
