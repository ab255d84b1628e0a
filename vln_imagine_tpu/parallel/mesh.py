"""Device mesh + sharding rules.

The reference's only parallelism is NCCL DistributedDataParallel with
per-process env shards (VLN-HAMT/finetune_src/utils/distributed.py,
main.py:130).  TPU-native equivalent: one jitted step over a
jax.sharding.Mesh — the batch axis lives on 'data' (DP), large projection
kernels may shard over 'model' (TP); XLA inserts the gradient reductions that
DDP's bucketed all-reduce performs, and `find_unused_parameters` disappears
because JAX gradients are structural.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: int = -1, model: int = 1,
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data == -1:
        data = n // model
    assert data * model == n, f"mesh {data}x{model} != {n} devices"
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, ("data", "model"))


def shard_batch(tree: Any, mesh: Mesh) -> Any:
    """Place the leading (batch) axis of every array on the data axis."""
    def put(x):
        spec = P("data", *([None] * (np.ndim(x) - 1))) if np.ndim(x) >= 1 else P()
        return jax.device_put(x, NamedSharding(mesh, spec))
    return jax.tree.map(put, tree)


def replicate(tree: Any, mesh: Mesh) -> Any:
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def param_shardings(params: Any, mesh: Mesh,
                    min_size: int = 2 ** 16) -> Any:
    """Tensor-parallel layout: shard the wide axis of large 2-D kernels over
    'model'; everything else replicated.  With model=1 this degrades to pure
    replication (the appropriate choice at BERT-base scale)."""

    def spec_for(x):
        shape = np.shape(x)
        if (len(shape) == 2 and np.prod(shape) >= min_size
                and mesh.shape["model"] > 1):
            # shard the larger axis if divisible
            if shape[1] % mesh.shape["model"] == 0:
                return P(None, "model")
            if shape[0] % mesh.shape["model"] == 0:
                return P("model", None)
        return P()

    return jax.tree.map(
        lambda x: NamedSharding(mesh, spec_for(x)), params)
