from vln_imagine_tpu.parallel.mesh import (
    make_mesh,
    shard_batch,
    replicate,
    param_shardings,
)
