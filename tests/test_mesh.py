"""Multi-device mesh: sharded eval equivalence + TP param shardings."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from vln_imagine_tpu.config import tiny_test_config
from vln_imagine_tpu.envx import synthetic_world, synthetic_episodes
from vln_imagine_tpu.parallel.mesh import make_mesh, param_shardings, shard_batch
from vln_imagine_tpu.train.trainer import HamtTrainer


@pytest.fixture(scope="module")
def setup():
    assert len(jax.devices()) >= 8, "conftest must provide 8 CPU devices"
    cfg = tiny_test_config("hamt")
    world_np, _ = synthetic_world(
        num_scans=2, num_nodes=18, max_candidates=cfg.env.max_candidates,
        views=cfg.env.views, feat_dim=cfg.model.image_feat_size, seed=0)
    world = jax.tree.map(jnp.asarray, world_np)
    ep = jax.tree.map(jnp.asarray, synthetic_episodes(
        world_np, batch=8, max_gt_path_len=cfg.env.max_gt_path_len,
        max_instr_len=cfg.env.max_instr_len,
        max_imaginations=cfg.model.max_imagination_len,
        vocab_size=cfg.model.vocab_size, feat_dim=cfg.model.hidden_size,
        seed=1))
    trainer = HamtTrainer(cfg, world)
    state = trainer.init_state(ep)
    return cfg, world, ep, trainer, state


def test_sharded_eval_matches_single_device(setup):
    """Evaluation sharded over the 8-device data axis produces the same
    trajectories as the unsharded run (replacing the reference's per-rank env
    shards + all_gather merge, main.py:130,399-400)."""
    cfg, world, ep, trainer, state = setup
    ev = trainer.make_eval_step()
    p0, l0 = ev(state.params, ep, jax.random.PRNGKey(5))

    mesh = make_mesh(data=8, model=1)
    ep_sharded = shard_batch(ep, mesh)
    params_rep = jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), state.params)
    p1, l1 = ev(params_rep, ep_sharded, jax.random.PRNGKey(5))
    np.testing.assert_array_equal(np.asarray(p0), np.asarray(p1))
    np.testing.assert_array_equal(np.asarray(l0), np.asarray(l1))


def test_tp_param_shardings_split_large_kernels(setup):
    cfg, world, ep, trainer, state = setup
    mesh = make_mesh(data=4, model=2)
    specs = param_shardings(state.params, mesh, min_size=2 ** 10)
    leaves = jax.tree_util.tree_flatten_with_path(specs)[0]
    sharded = [p for p, s in leaves if s.spec != P()]
    assert sharded, "expected at least one tensor-parallel kernel"
    # placing params accordingly must keep the eval functional
    placed = jax.tree.map(jax.device_put, state.params, specs)
    ep_sharded = shard_batch(ep, mesh)
    ev = trainer.make_eval_step()
    p0, l0 = ev(state.params, ep, jax.random.PRNGKey(3))
    p1, l1 = ev(placed, ep_sharded, jax.random.PRNGKey(3))
    np.testing.assert_array_equal(np.asarray(l0), np.asarray(l1))


def test_all_gather_objects_byte_path():
    """The pickle->pad->decode byte encoding of all_gather_objects
    (reference distributed.py:90-130) round-trips arbitrary objects,
    including ragged multi-host payload sizes."""
    import numpy as _np

    from vln_imagine_tpu.parallel import distributed as D

    objs = [{"instr_id": "4332_1", "trajectory": [[1, 2], [3, 4]]},
            ["short"],
            {"nested": {"a": _np.arange(3).tolist(), "b": None}}]
    payloads = [D._encode_payload(o) for o in objs]
    sizes = _np.asarray([p.size for p in payloads], _np.int64)
    gathered = _np.stack(
        [D._pad_payload(p, int(sizes.max())) for p in payloads])
    assert D._decode_payloads(gathered, sizes) == objs
    # the public entry exercises the same path at process_count()==1
    assert D.all_gather_objects(objs[0]) == [objs[0]]
    # merge de-duplicates overlapping eval shards by instr_id
    merged = D.merge_results([[{"instr_id": "a"}, {"instr_id": "b"}],
                              [{"instr_id": "b"}, {"instr_id": "c"}]])
    assert [m["instr_id"] for m in merged] == ["a", "b", "c"]
