"""scripts/pretrain.py: argument wiring and config assembly (the full
training loop is exercised in-process by tests/test_pretrain.py; the CLI
itself compiles several minutes of XLA programs, so only the driver glue is
tested here)."""

import os
import sys
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))


def _parse(argv, monkeypatch):
    import pretrain as cli

    monkeypatch.setattr(sys, "argv", ["pretrain.py"] + argv)
    return cli.parse_args()


def test_default_hamt_task_mix(monkeypatch):
    args = _parse(["--synthetic"], monkeypatch)
    assert args.agent == "hamt" and args.image_prob_size == 1000


def test_duet_preset_overrides(monkeypatch):
    """--agent duet selects the 3-task mix (r2r_pretrain.json:43-50)."""
    from vln_imagine_tpu.config import duet_r2r_config, _replace

    cfg = duet_r2r_config()
    cfg = _replace(cfg, "pretrain", tasks=("mlm", "mrc", "sap"),
                   mix_ratio=(1, 1, 1), batch_size=64,
                   num_train_steps=100_000)
    assert cfg.pretrain.tasks == ("mlm", "mrc", "sap")
    assert cfg.pretrain.mix_ratio == (1, 1, 1)


def test_task_override_sets_uniform_mix(monkeypatch):
    args = _parse(["--synthetic", "--tasks", "mlm", "sap"], monkeypatch)
    assert args.tasks == ["mlm", "sap"] and args.mix_ratio is None
    # main() derives a uniform mix when --mix-ratio is omitted
    from vln_imagine_tpu.config import hamt_r2r_config, _replace

    cfg = _replace(hamt_r2r_config(), "pretrain",
                   tasks=tuple(args.tasks),
                   mix_ratio=tuple(args.mix_ratio or [1] * len(args.tasks)))
    assert cfg.pretrain.mix_ratio == (1, 1)


def test_e2e_flags(monkeypatch):
    """--raw-panorama-bank implies the E2E image driver (main() flips
    args.e2e); the defaults match the reference ViT-B/16 backbone
    (main_r2r_image.py)."""
    args = _parse(["--raw-panorama-bank", "/data/panos.npy"], monkeypatch)
    assert not args.e2e  # main() derives it
    assert args.image_size == 224 and args.vit_layers == 12
    assert args.vit_hidden == 768 and args.vit_patch == 16
    args = _parse(["--e2e", "--synthetic", "--vit-hidden", "48"], monkeypatch)
    assert args.e2e and args.raw_panorama_bank is None


@pytest.mark.slow
def test_e2e_cli_smoke(tmp_path):
    """The E2E image pre-training driver runs from the command line
    (the reference ships main_r2r_image.py as a first-class entry point,
    VLN-HAMT/pretrain_src/main_r2r_image.py:1-585): six-task mix with the
    ViT in the loop over a fabricated panorama bank, validation + snapshot."""
    import math
    import re
    import subprocess

    env = dict(os.environ, VLN_PLATFORM="cpu", PYTHONPATH=REPO)
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    log_dir = str(tmp_path / "e2e")
    proc = subprocess.run(
        [sys.executable, "scripts/pretrain.py", "--agent", "hamt",
         "--synthetic", "--e2e", "--steps", "6", "--log-steps", "3",
         "--valid-steps", "6", "--batch-size", "2",
         "--tasks", "mlm", "sap", "mrc", "--image-prob-size", "8",
         "--image-size", "16", "--vit-patch", "8", "--vit-layers", "1",
         "--vit-hidden", "48", "--vit-heads", "4", "--log-dir", log_dir],
        env=env, cwd=os.path.dirname(os.path.dirname(os.path.abspath(
            __file__))), capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, (
        f"{proc.stdout[-3000:]}\n{proc.stderr[-3000:]}")
    snap = os.path.join(log_dir, "model_step_6")
    assert os.path.isdir(snap), os.listdir(log_dir)
    record = open(os.path.join(log_dir, "pretrain.txt")).read()
    assert "valid @ step 6" in record
    losses = [float(x) for x in re.findall(r"loss=([^\s,]+)", record)]
    assert losses and all(math.isfinite(l) and l < 1e6
                          for l in losses), record


@pytest.mark.slow
def test_e2e_vit_init_graft(tmp_path):
    """--vit-init grafts a timm-format ViT state_dict into the in-model
    backbone (the reference loads the released vit_base_patch16_224 weights
    the same way, main_r2r_image.py)."""
    import subprocess

    import numpy as np
    import torch

    from tests.test_vit import TorchViT
    from vln_imagine_tpu.models.vit import ViTConfig

    cfg = ViTConfig(image_size=16, patch_size=8, hidden_size=48,
                    num_layers=1, num_heads=4, compute_dtype="float32")
    tv = TorchViT(cfg)
    vit_path = str(tmp_path / "vit.pth")
    torch.save(tv.state_dict(), vit_path)

    env = dict(os.environ, VLN_PLATFORM="cpu", PYTHONPATH=REPO)
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    log_dir = str(tmp_path / "e2e")
    proc = subprocess.run(
        [sys.executable, "scripts/pretrain.py", "--agent", "hamt",
         "--synthetic", "--e2e", "--steps", "2", "--log-steps", "2",
         "--valid-steps", "2", "--batch-size", "2", "--tasks", "mlm",
         "--image-prob-size", "8", "--image-size", "16", "--vit-patch", "8",
         "--vit-layers", "1", "--vit-hidden", "48", "--vit-heads", "4",
         "--vit-init", vit_path, "--log-dir", log_dir],
        env=env, cwd=os.path.dirname(os.path.dirname(os.path.abspath(
            __file__))), capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, (
        f"{proc.stdout[-3000:]}\n{proc.stderr[-3000:]}")
    assert "initialized ViT from" in proc.stdout, proc.stdout[-2000:]

    # the snapshot's ViT cls_token equals the torch source (graft, not init)
    import orbax.checkpoint as ocp
    snap = os.path.join(log_dir, "model_step_2")
    restored = ocp.PyTreeCheckpointer().restore(snap)
    got = np.asarray(restored["params"]["params"]["vit"]["cls_token"])
    want = tv.state_dict()["cls_token"].numpy()
    np.testing.assert_allclose(got.reshape(-1), want.reshape(-1),
                               rtol=1e-6, atol=1e-6)


@pytest.mark.slow
def test_resume_graft_roundtrip(tmp_path):
    """model_step_N snapshots restore onto a PretrainState via the
    structural graft (the CLI's --resume path)."""
    import jax
    import numpy as np
    import orbax.checkpoint as ocp

    from vln_imagine_tpu.ckpt.manager import _graft
    from vln_imagine_tpu.config import tiny_test_config
    from vln_imagine_tpu.envx import synthetic_world, synthetic_episodes
    from vln_imagine_tpu.pretrain.trainer import HamtPretrainer

    cfg = tiny_test_config("hamt")
    world_np, _ = synthetic_world(
        num_scans=1, num_nodes=12, max_candidates=cfg.env.max_candidates,
        views=cfg.env.views, feat_dim=cfg.model.image_feat_size, seed=0)
    import jax.numpy as jnp
    world = jax.tree.map(jnp.asarray, world_np)
    ep = jax.tree.map(jnp.asarray, synthetic_episodes(
        world_np, batch=4, max_gt_path_len=cfg.env.max_gt_path_len,
        max_instr_len=cfg.env.max_instr_len,
        max_imaginations=cfg.model.max_imagination_len,
        vocab_size=cfg.model.vocab_size, feat_dim=cfg.model.hidden_size,
        seed=1))
    pt = HamtPretrainer(cfg, world, ep, image_prob_size=8)
    state = pt.init_state()
    ckpt = ocp.PyTreeCheckpointer()
    path = str(tmp_path / "model_step_0")
    ckpt.save(path, jax.tree.map(np.asarray, state), force=True)
    back = _graft(state, ckpt.restore(path))
    same = jax.tree.map(
        lambda a, b: bool(np.array_equal(np.asarray(a), np.asarray(b))),
        state.params, back.params)
    assert all(jax.tree.leaves(same))
    assert int(back.step) == int(state.step)
