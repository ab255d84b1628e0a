"""One scripted full product cycle through the CLIs: scripts/pretrain.py
(synthetic, a few steps) -> model_step_<N> snapshot ->
scripts/train.py --init-from-pretrain -> fine-tune train + validate.

This is the BASELINE config-5 recipe shape end to end
(main_r2r.py:303-316 pretrain validation/save -> vlnbert_init.py:20-31
init chain -> finetune main.py train/valid loop) driven exactly the way a
user would drive it, asserting transferred-subtree counts and finite
training/validation output.
"""

import os
import re
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(argv, env):
    proc = subprocess.run([sys.executable] + argv, env=env, cwd=REPO,
                          capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, (
        f"{' '.join(argv)} failed:\n{proc.stdout[-3000:]}\n"
        f"{proc.stderr[-3000:]}")
    return proc.stdout


def test_pretrain_to_finetune_cli_cycle(tmp_path):
    env = dict(os.environ, VLN_PLATFORM="cpu", PYTHONPATH=REPO)
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    pt_dir, ft_dir = str(tmp_path / "pt"), str(tmp_path / "ft")

    # --- pretrain: 2-task mix, 8 steps, one validation + snapshot at the end
    _run(["scripts/pretrain.py", "--agent", "hamt", "--synthetic",
          "--steps", "8", "--log-steps", "4", "--valid-steps", "8",
          "--batch-size", "3", "--tasks", "mlm", "sap",
          "--log-dir", pt_dir], env)
    snap = os.path.join(pt_dir, "model_step_8")
    assert os.path.isdir(snap), os.listdir(pt_dir)
    record = open(os.path.join(pt_dir, "pretrain.txt")).read()
    assert "valid @ step 8" in record
    # per-task validation losses are finite numbers (the pattern must also
    # CATCH 'nan'/'inf' tokens, not skip them)
    import math
    losses = [float(x) for x in re.findall(r"loss=([^\s,]+)", record)]
    assert losses and all(math.isfinite(l) and l < 1e6
                          for l in losses), record

    # --- finetune from the snapshot: 2 iters + validation on both splits
    out = _run(["scripts/train.py", "--agent", "hamt", "--synthetic",
                "--iters", "2", "--log-every", "2", "--batch-size", "4",
                "--log-dir", ft_dir, "--init-from-pretrain", snap], env)
    m = re.search(r"initialized from pretrain snapshot .* \((\d+) leaves "
                  r"transferred", out)
    assert m, out[-2000:]
    assert int(m.group(1)) > 0
    train_rec = open(os.path.join(ft_dir, "train.txt")).read()
    # the interval line carries val scores + finite train losses
    assert "iter 2" in train_rec and "val_unseen" in train_rec, train_rec
    import math
    loss_vals = [float(x) for x in
                 re.findall(r"loss=([^\s,]+)", train_rec)]
    assert loss_vals and all(math.isfinite(v) for v in loss_vals), train_rec
    # best/latest checkpoints were written by the driver's ckpt policy
    ckpts = os.listdir(os.path.join(ft_dir, "ckpts"))
    assert any(n.startswith("latest") for n in ckpts), ckpts
