"""scripts/train.py argument wiring (flag -> config overrides); the full
training loop is exercised by tests/test_full_cycle.py."""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))


def _parse(argv, monkeypatch):
    import train as cli

    monkeypatch.setattr(sys, "argv", ["train.py"] + argv)
    return cli.parse_args()


def test_no_lang_ca_flag(monkeypatch):
    args = _parse(["--synthetic", "--no-lang-ca"], monkeypatch)
    assert args.no_lang_ca is True
    assert _parse(["--synthetic"], monkeypatch).no_lang_ca is False


def test_fix_lang_embedding_tristate(monkeypatch):
    # None = keep the preset's value; explicit flags override either way
    assert _parse(["--synthetic"], monkeypatch).fix_lang_embedding is None
    assert _parse(["--synthetic", "--fix-lang-embedding"],
                  monkeypatch).fix_lang_embedding is True
    assert _parse(["--synthetic", "--train-lang-embedding"],
                  monkeypatch).fix_lang_embedding is False


def test_overrides_reach_model_config(monkeypatch):
    from vln_imagine_tpu.config import tiny_test_config, _replace

    args = _parse(["--synthetic", "--no-lang-ca",
                   "--train-lang-embedding"], monkeypatch)
    cfg = tiny_test_config(args.agent)
    over = {}
    if args.no_lang_ca:
        over["no_lang_ca"] = True
    if args.fix_lang_embedding is not None:
        over["fix_lang_embedding"] = args.fix_lang_embedding
    cfg = _replace(cfg, "model", **over)
    assert cfg.model.no_lang_ca is True
    assert cfg.model.fix_lang_embedding is False
