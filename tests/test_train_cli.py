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
    """Exercises the ACTUAL override wiring (train.model_overrides)."""
    import train as cli

    from vln_imagine_tpu.config import tiny_test_config, _replace

    args = _parse(["--synthetic", "--no-lang-ca", "--no-imagination",
                   "--train-lang-embedding"], monkeypatch)
    cfg = tiny_test_config(args.agent)
    over = cli.model_overrides(args, cfg)
    cfg = _replace(cfg, "model", **over)
    assert cfg.model.no_lang_ca is True
    assert cfg.model.fix_lang_embedding is False
    assert cfg.model.imagine_enc_pano is False


def test_no_lang_ca_guards(monkeypatch):
    """Bad combinations die with actionable messages, not einsum errors."""
    import pytest
    import train as cli

    from vln_imagine_tpu.config import tiny_test_config

    # default HAMT preset: imagination concatenated with language + aux loss
    args = _parse(["--synthetic", "--no-lang-ca"], monkeypatch)
    cfg = tiny_test_config("hamt")
    with pytest.raises(SystemExit, match="imagination|aux"):
        cli.model_overrides(args, cfg)
    # DUET has no language cross-attention toggle
    args = _parse(["--agent", "duet", "--synthetic", "--no-lang-ca"],
                  monkeypatch)
    with pytest.raises(SystemExit, match="HAMT"):
        cli.model_overrides(args, tiny_test_config("duet"))
