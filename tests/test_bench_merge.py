"""bench.py full-run measurement cache: a budgeted run may merge lanes it
could not fit from this round's unbudgeted `bench.py --full` run — but only
when the code hash AND device kind match and the capture is recent, and
every merged field must be named.

The driver runs `python bench.py` under a ~520 s soft budget; the full lane
set (extras + flops + utilization sweep) takes far longer than that even
with a warm XLA compile cache, so the complete artifact is captured once
per round by `--full` and merged in, explicitly labeled.  (The reference
has no benchmark at all — VLN-HAMT/finetune_src/r2r/main.py:395-398 prints
per-val-env wall time only.)
"""

import datetime
import importlib.util
import json
import sys

import pytest

KIND = "TPU v5 lite"


def _now_iso(days_ago: float = 0.0) -> str:
    t = datetime.datetime.now(datetime.timezone.utc) - datetime.timedelta(
        days=days_ago)
    return t.isoformat(timespec="seconds")


@pytest.fixture(scope="module")
def bench():
    spec = importlib.util.spec_from_file_location(
        "bench", "/root/repo/bench.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules["bench"] = mod
    spec.loader.exec_module(mod)
    return mod


def _record(**over):
    rec = {
        "metric": "hamt_eval_episodes_per_sec_per_chip",
        "value": 350.0,
        "unit": "episodes/s",
        "vs_baseline": None,
        "baseline": {"ours_tpu_fixed_horizon_eps_per_sec": None,
                     "reference_torch_cpu_eps_per_sec": None},
        "extras": {"duet_eval_episodes_per_sec_per_chip": None,
                   "hamt_train_step_ms": 170.0},
        "utilization_sweep": None,
    }
    rec.update(over)
    return rec


def _full(bench, tmp_path, code_hash, captured_at=None, device_kind=KIND,
          **rec_over):
    full = {
        "captured_at": captured_at or _now_iso(),
        "code_hash": code_hash,
        "device_kind": device_kind,
        "record": _record(
            value=341.0, vs_baseline=551.0,
            baseline={"ours_tpu_fixed_horizon_eps_per_sec": 340.1,
                      "reference_torch_cpu_eps_per_sec": 0.618},
            extras={"duet_eval_episodes_per_sec_per_chip": 725.6,
                    "hamt_train_step_ms": 171.0},
            utilization_sweep={"hamt": [{"batch": 8, "mfu": 0.03}]},
            **rec_over),
    }
    p = tmp_path / "bench_full.json"
    p.write_text(json.dumps(full))
    return p


def test_merges_only_missing_fields(bench, tmp_path, monkeypatch):
    p = _full(bench, tmp_path, bench._code_hash())
    monkeypatch.setattr(bench, "_FULL_RUN_PATH", str(p))
    rec = bench._merge_full_run(_record(), KIND)
    # live measurements are never overwritten
    assert rec["value"] == 350.0
    assert rec["extras"]["hamt_train_step_ms"] == 170.0
    # budget-cut fields are filled from the full run
    assert rec["vs_baseline"] == 551.0
    assert rec["extras"]["duet_eval_episodes_per_sec_per_chip"] == 725.6
    assert rec["baseline"]["reference_torch_cpu_eps_per_sec"] == 0.618
    assert rec["utilization_sweep"] == {"hamt": [{"batch": 8, "mfu": 0.03}]}
    # and every merged field is named with provenance
    prov = rec["merged_from_full_run"]
    assert prov["captured_at"] == json.loads(p.read_text())["captured_at"]
    assert set(prov["fields"]) == {
        "vs_baseline", "utilization_sweep",
        "extras.duet_eval_episodes_per_sec_per_chip",
        "baseline.ours_tpu_fixed_horizon_eps_per_sec",
        "baseline.reference_torch_cpu_eps_per_sec"}


def test_stale_code_hash_merges_nothing(bench, tmp_path, monkeypatch):
    p = _full(bench, tmp_path, "deadbeef00000000")
    monkeypatch.setattr(bench, "_FULL_RUN_PATH", str(p))
    rec = bench._merge_full_run(_record(), KIND)
    assert rec["vs_baseline"] is None
    assert "merged_from_full_run" not in rec


def test_device_kind_mismatch_merges_nothing(bench, tmp_path, monkeypatch):
    p = _full(bench, tmp_path, bench._code_hash(), device_kind="TPU v4")
    monkeypatch.setattr(bench, "_FULL_RUN_PATH", str(p))
    rec = bench._merge_full_run(_record(), KIND)
    assert "merged_from_full_run" not in rec


def test_missing_device_kind_merges_nothing(bench, tmp_path, monkeypatch):
    # pre-guard artifacts (no device_kind) are refused outright, even when
    # the current run cannot name its own chip
    p = _full(bench, tmp_path, bench._code_hash(), device_kind=None)
    monkeypatch.setattr(bench, "_FULL_RUN_PATH", str(p))
    assert "merged_from_full_run" not in bench._merge_full_run(_record(), KIND)
    assert "merged_from_full_run" not in bench._merge_full_run(_record(), None)


def test_stale_capture_merges_nothing(bench, tmp_path, monkeypatch):
    p = _full(bench, tmp_path, bench._code_hash(),
              captured_at=_now_iso(days_ago=bench.MERGE_MAX_AGE_DAYS + 1))
    monkeypatch.setattr(bench, "_FULL_RUN_PATH", str(p))
    rec = bench._merge_full_run(_record(), KIND)
    assert "merged_from_full_run" not in rec


def test_vs_baseline_needs_both_inputs_from_same_run(bench, tmp_path,
                                                     monkeypatch):
    # the current run measured torch_cpu itself but not fixed-horizon: the
    # cached ratio's inputs would mix runs, so vs_baseline must NOT merge
    p = _full(bench, tmp_path, bench._code_hash())
    monkeypatch.setattr(bench, "_FULL_RUN_PATH", str(p))
    rec = bench._merge_full_run(_record(
        baseline={"ours_tpu_fixed_horizon_eps_per_sec": None,
                  "reference_torch_cpu_eps_per_sec": 0.7}), KIND)
    assert rec["vs_baseline"] is None
    assert "vs_baseline" not in rec["merged_from_full_run"]["fields"]
    # fixed-horizon still fills (it is a standalone measurement)
    assert rec["baseline"]["ours_tpu_fixed_horizon_eps_per_sec"] == 340.1


def test_missing_full_run_is_noop(bench, tmp_path, monkeypatch):
    monkeypatch.setattr(bench, "_FULL_RUN_PATH",
                        str(tmp_path / "nope.json"))
    rec = bench._merge_full_run(_record(), KIND)
    assert rec == _record()


def test_fixed_from_sweep_picks_batch8_point(bench):
    sweep = {"hamt": [{"batch": 8, "value": 404.5},
                      {"batch": 64, "value": 483.0}]}
    assert bench._fixed_from_sweep(sweep) == 404.5


def test_fixed_from_sweep_ignores_missing_values(bench):
    # a timed-out sweep point carries no value; other batches don't stand in
    assert bench._fixed_from_sweep({"hamt": [{"batch": 8, "value": None},
                                             {"batch": 64, "value": 483.0}]}
                                   ) is None
    assert bench._fixed_from_sweep({"hamt": []}) is None
    assert bench._fixed_from_sweep({}) is None


def test_committed_artifact_is_mergeable(bench):
    """Canary against the real committed bench_full.json: it must parse,
    carry the merge-guard fields, and — when its code hash still matches
    the working tree — actually fill a budget-cut record.  A skip here
    means a compute-path edit landed without re-capturing the artifact, so
    the driver's budgeted end-of-round bench will NOT merge the full
    surface (extras/sweep): re-run `python bench.py --full` on the chip."""
    try:
        with open("/root/repo/bench_full.json") as f:
            full = json.load(f)
    except FileNotFoundError:
        pytest.skip("no committed bench_full.json")
    assert full.get("device_kind"), "artifact missing the same-chip guard"
    assert full.get("captured_at") and full.get("code_hash")
    rec = full.get("record", {})
    assert rec.get("value"), "artifact carries no headline measurement"
    if full["code_hash"] != bench._code_hash():
        pytest.skip(
            "bench_full.json code hash is STALE (compute-path edit since "
            "capture): budgeted runs will not merge it — re-capture with "
            "`python bench.py --full` on the live chip")
    merged = bench._merge_full_run(_record(
        extras={"duet_eval_episodes_per_sec_per_chip": None,
                "hamt_train_step_ms": None}), full["device_kind"])
    assert "merged_from_full_run" in merged
    # every non-null lane the artifact carries must actually fill in
    for k, v in (rec.get("extras") or {}).items():
        if v is not None:
            assert merged["extras"][k] == v
    if rec.get("utilization_sweep") is not None:
        assert merged["utilization_sweep"] == rec["utilization_sweep"]


def test_complete_record_gets_no_provenance_block(bench, tmp_path,
                                                  monkeypatch):
    p = _full(bench, tmp_path, bench._code_hash())
    monkeypatch.setattr(bench, "_FULL_RUN_PATH", str(p))
    done = _record(
        vs_baseline=540.0,
        baseline={"ours_tpu_fixed_horizon_eps_per_sec": 339.0,
                  "reference_torch_cpu_eps_per_sec": 0.62},
        extras={"duet_eval_episodes_per_sec_per_chip": 726.0,
                "hamt_train_step_ms": 170.0},
        utilization_sweep={"hamt": []})
    rec = bench._merge_full_run(dict(done), KIND)
    assert rec == done
