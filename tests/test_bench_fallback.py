"""bench.py outage behavior: a dead backend must degrade to the last
successful measurement marked ``stale`` (VERDICT r3 weak #1), never a
bare 0.0 once any real measurement exists, and never a hang.

Driver contract: exactly ONE JSON line on stdout
(BENCH_r03.json shows the error-record form this replaces).
"""

import importlib.util
import json
import sys

import pytest

REPO = __import__("pathlib").Path(__file__).resolve().parents[1]


@pytest.fixture()
def bench(tmp_path, monkeypatch):
    spec = importlib.util.spec_from_file_location(
        "bench_under_test", REPO / "bench.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    monkeypatch.setattr(
        mod, "LAST_GOOD_PATH", str(tmp_path / "bench_last_good.json")
    )
    return mod


def _run_main(bench, capsys):
    bench.main()
    lines = [
        ln for ln in capsys.readouterr().out.strip().splitlines() if ln
    ]
    assert len(lines) == 1, "driver contract: exactly one JSON line"
    return json.loads(lines[0])


def test_outage_with_no_history_emits_error_record(
    bench, capsys, monkeypatch
):
    def boom():
        raise RuntimeError("backend unreachable")

    monkeypatch.setattr(bench, "bench_tpu", boom)
    out = _run_main(bench, capsys)
    assert out["value"] == 0.0
    assert out["stale"] is True
    assert "backend unreachable" in out["unit"]


def test_success_persists_then_outage_replays_stale(
    bench, capsys, monkeypatch
):
    # 1) a successful run saves the sidecar
    monkeypatch.setattr(
        bench,
        "bench_tpu",
        lambda: {
            "steps_per_sec": 412.5,
            "lanes": 768,
            "trials": 7,
            "spread_kind": "middle-trials range",
            "trial_spread": 0.04,
            "flops_per_step_batch": 1e9,
            "mfu": 0.01,
            "device": "TPU v5 lite",
        },
    )
    monkeypatch.setattr(bench, "bench_torch", lambda b: 30.0)
    good = _run_main(bench, capsys)
    assert good["value"] == 412.5
    assert good["vs_baseline"] == 13.75
    assert "stale" not in good

    # 2) the next run hits a dead tunnel -> last-good, marked stale
    def boom():
        raise RuntimeError("device init deadline exhausted")

    monkeypatch.setattr(bench, "bench_tpu", boom)
    out = _run_main(bench, capsys)
    assert out["value"] == 412.5
    assert out["vs_baseline"] == 13.75
    assert out["stale"] is True
    assert out["unit"].startswith("STALE")
    assert "deadline exhausted" in out["outage"]
    assert out["lanes"] == 768
    assert out["device"] == "TPU v5 lite"


def test_corrupt_sidecar_degrades_to_error_record(
    bench, capsys, monkeypatch, tmp_path
):
    (tmp_path / "bench_last_good.json").write_text("{not json")

    def boom():
        raise RuntimeError("down")

    monkeypatch.setattr(bench, "bench_tpu", boom)
    out = _run_main(bench, capsys)
    assert out["value"] == 0.0
    assert out["stale"] is True
