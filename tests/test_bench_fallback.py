"""bench.py driver-contract behavior.

Hardened twice: (r3) a dead backend must degrade to the best prior
measurement marked ``stale``, never a bare 0.0 once any real measurement
exists, and never a hang; (r5, after BENCH_r04 rc=124/parsed=null) stdout
carries one-or-more JSON record lines — provisional records land as soon
as measurements exist, a SIGTERM/atexit flush covers kills at any moment,
the driver parses the LAST line — and the sidecar keeps {latest, best}
so a degraded run can neither erase the best-known number nor land
without an explicit ``regression_vs_best`` flag.
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


def _fake_tpu(value, lanes=768):
    def fake(reporter=None):
        return {
            "steps_per_sec": value,
            "lanes": lanes,
            "trials": 7,
            "spread_kind": "middle-trials range",
            "trial_spread": 0.04,
            "flops_per_step_batch": 1e9,
            "mfu": 0.01,
            "device": "TPU v5 lite",
            "dispatch_floor_ms": 1.2,
            "upload_mbps": 800.0,
        }

    return fake


def _run_main(bench, capsys):
    bench.main()
    lines = [
        ln for ln in capsys.readouterr().out.strip().splitlines() if ln
    ]
    assert lines, "driver contract: at least one JSON line"
    records = [json.loads(ln) for ln in lines]
    # every stdout line must parse (the driver takes the last)
    return records[-1]


def test_outage_with_no_history_emits_error_record(
    bench, capsys, monkeypatch
):
    def boom(reporter=None):
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
    monkeypatch.setattr(bench, "bench_tpu", _fake_tpu(412.5))
    monkeypatch.setattr(bench, "bench_torch", lambda b: 30.0)
    good = _run_main(bench, capsys)
    assert good["value"] == 412.5
    assert good["vs_baseline"] == 13.75
    assert good["dispatch_floor_ms"] == 1.2
    assert good["upload_mbps"] == 800.0
    assert "stale" not in good

    # 2) the next run hits a dead tunnel -> best known, marked stale
    def boom(reporter=None):
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

    def boom(reporter=None):
        raise RuntimeError("down")

    monkeypatch.setattr(bench, "bench_tpu", boom)
    out = _run_main(bench, capsys)
    assert out["value"] == 0.0
    assert out["stale"] is True


def test_degraded_run_flags_regression_and_keeps_best(
    bench, capsys, monkeypatch
):
    """VERDICT r4 weak #4: a 3.4x run silently replaced the 9.49x
    record. Now: the degraded run completes but carries
    ``regression_vs_best``, the sidecar keeps both, and a later outage
    replays the BEST, not the latest."""
    monkeypatch.setattr(bench, "bench_torch", lambda b: 30.0)
    monkeypatch.setattr(bench, "bench_tpu", _fake_tpu(412.5))
    _run_main(bench, capsys)

    monkeypatch.setattr(bench, "bench_tpu", _fake_tpu(107.2, lanes=1024))
    degraded = _run_main(bench, capsys)
    assert degraded["value"] == 107.2
    reg = degraded["regression_vs_best"]
    assert reg["best_value"] == 412.5
    assert reg["best_lanes"] == 768
    assert reg["ratio"] == pytest.approx(107.2 / 412.5, abs=1e-3)

    sidecar = bench._load_sidecar()
    assert sidecar["latest"]["value"] == 107.2
    assert sidecar["best"]["value"] == 412.5

    def boom(reporter=None):
        raise RuntimeError("down")

    monkeypatch.setattr(bench, "bench_tpu", boom)
    out = _run_main(bench, capsys)
    assert out["value"] == 412.5  # best, not latest
    assert out["stale"] is True
    assert out["latest_measured_at"] == sidecar["latest"]["measured_at"]


def test_small_improvement_does_not_flag_regression(
    bench, capsys, monkeypatch
):
    monkeypatch.setattr(bench, "bench_torch", lambda b: 30.0)
    monkeypatch.setattr(bench, "bench_tpu", _fake_tpu(412.5))
    _run_main(bench, capsys)
    monkeypatch.setattr(bench, "bench_tpu", _fake_tpu(400.0))
    out = _run_main(bench, capsys)  # within 25% of best: fine
    assert "regression_vs_best" not in out
    monkeypatch.setattr(bench, "bench_tpu", _fake_tpu(500.0))
    out = _run_main(bench, capsys)
    assert "regression_vs_best" not in out
    assert bench._load_sidecar()["best"]["value"] == 500.0


def test_legacy_flat_sidecar_is_promoted(bench, capsys, monkeypatch, tmp_path):
    """Pre-r5 sidecars were a single flat record; they must keep working
    as both latest and best."""
    legacy = {
        "metric": "mapcma_pipeline_env_steps_per_sec_per_chip",
        "value": 288.92,
        "unit": "env steps/s (B=768 ...)",
        "vs_baseline": 9.49,
        "lanes": 768,
        "measured_at": "2026-08-16T00:00:00Z",
        "git_commit": "1c5c7b9",
    }
    (tmp_path / "bench_last_good.json").write_text(json.dumps(legacy))

    def boom(reporter=None):
        raise RuntimeError("down")

    monkeypatch.setattr(bench, "bench_tpu", boom)
    out = _run_main(bench, capsys)
    assert out["value"] == 288.92
    assert out["stale"] is True


def test_reporter_kill_flush_emits_valid_json(bench, capsys):
    """Killing bench.py at ANY point must leave a valid last JSON line:
    before any measurement -> the sidecar best (stale) or an error
    record; after a provisional -> that provisional."""
    r = bench.Reporter()
    # _flush writes to fd 1 directly (async-signal-safe); capsys may not
    # capture raw fd writes, so inspect the armed payload instead
    rec = json.loads(r._pending.decode())
    assert rec["stale"] is True
    assert rec["value"] == 0.0  # no sidecar in tmp_path
    r.final({"metric": "m", "value": 1.0, "unit": "u", "vs_baseline": 1})

    r2 = bench.Reporter()
    r2.provisional(
        {
            "metric": "mapcma_pipeline_env_steps_per_sec_per_chip",
            "value": 250.0,
            "unit": "env steps/s (sweep median)",
            "vs_baseline": 8.2,
        }
    )
    out = capsys.readouterr().out.strip().splitlines()
    assert json.loads(out[-1])["provisional"] is True
    armed = json.loads(r2._pending.decode())
    assert armed["value"] == 250.0
    # a clean final unregisters the flush; nothing more is armed to print
    r2.final({"metric": "m", "value": 1.0, "unit": "u", "vs_baseline": 1})
    r2._flush()
    assert r2._flushed is False or r2._final_done  # flush is a no-op now


def test_reporter_flush_uses_sidecar_best(bench, capsys, monkeypatch):
    monkeypatch.setattr(bench, "bench_torch", lambda b: 30.0)
    monkeypatch.setattr(bench, "bench_tpu", _fake_tpu(412.5))
    _run_main(bench, capsys)
    r = bench.Reporter()
    armed = json.loads(r._pending.decode())
    assert armed["value"] == 412.5
    assert armed["stale"] is True
    r.final({"metric": "m", "value": 1.0, "unit": "u", "vs_baseline": 1})
    capsys.readouterr()


def test_latent_lane_lands_in_final_record(bench, monkeypatch, capsys):
    """The secondary LatentCMA measurement rides the final record as
    latent_cma_steps_per_sec / latent_lanes; its absence (budget/
    failure) leaves the headline record untouched."""
    fake = _fake_tpu(400.0)

    def with_latent(reporter=None):
        out = fake(reporter)
        out["latent"] = {
            "steps_per_sec": 512.5, "lanes": 256, "trials": 2,
        }
        return out

    monkeypatch.setattr(bench, "bench_tpu", with_latent)
    monkeypatch.setattr(bench, "bench_torch", lambda b: 40.0)
    rec = _run_main(bench, capsys)
    assert rec["latent_cma_steps_per_sec"] == 512.5
    assert rec["latent_lanes"] == 256
    assert rec["value"] == 400.0  # headline unchanged

    monkeypatch.setattr(bench, "bench_tpu", _fake_tpu(400.0))
    rec = _run_main(bench, capsys)
    assert "latent_cma_steps_per_sec" not in rec


def test_measure_latent_runs_the_fused_act_step(bench):
    """Execution coverage for the LatentCMA bench lane itself (tiny
    shapes on the CPU platform)."""
    import jax

    monkeypatch_hw = bench.DEPTH_HW
    bench.DEPTH_HW = 64
    try:
        pipe = bench.TpuPipeline.__new__(bench.TpuPipeline)
        pipe.jax = jax
        rates = pipe.measure_latent(2, warmup=1, iters=2, trials=1)
        assert rates.shape == (1,) and float(rates[0]) > 0
    finally:
        bench.DEPTH_HW = monkeypatch_hw
