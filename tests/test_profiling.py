"""Wall-clock phase accounting (utils/profiling.py): the eval/collect
loops' coarse per-phase timers behind IVLNCE_PHASE_TIMES."""

from ivlnce_tpu.utils import profiling


def test_wall_range_disabled_is_noop(monkeypatch):
    monkeypatch.setattr(profiling, "_PHASES_ON", False)
    profiling.reset_phases()
    with profiling.wall_range("x"):
        pass
    assert profiling.phase_report() == ""


def test_wall_range_accumulates_and_reports(monkeypatch):
    monkeypatch.setattr(profiling, "_PHASES_ON", True)
    profiling.reset_phases()
    for _ in range(3):
        with profiling.wall_range("alpha"):
            pass
    with profiling.wall_range("beta"):
        pass
    report = profiling.phase_report()
    assert "alpha=" in report and "/3" in report
    assert "beta=" in report and "%" in report
    profiling.reset_phases()
    assert profiling.phase_report() == ""


def test_wall_range_counts_exceptions(monkeypatch):
    monkeypatch.setattr(profiling, "_PHASES_ON", True)
    profiling.reset_phases()
    try:
        with profiling.wall_range("boom"):
            raise RuntimeError
    except RuntimeError:
        pass
    assert "boom=" in profiling.phase_report()
