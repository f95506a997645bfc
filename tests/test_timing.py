"""EngineStat / temporal_warning unit tests (src/engine/timing.rs parity)."""

import time

from mixlab_tpu import protocol as p
from mixlab_tpu.engine.timing import EngineStat, temporal_warning


def test_temporal_warning_decay():
    assert temporal_warning(None) is None
    assert temporal_warning(0.05) == p.TemporalWarningStatus.ACTIVE
    assert temporal_warning(0.5) == p.TemporalWarningStatus.RECENT
    assert temporal_warning(6.0) is None


def test_engine_stat_budget_and_report():
    stat = EngineStat(tick_rate=60)
    assert stat.tick_budget_us == 16_666

    # a fast tick: realtime, no lag
    stat.record_tick(time.monotonic() + 1.0, lambda ts: None)
    info = stat.report()
    assert info.realtime is True
    assert info.lag is None
    assert info.tick_budget.us == 16_666
    engine_accounts = [a for a, m in info.accounts if a.kind == "engine"]
    assert engine_accounts

    # a slow tick: over budget -> lag Active
    def slow(ts):
        time.sleep(0.03)

    stat.record_tick(time.monotonic() - 1.0, slow)
    info = stat.report()
    assert info.realtime is False
    assert info.lag == p.TemporalWarningStatus.ACTIVE


def test_per_module_accounting_and_removal():
    stat = EngineStat(tick_rate=60)

    def tick(ts):
        ts.record_module(p.ModuleId(5), lambda: time.sleep(0.002))

    stat.record_tick(time.monotonic() + 1.0, tick)
    info = stat.report()
    mods = {a.module_id.value: m.last.us for a, m in info.accounts if a.kind == "module"}
    assert 5 in mods and mods[5] >= 1500
    stat.remove_module(p.ModuleId(5))
    info = stat.report()
    assert all(a.kind != "module" for a, m in info.accounts)
