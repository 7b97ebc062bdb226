"""Scheduler/timing unit tests."""

import time

from rt_rs_tpu.handlers.base import IntrsStats
from rt_rs_tpu.timing import BenchScheduler, DefaultScheduler


def test_default_scheduler_paces():
    s = DefaultScheduler(fps=50)  # 20 ms period
    s.frame_done()
    assert not s.ready()
    time.sleep(0.025)
    assert s.ready()


def test_bench_scheduler_running_average(tmp_path):
    out = tmp_path / "chart.png"
    s = BenchScheduler(IntrsStats("X", 123), out_path=str(out), interval=5)
    for i in range(10):
        s.record(0.010)
    s.finish()
    assert abs(s.running_average_ms - 10.0) < 1e-6
    assert len(s.averages) >= 2
    assert out.exists()
