"""utils/profiling: stage timers, metrics dict, dump."""

import json
import time

from hichap_master_tpu.utils import profiling


def test_stage_accumulates_and_dumps(tmp_path):
    profiling.reset_metrics()
    with profiling.stage("unit.a"):
        time.sleep(0.01)
    with profiling.stage("unit.a"):
        time.sleep(0.01)
    with profiling.stage("unit.b"):
        pass
    m = profiling.metrics()
    assert m["unit.a"] >= 0.02 and "unit.b" in m
    out = tmp_path / "m.json"
    profiling.dump_metrics(str(out))
    assert json.loads(out.read_text())["unit.a"] == m["unit.a"]
    profiling.reset_metrics()
    assert profiling.metrics() == {}


def test_stage_records_on_exception():
    profiling.reset_metrics()
    try:
        with profiling.stage("unit.err"):
            raise RuntimeError("boom")
    except RuntimeError:
        pass
    assert "unit.err" in profiling.metrics()
    profiling.reset_metrics()


def test_trace_noop_without_logdir():
    with profiling.trace(None):
        pass
