"""cardiax.io.profiling summarizer: parse a synthetic Chrome trace fixture
(the exact event shapes jax.profiler emits — device pid metadata, XLA
Ops/Modules threads, device_duration_ps args) into the per-op table the
engine prints after an ``others.profile_dir`` capture (SURVEY.md 5.1)."""

import gzip
import json

from cardiax.io.profiling import format_summary, summarize_trace


def _write_trace(tmp_path, events):
    d = tmp_path / "plugins" / "profile" / "2026_08_17_00_00_00"
    d.mkdir(parents=True)
    with gzip.open(d / "host.trace.json.gz", "wt") as fh:
        json.dump({"traceEvents": events}, fh)
    return tmp_path


def _meta(pid, name, tid=None):
    e = {"ph": "M", "pid": pid, "name": "process_name",
         "args": {"name": name}}
    if tid is not None:
        e["name"] = "thread_name"
        e["tid"] = tid
    return e


def test_summarize_synthetic_device_trace(tmp_path):
    events = [
        _meta(7, "/device:TPU:0"),
        _meta(1, "/host:CPU"),
        _meta(7, "XLA Ops", tid=2),
        _meta(7, "XLA Modules", tid=3),
        _meta(1, "python", tid=9),
        # two module runs
        {"ph": "X", "pid": 7, "tid": 3, "name": "jit(train_step)", "dur": 9000},
        {"ph": "X", "pid": 7, "tid": 3, "name": "jit(train_step)", "dur": 9000},
        # ops: fusion.1 runs twice (grouped by tf_op), pallas once
        {"ph": "X", "pid": 7, "tid": 2, "name": "fusion.1",
         "args": {"tf_op": "jit(train_step)/conv:", "hlo_category":
                  "convolution fusion", "device_duration_ps": 4_000_000_000}},
        {"ph": "X", "pid": 7, "tid": 2, "name": "fusion.1",
         "args": {"tf_op": "jit(train_step)/conv:", "hlo_category":
                  "convolution fusion", "device_duration_ps": 2_000_000_000}},
        {"ph": "X", "pid": 7, "tid": 2, "name": "custom-call.5",
         "args": {"hlo_category": "custom-call",
                  "device_duration_ps": 3_000_000_000}},
        # host event with a device-looking name must be ignored
        {"ph": "X", "pid": 1, "tid": 9, "name": "fusion.1", "dur": 999999},
    ]
    s = summarize_trace(_write_trace(tmp_path, events))
    assert s is not None
    assert s["n_steps"] == 2
    assert abs(s["total_ms"] - 9.0) < 1e-9          # 4 + 2 + 3 ms
    assert abs(s["per_step_ms"] - 4.5) < 1e-9
    ops = {r["op"]: r for r in s["ops"]}
    assert ops["jit(train_step)/conv"]["count"] == 2
    assert abs(ops["jit(train_step)/conv"]["ms"] - 6.0) < 1e-9
    assert ops["custom-call.5"]["ms"] == 3.0
    cats = {r["category"]: r["ms"] for r in s["categories"]}
    assert cats == {"convolution fusion": 6.0, "custom-call": 3.0}
    text = format_summary(s)
    assert "device time 9.0 ms over 2 module runs (4.5 ms/run)" in text
    assert "convolution fusion" in text


def test_summarize_host_only_trace_returns_none(tmp_path):
    events = [_meta(1, "/host:CPU"), _meta(1, "python", tid=9),
              {"ph": "X", "pid": 1, "tid": 9, "name": "py_call", "dur": 100}]
    assert summarize_trace(_write_trace(tmp_path, events)) is None


def test_missing_trace_dir_returns_none(tmp_path):
    assert summarize_trace(tmp_path / "nope") is None
