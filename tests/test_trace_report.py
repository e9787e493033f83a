"""utils.trace_report: parse a profiler trace into a per-op table."""
import gzip
import json

from splat_tpu.utils import trace_report


def _write_fake_trace(tmp_path):
    events = [
        {"ph": "M", "pid": 3, "name": "process_name",
         "args": {"name": "/device:TPU:0"}},
        {"ph": "M", "pid": 9, "name": "process_name",
         "args": {"name": "/host:CPU"}},
        {"ph": "X", "pid": 3, "dur": 1000.0, "name": "jit_step(123)", "args": {}},
        {"ph": "X", "pid": 3, "dur": 600.0, "name": "my_kernel.1",
         "args": {"source": "/repo/splat_tpu/ops/x.py:10", "bytes_accessed": 4096}},
        {"ph": "X", "pid": 3, "dur": 150.0, "name": "fusion.9",
         "args": {"source": "/repo/splat_tpu/ops/y.py:20"}},
        {"ph": "X", "pid": 3, "dur": 150.0, "name": "fusion.9",
         "args": {"source": "/repo/splat_tpu/ops/y.py:20"}},
        # host event must be ignored
        {"ph": "X", "pid": 9, "dur": 9999.0, "name": "python", "args": {}},
    ]
    d = tmp_path / "plugins" / "profile" / "run1"
    d.mkdir(parents=True)
    with gzip.open(d / "vm.trace.json.gz", "wt") as f:
        json.dump({"traceEvents": events}, f)
    return tmp_path


def test_report_ranks_device_leaf_ops(tmp_path):
    _write_fake_trace(tmp_path)
    stats = trace_report.device_op_stats(trace_report.load_trace(tmp_path))
    by_name = {s.name: s for s in stats}
    assert by_name["my_kernel.1"].total_us == 600.0
    assert by_name["fusion.9"].count == 2
    assert by_name["fusion.9"].total_us == 300.0
    assert "python" not in by_name

    rep = trace_report.report(tmp_path, iters=2, top=5)
    assert "my_kernel.1" in rep and "x.py:10" in rep
    # wrapper is the step total, not a leaf row
    assert "device total: 0.50 ms/iter" in rep
    assert "jit_step" not in rep.splitlines()[2]
