"""Per-op device-time report from a JAX profiler trace (SURVEY.md §5).

The reference exposes only wall-clock timing (train.py:192-196); on TPU the
equivalent of per-kernel profiling is the XLA device trace. `jax_trace`
(utils.profiling) captures it; this module turns the captured
`*.trace.json.gz` into a ranked per-op table with HLO names, source
locations, call counts and achieved bytes/s — the workflow that found every
optimization win of the rasterizer (pallas kernels vs gathers vs sorts).

CLI: python -m splat_tpu.utils.trace_report <trace_dir> [--iters N] [--top K]
"""
from __future__ import annotations

import collections
import dataclasses
import glob
import gzip
import json
from pathlib import Path


@dataclasses.dataclass
class OpStat:
    name: str
    total_us: float
    count: int
    source: str
    bytes_accessed: int

    @property
    def bw_gbps(self) -> float:
        if self.total_us <= 0:
            return 0.0
        return self.bytes_accessed * self.count / (self.total_us * 1e-6) / 1e9


def load_trace(trace_dir: str | Path) -> dict:
    """Find and load the trace-viewer JSON inside a jax_trace output dir."""
    pats = [
        str(Path(trace_dir) / "**" / "*.trace.json.gz"),
        str(Path(trace_dir) / "*.trace.json.gz"),
    ]
    files: list[str] = []
    for p in pats:
        files += glob.glob(p, recursive=True)
    if not files:
        raise FileNotFoundError(f"no *.trace.json.gz under {trace_dir}")
    newest = max(files, key=lambda f: Path(f).stat().st_mtime)
    with gzip.open(newest) as f:
        return json.load(f)


def device_op_stats(trace: dict, device_match: str = "TPU") -> list[OpStat]:
    """Aggregate complete ('X') events on device lanes by op name."""
    pids = {
        e["pid"]: e["args"].get("name", "")
        for e in trace["traceEvents"]
        if e.get("ph") == "M" and e.get("name") == "process_name"
    }
    dev = {p for p, n in pids.items() if device_match in n}
    agg: collections.Counter = collections.Counter()
    cnt: collections.Counter = collections.Counter()
    meta: dict[str, dict] = {}
    for e in trace["traceEvents"]:
        if e.get("ph") == "X" and "dur" in e and e["pid"] in dev:
            name = e["name"]
            agg[name] += e["dur"]
            cnt[name] += 1
            if name not in meta:
                meta[name] = e.get("args", {})
    out = []
    for name, us in agg.items():
        m = meta.get(name, {})
        out.append(OpStat(
            name=name,
            total_us=float(us),
            count=cnt[name],
            source=str(m.get("source", "")),
            bytes_accessed=int(m.get("bytes_accessed", 0) or 0),
        ))
    out.sort(key=lambda s: -s.total_us)
    return out


def report(trace_dir: str | Path, iters: int = 1, top: int = 25,
           device_match: str = "TPU") -> str:
    """Human-readable ranked table; durations divided by `iters` (e.g. the
    lax.scan length of the profiled loop) to get per-step numbers."""
    stats = device_op_stats(load_trace(trace_dir), device_match)
    # the outermost jit/while wrappers nest every other op; drop them from
    # the leaf ranking but use the largest as the step total
    wrappers = [s for s in stats if s.count == 0 or s.name.startswith(("jit_", "while."))
                or s.name == "0"]
    leaves = [s for s in stats if s not in wrappers]
    total = max((s.total_us for s in wrappers), default=sum(s.total_us for s in leaves))
    lines = [
        f"device total: {total / iters / 1e3:.2f} ms/iter "
        f"({iters} iters; leaf ops below)",
        f"{'us/iter':>10} {'%':>5} {'calls':>6}  {'op':<44} source",
    ]
    for s in leaves[:top]:
        pct = 100.0 * s.total_us / max(total, 1e-9)
        src = s.source.split("/")[-1] if s.source else ""
        lines.append(
            f"{s.total_us / iters:10.0f} {pct:5.1f} {s.count // max(iters,1):6d}"
            f"  {s.name[:44]:<44} {src}"
        )
    return "\n".join(lines)


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("trace_dir")
    ap.add_argument("--iters", type=int, default=1)
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--device-match", default="TPU")
    args = ap.parse_args()
    print(report(args.trace_dir, args.iters, args.top, args.device_match))


if __name__ == "__main__":
    main()
