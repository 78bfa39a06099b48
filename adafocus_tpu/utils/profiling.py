"""Tracing / profiling hooks.

The reference's only instrumentation is wall-clock AverageMeters
(actnet/main_dist.py:425-426 in /root/reference). Here:
  * ``trace(dir)``: context manager around ``jax.profiler`` emitting a
    TensorBoard-loadable device trace (XLA ops, HBM, ICI);
  * ``StepTimer``: batch-time / data-time meters matching the reference's
    ('Time', 'Data') pair, with device sync so timings are honest;
  * ``op_breakdown(dir)`` / ``top_ops(...)``: parse the captured trace and
    aggregate device-op time by fusion name — the attribution tool behind
    PERF.md's roofline analysis (no TensorBoard needed).
"""

from __future__ import annotations

import contextlib
import glob
import gzip
import json
import os
import time
from collections import defaultdict
from typing import Dict, Iterator, List, Tuple

import jax


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a device profile for the enclosed steps."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """data-time (host pipeline) + step-time (device) meters."""

    def __init__(self):
        self.data_time = 0.0
        self.step_time = 0.0
        self.count = 0
        self._t = time.perf_counter()

    def data_ready(self) -> None:
        now = time.perf_counter()
        self.data_time += now - self._t
        self._t = now

    def step_done(self, result=None) -> None:
        if result is not None:
            jax.block_until_ready(result)
        now = time.perf_counter()
        self.step_time += now - self._t
        self._t = now
        self.count += 1

    def summary(self) -> str:
        n = max(self.count, 1)
        return (f"data {self.data_time / n * 1e3:.1f} ms/step, "
                f"step {self.step_time / n * 1e3:.1f} ms/step")


# ---------------------------------------------------------------------------
# Trace parsing / op attribution.
# ---------------------------------------------------------------------------


def _find_trace_file(log_dir: str) -> str:
    pats = [
        os.path.join(log_dir, "**", "*.trace.json.gz"),
        os.path.join(log_dir, "**", "*.trace.json"),
    ]
    hits: List[str] = []
    for p in pats:
        hits.extend(glob.glob(p, recursive=True))
    if not hits:
        raise FileNotFoundError(f"no trace.json[.gz] under {log_dir}")
    return max(hits, key=os.path.getmtime)  # latest capture


def _load_events(path: str) -> dict:
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rt") as f:
        return json.load(f)


def op_breakdown(log_dir: str) -> Dict[str, Tuple[float, int]]:
    """Aggregate device-op wall time from a ``trace()`` capture.

    Returns {op_name: (total_ms, count)} for complete events on device
    (TPU/accelerator) lanes, skipping host/python lanes and trace metadata.
    Names are XLA fusion/op names (e.g. 'fusion.123', 'custom-call.4'); use
    ``top_ops`` for a sorted, name-grouped view.
    """
    data = _load_events(_find_trace_file(log_dir))
    events = data.get("traceEvents", [])
    # map pid -> process name to select device lanes
    pid_name: Dict[int, str] = {}
    for ev in events:
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pid_name[ev["pid"]] = ev.get("args", {}).get("name", "")
    device_pids = {
        pid for pid, name in pid_name.items()
        if ("TPU" in name or "GPU" in name or "/device" in name.lower())
        and "host" not in name.lower()
    }
    agg: Dict[str, List[float]] = defaultdict(lambda: [0.0, 0])
    for ev in events:
        if ev.get("ph") != "X" or ev.get("pid") not in device_pids:
            continue
        dur = ev.get("dur", 0) / 1e3  # us -> ms
        name = ev.get("name", "?")
        entry = agg[name]
        entry[0] += dur
        entry[1] += 1
    return {k: (v[0], v[1]) for k, v in agg.items()}


def _group_key(name: str) -> str:
    """Strip the per-instance suffix, keep the scope prefix:
    fusion.123 -> fusion; jit_glance/fusion.7 -> jit_glance/fusion;
    my_op.4.clone -> my_op — so same-named ops from different jit scopes
    stay in separate rows."""
    prefix, sep, base = name.rpartition("/")
    parts = base.split(".")
    while parts and (parts[-1].isdigit() or parts[-1] in ("clone", "remat")):
        parts.pop()
    return prefix + sep + (".".join(parts) or base)


def top_ops(
    log_dir: str, n: int = 20, group: bool = True
) -> List[Tuple[str, float, int]]:
    """[(name, total_ms, count)] sorted by total time, optionally grouping
    numbered instances of the same op (fusion.1, fusion.2, ...)."""
    raw = op_breakdown(log_dir)
    if group:
        agg: Dict[str, List[float]] = defaultdict(lambda: [0.0, 0])
        for name, (ms, cnt) in raw.items():
            e = agg[_group_key(name)]
            e[0] += ms
            e[1] += cnt
        raw = {k: (v[0], v[1]) for k, v in agg.items()}
    rows = [(k, ms, cnt) for k, (ms, cnt) in raw.items()]
    rows.sort(key=lambda r: -r[1])
    return rows[:n]
