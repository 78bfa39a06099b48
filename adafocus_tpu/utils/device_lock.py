"""Advisory single-chip lock: keep benches and training off the chip at
the same time.

Round 3's driver bench (BENCH_r03) recorded a 10x-low throughput because
it ran concurrently with harness training on the shared TPU chip (see
PERF.md "Measurement-integrity note"). The reference never needs this —
every GPU job owns its devices via the scheduler — but this environment
multiplexes ONE chip between long-running training harnesses and
latency-sensitive benches, so the rule "never bench during training"
needs mechanical enforcement, not a convention.

Usage: long training runs hold the lock (``device_lock()`` context
manager); benches call ``wait_for_device(timeout)`` before timing and
proceed with a warning if the holder outlives the timeout. The lock is a
JSON file carrying the holder's pid + note; a lock whose pid is dead is
stale and broken automatically, so crashes never wedge the chip.
"""

from __future__ import annotations

import contextlib
import json
import os
import time

DEFAULT_LOCK = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".data", "tpu_busy.lock")


def _holder(path: str):
    """(pid, note) of a live holder, else None (absent/corrupt/dead)."""
    try:
        with open(path) as f:
            info = json.load(f)
        pid = int(info.get("pid", -1))
    except (OSError, ValueError):
        return None
    try:
        os.kill(pid, 0)  # liveness probe, no signal delivered
    except OSError:
        return None
    return pid, str(info.get("note", ""))


@contextlib.contextmanager
def device_lock(note: str = "", path: str = DEFAULT_LOCK):
    """Hold the advisory chip lock for the duration of a training run."""
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump({"pid": os.getpid(), "note": note,
                   "started": time.time()}, f)
    try:
        yield
    finally:
        with contextlib.suppress(OSError):
            live = _holder(path)
            if live is None or live[0] == os.getpid():
                os.remove(path)


def wait_for_device(timeout_secs: float | None = None,
                    path: str = DEFAULT_LOCK,
                    poll_secs: float = 15.0) -> bool:
    """Block until no live process holds the chip lock.

    Returns True when the chip is free; False when ``timeout_secs``
    elapsed with the holder still alive (callers should proceed but tag
    their numbers as contended). Timeout defaults to the
    ``ADAFOCUS_BENCH_WAIT_SECS`` env var, then 1800 s.
    """
    if timeout_secs is None:
        timeout_secs = float(os.environ.get("ADAFOCUS_BENCH_WAIT_SECS", 1800))
    deadline = time.time() + timeout_secs
    warned = False
    while True:
        holder = _holder(path)
        if holder is None:
            if warned:
                print("device_lock: chip is free, proceeding", flush=True)
            return True
        if time.time() >= deadline:
            print(f"device_lock: TIMEOUT after {timeout_secs:.0f}s — "
                  f"pid {holder[0]} ({holder[1]!r}) still holds the chip; "
                  "benchmarking anyway, numbers may be contended", flush=True)
            return False
        if not warned:
            print(f"device_lock: chip held by pid {holder[0]} "
                  f"({holder[1]!r}); waiting up to {timeout_secs:.0f}s "
                  "so the measurement is not polluted by concurrent "
                  "training (PERF.md round-4 integrity note)", flush=True)
            warned = True
        time.sleep(poll_secs)
