"""Host-fingerprinted XLA:CPU compile-cache location.

XLA:CPU persistent-cache entries are AOT machine code. The cache key XLA
uses does NOT include the host CPU's feature set, and the loader accepts a
foreign entry with only a warning ("could lead to execution errors such as
SIGILL", cpu_aot_loader.cc) — observed live on this project: a cache volume
that survives container reschedules carried entries compiled on an
AMX/AVX-512 machine with different tuning pseudo-features
(+prefer-no-scatter/+prefer-no-gather) onto a host without them.

Keying the cache directory by a fingerprint of the host CPU's feature
flags (plus the jax version, which changes codegen) makes foreign entries
invisible instead of loadable: each machine class warms its own cache, and
a container rescheduled onto different silicon starts cold rather than
executing another machine's AOT code.
"""

from __future__ import annotations

import hashlib
import os


def host_fingerprint() -> str:
    """Short stable hash of the CPU feature flags + jax version."""
    import jax

    flags = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    # identical across cores; sorted for stability
                    flags = " ".join(sorted(line.split(":", 1)[1].split()))
                    break
    except OSError:
        pass
    raw = f"{flags}|jax={jax.__version__}"
    return hashlib.sha256(raw.encode()).hexdigest()[:12]


def cpu_test_cache_dir() -> str:
    d = os.path.expanduser(
        f"~/.cache/adafocus_tpu/xla_cpu_tests/{host_fingerprint()}")
    os.makedirs(d, exist_ok=True)
    return d
