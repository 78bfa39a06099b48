"""Test configuration: force an 8-device virtual CPU mesh.

The reference can only exercise its distributed paths on real GPUs (SURVEY.md
section 4, item 5); we instead make multi-chip logic testable anywhere via
XLA's host-platform device virtualization.

Note: this environment's sitecustomize registers a remote TPU backend and
pins ``jax_platforms`` at interpreter start, so an env var alone is not
enough — we must override the jax config after import. Unit tests need
exact-f32 math (parity checks vs torch) and fast local compiles, i.e. CPU.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent XLA:CPU compile cache for the test suite. The product-side
# ``enable_compilation_cache`` deliberately refuses CPU-primary processes
# (adafocus_tpu/__init__.py): XLA:CPU cache entries are AOT machine code
# whose feature list includes tuning pseudo-features that warn on every
# reload, and a FOREIGN-machine entry can genuinely SIGILL. Here the cache
# directory is keyed by a fingerprint of the host CPU's feature flags
# (utils/hostcache.py) — observed necessary: this ~/.cache volume survives
# container reschedules and carried AOT entries compiled on an AMX/AVX-512
# machine with different tuning pseudo-features, which XLA's loader happily
# loads with only a warning. With per-host keying, load failures fall back
# to a fresh compile (jax_raise_persistent_cache_errors stays False) and
# every test asserts numerics, so a bad executable cannot pass silently.
# The win is the test suite's dominant cost — full-depth backbone compiles
# on the 1-core container — dropping to disk reads on warm runs. Opt out
# with ADAFOCUS_TEST_COMPILE_CACHE=0.
if os.environ.get("ADAFOCUS_TEST_COMPILE_CACHE", "1") != "0":
    from adafocus_tpu.utils.hostcache import cpu_test_cache_dir

    jax.config.update("jax_compilation_cache_dir", cpu_test_cache_dir())
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
