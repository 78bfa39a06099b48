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
