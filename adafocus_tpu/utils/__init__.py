"""Auxiliary subsystems: profiling/tracing hooks, patch visualization."""

from adafocus_tpu.utils.profiling import StepTimer, trace  # noqa: F401
