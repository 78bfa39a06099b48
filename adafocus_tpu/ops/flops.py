"""Analytic FLOPs accounting — GFLOPs/video is the reference's headline
efficiency metric (BASELINE.md; the reference's only FLOPs tooling is the
vestigial thop table, sthsth/ops/net_flops_table.py:34-62).

Two counters:
  * ``xla_flops``: exact cost of a compiled jit program via XLA's cost
    analysis — counts what actually runs after fusion, the number the
    benchmark reports;
  * ``gflops_per_video``: convenience wrapper dividing by batch size.
"""

from __future__ import annotations

from typing import Callable

import jax


def xla_flops(fn: Callable, *args, static_argnums=()) -> float:
    """Total FLOPs of one invocation of ``fn(*args)`` as compiled by XLA."""
    compiled = jax.jit(fn, static_argnums=static_argnums).lower(*args).compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, (list, tuple)):  # older jax returns [dict]
        cost = cost[0] if cost else {}
    return float(cost.get("flops", 0.0))


def gflops_per_video(fn: Callable, batch_size: int, *args) -> float:
    """GFLOPs per video for a batched program (B videos per call)."""
    return xla_flops(fn, *args) / batch_size / 1e9
