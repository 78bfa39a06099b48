"""Per-block micro-benchmark: fused Pallas block kernels vs the XLA
(flax-equivalent) composition, per backbone block shape.

Used to decide, per block, whether the fused kernel or XLA wins — the
routing table in models/fused_inference.py is derived from these numbers.

Usage: python benchmarks/bench_fused_blocks.py [--family mbv2|resnet] [--n 1024]
"""

import argparse
import functools
import os
import sys
import time
import zlib

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import adafocus_tpu  # noqa: E402

adafocus_tpu.enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from adafocus_tpu.models.layers import make_divisible  # noqa: E402
from adafocus_tpu.models.mobilenet import _INVERTED_RESIDUAL_CFG  # noqa: E402
from adafocus_tpu.ops.fused_blocks import (  # noqa: E402
    InvResidualParams,
    BottleneckParams,
    fused_bottleneck,
    fused_inverted_residual,
)


def timeit(fn, x, p, iters=20):
    """In-dispatch timed loop (lax.fori_loop with a loop-carried dependency)
    — eager per-call timing is meaningless through the tunneled backend
    (see adafocus_tpu/benchmark.py)."""

    @jax.jit
    def timed(x):
        def body(i, carry):
            xx, acc = carry
            out = fn(xx, p)
            m = jnp.mean(out).astype(xx.dtype)
            return (xx + m * jnp.asarray(1e-12, xx.dtype),
                    acc + m.astype(jnp.float32))

        _, acc = jax.lax.fori_loop(0, iters, body, (x, jnp.float32(0.0)))
        return acc

    float(timed(x))  # compile + warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(timed(x))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1e3


def xla_inv_residual(x, p, stride, use_res):
    h = x
    if p.w_expand is not None:
        h = jnp.clip(
            jnp.einsum("nhwc,cd->nhwd", h, p.w_expand) + p.b_expand[0], 0, 6
        ).astype(x.dtype)
    kdw = p.w_dw.reshape(3, 3, 1, -1).astype(x.dtype)
    h = jax.lax.conv_general_dilated(
        h, kdw, (stride, stride), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=h.shape[-1],
    )
    h = jnp.clip(h.astype(jnp.float32) + p.b_dw[0], 0, 6).astype(x.dtype)
    out = jnp.einsum("nhwc,cd->nhwd", h, p.w_project) + p.b_project[0]
    if use_res:
        out = out + x.astype(jnp.float32)
    return out.astype(x.dtype)


def xla_bottleneck(x, p, stride):
    h = jnp.maximum(
        jnp.einsum("nhwc,cd->nhwd", x, p.w1) + p.b1[0], 0).astype(x.dtype)
    k2 = p.w2.reshape(3, 3, *p.w2.shape[1:]).astype(x.dtype)
    h = jax.lax.conv_general_dilated(
        h, k2, (stride, stride), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    h = jnp.maximum(h.astype(jnp.float32) + p.b2[0], 0).astype(x.dtype)
    h = jnp.einsum("nhwc,cd->nhwd", h, p.w3) + p.b3[0]
    if p.wd is not None:
        xs = x[:, ::stride, ::stride, :]
        res = jnp.einsum("nhwc,cd->nhwd", xs, p.wd) + p.bd[0]
    else:
        res = x.astype(jnp.float32)
    return jnp.maximum(h + res, 0).astype(x.dtype)


def mbv2_blocks(size):
    """(name, h, cin, chid, cout, stride, use_res, expand) per glancer
    block at glance ``size``."""
    out = []
    h = size // 2  # after stem
    in_c = 32
    for i, (t, c, n, s) in enumerate(_INVERTED_RESIDUAL_CFG):
        out_c = make_divisible(c)
        for j in range(n):
            stride = s if j == 0 else 1
            use_res = stride == 1 and in_c == out_c
            chid = int(round(in_c * t))
            out.append((f"block_{i}_{j}", h, in_c, chid, out_c, stride,
                        use_res, t != 1))
            h = (h - 1) // stride + 1
            in_c = out_c
    return out


def resnet_blocks(size):
    out = []
    h = size // 4  # stem + maxpool
    in_c = 64
    for stage, n_blocks in enumerate((3, 4, 6, 3)):
        feats = 64 * (2 ** stage)
        for j in range(n_blocks):
            stride = 2 if (stage > 0 and j == 0) else 1
            down = j == 0
            out.append((f"layer{stage+1}_{j}", h, in_c, feats, feats * 4,
                        stride, down))
            h = (h - 1) // stride + 1
            in_c = feats * 4
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--family", default="mbv2", choices=["mbv2", "resnet"])
    ap.add_argument("--n", type=int, default=1024)
    ap.add_argument("--size", type=int, default=None)
    args = ap.parse_args()
    key = jax.random.key(0)
    dt = jnp.bfloat16

    if args.family == "mbv2":
        size = args.size or 224
        total_f = total_x = 0.0
        for (name, h, cin, chid, cout, stride, use_res, expand) in \
                mbv2_blocks(size):
            ks = jax.random.split(jax.random.fold_in(key, zlib.crc32(name.encode()) % 2**31), 7)
            x = jax.random.normal(ks[0], (args.n, h, h, cin), dt)
            p = InvResidualParams(
                w_expand=(jax.random.normal(ks[1], (cin, chid), dt) * 0.1
                          if expand else None),
                b_expand=(jnp.zeros((1, chid), jnp.float32) if expand else None),
                w_dw=jax.random.normal(ks[2], (9, chid), jnp.float32) * 0.1,
                b_dw=jnp.zeros((1, chid), jnp.float32),
                w_project=jax.random.normal(ks[3], (chid, cout), dt) * 0.1,
                b_project=jnp.zeros((1, cout), jnp.float32),
            )
            fused = functools.partial(fused_inverted_residual, stride=stride,
                                      use_res=use_res)
            ref = jax.jit(functools.partial(xla_inv_residual, stride=stride,
                                            use_res=use_res))
            tf = timeit(fused, x, p)
            txla = timeit(ref, x, p)
            total_f += tf
            total_x += txla
            print(f"{name:<12} {h:>3}^2 {cin:>4}->{chid:>4}->{cout:>4} "
                  f"s{stride} fused {tf:7.3f} ms  xla {txla:7.3f} ms  "
                  f"{'FUSED' if tf < txla else 'xla'} {txla/tf:5.2f}x")
        print(f"TOTAL fused {total_f:.2f} ms vs xla {total_x:.2f} ms")
    else:
        size = args.size or 96
        total_f = total_x = 0.0
        for (name, h, cin, chid, cout, stride, down) in resnet_blocks(size):
            ks = jax.random.split(jax.random.fold_in(key, zlib.crc32(name.encode()) % 2**31), 9)
            p = BottleneckParams(
                w1=jax.random.normal(ks[1], (cin, chid), dt) * 0.1,
                b1=jnp.zeros((1, chid), jnp.float32),
                w2=jax.random.normal(ks[2], (9, chid, chid), dt) * 0.05,
                b2=jnp.zeros((1, chid), jnp.float32),
                w3=jax.random.normal(ks[3], (chid, cout), dt) * 0.1,
                b3=jnp.zeros((1, cout), jnp.float32),
                wd=(jax.random.normal(ks[4], (cin, cout), dt) * 0.1
                    if down else None),
                bd=(jnp.zeros((1, cout), jnp.float32) if down else None),
            )
            x = jax.random.normal(ks[0], (args.n, h, h, cin), dt)
            fused = functools.partial(fused_bottleneck, stride=stride)
            ref = jax.jit(functools.partial(xla_bottleneck, stride=stride))
            tf = timeit(fused, x, p)
            txla = timeit(ref, x, p)
            total_f += tf
            total_x += txla
            print(f"{name:<12} {h:>3}^2 {cin:>4}->{chid:>4}->{cout:>4} "
                  f"s{stride} fused {tf:7.3f} ms  xla {txla:7.3f} ms  "
                  f"{'FUSED' if tf < txla else 'xla'} {txla/tf:5.2f}x")
        print(f"TOTAL fused {total_f:.2f} ms vs xla {total_x:.2f} ms")


if __name__ == "__main__":
    main()
