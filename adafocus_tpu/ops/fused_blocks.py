"""Fused conv-block Pallas kernels (whole residual block per grid step).

The round-1 roofline analysis (PERF.md) showed the backbones' early stages
are HBM-bandwidth-bound: XLA fuses elementwise chains into convs but never
fuses convolutions into each other, so every MobileNetV2 inverted residual
writes + re-reads its 6x-expanded hidden activation twice, and every ResNet
bottleneck round-trips two hidden tensors. These kernels execute an entire
residual block per grid step with every hidden activation resident in VMEM:

  inverted residual:  [1x1 expand + BN + relu6] -> [3x3 depthwise (stride
                      1/2) + BN + relu6] -> [1x1 project + BN] -> +residual
  bottleneck:         [1x1 + BN + relu] -> [3x3 (stride 1/2) + BN + relu]
                      -> [1x1 + BN] (+ 1x1 downsample) -> +residual -> relu

HBM traffic per block drops from (C_in + 2*C_hid)*HW + (2*C_hid + C_out)*
H'W' elements to C_in*HW + C_out*H'W' — a 3-6x reduction for MobileNetV2's
expand-6 blocks. BatchNorm is folded into per-channel scale/bias
(inference only — training keeps the flax path, whose batch-stat BN cannot
be folded). The 3x3 convs are computed as 9 shifted taps: per-channel
multiply-adds for depthwise, (C_hid, C_hid) matmuls for the full conv.
Spatial halos never leave VMEM: each grid step owns S whole samples and
zero-pads in-kernel.

**Measured outcome (benchmarks/bench_fused_blocks.py, v5e, B*T=1024,
glance 224): XLA wins.** The VPU cost of the 9 materialized shifted tap
copies (plus the 128-lane padding waste at C_in 16-32) exceeds the HBM
traffic saved — fused blocks run 2-5x slower than XLA's convolutions,
which already sit near the bandwidth roofline for these shapes. A winning
version would need Mosaic-level sliding-window scheduling that Pallas does
not expose. The kernels stay as a verified capability (exactness-tested
against the flax path in tests/test_fused_blocks.py, TSM variants
included) routed OFF by default in models/fused_inference.py; the
micro-benchmark documents the evidence.

Reference counterparts: the torchvision-copy modules these fuse are
actnet/models/mobilenet.py:42-70 (InvertedResidual/ConvBNReLU) and
actnet/models/resnet.py:74-115 (Bottleneck) in /root/reference — the
reference runs them as ~35 separate cuDNN kernels per backbone.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# VMEM budget per grid step (bytes); the block-shape chooser keeps
# (input + output + hidden scratch) under this. v5e/v4 have ~16 MB/core.
_VMEM_BUDGET = 12 * 1024 * 1024

# Scoped-VMEM ceiling requested from the Mosaic compiler. The default 16 MB
# is conservative; v5e cores have headroom above it and the 112^2 MobileNetV2
# blocks need ~18 MB at group size 1.
_VMEM_LIMIT = 64 * 1024 * 1024

# Tests flip this to run the kernels in interpreter mode on the CPU mesh
# (pl.pallas_call(interpret=...) default for calls that don't pass it).
INTERPRET_DEFAULT = False


def _interp(interpret):
    return INTERPRET_DEFAULT if interpret is None else interpret


def fold_bn(
    kernel: jax.Array, bn: dict, dtype=jnp.float32
) -> Tuple[jax.Array, jax.Array]:
    """Fold inference BatchNorm into the preceding conv.

    kernel: (..., C_out) conv kernel. bn: {scale, bias, mean, var} flax
    BatchNorm variables (eps 1e-5, torch parity — models/layers.py).
    Returns (scaled kernel cast to ``dtype`` — the kernel feeds the MXU in
    the compute dtype — and a per-channel f32 bias added post-accumulation).
    """
    k = kernel.astype(jnp.float32)
    gamma = bn["scale"].astype(jnp.float32)
    beta = bn["bias"].astype(jnp.float32)
    mean = bn["mean"].astype(jnp.float32)
    var = bn["var"].astype(jnp.float32)
    mult = gamma * jax.lax.rsqrt(var + 1e-5)
    return (k * mult).astype(dtype), beta - mean * mult


def _relu6(x):
    return jnp.clip(x, 0.0, 6.0)


def _out_size(h: int, stride: int) -> int:
    """Conv output size for kernel 3, padding 1 (torch/flax parity):
    floor((h - 1) / stride) + 1 — handles odd sizes under stride 2
    (e.g. the 9^2 maps of the sth-sth 144^2 patch recipe)."""
    return (h - 1) // stride + 1


def _rows_strided(x, start: int, n_out: int):
    """Rows start, start+2, ..., start+2*(n_out-1) of dim 1 — via a
    major-dim reshape + static index (Mosaic supports splitting major dims;
    strided slices would lower to an unsupported >2D gather)."""
    s = x.shape[0]
    v = x[:, start : start + 2 * n_out]
    v = v.reshape((s, n_out, 2) + x.shape[2:])
    return v[:, :, 0]


def _taps(padded, h_out: int, w_full: int, dy: int, dx: int, stride: int):
    """Static 3x3 tap window of a padded (S, *, *, C) value (see
    ``_pad_hw``). For stride 2 the row subsampling happens here (major-dim
    reshape) but columns stay FULL WIDTH (``w_full`` = the block's input
    width) — the wrapper subsamples columns outside the kernel, because W
    is the tiled sublane dim where Mosaic has no strided access."""
    if stride == 1:
        return padded[:, dy : dy + h_out, dx : dx + w_full, :]
    return _rows_strided(padded, dy, h_out)[:, :, dx : dx + w_full, :]


def _mm(x, wt, bias=None):
    """Pointwise (1x1-conv) matmul on a (S, H, W, C) value -> (S, H, W, D)
    f32. Collapses (S, H, W) onto sublanes for the MXU; bf16 packs sublanes
    in pairs, so an odd W is zero-padded to even first (Mosaic rejects the
    collapse otherwise — e.g. the 7^2/9^2/3^2 tails of the backbones)."""
    s, h, w, c = x.shape
    pad = w % 2
    if pad:
        x = jnp.concatenate([x, jnp.zeros((s, h, 1, c), x.dtype)], axis=2)
    out = jnp.dot(x.reshape(s * h * (w + pad), c), wt,
                  preferred_element_type=jnp.float32)
    if bias is not None:
        out = out + bias
    out = out.reshape(s, h, w + pad, wt.shape[-1])
    return out[:, :, :w, :] if pad else out


def _pad_hw(x, stride: int = 1):
    """Zero-pad H and W (dims 1, 2) of a (S, H, W, C) value by 1 each side
    (+1 extra bottom/right for odd sizes under stride 2, so every strided
    tap slice stays in bounds)."""
    s, h, w, c = x.shape
    pb = 1 + (h % 2 if stride == 2 else 0)
    pr = 1 + (w % 2 if stride == 2 else 0)
    x = jnp.concatenate(
        [jnp.zeros((s, 1, w, c), x.dtype), x, jnp.zeros((s, pb, w, c), x.dtype)],
        axis=1)
    hp = h + 1 + pb
    x = jnp.concatenate(
        [jnp.zeros((s, hp, 1, c), x.dtype), x,
         jnp.zeros((s, hp, pr, c), x.dtype)],
        axis=2)
    return x


# ---------------------------------------------------------------------------
# Fused MobileNetV2 inverted residual.
# ---------------------------------------------------------------------------


def _inv_residual_kernel(
    x_ref, w_exp_ref, b_exp_ref, w_dw_ref, b_dw_ref, w_prj_ref, b_prj_ref,
    out_ref, *, stride: int, expand: bool, use_res: bool, acc_dtype,
):
    s, h, w, cin = x_ref.shape
    h_out = _out_size(h, stride)
    w_mid = w  # columns stay full width in-kernel (see _taps)
    x = x_ref[...]

    if expand:
        chid = w_exp_ref.shape[-1]
        hidden = _relu6(_mm(x, w_exp_ref[...], b_exp_ref[...]))
        hidden = hidden.astype(acc_dtype)
    else:
        chid = cin
        hidden = x.astype(acc_dtype)

    padded = _pad_hw(hidden, stride)
    # depthwise taps accumulate in f32 on the VPU (bf16 accumulation was
    # measured SLOWER — per-op converts — and less precise)
    acc = jnp.zeros((s, h_out, w_mid, chid), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            tap = _taps(padded, h_out, w_mid, dy, dx, stride)
            wvec = w_dw_ref[dy * 3 + dx, :].reshape(1, 1, 1, chid)
            acc += tap.astype(jnp.float32) * wvec
    acc = _relu6(acc + b_dw_ref[...].reshape(1, 1, 1, chid))

    out = _mm(acc.astype(acc_dtype), w_prj_ref[...], b_prj_ref[...])
    if use_res:
        out = out + x.astype(jnp.float32)
    out_ref[...] = out.astype(out_ref.dtype)


class InvResidualParams(NamedTuple):
    """Folded inference parameters of one inverted residual block."""

    w_expand: Optional[jax.Array]  # (Cin, Chid) or None when expand_ratio==1
    b_expand: Optional[jax.Array]  # (1, Chid)
    w_dw: jax.Array                # (9, Chid) — 3x3 taps row-major
    b_dw: jax.Array                # (1, Chid)
    w_project: jax.Array           # (Chid, Cout)
    b_project: jax.Array           # (1, Cout)


def fold_inv_residual(params: dict, dtype=jnp.float32) -> InvResidualParams:
    """Fold a flax InvertedResidual's variables (models/mobilenet.py:34-61)
    into kernel-ready arrays. ``params`` holds {expand?, dw, project} each
    with {conv: {kernel}, bn: {...}} merged from params+batch_stats."""
    if "expand" in params:
        wk, bk = fold_bn(params["expand"]["conv"]["kernel"][0, 0],
                         params["expand"]["bn"], dtype)
        w_exp, b_exp = wk, bk.reshape(1, -1)
    else:
        w_exp = b_exp = None
    # depthwise kernel (3, 3, 1, Chid) -> (9, Chid); taps run on the VPU in
    # f32 regardless of the compute dtype
    kdw, bdw = fold_bn(params["dw"]["conv"]["kernel"], params["dw"]["bn"])
    w_dw = kdw.reshape(9, -1)
    wp, bp = fold_bn(params["project"]["conv"]["kernel"][0, 0],
                     params["project"]["bn"], dtype)
    return InvResidualParams(w_exp, b_exp, w_dw, bdw.reshape(1, -1),
                             wp, bp.reshape(1, -1))


def _pick_group(h: int, w: int, cin: int, chid: int, cout: int,
                stride: int, n: int, itemsize: int) -> int:
    """Samples per grid step: amortize grid overhead for small maps while
    keeping input + hidden + output under the VMEM budget."""
    def pad128(c):
        return -(-c // 128) * 128

    h_out = _out_size(h, stride)
    per_sample = (
        2 * h * w * pad128(cin) * itemsize              # double-buffered in
        + (h + 2) * (w + 2) * pad128(chid) * itemsize   # padded hidden
        + h_out * w * pad128(chid) * 4                  # f32 dw acc (full W)
        + 2 * h_out * w * pad128(cout) * itemsize       # double-buffered out
    )
    s = max(1, min(n, _VMEM_BUDGET // max(per_sample, 1)))
    while n % s:
        s -= 1
    return s


@functools.partial(
    jax.jit, static_argnames=("stride", "use_res", "interpret"))
def fused_inverted_residual(
    x: jax.Array,
    p: InvResidualParams,
    stride: int = 1,
    use_res: bool = False,
    interpret=None,
) -> jax.Array:
    """One fused MobileNetV2 inverted residual (inference).

    x: (N, H, W, Cin). Returns (N, H/stride, W/stride, Cout).
    Matches ConvBNAct(expand 1x1) -> ConvBNAct(3x3 dw, stride) ->
    ConvBNAct(project 1x1, no act) [+ x] with BN folded
    (models/mobilenet.py:44-61).
    """
    n, h, w, cin = x.shape
    expand = p.w_expand is not None
    chid = p.w_dw.shape[-1]
    cout = p.w_project.shape[-1]
    if use_res and (stride != 1 or cin != cout):
        raise ValueError("residual requires stride 1 and Cin == Cout")

    s = _pick_group(h, w, cin, chid, cout, stride, n, x.dtype.itemsize)
    h_out = _out_size(h, stride)
    w_mid = w  # stride-2 kernels emit full-width columns (see _taps)
    acc_dtype = x.dtype if x.dtype == jnp.bfloat16 else jnp.float32

    kernel = functools.partial(
        _inv_residual_kernel, stride=stride, expand=expand,
        use_res=use_res, acc_dtype=acc_dtype,
    )
    full = lambda shape: pl.BlockSpec(
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)
    weight_arrs = []
    weight_specs = []
    if expand:
        weight_arrs += [p.w_expand, p.b_expand]
    else:  # placeholders keep the kernel arity static
        weight_arrs += [jnp.zeros((1, 1), jnp.float32),
                        jnp.zeros((1, 1), jnp.float32)]
    weight_arrs += [p.w_dw, p.b_dw, p.w_project, p.b_project]
    weight_specs = [full(a.shape) for a in weight_arrs]

    out = pl.pallas_call(
        kernel,
        grid=(n // s,),
        in_specs=[
            pl.BlockSpec((s, h, w, cin), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            *weight_specs,
        ],
        out_specs=pl.BlockSpec((s, h_out, w_mid, cout),
                               lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h_out, w_mid, cout), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=_interp(interpret),
    )(x, *weight_arrs)
    if stride == 2:
        out = out[:, :, ::2, :]  # column subsample outside the kernel
    return out


# ---------------------------------------------------------------------------
# Fused ResNet bottleneck.
# ---------------------------------------------------------------------------


def _bottleneck_kernel(
    x_ref, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref, wd_ref, bd_ref,
    out_ref, *, stride: int, downsample: bool, use_res: bool, acc_dtype,
):
    s, h, w, cin = x_ref.shape
    h_out = _out_size(h, stride)
    w_mid = w  # columns stay full width in-kernel for stride 2 (see _taps)
    chid = w1_ref.shape[-1]
    cout = w3_ref.shape[-1]
    x = x_ref[...]

    h1 = jnp.maximum(_mm(x, w1_ref[...], b1_ref[...]), 0.0).astype(acc_dtype)

    padded = _pad_hw(h1, stride)
    acc = jnp.zeros((s, h_out, w_mid, chid), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            tap = _taps(padded, h_out, w_mid, dy, dx, stride)
            acc += _mm(tap.astype(acc_dtype), w2_ref[dy * 3 + dx, :, :])
    h2 = jnp.maximum(acc + b2_ref[...], 0.0).astype(acc_dtype)

    h3 = _mm(h2, w3_ref[...], b3_ref[...])

    if downsample:
        if stride == 2:
            # rows subsampled (major-dim reshape), columns full width —
            # matching h3's grid; the wrapper subsamples columns outside
            pad_rows = 2 * h_out - h
            xs = x
            if pad_rows:
                xs = jnp.concatenate(
                    [xs, jnp.zeros((s, pad_rows, w, cin), x.dtype)], axis=1)
            xs = _rows_strided(xs, 0, h_out)
        else:
            xs = x
        res = _mm(xs.astype(acc_dtype), wd_ref[...], bd_ref[...])
        out = jnp.maximum(h3 + res, 0.0)
    elif use_res:
        out = jnp.maximum(h3 + x.astype(jnp.float32), 0.0)
    else:
        # TSM variant: the branch input was temporally shifted, so the
        # residual add (+ final relu) happens outside on the unshifted x
        # (models/resnet.py:62-74)
        out = h3
    out_ref[...] = out.astype(out_ref.dtype)


class BottleneckParams(NamedTuple):
    """Folded inference parameters of one ResNet bottleneck block."""

    w1: jax.Array  # (Cin, Chid)
    b1: jax.Array  # (1, Chid)
    w2: jax.Array  # (9, Chid, Chid) — 3x3 taps
    b2: jax.Array  # (1, Chid)
    w3: jax.Array  # (Chid, Cout)
    b3: jax.Array  # (1, Cout)
    wd: Optional[jax.Array]  # (Cin, Cout) downsample or None
    bd: Optional[jax.Array]  # (1, Cout)


def fold_bottleneck(params: dict, dtype=jnp.float32) -> BottleneckParams:
    """Fold a flax Bottleneck's variables (models/resnet.py:49-74)."""
    w1, b1 = fold_bn(params["conv1"]["conv"]["kernel"][0, 0],
                     params["conv1"]["bn"], dtype)
    k2, b2 = fold_bn(params["conv2"]["conv"]["kernel"], params["conv2"]["bn"],
                     dtype)
    chid = k2.shape[-1]
    w2 = k2.reshape(9, chid, chid)
    w3, b3 = fold_bn(params["conv3"]["conv"]["kernel"][0, 0],
                     params["conv3"]["bn"], dtype)
    if "down" in params:
        wd, bd = fold_bn(params["down"]["conv"]["kernel"][0, 0],
                         params["down"]["bn"], dtype)
        wd, bd = wd, bd.reshape(1, -1)
    else:
        wd = bd = None
    return BottleneckParams(w1, b1.reshape(1, -1), w2, b2.reshape(1, -1),
                            w3, b3.reshape(1, -1), wd, bd)


@functools.partial(
    jax.jit, static_argnames=("stride", "use_res", "interpret"))
def fused_bottleneck(
    x: jax.Array,
    p: BottleneckParams,
    stride: int = 1,
    use_res: bool = True,
    interpret=None,
) -> jax.Array:
    """One fused ResNet bottleneck (inference).

    x: (N, H, W, Cin) -> (N, H/stride, W/stride, Cout). Matches
    Bottleneck.__call__ (models/resnet.py:60-74) with BN folded.
    ``use_res=False`` (TSM variant) returns the pre-residual branch
    (conv3 output + bias, no relu); the caller adds the unshifted
    residual and applies the final relu.
    """
    n, h, w, cin = x.shape
    chid = p.w1.shape[-1]
    cout = p.w3.shape[-1]
    downsample = p.wd is not None and use_res
    if use_res and not downsample and (stride != 1 or cin != cout):
        raise ValueError("identity residual requires stride 1, Cin == Cout")

    s = _pick_group(h, w, cin, chid, cout, stride, n, x.dtype.itemsize)
    h_out = _out_size(h, stride)
    w_mid = w  # stride-2 kernels emit full-width columns (see _taps)
    acc_dtype = x.dtype if x.dtype == jnp.bfloat16 else jnp.float32

    kernel = functools.partial(
        _bottleneck_kernel, stride=stride, downsample=downsample,
        use_res=use_res, acc_dtype=acc_dtype,
    )
    weight_arrs = [p.w1, p.b1, p.w2, p.b2, p.w3, p.b3]
    if downsample:
        weight_arrs += [p.wd, p.bd]
    else:
        weight_arrs += [jnp.zeros((1, 1), jnp.float32),
                        jnp.zeros((1, 1), jnp.float32)]
    full = lambda shape: pl.BlockSpec(
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        kernel,
        grid=(n // s,),
        in_specs=[
            pl.BlockSpec((s, h, w, cin), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            *[full(a.shape) for a in weight_arrs],
        ],
        out_specs=pl.BlockSpec((s, h_out, w_mid, cout),
                               lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h_out, w_mid, cout), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=_interp(interpret),
    )(x, *weight_arrs)
    if stride == 2:
        out = out[:, :, ::2, :]  # column subsample outside the kernel
    return out
