"""int8 PTQ deployment forward of the backbones.

Mirrors the flax backbones (models/mobilenet.py, models/resnet.py) from the
same variables pytree with every conv-bn unit executed as an int8 MXU conv
(ops/quant.py): BN folded, weights per-channel int8, activations per-tensor
int8 with calibrated scales. The requantize epilogue fuses into each conv's
output, so inter-conv activations move through HBM at half the bf16 width —
a direct lever on the bandwidth-bound early stages (PERF.md) on top of the
~1.45x int8 MXU conv throughput measured on v5e.

Calibration and execution share one traversal (``_run_backbone``): with
``scales=None`` it runs the bf16 reference math and records each unit
input's abs-max; with a scales dict it runs quantized. ``calibrate_*``
reduce abs-maxes over batches on the host.

Stems stay bf16 (3-channel inputs, XLA space-to-depth), as do pooling,
residual carries, the policy, and the classifier.

The reference has no quantized path (fp32/AMP only); this is TPU-added
serving capability. Quality is pinned by tests/test_quant.py: unit-level
quant math, backbone q8-vs-f32 feature agreement, and the full deployment
forward through ``inference`` dispatch.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from adafocus_tpu.models.fused_inference import _merge_bn, _subtree
from adafocus_tpu.models.layers import make_divisible
from adafocus_tpu.models.mobilenet import _INVERTED_RESIDUAL_CFG
from adafocus_tpu.models.tsm import temporal_shift
from adafocus_tpu.ops.fused_blocks import _relu6, fold_bn
from adafocus_tpu.ops.quant import (
    QConv,
    act_scale_from_absmax,
    int8_conv,
    quantize_act,
    quantize_weight,
)


class _UnitRunner:
    """Executes conv-bn units either in bf16 (recording input abs-maxes,
    calibration mode) or quantized int8 (execution mode).

    ``qw`` (optional, mutable dict) caches prepared weights — BN-folded,
    per-channel-quantized ``(kernel_q, w_scale, bias)`` per unit. A miss
    computes and records (weight prep is data-independent); a hit skips the
    fold+quantize entirely. ``prepare_q8`` fills the cache once so serving
    (notably batch-1, where per-call weight quantization measured 0.84x
    bf16 — PERF.md) never re-quantizes weights.

    The cache is keyed by unit name only and is valid for exactly ONE
    variables pytree: fill it eagerly (``prepare_q8``, outside jit) and
    discard it when the weights change (new checkpoint, EMA swap). Under a
    jit trace a miss computes but does NOT record (tracers must not leak
    into the cross-call dict)."""

    def __init__(self, scales: Optional[Dict[str, jax.Array]], dtype,
                 qw: Optional[dict] = None):
        self.scales = scales
        self.dtype = dtype
        self.qw = qw
        self.absmax: Dict[str, jax.Array] = {}

    def __call__(self, name, x, unit, strides=1, groups=1, act=None):
        # units without a calibrated scale (the stems) run bf16
        if self.scales is None or name not in self.scales:
            if self.scales is None:
                self.absmax[name] = jnp.max(jnp.abs(x.astype(jnp.float32)))
            kernel, bias = fold_bn(unit["conv"]["kernel"], unit["bn"],
                                   self.dtype)
            kh = kernel.shape[0]
            pad = (kh - 1) // 2
            y = jax.lax.conv_general_dilated(
                x.astype(self.dtype), kernel, (strides, strides),
                [(pad, pad), (pad, pad)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=groups,
            ).astype(jnp.float32) + bias
        else:
            if self.qw is not None and name in self.qw:
                kq, ws, bias = self.qw[name]
            else:
                kernel, bias = fold_bn(unit["conv"]["kernel"], unit["bn"])
                kq, ws = quantize_weight(kernel)
                if self.qw is not None and not isinstance(
                        kq, jax.core.Tracer):
                    self.qw[name] = (kq, ws, bias)
            s_x = self.scales[name]
            q = quantize_act(x, s_x)
            y = int8_conv(q, QConv(kq, ws, bias, s_x), strides, groups)
        if act is not None:
            y = act(y)
        return y.astype(self.dtype)


def _mbv2_backbone(params, x, runner, n_frames=0, shift_div=8,
                   width_mult=1.0):
    h = runner("stem", x, params["stem"], strides=2, act=_relu6)
    in_c = make_divisible(32 * width_mult)
    for i, (t, c, n, s) in enumerate(_INVERTED_RESIDUAL_CFG):
        out_c = make_divisible(c * width_mult)
        for j in range(n):
            stride = s if j == 0 else 1
            use_res = stride == 1 and in_c == out_c
            name = f"block_{i}_{j}"
            block = params[name]
            b = h
            if use_res and n_frames > 0:
                b = temporal_shift(b, n_frames, shift_div)
            if "expand" in block:
                b = runner(f"{name}/expand", b, block["expand"], act=_relu6)
            b = runner(f"{name}/dw", b, block["dw"], strides=stride,
                       groups=b.shape[-1], act=_relu6)
            b = runner(f"{name}/project", b, block["project"])
            h = h + b if use_res else b
            in_c = out_c
    fmap = runner("head_conv", h, params["head_conv"], act=_relu6)
    return fmap, jnp.mean(fmap, axis=(1, 2))


def _resnet_backbone(params, x, runner, stage_sizes=(3, 4, 6, 3),
                     n_frames=0, shift_div=8):
    h = runner("stem", x, params["stem"], strides=2, act=jax.nn.relu)
    h = jax.lax.reduce_window(
        h, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)],
    ).astype(runner.dtype)
    for stage, n_blocks in enumerate(stage_sizes):
        for j in range(n_blocks):
            stride = 2 if (stage > 0 and j == 0) else 1
            name = f"layer{stage + 1}_{j}"
            block = params[name]
            b = h
            if n_frames > 0:
                b = temporal_shift(b, n_frames, shift_div)
            b = runner(f"{name}/conv1", b, block["conv1"], act=jax.nn.relu)
            b = runner(f"{name}/conv2", b, block["conv2"], strides=stride,
                       act=jax.nn.relu)
            b = runner(f"{name}/conv3", b, block["conv3"])
            if "down" in block:
                res = runner(f"{name}/down", h, block["down"],
                             strides=stride)
            else:
                res = h
            h = jax.nn.relu(b.astype(jnp.float32)
                            + res.astype(jnp.float32)).astype(runner.dtype)
    return h, jnp.mean(h, axis=(1, 2))


def _run_backbone(kind, variables, x, scales, n_frames=0, dtype=None,
                  qw=None):
    params = _merge_bn(variables["params"], variables.get("batch_stats", {}))
    runner = _UnitRunner(scales, dtype or x.dtype, qw)
    fn = _mbv2_backbone if kind == "mbv2" else _resnet_backbone
    fmap, pooled = fn(params, x, runner, n_frames=n_frames)
    if scales is None:
        return fmap, pooled, runner.absmax
    return fmap, pooled


def mobilenet_features_q8(variables, x, scales, n_frames=0):
    """MobileNetV2.features, int8 units (stem bf16). scales: per-unit
    activation scales from ``calibrate_backbone``."""
    return _run_backbone("mbv2", variables, x, scales, n_frames)


def resnet_features_q8(variables, x, scales, n_frames=0):
    """ResNet50.features, int8 units (stem bf16)."""
    return _run_backbone("resnet", variables, x, scales, n_frames)


def calibrate_backbone(kind, variables, batches, n_frames=0,
                       dtype=jnp.bfloat16):
    """Run the bf16 forward over calibration batches; return per-unit
    activation scales {unit_name: f32 scale} (abs-max calibration).

    kind: 'mbv2' | 'resnet'. batches: iterable of (N, H, W, 3) arrays.
    """
    collect = jax.jit(
        lambda v, xb: _run_backbone(kind, v, xb, None, n_frames, dtype)[2]
    )
    running: Dict[str, jax.Array] = {}
    for xb in batches:
        absmax = jax.device_get(collect(variables, xb.astype(dtype)))
        for k, v in absmax.items():
            running[k] = max(running.get(k, 0.0), float(v))
    # the stem runs bf16; its entry is collected but unused
    return {k: jnp.float32(act_scale_from_absmax(jnp.float32(v)))
            for k, v in running.items() if k != "stem"}


# ---------------------------------------------------------------------------
# Full GFV deployment forward (both backbones int8).
# ---------------------------------------------------------------------------


def calibrate_gfv(model, variables, batches,
                  heads: bool = False) -> Dict[str, Dict[str, jax.Array]]:
    """Calibrate the backbones (and optionally the heads) from
    deployment-shaped batches.

    batches: iterable of dicts with 'frames_small' (B, T, g, g, 3) and
    'patches' (N, P, P, 3) — run a few eval batches through
    ``glance_policy_actions`` + ``extract_for_frames`` to produce patches
    (see tests/test_quant.py for the recipe). Returns
    {'glancer': scales, 'focuser': scales} plus, with ``heads=True``, a
    'heads' entry that makes the ``inference_q8*`` entry points quantize
    the policy/classifier heads too.

    ``heads`` defaults to OFF because it is the measured accuracy/perf
    trade: int8 backbones alone are accuracy-neutral (mini-ActivityNet
    mAP 0.956 vs bf16 0.954) and carry essentially all of the int8
    throughput win, while quantized heads were measured throughput-NEUTRAL
    end-to-end (XLA hides the head phases behind the backbone convs) yet
    cost −4.5 top-1 / −2.0 mAP even with per-input-channel activation
    scales (the GRU's fused 3328-dim input has abs-max ~572 outlier
    channels; benchmarks/diag_int8*.json, PERF.md round 4).
    """
    cfg = model.cfg
    g_batches, f_batches = [], []
    for b in batches:
        fs = b["frames_small"]
        g_batches.append(fs.reshape((-1,) + fs.shape[2:]))
        f_batches.append(b["patches"])
    scales = {
        "glancer": calibrate_backbone(
            "mbv2", _subtree(variables, "glancer"), g_batches,
            n_frames=cfg.num_frames if cfg.tsm else 0, dtype=cfg.dtype),
        "focuser": calibrate_backbone(
            "resnet", _subtree(variables, "focuser"), f_batches,
            n_frames=cfg.t_focuser if cfg.tsm else 0, dtype=cfg.dtype),
    }
    if heads:
        scales["heads"] = calibrate_heads(model, variables, batches)
    return scales


def q8_glance(model, variables, scales, frames_small, qw=None):
    cfg = model.cfg
    b, t = frames_small.shape[:2]
    flat = frames_small.reshape((b * t,) + frames_small.shape[2:])
    fmap, pooled = _run_backbone(
        "mbv2", _subtree(variables, "glancer"), flat.astype(cfg.dtype),
        scales["glancer"], n_frames=cfg.num_frames if cfg.tsm else 0,
        qw=None if qw is None else qw["glancer"])
    return fmap.reshape((b, t) + fmap.shape[1:]), pooled.reshape(b, t, -1)


def q8_focus(model, variables, scales, patches, qw=None):
    cfg = model.cfg
    _, pooled = _run_backbone(
        "resnet", _subtree(variables, "focuser"), patches.astype(cfg.dtype),
        scales["focuser"], n_frames=cfg.t_focuser if cfg.tsm else 0,
        qw=None if qw is None else qw["focuser"])
    return pooled


# ---------------------------------------------------------------------------
# int8 phase 2: quantized policy / classifier heads + int8 frame transport.
#
# The backbone convs above left the GRUs (classifier + policy), the state
# encoder, the FC heads, and the patch DMA in bf16 — diluting the measured
# 1.45x conv-level int8 uplift to 1.17-1.20x end to end (PERF.md). This
# section closes that: every head matmul runs int8 on the MXU with f32
# requantize epilogues, and frames/patches can move through HBM as int8
# (half the extraction DMA traffic), dequantized inside the backbone stems.
# The reference has no analog (fp32/AMP only).
# ---------------------------------------------------------------------------


class _HeadRunner:
    """Dense/GRU analog of ``_UnitRunner``: with ``scales=None`` runs the
    f32 reference math recording each quantization point's input abs-max;
    with a scales dict runs int8 MXU matmuls (per-output-channel int8
    weights, per-INPUT-channel calibrated activations, f32 epilogues).

    Per-channel activation scales matter here in a way they don't for the
    backbone convs: head inputs are concatenated GAP features / glance
    maps with wildly heterogeneous channel ranges (measured on
    mini-ActivityNet: the classifier-GRU's fused 3328-dim input has
    abs-max 572 driven by a few outlier channels while typical channels
    sit near 1 — a per-tensor scale of 4.5 rounds almost every input to
    ZERO and collapses eval mAP 0.95 -> 0.18). For a matmul the fix is
    exact and free: y_j = sum_k (x_k/s_k) * (s_k * W_kj), i.e. quantize x
    per channel and fold the scale vector into the f32 kernel BEFORE its
    per-output-channel weight quantization — the int8 MXU matmul and its
    f32 epilogue are unchanged."""

    def __init__(self, scales: Optional[Dict[str, jax.Array]],
                 qw: Optional[dict] = None):
        self.scales = scales
        self.qw = qw
        self.absmax: Dict[str, jax.Array] = {}

    def _qweight(self, name: str, kernel: jax.Array, s: jax.Array):
        """Prepared-weight cache (see _UnitRunner.qw): the activation
        scale (scalar or per-input-channel vector) folds into the f32
        kernel before per-output-channel int8 quantization."""
        if self.qw is not None and name in self.qw:
            return self.qw[name]
        folded = kernel.astype(jnp.float32) * s[..., None]
        kq, ws = quantize_weight(folded)
        if self.qw is not None and not isinstance(kq, jax.core.Tracer):
            self.qw[name] = (kq, ws)
        return kq, ws

    def _see(self, name: str, x: jax.Array) -> None:
        a = jnp.max(jnp.abs(x.astype(jnp.float32)),
                    axis=tuple(range(x.ndim - 1)))
        prev = self.absmax.get(name)
        self.absmax[name] = a if prev is None else jnp.maximum(prev, a)

    def dense(self, name, x, kernel, bias, act=None):
        """(..., in) @ (in, out); quantization point = the input tensor,
        one scale per input channel."""
        if self.scales is None or name not in self.scales:
            if self.scales is None:
                self._see(name, x)
            y = x.astype(jnp.float32) @ kernel.astype(jnp.float32)
        else:
            s = jnp.atleast_1d(self.scales[name])
            kq, ws = self._qweight(name, kernel, s)
            y = jnp.dot(
                quantize_act(x, s), kq, preferred_element_type=jnp.int32
            ).astype(jnp.float32) * ws
        if bias is not None:
            y = y + bias.astype(jnp.float32)
        return act(y) if act is not None else y

    def gru(self, name, p, h0, xs_tb):
        """torch-parity GRU over (T, B, in) -> per-step hiddens (T, B, H).

        The input projection runs as ONE batched int8 matmul over all
        timesteps (the TPU fast path of models/gru.py ``scan_time``); only
        the (H, 3H) recurrence scans, with the carried hidden re-quantized
        each step against its own calibrated scale (``{name}/h``)."""
        from adafocus_tpu.models.gru import _gates

        gi = self.dense(f"{name}/x", xs_tb, p["wi"], p["bi"])
        bh = p["bh"].astype(jnp.float32)
        hname = f"{name}/h"
        if self.scales is None or hname not in self.scales:
            wh = p["wh"].astype(jnp.float32)
            hdim = wh.shape[0]

            def step(carry, gi_t):
                h, amax = carry
                h2 = _gates(gi_t, h, h @ wh + bh)
                amax = jnp.maximum(amax, jnp.max(jnp.abs(h2), axis=0))
                return (h2, amax), h2

            (_, amax), hs = jax.lax.scan(
                step, (h0, jnp.zeros((hdim,), jnp.float32)), gi)
            if self.scales is None:
                prev = self.absmax.get(hname)
                self.absmax[hname] = (
                    amax if prev is None else jnp.maximum(prev, amax))
            return hs
        s_h = jnp.atleast_1d(self.scales[hname])
        whq, whs = self._qweight(f"{name}/wh", p["wh"], s_h)

        def step(h, gi_t):
            gh = jnp.dot(
                quantize_act(h, s_h), whq, preferred_element_type=jnp.int32
            ).astype(jnp.float32) * whs + bh
            h2 = _gates(gi_t, h, gh)
            return h2, h2

        _, hs = jax.lax.scan(step, h0, gi)
        return hs


def _q8_encode(runner, policy_params, policy_stats, fmap, cfg):
    """Quantized StateEncoder (models/policy.py:46-73): 1x1-conv (as a
    channel matmul, BN folded when present) + flatten + fc, or the MLP
    pool variant. fmap: (N, h, w, C) -> (N, feat_dim)."""
    enc = policy_params["encoder"]
    if "proj" in enc:
        kernel = enc["proj"]["kernel"]
        k2 = kernel.reshape(kernel.shape[-2], kernel.shape[-1])
        if "bn" in enc:
            bn = dict(enc["bn"])
            bn.update(dict(policy_stats.get("encoder", {}).get("bn", {})))
            k2, bias = fold_bn(k2, bn)
        else:
            bias = enc["proj"].get("bias")
        x = runner.dense("policy/proj", fmap, k2, bias, act=jax.nn.relu)
        x = x.reshape(x.shape[0], -1)
    else:
        x = jnp.mean(fmap.astype(jnp.float32), axis=(1, 2))
    return runner.dense(
        "policy/fc", x, enc["fc"]["kernel"], enc["fc"]["bias"],
        act=jax.nn.relu)


def q8_policy_states(model, variables, head_scales, fmaps_tb, qw=None):
    """Quantized ActorCritic.rollout_states (models/policy.py:132-154).

    fmaps_tb: (T, B, gh, gw, C) time-major glance maps (actnet) or
    (D, B, gh, gw, C*Tg/D) division-stacked maps (sth-sth). Returns
    (hiddens (T,B,H), actor_out (T,B,K|2), value (T,B), runner)."""
    cfg = model.cfg
    runner = _HeadRunner(head_scales, qw)
    p = variables["params"]["policy"]
    stats = dict(variables.get("batch_stats", {})).get("policy", {})
    t, b = fmaps_tb.shape[:2]
    flat = fmaps_tb.reshape((t * b,) + fmaps_tb.shape[2:])
    states = _q8_encode(runner, p, stats, flat, cfg).reshape(t, b, -1)
    h0 = jnp.zeros((b, p["gru"]["wh"].shape[0]), jnp.float32)
    hs = runner.gru("policy/gru", p["gru"], h0, states)
    actor = runner.dense(
        "policy/actor", hs, p["actor"]["kernel"], p["actor"]["bias"])
    if cfg.continuous_policy:
        actor = jax.nn.sigmoid(actor)
    value = runner.dense(
        "policy/critic", hs, p["critic"]["kernel"], p["critic"]["bias"]
    )[..., 0]
    return hs, actor, value, runner


def q8_policy_rollout(model, variables, head_scales, fmap, rng,
                      mode: str = "greedy", div: bool = False, qw=None):
    """Quantized GFV.policy_rollout / policy_rollout_div: returns the same
    actions dict as models/gfv.py:189-239."""
    from adafocus_tpu.models.policy import sample_rollout

    cfg = model.cfg
    if div:
        b, tg = fmap.shape[:2]
        d = cfg.video_div
        gh, gw, c = fmap.shape[2:]
        fmap = jnp.moveaxis(
            fmap.reshape(b, d, tg // d, gh, gw, c), 2, 4
        ).reshape(b, d, gh, gw, (tg // d) * c)
    xs = jnp.swapaxes(fmap, 0, 1)
    _, actor_out, value, runner = q8_policy_states(
        model, variables, head_scales, xs, qw=qw)
    actions, idx, logprob = sample_rollout(
        actor_out, rng, mode, cfg.continuous_policy, cfg.action_dim,
        cfg.action_std)
    return {
        "actions": jnp.swapaxes(actions, 0, 1).astype(jnp.float32),
        "action_idx": jnp.swapaxes(idx, 0, 1),
        "logprob": jnp.swapaxes(logprob, 0, 1).astype(jnp.float32),
        "value": jnp.swapaxes(value, 0, 1).astype(jnp.float32),
    }, runner


def q8_classify_gru(model, variables, head_scales, pooled, local, qw=None):
    """Quantized fuse_and_classify for the GRU family (models/gfv.py:
    336-350): fused features -> int8 GRU scan -> int8 FC, per-step logits
    (B, T, classes)."""
    runner = _HeadRunner(head_scales, qw)
    p = variables["params"]["classifier"]
    fused = jnp.concatenate(
        [pooled.astype(jnp.float32), local.astype(jnp.float32)], axis=-1)
    xs = jnp.swapaxes(fused, 0, 1)
    h0 = jnp.zeros((fused.shape[0], p["gru"]["wh"].shape[0]), jnp.float32)
    hs = runner.gru("cls/gru", p["gru"], h0, xs)
    logits = runner.dense("cls/fc", hs, p["fc"]["kernel"], p["fc"]["bias"])
    return jnp.swapaxes(logits, 0, 1), runner


def q8_frame_logits(model, variables, head_scales, feats, which: str,
                    qw=None):
    """Quantized per-frame FC heads: the sth-sth consensus local head
    (classifier/fc, dropout inactive at eval) or the glancer's own
    classifier. feats: (..., D) -> (..., classes)."""
    runner = _HeadRunner(head_scales, qw)
    if which == "local":
        p = variables["params"]["classifier"]["fc"]
        name = "cls/fc"
    else:
        p = variables["params"]["glancer"]["classifier"]
        name = "glancer/fc"
    return runner.dense(name, feats, p["kernel"], p["bias"]), runner


def _dequant_frames(frames, dtype):
    """int8-transport frames -> compute dtype (XLA fuses the convert +
    scale into the consuming stem conv). Passthrough for float inputs."""
    from adafocus_tpu.ops.quant import FRAME_SCALE

    if frames.dtype == jnp.int8:
        return frames.astype(dtype) * jnp.asarray(FRAME_SCALE, dtype)
    return frames


def calibrate_heads(model, variables, batches) -> Dict[str, jax.Array]:
    """Record-mode pass over the deployment head path: glance fmaps ->
    policy rollout, focus features -> classifier, collecting per-point
    input abs-maxes. batches: the ``calibrate_gfv`` dicts. Returns
    {point_name: f32 scale}."""
    cfg = model.cfg

    def collect(variables, frames_small, patches):
        b, t = frames_small.shape[:2]
        flat = frames_small.reshape((b * t,) + frames_small.shape[2:])
        fmap, pooled, _ = _run_backbone(
            "mbv2", _subtree(variables, "glancer"), flat.astype(cfg.dtype),
            None, n_frames=cfg.num_frames if cfg.tsm else 0)
        fmap = fmap.reshape((b, t) + fmap.shape[1:])
        pooled = pooled.reshape(b, t, -1)
        _, _, _, runner = q8_policy_states(
            model, variables, None,
            _div_stack(fmap.astype(jnp.float32), cfg.video_div)
            if cfg.classifier == "consensus"
            else jnp.swapaxes(fmap.astype(jnp.float32), 0, 1))
        absmax = dict(runner.absmax)
        _, local, _ = _run_backbone(
            "resnet", _subtree(variables, "focuser"),
            patches.astype(cfg.dtype), None,
            n_frames=cfg.t_focuser if cfg.tsm else 0)
        tf = local.shape[0] // b
        local = local.reshape(b, tf, -1)
        if cfg.classifier == "gru":
            _, crunner = q8_classify_gru(
                model, variables, None, pooled[:, :tf], local)
            absmax.update(crunner.absmax)
        elif cfg.classifier == "consensus":
            _, crunner = q8_frame_logits(
                model, variables, None, local, "local")
            absmax.update(crunner.absmax)
            _, grunner = q8_frame_logits(
                model, variables, None, pooled, "glancer")
            absmax.update(grunner.absmax)
        return absmax

    import numpy as np

    jitted = jax.jit(collect)
    running: Dict[str, "np.ndarray"] = {}
    for b in batches:
        absmax = jax.device_get(
            jitted(variables, b["frames_small"], b["patches"]))
        for k, v in absmax.items():
            v = np.asarray(v, np.float32)  # per-input-channel vector
            prev = running.get(k)
            running[k] = v if prev is None else np.maximum(prev, v)
    return {k: act_scale_from_absmax(jnp.asarray(v, jnp.float32))
            for k, v in running.items()}


def _div_stack(fmap, d):
    """(B, Tg, gh, gw, C) -> time-major division-stacked (D, B, gh, gw,
    C*Tg/D) — the sth-sth policy input (models/gfv.py:218-239)."""
    b, tg = fmap.shape[:2]
    gh, gw, c = fmap.shape[2:]
    stacked = jnp.moveaxis(
        fmap.reshape(b, d, tg // d, gh, gw, c), 2, 4
    ).reshape(b, d, gh, gw, (tg // d) * c)
    return jnp.swapaxes(stacked, 0, 1)


def inference_q8(model, variables, scales, frames_flat, frames_small, rng,
                 impl: str = "auto", qw=None):
    """int8 deployment forward (actnet GRU family): quantized glance +
    focus backbones; with head scales present (``scales['heads']``,
    calibrate_gfv) the policy and classifier run int8 too, and frames may
    arrive as int8 transport (halved extraction DMA). Mirrors
    models/gfv.py ``inference``. ``qw``: prepared-weight cache from
    ``prepare_q8`` (valid for this variables pytree only)."""
    from adafocus_tpu.models.gfv import (
        GFV, extract_for_frames, fuse_and_classify,
    )

    cfg = model.cfg
    heads = scales.get("heads")
    hqw = None if qw is None else qw["heads"]
    b, t = frames_small.shape[:2]
    fmap, pooled = q8_glance(
        model, variables, scales, _dequant_frames(frames_small, cfg.dtype),
        qw=qw)
    if heads is not None:
        roll, _ = q8_policy_rollout(
            model, variables, heads, fmap.astype(jnp.float32), rng, "greedy",
            qw=hqw)
    else:
        roll = model.apply(
            variables, fmap.astype(cfg.dtype), rng, "greedy", False,
            method=GFV.policy_rollout)
    patches = extract_for_frames(
        frames_flat, roll["actions"], cfg.image_size, cfg.patch_size,
        impl=impl)
    local = q8_focus(
        model, variables, scales, _dequant_frames(patches, cfg.dtype), qw=qw
    ).reshape(b, t, -1)
    if heads is not None and cfg.classifier == "gru":
        logits, _ = q8_classify_gru(model, variables, heads, pooled, local,
                                    qw=hqw)
        return logits
    return fuse_and_classify(
        model, variables, pooled.astype(cfg.dtype),
        local.astype(cfg.dtype), train=False)


def inference_q8_plus(model, variables, scales, frames_flat, frames_small,
                      rng, impl: str = "auto", qw=None):
    """int8 deployment forward (AdaFocus+ temporal selection): quantized
    glance + focus backbones; selector (ST top-K or plus_rl greedy
    sequential), spatial policy, and classifier stay bf16. Mirrors
    models/gfv_plus.py ``inference_plus``."""
    from adafocus_tpu.models.gfv import (
        GFV, extract_for_frames, fuse_and_classify,
    )
    from adafocus_tpu.models.gfv_plus import (
        gather_frames, scatter_frames, select_topk,
    )

    cfg = model.cfg
    heads = scales.get("heads")
    hqw = None if qw is None else qw["heads"]
    b, t = frames_small.shape[:2]
    k = cfg.frame_budget
    fmap, pooled = q8_glance(
        model, variables, scales, _dequant_frames(frames_small, cfg.dtype),
        qw=qw)
    fmap = fmap.astype(cfg.dtype)
    pooled = pooled.astype(cfg.dtype)
    if cfg.plus_rl:
        sel_roll = model.apply(
            variables, pooled, rng, "top", method=GFV.select_rollout)
        idx = sel_roll["idx"]
    else:
        scores = model.apply(variables, pooled, method=GFV.frame_scores)
        idx, _ = select_topk(scores, k, rng, mode="top")
    fmap_sel = gather_frames(fmap, idx)
    if heads is not None:
        roll, _ = q8_policy_rollout(
            model, variables, heads, fmap_sel.astype(jnp.float32), rng,
            "greedy", qw=hqw)
    else:
        roll = model.apply(
            variables, fmap_sel, rng, "greedy", False,
            method=GFV.policy_rollout)
    patches = extract_for_frames(
        gather_frames(frames_flat, idx), roll["actions"], cfg.image_size,
        cfg.patch_size, impl=impl)
    local_sel = q8_focus(
        model, variables, scales, _dequant_frames(patches, cfg.dtype), qw=qw
    ).reshape(b, k, -1)
    local_full = scatter_frames(local_sel.astype(cfg.dtype), idx, t)
    if heads is not None and cfg.classifier == "gru":
        logits, _ = q8_classify_gru(
            model, variables, heads, pooled, local_full, qw=hqw)
        return logits
    return fuse_and_classify(model, variables, pooled, local_full,
                             train=False)


def inference_q8_sthsth(model, variables, scales, frames_flat, frames_small,
                        rng, impl: str = "auto", qw=None):
    """int8 deployment forward (sth-sth consensus family): quantized TSM
    glance + focus backbones, bf16 policy/classifier heads. Mirrors
    models/gfv_sthsth.py ``inference_sthsth``."""
    from adafocus_tpu.models.gfv import GFV, extract_for_frames
    from adafocus_tpu.models.gfv_sthsth import (
        actions_per_frame, sum_consensus,
    )

    cfg = model.cfg
    heads = scales.get("heads")
    hqw = None if qw is None else qw["heads"]
    b, tf = frames_flat.shape[:2]
    tg = frames_small.shape[1]
    fmap, pooled = q8_glance(
        model, variables, scales, _dequant_frames(frames_small, cfg.dtype),
        qw=qw)
    if heads is not None:
        global_logits, _ = q8_frame_logits(
            model, variables, heads, pooled, "glancer", qw=hqw)
        roll, _ = q8_policy_rollout(
            model, variables, heads, fmap.astype(jnp.float32), rng,
            "greedy", div=True, qw=hqw)
    else:
        global_logits = model.apply(
            variables, pooled.reshape(b * tg, -1), False,
            method=lambda m, p, train: m.glancer.classify(p, train),
        ).reshape(b, tg, -1)
        roll = model.apply(
            variables, fmap.astype(cfg.dtype), rng, "greedy", False,
            method=GFV.policy_rollout_div)
    actions = actions_per_frame(roll["actions"], tf)
    patches = extract_for_frames(
        frames_flat, actions, cfg.image_size, cfg.patch_size, impl=impl)
    feats = q8_focus(
        model, variables, scales, _dequant_frames(patches, cfg.dtype), qw=qw
    ).reshape(b, tf, -1)
    if heads is not None:
        local_logits, _ = q8_frame_logits(
            model, variables, heads, feats, "local", qw=hqw)
    else:
        local_logits = model.apply(
            variables, feats.astype(cfg.dtype), False,
            method=GFV.classify_frame_logits)
    return sum_consensus(global_logits, local_logits, cfg.with_glancer)


def prepare_q8(model, variables, scales) -> dict:
    """Eagerly fill the prepared-weight cache for the model's family.

    Runs the family's ``inference_q8*`` ONCE outside jit on a dummy
    batch-1 input; every unit/head lazily records its BN-folded,
    per-channel-quantized weights (weight prep is data-independent, so the
    dummy values are irrelevant). The returned
    ``{'glancer': {...}, 'focuser': {...}, 'heads': {...}}`` dict then
    short-circuits fold+quantize on every subsequent call — pass it to the
    ``inference_q8*`` entry points (or ``export_inference``, which bakes
    the int8 kernels into the artifact as constants), so batch-1 serving
    pays weight quantization once instead of per call (PERF.md 0.84x).

    The cache is valid for THIS variables pytree only; rebuild it after
    any weight change (new checkpoint, EMA swap).
    """
    from adafocus_tpu.benchmark import make_data

    cfg = model.cfg
    qw = {"glancer": {}, "focuser": {}, "heads": {}}
    if cfg.frame_budget > 0:
        fam = inference_q8_plus
    elif cfg.classifier == "consensus":
        fam = inference_q8_sthsth
    else:
        fam = inference_q8
    data = make_data(cfg, 1)
    fam(model, variables, scales, data["frames_flat"], data["frames_small"],
        jax.random.key(0), qw=qw)
    return qw
