"""AOT serving artifacts for the deployment forward (jax.export).

The reference has no deployment/export story at all — serving means
"import the training repo and call forward" (actnet/main_dist.py
evaluate=True). Here the two-phase batched inference program — for any of
the three families (actnet GRU, sth-sth consensus, AdaFocus+), bf16 or the
int8 PTQ path — exports to a serialized StableHLO artifact that runs with
NO Python model code: load bytes, call with (frames_flat, frames_small).

Weights are baked into the artifact as constants (the standard serving
shape: one file = model + weights); the greedy policy needs no externally
supplied randomness, so the exported callable is a pure
``(frames_flat, frames_small) -> per-step logits`` function with a fixed
batch size per artifact (XLA static shapes; export one artifact per served
batch size, as with any compiled-serving stack).

Usage::

    exp = export_inference(model, variables, batch_size=64)
    save_exported(exp, "model.stablehlo")
    fn = load_exported("model.stablehlo")     # no adafocus_tpu needed
    logits = fn(frames_flat, frames_small)
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp


def _family_inference(model, mode: str, scales=None, qw=None):
    """(variables-closed) inference fn for the model's family/mode."""
    cfg = model.cfg
    if mode == "int8":
        from adafocus_tpu.models.quant_inference import (
            inference_q8,
            inference_q8_plus,
            inference_q8_sthsth,
        )

        if cfg.frame_budget > 0:
            fam = inference_q8_plus
        elif cfg.classifier == "consensus":
            fam = inference_q8_sthsth
        else:
            fam = inference_q8

        def fn(variables, frames_flat, frames_small, rng):
            return fam(model, variables, scales, frames_flat, frames_small,
                       rng, qw=qw)

        return fn
    if cfg.frame_budget > 0:
        from adafocus_tpu.models.gfv_plus import inference_plus as fam
    elif cfg.classifier == "consensus":
        from adafocus_tpu.models.gfv_sthsth import inference_sthsth as fam
    else:
        from adafocus_tpu.models.gfv import inference as fam

    def fn(variables, frames_flat, frames_small, rng):
        return fam(model, variables, frames_flat, frames_small, rng)

    return fn


def export_inference(
    model,
    variables,
    batch_size: int,
    mode: str = "bf16",
    scales=None,
    platforms: Optional[Sequence[str]] = None,
    seed: int = 0,
):
    """Export the deployment forward as a ``jax.export.Exported``.

    model/variables: the GFV model and its trained variables (baked in).
    mode: 'bf16' | 'int8' (PTQ; pass the calibrated ``scales`` from
      models/quant_inference.calibrate_gfv).
    platforms: lowering platforms (e.g. ('tpu',) or ('cpu', 'tpu'));
      defaults to the current backend.
    """
    from jax import export as jexport

    from adafocus_tpu.benchmark import make_data

    cfg = model.cfg
    if mode == "int8" and scales is None:
        raise ValueError("int8 export needs calibrated activation scales")
    qw = None
    if mode == "int8":
        # one eager pass fills the prepared-weight cache; the exported
        # program then carries pre-quantized int8 kernels as constants
        # (no per-call BN-fold/quantize — the batch-1 serving fix) and
        # drops the unused f32 conv kernels from the artifact
        from adafocus_tpu.models.quant_inference import prepare_q8

        qw = prepare_q8(model, variables, scales)
    inner = _family_inference(model, mode, scales, qw)
    # greedy deployment decoding is deterministic; the key only satisfies
    # the rollout signature, so bake it (and the weights) as constants
    rng = jax.random.key(seed)

    def fn(frames_flat, frames_small):
        return inner(variables, frames_flat, frames_small, rng)

    data = make_data(cfg, batch_size)
    args = (data["frames_flat"], data["frames_small"])
    specs = tuple(jax.ShapeDtypeStruct(a.shape, a.dtype) for a in args)
    kwargs = {} if platforms is None else {"platforms": tuple(platforms)}
    return jexport.export(jax.jit(fn), **kwargs)(*specs)


def save_exported(exported, path: str) -> None:
    with open(path, "wb") as f:
        f.write(exported.serialize())


def load_exported(path: str):
    """Load a serialized artifact; returns a jit-compiled callable
    ``(frames_flat, frames_small) -> logits``. Needs only jax, not the
    framework's model code."""
    from jax import export as jexport

    with open(path, "rb") as f:
        exported = jexport.deserialize(f.read())
    return jax.jit(exported.call)
