"""AdaFocus+ train/eval steps — temporal frame selection on top of the
actnet family (see models/gfv_plus.py for the redesign rationale vs the
reference's vestigial AR-Net loop, sthsth/ops/models_ada.py).

Stage semantics follow the base recipe: stage 1 trains focuser +
classifier + selector on random patches (glancer and spatial policy
frozen); stage 3 finetunes classifier + selector under the frozen greedy
spatial policy. Spatial PPO (stage 2) reuses make_stage2_step unchanged —
the selector only changes which frames the focuser sees, and stage 2
freezes it like every non-policy component.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax

from adafocus_tpu.models.gfv import GFV
from adafocus_tpu.models.gfv_plus import forward_plus, inference_plus
from adafocus_tpu.ops.metrics import topk_accuracy
from adafocus_tpu.train.stages import TrainState, _ce_per_step


def make_plus_train_step(
    model: GFV,
    stage: int,
    tx: optax.GradientTransformation,
    axis_name: Optional[str] = None,
    impl: str = "auto",
) -> Callable:
    """Supervised AdaFocus+ stages 1 and 3."""
    if stage not in (1, 3):
        raise ValueError("AdaFocus+ supervised stages are 1 and 3")
    patch_mode = "random" if stage == 1 else "policy"

    def loss_fn(params, state: TrainState, batch, rng):
        variables = {"params": params, "batch_stats": state.batch_stats}
        a_key, d_key = jax.random.split(rng)
        logits, _aux, upd = forward_plus(
            model, variables, batch["frames_flat"], batch["frames_small"],
            a_key, train=True, patch_mode=patch_mode, impl=impl,
            mutable=["batch_stats"], rngs={"dropout": d_key},
            freeze_glance=True,
        )
        loss = _ce_per_step(logits, batch["labels"])
        new_stats = dict(state.batch_stats)
        new_stats.update(dict(upd.get("batch_stats", upd)))
        return loss, (new_stats, logits[:, -1])

    def step(state: TrainState, batch, rng):
        (loss, (new_stats, final_logits)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, state, batch, rng)
        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
            new_stats = jax.lax.pmean(new_stats, axis_name)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        top1, top5 = topk_accuracy(
            final_logits.astype(jnp.float32), batch["labels"])
        metrics = {"loss": loss, "top1": top1, "top5": top5}
        if axis_name is not None:
            metrics = jax.lax.pmean(metrics, axis_name)
        return (
            state.replace(params=params, batch_stats=new_stats,
                          opt_state=opt_state, step=state.step + 1),
            metrics,
        )

    return step


def make_plus_eval_step(model: GFV, impl: str = "auto") -> Callable:
    """Deployment eval: top-K frames + greedy spatial policy."""

    def step(state: TrainState, batch, rng):
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        logits = inference_plus(
            model, variables, batch["frames_flat"], batch["frames_small"],
            rng, impl=impl,
        )
        top1, top5 = topk_accuracy(
            logits[:, -1].astype(jnp.float32), batch["labels"])
        return logits, {"top1": top1, "top5": top5}

    return step
