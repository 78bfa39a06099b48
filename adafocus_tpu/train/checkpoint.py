"""Checkpoint / resume — component-keyed, stage-aware (Orbax).

Parity with the reference checkpoint subsystem (/root/reference
actnet/basic_tools/checkpoint.py:24-79 and actnet/main_dist.py:92-110,
271-300): atomic writes (Orbax writes to a tmp dir and renames — the same
tempfile+rename trick the reference hand-rolls), a ``checkpoint`` +
``model_best`` pair tracked by best accuracy, and stage-aware resume where
stage N loads stage N-1's components and freshly initializes the rest.

Where the reference stores per-module torch state_dicts with messy key
remapping (sthsth/stage1.py:90-138, sthsth/ops/utils.py:239-290), the
checkpoint here IS the train-state pytree, keyed by component
({glancer, focuser, classifier, policy} + batch_stats/opt/ppo), so stage
composition is tree surgery, not string surgery.
"""

from __future__ import annotations

import os
import shutil
from typing import Any, Dict, Optional

import jax
import numpy as np

# components each stage consumes from the previous stage's checkpoint
# (reference main_dist.py:92-110: stage 1 loads pretrained glancer+focuser,
# stage 2 loads stage-1 everything, stage 3 loads stage-2 everything).
# AdaFocus+ components (absent keys are skipped): 'selector' (ST variant,
# trained in stage 1) rides along from stage 2 on; 'selector_ac' (joint-RL
# variant) is trained in stage 2 like the spatial policy and loads in
# stage 3.
STAGE_LOADS = {
    0: (),
    1: ("glancer", "focuser"),
    2: ("glancer", "focuser", "classifier", "selector"),
    3: ("glancer", "focuser", "classifier", "policy", "selector",
        "selector_ac"),
}


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def _to_saveable(state) -> Dict[str, Any]:
    """TrainState -> plain dict pytree (None leaves dropped)."""
    out = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "step": state.step,
    }
    if state.opt_state is not None:
        out["opt_state"] = state.opt_state
    if state.ppo is not None:
        out["ppo"] = {
            "params": state.ppo.params,
            "params_old": state.ppo.params_old,
            "opt_state": state.ppo.opt_state,
            "step": state.ppo.step,
        }
    return out


def save_checkpoint(
    ckpt_dir: str,
    state,
    epoch: int,
    acc: float,
    best_acc: float,
    is_best: bool = False,
) -> None:
    """Write ``<ckpt_dir>/checkpoint`` (atomic); copy to ``model_best`` when
    ``is_best`` (reference sthsth/stage1.py:296-306)."""
    os.makedirs(ckpt_dir, exist_ok=True)
    tree = _to_saveable(state)
    tree["meta"] = {
        "epoch": np.int64(epoch),
        "acc": np.float64(acc),
        "best_acc": np.float64(best_acc),
    }
    path = os.path.join(ckpt_dir, "checkpoint")
    if os.path.exists(path):
        shutil.rmtree(path)
    _checkpointer().save(path, tree)
    if is_best:
        best = os.path.join(ckpt_dir, "model_best")
        if os.path.exists(best):
            shutil.rmtree(best)
        shutil.copytree(path, best)


def load_checkpoint(ckpt_dir: str, best: bool = False) -> Optional[Dict[str, Any]]:
    """Read a checkpoint tree, or None if absent."""
    path = os.path.join(ckpt_dir, "model_best" if best else "checkpoint")
    if not os.path.exists(path):
        return None
    return _checkpointer().restore(path)


def restore_train_state(state, tree: Dict[str, Any]):
    """Full resume: params/batch_stats/opt/ppo/step from ``tree`` shaped
    like ``state`` (same stage)."""
    from adafocus_tpu.ppo.core import PPOState

    ppo = state.ppo
    if ppo is not None and "ppo" in tree:
        t = tree["ppo"]
        ppo = PPOState(params=t["params"], params_old=t["params_old"],
                       opt_state=t["opt_state"], step=t["step"])
    return state.replace(
        params=tree["params"],
        batch_stats=tree.get("batch_stats", state.batch_stats),
        opt_state=tree.get("opt_state", state.opt_state),
        step=tree.get("step", state.step),
        ppo=ppo,
    )


def _merge_compatible(dst: Any, src: Any) -> Any:
    """Copy ``src`` into ``dst`` where structures+shapes agree; recurse
    into dicts so a component with e.g. a different-class-count head keeps
    its fresh head while the backbone loads (the reference's strict=False
    component loads + converted ImageNet checkpoints)."""
    import numpy as np

    if isinstance(dst, dict) and isinstance(src, dict):
        out = dict(dst)
        for k, v in src.items():
            if k in out:
                out[k] = _merge_compatible(out[k], v)
        return out
    if hasattr(dst, "shape") and hasattr(src, "shape"):
        return src if np.shape(dst) == np.shape(src) else dst
    return src


def load_stage_components(state, tree: Dict[str, Any], stage: int):
    """Stage-aware warm start: copy only the components stage ``stage``
    inherits from the previous stage's checkpoint (shape-mismatched leaves
    keep fresh init); fresh optimizer state for everything."""
    wanted = STAGE_LOADS[stage]
    params = dict(state.params)
    stats = dict(state.batch_stats or {})
    src_params = tree["params"]
    src_stats = tree.get("batch_stats", {}) or {}
    for k in wanted:
        if k in src_params:
            params[k] = _merge_compatible(params.get(k, {}), src_params[k])
        if k in src_stats:
            stats[k] = _merge_compatible(stats.get(k, {}), src_stats[k])
    return state.replace(params=params, batch_stats=stats)


def best_acc_of(tree: Optional[Dict[str, Any]]) -> float:
    if not tree:
        return 0.0
    return float(tree.get("meta", {}).get("best_acc", 0.0))
