"""Evaluation metrics: top-k accuracy, multi-label mAP, running meters.

Parity with the reference metrics (actnet/ops/utils.py:35-88 in
/root/reference): ``accuracy`` top-k and ``cal_map`` average precision over
multi-hot labels. top-k runs on device; mAP runs on host over the gathered
full validation set, as the reference does (actnet/main_dist.py:392-397).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def topk_accuracy(
    logits: jax.Array, labels: jax.Array, ks: Sequence[int] = (1, 5)
) -> Tuple[jax.Array, ...]:
    """logits (B, C), int labels (B,) -> fraction correct for each k
    (k is clamped to C so tiny-class-count configs don't crash)."""
    c = logits.shape[-1]
    max_k = min(max(ks), c)
    _, top_idx = jax.lax.top_k(logits, max_k)  # (B, max_k)
    correct = top_idx == labels[:, None]
    return tuple(
        jnp.mean(jnp.any(correct[:, : min(k, c)], axis=1).astype(jnp.float32))
        for k in ks
    )


def average_precision(scores: np.ndarray, targets: np.ndarray) -> float:
    """AP for one class: scores (N,), binary targets (N,)."""
    order = np.argsort(-scores, kind="stable")
    t = targets[order]
    n_pos = t.sum()
    if n_pos == 0:
        return 0.0
    hits = np.cumsum(t)
    prec = hits / (np.arange(len(t)) + 1)
    return float((prec * t).sum() / n_pos)


def mean_average_precision(
    scores: np.ndarray, multi_hot: np.ndarray, skip_empty: bool = False
) -> float:
    """mAP over classes; scores (N, C), multi_hot (N, C) in {0,1}.

    Default matches the reference convention exactly (cal_map,
    actnet/ops/utils.py:79-87: ``/ max(truth.sum(), 1)``): a class with no
    positives contributes AP 0 to the mean. On a full validation set every
    class has positives so the two conventions agree; on a shard they
    differ. ``skip_empty=True`` averages only over classes with positives
    (the common sklearn-style alternative)."""
    aps = []
    for c in range(scores.shape[1]):
        if multi_hot[:, c].sum() > 0:
            aps.append(average_precision(scores[:, c], multi_hot[:, c]))
        elif not skip_empty:
            aps.append(0.0)
    return float(np.mean(aps)) if aps else 0.0


def multi_hot(labels: np.ndarray, num_classes: int) -> np.ndarray:
    """(N, K) padded label lists (−1 = empty slot) or (N,) ints -> (N, C)."""
    labels = np.asarray(labels)
    if labels.ndim == 1:
        labels = labels[:, None]
    out = np.zeros((labels.shape[0], num_classes), np.float32)
    for i, row in enumerate(labels):
        for l in np.atleast_1d(row):
            if l >= 0:
                out[i, int(l)] = 1.0
    return out


class AverageMeter:
    """Host-side running average (reference ops/utils.py AverageMeter)."""

    def __init__(self, name: str = ""):
        self.name = name
        self.reset()

    def reset(self):
        self.sum = 0.0
        self.count = 0

    def update(self, val: float, n: int = 1):
        self.sum += float(val) * n
        self.count += n

    @property
    def avg(self) -> float:
        return self.sum / max(self.count, 1)

    def __repr__(self):
        return f"{self.name}={self.avg:.4f}(n={self.count})"
