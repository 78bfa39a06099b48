"""Metric parity (ops/metrics.py vs reference actnet/ops/utils.py:35-88).

Hand-computed AP/mAP fixtures plus the zero-positive-class convention:
reference cal_map divides by max(n_pos, 1), so an empty class contributes
AP 0 to the mean (actnet/ops/utils.py:87).
"""

import pytest

import jax.numpy as jnp
import numpy as np

from adafocus_tpu.ops.metrics import (
    average_precision,
    mean_average_precision,
    multi_hot,
    topk_accuracy,
)

pytestmark = pytest.mark.smoke  # fast CPU tier: `pytest -m smoke`


def test_topk_accuracy_hand_example():
    logits = jnp.asarray([
        [0.1, 0.9, 0.0, 0.0],   # top1 = 1
        [0.8, 0.05, 0.1, 0.05],  # top1 = 0, label 1 not in top2
        [0.3, 0.4, 0.2, 0.1],   # top1 = 1, label 0 in top2
    ])
    labels = jnp.asarray([1, 1, 0])
    top1, top2 = topk_accuracy(logits, labels, ks=(1, 2))
    assert np.isclose(float(top1), 1 / 3)
    assert np.isclose(float(top2), 2 / 3)


def test_average_precision_hand_example():
    # ranked by score desc: targets [1, 0, 1] -> AP = (1/1 + 2/3) / 2
    scores = np.asarray([0.9, 0.8, 0.7])
    targets = np.asarray([1.0, 0.0, 1.0])
    assert np.isclose(average_precision(scores, targets), (1.0 + 2 / 3) / 2)


def test_map_zero_positive_class_convention():
    scores = np.asarray([[0.9, 0.1], [0.2, 0.8]])
    hot = np.asarray([[1.0, 0.0], [1.0, 0.0]])  # class 1 has no positives
    # class 0: targets [1, 1] by rank -> AP 1.0; class 1: empty -> AP 0
    assert np.isclose(mean_average_precision(scores, hot), 0.5)
    assert np.isclose(
        mean_average_precision(scores, hot, skip_empty=True), 1.0)


def test_map_matches_reference_cal_map_math():
    """Same computation as reference cal_map (sort desc, cumsum precision
    at hits, / max(n_pos, 1), mean over all classes), random fixture."""
    rng = np.random.default_rng(0)
    n, c = 64, 7
    scores = rng.random((n, c)).astype(np.float32)
    hot = (rng.random((n, c)) < 0.3).astype(np.float32)
    hot[:, 3] = 0.0  # force one empty class

    aps = []
    for k in range(c):
        order = np.argsort(-scores[:, k], kind="stable")
        truth = hot[order, k]
        tp = np.cumsum(truth)
        precision = tp / np.arange(1, n + 1)
        aps.append(precision[truth.astype(bool)].sum() / max(truth.sum(), 1))
    expected = float(np.mean(aps))
    assert np.isclose(mean_average_precision(scores, hot), expected)


def test_multi_hot_padded_rows():
    hot = multi_hot(np.asarray([[0, 2, -1], [1, -1, -1]]), 4)
    np.testing.assert_array_equal(
        hot, [[1, 0, 1, 0], [0, 1, 0, 0]])
