"""Optimizer group labeling: the TSN per-param-type LR/decay policies
(reference sthsth/models/tsn.py:167-213 get_optim_policies, consumed by
every sth-sth stage, e.g. stage1.py:192-196) walked over a real flax
TSM-ResNet tree, plus the partial-BN interplay (tsn.py:146-162)."""

import pytest

import jax
import jax.numpy as jnp
import numpy as np

from adafocus_tpu.models.resnet import resnet18
from adafocus_tpu.train.optim import (
    OptimConfig,
    make_stage_optimizer,
    tsn_param_labels,
)

pytestmark = pytest.mark.smoke  # fast CPU tier: `pytest -m smoke`


def _focuser_params():
    m = resnet18(num_classes=4, dtype=jnp.float32, n_frames=2)
    return m.init(jax.random.key(0), jnp.zeros((2, 32, 32, 3)), False)["params"]


def _flatten(tree):
    flat = {}

    def walk(sub, path):
        if isinstance(sub, dict):
            for k, v in sub.items():
                walk(v, path + (k,))
        else:
            flat[path] = sub

    walk(tree, ())
    return flat


def test_tsn_labels_walk_tsm_resnet_tree():
    params = _focuser_params()
    labels = _flatten(tsn_param_labels(params))
    values = _flatten(params)

    assert labels[("stem", "conv", "kernel")] == "tsn_first_conv_weight"
    assert labels[("stem", "bn", "scale")] == "tsn_bn"
    assert labels[("stem", "bn", "bias")] == "tsn_bn"
    assert labels[("layer1_0", "conv1", "conv", "kernel")] == "tsn_normal_weight"
    assert labels[("fc", "kernel")] == "tsn_normal_weight"
    assert labels[("fc", "bias")] == "tsn_normal_bias"
    # every BN affine leaf lands in the bn group (reference collects ALL
    # BatchNorm params when pbn disabled, tsn.py:187-196)
    for path, lab in labels.items():
        if "bn" in path:
            assert lab == "tsn_bn", path
        else:
            assert lab != "tsn_bn", path
    assert set(labels) == set(values)


def test_tsn_labels_partial_bn_freezes_non_stem_bn():
    params = _focuser_params()
    labels = _flatten(tsn_param_labels(params, partial_bn=True))
    assert labels[("stem", "bn", "scale")] == "tsn_bn"
    for path, lab in labels.items():
        if "bn" in path and path[0] != "stem":
            assert lab == "frozen", path


def test_tsn_update_magnitudes():
    """With momentum=0 and unit gradients, the first SGD step isolates the
    group policy: bias groups update at 2x lr with no weight decay; BN
    affine at 1x lr no decay; weights at 1x lr with decay
    (tsn.py:197-213)."""
    focuser = _focuser_params()
    params = {
        "focuser": focuser,
        "classifier": {"fc": {"kernel": jnp.ones((3, 3)),
                              "bias": jnp.zeros((3,))}},
        "glancer": {"w": jnp.ones((2,))},
        "policy": {"w": jnp.ones((2,))},
    }
    lr, wd = 0.01, 0.5
    cfg = OptimConfig(backbone_lr=lr, fc_lr=lr, momentum=0.0,
                      weight_decay=wd, epochs=1, steps_per_epoch=1,
                      lr_type="step", lr_steps=(10,), tsn_policies=True)
    tx = make_stage_optimizer(1, cfg)
    opt_state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = tx.update(grads, opt_state, params)

    upd = _flatten(updates["focuser"])
    val = _flatten(focuser)
    # first conv weight: -(g + wd*w) * lr
    np.testing.assert_allclose(
        np.asarray(upd[("stem", "conv", "kernel")]),
        np.asarray(-(1.0 + wd * val[("stem", "conv", "kernel")]) * lr),
        rtol=1e-6)
    # BN affine: 1x lr, decay_mult 0 -> exactly -lr
    np.testing.assert_allclose(
        np.asarray(upd[("stem", "bn", "scale")]), -lr, rtol=1e-6)
    # fc bias: 2x lr, no decay
    np.testing.assert_allclose(
        np.asarray(upd[("fc", "bias")]), -2 * lr, rtol=1e-6)
    # normal weight: 1x lr with decay
    np.testing.assert_allclose(
        np.asarray(upd[("fc", "kernel")]),
        np.asarray(-(1.0 + wd * val[("fc", "kernel")]) * lr), rtol=1e-6)
    # frozen components get zero updates; glancer frozen in stage 1
    assert float(jnp.abs(updates["glancer"]["w"]).max()) == 0
    assert float(jnp.abs(updates["policy"]["w"]).max()) == 0
    # classifier head still trains at fc_lr with decay
    np.testing.assert_allclose(
        np.asarray(updates["classifier"]["fc"]["bias"]), -lr, rtol=1e-6)
