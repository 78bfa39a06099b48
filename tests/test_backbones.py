"""Shape/structure sanity for the backbones (reference parity:
actnet/models/mobilenet.py feature_dim=1280, resnet.py feature_dim=2048)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adafocus_tpu.models.mobilenet import MobileNetV2
from adafocus_tpu.models.resnet import resnet18, resnet50


def n_params(tree):
    return sum(np.prod(x.shape) for x in jax.tree.leaves(tree))


def test_mobilenetv2_shapes_and_params():
    model = MobileNetV2(num_classes=200)
    x = jnp.zeros((2, 96, 96, 3))
    variables = model.init(jax.random.key(0), x)
    fmap, pooled = model.apply(variables, x, method=MobileNetV2.features)
    assert fmap.shape == (2, 3, 3, 1280)
    assert pooled.shape == (2, 1280)
    logits = model.apply(variables, x)
    assert logits.shape == (2, 200)
    # torchvision mobilenet_v2 (1000 classes) has 3,504,872 params;
    # with 200 classes: 3.5M - 1281*800 = 2,480,072 + ... check backbone count:
    backbone = {k: v for k, v in variables["params"].items() if k != "classifier"}
    assert abs(n_params(backbone) - 2_223_872) < 50_000


def test_resnet50_shapes_and_params():
    model = resnet50(num_classes=10)
    x = jnp.zeros((1, 64, 64, 3))
    variables = model.init(jax.random.key(0), x)
    fmap, pooled = model.apply(variables, x, method="features")
    assert fmap.shape == (1, 2, 2, 2048)
    assert pooled.shape == (1, 2048)
    assert model.feature_dim == 2048
    backbone = {k: v for k, v in variables["params"].items() if k != "fc"}
    # torchvision resnet50 backbone = 25,557,032 - fc(2048*1000+1000) = 23,508,032
    assert n_params(backbone) == 23_508_032


def test_resnet18_runs():
    model = resnet18(num_classes=10)
    x = jnp.zeros((1, 32, 32, 3))
    variables = model.init(jax.random.key(0), x)
    out = model.apply(variables, x)
    assert out.shape == (1, 10)


def test_tsm_variants_run():
    model = MobileNetV2(num_classes=10, n_frames=4)
    x = jnp.zeros((8, 32, 32, 3))  # B=2, T=4
    variables = model.init(jax.random.key(0), x)
    fmap, logits = model.apply(variables, x, method="features_and_logits")
    assert logits.shape == (8, 10)

    rmodel = resnet50(num_classes=10, n_frames=4)
    rvars = rmodel.init(jax.random.key(1), x)
    out = rmodel.apply(rvars, x)
    assert out.shape == (8, 10)


def test_deep_and_wide_constructor_parity():
    """resnet152 / wide_resnet101 constructor parity (reference
    actnet/models/resnet.py:311-339); shape-only via eval_shape so the
    deep nets cost no compile."""
    from adafocus_tpu.models.resnet import resnet101, resnet152, \
        wide_resnet101

    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    shapes = {}
    for name, ctor in [("r101", resnet101), ("r152", resnet152),
                       ("w101", wide_resnet101)]:
        m = ctor(num_classes=7, dtype=jnp.float32)
        v = jax.eval_shape(lambda k, xx, m=m: m.init(k, xx, False),
                           jax.random.key(0), x)
        shapes[name] = v["params"]
    # depths: layer3 has 23 blocks in 101/wide101, 36 in 152
    assert "layer3_35" in shapes["r152"] and "layer3_35" not in shapes["r101"]
    assert "layer3_22" in shapes["w101"]
    # widths: wide101's inner convs are 2x; block outputs unchanged
    r, w = shapes["r101"], shapes["w101"]
    assert r["layer1_0"]["conv1"]["conv"]["kernel"].shape[-1] == 64
    assert w["layer1_0"]["conv1"]["conv"]["kernel"].shape[-1] == 128
    assert (r["layer1_0"]["conv3"]["conv"]["kernel"].shape[-1]
            == w["layer1_0"]["conv3"]["conv"]["kernel"].shape[-1] == 256)
    # fc input dim identical (512*4) for all three
    for s in shapes.values():
        assert s["fc"]["kernel"].shape == (2048, 7)
