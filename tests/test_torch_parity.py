"""Full-backbone forward equality against torch ground truth.

The round-trip converter tests (tests/test_utils_aux.py) only invert a
mapping written by the same author; these tests close the loop the way the
reference's weight dependency demands (actnet/models/resnet.py:10-20,
mobilenet.py:155-169): build the torch model (torchvision state-dict layout
— see tests/torch_ref_models.py; torchvision itself is not installed),
convert its random-init state dict with adafocus_tpu.utils.torch_weights,
and assert the flax backbone produces the SAME logits on the same input.
Torch's own conv/BN/maxpool kernels produce the expected values, so conv
padding, stride edges, BN epsilon, and pooling conventions are all checked
against an independent implementation.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

from adafocus_tpu.models.mobilenet import MobileNetV2
from adafocus_tpu.models.resnet import resnet18, resnet50
from adafocus_tpu.utils.torch_weights import (
    convert_mobilenet_v2,
    convert_resnet,
)
from tests.torch_ref_models import (
    torch_mobilenet_v2,
    torch_resnet18,
    torch_resnet50,
)

ATOL = 1e-4


def _randomize_bn_stats(tmodel):
    # random running stats exercise the BN stats conversion for real
    # (fresh-init stats are trivially mean=0/var=1)
    with torch.no_grad():
        for m in tmodel.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.5, 0.5)
                m.running_var.uniform_(0.5, 1.5)


def _torch_eval_logits(tmodel, x_nchw: np.ndarray) -> np.ndarray:
    tmodel.eval()
    with torch.no_grad():
        return tmodel(torch.from_numpy(x_nchw)).numpy()


def _flax_logits(fmodel, params, stats, x_nchw: np.ndarray) -> np.ndarray:
    variables = {"params": params, "batch_stats": stats}
    out = fmodel.apply(variables, jnp.asarray(x_nchw.transpose(0, 2, 3, 1)),
                       False)
    return np.asarray(out, dtype=np.float32)


@pytest.mark.parametrize("depth,make_torch,make_flax", [
    (18, torch_resnet18, resnet18),
    (50, torch_resnet50, resnet50),
])
def test_resnet_forward_matches_torch(depth, make_torch, make_flax):
    torch.manual_seed(depth)
    tmodel = make_torch(num_classes=9)
    _randomize_bn_stats(tmodel)
    params, stats = convert_resnet(tmodel.state_dict(), depth=depth)

    fmodel = make_flax(num_classes=9, dtype=jnp.float32)
    rng = np.random.RandomState(0)
    # 65x65 input: odd size stresses stem stride-2 / maxpool padding parity
    x = rng.randn(2, 3, 65, 65).astype(np.float32)
    want = _torch_eval_logits(tmodel, x)
    got = _flax_logits(fmodel, params, stats, x)
    np.testing.assert_allclose(got, want, atol=ATOL)


def test_mobilenet_v2_forward_matches_torch():
    torch.manual_seed(7)
    tmodel = torch_mobilenet_v2(num_classes=11)
    _randomize_bn_stats(tmodel)
    params, stats = convert_mobilenet_v2(tmodel.state_dict())

    fmodel = MobileNetV2(num_classes=11, dtype=jnp.float32)
    rng = np.random.RandomState(1)
    x = rng.randn(2, 3, 224, 224).astype(np.float32)
    want = _torch_eval_logits(tmodel, x)
    got = _flax_logits(fmodel, params, stats, x)
    np.testing.assert_allclose(got, want, atol=ATOL)


def _tv_to_tonylins(sd):
    """Inverse of torch_weights._tonylins_to_tv, building a synthetic
    TSM-checkpoint-layout dict from a torchvision-layout one (the layout
    the reference remaps in sthsth/ops/utils.py:239-290)."""
    inv_t1 = {"conv.0.0": "conv.0", "conv.0.1": "conv.1", "conv.1": "conv.3",
              "conv.2": "conv.4"}
    inv = {"conv.0.0": "conv.0", "conv.0.1": "conv.1", "conv.1.0": "conv.3",
           "conv.1.1": "conv.4", "conv.2": "conv.6", "conv.3": "conv.7"}
    out = {}
    for k, v in sd.items():
        nk = k
        parts = k.split(".")
        if k.startswith("features.1.conv."):
            for tv, ton in inv_t1.items():
                pre = f"features.1.{tv}."
                if k.startswith(pre):
                    nk = f"features.1.{ton}." + k[len(pre):]
                    break
        elif (k.startswith("features.") and parts[1].isdigit()
              and int(parts[1]) >= 2 and parts[2] == "conv"):
            for tv, ton in inv.items():
                pre = f"features.{parts[1]}.{tv}."
                if k.startswith(pre):
                    nk = f"features.{parts[1]}.{ton}." + k[len(pre):]
                    break
        elif k.startswith("classifier.1."):
            nk = k.replace("classifier.1.", "classifier.")
        out[nk] = v
    return out


def test_tonylins_layout_converts_identically():
    """A synthetic tonylins-layout dict (the TSM checkpoints' MobileNetV2,
    reference sthsth/models/mobilenetv2.py) must convert to the exact same
    flax tree as its torchvision-layout twin."""
    from adafocus_tpu.utils.torch_weights import _is_tonylins

    torch.manual_seed(3)
    tmodel = torch_mobilenet_v2(num_classes=5)
    sd_tv = tmodel.state_dict()
    sd_ton = _tv_to_tonylins(sd_tv)
    assert _is_tonylins(sd_ton) and not _is_tonylins(sd_tv)

    p_tv, s_tv = convert_mobilenet_v2(sd_tv)
    p_ton, s_ton = convert_mobilenet_v2(sd_ton)
    for a, b in zip(jax.tree.leaves((p_tv, s_tv)),
                    jax.tree.leaves((p_ton, s_ton))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
