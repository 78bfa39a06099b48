"""torch -> flax weight conversion for the pretrained backbones.

The reference depends on torchvision/TSM ImageNet checkpoints
(/root/reference actnet/models/mobilenet.py:155-169, resnet.py:10-20) and
stage checkpoints from Google Drive (actnet/README.md:19-30). This module
maps those state dicts onto the flax param/batch_stats trees of
``adafocus_tpu.models.{resnet,mobilenet}`` so published weights can seed
TPU training, covering:

  * torchvision ResNet-18/34/50/101 (``conv1/bn1/layer{1..4}.{j}/fc``);
  * torchvision MobileNetV2 (``features.{0..18}/classifier.1``);
  * the tonylins MobileNetV2 layout the TSM checkpoints use — first
    normalized to torchvision naming with the same index arithmetic as the
    reference's remapper (sthsth/ops/utils.py:239-290).

Layout rules: torch conv (O, I, kh, kw) -> flax (kh, kw, I, O); depthwise
conv (O, 1, kh, kw) -> (kh, kw, 1, O); linear (O, I) -> (I, O); BatchNorm
weight/bias -> scale/bias (params), running_mean/var -> mean/var
(batch_stats). Inputs may be torch tensors or numpy arrays.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Tuple

import numpy as np

_RESNET_STAGES = {18: (2, 2, 2, 2), 34: (3, 4, 6, 3), 50: (3, 4, 6, 3),
                  101: (3, 4, 23, 3)}
_MBV2_BLOCKS = (1, 2, 3, 4, 3, 3, 1)  # n per cfg row


def _np(x) -> np.ndarray:
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x)


def _conv(w) -> np.ndarray:
    w = _np(w)
    o, i, kh, kw = w.shape
    return w.transpose(2, 3, 1, 0)  # (kh, kw, I, O)


def _convbn(sd: Mapping, conv_key: str, bn_key: str) -> Tuple[dict, dict]:
    params = {
        "conv": {"kernel": _conv(sd[f"{conv_key}.weight"])},
        "bn": {"scale": _np(sd[f"{bn_key}.weight"]),
               "bias": _np(sd[f"{bn_key}.bias"])},
    }
    stats = {
        "bn": {"mean": _np(sd[f"{bn_key}.running_mean"]),
               "var": _np(sd[f"{bn_key}.running_var"])},
    }
    return params, stats


def _dense(sd: Mapping, key: str) -> dict:
    return {"kernel": _np(sd[f"{key}.weight"]).T, "bias": _np(sd[f"{key}.bias"])}


# ---------------------------------------------------------------------------
# ResNet
# ---------------------------------------------------------------------------


def convert_resnet(
    state_dict: Mapping[str, Any], depth: int = 50, with_fc: bool = True
) -> Tuple[dict, dict]:
    """torchvision ResNet state dict -> (params, batch_stats) for
    ``adafocus_tpu.models.resnet.ResNet``."""
    sd = {k.replace("module.", ""): v for k, v in state_dict.items()}
    stages = _RESNET_STAGES[depth]
    basic = depth < 50
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    params["stem"], stats["stem"] = _convbn(sd, "conv1", "bn1")
    for stage, n_blocks in enumerate(stages):
        for j in range(n_blocks):
            name = f"layer{stage + 1}_{j}"
            src = f"layer{stage + 1}.{j}"
            p: Dict[str, Any] = {}
            s: Dict[str, Any] = {}
            n_convs = 2 if basic else 3
            for c in range(1, n_convs + 1):
                p[f"conv{c}"], s[f"conv{c}"] = _convbn(
                    sd, f"{src}.conv{c}", f"{src}.bn{c}")
            if f"{src}.downsample.0.weight" in sd:
                p["down"], s["down"] = _convbn(
                    sd, f"{src}.downsample.0", f"{src}.downsample.1")
            params[name] = p
            stats[name] = s
    if with_fc and "fc.weight" in sd:
        params["fc"] = _dense(sd, "fc")
    return params, stats


# ---------------------------------------------------------------------------
# MobileNetV2
# ---------------------------------------------------------------------------


def _is_tonylins(sd: Mapping[str, Any]) -> bool:
    """tonylins layout flattens ConvBNReLU into conv.{0..8} and names the
    head 'classifier.weight' (no dropout wrapper index)."""
    return any(k.startswith("features.1.conv.3.") for k in sd) or \
        "classifier.weight" in sd


def _tonylins_to_tv(sd: Mapping[str, Any]) -> Dict[str, Any]:
    """Normalize tonylins key layout to torchvision's (the same mapping the
    reference applies in get_mobv2_new_sd, sthsth/ops/utils.py:239-290)."""
    out = {}
    for k, v in sd.items():
        nk = k
        if k.startswith("features.1.conv."):
            # t=1 block: tonylins conv.{0,1,3,4} = dw conv, dw bn, proj conv,
            # proj bn -> torchvision conv.{0.0,0.1,1,2}
            idx = int(k.split(".")[3])
            rest = k.split(".", 4)[4]
            sub = {0: "conv.0.0", 1: "conv.0.1", 3: "conv.1", 4: "conv.2"}[idx]
            nk = f"features.1.{sub}.{rest}"
        elif k.startswith("features.") and ".conv." in k:
            parts = k.split(".")
            if parts[1].isdigit() and int(parts[1]) >= 2 and parts[2] == "conv":
                idx = int(parts[3])
                rest = ".".join(parts[4:])
                sub = {0: "conv.0.0", 1: "conv.0.1", 3: "conv.1.0",
                       4: "conv.1.1", 6: "conv.2", 7: "conv.3"}[idx]
                nk = f"features.{parts[1]}.{sub}.{rest}"
        elif k.startswith("classifier."):
            nk = k.replace("classifier.", "classifier.1.")
        out[nk] = v
    return out


def convert_mobilenet_v2(
    state_dict: Mapping[str, Any], with_classifier: bool = True
) -> Tuple[dict, dict]:
    """torchvision (or tonylins) MobileNetV2 state dict -> (params,
    batch_stats) for ``adafocus_tpu.models.mobilenet.MobileNetV2``."""
    sd = {k.replace("module.", ""): v for k, v in state_dict.items()}
    if _is_tonylins(sd):
        sd = _tonylins_to_tv(sd)
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    params["stem"], stats["stem"] = _convbn(sd, "features.0.0", "features.0.1")

    feat_idx = 1
    for i, n in enumerate(_MBV2_BLOCKS):
        for j in range(n):
            name = f"block_{i}_{j}"
            src = f"features.{feat_idx}"
            p: Dict[str, Any] = {}
            s: Dict[str, Any] = {}
            if f"{src}.conv.0.0.weight" in sd and f"{src}.conv.1.0.weight" in sd:
                # expanded block: conv.0=expand, conv.1=dw, conv.2/3=project
                p["expand"], s["expand"] = _convbn(
                    sd, f"{src}.conv.0.0", f"{src}.conv.0.1")
                p["dw"], s["dw"] = _convbn(
                    sd, f"{src}.conv.1.0", f"{src}.conv.1.1")
                p["project"], s["project"] = _convbn(
                    sd, f"{src}.conv.2", f"{src}.conv.3")
            else:
                # t=1 block: conv.0=dw, conv.1/2=project
                p["dw"], s["dw"] = _convbn(
                    sd, f"{src}.conv.0.0", f"{src}.conv.0.1")
                p["project"], s["project"] = _convbn(
                    sd, f"{src}.conv.1", f"{src}.conv.2")
            params[name] = p
            stats[name] = s
            feat_idx += 1

    params["head_conv"], stats["head_conv"] = _convbn(
        sd, f"features.{feat_idx}.0", f"features.{feat_idx}.1")
    if with_classifier and "classifier.1.weight" in sd:
        params["classifier"] = _dense(sd, "classifier.1")
    return params, stats


def convert_checkpoint_cli(argv=None) -> None:
    """CLI: convert a torch backbone checkpoint into a warm-startable
    component checkpoint.

    Usage: ``python -m adafocus_tpu.utils.torch_weights ckpt.pth out_dir
    --arch resnet50 --component focuser``. The output directory is loadable
    with ``run.warm_start=out_dir`` (only the converted component is
    grafted; everything else keeps fresh init).
    """
    import argparse

    ap = argparse.ArgumentParser(description=convert_checkpoint_cli.__doc__)
    ap.add_argument("ckpt", help="torch .pth/.pth.tar state dict")
    ap.add_argument("out_dir")
    ap.add_argument("--arch", required=True,
                    choices=["resnet18", "resnet34", "resnet50", "resnet101",
                             "mobilenet_v2"])
    ap.add_argument("--component", default=None,
                    help="GFV component name (default: focuser for resnets, "
                         "glancer for mobilenet)")
    args = ap.parse_args(argv)

    import torch

    sd = torch.load(args.ckpt, map_location="cpu", weights_only=False)
    for key in ("state_dict", "model_state_dict", "model"):
        if isinstance(sd, dict) and key in sd:
            sd = sd[key]
    if args.arch == "mobilenet_v2":
        params, stats = convert_mobilenet_v2(sd)
        component = args.component or "glancer"
    else:
        params, stats = convert_resnet(sd, depth=int(args.arch[6:]))
        component = args.component or "focuser"

    import orbax.checkpoint as ocp

    tree = {"params": {component: params}, "batch_stats": {component: stats}}
    path = f"{args.out_dir}/checkpoint"
    ocp.PyTreeCheckpointer().save(path, tree)
    n = sum(x.size for x in _flat_leaves(params))
    print(f"converted {args.arch} -> {path} (component '{component}', "
          f"{n:,} params)")


def _flat_leaves(tree):
    import jax

    return [np.asarray(x) for x in jax.tree.leaves(tree)]


def _compatible(dst, src) -> bool:
    """Same tree structure and leaf shapes."""
    import jax

    try:
        d_leaves, d_def = jax.tree.flatten(dst)
        s_leaves, s_def = jax.tree.flatten(src)
    except Exception:
        return False
    return d_def == s_def and all(
        np.shape(a) == np.shape(b) for a, b in zip(d_leaves, s_leaves)
    )


def merge_into(params: dict, batch_stats: dict, component: str,
               conv_params: dict, conv_stats: dict) -> Tuple[dict, dict]:
    """Graft converted backbone weights into a GFV train-state tree
    (component = 'glancer' | 'focuser'), keeping other components intact.
    Subtrees whose shapes don't match the fresh init (e.g. an ImageNet fc
    head at a different class count) keep their fresh init — the same
    policy as the reference's strict=False component loads."""
    p = dict(params)
    dst = dict(p.get(component, {}))
    s = dict(batch_stats or {})
    dst_s = dict(s.get(component, {}))
    for k, v in conv_params.items():
        if k not in dst or _compatible(dst[k], v):
            dst[k] = v
            if k in conv_stats:
                dst_s[k] = conv_stats[k]
    p[component] = dst
    s[component] = dst_s
    return p, s


if __name__ == "__main__":
    convert_checkpoint_cli()
