from adafocus_tpu.models.gru import GRUCell, gru_scan
from adafocus_tpu.models.mobilenet import MobileNetV2
from adafocus_tpu.models.resnet import (
    ResNet, resnet18, resnet34, resnet50, resnet101, resnet152,
    wide_resnet101,
)

__all__ = [
    "GRUCell",
    "gru_scan",
    "MobileNetV2",
    "ResNet",
    "resnet18",
    "resnet34",
    "resnet50",
    "resnet101",
    "resnet152",
    "wide_resnet101",
]
