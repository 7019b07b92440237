"""Encoder factory + per-encoder preprocessing table.

The preprocessing mode table pins the silent-accuracy traps from SURVEY.md
§2.1 #1: VGG16/ResNet-50 use caffe mode (224, RGB->BGR + mean-subtract),
InceptionV3 uses tf mode (299, x/127.5 - 1).
"""

from __future__ import annotations

from tpucap.models.encoders.inception_v3 import InceptionV3
from tpucap.models.encoders.resnet50 import ResNet50
from tpucap.models.encoders.tiny import TinyCNN
from tpucap.models.encoders.vgg16 import VGG16
from tpucap.models.encoders.vit import ViT, vit_tiny

ENCODERS = {
    "vgg16": VGG16,
    "inception_v3": InceptionV3,
    "resnet50": ResNet50,
    "tiny_cnn": TinyCNN,
    "vit_b16": ViT,  # beyond-parity transformer family (encoders/vit.py)
    "vit_tiny": vit_tiny,
}

# encoder name -> (input size, preprocess mode)
PREPROCESS_MODES = {
    "vgg16": (224, "caffe"),
    "inception_v3": (299, "tf"),
    "resnet50": (224, "caffe"),
    "tiny_cnn": (32, "tf"),
    "vit_b16": (224, "tf"),
    "vit_tiny": (32, "tf"),
}


def build_encoder(name: str, features: str = "pooled"):
    """features: 'pooled' | 'spatial' (| 'fc2' which is VGG16's pooled-vector
    contract and the default there)."""
    if name not in ENCODERS:
        raise ValueError(f"unknown encoder {name!r}; have {sorted(ENCODERS)}")
    if name == "vgg16":
        return VGG16(features="spatial" if features == "spatial" else "fc2")
    return ENCODERS[name](features=features)
