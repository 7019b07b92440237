"""CNN encoder zoo (SURVEY.md §2.2): VGG16 / InceptionV3 / ResNet-50 in
functional JAX, + a tiny CNN for tests.

Each encoder exposes:
- ``init(key)``            -> params (nested dict; names mirror the Keras
                              layer names so .h5 / live-model import is 1:1)
- ``apply(params, x)``     -> features; x is NHWC float32, already
                              preprocessed with the encoder's mode
- ``input_size``, ``feature_dim``, ``preprocess_mode``

Feature contracts (SURVEY.md §2.1 #2): VGG16 'fc2' 4096-d (include_top minus
softmax), InceptionV3/ResNet-50 global-avg-pool 2048-d, and 'spatial' mode
returning the pre-pool grid for the attention decoder (VGG16 block5_conv3
14x14x512).
"""

from tpucap.models.encoders.registry import (
    build_encoder,
    ENCODERS,
    PREPROCESS_MODES,
)
from tpucap.models.encoders.vgg16 import VGG16
from tpucap.models.encoders.resnet50 import ResNet50
from tpucap.models.encoders.inception_v3 import InceptionV3
from tpucap.models.encoders.tiny import TinyCNN
from tpucap.models.encoders.vit import ViT, vit_tiny

__all__ = [
    "build_encoder",
    "ENCODERS",
    "PREPROCESS_MODES",
    "VGG16",
    "ResNet50",
    "InceptionV3",
    "TinyCNN",
    "ViT",
    "vit_tiny",
]
