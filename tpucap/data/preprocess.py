"""Image preprocessing with Keras-parity numerics.

Pins the SURVEY.md §2.1 #1 contracts:
- caffe mode (VGG16/ResNet-50): RGB->BGR then per-channel mean subtract
  [103.939, 116.779, 123.68], no scaling
  [keras/src/applications/imagenet_utils.py:192-226]
- tf mode (InceptionV3): x/127.5 - 1 [imagenet_utils.py:184-187]
- torch mode: x/255 then ImageNet mean/std normalize
- load_image: PIL decode + resize with NEAREST interpolation — the Keras
  ``load_img`` default [keras/src/utils/image_utils.py:200-204], a
  silent-accuracy trap if replaced with bilinear.

Host (numpy) path here; the fused on-device Pallas resize+normalize lives in
tpucap.ops (same numerics, tested against this).
"""

from __future__ import annotations

import numpy as np

CAFFE_MEAN_BGR = np.array([103.939, 116.779, 123.68], np.float32)
TORCH_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
TORCH_STD = np.array([0.229, 0.224, 0.225], np.float32)


def preprocess_input(x, mode: str = "caffe"):
    """x: float array (..., 3) RGB in [0, 255] -> model input."""
    x = np.asarray(x, np.float32)
    if mode == "caffe":
        x = x[..., ::-1]  # RGB -> BGR
        return x - CAFFE_MEAN_BGR
    if mode == "tf":
        return x / 127.5 - 1.0
    if mode == "torch":
        return (x / 255.0 - TORCH_MEAN) / TORCH_STD
    raise ValueError(f"unknown preprocess mode {mode!r}")


def load_image(
    path,
    target_size: tuple[int, int] | None = None,
    interpolation: str = "nearest",
):
    """Decode an image file to an RGB float32 array, Keras load_img-style."""
    from PIL import Image

    resample = {
        "nearest": Image.Resampling.NEAREST,
        "bilinear": Image.Resampling.BILINEAR,
        "bicubic": Image.Resampling.BICUBIC,
    }[interpolation]
    with Image.open(path) as img:
        img = img.convert("RGB")
        if target_size is not None and img.size != (
            target_size[1],
            target_size[0],
        ):
            img = img.resize((target_size[1], target_size[0]), resample)
        return np.asarray(img, np.float32)


def preprocess_batch(paths, *, size: int, mode: str) -> np.ndarray:
    """Decode+resize+normalize a list of image files -> (N, size, size, 3)."""
    out = np.empty((len(paths), size, size, 3), np.float32)
    for i, p in enumerate(paths):
        out[i] = preprocess_input(load_image(p, (size, size)), mode)
    return out
