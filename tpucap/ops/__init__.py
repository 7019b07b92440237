"""ops: Pallas TPU kernels + C++ host extensions.

The "native tier" (SURVEY.md §2.3) — TPU-native replacements for the
reference's in-TF-runtime C++ ops:

- tpucap.ops.jpeg       — C++ (libjpeg) multi-threaded batched JPEG decode
- tpucap.ops.preprocess — fused on-device resize + normalize (Pallas/XLA)
- tpucap.ops.pallas     — fused LSTM decode-step kernel
"""

from tpucap.ops.preprocess import (
    fused_preprocess,
    normalize_images,
    resize_nearest,
)

__all__ = ["fused_preprocess", "normalize_images", "resize_nearest"]
