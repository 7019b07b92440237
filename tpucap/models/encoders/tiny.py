"""Tiny CNN encoder for tests and the CPU config-1 path.

Not part of the reference surface; exists so the end-to-end pipeline (decode,
train, eval, bench plumbing) can run on synthetic fixtures without the cost
of a full pretrained-scale encoder (SURVEY.md §7 "seed-pinned from-scratch
mini-models for all tests").
"""

from __future__ import annotations

import dataclasses

import jax

from tpucap.models.encoders.common import (
    KeyGen,
    conv,
    global_avg_pool,
    init_conv,
    max_pool,
)


@dataclasses.dataclass(frozen=True)
class TinyCNN:
    features: str = "pooled"  # 'pooled' (128) | 'spatial' (4x4x128)
    input_size: int = 32
    preprocess_mode: str = "tf"
    width: int = 128

    @property
    def feature_dim(self) -> int:
        return self.width

    @property
    def spatial_positions(self) -> int:
        """Flattened spatial-grid length in 'spatial' mode: three
        stride-2 pools -> (input_size // 8)^2 (default 32 -> 4x4)."""
        return (self.input_size // 8) ** 2

    def init(self, key):
        kg = KeyGen(key)
        w = self.width
        return {
            "conv1": init_conv(kg(), 3, 3, 3, w // 4),
            "conv2": init_conv(kg(), 3, 3, w // 4, w // 2),
            "conv3": init_conv(kg(), 3, 3, w // 2, w),
        }

    def apply(self, params, x):
        x = jax.nn.relu(conv(params["conv1"], x))
        x = max_pool(x, 2, 2)
        x = jax.nn.relu(conv(params["conv2"], x))
        x = max_pool(x, 2, 2)
        x = jax.nn.relu(conv(params["conv3"], x))
        x = max_pool(x, 2, 2)
        if self.features == "spatial":
            return x  # (B, 4, 4, width)
        return global_avg_pool(x)
