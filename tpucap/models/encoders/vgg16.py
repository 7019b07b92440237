"""VGG16 encoder (Simonyan & Zisserman 2014), Keras-applications-compatible.

Topology mirrors keras/src/applications/vgg16.py:129-186 (5 conv blocks of
[2,2,3,3,3] SAME 3x3 convs + 2x2 maxpool, then fc1/fc2 4096). The reference
extracts the 4096-d 'fc2' activation as the image feature (include_top minus
the softmax layer, SURVEY.md §2.1 #2); 'spatial' mode returns block5_conv3's
pre-pool 14x14x512 grid for the attention decoder.

Param names match the Keras layer names 1:1 for weight import.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from tpucap.models.encoders.common import KeyGen, conv, init_conv, max_pool
from tpucap.models.layers import dense, init_dense

BLOCKS = [(64, 2, "block1"), (128, 2, "block2"), (256, 3, "block3"),
          (512, 3, "block4"), (512, 3, "block5")]


@dataclasses.dataclass(frozen=True)
class VGG16:
    features: str = "fc2"  # 'fc2' (4096) | 'pooled' (512 gap) | 'spatial'
    input_size: int = 224
    preprocess_mode: str = "caffe"

    @property
    def feature_dim(self) -> int:
        return 4096 if self.features == "fc2" else 512

    @property
    def spatial_positions(self) -> int:
        """Flattened spatial-grid length in 'spatial' mode
        (block5_conv3 sits after four stride-2 pools ->
        (input_size // 16)^2; default 224 -> 14x14)."""
        return (self.input_size // 16) ** 2

    def init(self, key):
        kg = KeyGen(key)
        params = {}
        cin = 3
        for ch, n, blk in BLOCKS:
            for i in range(n):
                params[f"{blk}_conv{i + 1}"] = init_conv(kg(), 3, 3, cin, ch)
                cin = ch
        if self.features == "fc2":
            params["fc1"] = init_dense(kg(), 7 * 7 * 512, 4096)
            params["fc2"] = init_dense(kg(), 4096, 4096)
        return params

    def apply(self, params, x):
        """x: (B, 224, 224, 3) preprocessed (caffe mode: BGR, mean-sub)."""
        for ch, n, blk in BLOCKS:
            for i in range(n):
                x = jax.nn.relu(conv(params[f"{blk}_conv{i + 1}"], x))
                if self.features == "spatial" and blk == "block5" and i == n - 1:
                    # block5_conv3 pre-pool: (B, 14, 14, 512)
                    return x
            x = max_pool(x, 2, 2)
        if self.features == "fc2":
            x = x.reshape(x.shape[0], -1)  # Keras Flatten, row-major NHWC
            x = dense(params["fc1"], x, jax.nn.relu)
            x = dense(params["fc2"], x, jax.nn.relu)
            return x
        return jnp.mean(x, axis=(1, 2))  # pooled 512
