"""InceptionV3 encoder (Szegedy et al. 2015), Keras-applications-compatible.

Topology mirrors keras/src/applications/inception_v3.py:139-340 statement for
statement: stem (3 convs, pool, 2 convs, pool), mixed0-2 (35x35), mixed3
(grid reduction), mixed4-7 (17x17, 7x1/1x7 factorized), mixed8 (reduction),
mixed9-10 (8x8, split 1x3/3x1 branches), global average pool -> 2048-d
(the reference's pooled feature contract, SURVEY.md §2.1 #2).

All convs are bias-free + BatchNorm(scale=False, eps=1e-3) + relu
[inception_v3.py:412-421]. Keras auto-names these layers with global
counters, so params here are keyed ``conv_{i}`` in *creation order*, which
matches the Keras model.layers order for order-based weight import
(tpucap/checkpoint/keras_import.py).

'spatial' mode returns the mixed7 map (17x17x768), the standard
Show-Attend-Tell attachment point for this encoder.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from tpucap.models.encoders.common import (
    KeyGen,
    avg_pool_same,
    batch_norm,
    conv,
    global_avg_pool,
    init_bn,
    init_conv,
    max_pool,
)

BN_EPS = 1e-3


@dataclasses.dataclass(frozen=True)
class InceptionV3:
    features: str = "pooled"  # 'pooled' (2048) | 'spatial' (17x17x768)
    input_size: int = 299
    preprocess_mode: str = "tf"

    @property
    def feature_dim(self) -> int:
        return 2048 if self.features == "pooled" else 768

    @property
    def spatial_positions(self) -> int:
        """Flattened spatial-grid length in 'spatial' mode (mixed7),
        derived from input_size through the stem/mixed3 downsampling
        chain (default 299 -> 17x17)."""
        s = (self.input_size - 3) // 2 + 1  # stem conv3/2 VALID
        s = s - 2  # conv3 VALID
        s = (s - 3) // 2 + 1  # maxpool3/2
        s = s - 2  # conv3 VALID
        s = (s - 3) // 2 + 1  # maxpool3/2
        s = (s - 3) // 2 + 1  # mixed3 stride-2
        return s * s

    def _conv_shapes(self):
        """Trace the topology once with numpy dummy params to record each
        conv's (cin, cout, kh, kw) in creation order. numpy constants (not
        jnp) so the eval_shape trace stages nothing that could leak."""
        import numpy as np

        shapes: list[tuple[int, int, int, int]] = []

        def get(cin, cout, kh, kw):
            shapes.append((cin, cout, kh, kw))
            return {
                "conv": {"kernel": np.zeros((kh, kw, cin, cout), np.float32)},
                "bn": {
                    "beta": np.zeros((cout,), np.float32),
                    "mean": np.zeros((cout,), np.float32),
                    "var": np.ones((cout,), np.float32),
                },
            }

        jax.eval_shape(
            lambda x: self._forward(x, get),
            jax.ShapeDtypeStruct(
                (1, self.input_size, self.input_size, 3), jnp.float32
            ),
        )
        return shapes

    def init(self, key):
        kg = KeyGen(key)
        store: dict = {}
        for i, (cin, cout, kh, kw) in enumerate(self._conv_shapes()):
            store[f"conv_{i}"] = {
                "conv": init_conv(kg(), kh, kw, cin, cout, use_bias=False),
                "bn": init_bn(cout, scale=False),
            }
        return store

    def apply(self, params, x):
        """x: (B, 299, 299, 3) preprocessed (tf mode: x/127.5 - 1)."""
        counter = {"i": 0}

        def get(cin, cout, kh, kw):
            name = f"conv_{counter['i']}"
            counter["i"] += 1
            return params[name]

        return self._forward(x, get)

    def _forward(self, x, get):
        def cb(x, f, kh, kw, stride=(1, 1), padding="SAME"):
            p = get(x.shape[-1], f, kh, kw)
            y = conv(p["conv"], x, stride, padding)
            if p.get("bn") is not None:  # None after fold_batch_norms
                y = batch_norm(p["bn"], y, BN_EPS)
            return jax.nn.relu(y)

        # Stem [inception_v3.py:139-146]
        x = cb(x, 32, 3, 3, (2, 2), "VALID")
        x = cb(x, 32, 3, 3, padding="VALID")
        x = cb(x, 64, 3, 3)
        x = max_pool(x, 3, 2)
        x = cb(x, 80, 1, 1, padding="VALID")
        x = cb(x, 192, 3, 3, padding="VALID")
        x = max_pool(x, 3, 2)

        # mixed0-2: 35x35 [lines 148-206]
        for pool_ch in (32, 64, 64):
            b1 = cb(x, 64, 1, 1)
            b5 = cb(x, 48, 1, 1)
            b5 = cb(b5, 64, 5, 5)
            b3 = cb(x, 64, 1, 1)
            b3 = cb(b3, 96, 3, 3)
            b3 = cb(b3, 96, 3, 3)
            bp = avg_pool_same(x, 3)
            bp = cb(bp, pool_ch, 1, 1)
            x = jnp.concatenate([b1, b5, b3, bp], axis=-1)

        # mixed3: reduction to 17x17 [lines 208-220]
        b3 = cb(x, 384, 3, 3, (2, 2), "VALID")
        bd = cb(x, 64, 1, 1)
        bd = cb(bd, 96, 3, 3)
        bd = cb(bd, 96, 3, 3, (2, 2), "VALID")
        bp = max_pool(x, 3, 2)
        x = jnp.concatenate([b3, bd, bp], axis=-1)

        # mixed4-7: 17x17 factorized 7x7 [lines 222-290]
        for ch in (128, 160, 160, 192):
            b1 = cb(x, 192, 1, 1)
            b7 = cb(x, ch, 1, 1)
            b7 = cb(b7, ch, 1, 7)
            b7 = cb(b7, 192, 7, 1)
            bd = cb(x, ch, 1, 1)
            bd = cb(bd, ch, 7, 1)
            bd = cb(bd, ch, 1, 7)
            bd = cb(bd, ch, 7, 1)
            bd = cb(bd, 192, 1, 7)
            bp = avg_pool_same(x, 3)
            bp = cb(bp, 192, 1, 1)
            x = jnp.concatenate([b1, b7, bd, bp], axis=-1)

        if self.features == "spatial":
            return x  # mixed7: (B, 17, 17, 768)

        # mixed8: reduction to 8x8 [lines 292-306]
        b3 = cb(x, 192, 1, 1)
        b3 = cb(b3, 320, 3, 3, (2, 2), "VALID")
        b7 = cb(x, 192, 1, 1)
        b7 = cb(b7, 192, 1, 7)
        b7 = cb(b7, 192, 7, 1)
        b7 = cb(b7, 192, 3, 3, (2, 2), "VALID")
        bp = max_pool(x, 3, 2)
        x = jnp.concatenate([b3, b7, bp], axis=-1)

        # mixed9-10: 8x8 [lines 308-337]
        for _ in range(2):
            b1 = cb(x, 320, 1, 1)
            b3 = cb(x, 384, 1, 1)
            b3a = cb(b3, 384, 1, 3)
            b3b = cb(b3, 384, 3, 1)
            b3 = jnp.concatenate([b3a, b3b], axis=-1)
            bd = cb(x, 448, 1, 1)
            bd = cb(bd, 384, 3, 3)
            bda = cb(bd, 384, 1, 3)
            bdb = cb(bd, 384, 3, 1)
            bd = jnp.concatenate([bda, bdb], axis=-1)
            bp = avg_pool_same(x, 3)
            bp = cb(bp, 192, 1, 1)
            x = jnp.concatenate([b1, b3, bd, bp], axis=-1)

        return global_avg_pool(x)  # (B, 2048)
