"""pad_sequences / to_categorical with Keras-parity semantics.

The reference's training-sequence builder pads caption prefixes with
``keras.utils.pad_sequences`` whose default is **pre**-padding and
**pre**-truncation with value 0 [keras/src/utils/sequence_utils.py:12-19] —
the LSTM therefore sees leading zeros, which interacts with Embedding
mask_zero semantics. This module reproduces that exactly (differential test
in tests/test_padding.py) and additionally offers post-padding, the layout
the TPU decode engines prefer.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np


def pad_sequences(
    sequences: Sequence[Sequence[int]],
    maxlen: int | None = None,
    dtype: str = "int32",
    padding: str = "pre",
    truncating: str = "pre",
    value: float = 0.0,
) -> np.ndarray:
    """Pad each sequence to the same length (Keras-identical)."""
    if padding not in ("pre", "post"):
        raise ValueError(f"padding must be 'pre' or 'post', got {padding!r}")
    if truncating not in ("pre", "post"):
        raise ValueError(
            f"truncating must be 'pre' or 'post', got {truncating!r}"
        )

    lengths = [len(s) for s in sequences]
    if maxlen is None:
        maxlen = max(lengths) if lengths else 0

    out = np.full((len(sequences), maxlen), value, dtype=dtype)
    for i, s in enumerate(sequences):
        if not len(s):
            continue
        if truncating == "pre":
            trunc = s[-maxlen:]
        else:
            trunc = s[:maxlen]
        trunc = np.asarray(trunc, dtype=dtype)
        if padding == "post":
            out[i, : len(trunc)] = trunc
        else:
            out[i, -len(trunc) :] = trunc
    return out


def to_categorical(y, num_classes: int | None = None, dtype: str = "float32"):
    """One-hot encode integer labels (Keras-identical shape semantics)."""
    y = np.asarray(y, dtype="int64")
    input_shape = y.shape
    if input_shape and input_shape[-1] == 1 and len(input_shape) > 1:
        input_shape = tuple(input_shape[:-1])
    y = y.reshape(-1)
    if num_classes is None:
        num_classes = int(np.max(y)) + 1
    n = y.shape[0]
    categorical = np.zeros((n, num_classes), dtype=dtype)
    categorical[np.arange(n), y] = 1
    return categorical.reshape(input_shape + (num_classes,))
