"""Functional neural-net primitives with Keras-default initialization.

Pure param-pytree style (init_* returns a dict of jnp arrays; apply is a pure
function) — chosen over a module framework for the decoder stack because the
decode engines thread state through ``lax.while_loop`` and reshape it for
beam search, which is simplest with explicit pytrees.

Keras parity notes (differentially tested in tests/test_lstm_parity.py):
- Dense: glorot_uniform kernel, zeros bias [keras defaults].
- Embedding: uniform(-0.05, 0.05) ("random_uniform" Keras default).
- LSTM: kernel (in, 4*units) glorot_uniform, recurrent (units, 4*units)
  orthogonal, bias zeros with the forget-gate quarter set to 1
  (unit_forget_bias). Gate order i, f, c(g), o; recurrent_activation
  sigmoid, activation tanh [keras/src/layers/rnn/lstm.py:223-249].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# ---------------------------------------------------------------------------
# Dense


def init_dense(key, in_dim: int, out_dim: int, dtype=jnp.float32):
    kernel = jax.nn.initializers.glorot_uniform()(key, (in_dim, out_dim), dtype)
    return {"kernel": kernel, "bias": jnp.zeros((out_dim,), dtype)}


def dense(p, x, activation=None):
    if p["kernel"].dtype == jnp.int8:
        # int8 MXU path for quantized frozen encoders (VGG fc1/fc2) —
        # same recipe as encoders/common._conv_int8.
        from tpucap.models.encoders.quantize import (
            dequantize_output,
            quantize_input,
        )

        xq, sx = quantize_input(x)
        y = jnp.dot(xq, p["kernel"], preferred_element_type=jnp.int32)
        y = dequantize_output(y, p, sx, x.dtype)
        return activation(y) if activation is not None else y
    # MXU-friendly mixed precision: multiply in the activation dtype (bf16
    # when the caller runs a bf16 flow), accumulate in f32, flow on in the
    # activation dtype. Exact no-op for a pure-f32 graph.
    y = jnp.dot(
        x, p["kernel"].astype(x.dtype), preferred_element_type=jnp.float32
    ).astype(x.dtype) + p["bias"].astype(x.dtype)
    return activation(y) if activation is not None else y


# ---------------------------------------------------------------------------
# Embedding


def init_embedding(key, vocab_size: int, embed_dim: int, dtype=jnp.float32):
    table = jax.random.uniform(
        key, (vocab_size, embed_dim), dtype, minval=-0.05, maxval=0.05
    )
    return {"table": table}


def embed(p, token_ids):
    """Lookup: (...,) int -> (..., embed_dim)."""
    return jnp.take(p["table"], token_ids, axis=0)


# ---------------------------------------------------------------------------
# LSTM cell (Keras gate order/equations)


def init_lstm_cell(key, in_dim: int, units: int, dtype=jnp.float32):
    k_kernel, k_rec = jax.random.split(key)
    kernel = jax.nn.initializers.glorot_uniform()(
        k_kernel, (in_dim, 4 * units), dtype
    )
    recurrent = jax.nn.initializers.orthogonal()(
        k_rec, (units, 4 * units), dtype
    )
    # unit_forget_bias: f-gate bias = 1 (second quarter in i,f,c,o order).
    bias = jnp.concatenate(
        [
            jnp.zeros((units,), dtype),
            jnp.ones((units,), dtype),
            jnp.zeros((2 * units,), dtype),
        ]
    )
    return {"kernel": kernel, "recurrent": recurrent, "bias": bias}


def lstm_cell_step(p, x, h, c):
    """One LSTM step. x (B, in), h/c (B, units) -> (h', c').

    z = x@W + h@U + b split into gates i, f, g, o:
      i = sigmoid(z0); f = sigmoid(z1); c' = f*c + i*tanh(z2);
      h' = sigmoid(z3) * tanh(c')     [keras lstm.py:223-249]
    """
    # Gate matmuls in the activation dtype with f32 accumulation; the gate
    # nonlinearities and cell state update run in f32 for stability, then
    # cast back so a bf16 flow stays bf16 across steps.
    z = (
        jnp.dot(
            x, p["kernel"].astype(x.dtype), preferred_element_type=jnp.float32
        )
        + jnp.dot(
            h,
            p["recurrent"].astype(h.dtype),
            preferred_element_type=jnp.float32,
        )
        + p["bias"].astype(jnp.float32)
    )
    zi, zf, zg, zo = jnp.split(z, 4, axis=-1)
    i = jax.nn.sigmoid(zi)
    f = jax.nn.sigmoid(zf)
    c_new = f * c.astype(jnp.float32) + i * jnp.tanh(zg)
    h_new = jax.nn.sigmoid(zo) * jnp.tanh(c_new)
    return h_new.astype(h.dtype), c_new.astype(c.dtype)


def lstm_forward(p, xs, mask=None, h0=None, c0=None, return_sequences=False):
    """Run an LSTM over time with Keras masking semantics.

    xs: (B, T, in). mask: (B, T) bool; masked (False) steps carry state AND
    output through unchanged — matching Keras `mask_zero=True` so a model fed
    pre-padded prefixes produces the same final hidden state as the reference
    [keras RNN masking semantics; SURVEY.md §7 "Keras parity traps"].
    """
    B, T, _ = xs.shape
    units = p["recurrent"].shape[0]
    h = jnp.zeros((B, units), xs.dtype) if h0 is None else h0
    c = jnp.zeros((B, units), xs.dtype) if c0 is None else c0

    xs_t = jnp.swapaxes(xs, 0, 1)  # time-major for scan
    mask_t = (
        jnp.swapaxes(mask, 0, 1)
        if mask is not None
        else jnp.ones((T, B), bool)
    )

    def body(carry, inp):
        h, c = carry
        x, m = inp
        h2, c2 = lstm_cell_step(p, x, h, c)
        m = m[:, None]
        h = jnp.where(m, h2, h)
        c = jnp.where(m, c2, c)
        return (h, c), h

    (h, c), hs = jax.lax.scan(body, (h, c), (xs_t, mask_t))
    if return_sequences:
        return jnp.swapaxes(hs, 0, 1), (h, c)
    return h, (h, c)


def init_gru_cell(key, in_dim: int, units: int, dtype=jnp.float32):
    """Keras GRU-v2 defaults (reset_after=True): kernel glorot (in, 3U),
    recurrent orthogonal (U, 3U), bias (2, 3U) zeros — row 0 the input
    bias, row 1 the recurrent bias (kept SEPARATE because reset_after
    applies the reset gate to h@U + b_rec, not to h@U alone)."""
    k_kernel, k_rec = jax.random.split(key)
    kernel = jax.nn.initializers.glorot_uniform()(
        k_kernel, (in_dim, 3 * units), dtype
    )
    recurrent = jax.nn.initializers.orthogonal()(
        k_rec, (units, 3 * units), dtype
    )
    bias = jnp.zeros((2, 3 * units), dtype)
    return {"kernel": kernel, "recurrent": recurrent, "bias": bias}


def gru_cell_step(p, x, h):
    """One GRU step (Keras v2 semantics, reset_after=True). x (B, in),
    h (B, units) -> h'.

    Gate order z, r, hh [keras gru.py]:
      mx = x@W + b_in;  mh = h@U + b_rec   (each split into 3)
      z = sigmoid(mx_z + mh_z);  r = sigmoid(mx_r + mh_r)
      hh = tanh(mx_h + r * mh_h)           <- reset AFTER the matmul
      h' = z*h + (1-z)*hh

    Same precision policy as lstm_cell_step: matmuls in the activation
    dtype with f32 accumulation, gate math in f32, cast back.
    """
    mx = (
        jnp.dot(
            x, p["kernel"].astype(x.dtype), preferred_element_type=jnp.float32
        )
        + p["bias"][0].astype(jnp.float32)
    )
    mh = (
        jnp.dot(
            h,
            p["recurrent"].astype(h.dtype),
            preferred_element_type=jnp.float32,
        )
        + p["bias"][1].astype(jnp.float32)
    )
    mx_z, mx_r, mx_h = jnp.split(mx, 3, axis=-1)
    mh_z, mh_r, mh_h = jnp.split(mh, 3, axis=-1)
    z = jax.nn.sigmoid(mx_z + mh_z)
    r = jax.nn.sigmoid(mx_r + mh_r)
    hh = jnp.tanh(mx_h + r * mh_h)
    h_new = z * h.astype(jnp.float32) + (1.0 - z) * hh
    return h_new.astype(h.dtype)


def gru_forward(p, xs, mask=None, h0=None, return_sequences=False):
    """Run a GRU over time with Keras masking semantics (lstm_forward's
    contract: masked steps carry state AND output through unchanged)."""
    B, T, _ = xs.shape
    units = p["recurrent"].shape[0]
    h = jnp.zeros((B, units), xs.dtype) if h0 is None else h0

    xs_t = jnp.swapaxes(xs, 0, 1)
    mask_t = (
        jnp.swapaxes(mask, 0, 1)
        if mask is not None
        else jnp.ones((T, B), bool)
    )

    def body(h, inp):
        x, m = inp
        h2 = gru_cell_step(p, x, h)
        h = jnp.where(m[:, None], h2, h)
        return h, h

    h, hs = jax.lax.scan(body, h, (xs_t, mask_t))
    if return_sequences:
        return jnp.swapaxes(hs, 0, 1), h
    return h, h


# ---------------------------------------------------------------------------
# LayerNorm (transformer decoder family)


def init_layer_norm(dim: int, dtype=jnp.float32):
    return {"scale": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}


def layer_norm(p, x, eps: float = 1e-5):
    """Normalize the last axis. Statistics in f32 (bf16 mean/var loses
    ~3 decimal digits at d_model=256), output cast back to x.dtype so a
    bf16 flow stays bf16."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


# ---------------------------------------------------------------------------
# Dropout (inverted, Keras/flax-identical scaling)


def dropout(rng, x, rate: float, deterministic: bool):
    if deterministic or rate == 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, jnp.zeros_like(x))


# ---------------------------------------------------------------------------
# Multi-head attention primitives (transformer decoder family + ViT encoder)


def split_heads(x, num_heads: int):
    """(..., H) -> (..., num_heads, head_dim)."""
    return x.reshape(x.shape[:-1] + (num_heads, x.shape[-1] // num_heads))


def merge_heads(x):
    """(..., num_heads, head_dim) -> (..., H)."""
    return x.reshape(x.shape[:-2] + (x.shape[-2] * x.shape[-1],))


def sdpa(q, k, v, mask, scale: float):
    """Scaled dot-product attention, q (..., Q, h, d) over k/v (..., T, h, d).

    mask (..., Q, T) bool — True = attend; pass None for dense (all-visible)
    attention, which skips the mask select entirely. Softmax in f32 (bf16
    logits + exp underflow are the classic bf16-attention trap), output in
    q.dtype. Returns ``(ctx, w)`` with w (..., h, Q, T) float32 — callers
    that don't need the weights drop them (XLA dead-code-eliminates the
    extra output).
    """
    scores = jnp.einsum("...qhd,...thd->...hqt", q, k).astype(jnp.float32)
    scores = scores * scale
    if mask is not None:
        scores = jnp.where(mask[..., None, :, :], scores, -1e30)
    w = jax.nn.softmax(scores, axis=-1)
    ctx = jnp.einsum("...hqt,...thd->...qhd", w.astype(q.dtype), v)
    return ctx, w
