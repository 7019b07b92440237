"""Differential tests: functional layers vs tf_keras with copied weights.

Pins the LSTM cell equations / gate order (i, f, c, o), masking semantics for
pre-padded sequences, and Dense/Embedding numerics (SURVEY.md §4 unit tests).
"""

import numpy as np
import pytest

from tpucap.models import layers as L

tf = pytest.importorskip("tensorflow")
tf_keras = pytest.importorskip("tf_keras")

B, T, E, U = 4, 7, 12, 16


@pytest.fixture(scope="module")
def keras_lstm():
    layer = tf_keras.layers.LSTM(
        U, return_sequences=True, return_state=True
    )
    layer.build((None, T, E))
    return layer


def copy_lstm_params(layer):
    kernel, recurrent, bias = [w.numpy() for w in layer.weights]
    return {
        "kernel": np.asarray(kernel),
        "recurrent": np.asarray(recurrent),
        "bias": np.asarray(bias),
    }


def test_lstm_forward_matches_keras(keras_lstm, rng):
    x = rng.normal(size=(B, T, E)).astype(np.float32)
    ref_seq, ref_h, ref_c = keras_lstm(tf.constant(x))
    p = copy_lstm_params(keras_lstm)
    seq, (h, c) = L.lstm_forward(p, x, return_sequences=True)
    np.testing.assert_allclose(np.asarray(seq), ref_seq.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(h), ref_h.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(c), ref_c.numpy(), atol=1e-5)


def test_lstm_masked_matches_keras_prepad(keras_lstm, rng):
    """Pre-padded zeros + Masking == our mask-aware scan (SURVEY §7 trap)."""
    x = rng.normal(size=(B, T, E)).astype(np.float32)
    pad_lens = [0, 2, 5, T - 1]
    mask = np.ones((B, T), bool)
    for b, n in enumerate(pad_lens):
        x[b, :n] = 0.0
        mask[b, :n] = False

    masked = tf_keras.layers.Masking(mask_value=0.0)(tf.constant(x))
    ref_seq, ref_h, ref_c = keras_lstm(masked)

    p = copy_lstm_params(keras_lstm)
    _, (h, c) = L.lstm_forward(p, x, mask=mask, return_sequences=True)
    np.testing.assert_allclose(np.asarray(h), ref_h.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(c), ref_c.numpy(), atol=1e-5)


def test_incremental_step_equals_forward(rng):
    """step-by-step decode state == one-shot scan (the O(L) redesign's basis)."""
    import jax

    p = L.init_lstm_cell(jax.random.key(0), E, U)
    x = rng.normal(size=(B, T, E)).astype(np.float32)
    _, (h_ref, c_ref) = L.lstm_forward(p, x)

    import jax.numpy as jnp

    h = jnp.zeros((B, U))
    c = jnp.zeros((B, U))
    for t in range(T):
        h, c = L.lstm_cell_step(p, x[:, t], h, c)
    np.testing.assert_allclose(np.asarray(h), np.asarray(h_ref), atol=1e-6)
    np.testing.assert_allclose(np.asarray(c), np.asarray(c_ref), atol=1e-6)


def test_dense_matches_keras(rng):
    layer = tf_keras.layers.Dense(U, activation="relu")
    layer.build((None, E))
    x = rng.normal(size=(B, E)).astype(np.float32)
    ref = layer(tf.constant(x)).numpy()
    p = {
        "kernel": layer.weights[0].numpy(),
        "bias": layer.weights[1].numpy(),
    }
    import jax

    ours = L.dense(p, x, jax.nn.relu)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-6)


def test_embedding_lookup(rng):
    import jax

    p = L.init_embedding(jax.random.key(1), 50, E)
    ids = rng.integers(0, 50, size=(B, T))
    out = L.embed(p, ids)
    assert out.shape == (B, T, E)
    np.testing.assert_allclose(
        np.asarray(out[0, 0]), np.asarray(p["table"][ids[0, 0]])
    )


def test_unit_forget_bias():
    import jax

    p = L.init_lstm_cell(jax.random.key(2), E, U)
    bias = np.asarray(p["bias"])
    np.testing.assert_array_equal(bias[:U], 0)
    np.testing.assert_array_equal(bias[U : 2 * U], 1)
    np.testing.assert_array_equal(bias[2 * U :], 0)
