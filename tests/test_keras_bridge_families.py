"""Keras .h5 bridge for the inject and attention decoder families
(VERDICT r2 missing #3): all four decoder families now round-trip
h5 <-> tpucap with token-exact decode.

Two directions, each with an independent oracle:
- IMPORT: a Keras model built INLINE here (auto layer names — exercises
  the topological/shape-based matching, not the canonical-name fast
  path) with Keras-random weights must produce the same next-word
  distributions and greedy captions after import.
- EXPORT: a tpucap decoder exported via keras_export must (a) round-trip
  weight-identically through the importer, (b) match tpucap's
  teacher-forced forward in Keras, and (c) survive the .h5 file cycle
  with standard layers only (no custom_objects).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpucap.checkpoint.keras_export import (
    attention_decoder_to_keras,
    export_h5,
    inject_decoder_to_keras,
)
from tpucap.checkpoint.keras_import import (
    attention_decoder_params_from_keras,
    inject_decoder_params_from_keras,
)
from tpucap.decode import greedy_decode
from tpucap.models.decoders import build_decoder
from tpucap.text import pad_sequences

tf = pytest.importorskip("tensorflow")
tf_keras = pytest.importorskip("tf_keras")

VOCAB, FEAT, EMB, HID, MAXLEN = 23, 12, 10, 16, 7
ATT, POS = 6, 5  # attention dim / spatial positions (distinct from all)
START, END = 1, 2


def _tree_equal(a, b):
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


# ---------------------------------------------------------------------------
# Inject family
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def keras_inject_model():
    """Genre-standard init-inject model, AUTO layer names (import must
    identify init_h/init_c/pre_out by topology, not by name)."""
    L = tf_keras.layers
    inputs1 = L.Input(shape=(FEAT,))
    h0 = L.Dense(HID, activation="tanh")(inputs1)
    c0 = L.Dense(HID, activation="tanh")(inputs1)
    inputs2 = L.Input(shape=(MAXLEN,))
    se = L.Embedding(VOCAB, EMB, mask_zero=True)(inputs2)
    se = L.Dropout(0.5)(se)
    x = L.LSTM(HID)(se, initial_state=[h0, c0])
    d = L.Dense(HID, activation="relu")(x)
    outputs = L.Dense(VOCAB, activation="softmax")(d)
    return tf_keras.Model(inputs=[inputs1, inputs2], outputs=outputs)


def test_inject_import_next_word_parity(keras_inject_model, rng):
    dec = build_decoder(
        "inject",
        vocab_size=VOCAB,
        feature_dim=FEAT,
        embed_dim=EMB,
        hidden_dim=HID,
    )
    params = inject_decoder_params_from_keras(keras_inject_model)
    feats = rng.normal(size=(3, FEAT)).astype(np.float32)
    prefixes = [[5, 7], [9], [4, 11, 2, 8]]
    padded = pad_sequences(prefixes, maxlen=MAXLEN)
    ref = keras_inject_model.predict(
        [tf.constant(feats), tf.constant(padded.astype(np.float32))],
        verbose=0,
    )
    for b, prefix in enumerate(prefixes):
        st = dec.init_state(params, jnp.asarray(feats[b : b + 1]))
        for tok in prefix:
            logits, st = dec.step(params, st, jnp.asarray([tok]))
        ours = np.asarray(jax.nn.softmax(logits, axis=-1))[0]
        np.testing.assert_allclose(ours, ref[b], atol=2e-5)


def test_inject_import_greedy_caption_parity(keras_inject_model, rng):
    dec = build_decoder(
        "inject",
        vocab_size=VOCAB,
        feature_dim=FEAT,
        embed_dim=EMB,
        hidden_dim=HID,
    )
    params = inject_decoder_params_from_keras(keras_inject_model)
    feats = rng.normal(size=(4, FEAT)).astype(np.float32)

    ref_tokens = []
    for b in range(4):
        seq = [START]
        for _ in range(MAXLEN):
            padded = pad_sequences([seq], maxlen=MAXLEN)
            probs = keras_inject_model.predict(
                [
                    tf.constant(feats[b : b + 1]),
                    tf.constant(padded.astype(np.float32)),
                ],
                verbose=0,
            )[0]
            probs[0] = 0.0  # same pad-id mask the engine applies
            word = int(np.argmax(probs))
            seq.append(word)
            if word == END:
                break
        ref_tokens.append(seq[1:])

    res = greedy_decode(
        dec.step,
        params,
        dec.init_state(params, jnp.asarray(feats)),
        start_id=START,
        end_id=END,
        max_len=MAXLEN,
    )
    for b, ref in enumerate(ref_tokens):
        n = int(res.lengths[b])
        assert list(np.asarray(res.tokens[b][:n])) == ref


def test_inject_export_round_trip_and_h5(tmp_path):
    dec = build_decoder(
        "inject",
        vocab_size=VOCAB,
        feature_dim=FEAT,
        embed_dim=EMB,
        hidden_dim=HID,
    )
    params = dec.init(jax.random.key(3))
    model = inject_decoder_to_keras(dec, params, max_len=MAXLEN)
    _tree_equal(params, inject_decoder_params_from_keras(model))
    path = str(tmp_path / "inject.h5")
    export_h5(dec, params, path, max_len=MAXLEN)
    loaded = tf_keras.models.load_model(path, compile=False)
    _tree_equal(params, inject_decoder_params_from_keras(loaded))


def test_inject_export_predictions_match_step(rng):
    dec = build_decoder(
        "inject",
        vocab_size=VOCAB,
        feature_dim=FEAT,
        embed_dim=EMB,
        hidden_dim=HID,
    )
    params = dec.init(jax.random.key(4))
    model = inject_decoder_to_keras(dec, params, max_len=MAXLEN)
    feats = rng.normal(size=(2, FEAT)).astype(np.float32)
    prefixes = [[3, 8, 2], [6]]
    padded = pad_sequences(prefixes, maxlen=MAXLEN)
    ref = model.predict(
        [tf.constant(feats), tf.constant(padded.astype(np.float32))],
        verbose=0,
    )
    for b, prefix in enumerate(prefixes):
        st = dec.init_state(params, jnp.asarray(feats[b : b + 1]))
        for tok in prefix:
            logits, st = dec.step(params, st, jnp.asarray([tok]))
        ours = np.asarray(jax.nn.softmax(logits, axis=-1))[0]
        np.testing.assert_allclose(ours, ref[b], atol=2e-5)


# ---------------------------------------------------------------------------
# Attention (Show-Attend-Tell) family
# ---------------------------------------------------------------------------


def _attention_decoder():
    dec = build_decoder(
        "attention",
        vocab_size=VOCAB,
        feature_dim=FEAT,
        embed_dim=EMB,
        hidden_dim=HID,
        attention_dim=ATT,
    )
    return dec, dec.init(jax.random.key(5))


@pytest.fixture(scope="module")
def keras_sat_model():
    """Show-Attend-Tell built INLINE with auto layer names and
    Keras-random weights — the import oracle (shape-based matching;
    dims chosen pairwise distinct so classification is unambiguous)."""
    L = tf_keras.layers
    feats_in = L.Input(shape=(POS, FEAT))
    toks_in = L.Input(shape=(MAXLEN,))
    att_feat = L.Dense(ATT)
    att_hidden = L.Dense(ATT)
    att_score = L.Dense(1)
    gate = L.Dense(FEAT, activation="sigmoid")
    init_h = L.Dense(HID, activation="tanh")
    init_c = L.Dense(HID, activation="tanh")
    embedding = L.Embedding(VOCAB, EMB)
    step_rnn = L.RNN(tf_keras.layers.LSTMCell(HID), return_state=True)
    pre_out = L.Dense(HID, activation="relu")
    out = L.Dense(VOCAB, activation="softmax")

    mean_feat = L.GlobalAveragePooling1D()(feats_in)
    h, c = init_h(mean_feat), init_c(mean_feat)
    pfeat = att_feat(feats_in)
    se = embedding(toks_in)
    probs = []
    for t in range(MAXLEN):
        wh = L.RepeatVector(POS)(att_hidden(h))
        e = att_score(L.Activation("tanh")(L.Add()([pfeat, wh])))
        alpha = L.Softmax(axis=1)(e)
        ctx = L.Reshape((FEAT,))(L.Dot(axes=1)([alpha, feats_in]))
        ctx = L.Multiply()([gate(h), ctx])
        x_t = L.Reshape((EMB,))(L.Cropping1D((t, MAXLEN - t - 1))(se))
        step_in = L.Reshape((1, EMB + FEAT))(L.Concatenate()([x_t, ctx]))
        _, h, c = step_rnn(step_in, initial_state=[h, c])
        merged = pre_out(L.Concatenate()([h, ctx]))
        probs.append(L.Reshape((1, VOCAB))(out(merged)))
    outputs = L.Concatenate(axis=1)(probs)
    return tf_keras.Model(inputs=[feats_in, toks_in], outputs=outputs)


def test_attention_import_teacher_forced_parity(keras_sat_model, rng):
    dec, _ = _attention_decoder()
    params = attention_decoder_params_from_keras(keras_sat_model)
    feats = rng.normal(size=(3, POS, FEAT)).astype(np.float32)
    tokens = rng.integers(1, VOCAB, size=(3, MAXLEN)).astype(np.int32)
    ref = keras_sat_model.predict(
        [tf.constant(feats), tf.constant(tokens.astype(np.float32))],
        verbose=0,
    )
    logits = dec.forward_train(
        params, jnp.asarray(feats), jnp.asarray(tokens)
    )
    ours = np.asarray(jax.nn.softmax(logits, axis=-1))
    np.testing.assert_allclose(ours, ref, atol=2e-5)


def test_attention_import_greedy_caption_parity(keras_sat_model, rng):
    """Greedy generation through the Keras stepwise graph (causal: step
    t reads tokens[:t+1] only) vs our lax.while_loop engine."""
    dec, _ = _attention_decoder()
    params = attention_decoder_params_from_keras(keras_sat_model)
    feats = rng.normal(size=(2, POS, FEAT)).astype(np.float32)

    ref_tokens = []
    for b in range(2):
        toks = np.zeros((1, MAXLEN), np.float32)
        toks[0, 0] = START
        seq = []
        for t in range(MAXLEN):
            probs = keras_sat_model.predict(
                [tf.constant(feats[b : b + 1]), tf.constant(toks)],
                verbose=0,
            )[0, t]
            probs[0] = 0.0
            word = int(np.argmax(probs))
            seq.append(word)
            if word == END or t == MAXLEN - 1:
                break
            toks[0, t + 1] = word
        ref_tokens.append(seq)

    res = greedy_decode(
        dec.step,
        params,
        dec.init_state(params, jnp.asarray(feats)),
        start_id=START,
        end_id=END,
        max_len=MAXLEN,
    )
    for b, ref in enumerate(ref_tokens):
        n = int(res.lengths[b])
        assert list(np.asarray(res.tokens[b][:n])) == ref


def test_attention_export_round_trip_and_h5(tmp_path):
    dec, params = _attention_decoder()
    model = attention_decoder_to_keras(
        dec, params, max_len=MAXLEN, positions=POS
    )
    _tree_equal(params, attention_decoder_params_from_keras(model))
    path = str(tmp_path / "sat.h5")
    export_h5(dec, params, path, max_len=MAXLEN, positions=POS)
    # Standard layers only: loads without custom_objects.
    loaded = tf_keras.models.load_model(path, compile=False)
    _tree_equal(params, attention_decoder_params_from_keras(loaded))


def test_attention_export_teacher_forced_parity(rng):
    dec, params = _attention_decoder()
    model = attention_decoder_to_keras(
        dec, params, max_len=MAXLEN, positions=POS
    )
    feats = rng.normal(size=(2, POS, FEAT)).astype(np.float32)
    tokens = rng.integers(1, VOCAB, size=(2, MAXLEN)).astype(np.int32)
    ref = model.predict(
        [tf.constant(feats), tf.constant(tokens.astype(np.float32))],
        verbose=0,
    )
    logits = dec.forward_train(
        params, jnp.asarray(feats), jnp.asarray(tokens)
    )
    ours = np.asarray(jax.nn.softmax(logits, axis=-1))
    np.testing.assert_allclose(ours, ref, atol=2e-5)


def test_attention_import_ambiguous_dims_rejected():
    """Colliding dims (H == A) make shape classification unsafe — the
    importer must refuse rather than silently misassign."""
    dec = build_decoder(
        "attention",
        vocab_size=VOCAB,
        feature_dim=FEAT,
        embed_dim=EMB,
        hidden_dim=HID,
        attention_dim=HID,  # att_hidden (H,A) == a (H,H) collision
    )
    params = dec.init(jax.random.key(6))
    model = attention_decoder_to_keras(
        dec, params, max_len=3, positions=POS
    )
    # Strip the canonical names so the shape path must run.
    for layer in model.layers:
        layer._name = f"anon_{id(layer)}"
    with pytest.raises(ValueError, match="ambiguous"):
        attention_decoder_params_from_keras(model)


# ---------------------------------------------------------------------------
# GRU merge family (beyond-parity zoo member — same bridge guarantees)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def keras_gru_model():
    """Merge-topology GRU model, AUTO layer names (topology/shape-based
    matching, like the other import fixtures)."""
    L = tf_keras.layers
    inputs1 = L.Input(shape=(FEAT,))
    fe = L.Dropout(0.5)(inputs1)
    fe = L.Dense(HID, activation="relu")(fe)
    inputs2 = L.Input(shape=(MAXLEN,))
    se = L.Embedding(VOCAB, EMB, mask_zero=True)(inputs2)
    se = L.Dropout(0.5)(se)
    se = L.GRU(HID)(se)
    d = L.add([fe, se])
    d = L.Dense(HID, activation="relu")(d)
    outputs = L.Dense(VOCAB, activation="softmax")(d)
    return tf_keras.Model(inputs=[inputs1, inputs2], outputs=outputs)


def test_gru_import_next_word_parity(keras_gru_model, rng):
    from tpucap.checkpoint.keras_import import (
        gru_merge_decoder_params_from_keras,
    )

    dec = build_decoder(
        "gru1", vocab_size=VOCAB, feature_dim=FEAT,
        embed_dim=EMB, hidden_dim=HID,
    )
    params = gru_merge_decoder_params_from_keras(keras_gru_model)
    feats = rng.normal(size=(3, FEAT)).astype(np.float32)
    prefixes = [[5, 7], [9], [4, 11, 2, 8]]
    padded = pad_sequences(prefixes, maxlen=MAXLEN)
    ref = keras_gru_model.predict(
        [tf.constant(feats), tf.constant(padded.astype(np.float32))],
        verbose=0,
    )
    for b, prefix in enumerate(prefixes):
        st = dec.init_state(params, jnp.asarray(feats[b : b + 1]))
        for tok in prefix:
            logits, st = dec.step(params, st, jnp.asarray([tok]))
        ours = np.asarray(jax.nn.softmax(logits, axis=-1))[0]
        np.testing.assert_allclose(ours, ref[b], atol=2e-5)


def test_gru_import_greedy_caption_parity(keras_gru_model, rng):
    from tpucap.checkpoint.keras_import import (
        gru_merge_decoder_params_from_keras,
    )

    dec = build_decoder(
        "gru1", vocab_size=VOCAB, feature_dim=FEAT,
        embed_dim=EMB, hidden_dim=HID,
    )
    params = gru_merge_decoder_params_from_keras(keras_gru_model)
    feats = rng.normal(size=(4, FEAT)).astype(np.float32)

    ref_tokens = []
    for b in range(4):
        seq = [START]
        for _ in range(MAXLEN):
            padded = pad_sequences([seq], maxlen=MAXLEN)
            probs = keras_gru_model.predict(
                [
                    tf.constant(feats[b : b + 1]),
                    tf.constant(padded.astype(np.float32)),
                ],
                verbose=0,
            )[0]
            probs[0] = 0.0
            word = int(np.argmax(probs))
            seq.append(word)
            if word == END:
                break
        ref_tokens.append(seq[1:])

    res = greedy_decode(
        dec.step,
        params,
        dec.init_state(params, jnp.asarray(feats)),
        start_id=START,
        end_id=END,
        max_len=MAXLEN,
    )
    for b, ref in enumerate(ref_tokens):
        n = int(res.lengths[b])
        assert list(np.asarray(res.tokens[b][:n])) == ref


def test_gru_export_round_trip_and_h5(tmp_path):
    from tpucap.checkpoint.keras_export import gru_merge_decoder_to_keras
    from tpucap.checkpoint.keras_import import (
        gru_merge_decoder_params_from_keras,
    )

    dec = build_decoder(
        "gru2", vocab_size=VOCAB, feature_dim=FEAT,
        embed_dim=EMB, hidden_dim=HID,
    )
    params = dec.init(jax.random.key(3))
    model = gru_merge_decoder_to_keras(dec, params, max_len=MAXLEN)
    _tree_equal(params, gru_merge_decoder_params_from_keras(model))
    path = str(tmp_path / "gru.h5")
    export_h5(dec, params, path, max_len=MAXLEN)
    loaded = tf_keras.models.load_model(path, compile=False)
    _tree_equal(params, gru_merge_decoder_params_from_keras(loaded))
