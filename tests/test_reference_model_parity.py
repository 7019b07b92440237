"""THE parity gate test: a reference-style Keras merge caption model
(`define_model` topology, SURVEY.md §2.1 #6) imported into tpucap must
produce the same next-word distributions and the same greedy captions as
Keras itself — proving the rebuild reproduces reference checkpoints'
captions (BASELINE.json north star: 'reproduce reference captions within
float tolerance')."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpucap.checkpoint.keras_import import merge_decoder_params_from_keras
from tpucap.models.decoders import build_decoder
from tpucap.text import pad_sequences

tf = pytest.importorskip("tensorflow")
tf_keras = pytest.importorskip("tf_keras")

VOCAB, FEAT, EMB, HID, MAXLEN = 33, 12, 10, 16, 9


@pytest.fixture(scope="module")
def keras_model():
    """The genre-standard reference define_model."""
    L = tf_keras.layers
    inputs1 = L.Input(shape=(FEAT,))
    fe1 = L.Dropout(0.5)(inputs1)
    fe2 = L.Dense(HID, activation="relu")(fe1)
    inputs2 = L.Input(shape=(MAXLEN,))
    se1 = L.Embedding(VOCAB, EMB, mask_zero=True)(inputs2)
    se2 = L.Dropout(0.5)(se1)
    se3 = L.LSTM(HID)(se2)
    d1 = L.add([fe2, se3])
    d2 = L.Dense(HID, activation="relu")(d1)
    outputs = L.Dense(VOCAB, activation="softmax")(d2)
    return tf_keras.Model(inputs=[inputs1, inputs2], outputs=outputs)


@pytest.fixture(scope="module")
def imported(keras_model):
    dec = build_decoder(
        "lstm1",
        vocab_size=VOCAB,
        feature_dim=FEAT,
        embed_dim=EMB,
        hidden_dim=HID,
    )
    params = merge_decoder_params_from_keras(keras_model)
    params["cells"] = [
        {k: jnp.asarray(v) for k, v in c.items()} for c in params["cells"]
    ]
    return dec, params


def test_next_word_distribution_matches(keras_model, imported, rng):
    dec, params = imported
    feats = rng.normal(size=(3, FEAT)).astype(np.float32)
    prefixes = [[5, 7], [9], [4, 11, 2, 8]]

    # Keras path: pre-padded prefix, full forward (the reference's
    # generate_desc inner call, SURVEY.md §3.3).
    padded = pad_sequences(prefixes, maxlen=MAXLEN)
    ref_probs = keras_model.predict(
        [tf.constant(feats), tf.constant(padded.astype(np.float32))],
        verbose=0,
    )

    # tpucap path: incremental steps over the unpadded prefix.
    state = dec.init_state(params, jnp.asarray(feats))
    max_steps = max(len(p) for p in prefixes)
    probs = np.zeros_like(ref_probs)
    # Run each row independently (different prefix lengths).
    for b, prefix in enumerate(prefixes):
        st = dec.init_state(params, jnp.asarray(feats[b : b + 1]))
        for tok in prefix:
            logits, st = dec.step(params, st, jnp.asarray([tok]))
        probs[b] = np.asarray(jax.nn.softmax(logits, axis=-1))[0]
    del state, max_steps

    np.testing.assert_allclose(probs, ref_probs, atol=2e-5)


def test_greedy_caption_matches_reference_loop(keras_model, imported, rng):
    """Full greedy generation: reference-style Keras host loop vs our
    lax.while_loop engine — token-exact."""
    from tpucap.decode import greedy_decode

    dec, params = imported
    feats = rng.normal(size=(4, FEAT)).astype(np.float32)
    START, END = 1, 2

    # Reference-style loop (SURVEY.md §3.3), with the same pad-id masking
    # the engine applies (a trained model never predicts index 0).
    ref_tokens = []
    for b in range(4):
        seq = [START]
        for _ in range(MAXLEN):
            padded = pad_sequences([seq], maxlen=MAXLEN)
            probs = keras_model.predict(
                [tf.constant(feats[b : b + 1]),
                 tf.constant(padded.astype(np.float32))],
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
    ours = np.asarray(res.tokens)
    lens = np.asarray(res.lengths)
    for b in range(4):
        assert list(ours[b][: lens[b]]) == ref_tokens[b], (
            b,
            list(ours[b][: lens[b]]),
            ref_tokens[b],
        )


def test_import_identifies_layers(keras_model):
    params = merge_decoder_params_from_keras(keras_model)
    assert params["feat_proj"]["kernel"].shape == (FEAT, HID)
    assert params["pre_out"]["kernel"].shape == (HID, HID)
    assert params["out"]["kernel"].shape == (HID, VOCAB)
    assert params["embedding"]["table"].shape == (VOCAB, EMB)
    assert len(params["cells"]) == 1
    assert params["cells"][0]["kernel"].shape == (EMB, 4 * HID)


def test_two_layer_import_matches(rng):
    """Config-3 topology: stacked LSTM merge model imports and matches."""
    L = tf_keras.layers
    inputs1 = L.Input(shape=(FEAT,))
    fe2 = L.Dense(HID, activation="relu")(inputs1)
    inputs2 = L.Input(shape=(MAXLEN,))
    se1 = L.Embedding(VOCAB, EMB, mask_zero=True)(inputs2)
    se2 = L.LSTM(HID, return_sequences=True)(se1)
    se3 = L.LSTM(HID)(se2)
    d1 = L.add([fe2, se3])
    d2 = L.Dense(HID, activation="relu")(d1)
    outputs = L.Dense(VOCAB, activation="softmax")(d2)
    model = tf_keras.Model(inputs=[inputs1, inputs2], outputs=outputs)

    params = merge_decoder_params_from_keras(model)
    assert len(params["cells"]) == 2
    params["cells"] = [
        {k: jnp.asarray(v) for k, v in c.items()} for c in params["cells"]
    ]
    dec = build_decoder(
        "lstm2",
        vocab_size=VOCAB,
        feature_dim=FEAT,
        embed_dim=EMB,
        hidden_dim=HID,
    )

    feats = rng.normal(size=(2, FEAT)).astype(np.float32)
    prefix = [5, 7, 9]
    padded = pad_sequences([prefix, prefix], maxlen=MAXLEN)
    ref = model.predict(
        [tf.constant(feats), tf.constant(padded.astype(np.float32))],
        verbose=0,
    )

    st = dec.init_state(params, jnp.asarray(feats))
    for tok in prefix:
        logits, st = dec.step(params, st, jnp.asarray([tok, tok]))
    ours = np.asarray(jax.nn.softmax(logits, axis=-1))
    np.testing.assert_allclose(ours, ref, atol=2e-5)


def test_h5_file_round_trip_import(keras_model, tmp_path, rng):
    """Save the reference-style model to .h5, reload, import, and verify
    next-word parity — the on-disk checkpoint path (SURVEY.md §5.4)."""
    path = str(tmp_path / "reference_model.h5")
    keras_model.save(path)
    reloaded = tf_keras.models.load_model(path, compile=False)

    params = merge_decoder_params_from_keras(reloaded)
    params["cells"] = [
        {k: jnp.asarray(v) for k, v in c.items()} for c in params["cells"]
    ]
    dec = build_decoder(
        "lstm1",
        vocab_size=VOCAB,
        feature_dim=FEAT,
        embed_dim=EMB,
        hidden_dim=HID,
    )
    feats = rng.normal(size=(2, FEAT)).astype(np.float32)
    prefix = [3, 8]
    padded = pad_sequences([prefix, prefix], maxlen=MAXLEN)
    ref = keras_model.predict(
        [tf.constant(feats), tf.constant(padded.astype(np.float32))],
        verbose=0,
    )
    st = dec.init_state(params, jnp.asarray(feats))
    for tok in prefix:
        logits, st = dec.step(params, st, jnp.asarray([tok, tok]))
    ours = np.asarray(jax.nn.softmax(logits, axis=-1))
    np.testing.assert_allclose(ours, ref, atol=2e-5)


def test_pipeline_generate_matches_reference_loop(keras_model, rng):
    """The user-facing path: CaptioningPipeline.generate (precision='f32')
    with imported reference weights produces the reference's captions."""
    from tpucap.config import (
        Config,
        DecodeConfig,
        DecoderConfig,
        EncoderConfig,
    )
    from tpucap.pipeline import CaptioningPipeline
    from tpucap.text import Tokenizer

    # Tokenizer whose ids 1/2 are the start/end sentinels used below.
    tok = Tokenizer()
    tok.word_index = {"startseq": 1, "endseq": 2}
    tok.word_index.update({f"w{i}": i for i in range(3, VOCAB)})
    tok.index_word = {v: k for k, v in tok.word_index.items()}

    cfg = Config(
        encoder=EncoderConfig(name="tiny_cnn", feature_dim=FEAT),
        decoder=DecoderConfig(embed_dim=EMB, hidden_dim=HID),
        decode=DecodeConfig(method="greedy", max_len=MAXLEN),
        vocab_size=VOCAB,
        precision="f32",
    )
    pipe = CaptioningPipeline(cfg, tokenizer=tok)
    pipe.build()
    params = merge_decoder_params_from_keras(keras_model)
    params["cells"] = [
        {k: jnp.asarray(v) for k, v in c.items()} for c in params["cells"]
    ]
    pipe.params["decoder"] = params

    feats = rng.normal(size=(3, FEAT)).astype(np.float32)
    caps = pipe.generate(feats, method="greedy")

    for b in range(3):
        seq = [1]
        words = []
        for _ in range(MAXLEN):
            padded = pad_sequences([seq], maxlen=MAXLEN)
            probs = keras_model.predict(
                [tf.constant(feats[b : b + 1]),
                 tf.constant(padded.astype(np.float32))],
                verbose=0,
            )[0]
            probs[0] = 0.0
            w = int(np.argmax(probs))
            seq.append(w)
            if w == 2:
                break
            words.append(tok.index_word.get(w, ""))
        expected = " ".join(words)
        assert caps[b] == expected, (b, caps[b], expected)
