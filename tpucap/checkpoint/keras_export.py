"""Export trained tpucap decoders back to reference-style Keras.

The inverse of the ``keras_import`` decoder importers: builds the
genre-standard Keras-2 topology for each decoder family as a tf_keras
model and loads our weights into it, so a user migrating FROM the
reference can validate a tpucap-trained model in their existing Keras
evaluation harness (or serve it there during a cutover) — closing the
migration loop in both directions (docs/MIGRATION.md). Token-exact
round-trips are pinned by tests/test_keras_export.py against the same
oracles the import paths use.

Topologies (all five decoder zoo families round-trip):
- merge (1/2-layer): the reference `define_model` (SURVEY.md §2.1 #6).
- gru merge: the same topology over GRU(h) (beyond-parity family;
  reset_after=True weights are layout-identical to ours).
- inject: the genre's init-inject variant (SURVEY.md §2.1 #7) — image
  feature → Dense(tanh) ×2 → LSTM ``initial_state``.
- attention: Show-Attend-Tell (SURVEY.md §2.1 #8) unrolled over
  ``max_len`` steps with shared layers — additive attention MLP +
  sigmoid gate, built ONLY from serialization-safe standard layers
  (RepeatVector for the broadcast add, Cropping1D for the timestep
  slice, Dot for the context sum; no Lambda), so the .h5 loads
  anywhere without custom_objects.

Weight layouts need no transposition in either direction: Keras stores
Conv2D kernels HWIO, Dense kernels (in, out), and LSTM weights as
[kernel (E,4U), recurrent (U,4U), bias (4U,)] with i,f,c,o gate order —
exactly tpucap's native formats (models/layers.py).
"""

from __future__ import annotations

import numpy as np


def merge_decoder_to_keras(decoder, params, *, max_len: int):
    """Build a tf_keras reference-topology model carrying ``params``.

    decoder: a ``MergeDecoder`` (1- or 2-layer).
    max_len: the padded caption length the Keras model's token input
    expects (the reference bakes it into the Input shape).
    """
    import tf_keras

    if type(decoder).__name__ != "MergeDecoder":
        raise ValueError(
            "only MergeDecoder exports to the reference define_model "
            f"topology; got {type(decoder).__name__}"
        )
    L = tf_keras.layers
    vocab = decoder.vocab_size
    feat = decoder.feature_dim
    emb = decoder.embed_dim
    hid = decoder.hidden_dim
    n_layers = len(params["cells"])

    inputs1 = L.Input(shape=(feat,), name="image_features")
    fe1 = L.Dropout(decoder.dropout_rate)(inputs1)
    fe2 = L.Dense(hid, activation="relu", name="feat_proj")(fe1)
    inputs2 = L.Input(shape=(max_len,), name="token_ids")
    se = L.Embedding(vocab, emb, mask_zero=True, name="embedding")(inputs2)
    se = L.Dropout(decoder.dropout_rate)(se)
    for i in range(n_layers):
        last = i == n_layers - 1
        se = L.LSTM(
            hid, return_sequences=not last, name=f"lstm_{i}"
        )(se)
    d1 = L.add([fe2, se])
    d2 = L.Dense(hid, activation="relu", name="pre_out")(d1)
    outputs = L.Dense(vocab, activation="softmax", name="out")(d2)
    model = tf_keras.Model(inputs=[inputs1, inputs2], outputs=outputs)

    def dense_w(p):
        return [np.asarray(p["kernel"]), np.asarray(p["bias"])]

    model.get_layer("feat_proj").set_weights(dense_w(params["feat_proj"]))
    model.get_layer("embedding").set_weights(
        [np.asarray(params["embedding"]["table"])]
    )
    for i, cell in enumerate(params["cells"]):
        model.get_layer(f"lstm_{i}").set_weights(
            [
                np.asarray(cell["kernel"]),
                np.asarray(cell["recurrent"]),
                np.asarray(cell["bias"]),
            ]
        )
    model.get_layer("pre_out").set_weights(dense_w(params["pre_out"]))
    model.get_layer("out").set_weights(dense_w(params["out"]))
    return model


def gru_merge_decoder_to_keras(decoder, params, *, max_len: int):
    """Build a tf_keras merge-topology GRU model carrying ``params`` —
    the GRU analog of :func:`merge_decoder_to_keras` (L.GRU defaults to
    reset_after=True, whose [kernel (E,3U), recurrent (U,3U),
    bias (2,3U)] weights are exactly tpucap's native layout)."""
    import tf_keras

    if type(decoder).__name__ != "GruMergeDecoder":
        raise ValueError(
            "gru export needs a GruMergeDecoder; got "
            f"{type(decoder).__name__}"
        )
    L = tf_keras.layers
    vocab = decoder.vocab_size
    feat = decoder.feature_dim
    emb = decoder.embed_dim
    hid = decoder.hidden_dim
    n_layers = len(params["cells"])

    inputs1 = L.Input(shape=(feat,), name="image_features")
    fe1 = L.Dropout(decoder.dropout_rate)(inputs1)
    fe2 = L.Dense(hid, activation="relu", name="feat_proj")(fe1)
    inputs2 = L.Input(shape=(max_len,), name="token_ids")
    se = L.Embedding(vocab, emb, mask_zero=True, name="embedding")(inputs2)
    se = L.Dropout(decoder.dropout_rate)(se)
    for i in range(n_layers):
        last = i == n_layers - 1
        se = L.GRU(hid, return_sequences=not last, name=f"gru_{i}")(se)
    d1 = L.add([fe2, se])
    d2 = L.Dense(hid, activation="relu", name="pre_out")(d1)
    outputs = L.Dense(vocab, activation="softmax", name="out")(d2)
    model = tf_keras.Model(inputs=[inputs1, inputs2], outputs=outputs)

    def dense_w(p):
        return [np.asarray(p["kernel"]), np.asarray(p["bias"])]

    model.get_layer("feat_proj").set_weights(dense_w(params["feat_proj"]))
    model.get_layer("embedding").set_weights(
        [np.asarray(params["embedding"]["table"])]
    )
    for i, cell in enumerate(params["cells"]):
        model.get_layer(f"gru_{i}").set_weights(
            [
                np.asarray(cell["kernel"]),
                np.asarray(cell["recurrent"]),
                np.asarray(cell["bias"]),
            ]
        )
    model.get_layer("pre_out").set_weights(dense_w(params["pre_out"]))
    model.get_layer("out").set_weights(dense_w(params["out"]))
    return model


def inject_decoder_to_keras(decoder, params, *, max_len: int):
    """Build a tf_keras init-inject caption model carrying ``params``.

    Topology (SURVEY.md §2.1 #7 — the genre's init-inject variant):
    image feature → Dense(hidden, tanh) ×2 ('init_h'/'init_c') feed the
    LSTM stack's ``initial_state``; tokens → Embedding(mask_zero) →
    LSTM stack → Dense(hidden, relu) → Dense(vocab, softmax). Every
    layer of a 2-layer stack receives the same injected state, matching
    ``InjectDecoder.init_state``.
    """
    import tf_keras

    if type(decoder).__name__ != "InjectDecoder":
        raise ValueError(
            "inject export needs an InjectDecoder; got "
            f"{type(decoder).__name__}"
        )
    L = tf_keras.layers
    vocab = decoder.vocab_size
    feat = decoder.feature_dim
    emb = decoder.embed_dim
    hid = decoder.hidden_dim
    n_layers = len(params["cells"])

    inputs1 = L.Input(shape=(feat,), name="image_features")
    fe = L.Dropout(decoder.dropout_rate)(inputs1)
    h0 = L.Dense(hid, activation="tanh", name="init_h")(fe)
    c0 = L.Dense(hid, activation="tanh", name="init_c")(fe)
    inputs2 = L.Input(shape=(max_len,), name="token_ids")
    se = L.Embedding(vocab, emb, mask_zero=True, name="embedding")(inputs2)
    se = L.Dropout(decoder.dropout_rate)(se)
    for i in range(n_layers):
        last = i == n_layers - 1
        se = L.LSTM(
            hid, return_sequences=not last, name=f"lstm_{i}"
        )(se, initial_state=[h0, c0])
    d = L.Dense(hid, activation="relu", name="pre_out")(se)
    outputs = L.Dense(vocab, activation="softmax", name="out")(d)
    model = tf_keras.Model(inputs=[inputs1, inputs2], outputs=outputs)

    def dense_w(p):
        return [np.asarray(p["kernel"]), np.asarray(p["bias"])]

    model.get_layer("init_h").set_weights(dense_w(params["init_h"]))
    model.get_layer("init_c").set_weights(dense_w(params["init_c"]))
    model.get_layer("embedding").set_weights(
        [np.asarray(params["embedding"]["table"])]
    )
    for i, cell in enumerate(params["cells"]):
        model.get_layer(f"lstm_{i}").set_weights(
            [
                np.asarray(cell["kernel"]),
                np.asarray(cell["recurrent"]),
                np.asarray(cell["bias"]),
            ]
        )
    model.get_layer("pre_out").set_weights(dense_w(params["pre_out"]))
    model.get_layer("out").set_weights(dense_w(params["out"]))
    return model


def attention_decoder_to_keras(
    decoder, params, *, max_len: int, positions: int = 196
):
    """Build a tf_keras Show-Attend-Tell model carrying ``params``.

    Teacher-forced topology over a fixed ``positions``-cell spatial
    grid, unrolled ``max_len`` steps with SHARED layers (one set of
    weights, ``max_len`` call nodes). Per step t (mirroring
    ``AttentionDecoder._step_full`` — models/decoders/attention.py):

        wh     = att_hidden(h)                    (B, A)
        e      = att_score(tanh(att_feat(F) + wh))  additive MLP
        alpha  = softmax_L(e)                     (B, L)
        ctx    = sum_l alpha_l F_l                (B, D)   [Dot axes=1]
        ctx    = sigmoid(gate(h)) * ctx           (gated context)
        h, c   = LSTMCell([embed(w_t); ctx], h, c)
        prob_t = softmax(out(pre_out([h; ctx])))

    Broadcast/slice/reduce are expressed with serialization-safe
    standard layers (RepeatVector / Cropping1D / Dot / Multiply), so
    the saved .h5 loads without custom_objects. No mask: all
    ``max_len`` steps run, exactly like ``forward_train``'s scan.
    Outputs (B, max_len, vocab) stepwise probabilities.
    """
    import tf_keras

    if type(decoder).__name__ != "AttentionDecoder":
        raise ValueError(
            "attention export needs an AttentionDecoder; got "
            f"{type(decoder).__name__}"
        )
    L = tf_keras.layers
    vocab = decoder.vocab_size
    D = decoder.feature_dim
    E = decoder.embed_dim
    H = decoder.hidden_dim
    A = decoder.attention_dim

    feats_in = L.Input(shape=(positions, D), name="image_features")
    toks_in = L.Input(shape=(max_len,), name="token_ids")

    # Shared layers (weight names match the tpucap param keys).
    att_feat = L.Dense(A, name="att_feat")
    att_hidden = L.Dense(A, name="att_hidden")
    att_score = L.Dense(1, name="att_score")
    gate = L.Dense(D, activation="sigmoid", name="gate")
    init_h = L.Dense(H, activation="tanh", name="init_h")
    init_c = L.Dense(H, activation="tanh", name="init_c")
    embedding = L.Embedding(vocab, E, name="embedding")
    step_rnn = L.RNN(
        tf_keras.layers.LSTMCell(H), return_state=True, name="lstm"
    )
    pre_out = L.Dense(H, activation="relu", name="pre_out")
    out = L.Dense(vocab, activation="softmax", name="out")

    mean_feat = L.GlobalAveragePooling1D(name="mean_feat")(feats_in)
    h, c = init_h(mean_feat), init_c(mean_feat)
    pfeat = att_feat(feats_in)  # (B, L, A), hoisted out of the loop
    se = embedding(toks_in)  # (B, max_len, E)

    step_probs = []
    for t in range(max_len):
        wh = L.RepeatVector(positions)(att_hidden(h))  # (B, L, A)
        e = att_score(L.Activation("tanh")(L.Add()([pfeat, wh])))
        alpha = L.Softmax(axis=1)(e)  # (B, L, 1)
        ctx = L.Reshape((D,))(L.Dot(axes=1)([alpha, feats_in]))
        ctx = L.Multiply()([gate(h), ctx])
        x_t = L.Reshape((E,))(
            L.Cropping1D((t, max_len - t - 1))(se)
        )
        step_in = L.Reshape((1, E + D))(L.Concatenate()([x_t, ctx]))
        _, h, c = step_rnn(step_in, initial_state=[h, c])
        merged = pre_out(L.Concatenate()([h, ctx]))
        step_probs.append(L.Reshape((1, vocab))(out(merged)))
    outputs = (
        L.Concatenate(axis=1)(step_probs)
        if max_len > 1
        else step_probs[0]
    )
    model = tf_keras.Model(inputs=[feats_in, toks_in], outputs=outputs)

    def dense_w(p):
        return [np.asarray(p["kernel"]), np.asarray(p["bias"])]

    for name in (
        "att_feat",
        "att_hidden",
        "att_score",
        "gate",
        "init_h",
        "init_c",
        "pre_out",
        "out",
    ):
        model.get_layer(name).set_weights(dense_w(params[name]))
    model.get_layer("embedding").set_weights(
        [np.asarray(params["embedding"]["table"])]
    )
    cell = params["cell"]
    model.get_layer("lstm").set_weights(
        [
            np.asarray(cell["kernel"]),
            np.asarray(cell["recurrent"]),
            np.asarray(cell["bias"]),
        ]
    )
    return model


def decoder_to_keras(decoder, params, *, max_len: int, **kwargs):
    """Dispatch to the family-specific builder (all five zoo families
    with a Keras topology; the transformer has none by design)."""
    builders = {
        "MergeDecoder": merge_decoder_to_keras,
        "GruMergeDecoder": gru_merge_decoder_to_keras,
        "InjectDecoder": inject_decoder_to_keras,
        "AttentionDecoder": attention_decoder_to_keras,
    }
    name = type(decoder).__name__
    if name not in builders:
        raise ValueError(
            f"no Keras topology for {name}; have {sorted(builders)}"
        )
    return builders[name](decoder, params, max_len=max_len, **kwargs)


def export_h5(decoder, params, path: str, *, max_len: int, **kwargs) -> None:
    """Write a reference-loadable .h5 full-model file (the reference's
    checkpoint artifact format — ModelCheckpoint wrote full-model h5,
    SURVEY.md §5.4). Dispatches on the decoder family: merge/inject/
    attention all export; attention additionally takes ``positions``
    (spatial grid size, default 196)."""
    model = decoder_to_keras(decoder, params, max_len=max_len, **kwargs)
    model.save(path, save_format="h5")
