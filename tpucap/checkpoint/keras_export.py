"""Export trained tpucap merge decoders back to reference-style Keras.

The inverse of ``keras_import.merge_decoder_params_from_keras``: builds
the genre-standard `define_model` topology (SURVEY.md §2.1 #6 —
Dense image branch ⊕ Embedding→LSTM token branch → add → Dense →
softmax Dense) as a tf_keras model and loads our weights into it, so a
user migrating FROM the reference can validate a tpucap-trained model in
their existing Keras evaluation harness (or serve it there during a
cutover) — closing the migration loop in both directions
(docs/MIGRATION.md). Token-exact round-trip is pinned by
tests/test_keras_export.py against the same oracle the import path uses.

Weight layouts need no transposition in either direction: Keras stores
Conv2D kernels HWIO, Dense kernels (in, out), and LSTM weights as
[kernel (E,4U), recurrent (U,4U), bias (4U,)] with i,f,c,o gate order —
exactly tpucap's native formats (models/layers.py).
"""

from __future__ import annotations

import numpy as np


def merge_decoder_to_keras(decoder, params, *, max_len: int):
    """Build a tf_keras reference-topology model carrying ``params``.

    decoder: a ``MergeDecoder`` (1- or 2-layer). Inject and attention
    decoders have no standard Keras-2 reference topology to export to
    and are rejected.
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


def export_h5(decoder, params, path: str, *, max_len: int) -> None:
    """Write a reference-loadable .h5 full-model file (the reference's
    checkpoint artifact format — ModelCheckpoint wrote full-model h5,
    SURVEY.md §5.4)."""
    model = merge_decoder_to_keras(decoder, params, max_len=max_len)
    model.save(path, save_format="h5")
