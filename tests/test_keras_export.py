"""Keras .h5 export (checkpoint/keras_export.py): a tpucap-trained merge
decoder exported to the reference define_model topology must (a) round-trip
through the existing import path weight-identically, (b) produce the same
next-word distributions in Keras as tpucap's incremental step, and (c)
survive the full .h5 file cycle — the reverse direction of the
test_reference_model_parity gate."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpucap.checkpoint.keras_export import (
    export_h5,
    merge_decoder_to_keras,
)
from tpucap.checkpoint.keras_import import merge_decoder_params_from_keras
from tpucap.models.decoders import build_decoder
from tpucap.text import pad_sequences

tf = pytest.importorskip("tensorflow")
tf_keras = pytest.importorskip("tf_keras")

VOCAB, FEAT, EMB, HID, MAXLEN = 29, 12, 10, 16, 9


def _decoder(num_layers=1):
    dec = build_decoder(
        "lstm2" if num_layers == 2 else "lstm1",
        vocab_size=VOCAB,
        feature_dim=FEAT,
        embed_dim=EMB,
        hidden_dim=HID,
    )
    params = dec.init(jax.random.key(3))
    return dec, params


def _tree_equal(a, b):
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


@pytest.mark.parametrize("num_layers", [1, 2])
def test_export_import_round_trip(num_layers):
    dec, params = _decoder(num_layers)
    model = merge_decoder_to_keras(dec, params, max_len=MAXLEN)
    back = merge_decoder_params_from_keras(model)
    _tree_equal(params, back)


def test_exported_model_matches_tpucap_step(rng):
    dec, params = _decoder()
    model = merge_decoder_to_keras(dec, params, max_len=MAXLEN)
    feats = rng.normal(size=(3, FEAT)).astype(np.float32)
    prefixes = [[5, 7], [9], [4, 11, 2, 8]]
    padded = pad_sequences(prefixes, maxlen=MAXLEN)
    keras_probs = model.predict(
        [tf.constant(feats), tf.constant(padded.astype(np.float32))],
        verbose=0,
    )
    for b, prefix in enumerate(prefixes):
        st = dec.init_state(params, jnp.asarray(feats[b : b + 1]))
        for tok in prefix:
            logits, st = dec.step(params, st, jnp.asarray([tok]))
        ours = np.asarray(jax.nn.softmax(logits, axis=-1))[0]
        np.testing.assert_allclose(ours, keras_probs[b], atol=2e-5)


def test_h5_file_cycle(tmp_path, rng):
    dec, params = _decoder()
    path = str(tmp_path / "exported.h5")
    export_h5(dec, params, path, max_len=MAXLEN)
    loaded = tf_keras.models.load_model(path, compile=False)
    back = merge_decoder_params_from_keras(loaded)
    _tree_equal(params, back)


def test_non_merge_decoder_rejected():
    dec = build_decoder(
        "inject", vocab_size=VOCAB, feature_dim=FEAT,
        embed_dim=EMB, hidden_dim=HID,
    )
    with pytest.raises(ValueError, match="MergeDecoder"):
        merge_decoder_to_keras(dec, dec.init(jax.random.key(0)),
                               max_len=MAXLEN)


@pytest.mark.slow
def test_cli_export_round_trip(tmp_path):
    """extract -> train -> export via the CLI; the exported .h5 reloads
    in tf_keras and carries the trained decoder weights."""
    import os

    from tpucap.cli.main import main
    from tpucap.data import generate_fixture_dataset

    img_dir, token_file, train_file, _ = generate_fixture_dataset(
        tmp_path, n_images=6, image_size=32, seed=5
    )
    feats = str(tmp_path / "f.npz")
    ckpt = str(tmp_path / "ckpt")
    common = ["--encoder", "tiny_cnn", "--max-len", "12"]
    main(["extract", *common, "--images", str(img_dir), "--out", feats,
          "--batch-size", "4"])
    main(["train", *common, "--tokens", token_file, "--split", train_file,
          "--features", feats, "--checkpoint-dir", ckpt,
          "--epochs", "1", "--batch-size", "4"])
    out = str(tmp_path / "exported.h5")
    bundle = str(tmp_path / "bundle")
    main(["export", *common, "--checkpoint-dir", ckpt, "--out", out,
          "--bundle-out", bundle])
    assert os.path.exists(out)
    model = tf_keras.models.load_model(out, compile=False)
    back = merge_decoder_params_from_keras(model)
    assert back["embedding"]["table"].shape[1] == 256  # embed default
    assert os.path.exists(os.path.join(bundle, "tokenizer.json"))


def test_tensorboard_metrics_mirror(tmp_path):
    """MetricsLogger(tensorboard_dir=...) writes event files with the
    numeric fields as scalars."""
    import os

    from tpucap.utils import MetricsLogger

    tb = str(tmp_path / "tb")
    with MetricsLogger(
        str(tmp_path / "m.jsonl"), tensorboard_dir=tb
    ) as log:
        log.log({"epoch": 0, "loss": 1.5, "accuracy": 0.2, "note": "x"})
        log.log({"epoch": 1, "loss": 1.2, "accuracy": 0.4})
    events = [f for f in os.listdir(tb) if "tfevents" in f]
    assert events, "no event file written"
    import tensorflow as tf

    seen = set()
    for ev in tf.compat.v1.train.summary_iterator(
        os.path.join(tb, events[0])
    ):
        for v in ev.summary.value:
            seen.add(v.tag)
    assert {"loss", "accuracy"} <= seen
