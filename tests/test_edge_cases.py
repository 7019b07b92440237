"""Edge cases and error paths."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpucap.decode import beam_decode, greedy_decode
from tpucap.models.decoders import build_decoder
from tpucap.text import Tokenizer, pad_sequences


def make_dec(vocab=9):
    dec = build_decoder(
        "lstm1", vocab_size=vocab, feature_dim=4, embed_dim=4, hidden_dim=8
    )
    return dec, dec.init(jax.random.key(0))


def test_empty_corpus_tokenizer():
    tok = Tokenizer()
    tok.fit_on_texts([])
    assert tok.word_index == {}
    assert tok.texts_to_sequences(["anything"]) == [[]]
    assert tok.vocab_size == 1  # just the reserved pad index


def test_decode_max_len_one():
    dec, params = make_dec()
    feats = jax.random.normal(jax.random.key(1), (2, 4))
    res = greedy_decode(
        dec.step, params, dec.init_state(params, feats),
        start_id=1, end_id=2, max_len=1,
    )
    assert res.tokens.shape == (2, 1)
    assert (np.asarray(res.lengths) == 1).all()


def test_beam_width_equals_vocab_minus_special():
    """Beam width close to vocab size still runs under fixed shapes."""
    dec, params = make_dec(vocab=9)
    feats = jax.random.normal(jax.random.key(2), (2, 4))
    res = beam_decode(
        dec.step, params, dec.init_state(params, feats),
        start_id=1, end_id=2, max_len=4, beam_width=7,
    )
    assert res.beam_tokens.shape == (2, 7, 4)
    assert np.isfinite(np.asarray(res.scores)).all()


def test_unknown_decoder_name():
    with pytest.raises(ValueError, match="unknown decoder"):
        build_decoder("mamba", vocab_size=10, feature_dim=4)


def test_unknown_encoder_name():
    from tpucap.models.encoders import build_encoder

    with pytest.raises(ValueError, match="unknown encoder"):
        build_encoder("vit")


def test_unknown_preprocess_mode():
    from tpucap.data.preprocess import preprocess_input

    with pytest.raises(ValueError, match="unknown preprocess mode"):
        preprocess_input(np.zeros((2, 2, 3)), "imagenet")


def test_pipeline_unknown_parallelism(tmp_path):
    from tpucap.config import Config, EncoderConfig
    from tpucap.pipeline import CaptioningPipeline

    cfg = Config(encoder=EncoderConfig(name="tiny_cnn", feature_dim=128))
    pipe = CaptioningPipeline(cfg)
    pipe.tokenizer = Tokenizer()
    pipe.tokenizer.fit_on_texts(["startseq a endseq"])
    with pytest.raises(ValueError, match="unknown parallelism"):
        pipe.fit(
            {"x": ["startseq a endseq"]},
            {"x": np.zeros((128,), np.float32)},
            epochs=1,
            parallelism="pipeline",
            log=None,
        )


def test_tp_vocab_divisibility_error():
    import optax

    from tpucap.core.mesh import Mesh
    from tpucap.parallel.tp import make_tp_train_step

    dec, params = make_dec(vocab=9)  # not divisible by 8
    mesh = Mesh(np.asarray(jax.devices()), ("model",))
    with pytest.raises(ValueError, match="divisible"):
        make_tp_train_step(dec, optax.sgd(0.1), mesh)


def test_pad_sequences_rejects_bad_mode():
    with pytest.raises(ValueError):
        pad_sequences([[1]], maxlen=2, padding="sideways")
    with pytest.raises(ValueError):
        pad_sequences([[1]], maxlen=2, truncating="sideways")


def test_single_image_batch():
    """Batch size 1 through greedy and beam (no degenerate shapes)."""
    dec, params = make_dec()
    feats = jax.random.normal(jax.random.key(3), (1, 4))
    g = greedy_decode(
        dec.step, params, dec.init_state(params, feats),
        start_id=1, end_id=2, max_len=5,
    )
    b = beam_decode(
        dec.step, params, dec.init_state(params, feats),
        start_id=1, end_id=2, max_len=5, beam_width=3,
    )
    assert g.tokens.shape == (1, 5)
    assert b.tokens.shape == (1, 5)
