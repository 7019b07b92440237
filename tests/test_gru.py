"""GRU decoder family (models/decoders/gru.py + layers.init_gru_cell).

Three contracts:
- cell numerics are Keras GRU-v2 (reset_after=True, gate order z/r/h) —
  differential against tf_keras with copied weights, unmasked AND
  pre-pad masked;
- GruMergeDecoder drives the shared decode engines token-exactly vs the
  Python oracles and through the mesh-sharded paths (dp / TP via the
  step_hidden seam);
- the pipeline trains it end-to-end (loss decreases, captions decode).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpucap.models import layers as L
from tpucap.models.decoders import GruMergeDecoder, build_decoder

B, T, E, U = 4, 7, 12, 16
FEAT = 32


class TestCellParity:
    @pytest.fixture(scope="class")
    def keras_gru(self):
        tf_keras = pytest.importorskip("tf_keras")
        layer = tf_keras.layers.GRU(
            U, return_sequences=True, return_state=True
        )
        layer.build((None, T, E))
        return layer

    @staticmethod
    def copy_params(layer):
        kernel, recurrent, bias = [w.numpy() for w in layer.weights]
        assert bias.shape == (2, 3 * U)  # reset_after=True layout
        return {
            "kernel": np.asarray(kernel),
            "recurrent": np.asarray(recurrent),
            "bias": np.asarray(bias),
        }

    def test_forward_matches_keras(self, keras_gru, rng):
        tf = pytest.importorskip("tensorflow")
        x = rng.normal(size=(B, T, E)).astype(np.float32)
        ref_seq, ref_h = keras_gru(tf.constant(x))
        p = self.copy_params(keras_gru)
        seq, h = L.gru_forward(p, x, return_sequences=True)
        np.testing.assert_allclose(
            np.asarray(seq), ref_seq.numpy(), atol=1e-5
        )
        np.testing.assert_allclose(np.asarray(h), ref_h.numpy(), atol=1e-5)

    def test_masked_matches_keras_prepad(self, keras_gru, rng):
        tf = pytest.importorskip("tensorflow")
        tf_keras = pytest.importorskip("tf_keras")
        x = rng.normal(size=(B, T, E)).astype(np.float32)
        pad_lens = [0, 2, 5, T - 1]
        mask = np.ones((B, T), bool)
        for b, n in enumerate(pad_lens):
            x[b, :n] = 0.0
            mask[b, :n] = False
        masked = tf_keras.layers.Masking(mask_value=0.0)(tf.constant(x))
        _, ref_h = keras_gru(masked)
        p = self.copy_params(keras_gru)
        _, h = L.gru_forward(p, x, mask=mask, return_sequences=True)
        np.testing.assert_allclose(np.asarray(h), ref_h.numpy(), atol=1e-5)


@pytest.fixture(scope="module")
def dec_and_params():
    dec = GruMergeDecoder(
        vocab_size=40, feature_dim=FEAT, embed_dim=16, hidden_dim=U,
        dropout_rate=0.0,
    )
    return dec, dec.init(jax.random.key(0))


@pytest.fixture(scope="module")
def feats():
    return jnp.asarray(
        np.random.default_rng(1).normal(size=(B, FEAT)).astype(np.float32)
    )


class TestDecodeEngines:
    def test_greedy_matches_oracle(self, dec_and_params, feats):
        from tpucap.decode import greedy_decode
        from tpucap.decode.oracle import greedy_oracle

        dec, params = dec_and_params
        state = dec.init_state(params, feats)
        res = greedy_decode(
            dec.step, params, state, start_id=1, end_id=2, max_len=9
        )
        ot, ol, osc = greedy_oracle(
            dec.step, params, dec.init_state(params, feats),
            start_id=1, end_id=2, max_len=9,
        )
        np.testing.assert_array_equal(np.asarray(res.tokens), ot)
        np.testing.assert_array_equal(np.asarray(res.lengths), ol)
        np.testing.assert_allclose(np.asarray(res.scores), osc, atol=1e-5)

    @pytest.mark.parametrize("k", [1, 3])
    def test_beam_matches_oracle(self, dec_and_params, feats, k):
        from tpucap.decode import beam_decode
        from tpucap.decode.oracle import beam_oracle

        dec, params = dec_and_params
        res = beam_decode(
            dec.step, params, dec.init_state(params, feats),
            start_id=1, end_id=2, max_len=9, beam_width=k, decoder=dec,
        )
        ot, ol, osc, *_ = beam_oracle(
            dec.step, params, dec.init_state(params, feats),
            start_id=1, end_id=2, max_len=9, beam_width=k,
        )
        np.testing.assert_array_equal(np.asarray(res.tokens), ot)
        np.testing.assert_array_equal(np.asarray(res.lengths), ol)
        np.testing.assert_allclose(np.asarray(res.scores), osc, atol=1e-5)

    def test_step_matches_forward_train_column(self, dec_and_params, feats):
        """Incremental step t == teacher-forced forward at column t (the
        train/decode consistency every family pins)."""
        dec, params = dec_and_params
        toks = jnp.asarray(
            np.random.default_rng(2).integers(1, 40, size=(B, 5)), jnp.int32
        )
        full = dec.forward_train(params, feats, toks)
        state = dec.init_state(params, feats)
        for t in range(5):
            logits, state = dec.step(params, state, toks[:, t])
            np.testing.assert_allclose(
                np.asarray(logits), np.asarray(full[:, t]), atol=1e-5
            )


class TestPipeline:
    def _pipe(self, toy_corpus, name="gru1"):
        from tpucap.config import (
            Config,
            DecodeConfig,
            DecoderConfig,
            EncoderConfig,
        )
        from tpucap.pipeline import CaptioningPipeline
        from tpucap.text import Tokenizer

        cfg = Config(
            encoder=EncoderConfig(name="tiny_cnn", feature_dim=FEAT),
            decoder=DecoderConfig(
                name=name, embed_dim=16, hidden_dim=32, dropout_rate=0.0
            ),
            decode=DecodeConfig(max_len=10),
        )
        pipe = CaptioningPipeline(cfg)
        tok = Tokenizer()
        tok.fit_on_texts(toy_corpus)
        pipe.tokenizer = tok
        pipe.build()
        return pipe

    @pytest.mark.parametrize("name", ["gru1", "gru2"])
    def test_build_decoder_registry(self, name):
        dec = build_decoder(name, vocab_size=10, feature_dim=8)
        assert isinstance(dec, GruMergeDecoder)
        assert dec.num_layers == (2 if name == "gru2" else 1)

    def test_fit_and_generate(self, toy_corpus, rng):
        pipe = self._pipe(toy_corpus)
        ids = [f"i{k}" for k in range(8)]
        desc = {
            i: [toy_corpus[k % len(toy_corpus)]] for k, i in enumerate(ids)
        }
        fs = {i: rng.normal(size=(FEAT,)).astype(np.float32) for i in ids}
        hist = pipe.fit(desc, fs, epochs=3, batch_size=4, log=None)
        assert hist[-1]["loss"] < hist[0]["loss"]
        f4 = np.stack([fs[i] for i in ids[:4]])
        caps = pipe.generate(f4, method="beam")
        assert len(caps) == 4 and all(isinstance(c, str) for c in caps)

    def test_dp_and_tp_match_single_device(self, toy_corpus, rng):
        pipe = self._pipe(toy_corpus)
        ids = [f"i{k}" for k in range(8)]
        desc = {
            i: [toy_corpus[k % len(toy_corpus)]] for k, i in enumerate(ids)
        }
        fs = {i: rng.normal(size=(FEAT,)).astype(np.float32) for i in ids}
        pipe.fit(desc, fs, epochs=1, batch_size=4, log=None)
        f8 = np.stack([fs[i] for i in ids])
        want = pipe.generate(f8, method="beam")
        assert pipe.generate(f8, method="beam", parallelism="dp") == want
        # TP drives the step_hidden seam with a vocab-sharded head.
        assert pipe.generate(f8, method="beam", parallelism="tp") == want
