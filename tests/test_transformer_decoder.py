"""Transformer decoder family (models/decoders/transformer.py).

The engines' token-exact oracle contracts are covered by the DECODERS
parameterization in tests/test_decode.py; this file tests what is unique
to the family: the incremental KV-cache path vs the full teacher-forced
forward, per-lane positions under staggered continuous admission, the
beam-shared cross-attention memory, and the pipeline/config wiring.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpucap.config import Config, DecodeConfig, DecoderConfig, EncoderConfig, TrainConfig
from tpucap.decode import beam_decode, greedy_decode
from tpucap.decode.continuous import ContinuousDecodeEngine
from tpucap.models.decoders import TransformerDecoder, build_decoder
from tpucap.pipeline import CaptioningPipeline

VOCAB = 23
FEAT = 11
START, END = 1, 2
B = 4


def make(**kw):
    cfg = dict(
        vocab_size=VOCAB,
        feature_dim=FEAT,
        hidden_dim=16,
        num_layers=2,
        num_heads=4,
        mlp_dim=32,
        max_positions=12,
        dropout_rate=0.0,
    )
    cfg.update(kw)
    dec = TransformerDecoder(**cfg)
    return dec, dec.init(jax.random.key(0))


@pytest.mark.parametrize("spatial", [False, True])
def test_incremental_step_matches_full_forward(spatial):
    """KV-cache stepping over w0..wT must reproduce the teacher-forced
    logits column-for-column (causal attention at step t sees exactly
    positions <= t either way)."""
    dec, params = make()
    key = jax.random.key(3)
    shape = (B, 9, FEAT) if spatial else (B, FEAT)
    feats = jax.random.normal(key, shape)
    T = 7
    tokens = jax.random.randint(jax.random.key(4), (B, T), 0, VOCAB)

    full = dec.forward_train(params, feats, tokens)  # (B, T, V)

    state = dec.init_state(params, feats)
    inc = []
    for t in range(T):
        logits, state = dec.step(params, state, tokens[:, t])
        inc.append(logits)
    inc = jnp.stack(inc, axis=1)

    np.testing.assert_allclose(
        np.asarray(inc), np.asarray(full), atol=2e-5, rtol=1e-5
    )


def test_staggered_admission_per_lane_positions():
    """Continuous engine with lanes admitted at different ticks: each
    lane's caption must equal its solo greedy decode — the per-row
    ``pos``/KV-cache writes are what make lanes at different generation
    depths coexist in one state."""
    dec, params = make()
    feats = np.asarray(
        jax.random.normal(jax.random.key(9), (3, FEAT)), np.float32
    )
    ref = greedy_decode(
        dec.step,
        params,
        dec.init_state(params, jnp.asarray(feats)),
        start_id=START,
        end_id=END,
        max_len=10,
    )

    eng = ContinuousDecodeEngine(
        dec, params, slots=4, start_id=START, end_id=END, max_len=10,
        feature_shape=(FEAT,),
    )
    st = eng.init_state()
    idx, f = eng.pad_admission([0, 1], [feats[0], feats[1]])
    st = eng.admit(st, idx, f)
    st = eng.tick(st, 4)  # lanes 0/1 are 4 tokens deep ...
    idx, f = eng.pad_admission([2], [feats[2]])
    st = eng.admit(st, idx, f)  # ... when lane 2 starts at pos 0
    st = eng.tick(st, 10)
    (tokens, lengths, _), _ = eng.collect(st, jnp.asarray([0, 1, 2, 0]))

    np.testing.assert_array_equal(
        np.asarray(tokens)[:3], np.asarray(ref.tokens)
    )
    np.testing.assert_array_equal(
        np.asarray(lengths)[:3], np.asarray(ref.lengths)
    )


def test_beam_shared_memory_matches_tiled():
    """beam_shared_keys keeps one cross-attention K/V copy per image; the
    result must be identical to the naively tiled beam."""
    dec, params = make()
    feats = jax.random.normal(jax.random.key(7), (B, 5, FEAT))
    kw = dict(start_id=START, end_id=END, max_len=10, beam_width=3)
    ref = beam_decode(
        dec.step, params, dec.init_state(params, feats), **kw
    )
    shared = beam_decode(
        dec.step, params, dec.init_state(params, feats), decoder=dec, **kw
    )
    np.testing.assert_array_equal(
        np.asarray(ref.tokens), np.asarray(shared.tokens)
    )
    np.testing.assert_allclose(
        np.asarray(ref.scores), np.asarray(shared.scores), atol=1e-5
    )


def test_dropout_rngs_change_train_logits_only():
    dec, params = make(dropout_rate=0.3)
    feats = jax.random.normal(jax.random.key(5), (B, FEAT))
    tokens = jax.random.randint(jax.random.key(6), (B, 6), 0, VOCAB)
    det = dec.forward_train(params, feats, tokens, deterministic=True)
    a = dec.forward_train(
        params, feats, tokens, rng=jax.random.key(1), deterministic=False
    )
    b = dec.forward_train(
        params, feats, tokens, rng=jax.random.key(2), deterministic=False
    )
    assert not np.allclose(np.asarray(a), np.asarray(b))
    # Same rng is reproducible; deterministic path ignores rng entirely.
    a2 = dec.forward_train(
        params, feats, tokens, rng=jax.random.key(1), deterministic=False
    )
    np.testing.assert_array_equal(np.asarray(a), np.asarray(a2))
    det2 = dec.forward_train(
        params, feats, tokens, rng=jax.random.key(1), deterministic=True
    )
    np.testing.assert_array_equal(np.asarray(det), np.asarray(det2))


def test_capacity_validation():
    dec, params = make(max_positions=6)
    feats = jax.random.normal(jax.random.key(0), (B, FEAT))
    tokens = jnp.zeros((B, 7), jnp.int32)
    with pytest.raises(ValueError, match="max_positions"):
        dec.forward_train(params, feats, tokens)
    with pytest.raises(ValueError, match="max_positions"):
        CaptioningPipeline(
            Config(
                encoder=EncoderConfig(name="tiny_cnn", feature_dim=128),
                decoder=DecoderConfig(name="transformer", max_positions=8),
                decode=DecodeConfig(max_len=12),
            )
        ).build()
    with pytest.raises(ValueError, match="divisible"):
        build_decoder(
            "transformer", vocab_size=8, feature_dim=4,
            hidden_dim=10, num_heads=4,
        )


def test_continuous_beam_staggered_admission():
    """ContinuousBeamEngine with the transformer: a group admitted into a
    recycled slot mid-flight produces the identical beams — the absolute-
    position KV cache resets cleanly on admission."""
    from tpucap.decode.continuous_beam import ContinuousBeamEngine

    dec, params = make()
    feats = np.asarray(
        jax.random.normal(jax.random.key(11), (2, FEAT)), np.float32
    )
    ref = beam_decode(
        dec.step,
        params,
        dec.init_state(params, jnp.asarray(feats[1:2])),
        start_id=START,
        end_id=END,
        max_len=10,
        beam_width=3,
        decoder=dec,
    )
    eng = ContinuousBeamEngine(
        dec, params, slots=1, beam_width=3, start_id=START, end_id=END,
        max_len=10, feature_shape=(FEAT,),
    )
    st = eng.init_state()
    idx, f = eng.pad_admission([0], [feats[0]])
    st = eng.admit(st, idx, f)
    st = eng.tick(st, 5)
    idx, f = eng.pad_admission([0], [feats[1]])
    st = eng.admit(st, idx, f)
    st = eng.tick(st, 10)
    (tokens, lengths, scores), _ = eng.collect(st, jnp.asarray([0]))
    np.testing.assert_array_equal(
        np.asarray(tokens), np.asarray(ref.tokens)
    )
    np.testing.assert_allclose(
        np.asarray(scores), np.asarray(ref.scores), atol=1e-5
    )


def test_save_load_round_trip(toy_corpus, tmp_path):
    """Orbax bundle save/load restores the transformer family exactly
    (config fields incl. num_heads/mlp_dim/max_positions survive)."""
    cfg = Config(
        encoder=EncoderConfig(name="tiny_cnn", feature_dim=128),
        decoder=DecoderConfig(
            name="transformer", hidden_dim=32, num_layers=1, num_heads=2,
            mlp_dim=64, max_positions=16, dropout_rate=0.0,
        ),
        decode=DecodeConfig(max_len=12),
    )
    pipe = CaptioningPipeline(cfg)
    desc = {f"im{i}": [c] for i, c in enumerate(toy_corpus)}
    pipe.fit_tokenizer(desc)
    pipe.build()
    feats = np.random.default_rng(2).normal(size=(3, 128)).astype(np.float32)
    ref = pipe.generate(feats, method="beam", beam_width=2)

    bundle = str(tmp_path / "bundle")
    pipe.save(bundle)
    loaded = CaptioningPipeline.load(bundle)
    assert loaded.config.decoder.name == "transformer"
    assert loaded.config.decoder.num_heads == 2
    assert loaded.config.decoder.max_positions == 16
    assert loaded.generate(feats, method="beam", beam_width=2) == ref


@pytest.mark.parametrize("spatial", [False, True])
def test_forward_hidden_with_alphas_contract(spatial):
    """forward_hidden_with_alphas: hidden identical to forward_hidden;
    alphas (B, T, Lm) float32 rows are softmax distributions over the
    memory positions (last layer, head-averaged)."""
    dec, params = make()
    L = 9
    shape = (B, L, FEAT) if spatial else (B, FEAT)
    feats = jax.random.normal(jax.random.key(5), shape)
    T = 7
    tokens = jax.random.randint(jax.random.key(6), (B, T), 0, VOCAB)

    hidden, alphas = dec.forward_hidden_with_alphas(params, feats, tokens)
    ref = dec.forward_hidden(params, feats, tokens)
    np.testing.assert_allclose(
        np.asarray(hidden), np.asarray(ref), atol=1e-6
    )
    assert alphas.shape == (B, T, L if spatial else 1)
    assert alphas.dtype == jnp.float32
    np.testing.assert_allclose(
        np.asarray(alphas.sum(axis=-1)), 1.0, atol=1e-5
    )


def test_pipeline_generate_with_attention_transformer(toy_corpus):
    """pipeline.generate_with_attention works for the transformer family:
    captions match generate(), alphas are per-token distributions over
    the spatial grid."""
    cfg = Config(
        encoder=EncoderConfig(
            name="tiny_cnn", features="spatial", feature_dim=128
        ),
        decoder=DecoderConfig(
            name="transformer", hidden_dim=32, num_layers=1, num_heads=2,
            mlp_dim=64, max_positions=16, dropout_rate=0.0,
        ),
        decode=DecodeConfig(max_len=10),
        precision="f32",
    )
    pipe = CaptioningPipeline(cfg)
    desc = {f"im{i}": [c] for i, c in enumerate(toy_corpus)}
    pipe.fit_tokenizer(desc)
    pipe.build()
    L = pipe.encoder.spatial_positions
    feats = (
        np.random.default_rng(7)
        .normal(size=(3, L, 128))
        .astype(np.float32)
    )
    caps, alphas, lengths = pipe.generate_with_attention(
        feats, method="beam", beam_width=2
    )
    assert caps == pipe.generate(feats, method="beam", beam_width=2)
    assert alphas.shape == (3, pipe.config.decode.max_len, L)
    for b in range(3):
        for t in range(int(lengths[b])):
            np.testing.assert_allclose(
                alphas[b, t].sum(), 1.0, atol=1e-5
            )


def test_pipeline_end_to_end_overfits(toy_corpus):
    """Config wiring: name='transformer' trains through pipeline.fit and
    generates via both engines (greedy + beam)."""
    cfg = Config(
        encoder=EncoderConfig(name="tiny_cnn", feature_dim=128),
        decoder=DecoderConfig(
            name="transformer",
            hidden_dim=32,
            num_layers=1,
            num_heads=2,
            mlp_dim=64,
            max_positions=16,
            dropout_rate=0.0,
        ),
        decode=DecodeConfig(max_len=12),
        train=TrainConfig(batch_size=8, learning_rate=3e-3, epochs=1, seed=0),
    )
    pipe = CaptioningPipeline(cfg)
    desc = {f"im{i}": [c] for i, c in enumerate(toy_corpus)}
    pipe.fit_tokenizer(desc)
    pipe.build()
    rng = np.random.default_rng(0)
    feats = {
        k: rng.normal(size=(128,)).astype(np.float32) for k in desc
    }
    history = pipe.fit(desc, feats, epochs=30, log=None)
    assert history[-1]["loss"] < history[0]["loss"] * 0.5

    arr = np.stack([feats[k] for k in desc])
    caps_g = pipe.generate(arr, method="greedy")
    caps_b = pipe.generate(arr, method="beam", beam_width=3)
    vocab = set(pipe.tokenizer.word_index)
    for c in caps_g + caps_b:
        assert c, "empty caption"
        assert set(c.split()) <= vocab
