"""No-repeat-ngram blocking (tpucap/decode/ngram.py + the engine dials):
mask vs a naive Python ban-set oracle, engines vs the step-loop oracles
token-exactly, the no-repeated-ngram output property, and the
unsupported-path guards.

Framework extra (the reference ships plain greedy/beam, SURVEY.md §2.1
#10-11) — tested to the same oracle standard as min_len/bad_words.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpucap.decode import beam_decode, greedy_decode
from tpucap.decode.ngram import ngram_banned_mask
from tpucap.decode.oracle import _ngram_bans, beam_oracle, greedy_oracle
from tpucap.decode.sample import sample_decode

from test_decode import END, MAXLEN, START, features_for, make


def _ngrams(seq, n):
    return [tuple(seq[i:i + n]) for i in range(len(seq) - n + 1)]


# ---------------------------------------------------------------------------
# The mask itself vs the naive oracle
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("n", [1, 2, 3, 4])
def test_mask_matches_naive_oracle(n):
    rng = np.random.default_rng(n)
    L, V = 13, 9
    for trial in range(20):
        t = int(rng.integers(0, L + 1))
        buf = np.zeros((4, L), np.int32)
        # Small alphabet so repeats are frequent; pads after t.
        buf[:, :t] = rng.integers(3, 7, size=(4, t))
        mask = np.asarray(
            ngram_banned_mask(jnp.asarray(buf), jnp.int32(t), n, V)
        )
        for b in range(4):
            want = _ngram_bans([int(x) for x in buf[b, :t]], n)
            got = set(np.flatnonzero(mask[b]).tolist())
            assert got == want, (n, t, buf[b, :t].tolist())


def test_mask_n_longer_than_buffer_is_empty():
    buf = jnp.ones((2, 5), jnp.int32)
    mask = ngram_banned_mask(buf, jnp.int32(5), 7, 11)
    assert not bool(np.asarray(mask).any())


def test_mask_n1_bans_all_generated():
    buf = jnp.asarray([[4, 5, 4, 0, 0]], jnp.int32)
    mask = np.asarray(ngram_banned_mask(buf, jnp.int32(3), 1, 8))
    assert set(np.flatnonzero(mask[0]).tolist()) == {4, 5}


# ---------------------------------------------------------------------------
# Engines vs oracles, token-exact
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("name", ["lstm1", "transformer"])
@pytest.mark.parametrize("n", [1, 2, 3])
def test_greedy_ngram_matches_oracle(name, n):
    dec, params = make(name)
    feats = features_for(name, jax.random.key(1))
    state = dec.init_state(params, feats)

    res = jax.jit(
        lambda p, s: greedy_decode(
            dec.step, p, s, start_id=START, end_id=END,
            max_len=MAXLEN, no_repeat_ngram_size=n,
        )
    )(params, state)
    ot, ol, osc = greedy_oracle(
        dec.step, params, state, start_id=START, end_id=END,
        max_len=MAXLEN, no_repeat_ngram_size=n,
    )
    np.testing.assert_array_equal(np.asarray(res.tokens), ot)
    np.testing.assert_array_equal(np.asarray(res.lengths), ol)
    np.testing.assert_allclose(np.asarray(res.scores), osc, atol=1e-5)


@pytest.mark.parametrize("name", ["lstm1", "attention"])
@pytest.mark.parametrize("k", [1, 3])
def test_beam_ngram_matches_oracle(name, k):
    dec, params = make(name)
    feats = features_for(name, jax.random.key(2))
    state = dec.init_state(params, feats)

    res = jax.jit(
        lambda p, s: beam_decode(
            dec.step, p, s, start_id=START, end_id=END, max_len=MAXLEN,
            beam_width=k, no_repeat_ngram_size=2, decoder=dec,
        )
    )(params, state)
    ot, ol, osc, obt, obl, obs = beam_oracle(
        dec.step, params, state, start_id=START, end_id=END,
        max_len=MAXLEN, beam_width=k, no_repeat_ngram_size=2,
    )
    np.testing.assert_array_equal(np.asarray(res.tokens), ot)
    np.testing.assert_array_equal(np.asarray(res.lengths), ol)
    np.testing.assert_allclose(np.asarray(res.scores), osc, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(res.beam_tokens), obt)


def test_beam_ngram_with_unroll_bit_exact():
    dec, params = make("lstm1")
    feats = features_for("lstm1", jax.random.key(3))
    state = dec.init_state(params, feats)
    kw = dict(
        start_id=START, end_id=END, max_len=MAXLEN, beam_width=3,
        no_repeat_ngram_size=2, decoder=dec,
    )
    r1 = jax.jit(lambda p, s: beam_decode(dec.step, p, s, **kw))(
        params, state
    )
    r2 = jax.jit(
        lambda p, s: beam_decode(dec.step, p, s, unroll=2, **kw)
    )(params, state)
    np.testing.assert_array_equal(
        np.asarray(r1.beam_tokens), np.asarray(r2.beam_tokens)
    )


def test_ngram_zero_is_identity():
    dec, params = make("lstm1")
    feats = features_for("lstm1", jax.random.key(4))
    state = dec.init_state(params, feats)
    kw = dict(start_id=START, end_id=END, max_len=MAXLEN, beam_width=3)
    r0 = jax.jit(lambda p, s: beam_decode(dec.step, p, s, **kw))(
        params, state
    )
    rn = jax.jit(
        lambda p, s: beam_decode(
            dec.step, p, s, no_repeat_ngram_size=0, **kw
        )
    )(params, state)
    np.testing.assert_array_equal(
        np.asarray(r0.beam_tokens), np.asarray(rn.beam_tokens)
    )


# ---------------------------------------------------------------------------
# The property the dial exists for: no n-gram ever repeats
# ---------------------------------------------------------------------------


def _generated(tokens, lengths):
    return [
        [int(x) for x in row[:int(l)]]
        for row, l in zip(np.asarray(tokens), np.asarray(lengths))
    ]


@pytest.mark.parametrize("n", [1, 2])
def test_greedy_output_has_no_repeated_ngram(n):
    dec, params = make("lstm1")
    feats = features_for("lstm1", jax.random.key(5))
    state = dec.init_state(params, feats)
    res = jax.jit(
        lambda p, s: greedy_decode(
            dec.step, p, s, start_id=START, end_id=END,
            max_len=MAXLEN, no_repeat_ngram_size=n,
        )
    )(params, state)
    for seq in _generated(res.tokens, res.lengths):
        grams = _ngrams(seq, n)
        assert len(grams) == len(set(grams)), seq


def test_beam_every_beam_has_no_repeated_bigram():
    dec, params = make("lstm1")
    feats = features_for("lstm1", jax.random.key(6))
    state = dec.init_state(params, feats)
    res = jax.jit(
        lambda p, s: beam_decode(
            dec.step, p, s, start_id=START, end_id=END, max_len=MAXLEN,
            beam_width=3, no_repeat_ngram_size=2, decoder=dec,
        )
    )(params, state)
    bt = np.asarray(res.beam_tokens)
    bl = np.asarray(res.beam_lengths)
    for b in range(bt.shape[0]):
        for j in range(bt.shape[1]):
            seq = [int(x) for x in bt[b, j, :int(bl[b, j])]]
            grams = _ngrams(seq, 2)
            assert len(grams) == len(set(grams)), seq


def test_sample_ngram1_never_repeats_a_token():
    dec, params = make("lstm1")
    feats = features_for("lstm1", jax.random.key(7))
    state = dec.init_state(params, feats)
    res = jax.jit(
        lambda p, s, r: sample_decode(
            dec.step, p, s, rng=r, start_id=START, end_id=END,
            max_len=MAXLEN, no_repeat_ngram_size=1,
        )
    )(params, state, jax.random.key(0))
    for seq in _generated(res.tokens, res.lengths):
        assert len(seq) == len(set(seq)), seq


def test_diverse_group1_matches_plain_beam_with_ngram():
    from tpucap.decode.diverse import diverse_beam_decode

    dec, params = make("lstm1")
    feats = features_for("lstm1", jax.random.key(8))
    state = dec.init_state(params, feats)
    plain = jax.jit(
        lambda p, s: beam_decode(
            dec.step, p, s, start_id=START, end_id=END, max_len=MAXLEN,
            beam_width=3, no_repeat_ngram_size=2, decoder=dec,
        )
    )(params, state)
    dbs = jax.jit(
        lambda p, s: diverse_beam_decode(
            dec.step, p, s, start_id=START, end_id=END, max_len=MAXLEN,
            num_groups=1, group_width=3, diversity=0.7,
            no_repeat_ngram_size=2, decoder=dec,
        )
    )(params, state)
    # One group sees no cross-group penalty: identical to standard beam
    # (diverse returns (B, G, kg, L); squeeze the single group).
    np.testing.assert_array_equal(
        np.asarray(plain.beam_tokens),
        np.asarray(dbs.beam_tokens).squeeze(1),
    )


# ---------------------------------------------------------------------------
# Pipeline surface + guards
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def ngram_pipe(toy_corpus):
    from tpucap.config import (
        Config, DecodeConfig, DecoderConfig, EncoderConfig,
    )
    from tpucap.pipeline import CaptioningPipeline
    from tpucap.text import Tokenizer

    cfg = Config(
        encoder=EncoderConfig(name="tiny_cnn", feature_dim=32),
        decoder=DecoderConfig(embed_dim=8, hidden_dim=16, dropout_rate=0.0),
        decode=DecodeConfig(max_len=10, no_repeat_ngram_size=2),
    )
    p = CaptioningPipeline(cfg)
    tok = Tokenizer()
    tok.fit_on_texts(toy_corpus)
    p.tokenizer = tok
    p.build()
    return p


def test_pipeline_generate_respects_ngram(ngram_pipe, rng):
    feats = jnp.asarray(rng.normal(size=(4, 32)).astype(np.float32))
    for method in ("greedy", "beam"):
        caps = ngram_pipe.generate(feats, method=method)
        assert len(caps) == 4
        for c in caps:
            grams = _ngrams(c.split(), 2)
            assert len(grams) == len(set(grams)), c


def test_pipeline_tp_matches_single_with_ngram(ngram_pipe, rng):
    """Vocab-sharded TP decode bans on its local slices — captions
    identical to single-device under the ngram dial."""
    feats = rng.normal(size=(4, 32)).astype(np.float32)
    single = ngram_pipe.generate(feats, method="beam")
    tp = ngram_pipe.generate(feats, method="beam", parallelism="tp")
    assert tp == single


def test_tp_engine_matches_beam_decode_with_ngram():
    from tpucap.core.mesh import Mesh
    from tpucap.models.decoders import build_decoder
    from tpucap.parallel.tp import make_tp_beam_fn

    devices = jax.devices()
    assert len(devices) == 8
    mesh = Mesh(np.asarray(devices), ("model",))
    dec = build_decoder(
        "lstm1", vocab_size=32, feature_dim=9, embed_dim=8, hidden_dim=16
    )
    params = dec.init(jax.random.key(0))
    feats = jax.random.normal(jax.random.key(1), (4, 9))

    ref = beam_decode(
        dec.step, params, dec.init_state(params, feats),
        start_id=1, end_id=2, max_len=11, beam_width=3,
        no_repeat_ngram_size=2,
    )
    tp_fn = make_tp_beam_fn(
        dec, mesh, start_id=1, end_id=2, max_len=11, beam_width=3,
        no_repeat_ngram_size=2,
    )
    out = tp_fn(params, feats)
    np.testing.assert_array_equal(
        np.asarray(ref.tokens), np.asarray(out.tokens)
    )
    np.testing.assert_array_equal(
        np.asarray(ref.beam_tokens), np.asarray(out.beam_tokens)
    )
    np.testing.assert_allclose(
        np.asarray(ref.scores), np.asarray(out.scores), atol=1e-4
    )


def test_custom_scorer_without_seqs_refuses_ngram():
    dec, params = make("lstm1")
    feats = features_for("lstm1", jax.random.key(9))
    state = dec.init_state(params, feats)

    def scorer(params, state, last, t):  # no seqs kwarg
        raise AssertionError("never called")

    with pytest.raises(NotImplementedError, match="seqs"):
        beam_decode(
            dec.step, params, state, start_id=START, end_id=END,
            max_len=MAXLEN, beam_width=3, no_repeat_ngram_size=2,
            scorer=scorer,
        )


def test_continuous_greedy_engine_matches_with_ngram(ngram_pipe, rng):
    """Slot-recycled greedy == greedy_decode under the ngram dial,
    including a staggered (recycled-lane) admission."""
    from tpucap.decode.continuous import ContinuousDecodeEngine

    feats = rng.normal(size=(3, 32)).astype(np.float32)
    params = ngram_pipe.params["decoder"]
    dec = ngram_pipe.decoder
    ref = greedy_decode(
        dec.step, params, dec.init_state(params, jnp.asarray(feats)),
        start_id=1, end_id=2, max_len=10, no_repeat_ngram_size=2,
    )
    eng = ContinuousDecodeEngine(
        dec, params, slots=2, start_id=1, end_id=2, max_len=10,
        no_repeat_ngram_size=2, feature_shape=(32,),
    )
    st = eng.init_state()
    idx, f = eng.pad_admission([0, 1], [feats[0], feats[1]])
    st = eng.admit(st, idx, f)
    st = eng.tick(st, 4)
    # Recycle lane 0 mid-flight with request 2: the cleared token
    # buffer must not leak the previous occupant's n-grams.
    idx, f = eng.pad_admission([0], [feats[2]])
    st = eng.admit(st, idx, f)
    st = eng.tick(st, 10)
    (tokens, lengths, _), _ = eng.collect(st, jnp.asarray([0, 1]))
    np.testing.assert_array_equal(
        np.asarray(tokens)[0], np.asarray(ref.tokens)[2]
    )
    np.testing.assert_array_equal(
        np.asarray(tokens)[1], np.asarray(ref.tokens)[1]
    )


def test_continuous_beam_engine_matches_with_ngram(ngram_pipe, rng):
    """Group-recycled beam == beam_decode under the ngram dial, with a
    staggered admission into a recycled group."""
    from tpucap.decode.continuous_beam import ContinuousBeamEngine

    feats = rng.normal(size=(2, 32)).astype(np.float32)
    params = ngram_pipe.params["decoder"]
    dec = ngram_pipe.decoder
    ref = beam_decode(
        dec.step, params,
        dec.init_state(params, jnp.asarray(feats[1:2])),
        start_id=1, end_id=2, max_len=10, beam_width=3,
        no_repeat_ngram_size=2, decoder=dec,
    )
    eng = ContinuousBeamEngine(
        dec, params, slots=1, beam_width=3, start_id=1, end_id=2,
        max_len=10, no_repeat_ngram_size=2, feature_shape=(32,),
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


def test_continuous_server_matches_generate_with_ngram(ngram_pipe, rng):
    from tpucap.serve import ContinuousCaptionServer

    feats = rng.normal(size=(5, 32)).astype(np.float32)
    ref = ngram_pipe.generate(feats, method="greedy")
    with ContinuousCaptionServer(
        ngram_pipe, slots=2, ticks_per_sync=2
    ) as srv:
        got = [
            fut.result(timeout=180)
            for fut in [srv.submit(f) for f in feats]
        ]
    assert got == ref
    for c in got:
        grams = _ngrams(c.split(), 2)
        assert len(grams) == len(set(grams)), c


def test_cli_flag_reaches_config():
    from types import SimpleNamespace

    from tpucap.cli.main import _build_config

    args = SimpleNamespace(
        preset=None, encoder="tiny_cnn", decoder="lstm1",
        features_kind="pooled", embed_dim=8, hidden_dim=16,
        max_len=10, no_repeat_ngram=3,
    )
    cfg = _build_config(args)
    assert cfg.decode.no_repeat_ngram_size == 3
