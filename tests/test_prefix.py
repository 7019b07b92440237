"""Forced-prefix (caption-completion) decoding: prime_prefix +
generate_continuation. Oracle-exact on primed single rows, decomposable
over mixed-length batches, identity at the empty prefix, and the
OOV-prefix refusal.

Framework extra (the reference always decodes from startseq,
SURVEY.md §3.3).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpucap.decode import beam_decode, greedy_decode
from tpucap.decode.oracle import beam_oracle, greedy_oracle
from tpucap.decode.prefix import prime_prefix

from test_decode import END, MAXLEN, START, features_for, make


def _prime_oracle(dec, params, feats, prefix_tokens):
    """Teacher-force a prefix through the decoder in plain Python."""
    state = dec.init_state(params, feats)
    last = START
    lp = 0.0
    for tok in prefix_tokens:
        logits, state = dec.step(
            params, state, jnp.full((feats.shape[0],), last, jnp.int32)
        )
        logp = np.asarray(
            jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        )
        lp += float(logp[0, tok])
        last = tok
    return state, last, lp


@pytest.mark.parametrize("name", ["lstm1", "attention"])
def test_prime_prefix_matches_python_loop(name):
    dec, params = make(name)
    feats = features_for(name, jax.random.key(1))[:1]
    prefix = [5, 9, 3]

    st, last, lp = prime_prefix(
        dec.step, params, dec.init_state(params, feats),
        jnp.asarray([prefix], jnp.int32), jnp.asarray([3], jnp.int32),
        start_id=START,
    )
    ost, olast, olp = _prime_oracle(dec, params, feats, prefix)
    assert int(last[0]) == olast
    np.testing.assert_allclose(float(lp[0]), olp, atol=1e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5
        ),
        st, ost,
    )


@pytest.mark.parametrize("name", ["lstm1", "transformer"])
def test_greedy_continuation_matches_primed_oracle(name):
    """Engine decode from a primed state == greedy_oracle from the
    Python-primed state (single row => scalar start works)."""
    dec, params = make(name)
    feats = features_for(name, jax.random.key(2))[:1]
    prefix = [4, 7]

    st, last, lp = prime_prefix(
        dec.step, params, dec.init_state(params, feats),
        jnp.asarray([prefix], jnp.int32), jnp.asarray([2], jnp.int32),
        start_id=START,
    )
    res = jax.jit(
        lambda p, s, l, v: greedy_decode(
            dec.step, p, s, start_id=l, end_id=END, max_len=MAXLEN,
            init_scores=v,
        )
    )(params, st, last, lp)

    ost, olast, olp = _prime_oracle(dec, params, feats, prefix)
    ot, ol, osc = greedy_oracle(
        dec.step, params, ost, start_id=olast, end_id=END, max_len=MAXLEN
    )
    np.testing.assert_array_equal(np.asarray(res.tokens), ot)
    np.testing.assert_allclose(
        np.asarray(res.scores), osc + olp, atol=1e-4
    )


def test_beam_continuation_matches_primed_oracle():
    dec, params = make("lstm1")
    feats = features_for("lstm1", jax.random.key(3))[:1]
    prefix = [6, 11, 3]

    st, last, lp = prime_prefix(
        dec.step, params, dec.init_state(params, feats),
        jnp.asarray([prefix], jnp.int32), jnp.asarray([3], jnp.int32),
        start_id=START,
    )
    res = jax.jit(
        lambda p, s, l, v: beam_decode(
            dec.step, p, s, start_id=l, end_id=END, max_len=MAXLEN,
            beam_width=3, init_scores=v, decoder=dec,
        )
    )(params, st, last, lp)

    ost, olast, olp = _prime_oracle(dec, params, feats, prefix)
    ot, ol, osc, obt, obl, obs = beam_oracle(
        dec.step, params, ost, start_id=olast, end_id=END,
        max_len=MAXLEN, beam_width=3,
    )
    # Ranking is continuation-normalized on both sides; engine scores
    # additionally carry the prefix log-prob.
    np.testing.assert_array_equal(np.asarray(res.tokens), ot)
    np.testing.assert_allclose(
        np.asarray(res.scores), osc + olp, atol=1e-4
    )
    np.testing.assert_array_equal(np.asarray(res.beam_tokens), obt)


@pytest.mark.parametrize("method", ["greedy", "beam"])
def test_mixed_batch_decomposes_to_single_rows(method):
    """Batched mixed-length prefixes == row-by-row single decodes —
    the freeze-mask in prime_prefix can't leak across rows."""
    dec, params = make("lstm1")
    feats = features_for("lstm1", jax.random.key(4))[:3]
    prefixes = [[5, 9, 3], [7], []]

    def run(f, pref_rows):
        P = max((len(p) for p in pref_rows), default=0)
        arr = np.zeros((len(pref_rows), P), np.int32)
        lens = np.zeros((len(pref_rows),), np.int32)
        for i, p in enumerate(pref_rows):
            arr[i, : len(p)] = p
            lens[i] = len(p)
        st, last, lp = prime_prefix(
            dec.step, params, dec.init_state(params, f),
            jnp.asarray(arr), jnp.asarray(lens), start_id=START,
        )
        kw = dict(
            start_id=last, end_id=END, max_len=MAXLEN, init_scores=lp
        )
        if method == "greedy":
            return greedy_decode(dec.step, params, st, **kw)
        return beam_decode(
            dec.step, params, st, beam_width=3, decoder=dec, **kw
        )

    batched = run(feats, prefixes)
    for i in range(3):
        single = run(feats[i : i + 1], [prefixes[i]])
        np.testing.assert_array_equal(
            np.asarray(batched.tokens)[i], np.asarray(single.tokens)[0]
        )
        np.testing.assert_allclose(
            np.asarray(batched.scores)[i],
            np.asarray(single.scores)[0],
            atol=1e-4,
        )


@pytest.fixture(scope="module")
def pref_pipe(toy_corpus):
    from tpucap.config import (
        Config, DecodeConfig, DecoderConfig, EncoderConfig,
    )
    from tpucap.pipeline import CaptioningPipeline
    from tpucap.text import Tokenizer

    cfg = Config(
        encoder=EncoderConfig(name="tiny_cnn", feature_dim=32),
        decoder=DecoderConfig(embed_dim=8, hidden_dim=16, dropout_rate=0.0),
        decode=DecodeConfig(max_len=10),
    )
    p = CaptioningPipeline(cfg)
    tok = Tokenizer()
    tok.fit_on_texts(toy_corpus)
    p.tokenizer = tok
    p.build()
    return p


def test_pipeline_empty_prefix_is_generate(pref_pipe, rng):
    feats = rng.normal(size=(3, 32)).astype(np.float32)
    for method in ("greedy", "beam"):
        assert pref_pipe.generate_continuation(
            feats, "", method=method
        ) == pref_pipe.generate(feats, method=method)


def test_pipeline_captions_start_with_prefix(pref_pipe, rng, toy_corpus):
    feats = rng.normal(size=(2, 32)).astype(np.float32)
    # Two in-vocabulary words from the toy corpus.
    words = [
        w for w in toy_corpus[0].split() if w not in ("startseq", "endseq")
    ]
    prefix = " ".join(words[:2])
    caps = pref_pipe.generate_continuation(feats, prefix, method="beam")
    assert all(c.startswith(prefix) for c in caps), (prefix, caps)


def test_pipeline_mixed_prefixes_per_row(pref_pipe, rng, toy_corpus):
    feats = rng.normal(size=(2, 32)).astype(np.float32)
    w = [
        x for x in toy_corpus[0].split() if x not in ("startseq", "endseq")
    ][0]
    caps = pref_pipe.generate_continuation(feats, [w, ""], method="greedy")
    assert caps[0].startswith(w)
    assert caps[1] == pref_pipe.generate(feats, method="greedy")[1]


def test_pipeline_oov_prefix_raises(pref_pipe, rng):
    feats = rng.normal(size=(1, 32)).astype(np.float32)
    with pytest.raises(ValueError, match="outside the tokenizer"):
        pref_pipe.generate_continuation(feats, "zzzunknownword")


def test_encode_prefixes_tokenizer_normalization(pref_pipe, toy_corpus):
    """The OOV check counts words under the TOKENIZER's normalization,
    not text.split(): filter characters split words, so 'a, b' is two
    words (valid) and 'a.b zzz' is three (the OOV 'zzz' must raise even
    though split() sees only two words)."""
    w1, w2 = [
        x for x in toy_corpus[0].split() if x not in ("startseq", "endseq")
    ][:2]
    # Punctuation between valid words: must NOT raise, encodes 2 tokens.
    (seq,) = pref_pipe.encode_prefixes([f"{w1}, {w2}"])
    assert len(seq) == 2
    # 'w1.w2' filter-splits into two valid tokens while split() counts
    # one word — the OOV 'zzzunknownword' must still be caught.
    with pytest.raises(ValueError, match="outside the tokenizer"):
        pref_pipe.encode_prefixes([f"{w1}.{w2} zzzunknownword"])


def test_continuation_submit_matches_blocking(pref_pipe, rng, toy_corpus):
    """generate_continuation_submit is the async form: its finalizer
    yields exactly generate_continuation."""
    feats = rng.normal(size=(2, 32)).astype(np.float32)
    w = [
        x for x in toy_corpus[0].split() if x not in ("startseq", "endseq")
    ][0]
    fin = pref_pipe.generate_continuation_submit(
        feats, [w, ""], method="greedy"
    )
    assert fin() == pref_pipe.generate_continuation(
        feats, [w, ""], method="greedy"
    )


def test_pipeline_sample_method_raises(pref_pipe, rng):
    feats = rng.normal(size=(1, 32)).astype(np.float32)
    with pytest.raises(ValueError, match="greedy|beam"):
        pref_pipe.generate_continuation(feats, "", method="sample")


# ---------------------------------------------------------------------------
# Serving layer: per-request prefixes through the micro-batcher
# ---------------------------------------------------------------------------


def test_caption_server_mixed_prefix_batch(pref_pipe, rng):
    """Requests with and without prefixes batch together and each
    matches its individual offline result."""
    from tpucap.serve import CaptionServer

    feats = rng.normal(size=(3, 32)).astype(np.float32)
    ref_plain = pref_pipe.generate(feats, method="greedy")
    ref_pref = pref_pipe.generate_continuation(
        feats, ["black dog", "a man", ""], method="greedy"
    )
    with CaptionServer(
        pref_pipe, max_batch=4, max_delay_ms=50, method="greedy"
    ) as srv:
        futs = [
            srv.submit(feats[0], prefix="black dog"),
            srv.submit(feats[1], prefix="a man"),
            srv.submit(feats[2]),
        ]
        got = [f.result(timeout=180) for f in futs]
    assert got[0] == ref_pref[0]
    assert got[1] == ref_pref[1]
    assert got[2] == ref_plain[2] == ref_pref[2]


def test_caption_server_prefix_validation(pref_pipe, rng, toy_corpus):
    from tpucap.serve import CaptionServer

    w = [
        x for x in toy_corpus[0].split() if x not in ("startseq", "endseq")
    ][0]
    f = rng.normal(size=(32,)).astype(np.float32)
    with CaptionServer(pref_pipe, max_batch=2, method="greedy") as srv:
        with pytest.raises(ValueError, match="outside the tokenizer"):
            srv.submit(f, prefix="zzzunknownword")
        # Length cap (defaults to decode max_len=10): an 11-token prefix
        # fails ITS OWN submit — it never reaches a micro-batch where it
        # would fail riders too (and never forces a giant priming
        # compile onto the batcher thread).
        with pytest.raises(ValueError, match="max_prefix_tokens"):
            srv.submit(f, prefix=" ".join([w] * 11))
        # A bad prefix must not have poisoned the server.
        assert isinstance(srv.submit(f).result(timeout=180), str)


def test_caption_server_prefix_capacity_fails_only_its_request(
    toy_corpus, rng
):
    """KV-cache family: a prefix that exceeds decoder.max_positions is
    rejected at submit time; a plain rider request in the same window
    still resolves."""
    from tpucap.config import (
        Config, DecodeConfig, DecoderConfig, EncoderConfig,
    )
    from tpucap.pipeline import CaptioningPipeline
    from tpucap.serve import CaptionServer
    from tpucap.text import Tokenizer

    cfg = Config(
        encoder=EncoderConfig(name="tiny_cnn", feature_dim=32),
        decoder=DecoderConfig(
            name="transformer", embed_dim=16, hidden_dim=16,
            num_layers=1, num_heads=2, mlp_dim=32, max_positions=16,
            dropout_rate=0.0,
        ),
        decode=DecodeConfig(max_len=10),
    )
    p = CaptioningPipeline(cfg)
    tok = Tokenizer()
    tok.fit_on_texts(toy_corpus)
    p.tokenizer = tok
    p.build()
    w = [
        x for x in toy_corpus[0].split() if x not in ("startseq", "endseq")
    ][0]
    feats = rng.normal(size=(2, 32)).astype(np.float32)
    with CaptionServer(
        p, max_batch=4, max_delay_ms=50, method="greedy"
    ) as srv:
        # 8 + max_len 10 > max_positions 16 -> reject at submit.
        with pytest.raises(ValueError, match="max_positions"):
            srv.submit(feats[0], prefix=" ".join([w] * 8))
        fut = srv.submit(feats[1])
        assert isinstance(fut.result(timeout=180), str)


# ---------------------------------------------------------------------------
# Chunked prefill (transformer KV-cache family)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("method", ["greedy", "beam"])
def test_transformer_chunked_prefill_matches_scan(method):
    """One step_chunk prefill == P sequential scan steps: same consumed
    count, same continuation token, same prefix log-prob, and the
    decode from both primed states is token-identical (the stale K/V a
    short row keeps past its length is never visible — decode
    overwrites each position in the step that first queries it)."""
    dec, params = make("transformer")
    feats = features_for("transformer", jax.random.key(11))[:3]
    prefixes = np.asarray(
        [[5, 9, 3], [7, 0, 0], [0, 0, 0]], np.int32
    )
    plens = np.asarray([3, 1, 0], np.int32)

    def prime(use_chunk):
        return prime_prefix(
            dec.step, params, dec.init_state(params, feats),
            jnp.asarray(prefixes), jnp.asarray(plens),
            start_id=START, decoder=dec if use_chunk else None,
        )

    st_s, last_s, lp_s = prime(False)
    st_c, last_c, lp_c = prime(True)
    np.testing.assert_array_equal(np.asarray(last_s), np.asarray(last_c))
    np.testing.assert_array_equal(
        np.asarray(st_s["pos"]), np.asarray(st_c["pos"])
    )
    np.testing.assert_allclose(
        np.asarray(lp_s), np.asarray(lp_c), atol=1e-4
    )

    def cont(st, last, lp):
        kw = dict(
            start_id=last, end_id=END, max_len=MAXLEN, init_scores=lp
        )
        if method == "greedy":
            return greedy_decode(dec.step, params, st, **kw)
        return beam_decode(
            dec.step, params, st, beam_width=3, decoder=dec, **kw
        )

    r_s = cont(st_s, last_s, lp_s)
    r_c = cont(st_c, last_c, lp_c)
    np.testing.assert_array_equal(
        np.asarray(r_s.tokens), np.asarray(r_c.tokens)
    )
    np.testing.assert_allclose(
        np.asarray(r_s.scores), np.asarray(r_c.scores), atol=1e-4
    )


def test_pipeline_transformer_prefix(toy_corpus, rng):
    """generate_continuation on the KV-cache family end-to-end (routes
    through the chunked prefill), plus the capacity refusal."""
    from tpucap.config import (
        Config, DecodeConfig, DecoderConfig, EncoderConfig,
    )
    from tpucap.pipeline import CaptioningPipeline
    from tpucap.text import Tokenizer

    cfg = Config(
        encoder=EncoderConfig(name="tiny_cnn", feature_dim=32),
        decoder=DecoderConfig(
            name="transformer", embed_dim=16, hidden_dim=16,
            num_layers=1, num_heads=2, mlp_dim=32, max_positions=24,
            dropout_rate=0.0,
        ),
        decode=DecodeConfig(max_len=10),
    )
    p = CaptioningPipeline(cfg)
    tok = Tokenizer()
    tok.fit_on_texts(toy_corpus)
    p.tokenizer = tok
    p.build()

    feats = rng.normal(size=(2, 32)).astype(np.float32)
    w = [
        x for x in toy_corpus[0].split() if x not in ("startseq", "endseq")
    ][0]
    caps = p.generate_continuation(feats, [w, ""], method="greedy")
    assert caps[0].startswith(w)
    assert caps[1] == p.generate(feats, method="greedy")[1]

    with pytest.raises(ValueError, match="max_positions"):
        p.generate_continuation(
            feats, " ".join([w] * 16), method="greedy"
        )

    # Capacity uses the TRUE prefix length, not the pow-2-padded one:
    # 9 tokens pad to P=16, but decode only ever writes up to position
    # 9 + max_len - 1 = 18 < 24, so this must be ACCEPTED (the padded
    # rule 16 + 10 > 24 would wrongly reject it).
    caps9 = p.generate_continuation(
        feats, " ".join([w] * 9), method="greedy"
    )
    assert all(c.startswith(w) for c in caps9)
