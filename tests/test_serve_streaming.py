"""Streaming decode: ContinuousCaptionServer.submit_stream delivers
newly-decoded words at ticks_per_sync granularity (concatenating to
exactly the final caption), beam servers stream the group's STABLE
PREFIX (the LCP of the k beams — never retracted, tail flushed at
retirement), and the HTTP /caption_stream_features endpoint streams
ndjson spans for both."""

import http.client
import json

import numpy as np
import pytest

from tpucap.config import Config, DecodeConfig, DecoderConfig, EncoderConfig
from tpucap.pipeline import CaptioningPipeline
from tpucap.serve import ContinuousCaptionServer
from tpucap.serve_http import CaptionHTTPServer
from tpucap.text import Tokenizer


@pytest.fixture(scope="module")
def pipe(toy_corpus):
    cfg = Config(
        encoder=EncoderConfig(name="tiny_cnn", feature_dim=128),
        decoder=DecoderConfig(embed_dim=16, hidden_dim=32, dropout_rate=0.0),
        decode=DecodeConfig(max_len=10),
    )
    p = CaptioningPipeline(cfg)
    tok = Tokenizer()
    tok.fit_on_texts(toy_corpus)
    p.tokenizer = tok
    p.build()
    return p


def _long_caption_feats(pipe, rng, min_words=4, tries=32):
    """A feature row whose greedy caption has >= min_words words, so a
    ticks_per_sync=2 stream must span multiple callbacks."""
    for _ in range(tries):
        feats = rng.normal(size=(128,)).astype(np.float32)
        ref = pipe.generate(feats[None], method="greedy")[0]
        if len(ref.split()) >= min_words:
            return feats, ref
    pytest.skip(f"no caption with >= {min_words} words in {tries} draws")


def test_submit_stream_incremental_and_exact(pipe, rng):
    feats, ref = _long_caption_feats(pipe, rng)
    spans = []
    with ContinuousCaptionServer(pipe, slots=4, ticks_per_sync=2) as srv:
        fut = srv.submit_stream(feats, on_words=spans.append)
        cap = fut.result(timeout=180)
    assert cap == ref
    # Spans concatenate to exactly the final caption...
    assert " ".join(w for s in spans for w in s) == ref
    # ...and arrived incrementally: >= 4 words at 2 tokens per sync
    # group means at least two callback invocations.
    assert len(spans) >= 2
    assert all(s for s in spans)  # no empty spans delivered


def test_streaming_coexists_with_plain_requests(pipe, rng):
    """Streaming and non-streaming lanes share the engine; neither
    disturbs the other's captions."""
    feats = rng.normal(size=(5, 128)).astype(np.float32)
    ref = pipe.generate(feats, method="greedy")
    spans = []
    with ContinuousCaptionServer(pipe, slots=4, ticks_per_sync=2) as srv:
        fut0 = srv.submit_stream(feats[0], on_words=spans.append)
        futs = [srv.submit(f) for f in feats[1:]]
        got = [fut0.result(timeout=180)] + [
            f.result(timeout=180) for f in futs
        ]
    assert got == ref
    assert " ".join(w for s in spans for w in s) == ref[0]


def test_beam_stream_exact(pipe, rng):
    """Beam streaming: spans concatenate to exactly the beam caption —
    the stable-prefix emissions plus the retirement flush cover the
    winning beam's whole word sequence, in order, no retractions."""
    feats = rng.normal(size=(6, 128)).astype(np.float32)
    refs = pipe.generate(feats, method="beam", beam_width=3)
    with ContinuousCaptionServer(
        pipe, slots=3, beam_width=3, ticks_per_sync=2
    ) as srv:
        all_spans = [[] for _ in feats]
        futs = [
            srv.submit_stream(f, on_words=all_spans[i].append)
            for i, f in enumerate(feats)
        ]
        got = [f.result(timeout=180) for f in futs]
    assert got == refs
    for spans, ref in zip(all_spans, refs):
        assert " ".join(w for s in spans for w in s) == ref
        assert all(s for s in spans)  # no empty spans


def test_beam_stable_prefix_monotone_and_safe(pipe, rng):
    """Engine-level invariant: at every sync, progress()'s stable
    prefix (a) never shrinks and (b) is a prefix of the caption
    collect() finally returns — driven tick by tick, no server."""
    import jax.numpy as jnp

    from tpucap.decode.continuous_beam import ContinuousBeamEngine

    start_id, end_id = pipe._token_ids()
    eng = ContinuousBeamEngine(
        pipe.decoder,
        pipe._inference_params()["decoder"],
        slots=2,
        beam_width=3,
        start_id=start_id,
        end_id=end_id,
        max_len=10,
        feature_shape=(128,),
    )
    feats = rng.normal(size=(2, 128)).astype(np.float32)
    state = eng.init_state()
    state = eng.admit(
        state, jnp.asarray(np.arange(2, dtype=np.int32)), jnp.asarray(feats)
    )
    seen = [np.zeros(0, np.int32)] * 2
    for _ in range(10):
        state = eng.tick(state, 1)
        toks, stable = map(np.asarray, eng.progress(state))
        for g in range(2):
            n = int(stable[g])
            prefix = toks[g, :n]
            # never shrinks, and extends what was already emitted
            assert n >= len(seen[g])
            assert np.array_equal(prefix[: len(seen[g])], seen[g])
            seen[g] = prefix.copy()
        fin, act, _ = map(np.asarray, eng.flags(state))
        if fin.all():
            break
    (tokens, lengths, _), _ = eng.collect(
        state, jnp.asarray(np.arange(2, dtype=np.int32))
    )
    tokens, lengths = np.asarray(tokens), np.asarray(lengths)
    for g in range(2):
        final = tokens[g, : int(lengths[g])]
        assert np.array_equal(seen[g], final[: len(seen[g])])


def test_broken_callback_does_not_kill_the_loop(pipe, rng):
    """A raising on_words callback is swallowed; the future still
    resolves and subsequent requests still serve."""
    feats = rng.normal(size=(2, 128)).astype(np.float32)
    ref = pipe.generate(feats, method="greedy")

    def boom(words):
        raise RuntimeError("client bug")

    with ContinuousCaptionServer(pipe, slots=4, ticks_per_sync=2) as srv:
        assert srv.submit_stream(feats[0], on_words=boom).result(
            timeout=180
        ) == ref[0]
        assert srv.submit(feats[1]).result(timeout=180) == ref[1]


def _post_stream(server, path, body):
    host, port = server.address
    conn = http.client.HTTPConnection(host, port, timeout=180)
    conn.request("POST", path, body=body)
    resp = conn.getresponse()
    raw = resp.read().decode()  # connection-close framing: read to EOF
    conn.close()
    return resp.status, raw


def test_http_stream_features(pipe, rng):
    feats, ref = _long_caption_feats(pipe, rng)
    with CaptionHTTPServer(
        pipe,
        port=0,
        max_batch=4,
        method="greedy",
        engine="continuous",
        ticks_per_sync=2,
    ) as srv:
        srv.serve_background()
        status, raw = _post_stream(
            srv,
            "/caption_stream_features",
            json.dumps({"features": feats.tolist()}),
        )
    assert status == 200
    lines = [json.loads(ln) for ln in raw.splitlines()]
    assert lines[-1]["done"] is True
    assert lines[-1]["caption"] == ref
    words = [w for ln in lines[:-1] for w in ln["words"]]
    assert " ".join(words) == ref
    assert len(lines) >= 3  # >= 2 spans + the final line


def test_http_stream_on_batch_engine_is_400(pipe, rng):
    feats = rng.normal(size=(128,)).astype(np.float32)
    with CaptionHTTPServer(
        pipe, port=0, max_batch=4, max_delay_ms=5, method="greedy"
    ) as srv:
        srv.serve_background()
        status, raw = _post_stream(
            srv,
            "/caption_stream_features",
            json.dumps({"features": feats.tolist()}),
        )
    assert status == 400
    assert "continuous" in json.loads(raw)["error"]


def test_http_stream_beam(pipe, rng):
    """Beam streaming over HTTP: ndjson spans + final caption line,
    concatenating to exactly the beam caption."""
    feats = rng.normal(size=(128,)).astype(np.float32)
    ref = pipe.generate(feats[None], method="beam", beam_width=3)[0]
    with CaptionHTTPServer(
        pipe,
        port=0,
        max_batch=3,
        method="beam",
        beam_width=3,
        engine="continuous",
        ticks_per_sync=2,
    ) as srv:
        srv.serve_background()
        status, raw = _post_stream(
            srv,
            "/caption_stream_features",
            json.dumps({"features": feats.tolist()}),
        )
    assert status == 200
    lines = [json.loads(ln) for ln in raw.splitlines()]
    assert lines[-1]["done"] is True
    assert lines[-1]["caption"] == ref
    words = [w for ln in lines[:-1] for w in ln["words"]]
    assert " ".join(words) == ref
