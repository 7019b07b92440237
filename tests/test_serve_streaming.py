"""Streaming decode: ContinuousCaptionServer.submit_stream delivers
newly-decoded words at ticks_per_sync granularity (concatenating to
exactly the final caption), beam servers refuse streaming, and the
HTTP /caption_stream_features endpoint streams ndjson spans."""

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


def test_stream_rejects_beam_server(pipe):
    with ContinuousCaptionServer(pipe, slots=3, beam_width=3) as srv:
        with pytest.raises(ValueError, match="beam"):
            srv.submit_stream(
                np.zeros((128,), np.float32), on_words=lambda ws: None
            )


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


def test_http_stream_beam_is_400(pipe, rng):
    feats = rng.normal(size=(128,)).astype(np.float32)
    with CaptionHTTPServer(
        pipe,
        port=0,
        max_batch=3,
        method="beam",
        beam_width=3,
        engine="continuous",
    ) as srv:
        srv.serve_background()
        status, raw = _post_stream(
            srv,
            "/caption_stream_features",
            json.dumps({"features": feats.tolist()}),
        )
    assert status == 400
    assert "beam" in json.loads(raw)["error"]
