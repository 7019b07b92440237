"""Client SDK (tpucap/client.py) against a LIVE CaptionHTTPServer:
every endpoint round-trips through CaptionClient with captions
identical to the direct pipeline path, errors surface as ServerError
with the server's own message, and streaming keeps the
exact-concatenation contract."""

import numpy as np
import pytest

from tpucap.client import CaptionClient, ServerError
from tpucap.config import Config, DecodeConfig, DecoderConfig, EncoderConfig
from tpucap.pipeline import CaptioningPipeline
from tpucap.serve_http import CaptionHTTPServer, _preprocess_jpeg
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


@pytest.fixture(scope="module")
def beam_server(pipe):
    """Batch-engine beam server: the configuration that supports every
    per-request dial (prefix + include_words)."""
    srv = CaptionHTTPServer(
        pipe, port=0, max_batch=4, max_delay_ms=5,
        method="beam", beam_width=2,
    )
    srv.serve_background()
    yield srv
    srv.close()


@pytest.fixture(scope="module")
def client(beam_server):
    host, port = beam_server.address
    return CaptionClient(host, port)


def _jpeg_bytes(rng, size):
    import io

    from PIL import Image

    arr = rng.integers(0, 255, size=(size, size, 3)).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="JPEG", quality=95)
    return buf.getvalue()


def _vocab_word(pipe, skip=0):
    """A model-emittable non-sentinel vocabulary word."""
    for i, w in enumerate(
        w
        for w, idx in sorted(
            pipe.tokenizer.word_index.items(), key=lambda kv: kv[1]
        )
        if idx < pipe.vocab_size and w not in ("startseq", "endseq")
    ):
        if i >= skip:
            return w
    raise AssertionError("toy vocabulary exhausted")


def test_caption_jpeg_matches_direct_path(client, beam_server, pipe, rng):
    size = pipe.encoder.input_size
    blob = _jpeg_bytes(rng, size)
    got = client.caption(blob)
    x = _preprocess_jpeg(blob, size, pipe.encoder.preprocess_mode)
    feats = pipe.encode_images(x[None])
    assert got == pipe.generate(feats, method="beam", beam_width=2)[0]


def test_caption_features_accepts_arrays_and_lists(client, pipe, rng):
    feats = rng.normal(size=(128,)).astype(np.float32)
    ref = pipe.generate(feats[None], method="beam", beam_width=2)[0]
    assert client.caption_features(feats) == ref  # ndarray (tolist'd)
    assert client.caption_features(feats.tolist()) == ref


def test_caption_many_is_order_preserving(client, pipe, rng):
    """Concurrent submission (the micro-batcher's intended shape)
    returns captions in input order, equal to serial requests."""
    size = pipe.encoder.input_size
    blobs = [_jpeg_bytes(rng, size) for _ in range(6)]
    many = client.caption_many(blobs)
    assert many == [client.caption(b) for b in blobs]


def test_prefix_and_include_words(client, pipe, rng):
    feats = rng.normal(size=(128,)).astype(np.float32)
    word = _vocab_word(pipe)
    got = client.caption_features(feats, prefix=word)
    ref = pipe.generate_continuation(
        feats[None], word, method="beam", beam_width=2
    )[0]
    assert got == ref and got.startswith(word)

    cword = _vocab_word(pipe, skip=1)
    got = client.caption_features(feats, include_words=[cword])
    ref = pipe.generate_constrained(
        feats[None], [cword], beam_width=2
    )[0]
    assert got == ref and cword in got.split()


def test_errors_surface_as_server_error(client, rng, tmp_path):
    feats = rng.normal(size=(128,)).astype(np.float32)
    with pytest.raises(ServerError, match="vocabulary") as ei:
        client.caption_features(feats, include_words=["zzzunknownzzz"])
    assert ei.value.status == 400
    # A bare string is a CLIENT-side TypeError — never sent as chars.
    with pytest.raises(TypeError, match="sequence of words"):
        client.caption_features(feats, include_words="dog")
    with pytest.raises(TypeError, match="sequence of words"):
        client.caption(b"\xff\xd8", include_words="dog")
    # Unknown model on a single-model server.
    with pytest.raises(ServerError) as ei:
        client.caption_features(feats, model="nope")
    assert ei.value.status == 400
    # Reload is disabled unless the server opted in -> 403.
    with pytest.raises(ServerError) as ei:
        client.reload(str(tmp_path))
    assert ei.value.status == 403


def test_monitoring_surfaces(client):
    assert client.healthz()["ok"] is True
    stats = client.stats()
    assert "images" in stats and "features" in stats
    assert stats["features"]["requests"] >= 1
    text = client.metrics()
    assert "# TYPE tpucap_requests_total counter" in text


def test_stream_exact_concatenation(pipe, rng):
    """caption_stream against a continuous-engine server: word spans
    handed to on_words concatenate to exactly the returned caption,
    which equals the offline greedy path."""
    with CaptionHTTPServer(
        pipe, port=0, max_batch=4, engine="continuous"
    ) as srv:
        srv.serve_background()
        host, port = srv.address
        c = CaptionClient(host, port)
        feats = rng.normal(size=(128,)).astype(np.float32)
        spans = []
        final = c.caption_stream_features(feats, spans.append)
        assert " ".join(w for s in spans for w in s) == final
        assert final == pipe.generate(feats[None], method="greedy")[0]
        # Streaming errors raise, not hang: prefix on a stream route.
        with pytest.raises(ServerError):
            c._stream(
                "/caption_stream_features?prefix=a",
                b'{"features": []}',
                None,
                None,
            )
