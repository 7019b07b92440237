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


def test_caption_features_many_one_request(client, pipe, rng):
    """POST /caption_batch: many rows in one request equal the offline
    batch; shape errors and per-request dials behave."""
    feats = rng.normal(size=(5, 128)).astype(np.float32)
    got = client.caption_features_many(feats)
    assert got == list(
        pipe.generate(feats, method="beam", beam_width=2)
    )
    # A single row (1-D) must be rejected toward /caption_features.
    with pytest.raises(ServerError, match="LIST of feature rows"):
        client.caption_features_many(feats[0])
    # Shared dial applies to every row.
    word = _vocab_word(pipe)
    got = client.caption_features_many(feats[:2], include_words=[word])
    assert all(word in c.split() for c in got)


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


def test_cli_caption_server_mode(client, beam_server, pipe, rng, tmp_path, capsys):
    """`tpucap caption --server HOST:PORT` routes through the client
    SDK — no local checkpoint restore — and prints path\\tcaption lines
    identical to direct client calls; offline-only modes refuse."""
    from tpucap.cli.main import main

    host, port = beam_server.address
    paths = []
    for i in range(2):
        blob = _jpeg_bytes(rng, pipe.encoder.input_size)
        p = tmp_path / f"img{i}.jpg"
        p.write_bytes(blob)
        paths.append(str(p))
    main(["caption", "--server", f"{host}:{port}",
          "--image", *paths])
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 2
    for path, line in zip(paths, out):
        got_path, cap = line.split("\t")
        assert got_path == path
        assert cap == client.caption(open(path, "rb").read())

    # Per-request dial passes through.
    word = _vocab_word(pipe)
    main(["caption", "--server", f"{host}:{port}",
          "--image", paths[0], "--include-words", word])
    line = capsys.readouterr().out.strip()
    assert word in line.split("\t")[1].split()

    # Offline-only modes refuse before any network IO.
    with pytest.raises(SystemExit, match="offline"):
        main(["caption", "--server", f"{host}:{port}",
              "--image", paths[0], "--method", "mbr"])
    with pytest.raises(SystemExit, match="HOST:PORT"):
        main(["caption", "--server", "nope", "--image", paths[0]])
    # Server-side validation surfaces as a clean exit, not a traceback.
    with pytest.raises(SystemExit, match="server error"):
        main(["caption", "--server", f"{host}:{port}",
              "--image", paths[0], "--include-words", "zzzunknownzzz"])


def test_load_client_script(beam_server, capsys):
    """scripts/load_client.py drives a live server and prints the JSON
    summary line with real latency percentiles."""
    import importlib.util
    import json as _json
    import os

    spec = importlib.util.spec_from_file_location(
        "load_client",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "scripts",
            "load_client.py",
        ),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    host, port = beam_server.address
    rc = mod.main([
        f"{host}:{port}", "--clients", "2", "--requests", "6",
        "--feature-dim", "128", "--warmup", "1",
    ])
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()[-1]
    stats = _json.loads(out)
    assert stats["requests"] == 6 and stats["errors"] == 0
    assert stats["captions_per_sec"] > 0
    assert 0 < stats["p50_ms"] <= stats["p99_ms"]


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


def test_caption_jpegs_many_one_request(client, pipe, rng):
    """POST /caption_batch with base64 JPEG rows: one request equals
    the threaded per-JPEG path (same preprocess -> encoder -> decode),
    and mixing features with images_b64 is a clean 400."""
    size = pipe.encoder.input_size
    blobs = [_jpeg_bytes(rng, size) for _ in range(4)]
    got = client.caption_jpegs_many(blobs)
    assert got == [client.caption(b) for b in blobs]
    # Shared dial applies to every row.
    word = _vocab_word(pipe)
    dialed = client.caption_jpegs_many(blobs[:2], include_words=[word])
    assert all(word in c.split() for c in dialed)
    # features XOR images_b64.
    import http.client as hc
    import json as _json

    host, port = client.host, client.port
    conn = hc.HTTPConnection(host, port, timeout=60)
    conn.request(
        "POST",
        "/caption_batch",
        _json.dumps(
            {"features": [[1.0] * 128], "images_b64": ["aGk="]}
        ).encode(),
    )
    resp = conn.getresponse()
    payload = _json.loads(resp.read())
    conn.close()
    assert resp.status == 400 and "not both" in payload["error"]
    # Bad base64 / non-list payloads fail clean, server stays healthy.
    with pytest.raises(ServerError):
        client._request(
            "POST",
            "/caption_batch",
            _json.dumps({"images_b64": "notalist"}).encode(),
        )
    assert client.caption_jpegs_many([]) == []
    assert client.caption_jpegs_many(blobs[:1]) == [
        client.caption(blobs[0])
    ]


def test_caption_batch_per_row_dials(client, pipe, rng):
    """Per-row dials (r5): prefixes/include_words_rows give each row
    its own opening/constraint in ONE /caption_batch request; shared +
    per-row together fail client-side before any round-trip."""
    w0, w1 = _vocab_word(pipe), _vocab_word(pipe, skip=1)
    feats = rng.normal(size=(3, 128)).astype(np.float32)
    got = client.caption_features_many(feats, prefixes=[w0, "", w1])
    assert got[0].startswith(w0) and got[2].startswith(w1)
    assert got[1] == pipe.generate(
        feats[1:2], method="beam", beam_width=2
    )[0]
    got = client.caption_features_many(
        feats[:2], include_words_rows=[[w0], []]
    )
    assert w0 in got[0].split()
    with pytest.raises(TypeError, match="not both"):
        client.caption_features_many(
            feats, prefix=w0, prefixes=[w0, "", ""]
        )
    with pytest.raises(TypeError, match="sequence of per-row"):
        client.caption_features_many(feats, prefixes=w0)
    with pytest.raises(TypeError, match="include_words_rows\\[1\\]"):
        # A bare string row would char-split into letters server-side.
        client.caption_features_many(
            feats[:2], include_words_rows=[[w0], w1]
        )
