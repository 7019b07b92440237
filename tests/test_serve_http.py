"""HTTP serving layer (tpucap/serve_http.py): JPEG bytes in -> caption
out through the micro-batcher, matching the direct pipeline path; plus
feature-row serving, stats/health endpoints, and error codes."""

import http.client
import io
import json

import numpy as np
import pytest

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
def server(pipe):
    srv = CaptionHTTPServer(
        pipe, port=0, max_batch=4, max_delay_ms=5, method="greedy"
    )
    srv.serve_background()
    yield srv
    srv.close()


def _jpeg_bytes(rng, size):
    from PIL import Image

    arr = rng.integers(0, 255, size=(size, size, 3)).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="JPEG", quality=95)
    return buf.getvalue()


def _request(server, method, path, body=None):
    host, port = server.address
    conn = http.client.HTTPConnection(host, port, timeout=120)
    conn.request(method, path, body=body)
    resp = conn.getresponse()
    payload = json.loads(resp.read())
    conn.close()
    return resp.status, payload


def test_caption_jpeg_matches_direct_path(server, pipe, rng):
    size = pipe.encoder.input_size
    blob = _jpeg_bytes(rng, size)
    status, payload = _request(server, "POST", "/caption", blob)
    assert status == 200
    x = _preprocess_jpeg(blob, size, pipe.encoder.preprocess_mode)
    feats = pipe.encode_images(x[None])
    assert payload["caption"] == pipe.generate(feats, method="greedy")[0]


def test_caption_features_endpoint(server, pipe, rng):
    feats = rng.normal(size=(128,)).astype(np.float32)
    body = json.dumps({"features": feats.tolist()}).encode()
    status, payload = _request(server, "POST", "/caption_features", body)
    assert status == 200
    ref = pipe.generate(feats[None], method="greedy")[0]
    assert payload["caption"] == ref


def test_health_and_stats(server):
    status, payload = _request(server, "GET", "/healthz")
    assert status == 200 and payload["ok"] is True
    status, payload = _request(server, "GET", "/stats")
    assert status == 200
    assert "images" in payload and "features" in payload
    assert payload["images"]["requests"] >= 1  # from the jpeg test


def test_caption_features_with_prefix(server, pipe, rng):
    """JSON "prefix" field routes through generate_continuation."""
    word = next(iter(pipe.tokenizer.word_index))
    feats = rng.normal(size=(128,)).astype(np.float32)
    body = json.dumps(
        {"features": feats.tolist(), "prefix": word}
    ).encode()
    status, payload = _request(server, "POST", "/caption_features", body)
    assert status == 200
    ref = pipe.generate_continuation(
        feats[None], word, method="greedy"
    )[0]
    assert payload["caption"] == ref
    assert payload["caption"].startswith(word)


def test_caption_jpeg_with_prefix_query(server, pipe, rng):
    word = next(iter(pipe.tokenizer.word_index))
    blob = _jpeg_bytes(rng, pipe.encoder.input_size)
    status, payload = _request(
        server, "POST", f"/caption?prefix={word}", blob
    )
    assert status == 200
    assert payload["caption"].startswith(word)


def test_oov_prefix_is_a_400(server, rng):
    feats = rng.normal(size=(128,)).astype(np.float32)
    body = json.dumps(
        {"features": feats.tolist(), "prefix": "zzzunknownword"}
    ).encode()
    status, payload = _request(server, "POST", "/caption_features", body)
    assert status == 400
    assert "vocabulary" in payload["error"]


def test_stream_route_rejects_prefix(server, pipe, rng):
    """The streaming routes have no forced-prefix surface: a prefix
    must be a loud 400, never a silently-unprefixed 200 stream."""
    word = next(iter(pipe.tokenizer.word_index))
    feats = rng.normal(size=(128,)).astype(np.float32)
    body = json.dumps(
        {"features": feats.tolist(), "prefix": word}
    ).encode()
    status, payload = _request(
        server, "POST", "/caption_stream_features", body
    )
    assert status == 400
    assert "prefix" in payload["error"]
    blob = _jpeg_bytes(rng, pipe.encoder.input_size)
    status, payload = _request(
        server, "POST", f"/caption_stream?prefix={word}", blob
    )
    assert status == 400
    assert "prefix" in payload["error"]


def test_demo_page(server):
    host, port = server.address
    conn = http.client.HTTPConnection(host, port, timeout=120)
    for path in ("/", "/demo"):
        conn.request("GET", path)
        resp = conn.getresponse()
        body = resp.read().decode()
        assert resp.status == 200
        assert resp.getheader("Content-Type") == "text/html"
        assert "/caption" in body and "<!doctype html>" in body
    conn.close()


def test_unknown_route_404(server):
    status, _ = _request(server, "GET", "/nope")
    assert status == 404
    status, _ = _request(server, "POST", "/nope", b"x")
    assert status == 404


def test_bad_payloads_400(server):
    status, payload = _request(server, "POST", "/caption", b"not a jpeg")
    assert status == 400 and "error" in payload
    status, payload = _request(
        server, "POST", "/caption_features", b"{\"features\": [1, 2]}"
    )
    assert status == 400  # wrong feature dim


def test_http_fuzz_hostile_payloads(server, pipe, rng):
    """Randomized hostile input sweep: every malformed body/route/query
    combination must produce a CLEAN client error (4xx/503 JSON) —
    never a 500, a hang, or a wedged server. Seeded, so failures
    reproduce."""
    import random

    r = random.Random(0)
    routes = [
        "/caption", "/caption_features", "/caption_batch",
        "/caption_stream_features", "/reload", "/nonexistent",
    ]
    bodies = [
        b"",
        b"\x00\xff" * 100,
        b"not json",
        b"{",
        b"[]",
        b'{"features": "nope"}',
        b'{"features": 42}',
        b'{"features": {"a": 1}}',
        b'{"features": [["x"]]}',
        b'{"features": [' + b"[1]," * 50 + b"[1]]}",
        b'{"bundle": 3}',
        json.dumps({"features": [1.0] * 7}).encode(),  # wrong dim
        json.dumps(
            {"features": [1.0] * 128, "include_words": 5}
        ).encode(),
        json.dumps(
            {"features": [1.0] * 128, "include_words": "dog"}
        ).encode(),
        json.dumps(
            {"features": [1.0] * 128, "model": "ghost"}
        ).encode(),
        json.dumps({"features": [[1.0] * 128] * 3}).encode(),  # list
    ]
    queries = ["", "?include_words=,,,", "?prefix=%00", "?model=ghost"]
    for _ in range(60):
        route = r.choice(routes)
        body = r.choice(bodies)
        q = r.choice(queries)
        status, payload = _request(server, "POST", route + q, body)
        # /caption_batch with a well-formed row LIST and no bad dial is
        # legitimately servable; everything else must be a clean 4xx.
        assert status in (200, 400, 403, 404, 503), (
            route, q, body[:40], status, payload,
        )
        if status != 200:
            assert "error" in payload
    # The server survived the sweep and still captions correctly.
    feats = rng.normal(size=(128,)).astype(np.float32)
    body = json.dumps({"features": feats.tolist()}).encode()
    status, payload = _request(server, "POST", "/caption_features", body)
    assert status == 200
    assert payload["caption"] == pipe.generate(
        feats[None], method="greedy"
    )[0]


def test_cli_serve_wires_model_dir(tmp_path, pipe, monkeypatch, rng):
    """`tpucap serve --model-dir` loads the bundle and builds the HTTP
    server (serve_forever patched out so the test doesn't block)."""
    from tpucap.cli.main import main

    bundle = str(tmp_path / "bundle")
    pipe.save(bundle)

    served = {}

    def fake_serve_forever(self):
        served["addr"] = self.address

    monkeypatch.setattr(
        CaptionHTTPServer, "serve_forever", fake_serve_forever
    )
    main([
        "serve", "--model-dir", bundle, "--port", "0",
        "--method", "greedy", "--max-batch", "4",
    ])
    assert "addr" in served


def test_http_503_on_overload(pipe, rng, monkeypatch):
    """max_queue exhaustion surfaces as 503 + Retry-After."""
    import time as _time

    from tpucap.serve import CaptionServer

    # Patch the dispatch point the batcher actually uses: the async
    # greedy path goes through _submit_batch (of which _run_batch is
    # just the blocking wrapper) — slowing only _run_batch leaves the
    # burst un-throttled and the 503 down to scheduling luck.
    real = CaptionServer._submit_batch

    def slow_submit(self, batch, prefixes=None, include_words=None):
        _time.sleep(0.4)
        return real(self, batch, prefixes, include_words)

    monkeypatch.setattr(CaptionServer, "_submit_batch", slow_submit)
    with CaptionHTTPServer(
        pipe, port=0, max_batch=1, max_delay_ms=1, method="greedy",
        max_queue=1,
    ) as srv:
        srv.serve_background()
        feats = rng.normal(size=(128,)).astype(np.float32)
        body = json.dumps({"features": feats.tolist()}).encode()

        import threading

        codes = []

        def post():
            status, _ = _request(srv, "POST", "/caption_features", body)
            codes.append(status)

        threads = [threading.Thread(target=post) for _ in range(6)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
    assert 503 in codes  # shed load under burst...
    assert 200 in codes  # ...while admitted requests still complete


def test_http_continuous_engine(pipe, rng):
    """engine='continuous' serves /caption_features through the
    slot-recycling path with identical captions."""
    with CaptionHTTPServer(
        pipe, port=0, max_batch=4, engine="continuous"
    ) as srv:
        srv.serve_background()
        feats = rng.normal(size=(128,)).astype(np.float32)
        body = json.dumps({"features": feats.tolist()}).encode()
        status, payload = _request(srv, "POST", "/caption_features", body)
        assert status == 200
        ref = pipe.generate(feats[None], method="greedy")[0]
        assert payload["caption"] == ref
        status, payload = _request(srv, "GET", "/stats")
        assert status == 200 and payload["features"]["requests"] >= 1


def test_http_warmup(pipe):
    with CaptionHTTPServer(
        pipe, port=0, max_batch=2, method="greedy"
    ) as srv:
        srv.warmup()  # compiles both servers' buckets; must not count
        srv.serve_background()
        status, payload = _request(srv, "GET", "/stats")
        assert status == 200
        assert payload["features"]["requests"] == 0


def test_http_continuous_beam(pipe, rng):
    """engine='continuous' + method='beam' routes /caption_features
    through the continuous BEAM engine (ADVICE r2: no silent greedy
    downgrade) with captions identical to the offline beam path."""
    with CaptionHTTPServer(
        pipe,
        port=0,
        max_batch=4,
        engine="continuous",
        method="beam",
        beam_width=2,
    ) as srv:
        srv.serve_background()
        feats = rng.normal(size=(128,)).astype(np.float32)
        body = json.dumps({"features": feats.tolist()}).encode()
        status, payload = _request(srv, "POST", "/caption_features", body)
        assert status == 200
        ref = pipe.generate(feats[None], method="beam", beam_width=2)[0]
        assert payload["caption"] == ref


def test_http_continuous_rejects_sampling(pipe):
    with pytest.raises(ValueError, match="continuous"):
        CaptionHTTPServer(
            pipe, port=0, engine="continuous", method="sampling"
        )


def test_http_continuous_images_endpoint(pipe, rng):
    """engine='continuous': POST /caption (JPEG) runs through the
    images-mode continuous engine — encoder in the admission path —
    with captions identical to the direct pipeline path."""
    size = pipe.encoder.input_size
    with CaptionHTTPServer(
        pipe, port=0, max_batch=4, engine="continuous"
    ) as srv:
        srv.serve_background()
        blob = _jpeg_bytes(rng, size)
        status, payload = _request(srv, "POST", "/caption", blob)
        assert status == 200
        x = _preprocess_jpeg(blob, size, pipe.encoder.preprocess_mode)
        feats = pipe.encode_images(x[None])
        assert payload["caption"] == pipe.generate(feats, method="greedy")[0]
        status, payload = _request(srv, "GET", "/stats")
        assert status == 200 and payload["images"]["requests"] >= 1


def test_http_continuous_concurrent_mixed_endpoints(pipe, rng):
    """Both continuous engines (images-mode /caption and features-mode
    /caption_features) serve concurrent mixed traffic correctly — two
    engine-loop threads dispatching JAX programs at once."""
    import threading

    size = pipe.encoder.input_size
    with CaptionHTTPServer(
        pipe, port=0, max_batch=4, engine="continuous"
    ) as srv:
        srv.serve_background()
        blob = _jpeg_bytes(rng, size)
        x = _preprocess_jpeg(blob, size, pipe.encoder.preprocess_mode)
        ref_img = pipe.generate(
            pipe.encode_images(x[None]), method="greedy"
        )[0]
        feats = rng.normal(size=(128,)).astype(np.float32)
        ref_feat = pipe.generate(feats[None], method="greedy")[0]
        body = json.dumps({"features": feats.tolist()}).encode()

        results = []
        lock = threading.Lock()

        def client(i):
            if i % 2:
                status, payload = _request(srv, "POST", "/caption", blob)
                want = ref_img
            else:
                status, payload = _request(
                    srv, "POST", "/caption_features", body
                )
                want = ref_feat
            with lock:
                results.append(
                    (status, payload.get("caption"), want)
                )

        threads = [
            threading.Thread(target=client, args=(i,)) for i in range(12)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=180)
        assert len(results) == 12
        for status, got, want in results:
            assert status == 200
            assert got == want


def test_serve_cli_sigterm_graceful_drain(pipe, tmp_path):
    """`tpucap serve` drains and exits 0 on SIGTERM (the orchestrator
    stop signal) instead of dying mid-batch — subprocess e2e: start,
    confirm liveness over HTTP, SIGTERM, assert the clean-drain exit."""
    import os
    import re
    import signal
    import subprocess
    import sys
    import time
    import urllib.request

    bundle = tmp_path / "bundle"
    pipe.save(str(bundle))
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.Popen(
        [
            sys.executable, "-m", "tpucap", "serve",
            "--model-dir", str(bundle), "--port", "0",
            "--method", "greedy", "--max-batch", "2", "--no-warmup",
        ],
        env=env,
        stderr=subprocess.PIPE,
        text=True,
    )
    try:
        # The CLI announces its bound address on stderr.
        addr = None
        for _ in range(600):
            line = proc.stderr.readline()
            m = re.search(r"http://([\d.]+):(\d+)", line or "")
            if m:
                addr = (m.group(1), int(m.group(2)))
                break
        assert addr, "server never announced its address"
        with urllib.request.urlopen(
            f"http://{addr[0]}:{addr[1]}/healthz", timeout=30
        ) as r:
            assert r.status == 200

        proc.send_signal(signal.SIGTERM)
        rest = proc.stderr.read()
        code = proc.wait(timeout=120)
        assert code == 0, f"exit {code}; stderr tail: {rest[-500:]}"
        assert "drained; bye" in rest
    finally:
        if proc.poll() is None:
            proc.kill()


def test_prometheus_counters_render_exactly():
    """Counters past 1e6 must render EXACTLY — %g's 6 significant
    digits would quantize requests_total so consecutive scrapes could
    read identical values while thousands of requests were served
    (breaking Prometheus rate())."""
    from tpucap.serve_http import _prometheus_text

    class FakeServer:
        def __init__(self, stats):
            self._stats = stats

        def stats(self):
            return self._stats

    big = 12_345_678  # %g would emit 1.23457e+07 (= 12,345,700)
    text = _prometheus_text(
        {
            "default": (
                None,
                FakeServer({"requests": big, "mean_batch": 3.25}),
                FakeServer({"requests": 0}),
            )
        }
    )
    assert (
        f'tpucap_requests_total{{model="default",endpoint="images"}} '
        f"{big}" in text
    )
    assert "e+0" not in text and "E+0" not in text
    assert (
        'tpucap_mean_batch_size{model="default",endpoint="images"} 3.25'
        in text
    )


def test_prometheus_metrics_endpoint(server, pipe, rng):
    """GET /metrics renders the /stats content in the Prometheus text
    exposition format: HELP/TYPE headers, per-model x endpoint labels,
    and latency quantiles as a summary once traffic has flowed."""
    # Ensure at least one features request so percentiles exist.
    feats = rng.normal(size=(128,)).astype(np.float32)
    body = json.dumps({"features": feats.tolist()}).encode()
    status, _ = _request(server, "POST", "/caption_features", body)
    assert status == 200

    host, port = server.address
    conn = http.client.HTTPConnection(host, port, timeout=120)
    conn.request("GET", "/metrics")
    resp = conn.getresponse()
    ctype = resp.getheader("Content-Type")
    text = resp.read().decode()
    conn.close()
    assert resp.status == 200
    assert ctype.startswith("text/plain") and "version=0.0.4" in ctype

    assert "# TYPE tpucap_requests_total counter" in text
    assert "# HELP tpucap_requests_total" in text
    # Per-model x endpoint series with values.
    import re as _re

    m = _re.search(
        r'tpucap_requests_total\{model="default",endpoint="features"\} '
        r"(\d+(?:\.\d+)?)",
        text,
    )
    assert m and float(m.group(1)) >= 1
    assert 'model="default",endpoint="images"' in text
    # Latency summary carries quantile labels after traffic.
    assert "# TYPE tpucap_request_latency_ms summary" in text
    assert (
        'tpucap_request_latency_ms{model="default",endpoint="features",'
        'quantile="0.5"}' in text
    )
    # Counters agree with the JSON /stats view of the same moment
    # (requests only grow, so >= the value captured above).
    status, stats = _request(server, "GET", "/stats")
    assert status == 200
    assert float(m.group(1)) <= stats["features"]["requests"]
    # Every non-comment line parses as "name{labels} value".
    for line in text.strip().splitlines():
        if line.startswith("#"):
            continue
        assert _re.fullmatch(
            r"[a-z_]+\{[^}]*\} -?\d+(?:\.\d+)?(?:e[+-]?\d+)?", line
        ), line


def test_caption_batch_row_cap_and_atomic_admission(pipe, rng, monkeypatch):
    """/caption_batch: over-cap row counts are a clean 400, and a batch
    that exceeds queue capacity rejects as a WHOLE (503) without
    leaving accepted rows behind for the batcher (ADVICE r3)."""
    import time as _time

    from tpucap.serve import CaptionServer

    real = CaptionServer._submit_batch

    def slow_submit(self, batch, prefixes=None, include_words=None):
        _time.sleep(0.3)
        return real(self, batch, prefixes, include_words)

    monkeypatch.setattr(CaptionServer, "_submit_batch", slow_submit)
    with CaptionHTTPServer(
        pipe, port=0, max_batch=1, max_delay_ms=1, method="greedy",
        max_queue=2,
    ) as srv:
        srv.serve_background()
        feats = rng.normal(size=(4, 128)).astype(np.float32)
        # Row cap = max_queue here: a 3-row request can never fit -> 400.
        body = json.dumps(
            {"features": rng.normal(size=(3, 128)).tolist()}
        ).encode()
        status, payload = _request(srv, "POST", "/caption_batch", body)
        assert status == 400 and "cap" in payload["error"]
        # Occupy the batcher, then a 2-row batch against a full queue:
        # 503 for the whole batch, queue unchanged.
        one = json.dumps({"features": feats[0].tolist()}).encode()
        two = json.dumps({"features": feats[1:3].tolist()}).encode()
        import threading

        codes = []

        def post(b):
            s, _ = _request(srv, "POST", "/caption_batch" if b is two
                            else "/caption_features", b)
            codes.append(s)

        threads = [threading.Thread(target=post, args=(b,))
                   for b in (one, one, one, two, two, two)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
        assert 503 in codes  # shed under burst
        assert 200 in codes  # admitted work still completes
        # Server still healthy afterwards.
        status, payload = _request(
            srv, "POST", "/caption_batch",
            json.dumps({"features": feats[:2].tolist()}).encode(),
        )
        assert status == 200 and len(payload["captions"]) == 2


def test_caption_batch_images_one_threaded_decode_call(
    server, pipe, rng, monkeypatch
):
    """Images-mode /caption_batch must decode the WHOLE request with ONE
    decode_jpeg_batch call (the C++ pool threads across the batch;
    per-row calls would serialize host decode for exactly the batched
    serving shape the endpoint exists for)."""
    import base64

    from tpucap.ops import jpeg as jpeg_mod

    calls = []
    real = jpeg_mod.decode_jpeg_batch

    def counting(blobs, size, **kw):
        calls.append(len(blobs))
        return real(blobs, size, **kw)

    monkeypatch.setattr(jpeg_mod, "decode_jpeg_batch", counting)
    size = pipe.encoder.input_size
    blobs = [_jpeg_bytes(rng, size) for _ in range(3)]
    body = json.dumps(
        {"images_b64": [base64.b64encode(b).decode() for b in blobs]}
    ).encode()
    status, payload = _request(server, "POST", "/caption_batch", body)
    assert status == 200 and len(payload["captions"]) == 3
    assert calls == [3], calls  # one call, all rows
    # And the captions match the direct (single-image) serving path.
    for blob, cap in zip(blobs, payload["captions"]):
        s, p = _request(server, "POST", "/caption", blob)
        assert s == 200 and p["caption"] == cap


def test_caption_batch_images_cap_checked_before_decode(
    pipe, rng, monkeypatch
):
    """An over-cap images_b64 request must get its 400 from the row
    count ALONE — before any base64/JPEG work is spent on it."""
    import base64

    from tpucap.ops import jpeg as jpeg_mod

    def exploding(blobs, size, **kw):
        raise AssertionError(
            "decode ran for an over-cap request (cap must precede work)"
        )

    size = pipe.encoder.input_size
    blob64 = base64.b64encode(_jpeg_bytes(rng, size)).decode()
    with CaptionHTTPServer(
        pipe, port=0, max_batch=2, max_delay_ms=1, method="greedy",
        max_queue=2,
    ) as srv:
        srv.serve_background()
        monkeypatch.setattr(jpeg_mod, "decode_jpeg_batch", exploding)
        body = json.dumps({"images_b64": [blob64] * 3}).encode()
        status, payload = _request(srv, "POST", "/caption_batch", body)
        assert status == 400 and "cap is 2" in payload["error"]


def test_request_body_ceiling_413(pipe, rng):
    """POST bodies over max_body_bytes are rejected 413 from the
    declared Content-Length alone (nothing oversized is buffered), on
    every route, and the server keeps serving afterwards."""
    with CaptionHTTPServer(
        pipe, port=0, max_batch=4, max_delay_ms=1, method="greedy",
        max_body_bytes=4096,
    ) as srv:
        srv.serve_background()
        big = b"x" * 8192
        for route in (
            "/caption", "/caption_features", "/caption_batch",
            "/caption_stream", "/reload", "/nonexistent",
        ):
            status, payload = _request(srv, "POST", route, big)
            assert status == 413 and "error" in payload, (route, status)
        # Oversized-payload fuzz tail: hostile declared lengths must be
        # clean client errors, never 500s or hangs.
        host, port = srv.address
        for clen in ("999999999999", "nan", "-5", "1e9"):
            conn = http.client.HTTPConnection(host, port, timeout=30)
            conn.putrequest("POST", "/caption_features")
            conn.putheader("Content-Length", clen)
            conn.endheaders()
            resp = conn.getresponse()
            assert resp.status in (400, 413), (clen, resp.status)
            json.loads(resp.read())
            conn.close()
        # Under the ceiling still serves.
        feats = rng.normal(size=(128,)).astype(np.float32)
        body = json.dumps({"features": feats.tolist()}).encode()
        status, payload = _request(
            srv, "POST", "/caption_features", body
        )
        assert status == 200
        assert payload["caption"] == pipe.generate(
            feats[None], method="greedy"
        )[0]


def test_caption_batch_per_row_prefixes(server, pipe, rng):
    """/caption_batch "prefixes" (r5): each row gets its own forced
    opening; mixing with shared dials or wrong lengths is a 400."""
    words = list(pipe.tokenizer.word_index)[:2]
    feats = rng.normal(size=(3, 128)).astype(np.float32)
    body = json.dumps(
        {
            "features": feats.tolist(),
            "prefixes": [words[0], "", words[1]],
        }
    ).encode()
    status, payload = _request(server, "POST", "/caption_batch", body)
    assert status == 200
    caps = payload["captions"]
    assert caps[0] == pipe.generate_continuation(
        feats[:1], words[0], method="greedy"
    )[0]
    assert caps[1] == pipe.generate(feats[1:2], method="greedy")[0]
    assert caps[2].startswith(words[1])
    # Shared + per-row together -> 400.
    status, payload = _request(
        server, "POST", "/caption_batch",
        json.dumps(
            {
                "features": feats.tolist(),
                "prefix": words[0],
                "prefixes": [words[0], "", ""],
            }
        ).encode(),
    )
    assert status == 400 and "not both" in payload["error"]
    # Wrong length -> 400 naming the expectation.
    status, payload = _request(
        server, "POST", "/caption_batch",
        json.dumps(
            {"features": feats.tolist(), "prefixes": [words[0]]}
        ).encode(),
    )
    assert status == 400 and "one entry per row" in payload["error"]
    # Bad row dial -> 400 naming the row, server stays healthy.
    status, payload = _request(
        server, "POST", "/caption_batch",
        json.dumps(
            {
                "features": feats.tolist(),
                "prefixes": ["zzzunknownword", "", ""],
            }
        ).encode(),
    )
    assert status == 400 and "row 0" in payload["error"]
    status, payload = _request(
        server, "POST", "/caption_batch",
        json.dumps({"features": feats.tolist()}).encode(),
    )
    assert status == 200 and len(payload["captions"]) == 3
