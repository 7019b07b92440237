"""Multi-model serving (serve_http.py extra_models): several pipelines
behind one port, routed by ?model= / a "model" JSON field, each with its
own micro-batcher; per-model stats, per-model reload, and the guards."""

import http.client
import json

import numpy as np
import pytest

from tpucap.config import Config, DecodeConfig, DecoderConfig, EncoderConfig
from tpucap.pipeline import CaptioningPipeline
from tpucap.serve_http import CaptionHTTPServer
from tpucap.text import Tokenizer


def _pipe(toy_corpus, *, hidden, seed):
    cfg = Config(
        encoder=EncoderConfig(name="tiny_cnn", feature_dim=128),
        decoder=DecoderConfig(
            embed_dim=16, hidden_dim=hidden, dropout_rate=0.0
        ),
        decode=DecodeConfig(max_len=10),
    )
    import jax

    p = CaptioningPipeline(cfg)
    tok = Tokenizer()
    tok.fit_on_texts(toy_corpus)
    p.tokenizer = tok
    p.build(rng=jax.random.key(seed))
    return p


@pytest.fixture(scope="module")
def pipes(toy_corpus):
    # Different widths AND different init seeds: the two models caption
    # the same features differently, so routing mistakes can't pass.
    return (
        _pipe(toy_corpus, hidden=32, seed=0),
        _pipe(toy_corpus, hidden=16, seed=7),
    )


@pytest.fixture(scope="module")
def server(pipes):
    a, b = pipes
    srv = CaptionHTTPServer(
        a,
        port=0,
        max_batch=4,
        max_delay_ms=5,
        method="greedy",
        allow_reload=True,
        extra_models={"b": b},
    )
    srv.serve_background()
    yield srv
    srv.close()


def _request(server, method, path, body=None):
    host, port = server.address
    conn = http.client.HTTPConnection(host, port, timeout=120)
    conn.request(method, path, body=body)
    resp = conn.getresponse()
    payload = json.loads(resp.read())
    conn.close()
    return resp.status, payload


def _features_body(feats, **extra):
    return json.dumps({"features": feats.tolist(), **extra}).encode()


def test_routes_to_each_model(server, pipes, rng):
    a, b = pipes
    feats = rng.normal(size=(128,)).astype(np.float32)
    want_a = a.generate(feats[None], method="greedy")[0]
    want_b = b.generate(feats[None], method="greedy")[0]
    assert want_a != want_b  # the fixture's premise

    status, payload = _request(
        server, "POST", "/caption_features", _features_body(feats)
    )
    assert status == 200 and payload["caption"] == want_a

    # query-param routing
    status, payload = _request(
        server,
        "POST",
        "/caption_features?model=b",
        _features_body(feats),
    )
    assert status == 200 and payload["caption"] == want_b

    # JSON-field routing
    status, payload = _request(
        server,
        "POST",
        "/caption_features",
        _features_body(feats, model="b"),
    )
    assert status == 200 and payload["caption"] == want_b

    # explicit default
    status, payload = _request(
        server,
        "POST",
        "/caption_features?model=default",
        _features_body(feats),
    )
    assert status == 200 and payload["caption"] == want_a


def test_unknown_model_400(server, rng):
    feats = rng.normal(size=(128,)).astype(np.float32)
    status, payload = _request(
        server,
        "POST",
        "/caption_features?model=nope",
        _features_body(feats),
    )
    assert status == 400
    assert "unknown model" in payload["error"]
    assert "'b'" in payload["error"]  # the error names what IS served


def test_per_model_stats(server):
    status, payload = _request(server, "GET", "/stats")
    assert status == 200
    assert set(payload) == {"default", "b"}
    assert payload["b"]["features"]["requests"] >= 2


def test_per_model_metrics(server):
    """GET /metrics labels every series with its model name."""
    host, port = server.address
    conn = http.client.HTTPConnection(host, port, timeout=120)
    conn.request("GET", "/metrics")
    resp = conn.getresponse()
    text = resp.read().decode()
    conn.close()
    assert resp.status == 200
    for model in ("default", "b"):
        for endpoint in ("images", "features"):
            assert (
                f'tpucap_requests_total{{model="{model}",'
                f'endpoint="{endpoint}"}}'
            ) in text


def test_per_model_reload(server, pipes, tmp_path_factory, rng):
    """Reload model 'b' from a retrained bundle: b's captions change,
    the default model's stay — isolation under one port."""
    a, b = pipes
    feats = rng.normal(size=(128,)).astype(np.float32)
    before_a = a.generate(feats[None], method="greedy")[0]

    tmp = tmp_path_factory.mktemp("bundle")
    import jax

    # Same topology/tokenizer/config, different weights: write the swap
    # bundle by temporarily re-pointing b's params at a fresh init.
    new_params = {
        "encoder": b.params["encoder"],
        "decoder": b.decoder.init(jax.random.key(99)),
    }
    old_params = b.params
    b.params = new_params
    b.save(str(tmp / "b2"))
    b.params = old_params

    status, payload = _request(
        server,
        "POST",
        "/reload",
        json.dumps({"bundle": str(tmp / "b2"), "model": "b"}).encode(),
    )
    assert status == 200 and payload["ok"]

    import copy

    swapped = copy.copy(b)
    swapped.params = new_params
    want_new = swapped.generate(feats[None], method="greedy")[0]
    status, payload = _request(
        server,
        "POST",
        "/caption_features?model=b",
        _features_body(feats),
    )
    assert status == 200 and payload["caption"] == want_new

    status, payload = _request(
        server, "POST", "/caption_features", _features_body(feats)
    )
    assert status == 200 and payload["caption"] == before_a


def test_guards(pipes):
    a, b = pipes
    with pytest.raises(ValueError, match="engine='batch'"):
        CaptionHTTPServer(
            a, port=0, engine="continuous", extra_models={"b": b}
        )
    with pytest.raises(ValueError, match="default"):
        CaptionHTTPServer(a, port=0, extra_models={"default": b})


def test_cli_extra_model_spec_validation():
    from tpucap.cli.main import main

    with pytest.raises(SystemExit, match="NAME=BUNDLE_DIR"):
        main(["serve", "--extra-model", "nodirspec", "--port", "0"])
