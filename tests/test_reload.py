"""Zero-downtime weight hot-reload: pipeline.reload_params +
CaptionServer.reload / ContinuousCaptionServer.reload + POST /reload.

The contract: a validated same-topology weight swap — requests before
the reload resolve under the old weights, later ones under the new;
validation failures fail the reload future and the old weights keep
serving; the batch server recompiles NOTHING (its programs take params
as arguments)."""

import json

import numpy as np
import pytest

from tpucap.config import Config, DecodeConfig, DecoderConfig, EncoderConfig
from tpucap.pipeline import CaptioningPipeline
from tpucap.text import Tokenizer


def _pipe(toy_corpus, **decoder_kw):
    kw = dict(embed_dim=8, hidden_dim=16, dropout_rate=0.0)
    kw.update(decoder_kw)
    cfg = Config(
        encoder=EncoderConfig(name="tiny_cnn", feature_dim=32),
        decoder=DecoderConfig(**kw),
        decode=DecodeConfig(max_len=8),
    )
    p = CaptioningPipeline(cfg)
    tok = Tokenizer()
    tok.fit_on_texts(toy_corpus)
    p.tokenizer = tok
    p.build()
    return p


def _end_biased(p, bump=10.0):
    """A same-topology variant whose captions observably differ: the
    vocab head is biased hard toward endseq (captions become empty)."""
    import copy

    import jax.numpy as jnp

    end_id = p.tokenizer.word_index["endseq"]
    new = copy.deepcopy(p.params)
    out = new["decoder"]["out"]
    out["bias"] = jnp.asarray(out["bias"]).at[end_id].add(bump)
    return new


# ---------------------------------------------------------------------------
# pipeline.reload_params
# ---------------------------------------------------------------------------


def test_reload_params_from_tree(toy_corpus, rng):
    p = _pipe(toy_corpus)
    feats = rng.normal(size=(2, 32)).astype(np.float32)
    before = p.generate(feats, method="greedy")
    new = _end_biased(p)
    p.reload_params(new)
    after = p.generate(feats, method="greedy")
    assert after == ["", ""]
    assert before != after


def test_reload_params_keeps_compiled_programs(toy_corpus, rng):
    """Weight-only reload must not retrace: the decode cache keeps the
    same program objects and no new entries appear."""
    p = _pipe(toy_corpus)
    feats = rng.normal(size=(2, 32)).astype(np.float32)
    p.generate(feats, method="greedy")
    cache_before = dict(p._decode_cache)
    p.reload_params(_end_biased(p))
    p.generate(feats, method="greedy")
    assert dict(p._decode_cache) == cache_before


def test_reload_params_from_bundle(toy_corpus, rng, tmp_path):
    p = _pipe(toy_corpus)
    feats = rng.normal(size=(2, 32)).astype(np.float32)
    donor = _pipe(toy_corpus)
    donor.params = _end_biased(donor)
    donor.save(str(tmp_path / "bundle"))
    p.reload_params(str(tmp_path / "bundle"))
    assert p.generate(feats, method="greedy") == ["", ""]


def test_reload_params_rejects_topology_change(toy_corpus, rng, tmp_path):
    p = _pipe(toy_corpus)
    other = _pipe(toy_corpus, hidden_dim=32)
    other.save(str(tmp_path / "bundle"))
    with pytest.raises(ValueError, match="config differs"):
        p.reload_params(str(tmp_path / "bundle"))
    # Tree-source topology mismatch is caught by shape validation.
    with pytest.raises(ValueError, match="changed|structure"):
        p.reload_params(other.params)


def test_reload_params_rejects_tokenizer_change(toy_corpus, tmp_path):
    p = _pipe(toy_corpus)
    donor = _pipe(toy_corpus)
    tok = Tokenizer()
    tok.fit_on_texts(toy_corpus[:2])  # different vocab
    donor.tokenizer = tok
    donor.save(str(tmp_path / "bundle"))
    with pytest.raises(ValueError, match="tokenizer differs"):
        p.reload_params(str(tmp_path / "bundle"))


# ---------------------------------------------------------------------------
# CaptionServer.reload (batch micro-batcher)
# ---------------------------------------------------------------------------


def test_caption_server_reload(toy_corpus, rng):
    from tpucap.serve import CaptionServer

    p = _pipe(toy_corpus)
    feats = rng.normal(size=(2, 32)).astype(np.float32)
    old = p.generate(feats, method="greedy")
    new_params = _end_biased(p)
    with CaptionServer(
        p, max_batch=2, max_delay_ms=5, method="greedy"
    ) as srv:
        assert srv.submit(feats[0]).result(timeout=180) == old[0]
        assert srv.reload(new_params).result(timeout=180) is True
        assert srv.submit(feats[0]).result(timeout=180) == ""


def test_caption_server_reload_failure_keeps_serving(toy_corpus, rng):
    from tpucap.serve import CaptionServer

    p = _pipe(toy_corpus)
    other = _pipe(toy_corpus, hidden_dim=32)
    feats = rng.normal(size=(2, 32)).astype(np.float32)
    old = p.generate(feats, method="greedy")
    with CaptionServer(
        p, max_batch=2, max_delay_ms=5, method="greedy"
    ) as srv:
        fut = srv.reload(other.params)
        with pytest.raises(ValueError, match="changed|structure"):
            fut.result(timeout=180)
        # Old weights keep serving.
        assert srv.submit(feats[0]).result(timeout=180) == old[0]


def test_caption_server_reload_ordering(toy_corpus, rng):
    """Requests submitted before the reload resolve under the old
    weights; requests after it under the new — even when everything is
    enqueued in one burst."""
    from tpucap.serve import CaptionServer

    p = _pipe(toy_corpus)
    feats = rng.normal(size=(4, 32)).astype(np.float32)
    old = p.generate(feats, method="greedy")
    assert old[0] != ""  # untrained argmax decodes SOMETHING
    new_params = _end_biased(p)
    with CaptionServer(
        p, max_batch=4, max_delay_ms=200, method="greedy"
    ) as srv:
        f_before = [srv.submit(feats[i]) for i in range(2)]
        f_reload = srv.reload(new_params)
        f_after = [srv.submit(feats[i]) for i in range(2, 4)]
        assert [f.result(timeout=180) for f in f_before] == old[:2]
        assert f_reload.result(timeout=180) is True
        assert [f.result(timeout=180) for f in f_after] == ["", ""]


# ---------------------------------------------------------------------------
# ContinuousCaptionServer.reload (engine rebuild)
# ---------------------------------------------------------------------------


def test_continuous_server_reload(toy_corpus, rng):
    from tpucap.serve import ContinuousCaptionServer

    p = _pipe(toy_corpus)
    feats = rng.normal(size=(2, 32)).astype(np.float32)
    old = p.generate(feats, method="greedy")
    new_params = _end_biased(p)
    with ContinuousCaptionServer(p, slots=4, ticks_per_sync=2) as srv:
        assert srv.submit(feats[0]).result(timeout=180) == old[0]
        assert srv.reload(new_params).result(timeout=180) is True
        assert srv.submit(feats[0]).result(timeout=180) == ""


def test_continuous_server_reload_failure_keeps_serving(toy_corpus, rng):
    from tpucap.serve import ContinuousCaptionServer

    p = _pipe(toy_corpus)
    other = _pipe(toy_corpus, hidden_dim=32)
    feats = rng.normal(size=(1, 32)).astype(np.float32)
    old = p.generate(feats, method="greedy")
    with ContinuousCaptionServer(p, slots=4, ticks_per_sync=2) as srv:
        fut = srv.reload(other.params)
        with pytest.raises(ValueError, match="changed|structure"):
            fut.result(timeout=180)
        assert srv.submit(feats[0]).result(timeout=180) == old[0]


# ---------------------------------------------------------------------------
# HTTP admin endpoint
# ---------------------------------------------------------------------------


def _http(server, method, path, body=None):
    import http.client

    host, port = server.address
    conn = http.client.HTTPConnection(host, port, timeout=300)
    conn.request(method, path, body=body)
    resp = conn.getresponse()
    payload = json.loads(resp.read())
    conn.close()
    return resp.status, payload


def test_http_reload_disabled_by_default(toy_corpus, rng):
    from tpucap.serve_http import CaptionHTTPServer

    p = _pipe(toy_corpus)
    with CaptionHTTPServer(p, port=0, max_batch=2) as srv:
        srv.serve_background()
        status, payload = _http(
            srv, "POST", "/reload", json.dumps({"bundle": "/x"}).encode()
        )
    assert status == 403
    assert "disabled" in payload["error"]


def test_http_reload_swaps_weights(toy_corpus, rng, tmp_path):
    from tpucap.serve_http import CaptionHTTPServer

    p = _pipe(toy_corpus)
    donor = _pipe(toy_corpus)
    donor.params = _end_biased(donor)
    bundle = str(tmp_path / "bundle")
    donor.save(bundle)

    feats = rng.normal(size=(32,)).astype(np.float32)
    old = p.generate(feats[None], method="greedy")[0]
    with CaptionHTTPServer(
        p, port=0, max_batch=2, method="greedy", allow_reload=True
    ) as srv:
        srv.serve_background()
        body = json.dumps({"features": feats.tolist()}).encode()
        status, payload = _http(srv, "POST", "/caption_features", body)
        assert status == 200 and payload["caption"] == old
        status, payload = _http(
            srv, "POST", "/reload",
            json.dumps({"bundle": bundle}).encode(),
        )
        assert status == 200 and payload["ok"] is True
        status, payload = _http(srv, "POST", "/caption_features", body)
        assert status == 200 and payload["caption"] == ""


def test_http_reload_batch_restores_once(toy_corpus, rng, tmp_path):
    """The batch endpoint servers share one pipeline whose programs take
    params as arguments — POST /reload must swap (and restore the bundle
    from disk) exactly once, not once per endpoint server."""
    from tpucap.serve_http import CaptionHTTPServer

    p = _pipe(toy_corpus)
    donor = _pipe(toy_corpus)
    donor.params = _end_biased(donor)
    bundle = str(tmp_path / "bundle")
    donor.save(bundle)

    calls = []
    orig = p.reload_params
    p.reload_params = lambda src: (calls.append(src), orig(src))[1]

    feats = rng.normal(size=(32,)).astype(np.float32)
    body = json.dumps({"features": feats.tolist()}).encode()
    with CaptionHTTPServer(
        p, port=0, max_batch=2, method="greedy", allow_reload=True
    ) as srv:
        srv.serve_background()
        status, payload = _http(
            srv, "POST", "/reload", json.dumps({"bundle": bundle}).encode()
        )
        assert status == 200 and payload["ok"] is True
        # the swap serves BOTH endpoints (shared pipeline)
        status, payload = _http(srv, "POST", "/caption_features", body)
        assert status == 200 and payload["caption"] == ""
    assert calls == [bundle]


def test_http_allow_reload_needs_reloadable_model(toy_corpus):
    """allow_reload=True with a model that has no reload_params (an AOT
    artifact) fails at construction, not on the first POST /reload."""
    from tpucap.serve_http import CaptionHTTPServer

    class Frozen:  # AotCaptioner-shaped: no reload_params
        pass

    with pytest.raises(ValueError, match="no reload_params"):
        CaptionHTTPServer(Frozen(), port=0, allow_reload=True)
