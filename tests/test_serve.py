"""Micro-batching caption server (tpucap/serve.py): coalesced batches
produce the same captions as a direct pipeline.generate call, bucket
padding keeps program shapes on the power-of-two ladder, backlog is
drained on close, and bad requests fail their own future without killing
the server."""

import threading

import numpy as np
import pytest

from tpucap.config import Config, DecodeConfig, DecoderConfig, EncoderConfig
from tpucap.pipeline import CaptioningPipeline
from tpucap.serve import CaptionServer, _buckets
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


def test_bucket_ladder():
    assert _buckets(64) == [1, 2, 4, 8, 16, 32, 64]
    assert _buckets(1) == [1]
    assert _buckets(6) == [1, 2, 4, 6]  # non-power-of-two max included


def test_serve_matches_direct_generate(pipe, rng):
    feats = rng.normal(size=(7, 128)).astype(np.float32)
    ref = pipe.generate(feats, method="beam", beam_width=3)
    with CaptionServer(
        pipe, max_batch=8, max_delay_ms=50, method="beam", beam_width=3
    ) as srv:
        futs = [srv.submit(f) for f in feats]
        got = [f.result(timeout=120) for f in futs]
    assert got == ref


def test_concurrent_submitters_coalesce(pipe, rng):
    feats = rng.normal(size=(12, 128)).astype(np.float32)
    ref = pipe.generate(feats, method="greedy")
    srv = CaptionServer(
        pipe, max_batch=16, max_delay_ms=100, method="greedy"
    )
    results = [None] * len(feats)

    def client(i):
        results[i] = srv.caption(feats[i], timeout=120)

    threads = [
        threading.Thread(target=client, args=(i,))
        for i in range(len(feats))
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    srv.close()
    assert results == ref
    s = srv.stats()
    assert s["requests"] == 12
    # 100ms window + concurrent submits: far fewer batches than requests.
    assert s["batches"] < 12
    assert s["p50_ms"] is not None


def test_padding_stays_on_bucket_ladder(pipe, rng):
    """5 requests in one window -> bucket 8 (3 padded rows), not shape 5."""
    feats = rng.normal(size=(5, 128)).astype(np.float32)
    with CaptionServer(
        pipe, max_batch=8, max_delay_ms=200, method="greedy"
    ) as srv:
        futs = [srv.submit(f) for f in feats]
        caps = [f.result(timeout=120) for f in futs]
    assert caps == pipe.generate(feats, method="greedy")
    s = srv.stats()
    assert s["batches"] == 1
    assert s["padded_rows"] == 3


def test_close_drains_backlog(pipe, rng):
    """Requests enqueued before close() still resolve."""
    feats = rng.normal(size=(6, 128)).astype(np.float32)
    srv = CaptionServer(pipe, max_batch=2, max_delay_ms=1, method="greedy")
    futs = [srv.submit(f) for f in feats]
    srv.close()
    caps = [f.result(timeout=120) for f in futs]
    assert caps == pipe.generate(feats, method="greedy")
    with pytest.raises(RuntimeError, match="closed"):
        srv.submit(feats[0])
    srv.close()  # idempotent


def test_bad_request_shape_rejected_immediately(pipe):
    with CaptionServer(pipe, max_batch=4, method="greedy") as srv:
        with pytest.raises(ValueError, match="request shape"):
            srv.submit(np.zeros((64,), np.float32))


def test_warmup_compiles_every_bucket(pipe):
    with CaptionServer(
        pipe, max_batch=4, max_delay_ms=1, method="greedy"
    ) as srv:
        srv.warmup()  # must not raise; compiles buckets 1/2/4
        assert srv.stats()["requests"] == 0  # warmup is not traffic


def test_images_mode_runs_encoder(pipe, rng):
    size = pipe.encoder.input_size
    imgs = rng.normal(size=(3, size, size, 3)).astype(np.float32)
    feats = pipe.encode_images(imgs)
    ref = pipe.generate(feats, method="greedy")
    with CaptionServer(
        pipe, mode="images", max_batch=4, max_delay_ms=100, method="greedy"
    ) as srv:
        futs = [srv.submit(im) for im in imgs]
        got = [f.result(timeout=120) for f in futs]
    assert got == ref


def test_generate_submit_matches_generate(pipe, rng):
    feats = rng.normal(size=(4, 128)).astype(np.float32)
    for method in ("greedy", "beam"):
        ref = pipe.generate(feats, method=method)
        got = pipe.generate_submit(feats, method=method)()
        assert got == ref
    with pytest.raises(ValueError, match="greedy|beam"):
        pipe.generate_submit(feats, method="sample")


def test_pipelined_depth_preserves_results(pipe, rng):
    """depth>1 overlapping batches returns every caption correctly even
    when many small batches are in flight at once."""
    feats = rng.normal(size=(9, 128)).astype(np.float32)
    ref = pipe.generate(feats, method="greedy")
    with CaptionServer(
        pipe, max_batch=2, max_delay_ms=1, method="greedy",
        pipeline_depth=3,
    ) as srv:
        futs = [srv.submit(f) for f in feats]
        got = [f.result(timeout=120) for f in futs]
    assert got == ref


def test_serve_with_dp_parallelism(toy_corpus, rng):
    """parallelism='dp' routes batches through the mesh-sharded decode
    (sync path) — captions identical to the single-device server."""
    from tpucap.config import MeshConfig

    cfg = Config(
        encoder=EncoderConfig(name="tiny_cnn", feature_dim=128),
        decoder=DecoderConfig(embed_dim=16, hidden_dim=32, dropout_rate=0.0),
        decode=DecodeConfig(max_len=10),
        mesh=MeshConfig(),
    )
    p = CaptioningPipeline(cfg)
    tok = Tokenizer()
    tok.fit_on_texts(toy_corpus)
    p.tokenizer = tok
    p.build()

    feats = rng.normal(size=(6, 128)).astype(np.float32)
    ref = p.generate(feats, method="beam", beam_width=3)
    with CaptionServer(
        p, max_batch=8, max_delay_ms=100, method="beam", beam_width=3,
        parallelism="dp",
    ) as srv:
        futs = [srv.submit(f) for f in feats]
        got = [f.result(timeout=180) for f in futs]
    assert got == ref


def test_serve_spatial_features_attention(toy_corpus, rng):
    """Attention-decoder serving: requests are (positions, C) spatial
    grids matching the ENCODER's own grid (tiny_cnn: 4x4=16 — the
    expected shape must come from encoder.spatial_positions, not a
    hardcoded 14x14); captions match direct generate."""
    cfg = Config(
        encoder=EncoderConfig(
            name="tiny_cnn", feature_dim=32, features="spatial"
        ),
        decoder=DecoderConfig(
            name="attention", embed_dim=16, hidden_dim=32, dropout_rate=0.0
        ),
        decode=DecodeConfig(max_len=10),
    )
    p = CaptioningPipeline(cfg)
    tok = Tokenizer()
    tok.fit_on_texts(toy_corpus)
    p.tokenizer = tok
    p.build()

    assert p.encoder.spatial_positions == 16  # tiny_cnn 4x4 grid
    feats = rng.normal(size=(5, 16, 32)).astype(np.float32)
    ref = p.generate(feats, method="beam", beam_width=3)
    with CaptionServer(
        p, max_batch=8, max_delay_ms=100, method="beam", beam_width=3
    ) as srv:
        with pytest.raises(ValueError, match="request shape"):
            srv.submit(np.zeros((32,), np.float32))  # pooled shape rejected
        futs = [srv.submit(f) for f in feats]
        got = [f.result(timeout=120) for f in futs]
    assert got == ref


def test_backpressure_max_queue(pipe, rng, monkeypatch):
    """A full queue rejects with Overloaded instead of growing without
    bound; earlier requests still complete."""
    import time as _time

    from tpucap.serve import Overloaded

    feats = rng.normal(size=(8, 128)).astype(np.float32)
    real = CaptionServer._run_batch

    def slow_run(self, batch):
        _time.sleep(0.5)
        return real(self, batch)

    monkeypatch.setattr(CaptionServer, "_run_batch", slow_run)
    srv = CaptionServer(
        pipe, max_batch=1, max_delay_ms=1, method="greedy", max_queue=2
    )
    try:
        first = srv.submit(feats[0])  # batcher picks this up
        _time.sleep(0.1)
        held = [srv.submit(f) for f in feats[1:3]]  # fills the queue
        with pytest.raises(Overloaded, match="max_queue"):
            srv.submit(feats[3])
        assert isinstance(first.result(timeout=120), str)
        for f in held:
            assert isinstance(f.result(timeout=120), str)
    finally:
        srv.close()


def test_close_fails_pending_futures_when_wedged(pipe, rng, monkeypatch):
    """A wedged batcher (stuck in device dispatch) must not leave
    accepted requests' futures unresolved forever: close(timeout=...)
    fails them with TimeoutError (ADVICE r2 low #4)."""
    import time as _time

    release = []

    def wedged_submit(feats, **kw):
        while not release:  # park the batcher like a hung compile
            _time.sleep(0.02)
        raise RuntimeError("unparked")

    srv = CaptionServer(pipe, max_batch=2, max_delay_ms=1, method="greedy")
    monkeypatch.setattr(pipe, "generate_submit", wedged_submit)
    fut = srv.submit(rng.normal(size=(128,)).astype(np.float32))
    srv.close(timeout=0.5)
    with pytest.raises(TimeoutError, match="did not drain"):
        fut.result(timeout=10)
    # Recovery: close() re-put the shutdown sentinel after draining, so
    # the unparked batcher terminates instead of parking forever.
    release.append(True)
    srv._thread.join(timeout=30)
    assert not srv._thread.is_alive()


def test_submit_many_matches_direct_generate(pipe, rng):
    feats = rng.normal(size=(5, 128)).astype(np.float32)
    ref = pipe.generate(feats, method="greedy")
    with CaptionServer(
        pipe, max_batch=8, max_delay_ms=50, method="greedy"
    ) as srv:
        futs = srv.submit_many(feats)
        got = [f.result(timeout=120) for f in futs]
    assert got == ref
    # Shape contract: a single row is not a row LIST.
    with CaptionServer(
        pipe, max_batch=8, max_delay_ms=1, method="greedy"
    ) as srv:
        with pytest.raises(ValueError, match="submit_many"):
            srv.submit_many(feats[0])
        assert srv.submit_many(feats[:0]) == []


def test_submit_many_is_atomic_under_overload(pipe, rng, monkeypatch):
    """A multi-row submit that exceeds queue capacity is rejected as a
    WHOLE — no rows enqueue, so the batcher never decodes work for a
    client that already got its Overloaded back (ADVICE r3)."""
    import time as _time

    from tpucap.serve import Overloaded

    feats = rng.normal(size=(8, 128)).astype(np.float32)
    real = CaptionServer._run_batch

    def slow_run(self, batch):
        _time.sleep(0.5)
        return real(self, batch)

    monkeypatch.setattr(CaptionServer, "_run_batch", slow_run)
    srv = CaptionServer(
        pipe, max_batch=1, max_delay_ms=1, method="greedy", max_queue=3
    )
    try:
        first = srv.submit(feats[0])  # batcher picks this up
        _time.sleep(0.1)
        held = srv.submit_many(feats[1:3])  # 2 of 3 capacity
        before = srv._queue.qsize()
        with pytest.raises(Overloaded, match="max_queue"):
            srv.submit_many(feats[3:6])  # 3 rows > 1 remaining slot
        assert srv._queue.qsize() == before  # nothing half-admitted
        assert isinstance(first.result(timeout=120), str)
        for f in held:
            assert isinstance(f.result(timeout=120), str)
    finally:
        srv.close()


def test_submit_many_per_row_dials(pipe, rng):
    """Per-row prefixes (r5): each row decodes with its OWN forced
    opening, matching per-row generate_continuation; rows with "" take
    the plain path — all in one atomic admission."""
    words = list(pipe.tokenizer.word_index)[:2]
    feats = rng.normal(size=(3, 128)).astype(np.float32)
    prefixes = [words[0], "", words[1]]
    with CaptionServer(
        pipe, max_batch=8, max_delay_ms=50, method="greedy"
    ) as srv:
        futs = srv.submit_many(feats, prefixes=prefixes)
        got = [f.result(timeout=120) for f in futs]
    assert got[0] == pipe.generate_continuation(
        feats[:1], words[0], method="greedy"
    )[0]
    assert got[1] == pipe.generate(feats[1:2], method="greedy")[0]
    assert got[2] == pipe.generate_continuation(
        feats[2:], words[1], method="greedy"
    )[0]
    assert got[0].startswith(words[0]) and got[2].startswith(words[1])


def test_submit_many_per_row_dial_validation(pipe, rng):
    """Per-row dial errors are atomic (nothing enqueues) and name the
    offending row; shared + per-row dials together are refused; length
    mismatches are refused."""
    feats = rng.normal(size=(3, 128)).astype(np.float32)
    word = next(iter(pipe.tokenizer.word_index))
    with CaptionServer(
        pipe, max_batch=8, max_delay_ms=1, method="greedy"
    ) as srv:
        with pytest.raises(ValueError, match="row 1"):
            srv.submit_many(
                feats, prefixes=[word, "zzzunknownword", word]
            )
        assert srv._queue.qsize() == 0  # bad row admitted nothing
        with pytest.raises(ValueError, match="not.*both|OR"):
            srv.submit_many(
                feats, prefix=word, prefixes=[word, "", ""]
            )
        with pytest.raises(ValueError, match="match the 3 rows"):
            srv.submit_many(feats, prefixes=[word])
        with pytest.raises(ValueError, match="LIST"):
            srv.submit_many(feats, prefixes=word)
        # Server still healthy.
        futs = srv.submit_many(feats, prefixes=[word, "", ""])
        caps = [f.result(timeout=120) for f in futs]
        assert len(caps) == 3 and caps[0].startswith(word)
