"""Streaming training input (fit(stream=True)): per-batch feature
assembly from a lazy mapping + background prefetch must produce the
IDENTICAL training trajectory to the in-memory path, while never
materializing the full (N, F) feature stack.
"""

import threading

import numpy as np
import pytest

from tpucap.config import (
    Config,
    DecodeConfig,
    DecoderConfig,
    EncoderConfig,
)
from tpucap.data.pipeline import caption_batch_stream, prefetch_iterator
from tpucap.pipeline import CaptioningPipeline
from tpucap.text import Tokenizer

FEAT = 32


def make_pipe(toy_corpus):
    cfg = Config(
        encoder=EncoderConfig(name="tiny_cnn", feature_dim=FEAT),
        decoder=DecoderConfig(embed_dim=16, hidden_dim=32, dropout_rate=0.0),
        decode=DecodeConfig(max_len=10),
    )
    pipe = CaptioningPipeline(cfg)
    tok = Tokenizer()
    tok.fit_on_texts(toy_corpus)
    pipe.tokenizer = tok
    pipe.build()
    return pipe


def make_data(toy_corpus, rng, n=24):
    ids = [f"i{k}" for k in range(n)]
    desc = {
        i: [toy_corpus[k % len(toy_corpus)]] for k, i in enumerate(ids)
    }
    features = {
        i: rng.normal(size=(FEAT,)).astype(np.float32) for i in ids
    }
    return desc, features


class CountingStore:
    """Mapping wrapper that counts per-row reads and forbids any bulk
    materialization API — the contract a lazy npz/memmap store needs."""

    def __init__(self, data):
        self._data = data
        self.reads = 0
        self.lock = threading.Lock()

    def __getitem__(self, key):
        with self.lock:
            self.reads += 1
        return self._data[key]

    def values(self):  # pragma: no cover — the assertion IS the test
        raise AssertionError("streaming fit must not bulk-read the store")

    def items(self):  # pragma: no cover
        raise AssertionError("streaming fit must not bulk-read the store")


class TestStreamHelpers:
    def test_order_matches_batch_iterator(self, rng):
        from tpucap.train.sequences import batch_iterator

        n, bs = 20, 8
        ids = [f"i{k}" for k in range(n)]
        feats = {i: rng.normal(size=(4,)).astype(np.float32) for i in ids}
        F = np.stack([feats[i] for i in ids])
        T = np.arange(n * 3, dtype=np.int32).reshape(n, 3)

        r1 = np.random.default_rng(7)
        r2 = np.random.default_rng(7)
        got = list(
            caption_batch_stream(ids, T, feats, bs, rng=r1)
        )
        want = list(batch_iterator((F, T), bs, rng=r2))
        assert len(got) == len(want) == n // bs
        for (gf, gt), (wf, wt) in zip(got, want):
            np.testing.assert_array_equal(gf, wf)
            np.testing.assert_array_equal(gt, wt)

    def test_row_count_mismatch_raises(self):
        with pytest.raises(ValueError, match="row ids"):
            list(
                caption_batch_stream(
                    ["a"], np.zeros((2, 3), np.int32), {"a": np.zeros(4)}, 1
                )
            )

    def test_prefetch_preserves_order_and_transform(self):
        out = list(
            prefetch_iterator(iter(range(10)), depth=3, transform=lambda x: x * 2)
        )
        assert out == [x * 2 for x in range(10)]

    def test_start_batch_skips_assembly(self, rng):
        """Mid-epoch resume contract: start_batch consumes the full
        permutation (tail batches bit-identical to the un-skipped run)
        but assembles ZERO feature rows for the skipped prefix."""
        n, bs = 20, 4
        ids = [f"i{k}" for k in range(n)]
        raw = {i: rng.normal(size=(4,)).astype(np.float32) for i in ids}
        T = np.arange(n * 3, dtype=np.int32).reshape(n, 3)

        full = list(
            caption_batch_stream(
                ids, T, raw, bs, rng=np.random.default_rng(7)
            )
        )
        store = CountingStore(raw)
        tail = list(
            caption_batch_stream(
                ids, T, store, bs,
                rng=np.random.default_rng(7), start_batch=3,
            )
        )
        assert len(tail) == len(full) - 3
        for (gf, gt), (wf, wt) in zip(tail, full[3:]):
            np.testing.assert_array_equal(gf, wf)
            np.testing.assert_array_equal(gt, wt)
        assert store.reads == (len(full) - 3) * bs

    def test_prefetch_propagates_worker_exception(self):
        def boom():
            yield 1
            raise RuntimeError("assembly failed")

        it = prefetch_iterator(boom(), depth=2)
        assert next(it) == 1
        with pytest.raises(RuntimeError, match="assembly failed"):
            list(it)


class TestStreamFit:
    @pytest.mark.parametrize("parallelism", ["none", "dp", "fsdp"])
    def test_trajectory_identical_to_in_memory(
        self, toy_corpus, rng, parallelism
    ):
        desc, features = make_data(toy_corpus, rng)

        def run(stream, feats):
            p = make_pipe(toy_corpus)
            hist = p.fit(
                desc,
                feats,
                epochs=3,
                batch_size=8,
                parallelism=parallelism,
                stream=stream,
                log=None,
            )
            return p, hist

        p_mem, h_mem = run(False, features)
        store = CountingStore(features)
        p_str, h_str = run(True, store)

        # Same per-epoch losses (identical batch order + identical math).
        for a, b in zip(h_mem, h_str, strict=True):
            np.testing.assert_allclose(a["loss"], b["loss"], rtol=1e-6)
        # Same final params -> same captions.
        ids4 = list(desc.keys())[:4]
        f4 = np.stack([features[i] for i in ids4])
        assert p_mem.generate(f4) == p_str.generate(f4)
        # Rows were read per batch (3 epochs x 24 rows), never bulk.
        assert store.reads == 3 * 24

    def test_stream_resume_skips_assembled_batches(
        self, toy_corpus, rng, tmp_path
    ):
        """Resuming a streamed fit mid-epoch must not re-assemble the
        already-trained prefix (the skip happens INSIDE the stream via
        start_batch, not downstream of it) and lands on the exact
        uninterrupted trajectory."""
        import jax

        from tpucap.checkpoint import CheckpointManager

        desc, features = make_data(toy_corpus, rng)  # 24 rows

        class FakeGuard:
            def __init__(self, after):
                self.after = after
                self.calls = 0

            @property
            def fired(self):
                self.calls += 1
                return self.calls >= self.after

            def __enter__(self):
                return self

            def __exit__(self, *exc):
                return None

        p_a = make_pipe(toy_corpus)
        p_a.fit(desc, features, epochs=2, batch_size=8, log=None)

        # 3 steps/epoch; fire after step 4 -> rescue mid-epoch 1.
        mgr = CheckpointManager(str(tmp_path / "m"), best_metric=None)
        p_b = make_pipe(toy_corpus)
        hist_b = p_b.fit(
            desc, features, epochs=2, batch_size=8, stream=True,
            checkpoint_manager=mgr, preemption_guard=FakeGuard(4),
            log=None,
        )
        assert hist_b[-1]["preempted"] is True
        assert mgr.latest_step() == 4

        store = CountingStore(features)
        p_c = make_pipe(toy_corpus)
        p_c.fit(
            desc, store, epochs=2, batch_size=8, stream=True,
            checkpoint_manager=mgr, resume=True, log=None,
        )
        mgr.close()
        # Only the 2 remaining batches of epoch 1 were assembled.
        assert store.reads == 2 * 8
        for x, y in zip(
            jax.tree.leaves(p_a.params["decoder"]),
            jax.tree.leaves(p_c.params["decoder"]),
            strict=True,
        ):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    def test_stream_with_lazy_npz(self, toy_corpus, rng, tmp_path):
        # The documented at-scale source: an uncompressed np.load handle.
        desc, features = make_data(toy_corpus, rng, n=16)
        npz = tmp_path / "feats.npz"
        np.savez(npz, **features)
        lazy = np.load(npz)
        p = make_pipe(toy_corpus)
        hist = p.fit(
            desc, lazy, epochs=2, batch_size=8, stream=True, log=None
        )
        assert np.isfinite(hist[-1]["loss"])
        assert hist[-1]["loss"] < hist[0]["loss"]
