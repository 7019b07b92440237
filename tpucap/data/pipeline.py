"""grain-based input pipeline (SURVEY.md §2.3 'host threadpool data
pipeline' row): multi-worker decode feeding the device.

Replaces the reference's in-process Keras generator with a grain DataLoader:
worker processes read JPEG bytes and batch-decode them through the C++
extension (tpucap.ops.jpeg), emitting contiguous uint8 NHWC batches; the
trainer overlaps host decode with device compute via read_ahead prefetch.
Normalization happens on-device (tpucap.ops.preprocess.fused_preprocess),
so the host->device transfer stays uint8 (4x smaller than float32).

Also provides a plain-Python `caption_batches` iterator for the
(features, tokens) training stage, where the artifacts are already in
memory and grain's multiprocessing would be overhead.
"""

from __future__ import annotations

import dataclasses
from typing import Iterator, Sequence

import numpy as np

import grain.python as grain

from tpucap.ops import jpeg as jpeg_ops


@dataclasses.dataclass
class _DecodeChunk(grain.MapTransform):
    """Decode chunk #i of the path list into one uint8 NHWC batch.

    Holds the full path tuple (pickled once per worker); the grain source
    carries only integer chunk indices, which its shared-memory backing
    supports.
    """

    paths: tuple
    batch_size: int
    size: int
    fast_scale: bool = True

    def map(self, chunk_idx: int) -> tuple[int, np.ndarray]:
        s = chunk_idx * self.batch_size
        chunk = self.paths[s : s + self.batch_size]
        batch = jpeg_ops.decode_jpeg_files(
            chunk, self.size, fast_scale=self.fast_scale
        )
        # Carry the chunk index with the batch so the consumer can pair
        # paths with pixels under ANY sampler order (shuffle included).
        return chunk_idx, batch


def image_batch_loader(
    paths: Sequence[str],
    *,
    size: int,
    batch_size: int,
    num_workers: int = 0,
    seed: int = 0,
    shuffle: bool = False,
    num_epochs: int = 1,
    fast_scale: bool = True,
    drop_remainder: bool = False,
) -> Iterator[tuple[list[str], np.ndarray]]:
    """Yield (paths_chunk, uint8 batch (B, size, size, 3)).

    num_workers > 0 runs decode in grain worker processes, overlapping with
    device compute; 0 decodes inline (still multi-threaded inside the C++
    extension).
    """
    paths = tuple(paths)
    n_chunks = (len(paths) + batch_size - 1) // batch_size
    if drop_remainder and n_chunks and len(paths) % batch_size:
        n_chunks -= 1

    source = grain.InMemoryDataSource(list(range(n_chunks)))
    sampler = grain.IndexSampler(
        num_records=n_chunks,
        shuffle=shuffle,
        seed=seed,
        num_epochs=num_epochs,
        shard_options=grain.NoSharding(),
    )
    transform = _DecodeChunk(
        paths=paths, batch_size=batch_size, size=size, fast_scale=fast_scale
    )
    loader = grain.DataLoader(
        data_source=source,
        sampler=sampler,
        operations=[transform],
        worker_count=num_workers,
        read_options=grain.ReadOptions(
            num_threads=4, prefetch_buffer_size=8
        ),
    )
    # Pair each decoded batch back with its path chunk for id bookkeeping:
    # the transform tags every batch with its chunk index, so the pairing
    # holds under shuffled sampler order too.
    for chunk_idx, batch in iter(loader):
        s = chunk_idx * batch_size
        yield list(paths[s : s + batch_size]), batch


def caption_batch_stream(
    row_ids,
    tokens: np.ndarray,
    features,
    batch_size: int,
    *,
    rng=None,
    drop_remainder: bool = True,
    start_batch: int = 0,
) -> Iterator[tuple[np.ndarray, np.ndarray]]:
    """Streaming (features, tokens) minibatches: feature rows are
    assembled PER BATCH by indexing ``features[row_ids[i]]`` — pass a
    lazy mapping (an uncompressed ``np.load('.npz')`` handle, a memory
    map, a shard reader) and peak host memory is one batch of feature
    rows instead of the full (N, F) array the reference-parity
    :func:`tpucap.train.sequences.build_training_batch` materializes.
    The at-scale path: COCO-scale spatial features (~196x768 f32 per
    image) never fit host RAM stacked.

    ``rng`` (a numpy Generator) shuffles row order exactly like
    ``train.sequences.batch_iterator`` — one ``rng.shuffle(arange(n))``
    per call — so a streamed epoch visits batches in the IDENTICAL
    order as the in-memory path under the same seed (pinned in
    tests/test_stream_fit.py).

    ``start_batch`` skips the first N batches WITHOUT assembling them
    (the mid-epoch resume path: the permutation is still consumed in
    full, so batch ``start_batch`` is bit-identical to the batch the
    un-skipped epoch would have yielded at that index — but the skipped
    batches cost zero disk reads / stacking / H2D instead of a
    near-epoch of input-pipeline work on a COCO-scale resume)."""
    n = len(row_ids)
    if tokens.shape[0] != n:
        raise ValueError(
            f"{n} row ids vs {tokens.shape[0]} token rows"
        )
    idx = np.arange(n)
    if rng is not None:
        rng.shuffle(idx)
    end = (n // batch_size) * batch_size if drop_remainder else n
    for s in range(start_batch * batch_size, end, batch_size):
        sel = idx[s : s + batch_size]
        feats = np.stack(
            [np.asarray(features[row_ids[i]]) for i in sel]
        ).astype(np.float32, copy=False)
        yield feats, tokens[sel]


def prefetch_iterator(it: Iterator, *, depth: int = 2, transform=None):
    """Run ``it`` on a background thread, keeping up to ``depth``
    finished items queued — host-side batch assembly (disk reads,
    stacking) and device placement overlap the consumer's device step.
    ``transform`` runs on the WORKER thread (pass the device-placement
    closure — ``jax.device_put``/``shard_batch`` are thread-safe and
    dispatch async — so H2D transfer is also off the critical path).
    Worker exceptions re-raise at the consumer's next pull.

    The worker SHUTS DOWN when the consumer abandons the generator
    (GeneratorExit / ``.close()`` / garbage collection): the finally
    block signals stop and drains the queue so a put-blocked worker
    wakes, drops its references (queued batches can be device arrays —
    real memory), and exits. The pre-r4 version parked abandoned
    workers at the bounded queue for the life of the process, which a
    long test session accumulates (observed in a full-suite crash
    dump); daemon=True remains the backstop for interpreter exit."""
    import queue
    import threading

    q: queue.Queue = queue.Queue(maxsize=max(1, depth))
    sentinel = object()
    stop = threading.Event()
    failure: list[BaseException] = []

    def worker():
        try:
            for item in it:
                if stop.is_set():
                    return
                out = (
                    transform(item) if transform is not None else item
                )
                while not stop.is_set():
                    try:
                        q.put(out, timeout=0.1)
                        break
                    except queue.Full:
                        continue
                if stop.is_set():
                    return
        except BaseException as e:  # noqa: BLE001 — re-raised at the consumer
            failure.append(e)
        finally:
            # The sentinel must not be dropped on a full queue (the
            # consumer would block forever once it drains the items) —
            # keep trying unless the consumer already abandoned us
            # (stop set: nobody is listening, and the consumer's drain
            # loop empties the queue anyway).
            while not stop.is_set():
                try:
                    q.put(sentinel, timeout=0.1)
                    break
                except queue.Full:
                    continue

    threading.Thread(
        target=worker, daemon=True, name="tpucap-prefetch"
    ).start()
    try:
        while True:
            item = q.get()
            if item is sentinel:
                if failure:
                    raise failure[0]
                return
            yield item
    finally:
        stop.set()
        try:  # drain so a put-blocked worker wakes and exits promptly
            while True:
                q.get_nowait()
        except queue.Empty:
            pass


def caption_batches(
    features: np.ndarray,
    tokens: np.ndarray,
    batch_size: int,
    *,
    seed: int | None = 0,
    drop_remainder: bool = True,
) -> Iterator[tuple[np.ndarray, np.ndarray]]:
    """Shuffled (features, tokens) minibatches for decoder training."""
    n = features.shape[0]
    idx = np.arange(n)
    if seed is not None:
        np.random.default_rng(seed).shuffle(idx)
    end = (n // batch_size) * batch_size if drop_remainder else n
    for s in range(0, end, batch_size):
        sel = idx[s : s + batch_size]
        yield features[sel], tokens[sel]
