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
