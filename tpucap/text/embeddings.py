"""Pretrained word embeddings (GloVe-format) for the decoder embedding table.

The reference genre initializes the caption decoder's ``Embedding`` layer
from pretrained GloVe vectors: parse the standard whitespace text format
(``word v1 .. vd`` per line) into a dict, build a ``(vocab_size, dim)``
matrix indexed by the tokenizer's word indices with unknown rows left at
zero, set it as the layer weights, and optionally mark the layer
``trainable=False`` (SURVEY.md §2.2 Embedding row; the Keras idiom is
``np.zeros((vocab_size, dim))`` filled from ``tokenizer.word_index``).

TPU-first re-ownership: the parse stays a host-side numpy pass (cold path,
runs once), the matrix drops into the decoder param tree as the
``embedding.table`` leaf (every decoder family shares that key), and
"frozen" is enforced by masking the optimizer UPDATES — not just the
gradients — so adamw's decoupled weight decay cannot move a frozen table
(same rule as train/finetune.py's freeze_encoder).

No network exists here, so tests generate synthetic vector files; the
parser accepts real GloVe files byte-for-byte (including the optional
word2vec-style ``count dim`` header some conversions prepend).
"""

from __future__ import annotations

import numpy as np

__all__ = ["load_word_vectors", "build_embedding_matrix"]


def load_word_vectors(path, *, dtype=np.float32) -> dict[str, np.ndarray]:
    """Parse a GloVe/word2vec-text vector file into ``{word: (dim,) array}``.

    Format: one ``word v1 v2 ... vd`` per line, space-separated. A leading
    word2vec header line (exactly two integer fields, ``vocab_count dim``)
    is skipped. Dimension consistency is enforced across lines; duplicate
    words keep the FIRST occurrence (matching the lookup-once idiom).
    """
    vectors: dict[str, np.ndarray] = {}
    dim = None
    with open(path, "r", encoding="utf-8") as fh:
        for lineno, line in enumerate(fh):
            parts = line.rstrip("\n").split(" ")
            if not parts or parts == [""]:
                continue
            if lineno == 0 and len(parts) == 2:
                try:
                    int(parts[0]), int(parts[1])
                    continue  # word2vec-style header
                except ValueError:
                    pass
            word, values = parts[0], parts[1:]
            vec = np.asarray(values, dtype=dtype)
            if dim is None:
                dim = vec.shape[0]
                if dim == 0:
                    raise ValueError(
                        f"{path}:{lineno + 1}: no vector values after "
                        f"word {word!r}"
                    )
            elif vec.shape[0] != dim:
                raise ValueError(
                    f"{path}:{lineno + 1}: vector for {word!r} has "
                    f"{vec.shape[0]} dims, expected {dim}"
                )
            vectors.setdefault(word, vec)
    if not vectors:
        raise ValueError(f"{path}: no word vectors found")
    return vectors


def build_embedding_matrix(
    tokenizer,
    vectors: dict[str, np.ndarray],
    *,
    embed_dim: int | None = None,
    vocab_size: int | None = None,
    dtype=np.float32,
):
    """Build the ``(vocab_size, embed_dim)`` init matrix for the decoder.

    Rows are indexed by ``tokenizer.word_index``; words without a
    pretrained vector — and row 0, the reserved padding index — stay
    all-zero (the reference idiom). Indices at or beyond ``vocab_size``
    (the tokenizer's ``num_words`` cutoff) are skipped, mirroring the
    encode-time truncation.

    Returns ``(matrix, hits)`` where ``hits`` is the number of in-vocab
    words that received a pretrained row — callers should log coverage,
    since silent low coverage is the classic failure mode of this path.
    """
    if vocab_size is None:
        vocab_size = tokenizer.vocab_size
    if embed_dim is None:
        embed_dim = next(iter(vectors.values())).shape[0]
    matrix = np.zeros((vocab_size, embed_dim), dtype=dtype)
    hits = 0
    for word, idx in tokenizer.word_index.items():
        if idx >= vocab_size:
            continue
        vec = vectors.get(word)
        if vec is None:
            continue
        if vec.shape[0] != embed_dim:
            raise ValueError(
                f"pretrained vectors have dim {vec.shape[0]}, decoder "
                f"embed_dim is {embed_dim}; pick matching sizes"
            )
        matrix[idx] = vec
        hits += 1
    return matrix, hits
