"""Differential tests: pad_sequences / to_categorical vs Keras semantics."""

import numpy as np
import pytest

from tpucap.text import pad_sequences, to_categorical

keras_seq = pytest.importorskip("keras.src.utils.sequence_utils")
keras_np = pytest.importorskip("keras.src.utils.numerical_utils")

SEQS = [
    [[1, 2, 3], [4, 5], [6]],
    [[1], [], [2, 3, 4, 5, 6, 7]],
    [[9, 9, 9, 9]],
    [],
]


@pytest.mark.parametrize("sequences", SEQS)
@pytest.mark.parametrize("maxlen", [None, 2, 4, 10])
@pytest.mark.parametrize("padding", ["pre", "post"])
@pytest.mark.parametrize("truncating", ["pre", "post"])
def test_pad_sequences_matches_keras(sequences, maxlen, padding, truncating):
    if not sequences and maxlen is None:
        # Keras raises on this (np.max of empty); we return an empty (0, 0)
        # array instead — nothing to differentially compare.
        pytest.skip("keras errors on empty input with maxlen=None")
    ours = pad_sequences(
        sequences, maxlen=maxlen, padding=padding, truncating=truncating
    )
    theirs = keras_seq.pad_sequences(
        sequences, maxlen=maxlen, padding=padding, truncating=truncating
    )
    np.testing.assert_array_equal(ours, np.asarray(theirs))
    assert ours.dtype == np.asarray(theirs).dtype


def test_pad_default_is_pre():
    out = pad_sequences([[7, 8]], maxlen=4)
    np.testing.assert_array_equal(out, [[0, 0, 7, 8]])


def test_truncate_pre_keeps_tail():
    out = pad_sequences([[1, 2, 3, 4, 5]], maxlen=3)
    np.testing.assert_array_equal(out, [[3, 4, 5]])


@pytest.mark.parametrize("y", [[0, 1, 2], [[1], [0]], np.arange(6).reshape(2, 3)])
def test_to_categorical_matches_keras(y):
    ours = to_categorical(y, num_classes=7)
    theirs = keras_np.to_categorical(np.asarray(y), num_classes=7)
    np.testing.assert_array_equal(ours, theirs)


def test_pad_sequences_fuzz_matches_keras():
    """Seeded random sequence sets across every padding/truncating/maxlen
    combination — the randomized net behind the hand-picked SEQS cases."""
    import random

    rng = random.Random(7)
    for trial in range(25):
        seqs = [
            [rng.randint(1, 50) for _ in range(rng.randint(0, 12))]
            for _ in range(rng.randint(0, 8))
        ]
        maxlen = rng.choice([None, 1, 3, 7, 15])
        for padding in ("pre", "post"):
            for truncating in ("pre", "post"):
                ours = pad_sequences(
                    seqs, maxlen=maxlen, padding=padding,
                    truncating=truncating,
                )
                theirs = keras_seq.pad_sequences(
                    seqs, maxlen=maxlen, padding=padding,
                    truncating=truncating,
                )
                np.testing.assert_array_equal(
                    ours, theirs,
                    err_msg=f"{trial} {maxlen} {padding} {truncating}",
                )
