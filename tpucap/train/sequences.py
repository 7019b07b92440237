"""Training-batch construction from captions + image features.

The reference's `create_sequences` explodes each caption into per-prefix
samples (image_feat, pre-padded w1..wk) -> w(k+1) (SURVEY.md §2.1 #5) —
duplicating the image feature and recomputing the LSTM prefix for every
sample. The rebuild keeps one row per caption: post-padded full token
sequences (startseq ... endseq), teacher-forced in a single scan; the loss
over pad-masked positions is sample-for-sample identical
(tests/test_train.py::test_sequence_loss_equals_reference_prefix_loss).

``build_prefix_samples`` implements the reference's layout for parity tests
and for the compat API.
"""

from __future__ import annotations

import numpy as np

from tpucap.text.padding import pad_sequences


def build_training_tokens(
    tokenizer,
    descriptions: dict[str, list[str]],
    max_len: int,
):
    """-> (row_ids list[N], tokens (N, max_len+1)) — the token half of
    :func:`build_training_batch`. ``row_ids[i]`` is the image id whose
    feature row pairs with ``tokens[i]``; streaming fits assemble the
    feature rows per batch from this pairing instead of materializing
    the full (N, F) array."""
    from tpucap.text.clean import END_TOKEN

    end_id = tokenizer.word_index.get(END_TOKEN)
    row_ids, seqs = [], []
    for image_id, captions in descriptions.items():
        seq_list = tokenizer.texts_to_sequences(captions)
        for seq in seq_list:
            if len(seq) < 2:
                continue
            if (
                len(seq) > max_len + 1
                and end_id is not None
                and seq[-1] == end_id
            ):
                # Post-truncation would silently drop endseq and train the
                # model to never terminate this caption; keep the sentinel
                # as the final kept token instead. (The reference never
                # truncates — it computes max_length from the data — so
                # this path only fires when config max_len is shorter
                # than the corpus maximum.)
                seq = seq[:max_len] + [end_id]
            row_ids.append(image_id)
            seqs.append(seq)
    tokens = pad_sequences(
        seqs, maxlen=max_len + 1, padding="post", truncating="post"
    )
    return row_ids, tokens


def build_training_batch(
    tokenizer,
    descriptions: dict[str, list[str]],
    features: dict[str, np.ndarray],
    max_len: int,
):
    """-> (features (N, ...), tokens (N, max_len+1) post-padded full captions).

    One row per (image, caption) pair; tokens include start/end sentinels.
    """
    row_ids, tokens = build_training_tokens(tokenizer, descriptions, max_len)
    return (
        np.stack([np.asarray(features[i]) for i in row_ids]),
        tokens,
    )


def build_prefix_samples(
    tokenizer,
    descriptions: dict[str, list[str]],
    features: dict[str, np.ndarray],
    max_len: int,
):
    """Reference-style per-prefix samples: (feat, pre-padded prefix, next word).

    O(T) larger than build_training_batch; kept for parity testing and the
    compat API surface (SURVEY.md §2.1 #5).
    """
    X_feat, X_seq, y = [], [], []
    for image_id, captions in descriptions.items():
        for seq in tokenizer.texts_to_sequences(captions):
            for i in range(1, len(seq)):
                X_feat.append(features[image_id])
                X_seq.append(seq[:i])
                y.append(seq[i])
    X_seq = pad_sequences(X_seq, maxlen=max_len, padding="pre", truncating="pre")
    return np.stack(X_feat), X_seq, np.asarray(y, np.int32)


def batch_iterator(arrays, batch_size: int, *, rng=None, drop_remainder=True):
    """Yield aligned minibatches from a tuple of arrays."""
    n = arrays[0].shape[0]
    idx = np.arange(n)
    if rng is not None:
        rng.shuffle(idx)
    end = (n // batch_size) * batch_size if drop_remainder else n
    for s in range(0, end, batch_size):
        sel = idx[s : s + batch_size]
        yield tuple(a[sel] for a in arrays)
