"""Bridge from decoded token ids back to caption strings."""

from __future__ import annotations

import numpy as np


def ids_to_captions(
    tokenizer,
    tokens,
    lengths,
    *,
    end_id: int | None = None,
    strip_end: bool = True,
) -> list[str]:
    """tokens (B, L), lengths (B,) -> list of caption strings.

    Mirrors the reference's ``word_for_id`` join (SURVEY.md §2.1 #10) minus
    the start/end sentinels.
    """
    tokens = np.asarray(tokens)
    lengths = np.asarray(lengths)
    # Subword tokenizers (text/bpe.py) own their piece-joining rules —
    # pieces concatenate into words rather than space-joining.
    decode = getattr(tokenizer, "decode_ids", None)
    out = []
    for row, n in zip(tokens, lengths):
        ids = list(row[: int(n)])
        if strip_end and end_id is not None and ids and ids[-1] == end_id:
            ids = ids[:-1]
        if decode is not None:
            out.append(decode(ids))
            continue
        words = [tokenizer.word_for_id(int(i)) for i in ids]
        out.append(" ".join(w for w in words if w is not None))
    return out
