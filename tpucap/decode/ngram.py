"""No-repeat-ngram blocking: the standard decode-quality dial that
forbids the generator from ever emitting the same n-gram twice.

Not part of the reference surface (it ships plain greedy + beam,
SURVEY.md §2.1 #10-11) — provided as a framework extra like sampling
and diverse beam, because repetitive captions ("a man in a man in a
man") are the classic LSTM failure mode the dial exists to cut off.

TPU-first shape discipline: the history window match is a static-shape
sliding-window compare over the engine's (.., max_len) token buffer —
(P, n-1) gathered windows against the current (n-1)-token suffix — and
the ban set is materialized as one (rows, vocab) boolean scatter-max.
At caption lengths (max_len ≈ 34) this is a few thousand int compares
per row, invisible next to the step's matmuls, and it keeps the whole
constraint inside the single compiled while_loop program (no host
round-trips, no dynamic shapes).

Semantics (mirrored by the test oracles in tests/test_ngram.py):
- The history is the GENERATED tokens only — the fixed ``startseq``
  prompt is not part of any window (unlike HF's convention of hashing
  the full prompt; with a single constant start token the distinction
  is a no-op for every n-gram that matters).
- Emitting token w at step t is banned iff the (n-1)-token suffix
  y[t-n+1:t] already occurred at some earlier position i <= t-n
  followed by w — i.e. iff (y[t-n+1:t], w) is an n-gram already in the
  sequence.
- n = 1 degenerates to "never repeat any token".
- The mask is SELECTION-only in greedy/beam (candidates leave the
  top-k/argmax; the softmax normalizer stays full, so scores remain
  true log-probs — the pad/min_len/bad_words convention) and
  renormalizing in sampling (masked before the softmax, the
  min_len-in-sampling convention).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


NEG_INF = -1e30  # matches decode/beam.py (avoid inf-inf NaNs)


def _ngram_matches(tokens, t, n: int):
    """Core window match shared by the mask and the in-place ban.

    Returns ``(match, next_tok)``, both (..., P): ``match[.., i]`` is
    True iff the (n-1)-gram at position i equals the current suffix and
    its completing token ``next_tok[.., i] = tokens[.., i+n-1]`` is an
    already-generated position. ``None, None`` when n-grams longer than
    the buffer can never repeat.
    """
    if n < 1:
        raise ValueError(f"no_repeat_ngram_size must be >= 1, got {n}")
    L = tokens.shape[-1]
    P = L - (n - 1)  # number of (n-1)-gram window start positions
    if P <= 0:
        return None, None

    # All (n-1)-token windows of the buffer, gathered with a static
    # index grid: windows[.., i, :] = tokens[.., i : i + n - 1].
    win = jnp.arange(P)[:, None] + jnp.arange(n - 1)[None, :]
    windows = tokens[..., win]  # (..., P, n-1)

    # The suffix the next token would extend: the last n-1 generated
    # tokens, y[t-n+1 : t] (start clamped; invalid when t < n, but the
    # validity mask below is then empty anyway). Per-row gather so a
    # per-lane t works the same as a shared scalar.
    t_arr = jnp.broadcast_to(
        jnp.asarray(t, jnp.int32), tokens.shape[:-1]
    )
    sidx = jnp.maximum(
        t_arr[..., None] - (n - 1) + jnp.arange(n - 1), 0
    )  # (..., n-1)
    suffix = jnp.take_along_axis(tokens, sidx, axis=-1)

    match = jnp.all(windows == suffix[..., None, :], axis=-1)  # (..., P)
    # Window i's completing token sits at i + n - 1, which must be an
    # already-generated position (<= t - 1)  =>  i <= t - n.
    match = jnp.logical_and(
        match, jnp.arange(P) <= (t_arr[..., None] - n)
    )
    next_tok = tokens[..., jnp.arange(P) + (n - 1)]  # (..., P)
    return match, next_tok


def apply_ngram_ban(masked, tokens, t, n: int):
    """Ban repeated-ngram completions IN PLACE on a (rows, V) logits
    array: scatter-min NEG_INF at the matched completion tokens —
    O(rows * P) scatter updates against the buffer XLA already holds,
    instead of materializing and where-applying a (rows, V) boolean
    mask per step (measured 2.4x decode-step cost at batch 256 x beam
    3, docs/PERF.md). This is what the engines call; the boolean
    ``ngram_banned_mask`` below is the same match reduced to a mask
    (tests, and any caller that wants the set itself).

    masked: (rows, V) float logits (any float dtype);
    tokens: (rows, L) int32; t: scalar or (rows,) step index.
    """
    match, next_tok = _ngram_matches(tokens, t, n)
    if match is None:
        return masked
    rows = tokens.shape[0]
    vals = jnp.where(
        match,
        jnp.asarray(NEG_INF, masked.dtype),
        jnp.asarray(jnp.inf, masked.dtype),  # min(x, +inf) = x
    )
    return masked.at[jnp.arange(rows)[:, None], next_tok].min(vals)


def ngram_banned_mask(tokens, t, n: int, vocab: int):
    """Boolean ban mask for no-repeat-ngram decoding.

    tokens: (..., L) int32 generated-token buffer; positions >= t hold
        pad (ignored — the validity mask excludes them).
    t: current step — the position about to be written. A traced
        scalar (the batch engines: every row at the same step) OR a
        (...,)-shaped per-row array (the continuous engines: each lane
        at its own step).
    n: static ngram size (>= 1).
    vocab: static vocabulary size.

    Returns (..., vocab) bool, True where emitting that token at step t
    would complete an n-gram already present in tokens[..., :t].
    """
    match, next_tok = _ngram_matches(tokens, t, n)
    if match is None:
        return jnp.zeros(tokens.shape[:-1] + (vocab,), bool)

    # Scatter-max the P (token, matched) pairs per row into the vocab
    # axis — O(rows * P) updates, no (rows, P, vocab) intermediate.
    lead = tokens.shape[:-1]
    P = match.shape[-1]
    rows = 1
    for d in lead:
        rows *= d
    flat_tok = next_tok.reshape(rows, P)
    flat_match = match.reshape(rows, P)
    mask = (
        jnp.zeros((rows, vocab), bool)
        .at[jnp.arange(rows)[:, None], flat_tok]
        .max(flat_match)
    )
    return mask.reshape(lead + (vocab,))
