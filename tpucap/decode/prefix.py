"""Forced-prefix (caption-completion) decoding: prime the decoder
state through user-supplied prefix tokens, then let the unchanged
engines continue.

Framework extra (the reference always decodes from ``startseq``,
SURVEY.md §3.3) — the standard "continue this caption" serving surface:
guided captioning, interactive completion, constrained re-ranking.

TPU-first shape discipline: priming is ONE ``lax.scan`` over the
(static) padded prefix length — rows with shorter prefixes freeze via
a where-mask on every state leaf, exactly the engines' frozen-carry
idiom — so mixed-length prefixes stay a single compiled program with
no per-row host loops. The engines then run untouched: they accept a
per-row start token and an initial score, which is all a primed prefix
is to them. The reported score is therefore the FULL caption log-prob
(prefix tokens scored teacher-forced under the same full-softmax
normalizer the engines use) plus the continuation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def prime_prefix(
    step_fn, params, state, prefix, lengths, *, start_id: int,
    decoder=None,
):
    """Advance decoder state through per-row forced prefixes.

    step_fn(params, state, token) -> (logits, state) — the engines'
        step contract.
    prefix: (B, P) int32, row b's forced tokens in prefix[b, :lengths[b]]
        (entries beyond a row's length are ignored).
    lengths: (B,) int32 per-row prefix lengths (0 = no prefix).
    decoder: optional — when it exposes ``step_chunk`` (the KV-cache
        transformer family), priming runs as ONE chunked prefill
        forward instead of P sequential steps (see _prime_chunked).

    Returns ``(state, last, logp)``:
    - state: advanced by lengths[b] teacher-forced steps per row (rows
      past their own prefix freeze — where-masked, not stepped);
    - last: (B,) int32 — the token the continuation starts from
      (prefix[b, lengths[b]-1], or start_id when lengths[b] == 0);
    - logp: (B,) f32 — sum of full-softmax log-probs of the prefix
      tokens (the engines' score convention), to seed the engine's
      initial score so reported scores cover the whole caption.
    """
    B = jax.tree_util.tree_leaves(state)[0].shape[0]
    P = prefix.shape[1]
    last0 = jnp.full((B,), start_id, jnp.int32)
    if P == 0:
        return state, last0, jnp.zeros((B,), jnp.float32)
    if decoder is not None and hasattr(decoder, "step_chunk"):
        return _prime_chunked(
            decoder, params, state, prefix, lengths, start_id=start_id
        )

    def body(carry, i):
        state, last, acc = carry
        with jax.named_scope("prefix_prime_step"):
            logits, new_state = step_fn(params, state, last)
        logits = logits.astype(jnp.float32)
        lse = jax.scipy.special.logsumexp(logits, axis=-1)
        tok = prefix[:, i]
        lp = (
            jnp.take_along_axis(logits, tok[:, None], axis=-1)[:, 0] - lse
        )
        active = i < lengths  # (B,)

        def sel(n, o):
            m = active.reshape(active.shape + (1,) * (n.ndim - 1))
            return jnp.where(m, n, o)

        state = jax.tree_util.tree_map(sel, new_state, state)
        last = jnp.where(active, tok, last)
        acc = acc + jnp.where(active, lp, 0.0)
        return (state, last, acc), None

    (state, last, logp), _ = jax.lax.scan(
        body,
        (state, last0, jnp.zeros((B,), jnp.float32)),
        jnp.arange(P, dtype=jnp.int32),
    )
    return state, last, logp


def _prime_chunked(decoder, params, state, prefix, lengths, *, start_id):
    """KV-cache (transformer) prefill: prime the whole prefix in ONE
    ``step_chunk`` forward — MXU-shaped, O(1) kernel launches — instead
    of P sequential steps.

    The chunk consumed at step c is [start, p0, .., p_{P-2}] (the scan
    path's feed sequence), so logits[:, c] scores token p_c; per-row
    validity masks the score sum. Mixed lengths are repaired AFTER the
    chunk rather than masked inside it:

    - ``pos`` is overwritten with each row's true consumed count
      (``lengths``; the chunk advanced every row by P);
    - the stale K/V the chunk wrote at a short row's positions
      [lengths[b], P) is left in place — it is provably never visible:
      a later query at position q attends to keys <= q, and the decode
      loop overwrites position q in the same step that first queries it
      (step_hidden writes before attending), so every stale slot is
      replaced before any query can reach it.

    Numerics match the scan path exactly for the surviving state:
    step_chunk is bit-equivalent to successive step_hidden calls
    (models/decoders/transformer.py), valid rows consume identical
    tokens at identical positions, and the score sum uses the same
    full-softmax convention.
    """
    B, P = prefix.shape
    chunk = jnp.concatenate(
        [jnp.full((B, 1), start_id, jnp.int32), prefix[:, :-1]], axis=1
    )
    logits, new_state = decoder.step_chunk(params, state, chunk)
    logits = logits.astype(jnp.float32)  # (B, P, V)
    lse = jax.scipy.special.logsumexp(logits, axis=-1)  # (B, P)
    tok_lp = (
        jnp.take_along_axis(
            logits, prefix[..., None].astype(jnp.int32), axis=-1
        )[..., 0]
        - lse
    )
    valid = jnp.arange(P)[None, :] < lengths[:, None]
    logp = jnp.sum(jnp.where(valid, tok_lp, 0.0), axis=1)

    new_state = dict(new_state)
    new_state["pos"] = lengths.astype(jnp.int32)
    last = jnp.where(
        lengths > 0,
        jnp.take_along_axis(
            prefix, jnp.maximum(lengths - 1, 0)[:, None], axis=1
        )[:, 0],
        jnp.full((B,), start_id, jnp.int32),
    )
    return new_state, last, logp
