"""Host-side Python oracles for the decode engines.

Step-by-step loops with the same semantics as the compiled engines,
structured like the reference's host loops (SURVEY.md §3.3-3.4). Used by
tests/test_decode.py for token-exact verification of the while_loop engines.

Numeric discipline: the oracles reuse jax.nn.log_softmax and accumulate in
float32 with the same op order as the engines, so every partial score is the
bit-identical IEEE value the engine computes — argmax/top-k comparisons are
exact, not tolerance-based.
"""

from __future__ import annotations

import numpy as np

NEG_INF = -1e30


def _ngram_bans(seq, n):
    """Naive no-repeat-ngram ban set: tokens that would complete an
    n-gram already present in ``seq`` (a Python list of generated
    tokens). Built from a plain seen-ngram scan — independent of the
    engine's windowed-compare implementation (decode/ngram.py)."""
    if n < 1 or len(seq) < n - 1:
        return set()
    suffix = tuple(seq[len(seq) - (n - 1):])
    return {
        seq[i + n - 1]
        for i in range(len(seq) - n + 1)
        if tuple(seq[i:i + n - 1]) == suffix
    }


def greedy_oracle(
    step_fn, params, state, *, start_id, end_id, max_len, pad_id=0,
    min_len=0, no_repeat_ngram_size=0,
):
    """Per-step greedy loop mirroring tpucap.decode.greedy semantics."""
    import jax
    import jax.numpy as jnp

    B = jax.tree_util.tree_leaves(state)[0].shape[0]
    tokens = np.full((B, max_len), pad_id, np.int32)
    lengths = np.zeros((B,), np.int32)
    scores = np.zeros((B,), np.float32)
    done = np.zeros((B,), bool)
    last = np.full((B,), start_id, np.int32)

    for t in range(max_len):
        if done.all():
            break
        logits, state = step_fn(params, state, jnp.asarray(last))
        # Engine convention: full-softmax log-probs (pad mass included in
        # the normalizer, matching beam.py); pad excluded from argmax only.
        logits = jnp.asarray(logits).astype(jnp.float32)
        logp = np.asarray(jax.nn.log_softmax(logits, axis=-1))
        masked = np.array(logits.at[:, pad_id].set(-np.inf))
        if no_repeat_ngram_size:
            # Engine semantics: repeated-ngram completions leave the
            # argmax only (scores stay full-softmax log-probs).
            for b in range(B):
                for w in _ngram_bans(
                    [int(x) for x in tokens[b, :t]], no_repeat_ngram_size
                ):
                    masked[b, w] = -np.inf
        if t < min_len:
            # Engine min_len semantics: endseq excluded from the argmax,
            # scores untouched (full-softmax log-probs).
            masked[:, end_id] = -np.inf
        nxt = masked.argmax(axis=-1).astype(np.int32)
        for b in range(B):
            if done[b]:
                last[b] = pad_id
                continue
            tokens[b, t] = nxt[b]
            lengths[b] += 1
            scores[b] = np.float32(scores[b] + logp[b, nxt[b]])
            last[b] = nxt[b]
            if nxt[b] == end_id:
                done[b] = True
    return tokens, lengths, scores


def beam_oracle(
    step_fn,
    params,
    state,
    *,
    start_id,
    end_id,
    max_len,
    beam_width,
    pad_id=0,
    min_len=0,
    no_repeat_ngram_size=0,
    length_normalize=True,
    alpha=1.0,
    length_penalty="simple",
):
    """Frozen-slot beam oracle matching tpucap.decode.beam semantics.

    Candidates rank by (score desc, flattened parent*V+word asc) — the
    lax.top_k tie order.
    """
    import jax
    import jax.numpy as jnp

    k = beam_width
    B = jax.tree_util.tree_leaves(state)[0].shape[0]
    state = jax.tree_util.tree_map(lambda x: jnp.repeat(x, k, axis=0), state)

    tokens = np.full((B, k, max_len), pad_id, np.int32)
    scores = np.full((B, k), NEG_INF, np.float32)
    scores[:, 0] = 0.0
    lengths = np.zeros((B, k), np.int32)
    finished = np.zeros((B, k), bool)
    last = np.full((B * k,), start_id, np.int32)

    for t in range(max_len):
        if finished.all():
            break
        logits, new_state = step_fn(params, state, jnp.asarray(last))
        V = logits.shape[-1]
        logp = np.array(jax.nn.log_softmax(logits, axis=-1)).reshape(B, k, V)
        logp[:, :, pad_id] = NEG_INF
        if no_repeat_ngram_size:
            # Engine semantics: per-hypothesis repeated-ngram
            # completions leave the candidate set (selection-only).
            for b in range(B):
                for j in range(k):
                    hist = [
                        int(x) for x in tokens[b, j, :t]
                    ][: int(lengths[b, j])]
                    for w in _ngram_bans(hist, no_repeat_ngram_size):
                        logp[b, j, w] = NEG_INF
        if t < min_len:
            # Engine min_len semantics: endseq leaves the candidate set
            # while t < min_len (never selected, so survivor scores are
            # unchanged full-softmax log-probs).
            logp[:, :, end_id] = NEG_INF

        new_tokens = np.empty_like(tokens)
        new_scores = np.empty_like(scores)
        new_lengths = np.empty_like(lengths)
        new_finished = np.empty_like(finished)
        parents = np.zeros((B, k), np.int64)
        words = np.zeros((B, k), np.int32)

        for b in range(B):
            cands = []  # (score, flat_idx, parent, word)
            for j in range(k):
                if finished[b, j]:
                    # Engine: frozen_cand = score + 0.0 at pad slot.
                    sc = np.float32(scores[b, j] + np.float32(0.0))
                    cands.append((sc, j * V + pad_id, j, pad_id))
                else:
                    cont = np.float32(scores[b, j]) + logp[b, j].astype(
                        np.float32
                    )
                    for w in range(V):
                        cands.append((cont[w], j * V + w, j, w))
            cands.sort(key=lambda x: (-x[0], x[1]))
            for slot, (sc, _, parent, w) in enumerate(cands[:k]):
                parents[b, slot] = parent
                new_scores[b, slot] = sc
                new_tokens[b, slot] = tokens[b, parent]
                new_lengths[b, slot] = lengths[b, parent]
                if finished[b, parent]:
                    words[b, slot] = pad_id
                    new_finished[b, slot] = True
                else:
                    words[b, slot] = w
                    new_tokens[b, slot, t] = w
                    new_lengths[b, slot] += 1
                    new_finished[b, slot] = w == end_id

        tokens, scores = new_tokens, new_scores
        lengths, finished = new_lengths, new_finished

        def gather(x):
            xn = np.asarray(x)
            xr = xn.reshape((B, k) + xn.shape[1:])
            out = np.stack([xr[b][parents[b]] for b in range(B)])
            return jnp.asarray(out.reshape((B * k,) + xn.shape[1:]))

        state = jax.tree_util.tree_map(gather, new_state)
        last = words.reshape(B * k)

    from tpucap.decode.beam import normalized_scores

    norm = np.asarray(
        normalized_scores(
            scores,
            lengths,
            length_normalize=length_normalize,
            alpha=alpha,
            length_penalty=length_penalty,
        )
    )
    best = norm.argmax(axis=1)
    bi = np.arange(B)
    return (
        tokens[bi, best],
        lengths[bi, best],
        scores[bi, best],
        tokens,
        lengths,
        scores,
    )
