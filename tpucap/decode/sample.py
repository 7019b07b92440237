"""Stochastic sampling decode (temperature / top-k / top-p), fully on-device.

Not part of the reference surface (it only ships greedy + beam,
SURVEY.md §2.1 #10-11) — provided as a framework extra on the same
while_loop engine: one compiled program per batch, PRNG key threaded
through the carry, early exit when every sequence has finished.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tpucap.decode.greedy import DecodeResult

NEG_INF = -1e30


def sample_decode(
    step_fn,
    params,
    state,
    *,
    rng,
    start_id: int,
    end_id: int,
    max_len: int,
    temperature: float = 1.0,
    top_k: int | None = None,
    top_p: float | None = None,
    repetition_penalty: float = 1.0,
    pad_id: int = 0,
    min_len: int = 0,
    banned_ids: tuple = (),
    no_repeat_ngram_size: int = 0,
    init_scores=None,
) -> DecodeResult:
    """Ancestral sampling with optional temperature, top-k truncation,
    and top-p (nucleus) truncation — applied in that order, the
    conventional composition: temperature reshapes the distribution,
    top-k hard-caps the candidate count, top-p then keeps the smallest
    prefix of the (remaining) probability-sorted vocabulary whose mass
    reaches p (the top-1 token always survives).

    ``repetition_penalty`` > 1 discourages re-sampling tokens the
    sequence already produced (CTRL / HF convention, applied FIRST:
    a seen token's positive logit is divided by the penalty, a negative
    one multiplied — both monotonically push it down). The seen-set is
    per sequence and grows as the loop emits; start/pad ids are never
    penalized (pad is hard-masked anyway).

    ``no_repeat_ngram_size`` > 0 hard-masks any token that would
    complete an n-gram the sequence already generated (decode/ngram.py)
    — masked before the softmax, so the remaining vocabulary
    renormalizes (sampling semantics, like min_len's endseq handling).

    rng: jax PRNG key; the same key reproduces the same captions.
    """
    if temperature <= 0.0:
        raise ValueError(
            f"temperature must be > 0, got {temperature}; for "
            "deterministic decoding use greedy_decode"
        )
    if top_k is not None and top_k < 1:
        raise ValueError(f"top_k must be >= 1, got {top_k}")
    if top_p is not None and not (0.0 < top_p <= 1.0):
        raise ValueError(f"top_p must be in (0, 1], got {top_p}")
    if repetition_penalty <= 0.0:
        raise ValueError(
            f"repetition_penalty must be > 0, got {repetition_penalty}"
        )
    B = jax.tree_util.tree_leaves(state)[0].shape[0]
    tokens0 = jnp.full((B, max_len), pad_id, jnp.int32)

    def cond(carry):
        t, *_ = carry
        done = carry[4]
        return jnp.logical_and(t < max_len, ~jnp.all(done))

    def body(carry):
        t, tokens, state, last, done, lengths, scores, seen, key = carry
        logits, new_state = step_fn(params, state, last)
        logits = logits.astype(jnp.float32).at[:, pad_id].set(NEG_INF)
        if banned_ids:
            # Banned words carry no probability mass (masked before the
            # softmax, so the remaining vocabulary renormalizes —
            # sampling semantics, same as min_len's endseq handling).
            from tpucap.decode.beam import apply_banned

            logits = apply_banned(logits, banned_ids)
        if use_pen:
            penalized = jnp.where(
                logits > 0,
                logits / repetition_penalty,
                logits * repetition_penalty,
            )
            logits = jnp.where(seen, penalized, logits)
        if no_repeat_ngram_size:
            # No-repeat-ngram: banned completions carry no probability
            # mass (the rest of the vocabulary renormalizes).
            from tpucap.decode.ngram import apply_ngram_ban

            logits = apply_ngram_ban(
                logits, tokens, t, no_repeat_ngram_size
            )
        if min_len:
            # Length floor: endseq carries no probability mass while
            # t < min_len (masked before the softmax, so the remaining
            # vocabulary renormalizes — sampling semantics).
            logits = jnp.where(
                t < min_len, logits.at[:, end_id].set(NEG_INF), logits
            )
        if temperature != 1.0:
            logits = logits / temperature
        if top_k is not None:
            kth = jax.lax.top_k(logits, top_k)[0][:, -1:]
            logits = jnp.where(logits < kth, NEG_INF, logits)
        if top_p is not None and top_p < 1.0:
            # Nucleus truncation, shape-static: sort once per step,
            # keep tokens whose EXCLUSIVE cumulative probability is
            # below p (so the top token is always kept), and threshold
            # the unsorted logits at the smallest kept value. A (B, V)
            # sort at V~7.5k is trivial next to the step's matmuls.
            sorted_desc = -jnp.sort(-logits, axis=-1)
            probs = jax.nn.softmax(sorted_desc, axis=-1)
            cum = jnp.cumsum(probs, axis=-1)
            kcount = jnp.sum((cum - probs) < top_p, axis=-1)
            thresh = jnp.take_along_axis(
                sorted_desc, (kcount - 1)[:, None], axis=-1
            )
            logits = jnp.where(logits < thresh, NEG_INF, logits)
        logp = jax.nn.log_softmax(logits, axis=-1)

        key, sub = jax.random.split(key)
        nxt = jax.random.categorical(sub, logits, axis=-1).astype(jnp.int32)
        tok_logp = jnp.take_along_axis(logp, nxt[:, None], axis=-1)[:, 0]

        nxt = jnp.where(done, pad_id, nxt)
        tokens = jax.lax.dynamic_update_slice(tokens, nxt[:, None], (0, t))
        lengths = lengths + jnp.where(done, 0, 1)
        scores = scores + jnp.where(done, 0.0, tok_logp)
        if use_pen:
            # One-hot scatter keeps the (B, V) seen-set write O(V) and
            # XLA-friendly; pad writes (finished rows) are harmless.
            seen = jnp.logical_or(
                seen, jax.nn.one_hot(nxt, seen.shape[-1], dtype=bool)
            )
        done = jnp.logical_or(done, nxt == end_id)
        return (
            t + 1, tokens, new_state, nxt, done, lengths, scores, seen,
            key,
        )

    # The (B, V) seen-set exists only when the penalty is live — default
    # callers (SCST rollouts, plain sampling) must not pay the per-step
    # O(B*V) scatter or the extra carry. Vocab width comes from a
    # shape-only trace of one step (no FLOPs, works under an outer jit);
    # when off, a (B, 1) placeholder keeps the carry structure static.
    use_pen = repetition_penalty != 1.0
    V = (
        jax.eval_shape(
            lambda p, s, l: step_fn(p, s, l)[0],
            params,
            state,
            jnp.broadcast_to(jnp.asarray(start_id, jnp.int32), (B,)),
        ).shape[-1]
        if use_pen
        else 1
    )
    carry = (
        jnp.array(0, jnp.int32),
        tokens0,
        state,
        jnp.broadcast_to(jnp.asarray(start_id, jnp.int32), (B,)),
        jnp.zeros((B,), bool),
        jnp.zeros((B,), jnp.int32),
        (
            jnp.zeros((B,), jnp.float32)
            if init_scores is None
            else jnp.asarray(init_scores, jnp.float32)
        ),
        jnp.zeros((B, V), bool),
        rng,
    )
    _, tokens, _, _, _, lengths, scores, _, _ = jax.lax.while_loop(
        cond, body, carry
    )
    return DecodeResult(tokens=tokens, lengths=lengths, scores=scores)
