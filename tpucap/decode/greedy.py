"""Batched greedy decoding as a single lax.while_loop program.

Replaces the reference's `generate_desc` host loop (SURVEY.md §3.3): instead
of padding the growing prefix and re-running the full forward per token
(O(L^2) compute + one host<->device round trip per token), the decoder state
(h, c, image branch) is carried on-device and each iteration is one
incremental step for the whole batch. Token-for-token equivalent to the
reference because the LSTM recurrence over the unpadded prefix equals the
masked forward over the padded prefix (tests/test_lstm_parity.py).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class DecodeResult:
    """tokens: (B, max_len) generated ids (end token included, pad after);
    lengths: (B,) number of generated tokens incl. the end token;
    scores: (B,) sum of per-token log-probs of the generated tokens."""

    tokens: Any
    lengths: Any
    scores: Any


def _batch_size(state) -> int:
    return jax.tree_util.tree_leaves(state)[0].shape[0]


def unroll_body(body, unroll: int, *, limit: int, limit_index: int = 0):
    """Run ``unroll`` copies of a while_loop ``body`` per iteration,
    freezing the carry once ``carry[limit_index] >= limit`` — the
    launch-overhead experiment dial (docs/PERF.md): each while iteration
    then dispatches ``unroll`` model steps' worth of fused kernels
    between loop-condition evaluations, at the price of up to
    ``unroll - 1`` wasted (frozen, fully-masked) steps at the tail.

    The freeze makes unrolling TOKEN-exact: steps past the step budget
    compute and are discarded wholesale (where(active, new, old) on
    every carry leaf), so no accumulator write, beam reorder, or
    length drift can occur — pinned by tests/test_decode.py against
    unroll=1. Scores can differ at the last ulp only (the unrolled
    body is a different XLA program; fused float reductions may round
    differently)."""

    def body_unrolled(carry):
        for _ in range(unroll):
            active = carry[limit_index] < limit
            new = body(carry)
            carry = jax.tree_util.tree_map(
                lambda n, o: jnp.where(active, n, o), new, carry
            )
        return carry

    return body_unrolled


def greedy_decode(
    step_fn: Callable,
    params,
    state,
    *,
    start_id: int,
    end_id: int,
    max_len: int,
    pad_id: int = 0,
    min_len: int = 0,
    banned_ids: tuple = (),
    decoder=None,  # accepted for interface parity with beam_decode (unused)
    unroll: int = 1,
) -> DecodeResult:
    """Greedy-decode a batch. ``step_fn(params, state, token) -> (logits, state)``.

    ``pad_id`` (the tokenizer's reserved index 0) is masked out of the argmax
    — the reference's `word_for_id(0)` returns None and would abort the
    caption; a trained model never predicts it, so masking is behavior-
    preserving while keeping shapes static.

    ``unroll`` > 1 runs that many steps per while_loop iteration
    (token-exact — see unroll_body), trading early-exit granularity for
    fewer loop-condition boundaries.
    """
    B = _batch_size(state)
    tokens0 = jnp.full((B, max_len), pad_id, jnp.int32)

    def cond(carry):
        t, _, _, _, done, _, _ = carry
        return jnp.logical_and(t < max_len, ~jnp.all(done))

    def body(carry):
        t, tokens, state, last, done, lengths, scores = carry
        with jax.named_scope("greedy_model_step"):
            logits, new_state = step_fn(params, state, last)
        # Lazy log-softmax: argmax over raw (pad-masked) logits picks the
        # same token; only the chosen token's log-prob needs the logsumexp
        # correction — avoids materializing the full log-prob array.
        logits = logits.astype(jnp.float32)
        masked = logits.at[:, pad_id].set(-jnp.inf)
        if banned_ids:
            # Banned words (DecodeConfig.bad_words): out of the argmax,
            # selection-only like pad — the lse below stays full-softmax.
            from tpucap.decode.beam import apply_banned

            masked = apply_banned(masked, banned_ids)
        if min_len:
            # Length floor (see beam.py): endseq excluded from the
            # argmax while t < min_len; the score stays the chosen
            # token's full-softmax log-prob.
            masked = jnp.where(
                t < min_len, masked.at[:, end_id].set(-jnp.inf), masked
            )
        # Full-softmax normalizer (pad mass INCLUDED), the same convention
        # as beam.py and the model's training distribution — so greedy
        # scores, beam scores, and teacher-forced log-probs are mutually
        # comparable. Pad stays excluded from the argmax only.
        lse = jax.scipy.special.logsumexp(logits, axis=-1)
        nxt = jnp.argmax(masked, axis=-1).astype(jnp.int32)
        tok_logp = (
            jnp.take_along_axis(logits, nxt[:, None], axis=-1)[:, 0] - lse
        )
        nxt = jnp.where(done, pad_id, nxt)
        tokens = jax.lax.dynamic_update_slice(tokens, nxt[:, None], (0, t))
        lengths = lengths + jnp.where(done, 0, 1)
        scores = scores + jnp.where(done, 0.0, tok_logp)
        done = jnp.logical_or(done, nxt == end_id)
        return t + 1, tokens, new_state, nxt, done, lengths, scores

    carry = (
        jnp.array(0, jnp.int32),
        tokens0,
        state,
        jnp.full((B,), start_id, jnp.int32),
        jnp.zeros((B,), bool),
        jnp.zeros((B,), jnp.int32),
        jnp.zeros((B,), jnp.float32),
    )
    if unroll > 1:
        body = unroll_body(body, unroll, limit=max_len)
    _, tokens, _, _, _, lengths, scores = jax.lax.while_loop(cond, body, carry)
    return DecodeResult(tokens=tokens, lengths=lengths, scores=scores)
