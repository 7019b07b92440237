"""Vectorized batched beam search as a single lax.while_loop program.

The reference expands each live beam with its own model.predict per step
(SURVEY.md §3.4 — the worst hot loop). Here hypotheses are vectorized
(cf. arXiv:1811.04568, PAPERS.md): decoder state has shape (B*k, ...), one
fused step scores all B*k hypotheses, and ``lax.top_k`` over the flattened
(k*V) candidate scores does the beam bookkeeping on-device under fixed
shapes.

Semantics (mirrored token-exactly by tests/oracle):
- beams start identical with scores [0, -inf, ...] so the first expansion
  selects the global top-k first words;
- a beam that emits ``end_id`` is *frozen*: it keeps its slot, and its only
  continuation is ``pad_id`` with score unchanged;
- ``pad_id`` (reserved index 0) is masked out of live expansions;
- final ranking is score / length**alpha when length_normalize (length
  includes the end token), ties broken by lower flattened candidate index
  (lax.top_k order).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp

NEG_INF = -1e30  # avoid inf-inf NaNs inside score arithmetic


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class BeamResult:
    """tokens: (B, max_len) best beam; lengths/scores: (B,);
    beam_tokens: (B, k, max_len) all beams; beam_lengths/beam_scores: (B, k)
    (raw, un-normalized log-prob sums)."""

    tokens: Any
    lengths: Any
    scores: Any
    beam_tokens: Any
    beam_lengths: Any
    beam_scores: Any


def normalized_scores(
    scores, lengths, *, length_normalize: bool = True,
    alpha: float = 1.0, length_penalty: str = "simple",
):
    """The beam RANKING quantity, shared by the engine's final argmax,
    generate_n_best, and the oracle so the three can never drift:
    'simple' (the reference genre's convention) divides by len^alpha;
    'gnmt' (Wu et al. 2016 eq. 14) divides by ((5+len)/6)^alpha —
    gentler on short captions, the production MT convention. f32
    throughout (the engine ranks in f32)."""
    if not length_normalize:
        return scores
    lengths = jnp.maximum(lengths, 1).astype(jnp.float32)
    if length_penalty == "gnmt":
        denom = ((5.0 + lengths) / 6.0) ** alpha
    elif length_penalty == "simple":
        denom = lengths**alpha
    else:
        raise ValueError(
            f"unknown length_penalty {length_penalty!r}; "
            "have simple|gnmt"
        )
    return scores / denom


def apply_banned(masked, banned_ids):
    """Exclude ``banned_ids`` (a STATIC tuple of token ids — part of the
    compiled program, like pad_id) from the candidate vocabulary.
    Selection-only, the same convention as the pad/min_len masks: the
    softmax normalizer is computed from the raw logits, so scores stay
    true log-probs under the full softmax."""
    if not banned_ids:
        return masked
    ids = jnp.asarray(tuple(banned_ids), jnp.int32)
    return masked.at[:, ids].set(jnp.asarray(NEG_INF, masked.dtype))


def _shared_keys(decoder_or_none, state) -> frozenset:
    """Top-level state keys that are per-image constants (identical across
    a beam's hypotheses) — e.g. the attention decoder's feature grids. They
    are neither tiled to (B*k, ...) nor parent-gathered, cutting their HBM
    traffic k-fold; the decoder's step infers the hypothesis count from the
    shape ratio."""
    keys = getattr(decoder_or_none, "beam_shared_keys", frozenset())
    if isinstance(state, dict):
        return frozenset(k for k in keys if k in state)
    return frozenset()


def _tile_state(state, k: int, shared: frozenset = frozenset()):
    """(B, ...) -> (B*k, ...) with each row repeated k times (beam-major),
    leaving shared (per-image) entries untiled."""

    def tile(x):
        return jnp.repeat(x, k, axis=0)

    if isinstance(state, dict) and shared:
        return {
            key: (v if key in shared else jax.tree_util.tree_map(tile, v))
            for key, v in state.items()
        }
    return jax.tree_util.tree_map(tile, state)


def _gather_beams(tree, parent, B: int, k: int, shared: frozenset = frozenset()):
    """Reindex (B*k, ...) state by parent (B, k) beam indices; shared
    entries are identical across beams so gathering is the identity."""

    def gather(x):
        xr = x.reshape((B, k) + x.shape[1:])
        out = jax.vmap(lambda rows, idx: rows[idx])(xr, parent)
        return out.reshape((B * k,) + x.shape[1:])

    if isinstance(tree, dict) and shared:
        return {
            key: (v if key in shared else jax.tree_util.tree_map(gather, v))
            for key, v in tree.items()
        }
    return jax.tree_util.tree_map(gather, tree)


def beam_decode(
    step_fn: Callable,
    params,
    state,
    *,
    start_id: int,
    end_id: int,
    max_len: int,
    beam_width: int,
    pad_id: int = 0,
    min_len: int = 0,
    banned_ids: tuple = (),
    no_repeat_ngram_size: int = 0,
    length_normalize: bool = True,
    alpha: float = 1.0,
    length_penalty: str = "simple",
    decoder=None,
    scorer=None,
    approx_topk: bool = False,
    init_scores=None,
    unroll: int = 1,
) -> BeamResult:
    """Beam-search a batch. ``step_fn(params, state, token) -> (logits, state)``
    where state leaves carry a leading hypothesis axis. Pass ``decoder`` to
    honor its ``beam_shared_keys`` (per-image state kept untiled).

    ``start_id`` may be a scalar or a (B,) array (forced-prefix
    continuation: every beam of a row starts from the last token of its
    primed prefix — decode/prefix.py). ``init_scores`` (B,) shifts every
    slot's score (rank-invariant within a row) so reported scores cover
    prefix + continuation.

    ``min_len``: endseq is excluded from the candidate vocabulary at
    steps t < min_len, so every caption carries at least ``min_len``
    non-end tokens before (a possible) endseq — the standard production
    length floor. Scores stay true log-probs under the FULL softmax (the
    mask shapes selection only, like pad).

    ``scorer`` (advanced): replaces the default scoring stage. Called as
    ``scorer(params, state, last, t) -> (cand_logp (B, k, C), cand_words
    (B, k, C) int32, new_state)`` where the C candidates per live beam must
    be sorted the way ``lax.top_k`` sorts (score desc, index-ordered ties,
    grouped so that candidate order within a beam follows ascending global
    word index on ties) and must already exclude ``pad_id`` (and honor
    ``min_len`` via the step index ``t`` and ``banned_ids``). Used by the
    tensor-parallel engine to plug in vocab-sharded scoring while sharing
    this loop's bookkeeping, backpointers, and reconstruction.

    ``no_repeat_ngram_size`` > 0 excludes from each hypothesis's
    candidate vocabulary any token that would complete an n-gram that
    hypothesis already generated (decode/ngram.py). Selection-only like
    pad/min_len (the lse stays full-softmax). Opt-in cost: the loop
    then carries a materialized (B, k, max_len) per-hypothesis token
    buffer (gathered by parent each step) that the backpointer design
    otherwise avoids — negligible at caption lengths, but only paid
    when the dial is set.

    ``unroll`` > 1 runs that many steps per while_loop iteration
    (token-exact — frozen-carry semantics, decode/greedy.unroll_body),
    trading early-exit granularity for fewer loop boundaries."""
    k = beam_width
    B = jax.tree_util.tree_leaves(state)[0].shape[0]
    shared = _shared_keys(decoder, state)
    state = _tile_state(state, k, shared)
    ngram = no_repeat_ngram_size
    if ngram and scorer is not None:
        # A custom scorer reduces each beam to k candidates before this
        # loop sees scores, so the ngram ban must be applied INSIDE the
        # scorer (before its stage-1 top-k) to stay selection-exact.
        # Scorers that can do that declare it by accepting a ``seqs``
        # kwarg (the TP vocab-sharded scorer bans on its local slice);
        # anything else is refused rather than silently un-banned.
        import inspect

        if "seqs" not in inspect.signature(scorer).parameters:
            raise NotImplementedError(
                "no_repeat_ngram_size needs a scorer that accepts the "
                "per-hypothesis history (a 'seqs' kwarg); this custom "
                "scorer does not — use parallelism=None/'dp'"
            )

    if scorer is None:

        def scorer(params, state, last, t, seqs=None):
            with jax.named_scope("beam_model_step"):
                logits, new_state = step_fn(params, state, last)  # (B*k, V)
            # Lazy log-softmax: log_softmax is a per-row monotonic shift of
            # the raw logits, so per-beam top-k runs directly on the
            # (pad-masked) logits and the logsumexp correction is applied
            # to the k survivors only — one reduce instead of
            # materializing the full (B*k, V) f32 log-prob array. The
            # stage-1 top_k stays in the model's native dtype (half the
            # sort bandwidth on bf16 flows; bf16->f32 is order-preserving
            # so the selection is identical to upcasting first); scores
            # are f32 regardless.
            lse = jax.scipy.special.logsumexp(
                logits.astype(jnp.float32), axis=-1
            )  # (B*k,)
            masked = logits.at[:, pad_id].set(
                jnp.asarray(NEG_INF, logits.dtype)
            )
            # Banned words (DecodeConfig.bad_words) leave the candidate
            # set entirely; selection-only like pad (lse untouched).
            masked = apply_banned(masked, banned_ids)
            if seqs is not None:
                # No-repeat-ngram: per-hypothesis ban mask from the
                # carried token history, applied BEFORE stage-1 top-k so
                # the slot goes to the next-best word (selection-exact
                # vs the oracle); lse stays the full-softmax normalizer.
                from tpucap.decode.ngram import apply_ngram_ban

                masked = apply_ngram_ban(
                    masked, seqs.reshape(B * k, -1), t, ngram
                )
            if min_len:
                # Length floor: endseq leaves the candidate set while
                # t < min_len. Masked BEFORE stage-1 top-k so the slot
                # goes to the next-best real word (selection-exact vs
                # the oracle); lse stays the full-softmax normalizer.
                blocked = masked.at[:, end_id].set(
                    jnp.asarray(NEG_INF, masked.dtype)
                )
                masked = jnp.where(t < min_len, blocked, masked)
            # Per-beam top-k over V (stage 1 of the exact two-stage top-k).
            # approx_topk=True swaps in TPU's approx_max_k custom call
            # (tpu_custom_approx_top_k): ~2-4x faster over the vocab axis
            # at recall ~0.95 per-step; stage 2 below stays exact. Opt-in
            # because token-exactness vs the oracle is the default
            # contract (DecodeConfig.approx_topk).
            if approx_topk:
                pb_vals, pb_words = jax.lax.approx_max_k(masked, k)
            else:
                pb_vals, pb_words = jax.lax.top_k(masked, k)  # (B*k, k)
            pb_logp = (
                pb_vals.astype(jnp.float32) - lse[:, None]
            ).reshape(B, k, k)
            pb_words = pb_words.reshape(B, k, k)
            return pb_logp, pb_words, new_state

    # Backpointer accumulators instead of carrying materialized sequences:
    # the loop only appends (word, parent) at step t — write-only buffers
    # XLA can alias in place — and sequences are reconstructed after the
    # loop by walking the parent pointers backwards. This removes the
    # per-step full-token-buffer copy + parent gather the device trace
    # showed costing ~40us/step. parents init to identity so steps after
    # early exit are pass-through during reconstruction.
    words0 = jnp.full((max_len, B, k), pad_id, jnp.int32)
    parents0 = jnp.broadcast_to(
        jnp.arange(k, dtype=jnp.int32)[None, None, :], (max_len, B, k)
    )
    scores0 = jnp.tile(
        jnp.concatenate(
            [jnp.zeros((1,)), jnp.full((k - 1,), NEG_INF)]
        )[None, :],
        (B, 1),
    ).astype(jnp.float32)
    if init_scores is not None:
        # Constant per row: within-row ranking is unchanged, the
        # NEG_INF stagger still pins slot 0 as the only live seed.
        scores0 = scores0 + jnp.asarray(init_scores, jnp.float32)[:, None]

    def cond(carry):
        return jnp.logical_and(carry[0] < max_len, ~jnp.all(carry[5]))

    def body(carry):
        (t, words_acc, parents_acc, state, last, finished, lengths,
         scores) = carry[:8]
        if ngram:
            seqs = carry[8]
            pb_logp, pb_words, new_state = scorer(
                params, state, last, t, seqs=seqs
            )
        else:
            pb_logp, pb_words, new_state = scorer(params, state, last, t)
        C = pb_logp.shape[-1]  # candidates per live beam (k, or shards*k)

        live_cand = scores[:, :, None] + pb_logp  # (B, k, C)
        # Frozen beams contribute exactly one candidate: pad, score
        # unchanged, in their rank-0 slot (preserving the flattened
        # parent*V+word tie order of a single-stage top-k).
        frozen_rank = jnp.full((C,), NEG_INF).at[0].set(0.0)
        frozen_cand = scores[:, :, None] + frozen_rank[None, None, :]
        fin = finished[:, :, None]
        cand = jnp.where(fin, frozen_cand, live_cand)
        cand_words = jnp.where(fin, pad_id, pb_words)

        # Stage 2: merge the k*C survivors. Exact: the global top-k of a
        # union equals the top-k of per-set top-k's; tie order (score desc,
        # then parent asc, then word-index asc) matches the single-stage
        # flat ordering because candidates stay grouped by parent and
        # per-beam top_k is index-ordered on ties.
        merged = cand.reshape(B, k * C)
        top_scores, idx2 = jax.lax.top_k(merged, k)  # (B, k)
        parent = idx2 // C
        word = jnp.take_along_axis(
            cand_words.reshape(B, k * C), idx2, axis=1
        ).astype(jnp.int32)

        take = lambda arr: jnp.take_along_axis(arr, parent, axis=1)
        parent_finished = take(finished)
        lengths = take(lengths)

        emit = ~parent_finished
        word = jnp.where(parent_finished, pad_id, word)
        words_acc = jax.lax.dynamic_update_slice(
            words_acc, word[None], (t, 0, 0)
        )
        parents_acc = jax.lax.dynamic_update_slice(
            parents_acc, parent.astype(jnp.int32)[None], (t, 0, 0)
        )
        lengths = lengths + emit.astype(jnp.int32)
        finished = parent_finished | (word == end_id)

        state = _gather_beams(new_state, parent, B, k, shared)
        last = word.reshape(B * k)
        out = (
            t + 1,
            words_acc,
            parents_acc,
            state,
            last,
            finished,
            lengths,
            top_scores,
        )
        if ngram:
            # Per-hypothesis history: reindex by parent, append this
            # step's word (pad for frozen slots — harmless, frozen
            # hypotheses never expand again).
            seqs = jnp.take_along_axis(seqs, parent[:, :, None], axis=1)
            seqs = jax.lax.dynamic_update_slice(
                seqs, word[:, :, None], (0, 0, t)
            )
            out = out + (seqs,)
        return out

    carry = (
        jnp.array(0, jnp.int32),
        words0,
        parents0,
        state,
        jnp.repeat(
            jnp.broadcast_to(jnp.asarray(start_id, jnp.int32), (B,)), k
        ),
        jnp.zeros((B, k), bool),
        jnp.zeros((B, k), jnp.int32),
        scores0,
    )
    if ngram:
        carry = carry + (jnp.full((B, k, max_len), pad_id, jnp.int32),)
    if unroll > 1:
        from tpucap.decode.greedy import unroll_body

        body = unroll_body(body, unroll, limit=max_len)
    final = jax.lax.while_loop(cond, body, carry)
    _, words_acc, parents_acc, _, _, finished, lengths, scores = final[:8]

    # Reconstruct the (B, k, max_len) sequences by walking backpointers
    # from the final slots to step 0 (one backward scan; outside the hot
    # loop).
    def back(ptr, wp):
        w_t, p_t = wp  # (B, k) each
        tok = jnp.take_along_axis(w_t, ptr, axis=1)
        ptr = jnp.take_along_axis(p_t, ptr, axis=1)
        return ptr, tok

    init_ptr = jnp.broadcast_to(
        jnp.arange(k, dtype=jnp.int32)[None, :], (B, k)
    )
    _, toks_rev = jax.lax.scan(
        back, init_ptr, (words_acc[::-1], parents_acc[::-1])
    )
    tokens = jnp.moveaxis(toks_rev[::-1], 0, -1)  # (B, k, max_len)

    # Final ranking. With a primed prefix (init_scores), rank by the
    # CONTINUATION's length-normalized log-prob — the shared prefix
    # constant divided by per-beam lengths would otherwise skew the
    # normalization; reported scores still include the prefix.
    rank_scores = scores
    if init_scores is not None:
        rank_scores = (
            scores - jnp.asarray(init_scores, jnp.float32)[:, None]
        )
    norm = normalized_scores(
        rank_scores,
        lengths,
        length_normalize=length_normalize,
        alpha=alpha,
        length_penalty=length_penalty,
    )
    best = jnp.argmax(norm, axis=1)  # ties -> lowest beam slot (top_k order)

    pick = lambda arr: jnp.take_along_axis(
        arr, best.reshape((B,) + (1,) * (arr.ndim - 1)), axis=1
    ).squeeze(1)
    return BeamResult(
        tokens=pick(tokens),
        lengths=pick(lengths),
        scores=pick(scores),
        beam_tokens=tokens,
        beam_lengths=lengths,
        beam_scores=scores,
    )
