"""Constrained beam search (Anderson et al., EMNLP 2017) — captions
that MUST include given words.

Guided open-vocabulary captioning was the constraint-decoding paper's
own motivating task: force image tags / user keywords into the caption
without retraining. The construction is a finite-state machine over
constraint-satisfaction states: for C single-word constraints there are
S = 2^C subsets, each holding its own beam of k hypotheses; emitting an
unsatisfied constraint word w_i moves a hypothesis from bank s to bank
s | {i}, and the answer is the best finished hypothesis in the
most-satisfied reachable bank (the paper's fallback when full
satisfaction is unreachable).

The reference cannot do this at all (its beam is a host loop re-running
model.predict per hypothesis — SURVEY.md §3.4); the complement dial
(``bad_words`` — words that must NOT appear) is decode/beam.py's
``banned_ids``.

TPU-first shape: the bank axis rides the hypothesis axis — ONE fused
model step scores all B*S*k hypotheses per decode step, and the
per-bank selection is a static Python loop of S small top-k stages
inside the jitted body (the same compile-time-unrolled pattern as
diverse.py's groups). Bank transitions are just candidate routing:

- bank t's "stay" candidates are its own beams' per-hypothesis top-k
  with every UNSATISFIED constraint word masked out (emitting one
  cannot stay in t by definition);
- bank t's "arrival" candidates, for each i in t, are bank t\\{i}'s
  hypotheses extended by exactly the word w_i (one candidate per
  source hypothesis — a gather, not a top-k).

Backpointers are GLOBAL hypothesis indices in [0, S*k), so the
standard backward walk reconstructs sequences across bank hops.
Everything else — frozen-slot semantics, lazy log-softmax, pad/banned/
min_len masking, beam_shared_keys, f32 score discipline — is shared
with beam.py, and scores stay TRUE log-probs under the full softmax
(constraints shape selection only).

Unreachable bank slots carry score NEG_INF; in f32, NEG_INF + logp
absorbs back to NEG_INF exactly, so dead hypotheses stay dead and
tie-break deterministically (lowest candidate index). The final
ranking is TWO-STAGE — first the maximum satisfaction count among
reachable slots, then the engine's normalized score restricted to that
count — rather than one fused `count*BONUS + norm` float key, whose
f32 quantum at BONUS=1e6 (~0.06) would swallow typical normalized-score
gaps and degrade the within-count pick to index order.

Scope (documented, validated by the pipeline layer): single-token
constraints (phrase constraints would enlarge the FSM alphabet —
the word tokenizer makes every word single-token; BPE multi-piece
words are refused), C <= 4 (the step batch grows 2^C-fold — the
paper's regime is 1-3 tags), constraint words distinct and not
start/end/pad/banned.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp

from tpucap.decode.beam import (
    NEG_INF,
    _gather_beams,
    _shared_keys,
    _tile_state,
    apply_banned,
    normalized_scores,
)

MAX_CONSTRAINTS = 4  # 2^C banks ride the step batch; 16x is the ceiling


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class ConstrainedBeamResult:
    """tokens: (B, max_len) the winning caption; lengths/scores: (B,)
    (scores = raw TRUE log-prob sums); satisfied: (B, C) bool per
    constraint slot (padded slots read True — they were pre-satisfied);
    num_satisfied: (B,) int; beam_*: every bank's beams, (B, S, k, ...)
    with bank index bit i set == constraint i satisfied."""

    tokens: Any
    lengths: Any
    scores: Any
    satisfied: Any
    num_satisfied: Any
    beam_tokens: Any
    beam_lengths: Any
    beam_scores: Any


def constrained_beam_decode(
    step_fn: Callable,
    params,
    state,
    *,
    start_id: int,
    end_id: int,
    max_len: int,
    beam_width: int,
    constraint_ids,
    pad_id: int = 0,
    min_len: int = 0,
    banned_ids: tuple = (),
    length_normalize: bool = True,
    alpha: float = 1.0,
    length_penalty: str = "simple",
    decoder=None,
) -> ConstrainedBeamResult:
    """Beam-search a batch under must-include word constraints.

    ``step_fn(params, state, token) -> (logits, state)`` exactly as for
    beam_decode. ``constraint_ids`` is (C,) or (B, C) int32 — the token
    ids that must appear in each row's caption; a ``pad_id`` entry means
    "no constraint in this slot" for that row (the row starts with that
    slot pre-satisfied), which is how per-row constraint counts share
    one compiled program. C is static; ids may be traced.

    Returns the best hypothesis of the most-satisfied REACHABLE bank
    per row (full satisfaction when the model can reach it within
    ``max_len``; the result's ``satisfied`` mask says what was
    achieved). Scores are true log-prob sums — comparable with
    beam_decode / generate_n_best output."""
    k = beam_width
    cids = jnp.asarray(constraint_ids, jnp.int32)
    if cids.ndim == 1:
        cids = cids[None, :]
    C = cids.shape[-1]
    if not 1 <= C <= MAX_CONSTRAINTS:
        raise ValueError(
            f"need 1 <= C <= {MAX_CONSTRAINTS} constraint slots, got {C} "
            "(each slot doubles the step batch; pad unused slots with "
            "pad_id instead of widening C)"
        )
    S = 1 << C
    B = jax.tree_util.tree_leaves(state)[0].shape[0]
    cids = jnp.broadcast_to(cids, (B, C))
    shared = _shared_keys(decoder, state)
    state = _tile_state(state, S * k, shared)

    # Pre-satisfied slots (pad_id = unused): the row's live seed sits in
    # the bank whose bits are exactly its pre-satisfied set.
    pre = cids == pad_id  # (B, C) bool
    bank0 = jnp.sum(
        pre.astype(jnp.int32) * (1 << jnp.arange(C, dtype=jnp.int32)),
        axis=-1,
    )  # (B,)

    words0 = jnp.full((max_len, B, S, k), pad_id, jnp.int32)
    # Identity GLOBAL backpointers so post-exit steps are pass-through.
    parents0 = jnp.broadcast_to(
        jnp.arange(S * k, dtype=jnp.int32).reshape(1, 1, S, k),
        (max_len, B, S, k),
    )
    slot_live = jnp.concatenate(
        [jnp.zeros((1,)), jnp.full((k - 1,), NEG_INF)]
    ).astype(jnp.float32)  # rank stagger within the seed bank
    scores0 = jnp.where(
        (jnp.arange(S, dtype=jnp.int32)[None, :] == bank0[:, None])[
            :, :, None
        ],
        slot_live[None, None, :],
        jnp.float32(NEG_INF),
    )  # (B, S, k)

    def unreachable(scores):
        return scores < (NEG_INF / 2)

    def cond(carry):
        t, finished, scores = carry[0], carry[5], carry[7]
        live = ~(finished | unreachable(scores))
        return jnp.logical_and(t < max_len, jnp.any(live))

    def body(carry):
        (t, words_acc, parents_acc, state, last, finished, lengths,
         scores) = carry
        with jax.named_scope("cbs_model_step"):
            logits, new_state = step_fn(params, state, last)  # (B*S*k, V)
        V = logits.shape[-1]
        lse = jax.scipy.special.logsumexp(
            logits.astype(jnp.float32), axis=-1
        ).reshape(B, S, k)
        base = logits.at[:, pad_id].set(jnp.asarray(NEG_INF, logits.dtype))
        base = apply_banned(base, banned_ids)
        if min_len:
            blocked = base.at[:, end_id].set(
                jnp.asarray(NEG_INF, base.dtype)
            )
            base = jnp.where(t < min_len, blocked, base)
        base = base.reshape(B, S, k, V)
        logits_r = logits.reshape(B, S, k, V)

        # Per-constraint word-match masks (per-row ids, so a compare
        # against iota rather than a static index set).
        iota_v = jnp.arange(V, dtype=jnp.int32)
        eq = [iota_v[None, :] == cids[:, i][:, None] for i in range(C)]

        frozen_rank_stay = jnp.full((k,), NEG_INF).at[0].set(0.0)

        out_w, out_gp, out_fin, out_len, out_sc = [], [], [], [], []
        for tbank in range(S):  # static bank loop (FSM states)
            # --- stay candidates: bank t's own top-k, unsatisfied
            # constraint words excluded (they transition, not stay).
            # Stage-1 top_k runs in the model's native dtype (beam.py's
            # discipline — bf16->f32 is order-preserving, so selection
            # is identical at half the vocab-scan bandwidth); scores go
            # f32 only after selection.
            m = base[:, tbank]  # (B, k, V)
            for i in range(C):
                if not tbank & (1 << i):
                    m = jnp.where(
                        eq[i][:, None, :],
                        jnp.asarray(NEG_INF, m.dtype),
                        m,
                    )
            pb_vals, pb_words = jax.lax.top_k(m, k)  # (B, k, k)
            pb_logp = (
                pb_vals.astype(jnp.float32) - lse[:, tbank][:, :, None]
            )

            fin_t = finished[:, tbank][:, :, None]  # (B, k, 1)
            sc_t = scores[:, tbank]  # (B, k)
            stay_cand = jnp.where(
                fin_t,
                sc_t[:, :, None] + frozen_rank_stay[None, None, :],
                sc_t[:, :, None] + pb_logp,
            )
            stay_words = jnp.where(fin_t, pad_id, pb_words)
            # Global parent index of stay candidate (b, j, c) = t*k + j.
            stay_parent = jnp.broadcast_to(
                (tbank * k + jnp.arange(k, dtype=jnp.int32))[
                    None, :, None
                ],
                (B, k, k),
            )

            cand = [stay_cand.reshape(B, k * k)]
            cand_w = [stay_words.reshape(B, k * k)]
            cand_p = [stay_parent.reshape(B, k * k)]

            # --- arrival candidates: for each satisfied bit i, bank
            # t\{i}'s hypotheses extended by exactly word w_i.
            for i in range(C):
                if not tbank & (1 << i):
                    continue
                sbank = tbank & ~(1 << i)
                wi = cids[:, i]  # (B,)
                arr_logit = jnp.take_along_axis(
                    logits_r[:, sbank],
                    jnp.broadcast_to(wi[:, None, None], (B, k, 1)),
                    axis=-1,
                )[..., 0].astype(jnp.float32)  # (B, k)
                arr_logp = arr_logit - lse[:, sbank]
                arr_sc = jnp.where(
                    finished[:, sbank],  # frozen sources cannot emit
                    jnp.float32(NEG_INF),
                    scores[:, sbank] + arr_logp,
                )
                cand.append(arr_sc)
                cand_w.append(jnp.broadcast_to(wi[:, None], (B, k)))
                cand_p.append(
                    jnp.broadcast_to(
                        (sbank * k + jnp.arange(k, dtype=jnp.int32))[
                            None, :
                        ],
                        (B, k),
                    )
                )

            cand = jnp.concatenate(cand, axis=1)  # (B, k*k + |t|*k)
            cand_w = jnp.concatenate(cand_w, axis=1)
            cand_p = jnp.concatenate(cand_p, axis=1)

            top_sc, idx2 = jax.lax.top_k(cand, k)  # ties: lowest index
            take2 = lambda a: jnp.take_along_axis(a, idx2, axis=1)
            word = take2(cand_w).astype(jnp.int32)
            gparent = take2(cand_p).astype(jnp.int32)

            pf = jnp.take_along_axis(
                finished.reshape(B, S * k), gparent, axis=1
            )
            ln = jnp.take_along_axis(
                lengths.reshape(B, S * k), gparent, axis=1
            )
            emit = ~pf
            word = jnp.where(pf, pad_id, word)
            ln = ln + emit.astype(jnp.int32)
            fin_next = pf | (word == end_id)

            out_w.append(word)
            out_gp.append(gparent)
            out_fin.append(fin_next)
            out_len.append(ln)
            out_sc.append(top_sc)

        word_all = jnp.stack(out_w, axis=1)  # (B, S, k)
        gparent_all = jnp.stack(out_gp, axis=1)
        words_acc = jax.lax.dynamic_update_slice(
            words_acc, word_all[None], (t, 0, 0, 0)
        )
        parents_acc = jax.lax.dynamic_update_slice(
            parents_acc, gparent_all[None], (t, 0, 0, 0)
        )
        state = _gather_beams(
            new_state, gparent_all.reshape(B, S * k), B, S * k, shared
        )
        return (
            t + 1,
            words_acc,
            parents_acc,
            state,
            word_all.reshape(B * S * k),
            jnp.stack(out_fin, axis=1),
            jnp.stack(out_len, axis=1),
            jnp.stack(out_sc, axis=1),
        )

    carry = (
        jnp.array(0, jnp.int32),
        words0,
        parents0,
        state,
        jnp.repeat(
            jnp.broadcast_to(jnp.asarray(start_id, jnp.int32), (B,)),
            S * k,
        ),
        jnp.zeros((B, S, k), bool),
        jnp.zeros((B, S, k), jnp.int32),
        scores0,
    )
    final = jax.lax.while_loop(cond, body, carry)
    _, words_acc, parents_acc, _, _, finished, lengths, scores = final

    # Backpointer reconstruction over the GLOBAL hypothesis axis.
    def back(ptr, wp):
        w_t, p_t = wp  # (B, S*k) each
        tok = jnp.take_along_axis(w_t, ptr, axis=1)
        ptr = jnp.take_along_axis(p_t, ptr, axis=1)
        return ptr, tok

    init_ptr = jnp.broadcast_to(
        jnp.arange(S * k, dtype=jnp.int32)[None, :], (B, S * k)
    )
    _, toks_rev = jax.lax.scan(
        back,
        init_ptr,
        (
            words_acc.reshape(max_len, B, S * k)[::-1],
            parents_acc.reshape(max_len, B, S * k)[::-1],
        ),
    )
    tokens = jnp.moveaxis(toks_rev[::-1], 0, -1).reshape(B, S, k, max_len)

    # Final ranking, TWO-STAGE (see module docstring): (1) the maximum
    # satisfaction count among reachable slots, (2) argmax normalized
    # score restricted to slots at that count — a fused float key would
    # quantize away score gaps. Dead slots rank NEG_INF absolutely.
    norm = normalized_scores(
        scores,
        lengths,
        length_normalize=length_normalize,
        alpha=alpha,
        length_penalty=length_penalty,
    )
    popcount = jnp.asarray(
        [bin(s).count("1") for s in range(S)], jnp.int32
    )
    reach = ~unreachable(scores)  # (B, S, k)
    pc = jnp.broadcast_to(popcount[None, :, None], (B, S, k))
    best_pop = jnp.max(
        jnp.where(reach, pc, -1).reshape(B, S * k), axis=1
    )  # (B,) — the seed bank is always reachable, so best_pop >= 0
    rank = jnp.where(
        reach & (pc == best_pop[:, None, None]),
        norm,
        jnp.float32(NEG_INF),
    )
    flat = rank.reshape(B, S * k)
    best = jnp.argmax(flat, axis=1)  # (B,)
    best_bank = (best // k).astype(jnp.int32)

    satisfied = (
        (best_bank[:, None] >> jnp.arange(C, dtype=jnp.int32)[None, :])
        & 1
    ).astype(bool)

    pick = lambda arr: jnp.take_along_axis(
        arr.reshape((B, S * k) + arr.shape[3:]),
        best.reshape((B, 1) + (1,) * (arr.ndim - 3)),
        axis=1,
    ).squeeze(1)
    return ConstrainedBeamResult(
        tokens=pick(tokens),
        lengths=pick(lengths),
        scores=pick(scores),
        satisfied=satisfied,
        num_satisfied=jnp.sum(satisfied.astype(jnp.int32), axis=-1),
        beam_tokens=tokens,
        beam_lengths=lengths,
        beam_scores=scores,
    )
