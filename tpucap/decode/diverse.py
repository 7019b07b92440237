"""Diverse beam search (Vijayakumar et al., AAAI 2018) — grouped beams
with a Hamming diversity penalty.

Standard beam search's k hypotheses usually differ in one or two words;
for captioning-style reranking / human-choice UIs the genre's answer is
DBS: split the beam budget into G groups of k' beams. At every step the
groups select IN ORDER, and group g's candidate scores are penalized by
``diversity * n(v)`` where ``n(v)`` counts how many times token ``v``
was already emitted at this step by groups 0..g-1 — so later groups are
pushed off the earlier groups' token choices while each group runs
exact beam bookkeeping internally (HF `diversity_penalty` convention:
all groups advance every step; no stagger).

TPU-first shape: ONE fused model step scores all B*G*k' hypotheses
(the groups ride the same matmul batch — diversity costs no extra
forward passes), and the group-ordered selection is a static Python
loop of G small (B, k'*k') top-k stages inside the jitted body. The
whole search stays a single lax.while_loop program, reusing beam.py's
frozen-slot semantics, backpointer accumulators, tie order, min_len
masking and beam_shared_keys handling.

One deliberate divergence from the HF implementation: the penalty
shapes SELECTION only. HF folds ``-diversity*n`` into the accumulated
beam scores, so reported scores mix log-probs with penalty bookkeeping;
here a parallel "selection score" carries the accumulated penalties
(the published algorithm's augmented objective) while the reported /
ranking scores stay TRUE log-prob sums under the full softmax — the
framework-wide convention (greedy/beam/teacher-forced scores are
mutually comparable). With diversity=0 or num_groups=1, DBS is
token-exact standard beam search of width k' per group
(tests/test_diverse.py pins this against beam_decode).
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


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class DiverseBeamResult:
    """tokens: (B, G, max_len) each group's best beam; lengths/scores:
    (B, G) (scores = raw TRUE log-prob sums); beam_*: all beams,
    (B, G, k', ...)."""

    tokens: Any
    lengths: Any
    scores: Any
    beam_tokens: Any
    beam_lengths: Any
    beam_scores: Any


def diverse_beam_decode(
    step_fn: Callable,
    params,
    state,
    *,
    start_id: int,
    end_id: int,
    max_len: int,
    num_groups: int,
    group_width: int,
    diversity: float = 0.5,
    pad_id: int = 0,
    min_len: int = 0,
    banned_ids: tuple = (),
    no_repeat_ngram_size: int = 0,
    length_normalize: bool = True,
    alpha: float = 1.0,
    length_penalty: str = "simple",
    decoder=None,
) -> DiverseBeamResult:
    """Diverse beam search over ``num_groups`` groups of ``group_width``
    beams. ``step_fn(params, state, token) -> (logits, state)`` exactly
    as for beam_decode; state rows are laid out image-major, then
    group, then beam. ``diversity`` is the Hamming penalty strength
    (lambda); 0 reduces every group to an independent standard beam.

    ``no_repeat_ngram_size`` > 0 excludes per-hypothesis repeated-ngram
    completions (decode/ngram.py; beam_decode semantics — selection-only,
    opt-in (B, G, kg, max_len) history carry)."""
    if num_groups < 1 or group_width < 1:
        raise ValueError(
            f"need num_groups >= 1 and group_width >= 1, got "
            f"{num_groups}x{group_width}"
        )
    G, kg = num_groups, group_width
    K = G * kg
    B = jax.tree_util.tree_leaves(state)[0].shape[0]
    shared = _shared_keys(decoder, state)
    state = _tile_state(state, K, shared)
    lam = float(diversity)

    words0 = jnp.full((max_len, B, G, kg), pad_id, jnp.int32)
    parents0 = jnp.broadcast_to(
        jnp.arange(kg, dtype=jnp.int32)[None, None, None, :],
        (max_len, B, G, kg),
    )
    row0 = jnp.concatenate(
        [jnp.zeros((1,)), jnp.full((kg - 1,), NEG_INF)]
    ).astype(jnp.float32)
    scores0 = jnp.broadcast_to(row0[None, None, :], (B, G, kg))

    def cond(carry):
        t = carry[0]
        finished = carry[5]
        return jnp.logical_and(t < max_len, ~jnp.all(finished))

    ngram = no_repeat_ngram_size

    def body(carry):
        (t, words_acc, parents_acc, state, last, finished, lengths,
         sel_scores, true_scores) = carry[:9]
        with jax.named_scope("dbs_model_step"):
            logits, new_state = step_fn(params, state, last)  # (B*K, V)
        V = logits.shape[-1]
        lse = jax.scipy.special.logsumexp(
            logits.astype(jnp.float32), axis=-1
        ).reshape(B, G, kg)
        masked = logits.at[:, pad_id].set(jnp.asarray(NEG_INF, logits.dtype))
        masked = apply_banned(masked, banned_ids)
        if ngram:
            # No-repeat-ngram: per-hypothesis ban from the carried
            # history, BEFORE the per-group top-k (selection-exact);
            # lse stays the full-softmax normalizer. Row layout of the
            # (B, G, kg, L) carry flattens to the engine's image-major
            # (B*K, V) logits rows.
            from tpucap.decode.ngram import apply_ngram_ban

            seqs = carry[9]
            masked = apply_ngram_ban(
                masked, seqs.reshape(B * K, -1), t, ngram
            )
        if min_len:
            blocked = masked.at[:, end_id].set(
                jnp.asarray(NEG_INF, masked.dtype)
            )
            masked = jnp.where(t < min_len, blocked, masked)
        masked = masked.reshape(B, G, kg, V)

        frozen_rank = jnp.full((kg,), NEG_INF).at[0].set(0.0)
        # Per-step cross-group token counts — THE diversity state. f32
        # counts so the penalty arithmetic stays one fused multiply-add.
        n = jnp.zeros((B, V), jnp.float32)
        out_w, out_p, out_fin, out_len, out_sel, out_true = (
            [], [], [], [], [], [])
        for g in range(G):  # static group order (the algorithm's core)
            m_g = masked[:, g].astype(jnp.float32)  # (B, kg, V)
            pen_logits = m_g - lam * n[:, None, :]
            pb_vals, pb_words = jax.lax.top_k(pen_logits, kg)  # (B,kg,kg)
            pen_logp = pb_vals - lse[:, g][:, :, None]
            # Reported scores stay true log-probs: add the penalty of
            # the selected tokens back.
            n_sel = jnp.take_along_axis(
                jnp.broadcast_to(n[:, None, :], (B, kg, V)),
                pb_words,
                axis=-1,
            )
            true_logp = pen_logp + lam * n_sel

            fin_g = finished[:, g][:, :, None]  # (B, kg, 1)
            sel_g = sel_scores[:, g]
            true_g = true_scores[:, g]
            cand_sel = jnp.where(
                fin_g,
                sel_g[:, :, None] + frozen_rank[None, None, :],
                sel_g[:, :, None] + pen_logp,
            )
            cand_true = jnp.where(
                fin_g,
                true_g[:, :, None] + frozen_rank[None, None, :],
                true_g[:, :, None] + true_logp,
            )
            cand_words = jnp.where(fin_g, pad_id, pb_words)

            top_sel, idx2 = jax.lax.top_k(cand_sel.reshape(B, kg * kg), kg)
            parent = idx2 // kg
            take2 = lambda a: jnp.take_along_axis(
                a.reshape(B, kg * kg), idx2, axis=1
            )
            word = take2(cand_words).astype(jnp.int32)
            new_true = take2(cand_true)

            take = lambda a: jnp.take_along_axis(a, parent, axis=1)
            parent_finished = take(finished[:, g])
            len_g = take(lengths[:, g])
            emit = ~parent_finished
            word = jnp.where(parent_finished, pad_id, word)
            len_g = len_g + emit.astype(jnp.int32)
            fin_next = parent_finished | (word == end_id)

            # Count this group's live emissions for the later groups
            # (end_id counts — it is a real selection; pad never does,
            # live expansions exclude it and frozen slots don't emit).
            n = n + jnp.sum(
                jax.nn.one_hot(word, V, dtype=jnp.float32)
                * emit[:, :, None],
                axis=1,
            )

            out_w.append(word)
            out_p.append(parent.astype(jnp.int32))
            out_fin.append(fin_next)
            out_len.append(len_g)
            out_sel.append(top_sel)
            out_true.append(new_true)

        word_all = jnp.stack(out_w, axis=1)  # (B, G, kg)
        parent_all = jnp.stack(out_p, axis=1)
        words_acc = jax.lax.dynamic_update_slice(
            words_acc, word_all[None], (t, 0, 0, 0)
        )
        parents_acc = jax.lax.dynamic_update_slice(
            parents_acc, parent_all[None], (t, 0, 0, 0)
        )
        state = _gather_beams(
            new_state, parent_all.reshape(B * G, kg), B * G, kg, shared
        )
        out = (
            t + 1,
            words_acc,
            parents_acc,
            state,
            word_all.reshape(B * K),
            jnp.stack(out_fin, axis=1),
            jnp.stack(out_len, axis=1),
            jnp.stack(out_sel, axis=1),
            jnp.stack(out_true, axis=1),
        )
        if ngram:
            # Per-hypothesis history: reindex within each group by this
            # step's parents, append the emitted words (pad for frozen
            # slots — they never expand again).
            seqs = jnp.take_along_axis(seqs, parent_all[..., None], axis=2)
            seqs = jax.lax.dynamic_update_slice(
                seqs, word_all[..., None], (0, 0, 0, t)
            )
            out = out + (seqs,)
        return out

    carry = (
        jnp.array(0, jnp.int32),
        words0,
        parents0,
        state,
        jnp.full((B * K,), start_id, jnp.int32),
        jnp.zeros((B, G, kg), bool),
        jnp.zeros((B, G, kg), jnp.int32),
        scores0,
        scores0,
    )
    if ngram:
        carry = carry + (jnp.full((B, G, kg, max_len), pad_id, jnp.int32),)
    final = jax.lax.while_loop(cond, body, carry)
    (_, words_acc, parents_acc, _, _, finished, lengths,
     _, true_scores) = final[:9]

    # Backpointer reconstruction, groups flattened into the batch
    # (parents index within their group).
    def back(ptr, wp):
        w_t, p_t = wp  # (B*G, kg)
        tok = jnp.take_along_axis(w_t, ptr, axis=1)
        ptr = jnp.take_along_axis(p_t, ptr, axis=1)
        return ptr, tok

    init_ptr = jnp.broadcast_to(
        jnp.arange(kg, dtype=jnp.int32)[None, :], (B * G, kg)
    )
    _, toks_rev = jax.lax.scan(
        back,
        init_ptr,
        (
            words_acc.reshape(max_len, B * G, kg)[::-1],
            parents_acc.reshape(max_len, B * G, kg)[::-1],
        ),
    )
    tokens = jnp.moveaxis(toks_rev[::-1], 0, -1).reshape(
        B, G, kg, max_len
    )

    norm = normalized_scores(
        true_scores,
        lengths,
        length_normalize=length_normalize,
        alpha=alpha,
        length_penalty=length_penalty,
    )
    best = jnp.argmax(norm, axis=-1)  # (B, G); ties -> lowest slot

    pick = lambda arr: jnp.take_along_axis(
        arr, best.reshape((B, G) + (1,) * (arr.ndim - 2)), axis=2
    ).squeeze(2)
    return DiverseBeamResult(
        tokens=pick(tokens),
        lengths=pick(lengths),
        scores=pick(true_scores),
        beam_tokens=tokens,
        beam_lengths=lengths,
        beam_scores=true_scores,
    )
