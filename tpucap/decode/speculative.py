"""Speculative greedy decoding: a draft model proposes, the target verifies.

Beyond the reference surface (its decode loops are SURVEY.md §3.3/§3.4 host
loops): this is the modern serving accelerator for autoregressive decode —
a cheap draft model proposes ``gamma`` tokens sequentially, then the target
model scores all of them (plus its own bonus position) in ONE chunked
forward (``TransformerDecoder.step_chunk``), and the longest draft prefix
that matches the target's own argmax stream is accepted. Greedy acceptance
makes the output TOKEN-IDENTICAL to ``greedy_decode`` on the target by
construction: every emitted token is the target's argmax given the emitted
prefix (accepted draft tokens are accepted precisely because they equal it;
the first mismatch is replaced by the target's argmax).

TPU-first design:

- ONE jitted ``lax.while_loop``; every shape is static (gamma, batch,
  max_len). No host round-trips inside decode.
- The draft proposal is a ``gamma+1``-step ``lax.scan`` that STACKS the
  per-step draft states. After acceptance, the draft state is rewound by a
  per-row gather from that stack — which works for ANY decoder family as
  the draft (an LSTM's (h, c) after consuming rejected tokens cannot be
  "healed" the way a KV cache can; the gather sidesteps rollback entirely).
  Cost: gamma+1 stacked copies of the draft state — drafts are small by
  definition.
- The target's KV cache is NEVER rolled back. Rejected chunk entries are
  invisible (visibility is key-position <= own pos, and pos is rewound to
  the accepted length) and are overwritten by the next chunk's gamma+1
  writes before they could become visible. The self-healing invariant:
  a round leaves at most gamma stale positions (the rejected suffix), and
  the next round writes gamma+1 consecutive positions starting exactly at
  the first stale slot — chunk size > max stale run, by construction.
- Per-row raggedness (each image accepts a different number of tokens per
  round) rides the transformer state's existing per-lane ``pos`` machinery
  — the same contract the continuous-batching engines rely on.

Acceptance-rate economics (measured in bench.py --mode speculative): a
round costs 1 chunked target forward + gamma+1 small draft steps and emits
accepted+1 tokens, so the win over plain greedy is ~(mean accepted + 1)x
fewer sequential target steps, minus the draft overhead. With a weak draft
(acceptance ~0) it degrades to plain greedy plus draft overhead — the
engine stays exact either way.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp

from tpucap.decode.greedy import DecodeResult, _batch_size


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class SpecStats:
    """Aggregate speculative-decode counters (scalars, int32/int64-safe).

    rounds: while-loop iterations executed;
    drafted: draft tokens proposed to live rows (live_rows * gamma summed
    over rounds); accepted: drafted tokens the target agreed with;
    emitted: total tokens emitted (accepted + one correction/bonus per
    live row-round). acceptance rate = accepted / drafted."""

    rounds: Any
    drafted: Any
    accepted: Any
    emitted: Any


def _where_rows(mask, new, old):
    """Per-row select over a state pytree: mask (B,) broadcast to each
    leaf's rank (all decode-state leaves are batch-leading)."""

    def sel(n, o):
        m = mask.reshape(mask.shape + (1,) * (n.ndim - 1))
        return jnp.where(m, n, o)

    return jax.tree_util.tree_map(sel, new, old)


def _gather_rows(stacked, idx):
    """Per-row gather from a scan-stacked pytree: each leaf (S, B, ...) ->
    (B, ...) taking stack index idx[b] for row b. dtype-generic
    (take_along_axis, no one-hot matmul) so int/bool state leaves work."""

    def take(leaf):
        moved = jnp.moveaxis(leaf, 0, 1)  # (B, S, ...)
        ix = idx.reshape((idx.shape[0], 1) + (1,) * (moved.ndim - 2))
        ix = jnp.broadcast_to(ix, (idx.shape[0], 1) + moved.shape[2:])
        return jnp.take_along_axis(moved, ix, axis=1)[:, 0]

    return jax.tree_util.tree_map(take, stacked)


def speculative_greedy_decode(
    verify_fn: Callable,
    target_params,
    target_state,
    draft_step_fn: Callable,
    draft_params,
    draft_state,
    *,
    start_id: int,
    end_id: int,
    max_len: int,
    pad_id: int = 0,
    min_len: int = 0,
    gamma: int = 4,
) -> tuple[DecodeResult, SpecStats]:
    """Speculative-decode a batch; token-identical to
    ``greedy_decode(target_step_fn, ...)``.

    ``verify_fn(params, state, tokens (B, C)) -> (logits (B, C, V), state)``
    is the target's chunked incremental forward
    (``TransformerDecoder.step_chunk``); the target state must carry a
    per-row ``"pos"`` leaf (the engine rewinds it to the accepted length —
    the KV self-healing contract in the module docstring). The caller is
    responsible for cache capacity: ``max_len + gamma <= max_positions``.

    ``draft_step_fn(params, state, token) -> (logits, state)`` is any
    decoder family's incremental step (the draft state is rewound by
    stack-gather, so no cache semantics are assumed of it).

    Scores are the target's full-softmax log-probs of the emitted tokens —
    the same convention as greedy/beam (pad mass included in the
    normalizer, pad masked from argmax only), so results are comparable
    across engines. min_len excludes endseq from BOTH models' argmax while
    a row has emitted fewer than min_len tokens (exactly greedy's floor).
    """
    if gamma < 1:
        raise ValueError(f"gamma must be >= 1, got {gamma}")
    if "pos" not in target_state:
        raise ValueError(
            "speculative decode needs a target state with per-row 'pos' "
            "(a KV-cache decoder family, e.g. TransformerDecoder)"
        )
    B = _batch_size(target_state)
    G, C = gamma, gamma + 1
    offs = jnp.arange(C)
    tokens0 = jnp.full((B, max_len), pad_id, jnp.int32)

    def mask_logits(lf, emitted_at_slot):
        """f32 logits (..., V): pad excluded from argmax always; endseq
        excluded while that slot's emitted-count is below min_len."""
        masked = lf.at[..., pad_id].set(-jnp.inf)
        if min_len:
            V = lf.shape[-1]
            end_col = jnp.arange(V) == end_id
            floor = emitted_at_slot < min_len
            masked = jnp.where(
                floor[..., None] & end_col, -jnp.inf, masked
            )
        return masked

    def cond(carry):
        r = carry[0]
        done = carry[4]
        return jnp.logical_and(r < max_len, ~jnp.all(done))

    def body(carry):
        (
            r,
            tokens,
            lengths,
            scores,
            done,
            last,
            t_state,
            d_state,
            stats,
        ) = carry

        # -- draft proposes G tokens (plus one throwaway step so the
        # stacked states cover the all-accepted case: states[j] is the
        # draft state after consuming inputs i_0..i_j).
        def sc(dcarry, j):
            st, tok = dcarry
            with jax.named_scope("spec_draft_step"):
                logits, st2 = draft_step_fn(draft_params, st, tok)
            lf = logits.astype(jnp.float32)
            nxt = jnp.argmax(
                mask_logits(lf, lengths + j), axis=-1
            ).astype(jnp.int32)
            return (st2, nxt), (nxt, st2)

        (_, _), (props, d_stack) = jax.lax.scan(
            sc, (d_state, last), jnp.arange(C)
        )
        d = jnp.moveaxis(props[:G], 0, 1)  # (B, G): d_1..d_G

        # -- target verifies the whole chunk in one forward.
        chunk = jnp.concatenate([last[:, None], d], axis=1)  # (B, C)
        with jax.named_scope("spec_verify_chunk"):
            t_logits, t_state2 = verify_fn(target_params, t_state, chunk)
        lf = t_logits.astype(jnp.float32)
        slot_emitted = lengths[:, None] + offs[None, :]  # (B, C)
        o = jnp.argmax(mask_logits(lf, slot_emitted), axis=-1).astype(
            jnp.int32
        )  # (B, C): target argmax after consuming chunk[:, : j+1]
        lse = jax.scipy.special.logsumexp(lf, axis=-1)  # (B, C)

        # -- longest matching prefix: accept d_{j+1} while it equals o_j.
        match = (d == o[:, :G]).astype(jnp.int32)
        acc = jnp.cumprod(match, axis=1).sum(axis=1)  # (B,) in 0..G

        # Emitted stream this round: accepted drafts then the target's
        # correction (or bonus) token at slot ``acc``.
        d_next = jnp.concatenate(
            [d, jnp.zeros((B, 1), jnp.int32)], axis=1
        )  # slot G dummy, never selected (offs < acc fails at G)
        v = jnp.where(offs[None, :] < acc[:, None], d_next, o)  # (B, C)
        logp = (
            jnp.take_along_axis(lf, v[..., None], axis=-1)[..., 0] - lse
        )

        # -- truncate at the first emitted endseq and at the length budget.
        valid = offs[None, :] <= acc[:, None]
        end_hit = (v == end_id) & valid
        has_end = end_hit.any(axis=1)
        first_end = jnp.argmax(end_hit, axis=1)
        emit_base = jnp.where(has_end, first_end + 1, acc + 1)
        emit_n = jnp.minimum(emit_base, max_len - lengths)
        emit_n = jnp.where(done, 0, emit_n)
        write = offs[None, :] < emit_n[:, None]  # (B, C)

        # -- scatter-free token write (disjoint one-hot placement).
        cols = jnp.arange(max_len)
        slot_pos = lengths[:, None] + offs[None, :]  # (B, C)
        onehot = (cols[None, None, :] == slot_pos[:, :, None]) & write[
            :, :, None
        ]  # (B, C, L)
        placed = (onehot * v[:, :, None]).sum(axis=1)  # (B, L)
        tokens = jnp.where(onehot.any(axis=1), placed, tokens)

        scores = scores + jnp.where(write, logp, 0.0).sum(axis=1)
        lengths2 = lengths + emit_n
        ended = (end_hit & write).any(axis=1)
        done2 = done | ended | (lengths2 >= max_len)

        # -- next round's input token and rewound states.
        v_at_acc = jnp.take_along_axis(v, acc[:, None], axis=1)[:, 0]
        last2 = jnp.where(done, last, v_at_acc)
        # Target: keep the chunk-updated caches (self-healing — see module
        # docstring), rewind pos to the consumed length a+1; freeze done
        # rows so their write window stays within capacity forever.
        new_pos = jnp.where(done, t_state["pos"], t_state["pos"] + acc + 1)
        t_state2 = dict(t_state2, pos=new_pos)
        # Draft: per-row gather of the state after the accepted prefix
        # (stack index acc = state after inputs i_0..i_acc); freeze done
        # rows entirely (family-generic — no 'pos' assumed).
        d_state2 = _where_rows(done, d_state, _gather_rows(d_stack, acc))

        live = (~done).astype(jnp.int32)
        stats2 = SpecStats(
            rounds=stats.rounds + 1,
            drafted=stats.drafted + live.sum() * G,
            accepted=stats.accepted + (acc * live).sum(),
            emitted=stats.emitted + emit_n.sum(),
        )
        return (
            r + 1,
            tokens,
            lengths2,
            scores,
            done2,
            last2,
            t_state2,
            d_state2,
            stats2,
        )

    zero = jnp.array(0, jnp.int32)
    carry = (
        zero,
        tokens0,
        jnp.zeros((B,), jnp.int32),
        jnp.zeros((B,), jnp.float32),
        jnp.zeros((B,), bool),
        jnp.full((B,), start_id, jnp.int32),
        target_state,
        draft_state,
        SpecStats(rounds=zero, drafted=zero, accepted=zero, emitted=zero),
    )
    out = jax.lax.while_loop(cond, body, carry)
    _, tokens, lengths, scores, _, _, _, _, stats = out
    return (
        DecodeResult(tokens=tokens, lengths=lengths, scores=scores),
        stats,
    )
