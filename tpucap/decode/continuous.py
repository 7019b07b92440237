"""Continuous batching: slot-recycling greedy decode over a fixed pool.

The batch engines (greedy.py / beam.py) run a whole batch to completion —
the right shape for offline throughput, but an online server pays
head-of-line blocking: a finished caption's slot idles (frozen, still
stepped) until the batch's slowest member ends. With trained models
averaging ~12 tokens against a 34-token cap, that's ~2-3x wasted slot
time under mixed lengths.

This engine keeps ONE persistent device state of ``slots`` decode lanes
and exposes three jit'd programs over it, all fixed-shape:

- ``admit``: scatter freshly-initialized decoder state into free slots
  (admission counts padded to a power-of-two ladder; padding rows carry
  an out-of-range slot index, which XLA's scatter drops — no masking
  needed);
- ``tick``: ONE greedy step for all slots — inactive lanes compute too
  (shapes are static; a lane of wasted FLOPs is the price of no
  recompile) but their state/token writes are masked out;
- ``collect``: gather finished lanes' token rows for the host.

Numerics per lane are IDENTICAL to greedy_decode (same pad-masked
argmax, same full-softmax normalizer for scores — tests pin token
equality), so a continuous server and the offline path caption
identically. The vLLM-style scheduling idea, re-done for a recurrent
decoder where "KV state" is just (h, c, image branch) — O(1) per lane,
making slot scatter/gather trivial pytree index updates.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


def _mask_tree(mask, new, old):
    """where(mask, new, old) broadcast over each leaf's trailing dims."""

    def sel(n, o):
        m = mask.reshape(mask.shape + (1,) * (n.ndim - 1))
        return jnp.where(m, n, o)

    return jax.tree_util.tree_map(sel, new, old)


def _bucket_ladder(n: int) -> list:
    """Power-of-two admission ladder 1, 2, ..., n (n always included)."""
    out, b = [], 1
    while b < n:
        out.append(b)
        b *= 2
    out.append(n)
    return out


class AdmissionMixin:
    """Host-side admission helpers shared by the greedy and beam
    continuous engines (one definition of the bucket ladder and the
    out-of-range-pad contract — serve.py's _retire relies on it)."""

    def admit_bucket(self, n: int) -> int:
        return next(b for b in self._admit_buckets if b >= n)

    def pad_ids(self, slot_ids: list) -> np.ndarray:
        """Slot indices padded to the bucket ladder — THE one definition
        of the out-of-range-pad contract: pad rows carry index ==
        ``slots``, which every scatter drops and every gather clamps to
        host-discarded garbage. Shared by admission (features and
        images mode) and retirement (serve.py)."""
        b = self.admit_bucket(len(slot_ids))
        idx = np.full((b,), self.slots, np.int32)
        idx[: len(slot_ids)] = slot_ids
        return idx

    def pad_admission(self, slot_ids: list, feats: list):
        """(ids, features) padded to the bucket ladder; pad rows carry
        slot index == slots (dropped by the scatters)."""
        idx = self.pad_ids(slot_ids)
        out = np.zeros(idx.shape + self.feature_shape, np.float32)
        for i, f in enumerate(feats):
            out[i] = f
        return jnp.asarray(idx), jnp.asarray(out, self.feature_dtype)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class SlotState:
    dec: Any  # decoder state pytree, leaves (S, ...)
    last: Any  # (S,) int32 last emitted / start token
    lengths: Any  # (S,) int32 tokens emitted so far
    scores: Any  # (S,) f32 sum log-prob
    tokens: Any  # (S, max_len) int32
    active: Any  # (S,) bool — live request, still decoding
    finished: Any  # (S,) bool — done, awaiting collection


class ContinuousDecodeEngine(AdmissionMixin):
    """Device half of a continuous-batching greedy server.

    Host contract: the caller owns free-slot bookkeeping (this class is
    purely functional over SlotState) and drives
    ``admit -> tick* -> flags -> collect`` from ONE thread.
    """

    def __init__(
        self,
        decoder,
        params,
        *,
        slots: int,
        start_id: int,
        end_id: int,
        max_len: int,
        pad_id: int = 0,
        min_len: int = 0,
        banned_ids: tuple = (),
        no_repeat_ngram_size: int = 0,
        feature_shape: tuple | None = None,
        feature_dtype=jnp.float32,
        matmul_precision: str = "default",
    ):
        self.decoder = decoder
        self.params = params
        self.slots = slots
        self.start_id = start_id
        self.end_id = end_id
        self.max_len = max_len
        self.pad_id = pad_id
        self.min_len = min_len
        self.banned_ids = tuple(banned_ids)
        self.no_repeat_ngram_size = no_repeat_ngram_size
        self.feature_shape = feature_shape or (decoder.feature_dim,)
        self.feature_dtype = feature_dtype
        # 'highest' mirrors pipeline._decode_fn's precision='f32'
        # contract (full-f32 matmul passes -> captions identical to the
        # batch engines on exact-parity configs).
        self.matmul_precision = matmul_precision
        self._admit_buckets = _bucket_ladder(slots)

    # -- state construction -------------------------------------------------

    def init_state(self) -> SlotState:
        S = self.slots
        feats = jnp.zeros((S,) + self.feature_shape, self.feature_dtype)
        dec = self.decoder.init_state(self.params, feats)
        return SlotState(
            dec=dec,
            last=jnp.full((S,), self.start_id, jnp.int32),
            lengths=jnp.zeros((S,), jnp.int32),
            scores=jnp.zeros((S,), jnp.float32),
            tokens=jnp.full((S, self.max_len), self.pad_id, jnp.int32),
            active=jnp.zeros((S,), bool),
            finished=jnp.zeros((S,), bool),
        )

    # -- jit'd programs -----------------------------------------------------

    @partial(jax.jit, static_argnums=0)
    def admit(self, state: SlotState, slot_idx, features) -> SlotState:
        """Scatter K new requests into lanes ``slot_idx``. Padded rows use
        slot_idx >= slots: scatter drops them (GatherScatterMode default),
        so admission shapes stay on the bucket ladder."""
        with jax.default_matmul_precision(self.matmul_precision):
            new_dec = self.decoder.init_state(self.params, features)
        dec = jax.tree_util.tree_map(
            lambda buf, new: buf.at[slot_idx].set(new),
            state.dec,
            new_dec,
        )
        start = jnp.full(slot_idx.shape, self.start_id, jnp.int32)
        zeros_i = jnp.zeros(slot_idx.shape, jnp.int32)
        return SlotState(
            dec=dec,
            last=state.last.at[slot_idx].set(start),
            lengths=state.lengths.at[slot_idx].set(zeros_i),
            scores=state.scores.at[slot_idx].set(0.0),
            tokens=state.tokens.at[slot_idx].set(self.pad_id),
            active=state.active.at[slot_idx].set(True),
            finished=state.finished.at[slot_idx].set(False),
        )

    @partial(jax.jit, static_argnums=(0, 2))
    def tick(self, state: SlotState, n: int = 1) -> SlotState:
        """Run ``n`` greedy steps for every lane (scan — one program)."""

        def one(state, _):
            with jax.default_matmul_precision(self.matmul_precision):
                logits, new_dec = self.decoder.step(
                    self.params, state.dec, state.last
                )
            logits = logits.astype(jnp.float32)
            masked = logits.at[:, self.pad_id].set(-jnp.inf)
            if self.banned_ids:
                from tpucap.decode.beam import apply_banned

                masked = apply_banned(masked, self.banned_ids)
            if self.no_repeat_ngram_size:
                # No-repeat-ngram (greedy.py semantics, per lane: a
                # lane's emitted length IS its step index): repeated-
                # ngram completions leave the argmax; lse stays the
                # full-softmax normalizer. Lane recycling is safe —
                # admit() clears the token buffer, so no stale history
                # can leak into a new occupant's mask.
                from tpucap.decode.ngram import apply_ngram_ban

                masked = apply_ngram_ban(
                    masked,
                    state.tokens,
                    state.lengths,
                    self.no_repeat_ngram_size,
                )
            if self.min_len:
                # Length floor (greedy.py min_len semantics, per lane:
                # a lane's step index IS its emitted length): endseq is
                # excluded from the argmax while lengths < min_len; lse
                # stays the full-softmax normalizer.
                floor = masked.at[:, self.end_id].set(-jnp.inf)
                masked = jnp.where(
                    (state.lengths < self.min_len)[:, None], floor, masked
                )
            lse = jax.scipy.special.logsumexp(logits, axis=-1)
            nxt = jnp.argmax(masked, axis=-1).astype(jnp.int32)
            tok_logp = (
                jnp.take_along_axis(logits, nxt[:, None], axis=-1)[:, 0]
                - lse
            )
            act = state.active
            dec = _mask_tree(act, new_dec, state.dec)
            S = self.slots
            write = jnp.where(act, nxt, self.pad_id)
            pos = jnp.minimum(state.lengths, self.max_len - 1)
            tokens = state.tokens.at[jnp.arange(S), pos].set(
                jnp.where(
                    act, write, state.tokens[jnp.arange(S), pos]
                )
            )
            lengths = state.lengths + act.astype(jnp.int32)
            scores = state.scores + jnp.where(act, tok_logp, 0.0)
            done_now = act & (
                (nxt == self.end_id) | (lengths >= self.max_len)
            )
            return (
                SlotState(
                    dec=dec,
                    last=jnp.where(act, nxt, state.last),
                    lengths=lengths,
                    scores=scores,
                    tokens=tokens,
                    active=act & ~done_now,
                    finished=state.finished | done_now,
                ),
                None,
            )

        state, _ = jax.lax.scan(one, state, None, length=n)
        return state

    @partial(jax.jit, static_argnums=0)
    def flags(self, state: SlotState):
        """Small host fetch: (finished, active, lengths)."""
        return state.finished, state.active, state.lengths

    @partial(jax.jit, static_argnums=0)
    def progress(self, state: SlotState):
        """Streaming fetch: every lane's (tokens, lengths) so far.

        (slots, max_len) int32 + (slots,) int32 — a few KB for a
        64-lane pool, fetched once per sync group only while a
        streaming request is live (ContinuousCaptionServer
        ``submit_stream``). Rows beyond ``lengths`` are pad_id."""
        return state.tokens, state.lengths

    @partial(jax.jit, static_argnums=0)
    def collect(self, state: SlotState, slot_idx):
        """Gather (tokens, lengths, scores) rows for finished lanes and
        clear their finished bit. Padded rows (slot_idx >= slots) gather
        lane clamp-garbage the host discards."""
        rows = (
            state.tokens[slot_idx],
            state.lengths[slot_idx],
            state.scores[slot_idx],
        )
        cleared = dataclasses.replace(
            state,
            finished=state.finished.at[slot_idx].set(False),
        )
        return rows, cleared

