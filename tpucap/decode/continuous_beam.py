"""Continuous batching for BEAM search: group-recycling over k-lane pools.

Extends the greedy slot-recycling engine (continuous.py) to beam decode:
each request occupies a GROUP of ``beam_width`` lanes that run the exact
``beam_decode`` bookkeeping (frozen slots, lazy log-softmax, two-stage
top-k with the same exact/approx stage-1 choice, backpointers —
decode/beam.py), and a group retires the moment every one of its beams
is finished, freeing its lanes for the next queued request. The per-step
math is transcribed from beam.py body-for-body so a group's result is
token/score-identical to ``beam_decode`` on the same features regardless
of WHEN it was admitted (per-group state is fully lane-local; tests pin
both properties). ``matmul_precision='highest'`` mirrors the pipeline's
precision='f32' exact-parity contract.

``decoder.beam_shared_keys`` (the attention decoder's per-image feature
grids) are honored like beam.py: those state entries are stored ONE row
per group — never tiled k-fold, never parent-gathered — so spatial-mode
beam serving keeps their HBM traffic at 1x.

Same fixed-shape host API as ContinuousDecodeEngine — admit / tick /
flags / collect over group indices, padded to a bucket ladder with
out-of-range indices the scatters drop — so ContinuousCaptionServer
drives either engine unchanged.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from tpucap.decode.beam import NEG_INF, normalized_scores
from tpucap.decode.continuous import (
    AdmissionMixin,
    _bucket_ladder,
    _mask_tree,
)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class BeamSlotState:
    dec: Any  # decoder state pytree; leaves (R*k, ...), shared keys (R, ...)
    last: Any  # (R*k,) int32
    t: Any  # (R,) int32 per-group step counter
    scores: Any  # (R, k) f32 raw log-prob sums
    beam_finished: Any  # (R, k) bool — frozen beam slots
    lengths: Any  # (R, k) int32
    words: Any  # (R, max_len, k) int32 emitted word per step
    parents: Any  # (R, max_len, k) int32 backpointers
    seqs: Any  # (R, k, max_len) per-hypothesis history (ngram dial; (R, k, 1) dummy when off)
    active: Any  # (R,) bool — live request group
    finished: Any  # (R,) bool — group done, awaiting collection


class ContinuousBeamEngine(AdmissionMixin):
    """Device half of a continuous-batching beam server. ``slots`` is the
    number of GROUPS (concurrent requests); lane count is slots*k."""

    def __init__(
        self,
        decoder,
        params,
        *,
        slots: int,
        beam_width: int,
        start_id: int,
        end_id: int,
        max_len: int,
        pad_id: int = 0,
        min_len: int = 0,
        banned_ids: tuple = (),
        no_repeat_ngram_size: int = 0,
        length_normalize: bool = True,
        alpha: float = 1.0,
        length_penalty: str = "simple",
        approx_topk: bool = False,
        feature_shape: tuple | None = None,
        feature_dtype=jnp.float32,
        matmul_precision: str = "default",
    ):
        self.decoder = decoder
        self.params = params
        self.slots = slots
        self.k = beam_width
        self.start_id = start_id
        self.end_id = end_id
        self.max_len = max_len
        self.pad_id = pad_id
        self.min_len = min_len
        self.banned_ids = tuple(banned_ids)
        self.no_repeat_ngram_size = no_repeat_ngram_size
        self.length_normalize = length_normalize
        self.alpha = alpha
        self.length_penalty = length_penalty
        self.approx_topk = approx_topk
        self.feature_shape = feature_shape or (decoder.feature_dim,)
        self.feature_dtype = feature_dtype
        self.matmul_precision = matmul_precision
        self._admit_buckets = _bucket_ladder(slots)

    def _shared(self, state_dict) -> frozenset:
        keys = getattr(self.decoder, "beam_shared_keys", frozenset())
        if isinstance(state_dict, dict):
            return frozenset(k for k in keys if k in state_dict)
        return frozenset()

    # -- state --------------------------------------------------------------

    def init_state(self) -> BeamSlotState:
        R, k, L = self.slots, self.k, self.max_len
        feats = jnp.zeros((R,) + self.feature_shape, self.feature_dtype)
        with jax.default_matmul_precision(self.matmul_precision):
            dec_r = self.decoder.init_state(self.params, feats)
        shared = self._shared(dec_r)
        # Shared (per-image) keys stay one row per GROUP; everything else
        # is tiled beam-major to (R*k, ...) like beam.py's _tile_state.
        tile = lambda x: jnp.repeat(x, k, axis=0)
        if isinstance(dec_r, dict) and shared:
            dec = {
                key: (
                    v
                    if key in shared
                    else jax.tree_util.tree_map(tile, v)
                )
                for key, v in dec_r.items()
            }
        else:
            dec = jax.tree_util.tree_map(tile, dec_r)
        parents0 = jnp.broadcast_to(
            jnp.arange(k, dtype=jnp.int32)[None, None, :], (R, L, k)
        )
        return BeamSlotState(
            dec=dec,
            last=jnp.full((R * k,), self.start_id, jnp.int32),
            t=jnp.zeros((R,), jnp.int32),
            scores=jnp.zeros((R, k), jnp.float32),
            beam_finished=jnp.zeros((R, k), bool),
            lengths=jnp.zeros((R, k), jnp.int32),
            words=jnp.full((R, L, k), self.pad_id, jnp.int32),
            parents=parents0,
            # Per-hypothesis history exists only for the ngram dial; a
            # (R, k, 1) dummy keeps the pytree static when off.
            seqs=jnp.full(
                (R, k, L if self.no_repeat_ngram_size else 1),
                self.pad_id,
                jnp.int32,
            ),
            active=jnp.zeros((R,), bool),
            finished=jnp.zeros((R,), bool),
        )

    # -- jit programs -------------------------------------------------------

    @partial(jax.jit, static_argnums=0)
    def admit(self, state: BeamSlotState, group_idx, features):
        """Scatter K new requests into groups ``group_idx`` ((K,) int32;
        pad rows carry index >= slots, dropped by the scatters).
        ``features``: (K, *feature_shape); non-shared state is tiled
        beam-major to the group's k lanes."""
        K = group_idx.shape[0]
        k = self.k
        with jax.default_matmul_precision(self.matmul_precision):
            new_r = self.decoder.init_state(self.params, features)
        shared = self._shared(new_r)
        lane_idx = (group_idx[:, None] * k + jnp.arange(k)[None, :]).reshape(
            K * k
        )
        # Out-of-range group indices produce out-of-range lane indices —
        # dropped by the scatters, like continuous.py's admit.
        lane_idx = jnp.where(
            jnp.repeat(group_idx, k) >= self.slots,
            self.slots * k,
            lane_idx,
        )
        tile = lambda x: jnp.repeat(x, k, axis=0)
        if isinstance(new_r, dict) and shared:
            dec = {
                key: (
                    jax.tree_util.tree_map(
                        lambda buf, new: buf.at[group_idx].set(new),
                        state.dec[key],
                        v,
                    )
                    if key in shared
                    else jax.tree_util.tree_map(
                        lambda buf, new: buf.at[lane_idx].set(tile(new)),
                        state.dec[key],
                        v,
                    )
                )
                for key, v in new_r.items()
            }
        else:
            dec = jax.tree_util.tree_map(
                lambda buf, new: buf.at[lane_idx].set(tile(new)),
                state.dec,
                new_r,
            )
        # Initial beam scores [0, -inf, ...] (beam.py scores0).
        scores0 = jnp.tile(
            jnp.concatenate(
                [jnp.zeros((1,)), jnp.full((k - 1,), NEG_INF)]
            )[None, :],
            (K, 1),
        ).astype(jnp.float32)
        parents0 = jnp.broadcast_to(
            jnp.arange(k, dtype=jnp.int32)[None, None, :],
            (K, self.max_len, k),
        )
        return BeamSlotState(
            dec=dec,
            last=state.last.at[lane_idx].set(self.start_id),
            t=state.t.at[group_idx].set(0),
            scores=state.scores.at[group_idx].set(scores0),
            beam_finished=state.beam_finished.at[group_idx].set(False),
            lengths=state.lengths.at[group_idx].set(0),
            words=state.words.at[group_idx].set(self.pad_id),
            parents=state.parents.at[group_idx].set(parents0),
            seqs=state.seqs.at[group_idx].set(self.pad_id),
            active=state.active.at[group_idx].set(True),
            finished=state.finished.at[group_idx].set(False),
        )

    @partial(jax.jit, static_argnums=(0, 2))
    def tick(self, state: BeamSlotState, n: int = 1) -> BeamSlotState:
        """``n`` beam steps for every group — beam.py's body, with B=R
        groups and inactive groups' state commits masked out."""
        R, k = self.slots, self.k

        def one(state, _):
            shared = self._shared(state.dec)
            with jax.named_scope("cont_beam_step"):
                with jax.default_matmul_precision(self.matmul_precision):
                    logits, new_dec = self.decoder.step(
                        self.params, state.dec, state.last
                    )  # (R*k, V)
            lse = jax.scipy.special.logsumexp(
                logits.astype(jnp.float32), axis=-1
            )
            masked = logits.at[:, self.pad_id].set(
                jnp.asarray(NEG_INF, logits.dtype)
            )
            if self.banned_ids:
                from tpucap.decode.beam import apply_banned

                masked = apply_banned(masked, self.banned_ids)
            if self.no_repeat_ngram_size:
                # No-repeat-ngram (beam.py semantics, per hypothesis):
                # repeated-ngram completions leave the candidate set
                # BEFORE stage-1 top-k (selection-exact); lse stays the
                # full-softmax normalizer. Each lane masks at its own
                # group's step counter; admit() clears the history so
                # group recycling can't leak a previous occupant's
                # n-grams.
                from tpucap.decode.ngram import apply_ngram_ban

                masked = apply_ngram_ban(
                    masked,
                    state.seqs.reshape(R * k, -1),
                    jnp.repeat(state.t, k),
                    self.no_repeat_ngram_size,
                )
            if self.min_len:
                # Length floor (beam.py min_len semantics, per GROUP:
                # a group's step counter t is its emitted length):
                # endseq leaves the candidate set while t < min_len,
                # masked BEFORE stage-1 top-k; lse stays full-softmax.
                blocked = masked.at[:, self.end_id].set(
                    jnp.asarray(NEG_INF, masked.dtype)
                )
                lane_t = jnp.repeat(state.t, k)  # (R*k,)
                masked = jnp.where(
                    (lane_t < self.min_len)[:, None], blocked, masked
                )
            if self.approx_topk:
                pb_vals, pb_words = jax.lax.approx_max_k(masked, k)
            else:
                pb_vals, pb_words = jax.lax.top_k(masked, k)  # (R*k, k)
            pb_logp = (
                pb_vals.astype(jnp.float32) - lse[:, None]
            ).reshape(R, k, k)
            pb_words = pb_words.reshape(R, k, k)

            live_cand = state.scores[:, :, None] + pb_logp
            frozen_rank = jnp.full((k,), NEG_INF).at[0].set(0.0)
            frozen_cand = state.scores[:, :, None] + frozen_rank[None, None, :]
            fin = state.beam_finished[:, :, None]
            cand = jnp.where(fin, frozen_cand, live_cand)
            cand_words = jnp.where(fin, self.pad_id, pb_words)

            merged = cand.reshape(R, k * k)
            top_scores, idx2 = jax.lax.top_k(merged, k)  # (R, k)
            parent = idx2 // k
            word = jnp.take_along_axis(
                cand_words.reshape(R, k * k), idx2, axis=1
            ).astype(jnp.int32)

            take = lambda arr: jnp.take_along_axis(arr, parent, axis=1)
            parent_finished = take(state.beam_finished)
            lengths = take(state.lengths)

            word = jnp.where(parent_finished, self.pad_id, word)
            act = state.active
            pos = jnp.minimum(state.t, self.max_len - 1)
            gidx = jnp.arange(R)
            words = state.words.at[gidx, pos].set(
                jnp.where(act[:, None], word, state.words[gidx, pos])
            )
            parents = state.parents.at[gidx, pos].set(
                jnp.where(
                    act[:, None],
                    parent.astype(jnp.int32),
                    state.parents[gidx, pos],
                )
            )
            lengths = lengths + (~parent_finished).astype(jnp.int32)
            beam_finished = parent_finished | (word == self.end_id)

            # Gather parent lanes' decoder state (beam.py _gather_beams);
            # shared per-group entries are identical across a group's
            # lanes, so gathering is the identity and the commit mask is
            # per-group. Then mask commits to active groups.
            def gather(x):
                xr = x.reshape((R, k) + x.shape[1:])
                out = jax.vmap(lambda rows, idx: rows[idx])(xr, parent)
                return out.reshape((R * k,) + x.shape[1:])

            act_lane = jnp.repeat(act, k)
            if isinstance(new_dec, dict) and shared:
                dec = {
                    key: (
                        _mask_tree(act, v, state.dec[key])
                        if key in shared
                        else _mask_tree(
                            act_lane,
                            jax.tree_util.tree_map(gather, v),
                            state.dec[key],
                        )
                    )
                    for key, v in new_dec.items()
                }
            else:
                dec = _mask_tree(
                    act_lane,
                    jax.tree_util.tree_map(gather, new_dec),
                    state.dec,
                )
            last = jnp.where(act_lane, word.reshape(R * k), state.last)

            if self.no_repeat_ngram_size:
                # Per-hypothesis history: reindex by parent, append this
                # step's word at the group's position; inactive groups
                # keep their rows untouched (like words/parents).
                new_seqs = jnp.take_along_axis(
                    state.seqs, parent[:, :, None], axis=1
                )
                new_seqs = new_seqs.at[
                    gidx[:, None], jnp.arange(k)[None, :], pos[:, None]
                ].set(word)
                seqs = jnp.where(act[:, None, None], new_seqs, state.seqs)
            else:
                seqs = state.seqs

            t = state.t + act.astype(jnp.int32)
            group_done = act & (
                jnp.all(beam_finished, axis=1) | (t >= self.max_len)
            )
            return (
                BeamSlotState(
                    dec=dec,
                    last=last,
                    t=t,
                    scores=jnp.where(act[:, None], top_scores, state.scores),
                    beam_finished=jnp.where(
                        act[:, None], beam_finished, state.beam_finished
                    ),
                    lengths=jnp.where(act[:, None], lengths, state.lengths),
                    words=words,
                    parents=parents,
                    seqs=seqs,
                    active=act & ~group_done,
                    finished=state.finished | group_done,
                ),
                None,
            )

        state, _ = jax.lax.scan(one, state, None, length=n)
        return state

    @partial(jax.jit, static_argnums=0)
    def flags(self, state: BeamSlotState):
        return state.finished, state.active, state.t

    @partial(jax.jit, static_argnums=0)
    def progress(self, state: BeamSlotState):
        """Streaming fetch: each group's STABLE PREFIX so far —
        ``(tokens (R, max_len), stable_len (R,))``, the same contract as
        the greedy engine's ``progress``.

        Why a beam request has a streamable prefix at all: every beam
        slot at step t+1 either is a frozen copy of, or extends, one of
        the k slots at step t (the merged top-k selects parents among
        the current slots), so the final collected caption — whichever
        slot ranks best at retirement — carries the longest common
        prefix of the CURRENT k slots as its own prefix, forever. That
        LCP is therefore safe to emit: it can only grow (children copy
        a parent's whole prefix), and it never has to be retracted.
        Frozen (finished) slots participate in the LCP at their full
        final length, which is conservative — a finished beam that will
        lose the ranking can still cap the stable prefix — but
        correctness needs no score bound, and the retirement flush
        (ContinuousCaptionServer._retire) delivers the rest.

        One backpointer reconstruction over all R groups (the same
        backward scan as ``collect``), fetched once per sync group only
        while a streaming request is live."""
        R, k, L = self.slots, self.k, self.max_len

        def back(ptr, wp):
            w_t, p_t = wp  # (R, k)
            tok = jnp.take_along_axis(w_t, ptr, axis=1)
            ptr = jnp.take_along_axis(p_t, ptr, axis=1)
            return ptr, tok

        init_ptr = jnp.broadcast_to(
            jnp.arange(k, dtype=jnp.int32)[None, :], (R, k)
        )
        w_rev = jnp.swapaxes(state.words, 0, 1)[::-1]  # (L, R, k)
        p_rev = jnp.swapaxes(state.parents, 0, 1)[::-1]
        _, toks_rev = jax.lax.scan(back, init_ptr, (w_rev, p_rev))
        tokens = jnp.moveaxis(toks_rev[::-1], 0, -1)  # (R, k, L)

        # A position belongs to the stable prefix iff every slot has a
        # real token there (within its length) and all k agree on it.
        pos = jnp.arange(L)
        valid = pos[None, None, :] < state.lengths[:, :, None]  # (R,k,L)
        agree = (tokens == tokens[:, :1, :]).all(axis=1) & valid.all(
            axis=1
        )  # (R, L)
        stable_len = jnp.cumprod(agree.astype(jnp.int32), axis=1).sum(
            axis=1
        )
        return tokens[:, 0, :], stable_len

    @partial(jax.jit, static_argnums=0)
    def collect(self, state: BeamSlotState, group_idx):
        """Gather finished groups, reconstruct their sequences from the
        backpointers (beam.py's backward scan), rank by the engine's
        length normalization, clear the finished bits. Returns
        ((tokens (K, max_len), lengths (K,), scores (K,)), state)."""
        k = self.k
        words = state.words[group_idx]  # (K, L, k)
        parents = state.parents[group_idx]
        lengths = state.lengths[group_idx]  # (K, k)
        scores = state.scores[group_idx]
        K = group_idx.shape[0]

        def back(ptr, wp):
            w_t, p_t = wp  # (K, k)
            tok = jnp.take_along_axis(w_t, ptr, axis=1)
            ptr = jnp.take_along_axis(p_t, ptr, axis=1)
            return ptr, tok

        init_ptr = jnp.broadcast_to(
            jnp.arange(k, dtype=jnp.int32)[None, :], (K, k)
        )
        w_rev = jnp.swapaxes(words, 0, 1)[::-1]  # (L, K, k)
        p_rev = jnp.swapaxes(parents, 0, 1)[::-1]
        _, toks_rev = jax.lax.scan(back, init_ptr, (w_rev, p_rev))
        tokens = jnp.moveaxis(toks_rev[::-1], 0, -1)  # (K, k, L)

        # Rank through the engines' shared helper so the served winner
        # matches generate/n-best/evaluate under every penalty config.
        norm = normalized_scores(
            scores,
            lengths,
            length_normalize=self.length_normalize,
            alpha=self.alpha,
            length_penalty=self.length_penalty,
        )
        best = jnp.argmax(norm, axis=1)
        pick = lambda arr: jnp.take_along_axis(
            arr, best.reshape((K,) + (1,) * (arr.ndim - 1)), axis=1
        ).squeeze(1)
        rows = (pick(tokens), pick(lengths), pick(scores))
        cleared = dataclasses.replace(
            state, finished=state.finished.at[group_idx].set(False)
        )
        return rows, cleared
