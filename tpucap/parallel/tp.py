"""Tensor-parallel (vocab-sharded) beam decode.

The output projection (hidden x vocab — by far the decoder's largest matmul
and parameter) is column-sharded over a ``("model",)`` mesh axis
(SURVEY.md §2.4 "vocab-sharded output projection" extension seam): each
shard projects the shared hidden state onto its vocab slice, the global
logsumexp is assembled with pmax/psum over ICI, each shard takes a local
top-k, and the per-shard candidates are all_gathered (k per shard) and
merged — exact because the global top-k of a union equals the top-k of
per-shard top-k's, and the gather order (shard-major = ascending vocab
offset, index-ordered within shard) reproduces the single-device tie order.

Token-exact vs tpucap.decode.beam_decode on the virtual 8-device mesh —
tests/test_tp.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P

from tpucap.decode.beam import (
    NEG_INF,
    BeamResult,
    _gather_beams,
    _tile_state,
)

MODEL_AXIS = "model"


def _param_specs(params, axis: str):
    """Spec tree: out-projection kernel/bias sharded on vocab, rest
    replicated."""

    def spec_for(path, leaf):
        keys = [getattr(p, "key", getattr(p, "idx", None)) for p in path]
        if "out" in keys:
            if keys[-1] == "kernel":
                return P(None, axis)
            if keys[-1] == "bias":
                return P(axis)
        return P()

    return jax.tree_util.tree_map_with_path(spec_for, params)


def make_tp_beam_fn(
    decoder,
    mesh,
    *,
    axis: str = MODEL_AXIS,
    data_axis: str | None = None,
    start_id: int,
    end_id: int,
    max_len: int,
    beam_width: int,
    pad_id: int = 0,
    length_normalize: bool = True,
    alpha: float = 1.0,
):
    """Build a jittable (params, features) -> BeamResult with the output
    projection sharded over ``mesh``'s ``axis``.

    ``data_axis``: optional second mesh axis to shard the batch over — the
    full 2-D serving layout (batch x vocab); results come back sharded over
    ``data_axis``. With data_axis=None the batch is replicated."""
    k = beam_width
    n_shards = mesh.shape[axis]

    def shard_body(params, features):
        B = features.shape[0]
        my = jax.lax.axis_index(axis)
        v_local = params["out"]["kernel"].shape[-1]
        col_offset = my * v_local

        state = _tile_state(decoder.init_state(params, features), k)
        tokens0 = jnp.full((B, k, max_len), pad_id, jnp.int32)
        scores0 = jnp.tile(
            jnp.concatenate(
                [jnp.zeros((1,)), jnp.full((k - 1,), NEG_INF)]
            )[None, :],
            (B, 1),
        ).astype(jnp.float32)

        def cond(carry):
            t, _, _, _, finished, _, _ = carry
            return jnp.logical_and(t < max_len, ~jnp.all(finished))

        def body(carry):
            t, tokens, state, last, finished, lengths, scores = carry
            hidden, new_state = decoder.step_hidden(params, state, last)
            # Local vocab slice of the logits: (B*k, V/p).
            local = (
                jnp.dot(
                    hidden,
                    params["out"]["kernel"].astype(hidden.dtype),
                    preferred_element_type=jnp.float32,
                )
                + params["out"]["bias"].astype(jnp.float32)
            )
            # Global logsumexp assembled over ICI (pad mass included, the
            # same convention as the single-device beam engine).
            m = jax.lax.pmax(jnp.max(local, axis=-1), axis)  # (B*k,)
            s = jax.lax.psum(
                jnp.sum(jnp.exp(local - m[:, None]), axis=-1), axis
            )
            lse = m + jnp.log(s)

            # Mask pad (it lives in exactly one shard's slice).
            cols = col_offset + jax.lax.broadcasted_iota(
                jnp.int32, local.shape, 1
            )
            local = jnp.where(cols == pad_id, NEG_INF, local)

            # Per-shard top-k, then gather k-per-shard candidates.
            pv, pw = jax.lax.top_k(local, k)  # (B*k, k) local
            pw = pw + col_offset
            # all_gather stacks shard-major: (p, B*k, k) -> (B*k, p*k) in
            # ascending-vocab-offset order (tie-order preservation).
            av = jnp.moveaxis(
                jax.lax.all_gather(pv, axis, axis=0), 0, 1
            ).reshape(B * k, n_shards * k)
            aw = jnp.moveaxis(
                jax.lax.all_gather(pw, axis, axis=0), 0, 1
            ).reshape(B * k, n_shards * k)

            C = n_shards * k
            logp = (av - lse[:, None]).reshape(B, k, C)
            words = aw.reshape(B, k, C)

            live_cand = scores[:, :, None] + logp
            frozen_rank = jnp.full((C,), NEG_INF).at[0].set(0.0)
            frozen_cand = scores[:, :, None] + frozen_rank[None, None, :]
            fin = finished[:, :, None]
            cand = jnp.where(fin, frozen_cand, live_cand)
            cand_words = jnp.where(fin, pad_id, words)

            merged = cand.reshape(B, k * C)
            top_scores, idx2 = jax.lax.top_k(merged, k)
            parent = idx2 // C
            word = jnp.take_along_axis(
                cand_words.reshape(B, k * C), idx2, axis=1
            ).astype(jnp.int32)

            take = lambda arr: jnp.take_along_axis(arr, parent, axis=1)
            tokens = jax.vmap(lambda rows, idx: rows[idx])(tokens, parent)
            parent_finished = take(finished)
            lengths = take(lengths)

            emit = ~parent_finished
            word = jnp.where(parent_finished, pad_id, word)
            tokens = jax.lax.dynamic_update_slice(
                tokens, word[:, :, None], (0, 0, t)
            )
            lengths = lengths + emit.astype(jnp.int32)
            finished = parent_finished | (word == end_id)

            state = _gather_beams(new_state, parent, B, k)
            last = word.reshape(B * k)
            return t + 1, tokens, state, last, finished, lengths, top_scores

        carry = (
            jnp.array(0, jnp.int32),
            tokens0,
            state,
            jnp.full((B * k,), start_id, jnp.int32),
            jnp.zeros((B, k), bool),
            jnp.zeros((B, k), jnp.int32),
            scores0,
        )
        _, tokens, _, _, finished, lengths, scores = jax.lax.while_loop(
            cond, body, carry
        )

        if length_normalize:
            norm = scores / jnp.maximum(lengths, 1).astype(
                scores.dtype
            ) ** alpha
        else:
            norm = scores
        best = jnp.argmax(norm, axis=1)
        pick = lambda arr: jnp.take_along_axis(
            arr, best.reshape((arr.shape[0],) + (1,) * (arr.ndim - 1)), axis=1
        ).squeeze(1)
        return BeamResult(
            tokens=pick(tokens),
            lengths=pick(lengths),
            scores=pick(scores),
            beam_tokens=tokens,
            beam_lengths=lengths,
            beam_scores=scores,
        )

    def build_specs(params):
        return _param_specs(params, axis)

    feat_spec = P(data_axis) if data_axis else P()
    out_spec = P(data_axis) if data_axis else P()

    def fn(params, features):
        sharded = shard_map(
            shard_body,
            mesh=mesh,
            in_specs=(build_specs(params), feat_spec),
            out_specs=out_spec,
            check_vma=False,
        )
        return sharded(params, features)

    return jax.jit(fn)
