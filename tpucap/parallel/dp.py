"""shard_map data-parallel train/decode steps with psum over ICI.

One compiled program per step: each shard runs the teacher-forced forward +
backward on its slice of the batch, loss pieces are kept in sum form and
reduced with ``lax.psum`` before normalizing by the *global* token count, and
per-shard gradients are psum'd — making the DP-N update bit-equivalent to a
single-device update on the concatenated batch (the SURVEY.md §4 distributed
property test). Optimizer state and params are replicated (out_spec P()),
and every shard computes the identical update.
"""

from __future__ import annotations


import jax
import optax
from jax.sharding import PartitionSpec as P
from jax import shard_map

from tpucap.train.loop import (
    TrainState,
    accumulated_sum_grads,
    caption_sums_fn,
    normalized_accum_grads,
)
from tpucap.train.loss import caption_loss_sums, loss_from_sums


def make_dp_train_step(
    decoder,
    optimizer,
    mesh,
    *,
    axis: str = "data",
    pad_id: int = 0,
    label_smoothing: float = 0.0,
    attention_reg: float = 0.0,
    deterministic: bool = False,
    grad_accum_steps: int = 1,
    compute_dtype=None,
    donate: bool = False,
    scheduled_sampling: bool = False,
    multi_steps: int = 1,
):
    """(state, features, tokens) -> (state, metrics), batch sharded over axis.

    ``multi_steps=N`` returns a multi-step program: inputs are stacks
    of N batches (features (N, B, F), tokens (N, B, T)) sharded over
    the SECOND (batch) axis — in_specs P(None, axis) — and the shard
    body lax.scans the single-step body N times, so one dispatch runs
    N psum'd optimizer steps with the exact per-step update sequence.
    Metrics come back SUMMED over the N steps (loop.make_train_step
    contract).

    ``scheduled_sampling=True`` adds a 4th TRACED argument ss_eps (the
    per-epoch mixing probability — tpucap.train.scheduled): each
    shard's first-pass predictions replace its own input tokens with
    probability ss_eps. Coin keys are folded by shard index (the
    dropout recipe), so like dropout this is per-shard randomness: the
    DP update equals a single-device update drawing the same
    shard-folded coins, not one drawing a single global coin vector.

    ``donate=True``: donate the input state's buffers (in-place param/
    opt-state update; caller must rebind — see make_train_step).

    ``grad_accum_steps=A`` scans each shard's slice as A microbatches
    (sum-form accumulation — tpucap.train.loop.accumulated_sum_grads),
    then psums BOTH the raw-sum gradients and the loss pieces before
    normalizing once by the global token count: the update is exactly
    the single-device full-batch update, and per-chip peak activation
    memory drops by N*A."""
    from tpucap.train.loss import warn_if_attention_reg_unused

    warn_if_attention_reg_unused(decoder, attention_reg)

    def local_loss(params, features, tokens, rng, ss_eps, ss_rng):
        sums = caption_loss_sums(
            decoder,
            params,
            features,
            tokens,
            rng=rng,
            deterministic=deterministic,
            pad_id=pad_id,
            label_smoothing=label_smoothing,
            attention_reg=attention_reg,
            compute_dtype=compute_dtype,
            ss_eps=ss_eps,
            ss_rng=ss_rng,
        )
        global_sums = jax.tree_util.tree_map(
            lambda s: jax.lax.psum(s, axis), sums
        )
        return loss_from_sums(global_sums, attention_reg=attention_reg)

    def shard_body(state: TrainState, features, tokens, ss_eps=None):
        if scheduled_sampling:
            rng, dropout_rng, ss_rng = jax.random.split(state.rng, 3)
            ss_rng = jax.random.fold_in(
                ss_rng, jax.lax.axis_index(axis)
            )
        else:
            rng, dropout_rng = jax.random.split(state.rng)
            ss_eps = ss_rng = None
        # Decorrelate dropout across shards; deterministic runs ignore it.
        dropout_rng = jax.random.fold_in(
            dropout_rng, jax.lax.axis_index(axis)
        )
        if grad_accum_steps > 1:
            # Pure sum space: accumulate each shard's raw-sum gradients
            # locally, psum grads AND loss pieces, normalize once by the
            # GLOBAL counts — no psum-transpose bookkeeping needed.
            sums_fn, use_reg = caption_sums_fn(
                decoder,
                deterministic=deterministic,
                pad_id=pad_id,
                label_smoothing=label_smoothing,
                attention_reg=attention_reg,
                compute_dtype=compute_dtype,
                ss_eps=ss_eps,
            )
            g_nll, g_reg, sums = accumulated_sum_grads(
                sums_fn,
                state.params,
                features,
                tokens,
                # ss needs a key even in deterministic mode; sums_fn
                # splits the per-microbatch folded key (loop.py recipe).
                ss_rng
                if scheduled_sampling
                else (None if deterministic else dropout_rng),
                steps=grad_accum_steps,
                use_reg=use_reg,
            )
            psum = lambda t: jax.tree_util.tree_map(  # noqa: E731
                lambda s: jax.lax.psum(s, axis), t
            )
            sums = psum(sums)
            g_nll = psum(g_nll)
            if g_reg is not None:
                g_reg = psum(g_reg)
            grads = normalized_accum_grads(
                g_nll, g_reg, sums, attention_reg=attention_reg
            )
            loss, metrics = loss_from_sums(
                sums, attention_reg=attention_reg
            )
        else:
            (loss, metrics), grads = jax.value_and_grad(
                local_loss, has_aux=True
            )(state.params, features, tokens, dropout_rng, ss_eps, ss_rng)
            # shard_map AD transposes the forward psum in local_loss
            # into a psum of the (replicated) cotangent, so each shard's
            # grad comes out as N * (its local contribution to the
            # global loss). pmean therefore reconstructs exactly the
            # single-device gradient: (1/N) * sum_i N*local_i = sum_i
            # local_i — verified bitwise-ish 8-way vs single device in
            # tests/test_distributed.py.
            grads = jax.lax.pmean(grads, axis)
        updates, opt_state = optimizer.update(
            grads, state.opt_state, state.params
        )
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            step=state.step + 1, params=params, opt_state=opt_state, rng=rng
        )
        return new_state, metrics

    body_fn = shard_body
    batch_spec = P(axis)
    if multi_steps > 1:
        batch_spec = P(None, axis)  # (N, B, ...) stacks: shard axis 1

        def multi_body(state: TrainState, features, tokens, ss_eps=None):
            def body(st, xs):
                f, t = xs
                return shard_body(st, f, t, ss_eps)

            state, ms = jax.lax.scan(body, state, (features, tokens))
            return state, jax.tree_util.tree_map(
                lambda x: jax.numpy.sum(x, axis=0), ms
            )

        body_fn = multi_body

    in_specs = (P(), batch_spec, batch_spec)
    if scheduled_sampling:
        in_specs = in_specs + (P(),)  # ss_eps scalar, replicated
    sharded = shard_map(
        body_fn,
        mesh=mesh,
        in_specs=in_specs,
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(0,) if donate else ())


def make_dp_decode_fn(
    decoder,
    decode_fn,
    mesh,
    *,
    axis: str = "data",
    gather_results: bool = False,
    **decode_kwargs,
):
    """Shard a batched decode over the mesh.

    ``decode_fn`` is tpucap.decode.greedy_decode or beam_decode; features are
    sharded over the data axis, params replicated. By default results stay
    sharded (out_spec P(axis)); ``gather_results=True`` all_gathers them over
    ICI inside the program (SURVEY.md §2.5 eval-collection collective) so
    every shard returns the full batch.
    """

    decode_kwargs.setdefault("decoder", decoder)

    def shard_body(params, features):
        state = decoder.init_state(params, features)
        res = decode_fn(decoder.step, params, state, **decode_kwargs)
        if gather_results:
            res = jax.tree_util.tree_map(
                lambda x: jax.lax.all_gather(x, axis, axis=0, tiled=True),
                res,
            )
        return res

    sharded = shard_map(
        shard_body,
        mesh=mesh,
        in_specs=(P(), P(axis)),
        out_specs=P() if gather_results else P(axis),
        check_vma=False,
    )
    return jax.jit(sharded)
