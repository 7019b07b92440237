"""Self-critical sequence training (SCST — Rennie et al., CVPR 2017).

Beyond the reference surface (it trains teacher-forced CE only,
SURVEY.md §2.1 #9): after CE pretraining, captioning practice fine-tunes
directly on the evaluation metric with REINFORCE, using the model's own
greedy decode as the baseline — the "self-critical" trick that removes
the learned value network and aligns the sampling objective with
test-time greedy/beam inference. The reward here is per-image CIDEr-D
with corpus-fixed IDF statistics (tpucap.train.metrics.CiderDScorer),
the standard choice.

TPU-first split (the reward is non-differentiable host text math, so the
step is deliberately three phases, not one program):

1. **rollout** — ONE jitted device program per batch: ancestral sampling
   AND the greedy baseline decode over the same features (both existing
   while_loop engines; no per-token host round-trips).
2. **reward** — host pass over the decoded token rows: strings via the
   tokenizer, per-image CIDEr-D for sample and baseline,
   advantage = r(sample) - r(greedy).
3. **update** — a second jitted program: teacher-forced forward over the
   SAMPLED rows, policy-gradient loss
   ``-(1/Ntok) * sum_b adv_b * sum_t logp(w_bt)`` (token-count
   normalization, the coco SCST convention), optimizer update.

The endseq token is a real action the policy chose — it is inside the
mask, so the model is rewarded/punished for its length decisions. Pad
rows (zero-padded batch tails) carry advantage 0 and an all-pad mask, so
they contribute nothing.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax

from tpucap.decode.greedy import greedy_decode
from tpucap.decode.sample import sample_decode
from tpucap.train.loop import TrainState


def make_scst_rollout(
    decoder,
    *,
    start_id: int,
    end_id: int,
    pad_id: int = 0,
    max_len: int,
    temperature: float = 1.0,
    top_k: int | None = None,
    mesh=None,
    axis: str = "data",
    fsdp_params_template=None,
    min_size: int | None = None,
) -> Callable:
    """-> jitted ``rollout(params, features, rng) -> (sample, greedy)``
    (two DecodeResults from one device program).

    ``mesh`` shards the feature batch over ``axis`` under shard_map
    (params replicated); the sampling key is folded with the shard
    index so shards draw independent rollouts. Results come back as
    the full global batch.

    ``fsdp_params_template`` (with ``mesh``) accepts params in the
    1/N ZeRO layout of :func:`tpucap.parallel.shard_fsdp_tree` (same
    ``min_size``): the program all_gathers them once up front — the
    rollout itself is unchanged, and the per-call gather is the same
    traffic the fsdp train step pays anyway."""
    gather = None
    param_specs = None
    if fsdp_params_template is not None:
        if mesh is None:
            raise ValueError("fsdp_params_template needs a mesh")
        from tpucap.parallel.fsdp import (
            DEFAULT_MIN_SIZE,
            fsdp_dims,
            fsdp_specs,
            gather_full_fn,
        )

        ms = DEFAULT_MIN_SIZE if min_size is None else min_size
        n = dict(mesh.shape)[axis]
        dims = fsdp_dims(fsdp_params_template, n, min_size=ms)
        param_specs = fsdp_specs(
            fsdp_params_template, n, axis=axis, min_size=ms
        )
        gather = gather_full_fn(dims, axis=axis)

    def body(params, features, rng):
        if mesh is not None:
            rng = jax.random.fold_in(rng, jax.lax.axis_index(axis))
        if gather is not None:
            params = gather(params)
        state = decoder.init_state(params, features)
        sampled = sample_decode(
            decoder.step,
            params,
            state,
            rng=rng,
            start_id=start_id,
            end_id=end_id,
            max_len=max_len,
            temperature=temperature,
            top_k=top_k,
            pad_id=pad_id,
        )
        baseline_state = decoder.init_state(params, features)
        baseline = greedy_decode(
            decoder.step,
            params,
            baseline_state,
            start_id=start_id,
            end_id=end_id,
            max_len=max_len,
            pad_id=pad_id,
        )
        return sampled, baseline

    if mesh is None:
        return jax.jit(body)
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    return jax.jit(
        shard_map(
            body,
            mesh=mesh,
            in_specs=(
                param_specs if param_specs is not None else P(),
                P(axis),
                P(),
            ),
            out_specs=P(axis),
            check_vma=False,
        )
    )


def scst_loss_sums(
    decoder, params, features, sampled, advantages, *, start_id, pad_id=0
):
    """Sum-form policy-gradient pieces for a (local) batch:
    -> (pg_nll_sum, n_tokens, logp_sum) where
    ``pg_nll_sum = -sum_b adv_b * sum_t logp(w_bt)`` over non-pad
    positions. Sum form (not mean) is what the DP step psums before
    normalizing by the GLOBAL token count — the same exactness recipe
    as the CE trainers (tpucap.parallel.dp)."""
    B = sampled.shape[0]
    inputs = jnp.concatenate(
        [jnp.full((B, 1), start_id, jnp.int32), sampled[:, :-1]], axis=1
    )
    logits = decoder.forward_train(
        params, features, inputs, deterministic=True
    )
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    tok_logp = jnp.take_along_axis(logp, sampled[..., None], axis=-1)[
        ..., 0
    ]
    mask = (sampled != pad_id).astype(jnp.float32)
    adv = advantages.astype(jnp.float32)[:, None]
    pg_nll_sum = -jnp.sum(adv * tok_logp * mask)
    return pg_nll_sum, jnp.sum(mask), jnp.sum(tok_logp * mask)


def scst_loss(
    decoder, params, features, sampled, advantages, *, start_id, pad_id=0
):
    """Policy-gradient loss on sampled rows. sampled (B, T) int32 token
    rows (pad after endseq), advantages (B,) float32.

    -> (loss, metrics). The forward is the ordinary teacher-forced
    ``forward_train`` over inputs ``[start, w1..w_{T-1}]`` — logits at
    position t score the token the policy actually emitted there."""
    pg_nll_sum, n_tokens, logp_sum = scst_loss_sums(
        decoder,
        params,
        features,
        sampled,
        advantages,
        start_id=start_id,
        pad_id=pad_id,
    )
    n_tokens = jnp.maximum(n_tokens, 1.0)
    loss = pg_nll_sum / n_tokens
    return loss, {
        "loss": loss,
        "tokens": n_tokens,
        "sample_logp": logp_sum / n_tokens,
    }


def make_scst_step(
    decoder,
    optimizer,
    *,
    start_id: int,
    pad_id: int = 0,
    mesh=None,
    axis: str = "data",
    fsdp_state_template=None,
    min_size: int | None = None,
    grad_clip_norm: float = 0.0,
    donate: bool = False,
) -> Callable:
    """-> jitted ``step(state, features, sampled, advantages)
    -> (state, metrics)``. ``state`` is the ordinary TrainState over the
    decoder params (same optimizer surface as CE training).

    ``mesh`` shards the batch over ``axis``: each shard differentiates
    its RAW-SUM policy loss, gradients and token counts are psum'd, and
    the update normalizes once by the GLOBAL count — exactly the
    single-device update on the concatenated batch (params/opt_state
    replicated, every shard applies the identical update).

    ``fsdp_state_template`` (with ``mesh``) takes/returns the
    TrainState in the 1/N ZeRO layout (:func:`shard_fsdp_tree`, same
    ``min_size``): the differentiated loss all_gathers params
    just-in-time, and the gather's AD transpose (a psum_scatter)
    delivers sharded gradient slices with the same factor-N
    bookkeeping as the fsdp CE step — the update equals the
    single-device update on the concatenated batch
    (tests/test_scst.py fsdp exactness).

    ``grad_clip_norm`` (fsdp only): global-norm clipping on the psum'd
    GLOBAL gradient norm — pass the optimizer WITHOUT its optax clip
    wrapper, which would clip each device on its shard-local norm (the
    parallel/fsdp.py rule; the replicated dp/single-device paths keep
    the chained clip, whose full-tree grads make it exact there)."""

    def loss_fn(params, features, sampled, advantages):
        return scst_loss(
            decoder,
            params,
            features,
            sampled,
            advantages,
            start_id=start_id,
            pad_id=pad_id,
        )

    def _apply(state, grads, metrics):
        updates, opt_state = optimizer.update(
            grads, state.opt_state, state.params
        )
        params = optax.apply_updates(state.params, updates)
        return (
            TrainState(
                step=state.step + 1,
                params=params,
                opt_state=opt_state,
                rng=state.rng,
            ),
            metrics,
        )

    if grad_clip_norm and fsdp_state_template is None:
        raise ValueError(
            "grad_clip_norm here is the FSDP global-norm clip; the "
            "replicated paths clip exactly through the optax chain — "
            "leave clip_by_global_norm in the optimizer instead"
        )
    if mesh is None:
        if fsdp_state_template is not None:
            raise ValueError("fsdp_state_template needs a mesh")

        def step(state, features, sampled, advantages):
            (_, metrics), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params, features, sampled, advantages)
            return _apply(state, grads, metrics)

        return jax.jit(step, donate_argnums=(0,) if donate else ())

    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    if fsdp_state_template is not None:
        from tpucap.parallel.fsdp import (
            DEFAULT_MIN_SIZE,
            clip_global_fn,
            fsdp_dims,
            fsdp_specs,
            gather_full_fn,
        )

        ms = DEFAULT_MIN_SIZE if min_size is None else min_size
        n = dict(mesh.shape)[axis]
        dims_params = fsdp_dims(
            fsdp_state_template.params, n, min_size=ms
        )
        state_specs = fsdp_specs(
            fsdp_state_template, n, axis=axis, min_size=ms
        )
        gather_full = gather_full_fn(dims_params, axis=axis)
        clip_global = clip_global_fn(
            dims_params, axis=axis, grad_clip_norm=grad_clip_norm
        )

        def shard_body_fsdp(state, features, sampled, advantages):
            # Same exactness recipe as the replicated dp body below
            # (psum the forward sums, normalize INSIDE the
            # differentiated loss), composed with the fsdp gather: the
            # just-in-time all_gather's transpose is a psum_scatter,
            # so sharded leaves arrive as N * true_grad[slice] (divide
            # by N) while replicated leaves need the pmean — the
            # parallel/fsdp.py factor-N bookkeeping verbatim.
            def local_loss(shard_params):
                pg_local, ntok_local, logp_local = scst_loss_sums(
                    decoder,
                    gather_full(shard_params),
                    features,
                    sampled,
                    advantages,
                    start_id=start_id,
                    pad_id=pad_id,
                )
                pg = jax.lax.psum(pg_local, axis)
                ntok = jnp.maximum(jax.lax.psum(ntok_local, axis), 1.0)
                logp = jax.lax.psum(logp_local, axis)
                loss = pg / ntok
                return loss, {
                    "loss": loss,
                    "tokens": ntok,
                    "sample_logp": logp / ntok,
                }

            (_, metrics), grads = jax.value_and_grad(
                local_loss, has_aux=True
            )(state.params)
            grads = jax.tree_util.tree_map(
                lambda g, d: (
                    g / n if d >= 0 else jax.lax.pmean(g, axis)
                ),
                grads,
                dims_params,
            )
            grads = clip_global(grads)
            return _apply(state, grads, metrics)

        return jax.jit(
            shard_map(
                shard_body_fsdp,
                mesh=mesh,
                in_specs=(state_specs, P(axis), P(axis), P(axis)),
                out_specs=(state_specs, P()),
                check_vma=False,
            ),
            donate_argnums=(0,) if donate else (),
        )

    def shard_body(state, features, sampled, advantages):
        # Exactness recipe (same as tpucap.parallel.dp's CE step, and
        # for the same reason): psum the FORWARD sums, normalize by the
        # global token count INSIDE the differentiated loss, then pmean
        # the grads. The 1/N_global factor thus enters the backward
        # chain as the seed cotangent — the identical f32 computation
        # the single-device path performs — and shard_map transposes
        # the forward psum into N_shards * local-contribution grads,
        # which pmean divides back out exactly (N_shards is a power of
        # two on every judged mesh). The previous form (grad of the RAW
        # sum, divide the psum'd grads by N at the end) applies 1/N in
        # a different order than single-device AD, and the f32
        # discrepancy — amplified by Adam's |g|/(|g|+eps) on near-zero
        # gradient elements — broke update-exactness at the 2e-6 bar
        # (tests/test_scst.py::test_scst_dp_step_update_exact).
        def local_loss(params):
            pg_local, ntok_local, logp_local = scst_loss_sums(
                decoder,
                params,
                features,
                sampled,
                advantages,
                start_id=start_id,
                pad_id=pad_id,
            )
            pg = jax.lax.psum(pg_local, axis)
            ntok = jnp.maximum(jax.lax.psum(ntok_local, axis), 1.0)
            logp = jax.lax.psum(logp_local, axis)
            loss = pg / ntok
            return loss, {
                "loss": loss,
                "tokens": ntok,
                "sample_logp": logp / ntok,
            }

        (_, metrics), grads = jax.value_and_grad(
            local_loss, has_aux=True
        )(state.params)
        grads = jax.lax.pmean(grads, axis)
        return _apply(state, grads, metrics)

    return jax.jit(
        shard_map(
            shard_body,
            mesh=mesh,
            in_specs=(P(), P(axis), P(axis), P(axis)),
            out_specs=(P(), P()),
            check_vma=False,
        ),
        donate_argnums=(0,) if donate else (),
    )
