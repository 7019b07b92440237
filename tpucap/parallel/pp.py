"""Pipeline-parallel (GPipe-style) training for the transformer decoder.

The reference has no distributed tier at all (SURVEY.md §2.4); DP and
vocab-sharded TP are already re-owned (dp.py / tp.py). This module adds the
third classic sharding family — pipeline parallelism over a ``"stage"``
mesh axis — the TPU-native way:

- **Stage-sharded weights.** The decoder's per-layer parameters are
  stacked to a leading ``(num_layers, ...)`` axis (``stack_pp_layers``)
  and shard_map partitions that axis over the stage axis: each device
  physically holds only its ``num_layers / num_stages`` layers. The small
  shared tensors (embedding, positional table, mem_proj, final LN, vocab
  head) stay replicated — they are the pipeline's two ends plus the
  per-stage cross-attention projection input.
- **Microbatch schedule as a ``lax.scan``.** The batch is split into M
  microbatches; the scan runs ``M + S - 1`` ticks. At tick t, stage s
  processes microbatch ``t - s``: stage 0 embeds a fresh microbatch,
  every other stage consumes the activation block received from its
  predecessor, and a single ``lax.ppermute`` per tick shifts all
  activations one stage forward over ICI simultaneously (the classic
  GPipe bubble: S-1 idle ticks out of M+S-1, amortized away as M grows).
- **The vocab head runs ONCE, outside the schedule.** The last stage
  accumulates each finished microbatch's hidden block into a full-batch
  buffer (a masked one-hot select — the same scatter-free write the
  KV-cached decode step uses, docs/PERF.md); after the scan, final-LN +
  vocab projection + masked CE run over the whole (B, T) batch in one
  large MXU matmul instead of M+S-1 small launches inside the loop.
- **Loss assembled with collectives.** The sum-form CE pieces are masked
  to the last stage and psum'd over the stage axis, so the loss and its
  normalization are identical to the single-device teacher-forced step on
  the full batch — the same sum-form contract dp.py uses (tests/test_pp.py
  pins equality of loss AND of the SGD parameter update against
  ``make_train_step``).
- **Backward through the pipeline is just AD.** ``jax.grad``
  differentiates through the scan and the ppermute (its transpose is the
  reverse permutation), so the reverse pipeline schedule — cotangents
  flowing stage S-1 -> 0 — falls out of the forward program; no manual
  backward staging.

Cross-attention memory never crosses stages: features are replicated, and
each stage computes K/V for ITS OWN layers locally
(``decoder.project_memory`` / ``decoder.layer_memory``) — O(stage-local
layers) compute instead of shipping per-layer K/V down the pipe.

2-D ``(data, stage)`` meshes compose: the batch is sharded over the data
axis first, each data row runs its own pipeline, and gradient/metric
reductions reduce over both axes.

Scope: training only. Decode stays on the DP/TP engines — at caption
lengths (~20 steps of one token) a pipeline's per-step latency couldn't
amortize the bubble, and the KV-cached step is already launch-bound
(docs/PERF.md).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax
from jax.sharding import PartitionSpec as P
from jax import shard_map

from tpucap.models.layers import dense, dropout, embed, layer_norm
from tpucap.train.loop import TrainState
from tpucap.train.loss import masked_cross_entropy_sums

STAGE_AXIS = "stage"


def stack_pp_layers(params):
    """Canonical transformer params -> pipeline layout.

    ``params['layers']`` (a list of per-layer dicts) becomes one dict of
    leaves with a leading ``(num_layers, ...)`` axis — the axis shard_map
    partitions over the stage mesh axis. All other entries pass through.
    ``unstack_pp_layers`` is the exact inverse, so orbax checkpoints and
    the single-device engines interoperate with pipeline training.
    """
    layers = params["layers"]
    stacked = jax.tree_util.tree_map(
        lambda *leaves: jnp.stack(leaves), *layers
    )
    out = {k: v for k, v in params.items() if k != "layers"}
    out["layers"] = stacked
    return out


def unstack_pp_layers(params):
    """Inverse of ``stack_pp_layers``: split the stacked leading axis back
    into the canonical list-of-dicts layout."""
    stacked = params["layers"]
    n = jax.tree_util.tree_leaves(stacked)[0].shape[0]
    layers = [
        jax.tree_util.tree_map(lambda leaf: leaf[i], stacked)
        for i in range(n)
    ]
    out = {k: v for k, v in params.items() if k != "layers"}
    out["layers"] = layers
    return out


def _pp_param_specs(axis: str):
    """Spec prefix-tree for the stacked param dict: the stacked layer
    leaves shard their leading (num_layers) axis over the stage axis,
    everything else is replicated."""
    return {
        "embedding": P(),
        "pos_embedding": P(),
        "mem_proj": P(),
        "layers": P(axis),
        "ln_f": P(),
        "out": P(),
    }


def make_pp_train_step(
    decoder,
    optimizer,
    mesh,
    *,
    axis: str = STAGE_AXIS,
    data_axis: str | None = None,
    num_microbatches: int | None = None,
    pad_id: int = 0,
    label_smoothing: float = 0.0,
    deterministic: bool = False,
    compute_dtype=None,
    donate: bool = False,
):
    """Build the pipeline-parallel train step.

    ``(state, features, tokens) -> (state, metrics)`` where
    ``state.params`` is the STACKED layout (``stack_pp_layers``). tokens
    (B, T) post-padded; features (B, D) or (B, Lm, D), replicated over the
    stage axis (sharded over ``data_axis`` when given). ``num_microbatches``
    defaults to the stage count; the (data-local) batch must divide by it.
    """
    if getattr(decoder, "num_experts", 0):
        raise NotImplementedError(
            "pipeline parallelism does not carry the MoE load-balance "
            "loss; train MoE decoders with parallel/ep.py (expert "
            "parallel) or the dp/single-device steps"
        )
    num_stages = mesh.shape[axis]
    if decoder.num_layers % num_stages:
        raise ValueError(
            f"num_layers {decoder.num_layers} not divisible by the "
            f"{num_stages}-way '{axis}' mesh axis"
        )
    M = num_stages if num_microbatches is None else num_microbatches
    if M < 1:
        raise ValueError(f"num_microbatches must be >= 1, got {M}")
    layers_per_stage = decoder.num_layers // num_stages
    perm = [(i, (i + 1) % num_stages) for i in range(num_stages)]

    def local_loss(params, features, tokens, rng):
        # Mixed-precision boundary (caption_loss_sums recipe): f32
        # master params outside, compute_dtype forward (incl. the
        # ppermuted activations), f32 CE reductions (the CE upcasts).
        from tpucap.train.loss import cast_floats

        params = cast_floats(params, compute_dtype)
        features = cast_floats(features, compute_dtype)
        s = jax.lax.axis_index(axis)
        inputs = tokens[:, :-1]
        targets = tokens[:, 1:]
        B, T = inputs.shape
        if B % M:
            raise ValueError(
                f"(data-local) batch {B} not divisible by {M} microbatches"
            )
        mb = B // M
        if features.ndim == 2:
            features = features[:, None, :]
        use_dropout = rng is not None and not deterministic
        if use_dropout:
            # One mask over the full feature tensor (like the single-device
            # path); the fold constants are stage-INdependent because the
            # same dropped features feed every stage's local memory
            # projection and must mask identically everywhere.
            features = dropout(
                jax.random.fold_in(rng, 0),
                features,
                decoder.dropout_rate,
                False,
            )

        # This stage's layers, and their cross-attention K/V for all M
        # microbatches up front (one big MXU matmul each, not M small ones).
        local_layers = [
            jax.tree_util.tree_map(lambda leaf: leaf[j], params["layers"])
            for j in range(layers_per_stage)
        ]
        mem = decoder.project_memory(params, features)  # (B, Lm, H)
        mems_kv = []
        for layer in local_layers:
            k_l, v_l = decoder.layer_memory(layer, mem)
            mems_kv.append(
                (
                    k_l.reshape((M, mb) + k_l.shape[1:]),
                    v_l.reshape((M, mb) + v_l.shape[1:]),
                )
            )

        # Stage-0 inputs for every microbatch (SPMD computes this on every
        # stage, but only stage 0 feeds it forward, so elsewhere its
        # gradient contribution is exactly zero).
        inputs_mb = inputs.reshape(M, mb, T)
        x0 = embed(params["embedding"], inputs_mb) + params["pos_embedding"][
            :T
        ].astype(mem.dtype)
        if use_dropout:
            x0 = dropout(
                jax.random.fold_in(rng, 1), x0, decoder.dropout_rate, False
            )

        causal = jnp.tril(jnp.ones((T, T), bool))[None]
        is_last = s == num_stages - 1
        mb_ids = jnp.arange(M)

        def tick(carry, t):
            x_recv, hiddens = carry
            # Stage s works on microbatch t - s this tick (clipped: out-of
            # -range ticks recompute a stale block that is never stored).
            idx = jnp.clip(t - s, 0, M - 1)
            x = jnp.where(
                s == 0,
                jax.lax.dynamic_index_in_dim(x0, idx, 0, keepdims=False),
                x_recv,
            )
            for j, layer in enumerate(local_layers):
                mk = jax.lax.dynamic_index_in_dim(
                    mems_kv[j][0], idx, 0, keepdims=False
                )
                mv = jax.lax.dynamic_index_in_dim(
                    mems_kv[j][1], idx, 0, keepdims=False
                )
                r_attn = r_mlp = None
                if use_dropout:
                    gl = s * layers_per_stage + j
                    r_mb = jax.random.fold_in(
                        jax.random.fold_in(rng, 2), idx
                    )
                    r_attn = jax.random.fold_in(r_mb, 2 * gl)
                    r_mlp = jax.random.fold_in(r_mb, 2 * gl + 1)
                x, _, _ = decoder.layer_train(
                    layer, x, mk, mv, causal, r_attn, r_mlp
                )

            # Last stage: bank the finished block (one-hot select, not a
            # batch-indexed scatter — docs/PERF.md KV-write lesson).
            store = is_last & (t - s >= 0) & (t - s < M)
            write = (store & (mb_ids == idx))[:, None, None, None]
            hiddens = jnp.where(write, x[None], hiddens)

            x_send = jax.lax.ppermute(x, axis, perm)
            return (x_send, hiddens), None

        x_init = jnp.zeros((mb, T, decoder.hidden_dim), mem.dtype)
        h_init = jnp.zeros((M, mb, T, decoder.hidden_dim), mem.dtype)
        (_, hiddens), _ = jax.lax.scan(
            tick, (x_init, h_init), jnp.arange(M + num_stages - 1)
        )

        # Head + loss once over the whole batch (the buffer layout matches
        # the original row order: reshape(M, mb, T) <-> reshape(B, T)).
        hidden = layer_norm(params["ln_f"], hiddens.reshape(B, T, -1))
        logits = dense(params["out"], hidden)
        nll, n_tok, n_cor = masked_cross_entropy_sums(
            logits, targets, pad_id=pad_id, label_smoothing=label_smoothing
        )
        # Non-last stages ran the head over their zero buffers (SPMD);
        # mask their finite-but-meaningless sums out before the reduction.
        live = is_last.astype(jnp.float32)
        sums = {
            "nll_sum": nll * live,
            "tokens": n_tok * live,
            "correct": n_cor * live,
        }
        sums = jax.tree_util.tree_map(lambda v: jax.lax.psum(v, axis), sums)
        if data_axis is not None:
            sums = jax.tree_util.tree_map(
                lambda v: jax.lax.psum(v, data_axis), sums
            )
        denom = jnp.maximum(sums["tokens"], 1.0)
        loss = sums["nll_sum"] / denom
        metrics = {
            "loss": loss,
            "accuracy": sums["correct"] / denom,
            "tokens": sums["tokens"],
            "perplexity": jnp.exp(jnp.minimum(loss, 20.0)),
        }
        return loss, metrics

    def grads_body(params, features, tokens, rng):
        if data_axis is not None:
            rng = jax.random.fold_in(rng, jax.lax.axis_index(data_axis))
        (loss, metrics), grads = jax.value_and_grad(
            local_loss, has_aux=True
        )(params, features, tokens, rng)
        # Same psum-transpose bookkeeping as dp.py: the forward psum over
        # the stage axis amplifies every device's cotangent S-fold, so each
        # device's raw grad is S x (its true contribution). Replicated
        # leaves get contributions from several stages -> pmean over the
        # stage axis reconstructs the exact sum; the stage-SHARDED layer
        # stack is touched only by its owning stage -> divide by S locally
        # (a pmean would average different layers' grads together).
        n = num_stages

        def fix(path, g):
            if any(getattr(p, "key", None) == "layers" for p in path):
                return g / n
            return jax.lax.pmean(g, axis)

        grads = jax.tree_util.tree_map_with_path(fix, grads)
        if data_axis is not None:
            grads = jax.lax.pmean(grads, data_axis)
        return grads, metrics

    pspec = _pp_param_specs(axis)
    bspec = P(data_axis) if data_axis else P()
    sharded_grads = shard_map(
        grads_body,
        mesh=mesh,
        in_specs=(pspec, bspec, bspec, P()),
        out_specs=(pspec, P()),
        check_vma=False,
    )

    def step(state: TrainState, features, tokens):
        rng, dropout_rng = jax.random.split(state.rng)
        grads, metrics = sharded_grads(
            state.params, features, tokens, dropout_rng
        )
        updates, opt_state = optimizer.update(
            grads, state.opt_state, state.params
        )
        params = optax.apply_updates(state.params, updates)
        return (
            TrainState(
                step=state.step + 1,
                params=params,
                opt_state=opt_state,
                rng=rng,
            ),
            metrics,
        )

    return jax.jit(step, donate_argnums=(0,) if donate else ())
