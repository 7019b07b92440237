"""Expert-parallel (MoE) training for the transformer decoder.

Completes the sharding-family matrix (dp.py / tp.py / pp.py): the
mixture-of-experts MLP variant of the transformer decoder
(``TransformerDecoder(num_experts=E)``) shards its per-expert weight
stacks over an ``"expert"`` mesh axis, TPU-style:

- **Expert-sharded weights.** Each layer's ``moe_in`` / ``moe_out``
  leaves carry a leading (E, ...) axis; shard_map partitions it so each
  device physically holds E / n_shards experts. Everything else —
  attention, router, embedding, head — is replicated (the router must see
  all experts to pick a top-k; it is a single small matmul).
- **Dense dispatch + one psum combine.** The decoder's MoE block
  (``transformer._moe_mlp``) computes the LOCAL experts' outputs for all
  tokens as one stacked einsum, weights them by the (replicated) top-k
  gates sliced to the local expert range, and a single ``lax.psum`` over
  the expert axis assembles the combined output — numerically identical
  to the single-device sum over all experts. No sort, no capacity
  buffers, no all-to-all: at captioning scale the dense formulation is
  faster on the MXU than any dynamic dispatch, and the all-to-all
  token-routing layout remains the documented extension seam for
  capacity-constrained MoE at LLM scale.
- **Loss = masked CE + Switch load-balance aux.** The aux term
  (E * sum_e f_e * P_e) comes from the replicated router, so it needs no
  collective; the CE sums need none over the expert axis either (the
  psum already replicated the logits) and psum over the data axis when a
  2-D (data, expert) mesh shards the batch.
- **Gradient bookkeeping** follows the proven dp/pp pattern: every
  device's raw grad is n_shards x (its contribution) through the psum
  transpose, so replicated leaves take a pmean over the expert axis and
  the expert-sharded stacks divide by n_shards locally (a pmean would
  average different experts' grads together). tests/test_moe.py pins the
  EP update exactly equal to the single-device MoE update.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax
from jax.sharding import PartitionSpec as P
from jax import shard_map

from tpucap.train.loop import TrainState
from tpucap.train.loss import masked_cross_entropy_sums

EXPERT_AXIS = "expert"

_LAYER_REPLICATED_KEYS = (
    "ln1",
    "qkv",
    "o",
    "ln2",
    "xq",
    "xk",
    "xv",
    "xo",
    "ln3",
    "router",
)


def _ep_param_specs(decoder, axis: str):
    """Spec prefix-tree: per-layer moe_in/moe_out stacks shard their
    leading (num_experts) axis over the expert axis; all else replicated."""
    layer_spec = {k: P() for k in _LAYER_REPLICATED_KEYS}
    layer_spec["moe_in"] = P(axis)
    layer_spec["moe_out"] = P(axis)
    return {
        "embedding": P(),
        "pos_embedding": P(),
        "mem_proj": P(),
        "layers": [dict(layer_spec) for _ in range(decoder.num_layers)],
        "ln_f": P(),
        "out": P(),
    }


def make_ep_train_step(
    decoder,
    optimizer,
    mesh,
    *,
    axis: str = EXPERT_AXIS,
    data_axis: str | None = None,
    pad_id: int = 0,
    label_smoothing: float = 0.0,
    moe_aux_weight: float = 0.01,
    deterministic: bool = False,
    compute_dtype=None,
    donate: bool = False,
):
    """Build the expert-parallel train step.

    ``(state, features, tokens) -> (state, metrics)`` on the canonical
    param layout (the expert stacks are already leading-axis (E, ...)).
    The loss is masked CE + ``moe_aux_weight`` x the Switch load-balance
    aux; metrics report both pieces.
    """
    num_experts = getattr(decoder, "num_experts", 0)
    if not num_experts:
        raise ValueError(
            "expert parallelism needs a MoE decoder "
            "(TransformerDecoder(num_experts > 0)); "
            f"{type(decoder).__name__} has a dense MLP"
        )
    n_shards = mesh.shape[axis]
    if num_experts % n_shards:
        raise ValueError(
            f"num_experts {num_experts} not divisible by the "
            f"{n_shards}-way '{axis}' mesh axis"
        )

    def local_loss(params, features, tokens, rng):
        # Mixed-precision boundary (caption_loss_sums recipe): f32
        # master params outside, compute_dtype forward; the CE and the
        # router's load-balance statistics reduce in f32 (the router
        # softmax upcasts — transformer.py).
        from tpucap.train.loss import cast_floats

        params = cast_floats(params, compute_dtype)
        features = cast_floats(features, compute_dtype)
        inputs = tokens[:, :-1]
        targets = tokens[:, 1:]
        logits, aux = decoder.forward_train_with_moe_aux(
            params,
            features,
            inputs,
            rng=rng,
            deterministic=deterministic,
            expert_axis=axis,
            data_axis=data_axis,  # globalizes f/P inside the MoE blocks
        )
        nll, n_tok, n_cor = masked_cross_entropy_sums(
            logits, targets, pad_id=pad_id, label_smoothing=label_smoothing
        )
        if data_axis is not None:
            nll = jax.lax.psum(nll, data_axis)
            n_tok = jax.lax.psum(n_tok, data_axis)
            n_cor = jax.lax.psum(n_cor, data_axis)
        denom = jnp.maximum(n_tok, 1.0)
        ce = nll / denom
        loss = ce + moe_aux_weight * aux
        metrics = {
            "loss": loss,
            "ce": ce,
            "moe_aux": aux,
            "accuracy": n_cor / denom,
            "tokens": n_tok,
            "perplexity": jnp.exp(jnp.minimum(ce, 20.0)),
        }
        return loss, metrics

    def grads_body(params, features, tokens, rng):
        if data_axis is not None:
            rng = jax.random.fold_in(rng, jax.lax.axis_index(data_axis))
        (loss, metrics), grads = jax.value_and_grad(
            local_loss, has_aux=True
        )(params, features, tokens, rng)
        n = n_shards

        def fix(path, g):
            keys = [getattr(p, "key", None) for p in path]
            if "moe_in" in keys or "moe_out" in keys:
                return g / n
            return jax.lax.pmean(g, axis)

        grads = jax.tree_util.tree_map_with_path(fix, grads)
        if data_axis is not None:
            grads = jax.lax.pmean(grads, data_axis)
        return grads, metrics

    pspec = _ep_param_specs(decoder, axis)
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
