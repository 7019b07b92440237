"""Sequence-parallel (ring attention) training for the transformer decoder.

The fifth and final sharding family (dp / tp / pp / ep already shipped).
The reference workload's captions are <= 34 tokens, so SP is not needed
for capacity TODAY — SURVEY.md §2.4/§5.7 records that decision and names
the extension seam: "ring over ``lax.ppermute`` on the same mesh axis".
This module builds that seam for real, for when the sequence axis grows
(dense video captioning, paragraph captions):

- **Token-block sharding.** The teacher-forced sequence is split into
  contiguous blocks over a ``"seq"`` mesh axis: device s holds positions
  ``[s*Tl, (s+1)*Tl)``. Embedding, positional slice, LN, MLP, the final
  vocab projection and the CE are all positionwise — they run on the
  local block untouched, and the dominant training activation (the
  (B, T, V) logits) NEVER materializes on one device (complementary to
  tp.py, which shards the same tensor along V).
- **Ring self-attention with an online softmax.** Queries stay local;
  step 0 consumes the local K/V block, then K/V rotate around the ring
  with one ``lax.ppermute`` per step (S - 1 rotations total). Each
  step's block scores fold into running
  (max, denominator, numerator) accumulators — the flash-attention
  recurrence — with block-granular causal masking on GLOBAL positions
  (a fully-future block contributes exp(-1e30) = 0). With the causal
  mask, step r=0 is the local block, so every query row sees at least
  its own diagonal and the accumulators never divide by zero. The
  per-layer math itself is ``TransformerDecoder.layer_train`` (the
  single source pp.py/ep.py also reuse) with only ``self_attention``
  overridden to the ring.
- **Cross-attention needs no collective**: the image memory is tiny and
  replicated; local queries attend the full memory locally.
- **Params replicated, grads pmean'd** over the ring (each device's raw
  grad is S x its token block's contribution through the psum
  transpose — the same bookkeeping dp.py documents), so the SP step is
  update-exact vs the single-device step up to f32 softmax
  reassociation (tests/test_sp.py pins it at tight tolerance).

2-D ``(data, seq)`` meshes compose: batch sharded over data, each data
row running its own ring.

MoE decoders are rejected (the load-balance aux needs the ep.py step);
dropout decorrelates per (shard, layer) like the DP step.
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

SEQ_AXIS = "seq"
_NEG = -1e30  # finite -inf: keeps the online-softmax rescale NaN-free


def _ring_attention(q, k, v, scale, *, axis, s_idx, n_shards, block_len):
    """Causal ring attention: q/k/v (B, Tl, h, d) local blocks ->
    ctx (B, Tl, h, d). Step 0 consumes the LOCAL K/V block (no
    communication); each of the remaining ``n_shards - 1`` steps rotates
    K/V once over the ring (one ppermute pair) and folds that block's
    scores into flash-style running (max, denom, numer) accumulators.
    Causal masking is on global positions, so the result equals
    full-sequence causal attention."""
    qT = jnp.moveaxis(q, 2, 1)  # (B, h, Tl, d)
    perm = [(i, (i + 1) % n_shards) for i in range(n_shards)]
    qpos = s_idx * block_len + jnp.arange(block_len)  # global q positions

    def fold(m, l, acc, k_cur, v_cur, r):
        src = (s_idx - r) % n_shards  # whose block we hold this step
        kT = jnp.moveaxis(k_cur, 2, 1)
        vT = jnp.moveaxis(v_cur, 2, 1)
        scores = (
            jnp.einsum(
                "bhqd,bhkd->bhqk",
                qT,
                kT,
                preferred_element_type=jnp.float32,
            )
            * scale
        )
        kpos = src * block_len + jnp.arange(block_len)
        visible = qpos[:, None] >= kpos[None, :]  # (Tl, Tl) global causal
        scores = jnp.where(visible[None, None], scores, _NEG)

        m_new = jnp.maximum(m, jnp.max(scores, axis=-1))
        corr = jnp.exp(m - m_new)
        p = jnp.exp(scores - m_new[..., None])
        l_new = l * corr + jnp.sum(p, axis=-1)
        acc_new = acc * corr[..., None] + jnp.einsum(
            "bhqk,bhkd->bhqd", p, vT.astype(jnp.float32)
        )
        return m_new, l_new, acc_new

    B, Tl, h, d = q.shape
    m0 = jnp.full((B, h, Tl), _NEG, jnp.float32)
    l0 = jnp.zeros((B, h, Tl), jnp.float32)
    a0 = jnp.zeros((B, h, Tl, d), jnp.float32)
    # r = 0: the local block — with causal masking every query row sees
    # at least its own diagonal here, so the denominator never starts
    # from an all-masked row.
    m, l, acc = fold(m0, l0, a0, k, v, 0)

    def rot(carry, r):
        m, l, acc, k_cur, v_cur = carry
        k_cur = jax.lax.ppermute(k_cur, axis, perm)
        v_cur = jax.lax.ppermute(v_cur, axis, perm)
        m, l, acc = fold(m, l, acc, k_cur, v_cur, r)
        return (m, l, acc, k_cur, v_cur), None

    (m, l, acc, _, _), _ = jax.lax.scan(
        rot, (m, l, acc, k, v), jnp.arange(1, n_shards)
    )
    ctx = acc / l[..., None]  # causal: l >= exp(0) from the diagonal
    return jnp.moveaxis(ctx, 1, 2).astype(q.dtype)


def make_sp_train_step(
    decoder,
    optimizer,
    mesh,
    *,
    axis: str = SEQ_AXIS,
    data_axis: str | None = None,
    pad_id: int = 0,
    label_smoothing: float = 0.0,
    deterministic: bool = False,
    compute_dtype=None,
    donate: bool = False,
):
    """Build the sequence-parallel train step.

    ``(state, features, tokens) -> (state, metrics)``, canonical param
    layout, tokens (B, T) with the teacher-forced length T-1 divisible by
    the seq-axis size (post-pad captions to T = S*k + 1; pad rows are
    masked out of the loss, so padding is free).
    """
    if not hasattr(decoder, "layer_train"):
        raise ValueError(
            "sequence parallelism requires the transformer decoder "
            f"family; {type(decoder).__name__} has no sequence axis to "
            "shard"
        )
    if getattr(decoder, "num_experts", 0):
        raise NotImplementedError(
            "sequence parallelism does not carry the MoE load-balance "
            "loss; train MoE decoders with parallel/ep.py"
        )
    n_shards = mesh.shape[axis]

    def local_loss(params, features, tokens, rng):
        # Mixed-precision boundary (caption_loss_sums recipe): f32
        # master params outside, compute_dtype block tensors; the ring
        # attention's online-softmax accumulators stay pinned f32
        # below, and the CE upcasts — reductions are f32 either way.
        from tpucap.train.loss import cast_floats

        params = cast_floats(params, compute_dtype)
        features = cast_floats(features, compute_dtype)
        s = jax.lax.axis_index(axis)
        inputs = tokens[:, :-1]
        targets = tokens[:, 1:]
        B, T = inputs.shape
        if T % n_shards:
            raise ValueError(
                f"teacher-forced length {T} (tokens.shape[1] - 1) not "
                f"divisible by the {n_shards}-way '{axis}' mesh axis; "
                "post-pad captions so max_len - 1 divides the ring"
            )
        if T > decoder.max_positions:
            raise ValueError(
                f"sequence length {T} exceeds max_positions "
                f"{decoder.max_positions}"
            )
        Tl = T // n_shards

        use_dropout = rng is not None and not deterministic
        if use_dropout:
            # Feature dropout must mask identically on every ring member
            # (all of them project the same replicated memory) -> the
            # fold is shard-INdependent. Block-local tensors decorrelate
            # by shard below, like the DP step.
            features = dropout(
                jax.random.fold_in(rng, 0),
                features,
                decoder.dropout_rate,
                False,
            )
            rng_local = jax.random.fold_in(
                jax.random.fold_in(rng, 1), s
            )
        mem_k, mem_v = decoder._memory(params, features)

        # Local token block: positions [s*Tl, (s+1)*Tl).
        off = s * Tl
        inp_local = jax.lax.dynamic_slice_in_dim(inputs, off, Tl, axis=1)
        tgt_local = jax.lax.dynamic_slice_in_dim(targets, off, Tl, axis=1)
        pos_table = params["pos_embedding"].astype(mem_k.dtype)
        pos_local = jax.lax.dynamic_slice_in_dim(
            pos_table[: decoder.max_positions], off, Tl, axis=0
        )
        x = embed(params["embedding"], inp_local) + pos_local
        if use_dropout:
            x = dropout(
                jax.random.fold_in(rng_local, 2),
                x,
                decoder.dropout_rate,
                False,
            )

        # The exact decoder layer math (layer_train is the single source
        # — pre-LN residuals, cross-attention on the replicated memory,
        # MLP) with only the self-attention overridden to the ring.
        ring = lambda q, k, v, scale: _ring_attention(  # noqa: E731
            q, k, v, scale,
            axis=axis, s_idx=s, n_shards=n_shards, block_len=Tl,
        )
        for li, layer in enumerate(params["layers"]):
            x, _, _ = decoder.layer_train(
                layer,
                x,
                mem_k[:, li],
                mem_v[:, li],
                causal=None,  # the ring owns its (global) causal mask
                r_attn=(
                    jax.random.fold_in(rng_local, 3 + 2 * li)
                    if use_dropout
                    else None
                ),
                r_mlp=(
                    jax.random.fold_in(rng_local, 4 + 2 * li)
                    if use_dropout
                    else None
                ),
                self_attention=ring,
            )

        hidden = layer_norm(params["ln_f"], x)
        logits = dense(params["out"], hidden)  # (B, Tl, V) — local only
        nll, n_tok, n_cor = masked_cross_entropy_sums(
            logits, tgt_local, pad_id=pad_id,
            label_smoothing=label_smoothing,
        )
        sums = {"nll_sum": nll, "tokens": n_tok, "correct": n_cor}
        sums = jax.tree_util.tree_map(lambda u: jax.lax.psum(u, axis), sums)
        if data_axis is not None:
            sums = jax.tree_util.tree_map(
                lambda u: jax.lax.psum(u, data_axis), sums
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
        # All params replicated: pmean over the ring (and data axis)
        # reconstructs the exact sum of per-block contributions.
        grads = jax.lax.pmean(grads, axis)
        if data_axis is not None:
            grads = jax.lax.pmean(grads, data_axis)
        return grads, metrics

    bspec = P(data_axis) if data_axis else P()
    sharded_grads = shard_map(
        grads_body,
        mesh=mesh,
        in_specs=(P(), bspec, bspec, P()),
        out_specs=(P(), P()),
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
