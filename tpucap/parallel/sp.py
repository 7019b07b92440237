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
  K/V blocks rotate around the ring with one ``lax.ppermute`` per step
  (S steps total). Each step's block scores fold into running
  (max, denominator, numerator) accumulators — the flash-attention
  recurrence — with block-granular causal masking on GLOBAL positions
  (a fully-future block contributes exp(-1e30) = 0). With the causal
  mask, step r=0 is the local block, so every query row sees at least
  its own diagonal and the accumulators never divide by zero.
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

from tpucap.models.layers import (
    dense,
    dropout,
    embed,
    layer_norm,
    merge_heads,
    split_heads,
)
from tpucap.train.loop import TrainState
from tpucap.train.loss import masked_cross_entropy_sums

SEQ_AXIS = "seq"
_NEG = -1e30  # finite -inf: keeps the online-softmax rescale NaN-free


def _ring_attention(q, k, v, scale, *, axis, s_idx, n_shards, block_len):
    """Causal ring attention: q/k/v (B, Tl, h, d) local blocks ->
    ctx (B, Tl, h, d). K/V rotate ``n_shards`` times over the ring
    (one ppermute per step); scores fold into flash-style running
    (max, denom, numer) accumulators; causal masking is on global
    positions so the result equals full-sequence causal attention."""
    B, Tl, h, d = q.shape
    qT = jnp.moveaxis(q, 2, 1)  # (B, h, Tl, d)
    perm = [(i, (i + 1) % n_shards) for i in range(n_shards)]
    qpos = s_idx * block_len + jnp.arange(Tl)  # global query positions

    m0 = jnp.full((B, h, Tl), _NEG, jnp.float32)
    l0 = jnp.zeros((B, h, Tl), jnp.float32)
    a0 = jnp.zeros((B, h, Tl, d), jnp.float32)

    def rot(carry, r):
        m, l, acc, k_cur, v_cur = carry
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
        kpos = src * block_len + jnp.arange(Tl)
        visible = qpos[:, None] >= kpos[None, :]  # (Tl, Tl) global causal
        scores = jnp.where(visible[None, None], scores, _NEG)

        m_new = jnp.maximum(m, jnp.max(scores, axis=-1))
        corr = jnp.exp(m - m_new)
        p = jnp.exp(scores - m_new[..., None])
        l_new = l * corr + jnp.sum(p, axis=-1)
        acc_new = acc * corr[..., None] + jnp.einsum(
            "bhqk,bhkd->bhqd", p, vT.astype(jnp.float32)
        )
        k_next = jax.lax.ppermute(k_cur, axis, perm)
        v_next = jax.lax.ppermute(v_cur, axis, perm)
        return (m_new, l_new, acc_new, k_next, v_next), None

    (m, l, acc, _, _), _ = jax.lax.scan(
        rot, (m0, l0, a0, k, v), jnp.arange(n_shards)
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
    num_heads = decoder.num_heads
    scale = 1.0 / float(decoder.head_dim) ** 0.5

    def local_loss(params, features, tokens, rng):
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
        if features.ndim == 2:
            features = features[:, None, :]

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

        H = decoder.hidden_dim
        for li, layer in enumerate(params["layers"]):
            h1 = layer_norm(layer["ln1"], x)
            qkv = dense(layer["qkv"], h1)  # (B, Tl, 3H)
            q = split_heads(qkv[..., :H], num_heads)
            k = split_heads(qkv[..., H : 2 * H], num_heads)
            v = split_heads(qkv[..., 2 * H :], num_heads)
            ctx = _ring_attention(
                q, k, v, scale,
                axis=axis, s_idx=s, n_shards=n_shards, block_len=Tl,
            )
            attn = dense(layer["o"], merge_heads(ctx))
            if use_dropout:
                attn = dropout(
                    jax.random.fold_in(rng_local, 3 + 2 * li),
                    attn,
                    decoder.dropout_rate,
                    False,
                )
            x = x + attn
            # Cross-attention: replicated memory, local queries — the
            # exact decoder block, no collective.
            x, _ = decoder._cross_attend(
                layer, x, mem_k[:, li], mem_v[:, li]
            )
            h3 = layer_norm(layer["ln3"], x)
            mlp, _ = decoder._mlp_block(layer, h3)
            if use_dropout:
                mlp = dropout(
                    jax.random.fold_in(rng_local, 4 + 2 * li),
                    mlp,
                    decoder.dropout_rate,
                    False,
                )
            x = x + mlp

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

    return jax.jit(step)
