"""Masked cross-entropy over padded caption batches.

The reference trains categorical CE on per-prefix samples (one sample per
caption prefix, SURVEY.md §2.1 #5). Summed over a caption's prefixes that
equals the per-timestep CE summed over the sequence, so the rebuild trains
the O(T)-cheaper sequence form: logits (B, T, V) vs next-token targets
(B, T) with pad positions (target == 0) masked out. ``reduction='sum_per
_sample_mean'`` divides by the number of real tokens, matching Keras's
mean-over-samples when each prefix is its own sample.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cast_floats(tree, dtype):
    """Cast every floating-point leaf of ``tree`` to ``dtype`` (integer
    leaves — token ids, step counters — pass through untouched).

    This is the mixed-precision boundary: casting params + batch inputs
    here puts the whole forward (embedding table, LSTM/attention
    matmuls, vocab projection) in the compute dtype, while the master
    params the optimizer updates stay f32 — jax differentiates through
    the cast, so the cotangent is cast back to f32 exactly at this
    boundary (the standard master-weight recipe)."""
    if dtype is None:
        return tree
    return jax.tree_util.tree_map(
        lambda a: (
            a.astype(dtype)
            if jnp.issubdtype(jnp.asarray(a).dtype, jnp.floating)
            else a
        ),
        tree,
    )


def masked_cross_entropy_sums(
    logits, targets, *, pad_id: int = 0, label_smoothing: float = 0.0
):
    """Sum-form masked CE: -> (nll_sum, token_count, correct_count).

    Sum form (not mean) is what data-parallel shards psum before normalizing
    by the global token count, making DP-N gradients exactly equal the
    single-device gradients on the concatenated batch.
    """
    vocab = logits.shape[-1]
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    mask = (targets != pad_id).astype(jnp.float32)

    target_logp = jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    if label_smoothing > 0.0:
        # Keras CategoricalCrossentropy(label_smoothing=ls) convention:
        # y_smooth = y*(1-ls) + ls/V (uniform over ALL classes, target
        # included) — so smoothed losses are directly comparable to the
        # reference framework's numbers.
        target_logp = (1.0 - label_smoothing) * target_logp + (
            label_smoothing / vocab
        ) * jnp.sum(logp, axis=-1)
    nll = -target_logp

    nll_sum = jnp.sum(nll * mask)
    n_tokens = jnp.sum(mask)
    n_correct = jnp.sum((jnp.argmax(logits, -1) == targets) * mask)
    return nll_sum, n_tokens, n_correct


def masked_cross_entropy(
    logits, targets, *, pad_id: int = 0, label_smoothing: float = 0.0
):
    """-> (loss scalar, metrics dict). logits (B, T, V), targets (B, T)."""
    nll_sum, n_tokens, n_correct = masked_cross_entropy_sums(
        logits, targets, pad_id=pad_id, label_smoothing=label_smoothing
    )
    denom = jnp.maximum(n_tokens, 1.0)
    loss = nll_sum / denom
    return loss, {
        "loss": loss,
        "accuracy": n_correct / denom,
        "tokens": n_tokens,
        "perplexity": jnp.exp(jnp.minimum(loss, 20.0)),
    }


def warn_if_attention_reg_unused(decoder, attention_reg: float) -> None:
    """Host-side (build-time) warning when a nonzero attention_reg is
    configured for a decoder without attention maps — the regularizer is
    silently zero inside the traced loss, so the signal must fire here."""
    if attention_reg > 0.0 and not hasattr(
        decoder, "forward_train_with_alphas"
    ):
        import warnings

        warnings.warn(
            f"attention_reg={attention_reg} has no effect: decoder "
            f"{type(decoder).__name__} has no attention maps "
            "(doubly-stochastic regularization applies to the attention "
            "decoder only)",
            stacklevel=3,
        )


def caption_loss_sums(
    decoder,
    params,
    features,
    tokens,
    *,
    rng=None,
    deterministic=True,
    pad_id: int = 0,
    label_smoothing: float = 0.0,
    attention_reg: float = 0.0,
    compute_dtype=None,
    ss_eps=None,
    ss_rng=None,
):
    """Sum-form teacher-forced loss pieces for a (local) batch.

    -> dict(nll_sum, tokens, correct, reg_sum, batch). Normalization
    (dividing by token count / batch size — locally, or by the psum'd global
    counts in the DP step) happens in the caller, so single-device and
    data-parallel training compute identical gradients.

    ``compute_dtype=jnp.bfloat16`` runs the forward (and therefore the
    backward matmuls) in bf16 — params and features are cast at this
    boundary, so the caller's master params stay f32 — while every loss
    REDUCTION stays f32: the CE already upcasts logits before
    log_softmax, and the attention-coverage regularizer below sums in
    f32. TrainConfig.precision='bf16' reaches here.

    ``ss_eps`` (a TRACED scalar; None = off statically) enables
    scheduled sampling: a gradient-free first forward predicts every
    position and each input token (position >= 1, non-pad) is replaced
    by the model's own prediction with probability ss_eps before the
    loss forward — tpucap.train.scheduled. Requires ``ss_rng``. Targets
    stay gold.
    """
    params = cast_floats(params, compute_dtype)
    features = cast_floats(features, compute_dtype)
    inputs = tokens[:, :-1]
    targets = tokens[:, 1:]
    if ss_eps is not None:
        from tpucap.train.scheduled import scheduled_inputs

        if ss_rng is None:
            raise ValueError("scheduled sampling (ss_eps) needs ss_rng")
        inputs = scheduled_inputs(
            decoder, params, features, inputs,
            eps=ss_eps, rng=ss_rng, pad_id=pad_id,
        )
    use_attention_reg = attention_reg > 0.0 and hasattr(
        decoder, "forward_train_with_alphas"
    )
    # All-pad rows contribute nothing to any sum (incl. reg_sum and
    # ``batch``), so callers may zero-pad a tail chunk up to a fixed batch
    # shape and still get exact aggregates. Real caption rows always start
    # with startseq, so this is a no-op for unpadded data.
    row_live = jnp.any(targets != pad_id, axis=-1).astype(jnp.float32)
    if use_attention_reg:
        logits, alphas = decoder.forward_train_with_alphas(
            params, features, inputs, rng=rng, deterministic=deterministic
        )
        # Doubly-stochastic coverage over live timesteps only. Summed in
        # f32 regardless of compute_dtype — per-timestep alphas are fine
        # in bf16, but the coverage sum over T steps is a reduction.
        alphas32 = alphas.astype(jnp.float32)
        live = (inputs != pad_id).astype(jnp.float32)[:, :, None]
        coverage = jnp.sum(alphas32 * live, axis=1)  # (B, L)
        reg_rows = jnp.sum((1.0 - coverage) ** 2, axis=-1)  # (B,)
        reg_sum = jnp.sum(reg_rows * row_live)
    else:
        logits = decoder.forward_train(
            params, features, inputs, rng=rng, deterministic=deterministic
        )
        reg_sum = jnp.zeros((), jnp.float32)
    nll_sum, n_tokens, n_correct = masked_cross_entropy_sums(
        logits, targets, pad_id=pad_id, label_smoothing=label_smoothing
    )
    return {
        "nll_sum": nll_sum,
        "tokens": n_tokens,
        "correct": n_correct,
        "reg_sum": reg_sum,
        "batch": jnp.sum(row_live),
    }


def loss_from_sums(sums, *, attention_reg: float = 0.0):
    """Normalize sum-form pieces into (loss, metrics)."""
    denom = jnp.maximum(sums["tokens"], 1.0)
    loss = sums["nll_sum"] / denom
    reg = sums["reg_sum"] / jnp.maximum(sums["batch"], 1.0)
    if attention_reg > 0.0:
        loss = loss + attention_reg * reg
    metrics = {
        "loss": loss,
        "accuracy": sums["correct"] / denom,
        "tokens": sums["tokens"],
        "perplexity": jnp.exp(jnp.minimum(sums["nll_sum"] / denom, 20.0)),
    }
    if attention_reg > 0.0:
        metrics["attention_reg"] = reg
    return loss, metrics


def caption_loss(
    decoder,
    params,
    features,
    tokens,
    *,
    rng=None,
    deterministic=True,
    pad_id: int = 0,
    label_smoothing: float = 0.0,
    attention_reg: float = 0.0,
    compute_dtype=None,
    ss_eps=None,
    ss_rng=None,
):
    """Teacher-forced loss. tokens (B, T) post-padded full captions
    (startseq ... endseq); inputs = tokens[:, :-1], targets = tokens[:, 1:].

    ``attention_reg`` adds Show-Attend-Tell's doubly-stochastic regularizer
    lambda * mean_b sum_i (1 - sum_t alpha_bti)^2 for attention decoders.
    """
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
    return loss_from_sums(sums, attention_reg=attention_reg)
