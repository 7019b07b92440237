"""End-to-end encoder fine-tuning: joint (encoder + decoder) training.

The reference freezes its CNN permanently — features are extracted once
and the decoder trains on them (SURVEY.md §2.1 #2/#9); domain shift
(medical, aerial, sketches) is unfixable there. This module trains the
encoder THROUGH the captioning loss: one jit'd step whose params pytree
is ``{"encoder": ..., "decoder": ...}``, with the encoder forward inside
the differentiated loss.

Semantics on BN encoders (ResNet-50 / InceptionV3): the zoo's apply is
inference-mode BN — running statistics as a fixed affine
(models/encoders/common.py:8 records that design decision) — so this is
FROZEN-BN fine-tuning, the standard recipe for small datasets (BN stats
from the pretrain corpus are better estimates than any small-batch
update). Conv/dense weights and all LN/ViT parameters train fully;
VGG16/TinyCNN have no BN at all.

``freeze_encoder=True`` stops gradients at the feature boundary, making
the decoder updates EXACTLY those of make_train_step on precomputed
features (tests/test_finetune.py pins it) — the dial between the
reference's recipe and full fine-tuning. Gradient accumulation composes
(the sum-form scan from train/loop.py), which matters here: encoder
activations dominate memory, so image batches shrink A-fold.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax

from tpucap.train.loop import (
    TrainState,
    accumulated_sum_grads,
    normalized_accum_grads,
)
from tpucap.train.loss import (
    caption_loss_sums,
    cast_floats,
    loss_from_sums,
    warn_if_attention_reg_unused,
)


def encode_for_decoder(encoder, enc_params, images):
    """Encoder forward in the training graph: (B, H, W, 3) preprocessed
    images -> decoder-ready features ((B, D) pooled or (B, L, D)
    spatial-grid rows, the same shapes pipeline.extract_features emits).
    Keyed on the encoder's declared ``features`` mode — the same
    predicate pipeline._apply_encoder uses — so training-time and
    serving-time feature shapes can't diverge."""
    feats = encoder.apply(enc_params, images)
    if encoder.features == "spatial":  # (B, h, w, c) grid -> (B, h*w, c)
        b, h, w, c = feats.shape
        feats = feats.reshape(b, h * w, c)
    return feats


def make_joint_train_step(
    encoder,
    decoder,
    optimizer,
    *,
    pad_id: int = 0,
    label_smoothing: float = 0.0,
    attention_reg: float = 0.0,
    deterministic: bool = False,
    grad_accum_steps: int = 1,
    freeze_encoder: bool = False,
    remat_encoder: bool = False,
    mesh=None,
    axis: str = "data",
    compute_dtype=None,
    augment_fn=None,
    fsdp_state_template=None,
    grad_clip_norm: float = 0.0,
    fsdp_min_size: int | None = None,
    donate: bool = False,
) -> Callable:
    """Joint jit'd step: (state, images, tokens) -> (state, metrics),
    state.params = {"encoder": ..., "decoder": ...}.

    The optimizer must be initialized over the SAME two-tree pytree
    (TrainState.create({"encoder": ..., "decoder": ...}, optimizer, rng)).

    ``augment_fn(images, rng) -> images`` (data/augment.py) runs INSIDE
    the jitted step on a fresh per-step key (per shard under DP, key
    folded with the axis index) — on-device augmentation with zero
    extra host->device traffic. None compiles an augmentation-free step.

    ``remat_encoder=True`` wraps the encoder forward in
    ``jax.checkpoint``: the backward pass recomputes the conv
    activations instead of keeping them live across the decoder's
    forward+backward — the standard FLOPs-for-HBM trade, and the
    encoder is where this step's activation memory lives (a ResNet-50
    stack at 224x224 dwarfs the decoder's (B, T, V) logits). The
    update is numerically IDENTICAL (remat is a recompute schedule,
    not an approximation — pinned exactly in tests/test_finetune.py);
    only peak memory and step time move. Composes with
    grad_accum_steps (remat inside each microbatch) and DP.

    ``mesh`` switches on data parallelism: images/tokens shard over
    ``axis`` under shard_map, params replicate, and the update is
    computed in pure sum space — per-shard raw-sum gradients and loss
    pieces are psum'd, then normalized once by the GLOBAL counts — so
    the DP update is exactly the single-device update on the
    concatenated batch (same identity the dp.py accumulation path
    uses). grad_accum_steps composes per shard: per-chip image
    activations shrink N*A-fold.

    ``fsdp_state_template`` (a ``shard_fsdp_tree``-placed TrainState;
    requires ``mesh``) switches the DP branch to the ZeRO layout: the
    joint {"encoder", "decoder"} params AND their optimizer state live
    1/N per device, gathered just-in-time per microbatch — the step
    where this matters most, since a fine-tuned backbone's adam state
    is 3x its params. Per-microbatch gradients reduce-scatter through
    the gather's AD transpose (parallel/fsdp.py); ``grad_clip_norm``
    must be handled HERE (psum'd global norm), so pass the optimizer
    without its clip wrapper. Update-exact vs the replicated DP step
    (tests/test_finetune.py).
    """
    warn_if_attention_reg_unused(decoder, attention_reg)
    use_reg = attention_reg > 0.0 and hasattr(
        decoder, "forward_train_with_alphas"
    )

    encode = lambda ep, im: encode_for_decoder(encoder, ep, im)  # noqa: E731
    if remat_encoder:
        # Save only the encoder's OUTPUT features for the backward;
        # every internal conv activation is recomputed when its
        # cotangent is needed. jax.checkpoint is exact — same primal,
        # same gradient — so no contract above this line changes.
        encode = jax.checkpoint(encode)

    def sums_fn(params, images, tokens, rng):
        enc_params = params["encoder"]
        if freeze_encoder:
            enc_params = jax.lax.stop_gradient(enc_params)
        # Mixed precision casts at the encoder boundary too — the conv
        # FLOPs dominate this step, so bf16 matters most here. Master
        # params stay f32 (cast_floats docstring).
        enc_params = cast_floats(enc_params, compute_dtype)
        images = cast_floats(images, compute_dtype)
        feats = encode(enc_params, images)
        return caption_loss_sums(
            decoder,
            params["decoder"],
            feats,
            tokens,
            rng=rng,
            deterministic=deterministic,
            pad_id=pad_id,
            label_smoothing=label_smoothing,
            attention_reg=attention_reg,
            compute_dtype=compute_dtype,
        )

    def loss_fn(params, images, tokens, rng):
        sums = sums_fn(params, images, tokens, rng)
        return loss_from_sums(sums, attention_reg=attention_reg)

    def _sum_space_update(params, images, tokens, dropout_rng, psum):
        """Shared by the DP branch (any accum) and the single-device
        accum branch: raw-sum gradients + pieces, psum'd when sharded,
        normalized once by the global counts."""
        g_nll, g_reg, sums = accumulated_sum_grads(
            sums_fn,
            params,
            images,
            tokens,
            dropout_rng,
            steps=grad_accum_steps,
            use_reg=use_reg,
        )
        if psum is not None:
            sums = psum(sums)
            g_nll = psum(g_nll)
            if g_reg is not None:
                g_reg = psum(g_reg)
        grads = normalized_accum_grads(
            g_nll, g_reg, sums, attention_reg=attention_reg
        )
        loss, metrics = loss_from_sums(sums, attention_reg=attention_reg)
        return grads, loss, metrics

    def _apply(state, grads, metrics, rng):
        updates, opt_state = optimizer.update(
            grads, state.opt_state, state.params
        )
        if freeze_encoder:
            # stop_gradient zeroes the encoder GRADIENTS, but
            # grad-independent optimizer terms (adamw's decoupled weight
            # decay) would still move the "frozen" weights — mask the
            # UPDATES so frozen means frozen for every optimizer, and
            # the decoder-matches-feature-training contract holds.
            updates = dict(updates)
            updates["encoder"] = jax.tree_util.tree_map(
                jnp.zeros_like, updates["encoder"]
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

    if fsdp_state_template is not None:
        if mesh is None:
            raise ValueError("fsdp_state_template requires a mesh")
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        from tpucap.parallel.fsdp import (
            DEFAULT_MIN_SIZE,
            clip_global_fn,
            fsdp_dims,
            fsdp_specs,
            gather_full_fn,
            psum_replicated_fn,
        )

        min_size = (
            DEFAULT_MIN_SIZE if fsdp_min_size is None else fsdp_min_size
        )
        n = dict(mesh.shape)[axis]
        dims = fsdp_dims(
            fsdp_state_template.params, n, min_size=min_size
        )
        specs = fsdp_specs(
            fsdp_state_template, n, axis=axis, min_size=min_size
        )
        # The gather casts to compute dtype BEFORE the collective (half
        # the bytes under bf16); sums_fn's own cast_floats is then a
        # no-op, and freeze_encoder's stop_gradient zeroes the gathered
        # tree's cotangents so the scattered encoder grads are zero too.
        gather_full = gather_full_fn(
            dims, axis=axis, compute_dtype=compute_dtype
        )
        fix = psum_replicated_fn(dims, axis=axis)
        clip = clip_global_fn(
            dims, axis=axis, grad_clip_norm=grad_clip_norm
        )

        def sums_sharded(p, im, tk, r):
            return sums_fn(gather_full(p), im, tk, r)

        def fsdp_body(state: TrainState, images, tokens):
            rng, dropout_rng, aug_rng = jax.random.split(state.rng, 3)
            dropout_rng = jax.random.fold_in(
                dropout_rng, jax.lax.axis_index(axis)
            )
            if augment_fn is not None:
                images = augment_fn(
                    images,
                    jax.random.fold_in(
                        aug_rng, jax.lax.axis_index(axis)
                    ),
                )
            g_nll, g_reg, sums = accumulated_sum_grads(
                sums_sharded,
                state.params,
                images,
                tokens,
                None if deterministic else dropout_rng,
                steps=grad_accum_steps,
                use_reg=use_reg,
            )
            g_nll = fix(g_nll)
            if g_reg is not None:
                g_reg = fix(g_reg)
            sums = jax.tree_util.tree_map(
                lambda s: jax.lax.psum(s, axis), sums
            )
            grads = normalized_accum_grads(
                g_nll, g_reg, sums, attention_reg=attention_reg
            )
            grads = clip(grads)
            _, metrics = loss_from_sums(
                sums, attention_reg=attention_reg
            )
            return _apply(state, grads, metrics, rng)

        return jax.jit(
            shard_map(
                fsdp_body,
                mesh=mesh,
                in_specs=(specs, P(axis), P(axis)),
                out_specs=(specs, P()),
                check_vma=False,
            ),
            donate_argnums=(0,) if donate else (),
        )

    if mesh is not None:
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        def shard_body(state: TrainState, images, tokens):
            rng, dropout_rng, aug_rng = jax.random.split(state.rng, 3)
            dropout_rng = jax.random.fold_in(
                dropout_rng, jax.lax.axis_index(axis)
            )
            if augment_fn is not None:
                images = augment_fn(
                    images,
                    jax.random.fold_in(
                        aug_rng, jax.lax.axis_index(axis)
                    ),
                )
            psum = lambda t: jax.tree_util.tree_map(  # noqa: E731
                lambda s: jax.lax.psum(s, axis), t
            )
            grads, _, metrics = _sum_space_update(
                state.params,
                images,
                tokens,
                None if deterministic else dropout_rng,
                psum,
            )
            return _apply(state, grads, metrics, rng)

        return jax.jit(
            shard_map(
                shard_body,
                mesh=mesh,
                in_specs=(P(), P(axis), P(axis)),
                out_specs=(P(), P()),
                check_vma=False,
            ),
            donate_argnums=(0,) if donate else (),
        )

    def step(state: TrainState, images, tokens):
        rng, dropout_rng, aug_rng = jax.random.split(state.rng, 3)
        if augment_fn is not None:
            images = augment_fn(images, aug_rng)
        if grad_accum_steps > 1:
            grads, _, metrics = _sum_space_update(
                state.params,
                images,
                tokens,
                None if deterministic else dropout_rng,
                None,
            )
        else:
            (_, metrics), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params, images, tokens, dropout_rng)
        return _apply(state, grads, metrics, rng)

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def encoder_learning_rate_optimizer(
    base_optimizer, *, encoder_lr_scale: float
):
    """Scale the encoder subtree's UPDATES by ``encoder_lr_scale`` —
    the standard fine-tuning recipe (pretrained backbone at 0.1x the
    fresh decoder's lr).

    Implemented as ``chain(base, scale-encoder-subtree)`` rather than
    optax.multi_transform so the base optimizer still sees the JOINT
    gradient tree: global-norm clipping (build_optimizer's
    grad_clip_norm) keeps clipping against the joint norm, and adaptive
    statistics stay identical to the unscaled run — only the final
    encoder update is scaled. A multi_transform split would silently
    clip each subtree against the full threshold on its own norm."""

    def init(params):
        del params
        return optax.EmptyState()

    def update(updates, state, params=None):
        del params
        updates = dict(updates)
        updates["encoder"] = jax.tree_util.tree_map(
            lambda u: u * encoder_lr_scale, updates["encoder"]
        )
        return updates, state

    return optax.chain(
        base_optimizer, optax.GradientTransformation(init, update)
    )
