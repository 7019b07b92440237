"""LoRA: low-rank adaptation for parameter-efficient fine-tuning.

The reference genre fine-tunes nothing (its CNN is frozen behind
one-shot extraction; SURVEY.md §2.1 #2); tpucap's ``fit_finetune``
trains the full backbone through the captioning loss. LoRA (Hu et al.
2021, arXiv:2106.09685) is the production middle ground: freeze every
base weight and train a rank-r overlay on the matmul kernels,

    W_eff = W + (alpha / r) * A @ B,   A: (d_in, r),  B: (r, d_out),

with A ~ N(0, 1/r) and B = 0 at init, so step 0 is EXACTLY the base
model. Trainable parameters (and therefore Adam state, the 2x-params
HBM tax) shrink to r*(d_in+d_out)/(d_in*d_out) of each kernel — ~1-2%
at r=8 on this model family — and the checkpoint artifact is a few MB
instead of the backbone.

TPU-native shape of the implementation: adapters are an ordinary
pytree overlay keyed by the base tree's key-paths. ``apply_lora``
materializes the effective params INSIDE the jitted step (one (d_in,r)
x (r,d_out) matmul + add per adapted kernel — noise next to the
forward), so the model forwards run completely unchanged and every
decoder/encoder family is adaptable without touching its code. AD then
routes gradients to the adapters alone; the base rides through the
step as a constant.

What gets adapted: 2-D floating 'kernel' leaves by default — LSTM
input kernels, dense projections, transformer qkv/o/mlp, ViT blocks.
'recurrent' (LSTM) and 'table' (embedding) can be opted in via
``target_keys``. Conv kernels (4-D) are deliberately out: low-rank
factorization of spatial convs is a different technique with different
math, and the backbone's convs are exactly what LoRA practice leaves
frozen.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from tpucap.train.loop import TrainState
from tpucap.train.loss import caption_loss_sums, loss_from_sums

DEFAULT_TARGET_KEYS = ("kernel",)


def _leaf_key(path) -> str:
    """Stable string id for a tree position (jax keystr)."""
    return jax.tree_util.keystr(path)


def _last_key(path) -> str | None:
    """The final mapping key of a path ('kernel', 'bias', ...)."""
    if not path:
        return None
    last = path[-1]
    return getattr(last, "key", None)


def lora_targets(
    params, *, target_keys=DEFAULT_TARGET_KEYS
) -> dict[str, tuple[int, int]]:
    """-> {keypath: (d_in, d_out)} for every adaptable leaf: a 2-D
    floating-point array whose final key is in ``target_keys``."""
    out: dict[str, tuple[int, int]] = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        if (
            _last_key(path) in target_keys
            and getattr(leaf, "ndim", 0) == 2
            and jnp.issubdtype(leaf.dtype, jnp.floating)
        ):
            out[_leaf_key(path)] = (leaf.shape[0], leaf.shape[1])
    if not out:
        raise ValueError(
            f"no LoRA-adaptable leaves (2-D float leaves named "
            f"{target_keys}) in the given tree"
        )
    return out


def init_lora(
    params,
    rank: int,
    *,
    rng,
    target_keys=DEFAULT_TARGET_KEYS,
):
    """-> adapters pytree {keypath: {'a': (d_in, r), 'b': (r, d_out)}}.

    a ~ N(0, 1/r), b = 0: the overlay starts as an exact identity
    (apply_lora(base, init) == base, pinned in tests/test_lora.py).
    Keys are the base tree's key-paths, so the overlay is
    self-describing and order-independent."""
    if rank < 1:
        raise ValueError(f"rank must be >= 1, got {rank}")
    targets = lora_targets(params, target_keys=target_keys)
    adapters = {}
    for i, (key, (d_in, d_out)) in enumerate(sorted(targets.items())):
        k = jax.random.fold_in(rng, i)
        adapters[key] = {
            "a": (
                jax.random.normal(k, (d_in, rank), jnp.float32)
                / np.sqrt(rank)
            ),
            "b": jnp.zeros((rank, d_out), jnp.float32),
        }
    return adapters


def apply_lora(params, adapters, *, scale: float):
    """Effective params: base + scale * a@b on adapted leaves, base
    elsewhere. Runs inside jit (the per-step materialization); also
    fine outside for one-off merged inference."""

    def eff(path, leaf):
        ad = adapters.get(_leaf_key(path))
        if ad is None:
            return leaf
        delta = (scale * (ad["a"] @ ad["b"])).astype(leaf.dtype)
        return leaf + delta

    return jax.tree_util.tree_map_with_path(eff, params)


def merge_lora(params, adapters, *, scale: float):
    """Materialize the merged tree for deployment (device_get-safe);
    decode on the merged tree is bit-identical to decoding on
    apply_lora's per-step view — same adds, same dtypes."""
    return jax.jit(
        lambda p, a: apply_lora(p, a, scale=scale)
    )(params, adapters)


def lora_param_counts(params, adapters) -> tuple[int, int]:
    """-> (trainable adapter params, total base params)."""
    n_ad = sum(
        int(np.prod(x.shape))
        for x in jax.tree_util.tree_leaves(adapters)
    )
    n_base = sum(
        int(np.prod(x.shape))
        for x in jax.tree_util.tree_leaves(params)
    )
    return n_ad, n_base


def save_lora(path: str, adapters, *, rank: int, alpha: float):
    """Write the adapter artifact (a few MB): one .npz with the flat
    keypath->a/b arrays plus the scale metadata."""
    flat = {}
    for key, ab in adapters.items():
        flat[f"{key}::a"] = np.asarray(ab["a"])
        flat[f"{key}::b"] = np.asarray(ab["b"])
    np.savez(
        path,
        __lora_rank__=np.int32(rank),
        __lora_alpha__=np.float32(alpha),
        **flat,
    )


def load_lora(path: str):
    """-> (adapters, rank, alpha) from :func:`save_lora`'s artifact."""
    with np.load(path) as z:
        rank = int(z["__lora_rank__"])
        alpha = float(z["__lora_alpha__"])
        adapters: dict = {}
        for name in z.files:
            if name.startswith("__lora_"):
                continue
            key, part = name.rsplit("::", 1)
            adapters.setdefault(key, {})[part] = jnp.asarray(z[name])
    return adapters, rank, alpha


def make_lora_train_step(
    decoder,
    base_params,
    optimizer,
    *,
    scale: float,
    encoder=None,
    pad_id: int = 0,
    label_smoothing: float = 0.0,
    attention_reg: float = 0.0,
    deterministic: bool = False,
    compute_dtype=None,
    mesh=None,
    axis: str = "data",
    augment_fn=None,
    donate: bool = False,
) -> Callable:
    """-> jitted ``step(state, features_or_images, tokens) ->
    (state, metrics)`` where ``state`` is a TrainState over the
    ADAPTERS alone — optimizer state shrinks to the adapter tree.

    ``base_params``: the frozen tree. Decoder-only mode (encoder=None)
    takes precomputed feature rows and ``base_params`` is the decoder
    tree. Joint mode passes ``encoder`` and ``base_params =
    {"encoder": ..., "decoder": ...}`` (the fit_finetune layout):
    images run through the encoder inside the step, and the adapters
    may span both subtrees. The base closes over the program as device
    constants — it is never gathered, copied, or updated.

    ``mesh`` shards the batch over ``axis`` with the dp.py recipe
    (forward psum of the sum-form pieces; AD transposes it so pmean
    reconstructs the exact single-device gradient) — adapters and base
    replicated, update identical on every shard."""
    from tpucap.train.finetune import encode_for_decoder
    from tpucap.train.loss import warn_if_attention_reg_unused

    warn_if_attention_reg_unused(decoder, attention_reg)

    def local_sums(adapters, batch_x, tokens, rng):
        eff = apply_lora(base_params, adapters, scale=scale)
        if encoder is not None:
            features = encode_for_decoder(
                encoder, eff["encoder"], batch_x
            )
            dec_eff = eff["decoder"]
        else:
            features = batch_x
            dec_eff = eff
        return caption_loss_sums(
            decoder,
            dec_eff,
            features,
            tokens,
            rng=rng,
            deterministic=deterministic,
            pad_id=pad_id,
            label_smoothing=label_smoothing,
            attention_reg=attention_reg,
            compute_dtype=compute_dtype,
        )

    def _apply(state, grads, metrics, rng):
        updates, opt_state = optimizer.update(
            grads, state.opt_state, state.params
        )
        adapters = optax.apply_updates(state.params, updates)
        return (
            TrainState(
                step=state.step + 1,
                params=adapters,
                opt_state=opt_state,
                rng=rng,
            ),
            metrics,
        )

    if mesh is None:

        def loss_fn(adapters, batch_x, tokens, rng):
            sums = local_sums(adapters, batch_x, tokens, rng)
            return loss_from_sums(sums, attention_reg=attention_reg)

        def step(state, batch_x, tokens):
            rng, dropout_rng, aug_rng = jax.random.split(state.rng, 3)
            if augment_fn is not None:
                batch_x = augment_fn(batch_x, aug_rng)
            (_, metrics), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params, batch_x, tokens, dropout_rng)
            return _apply(state, grads, metrics, rng)

        return jax.jit(step, donate_argnums=(0,) if donate else ())

    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    def shard_loss(adapters, batch_x, tokens, rng):
        sums = local_sums(adapters, batch_x, tokens, rng)
        global_sums = jax.tree_util.tree_map(
            lambda s: jax.lax.psum(s, axis), sums
        )
        return loss_from_sums(global_sums, attention_reg=attention_reg)

    def shard_body(state, batch_x, tokens):
        rng, dropout_rng, aug_rng = jax.random.split(state.rng, 3)
        dropout_rng = jax.random.fold_in(
            dropout_rng, jax.lax.axis_index(axis)
        )
        if augment_fn is not None:
            batch_x = augment_fn(
                batch_x, jax.random.fold_in(aug_rng, jax.lax.axis_index(axis))
            )
        (_, metrics), grads = jax.value_and_grad(
            shard_loss, has_aux=True
        )(state.params, batch_x, tokens, dropout_rng)
        # Forward psum transposes to a psum of the replicated cotangent:
        # each shard's grad is N * its local share; pmean reconstructs
        # the exact single-device gradient (parallel/dp.py's identity).
        grads = jax.lax.pmean(grads, axis)
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
