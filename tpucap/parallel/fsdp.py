"""ZeRO-style fully-sharded data parallelism (FSDP) over the data axis.

The replicated DP step (tpucap/parallel/dp.py) keeps a full copy of the
params and optimizer state on every device — the right call at this
model family's sizes, but the wrong ceiling once a decoder outgrows
HBM/N. FSDP completes the parallelism matrix (SURVEY.md §2.4 — the
rebuild owns the distributed tier the reference never had) with the
memory-scaling member: params, gradients, AND optimizer state live
sharded 1/N per device over the same ``data`` axis the batch is
sharded on.

TPU-first design (one ``shard_map`` program, XLA collectives over ICI):

- **Storage**: every param/opt-state leaf with a dimension divisible by
  the mesh size (and at least ``min_size`` elements) is stored sliced
  along its LARGEST such dimension; small or indivisible leaves stay
  replicated — the standard min-weight-size escape, so bias vectors and
  scalars never pay collective overhead for a few bytes of savings.
  The rule is a pure function of the leaf's global shape
  (:func:`shard_dim`), which makes it self-consistent across params and
  the optimizer state that mirrors them (adam's mu/nu get exactly the
  param's layout; schedule counts stay replicated scalars).
- **Forward/backward**: the step all_gathers the full params
  just-in-time (one tiled ``all_gather`` per sharded leaf — in compute
  dtype, so bf16 training halves the gather bytes), runs the same
  sum-form loss as dp.py on the local batch shard, and differentiates
  w.r.t. the LOCAL param shards: shard_map AD transposes the forward
  all_gather into exactly ZeRO's backward reduce-scatter
  (``psum_scatter``), so each device receives only its slice of the
  cross-device-summed gradient and the full gradient tree never lives
  on one chip.
- **Update**: the optimizer state is initialized on (and only ever
  sees) the local shard. Every optimizer in
  :func:`tpucap.train.build_optimizer` is elementwise, so the sharded
  update is the slice of the replicated update — pinned update-exact vs
  the single-device step in tests/test_fsdp.py. The one non-elementwise
  piece, global-norm clipping, must NOT run inside the optax chain
  (it would see only the shard-local norm); pass ``grad_clip_norm=``
  here instead and the step clips on the psum'd GLOBAL norm, exactly
  matching ``optax.clip_by_global_norm`` on the full gradient.

Gradient accumulation composes in sum space like dp.py: each microbatch
re-gathers the params inside the scan (peak = one full param copy +
1/A activations) and its gather-transpose reduce-scatters that
microbatch's gradient, so the accumulated shard is the raw-sum gradient
of the GLOBAL batch already — normalized once by the psum'd token
count, the update is exactly the full-batch update.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P
from jax import shard_map

from tpucap.core.mesh import _put_global
from tpucap.train.loop import (
    TrainState,
    accumulated_sum_grads,
    caption_sums_fn,
    normalized_accum_grads,
)
from tpucap.train.loss import caption_loss_sums, loss_from_sums

# Leaves smaller than this stay replicated: the collective + slicing
# bookkeeping for a bias vector costs more than the bytes it saves.
DEFAULT_MIN_SIZE = 1024

_REPLICATED = -1


def shard_dim(shape, n: int, *, min_size: int = DEFAULT_MIN_SIZE) -> int:
    """The dimension a leaf of this global shape shards over an
    ``n``-device axis: the LARGEST dimension divisible by ``n`` (lowest
    index on ties), or ``-1`` (replicated) when no dimension divides or
    the leaf is smaller than ``min_size`` elements.

    A pure function of shape so params and the optimizer-state leaves
    that mirror them (mu/nu/trace) land on identical layouts without
    any tree-position bookkeeping."""
    if not shape:
        return _REPLICATED
    if math.prod(shape) < max(int(min_size), n):
        return _REPLICATED
    best = _REPLICATED
    for i, s in enumerate(shape):
        if s and s % n == 0 and (best < 0 or s > shape[best]):
            best = i
    return best


def _leaf_spec(dim: int, axis: str) -> P:
    return P(*([None] * dim), axis) if dim >= 0 else P()


def fsdp_dims(tree, n: int, *, min_size: int = DEFAULT_MIN_SIZE):
    """Pytree of shard dimensions (``-1`` = replicated) matching
    ``tree`` — the layout contract shared by :func:`shard_fsdp_tree`
    (placement) and :func:`make_fsdp_train_step` (in/out specs and the
    in-program gathers)."""
    return jax.tree_util.tree_map(
        lambda x: shard_dim(jnp.shape(x), n, min_size=min_size), tree
    )


def fsdp_specs(tree, n: int, *, axis: str = "data",
               min_size: int = DEFAULT_MIN_SIZE):
    """Pytree of :class:`PartitionSpec` for the FSDP layout of ``tree``."""
    return jax.tree_util.tree_map(
        lambda d: _leaf_spec(d, axis), fsdp_dims(tree, n, min_size=min_size)
    )


def shard_fsdp_tree(tree, mesh, *, axis: str = "data",
                    min_size: int = DEFAULT_MIN_SIZE):
    """Place a (host or replicated) pytree in the FSDP layout: each
    leaf device_put sliced along its :func:`shard_dim` dimension,
    small/indivisible leaves replicated. Multi-process aware via the
    same global-array construction as core.shard_batch; typed PRNG key
    leaves (TrainState.rng) are carried via raw key data like
    core.replicate_tree."""
    import numpy as np

    n = dict(mesh.shape)[axis]

    def put(x):
        if isinstance(x, jax.Array) and jax.dtypes.issubdtype(
            x.dtype, jax.dtypes.prng_key
        ):
            raw = np.asarray(jax.random.key_data(x))
            impl = str(jax.random.key_impl(x))
            return jax.random.wrap_key_data(
                _put_global(raw, NamedSharding(mesh, P())), impl=impl
            )
        x = np.asarray(x)
        spec = _leaf_spec(shard_dim(x.shape, n, min_size=min_size), axis)
        return _put_global(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(put, tree)


def fsdp_gather_tree(tree, mesh):
    """Gather an FSDP-laid-out pytree back to fully-replicated jax
    Arrays (one compiled identity program whose output sharding is
    replicated — XLA inserts the all_gathers; works across processes,
    unlike a host-side device_get of non-addressable shards)."""
    specs = jax.tree_util.tree_map(lambda _: P(), tree)
    out_shardings = jax.tree_util.tree_map(
        lambda s: NamedSharding(mesh, s), specs
    )
    return jax.jit(lambda t: t, out_shardings=out_shardings)(tree)


def gather_full_fn(dims_params, *, axis: str, compute_dtype=None):
    """-> gather(shard_params) for use INSIDE shard_map: all_gather each
    sharded leaf back to its full shape — in compute dtype when
    mixed-precision training, so the collective moves half the bytes
    (cast commutes with gather exactly). Shared by the feature-based
    and joint (encoder+decoder) FSDP steps."""

    def g(p, d):
        if compute_dtype is not None and jnp.issubdtype(
            p.dtype, jnp.floating
        ):
            p = p.astype(compute_dtype)
        if d < 0:
            return p
        return jax.lax.all_gather(p, axis, axis=d, tiled=True)

    return lambda shard_params: jax.tree_util.tree_map(
        g, shard_params, dims_params
    )


def psum_replicated_fn(dims_params, *, axis: str):
    """-> fix(grad_tree) for the raw-sum (accumulation) path: sharded
    leaves arrive ALREADY globally summed (the gather's AD transpose is
    a psum_scatter); only replicated leaves — which never cross a
    collective — still need the explicit psum."""

    def fix(tree):
        return jax.tree_util.tree_map(
            lambda g, d: g if d >= 0 else jax.lax.psum(g, axis),
            tree,
            dims_params,
        )

    return fix


def clip_global_fn(dims_params, *, axis: str, grad_clip_norm: float):
    """-> clip(grads) with optax.clip_by_global_norm semantics on the
    TRUE global norm: sharded leaves' squares psum to the total (each
    device holds a distinct slice); replicated leaves are counted once,
    NOT psum'd (every device holds the same full copy)."""

    def clip(grads):
        if not grad_clip_norm:
            return grads
        shard_sq = 0.0
        rep_sq = 0.0
        for g, d in zip(
            jax.tree_util.tree_leaves(grads),
            jax.tree_util.tree_leaves(dims_params),
            strict=True,
        ):
            sq = jnp.sum(jnp.square(g.astype(jnp.float32)))
            if d >= 0:
                shard_sq = shard_sq + sq
            else:
                rep_sq = rep_sq + sq
        gnorm = jnp.sqrt(jax.lax.psum(shard_sq, axis) + rep_sq)
        scale = grad_clip_norm / jnp.maximum(gnorm, grad_clip_norm)
        return jax.tree_util.tree_map(lambda g: g * scale, grads)

    return clip


def make_fsdp_train_step(
    decoder,
    optimizer,
    mesh,
    state_template,
    *,
    axis: str = "data",
    pad_id: int = 0,
    label_smoothing: float = 0.0,
    attention_reg: float = 0.0,
    deterministic: bool = False,
    grad_accum_steps: int = 1,
    compute_dtype=None,
    grad_clip_norm: float = 0.0,
    min_size: int = DEFAULT_MIN_SIZE,
    multi_steps: int = 1,
    scheduled_sampling: bool = False,
    donate: bool = False,
):
    """(state, features, tokens) -> (state, metrics), with the state in
    the FSDP layout (place it with :func:`shard_fsdp_tree`, same
    ``min_size``) and the batch sharded over ``axis``.

    ``grad_clip_norm`` implements ``optax.clip_by_global_norm`` on the
    psum'd GLOBAL gradient norm — pass the optimizer WITHOUT its clip
    wrapper (a chained clip would see only shard-local norms).

    The update is exactly the single-device update on the concatenated
    batch (tests/test_fsdp.py), by the same sum-form argument as dp.py:
    loss pieces are psum'd before normalizing by the global token
    count; gradients arrive sharded via the all_gather's AD transpose
    (a psum_scatter) and only need the factor-N bookkeeping below."""
    from tpucap.train.loss import warn_if_attention_reg_unused

    warn_if_attention_reg_unused(decoder, attention_reg)

    n = dict(mesh.shape)[axis]
    dims_params = fsdp_dims(state_template.params, n, min_size=min_size)
    state_specs = fsdp_specs(state_template, n, axis=axis,
                             min_size=min_size)
    gather_full = gather_full_fn(
        dims_params, axis=axis, compute_dtype=compute_dtype
    )
    clip_global = clip_global_fn(
        dims_params, axis=axis, grad_clip_norm=grad_clip_norm
    )

    psum_tree = lambda t: jax.tree_util.tree_map(  # noqa: E731
        lambda s: jax.lax.psum(s, axis), t
    )

    if scheduled_sampling and grad_accum_steps > 1:
        raise NotImplementedError(
            "scheduled_sampling + grad_accum_steps under fsdp is not "
            "wired (the dp step composes them; drop one dial or use "
            "parallelism='dp')"
        )

    def local_loss(
        shard_params, features, tokens, rng, ss_eps=None, ss_rng=None
    ):
        sums = caption_loss_sums(
            decoder,
            gather_full(shard_params),
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
        return loss_from_sums(psum_tree(sums), attention_reg=attention_reg)

    def shard_body(state: TrainState, features, tokens, ss_eps=None):
        if scheduled_sampling:
            # Per-shard coins, the dp.py recipe: the fsdp update equals
            # a single-device update drawing the same shard-folded
            # coins (like dropout), not one global coin vector.
            rng, dropout_rng, ss_rng = jax.random.split(state.rng, 3)
            ss_rng = jax.random.fold_in(
                ss_rng, jax.lax.axis_index(axis)
            )
        else:
            rng, dropout_rng = jax.random.split(state.rng)
            ss_eps = ss_rng = None
        dropout_rng = jax.random.fold_in(
            dropout_rng, jax.lax.axis_index(axis)
        )
        if grad_accum_steps > 1:
            # Raw-sum heads per microbatch: no forward psum inside the
            # scan, so the gather-transpose's psum_scatter delivers each
            # sharded leaf ALREADY globally summed across devices; only
            # replicated leaves (no gather, no transpose) still need the
            # explicit psum. Loss pieces psum once, normalize once by
            # the global counts — exactly the full-batch update.
            sums_fn, use_reg = caption_sums_fn(
                decoder,
                deterministic=deterministic,
                pad_id=pad_id,
                label_smoothing=label_smoothing,
                attention_reg=attention_reg,
                compute_dtype=compute_dtype,
            )

            def sums_sharded(p, fm, tm, r):
                return sums_fn(gather_full(p), fm, tm, r)

            g_nll, g_reg, sums = accumulated_sum_grads(
                sums_sharded,
                state.params,
                features,
                tokens,
                None if deterministic else dropout_rng,
                steps=grad_accum_steps,
                use_reg=use_reg,
            )
            fix = psum_replicated_fn(dims_params, axis=axis)
            g_nll = fix(g_nll)
            if g_reg is not None:
                g_reg = fix(g_reg)
            sums = psum_tree(sums)
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
            # Factor-N bookkeeping (the dp.py argument, extended): the
            # forward psum transposes to a psum of the replicated
            # cotangent, so the full-param cotangent on each shard is
            # N * (its local contribution). Sharded leaves then pass
            # through the all_gather transpose — psum_scatter — and
            # arrive as N * true_grad[slice]: divide by N. Replicated
            # leaves never cross a collective: pmean reconstructs
            # (1/N) * sum_i N*local_i = the true gradient.
            grads = jax.tree_util.tree_map(
                lambda g, d: (
                    g / n if d >= 0 else jax.lax.pmean(g, axis)
                ),
                grads,
                dims_params,
            )
        grads = clip_global(grads)
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
        # Same recipe as dp.py's multi-step dispatch: (N, B, ...) host
        # stacks sharded over the SECOND axis, the scan body IS the
        # single step (update sequence incl. rng threading identical),
        # metrics summed over the N steps.
        batch_spec = P(None, axis)

        def multi_body(state: TrainState, features, tokens, ss_eps=None):
            def body(st, xs):
                f, t = xs
                return shard_body(st, f, t, ss_eps)

            state, ms = jax.lax.scan(body, state, (features, tokens))
            return state, jax.tree_util.tree_map(
                lambda x: jnp.sum(x, axis=0), ms
            )

        body_fn = multi_body

    in_specs = (state_specs, batch_spec, batch_spec)
    if scheduled_sampling:
        in_specs = in_specs + (P(),)  # ss_eps scalar, replicated
    sharded = shard_map(
        body_fn,
        mesh=mesh,
        in_specs=in_specs,
        out_specs=(state_specs, P()),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(0,) if donate else ())
