"""Train loop: jit'd train step, optax Adam, epoch driver.

Replaces the reference's Keras `model.fit(generator, callbacks=[...])`
(SURVEY.md §3.2) with one compiled program per step. The data-parallel
variant lives in tpucap.parallel.dp; this module is the single-device step
it must match bit-for-bit.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax

from tpucap.train.loss import caption_loss


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    step: Any
    params: Any
    opt_state: Any
    rng: Any

    @classmethod
    def create(cls, params, optimizer, rng):
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=optimizer.init(params),
            rng=rng,
        )


def own_state(state):
    """Device-copy every leaf of a state tree (sharding preserved).

    Donated train steps (``make_*_train_step(donate=True)``) DELETE
    their input buffers. A freshly-created TrainState usually aliases
    the caller's param tree (``TrainState.create(self.params[...])``),
    so the first donated step would invalidate arrays the caller still
    exposes. One copy before the loop makes the loop the sole owner;
    the cost is a single device-to-device copy of params + zeros."""
    return jax.tree_util.tree_map(jnp.copy, state)


def freeze_subtree_updates(optimizer, is_frozen):
    """Zero the updates whose key path satisfies ``is_frozen(path)``
    AFTER the base optimizer runs — so grad-independent terms (adamw's
    decoupled weight decay) cannot move frozen params either, the same
    rule as finetune.py's freeze_encoder.

    STATE-TRANSPARENT by design: ``init`` and the opt_state pytree are
    the base optimizer's unchanged (no ``optax.chain`` wrapper), so
    checkpoint save/restore templates and resume work identically with
    or without the freeze.
    """

    def update(updates, state, params=None):
        updates, state = optimizer.update(updates, state, params)
        updates = jax.tree_util.tree_map_with_path(
            lambda path, u: jnp.zeros_like(u) if is_frozen(path) else u,
            updates,
        )
        return updates, state

    return optax.GradientTransformation(optimizer.init, update)


def build_optimizer(cfg, total_steps: int = 0):
    """TrainConfig -> optax optimizer (the Keras compile(optimizer=...)
    surface — SURVEY.md §2.2 "fit loop" row).

    With every knob at its default this returns plain ``optax.adam`` —
    bit-identical updates AND an identical opt_state pytree to round-1
    checkpoints (no gratuitous ``optax.chain`` wrapper), so resume from
    older checkpoints keeps working. ``total_steps`` anchors the cosine
    schedule's horizon (pass epochs x steps_per_epoch; 0 falls back to
    lr_decay_steps)."""
    import optax

    lr = cfg.learning_rate
    plain = (
        cfg.lr_schedule == "constant"
        and not cfg.warmup_steps
        and not cfg.grad_clip_norm
    )
    if plain and cfg.optimizer == "adam":
        return optax.adam(lr)

    if cfg.lr_schedule == "constant":
        sched = optax.constant_schedule(lr)
    elif cfg.lr_schedule == "cosine":
        # The cosine must finish AT the end of the run: its horizon is
        # the post-warmup step budget (join_schedules offsets it to
        # start after warmup).
        horizon = max(
            1, (total_steps or cfg.lr_decay_steps) - cfg.warmup_steps
        )
        sched = optax.cosine_decay_schedule(lr, decay_steps=horizon)
    elif cfg.lr_schedule == "exponential":
        sched = optax.exponential_decay(
            lr,
            transition_steps=max(1, cfg.lr_decay_steps),
            decay_rate=cfg.lr_decay_rate,
        )
    else:
        raise ValueError(
            f"unknown lr_schedule {cfg.lr_schedule!r}; "
            "have constant|cosine|exponential"
        )
    if cfg.warmup_steps:
        sched = optax.join_schedules(
            [
                optax.linear_schedule(0.0, lr, cfg.warmup_steps),
                sched,
            ],
            boundaries=[cfg.warmup_steps],
        )

    makers = {
        "adam": lambda: optax.adam(sched),
        "adamw": lambda: optax.adamw(
            sched, weight_decay=cfg.weight_decay
        ),
        "sgd": lambda: optax.sgd(
            sched, momentum=cfg.momentum or None
        ),
        "rmsprop": lambda: optax.rmsprop(sched, decay=0.9),  # Keras rho
        "adagrad": lambda: optax.adagrad(sched),
    }
    if cfg.optimizer not in makers:
        raise ValueError(
            f"unknown optimizer {cfg.optimizer!r}; have {sorted(makers)}"
        )
    base = makers[cfg.optimizer]()
    if cfg.grad_clip_norm:
        return optax.chain(
            optax.clip_by_global_norm(cfg.grad_clip_norm), base
        )
    return base


def caption_sums_fn(
    decoder,
    *,
    deterministic: bool,
    pad_id: int = 0,
    label_smoothing: float = 0.0,
    attention_reg: float = 0.0,
    compute_dtype=None,
    ss_eps=None,
):
    """-> (sums_fn(params, features, tokens, rng) -> sums dict, use_reg)
    — the standard decoder-on-precomputed-features loss pieces, shaped
    for :func:`accumulated_sum_grads`.

    ``ss_eps`` (a traced scalar, closed over; None = off) turns on
    scheduled sampling. The rng argument is then MANDATORY (never None,
    even when ``deterministic``) and is split per call into the
    sampling coin key and the dropout key — so each accumulation
    microbatch draws independent coins via the caller's fold_in."""
    from tpucap.train.loss import caption_loss_sums

    use_reg = attention_reg > 0.0 and hasattr(
        decoder, "forward_train_with_alphas"
    )

    def sums_fn(p, fm, tm, r):
        ss_rng = None
        if ss_eps is not None:
            r_ss, r_drop = jax.random.split(r)
            ss_rng = r_ss
            r = None if deterministic else r_drop
        return caption_loss_sums(
            decoder,
            p,
            fm,
            tm,
            rng=r,
            deterministic=deterministic,
            pad_id=pad_id,
            label_smoothing=label_smoothing,
            attention_reg=attention_reg,
            compute_dtype=compute_dtype,
            ss_eps=ss_eps,
            ss_rng=ss_rng,
        )

    return sums_fn, use_reg


def accumulated_sum_grads(
    sums_fn,
    params,
    features,
    tokens,
    rng,
    *,
    steps: int,
    use_reg: bool = False,
):
    """Gradient accumulation in SUM form: scan ``steps`` microbatches,
    accumulating the sum-form loss pieces (``sums_fn(params, f, t, rng)
    -> caption_loss_sums-shaped dict``) AND the gradients of the RAW,
    unnormalized sums. -> (g_nll, g_reg, sums) with g_reg None unless
    ``use_reg`` (the doubly-stochastic regularizer head).

    Normalizing ONCE at the end by the accumulated token/batch counts —
    grads = g_nll / tokens (+ attention_reg * g_reg / batch) — makes the
    accumulated gradient EXACTLY the full-batch gradient (up to f32
    reassociation), because the loss is linear in the sums. The naive
    recipe (average per-microbatch mean-loss gradients) is NOT exact
    when pad counts differ across microbatches — the reason this runs in
    sum space. The two heads need separate trees since their final
    weights (1/tokens vs attention_reg/batch) are data-dependent and
    unknown until every microbatch is counted; the second backward is
    paid only when ``use_reg``.

    Peak activation memory (the (B, T, V) logits) drops by ``steps``x —
    the point of accumulation. Dropout decorrelates per microbatch via
    fold_in; ``rng=None`` means deterministic.
    """
    B = features.shape[0]
    if B % steps:
        raise ValueError(
            f"batch size {B} not divisible by grad_accum_steps {steps}"
        )
    mb = B // steps
    f = features.reshape((steps, mb) + features.shape[1:])
    t = tokens.reshape((steps, mb) + tokens.shape[1:])

    def nll_head(p, fm, tm, r):
        sums = sums_fn(p, fm, tm, r)
        return sums["nll_sum"], sums

    def reg_head(p, fm, tm, r):
        return sums_fn(p, fm, tm, r)["reg_sum"]

    zeros = jax.tree_util.tree_map(
        lambda x: jnp.zeros(x.shape, x.dtype), params
    )
    sums0 = {
        k: jnp.zeros((), jnp.float32)
        for k in ("nll_sum", "tokens", "correct", "reg_sum", "batch")
    }
    add = jax.tree_util.tree_map

    def body(carry, xs):
        fm, tm, i = xs
        r = None if rng is None else jax.random.fold_in(rng, i)
        if use_reg:
            g_nll, g_reg, sums = carry
            g2 = jax.grad(reg_head)(params, fm, tm, r)
            g_reg = add(jnp.add, g_reg, g2)
        else:
            g_nll, sums = carry
        (_, s), g = jax.value_and_grad(nll_head, has_aux=True)(
            params, fm, tm, r
        )
        g_nll = add(jnp.add, g_nll, g)
        sums = add(jnp.add, sums, s)
        carry = (
            (g_nll, g_reg, sums) if use_reg else (g_nll, sums)
        )
        return carry, None

    init = (
        (zeros, zeros, sums0) if use_reg else (zeros, sums0)
    )
    carry, _ = jax.lax.scan(body, init, (f, t, jnp.arange(steps)))
    if use_reg:
        g_nll, g_reg, sums = carry
        return g_nll, g_reg, sums
    g_nll, sums = carry
    return g_nll, None, sums


def normalized_accum_grads(g_nll, g_reg, sums, *, attention_reg: float):
    """Turn accumulated raw-sum gradients into the full-batch gradient:
    g_nll / tokens (+ attention_reg * g_reg / batch)."""
    denom = jnp.maximum(sums["tokens"], 1.0)
    grads = jax.tree_util.tree_map(lambda g: g / denom, g_nll)
    if g_reg is not None:
        bden = jnp.maximum(sums["batch"], 1.0)
        grads = jax.tree_util.tree_map(
            lambda g, h: g + attention_reg * (h / bden), grads, g_reg
        )
    return grads


def make_train_step(
    decoder,
    optimizer,
    *,
    pad_id: int = 0,
    label_smoothing: float = 0.0,
    attention_reg: float = 0.0,
    deterministic: bool = False,
    grad_accum_steps: int = 1,
    compute_dtype=None,
    donate: bool = False,
    scheduled_sampling: bool = False,
    multi_steps: int = 1,
) -> Callable:
    """Single-device jit'd step: (state, features, tokens) -> (state, metrics).

    ``multi_steps=N`` returns a MULTI-STEP program instead: it takes
    stacked inputs (features (N, B, F), tokens (N, B, T)) and runs N
    optimizer steps as one ``lax.scan`` inside a single jit call —
    the scan body is exactly the single step, so the update sequence
    (including the per-step rng threading) is identical to N separate
    calls; only the per-dispatch host overhead is amortized N-fold.
    Returned metrics are SUMMED over the N steps (divide by the step
    count when averaging, as train_epoch/fit already do).

    ``scheduled_sampling=True`` changes the step signature to
    (state, features, tokens, ss_eps): ss_eps is a TRACED scalar (the
    per-epoch ramp never retraces) and each input token at position
    >= 1 is replaced by the model's own gradient-free first-pass
    prediction with probability ss_eps before the loss forward
    (tpucap.train.scheduled — the parallel two-pass formulation).

    ``donate=True`` donates the input TrainState's buffers to XLA
    (donate_argnums=0): params and optimizer state update in place
    instead of double-allocating old+new trees during the step. Only
    for callers that OWN the state and rebind it every call
    (``state, m = step(state, ...)`` — the pipeline loops); the old
    state is deleted by the call. Off by default: the library contract
    for bare make_*_step users keeps inputs alive.

    ``grad_accum_steps=A`` splits the batch into A microbatches scanned
    sequentially, cutting peak activation memory (the (B, T, V) logits)
    by A while producing the EXACT full-batch update (sum-form
    accumulation — see accumulated_sum_grads). Train batches A-times
    larger than HBM would otherwise allow.

    ``compute_dtype=jnp.bfloat16`` is mixed-precision training: the
    forward/backward matmuls run in bf16 (params + features cast at the
    loss boundary — tpucap.train.loss.cast_floats), while the master
    params, optimizer state, and every loss reduction stay f32. No loss
    scaling is needed: bf16 keeps f32's exponent range, the reason it is
    the TPU training dtype (TrainConfig.precision)."""
    from tpucap.train.loss import (
        loss_from_sums,
        warn_if_attention_reg_unused,
    )

    warn_if_attention_reg_unused(decoder, attention_reg)

    def loss_fn(params, features, tokens, rng, ss_eps, ss_rng):
        return caption_loss(
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

    def step(state: TrainState, features, tokens, ss_eps=None):
        if scheduled_sampling:
            rng, dropout_rng, ss_rng = jax.random.split(state.rng, 3)
        else:
            rng, dropout_rng = jax.random.split(state.rng)
            ss_eps = ss_rng = None
        if grad_accum_steps > 1:
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
                # Scheduled sampling needs a key even in deterministic
                # (dropout-off) mode; sums_fn splits the folded key into
                # the coin key and the dropout key.
                ss_rng
                if scheduled_sampling
                else (None if deterministic else dropout_rng),
                steps=grad_accum_steps,
                use_reg=use_reg,
            )
            grads = normalized_accum_grads(
                g_nll, g_reg, sums, attention_reg=attention_reg
            )
            loss, metrics = loss_from_sums(
                sums, attention_reg=attention_reg
            )
        else:
            (loss, metrics), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params, features, tokens, dropout_rng, ss_eps, ss_rng)
        updates, opt_state = optimizer.update(
            grads, state.opt_state, state.params
        )
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            step=state.step + 1, params=params, opt_state=opt_state, rng=rng
        )
        return new_state, metrics

    if multi_steps > 1:

        def multi(state: TrainState, features, tokens, ss_eps=None):
            def body(st, xs):
                f, t = xs
                return step(st, f, t, ss_eps)

            state, ms = jax.lax.scan(body, state, (features, tokens))
            # Sum over the N per-step metric scalars; callers divide by
            # the step count (train_epoch / fit accumulate sums + n).
            return state, jax.tree_util.tree_map(
                lambda x: jnp.sum(x, axis=0), ms
            )

        return jax.jit(multi, donate_argnums=(0,) if donate else ())

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_eval_step(
    decoder,
    *,
    pad_id: int = 0,
    attention_reg: float = 0.0,
    label_smoothing: float = 0.0,
    compute_dtype=None,
) -> Callable:
    """val_loss uses the SAME objective as training (Keras evaluates with
    the compiled loss): label smoothing and the attention regularizer both
    count, so best-checkpoint keying and early stopping monitor the
    quantity being optimized."""

    @jax.jit
    def step(params, features, tokens):
        _, metrics = caption_loss(
            decoder,
            params,
            features,
            tokens,
            deterministic=True,
            pad_id=pad_id,
            attention_reg=attention_reg,
            label_smoothing=label_smoothing,
            compute_dtype=compute_dtype,
        )
        return metrics

    return step


def make_eval_sums_step(
    decoder,
    *,
    pad_id: int = 0,
    attention_reg: float = 0.0,
    label_smoothing: float = 0.0,
    compute_dtype=None,
) -> Callable:
    """Sum-form eval pieces for one fixed-shape chunk. Accumulate the
    returned dicts across chunks and normalize once with
    :func:`tpucap.train.loss.loss_from_sums` — chunked evaluation is then
    EXACTLY the loss over the whole set (zero-padded tail rows contribute
    nothing to any sum), without materializing an (N, T, V) logits tensor
    for the full split in one device program."""
    from tpucap.train.loss import caption_loss_sums

    @jax.jit
    def step(params, features, tokens):
        return caption_loss_sums(
            decoder,
            params,
            features,
            tokens,
            deterministic=True,
            pad_id=pad_id,
            attention_reg=attention_reg,
            label_smoothing=label_smoothing,
            compute_dtype=compute_dtype,
        )

    return step


def train_epoch(
    step_fn,
    state: TrainState,
    batches,
    *,
    log_every: int = 0,
    logger=None,
) -> tuple[TrainState, dict]:
    """Drive one epoch over an iterable of (features, tokens) host batches."""
    totals: dict = {}
    n = 0
    t0 = time.perf_counter()
    for features, tokens in batches:
        state, metrics = step_fn(state, features, tokens)
        n += 1
        # Accumulate on device: a per-step device_get would block async
        # dispatch (one host round-trip per step — ~8x slower on the
        # remote-TPU setup); only log_every (user-opted) and the epoch
        # end synchronize.
        for k, v in metrics.items():
            totals[k] = totals.get(k, 0.0) + v
        if log_every and logger is not None and n % log_every == 0:
            host = jax.device_get(metrics)
            logger.log(
                {
                    "step": int(jax.device_get(state.step)),
                    **{k: float(v) for k, v in host.items()},
                }
            )
    totals = jax.device_get(totals)
    elapsed = time.perf_counter() - t0
    avg = {k: float(v) / max(n, 1) for k, v in totals.items()}
    avg["steps"] = n
    avg["seconds"] = elapsed
    return state, avg
