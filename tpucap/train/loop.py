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


def make_train_step(
    decoder,
    optimizer,
    *,
    pad_id: int = 0,
    label_smoothing: float = 0.0,
    attention_reg: float = 0.0,
    deterministic: bool = False,
) -> Callable:
    """Single-device jit'd step: (state, features, tokens) -> (state, metrics)."""
    from tpucap.train.loss import warn_if_attention_reg_unused

    warn_if_attention_reg_unused(decoder, attention_reg)

    def loss_fn(params, features, tokens, rng):
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
        )

    @jax.jit
    def step(state: TrainState, features, tokens):
        rng, dropout_rng = jax.random.split(state.rng)
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, features, tokens, dropout_rng
        )
        updates, opt_state = optimizer.update(
            grads, state.opt_state, state.params
        )
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            step=state.step + 1, params=params, opt_state=opt_state, rng=rng
        )
        return new_state, metrics

    return step


def make_eval_step(
    decoder,
    *,
    pad_id: int = 0,
    attention_reg: float = 0.0,
    label_smoothing: float = 0.0,
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
        )
        return metrics

    return step


def make_eval_sums_step(
    decoder,
    *,
    pad_id: int = 0,
    attention_reg: float = 0.0,
    label_smoothing: float = 0.0,
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
