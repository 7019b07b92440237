"""Scheduled sampling: train on the model's own predictions.

Teacher forcing (SURVEY.md §2.1 #5 — the reference's only training
regime) conditions every step on gold history, so at inference time the
decoder sees its own (imperfect) prefix for the first time: exposure
bias. Scheduled sampling (Bengio et al. 2015) mixes the model's own
predictions into the training inputs with a probability that ramps up
over the run.

TPU-first formulation: the original algorithm samples sequentially —
step t's input depends on step t-1's *sampled* output, a data-dependent
recurrence that would serialize the transformer's parallel forward and
put a per-step host decision inside the hot loop. The rebuild uses the
PARALLEL two-pass form (Duckworth et al. 2019, "Parallel Scheduled
Sampling"):

    pass 1: one ordinary teacher-forced forward predicts every position
            (argmax, gradient-free)
    mix:    each input position t >= 1 is replaced by the model's own
            prediction for that position with probability eps
    pass 2: the ordinary loss forward runs on the mixed inputs against
            the UNCHANGED gold targets

Both passes are full parallel forwards (MXU-friendly, one program, no
sequential sampling loop), and the recipe is decoder-agnostic — every
family (LSTM/GRU/inject/attention/adaptive/transformer) trains through
its unchanged ``forward_train``. Divergence from Bengio's sequential
scheme, documented: pass-1 predictions are conditioned on the GOLD
prefix rather than on the mixed history (the one-pass approximation in
the Duckworth paper; their k-pass refinement is the obvious extension
seam).

Mixing rules (pinned by tests/test_scheduled_sampling.py):
- position 0 (startseq) is never replaced;
- pad inputs stay pad (mask_zero / masking semantics preserved, and the
  mixed sequence cannot grow past the caption's true length);
- eps == 0 reproduces plain teacher forcing EXACTLY (loss and
  gradients), because the mixed inputs equal the gold inputs.

eps is a *traced* scalar: the per-epoch schedule never retraces the
step. ``epsilon_for_epoch`` provides the standard ramps.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def scheduled_inputs(
    decoder, params, features, inputs, *, eps, rng, pad_id: int = 0
):
    """Mix the model's own first-pass predictions into teacher-forcing
    inputs. inputs (B, T) -> mixed (B, T).

    The prediction pass runs deterministic (no dropout — the model's
    "best guess" is what inference-time exposure looks like) and
    gradient-free: argmax is integer-valued, and the stop_gradient lets
    XLA drop the pass-1 backward graph entirely.
    """
    logits = decoder.forward_train(
        params, features, inputs, deterministic=True
    )
    preds = jnp.argmax(jax.lax.stop_gradient(logits), axis=-1)  # (B, T)
    # preds[:, t] estimates targets[:, t] == inputs[:, t+1]: the
    # candidate replacement for input position t+1 is preds[:, t].
    prev_pred = preds[:, :-1]
    tail = inputs[:, 1:]
    coin = jax.random.bernoulli(rng, eps, tail.shape)
    # A replacement also requires the PREDICTION to be a real word:
    # index pad_id is reserved (never a word — tokenizer contract), but
    # the head has a column for it, so an early-training argmax can emit
    # it; injecting it would fabricate a mid-sequence pad and corrupt
    # the masking semantics downstream.
    replace = coin & (tail != pad_id) & (prev_pred != pad_id)
    mixed_tail = jnp.where(replace, prev_pred, tail)
    return jnp.concatenate([inputs[:, :1], mixed_tail], axis=1)


def epsilon_for_epoch(
    epoch: int,
    total_epochs: int,
    *,
    max_eps: float,
    schedule: str = "linear",
    k: float = 5.0,
) -> float:
    """Host-side per-epoch sampling probability.

    - ``linear``: 0 at epoch 0 ramping to ``max_eps`` at the last epoch
      (the curriculum: early epochs are pure teacher forcing).
    - ``inv_sigmoid``: Bengio et al.'s inverse-sigmoid decay of the
      teacher-forcing probability, k/(k + exp(i/k)), turned into a
      sampling probability, normalized so epoch 0 is EXACTLY pure
      teacher forcing (the raw curve starts at 1/(k+1), not 0), and
      scaled by ``max_eps`` — an S-curve that stays small for the
      first ~k epochs and asymptotes to ``max_eps``.
    - ``constant``: ``max_eps`` from epoch 0.
    """
    if schedule == "constant":
        return float(max_eps)
    if schedule == "linear":
        return float(max_eps) * (epoch / max(total_epochs - 1, 1))
    if schedule == "inv_sigmoid":
        s = 1.0 - k / (k + math.exp(epoch / k))
        s0 = 1.0 / (k + 1.0)  # raw curve at epoch 0
        # max() absorbs float rounding at epoch 0 (s - s0 ~ -1e-16)
        return float(max_eps) * max(0.0, (s - s0) / (1.0 - s0))
    raise ValueError(
        f"unknown ss_schedule {schedule!r}; "
        "have linear|inv_sigmoid|constant"
    )
