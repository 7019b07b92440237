"""Knowledge distillation: train a small draft decoder to imitate a teacher.

Why this exists: speculative decoding (tpucap/decode/speculative.py) wins
in proportion to draft/target ARGMAX agreement — a draft trained only on
the ground-truth captions agrees with the teacher's greedy stream far less
often than one trained to match the teacher's own next-token distribution.
This module is the standard two-recipe answer:

- WORD-level KD (Hinton et al. 2015): soft-target KL between the teacher's
  and student's temperature-scaled next-token distributions on the
  teacher-forced prefixes, mixed with the hard-label CE via ``alpha``.
  The KL is scaled by T^2 (the classic correction, so the soft-gradient
  magnitude is temperature-invariant) and masked exactly like the CE
  (pad targets contribute nothing; sum form so DP shards psum-then-
  normalize to the exact single-device update).
- SEQUENCE-level KD (Kim & Rush 2016) lives in
  ``CaptioningPipeline.fit_distill(mode='sequence')``: the teacher greedy-
  decodes the training images and the student trains with ordinary CE on
  those pseudo-captions — maximal argmax agreement on the exact stream
  speculative decode will verify. It is plumbing over the existing fit
  loop, so only the word-level step lives here.

TPU-first design: teacher and student forwards run in ONE jitted program
(the teacher under ``stop_gradient`` — no backward through it, and XLA
shares the embedding/feature loads where it can); both logits tensors are
(B, T, V) so the KL rides the same fused softmax machinery as the CE; DP
uses the same shard_map/psum sum-space recipe as parallel/dp.py.

The reference has no distillation surface (its decode loops are host-side,
SURVEY.md §3.3/§3.4); this is a beyond-parity serving subsystem.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax
from jax.sharding import PartitionSpec as P
from jax import shard_map

from tpucap.train.loop import TrainState
from tpucap.train.loss import cast_floats, masked_cross_entropy_sums


def distill_loss_sums(
    teacher,
    student,
    teacher_params,
    student_params,
    features,
    tokens,
    *,
    temperature: float = 2.0,
    pad_id: int = 0,
    rng=None,
    deterministic: bool = False,
    compute_dtype=None,
):
    """Sum-form word-level KD pieces for one (local) batch.

    -> dict(kd_sum, nll_sum, tokens, correct, agree). ``kd_sum`` is
    T^2 * KL(softmax(t/T) || softmax(s/T)) summed over non-pad target
    positions; ``nll_sum``/``correct`` are the standard hard-label CE
    pieces of the STUDENT (tpucap.train.loss.masked_cross_entropy_sums);
    ``agree`` counts positions where student argmax == teacher argmax —
    the direct proxy for speculative-decode acceptance. Normalization by
    the (psum'd, under DP) token count happens in the caller, the same
    sum-space contract as caption_loss_sums.

    The teacher forward is deterministic (no dropout — it is the target
    distribution, not a training pass) and wrapped in ``stop_gradient``;
    only the student is differentiated. ``compute_dtype`` applies the
    mixed-precision boundary to BOTH forwards; all reductions stay f32.
    """
    teacher_params = cast_floats(teacher_params, compute_dtype)
    student_params = cast_floats(student_params, compute_dtype)
    features = cast_floats(features, compute_dtype)
    inputs = tokens[:, :-1]
    targets = tokens[:, 1:]

    t_logits = jax.lax.stop_gradient(
        teacher.forward_train(
            teacher_params, features, inputs, deterministic=True
        )
    )
    s_logits = student.forward_train(
        student_params, features, inputs, rng=rng, deterministic=deterministic
    )
    t32 = t_logits.astype(jnp.float32)
    s32 = s_logits.astype(jnp.float32)
    mask = (targets != pad_id).astype(jnp.float32)

    # Soft term: per-position KL between temperature-scaled distributions,
    # x T^2 (Hinton's gradient-scale correction). p log p is the teacher's
    # (constant) negative entropy — kept so the loss is a true KL (>= 0,
    # 0 iff the distributions match), which makes the metric readable;
    # its gradient w.r.t. the student is identical to cross-entropy's.
    t_logp = jax.nn.log_softmax(t32 / temperature, axis=-1)
    s_logp = jax.nn.log_softmax(s32 / temperature, axis=-1)
    p = jnp.exp(t_logp)
    kl = jnp.sum(p * (t_logp - s_logp), axis=-1)  # (B, T)
    kd_sum = jnp.sum(kl * mask) * (temperature**2)

    nll_sum, n_tokens, n_correct = masked_cross_entropy_sums(
        s_logits, targets, pad_id=pad_id
    )
    agree = jnp.sum(
        (jnp.argmax(s32, axis=-1) == jnp.argmax(t32, axis=-1)) * mask
    )
    return {
        "kd_sum": kd_sum,
        "nll_sum": nll_sum,
        "tokens": n_tokens,
        "correct": n_correct,
        "agree": agree,
    }


def distill_loss_from_sums(sums, *, alpha: float):
    """Normalize sum-form KD pieces -> (loss, metrics).

    loss = alpha * kd + (1 - alpha) * ce, both per-token means over the
    same mask — alpha=1 is pure soft-target imitation, alpha=0 reduces
    exactly to the standard caption CE (tested)."""
    denom = jnp.maximum(sums["tokens"], 1.0)
    kd = sums["kd_sum"] / denom
    ce = sums["nll_sum"] / denom
    loss = alpha * kd + (1.0 - alpha) * ce
    return loss, {
        "loss": loss,
        "kd": kd,
        "ce": ce,
        "accuracy": sums["correct"] / denom,
        "agreement": sums["agree"] / denom,
        "tokens": sums["tokens"],
    }


def make_distill_step(
    teacher,
    student,
    optimizer,
    *,
    temperature: float = 2.0,
    alpha: float = 0.5,
    pad_id: int = 0,
    deterministic: bool = False,
    compute_dtype=None,
    mesh=None,
    axis: str = "data",
    donate: bool = False,
) -> Callable:
    """-> jitted (state, teacher_params, features, tokens) -> (state, metrics).

    ``state`` is a TrainState over the STUDENT's decoder params; the
    teacher's params ride as a per-call argument (replicated under DP) so
    one compiled program serves any teacher snapshot. With ``mesh`` the
    batch shards over ``axis`` and the sum-form pieces psum before
    normalization — the DP update is exactly the single-device update on
    the concatenated batch (same contract, and test, as
    parallel/dp.py::make_dp_train_step).
    """

    def local_loss(s_params, t_params, features, tokens, rng):
        sums = distill_loss_sums(
            teacher,
            student,
            t_params,
            s_params,
            features,
            tokens,
            temperature=temperature,
            pad_id=pad_id,
            rng=rng,
            deterministic=deterministic,
            compute_dtype=compute_dtype,
        )
        if mesh is not None:
            sums = jax.tree_util.tree_map(
                lambda s: jax.lax.psum(s, axis), sums
            )
        return distill_loss_from_sums(sums, alpha=alpha)

    def body(state: TrainState, t_params, features, tokens):
        rng, dropout_rng = jax.random.split(state.rng)
        if mesh is not None:
            dropout_rng = jax.random.fold_in(
                dropout_rng, jax.lax.axis_index(axis)
            )
        (_, metrics), grads = jax.value_and_grad(
            local_loss, has_aux=True
        )(state.params, t_params, features, tokens, dropout_rng)
        if mesh is not None:
            # Same AD-transpose argument as dp.py: the forward psum makes
            # each shard's grad N x its local contribution; pmean restores
            # exactly the single-device gradient.
            grads = jax.lax.pmean(grads, axis)
        updates, opt_state = optimizer.update(
            grads, state.opt_state, state.params
        )
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            step=state.step + 1, params=params, opt_state=opt_state, rng=rng
        )
        return new_state, metrics

    if mesh is None:
        return jax.jit(body, donate_argnums=(0,) if donate else ())
    sharded = shard_map(
        body,
        mesh=mesh,
        in_specs=(P(), P(), P(axis), P(axis)),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(0,) if donate else ())
