"""Product-of-experts ensemble decoding.

The captioning genre's standard inference trick (the Show-and-Tell NIC
paper's headline numbers are 5-model ensembles; the reference genre
averages per-step distributions over checkpoints/seeds): at every
decode step each model scores the next token, and the ensemble
distribution is the weighted GEOMETRIC mean of the per-model softmaxes
— an arithmetic mean of log-probs, renormalized.

TPU-first shape: the composition happens INSIDE the jitted while_loop.
One fused program steps all M models (XLA schedules their matmuls
back-to-back on the MXU — no per-model dispatch or host round-trips)
and only the averaged (B, V) array feeds selection, so an ensemble
decode is ONE device program, not M.

The composed step satisfies the decode engines' step_fn contract
exactly, so greedy/beam/sample bookkeeping, min_len masking,
backpointers and length penalties apply unchanged. The returned
"logits" ARE the averaged log-probs: the engines' lazy-logsumexp
renormalization (decode/greedy.py, decode/beam.py) turns them into the
normalized PoE distribution, and because that per-row shift is
constant, selection (argmax / top-k) is identical either way.

Heterogeneous ensembles are supported (e.g. a merge LSTM + a SAT
attention model + a transformer): each model carries its own state
under an ``m{i}/`` prefix in one flat top-level dict, which keeps each
model's ``beam_shared_keys`` optimization intact (per-image constants
such as attention feature grids stay untiled across beam hypotheses).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp


class EnsembleDecoder:
    """Composes M decoders (uniform init_state/step interface,
    models/decoders/*) into one decoder-shaped object whose ``step``
    returns weighted-mean log-probs. ``params`` and ``features`` flow
    through as M-tuples; state is one flat dict keyed ``m{i}/{key}``
    (non-dict per-model states are stored whole under ``m{i}``).
    """

    def __init__(self, decoders: Sequence, weights=None):
        if not decoders:
            raise ValueError("ensemble needs at least one decoder")
        if weights is None:
            weights = [1.0] * len(decoders)
        if len(weights) != len(decoders):
            raise ValueError(
                f"{len(weights)} weights for {len(decoders)} decoders"
            )
        total = float(sum(weights))
        if total <= 0.0:
            raise ValueError("ensemble weights must sum to > 0")
        self.decoders = tuple(decoders)
        self.weights = tuple(float(w) / total for w in weights)
        # Per-model shared keys keep their k-fold HBM savings under the
        # flat prefix scheme (beam.py matches top-level dict keys).
        self.beam_shared_keys = frozenset(
            f"m{i}/{key}"
            for i, d in enumerate(self.decoders)
            for key in getattr(d, "beam_shared_keys", frozenset())
        )

    def init_state(self, params, features):
        """params/features: M-tuples (one per model) -> flat state dict."""
        flat = {}
        for i, (d, p, f) in enumerate(
            zip(self.decoders, params, features)
        ):
            st = d.init_state(p, f)
            if isinstance(st, dict):
                for k, v in st.items():
                    flat[f"m{i}/{k}"] = v
            else:
                flat[f"m{i}"] = st
        return flat

    def step(self, params, state, token):
        """Engine step_fn contract: (params, state, token) ->
        (weighted-mean log-probs (B, V) f32, new state)."""
        logp_sum = None
        new_flat = {}
        for i, (d, p) in enumerate(zip(self.decoders, params)):
            prefix = f"m{i}/"
            if f"m{i}" in state:  # non-dict per-model state
                sub = state[f"m{i}"]
            else:
                sub = {
                    k[len(prefix):]: v
                    for k, v in state.items()
                    if k.startswith(prefix)
                }
            with jax.named_scope(f"ensemble_model_{i}"):
                logits, ns = d.step(p, sub, token)
            logp = self.weights[i] * jax.nn.log_softmax(
                logits.astype(jnp.float32), axis=-1
            )
            logp_sum = logp if logp_sum is None else logp_sum + logp
            if isinstance(ns, dict):
                for k, v in ns.items():
                    new_flat[prefix + k] = v
            else:
                new_flat[f"m{i}"] = ns
        return logp_sum, new_flat
