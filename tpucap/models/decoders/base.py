"""Uniform decoder interface consumed by the decode engines.

The reference re-runs the full model per generated token (SURVEY.md §3.3 —
the O(L^2) hot-loop defect). The rebuild's contract is incremental: a decoder
is (init_state, step) where ``state`` is a pytree whose every leaf has a
leading batch axis, so the beam engine can tile/gather hypotheses with a
single ``tree_map``. Because the LSTM is recurrent and Keras masking skips
pre-padded zeros, running ``step`` incrementally over w1..wk produces exactly
the final hidden state the reference gets from re-encoding the padded prefix
— token-for-token identical decoding at O(L) cost.
"""

from __future__ import annotations

from typing import Any, Protocol

Params = Any
State = Any


class CaptionDecoder(Protocol):
    vocab_size: int

    def init(self, key) -> Params:
        """Create parameters."""

    def init_state(self, params: Params, features) -> State:
        """Build decode state from encoder features (B, ...).

        Every leaf of the returned pytree has leading dim B.
        """

    def step(self, params: Params, state: State, token) -> tuple[Any, State]:
        """One decode step: token (B,) int32 -> (logits (B, V), new state)."""

    def forward_train(
        self, params: Params, features, tokens, rng=None, deterministic=True
    ):
        """Teacher-forced forward: tokens (B, T) post-padded inputs ->
        logits (B, T, V) predicting the next token at each position."""
