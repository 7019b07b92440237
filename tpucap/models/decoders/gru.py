"""Merge-topology GRU caption decoder (beyond-parity family).

The reference's decoder zoo is LSTM-based (SURVEY.md §2.1 #6-7); the
captioning genre's common cheaper variant swaps the recurrence for a GRU
(3 gates instead of 4 — 25% less recurrent compute and 2/3 the carried
state, no cell vector). Same merge topology as lstm.MergeDecoder:

    image feat -> Dropout -> Dense(hidden, relu)            (fe branch)
    tokens     -> Embedding -> Dropout -> GRU stack         (se branch)
    add(fe, se) -> Dense(hidden, relu) -> Dense(vocab)      (logits)

Cell numerics are Keras GRU-v2 (reset_after=True, gate order z/r/h),
pinned differentially against tf_keras in tests/test_gru.py, so a GRU
trained elsewhere in Keras drops in weight-for-weight. Exposes the
uniform decoder interface (init_state/step_hidden/step/forward_hidden/
forward_train), so every decode engine (greedy/beam/sample/diverse/
ensemble/continuous), the TP vocab-sharded head, and the training
stack drive it unchanged.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from tpucap.models.layers import (
    dense,
    dropout,
    embed,
    gru_cell_step,
    init_dense,
    init_embedding,
    init_gru_cell,
)


def _stacked_gru_step(cells, x, h):
    """Run the GRU stack one step. h: (B, L, U)."""
    new_h = []
    for l, cell in enumerate(cells):
        hl = gru_cell_step(cell, x, h[:, l])
        new_h.append(hl)
        x = hl
    return x, jnp.stack(new_h, axis=1)


@dataclasses.dataclass(frozen=True)
class GruMergeDecoder:
    vocab_size: int
    feature_dim: int
    embed_dim: int = 256
    hidden_dim: int = 256
    num_layers: int = 1
    dropout_rate: float = 0.5

    def init(self, key):
        ks = jax.random.split(key, 4 + self.num_layers)
        cells = []
        in_dim = self.embed_dim
        for l in range(self.num_layers):
            cells.append(init_gru_cell(ks[l], in_dim, self.hidden_dim))
            in_dim = self.hidden_dim
        return {
            "feat_proj": init_dense(
                ks[-4], self.feature_dim, self.hidden_dim
            ),
            "embedding": init_embedding(
                ks[-3], self.vocab_size, self.embed_dim
            ),
            "cells": cells,
            "pre_out": init_dense(ks[-2], self.hidden_dim, self.hidden_dim),
            "out": init_dense(ks[-1], self.hidden_dim, self.vocab_size),
        }

    # -- decode interface ----------------------------------------------------

    def init_state(self, params, features, rng=None, deterministic=True):
        if rng is not None and not deterministic:
            features = dropout(rng, features, self.dropout_rate, False)
        fe = dense(params["feat_proj"], features, jax.nn.relu)
        B = fe.shape[0]
        h = jnp.zeros((B, self.num_layers, self.hidden_dim), fe.dtype)
        return {"fe": fe, "h": h}

    def step_hidden(self, params, state, token):
        """Step up to (but excluding) the output projection — the TP
        vocab-sharded seam (tpucap.parallel.tp), same contract as
        MergeDecoder.step_hidden."""
        x = embed(params["embedding"], token)
        top, h = _stacked_gru_step(params["cells"], x, state["h"])
        merged = dense(params["pre_out"], state["fe"] + top, jax.nn.relu)
        return merged, {"fe": state["fe"], "h": h}

    def step(self, params, state, token):
        hidden, new_state = self.step_hidden(params, state, token)
        return dense(params["out"], hidden), new_state

    # -- training --------------------------------------------------------------

    def forward_hidden(
        self, params, features, tokens, rng=None, deterministic=True
    ):
        if rng is not None and not deterministic:
            r_feat, r_emb = jax.random.split(rng)
        else:
            r_feat = r_emb = None
        state = self.init_state(
            params, features, rng=r_feat, deterministic=deterministic
        )
        xs = embed(params["embedding"], tokens)  # (B, T, E)
        if r_emb is not None:
            xs = dropout(r_emb, xs, self.dropout_rate, False)

        def body(h, x):
            top, h = _stacked_gru_step(params["cells"], x, h)
            return h, top

        _, tops = jax.lax.scan(body, state["h"], jnp.swapaxes(xs, 0, 1))
        tops = jnp.swapaxes(tops, 0, 1)  # (B, T, U)
        return dense(
            params["pre_out"], state["fe"][:, None, :] + tops, jax.nn.relu
        )

    def forward_train(
        self, params, features, tokens, rng=None, deterministic=True
    ):
        """tokens (B, T) post-padded input ids -> logits (B, T, V)."""
        hidden = self.forward_hidden(
            params, features, tokens, rng=rng, deterministic=deterministic
        )
        return dense(params["out"], hidden)
