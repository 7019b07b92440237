"""Merge and inject LSTM caption decoders (functional, TPU-first).

MergeDecoder reproduces the reference's `define_model` topology
(SURVEY.md §2.1 #6):

    image feat -> Dropout -> Dense(hidden, relu)            (fe branch)
    tokens     -> Embedding -> Dropout -> LSTM stack        (se branch)
    add(fe, se) -> Dense(hidden, relu) -> Dense(vocab)      (logits)

redesigned as an incremental step function: the merge head is applied at
every timestep during training (mathematically identical to the reference's
per-prefix sample construction — each prefix sample's CE term equals one
timestep's CE term here) and once per generated token at inference.

InjectDecoder (SURVEY.md §2.1 #7) instead maps the image feature to the
LSTM's initial (h, c) and decodes from tokens alone.

The 2-layer variants stack cells; layer l consumes layer l-1's hidden state.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from tpucap.models.layers import (
    dense,
    dropout,
    embed,
    init_dense,
    init_embedding,
    init_lstm_cell,
    lstm_cell_step,
)


def _stacked_step(cells, x, h, c):
    """Run the cell stack one step. h, c: (B, L, U)."""
    new_h, new_c = [], []
    for l, cell in enumerate(cells):
        hl, cl = lstm_cell_step(cell, x, h[:, l], c[:, l])
        new_h.append(hl)
        new_c.append(cl)
        x = hl
    return x, jnp.stack(new_h, axis=1), jnp.stack(new_c, axis=1)


@dataclasses.dataclass(frozen=True)
class MergeDecoder:
    vocab_size: int
    feature_dim: int
    embed_dim: int = 256
    hidden_dim: int = 256
    num_layers: int = 1
    dropout_rate: float = 0.5

    # -- params -------------------------------------------------------------

    def init(self, key):
        ks = jax.random.split(key, 4 + self.num_layers)
        cells = []
        in_dim = self.embed_dim
        for l in range(self.num_layers):
            cells.append(init_lstm_cell(ks[l], in_dim, self.hidden_dim))
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

    # -- decode interface -----------------------------------------------------

    def init_state(self, params, features, rng=None, deterministic=True):
        if rng is not None and not deterministic:
            features = dropout(rng, features, self.dropout_rate, False)
        fe = dense(params["feat_proj"], features, jax.nn.relu)
        B = fe.shape[0]
        zeros = jnp.zeros((B, self.num_layers, self.hidden_dim), fe.dtype)
        return {"fe": fe, "h": zeros, "c": zeros}

    def step_hidden(self, params, state, token):
        """Step up to (but excluding) the output projection — the seam the
        vocab-sharded tensor-parallel decode (tpucap.parallel.tp) projects
        through with a sharded kernel."""
        x = embed(params["embedding"], token)
        top, h, c = _stacked_step(params["cells"], x, state["h"], state["c"])
        merged = dense(params["pre_out"], state["fe"] + top, jax.nn.relu)
        return merged, {"fe": state["fe"], "h": h, "c": c}

    def step(self, params, state, token):
        hidden, new_state = self.step_hidden(params, state, token)
        return dense(params["out"], hidden), new_state

    # -- training ------------------------------------------------------------

    def forward_hidden(
        self, params, features, tokens, rng=None, deterministic=True
    ):
        """Teacher-forced hidden states before the output projection:
        (B, T) -> (B, T, H). The vocab-parallel train step
        (tpucap.parallel.tp) projects these through its sharded kernel."""
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

        def body(carry, x):
            h, c = carry
            top, h, c = _stacked_step(params["cells"], x, h, c)
            return (h, c), top

        xs_t = jnp.swapaxes(xs, 0, 1)
        _, tops = jax.lax.scan(body, (state["h"], state["c"]), xs_t)
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


@dataclasses.dataclass(frozen=True)
class InjectDecoder:
    vocab_size: int
    feature_dim: int
    embed_dim: int = 256
    hidden_dim: int = 256
    num_layers: int = 1
    dropout_rate: float = 0.5

    def init(self, key):
        ks = jax.random.split(key, 5 + self.num_layers)
        cells = []
        in_dim = self.embed_dim
        for l in range(self.num_layers):
            cells.append(init_lstm_cell(ks[l], in_dim, self.hidden_dim))
            in_dim = self.hidden_dim
        return {
            "init_h": init_dense(ks[-5], self.feature_dim, self.hidden_dim),
            "init_c": init_dense(ks[-4], self.feature_dim, self.hidden_dim),
            "embedding": init_embedding(
                ks[-3], self.vocab_size, self.embed_dim
            ),
            "cells": cells,
            "pre_out": init_dense(ks[-2], self.hidden_dim, self.hidden_dim),
            "out": init_dense(ks[-1], self.hidden_dim, self.vocab_size),
        }

    def init_state(self, params, features, rng=None, deterministic=True):
        if rng is not None and not deterministic:
            features = dropout(rng, features, self.dropout_rate, False)
        h0 = dense(params["init_h"], features, jnp.tanh)
        c0 = dense(params["init_c"], features, jnp.tanh)
        # Same injected state for every layer of the stack.
        h = jnp.repeat(h0[:, None, :], self.num_layers, axis=1)
        c = jnp.repeat(c0[:, None, :], self.num_layers, axis=1)
        return {"h": h, "c": c}

    def step_hidden(self, params, state, token):
        x = embed(params["embedding"], token)
        top, h, c = _stacked_step(params["cells"], x, state["h"], state["c"])
        return dense(params["pre_out"], top, jax.nn.relu), {"h": h, "c": c}

    def step(self, params, state, token):
        hidden, new_state = self.step_hidden(params, state, token)
        return dense(params["out"], hidden), new_state

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
        xs = embed(params["embedding"], tokens)
        if r_emb is not None:
            xs = dropout(r_emb, xs, self.dropout_rate, False)

        def body(carry, x):
            h, c = carry
            top, h, c = _stacked_step(params["cells"], x, h, c)
            return (h, c), top

        _, tops = jax.lax.scan(
            body, (state["h"], state["c"]), jnp.swapaxes(xs, 0, 1)
        )
        tops = jnp.swapaxes(tops, 0, 1)
        return dense(params["pre_out"], tops, jax.nn.relu)

    def forward_train(
        self, params, features, tokens, rng=None, deterministic=True
    ):
        hidden = self.forward_hidden(
            params, features, tokens, rng=rng, deterministic=deterministic
        )
        return dense(params["out"], hidden)
