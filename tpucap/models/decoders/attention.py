"""Soft-attention caption decoder (Show, Attend and Tell; Xu et al. 2015).

The reference's attention variant attends over the encoder's pre-pool 14x14
conv feature map (SURVEY.md §2.1 #8). At each step:

    e_i = v^T tanh(W_f f_i + W_h h_{t-1})        (additive attention MLP)
    alpha = softmax(e)                            (B, L)
    ctx = sum_i alpha_i f_i                       (B, D)
    h_t, c_t = LSTM([embed(w_t); ctx], h, c)
    logits = W_o relu(W_p [h_t; ctx])

with a sigmoid gate beta = sigma(W_b h_{t-1}) scaling the context (the paper's
doubly-stochastic companion). ``forward_train_with_alphas`` also returns the
attention maps so the loss can add the doubly-stochastic regularizer
lambda * sum_i (1 - sum_t alpha_ti)^2.

TPU notes: W_f f_i is precomputed once per image in init_state (hoisted out
of the decode loop); all per-step math is batched matmul + VPU elementwise,
so XLA fuses the attention MLP into the LSTM step's HBM pass.
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


@dataclasses.dataclass(frozen=True)
class AttentionDecoder:
    vocab_size: int
    feature_dim: int  # channels D of the spatial grid (e.g. 512)
    embed_dim: int = 256
    hidden_dim: int = 256
    attention_dim: int = 256
    dropout_rate: float = 0.5

    # The feature grids are identical across a beam's hypotheses; the beam
    # engine keeps them untiled (k-fold less HBM traffic per attention
    # step) and _attend infers the hypothesis count from the shape ratio.
    beam_shared_keys = frozenset({"features", "att_feat"})

    def init(self, key):
        ks = jax.random.split(key, 10)
        return {
            "att_feat": init_dense(ks[0], self.feature_dim, self.attention_dim),
            "att_hidden": init_dense(
                ks[1], self.hidden_dim, self.attention_dim
            ),
            "att_score": init_dense(ks[2], self.attention_dim, 1),
            "gate": init_dense(ks[3], self.hidden_dim, self.feature_dim),
            "init_h": init_dense(ks[4], self.feature_dim, self.hidden_dim),
            "init_c": init_dense(ks[5], self.feature_dim, self.hidden_dim),
            "embedding": init_embedding(
                ks[6], self.vocab_size, self.embed_dim
            ),
            "cell": init_lstm_cell(
                ks[7], self.embed_dim + self.feature_dim, self.hidden_dim
            ),
            "pre_out": init_dense(
                ks[8], self.hidden_dim + self.feature_dim, self.hidden_dim
            ),
            "out": init_dense(ks[9], self.hidden_dim, self.vocab_size),
        }

    # -- decode interface ----------------------------------------------------

    def init_state(self, params, features, rng=None, deterministic=True):
        """features: (B, L, D) spatial grid (L = 14*14 = 196)."""
        if rng is not None and not deterministic:
            features = dropout(rng, features, self.dropout_rate, False)
        mean_feat = jnp.mean(features, axis=1)
        h = dense(params["init_h"], mean_feat, jnp.tanh)
        c = dense(params["init_c"], mean_feat, jnp.tanh)
        # Hoist W_f f out of the decode loop.
        att_feat = dense(params["att_feat"], features)  # (B, L, A)
        return {"features": features, "att_feat": att_feat, "h": h, "c": c}

    def _attend(self, params, state):
        """Additive attention. Supports beam-shared feature grids: when h is
        (B*k, H) but features are (B, L, D), the per-image grids broadcast
        over the k hypotheses instead of being materialized k times."""
        h = state["h"]
        att_feat = state["att_feat"]  # (B, L, A)
        features = state["features"]  # (B, L, D)
        B = att_feat.shape[0]
        k = h.shape[0] // B  # static at trace time

        wh = dense(params["att_hidden"], h)  # (B*k, A)
        if k == 1:
            e = dense(
                params["att_score"], jnp.tanh(att_feat + wh[:, None, :])
            )[..., 0]
            alpha = jax.nn.softmax(e, axis=-1)  # (B, L)
            ctx = jnp.einsum("bl,bld->bd", alpha, features)
        else:
            wh = wh.reshape(B, k, 1, -1)
            e = dense(
                params["att_score"],
                jnp.tanh(att_feat[:, None, :, :] + wh),
            )[..., 0]  # (B, k, L)
            alpha_bk = jax.nn.softmax(e, axis=-1)
            ctx = jnp.einsum("bkl,bld->bkd", alpha_bk, features).reshape(
                B * k, -1
            )
            alpha = alpha_bk.reshape(B * k, -1)
        beta = jax.nn.sigmoid(dense(params["gate"], h))
        return beta * ctx, alpha

    def _step_full(self, params, state, token):
        ctx, alpha = self._attend(params, state)
        x = jnp.concatenate([embed(params["embedding"], token), ctx], axis=-1)
        h, c = lstm_cell_step(params["cell"], x, state["h"], state["c"])
        merged = dense(
            params["pre_out"],
            jnp.concatenate([h, ctx], axis=-1),
            jax.nn.relu,
        )
        new_state = {
            "features": state["features"],
            "att_feat": state["att_feat"],
            "h": h,
            "c": c,
        }
        return merged, new_state, alpha

    def step_hidden(self, params, state, token):
        hidden, new_state, _ = self._step_full(params, state, token)
        return hidden, new_state

    def step(self, params, state, token):
        hidden, new_state, _ = self._step_full(params, state, token)
        return dense(params["out"], hidden), new_state

    # -- training --------------------------------------------------------------

    def forward_hidden_with_alphas(
        self, params, features, tokens, rng=None, deterministic=True
    ):
        """-> (hidden (B, T, H) pre-projection, alphas (B, T, L))."""
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

        static = {
            "features": state["features"],
            "att_feat": state["att_feat"],
        }

        def body(carry, x):
            h, c = carry
            st = dict(static, h=h, c=c)
            ctx, alpha = self._attend(params, st)
            inp = jnp.concatenate([x, ctx], axis=-1)
            h, c = lstm_cell_step(params["cell"], inp, h, c)
            merged = dense(
                params["pre_out"],
                jnp.concatenate([h, ctx], axis=-1),
                jax.nn.relu,
            )
            return (h, c), (merged, alpha)

        _, (hidden, alphas) = jax.lax.scan(
            body, (state["h"], state["c"]), jnp.swapaxes(xs, 0, 1)
        )
        return jnp.swapaxes(hidden, 0, 1), jnp.swapaxes(alphas, 0, 1)

    def forward_hidden(
        self, params, features, tokens, rng=None, deterministic=True
    ):
        hidden, _ = self.forward_hidden_with_alphas(
            params, features, tokens, rng=rng, deterministic=deterministic
        )
        return hidden

    def forward_train_with_alphas(
        self, params, features, tokens, rng=None, deterministic=True
    ):
        """-> (logits (B, T, V), alphas (B, T, L))."""
        hidden, alphas = self.forward_hidden_with_alphas(
            params, features, tokens, rng=rng, deterministic=deterministic
        )
        return dense(params["out"], hidden), alphas

    def forward_train(
        self, params, features, tokens, rng=None, deterministic=True
    ):
        logits, _ = self.forward_train_with_alphas(
            params, features, tokens, rng=rng, deterministic=deterministic
        )
        return logits
