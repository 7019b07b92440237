"""Adaptive attention caption decoder with a visual sentinel
(Lu et al. 2017, "Knowing When to Look").

Framework extra beyond the SAT family (SURVEY.md §2.1 #8 is Xu et
al.'s soft attention): at each step the model decides how much to
ground the next word in the image versus in the language model. An
LSTM extension distills a "visual sentinel" from the cell state:

    x_t      = [embed(w_t); v_g]             v_g = relu(W_b mean(V))
    h_t, c_t = LSTM(x_t, h_{t-1}, c_{t-1})
    g_t      = sigmoid(W_x x_t + W_h h_{t-1})   (sentinel gate)
    s_t      = g_t * tanh(c_t)                  (visual sentinel)

and attention runs over the L projected spatial positions PLUS the
sentinel:

    z_l  = w^T tanh(W_v v_l + W_g h_t)          (spatial scores)
    z_s  = w^T tanh(W_s s_t + W_g h_t)          (sentinel score)
    a    = softmax([z_1..z_L, z_s])             beta = a[L]
    c_t^ = sum_l a_l v_l + beta * s_t           (adaptive context)
    p    = softmax(W_o relu(W_p (c_t^ + h_t)))

beta -> 1 means "the language model knows this word" (of, the, a...);
beta -> 0 means "look at the image". The spatial grid is projected to
hidden_dim once per image (``val``, hoisted out of the decode loop like
SAT's key projection), so the sentinel/context algebra lives in one
shared d-space exactly as in the paper.

TPU notes mirror attention.py: every per-step op is batched matmul +
VPU elementwise (XLA fuses the attention MLP into the LSTM step's HBM
pass), and the beam engine keeps the per-image grids untiled
(``beam_shared_keys``) with ``_attend`` broadcasting over hypotheses.

The alphas surfaces return the EXTENDED distribution (B, T, L+1):
columns [:L] are the spatial weights (summing to 1-beta), column L is
beta — slice [:L] for grid overlays, read column L as the
"when to look" signal. With TrainConfig.attention_reg the
doubly-stochastic regularizer runs over this extended distribution
(documented divergence from SAT, where it covers exactly the grid).
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
class AdaptiveAttentionDecoder:
    vocab_size: int
    feature_dim: int  # channels D of the spatial grid (e.g. 512)
    embed_dim: int = 256
    hidden_dim: int = 256
    attention_dim: int = 256
    dropout_rate: float = 0.5

    # Per-image grids are identical across a beam's hypotheses; the beam
    # engine keeps them untiled and _attend infers the hypothesis count
    # from the shape ratio (attention.py's trick). ``glob`` is per-row
    # tiny (B, E) and IS tiled per hypothesis — deliberately not shared.
    beam_shared_keys = frozenset({"val", "att_feat"})

    def init(self, key):
        ks = jax.random.split(key, 14)
        in_dim = 2 * self.embed_dim  # [embed(w); v_g]
        return {
            "val": init_dense(ks[0], self.feature_dim, self.hidden_dim),
            "att_feat": init_dense(
                ks[1], self.hidden_dim, self.attention_dim
            ),
            "att_hidden": init_dense(
                ks[2], self.hidden_dim, self.attention_dim
            ),
            "att_sent": init_dense(
                ks[3], self.hidden_dim, self.attention_dim
            ),
            "att_score": init_dense(ks[4], self.attention_dim, 1),
            "global": init_dense(ks[5], self.feature_dim, self.embed_dim),
            "sent_x": init_dense(ks[6], in_dim, self.hidden_dim),
            "sent_h": init_dense(ks[7], self.hidden_dim, self.hidden_dim),
            "init_h": init_dense(ks[8], self.feature_dim, self.hidden_dim),
            "init_c": init_dense(ks[9], self.feature_dim, self.hidden_dim),
            "embedding": init_embedding(
                ks[10], self.vocab_size, self.embed_dim
            ),
            "cell": init_lstm_cell(ks[11], in_dim, self.hidden_dim),
            "pre_out": init_dense(
                ks[12], self.hidden_dim, self.hidden_dim
            ),
            "out": init_dense(ks[13], self.hidden_dim, self.vocab_size),
        }

    # -- decode interface ---------------------------------------------------

    def init_state(self, params, features, rng=None, deterministic=True):
        """features: (B, L, D) spatial grid (L = 14*14 = 196)."""
        if rng is not None and not deterministic:
            features = dropout(rng, features, self.dropout_rate, False)
        mean_feat = jnp.mean(features, axis=1)
        h = dense(params["init_h"], mean_feat, jnp.tanh)
        c = dense(params["init_c"], mean_feat, jnp.tanh)
        val = dense(params["val"], features)  # (B, L, H) value space
        att_feat = dense(params["att_feat"], val)  # (B, L, A) keys
        glob = dense(params["global"], mean_feat, jax.nn.relu)  # (B, E)
        return {
            "val": val,
            "att_feat": att_feat,
            "glob": glob,
            "h": h,
            "c": c,
        }

    def _attend(self, params, state, h, s):
        """Extended additive attention over [spatial grid; sentinel].
        Supports beam-shared grids: h/s are (B*k, H) while val/att_feat
        stay (B, L, *) and broadcast over the k hypotheses."""
        att_feat = state["att_feat"]  # (B, L, A)
        val = state["val"]  # (B, L, H)
        B = att_feat.shape[0]
        k = h.shape[0] // B  # static at trace time

        wh = dense(params["att_hidden"], h)  # (B*k, A)
        z_s = dense(
            params["att_score"],
            jnp.tanh(dense(params["att_sent"], s) + wh),
        )[..., 0]  # (B*k,)
        if k == 1:
            e = dense(
                params["att_score"], jnp.tanh(att_feat + wh[:, None, :])
            )[..., 0]  # (B, L)
            ext = jnp.concatenate([e, z_s[:, None]], axis=-1)
            alpha = jax.nn.softmax(ext, axis=-1)  # (B, L+1)
            ctx = jnp.einsum("bl,bld->bd", alpha[:, :-1], val)
        else:
            wh_k = wh.reshape(B, k, 1, -1)
            e = dense(
                params["att_score"],
                jnp.tanh(att_feat[:, None, :, :] + wh_k),
            )[..., 0]  # (B, k, L)
            ext = jnp.concatenate(
                [e, z_s.reshape(B, k, 1)], axis=-1
            )  # (B, k, L+1)
            alpha_bk = jax.nn.softmax(ext, axis=-1)
            ctx = jnp.einsum(
                "bkl,bld->bkd", alpha_bk[..., :-1], val
            ).reshape(B * k, -1)
            alpha = alpha_bk.reshape(B * k, -1)
        beta = alpha[:, -1:]  # (B*k, 1)
        return ctx + beta * s, alpha

    def _step_full(self, params, state, token):
        x = jnp.concatenate(
            [embed(params["embedding"], token), state["glob"]], axis=-1
        )
        gate = jax.nn.sigmoid(
            dense(params["sent_x"], x) + dense(params["sent_h"], state["h"])
        )
        h, c = lstm_cell_step(params["cell"], x, state["h"], state["c"])
        s = gate * jnp.tanh(c)
        ctx, alpha = self._attend(params, state, h, s)
        merged = dense(params["pre_out"], ctx + h, jax.nn.relu)
        new_state = {
            "val": state["val"],
            "att_feat": state["att_feat"],
            "glob": state["glob"],
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

    # -- training -------------------------------------------------------------

    def forward_hidden_with_alphas(
        self, params, features, tokens, rng=None, deterministic=True
    ):
        """-> (hidden (B, T, H) pre-projection, alphas (B, T, L+1) —
        the extended distribution, sentinel weight beta last)."""
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
        glob = state["glob"]
        static = {"val": state["val"], "att_feat": state["att_feat"]}

        def body(carry, x_t):
            h, c = carry
            x = jnp.concatenate([x_t, glob], axis=-1)
            gate = jax.nn.sigmoid(
                dense(params["sent_x"], x) + dense(params["sent_h"], h)
            )
            h, c = lstm_cell_step(params["cell"], x, h, c)
            s = gate * jnp.tanh(c)
            ctx, alpha = self._attend(params, static, h, s)
            merged = dense(params["pre_out"], ctx + h, jax.nn.relu)
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
        """-> (logits (B, T, V), alphas (B, T, L+1))."""
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
