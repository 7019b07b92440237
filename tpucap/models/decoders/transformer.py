"""Transformer caption decoder with an incremental KV cache (TPU-first).

The reference's decoder families are all LSTM-based (SURVEY.md §2.1 #6-8);
this family goes beyond parity: a pre-LN causal Transformer decoder that
cross-attends over the encoder features — the modern counterpart of the
Show-Attend-Tell soft-attention decoder, and a much better fit for the MXU
(every hot op is a batched matmul; no sequential gate recurrence).

Decode interface (models/decoders/base.py): state carries

- ``mem_k`` / ``mem_v``: per-layer cross-attention K/V computed ONCE from
  the image features in ``init_state`` and never updated — declared in
  ``beam_shared_keys`` so the beam engine keeps one copy per image instead
  of one per hypothesis (k-fold less HBM traffic, same trick as the
  attention decoder's feature grids).
- ``cache_k`` / ``cache_v``: the causal self-attention KV cache,
  (B, L, max_positions, heads, head_dim), written at each lane's own
  ``pos`` — per-row positions, so the continuous-batching engines (which
  host lanes at different generation depths in one state) work unchanged.
- ``pos``: (B,) int32 per-lane write position.

Incremental stepping is mathematically identical to the full causal forward
(causal attention at step t sees exactly positions <= t either way), so the
greedy/beam engines' token-exact oracle contracts apply to this family too
(tests/test_transformer_decoder.py).

TP seam: like the LSTM families, the final vocab projection lives in
``params["out"]`` and ``step_hidden``/``forward_hidden`` stop before it, so
the vocab-sharded tensor-parallel engines (tpucap.parallel.tp) drive this
decoder without modification.
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
    init_layer_norm,
    layer_norm,
    merge_heads as _merge_heads,
    sdpa as _sdpa,
    split_heads as _split_heads,
)


@dataclasses.dataclass(frozen=True)
class TransformerDecoder:
    vocab_size: int
    feature_dim: int
    hidden_dim: int = 256  # d_model; also the embedding width
    num_layers: int = 2
    num_heads: int = 4
    mlp_dim: int = 1024
    max_positions: int = 40  # positional table + KV-cache capacity
    dropout_rate: float = 0.1
    # Mixture-of-experts MLP (opt-in, beyond parity): 0 = dense MLP;
    # >0 replaces every layer's MLP with num_experts experts and a
    # top-k-routed combine. Dense dispatch — every expert runs on every
    # token as one stacked (E, H, M) einsum, gates zero the non-chosen
    # ones — which is the MXU-shaped formulation at captioning scale:
    # static shapes, no sort/scatter, and the expert axis shards over a
    # mesh ('expert' axis, parallel/ep.py) with a single psum combine.
    num_experts: int = 0
    moe_top_k: int = 2

    # Cross-attention K/V are per-image constants — the beam engine keeps
    # them untiled across a beam's hypotheses (decode/beam._shared_keys).
    beam_shared_keys = frozenset({"mem_k", "mem_v"})

    def __post_init__(self):
        if self.num_layers < 1:
            raise ValueError(f"num_layers must be >= 1, got {self.num_layers}")
        if self.hidden_dim % self.num_heads:
            raise ValueError(
                f"hidden_dim {self.hidden_dim} not divisible by "
                f"num_heads {self.num_heads}"
            )
        if self.num_experts and not (
            1 <= self.moe_top_k <= self.num_experts
        ):
            raise ValueError(
                f"moe_top_k {self.moe_top_k} must be in "
                f"[1, num_experts={self.num_experts}]"
            )

    @property
    def head_dim(self) -> int:
        return self.hidden_dim // self.num_heads

    # -- params -------------------------------------------------------------

    def init(self, key):
        H, M = self.hidden_dim, self.mlp_dim
        n_layer_keys = 9
        ks = jax.random.split(key, 4 + self.num_layers * n_layer_keys)
        layers = []
        for l in range(self.num_layers):
            k = ks[4 + l * n_layer_keys : 4 + (l + 1) * n_layer_keys]
            layer = {
                "ln1": init_layer_norm(H),
                # One fused H -> 3H projection (not separate q/k/v):
                # the decode step is launch-bound at M=1, so fewer,
                # larger matmuls are the win (docs/PERF.md).
                "qkv": init_dense(k[0], H, 3 * H),
                "o": init_dense(k[3], H, H),
                "ln2": init_layer_norm(H),
                "xq": init_dense(k[4], H, H),
                "xk": init_dense(k[5], H, H),
                "xv": init_dense(k[6], H, H),
                "xo": init_dense(k[7], H, H),
                "ln3": init_layer_norm(H),
            }
            if self.num_experts:
                E = self.num_experts
                k_in = jax.random.split(
                    jax.random.fold_in(k[8], 3), E
                )
                k_out = jax.random.split(
                    jax.random.fold_in(k[8], 4), E
                )
                layer["router"] = init_dense(
                    jax.random.fold_in(k[8], 2), H, E
                )
                # Per-expert weights stacked on a leading (E, ...) axis —
                # the axis parallel/ep.py shards over the expert mesh axis.
                layer["moe_in"] = jax.tree_util.tree_map(
                    lambda *xs: jnp.stack(xs),
                    *[init_dense(k_in[e], H, M) for e in range(E)],
                )
                layer["moe_out"] = jax.tree_util.tree_map(
                    lambda *xs: jnp.stack(xs),
                    *[init_dense(k_out[e], M, H) for e in range(E)],
                )
            else:
                layer["mlp_in"] = init_dense(k[8], H, M)
                layer["mlp_out"] = init_dense(
                    jax.random.fold_in(k[8], 1), M, H
                )
            layers.append(layer)
        return {
            "embedding": init_embedding(ks[0], self.vocab_size, H),
            "pos_embedding": 0.02
            * jax.random.normal(ks[1], (self.max_positions, H)),
            "mem_proj": init_dense(ks[2], self.feature_dim, H),
            "layers": layers,
            "ln_f": init_layer_norm(H),
            "out": init_dense(ks[3], H, self.vocab_size),
        }

    # -- shared pieces --------------------------------------------------------

    def project_memory(self, params, features):
        """features (B, D) pooled or (B, Lm, D) spatial -> (B, Lm, H)
        shared memory (the mem_proj projection every layer's cross-attention
        keys/values are computed from). Exposed separately so the
        pipeline-parallel step (parallel/pp.py) can compute each stage's
        own layers' K/V locally from replicated features."""
        if features.ndim == 2:
            features = features[:, None, :]
        return dense(params["mem_proj"], features)

    def layer_memory(self, layer, mem):
        """One layer's cross-attention K/V from the shared memory:
        mem (B, Lm, H) -> (mem_k_l, mem_v_l) each (B, Lm, heads, head_dim)."""
        return (
            _split_heads(dense(layer["xk"], mem), self.num_heads),
            _split_heads(dense(layer["xv"], mem), self.num_heads),
        )

    def _memory(self, params, features):
        """Project features to per-layer cross-attention K/V.

        features (B, D) pooled or (B, Lm, D) spatial; returns mem_k/mem_v
        (B, num_layers, Lm, heads, head_dim). Hoisted out of the decode
        loop: computed once per image in init_state / once per batch in
        forward_hidden.
        """
        mem = self.project_memory(params, features)  # (B, Lm, H)
        kv = [self.layer_memory(layer, mem) for layer in params["layers"]]
        mem_k = jnp.stack([k for k, _ in kv], axis=1)
        mem_v = jnp.stack([v for _, v in kv], axis=1)
        return mem_k, mem_v

    def _cross_attend(self, layer, x, mem_k_l, mem_v_l):
        """Cross-attention block with beam-shared memory: x (Bq, Q, H) while
        mem is (Bm, Lm, h, d); when Bq = Bm*k the per-image memory
        broadcasts over the k hypotheses instead of being tiled (same
        shape-ratio trick as AttentionDecoder._attend).

        Returns ``(out, alpha)`` — alpha (Bq, Q, Lm) float32 is the
        head-averaged cross-attention distribution (sums to 1 over Lm);
        callers that don't need it drop it.
        """
        h2 = layer_norm(layer["ln2"], x)
        qx = _split_heads(dense(layer["xq"], h2), self.num_heads)
        Bq, Bm = qx.shape[0], mem_k_l.shape[0]
        scale = 1.0 / float(self.head_dim) ** 0.5
        Lm = mem_k_l.shape[1]
        if Bq == Bm:
            mask = jnp.ones((Bq, qx.shape[1], Lm), bool)
            ctx, w = _sdpa(qx, mem_k_l, mem_v_l, mask, scale)
        else:
            k = Bq // Bm
            qx = qx.reshape((Bm, k) + qx.shape[1:])
            mask = jnp.ones((Bm, k, qx.shape[2], Lm), bool)
            ctx, w = _sdpa(
                qx, mem_k_l[:, None], mem_v_l[:, None], mask, scale
            )
            ctx = ctx.reshape((Bq,) + ctx.shape[2:])
            w = w.reshape((Bq,) + w.shape[2:])
        out = x + dense(layer["xo"], _merge_heads(ctx))
        return out, w.mean(axis=-3)

    def _mlp_block(self, layer, h, expert_axis=None, data_axis=None):
        """Post-LN MLP: dense or mixture-of-experts, per config.

        h (..., H) -> (y (..., H), aux) where aux is the scalar MoE
        load-balance loss (0.0 for the dense MLP)."""
        if not self.num_experts:
            y = dense(layer["mlp_out"], dense(layer["mlp_in"], h, jax.nn.gelu))
            return y, jnp.zeros((), jnp.float32)
        return self._moe_mlp(layer, h, expert_axis, data_axis)

    def _moe_mlp(self, layer, h, expert_axis=None, data_axis=None):
        """Top-k-routed mixture-of-experts MLP, dense dispatch.

        Every expert runs on every token as ONE stacked einsum over the
        (E, H, M) weight stack — static shapes, no sort/scatter/all-to-all,
        exactly the formulation the MXU wants at captioning scale (E is
        small; the flops "wasted" on unchosen experts are cheaper than a
        dynamic dispatch on this hardware). The router's top-k gates are
        renormalized and zero the rest. ``expert_axis`` switches on expert
        parallelism: the stacked weights arrive sharded (leading E axis
        partitioned by shard_map, parallel/ep.py), each device computes its
        local experts' contribution and a single psum over ICI combines —
        numerically identical to the single-device sum over experts.

        aux is the Switch-Transformer load-balance loss
        E * sum_e f_e * P_e (f_e = fraction of top-k routings to expert e,
        P_e = mean router probability) — replicated under EP because the
        router is replicated, so no collective is needed for it.
        """
        E, K = self.num_experts, self.moe_top_k
        logits = dense(layer["router"], h)  # (..., E)
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        _, top_idx = jax.lax.top_k(probs, K)  # (..., K)
        sel = jax.nn.one_hot(top_idx, E, dtype=probs.dtype).sum(-2)
        kept = probs * sel
        gates = kept / jnp.sum(kept, axis=-1, keepdims=True)  # (..., E)

        lead = tuple(range(probs.ndim - 1))
        f = jnp.mean(sel / K, axis=lead)  # (E,)
        P = jnp.mean(probs, axis=lead)  # (E,)
        if data_axis is not None:
            # The aux is NONLINEAR in the token means (sum_e f_e * P_e),
            # so under a batch-sharded mesh the means must be globalized
            # BEFORE the product — averaging per-shard aux values is not
            # the full-batch aux (equal shard sizes make pmean exact).
            f = jax.lax.pmean(f, data_axis)
            P = jax.lax.pmean(P, data_axis)
        aux = E * jnp.sum(f * P)

        w_in, b_in = layer["moe_in"]["kernel"], layer["moe_in"]["bias"]
        w_out, b_out = layer["moe_out"]["kernel"], layer["moe_out"]["bias"]
        g = gates.astype(h.dtype)
        if expert_axis is not None:
            e_local = w_in.shape[0]
            off = jax.lax.axis_index(expert_axis) * e_local
            g = jax.lax.dynamic_slice_in_dim(g, off, e_local, axis=-1)
        act = jax.nn.gelu(
            jnp.einsum("...h,ehm->...em", h, w_in) + b_in
        )
        out_e = jnp.einsum("...em,emh->...eh", act, w_out) + b_out
        y = jnp.einsum("...eh,...e->...h", out_e, g)
        if expert_axis is not None:
            y = jax.lax.psum(y, expert_axis)
        return y, aux

    def layer_train(
        self,
        layer,
        x,
        mem_k_l,
        mem_v_l,
        causal,
        r_attn=None,
        r_mlp=None,
        expert_axis=None,
        data_axis=None,
        self_attention=None,
    ):
        """One teacher-forced decoder layer: causal self-attention +
        cross-attention + MLP, pre-LN residuals. x (B, T, H) ->
        (x', alpha, moe_aux) with alpha (B, T, Lm) the layer's
        head-averaged cross-attention and moe_aux the scalar MoE
        load-balance piece (0.0 for dense-MLP configs).

        The single source of the layer math: ``_forward_with_alpha`` loops
        it over ``params['layers']``, the pipeline-parallel step
        (parallel/pp.py) runs each stage's slice of layers through it, the
        expert-parallel step (parallel/ep.py) passes ``expert_axis``, and
        the sequence-parallel step (parallel/sp.py) overrides
        ``self_attention`` with ring attention — bit-identical numerics
        every way. ``self_attention``: optional ``(q, k, v, scale) -> ctx``
        (each (B, T, heads, head_dim)) replacing the local causal sdpa;
        the override owns its causal masking and ``causal`` is ignored."""
        H = self.hidden_dim
        scale = 1.0 / float(self.head_dim) ** 0.5
        h1 = layer_norm(layer["ln1"], x)
        qkv = dense(layer["qkv"], h1)  # (B, T, 3H)
        q = _split_heads(qkv[..., :H], self.num_heads)
        k = _split_heads(qkv[..., H : 2 * H], self.num_heads)
        v = _split_heads(qkv[..., 2 * H :], self.num_heads)
        if self_attention is None:
            ctx, _ = _sdpa(q, k, v, causal, scale)
        else:
            ctx = self_attention(q, k, v, scale)
        attn = dense(layer["o"], _merge_heads(ctx))
        if r_attn is not None:
            attn = dropout(r_attn, attn, self.dropout_rate, False)
        x = x + attn
        x, alpha = self._cross_attend(layer, x, mem_k_l, mem_v_l)
        h3 = layer_norm(layer["ln3"], x)
        mlp, aux = self._mlp_block(layer, h3, expert_axis, data_axis)
        if r_mlp is not None:
            mlp = dropout(r_mlp, mlp, self.dropout_rate, False)
        return x + mlp, alpha, aux

    # -- decode interface ------------------------------------------------------

    def init_state(self, params, features, rng=None, deterministic=True):
        if rng is not None and not deterministic:
            features = dropout(rng, features, self.dropout_rate, False)
        mem_k, mem_v = self._memory(params, features)
        B = mem_k.shape[0]
        shape = (
            B,
            self.num_layers,
            self.max_positions,
            self.num_heads,
            self.head_dim,
        )
        return {
            "mem_k": mem_k,
            "mem_v": mem_v,
            "cache_k": jnp.zeros(shape, mem_k.dtype),
            "cache_v": jnp.zeros(shape, mem_k.dtype),
            "pos": jnp.zeros((B,), jnp.int32),
        }

    def step_hidden(self, params, state, token):
        pos = state["pos"]  # (Bq,) per-lane positions (continuous engines
        # host lanes at different depths; offline engines keep them equal)
        pos_c = jnp.clip(pos, 0, self.max_positions - 1)
        x = embed(params["embedding"], token) + params[
            "pos_embedding"
        ].astype(state["mem_k"].dtype)[pos_c]
        x = x[:, None, :]  # (Bq, 1, H)

        cache_k, cache_v = state["cache_k"], state["cache_v"]
        scale = 1.0 / float(self.head_dim) ** 0.5
        positions = jnp.arange(self.max_positions)
        # Key positions <= own pos are visible (the new token writes at pos).
        vis = positions[None, None, :] <= pos[:, None, None]  # (Bq, 1, T)
        # Per-lane cache write as a fused one-hot select, NOT a vmapped
        # dynamic_update_slice: batch-dependent slice indices lower to a
        # serialized scatter on TPU (measured ~8 ms/step at 768 lanes vs
        # ~0.3 ms of raw select traffic — the whole decode was 36x slower
        # than the LSTM family before this rewrite).
        write_here = (positions[None, :] == pos_c[:, None])[
            :, :, None, None
        ]  # (Bq, T, 1, 1)

        def write(cache_l, kv_new):
            return jnp.where(write_here, kv_new[:, None], cache_l)

        H = self.hidden_dim
        for l, layer in enumerate(params["layers"]):
            h1 = layer_norm(layer["ln1"], x)
            qkv = dense(layer["qkv"], h1[:, 0])  # (Bq, 3H)
            q = _split_heads(qkv[:, :H], self.num_heads)[:, None]
            k_new = _split_heads(qkv[:, H : 2 * H], self.num_heads)
            v_new = _split_heads(qkv[:, 2 * H :], self.num_heads)
            ck = write(cache_k[:, l], k_new)
            cv = write(cache_v[:, l], v_new)
            cache_k = cache_k.at[:, l].set(ck)
            cache_v = cache_v.at[:, l].set(cv)
            ctx, _ = _sdpa(q, ck, cv, vis, scale)
            x = x + dense(layer["o"], _merge_heads(ctx))
            x, _ = self._cross_attend(
                layer, x, state["mem_k"][:, l], state["mem_v"][:, l]
            )
            h3 = layer_norm(layer["ln3"], x)
            mlp, _ = self._mlp_block(layer, h3)
            x = x + mlp

        hidden = layer_norm(params["ln_f"], x[:, 0])
        new_state = {
            "mem_k": state["mem_k"],
            "mem_v": state["mem_v"],
            "cache_k": cache_k,
            "cache_v": cache_v,
            "pos": pos + 1,
        }
        return hidden, new_state

    def step(self, params, state, token):
        hidden, new_state = self.step_hidden(params, state, token)
        return dense(params["out"], hidden), new_state

    def step_chunk(self, params, state, tokens):
        """Process a chunk of C tokens per lane in ONE forward against the
        incremental KV cache: tokens (B, C) -> (logits (B, C, V), state')
        with each lane's ``pos`` advanced by C.

        This is the speculative-decoding verify step (decode/speculative.py)
        — the target model scores all gamma draft tokens plus its own bonus
        position in a single MXU-shaped forward instead of C sequential
        ``step`` calls — and doubles as a prefill primitive. Numerics are
        identical to C successive ``step_hidden`` calls: chunk K/V entries
        are written into the cache BEFORE attention, and visibility is
        position-based (key position <= own query position), so intra-chunk
        causality falls out of the same mask as cache history.

        Capacity contract: every lane must satisfy ``pos + C <=
        max_positions``. Positions are clipped as a safety net, but a
        clipped chunk would write two slots to one position (their K/V sum),
        so callers (the speculative engine via pipeline.generate_speculative)
        validate ``max_len + gamma <= max_positions`` up front.
        """
        pos = state["pos"]  # (B,) per-lane base positions
        C = tokens.shape[1]
        offs = jnp.arange(C)
        qpos = pos[:, None] + offs[None, :]  # (B, C)
        qpos_c = jnp.clip(qpos, 0, self.max_positions - 1)
        x = embed(params["embedding"], tokens) + params[
            "pos_embedding"
        ].astype(state["mem_k"].dtype)[qpos_c]  # (B, C, H)

        cache_k, cache_v = state["cache_k"], state["cache_v"]
        scale = 1.0 / float(self.head_dim) ** 0.5
        positions = jnp.arange(self.max_positions)
        # Query at chunk offset c sees key positions <= pos + c (its own
        # write position) — history and the chunk's causal prefix alike.
        vis = positions[None, None, :] <= qpos[:, :, None]  # (B, C, T)
        # Chunk writes as a one-hot placement (same rationale as
        # step_hidden: batch-dependent dynamic_update_slice lowers to a
        # serialized scatter on TPU). Slots land at distinct positions
        # under the capacity contract, so the einsum sum is a placement.
        write_onehot = positions[None, :, None] == qpos_c[:, None, :]
        any_write = write_onehot.any(axis=-1)[:, :, None, None]

        def write(cache_l, kv_new):
            placed = jnp.einsum(
                "btc,bchd->bthd",
                write_onehot.astype(kv_new.dtype),
                kv_new,
            )
            return jnp.where(any_write, placed, cache_l)

        H = self.hidden_dim
        for l, layer in enumerate(params["layers"]):
            h1 = layer_norm(layer["ln1"], x)
            qkv = dense(layer["qkv"], h1)  # (B, C, 3H)
            q = _split_heads(qkv[..., :H], self.num_heads)
            k_new = _split_heads(qkv[..., H : 2 * H], self.num_heads)
            v_new = _split_heads(qkv[..., 2 * H :], self.num_heads)
            ck = write(cache_k[:, l], k_new)
            cv = write(cache_v[:, l], v_new)
            cache_k = cache_k.at[:, l].set(ck)
            cache_v = cache_v.at[:, l].set(cv)
            ctx, _ = _sdpa(q, ck, cv, vis, scale)  # (B, C, h, d)
            x = x + dense(layer["o"], _merge_heads(ctx))
            x, _ = self._cross_attend(
                layer, x, state["mem_k"][:, l], state["mem_v"][:, l]
            )
            h3 = layer_norm(layer["ln3"], x)
            mlp, _ = self._mlp_block(layer, h3)
            x = x + mlp

        hidden = layer_norm(params["ln_f"], x)  # (B, C, H)
        new_state = {
            "mem_k": state["mem_k"],
            "mem_v": state["mem_v"],
            "cache_k": cache_k,
            "cache_v": cache_v,
            "pos": pos + C,
        }
        return dense(params["out"], hidden), new_state

    # -- training ------------------------------------------------------------

    def forward_hidden(
        self, params, features, tokens, rng=None, deterministic=True
    ):
        """Teacher-forced hidden states (B, T, H) before the vocab
        projection. Causal masking only: inputs are post-padded, so real
        query positions never see pad keys (pads come after) and padded
        query rows are dropped by the masked CE (train/loss.py)."""
        hidden, _, _ = self._forward_with_alpha(
            params, features, tokens, rng=rng, deterministic=deterministic
        )
        return hidden

    def _forward_with_alpha(
        self,
        params,
        features,
        tokens,
        rng=None,
        deterministic=True,
        expert_axis=None,
        data_axis=None,
    ):
        """Shared teacher-forced body -> (hidden, last-layer cross alpha,
        summed MoE load-balance aux — 0.0 for dense-MLP configs)."""
        B, T = tokens.shape
        if T > self.max_positions:
            raise ValueError(
                f"sequence length {T} exceeds max_positions "
                f"{self.max_positions}"
            )
        if rng is not None and not deterministic:
            r_feat, r_emb, r_layers = jax.random.split(rng, 3)
            features = dropout(r_feat, features, self.dropout_rate, False)
        else:
            r_emb = r_layers = None

        mem_k, mem_v = self._memory(params, features)
        x = embed(params["embedding"], tokens) + params["pos_embedding"][
            :T
        ].astype(mem_k.dtype)
        if r_emb is not None:
            x = dropout(r_emb, x, self.dropout_rate, False)

        causal = jnp.tril(jnp.ones((T, T), bool))[None]  # (1, T, T)

        aux_total = jnp.zeros((), jnp.float32)
        for l, layer in enumerate(params["layers"]):
            r_attn = r_mlp = None
            if r_layers is not None:
                r_attn = jax.random.fold_in(r_layers, 2 * l)
                r_mlp = jax.random.fold_in(r_layers, 2 * l + 1)
            x, alpha, aux = self.layer_train(
                layer,
                x,
                mem_k[:, l],
                mem_v[:, l],
                causal,
                r_attn,
                r_mlp,
                expert_axis=expert_axis,
                data_axis=data_axis,
            )
            aux_total = aux_total + aux

        return layer_norm(params["ln_f"], x), alpha, aux_total

    def forward_hidden_with_alphas(
        self, params, features, tokens, rng=None, deterministic=True
    ):
        """-> (hidden (B, T, H) pre-projection, alphas (B, T, Lm)).

        alphas is the LAST layer's cross-attention distribution over the
        Lm memory positions, averaged over heads — the transformer analog
        of the SAT decoder's soft-attention alphas (same visualization
        contract: each row sums to 1 over Lm; reshape Lm to the encoder
        grid for overlays). Last layer because its cross-attention feeds
        the vocab projection most directly; head-mean is the standard
        summary (per-head maps would be (B, T, h, Lm)).
        """
        hidden, alpha, _ = self._forward_with_alpha(
            params, features, tokens, rng=rng, deterministic=deterministic
        )
        return hidden, alpha.astype(jnp.float32)

    def forward_train(
        self, params, features, tokens, rng=None, deterministic=True
    ):
        """tokens (B, T) post-padded input ids -> logits (B, T, V)."""
        hidden = self.forward_hidden(
            params, features, tokens, rng=rng, deterministic=deterministic
        )
        return dense(params["out"], hidden)

    def forward_train_with_moe_aux(
        self,
        params,
        features,
        tokens,
        rng=None,
        deterministic=True,
        expert_axis=None,
        data_axis=None,
    ):
        """-> (logits (B, T, V), moe_aux scalar): the teacher-forced
        forward plus the summed Switch load-balance loss, for train steps
        that regularize routing (parallel/ep.py, or a single-device loop
        adding ``moe_aux_weight * aux`` to the CE). ``expert_axis`` runs
        the MoE blocks expert-parallel inside a shard_map body;
        ``data_axis`` globalizes the routing statistics when the batch is
        sharded (the aux is nonlinear in the token means)."""
        hidden, _, aux = self._forward_with_alpha(
            params,
            features,
            tokens,
            rng=rng,
            deterministic=deterministic,
            expert_axis=expert_axis,
            data_axis=data_axis,
        )
        return dense(params["out"], hidden), aux
