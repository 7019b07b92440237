"""Tensor-parallel (vocab-sharded) beam decode.

The output projection (hidden x vocab — by far the decoder's largest matmul
and parameter) is column-sharded over a ``("model",)`` mesh axis
(SURVEY.md §2.4 "vocab-sharded output projection" extension seam): each
shard projects the shared hidden state onto its vocab slice, the global
logsumexp is assembled with pmax/psum over ICI, each shard takes a local
top-k, and the per-shard candidates are all_gathered (k per shard) and
merged — exact because the global top-k of a union equals the top-k of
per-shard top-k's, and the gather order (shard-major = ascending vocab
offset, index-ordered within shard) reproduces the single-device tie order.

Token-exact vs tpucap.decode.beam_decode on the virtual 8-device mesh —
tests/test_tp.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P

from tpucap.decode.beam import NEG_INF, beam_decode

MODEL_AXIS = "model"


def pad_vocab_params(params: dict, multiple: int):
    """Pad a decoder's vocab dimension (embedding rows + output projection
    columns) up to a multiple of the mesh's model-axis size so it shards
    evenly. Padded output columns get a -1e9 bias so they can never win a
    decode step; padded embedding rows are zeros and are never indexed.

    -> (padded params, new vocab size). No-op when already aligned.
    """
    if params["out"]["kernel"].dtype == jnp.int8:
        raise NotImplementedError(
            "vocab-sharded TP serving does not support an int8-quantized "
            "output projection (the per-channel kernel_scale would need "
            "sharding/padding too); serve a quantized head on a single "
            "device or with parallelism='dp'"
        )
    V = params["out"]["kernel"].shape[-1]
    pad = (-V) % multiple
    if pad == 0:
        return params, V
    out = dict(params)
    out["embedding"] = {
        "table": jnp.pad(params["embedding"]["table"], ((0, pad), (0, 0)))
    }
    out["out"] = {
        "kernel": jnp.pad(params["out"]["kernel"], ((0, 0), (0, pad))),
        "bias": jnp.concatenate(
            [
                params["out"]["bias"],
                jnp.full((pad,), -1e9, params["out"]["bias"].dtype),
            ]
        ),
    }
    return out, V + pad


def unpad_vocab_params(params: dict, vocab_size: int):
    """Inverse of :func:`pad_vocab_params`: slice the embedding rows and
    output-projection columns back to the true vocabulary. Exact — the
    padded columns carry -1e9 bias and are never selected, and padded
    embedding rows are never indexed. No-op when already at size."""
    V = params["out"]["kernel"].shape[-1]
    if V == vocab_size:
        return params
    if V < vocab_size:
        raise ValueError(
            f"params vocab {V} smaller than requested {vocab_size}"
        )
    out = dict(params)
    out["embedding"] = {
        "table": params["embedding"]["table"][:vocab_size]
    }
    out["out"] = {
        "kernel": params["out"]["kernel"][:, :vocab_size],
        "bias": params["out"]["bias"][:vocab_size],
    }
    return out


def make_tp_train_step(
    decoder,
    optimizer,
    mesh,
    *,
    axis: str = MODEL_AXIS,
    data_axis: str | None = None,
    pad_id: int = 0,
    deterministic: bool = False,
    label_smoothing: float = 0.0,
    true_vocab: int | None = None,
    compute_dtype=None,
    grad_accum_steps: int = 1,
    multi_steps: int = 1,
    donate: bool = False,
):
    """Vocab-parallel training step: each shard computes only its (B, T,
    V/p) logits slice from its columns of the (replicated) output kernel —
    the full (B, T, V) logits tensor, the dominant training activation, is
    never materialized on any one device. The cross-entropy is assembled
    with ICI collectives:

        lse      = pmax/psum two-pass logsumexp over vocab shards
        tgt_logit= psum of the shard that owns each target column
        nll      = lse - tgt_logit           (masked, sum-form, psum'd)

    ``label_smoothing`` keeps the Keras convention (uniform over ALL
    true classes, target included) without materializing logp: since
    sum_j logp_j = sum_j logit_j - V*lse, the smoothed nll collapses to
    ``lse - (1-ls)*tgt_logit - (ls/V) * sum_j logit_j`` — one extra
    psum of per-shard logit sums. ``true_vocab`` bounds that sum when
    the vocabulary was padded to shard evenly (pad_vocab_params gives
    padded columns a -1e9 bias: invisible to lse, catastrophic to a
    naive sum — so padded columns are masked out and ls/V uses the TRUE
    vocabulary size, matching the single-device step on unpadded
    params).

    Params and optimizer state stay replicated (this model's params are
    small; it's the activations that need sharding); dynamic-slice's
    transpose scatters each shard's kernel-slice gradient back into the
    full-size gradient, and the pmean reduction reconstructs exactly the
    single-device gradient (tests/test_tp.py::test_tp_train_matches).
    """
    from tpucap.train.loop import TrainState

    import optax

    n_shards = mesh.shape[axis]
    if decoder.vocab_size % n_shards:
        raise ValueError(
            f"vocab_size {decoder.vocab_size} not divisible by the "
            f"{n_shards}-way '{axis}' mesh axis; pad the vocabulary"
        )

    def raw_pieces(params, features, tokens, rng):
        """Sum-form CE pieces for a (data-local) batch or microbatch:
        -> (nll_sum, n_tokens, n_correct). The model-axis psums (lse /
        target logit / accuracy argmax) happen INSIDE; the data-axis
        psums and the 1/N normalization are the caller's — so the
        grad-accum path can accumulate raw sums and normalize once
        (the dp.py recipe)."""
        # Mixed-precision boundary (the caption_loss_sums recipe):
        # master params stay f32 outside; forward/backward matmuls run
        # in compute_dtype; every CE reduction below is already f32.
        from tpucap.train.loss import cast_floats

        params = cast_floats(params, compute_dtype)
        features = cast_floats(features, compute_dtype)
        inputs = tokens[:, :-1]
        targets = tokens[:, 1:]
        hidden = decoder.forward_hidden(
            params, features, inputs, rng=rng, deterministic=deterministic
        )  # (B, T, H)
        kernel = params["out"]["kernel"]
        bias = params["out"]["bias"]
        V = kernel.shape[-1]
        vl = V // n_shards
        my = jax.lax.axis_index(axis)
        off = my * vl
        k_local = jax.lax.dynamic_slice_in_dim(kernel, off, vl, axis=1)
        b_local = jax.lax.dynamic_slice_in_dim(bias, off, vl, axis=0)
        # Mirror models/layers.dense bit-for-bit per column (f32
        # accumulate, round to the activation dtype, add bias in that
        # dtype) then upcast for the lse math — exactly what the
        # single-device CE sees after dense + log_softmax's upcast.
        # Column slicing commutes with the dot, so each logit equals
        # the unsharded one.
        local = (
            jnp.dot(
                hidden, k_local, preferred_element_type=jnp.float32
            ).astype(hidden.dtype)
            + b_local.astype(hidden.dtype)
        ).astype(jnp.float32)  # (B, T, vl)

        # Stability max is gradient-free (standard logsumexp shift; also
        # pmax has no AD rule) — d lse/d local = softmax regardless of m.
        # stop_gradient BEFORE pmax so the collective sees a zero tangent
        # (pmax has no AD rule).
        m = jax.lax.pmax(
            jax.lax.stop_gradient(jnp.max(local, axis=-1)), axis
        )  # (B, T)
        s = jax.lax.psum(
            jnp.sum(jnp.exp(local - m[..., None]), axis=-1), axis
        )
        lse = m + jnp.log(s)

        is_local = (targets >= off) & (targets < off + vl)
        idx = jnp.clip(targets - off, 0, vl - 1)
        picked = jnp.take_along_axis(local, idx[..., None], axis=-1)[..., 0]
        tgt_logit = jax.lax.psum(
            jnp.where(is_local, picked, 0.0), axis
        )

        mask = (targets != pad_id).astype(jnp.float32)
        if label_smoothing > 0.0:
            Vt = true_vocab or V
            col_valid = (off + jnp.arange(vl)) < Vt  # true columns only
            sum_logits = jax.lax.psum(
                jnp.sum(jnp.where(col_valid, local, 0.0), axis=-1), axis
            )  # (B, T) = sum_j logit_j over the TRUE vocabulary
            nll = (
                lse
                - (1.0 - label_smoothing) * tgt_logit
                - (label_smoothing / Vt) * sum_logits
            )
        else:
            nll = lse - tgt_logit
        nll_sum = jnp.sum(nll * mask)
        n_tokens = jnp.sum(mask)

        # Accuracy: global argmax via pmax value + pmin owning column.
        # Metrics carry no gradient — stop it before the collectives.
        local_max = jax.lax.stop_gradient(jnp.max(local, axis=-1))
        local_arg = off + jnp.argmax(jax.lax.stop_gradient(local), axis=-1)
        gmax = jax.lax.pmax(local_max, axis)
        pred = jax.lax.pmin(
            jnp.where(local_max == gmax, local_arg, jnp.iinfo(jnp.int32).max),
            axis,
        )
        n_correct = jnp.sum((pred == targets) * mask)
        return nll_sum, n_tokens, n_correct

    def local_loss(params, features, tokens, rng):
        nll_sum, n_tokens, n_correct = raw_pieces(
            params, features, tokens, rng
        )
        if data_axis is not None:
            # 2-D DPxTP: batch is also sharded; globalize the sum-form
            # pieces over the data axis so the loss (and thus gradients)
            # match a single-device step on the concatenated batch.
            nll_sum = jax.lax.psum(nll_sum, data_axis)
            n_tokens = jax.lax.psum(n_tokens, data_axis)
            n_correct = jax.lax.psum(n_correct, data_axis)
        denom = jnp.maximum(n_tokens, 1.0)
        loss = nll_sum / denom
        acc = n_correct / denom
        return loss, {"loss": loss, "accuracy": acc, "tokens": n_tokens}

    def shard_body(state: TrainState, features, tokens):
        rng, dropout_rng = jax.random.split(state.rng)
        if data_axis is not None:
            dropout_rng = jax.random.fold_in(
                dropout_rng, jax.lax.axis_index(data_axis)
            )
        if grad_accum_steps > 1:
            # Sum-space accumulation (the dp.py recipe): scan the
            # (data-local) batch as A microbatches, accumulate the RAW
            # nll-sum gradients and the loss pieces, then globalize and
            # normalize ONCE by the global token count — exactly the
            # full-batch update (the loss is linear in the sums), with
            # peak activation memory down by A. Dropout decorrelates
            # per microbatch by fold_in, like the dp path.
            B = features.shape[0]
            if B % grad_accum_steps:
                raise ValueError(
                    f"(data-local) batch {B} not divisible by "
                    f"grad_accum_steps {grad_accum_steps}"
                )
            mb = B // grad_accum_steps
            f_mb = features.reshape(
                (grad_accum_steps, mb) + features.shape[1:]
            )
            t_mb = tokens.reshape(
                (grad_accum_steps, mb) + tokens.shape[1:]
            )

            def raw_head(p, fm, tm, r):
                nll_sum, n_tok, n_cor = raw_pieces(p, fm, tm, r)
                return nll_sum, (n_tok, n_cor)

            def body(carry, xs):
                g_acc, nll_acc, tok_acc, cor_acc, i = carry
                fm, tm = xs
                r = (
                    None
                    if deterministic
                    else jax.random.fold_in(dropout_rng, i)
                )
                (nll, (n_tok, n_cor)), g = jax.value_and_grad(
                    raw_head, has_aux=True
                )(state.params, fm, tm, r)
                g_acc = jax.tree_util.tree_map(jnp.add, g_acc, g)
                return (
                    g_acc,
                    nll_acc + nll,
                    tok_acc + n_tok,
                    cor_acc + n_cor,
                    i + 1,
                ), None

            g0 = jax.tree_util.tree_map(
                jnp.zeros_like, state.params
            )
            zero = jnp.zeros((), jnp.float32)
            (g_nll, nll_sum, n_tokens, n_correct, _), _ = jax.lax.scan(
                body, (g0, zero, zero, zero, 0), (f_mb, t_mb)
            )
            # raw_pieces' in-forward psums already made the sums global
            # over the MODEL axis (identical on every vocab shard);
            # only the data axis still needs globalizing.
            if data_axis is not None:
                nll_sum = jax.lax.psum(nll_sum, data_axis)
                n_tokens = jax.lax.psum(n_tokens, data_axis)
                n_correct = jax.lax.psum(n_correct, data_axis)
            denom = jnp.maximum(n_tokens, 1.0)
            # Model axis: raw_pieces psums INSIDE the loss, so its
            # transpose left an n_shards factor — pmean undoes it.
            # Data axis: the accum path has NO in-loss data psum (the
            # microbatch sums are data-local), so the raw gradients
            # carry no factor and must be SUMMED across data shards.
            # Dividing by the GLOBAL token count then normalizes the
            # raw sum — the dp.py accum recipe.
            grads = jax.lax.pmean(g_nll, axis)
            if data_axis is not None:
                grads = jax.lax.psum(grads, data_axis)
            grads = jax.tree_util.tree_map(
                lambda g: g / denom, grads
            )
            metrics = {
                "loss": nll_sum / denom,
                "accuracy": n_correct / denom,
                "tokens": n_tokens,
            }
        else:
            (loss, metrics), grads = jax.value_and_grad(
                local_loss, has_aux=True
            )(state.params, features, tokens, dropout_rng)
            # Same psum-transpose behavior as the DP step: each shard's
            # grad is (shard count) x (its contribution); pmean over
            # every sharded axis reconstructs the exact gradient.
            grads = jax.lax.pmean(grads, axis)
            if data_axis is not None:
                grads = jax.lax.pmean(grads, data_axis)
        updates, opt_state = optimizer.update(
            grads, state.opt_state, state.params
        )
        params = optax.apply_updates(state.params, updates)
        return (
            TrainState(
                step=state.step + 1,
                params=params,
                opt_state=opt_state,
                rng=rng,
            ),
            metrics,
        )

    body_fn = shard_body
    batch_spec = P(data_axis) if data_axis else P()
    if multi_steps > 1:
        # Multi-step dispatch (the dp.py recipe): inputs are (N, B, ...)
        # stacks — sharded on the SECOND (batch) axis under 2-D DPxTP,
        # replicated under pure tp — and the shard body lax.scans the
        # single-step body N times, so one dispatch runs N vocab-psum'd
        # optimizer steps with the exact per-step update sequence (the
        # scan carries the full TrainState; nothing about the tp
        # collectives changes per iteration). Metrics come back SUMMED
        # over the N steps, matching the dp/fsdp multi-step contract.
        batch_spec = P(None, data_axis) if data_axis else P()

        def multi_body(state: TrainState, features, tokens):
            def body(st, xs):
                f, t = xs
                return shard_body(st, f, t)

            state, ms = jax.lax.scan(body, state, (features, tokens))
            return state, jax.tree_util.tree_map(
                lambda x: jnp.sum(x, axis=0), ms
            )

        body_fn = multi_body

    sharded = shard_map(
        body_fn,
        mesh=mesh,
        in_specs=(P(), batch_spec, batch_spec),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(0,) if donate else ())


def _param_specs(params, axis: str):
    """Spec tree: out-projection kernel/bias sharded on vocab, rest
    replicated."""

    def spec_for(path, leaf):
        keys = [getattr(p, "key", getattr(p, "idx", None)) for p in path]
        if "out" in keys:
            if keys[-1] == "kernel":
                return P(None, axis)
            if keys[-1] == "bias":
                return P(axis)
        return P()

    return jax.tree_util.tree_map_with_path(spec_for, params)


def make_tp_beam_fn(
    decoder,
    mesh,
    *,
    axis: str = MODEL_AXIS,
    data_axis: str | None = None,
    start_id: int,
    end_id: int,
    max_len: int,
    beam_width: int,
    pad_id: int = 0,
    min_len: int = 0,
    banned_ids: tuple = (),
    no_repeat_ngram_size: int = 0,
    length_normalize: bool = True,
    alpha: float = 1.0,
    length_penalty: str = "simple",
    approx_topk: bool = False,
):
    """Build a jittable (params, features) -> BeamResult with the output
    projection sharded over ``mesh``'s ``axis``.

    ``data_axis``: optional second mesh axis to shard the batch over — the
    full 2-D serving layout (batch x vocab); results come back sharded over
    ``data_axis``. With data_axis=None the batch is replicated."""
    k = beam_width
    n_shards = mesh.shape[axis]

    def shard_body(params, features):
        B = features.shape[0]
        my = jax.lax.axis_index(axis)
        v_local = params["out"]["kernel"].shape[-1]
        col_offset = my * v_local

        def tp_scorer(params, state, last, t, seqs=None):
            """Distributed scoring stage plugged into the shared beam
            engine: local vocab-slice logits, global logsumexp over ICI,
            per-shard top-k, all_gather of the k-per-shard candidates
            (shard-major = ascending vocab offset — the tie order the
            engine's merge stage requires). ``seqs`` (the engine's
            per-hypothesis history, present when no_repeat_ngram_size
            is set) is identical on every shard — the merge stage runs
            the same selection everywhere — so each shard bans the
            completions that land in its own vocab slice."""
            hidden, new_state = decoder.step_hidden(params, state, last)
            local = (
                jnp.dot(
                    hidden,
                    params["out"]["kernel"].astype(hidden.dtype),
                    preferred_element_type=jnp.float32,
                )
                + params["out"]["bias"].astype(jnp.float32)
            )  # (B*k, V/p)
            # Global logsumexp (pad mass included, matching the
            # single-device engine's convention).
            m = jax.lax.pmax(jnp.max(local, axis=-1), axis)  # (B*k,)
            s = jax.lax.psum(
                jnp.sum(jnp.exp(local - m[:, None]), axis=-1), axis
            )
            lse = m + jnp.log(s)

            # Mask pad (it lives in exactly one shard's slice).
            cols = col_offset + jax.lax.broadcasted_iota(
                jnp.int32, local.shape, 1
            )
            local = jnp.where(cols == pad_id, NEG_INF, local)
            if banned_ids:
                # Banned words (beam.py apply_banned convention): each
                # banned id lives in exactly one shard's slice; the
                # global lse above is untouched (selection-only).
                local = jnp.where(
                    jnp.isin(cols, jnp.asarray(banned_ids, jnp.int32)),
                    NEG_INF,
                    local,
                )
            if min_len:
                # Length floor (beam.py min_len): endseq — also in
                # exactly one shard's slice — leaves the candidate set
                # while t < min_len; the global lse above is untouched.
                local = jnp.where(
                    (cols == end_id) & (t < min_len), NEG_INF, local
                )
            if seqs is not None:
                # No-repeat-ngram on the local slice: match against the
                # (replicated) history, then scatter-min NEG_INF at the
                # banned completions this shard owns; out-of-slice bans
                # are some other shard's rows. BEFORE the per-shard
                # top-k (selection-exact); the global lse is untouched.
                from tpucap.decode.ngram import _ngram_matches

                match, next_tok = _ngram_matches(
                    seqs.reshape(B * k, -1), t, no_repeat_ngram_size
                )
                if match is not None:
                    mine = (next_tok >= col_offset) & (
                        next_tok < col_offset + v_local
                    )
                    idx = jnp.clip(next_tok - col_offset, 0, v_local - 1)
                    vals = jnp.where(
                        match & mine,
                        jnp.asarray(NEG_INF, local.dtype),
                        jnp.asarray(jnp.inf, local.dtype),
                    )
                    local = local.at[
                        jnp.arange(B * k)[:, None], idx
                    ].min(vals)

            # Per-shard top-k over the local vocab slice; approx_topk
            # swaps in the TPU approx_max_k custom call (same serving
            # tradeoff as the single-device engine's stage 1 — the
            # cross-shard merge below stays exact either way). A shard
            # whose slice is narrower than the beam (v_local < k, tiny
            # vocab over many shards) contributes ALL of its columns —
            # the union stays complete, so the merge stays exact.
            kk = min(k, v_local)
            if approx_topk and kk < v_local:
                pv, pw = jax.lax.approx_max_k(local, kk)
            else:
                pv, pw = jax.lax.top_k(local, kk)  # (B*k, kk) local
            pw = pw + col_offset
            av = jnp.moveaxis(
                jax.lax.all_gather(pv, axis, axis=0), 0, 1
            ).reshape(B * k, n_shards * kk)
            aw = jnp.moveaxis(
                jax.lax.all_gather(pw, axis, axis=0), 0, 1
            ).reshape(B * k, n_shards * kk)
            C = n_shards * kk
            logp = (av - lse[:, None]).reshape(B, k, C)
            words = aw.reshape(B, k, C)
            return logp, words, new_state

        state = decoder.init_state(params, features)
        return beam_decode(
            decoder.step,
            params,
            state,
            start_id=start_id,
            end_id=end_id,
            max_len=max_len,
            beam_width=k,
            pad_id=pad_id,
            min_len=min_len,
            no_repeat_ngram_size=no_repeat_ngram_size,
            length_normalize=length_normalize,
            alpha=alpha,
            length_penalty=length_penalty,
            decoder=decoder,
            scorer=tp_scorer,
        )

    def build_specs(params):
        return _param_specs(params, axis)

    feat_spec = P(data_axis) if data_axis else P()
    out_spec = P(data_axis) if data_axis else P()

    def fn(params, features):
        sharded = shard_map(
            shard_body,
            mesh=mesh,
            in_specs=(build_specs(params), feat_spec),
            out_specs=out_spec,
            check_vma=False,
        )
        return sharded(params, features)

    return jax.jit(fn)
