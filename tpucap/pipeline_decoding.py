"""Decode-dispatch facade of CaptioningPipeline (mechanical split of
the former single-module pipeline.py — VERDICT r3 weak #7).

`_PipelineDecoding` is a mixin providing every generation entry point:
the cached jit'd greedy/beam programs and their mesh-parallel variants,
async submit surfaces, n-best/diverse/MBR/ensemble/speculative decode,
forced-prefix continuations, lexically-constrained beam, caption
scoring, and attention-map dumps. Not usable standalone — binds to the
attributes CaptioningPipeline (tpucap.pipeline) establishes. Reference
mapping and design notes live on the methods (SURVEY.md §2.1 #10-11,
§3.3-3.4).
"""

from __future__ import annotations

from typing import Any, Iterable

import jax
import jax.numpy as jnp
import numpy as np

from tpucap.core import make_mesh, pad_rows, pad_to_multiple
from tpucap.decode import beam_decode, greedy_decode, ids_to_captions
from tpucap.text.clean import END_TOKEN, START_TOKEN


class _PipelineDecoding:
    # -- generation (reference: generate_desc / beam_search_desc) ----------

    def _decode_fn(self, method: str, beam_width: int):
        key = (method, beam_width)
        if key in self._decode_cache:
            return self._decode_cache[key]
        start_id, end_id = self._token_ids()
        dcfg = self.config.decode
        # config.precision='f32' forces full-f32 matmul passes on TPU for
        # exact caption parity with CPU/reference numerics; 'bf16' keeps the
        # MXU's fast default (bf16 multiplies, f32 accumulation).
        matmul_precision = (
            "highest" if self.config.precision == "f32" else "default"
        )

        if method == "greedy":

            @jax.jit
            def fn(params, features):
                with jax.default_matmul_precision(matmul_precision):
                    state = self.decoder.init_state(params, features)
                    return greedy_decode(
                        self.decoder.step,
                        params,
                        state,
                        start_id=start_id,
                        end_id=end_id,
                        max_len=dcfg.max_len,
                        min_len=dcfg.min_len,
                        banned_ids=self._banned_ids(),
                        no_repeat_ngram_size=dcfg.no_repeat_ngram_size,
                    )

        else:

            @jax.jit
            def fn(params, features):
                with jax.default_matmul_precision(matmul_precision):
                    state = self.decoder.init_state(params, features)
                    return beam_decode(
                        self.decoder.step,
                        params,
                        state,
                        start_id=start_id,
                        end_id=end_id,
                        max_len=dcfg.max_len,
                        beam_width=beam_width,
                        min_len=dcfg.min_len,
                        banned_ids=self._banned_ids(),
                        no_repeat_ngram_size=dcfg.no_repeat_ngram_size,
                        length_normalize=dcfg.length_normalize,
                        alpha=dcfg.alpha,
                        length_penalty=dcfg.length_penalty,
                        approx_topk=dcfg.approx_topk,
                        decoder=self.decoder,
                    )

        self._decode_cache[key] = fn
        return fn

    # -- mesh-sharded inference (BASELINE config 5: batch 256 on v5e-8) -----

    def _inference_mesh(self, parallelism: str):
        """Mesh for a sharded inference path: 'dp' -> 1-D ("data",),
        'tp' -> 1-D ("model",), 'dp_tp' -> 2-D ("data", "model") with the
        model-axis width from config.mesh.model_devices (default 2)."""
        from jax.sharding import Mesh

        n = self.config.mesh.n_devices or jax.device_count()
        devices = jax.devices()[:n]
        if parallelism == "dp":
            return make_mesh(n)
        if parallelism == "tp":
            return Mesh(np.asarray(devices), ("model",))
        if parallelism == "dp_tp":
            tp = self.config.mesh.model_devices
            if tp <= 1:
                raise ValueError(
                    "parallelism='dp_tp' needs mesh.model_devices > 1 "
                    "(the model-axis width; 1 means no tensor "
                    "parallelism — use parallelism='dp' instead, or "
                    "pass --model-devices on the CLI)"
                )
            if n % tp:
                raise ValueError(
                    f"{n} devices do not factor into a (data, model={tp}) "
                    "mesh; set mesh.model_devices to a divisor of the "
                    "device count"
                )
            return Mesh(
                np.asarray(devices).reshape(n // tp, tp), ("data", "model")
            )
        if parallelism == "pp":
            return Mesh(np.asarray(devices), ("stage",))
        if parallelism == "ep":
            return Mesh(np.asarray(devices), ("expert",))
        if parallelism == "sp":
            return Mesh(np.asarray(devices), ("seq",))
        if parallelism == "dp_sp":
            sp = self.config.mesh.model_devices
            if sp <= 1:
                raise ValueError(
                    "parallelism='dp_sp' needs mesh.model_devices > 1 "
                    "(the seq-axis width; 1 means no sequence "
                    "parallelism — use parallelism='dp' instead)"
                )
            if n % sp:
                raise ValueError(
                    f"{n} devices do not factor into a (data, seq={sp}) "
                    "mesh; set mesh.model_devices to a divisor of the "
                    "device count"
                )
            return Mesh(
                np.asarray(devices).reshape(n // sp, sp), ("data", "seq")
            )
        if parallelism == "dp_ep":
            ep = self.config.mesh.model_devices
            if ep <= 1:
                raise ValueError(
                    "parallelism='dp_ep' needs mesh.model_devices > 1 "
                    "(the expert-axis width; 1 means no expert "
                    "parallelism — use parallelism='dp' instead)"
                )
            if n % ep:
                raise ValueError(
                    f"{n} devices do not factor into a (data, expert={ep}) "
                    "mesh; set mesh.model_devices to a divisor of the "
                    "device count"
                )
            return Mesh(
                np.asarray(devices).reshape(n // ep, ep), ("data", "expert")
            )
        if parallelism == "dp_pp":
            pp = self.config.mesh.model_devices
            if pp <= 1:
                raise ValueError(
                    "parallelism='dp_pp' needs mesh.model_devices > 1 "
                    "(the stage-axis width; 1 means no pipeline "
                    "parallelism — use parallelism='dp' instead)"
                )
            if n % pp:
                raise ValueError(
                    f"{n} devices do not factor into a (data, stage={pp}) "
                    "mesh; set mesh.model_devices to a divisor of the "
                    "device count"
                )
            return Mesh(
                np.asarray(devices).reshape(n // pp, pp), ("data", "stage")
            )
        raise ValueError(f"unknown parallelism {parallelism!r}")

    def _parallel_decode_fn(self, parallelism, method, beam_width):
        """(jitted fn, decoder params, data-axis size) for a mesh-sharded
        decode. 'dp' shards the batch (shard_map + all results assembled
        from the data axis); 'tp'/'dp_tp' run the vocab-sharded beam engine
        (greedy = beam width 1, token-identical), auto-padding the vocab to
        shard evenly. Cached per (parallelism, method, beam_width) alongside
        the single-device programs, and invalidated with them."""
        key = (parallelism, method, beam_width)
        cached = self._decode_cache.get(key)
        if cached is not None:
            return cached
        start_id, end_id = self._token_ids()
        dcfg = self.config.decode
        mesh = self._inference_mesh(parallelism)
        dec_params = self._inference_params()["decoder"]

        if parallelism == "dp":
            from tpucap.parallel import make_dp_decode_fn

            kwargs = dict(
                start_id=start_id,
                end_id=end_id,
                max_len=dcfg.max_len,
                min_len=dcfg.min_len,
                banned_ids=self._banned_ids(),
                no_repeat_ngram_size=dcfg.no_repeat_ngram_size,
            )
            if method != "greedy":
                kwargs.update(
                    beam_width=beam_width,
                    length_normalize=dcfg.length_normalize,
                    alpha=dcfg.alpha,
                    length_penalty=dcfg.length_penalty,
                    approx_topk=dcfg.approx_topk,
                )
            fn = make_dp_decode_fn(
                self.decoder,
                greedy_decode if method == "greedy" else beam_decode,
                mesh,
                **kwargs,
            )
            data_size = dict(mesh.shape)["data"]
        else:
            from tpucap.parallel.tp import make_tp_beam_fn, pad_vocab_params

            n_model = dict(mesh.shape)["model"]
            dec_params, _ = pad_vocab_params(dec_params, n_model)
            fn = make_tp_beam_fn(
                self.decoder,
                mesh,
                data_axis="data" if parallelism == "dp_tp" else None,
                start_id=start_id,
                end_id=end_id,
                max_len=dcfg.max_len,
                beam_width=1 if method == "greedy" else beam_width,
                min_len=dcfg.min_len,
                banned_ids=self._banned_ids(),
                no_repeat_ngram_size=dcfg.no_repeat_ngram_size,
                length_normalize=dcfg.length_normalize,
                alpha=dcfg.alpha,
                length_penalty=dcfg.length_penalty,
                approx_topk=dcfg.approx_topk,
            )
            data_size = dict(mesh.shape).get("data", 1)

        # Same precision contract as the single-device programs
        # (_decode_fn): precision='f32' forces highest-precision matmuls
        # for exact caption parity. The context must be active when the
        # inner jit TRACES (first call), hence the wrapper on every call.
        matmul_precision = (
            "highest" if self.config.precision == "f32" else "default"
        )
        inner = fn

        def fn(params, features):
            with jax.default_matmul_precision(matmul_precision):
                return inner(params, features)

        entry = (fn, dec_params, data_size)
        self._decode_cache[key] = entry
        return entry

    def generate(
        self,
        features,
        *,
        method: str | None = None,
        beam_width: int | None = None,
        temperature: float = 1.0,
        top_k: int | None = None,
        top_p: float | None = None,
        repetition_penalty: float = 1.0,
        seed: int = 0,
        parallelism: str | None = None,
    ) -> list[str]:
        """Features (B, ...) -> caption strings (sentinels stripped).

        method: 'greedy' | 'beam' | 'sample' (temperature/top_k/top_p/
        repetition_penalty/seed apply to sampling only; top_p is nucleus
        truncation, repetition_penalty > 1 discourages repeats).

        parallelism: None/'none' (single device) | 'dp' (batch sharded over
        the data mesh) | 'tp' (vocab-sharded beam engine) | 'dp_tp' (2-D
        batch x vocab). Batches not divisible by the data-axis size are
        zero-padded on entry and trimmed on return."""
        method = method or self.config.decode.method
        beam_width = beam_width or self.config.decode.beam_width
        if parallelism not in (None, "none"):
            if method == "sample":
                raise ValueError(
                    "sampling decode does not support parallelism"
                )
            fn, dec_params, data_size = self._parallel_decode_fn(
                parallelism, method, beam_width
            )
            feats = jnp.asarray(features, self._infer_dtype())
            B = feats.shape[0]
            feats = pad_rows(feats, pad_to_multiple(B, data_size))
            res = fn(dec_params, feats)
            _, end_id = self._token_ids()
            return ids_to_captions(
                self.tokenizer,
                res.tokens[:B],
                res.lengths[:B],
                end_id=end_id,
            )
        if method != "sample":
            # Single source of truth for the single-device greedy/beam
            # path: generate(x) IS generate_submit(x)().
            return self.generate_submit(
                features, method=method, beam_width=beam_width
            )()
        from tpucap.decode import sample_decode

        params = self._inference_params()["decoder"]
        feats = jnp.asarray(features, self._infer_dtype())
        start_id, end_id = self._token_ids()
        key = ("sample", temperature, top_k, top_p, repetition_penalty)
        fn = self._decode_cache.get(key)
        if fn is None:

            @jax.jit
            def fn(params, features, rng):
                state = self.decoder.init_state(params, features)
                return sample_decode(
                    self.decoder.step,
                    params,
                    state,
                    rng=rng,
                    start_id=start_id,
                    end_id=end_id,
                    max_len=self.config.decode.max_len,
                    min_len=self.config.decode.min_len,
                    banned_ids=self._banned_ids(),
                    no_repeat_ngram_size=(
                        self.config.decode.no_repeat_ngram_size
                    ),
                    temperature=temperature,
                    top_k=top_k,
                    top_p=top_p,
                    repetition_penalty=repetition_penalty,
                )

            self._decode_cache[key] = fn
        res = fn(params, feats, jax.random.key(seed))
        return ids_to_captions(
            self.tokenizer, res.tokens, res.lengths, end_id=end_id
        )

    def encode_prefixes(self, texts: list) -> list:
        """Tokenize forced-prefix strings, refusing out-of-vocabulary
        words on the word tokenizer (Keras semantics silently DROP
        unknown words — the model would be forced through a prefix the
        caller didn't ask for). BPE is open-vocab: piece counts
        legitimately differ from word counts, so no check applies.
        Shared by generate_continuation and the serving layer's
        submit-time validation (a bad prefix must fail ITS request, not
        the whole micro-batch it lands in)."""
        from tpucap.text.bpe import BpeTokenizer

        seqs = self.tokenizer.texts_to_sequences(texts)
        if not isinstance(self.tokenizer, BpeTokenizer):
            for text, seq in zip(texts, seqs):
                # Count words under the TOKENIZER's own normalization
                # (filter/punctuation splitting, lowercasing) — a plain
                # text.split() disagrees whenever the prefix contains
                # filter characters ("a.b" is two tokenizer words) and
                # would both miss real OOV drops and reject valid
                # prefixes like "a , dog".
                n_words = len(self.tokenizer._analyze(text))
                if len(seq) != n_words:
                    raise ValueError(
                        f"prefix {text!r} contains words outside the "
                        "tokenizer vocabulary"
                    )
        return seqs

    def generate_continuation(
        self,
        features,
        prefix,
        *,
        method: str | None = None,
        beam_width: int | None = None,
    ) -> list[str]:
        """Blocking forced-prefix captioning; exactly
        ``generate_continuation_submit(...)()`` — see that method for
        the full contract."""
        return self.generate_continuation_submit(
            features, prefix, method=method, beam_width=beam_width
        )()

    def generate_continuation_submit(
        self,
        features,
        prefix,
        *,
        method: str | None = None,
        beam_width: int | None = None,
    ):
        """Forced-prefix captioning: continue user-supplied caption
        openings ("a dog ..." -> the model's best completion). The
        standard guided-captioning / interactive-completion surface; not
        part of the reference (it always decodes from startseq,
        SURVEY.md §3.3).

        prefix: one string shared by every row, or a list of per-row
        strings (mixed lengths fine; "" rows decode from scratch).
        Words are encoded with the pipeline tokenizer under its own
        normalization; a prefix word outside the vocabulary raises
        (silently dropping it would caption something the caller didn't
        ask for).

        How: ONE lax.scan teacher-forces the prefix tokens through the
        decoder (rows past their own prefix freeze via where-masks —
        decode/prefix.py), then the unchanged greedy/beam engine
        continues from each row's last prefix token with its score
        seeded by the prefix log-prob, all inside one jit program.
        Returned captions are "prefix + continuation" (sentinels
        stripped); beam ranks by the CONTINUATION's length-normalized
        score. DecodeConfig dials apply to the continuation (min_len
        counts generated tokens; no_repeat_ngram history starts after
        the prefix); max_len bounds the generated continuation.

        This is the async form (mirrors :meth:`generate_submit`): the
        priming+decode program is DISPATCHED immediately and a zero-arg
        finalizer is returned that blocks on the result and yields the
        caption strings — the serving micro-batcher overlaps batches
        through it exactly like the plain path.
        """
        from tpucap.decode.prefix import prime_prefix

        method = method or self.config.decode.method
        beam_width = beam_width or self.config.decode.beam_width
        if method not in ("greedy", "beam"):
            raise ValueError(
                f"generate_continuation supports greedy|beam, got "
                f"{method!r}"
            )
        feats = jnp.asarray(features, self._infer_dtype())
        B = feats.shape[0]
        if isinstance(prefix, str):
            prefix = [prefix] * B
        if len(prefix) != B:
            raise ValueError(
                f"{len(prefix)} prefixes for {B} feature rows"
            )
        seqs = self.encode_prefixes(prefix)
        P = max((len(s) for s in seqs), default=0)
        if P:
            # Pad the forced length to a power of two: one compiled
            # program per bucket instead of one per distinct prefix
            # length (the admission-ladder idea; extra steps freeze via
            # the plens mask).
            P = 1 << (P - 1).bit_length()
        pref = np.zeros((B, P), np.int32)
        plens = np.zeros((B,), np.int32)
        for i, s in enumerate(seqs):
            pref[i, : len(s)] = s
            plens[i] = len(s)

        start_id, end_id = self._token_ids()
        dcfg = self.config.decode
        max_pos = getattr(self.decoder, "max_positions", None)
        true_max = int(plens.max()) if P else 0
        if max_pos is not None and max(P, true_max + dcfg.max_len) > max_pos:
            # KV-cache family capacity: the chunked prefill writes
            # positions [0, P) (P = pow-2-padded forced length), and the
            # continuation writes up to position true_len + max_len - 1
            # per row — so the cache must hold max(P, true_max + max_len)
            # positions. Using P + max_len here would reject prefixes
            # that actually fit (a 5-token prefix pads to P=8 but only
            # ever queries position 5 + max_len - 1).
            raise ValueError(
                f"prefix length {true_max} (padded to {P}) + max_len "
                f"{dcfg.max_len} exceeds decoder.max_positions {max_pos}; "
                "raise max_positions or shorten the prefix"
            )
        params = self._inference_params()["decoder"]
        key = ("continuation", method, beam_width, P)
        fn = self._decode_cache.get(key)
        if fn is None:
            matmul_precision = (
                "highest" if self.config.precision == "f32" else "default"
            )

            @jax.jit
            def fn(params, features, pref, plens):
                with jax.default_matmul_precision(matmul_precision):
                    state = self.decoder.init_state(params, features)
                    state, last, lp = prime_prefix(
                        self.decoder.step, params, state, pref, plens,
                        start_id=start_id, decoder=self.decoder,
                    )
                    kw = dict(
                        start_id=last,
                        end_id=end_id,
                        max_len=dcfg.max_len,
                        min_len=dcfg.min_len,
                        banned_ids=self._banned_ids(),
                        no_repeat_ngram_size=dcfg.no_repeat_ngram_size,
                        init_scores=lp,
                        decoder=self.decoder,
                    )
                    if method == "greedy":
                        return greedy_decode(
                            self.decoder.step, params, state, **kw
                        )
                    return beam_decode(
                        self.decoder.step, params, state,
                        beam_width=beam_width,
                        length_normalize=dcfg.length_normalize,
                        alpha=dcfg.alpha,
                        length_penalty=dcfg.length_penalty,
                        approx_topk=dcfg.approx_topk,
                        **kw,
                    )

            self._decode_cache[key] = fn
        res = fn(params, feats, jnp.asarray(pref), jnp.asarray(plens))
        # Reconstruct the prefix text from its token ids (exactly what
        # the model was forced through, in the tokenizer's own casing).
        heads = self.tokenizer.sequences_to_texts(seqs)

        def finalize() -> list[str]:
            tails = ids_to_captions(
                self.tokenizer, res.tokens, res.lengths, end_id=end_id
            )
            return [
                (h + " " + t).strip() if h else t
                for h, t in zip(heads, tails)
            ]

        return finalize

    def generate_submit(
        self,
        features,
        *,
        method: str | None = None,
        beam_width: int | None = None,
    ):
        """Async variant of :meth:`generate` (greedy/beam, single device):
        the decode program is DISPATCHED immediately (JAX async dispatch —
        the device starts as soon as it is free) and a zero-arg callable
        is returned that blocks on the result and yields the caption
        strings. Callers that overlap work across batches (the serving
        micro-batcher: dispatch batch i+1 while batch i's tokens transfer
        back) get device/host pipelining for free; ``generate(x)`` is
        exactly ``generate_submit(x)()``."""
        method = method or self.config.decode.method
        beam_width = beam_width or self.config.decode.beam_width
        if method not in ("greedy", "beam"):
            raise ValueError(
                f"generate_submit supports greedy|beam, got {method!r}"
            )
        params = self._inference_params()["decoder"]
        feats = jnp.asarray(features, self._infer_dtype())
        _, end_id = self._token_ids()
        fn = self._decode_fn(method, beam_width)
        res = fn(params, feats)
        return lambda: ids_to_captions(
            self.tokenizer, res.tokens, res.lengths, end_id=end_id
        )

    def generate_n_best(
        self,
        features,
        *,
        n: int | None = None,
        beam_width: int | None = None,
    ) -> list[list[tuple[str, float]]]:
        """Beam search returning the n-best list per image: for each of
        the B feature rows, a list of (caption, normalized_score) pairs
        sorted best-first — the engine already tracks every beam
        (BeamResult.beam_tokens); this surfaces them for reranking /
        ensembling / SCST-style analysis. ``n`` defaults to the full
        beam width; the best entry is exactly ``generate(method='beam')``.
        Scores are the engine's ranking quantity (length-normalized when
        config.decode.length_normalize, raw log-prob sums otherwise)."""
        beam_width = beam_width or self.config.decode.beam_width
        n = n or beam_width
        if n > beam_width:
            raise ValueError(
                f"n={n} exceeds beam_width={beam_width} — only "
                "beam_width hypotheses exist"
            )
        params = self._inference_params()["decoder"]
        feats = jnp.asarray(features, self._infer_dtype())
        fn = self._decode_fn("beam", beam_width)
        res = fn(params, feats)
        _, end_id = self._token_ids()
        dcfg = self.config.decode
        from tpucap.decode.beam import normalized_scores

        lengths = np.asarray(res.beam_lengths)
        # The engine's OWN ranking function (f32) — an independent
        # recompute could flip near-ties and break the entry-0 ==
        # generate(beam) contract.
        norm = np.asarray(
            normalized_scores(
                np.asarray(res.beam_scores, np.float32),
                lengths,
                length_normalize=dcfg.length_normalize,
                alpha=dcfg.alpha,
                length_penalty=dcfg.length_penalty,
            )
        )
        tokens = np.asarray(res.beam_tokens)  # (B, k, L)
        out = []
        for b in range(tokens.shape[0]):
            # stable argsort desc = the engine's tie rule (lowest slot
            # wins), so entry 0 matches generate(method='beam') exactly.
            order = np.argsort(-norm[b], kind="stable")[:n]
            caps = ids_to_captions(
                self.tokenizer,
                tokens[b][order],
                lengths[b][order],
                end_id=end_id,
            )
            out.append(
                [
                    (cap, float(norm[b][i]))
                    for cap, i in zip(caps, order)
                ]
            )
        return out

    def score_captions(self, features, captions) -> list[dict]:
        """Score given captions against given images: the per-caption
        teacher-forced log-probability under the model — the reranking /
        data-filtering / caption-retrieval surface (the reference can
        only GENERATE; it has no way to ask "how likely is THIS caption
        for THIS image").

        ``captions``: one bare caption string per feature row (no
        startseq/endseq — they are added here; leading/trailing
        sentinels are stripped if present, so generate() output scores
        directly). A caption word outside the vocabulary raises on the
        word tokenizer (silently dropping it would score a different
        caption); BPE is open-vocab.

        Returns, per row, ``{"logp", "tokens", "logp_per_token",
        "perplexity"}`` where logp is the sum of full-softmax log-probs
        of the caption's tokens INCLUDING the closing endseq — exactly
        the decode engines' score convention, so
        ``score_captions(f, generate(f))[i]["logp"]`` equals the greedy
        engine's reported score.

        TPU-first: ONE jitted teacher-forced forward per pow-2 length
        bucket (forward_train is a single scan — no per-token host
        loop), shared across calls via the decode-program cache.
        """
        from tpucap.text.clean import END_TOKEN, START_TOKEN

        feats = jnp.asarray(features, self._infer_dtype())
        B = feats.shape[0]
        if isinstance(captions, str):
            captions = [captions] * B
        if len(captions) != B:
            raise ValueError(
                f"{len(captions)} captions for {B} feature rows"
            )
        stripped = []
        for c in captions:
            words = c.split()
            if words and words[0] == START_TOKEN:
                words = words[1:]
            if words and words[-1] == END_TOKEN:
                words = words[:-1]
            stripped.append(" ".join(words))
        seqs = self.encode_prefixes(stripped)  # OOV -> raise (word tok)
        start_id, end_id = self._token_ids()
        # Row layout mirrors training: full = [start, w1..wn, end],
        # inputs = full[:-1], targets = full[1:]; pad id 0 masks.
        max_full = max(len(s) for s in seqs) + 2
        T = 1 << (max_full - 1 - 1).bit_length()  # pow-2 bucket for T=full-1
        T = max(T, 1)
        inputs = np.zeros((B, T), np.int32)
        targets = np.zeros((B, T), np.int32)
        for i, s in enumerate(seqs):
            full = [start_id, *s, end_id]
            inputs[i, : len(full) - 1] = full[:-1]
            targets[i, : len(full) - 1] = full[1:]

        params = self._inference_params()["decoder"]
        key = ("score", T)
        fn = self._decode_cache.get(key)
        if fn is None:
            matmul_precision = (
                "highest" if self.config.precision == "f32" else "default"
            )

            @jax.jit
            def fn(params, features, inputs, targets):
                with jax.default_matmul_precision(matmul_precision):
                    logits = self.decoder.forward_train(
                        params, features, inputs, deterministic=True
                    ).astype(jnp.float32)
                    logp = jax.nn.log_softmax(logits, axis=-1)
                    tok_lp = jnp.take_along_axis(
                        logp, targets[..., None], axis=-1
                    )[..., 0]
                    mask = (targets != 0).astype(jnp.float32)
                    return jnp.sum(tok_lp * mask, axis=-1), jnp.sum(
                        mask, axis=-1
                    )

            self._decode_cache[key] = fn
        logp, counts = fn(
            params, feats, jnp.asarray(inputs), jnp.asarray(targets)
        )
        logp = np.asarray(logp, np.float64)
        counts = np.asarray(counts, np.float64)
        out = []
        for lp, n in zip(logp, counts):
            per = lp / n if n else 0.0
            out.append(
                {
                    "logp": float(lp),
                    "tokens": int(n),
                    "logp_per_token": float(per),
                    "perplexity": float(np.exp(-per)),
                }
            )
        return out

    def generate_diverse(
        self,
        features,
        *,
        num_groups: int = 2,
        group_width: int | None = None,
        diversity: float = 0.5,
    ) -> list[list[tuple[str, float]]]:
        """Diverse beam search (decode/diverse.py): ``num_groups``
        groups of ``group_width`` beams with a Hamming penalty of
        strength ``diversity`` pushing later groups off earlier groups'
        token choices — the genre-standard way to get a genuinely
        varied candidate set (standard beam's n-best usually differ by
        a word). Returns, per image, the best caption OF EACH GROUP in
        group order as (caption, normalized_score) pairs; scores are
        true log-probs under the engine's ranking function, so entries
        are comparable with generate_n_best. ``group_width`` defaults
        to config.decode.beam_width; diversity=0 makes every group an
        independent exact beam search."""
        group_width = group_width or self.config.decode.beam_width
        params = self._inference_params()["decoder"]
        feats = jnp.asarray(features, self._infer_dtype())
        start_id, end_id = self._token_ids()
        dcfg = self.config.decode
        cache_key = ("diverse", num_groups, group_width, diversity)
        fn = self._decode_cache.get(cache_key)
        if fn is None:
            from tpucap.decode import diverse_beam_decode

            matmul_precision = (
                "highest" if self.config.precision == "f32" else "default"
            )

            @jax.jit
            def fn(params, features):
                with jax.default_matmul_precision(matmul_precision):
                    state = self.decoder.init_state(params, features)
                    return diverse_beam_decode(
                        self.decoder.step,
                        params,
                        state,
                        start_id=start_id,
                        end_id=end_id,
                        max_len=dcfg.max_len,
                        num_groups=num_groups,
                        group_width=group_width,
                        diversity=diversity,
                        min_len=dcfg.min_len,
                        banned_ids=self._banned_ids(),
                        no_repeat_ngram_size=dcfg.no_repeat_ngram_size,
                        length_normalize=dcfg.length_normalize,
                        alpha=dcfg.alpha,
                        length_penalty=dcfg.length_penalty,
                        decoder=self.decoder,
                    )

            self._decode_cache[cache_key] = fn
        res = fn(params, feats)
        from tpucap.decode.beam import normalized_scores

        tokens = np.asarray(res.tokens)  # (B, G, L)
        lengths = np.asarray(res.lengths)
        norm = np.asarray(
            normalized_scores(
                np.asarray(res.scores, np.float32),
                lengths,
                length_normalize=dcfg.length_normalize,
                alpha=dcfg.alpha,
                length_penalty=dcfg.length_penalty,
            )
        )
        out = []
        for b in range(tokens.shape[0]):
            caps = ids_to_captions(
                self.tokenizer, tokens[b], lengths[b], end_id=end_id
            )
            out.append(
                [(cap, float(norm[b][g])) for g, cap in enumerate(caps)]
            )
        return out

    def _constraint_ids(
        self, include_words, batch: int, num_slots: int | None = None
    ) -> np.ndarray:
        """Validate and encode must-include words -> (B, C) int32 id
        array (pad_id 0 = unused slot). ``include_words`` is a list of
        words (same constraints for every image) or a list of per-image
        word lists (ragged; rows are padded). Every entry must normalize
        to exactly ONE in-vocabulary word — silently dropping a
        constraint would return an unconstrained caption while claiming
        otherwise, so OOV / multi-word / duplicate entries raise."""
        if hasattr(self.tokenizer, "decode_ids"):
            raise NotImplementedError(
                "include_words requires the word-level tokenizer (a "
                "subword word decomposes into pieces — a must-include "
                "PIECE set is a phrase constraint, not supported)"
            )
        from tpucap.decode.constrained import MAX_CONSTRAINTS

        start_id, end_id = self._token_ids()
        banned = set(self._banned_ids())

        if not include_words:
            raise ValueError("include_words is empty")
        if batch == 0:
            raise ValueError("features batch is empty")
        per_image = isinstance(include_words[0], (list, tuple))
        rows = (
            [list(r) for r in include_words]
            if per_image
            else [list(include_words)] * batch
        )
        if per_image and len(rows) != batch:
            raise ValueError(
                f"per-image include_words has {len(rows)} rows for "
                f"{batch} images"
            )

        def encode(entry: str) -> int:
            pairs = self._normalize_vocab_entry(entry)
            if len(pairs) != 1:
                raise ValueError(
                    f"include_words entry {entry!r} normalizes to "
                    f"{len(pairs)} words — phrase constraints are not "
                    "supported; pass single words"
                )
            w, i = pairs[0]
            if i is None:
                # Distinguish the two un-emittable cases for the error
                # message; the RULE itself lives in
                # _normalize_vocab_entry, shared with bad_words.
                full = self.tokenizer.word_index.get(w)
                if full is None:
                    raise ValueError(
                        f"include_words entry {entry!r} -> {w!r} is "
                        "not in the vocabulary (the model can never "
                        "emit it)"
                    )
                raise ValueError(
                    f"include_words entry {w!r} has id {full} >= the "
                    f"model vocabulary size {self.vocab_size} "
                    "(num_words cap) — the model can never emit it"
                )
            if i in (start_id, end_id):
                raise ValueError(
                    f"include_words entry {w!r} is a sequence sentinel"
                )
            if i in banned:
                raise ValueError(
                    f"include_words entry {w!r} is also in bad_words"
                )
            return i

        id_rows = []
        for r, row in enumerate(rows):
            ids = [encode(e) for e in row]
            if len(set(ids)) != len(ids):
                raise ValueError(
                    f"duplicate include_words in row {r}: {row!r}"
                )
            id_rows.append(ids)
        C = max(len(ids) for ids in id_rows)
        if not 1 <= C <= MAX_CONSTRAINTS:
            raise ValueError(
                f"need 1..{MAX_CONSTRAINTS} include_words per image, "
                f"got {C} (each word doubles the decode batch)"
            )
        if num_slots is not None:
            # Pad the constraint axis up (extra slots are pre-satisfied
            # pad_id) — the serving layer buckets C to bound compiled
            # program count the way batch sizes are bucketed.
            if not C <= num_slots <= MAX_CONSTRAINTS:
                raise ValueError(
                    f"num_slots={num_slots} must be in "
                    f"[{C}, {MAX_CONSTRAINTS}]"
                )
            C = num_slots
        out = np.zeros((batch, C), np.int32)  # pad_id 0 = pre-satisfied
        for b, ids in enumerate(id_rows):
            out[b, : len(ids)] = ids
        return out

    def generate_constrained(
        self,
        features,
        include_words,
        *,
        beam_width: int | None = None,
        return_details: bool = False,
    ):
        """``generate_constrained_submit(...)()`` — see there."""
        return self.generate_constrained_submit(
            features,
            include_words,
            beam_width=beam_width,
            return_details=return_details,
        )()

    def generate_constrained_submit(
        self,
        features,
        include_words,
        *,
        beam_width: int | None = None,
        return_details: bool = False,
        num_slots: int | None = None,
    ):
        """Constrained beam search (decode/constrained.py — Anderson et
        al. 2017, the guided-captioning construction): captions that
        MUST include the given words, the complement of
        ``DecodeConfig.bad_words``. ``include_words`` is a list of words
        applied to every image, or a list of per-image word lists
        (ragged rows fine — unused slots are pre-satisfied). Up to 4
        words per image (the 2^C satisfaction banks ride the decode
        batch, so each word doubles the step cost — the paper's 1-3-tag
        regime).

        When full satisfaction is unreachable within
        config.decode.max_len, the engine returns the best caption of
        the most-satisfied bank (the paper's fallback) — check
        ``satisfied`` in the details. Scores stay true log-probs
        (constraints shape selection only), so entries are comparable
        with generate / generate_n_best output.

        Returns a zero-arg finalizer (generate_submit's async-dispatch
        contract: the device starts immediately, the finalizer pays
        host transfer + detokenize) yielding captions, or the detail
        dicts under ``return_details=True``: per-image {caption, score
        (normalized), satisfied: {word: bool}, num_satisfied}.
        ``num_slots`` pads the constraint axis up (extra slots are
        pre-satisfied) so the serving layer can bucket C the way batch
        sizes are bucketed; ``generate_constrained`` is exactly
        ``generate_constrained_submit(...)()``."""
        dcfg = self.config.decode
        if dcfg.no_repeat_ngram_size:
            raise NotImplementedError(
                "generate_constrained does not compose with "
                "no_repeat_ngram_size (the bank-hopping beam does not "
                "carry per-hypothesis histories)"
            )
        beam_width = beam_width or dcfg.beam_width
        params = self._inference_params()["decoder"]
        feats = jnp.asarray(features, self._infer_dtype())
        B = int(feats.shape[0])
        cids = self._constraint_ids(include_words, B, num_slots)
        C = cids.shape[1]
        start_id, end_id = self._token_ids()
        cache_key = ("constrained", beam_width, C)
        fn = self._decode_cache.get(cache_key)
        if fn is None:
            from tpucap.decode import constrained_beam_decode

            matmul_precision = (
                "highest" if self.config.precision == "f32" else "default"
            )

            @jax.jit
            def fn(params, features, cids):
                with jax.default_matmul_precision(matmul_precision):
                    state = self.decoder.init_state(params, features)
                    return constrained_beam_decode(
                        self.decoder.step,
                        params,
                        state,
                        start_id=start_id,
                        end_id=end_id,
                        max_len=dcfg.max_len,
                        beam_width=beam_width,
                        constraint_ids=cids,
                        min_len=dcfg.min_len,
                        banned_ids=self._banned_ids(),
                        length_normalize=dcfg.length_normalize,
                        alpha=dcfg.alpha,
                        length_penalty=dcfg.length_penalty,
                        decoder=self.decoder,
                    )

            self._decode_cache[cache_key] = fn
        res = fn(params, feats, jnp.asarray(cids))

        def finalize():
            tokens = np.asarray(res.tokens)
            lengths = np.asarray(res.lengths)
            caps = ids_to_captions(
                self.tokenizer, tokens, lengths, end_id=end_id
            )
            if not return_details:
                return caps
            from tpucap.decode.beam import normalized_scores

            norm = np.asarray(
                normalized_scores(
                    np.asarray(res.scores, np.float32),
                    lengths,
                    length_normalize=dcfg.length_normalize,
                    alpha=dcfg.alpha,
                    length_penalty=dcfg.length_penalty,
                )
            )
            satisfied = np.asarray(res.satisfied)
            index_word = self.tokenizer.index_word
            out = []
            for b in range(len(caps)):
                sat = {
                    index_word[int(i)]: bool(satisfied[b, c])
                    for c, i in enumerate(cids[b])
                    if int(i) != 0
                }
                out.append(
                    {
                        "caption": caps[b],
                        "score": float(norm[b]),
                        "satisfied": sat,
                        "num_satisfied": sum(sat.values()),
                    }
                )
            return out

        return finalize

    def generate_mbr(
        self,
        features,
        *,
        n_candidates: int = 5,
        candidates: str = "sample",
        metric: str = "cider",
        beam_width: int | None = None,
        diversity: float = 0.5,
        temperature: float = 1.0,
        top_k: int | None = None,
        top_p: float | None = None,
        seed: int = 0,
        return_candidates: bool = False,
    ):
        """Minimum-Bayes-risk (consensus) decoding: generate
        ``n_candidates`` captions per image, return the one that agrees
        most with the rest of its pool (decode/mbr.py — the Devlin et
        al. CIDEr-consensus construction). ``candidates`` picks the
        pool source:

        - 'sample' (default): independent sampled decodes with seeds
          ``seed..seed+n-1`` (temperature/top_k/top_p apply) — the MBR
          literature's pool; deterministic given ``seed``;
        - 'beam': the n-best list of a beam of width
          max(n_candidates, beam_width);
        - 'diverse': diverse beam groups
          (num_groups=n_candidates, group_width=beam_width, the given
          ``diversity``).

        Returns caption strings; ``return_candidates=True`` returns
        ``(captions, pools)`` for inspection/error analysis."""
        if candidates not in ("sample", "beam", "diverse"):
            raise ValueError(
                f"unknown candidate source {candidates!r}; "
                "sample|beam|diverse"
            )
        if n_candidates < 1:
            raise ValueError("n_candidates must be >= 1")
        beam_width = beam_width or self.config.decode.beam_width
        if candidates == "sample":
            runs = [
                self.generate(
                    features,
                    method="sample",
                    temperature=temperature,
                    top_k=top_k,
                    top_p=top_p,
                    seed=seed + i,
                )
                for i in range(n_candidates)
            ]
            pools = [list(caps) for caps in zip(*runs)]
        elif candidates == "beam":
            width = max(n_candidates, beam_width)
            pools = [
                [cap for cap, _ in row]
                for row in self.generate_n_best(
                    features, n=n_candidates, beam_width=width
                )
            ]
        else:
            pools = [
                [cap for cap, _ in row]
                for row in self.generate_diverse(
                    features,
                    num_groups=n_candidates,
                    group_width=beam_width,
                    diversity=diversity,
                )
            ]
        from tpucap.decode import mbr_select

        picks, _ = mbr_select(pools, metric=metric)
        caps = [pool[i] for pool, i in zip(pools, picks)]
        if return_candidates:
            return caps, pools
        return caps

    def generate_ensemble(
        self,
        features,
        others: "Iterable[CaptioningPipeline]",
        *,
        method: str | None = None,
        beam_width: int | None = None,
        weights=None,
    ) -> list[str]:
        """Product-of-experts ensemble decode over this pipeline plus
        ``others`` (the genre's standard +1-2 BLEU inference trick —
        the NIC paper's headline numbers are 5-model ensembles): at
        every step each model's softmax is combined as a weighted
        geometric mean (mean of log-probs) and selection runs on the
        combined distribution. The whole ensemble decode compiles to
        ONE device program (decode/ensemble.py).

        Models may be heterogeneous (different decoder families and/or
        encoders) but must share the tokenizer. ``features``: one
        shared array when all members consume the same features, or a
        list/tuple of per-model feature arrays (e.g. pooled for a
        merge model + spatial grid for an attention model). ``weights``
        (optional, len M = 1 + len(others)) are normalized to sum 1;
        default uniform. Single-member ensembles reduce exactly to
        :meth:`generate` (tests/test_ensemble.py)."""
        pipes = [self, *list(others)]
        method = method or self.config.decode.method
        if method not in ("greedy", "beam"):
            raise ValueError(
                f"generate_ensemble supports greedy|beam, got {method!r}"
            )
        beam_width = beam_width or self.config.decode.beam_width
        for i, p in enumerate(pipes[1:], 1):
            if p.tokenizer is None or (
                p.tokenizer.word_index != self.tokenizer.word_index
            ):
                raise ValueError(
                    f"ensemble member {i} has a different tokenizer — "
                    "members must share the vocabulary (same word "
                    "indices), or their per-step distributions are "
                    "not over the same events"
                )
        if isinstance(features, (list, tuple)):
            if len(features) != len(pipes):
                raise ValueError(
                    f"{len(features)} feature arrays for {len(pipes)} "
                    "models (pass one ndarray to share features)"
                )
            feats = tuple(
                jnp.asarray(f, p._infer_dtype())
                for f, p in zip(features, pipes)
            )
        else:
            feats = tuple(
                jnp.asarray(features, p._infer_dtype()) for p in pipes
            )
        params = tuple(p._inference_params()["decoder"] for p in pipes)
        cache_key = (
            "ensemble",
            method,
            beam_width,
            tuple(weights) if weights is not None else None,
            tuple(id(p) for p in pipes),
        )
        fn = self._decode_cache.get(cache_key)
        if fn is None:
            from tpucap.decode import EnsembleDecoder

            ens = EnsembleDecoder(
                [p.decoder for p in pipes], weights=weights
            )
            start_id, end_id = self._token_ids()
            dcfg = self.config.decode
            matmul_precision = (
                "highest" if self.config.precision == "f32" else "default"
            )

            if method == "greedy":

                @jax.jit
                def fn(params, features):
                    with jax.default_matmul_precision(matmul_precision):
                        state = ens.init_state(params, features)
                        return greedy_decode(
                            ens.step,
                            params,
                            state,
                            start_id=start_id,
                            end_id=end_id,
                            max_len=dcfg.max_len,
                            min_len=dcfg.min_len,
                            banned_ids=self._banned_ids(),
                            no_repeat_ngram_size=dcfg.no_repeat_ngram_size,
                        )

            else:

                @jax.jit
                def fn(params, features):
                    with jax.default_matmul_precision(matmul_precision):
                        state = ens.init_state(params, features)
                        return beam_decode(
                            ens.step,
                            params,
                            state,
                            start_id=start_id,
                            end_id=end_id,
                            max_len=dcfg.max_len,
                            beam_width=beam_width,
                            min_len=dcfg.min_len,
                            banned_ids=self._banned_ids(),
                            no_repeat_ngram_size=dcfg.no_repeat_ngram_size,
                            length_normalize=dcfg.length_normalize,
                            alpha=dcfg.alpha,
                            length_penalty=dcfg.length_penalty,
                            approx_topk=dcfg.approx_topk,
                            decoder=ens,
                        )

            self._decode_cache[cache_key] = fn
        res = fn(params, feats)
        _, end_id = self._token_ids()
        return ids_to_captions(
            self.tokenizer, res.tokens, res.lengths, end_id=end_id
        )

    def generate_speculative(
        self,
        features,
        *,
        draft: "CaptioningPipeline | tuple",
        gamma: int = 4,
    ) -> tuple[list[str], dict]:
        """Speculative greedy decode: a cheap draft model proposes
        ``gamma`` tokens per round, this pipeline's (target) decoder
        verifies them in ONE chunked forward, and the longest matching
        prefix is accepted — token-identical to ``generate(method=
        'greedy')`` by construction (decode/speculative.py), faster when
        the draft agrees often.

        ``draft``: another :class:`CaptioningPipeline` trained with the
        SAME tokenizer (token ids must align — asserted) on the same
        feature space, or a raw ``(decoder, params)`` pair. Any decoder
        family can draft (a 1-layer merge LSTM drafting for a deep
        transformer is the intended shape); the TARGET must be a KV-cache
        family (``step_chunk``), i.e. the transformer decoder.

        Returns ``(captions, stats)`` with stats =
        ``{rounds, drafted, accepted, emitted, acceptance_rate}``.
        """
        if self._banned_ids() or self.config.decode.no_repeat_ngram_size:
            raise NotImplementedError(
                "bad_words / no_repeat_ngram_size are not plumbed "
                "through the speculative draft/verify programs yet — "
                "decode with method='greedy' (token-identical) when "
                "either is configured"
            )
        if not hasattr(self.decoder, "step_chunk"):
            raise ValueError(
                "speculative decode needs a chunk-verify (KV-cache) "
                "target decoder family — decoder "
                f"{type(self.decoder).__name__} has no step_chunk "
                "(use decoder='transformer')"
            )
        dcfg = self.config.decode
        cap = getattr(self.decoder, "max_positions", None)
        if cap is not None and dcfg.max_len + gamma > cap:
            raise ValueError(
                f"max_len {dcfg.max_len} + gamma {gamma} exceeds the "
                f"decoder's KV capacity max_positions={cap} — the verify "
                "chunk would wrap (see TransformerDecoder.step_chunk)"
            )
        from tpucap.pipeline import CaptioningPipeline  # runtime (cycle)

        if isinstance(draft, CaptioningPipeline):
            if draft.tokenizer.word_index != self.tokenizer.word_index:
                raise ValueError(
                    "draft pipeline's tokenizer does not match the "
                    "target's — speculative acceptance compares token "
                    "ids, which must mean the same words"
                )
            draft_decoder = draft.decoder
            draft_params = draft._inference_params()["decoder"]
        else:
            draft_decoder, draft_params = draft
        params = self._inference_params()["decoder"]
        feats = jnp.asarray(features, self._infer_dtype())
        start_id, end_id = self._token_ids()
        matmul_precision = (
            "highest" if self.config.precision == "f32" else "default"
        )
        key = ("speculative", gamma, draft_decoder)
        fn = self._decode_cache.get(key)
        if fn is None:
            from tpucap.decode import speculative_greedy_decode

            @jax.jit
            def fn(t_params, d_params, features):
                with jax.default_matmul_precision(matmul_precision):
                    t_state = self.decoder.init_state(t_params, features)
                    d_state = draft_decoder.init_state(d_params, features)
                    return speculative_greedy_decode(
                        self.decoder.step_chunk,
                        t_params,
                        t_state,
                        draft_decoder.step,
                        d_params,
                        d_state,
                        start_id=start_id,
                        end_id=end_id,
                        max_len=dcfg.max_len,
                        min_len=dcfg.min_len,
                        gamma=gamma,
                    )

            self._decode_cache[key] = fn
        res, stats = fn(params, draft_params, feats)
        drafted = int(stats.drafted)
        stats_out = {
            "rounds": int(stats.rounds),
            "drafted": drafted,
            "accepted": int(stats.accepted),
            "emitted": int(stats.emitted),
            "acceptance_rate": (
                int(stats.accepted) / drafted if drafted else 0.0
            ),
        }
        return (
            ids_to_captions(
                self.tokenizer, res.tokens, res.lengths, end_id=end_id
            ),
            stats_out,
        )

    def generate_with_attention(
        self,
        features,
        *,
        method: str | None = None,
        beam_width: int | None = None,
    ):
        """Attention-family captions WITH their attention maps — the
        Show-Attend-Tell visualization surface (config 4), also served by
        the transformer family (last-layer head-averaged cross-attention).

        Returns ``(captions, alphas, lengths)``: alphas (B, T, L) float32
        where row t is the softmax attention over the L spatial grid
        cells the decoder attended to while emitting token t (rows past
        lengths[b] are meaningless). Reshape L to the encoder's grid
        (e.g. 14x14) and upsample over the image for overlays.

        Implementation: decode normally (greedy or beam), then teacher-
        force the generated tokens back through
        ``forward_hidden_with_alphas`` under the SAME matmul-precision
        contract — the recurrence is deterministic, so this reproduces
        exactly the (h, c) trajectory and attention weights the decode
        loop used (the chosen beam's path, for beam search).
        """
        if not hasattr(self.decoder, "forward_hidden_with_alphas"):
            raise ValueError(
                "generate_with_attention requires a decoder exposing "
                "forward_hidden_with_alphas (the attention or transformer "
                f"family); got {type(self.decoder).__name__}"
            )
        method = method or self.config.decode.method
        beam_width = beam_width or self.config.decode.beam_width
        if method not in ("greedy", "beam"):
            raise ValueError(
                f"generate_with_attention supports greedy|beam, got "
                f"{method!r}"
            )
        params = self._inference_params()["decoder"]
        feats = jnp.asarray(features, self._infer_dtype())
        res = self._decode_fn(method, beam_width)(params, feats)
        start_id, end_id = self._token_ids()
        tokens = np.asarray(res.tokens)
        lengths = np.asarray(res.lengths)
        # Input at step t is the previous output (start token at t=0).
        tf_tokens = np.concatenate(
            [
                np.full((tokens.shape[0], 1), start_id, np.int32),
                tokens[:, :-1],
            ],
            axis=1,
        )
        fn = self._decode_cache.get("alphas")
        if fn is None:
            matmul_precision = (
                "highest" if self.config.precision == "f32" else "default"
            )

            @jax.jit
            def fn(params, features, tokens):
                with jax.default_matmul_precision(matmul_precision):
                    _, alphas = self.decoder.forward_hidden_with_alphas(
                        params, features, tokens
                    )
                return alphas.astype(jnp.float32)

            self._decode_cache["alphas"] = fn
        alphas = np.asarray(fn(params, feats, jnp.asarray(tf_tokens)))
        captions = ids_to_captions(
            self.tokenizer, tokens, lengths, end_id=end_id
        )
        return captions, alphas, lengths

