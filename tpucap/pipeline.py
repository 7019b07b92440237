"""High-level captioning pipeline — the reference's public API, TPU-native.

`CaptioningPipeline` ties together encoder, decoder, tokenizer, decode
engines, training, checkpointing and evaluation, mirroring the reference's
script surface (SURVEY.md §2.1, §3):

    reference                          tpucap
    ---------                          ------
    extract_features(dir)          ->  pipeline.extract_features(paths)
    create_tokenizer(descriptions) ->  pipeline.fit_tokenizer(descriptions)
    define_model(...)              ->  CaptioningPipeline(config)
    train loop                     ->  pipeline.fit(...)
    generate_desc(model, tok, ...) ->  pipeline.generate(features)
    beam_search_desc(...)          ->  pipeline.generate(features, beam_width=k)
    evaluate_model(...)            ->  pipeline.evaluate(...)

The decode path is batched and jit-compiled once per (batch, beam) shape;
features flow encoder -> decoder fully on device.
"""

from __future__ import annotations

from typing import Any, Iterable

import jax
import jax.numpy as jnp
import numpy as np

from tpucap.config import Config
from tpucap.core import pad_rows
from tpucap.data.preprocess import preprocess_batch
from tpucap.decode import beam_decode, greedy_decode, ids_to_captions
from tpucap.models.decoders import build_decoder
from tpucap.models.encoders import build_encoder
from tpucap.text import Tokenizer
from tpucap.text.clean import END_TOKEN, START_TOKEN
from tpucap.train import TrainState
from tpucap.train.evaluate import evaluate_captions


from tpucap.pipeline_decoding import _PipelineDecoding
from tpucap.pipeline_training import _PipelineTraining


class CaptioningPipeline(_PipelineTraining, _PipelineDecoding):
    def __init__(self, config: Config, tokenizer: Tokenizer | None = None):
        self.config = config
        self.encoder = build_encoder(
            config.encoder.name, config.encoder.features
        )
        self.tokenizer = tokenizer
        self.decoder = None
        self.params: dict = {}
        self.state: TrainState | None = None
        self._mesh = None
        self._decode_cache: dict = {}
        self._encode_fn = None
        self._freeze_embeddings = False

    # -- tokenizer ---------------------------------------------------------

    def fit_tokenizer(
        self,
        descriptions: dict[str, list[str]],
        *,
        kind: str = "word",
        bpe_vocab_size: int = 1024,
    ):
        """Fit the vocabulary on the caption corpus. ``kind='word'``
        (default) is the Keras-parity word tokenizer — the reference's
        behavior. ``kind='bpe'`` fits a subword vocabulary of
        ``bpe_vocab_size`` pieces (text/bpe.py): no OOV words, bounded
        embedding/vocab-projection size — the production choice for
        open-vocabulary corpora (pairs naturally with the transformer
        family)."""
        all_caps = [c for caps in descriptions.values() for c in caps]
        if kind == "word":
            tok = Tokenizer()
        elif kind == "bpe":
            from tpucap.text import BpeTokenizer

            tok = BpeTokenizer(bpe_vocab_size)
        else:
            raise ValueError(f"unknown tokenizer kind {kind!r}")
        tok.fit_on_texts(all_caps)
        self.tokenizer = tok
        return tok

    @property
    def vocab_size(self) -> int:
        if self.tokenizer is None:
            return self.config.vocab_size
        return self.tokenizer.vocab_size

    def _token_ids(self):
        wi = self.tokenizer.word_index
        return wi[START_TOKEN], wi[END_TOKEN]

    def _banned_ids(self) -> tuple:
        """``DecodeConfig.bad_words`` -> static sorted token-id tuple.
        Words are lowercased against the tokenizer vocabulary;
        out-of-vocabulary entries are dropped (the decoder can never
        emit an id the vocabulary doesn't hold). Static by design — the
        blocklist is part of the compiled decode program, costing one
        fused scatter per step."""
        words = self.config.decode.bad_words
        if not words:
            return ()
        if hasattr(self.tokenizer, "decode_ids"):
            # Subword vocabulary: a banned WORD decomposes into pieces
            # shared with other words — masking piece ids would ban far
            # more than the word. Needs sequence-level constraint
            # tracking; refuse rather than over-block.
            raise NotImplementedError(
                "bad_words requires the word-level tokenizer (a subword "
                "piece mask would block unrelated words)"
            )
        # Normalize each entry through the SAME pipeline captions were
        # tokenized with (filters + lowercase + split) — a blocklist
        # line like "Damn!" or "shut up" must ban the vocabulary words
        # it contains, not be silently dropped as unknown. Words the
        # model can never emit (OOV or num_words-capped) drop out.
        return tuple(
            sorted(
                {
                    i
                    for entry in words
                    for _, i in self._normalize_vocab_entry(entry)
                    if i is not None
                }
            )
        )

    def _normalize_vocab_entry(self, entry: str):
        """Run ``entry`` through the tokenizer's OWN normalization
        (filters + lowercase + split) and look up each resulting
        word's model-emittable id -> [(word, id_or_None)]. ``None``
        marks a word the model head can never emit: absent from
        word_index, or at/above the num_words cap (a capped tokenizer
        keeps the FULL word_index while the head is capped — an
        id >= V would be an out-of-bounds gather in the engines).
        Single source of truth for "is this a vocabulary word", shared
        by bad_words (drops None) and include_words (raises on None)
        so the two dials can never disagree about the rule."""
        from tpucap.text import text_to_word_sequence
        from tpucap.text.tokenizer import DEFAULT_FILTERS

        tok = self.tokenizer
        wi = tok.word_index
        return [
            (w, wi[w] if w in wi and wi[w] < self.vocab_size else None)
            for w in text_to_word_sequence(
                entry,
                filters=getattr(tok, "filters", DEFAULT_FILTERS),
                lower=getattr(tok, "lower", True),
            )
        ]

    # -- model construction ------------------------------------------------

    def build(self, rng=None, init_params: bool = True):
        """Construct the decoder and (by default) random-initialize params.

        ``init_params=False`` builds only the model objects — used by
        :meth:`load`, which restores a saved param tree immediately after
        and would otherwise pay a full random init (hundreds of MB for
        VGG16's fc kernels) just to discard it."""
        d = self.config.decoder
        if (
            d.name == "transformer"
            and d.max_positions < self.config.decode.max_len + 1
        ):
            raise ValueError(
                f"decoder.max_positions {d.max_positions} cannot hold "
                f"decode.max_len {self.config.decode.max_len} generated "
                "tokens plus the start token"
            )
        self.decoder = build_decoder(
            d.name,
            vocab_size=self.vocab_size,
            feature_dim=self.config.encoder.feature_dim,
            embed_dim=d.embed_dim,
            hidden_dim=d.hidden_dim,
            num_layers=d.num_layers,
            dropout_rate=d.dropout_rate,
            attention_dim=d.attention_dim,
            num_heads=d.num_heads,
            mlp_dim=d.mlp_dim,
            max_positions=d.max_positions,
            num_experts=d.num_experts,
            moe_top_k=d.moe_top_k,
        )
        if init_params:
            rng = rng if rng is not None else jax.random.key(
                self.config.train.seed
            )
            enc_rng, dec_rng = jax.random.split(rng)
            self.params = {
                "encoder": self.encoder.init(enc_rng),
                "decoder": self.decoder.init(dec_rng),
            }
        self._decode_cache.clear()
        self._encode_fn = None
        self._bf16_params = None
        return self.params

    def fold_bn(self) -> None:
        """Fold inference BatchNorms into conv weights (exact; saves one
        full-activation elementwise pass per conv). Call after loading
        pretrained encoder params."""
        from tpucap.models.encoders.fold_bn import fold_batch_norms

        self.params["encoder"] = fold_batch_norms(
            self.config.encoder.name, self.params["encoder"]
        )
        self._encode_fn = None
        self._decode_cache.clear()
        self._bf16_params = None

    def set_pretrained_embeddings(
        self, source, *, freeze: bool = False, log=print
    ) -> int:
        """Initialize the decoder's embedding table from pretrained word
        vectors (the reference genre's GloVe recipe — SURVEY.md §2.2
        Embedding row; tpucap.text.embeddings).

        ``source`` is a path to a GloVe-format text file, a
        ``{word: vector}`` dict, or a ready ``(vocab_size, embed_dim)``
        matrix. Rows for words without a vector (and padding row 0) stay
        zero. ``freeze=True`` pins the table for subsequent fit() calls
        by masking the optimizer UPDATES (so adamw weight decay cannot
        move it either — the finetune.py freeze rule); supported under
        parallelism 'none' and 'dp', which train on the canonical param
        layout. Returns the pretrained-row hit count.
        """
        from tpucap.text.embeddings import (
            build_embedding_matrix,
            load_word_vectors,
        )

        if self.decoder is None:
            self.build()
        table = self.params["decoder"]["embedding"]["table"]
        if isinstance(source, str):
            source = load_word_vectors(source)
        if isinstance(source, dict):
            if self.tokenizer is None:
                raise ValueError(
                    "a fitted tokenizer is required to index word vectors "
                    "— call fit_tokenizer() first or pass a matrix"
                )
            matrix, hits = build_embedding_matrix(
                self.tokenizer,
                source,
                embed_dim=table.shape[1],
                vocab_size=table.shape[0],
            )
        else:
            matrix, hits = np.asarray(source), None
        if matrix.shape != table.shape:
            raise ValueError(
                f"embedding matrix shape {matrix.shape} != decoder "
                f"table shape {tuple(table.shape)}"
            )
        self.params["decoder"]["embedding"]["table"] = jnp.asarray(
            matrix, table.dtype
        )
        self._freeze_embeddings = freeze
        self._decode_cache.clear()
        self._bf16_params = None
        if log and hits is not None:
            log(
                f"pretrained embeddings: {hits}/{table.shape[0] - 1} vocab "
                f"words covered ({100.0 * hits / max(1, table.shape[0] - 1):.1f}%)"
                + (", table frozen" if freeze else "")
            )
        return hits if hits is not None else int(matrix.shape[0])

    def quantize_encoder(self) -> None:
        """Quantize the frozen encoder to int8 serving weights (per-channel
        kernel scales + dynamic per-tensor activation scales — see
        models/encoders/quantize.py). Folds BatchNorms first (quantizing
        an unfolded kernel then folding would perturb the rounded values).
        The decoder is untouched: its matmuls are latency- not FLOP-bound
        (docs/PERF.md decode trace)."""
        from tpucap.models.encoders.fold_bn import fold_batch_norms
        from tpucap.models.encoders.quantize import quantize_encoder_params

        folded = fold_batch_norms(
            self.config.encoder.name, self.params["encoder"]
        )
        self.params["encoder"] = quantize_encoder_params(folded)
        self._encode_fn = None
        self._decode_cache.clear()
        self._bf16_params = None

    def quantize_vocab_projection(self) -> None:
        """Quantize the decoder's output (vocab) projection to int8 serving
        weights (models/encoders/quantize.quantize_decoder_projection).
        Aimed at small-batch / latency serving, where each decode step is
        bound by re-reading the (hidden x vocab) kernel from HBM — int8
        halves that traffic vs bf16. Serving-only: call after ``fit`` (or
        on a loaded bundle); training params must stay float. Not
        compatible with vocab-sharded TP serving (use None/'dp')."""
        from tpucap.models.encoders.quantize import (
            quantize_decoder_projection,
        )

        self.params["decoder"] = quantize_decoder_projection(
            self.params["decoder"]
        )
        self._decode_cache.clear()
        self._bf16_params = None

    # -- precision ----------------------------------------------------------

    def _infer_dtype(self):
        return (
            jnp.bfloat16
            if self.config.precision == "bf16"
            else jnp.float32
        )

    def _inference_params(self):
        """Params used on the inference paths; a cached bf16 copy when
        config.precision='bf16' (the ~34%-faster serving flow), the
        training params otherwise. The cache is invalidated wherever
        self.params changes (build/fit/fold_bn/load) — self.params is
        mutated in place, so identity checks can't detect staleness."""
        if self.config.precision != "bf16":
            return self.params
        cached = getattr(self, "_bf16_params", None)
        if cached is not None:
            return cached
        from tpucap.models.encoders.quantize import (
            cast_bf16_preserving_quant,
        )

        cast = cast_bf16_preserving_quant(self.params)
        self._bf16_params = cast
        return cast

    # -- feature extraction (reference: extract_features) ------------------

    def _apply_encoder(self, params, x):
        """Encoder apply + spatial flattening: the attention decoder
        consumes (B, L, D) grids, encoders emit (B, H, W, C)."""
        feats = self.encoder.apply(params, x)
        if self.config.encoder.features == "spatial":
            B, H, W, C = feats.shape
            feats = feats.reshape(B, H * W, C)
        return feats

    def extract_features(
        self,
        image_paths: Iterable,
        batch_size: int = 32,
        *,
        parallelism: str | None = None,
    ) -> np.ndarray:
        """Decode+preprocess on host, encode on device, batched.

        parallelism='dp' runs the encoder under shard_map with the batch
        sharded over the data mesh (SURVEY §3.1 rebuild trace); tail
        chunks are zero-padded to ``batch_size`` and trimmed, so exactly
        one program compiles. batch_size must divide by the mesh size."""
        paths = list(image_paths)
        size = self.encoder.input_size
        mode = self.encoder.preprocess_mode
        dtype = self._infer_dtype()
        enc_params = self._inference_params()["encoder"]
        if parallelism in (None, "none"):
            if self._encode_fn is None:
                self._encode_fn = jax.jit(self._apply_encoder)
            encode_fn = self._encode_fn
            # Tail chunks are padded here too: an unpadded tail is a new
            # program shape, and a recompile over the TPU tunnel costs
            # minutes (docs/PERF.md).
            pad_batches = True
        elif parallelism == "dp":
            from jax import shard_map
            from jax.sharding import PartitionSpec as P

            mesh = self._inference_mesh("dp")
            n_mesh = dict(mesh.shape)["data"]
            if batch_size % n_mesh:
                raise ValueError(
                    f"batch_size {batch_size} must divide by the "
                    f"{n_mesh}-device data mesh"
                )
            encode_fn = self._decode_cache.get(("extract_dp",))
            if encode_fn is None:
                encode_fn = jax.jit(
                    shard_map(
                        self._apply_encoder,
                        mesh=mesh,
                        in_specs=(P(), P("data")),
                        out_specs=P("data"),
                        check_vma=False,
                    )
                )
                self._decode_cache[("extract_dp",)] = encode_fn
            pad_batches = True
        else:
            raise ValueError(
                "extract_features supports parallelism None|'none'|'dp'"
            )
        outs = []
        for s in range(0, len(paths), batch_size):
            chunk = paths[s : s + batch_size]
            x = preprocess_batch(chunk, size=size, mode=mode)
            n = x.shape[0]
            if pad_batches:
                x = pad_rows(x, batch_size)
            feats = encode_fn(enc_params, jnp.asarray(x, dtype))
            outs.append(np.asarray(feats, dtype=np.float32)[:n])
        return np.concatenate(outs, axis=0)

    def encode_images(self, images) -> jnp.ndarray:
        """Preprocessed image batch -> features, on device."""
        if self._encode_fn is None:
            self._encode_fn = jax.jit(self._apply_encoder)
        return self._encode_fn(
            self._inference_params()["encoder"],
            jnp.asarray(images, self._infer_dtype()),
        )

    def caption_images(self, image_paths, **kw) -> list[str]:
        """One-call demo path (reference's single-image script, §2.1 #13)."""
        feats = self.extract_features(list(image_paths))
        return self.generate(feats, **kw)

    # -- config-5 serving path: JPEG -> encoder -> beam, batched + overlapped

    def caption_dataset(
        self,
        image_paths,
        *,
        batch_size: int = 256,
        method: str | None = None,
        beam_width: int | None = None,
        num_workers: int = 0,
        fast_scale: bool = True,
        parallelism: str | None = None,
    ) -> list[str]:
        """Full-pipeline batched captioning (BASELINE config 5): C++ JPEG
        decode on the host -> uint8 device transfer -> fused on-device
        resize/normalize -> encoder -> beam/greedy decode, ONE compiled
        program per batch. Host decode of batch i+1 overlaps device compute
        of batch i via JAX's async dispatch (results are fetched one batch
        behind).

        parallelism='dp' shards each batch (images, encoder AND decode)
        over the data mesh — the judged config-5 serving layout (batch 256
        on v5e-8 = 32 images/chip); batch_size must divide by the mesh
        size. For vocab-sharded decode use ``generate`` with 'tp'/'dp_tp'.
        """
        from tpucap.data.pipeline import image_batch_loader
        from tpucap.ops.preprocess import normalize_images

        method = method or self.config.decode.method
        beam_width = beam_width or self.config.decode.beam_width
        start_id, end_id = self._token_ids()
        dcfg = self.config.decode
        size = self.encoder.input_size
        mode = self.encoder.preprocess_mode

        if parallelism not in (None, "none", "dp"):
            raise ValueError(
                "caption_dataset supports parallelism None|'none'|'dp'; "
                "use generate() for 'tp'/'dp_tp'"
            )
        dp = parallelism == "dp"
        if dp:
            mesh = self._inference_mesh("dp")
            n_mesh = dict(mesh.shape)["data"]
            if batch_size % n_mesh:
                raise ValueError(
                    f"batch_size {batch_size} must divide by the "
                    f"{n_mesh}-device data mesh"
                )

        inf_params = self._inference_params()

        # Cache the compiled program across caption_dataset calls (a fresh
        # closure per call would retrace/recompile every time).
        cache_key = ("dataset", method, beam_width, "dp" if dp else "none")
        run = self._decode_cache.get(cache_key)
        if run is None:

            def body(enc_params, dec_params, images_u8):
                x = normalize_images(
                    images_u8, mode, out_dtype=self._infer_dtype()
                )
                feats = self._apply_encoder(enc_params, x)
                state = self.decoder.init_state(dec_params, feats)
                if method == "greedy":
                    return greedy_decode(
                        self.decoder.step,
                        dec_params,
                        state,
                        start_id=start_id,
                        end_id=end_id,
                        max_len=dcfg.max_len,
                        min_len=dcfg.min_len,
                        banned_ids=self._banned_ids(),
                        no_repeat_ngram_size=dcfg.no_repeat_ngram_size,
                    )
                return beam_decode(
                    self.decoder.step,
                    dec_params,
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

            if dp:
                from jax import shard_map
                from jax.sharding import PartitionSpec as P

                body = shard_map(
                    body,
                    mesh=mesh,
                    in_specs=(P(), P(), P("data")),
                    out_specs=P("data"),
                    check_vma=False,
                )
            jitted = jax.jit(body)
            # Same f32-parity precision contract as _decode_fn; the
            # context must be active when the jit traces.
            matmul_precision = (
                "highest" if self.config.precision == "f32" else "default"
            )

            def run(enc_params, dec_params, images_u8):
                with jax.default_matmul_precision(matmul_precision):
                    return jitted(enc_params, dec_params, images_u8)

            self._decode_cache[cache_key] = run

        paths = list(image_paths)
        pending: list[tuple[int, Any]] = []
        results: dict[int, list[str]] = {}

        def drain(entry):
            idx, (res, n) = entry
            caps = ids_to_captions(
                self.tokenizer, res.tokens[:n], res.lengths[:n], end_id=end_id
            )
            results[idx] = caps

        for i, (chunk, images) in enumerate(
            image_batch_loader(
                paths,
                size=size,
                batch_size=batch_size,
                num_workers=num_workers,
                fast_scale=fast_scale,
            )
        ):
            n = images.shape[0]
            images = pad_rows(images, batch_size)  # static shapes
            res = run(
                inf_params["encoder"], inf_params["decoder"], images
            )
            pending.append((i, (res, n)))
            # Fetch one batch behind so host decode overlaps device compute.
            if len(pending) > 1:
                drain(pending.pop(0))
        for entry in pending:
            drain(entry)
        return [c for _, caps in sorted(results.items()) for c in caps]

    # -- persistence -------------------------------------------------------

    def save(self, directory: str) -> None:
        """Save a self-contained inference bundle: config + tokenizer +
        encoder/decoder params (orbax). Replaces the reference's scattered
        tokenizer.pkl + model.h5 artifacts."""
        import dataclasses
        import json
        import os

        import orbax.checkpoint as ocp

        directory = os.path.abspath(directory)
        os.makedirs(directory, exist_ok=True)
        with open(os.path.join(directory, "config.json"), "w") as f:
            json.dump(dataclasses.asdict(self.config), f, indent=2)
        if self.tokenizer is not None:
            self.tokenizer.save(os.path.join(directory, "tokenizer.json"))
        ckptr = ocp.StandardCheckpointer()
        path = os.path.join(directory, "params")
        if os.path.exists(path):
            import shutil

            shutil.rmtree(path)
        ckptr.save(path, jax.device_get(self.params))
        ckptr.wait_until_finished()

    def reload_params(self, source) -> None:
        """Hot-swap model weights IN PLACE — the zero-downtime serving
        update (a retrained checkpoint replaces the live weights without
        restarting the server or recompiling a single program).

        ``source``: a :meth:`save` bundle directory, or a params tree
        with the same {'encoder','decoder'} layout as ``self.params``.

        Validation before anything is touched: the new tree must have
        the identical structure and identical per-leaf shapes AND dtypes
        (so every compiled decode/encode program — which takes params as
        ARGUMENTS — remains valid: weight-only reload never retraces);
        for a bundle, the decoder/encoder config sections and the
        tokenizer artifact must match exactly (a different vocab would
        silently detokenize wrong captions). On any mismatch this raises
        and the current weights keep serving.

        Note this deliberately does NOT clear the decode-program cache:
        the validated swap is the point — new weights ride the cached
        XLA executables untouched.
        """
        import dataclasses
        import json
        import os

        if isinstance(source, (str, os.PathLike)):
            directory = os.path.abspath(os.fspath(source))
            with open(os.path.join(directory, "config.json")) as f:
                d = json.load(f)
            ours = dataclasses.asdict(self.config)
            for section in ("encoder", "decoder"):
                if d.get(section) != ours[section]:
                    raise ValueError(
                        f"bundle {section} config differs from the live "
                        f"pipeline's — reload_params swaps weights only; "
                        f"load() a new pipeline for a topology change"
                    )
            tok_path = os.path.join(directory, "tokenizer.json")
            if self.tokenizer is not None and os.path.exists(tok_path):
                with open(tok_path) as f:
                    theirs = json.load(f)
                if theirs != json.loads(self.tokenizer.to_json()):
                    raise ValueError(
                        "bundle tokenizer differs from the live "
                        "pipeline's — reloading would detokenize with "
                        "the wrong vocabulary"
                    )
            import orbax.checkpoint as ocp

            ckptr = ocp.StandardCheckpointer()
            new = jax.tree_util.tree_map(
                jnp.asarray,
                ckptr.restore(os.path.join(directory, "params")),
            )
        else:
            new = jax.tree_util.tree_map(jnp.asarray, source)

        old_struct = jax.tree_util.tree_structure(self.params)
        new_struct = jax.tree_util.tree_structure(new)
        if old_struct != new_struct:
            raise ValueError(
                f"param tree structure differs: {new_struct} != "
                f"{old_struct}"
            )
        old_leaves = jax.tree_util.tree_leaves_with_path(self.params)
        new_leaves = jax.tree_util.tree_leaves(new)
        for (path, o), n in zip(old_leaves, new_leaves):
            if o.shape != n.shape or o.dtype != n.dtype:
                raise ValueError(
                    "param leaf "
                    f"{jax.tree_util.keystr(path)} changed: "
                    f"{n.shape}/{n.dtype} != {o.shape}/{o.dtype} — "
                    "reload_params requires identical topology"
                )
        self.params = new
        self._bf16_params = None

    @classmethod
    def load(cls, directory: str) -> "CaptioningPipeline":
        import json
        import os

        import orbax.checkpoint as ocp

        from tpucap.config import config_from_dict

        directory = os.path.abspath(directory)
        with open(os.path.join(directory, "config.json")) as f:
            d = json.load(f)
        config = config_from_dict(d)
        from tpucap.text import load_tokenizer

        tokenizer = load_tokenizer(
            os.path.join(directory, "tokenizer.json")
        )
        pipe = cls(config, tokenizer=tokenizer)
        pipe.build(init_params=False)  # params come from the bundle below
        ckptr = ocp.StandardCheckpointer()
        # Restore the raw saved tree rather than against build()'s float
        # template: a quantized bundle carries int8 kernels +
        # kernel_scale leaves the template doesn't have (and must NOT be
        # cast back to float).
        pipe.params = jax.tree_util.tree_map(
            jnp.asarray, ckptr.restore(os.path.join(directory, "params"))
        )
        pipe._bf16_params = None
        return pipe

    # -- evaluation (reference: evaluate_model) ----------------------------

    def evaluate(
        self,
        descriptions: dict[str, list[str]],
        features: dict[str, np.ndarray],
        *,
        batch_size: int = 64,
        method: str | None = None,
        beam_width: int | None = None,
        parallelism: str | None = None,
        metrics: tuple = ("bleu",),
        return_captions: bool = False,
        meteor_synonyms=None,
    ):
        """Batched decode + NLTK corpus BLEU-1..4. The tail chunk is
        zero-padded to ``batch_size`` so evaluation compiles exactly ONE
        program per (batch, beam) shape — an unpadded tail would retrace,
        and a recompile over the TPU tunnel costs minutes (docs/PERF.md).
        ``parallelism`` as in :meth:`generate`. ``metrics`` adds 'cider'
        (CIDEr-D) / 'rouge_l' / 'meteor' beyond the reference-parity
        BLEU default (tpucap.train.metrics). ``return_captions=True``
        returns (scores, {image_id: caption}) — the error-analysis
        surface (CLI ``evaluate --dump-captions``)."""
        ids = list(descriptions.keys())
        generated = {}
        for s in range(0, len(ids), batch_size):
            chunk = ids[s : s + batch_size]
            feats = np.stack([features[i] for i in chunk])
            n = len(chunk)
            feats = pad_rows(feats, batch_size)
            caps = self.generate(
                feats,
                method=method,
                beam_width=beam_width,
                parallelism=parallelism,
            )[:n]
            generated.update(dict(zip(chunk, caps)))
        scores = evaluate_captions(
            descriptions,
            generated,
            metrics=metrics,
            meteor_synonyms=meteor_synonyms,
        )
        if return_captions:
            return scores, generated
        return scores
