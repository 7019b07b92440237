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
import optax

from tpucap.config import Config
from tpucap.core import (
    make_mesh,
    pad_rows,
    pad_to_multiple,
    shard_batch,
    shard_stacked_batch,
)
from tpucap.data.preprocess import preprocess_batch
from tpucap.decode import beam_decode, greedy_decode, ids_to_captions
from tpucap.models.decoders import build_decoder
from tpucap.models.encoders import build_encoder
from tpucap.parallel import make_dp_train_step
from tpucap.text import Tokenizer
from tpucap.text.clean import END_TOKEN, START_TOKEN
from tpucap.train import TrainState, build_training_batch, make_train_step
from tpucap.train.evaluate import evaluate_captions
from tpucap.train.sequences import batch_iterator


def _sentinel_save(mgr, state) -> None:
    """Save a MID-EPOCH checkpoint (preemption rescue / step-interval):
    a METRIC-LESS checkpoint, so best-checkpoint selection stays
    epoch-driven AND retention cannot evict it (a never-best sentinel
    metric would be classified worst-of-N by orbax's best-fn retention
    and deleted inside the save call once max_to_keep better
    checkpoints exist — the rescue must instead be exempt from the
    metric policy entirely; CheckpointManager.save_rescue owns that
    plus the one-rescue-at-a-time cleanup)."""
    if hasattr(mgr, "save_rescue"):
        mgr.save_rescue(state)
        return
    # Duck-typed managers (tests): plain metric-less save with the same
    # same-step dedup.
    cur = int(jax.device_get(state.step))
    if mgr.latest_step() == cur:
        return
    mgr.save(state, metrics=None)


class CaptioningPipeline:
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

    # -- training ----------------------------------------------------------

    def fit(
        self,
        descriptions: dict[str, list[str]],
        features: dict[str, np.ndarray],
        *,
        epochs: int | None = None,
        batch_size: int | None = None,
        data_parallel: bool = False,
        parallelism: str | None = None,
        checkpoint_manager=None,
        val_data=None,
        stream: bool = False,
        prefetch: int = 2,
        resume: bool = False,
        handle_preemption: bool = False,
        preemption_guard=None,
        log=print,
    ):
        """parallelism: 'none' | 'dp' (batch sharded, psum grads) | 'tp'
        (vocab-sharded CE over the mesh) | 'dp_tp' (2-D batch x vocab
        mesh, model-axis width from config.mesh.model_devices) | 'pp'
        (GPipe pipeline over a stage axis — transformer decoder only,
        num_layers divisible by the stage count) | 'dp_pp' (2-D batch x
        stage mesh, stage width from config.mesh.model_devices) | 'ep'
        (expert-parallel MoE — transformer with num_experts > 0) |
        'dp_ep' (2-D batch x expert mesh) | 'sp' (ring-attention
        sequence parallel — transformer; the teacher-forced length is
        auto-padded to a ring multiple, needing decoder max_positions
        headroom) | 'dp_sp' (2-D batch x sequence mesh) | 'fsdp'
        (ZeRO-style fully-sharded data parallel: params/grads/optimizer
        state live 1/N per device over the data axis, gathered
        just-in-time per step — the memory-scaling variant of 'dp',
        update-exact; any decoder family).
        ``data_parallel=True`` is the back-compat spelling of
        parallelism='dp'.

        ``stream=True`` is the at-scale input path: tokens materialize
        (tiny), but feature rows are assembled PER BATCH by indexing
        ``features[image_id]`` — pass a lazy mapping (an uncompressed
        ``np.load('feats.npz')`` handle, a memmap-backed store) and peak
        host memory is one batch instead of the full (N, F) stack. A
        background thread prefetches ``prefetch`` assembled (and, under
        dp/fsdp, device-placed) batches so disk reads + H2D overlap the
        device step. Batch visit order is IDENTICAL to stream=False
        under the same seed, so the two paths produce the same training
        trajectory (tests/test_stream_fit.py).

        ``handle_preemption=True`` installs a SIGTERM guard
        (train/preemption.py): on the first signal the loop finishes
        the in-flight step, writes a MID-EPOCH rescue checkpoint, and
        returns with a ``{"preempted": True}`` final history entry.
        ``resume=True`` (needs ``checkpoint_manager``) restores the
        latest checkpoint and continues from its exact epoch/batch
        position — the position is derived from the checkpoint's step
        counter and the shuffle rng is fast-forwarded by replaying the
        consumed permutations, so the resumed trajectory is
        bit-identical to an uninterrupted run (tests/test_preemption.py;
        parallelism none|dp, no ema).

        ``TrainConfig.checkpoint_every_steps=N`` additionally writes a
        mid-epoch checkpoint every N optimizer steps (never-best
        sentinel metric; restored by ``resume=True`` at the exact
        position) — bounds a HARD kill's lost work to < N steps on
        long epochs, complementing the SIGTERM grace path."""
        cfg = self.config.train
        epochs = epochs or cfg.epochs
        batch_size = batch_size or cfg.batch_size
        if parallelism is None:
            parallelism = "dp" if data_parallel else "none"
        # fsdp shards the batch over the same data axis as dp.
        data_parallel = parallelism in ("dp", "fsdp")
        if self.decoder is None:
            self.build()

        if stream:
            from tpucap.train.sequences import build_training_tokens

            stream_ids, T = build_training_tokens(
                self.tokenizer, descriptions, self.config.decode.max_len
            )
            F = None
        else:
            F, T = build_training_batch(
                self.tokenizer,
                descriptions,
                features,
                self.config.decode.max_len,
            )
        if T.shape[0] < batch_size:
            # batch_iterator drops the remainder (fixed program shapes), so
            # a dataset smaller than one batch would run ZERO steps per
            # epoch. Clamp so tiny (fixture-scale) datasets still train;
            # any mesh-divisibility check below applies to the clamped size.
            if log:
                log(
                    f"batch_size {batch_size} > {T.shape[0]} training rows; "
                    f"clamping batch_size to {T.shape[0]}"
                )
            batch_size = T.shape[0]
        from tpucap.train import build_optimizer

        optimizer = build_optimizer(
            cfg, total_steps=epochs * max(1, T.shape[0] // batch_size)
        )
        if self._freeze_embeddings:
            if parallelism not in ("none", "dp", "fsdp"):
                raise NotImplementedError(
                    "freeze_embeddings masks the canonical-layout "
                    f"'embedding' subtree; parallelism={parallelism!r} "
                    "trains on a transformed layout — unfreeze or use "
                    "'none'/'dp'"
                )
            # Zero the UPDATES (not just gradients) for the embedding
            # table, so grad-independent optimizer terms (adamw weight
            # decay) cannot move the frozen pretrained vectors — the
            # same rule as train/finetune.py freeze_encoder. The wrapper
            # is state-transparent: opt_state (and thus checkpoint
            # restore templates) match the unfrozen optimizer exactly.
            from tpucap.train import freeze_subtree_updates

            optimizer = freeze_subtree_updates(
                optimizer,
                lambda path: getattr(path[0], "key", None) == "embedding",
            )
        self.state = TrainState.create(
            self.params["decoder"], optimizer, jax.random.key(cfg.seed)
        )
        unpad_to = None  # set if tp/dp_tp pads the vocab to shard evenly
        pp_layout = False  # set if pp/dp_pp trains on stacked layer params

        if cfg.grad_accum_steps > 1 and parallelism not in (
            "none", "dp", "fsdp"
        ):
            raise NotImplementedError(
                f"grad_accum_steps={cfg.grad_accum_steps} is wired into "
                f"the single-device and data-parallel steps only; "
                f"parallelism={parallelism!r} runs its own loss "
                "schedule — drop the flag or use 'none'/'dp'"
            )
        if cfg.precision not in ("f32", "bf16"):
            raise ValueError(
                f"TrainConfig.precision={cfg.precision!r}; have f32|bf16"
            )
        if cfg.precision == "bf16" and parallelism not in (
            "none", "dp", "fsdp"
        ):
            raise NotImplementedError(
                "precision='bf16' is wired into the single-device and "
                f"data-parallel steps only; parallelism={parallelism!r} "
                "runs its own loss program — drop the flag or use "
                "'none'/'dp'"
            )
        compute_dtype = (
            jnp.bfloat16 if cfg.precision == "bf16" else None
        )
        if cfg.ema_decay and parallelism not in ("none", "dp"):
            raise NotImplementedError(
                f"ema_decay={cfg.ema_decay} tracks canonical-layout "
                f"params; parallelism={parallelism!r} trains on a "
                "transformed layout (stacked stages / padded vocab) — "
                "drop the flag or use 'none'/'dp'"
            )
        use_ss = cfg.scheduled_sampling > 0
        if use_ss:
            if not 0.0 < cfg.scheduled_sampling <= 1.0:
                raise ValueError(
                    f"scheduled_sampling={cfg.scheduled_sampling} must "
                    "be a probability in (0, 1]"
                )
            if cfg.ss_schedule not in (
                "linear", "inv_sigmoid", "constant"
            ):
                raise ValueError(
                    f"unknown ss_schedule {cfg.ss_schedule!r}; "
                    "have linear|inv_sigmoid|constant"
                )
            if parallelism not in ("none", "dp"):
                raise NotImplementedError(
                    "scheduled_sampling is wired into the single-device "
                    f"and data-parallel steps; parallelism="
                    f"{parallelism!r} runs its own loss program — drop "
                    "the flag or use 'none'/'dp'"
                )
        spd = cfg.steps_per_dispatch
        if spd < 1:
            raise ValueError(
                f"steps_per_dispatch={spd} must be >= 1"
            )
        if spd > 1:
            if parallelism not in ("none", "dp"):
                raise NotImplementedError(
                    "steps_per_dispatch scans the single-device/"
                    f"data-parallel step body; parallelism="
                    f"{parallelism!r} builds its own step — drop the "
                    "flag or use 'none'/'dp'"
                )
            if cfg.ema_decay:
                raise NotImplementedError(
                    "ema_decay updates a per-step host-visible shadow; "
                    f"steps_per_dispatch={spd} runs {spd} steps per "
                    "host visit — drop one of the two flags"
                )
        multi_step = None
        if parallelism == "dp":
            self._mesh = make_mesh(self.config.mesh.n_devices)
            if batch_size % dict(self._mesh.shape)["data"]:
                raise ValueError(
                    f"batch_size {batch_size} must divide by the "
                    f"{dict(self._mesh.shape)['data']}-device data mesh"
                )
            def _mk_step(ms):
                return make_dp_train_step(
                    self.decoder,
                    optimizer,
                    self._mesh,
                    pad_id=0,
                    label_smoothing=cfg.label_smoothing,
                    attention_reg=cfg.attention_reg,
                    grad_accum_steps=cfg.grad_accum_steps,
                    compute_dtype=compute_dtype,
                    donate=True,
                    scheduled_sampling=use_ss,
                    multi_steps=ms,
                )

            step = _mk_step(1)
            multi_step = _mk_step(spd) if spd > 1 else None
        elif parallelism == "fsdp":
            from tpucap.parallel import (
                make_fsdp_train_step,
                shard_fsdp_tree,
            )

            self._mesh = make_mesh(self.config.mesh.n_devices)
            if batch_size % dict(self._mesh.shape)["data"]:
                raise ValueError(
                    f"batch_size {batch_size} must divide by the "
                    f"{dict(self._mesh.shape)['data']}-device data mesh"
                )
            clip = float(cfg.grad_clip_norm or 0.0)
            if clip:
                # Global-norm clipping must see the psum'd GLOBAL norm;
                # the optax chain wrapper would clip each shard on its
                # local norm. Rebuild the optimizer bare and hand the
                # threshold to the fsdp step, which clips exactly
                # (tests/test_fsdp.py global-norm test).
                import dataclasses as _dc

                optimizer = build_optimizer(
                    _dc.replace(cfg, grad_clip_norm=0.0),
                    total_steps=epochs
                    * max(1, T.shape[0] // batch_size),
                )
                if self._freeze_embeddings:
                    from tpucap.train import freeze_subtree_updates

                    optimizer = freeze_subtree_updates(
                        optimizer,
                        lambda path: getattr(path[0], "key", None)
                        == "embedding",
                    )
                self.state = TrainState.create(
                    self.params["decoder"],
                    optimizer,
                    jax.random.key(cfg.seed),
                )
            # Re-place params + optimizer state in the 1/N-per-device
            # ZeRO layout; the step gathers just-in-time.
            self.state = shard_fsdp_tree(self.state, self._mesh)
            step = make_fsdp_train_step(
                self.decoder,
                optimizer,
                self._mesh,
                self.state,
                pad_id=0,
                label_smoothing=cfg.label_smoothing,
                attention_reg=cfg.attention_reg,
                grad_accum_steps=cfg.grad_accum_steps,
                compute_dtype=compute_dtype,
                grad_clip_norm=clip,
                donate=True,
            )
        elif parallelism in ("tp", "dp_tp"):
            from tpucap.parallel import make_tp_train_step

            if cfg.attention_reg:
                raise NotImplementedError(
                    "attention_reg is not supported by the vocab-parallel "
                    "CE step; use parallelism='dp'"
                )
            self._mesh = self._inference_mesh(parallelism)
            data_n = dict(self._mesh.shape).get("data", 1)
            if batch_size % data_n:
                raise ValueError(
                    f"batch_size {batch_size} must divide by the "
                    f"{data_n}-device data mesh axis"
                )
            n = dict(self._mesh.shape)["model"]
            if self.decoder.vocab_size % n:
                # Auto-pad the vocab dimension to shard evenly; padded
                # columns carry a -1e9 bias and never decode
                # (tests/test_tp.py::test_pad_vocab_params_preserves_decode).
                # Sliced back off after training so the pipeline/bundles
                # always expose the true vocabulary.
                import dataclasses

                from tpucap.parallel import pad_vocab_params

                unpad_to = self.decoder.vocab_size
                padded, new_v = pad_vocab_params(
                    self.params["decoder"], n
                )
                self.params["decoder"] = padded
                self.decoder = dataclasses.replace(
                    self.decoder, vocab_size=new_v
                )
                self.state = TrainState.create(
                    padded, optimizer, jax.random.key(cfg.seed)
                )
                self._decode_cache.clear()
                self._bf16_params = None
            step = make_tp_train_step(
                self.decoder,
                optimizer,
                self._mesh,
                pad_id=0,
                data_axis="data" if parallelism == "dp_tp" else None,
                label_smoothing=cfg.label_smoothing,
                # ls/V and the smoothing logit-sum use the TRUE vocab
                # when the padding branch above widened it.
                true_vocab=unpad_to,
                donate=True,
            )
        elif parallelism in ("pp", "dp_pp"):
            from tpucap.parallel import make_pp_train_step, stack_pp_layers

            if cfg.attention_reg:
                raise NotImplementedError(
                    "attention_reg applies to the SAT attention decoder, "
                    "which has no pipeline-parallel step; use "
                    "parallelism='dp'"
                )
            if not hasattr(self.decoder, "layer_train"):
                raise ValueError(
                    "pipeline parallelism requires the transformer decoder "
                    f"family; {type(self.decoder).__name__} has no layer "
                    "stages"
                )
            self._mesh = self._inference_mesh(parallelism)
            data_n = dict(self._mesh.shape).get("data", 1)
            if batch_size % data_n:
                raise ValueError(
                    f"batch_size {batch_size} must divide by the "
                    f"{data_n}-device data mesh axis"
                )
            pp_layout = True
            self.state = TrainState.create(
                stack_pp_layers(self.params["decoder"]),
                optimizer,
                jax.random.key(cfg.seed),
            )
            step = make_pp_train_step(
                self.decoder,
                optimizer,
                self._mesh,
                data_axis="data" if parallelism == "dp_pp" else None,
                pad_id=0,
                label_smoothing=cfg.label_smoothing,
                donate=True,
            )
        elif parallelism in ("sp", "dp_sp"):
            from tpucap.parallel import make_sp_train_step

            if cfg.attention_reg:
                raise NotImplementedError(
                    "attention_reg applies to the SAT attention decoder; "
                    "sequence parallelism trains the transformer — use "
                    "parallelism='dp'"
                )
            self._mesh = self._inference_mesh(parallelism)
            data_n = dict(self._mesh.shape).get("data", 1)
            if batch_size % data_n:
                raise ValueError(
                    f"batch_size {batch_size} must divide by the "
                    f"{data_n}-device data mesh axis"
                )
            # Validates the decoder family (transformer-only) before the
            # padding below dereferences max_positions.
            step = make_sp_train_step(
                self.decoder,
                optimizer,
                self._mesh,
                data_axis="data" if parallelism == "dp_sp" else None,
                pad_id=0,
                label_smoothing=cfg.label_smoothing,
                donate=True,
            )
            # Round the teacher-forced length up to a ring multiple with
            # pad columns — pads are masked out of the CE, so the update
            # is unchanged and the ring-divisibility constraint never
            # reaches the user.
            seq_n = dict(self._mesh.shape)["seq"]
            T_tf = T.shape[1] - 1
            pad_to = -(-T_tf // seq_n) * seq_n
            if pad_to != T_tf:
                if pad_to > self.decoder.max_positions:
                    raise ValueError(
                        f"sequence parallelism pads the teacher-forced "
                        f"length {T_tf} up to {pad_to} (the {seq_n}-way "
                        f"ring), which exceeds decoder max_positions "
                        f"{self.decoder.max_positions}; raise "
                        "decoder.max_positions or shrink the ring"
                    )
                T = np.concatenate(
                    [T, np.zeros((T.shape[0], pad_to - T_tf), T.dtype)],
                    axis=1,
                )
        elif parallelism in ("ep", "dp_ep"):
            from tpucap.parallel import make_ep_train_step

            if cfg.attention_reg:
                raise NotImplementedError(
                    "attention_reg applies to the SAT attention decoder; "
                    "expert parallelism trains the MoE transformer — use "
                    "parallelism='dp'"
                )
            self._mesh = self._inference_mesh(parallelism)
            data_n = dict(self._mesh.shape).get("data", 1)
            if batch_size % data_n:
                raise ValueError(
                    f"batch_size {batch_size} must divide by the "
                    f"{data_n}-device data mesh axis"
                )
            step = make_ep_train_step(
                self.decoder,
                optimizer,
                self._mesh,
                data_axis="data" if parallelism == "dp_ep" else None,
                pad_id=0,
                label_smoothing=cfg.label_smoothing,
                moe_aux_weight=cfg.moe_aux_weight,
                donate=True,
            )
        elif parallelism == "none":

            def _mk_step(ms):
                return make_train_step(
                    self.decoder,
                    optimizer,
                    pad_id=0,
                    label_smoothing=cfg.label_smoothing,
                    attention_reg=cfg.attention_reg,
                    grad_accum_steps=cfg.grad_accum_steps,
                    compute_dtype=compute_dtype,
                    donate=True,
                    scheduled_sampling=use_ss,
                    multi_steps=ms,
                )

            step = _mk_step(1)
            multi_step = _mk_step(spd) if spd > 1 else None
        else:
            raise ValueError(f"unknown parallelism {parallelism!r}")

        eval_step = None
        val_chunks = None
        if val_data is not None:
            from tpucap.train.loop import make_eval_sums_step

            val_desc, val_features = val_data
            VF, VT = build_training_batch(
                self.tokenizer,
                val_desc,
                val_features,
                self.config.decode.max_len,
            )
            # Evaluate in train-batch-size chunks (full (N, T, V) logits
            # for a whole dev split would not fit HBM at production vocab);
            # the tail chunk is zero-padded so exactly ONE program shape
            # compiles, and all-pad rows contribute nothing to the sums,
            # so the chunked aggregate equals the unbatched loss exactly.
            val_chunks = [
                (
                    jnp.asarray(pad_rows(VF[s : s + batch_size], batch_size)),
                    jnp.asarray(pad_rows(VT[s : s + batch_size], batch_size)),
                )
                for s in range(0, VF.shape[0], batch_size)
            ]
            # val_loss includes the regularizer term, mirroring Keras
            # (add_loss contributions count toward val_loss).
            eval_step = make_eval_sums_step(
                self.decoder,
                pad_id=0,
                attention_reg=cfg.attention_reg,
                label_smoothing=cfg.label_smoothing,
                compute_dtype=compute_dtype,
            )

        # Monitor selection (Keras ModelCheckpoint/EarlyStopping
        # monitor=/mode=): val_loss (min) by default; 'bleu4'/'cider'
        # greedy-decode the dev split each epoch and maximize.
        monitor_key, monitor_mode = "val_loss", "min"
        val_decode = None
        if val_data is not None and cfg.val_metric != "loss":
            if cfg.val_metric not in (
                "bleu4", "cider", "rouge_l", "meteor"
            ):
                raise ValueError(
                    f"unknown val_metric {cfg.val_metric!r}; "
                    "have loss|bleu4|cider|rouge_l|meteor"
                )
            if parallelism not in ("none", "dp"):
                raise NotImplementedError(
                    f"val_metric={cfg.val_metric!r} decodes on the "
                    f"canonical param layout; parallelism="
                    f"{parallelism!r} trains on a transformed layout — "
                    "monitor 'loss' or use 'none'/'dp'"
                )
            monitor_key = f"val_{cfg.val_metric}"
            monitor_mode = "max"
            val_ids = list(val_desc.keys())
            val_decode = (
                val_ids,
                np.stack(
                    [np.asarray(val_features[i]) for i in val_ids]
                ).astype(np.float32),
            )

        rng = np.random.default_rng(cfg.seed)
        history = []
        best_val = float("inf") if monitor_mode == "min" else -float("inf")
        epochs_since_best = 0
        # The loop donates the state each step (in-place param/opt-state
        # update in XLA); copy once so self.params — which the fresh
        # state aliases — survives the first donated step (own_state).
        from tpucap.train import own_state

        steps_per_epoch = max(1, T.shape[0] // batch_size)
        start_epoch = 0
        resume_batch = 0
        if resume:
            if checkpoint_manager is None:
                raise ValueError("resume=True needs a checkpoint_manager")
            if parallelism not in ("none", "dp"):
                raise NotImplementedError(
                    "resume restores the canonical param layout; "
                    f"parallelism={parallelism!r} trains on a "
                    "transformed layout — use 'none'/'dp'"
                )
            if cfg.ema_decay:
                raise NotImplementedError(
                    "resume does not restore the EMA shadow; drop "
                    "ema_decay or restart"
                )
        if cfg.checkpoint_every_steps > 0 and parallelism not in (
            "none",
            "dp",
        ):
            raise NotImplementedError(
                "checkpoint_every_steps saves the canonical param "
                f"layout mid-epoch; parallelism={parallelism!r} trains "
                "on a transformed layout — use 'none'/'dp' (other "
                "layouts checkpoint at epoch boundaries)"
            )
        guard = preemption_guard
        if handle_preemption and guard is None:
            from tpucap.train import PreemptionGuard

            guard = PreemptionGuard()
        import contextlib

        _guard_ctx = (
            guard
            if guard is not None and hasattr(guard, "__enter__")
            else contextlib.nullcontext()
        )
        preempted = False
        self.state = own_state(self.state)
        ema, ema_update = self._make_ema(cfg, self.state.params)
        with _guard_ctx:
            # The restore runs INSIDE the guard: a signal landing during
            # the (possibly long) checkpoint read or the resume
            # announcement is latched and acted on after the next step,
            # not delivered with default (fatal) semantics.
            if resume and checkpoint_manager.latest_step() is not None:
                self.state = own_state(
                    checkpoint_manager.restore(self.state)
                )
                done = int(jax.device_get(self.state.step))
                start_epoch = done // steps_per_epoch
                resume_batch = done % steps_per_epoch
                # Replay the consumed per-epoch permutations so the
                # resumed shuffle order matches the original run's.
                for _ in range(start_epoch):
                    rng.shuffle(np.arange(T.shape[0]))
                if log:
                    log(
                        f"resumed from step {done} (epoch "
                        f"{start_epoch}, batch {resume_batch})"
                    )
            next_save = 0
            if spd > 1 and cfg.checkpoint_every_steps > 0:
                done0 = start_epoch * steps_per_epoch + resume_batch
                next_save = (
                    done0 // cfg.checkpoint_every_steps + 1
                ) * cfg.checkpoint_every_steps
            for epoch in range(start_epoch, epochs):
                metrics_sum: dict = {}
                n = 0
                skip = resume_batch if epoch == start_epoch else 0
                ss_args = ()
                ss_eps_val = None
                if use_ss:
                    from tpucap.train.scheduled import epsilon_for_epoch

                    # A traced scalar argument: the per-epoch ramp never
                    # retraces the compiled step.
                    ss_eps_val = epsilon_for_epoch(
                        epoch,
                        epochs,
                        max_eps=cfg.scheduled_sampling,
                        schedule=cfg.ss_schedule,
                    )
                    ss_args = (jnp.asarray(ss_eps_val, jnp.float32),)
                if stream:
                    from tpucap.data.pipeline import (
                        caption_batch_stream,
                        prefetch_iterator,
                    )

                    # Assembly (disk reads + stacking) and, under dp/fsdp,
                    # device placement run on the prefetch thread — both
                    # overlap the device step. caption_batch_stream consumes
                    # rng exactly like batch_iterator (one shuffle/epoch),
                    # so the two paths see identical batch orders. A
                    # mid-epoch resume skips the already-trained batches
                    # INSIDE the stream (start_batch) so they cost no
                    # disk reads / stacking / H2D — only the permutation
                    # is consumed.
                    batch_src = enumerate(
                        prefetch_iterator(
                            caption_batch_stream(
                                stream_ids,
                                T,
                                features,
                                batch_size,
                                rng=rng,
                                start_batch=skip,
                            ),
                            depth=prefetch,
                            transform=(
                                # Multi-step dispatch stacks host batches
                                # into (spd, B, ...) groups below, so the
                                # prefetch thread must hand back host
                                # arrays; placement happens per group.
                                (lambda b: shard_batch(self._mesh, b))
                                if data_parallel and spd == 1
                                else None
                            ),
                        ),
                        start=skip,
                    )
                else:
                    batch_src = enumerate(
                        batch_iterator((F, T), batch_size, rng=rng)
                    )
                pending: list = []  # spd > 1: host batches awaiting a group
                for b_i, (bf, bt) in batch_src:
                    if b_i < skip:
                        # Resumed mid-epoch (in-memory path): the
                        # permutation was already consumed; these
                        # batches already trained. In-memory slicing is
                        # cheap — no assembly is saved by skipping
                        # earlier.
                        continue
                    if spd > 1:
                        # Multi-step dispatch: buffer spd host batches,
                        # stack to (spd, B, ...) and run ONE scanned
                        # program — the per-dispatch host overhead is
                        # paid once per spd steps. Epoch tails shorter
                        # than spd flush through the single-step
                        # program after the loop.
                        pending.append((bf, bt))
                        if len(pending) < spd:
                            continue
                        gf = np.stack([p[0] for p in pending])
                        gt = np.stack([p[1] for p in pending])
                        pending.clear()
                        if data_parallel:
                            gf, gt = shard_stacked_batch(
                                self._mesh, (gf, gt)
                            )
                        self.state, metrics = multi_step(
                            self.state, gf, gt, *ss_args
                        )
                        n += spd  # metrics come back summed over spd
                    else:
                        if data_parallel and not stream:
                            bf, bt = shard_batch(self._mesh, (bf, bt))
                        self.state, metrics = step(
                            self.state, bf, bt, *ss_args
                        )
                        if ema_update is not None:
                            ema = ema_update(ema, self.state.params)
                        n += 1
                    # Device-side accumulation: a per-step device_get blocks
                    # async dispatch (one host round-trip per step); sync
                    # once per epoch instead.
                    for k, v in metrics.items():
                        metrics_sum[k] = metrics_sum.get(k, 0.0) + v
                    if (
                        checkpoint_manager is not None
                        and cfg.checkpoint_every_steps > 0
                        and b_i + 1 < steps_per_epoch
                        and (
                            (epoch * steps_per_epoch + b_i + 1)
                            % cfg.checkpoint_every_steps
                            == 0
                            if spd == 1
                            # Dispatch boundaries move in strides of spd
                            # and (after a resume) may not align with
                            # the interval — save at the first boundary
                            # at/past each multiple.
                            else (epoch * steps_per_epoch + b_i + 1)
                            >= next_save
                        )
                    ):
                        # Step-interval insurance checkpoint (the
                        # epoch's last step is covered by the epoch-
                        # boundary save). The save's device_get syncs
                        # dispatch — paid once per N steps by request.
                        _sentinel_save(checkpoint_manager, self.state)
                        if spd > 1:
                            done_now = epoch * steps_per_epoch + b_i + 1
                            next_save = (
                                done_now // cfg.checkpoint_every_steps + 1
                            ) * cfg.checkpoint_every_steps
                    if guard is not None and guard.fired:
                        preempted = True
                        break
                # Epoch tail shorter than spd: the leftover batches run
                # through the single-step program (pending is empty
                # whenever the loop broke on preemption — the guard is
                # only consulted at dispatch boundaries).
                for bf, bt in () if preempted else pending:
                    if data_parallel:
                        bf, bt = shard_batch(self._mesh, (bf, bt))
                    self.state, metrics = step(self.state, bf, bt, *ss_args)
                    n += 1
                    for k, v in metrics.items():
                        metrics_sum[k] = metrics_sum.get(k, 0.0) + v
                    if guard is not None and guard.fired:
                        preempted = True
                        break
                metrics_sum = jax.device_get(metrics_sum)
                epoch_metrics = {
                    k: float(v) / max(n, 1) for k, v in metrics_sum.items()
                }
                epoch_metrics["epoch"] = epoch
                if ss_eps_val is not None:
                    epoch_metrics["ss_eps"] = float(ss_eps_val)
                if preempted:
                    # Grace window: skip eval/val work, write the rescue
                    # checkpoint (an ordinary checkpoint at a mid-epoch
                    # step; the tracked metric gets a never-best sentinel
                    # so best-checkpoint selection is unaffected), stop.
                    epoch_metrics["preempted"] = True
                    history.append(epoch_metrics)
                    if checkpoint_manager is not None:
                        rescue_state = self.state
                        if parallelism == "fsdp":
                            # Same canonical-layout contract as the
                            # epoch-boundary save below: gather the
                            # shards first — a raw sharded rescue would
                            # crash device_get on a multi-process mesh
                            # inside the SIGTERM grace window.
                            from tpucap.parallel import fsdp_gather_tree

                            rescue_state = fsdp_gather_tree(
                                self.state, self._mesh
                            )
                        _sentinel_save(checkpoint_manager, rescue_state)
                    if log:
                        log(
                            f"preempted at epoch {epoch} step "
                            f"{int(jax.device_get(self.state.step))}; "
                            "rescue checkpoint written — rerun with "
                            "resume=True to continue"
                        )
                    break
                if eval_step is not None:
                    from tpucap.train.loss import loss_from_sums

                    vsums: dict = {}
                    eval_params = self.state.params
                    if parallelism == "fsdp":
                        # eval_step is the canonical single-device program;
                        # one all_gather of the param shards per epoch.
                        from tpucap.parallel import fsdp_gather_tree

                        eval_params = fsdp_gather_tree(
                            eval_params, self._mesh
                        )
                    if pp_layout:
                        # eval_step runs the canonical single-device forward;
                        # slicing the stacked stage-sharded layers back into
                        # the list layout is a cheap device-side gather.
                        from tpucap.parallel import unstack_pp_layers

                        eval_params = unstack_pp_layers(eval_params)
                    for vf, vt in val_chunks:
                        piece = eval_step(eval_params, vf, vt)
                        for k, v in piece.items():
                            vsums[k] = vsums.get(k, 0.0) + v
                    _, vm = loss_from_sums(
                        jax.device_get(vsums), attention_reg=cfg.attention_reg
                    )
                    epoch_metrics["val_loss"] = float(vm["loss"])
                    epoch_metrics["val_accuracy"] = float(vm["accuracy"])
                if val_decode is not None:
                    epoch_metrics[monitor_key] = self._val_decode_metric(
                        val_decode, val_desc, cfg.val_metric, batch_size
                    )
                history.append(epoch_metrics)
                if log:
                    msg = (
                        f"epoch {epoch}: loss={epoch_metrics.get('loss', 0):.4f} "
                        f"acc={epoch_metrics.get('accuracy', 0):.4f}"
                    )
                    if "val_loss" in epoch_metrics:
                        msg += f" val_loss={epoch_metrics['val_loss']:.4f}"
                    if monitor_key != "val_loss" and monitor_key in epoch_metrics:
                        msg += (
                            f" {monitor_key}={epoch_metrics[monitor_key]:.4f}"
                        )
                    log(msg)
                if checkpoint_manager is not None:
                    # Best-checkpoint keying mirrors the reference's
                    # ModelCheckpoint(save_best_only, monitor=...): val_loss
                    # when a dev split is given (else train loss), plus the
                    # decode monitor when one is configured — the manager's
                    # best_fn picks whichever its best_metric names.
                    ckpt_metrics = {
                        "val_loss": epoch_metrics.get(
                            "val_loss", epoch_metrics["loss"]
                        )
                    }
                    if monitor_key != "val_loss" and monitor_key in epoch_metrics:
                        ckpt_metrics[monitor_key] = epoch_metrics[monitor_key]
                    save_state = self.state
                    if parallelism == "fsdp":
                        # Checkpoints carry the canonical (replicated)
                        # layout so restore templates, averaging, and h5
                        # export stay layout-agnostic; fit re-shards on the
                        # next run.
                        from tpucap.parallel import fsdp_gather_tree

                        save_state = fsdp_gather_tree(self.state, self._mesh)
                    checkpoint_manager.save(save_state, metrics=ckpt_metrics)
                # Keras EarlyStopping(monitor=..., mode=..., patience=N):
                # stop once the monitor hasn't improved for N epochs. The
                # best checkpoint is already retained by the manager, so
                # restore_best_weights is restore-from-best.
                if (
                    cfg.early_stopping_patience > 0
                    and monitor_key in epoch_metrics
                ):
                    val = epoch_metrics[monitor_key]
                    improved = (
                        val < best_val
                        if monitor_mode == "min"
                        else val > best_val
                    )
                    if improved:
                        best_val = val
                        epochs_since_best = 0
                    else:
                        epochs_since_best += 1
                        if epochs_since_best >= cfg.early_stopping_patience:
                            if log:
                                log(
                                    f"early stopping at epoch {epoch} "
                                    f"(no {monitor_key} improvement for "
                                    f"{epochs_since_best} epochs)"
                                )
                            break
        dec_params = self.state.params
        if parallelism == "fsdp":
            # The pipeline object always exposes the canonical layout;
            # self.state keeps the sharded form so fsdp training can
            # continue from it.
            from tpucap.parallel import fsdp_gather_tree

            dec_params = jax.device_get(
                fsdp_gather_tree(dec_params, self._mesh)
            )
        if pp_layout:
            # The pipeline object always exposes the canonical layout
            # (decode engines, checkpoints, h5 export); self.state keeps
            # the stacked form so pp training can resume from it.
            from tpucap.parallel import unstack_pp_layers

            dec_params = unstack_pp_layers(dec_params)
        if unpad_to is not None:
            # Slice the sharding pad back off: pipeline state and saved
            # bundles always carry the true vocabulary (exact — padded
            # columns never win a decode step). self.state keeps the
            # padded form so tp training can resume from checkpoints.
            import dataclasses

            from tpucap.parallel import unpad_vocab_params

            dec_params = unpad_vocab_params(dec_params, unpad_to)
            self.decoder = dataclasses.replace(
                self.decoder, vocab_size=unpad_to
            )
        self.params["decoder"] = dec_params
        if ema is not None:
            self.ema_params = {"decoder": ema}
        self._decode_cache.clear()
        self._bf16_params = None
        return history

    def _val_decode_metric(
        self, val_decode, val_desc, metric: str, batch_size: int
    ) -> float:
        """Greedy-decode the dev split on the CURRENT training params and
        return the corpus metric (the per-epoch monitor for
        TrainConfig.val_metric='bleu4'|'cider'|'rouge_l'|'meteor'). Chunks are zero-padded
        to batch_size so exactly one decode program compiles; greedy is
        the deliberate choice — the cheap monitoring proxy, with the
        full beam evaluation left to evaluate()."""
        ids, VDF = val_decode
        fn = self._decode_fn("greedy", 1)
        _, end_id = self._token_ids()
        generated = {}
        for s in range(0, len(ids), batch_size):
            chunk = ids[s : s + batch_size]
            feats = jnp.asarray(
                pad_rows(VDF[s : s + batch_size], batch_size)
            )
            res = fn(self.state.params, feats)
            caps = ids_to_captions(
                self.tokenizer,
                res.tokens[: len(chunk)],
                res.lengths[: len(chunk)],
                end_id=end_id,
            )
            generated.update(zip(chunk, caps))
        key = "bleu" if metric == "bleu4" else metric
        scores = evaluate_captions(val_desc, generated, metrics=(key,))
        return float(scores[metric])

    def _make_ema(self, cfg, params):
        """-> (shadow tree | None, jitted update | None) for
        TrainConfig.ema_decay. The shadow initializes AT the starting
        params (no zero-debias needed); one elementwise device program
        per step."""
        if not cfg.ema_decay:
            return None, None
        d = float(cfg.ema_decay)
        if not 0.0 < d < 1.0:
            raise ValueError(f"ema_decay must be in (0, 1), got {d}")
        update = jax.jit(
            lambda e, p: jax.tree_util.tree_map(
                lambda a, b: d * a + (1.0 - d) * b, e, p
            )
        )
        # Copy: the shadow must not alias the (donated) initial state's
        # params — the first donated step deletes those buffers.
        return jax.tree_util.tree_map(jnp.copy, params), update

    def use_ema_weights(self):
        """Swap the EMA-averaged weights (tracked when
        TrainConfig.ema_decay > 0 during fit/fit_finetune) into
        self.params for eval/serving/save; returns the replaced
        subtrees so the raw weights can be swapped back. The EMA of a
        converging run is a lower-variance iterate — the standard
        serving trick."""
        ema = getattr(self, "ema_params", None)
        if not ema:
            raise ValueError(
                "no EMA weights tracked — set TrainConfig.ema_decay > 0 "
                "and run fit()/fit_finetune() first"
            )
        replaced = {k: self.params[k] for k in ema}
        self.params.update(ema)
        self._decode_cache.clear()
        self._bf16_params = None
        return replaced

    def use_averaged_weights(
        self,
        checkpoint_dir: str,
        *,
        last_k: int | None = None,
        steps: list[int] | None = None,
    ):
        """Swap in the uniform average of several retained checkpoints'
        decoder params (CheckpointManager.average_params — the
        checkpoint-averaging serving trick). The checkpoints must carry
        the canonical decoder layout (fit with parallelism 'none'|'dp');
        returns the replaced decoder params for swap-back."""
        from tpucap.checkpoint import CheckpointManager
        from tpucap.train import build_optimizer

        mgr = CheckpointManager(checkpoint_dir, best_metric=None)
        fresh = TrainState.create(
            self.params["decoder"],
            build_optimizer(self.config.train),
            jax.random.key(0),
        )
        averaged = mgr.average_params(fresh, steps=steps, last_k=last_k)
        mgr.close()
        replaced = self.params["decoder"]
        self.params["decoder"] = jax.tree_util.tree_map(
            jnp.asarray, averaged
        )
        self._decode_cache.clear()
        self._bf16_params = None
        return replaced

    def fit_finetune(
        self,
        descriptions: dict[str, list[str]],
        images: dict[str, np.ndarray],
        *,
        epochs: int | None = None,
        batch_size: int | None = None,
        encoder_lr_scale: float = 0.1,
        freeze_encoder: bool = False,
        remat_encoder: bool = False,
        parallelism: str | None = None,
        augment: bool = False,
        augment_shift: int = 0,
        lora_rank: int = 0,
        lora_alpha: float | None = None,
        log=print,
    ) -> list[dict]:
        """End-to-end fine-tuning: train the ENCODER and decoder jointly
        through the captioning loss — a capability the reference cannot
        offer (its CNN is frozen behind one-shot feature extraction;
        SURVEY.md §2.1 #2), and the fix when pretrained features don't
        match the domain.

        ``images``: id -> PREPROCESSED (H, W, 3) float32 array (the
        shape ``extract_features`` consumes). BN encoders fine-tune with
        FROZEN BN statistics (train/finetune.py docstring); VGG16/
        TinyCNN/ViT have no BN constraint. ``encoder_lr_scale`` scales
        the pretrained backbone's updates (0.1x the decoder's lr is the
        standard recipe); ``freeze_encoder=True`` stops gradients at the
        feature boundary (decoder updates then match fit() on extracted
        features exactly). config.train.grad_accum_steps composes —
        encoder activations dominate memory here, so it buys A-times
        larger image batches. ``parallelism='dp'`` shards the image
        batch over the data mesh (update-exact vs single device, pure
        sum space — train/finetune.py); ``'fsdp'`` additionally shards
        the joint params + optimizer state 1/N per device (ZeRO — the
        right dial here, where the backbone's adam state is 3x its
        params), gathered just-in-time per microbatch, equally
        update-exact. Updates self.params in place:
        generate / evaluate / save immediately use the tuned encoder.

        ``augment=True`` adds on-device per-step augmentation inside the
        jitted step (random horizontal flip; ``augment_shift=N`` adds a
        reflect-padded random translation of up to N px — see
        data/augment.py for why only preprocessing-commuting ops are
        offered).

        ``remat_encoder=True`` recomputes the encoder's activations in
        the backward pass instead of keeping them live (jax.checkpoint
        — exact same update, lower peak HBM): the memory dial when the
        image batch, not the logits, is what doesn't fit. Composes with
        grad_accum_steps (remat per microbatch) and 'dp'.

        ``lora_rank=r`` switches to LoRA fine-tuning (train/lora.py):
        the joint base stays frozen and a rank-r overlay trains on the
        2-D matmul kernels of both subtrees (``freeze_encoder=True``
        restricts adapters to the decoder) — ~1-2% trainable params,
        Adam state shrunk accordingly, few-MB adapter artifact
        (:meth:`save_lora`). encoder_lr_scale is ignored under LoRA
        (one lr for the adapters)."""
        from tpucap.train import build_optimizer
        from tpucap.train.finetune import (
            encoder_learning_rate_optimizer,
            make_joint_train_step,
        )

        cfg = self.config.train
        epochs = epochs or cfg.epochs
        batch_size = batch_size or cfg.batch_size
        if self.decoder is None:
            self.build()
        # One image per ID on the host; the token rows carry an INDEX
        # into that store, gathered per minibatch — an image with 5
        # captions must NOT be stacked 5x (at 224px that multiplies host
        # memory by the caption count; feature-based fit never cared
        # because feature rows are small).
        store_ids = list(descriptions.keys())
        store = np.stack([np.asarray(images[i]) for i in store_ids])
        index_of = {
            i: np.asarray(k, np.int32) for k, i in enumerate(store_ids)
        }
        F_idx, T = build_training_batch(
            self.tokenizer,
            descriptions,
            index_of,
            self.config.decode.max_len,
        )
        if F_idx.shape[0] < batch_size:
            if log:
                log(
                    f"batch_size {batch_size} > {F_idx.shape[0]} training "
                    f"rows; clamping batch_size to {F_idx.shape[0]}"
                )
            batch_size = F_idx.shape[0]
        if parallelism not in (None, "none", "dp", "fsdp"):
            raise NotImplementedError(
                f"fit_finetune supports parallelism None|'none'|'dp'|"
                f"'fsdp', got {parallelism!r}"
            )
        if lora_rank:
            return self._fit_finetune_lora(
                store,
                F_idx,
                T,
                rank=lora_rank,
                alpha=lora_alpha,
                epochs=epochs,
                batch_size=batch_size,
                freeze_encoder=freeze_encoder,
                remat_encoder=remat_encoder,
                parallelism=parallelism,
                augment=augment,
                augment_shift=augment_shift,
                log=log,
            )
        clip = 0.0
        opt_cfg = cfg
        if parallelism == "fsdp" and cfg.grad_clip_norm:
            # Global-norm clipping must see the psum'd GLOBAL norm; the
            # optax chain wrapper would clip each shard on its local
            # norm. Build the optimizer bare and hand the threshold to
            # the fsdp joint step (train/finetune.py).
            import dataclasses as _dc

            clip = float(cfg.grad_clip_norm)
            opt_cfg = _dc.replace(cfg, grad_clip_norm=0.0)
        optimizer = build_optimizer(
            opt_cfg,
            total_steps=epochs * max(1, F_idx.shape[0] // batch_size),
        )
        if encoder_lr_scale != 1.0 and not freeze_encoder:
            optimizer = encoder_learning_rate_optimizer(
                optimizer, encoder_lr_scale=encoder_lr_scale
            )
        if self._freeze_embeddings:
            # Same state-transparent update-masking rule as fit(): the
            # frozen pretrained table must not move under any optimizer
            # term, in the joint {"encoder", "decoder"} layout.
            from tpucap.train import freeze_subtree_updates

            optimizer = freeze_subtree_updates(
                optimizer,
                lambda path: len(path) >= 2
                and getattr(path[0], "key", None) == "decoder"
                and getattr(path[1], "key", None) == "embedding",
            )
        mesh = None
        if parallelism in ("dp", "fsdp"):
            mesh = make_mesh(self.config.mesh.n_devices)
            data_n = dict(mesh.shape)["data"]
            if batch_size % data_n:
                raise ValueError(
                    f"batch_size {batch_size} must divide by the "
                    f"{data_n}-device data mesh"
                )
            self._mesh = mesh
        params = {
            "encoder": self.params["encoder"],
            "decoder": self.params["decoder"],
        }
        state = TrainState.create(
            params, optimizer, jax.random.key(cfg.seed)
        )
        fsdp_template = None
        if parallelism == "fsdp":
            if cfg.ema_decay:
                raise NotImplementedError(
                    "ema_decay tracks canonical-layout params; "
                    "parallelism='fsdp' trains on sharded params — "
                    "drop the flag or use 'dp'"
                )
            from tpucap.parallel import shard_fsdp_tree

            # Joint params + adam state drop to 1/N per device — the
            # fine-tuning step is where this matters (a backbone's
            # optimizer state is 3x its params).
            state = shard_fsdp_tree(state, mesh)
            fsdp_template = state
        if cfg.precision not in ("f32", "bf16"):
            raise ValueError(
                f"TrainConfig.precision={cfg.precision!r}; have f32|bf16"
            )
        from tpucap.data.augment import make_augment_fn

        step = make_joint_train_step(
            self.encoder,
            self.decoder,
            optimizer,
            pad_id=0,
            label_smoothing=cfg.label_smoothing,
            attention_reg=cfg.attention_reg,
            grad_accum_steps=cfg.grad_accum_steps,
            freeze_encoder=freeze_encoder,
            remat_encoder=remat_encoder,
            mesh=mesh,
            compute_dtype=(
                jnp.bfloat16 if cfg.precision == "bf16" else None
            ),
            augment_fn=make_augment_fn(
                flip=augment, max_shift=augment_shift
            ),
            fsdp_state_template=fsdp_template,
            grad_clip_norm=clip,
            donate=True,
        )
        rng = np.random.default_rng(cfg.seed)
        history = []
        # Donated loop: copy so self.params (aliased by the fresh
        # state) survives the first step — see train.own_state.
        from tpucap.train import own_state

        state = own_state(state)
        ema, ema_update = self._make_ema(cfg, state.params)
        for epoch in range(epochs):
            metrics_sum: dict = {}
            n = 0
            for bi, bt in batch_iterator((F_idx, T), batch_size, rng=rng):
                bf = store[np.asarray(bi)]  # minibatch-sized image gather
                if mesh is not None:
                    bf, bt = shard_batch(mesh, (bf, bt))
                state, metrics = step(state, bf, bt)
                if ema_update is not None:
                    ema = ema_update(ema, state.params)
                n += 1
                for k, v in metrics.items():
                    metrics_sum[k] = metrics_sum.get(k, 0.0) + v
            metrics_sum = jax.device_get(metrics_sum)
            epoch_metrics = {
                k: float(v) / max(n, 1) for k, v in metrics_sum.items()
            }
            epoch_metrics["epoch"] = epoch
            history.append(epoch_metrics)
            if log:
                log(
                    f"epoch {epoch}: loss={epoch_metrics.get('loss', 0):.4f} "
                    f"acc={epoch_metrics.get('accuracy', 0):.4f}"
                )
        final_params = state.params
        if parallelism == "fsdp":
            # The pipeline object always exposes the canonical layout.
            from tpucap.parallel import fsdp_gather_tree

            final_params = jax.device_get(
                fsdp_gather_tree(state.params, mesh)
            )
        self.params["encoder"] = final_params["encoder"]
        self.params["decoder"] = final_params["decoder"]
        if ema is not None:
            self.ema_params = dict(ema)  # {"encoder", "decoder"}
        self._decode_cache.clear()
        self._bf16_params = None
        return history

    def _fit_finetune_lora(
        self,
        store,
        F_idx,
        T,
        *,
        rank: int,
        alpha: float | None,
        epochs: int,
        batch_size: int,
        freeze_encoder: bool,
        remat_encoder: bool,
        parallelism: str | None,
        augment: bool,
        augment_shift: int,
        log,
    ) -> list[dict]:
        """fit_finetune(lora_rank=r): the joint {'encoder','decoder'}
        base stays frozen; a rank-r overlay trains on every 2-D matmul
        kernel of both subtrees (conv kernels stay frozen by design —
        train/lora.py docstring). ``freeze_encoder=True`` restricts the
        adapters to the decoder subtree. The optimizer state is the
        adapter tree — the Adam 2x-params HBM tax and the checkpoint
        artifact shrink to a few MB, which is the whole point of LoRA
        on a backbone."""
        from tpucap.data.augment import make_augment_fn
        from tpucap.train import build_optimizer, own_state
        from tpucap.train.lora import (
            init_lora,
            lora_param_counts,
            make_lora_train_step,
            merge_lora,
        )

        cfg = self.config.train
        if parallelism == "fsdp":
            raise NotImplementedError(
                "lora_rank with parallelism='fsdp': the trainable "
                "state is already tiny — use 'dp' (or full fine-"
                "tuning for ZeRO sharding)"
            )
        if remat_encoder:
            raise NotImplementedError(
                "remat_encoder with lora_rank is not wired; drop one"
            )
        if cfg.grad_accum_steps > 1:
            raise NotImplementedError(
                "grad_accum_steps with lora_rank is not wired"
            )
        if cfg.ema_decay:
            raise NotImplementedError(
                "ema_decay tracks full params; lora trains adapters — "
                "drop the flag"
            )
        mesh = None
        if parallelism == "dp":
            mesh = make_mesh(self.config.mesh.n_devices)
            data_n = dict(mesh.shape)["data"]
            if batch_size % data_n:
                raise ValueError(
                    f"batch_size {batch_size} must divide by the "
                    f"{data_n}-device data mesh"
                )
            self._mesh = mesh
        alpha = float(rank if alpha is None else alpha)
        scale = alpha / rank
        base = {
            "encoder": self.params["encoder"],
            "decoder": self.params["decoder"],
        }
        target_tree = (
            {"decoder": base["decoder"]} if freeze_encoder else base
        )
        adapters = init_lora(
            target_tree, rank, rng=jax.random.key(cfg.seed + 7)
        )
        if log:
            n_ad, n_base = lora_param_counts(base, adapters)
            log(
                f"LoRA rank {rank} (joint): {n_ad:,} trainable / "
                f"{n_base:,} frozen params "
                f"({100.0 * n_ad / n_base:.2f}%)"
            )
        optimizer = build_optimizer(
            cfg,
            total_steps=epochs * max(1, F_idx.shape[0] // batch_size),
        )
        step = make_lora_train_step(
            self.decoder,
            base,
            optimizer,
            scale=scale,
            encoder=self.encoder,
            pad_id=0,
            label_smoothing=cfg.label_smoothing,
            attention_reg=cfg.attention_reg,
            compute_dtype=(
                jnp.bfloat16 if cfg.precision == "bf16" else None
            ),
            mesh=mesh,
            augment_fn=make_augment_fn(
                flip=augment, max_shift=augment_shift
            ),
            donate=True,
        )
        state = own_state(
            TrainState.create(
                adapters, optimizer, jax.random.key(cfg.seed)
            )
        )
        rng = np.random.default_rng(cfg.seed)
        history = []
        for epoch in range(epochs):
            metrics_sum: dict = {}
            n = 0
            for bi, bt in batch_iterator((F_idx, T), batch_size, rng=rng):
                bf = store[np.asarray(bi)]
                if mesh is not None:
                    bf, bt = shard_batch(mesh, (bf, bt))
                state, metrics = step(state, bf, bt)
                n += 1
                for k, v in metrics.items():
                    metrics_sum[k] = metrics_sum.get(k, 0.0) + v
            metrics_sum = jax.device_get(metrics_sum)
            epoch_metrics = {
                k: float(v) / max(n, 1) for k, v in metrics_sum.items()
            }
            epoch_metrics["epoch"] = epoch
            history.append(epoch_metrics)
            if log:
                log(
                    f"lora epoch {epoch}: "
                    f"loss={epoch_metrics.get('loss', 0):.4f} "
                    f"acc={epoch_metrics.get('accuracy', 0):.4f}"
                )
        self.lora_adapters = jax.device_get(state.params)
        self.lora_meta = {"rank": rank, "alpha": alpha}
        merged = jax.device_get(
            merge_lora(base, state.params, scale=scale)
        )
        self.params["encoder"] = merged["encoder"]
        self.params["decoder"] = merged["decoder"]
        self._decode_cache.clear()
        self._bf16_params = None
        return history

    def fit_lora(
        self,
        descriptions: dict[str, list[str]],
        features: dict[str, np.ndarray],
        *,
        rank: int = 8,
        alpha: float | None = None,
        target_keys=None,
        epochs: int | None = None,
        batch_size: int | None = None,
        parallelism: str | None = None,
        merge: bool = True,
        log=print,
    ) -> list[dict]:
        """LoRA fine-tuning of the decoder on precomputed features
        (train/lora.py): every base weight frozen, a rank-``rank``
        overlay trained on the 2-D matmul kernels — ~1-2% of the
        decoder's parameters (and of its Adam state), and a few-MB
        adapter artifact instead of a checkpoint. Step 0 is exactly the
        base model (B = 0 init).

        ``alpha`` defaults to ``rank`` (scale alpha/rank = 1, the
        common default). ``merge=True`` folds the trained adapters into
        self.params at the end — decode/save immediately see the tuned
        weights; the raw adapters stay in ``self.lora_adapters`` for
        :meth:`save_lora`. parallelism: None/'none' | 'dp' (update-
        exact vs single device, tests/test_lora.py)."""
        from tpucap.train import build_optimizer, own_state
        from tpucap.train.lora import (
            DEFAULT_TARGET_KEYS,
            init_lora,
            lora_param_counts,
            make_lora_train_step,
            merge_lora,
        )

        cfg = self.config.train
        epochs = epochs or cfg.epochs
        batch_size = batch_size or cfg.batch_size
        if self.decoder is None:
            self.build()
        if cfg.grad_accum_steps > 1:
            raise NotImplementedError(
                "grad_accum_steps with LoRA: the adapters are the "
                "memory fix — drop the accumulation"
            )
        if parallelism not in (None, "none", "dp"):
            raise NotImplementedError(
                f"fit_lora supports parallelism None|'none'|'dp', "
                f"got {parallelism!r}"
            )
        F, T = build_training_batch(
            self.tokenizer,
            descriptions,
            features,
            self.config.decode.max_len,
        )
        if F.shape[0] < batch_size:
            batch_size = F.shape[0]
        mesh = None
        if parallelism == "dp":
            mesh = make_mesh(self.config.mesh.n_devices)
            data_n = dict(mesh.shape)["data"]
            if batch_size % data_n:
                raise ValueError(
                    f"batch_size {batch_size} must divide by the "
                    f"{data_n}-device data mesh"
                )
            self._mesh = mesh
        alpha = float(rank if alpha is None else alpha)
        scale = alpha / rank
        base = self.params["decoder"]
        adapters = init_lora(
            base,
            rank,
            rng=jax.random.key(cfg.seed + 7),
            target_keys=target_keys or DEFAULT_TARGET_KEYS,
        )
        if log:
            n_ad, n_base = lora_param_counts(base, adapters)
            log(
                f"LoRA rank {rank}: {n_ad:,} trainable / {n_base:,} "
                f"frozen params ({100.0 * n_ad / n_base:.2f}%)"
            )
        optimizer = build_optimizer(
            cfg, total_steps=epochs * max(1, F.shape[0] // batch_size)
        )
        step = make_lora_train_step(
            self.decoder,
            base,
            optimizer,
            scale=scale,
            pad_id=0,
            label_smoothing=cfg.label_smoothing,
            attention_reg=cfg.attention_reg,
            compute_dtype=(
                jnp.bfloat16 if cfg.precision == "bf16" else None
            ),
            mesh=mesh,
            donate=True,
        )
        state = own_state(
            TrainState.create(
                adapters, optimizer, jax.random.key(cfg.seed)
            )
        )
        rng = np.random.default_rng(cfg.seed)
        history = []
        for epoch in range(epochs):
            metrics_sum: dict = {}
            n = 0
            for bf, bt in batch_iterator((F, T), batch_size, rng=rng):
                if mesh is not None:
                    bf, bt = shard_batch(mesh, (bf, bt))
                state, metrics = step(state, bf, bt)
                n += 1
                for k, v in metrics.items():
                    metrics_sum[k] = metrics_sum.get(k, 0.0) + v
            metrics_sum = jax.device_get(metrics_sum)
            epoch_metrics = {
                k: float(v) / max(n, 1) for k, v in metrics_sum.items()
            }
            epoch_metrics["epoch"] = epoch
            history.append(epoch_metrics)
            if log:
                log(
                    f"lora epoch {epoch}: "
                    f"loss={epoch_metrics.get('loss', 0):.4f} "
                    f"acc={epoch_metrics.get('accuracy', 0):.4f}"
                )
        self.lora_adapters = jax.device_get(state.params)
        self.lora_meta = {"rank": rank, "alpha": alpha}
        if merge:
            self.params["decoder"] = jax.device_get(
                merge_lora(base, state.params, scale=scale)
            )
            self._decode_cache.clear()
            self._bf16_params = None
        return history

    def save_lora(self, path: str):
        """Write the last fit_lora/fit_finetune(lora_rank=) adapters as
        a small .npz artifact (train/lora.py::save_lora)."""
        from tpucap.train.lora import save_lora as _save

        if getattr(self, "lora_adapters", None) is None:
            raise ValueError("no trained LoRA adapters on this pipeline")
        _save(
            path,
            self.lora_adapters,
            rank=self.lora_meta["rank"],
            alpha=self.lora_meta["alpha"],
        )

    def apply_lora_file(self, path: str, *, subtree: str = "decoder"):
        """Merge a saved adapter artifact into this pipeline's params
        (``subtree``: 'decoder' | 'joint' for fit_finetune adapters
        spanning {'encoder','decoder'})."""
        from tpucap.train.lora import load_lora, merge_lora

        adapters, rank, alpha = load_lora(path)
        scale = alpha / rank
        if subtree == "joint":
            base = {
                "encoder": self.params["encoder"],
                "decoder": self.params["decoder"],
            }
            merged = jax.device_get(
                merge_lora(base, adapters, scale=scale)
            )
            self.params["encoder"] = merged["encoder"]
            self.params["decoder"] = merged["decoder"]
        else:
            self.params["decoder"] = jax.device_get(
                merge_lora(
                    self.params["decoder"], adapters, scale=scale
                )
            )
        self._decode_cache.clear()
        self._bf16_params = None

    def fit_scst(
        self,
        descriptions: dict[str, list[str]],
        features: dict[str, np.ndarray],
        *,
        epochs: int | None = None,
        batch_size: int | None = None,
        temperature: float = 1.0,
        top_k: int | None = None,
        parallelism: str | None = None,
        log=print,
    ) -> list[dict]:
        """Self-critical sequence training (Rennie et al. 2017) —
        policy-gradient fine-tuning on per-image CIDEr-D with the
        model's own greedy decode as the baseline (tpucap.train.scst).

        Run AFTER CE training (``fit``): SCST assumes a model that
        already captions; practice also wants a much lower learning
        rate than CE (set TrainConfig.learning_rate ~5e-5 before
        calling). One row per IMAGE (not per caption) — the 5
        references are the reward targets. The decoder params/opt
        surface match ``fit`` exactly.

        parallelism: None/'none' (single device) | 'dp' — rollout AND
        update shard the image batch over the data mesh (shards sample
        with decorrelated keys; the update psums raw-sum gradients and
        normalizes by the global token count, exactly the
        single-device update on the concatenated batch). The reward
        pass stays on the host either way.
        """
        from tpucap.train.metrics import CiderDScorer
        from tpucap.train.scst import make_scst_rollout, make_scst_step

        cfg = self.config.train
        epochs = epochs or cfg.epochs
        batch_size = batch_size or cfg.batch_size
        if self.decoder is None:
            self.build()
        start_id, end_id = self._token_ids()

        ids = list(descriptions.keys())
        feats_all = np.stack(
            [np.asarray(features[i]) for i in ids]
        ).astype(np.float32)
        refs_of = {
            i: [
                [
                    w
                    for w in c.split()
                    if w not in (START_TOKEN, END_TOKEN)
                ]
                for c in descriptions[i]
            ]
            for i in ids
        }
        scorer = CiderDScorer([refs_of[i] for i in ids])

        if batch_size > len(ids):
            if log:
                log(
                    f"batch_size {batch_size} > {len(ids)} images; "
                    f"clamping batch_size to {len(ids)}"
                )
            batch_size = len(ids)
        if parallelism not in (None, "none", "dp"):
            raise NotImplementedError(
                f"fit_scst supports parallelism None|'none'|'dp', "
                f"got {parallelism!r}"
            )
        mesh = None
        if parallelism == "dp":
            mesh = make_mesh(self.config.mesh.n_devices)
            data_n = dict(mesh.shape)["data"]
            if batch_size % data_n:
                raise ValueError(
                    f"batch_size {batch_size} must divide by the "
                    f"{data_n}-device data mesh"
                )
            self._mesh = mesh
        from tpucap.train import build_optimizer

        steps_per_epoch = max(1, len(ids) // batch_size)
        optimizer = build_optimizer(
            cfg, total_steps=epochs * steps_per_epoch
        )
        if self._freeze_embeddings:
            from tpucap.train import freeze_subtree_updates

            optimizer = freeze_subtree_updates(
                optimizer,
                lambda path: getattr(path[0], "key", None) == "embedding",
            )
        state = TrainState.create(
            self.params["decoder"], optimizer, jax.random.key(cfg.seed)
        )
        rollout = make_scst_rollout(
            self.decoder,
            start_id=start_id,
            end_id=end_id,
            max_len=self.config.decode.max_len,
            temperature=temperature,
            top_k=top_k,
            mesh=mesh,
        )
        step = make_scst_step(
            self.decoder,
            optimizer,
            start_id=start_id,
            mesh=mesh,
            donate=True,
        )
        from tpucap.train import own_state

        state = own_state(state)

        key = jax.random.key(cfg.seed + 1)
        order_rng = np.random.default_rng(cfg.seed)
        history: list[dict] = []
        global_step = 0
        for epoch in range(epochs):
            perm = order_rng.permutation(len(ids))
            ep = {"loss": 0.0, "reward": 0.0, "baseline": 0.0, "n": 0}
            # Drop the remainder like batch_iterator: fixed program
            # shapes, and every image comes back around next epoch
            # under a different permutation.
            for s in range(0, len(ids) - batch_size + 1, batch_size):
                take = perm[s : s + batch_size]
                feats = jnp.asarray(feats_all[take])
                sampled, baseline = rollout(
                    state.params,
                    feats,
                    jax.random.fold_in(key, global_step),
                )
                samp_caps = ids_to_captions(
                    self.tokenizer,
                    sampled.tokens,
                    sampled.lengths,
                    end_id=end_id,
                )
                base_caps = ids_to_captions(
                    self.tokenizer,
                    baseline.tokens,
                    baseline.lengths,
                    end_id=end_id,
                )
                rewards = np.empty(len(take), np.float32)
                base_r = np.empty(len(take), np.float32)
                for j, row in enumerate(take):
                    refs = refs_of[ids[row]]
                    rewards[j] = scorer.score(refs, samp_caps[j].split())
                    base_r[j] = scorer.score(refs, base_caps[j].split())
                adv = rewards - base_r
                state, metrics = step(
                    state, feats, sampled.tokens, jnp.asarray(adv)
                )
                global_step += 1
                ep["loss"] += float(metrics["loss"])
                ep["reward"] += float(rewards.mean())
                ep["baseline"] += float(base_r.mean())
                ep["n"] += 1
            n = max(1, ep.pop("n"))
            entry = {k: v / n for k, v in ep.items()}
            entry["advantage"] = entry["reward"] - entry["baseline"]
            entry["epoch"] = epoch
            history.append(entry)
            if log:
                log(
                    f"scst epoch {epoch}: reward={entry['reward']:.4f} "
                    f"baseline={entry['baseline']:.4f} "
                    f"loss={entry['loss']:.4f}"
                )
        self.state = state
        self.params["decoder"] = state.params
        self._decode_cache.clear()
        self._bf16_params = None
        return history

    def fit_distill(
        self,
        student: "CaptioningPipeline",
        descriptions: dict[str, list[str]],
        features: dict[str, np.ndarray],
        *,
        epochs: int | None = None,
        batch_size: int | None = None,
        temperature: float = 2.0,
        alpha: float = 0.5,
        mode: str = "word",
        parallelism: str | None = None,
        log=print,
    ) -> list[dict]:
        """Distill THIS (teacher) pipeline's decoder into ``student`` —
        the training half of the speculative-decoding story
        (:meth:`generate_speculative` needs a draft that AGREES with the
        target's argmax stream; a draft trained only on ground-truth
        captions agrees far less often than a distilled one).

        ``student`` is another CaptioningPipeline whose encoder config
        produces the SAME feature tensor (same ``features=`` kind and
        feature_dim — the draft shares the teacher's features at serve
        time); its decoder may be any family/size. A student without a
        tokenizer adopts the teacher's; a mismatched vocabulary is an
        error (speculative verification compares token ids).

        mode='word' (Hinton et al. 2015): soft-target KL at temperature
        ``temperature``, mixed with hard-label CE via ``alpha``
        (tpucap.train.distill). Reported ``agreement`` is the fraction of
        non-pad positions where student argmax == teacher argmax — the
        direct proxy for speculative acceptance.

        mode='sequence' (Kim & Rush 2016): the teacher greedy-decodes the
        training images and the student trains with ordinary CE on those
        pseudo-captions (``temperature``/``alpha`` unused). Maximal
        argmax agreement on exactly the stream speculative decode
        verifies; one line of plumbing over :meth:`fit`.

        parallelism: None/'none' | 'dp' (word mode: batch sharded,
        psum'd sum-form pieces — update exact vs single device; sequence
        mode: forwarded to student.fit). Teacher/student optimizer
        settings come from the STUDENT's TrainConfig.
        """
        if self.decoder is None or not self.params:
            raise ValueError("teacher pipeline has no trained decoder")
        if mode not in ("word", "sequence"):
            raise ValueError(
                f"unknown distill mode {mode!r}; have word|sequence"
            )
        if student.tokenizer is None:
            student.tokenizer = self.tokenizer
        elif student.tokenizer.word_index != self.tokenizer.word_index:
            raise ValueError(
                "student tokenizer does not match the teacher's "
                "(token ids must agree for speculative verification)"
            )
        if student.decoder is None:
            student.build()

        ids = list(descriptions.keys())
        if mode == "sequence":
            feats_all = np.stack(
                [np.asarray(features[i]) for i in ids]
            ).astype(np.float32)
            # Greedy-decode the training set in ONE padded program shape
            # (the tail chunk zero-pads; pad captions are discarded).
            chunk = min(256, len(ids))
            caps: list[str] = []
            for s in range(0, len(ids), chunk):
                part = feats_all[s : s + chunk]
                n_real = part.shape[0]
                part = pad_rows(part, chunk)
                caps.extend(self.generate(part, method="greedy")[:n_real])
            pseudo = {
                i: [f"{START_TOKEN} {c} {END_TOKEN}"]
                for i, c in zip(ids, caps)
            }
            return student.fit(
                pseudo,
                features,
                epochs=epochs,
                batch_size=batch_size,
                parallelism=parallelism,
                log=log,
            )

        from tpucap.train.distill import make_distill_step

        cfg = student.config.train
        epochs = epochs or cfg.epochs
        batch_size = batch_size or cfg.batch_size
        F, T = build_training_batch(
            self.tokenizer, descriptions, features, self.config.decode.max_len
        )
        if F.shape[0] < batch_size:
            if log:
                log(
                    f"batch_size {batch_size} > {F.shape[0]} training rows; "
                    f"clamping batch_size to {F.shape[0]}"
                )
            batch_size = F.shape[0]
        if parallelism not in (None, "none", "dp"):
            raise NotImplementedError(
                f"fit_distill supports parallelism None|'none'|'dp', "
                f"got {parallelism!r}"
            )
        mesh = None
        if parallelism == "dp":
            mesh = make_mesh(student.config.mesh.n_devices)
            data_n = dict(mesh.shape)["data"]
            if batch_size % data_n:
                raise ValueError(
                    f"batch_size {batch_size} must divide by the "
                    f"{data_n}-device data mesh"
                )
            student._mesh = mesh
        from tpucap.train import build_optimizer

        optimizer = build_optimizer(
            cfg, total_steps=epochs * max(1, F.shape[0] // batch_size)
        )
        state = TrainState.create(
            student.params["decoder"], optimizer, jax.random.key(cfg.seed)
        )
        step = make_distill_step(
            self.decoder,
            student.decoder,
            optimizer,
            temperature=temperature,
            alpha=alpha,
            pad_id=0,
            mesh=mesh,
            donate=True,
        )
        from tpucap.train import own_state

        state = own_state(state)
        t_params = self.params["decoder"]
        rng = np.random.default_rng(cfg.seed)
        history: list[dict] = []
        for epoch in range(epochs):
            metrics_sum: dict = {}
            n = 0
            for bf, bt in batch_iterator((F, T), batch_size, rng=rng):
                if mesh is not None:
                    bf, bt = shard_batch(mesh, (bf, bt))
                state, metrics = step(state, t_params, bf, bt)
                n += 1
                for k, v in metrics.items():
                    metrics_sum[k] = metrics_sum.get(k, 0.0) + v
            metrics_sum = jax.device_get(metrics_sum)
            entry = {
                k: float(v) / max(n, 1) for k, v in metrics_sum.items()
            }
            entry["epoch"] = epoch
            history.append(entry)
            if log:
                log(
                    f"distill epoch {epoch}: loss={entry['loss']:.4f} "
                    f"kd={entry['kd']:.4f} "
                    f"agreement={entry['agreement']:.4f}"
                )
        student.state = state
        student.params["decoder"] = state.params
        student._decode_cache.clear()
        student._bf16_params = None
        return history

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
