"""CLI dispatcher and subcommand implementations.

Artifacts use open formats instead of the reference's pickles: features as
.npz (image_id -> array), tokenizer as JSON, checkpoints via orbax.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

import numpy as np


def _monitor_keying(args):
    """(best_metric, best_mode) for the CheckpointManager from
    --val-metric: decode metrics are maximized, loss minimized."""
    vm = getattr(args, "val_metric", None) or "loss"
    if vm == "loss":
        return "val_loss", "min"
    return f"val_{vm}", "max"


def _add_optimizer_flags(p):
    """Optimizer surface flags. Shared by `train` AND every checkpoint-
    restoring command (caption/evaluate/export/serve): the restore
    template's opt_state structure is built from these, so a checkpoint
    trained with --optimizer sgd restores with the same flag. Defaults
    are None so an explicit 0 (e.g. --momentum 0) still overrides a
    preset."""
    p.add_argument("--optimizer", default=None,
                   choices=["adam", "adamw", "sgd", "rmsprop", "adagrad"],
                   help="optimizer (default adam, the reference's choice)")
    p.add_argument("--momentum", type=float, default=None,
                   help="sgd momentum")
    p.add_argument("--weight-decay", type=float, default=None,
                   help="adamw decoupled weight decay")
    p.add_argument("--lr-schedule", default=None,
                   choices=["constant", "cosine", "exponential"])
    p.add_argument("--lr-decay-rate", type=float, default=None,
                   help="exponential schedule decay rate (default 0.96)")
    p.add_argument("--lr-decay-steps", type=int, default=None,
                   help="exponential schedule step interval (default 1000)")
    p.add_argument("--warmup-steps", type=int, default=None,
                   help="linear lr warmup steps prepended to the schedule")
    p.add_argument("--ema-decay", type=float, default=None,
                   help="track an exponential moving average of the "
                   "weights (e.g. 0.999); train/finetune then also "
                   "write a bundle_ema pipeline bundle with the "
                   "averaged weights")
    p.add_argument("--grad-accum-steps", type=int, default=None,
                   help="scan each batch as N microbatches (exact "
                   "full-batch update, 1/N peak activation memory; "
                   "parallelism none|dp|fsdp|tp|dp_tp — pp "
                   "microbatches by construction, sp/ep shard "
                   "activations instead)")
    p.add_argument("--steps-per-dispatch", type=int, default=None,
                   help="run N optimizer steps per compiled program "
                   "call (lax.scan over N stacked batches) — amortizes "
                   "per-dispatch host overhead; the update sequence is "
                   "exactly the per-step one (parallelism none|dp|fsdp|"
                   "tp|dp_tp, no --ema-decay)")
    p.add_argument("--checkpoint-every-steps", type=int, default=None,
                   help="also checkpoint every N optimizer steps "
                   "(mid-epoch; --resume restores the exact position) "
                   "— bounds a hard kill's lost work to < N steps on "
                   "long epochs (parallelism none|dp|fsdp)")
    p.add_argument("--train-precision", default=None,
                   choices=["f32", "bf16"],
                   help="training compute dtype: f32 (default, exact "
                   "Keras-parity numerics) or bf16 mixed precision "
                   "(bf16 matmuls, f32 master weights/optimizer; "
                   "every parallelism and --finetune-encoder)")
    p.add_argument("--grad-clip-norm", type=float, default=None,
                   help="global-norm gradient clipping (0 = off)")
    p.add_argument("--scheduled-sampling", type=float, default=None,
                   help="scheduled sampling (exposure-bias training): "
                   "max probability of replacing each teacher-forcing "
                   "input token with the model's own first-pass "
                   "prediction, ramped per epoch by --ss-schedule "
                   "(parallelism none|dp|fsdp)")
    p.add_argument("--ss-schedule", default=None,
                   choices=["linear", "inv_sigmoid", "constant"],
                   help="scheduled-sampling ramp (default linear)")
    p.add_argument("--val-metric", default=None,
                   choices=["loss", "bleu4", "cider", "rouge_l",
                            "meteor"],
                   help="what best-checkpointing/early-stopping monitor "
                   "when --val-split is given: loss (min, default) or a "
                   "greedy-decode corpus metric (max). Restore commands "
                   "need the SAME flag to pick the matching best "
                   "checkpoint")


def _add_restore_flags(p):
    p.add_argument("--average-last", type=int, default=None,
                   help="restore the uniform AVERAGE of the newest N "
                   "retained checkpoints instead of the best step "
                   "(checkpoint-averaging serving trick; canonical "
                   "decoder layout only)")


def _add_common_model_flags(p):
    p.add_argument("--encoder", default="vgg16",
                   choices=["vgg16", "inception_v3", "resnet50", "tiny_cnn",
                            "vit_b16", "vit_tiny"])
    p.add_argument("--decoder", default="lstm1",
                   choices=["lstm1", "lstm2", "gru1", "gru2", "inject",
                            "attention", "adaptive", "transformer"])
    p.add_argument("--features-kind", default="pooled",
                   choices=["pooled", "spatial"])
    p.add_argument("--embed-dim", type=int, default=256)
    p.add_argument("--hidden-dim", type=int, default=256)
    p.add_argument("--num-layers", type=int, default=None,
                   help="decoder depth (default: 1; lstm2 forces 2, "
                   "transformer defaults to 2)")
    p.add_argument("--num-heads", type=int, default=4,
                   help="attention heads (transformer decoder only)")
    p.add_argument("--mlp-dim", type=int, default=1024,
                   help="MLP width (transformer decoder only)")
    p.add_argument("--num-experts", type=int, default=0,
                   help="transformer decoder only: MoE experts per layer "
                   "(0 = dense MLP); top-2 routed. Pass the SAME value "
                   "used at training time when restoring a checkpoint")
    p.add_argument("--max-len", type=int, default=34)
    p.add_argument("--length-penalty", default=None,
                   choices=["simple", "gnmt"],
                   help="beam ranking denominator: simple = len^alpha "
                   "(default) | gnmt = ((5+len)/6)^alpha (Wu et al.)")
    p.add_argument("--min-len", type=int, default=0,
                   help="length floor: endseq blocked until this many "
                   "tokens are generated (0 = off)")
    p.add_argument("--bad-words", default=None,
                   help="comma-separated words that must never be "
                   "generated (or @FILE with one word per line) — the "
                   "production blocklist control; applies to "
                   "greedy/beam/sample/diverse, TP decode, and the "
                   "serving engines")
    p.add_argument("--no-repeat-ngram", type=int, default=0,
                   help="block n-grams from repeating within a caption "
                   "(greedy/beam/sample/diverse; 1 = never repeat a "
                   "token, 0 = off)")
    p.add_argument("--preset", default=None,
                   help="config preset name (config1..config5), overrides "
                   "encoder/decoder flags")


def _parse_bad_words(spec) -> tuple:
    """--bad-words 'w1,w2' or '@FILE' (one word per line, # comments)
    -> tuple for DecodeConfig.bad_words."""
    if not spec:
        return ()
    if spec.startswith("@"):
        with open(spec[1:]) as f:
            words = [
                ln.strip()
                for ln in f
                if ln.strip() and not ln.lstrip().startswith("#")
            ]
    else:
        words = [w.strip() for w in spec.split(",") if w.strip()]
    return tuple(words)


def _build_config(args):
    from tpucap.config import (
        Config,
        DecodeConfig,
        DecoderConfig,
        MeshConfig,
        PRESETS,
        TrainConfig,
    )

    if getattr(args, "preset", None):
        import dataclasses

        cfg = PRESETS[args.preset]
        # Explicit flags override the preset (mirroring how --method /
        # --beam-width are honored by being passed through call sites).
        ar = getattr(args, "attention_reg", 0.0)
        if ar:
            cfg = cfg.replace(
                train=dataclasses.replace(cfg.train, attention_reg=ar)
            )
        lr = getattr(args, "lr", None)
        if lr is not None:
            cfg = cfg.replace(
                train=dataclasses.replace(cfg.train, learning_rate=lr)
            )
        ga = getattr(args, "grad_accum_steps", None)
        if ga:
            cfg = cfg.replace(
                train=dataclasses.replace(cfg.train, grad_accum_steps=ga)
            )
        ces = getattr(args, "checkpoint_every_steps", None)
        if ces:
            cfg = cfg.replace(
                train=dataclasses.replace(
                    cfg.train, checkpoint_every_steps=ces
                )
            )
        ed = getattr(args, "ema_decay", None)
        if ed:
            cfg = cfg.replace(
                train=dataclasses.replace(cfg.train, ema_decay=ed)
            )
        tp_ = getattr(args, "train_precision", None)
        if tp_ is not None:
            cfg = cfg.replace(
                train=dataclasses.replace(cfg.train, precision=tp_)
            )
        vm = getattr(args, "val_metric", None)
        if vm is not None:
            cfg = cfg.replace(
                train=dataclasses.replace(cfg.train, val_metric=vm)
            )
        esp = getattr(args, "early_stopping_patience", None)
        if esp is not None:
            cfg = cfg.replace(
                train=dataclasses.replace(
                    cfg.train, early_stopping_patience=esp
                )
            )
        opt_overrides = {
            k: v
            for k, v in {
                "optimizer": getattr(args, "optimizer", None),
                "momentum": getattr(args, "momentum", None),
                "weight_decay": getattr(args, "weight_decay", None),
                "lr_schedule": getattr(args, "lr_schedule", None),
                "lr_decay_rate": getattr(args, "lr_decay_rate", None),
                "lr_decay_steps": getattr(args, "lr_decay_steps", None),
                "warmup_steps": getattr(args, "warmup_steps", None),
                "grad_clip_norm": getattr(args, "grad_clip_norm", None),
                "scheduled_sampling": getattr(
                    args, "scheduled_sampling", None
                ),
                "ss_schedule": getattr(args, "ss_schedule", None),
                "steps_per_dispatch": getattr(
                    args, "steps_per_dispatch", None
                ),
            }.items()
            if v is not None
        }
        if opt_overrides:
            cfg = cfg.replace(
                train=dataclasses.replace(cfg.train, **opt_overrides)
            )
        if getattr(args, "approx_topk", False):
            cfg = cfg.replace(
                decode=dataclasses.replace(cfg.decode, approx_topk=True)
            )
        md = getattr(args, "model_devices", 0)
        if md:
            cfg = cfg.replace(
                mesh=dataclasses.replace(cfg.mesh, model_devices=md)
            )
        return cfg
    from tpucap.config import encoder_config

    feats = args.features_kind
    if args.decoder in ("attention", "adaptive"):
        feats = "spatial"
    num_layers = getattr(args, "num_layers", None)
    if num_layers is None:
        num_layers = {"lstm2": 2, "transformer": 2}.get(args.decoder, 1)
    elif args.decoder == "lstm2":
        num_layers = 2
    return Config(
        encoder=encoder_config(args.encoder, feats),
        decoder=DecoderConfig(
            name=args.decoder,
            embed_dim=args.embed_dim,
            hidden_dim=args.hidden_dim,
            num_layers=num_layers,
            num_heads=getattr(args, "num_heads", 4),
            mlp_dim=getattr(args, "mlp_dim", 1024),
            # KV-cache/positional capacity tracks the decode budget.
            max_positions=max(40, args.max_len + 2),
            num_experts=getattr(args, "num_experts", 0),
        ),
        decode=DecodeConfig(
            method=getattr(args, "method", None) or "greedy",
            beam_width=getattr(args, "beam_width", 3),
            max_len=args.max_len,
            min_len=getattr(args, "min_len", 0) or 0,
            bad_words=_parse_bad_words(getattr(args, "bad_words", None)),
            no_repeat_ngram_size=getattr(args, "no_repeat_ngram", 0) or 0,
            length_penalty=getattr(args, "length_penalty", None)
            or "simple",
            approx_topk=getattr(args, "approx_topk", False),
        ),
        train=TrainConfig(
            batch_size=getattr(args, "batch_size", 64),
            learning_rate=getattr(args, "lr", None) or 1e-3,
            epochs=getattr(args, "epochs", 20),
            attention_reg=getattr(args, "attention_reg", 0.0),
            early_stopping_patience=getattr(
                args, "early_stopping_patience", None
            )
            or 0,
            grad_accum_steps=getattr(args, "grad_accum_steps", None) or 1,
            precision=getattr(args, "train_precision", None) or "f32",
            val_metric=getattr(args, "val_metric", None) or "loss",
            ema_decay=getattr(args, "ema_decay", None) or 0.0,
            optimizer=getattr(args, "optimizer", None) or "adam",
            momentum=getattr(args, "momentum", None) or 0.0,
            weight_decay=getattr(args, "weight_decay", None) or 0.0,
            lr_schedule=getattr(args, "lr_schedule", None) or "constant",
            lr_decay_rate=getattr(args, "lr_decay_rate", None) or 0.96,
            lr_decay_steps=getattr(args, "lr_decay_steps", None) or 1000,
            warmup_steps=getattr(args, "warmup_steps", None) or 0,
            grad_clip_norm=getattr(args, "grad_clip_norm", None) or 0.0,
            checkpoint_every_steps=getattr(
                args, "checkpoint_every_steps", None
            )
            or 0,
            scheduled_sampling=getattr(args, "scheduled_sampling", None)
            or 0.0,
            ss_schedule=getattr(args, "ss_schedule", None) or "linear",
            steps_per_dispatch=getattr(args, "steps_per_dispatch", None)
            or 1,
        ),
        mesh=MeshConfig(
            model_devices=getattr(args, "model_devices", 0) or 1
        ),
    )


def cmd_extract(args):
    """Feature extraction over an image directory -> .npz artifact."""
    from tpucap.pipeline import CaptioningPipeline

    cfg = _build_config(args)
    pipe = CaptioningPipeline(cfg)
    # Deterministic init from the config seed — the SAME weights
    # _restore_pipeline builds, so a fixture flow with no pretrained h5
    # (extract -> train -> caption) sees one consistent random encoder.
    # Pretrained import goes through --keras-h5 (no network here).
    pipe.build()
    if args.keras_h5:
        from tpucap.checkpoint import params_from_keras

        pipe.params["encoder"] = params_from_keras(
            args.keras_h5, cfg.encoder.name
        )

    paths = sorted(glob.glob(os.path.join(args.images, "*.jpg")))
    feats = pipe.extract_features(
        paths, batch_size=args.batch_size, parallelism=args.parallelism
    )
    ids = [os.path.splitext(os.path.basename(p))[0] for p in paths]
    np.savez(args.out, **dict(zip(ids, feats)))
    print(f"wrote {len(ids)} features to {args.out}")


_KARPATHY_CACHE: dict = {}


def _karpathy(path):
    """Parse (and cache — COCO's dataset json is ~100 MB and the train
    command reads it for both the train and val splits) a Karpathy
    dataset JSON."""
    if path not in _KARPATHY_CACHE:
        from tpucap.data import load_karpathy_json

        _KARPATHY_CACHE[path] = load_karpathy_json(path)
    return _KARPATHY_CACHE[path]


def _load_dataset(args, default_split: str = "train"):
    from tpucap.data import load_descriptions, load_split, prepare_descriptions

    kj = getattr(args, "karpathy_json", None)
    if kj:
        desc, splits = _karpathy(kj)
        name = args.split or default_split
        if not splits.get(name):
            # Pre-seeded empty lists must fail the same way as unknown
            # names — proceeding with zero images crashes obscurely
            # downstream.
            have = sorted(k for k, v in splits.items() if v)
            raise SystemExit(
                f"--split {name!r} is empty or absent in {kj} "
                f"(non-empty splits: {have})"
            )
        return prepare_descriptions(desc, splits[name])
    if not args.tokens:
        raise SystemExit("need --tokens FILE (or --karpathy-json JSON)")
    desc = load_descriptions(args.tokens)
    split_ids = load_split(args.split) if args.split else None
    return prepare_descriptions(desc, split_ids)


def _validate_finetune_flags(args):
    """Fail loudly on flag combinations the joint trainer does not
    implement — silently training single-device with no validation /
    early stopping would be worse than an error."""
    if not args.images:
        raise SystemExit("--finetune-encoder needs --images DIR")
    par = getattr(args, "parallelism", None)
    unsupported = [
        name
        for name, val in (
            ("--val-split", getattr(args, "val_split", None)),
            (
                "--early-stopping-patience",
                getattr(args, "early_stopping_patience", None),
            ),
            (
                f"--parallelism {par}",
                par not in (None, "none", "dp", "fsdp"),
            ),
        )
        if val
    ]
    if unsupported:
        raise SystemExit(
            f"{', '.join(unsupported)} not supported with "
            "--finetune-encoder (joint training runs single-device or "
            "--parallelism dp; train the decoder with `train` + "
            "extracted features for the rest)"
        )


def _cmd_train_finetune(args, pipe, prepared):
    """train --finetune-encoder: end-to-end (encoder + decoder) training
    from IMAGES (--images DIR, one <id>.jpg per caption id). Writes a
    pipeline bundle (--bundle-out, default <checkpoint-dir>/bundle) —
    the tuned encoder lives there; `tpucap serve --model-dir` and
    CaptioningPipeline.load() consume it."""
    from tpucap.data.preprocess import preprocess_batch

    pipe.fit_tokenizer(
        prepared,
        kind=getattr(args, "tokenizer", None) or "word",
        bpe_vocab_size=getattr(args, "bpe_vocab_size", 1024),
    )
    pipe.build()
    if getattr(args, "embeddings", None):
        pipe.set_pretrained_embeddings(
            args.embeddings,
            freeze=getattr(args, "freeze_embeddings", False),
        )
    if getattr(args, "keras_h5", None):
        # Start from pretrained encoder weights — the normal fine-tune
        # setup (a random encoder would just be joint from-scratch).
        from tpucap.checkpoint import params_from_keras

        pipe.params["encoder"] = params_from_keras(
            args.keras_h5, pipe.config.encoder.name
        )
        pipe._bf16_params = None
    os.makedirs(args.checkpoint_dir, exist_ok=True)
    pipe.tokenizer.save(
        os.path.join(args.checkpoint_dir, "tokenizer.json")
    )
    size = pipe.encoder.input_size
    mode = pipe.encoder.preprocess_mode
    ids = list(prepared.keys())
    images = {}
    for s in range(0, len(ids), 64):
        chunk = ids[s : s + 64]
        paths = [os.path.join(args.images, f"{i}.jpg") for i in chunk]
        x = preprocess_batch(paths, size=size, mode=mode)
        images.update(dict(zip(chunk, x)))
    parallelism = getattr(args, "parallelism", None)
    if getattr(args, "data_parallel", False):
        parallelism = "dp"
    mgr = None
    wants_ckpt = (
        getattr(args, "resume", False)
        or getattr(args, "handle_preemption", False)
        or getattr(args, "checkpoint_every_steps", None)
    )
    if wants_ckpt and getattr(args, "lora_rank", 0):
        # Refuse loudly: silently skipping the manager would let a user
        # who asked for kill-insurance lose the whole run.
        raise SystemExit(
            "--lora-rank checkpoints its adapter artifact via "
            "--lora-out, not the joint TrainState; drop "
            "--resume/--handle-preemption/--checkpoint-every-steps "
            "or train full weights"
        )
    if wants_ckpt:
        from tpucap.checkpoint import CheckpointManager

        mgr = CheckpointManager(
            args.checkpoint_dir, best_metric="val_loss"
        )
    history = pipe.fit_finetune(
        prepared,
        images,
        epochs=args.epochs,
        batch_size=args.batch_size,
        encoder_lr_scale=args.encoder_lr_scale,
        remat_encoder=getattr(args, "remat_encoder", False),
        parallelism=parallelism,
        augment=getattr(args, "augment", False),
        augment_shift=getattr(args, "augment_shift", 0) or 0,
        lora_rank=getattr(args, "lora_rank", 0),
        lora_alpha=getattr(args, "lora_alpha", None),
        checkpoint_manager=mgr,
        resume=getattr(args, "resume", False),
        handle_preemption=getattr(args, "handle_preemption", False),
        sharded_checkpoints=getattr(
            args, "sharded_checkpoints", False
        ),
    )
    if mgr is not None:
        mgr.close()
    if not history:
        print(
            "nothing to train: the restored checkpoint already covers "
            f"the requested epochs; checkpoints in {args.checkpoint_dir}"
        )
        return
    if getattr(args, "lora_out", None):
        pipe.save_lora(args.lora_out)
        print(f"LoRA adapters in {args.lora_out}")
    if getattr(args, "metrics_log", None) or getattr(
        args, "tensorboard_dir", None
    ):
        from tpucap.utils import MetricsLogger

        logger = MetricsLogger(
            args.metrics_log,
            tensorboard_dir=getattr(args, "tensorboard_dir", None),
        )
        for h in history:
            logger.log(h)
        logger.close()
    bundle = args.bundle_out or os.path.join(
        args.checkpoint_dir, "bundle"
    )
    pipe.save(bundle)
    _maybe_save_ema_bundle(args, pipe)
    if history[-1].get("preempted"):
        print(
            f"preempted after {len(history)} epoch entries; rescue "
            "checkpoint written — rerun the same command with "
            f"--resume to continue (checkpoints in "
            f"{args.checkpoint_dir}; bundle in {bundle} carries the "
            "mid-run weights)"
        )
        return
    print(
        f"finetuned {len(history)} epochs; final loss "
        f"{history[-1]['loss']:.4f}; bundle in {bundle}"
    )


def cmd_train(args):
    from tpucap.checkpoint import CheckpointManager
    from tpucap.pipeline import CaptioningPipeline
    from tpucap.utils import MetricsLogger

    # Flag validation BEFORE any dataset/checkpoint IO — a bad flag
    # combination must not surface as a FileNotFoundError.
    if getattr(args, "freeze_embeddings", False) and not getattr(
        args, "embeddings", None
    ):
        raise SystemExit("--freeze-embeddings needs --embeddings FILE")
    if not getattr(args, "finetune_encoder", False) and (
        getattr(args, "augment", False)
        or getattr(args, "augment_shift", 0)
    ):
        raise SystemExit(
            "--augment/--augment-shift run inside the joint "
            "encoder+decoder step — add --finetune-encoder (feature-"
            "based training has no images to augment)"
        )
    if not getattr(args, "finetune_encoder", False) and getattr(
        args, "remat_encoder", False
    ):
        raise SystemExit(
            "--remat-encoder applies to the joint encoder+decoder step "
            "— add --finetune-encoder (feature-based training has no "
            "encoder activations to rematerialize)"
        )
    if getattr(args, "lora_out", None) and not getattr(
        args, "lora_rank", 0
    ):
        raise SystemExit("--lora-out needs --lora-rank")
    if getattr(args, "lora_rank", 0):
        bad = [
            flag
            for flag, val in (
                ("--remat-encoder", getattr(args, "remat_encoder", False)),
                ("--ema-decay", getattr(args, "ema_decay", None)),
                ("--stream-features", getattr(args, "stream_features", False)),
                ("--val-split", getattr(args, "val_split", None)),
                (
                    "--parallelism fsdp",
                    getattr(args, "parallelism", None) == "fsdp",
                ),
                (
                    "--grad-accum-steps",
                    (getattr(args, "grad_accum_steps", None) or 1) > 1,
                ),
            )
            if val
        ]
        if bad:
            raise SystemExit(
                f"--lora-rank does not compose with {', '.join(bad)} "
                "(the adapters ARE the memory/monitoring fix; train "
                "full weights for those dials)"
            )
    if getattr(args, "resume", False) or getattr(
        args, "handle_preemption", False
    ):
        # fit AND fit_finetune both carry the checkpoint/preemption
        # dials (r5); LoRA checkpoints adapters via save_lora and the
        # EMA shadow is not restored — those still refuse.
        bad = [
            flag
            for flag, val in (
                ("--lora-rank", getattr(args, "lora_rank", 0)),
                ("--ema-decay", getattr(args, "ema_decay", None)),
            )
            if val
        ]
        if bad:
            raise SystemExit(
                f"--resume/--handle-preemption need the step-"
                f"checkpointed TrainState path; drop {', '.join(bad)}"
            )
    if getattr(args, "finetune_encoder", False):
        _validate_finetune_flags(args)
    elif not args.features:
        raise SystemExit(
            "--features is required (or use --finetune-encoder --images "
            "to train end-to-end from JPEGs)"
        )
    cfg = _build_config(args)
    pipe = CaptioningPipeline(cfg)
    prepared = _load_dataset(args)

    if getattr(args, "finetune_encoder", False):
        _cmd_train_finetune(args, pipe, prepared)
        return
    stream = bool(getattr(args, "stream_features", False))
    # --stream-features keeps the NpzFile handle LAZY: feature rows are
    # read from disk per batch inside fit(stream=True) instead of
    # materializing the full (N, F) stack here (the at-scale path for
    # spatial-feature training). npz members are stored uncompressed by
    # `extract` (np.savez), so a row read is one file seek, not a
    # decompress pass.
    features = (
        np.load(args.features) if stream else dict(np.load(args.features))
    )

    pipe.fit_tokenizer(
        prepared,
        kind=getattr(args, "tokenizer", None) or "word",
        bpe_vocab_size=getattr(args, "bpe_vocab_size", 1024),
    )
    pipe.build()
    if getattr(args, "embeddings", None):
        pipe.set_pretrained_embeddings(
            args.embeddings,
            freeze=getattr(args, "freeze_embeddings", False),
        )
    os.makedirs(args.checkpoint_dir, exist_ok=True)
    pipe.tokenizer.save(os.path.join(args.checkpoint_dir, "tokenizer.json"))

    val_data = None
    if getattr(args, "val_split", None):
        from tpucap.data import load_descriptions, load_split, prepare_descriptions

        kj = getattr(args, "karpathy_json", None)
        if kj:
            # With --karpathy-json, --val-split names a split in the
            # JSON (normally "val") instead of a split file.
            desc, splits = _karpathy(kj)
            if not splits.get(args.val_split):
                have = sorted(k for k, v in splits.items() if v)
                raise SystemExit(
                    f"--val-split {args.val_split!r} is empty or absent "
                    f"in {kj} (non-empty splits: {have})"
                )
            val_prepared = prepare_descriptions(
                desc, splits[args.val_split]
            )
        else:
            val_prepared = prepare_descriptions(
                load_descriptions(args.tokens), load_split(args.val_split)
            )
        val_data = (val_prepared, features)

    best_metric, best_mode = _monitor_keying(args)
    mgr = CheckpointManager(
        args.checkpoint_dir, best_metric=best_metric, best_mode=best_mode
    )
    tb = getattr(args, "tensorboard_dir", None)
    logger = (
        MetricsLogger(args.metrics_log, tensorboard_dir=tb)
        if (args.metrics_log or tb)
        else None
    )
    if getattr(args, "lora_rank", 0):
        # LoRA on the features path: adapters over the decoder; the
        # merged result is written as a pipeline bundle (the adapters
        # artifact too, with --lora-out). Step checkpoints don't apply
        # — the artifact IS the checkpoint.
        history = pipe.fit_lora(
            prepared,
            features,
            rank=args.lora_rank,
            alpha=getattr(args, "lora_alpha", None),
            epochs=args.epochs,
            batch_size=args.batch_size,
            parallelism=args.parallelism,
        )
        bundle = os.path.join(args.checkpoint_dir, "bundle")
        pipe.save(bundle)
        if getattr(args, "lora_out", None):
            pipe.save_lora(args.lora_out)
            print(f"LoRA adapters in {args.lora_out}")
        print(
            f"lora-trained {len(history)} epochs; final loss "
            f"{history[-1]['loss']:.4f}; bundle in {bundle}"
        )
        mgr.close()
        if logger:
            for h in history:
                logger.log(h)
            logger.close()
        return
    history = pipe.fit(
        prepared,
        features,
        epochs=args.epochs,
        batch_size=args.batch_size,
        data_parallel=args.data_parallel,
        parallelism=args.parallelism,
        checkpoint_manager=mgr,
        val_data=val_data,
        stream=stream,
        resume=getattr(args, "resume", False),
        handle_preemption=getattr(args, "handle_preemption", False),
        sharded_checkpoints=getattr(
            args, "sharded_checkpoints", False
        ),
    )
    if logger:
        for h in history:
            logger.log(h)
        logger.close()
    mgr.close()
    _maybe_save_ema_bundle(args, pipe)
    if history and history[-1].get("preempted"):
        print(
            f"preempted after {len(history)} epoch entries; rerun the "
            "same command with --resume to continue "
            f"(checkpoints in {args.checkpoint_dir})"
        )
        return
    if not history:
        # --resume on a run that already finished (or --epochs lowered
        # below the restored step count): zero epochs remained to train.
        print(
            "nothing to train: the restored checkpoint already covers "
            f"the requested epochs; checkpoints in {args.checkpoint_dir}"
        )
    else:
        print(f"trained {len(history)} epochs; final loss "
              f"{history[-1]['loss']:.4f}; checkpoints in "
              f"{args.checkpoint_dir}")
    if getattr(args, "bundle_out", None):
        pipe.save(args.bundle_out)
        print(f"wrote pipeline bundle to {args.bundle_out}")
    if getattr(args, "scst_epochs", 0):
        import dataclasses

        pipe.config = dataclasses.replace(
            pipe.config,
            train=dataclasses.replace(
                pipe.config.train, learning_rate=args.scst_lr
            ),
        )
        scst_hist = pipe.fit_scst(
            prepared,
            features,
            epochs=args.scst_epochs,
            batch_size=args.batch_size,
            temperature=args.scst_temperature,
        )
        bundle = os.path.join(args.checkpoint_dir, "bundle_scst")
        pipe.save(bundle)
        print(
            f"scst {len(scst_hist)} epochs; final reward "
            f"{scst_hist[-1]['reward']:.4f} (baseline "
            f"{scst_hist[-1]['baseline']:.4f}); bundle in {bundle}"
        )


def _maybe_save_ema_bundle(args, pipe):
    """--ema-decay: also write a pipeline bundle carrying the averaged
    weights (the raw weights go back afterwards — checkpoints stay the
    live training iterate)."""
    if not getattr(args, "ema_decay", None):
        return
    replaced = pipe.use_ema_weights()
    bundle = os.path.join(args.checkpoint_dir, "bundle_ema")
    pipe.save(bundle)
    pipe.params.update(replaced)
    pipe._decode_cache.clear()
    pipe._bf16_params = None
    print(f"EMA weights (decay {args.ema_decay}) bundled in {bundle}")


def _restore_pipeline(args):
    import jax

    from tpucap.checkpoint import CheckpointManager
    from tpucap.pipeline import CaptioningPipeline
    from tpucap.text import load_tokenizer
    from tpucap.train import TrainState, build_optimizer

    cfg = _build_config(args)
    tok = load_tokenizer(
        os.path.join(args.checkpoint_dir, "tokenizer.json")
    )
    pipe = CaptioningPipeline(cfg, tokenizer=tok)
    pipe.build()
    if getattr(args, "keras_h5", None):
        from tpucap.checkpoint import params_from_keras

        pipe.params["encoder"] = params_from_keras(
            args.keras_h5, cfg.encoder.name
        )
    best_metric, best_mode = _monitor_keying(args)
    mgr = CheckpointManager(
        args.checkpoint_dir, best_metric=best_metric, best_mode=best_mode
    )
    # The restore template's opt_state pytree must match what training
    # saved — build the optimizer from the SAME config resolution the
    # train command used (pass the matching --optimizer/--lr-schedule/...
    # flags when restoring a non-default-optimizer checkpoint).
    fresh = TrainState.create(
        pipe.params["decoder"],
        build_optimizer(cfg.train),
        jax.random.key(0),
    )
    # Restore the best-val_loss checkpoint when metrics were recorded
    # (mirroring ModelCheckpoint(save_best_only) + restore_best_weights);
    # best_step() is None for metric-less checkpoints -> latest.
    avg_k = getattr(args, "average_last", None)
    if avg_k:
        # Checkpoint averaging (canonical decoder layout): the uniform
        # mean of the newest k retained checkpoints replaces the
        # best-step restore.
        dec_params = mgr.average_params(fresh, last_k=avg_k)
        pipe.params["decoder"] = dec_params
        mgr.close()
        return pipe
    try:
        restored = mgr.restore(fresh, step=mgr.best_step())
        dec_params = restored.params
    except Exception:
        # Checkpoints written under --parallelism pp/dp_pp carry the
        # STACKED layer layout (parallel/pp.py); retry with a stacked
        # template and convert back to the canonical list-of-layers form.
        # Only the transformer family has a stacked layout — re-raise the
        # original restore error for everything else.
        if not hasattr(pipe.decoder, "layer_train"):
            raise
        from tpucap.parallel import stack_pp_layers, unstack_pp_layers

        stacked_tmpl = TrainState.create(
            stack_pp_layers(pipe.params["decoder"]),
            build_optimizer(cfg.train),
            jax.random.key(0),
        )
        restored = mgr.restore(stacked_tmpl, step=mgr.best_step())
        dec_params = unstack_pp_layers(restored.params)
    # Checkpoints written mid-training under --parallelism tp/dp_tp carry
    # the sharding-padded vocab; slice it back to the tokenizer's true
    # vocabulary (exact — padded columns never decode).
    out_kernel = dec_params.get("out", {}).get("kernel")
    if (
        out_kernel is not None
        and out_kernel.shape[-1] > pipe.decoder.vocab_size
    ):
        from tpucap.parallel import unpad_vocab_params

        dec_params = unpad_vocab_params(
            dec_params, pipe.decoder.vocab_size
        )
    pipe.params["decoder"] = dec_params
    mgr.close()
    return pipe


def cmd_distill(args):
    """Distill a trained teacher bundle into a small draft decoder
    (tpucap.train.distill) and save it as a pipeline bundle usable with
    `caption --method speculative --draft-bundle` or on its own."""
    import dataclasses

    from tpucap.pipeline import CaptioningPipeline

    if not 0.0 <= args.alpha <= 1.0:
        raise SystemExit(f"--alpha must be in [0, 1], got {args.alpha}")
    if args.temperature <= 0.0:
        raise SystemExit(
            f"--temperature must be > 0, got {args.temperature}"
        )
    teacher = CaptioningPipeline.load(args.teacher_bundle)
    prepared = _load_dataset(args)
    features = dict(np.load(args.features))

    t_cfg = teacher.config
    s_decoder = dataclasses.replace(
        t_cfg.decoder,
        name=args.student_decoder,
        embed_dim=args.student_embed_dim,
        hidden_dim=args.student_hidden_dim,
    )
    s_train = dataclasses.replace(
        t_cfg.train,
        epochs=args.epochs,
        batch_size=args.batch_size,
        **({"learning_rate": args.lr} if args.lr else {}),
    )
    s_cfg = dataclasses.replace(t_cfg, decoder=s_decoder, train=s_train)
    student = CaptioningPipeline(s_cfg, tokenizer=teacher.tokenizer)
    student.build()

    history = teacher.fit_distill(
        student,
        prepared,
        features,
        epochs=args.epochs,
        batch_size=args.batch_size,
        temperature=args.temperature,
        alpha=args.alpha,
        mode=args.mode,
        parallelism=args.parallelism,
    )
    student.save(args.out)
    last = history[-1]
    if args.mode == "word":
        print(
            f"distilled {len(history)} epochs; final kd={last['kd']:.4f} "
            f"agreement={last['agreement']:.4f}; draft bundle in {args.out}"
        )
    else:
        print(
            f"sequence-distilled {len(history)} epochs; final loss "
            f"{last['loss']:.4f}; draft bundle in {args.out}"
        )


def _caption_remote(args):
    """``caption --server HOST:PORT``: caption through a RUNNING
    ``tpucap serve`` endpoint via the tpucap.client SDK instead of
    restoring a model locally — no checkpoint, no device, no compile
    on this machine; the server's micro-batcher does the device work.
    Per-request dials (--prefix / --include-words) pass through;
    everything model-shaped (--method/--beam-width/--decoder/...) is
    SERVER-side state and is ignored here, while the modes that only
    exist offline (speculative/diverse/mbr, ensembles, attention
    dumps) refuse loudly."""
    if args.method in ("speculative", "diverse", "mbr"):
        raise SystemExit(
            f"--method {args.method} is an offline decode mode; "
            "--server supports the server's configured greedy/beam "
            "(plus --prefix / --include-words per request)"
        )
    if getattr(args, "ensemble_with", None) or getattr(
        args, "dump_attention", None
    ):
        raise SystemExit(
            "--ensemble-with/--dump-attention need a local model; "
            "drop --server to run offline"
        )
    if getattr(args, "prefix", None) and getattr(
        args, "include_words", None
    ):
        raise SystemExit("a request takes --prefix OR --include-words")

    from tpucap.client import CaptionClient, ServerError

    host, _, port = args.server.rpartition(":")
    if not port.isdigit():
        raise SystemExit(
            f"--server wants HOST:PORT, got {args.server!r}"
        )
    # Bracketed IPv6 literals ([::1]:8000) parse to host '[::1]' —
    # strip the brackets, which http.client does not accept (ADVICE r3).
    host = host.strip("[]")
    client = CaptionClient(
        host or "127.0.0.1", int(port), model=args.server_model or ""
    )
    include_words = None
    if getattr(args, "include_words", None):
        include_words = [
            w.strip() for w in args.include_words.split(",") if w.strip()
        ]
    blobs = []
    for path in args.image:
        with open(path, "rb") as f:
            blobs.append(f.read())
    try:
        if not include_words and not getattr(args, "prefix", None):
            caps = client.caption_many(blobs)
        else:
            # Dial'd requests go one-by-one (the dials are per-request
            # query params); concurrent submission still batches
            # server-side when several images are given.
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(min(32, len(blobs))) as pool:
                caps = list(
                    pool.map(
                        lambda b: client.caption(
                            b,
                            prefix=getattr(args, "prefix", None),
                            include_words=include_words,
                        ),
                        blobs,
                    )
                )
    except ServerError as e:
        raise SystemExit(f"server error ({e.status}): {e}")
    except OSError as e:
        raise SystemExit(f"cannot reach {args.server}: {e}")
    for path, cap in zip(args.image, caps):
        print(f"{path}\t{cap}")


def cmd_caption(args):
    if getattr(args, "server_model", None) and not getattr(
        args, "server", None
    ):
        # --server-model without --server would be silently ignored —
        # there is no local surface it applies to (ADVICE r3).
        raise SystemExit(
            "--server-model only applies with --server HOST:PORT"
        )
    if getattr(args, "server", None):
        return _caption_remote(args)
    if args.method == "speculative" and not args.draft_bundle:
        # Validate BEFORE restore/extract — a missing draft must not cost
        # a checkpoint restore and an encoder compile first.
        raise SystemExit(
            "--method speculative needs --draft-bundle "
            "(a pipeline.save() bundle for the draft model)"
        )
    ens_bundles = getattr(args, "ensemble_with", None) or []
    ens_weights = None
    if getattr(args, "ensemble_weights", None):
        if not ens_bundles:
            raise SystemExit("--ensemble-weights needs --ensemble-with")
        ens_weights = [
            float(w) for w in args.ensemble_weights.split(",")
        ]
        if len(ens_weights) != 1 + len(ens_bundles):
            raise SystemExit(
                f"{len(ens_weights)} weights for "
                f"{1 + len(ens_bundles)} ensemble members"
            )
    if ens_bundles and args.method not in ("greedy", "beam"):
        raise SystemExit(
            "--ensemble-with supports --method greedy|beam"
        )
    if getattr(args, "prefix", None) and (
        args.method not in ("greedy", "beam") or ens_bundles
    ):
        raise SystemExit(
            "--prefix supports --method greedy|beam (no ensemble)"
        )
    include_words = None
    if getattr(args, "include_words", None):
        include_words = [
            w.strip() for w in args.include_words.split(",") if w.strip()
        ]
        if (
            args.method != "beam"
            or ens_bundles
            or getattr(args, "prefix", None)
            or getattr(args, "dump_attention", None)
        ):
            raise SystemExit(
                "--include-words supports --method beam only "
                "(no ensemble/prefix/dump-attention)"
            )
    dump_attn = getattr(args, "dump_attention", None)
    if dump_attn and (
        args.method not in ("greedy", "beam")
        or ens_bundles
        or getattr(args, "prefix", None)
    ):
        raise SystemExit(
            "--dump-attention supports --method greedy|beam "
            "(no ensemble/prefix)"
        )
    if dump_attn and args.decoder not in (
        "attention",
        "adaptive",
        "transformer",
    ):
        # Fail before the checkpoint restore: pooled families have no
        # per-step attention distribution to dump.
        raise SystemExit(
            "--dump-attention needs an attention decoder family "
            f"(attention|adaptive|transformer), got --decoder "
            f"{args.decoder}"
        )
    if not args.keras_h5:
        print(
            "note: no --keras-h5 given — the encoder runs with its "
            "config-seed random init (matches a weightless `extract`; "
            "real photographs need pretrained encoder weights)",
            file=sys.stderr,
        )
    pipe = _restore_pipeline(args)
    if args.method == "speculative":
        from tpucap.pipeline import CaptioningPipeline

        draft = CaptioningPipeline.load(args.draft_bundle)
        feats = pipe.extract_features(list(args.image))
        caps, stats = pipe.generate_speculative(
            feats, draft=draft, gamma=args.gamma
        )
        print(
            "speculative: "
            f"{stats['emitted']} tokens in {stats['rounds']} rounds, "
            f"acceptance {stats['acceptance_rate']:.2%}",
            file=sys.stderr,
        )
    elif args.method == "mbr":
        feats = pipe.extract_features(list(args.image))
        caps = pipe.generate_mbr(
            feats,
            n_candidates=args.mbr_candidates,
            candidates=args.mbr_from,
            metric=args.mbr_metric,
            beam_width=args.beam_width,
            diversity=args.diversity,
        )
    elif args.method == "diverse":
        feats = pipe.extract_features(list(args.image))
        diverse = pipe.generate_diverse(
            feats,
            num_groups=args.diverse_groups,
            group_width=args.beam_width,
            diversity=args.diversity,
        )
        for path, groups in zip(args.image, diverse):
            for g, (cap, score) in enumerate(groups):
                print(f"{path}\t[group {g} {score:.3f}] {cap}")
        return
    elif ens_bundles:
        from tpucap.pipeline import CaptioningPipeline

        others = [CaptioningPipeline.load(b) for b in ens_bundles]
        # Each member encodes with ITS OWN encoder — members may use
        # different encoder families (pooled vs spatial features).
        feats = [
            p.extract_features(list(args.image))
            for p in (pipe, *others)
        ]
        caps = pipe.generate_ensemble(
            feats,
            others,
            method=args.method,
            beam_width=args.beam_width,
            weights=ens_weights,
        )
    elif include_words:
        feats = pipe.extract_features(list(args.image))
        details = pipe.generate_constrained(
            feats, include_words, beam_width=args.beam_width,
            return_details=True,
        )
        caps = [d["caption"] for d in details]
        for path, d in zip(args.image, details):
            if d["num_satisfied"] < len(d["satisfied"]):
                missing = [w for w, ok in d["satisfied"].items() if not ok]
                print(
                    f"{path}: could not include {missing} within "
                    "--max-len (returning the most-satisfied caption)",
                    file=sys.stderr,
                )
    elif getattr(args, "prefix", None):
        feats = pipe.extract_features(list(args.image))
        caps = pipe.generate_continuation(
            feats, args.prefix, method=args.method,
            beam_width=args.beam_width,
        )
    elif dump_attn:
        feats = pipe.extract_features(list(args.image))
        caps, alphas, lengths = pipe.generate_with_attention(
            feats, method=args.method, beam_width=args.beam_width
        )
        # The overlay artifact: alphas (B, T, L) — or (B, T, L+1) for
        # the adaptive family, whose last column is the sentinel weight
        # beta ("don't look"); spatial_positions reshapes L into the
        # encoder's grid (e.g. 196 -> 14x14) for upsampled heatmaps.
        np.savez(
            dump_attn,
            alphas=alphas,
            lengths=lengths,
            captions=np.asarray(caps),
            images=np.asarray([str(p) for p in args.image]),
            spatial_positions=np.int32(pipe.encoder.spatial_positions),
        )
        print(
            f"wrote attention maps {tuple(alphas.shape)} to {dump_attn}",
            file=sys.stderr,
        )
    else:
        caps = pipe.caption_images(
            args.image, method=args.method, beam_width=args.beam_width
        )
    for path, cap in zip(args.image, caps):
        print(f"{path}\t{cap}")


def cmd_score(args):
    """Teacher-forced caption scoring: how likely is THIS caption for
    THIS image under the trained model (pipeline.score_captions)."""
    if bool(args.caption) == bool(args.captions_file):
        raise SystemExit(
            "give exactly one of --caption (repeatable) or "
            "--captions-file"
        )
    if args.captions_file:
        with open(args.captions_file) as f:
            captions = [ln.strip() for ln in f if ln.strip()]
    else:
        captions = list(args.caption)
    if len(captions) != len(args.image):
        raise SystemExit(
            f"{len(captions)} captions for {len(args.image)} images — "
            "they pair one-to-one, in order"
        )
    pipe = _restore_pipeline(args)
    feats = pipe.extract_features(list(args.image))
    for path, cap, s in zip(
        args.image, captions, pipe.score_captions(feats, captions)
    ):
        print(
            f"{path}\tlogp={s['logp']:.4f}\tppl={s['perplexity']:.3f}"
            f"\ttokens={s['tokens']}\t{cap}"
        )


def cmd_evaluate(args):
    # Validate (and whitespace-strip) BEFORE any IO or decoding: the
    # decode pass over a full split costs minutes on the TPU, a typo'd
    # metric name must not throw it away.
    metrics = tuple(
        m.strip() for m in args.metrics.split(",") if m.strip()
    )
    bad = set(metrics) - {"bleu", "cider", "rouge_l", "meteor", "diversity"}
    if bad or not metrics:
        raise SystemExit(
            f"--metrics: unknown {sorted(bad) or '(empty)'}; "
            "choose from bleu,cider,rouge_l,meteor,diversity"
        )
    syn = getattr(args, "meteor_synonyms", None)
    if syn:
        if "meteor" not in metrics:
            raise SystemExit(
                "--meteor-synonyms needs meteor in --metrics"
            )
        if not os.path.isfile(syn):
            raise SystemExit(f"--meteor-synonyms: no such file {syn!r}")
    pipe = _restore_pipeline(args)
    prepared = _load_dataset(args, default_split="test")
    features = dict(np.load(args.features))
    dump = getattr(args, "dump_captions", None)
    coco_out = getattr(args, "coco_results", None)
    out = pipe.evaluate(
        prepared,
        features,
        method=args.method,
        beam_width=args.beam_width,
        batch_size=args.batch_size,
        parallelism=args.parallelism,
        metrics=metrics,
        return_captions=bool(dump or coco_out),
        meteor_synonyms=syn or None,
    )
    if dump:
        from tpucap.train.evaluate import evaluate_captions

        scores, generated = out
        # Per-image JSONL with an individual BLEU-4 so the worst
        # captions sort out with one `jq`/`sort` — the error-analysis
        # artifact the reference never had.
        with open(dump, "w") as f:
            for image_id, cap in generated.items():
                per = evaluate_captions(
                    {image_id: prepared[image_id]},
                    {image_id: cap},
                )
                f.write(
                    json.dumps(
                        {
                            "image_id": image_id,
                            "caption": cap,
                            "references": prepared[image_id],
                            "bleu4": round(per["bleu4"], 4),
                        }
                    )
                    + "\n"
                )
        print(f"wrote per-image captions to {dump}", file=sys.stderr)
    elif coco_out:
        scores, generated = out
    else:
        scores = out
    if coco_out:
        # coco-caption results format: [{"image_id": ..., "caption":
        # ...}] with integer ids where the id is numeric (COCO's
        # convention) — feeds pycocoevalcap / external leaderboards.
        rows = [
            {
                "image_id": int(i) if str(i).isdigit() else str(i),
                "caption": cap,
            }
            for i, cap in generated.items()
        ]
        with open(coco_out, "w") as f:
            json.dump(rows, f)
        print(
            f"wrote {len(rows)} coco-format results to {coco_out}",
            file=sys.stderr,
        )
    print(json.dumps(scores))


def cmd_compare(args):
    """Paired bootstrap significance test between two `evaluate
    --dump-captions` artifacts (tpucap.train.compare; Koehn 2004)."""
    from tpucap.train.compare import compare_caption_files

    result = compare_caption_files(
        args.file_a,
        args.file_b,
        metric=args.metric,
        n_resamples=args.bootstrap,
        seed=args.seed,
    )
    verdict = (
        "B != A (significant at 0.05)"
        if result["significant_at_05"]
        else "no significant difference at 0.05"
    )
    print(
        f"# {args.metric}: A={result['score_a']:.4f} "
        f"B={result['score_b']:.4f} delta={result['delta']:+.4f} "
        f"ci95=[{result['delta_ci95'][0]:+.4f}, "
        f"{result['delta_ci95'][1]:+.4f}] p={result['p_value']:.3f} "
        f"-> {verdict}",
        file=sys.stderr,
    )
    print(json.dumps(result))


def cmd_export(args):
    """Export the trained decoder back to a reference-loadable Keras .h5
    (docs/MIGRATION.md 'exit ramp') or, with --format aot, an AOT
    StableHLO serving bundle; also writes a pipeline.save() bundle when
    --bundle-out is given."""
    from tpucap.checkpoint import export_h5

    pipe = _restore_pipeline(args)
    if getattr(args, "format", "h5") == "aot":
        from tpucap.checkpoint import export_decode

        manifest = export_decode(
            pipe,
            args.out,
            batch_size=args.aot_batch_size,
            method=getattr(args, "method", None),
            beam_width=getattr(args, "beam_width", None),
            include_encoder=args.include_encoder,
            ladder=getattr(args, "aot_ladder", False),
        )
        print(
            f"wrote AOT bundle to {args.out} "
            f"(method={manifest['method']}, "
            f"batch={manifest['batch_size']}, "
            f"platforms={manifest['platforms']})"
        )
        if args.bundle_out:
            pipe.save(args.bundle_out)
            print(f"wrote pipeline bundle to {args.bundle_out}")
        return
    kw = {}
    if type(pipe.decoder).__name__ == "AttentionDecoder":
        # The stepwise SAT export bakes the spatial grid size into the
        # Input shape — use the restored encoder's own grid.
        kw["positions"] = pipe.encoder.spatial_positions
    export_h5(
        pipe.decoder,
        pipe.params["decoder"],
        args.out,
        max_len=pipe.config.decode.max_len,
        **kw,
    )
    print(f"wrote Keras h5 decoder to {args.out}")
    if args.bundle_out:
        pipe.save(args.bundle_out)
        print(f"wrote pipeline bundle to {args.bundle_out}")


def cmd_serve(args):
    from tpucap.serve_http import CaptionHTTPServer

    # Validate the --extra-model specs BEFORE any (slow) model loading
    # so a typo fails instantly.
    extra_specs = {}
    for spec in getattr(args, "extra_model", None) or []:
        name, sep, path = spec.partition("=")
        if not sep or not name or not path:
            raise SystemExit(
                f"--extra-model wants NAME=BUNDLE_DIR, got {spec!r}"
            )
        if name in extra_specs or name == "default":
            raise SystemExit(
                f"--extra-model: duplicate/reserved name {name!r}"
            )
        extra_specs[name] = path
    if extra_specs and getattr(args, "aot_bundle", None):
        raise SystemExit("--extra-model is not supported with --aot-bundle")
    if extra_specs and args.engine != "batch":
        raise SystemExit("--extra-model needs --engine batch")
    if args.allow_reload and getattr(args, "aot_bundle", None):
        # AotCaptioner has no reload_params — the exported StableHLO
        # programs are immutable artifacts. Fail at startup instead of
        # letting an operator discover it on the first POST /reload.
        raise SystemExit(
            "--allow-reload is not supported with --aot-bundle "
            "(AOT artifacts are immutable; restart on a new bundle)"
        )

    if getattr(args, "aot_bundle", None):
        # Serve the AOT StableHLO artifact: no model code, no tracing —
        # the micro-batcher drives the exported program ladder directly.
        from tpucap.checkpoint import AotCaptioner

        pipe = AotCaptioner.load(args.aot_bundle)
        if args.engine != "batch":
            raise SystemExit(
                "--aot-bundle serves through the batch micro-batcher "
                "(the continuous engines re-trace per-lane programs); "
                "drop --engine continuous"
            )
        # AOT programs are fixed at export time — the server must run
        # the bundle's method/beam_width. Honor the manifest and warn
        # when the CLI flags disagree (serve's --method defaults to
        # beam, which would otherwise crash a greedy bundle at warmup).
        m_method = pipe.manifest["method"]
        print(
            f"serving the bundle's exported programs: method="
            f"{m_method}"
            + (
                f" beam_width={pipe.manifest['beam_width']}"
                if m_method == "beam"
                else ""
            )
            + " (--method/--beam-width flags do not apply to AOT "
            "bundles)",
            file=sys.stderr,
        )
        args.method = m_method
        args.beam_width = pipe.manifest["beam_width"]
        covered = pipe.manifest["batch_sizes"]
        if args.max_batch > covered[-1]:
            raise SystemExit(
                f"--max-batch {args.max_batch} exceeds the bundle's "
                f"largest exported program ({covered[-1]}); re-export "
                "with a bigger --aot-batch-size or lower --max-batch"
            )
        if not pipe.manifest.get("has_encoder"):
            print(
                "note: bundle has no encoder program — only "
                "/caption_features will work (re-export with "
                "--include-encoder for the JPEG /caption path)",
                file=sys.stderr,
            )
    elif args.model_dir:
        from tpucap.pipeline import CaptioningPipeline

        pipe = CaptioningPipeline.load(args.model_dir)
    else:
        pipe = _restore_pipeline(args)
    extra_models = None
    if extra_specs:
        from tpucap.pipeline import CaptioningPipeline

        extra_models = {
            name: CaptioningPipeline.load(path)
            for name, path in extra_specs.items()
        }
    srv = CaptionHTTPServer(
        pipe,
        host=args.host,
        port=args.port,
        max_batch=args.max_batch,
        max_delay_ms=args.max_delay_ms,
        method=args.method,
        beam_width=args.beam_width,
        max_queue=args.max_queue,
        engine=args.engine,
        allow_reload=args.allow_reload,
        extra_models=extra_models,
        max_body_bytes=int(args.max_body_mb * (1 << 20)),
    )
    if args.warmup:
        print("warming up (compiling every batch bucket)...",
              file=sys.stderr)
        srv.warmup()
    host, port = srv.address
    print(f"serving on http://{host}:{port} "
          f"(POST /caption, POST /caption_features, GET /stats)",
          file=sys.stderr)
    # Graceful drain on SIGTERM (the orchestrator's stop signal — the
    # serving analog of train --handle-preemption): stop accepting,
    # finish in-flight batches via close(), exit 0. The handler only
    # schedules shutdown — BaseServer.shutdown() would deadlock if
    # called from a signal frame interrupting serve_forever itself.
    import signal
    import threading as _threading

    def _on_sigterm(signum, frame):
        del signum, frame
        print("SIGTERM: draining and shutting down...", file=sys.stderr)
        _threading.Thread(
            target=srv._httpd.shutdown, daemon=True
        ).start()

    old_term = signal.signal(signal.SIGTERM, _on_sigterm)
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        signal.signal(signal.SIGTERM, old_term)
        srv.close()
        print("drained; bye", file=sys.stderr)


def cmd_doctor(args):
    """Environment diagnostics: platform/devices, library versions, the
    native JPEG extension, compile-cache status, and a one-matmul device
    smoke — the first thing to run on a new box or a broken deploy."""
    import time

    report = {}
    import jax

    t0 = time.perf_counter()
    devices = jax.devices()
    report["platform"] = devices[0].platform
    report["devices"] = [str(d) for d in devices]
    report["device_query_s"] = round(time.perf_counter() - t0, 3)
    report["jax"] = jax.__version__
    for mod in ("flax", "optax", "orbax.checkpoint", "grain", "nltk"):
        try:
            m = __import__(mod)
            for part in mod.split(".")[1:]:
                m = getattr(m, part)
            report[mod] = getattr(m, "__version__", "present")
        except Exception as e:  # pragma: no cover - env-specific
            report[mod] = f"MISSING ({type(e).__name__})"
    try:
        import tpucap

        report["tpucap"] = tpucap.__version__
    except Exception:
        report["tpucap"] = "unknown"
    cache = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        jax.config.jax_compilation_cache_dir or "(unset)",
    )
    report["compile_cache"] = cache
    try:
        from tpucap.ops import jpeg

        # Touch the extension so the on-demand g++ build (first import)
        # happens here, not mid-serving.
        report["jpeg_extension"] = (
            "ok" if hasattr(jpeg, "decode_jpeg_batch") else "missing"
        )
    except Exception as e:
        report["jpeg_extension"] = f"BUILD FAILED ({type(e).__name__}: {e})"
    if not args.no_device_smoke:
        import jax.numpy as jnp

        t0 = time.perf_counter()
        x = jnp.ones((512, 512), jnp.bfloat16)
        y = (x @ x).block_until_ready()
        report["matmul_smoke_s"] = round(time.perf_counter() - t0, 3)
        report["matmul_ok"] = bool(jnp.isfinite(y).all())
    print(json.dumps(report, indent=2))


def cmd_profile(args):
    """Capture a TensorBoard device trace of the configured workload —
    the SURVEY §5.1 observability surface as one command. Random params
    (profiling measures programs, not weights); warmup runs outside the
    trace so compile time never pollutes it."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tpucap.models.decoders import build_decoder
    from tpucap.models.encoders import build_encoder
    from tpucap.utils import profile_trace

    cfg = _build_config(args)
    enc = build_encoder(cfg.encoder.name, cfg.encoder.features)
    dec = build_decoder(
        cfg.decoder.name,
        vocab_size=cfg.vocab_size,
        feature_dim=cfg.encoder.feature_dim,
        embed_dim=cfg.decoder.embed_dim,
        hidden_dim=cfg.decoder.hidden_dim,
        num_layers=cfg.decoder.num_layers,
        attention_dim=cfg.decoder.attention_dim,
        num_heads=cfg.decoder.num_heads,
        mlp_dim=cfg.decoder.mlp_dim,
        max_positions=cfg.decoder.max_positions,
        num_experts=cfg.decoder.num_experts,
    )
    params = dec.init(jax.random.key(0))
    B = args.batch
    if cfg.encoder.features == "spatial":
        fshape = (B, enc.spatial_positions, cfg.encoder.feature_dim)
    else:
        fshape = (B, cfg.encoder.feature_dim)
    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    feats = jax.random.normal(jax.random.key(1), fshape, dtype)

    if args.workload == "decode":
        from tpucap.decode import beam_decode, greedy_decode

        kw = dict(start_id=1, end_id=2, max_len=cfg.decode.max_len,
                  decoder=dec)
        if args.method == "beam":
            kw["beam_width"] = args.beam_width

        engine = greedy_decode if args.method == "greedy" else beam_decode

        @jax.jit
        def run(params, feats):
            return engine(
                dec.step, params, dec.init_state(params, feats), **kw
            )

        def once():
            return np.asarray(run(params, feats).lengths).sum()

    elif args.workload == "train":
        import optax

        from tpucap.train import TrainState, make_train_step

        opt = optax.adam(1e-3)
        state = TrainState.create(params, opt, jax.random.key(2))
        step = make_train_step(
            dec,
            opt,
            compute_dtype=(
                jnp.bfloat16
                if getattr(args, "train_precision", None) == "bf16"
                else None
            ),
        )
        tokens = jax.random.randint(
            jax.random.key(3), (B, cfg.decode.max_len + 1), 1,
            cfg.vocab_size,
        ).astype(jnp.int32)
        tfeats = feats.astype(jnp.float32)

        def once():
            nonlocal state
            state, m = step(state, tfeats, tokens)
            return float(np.asarray(m["loss"]))

    elif args.workload == "encoder":
        enc_params = enc.init(jax.random.key(4))
        images = jax.random.uniform(
            jax.random.key(5),
            (B, enc.input_size, enc.input_size, 3),
            dtype,
        )
        run = jax.jit(enc.apply)

        def once():
            return float(
                np.asarray(run(enc_params, images)).ravel()[0]
            )

    else:
        raise SystemExit(f"unknown workload {args.workload!r}")

    print(f"compiling + warmup ({args.workload})...", file=sys.stderr)
    once()
    print(f"tracing {args.steps} steps -> {args.out}", file=sys.stderr)
    with profile_trace(args.out):
        for _ in range(args.steps):
            once()
    print(
        f"trace written; view with: tensorboard --logdir {args.out} "
        "(Profile tab)",
    )


def cmd_bench(args, extra):
    import subprocess

    repo = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    sys.exit(subprocess.call(
        [sys.executable, os.path.join(repo, "bench.py"), *extra]
    ))


def main(argv=None):
    # Honor JAX_PLATFORMS even where a sitecustomize hook force-
    # registers a device plugin at interpreter start (the axon/TPU
    # tunnel build does): plugin registration overrides the env var,
    # so `JAX_PLATFORMS=cpu python -m tpucap ...` would silently run
    # on the remote TPU — minutes of tunnel compiles for a CPU-shaped
    # job. Re-asserting through jax.config wins over the hook. No-op
    # when jax already initialized its backends (in-process callers
    # like the test suite set the config themselves).
    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        try:
            import jax

            jax.config.update("jax_platforms", plat)
        except Exception:
            pass  # backends already initialized; leave them be
    ap = argparse.ArgumentParser(prog="tpucap")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("extract", help="extract CNN features to .npz")
    _add_common_model_flags(p)
    p.add_argument("--images", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--keras-h5", default=None,
                   help="pretrained Keras .h5 to import encoder weights from")
    p.add_argument("--parallelism", default=None, choices=["none", "dp"],
                   help="dp: shard the encode batch over the device mesh")
    p.set_defaults(fn=cmd_extract)

    p = sub.add_parser("train", help="train a caption decoder")
    _add_common_model_flags(p)
    p.add_argument("--tokens", required=False, default=None,
                   help="Flickr8k token file (or use --karpathy-json)")
    p.add_argument("--karpathy-json", default=None,
                   help="Karpathy dataset_*.json with embedded splits; "
                   "--split/--val-split then name splits "
                   "(train|val|test) instead of files")
    p.add_argument("--split", default=None)
    p.add_argument("--val-split", default=None,
                   help="dev-split id file; enables val_loss best-"
                   "checkpoint keying and --early-stopping-patience")
    p.add_argument("--early-stopping-patience", type=int, default=None,
                   help="stop when val_loss hasn't improved for N epochs "
                   "(needs --val-split); 0 = disabled; also overrides "
                   "--preset when given")
    p.add_argument("--features", default=None,
                   help="precomputed-features .npz (required unless "
                   "--finetune-encoder)")
    p.add_argument("--finetune-encoder", action="store_true",
                   help="end-to-end: train the encoder THROUGH the "
                   "captioning loss from --images (frozen-BN; writes a "
                   "pipeline bundle for serve --model-dir)")
    p.add_argument("--images", default=None,
                   help="image dir (<id>.jpg) for --finetune-encoder")
    p.add_argument("--augment", action="store_true",
                   help="--finetune-encoder only: on-device per-step "
                   "augmentation (random horizontal flip) inside the "
                   "jitted step")
    p.add_argument("--augment-shift", type=int, default=0,
                   help="--finetune-encoder only: also random-translate "
                   "each image by up to N px (reflect padding)")
    p.add_argument("--encoder-lr-scale", type=float, default=0.1,
                   help="scale on the encoder's updates during "
                   "--finetune-encoder (0.1 = standard backbone lr)")
    p.add_argument("--remat-encoder", action="store_true",
                   help="--finetune-encoder only: recompute encoder "
                   "activations in the backward pass (jax.checkpoint) — "
                   "exact same update, lower peak HBM; combine with "
                   "--grad-accum-steps for the biggest image batches")
    p.add_argument("--bundle-out", default=None,
                   help="also write a pipeline.save() bundle (serve/"
                   "ensemble/speculative input; --finetune-encoder "
                   "defaults it to <checkpoint-dir>/bundle)")
    p.add_argument("--keras-h5", default=None,
                   help="pretrained Keras encoder weights to start "
                   "--finetune-encoder from")
    p.add_argument("--lora-rank", type=int, default=0,
                   help="LoRA fine-tuning: freeze every base weight and "
                   "train a rank-N overlay on the 2-D matmul kernels "
                   "(~1-2%% trainable params; with --finetune-encoder "
                   "the overlay spans encoder+decoder)")
    p.add_argument("--lora-alpha", type=float, default=None,
                   help="LoRA scale numerator (effective scale "
                   "alpha/rank); default alpha=rank (scale 1)")
    p.add_argument("--lora-out", default=None,
                   help="also write the trained LoRA adapters as a "
                   "small .npz artifact (tpucap.train.lora.load_lora)")
    p.add_argument("--resume", action="store_true",
                   help="continue from the latest checkpoint in "
                   "--checkpoint-dir at its exact epoch/batch position "
                   "(bit-identical to an uninterrupted run)")
    p.add_argument("--handle-preemption", action="store_true",
                   help="on SIGTERM: finish the in-flight step, write a "
                   "mid-epoch rescue checkpoint, exit cleanly — rerun "
                   "with --resume to continue (TPU preemption recipe)")
    p.add_argument("--sharded-checkpoints", action="store_true",
                   help="with --parallelism fsdp: write checkpoints in "
                   "the live 1/N ZeRO layout (each process saves only "
                   "its shards — no gather, no host-size copy; same "
                   "disk format, restores everywhere)")
    p.add_argument("--scst-epochs", type=int, default=0,
                   help="after CE training, run N epochs of self-"
                   "critical sequence training (REINFORCE on CIDEr-D "
                   "with a greedy baseline); writes bundle_scst")
    p.add_argument("--scst-lr", type=float, default=5e-5,
                   help="learning rate for the SCST phase (practice "
                   "wants ~20x below the CE lr)")
    p.add_argument("--scst-temperature", type=float, default=1.0,
                   help="sampling temperature for SCST rollouts")
    p.add_argument("--tokenizer", default="word",
                   choices=["word", "bpe"],
                   help="word (default): Keras-parity word vocabulary — "
                   "the reference behavior; bpe: subword vocabulary "
                   "(no OOV words, bounded embedding table; the "
                   "tokenizer artifact round-trips through caption/"
                   "evaluate/serve automatically)")
    p.add_argument("--bpe-vocab-size", type=int, default=1024,
                   help="target subword vocabulary size for "
                   "--tokenizer bpe")
    p.add_argument("--embeddings", default=None,
                   help="GloVe-format word-vector file to initialize the "
                   "decoder embedding table from (zero rows for "
                   "uncovered words)")
    p.add_argument("--freeze-embeddings", action="store_true",
                   help="pin the pretrained embedding table during "
                   "training (optimizer updates masked to zero)")
    p.add_argument("--checkpoint-dir", default="checkpoints")
    p.add_argument("--epochs", type=int, default=20)
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--lr", type=float, default=None,
                   help="learning rate (default 1e-3; also overrides "
                   "--preset when given)")
    p.add_argument("--data-parallel", action="store_true")
    p.add_argument("--stream-features", action="store_true",
                   help="stream feature rows from the .npz per batch "
                   "(lazy reads + background prefetch) instead of "
                   "materializing the full (N, F) stack — the at-scale "
                   "path for spatial features; identical training "
                   "trajectory to the in-memory path")
    p.add_argument("--parallelism", default=None,
                   choices=["none", "dp", "fsdp", "tp", "dp_tp", "pp",
                            "dp_pp", "ep", "dp_ep", "sp", "dp_sp"],
                   help="dp: batch-sharded shard_map+psum; fsdp: "
                   "ZeRO-style fully-sharded DP (params/grads/optimizer "
                   "state 1/N per device, gathered just-in-time — the "
                   "memory-scaling dp, update-exact); tp: vocab-"
                   "sharded CE (vocab auto-padded to the mesh); dp_tp: "
                   "2-D batch x vocab mesh; pp: GPipe pipeline over a "
                   "stage axis (transformer decoder only); dp_pp: 2-D "
                   "batch x stage mesh; ep: expert-parallel MoE "
                   "(transformer with --num-experts); dp_ep: 2-D batch "
                   "x expert mesh; sp: ring-attention sequence parallel "
                   "(transformer; sequences auto-pad to the ring); "
                   "dp_sp: 2-D batch x sequence mesh")
    p.add_argument("--model-devices", type=int, default=0,
                   help="model-axis width for --parallelism dp_tp "
                   "(required >1 for dp_tp) / stage-axis width for "
                   "dp_pp / expert-axis width for dp_ep / seq-axis "
                   "width for dp_sp")
    p.add_argument("--attention-reg", type=float, default=0.0,
                   help="doubly-stochastic attention regularizer weight "
                   "(Show-Attend-Tell; attention decoder only)")
    _add_optimizer_flags(p)
    p.add_argument("--metrics-log", default=None)
    p.add_argument("--tensorboard-dir", default=None,
                   help="also mirror per-epoch metrics as TensorBoard "
                   "scalars (same logdir family as the profiler traces)")
    p.set_defaults(fn=cmd_train)

    p = sub.add_parser(
        "distill",
        help="distill a teacher bundle into a small draft decoder "
        "(for --method speculative, or standalone serving)",
    )
    p.add_argument("--teacher-bundle", required=True,
                   help="pipeline.save() bundle of the trained teacher")
    p.add_argument("--tokens", required=False, default=None,
                   help="Flickr8k token file (or use --karpathy-json)")
    p.add_argument("--karpathy-json", default=None,
                   help="Karpathy dataset_*.json with embedded splits; "
                   "--split/--val-split then name splits "
                   "(train|val|test) instead of files")
    p.add_argument("--split", default=None)
    p.add_argument("--features", required=True,
                   help="precomputed-features .npz (the teacher's "
                   "encoder family)")
    p.add_argument("--out", required=True,
                   help="output bundle dir for the distilled draft")
    p.add_argument("--student-decoder", default="lstm1",
                   choices=["lstm1", "lstm2", "gru1", "gru2", "inject",
                            "transformer"],
                   help="draft decoder family (attention needs spatial "
                   "features and is rarely a sensible draft)")
    p.add_argument("--student-embed-dim", type=int, default=128)
    p.add_argument("--student-hidden-dim", type=int, default=128)
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--lr", type=float, default=None)
    p.add_argument("--temperature", type=float, default=2.0,
                   help="soft-target temperature (word mode)")
    p.add_argument("--alpha", type=float, default=0.5,
                   help="KD/CE mix: 1 = pure soft targets, 0 = plain CE "
                   "(word mode)")
    p.add_argument("--mode", default="word",
                   choices=["word", "sequence"],
                   help="word: soft-target KL vs the teacher's "
                   "distribution; sequence: CE on the teacher's own "
                   "greedy captions (Kim & Rush 2016)")
    p.add_argument("--parallelism", default=None,
                   choices=["none", "dp"],
                   help="dp: batch-sharded distillation (update exact "
                   "vs single device)")
    p.set_defaults(fn=cmd_distill)

    p = sub.add_parser("caption", help="caption image files")
    _add_common_model_flags(p)
    _add_optimizer_flags(p)
    p.add_argument("--image", nargs="+", required=True)
    p.add_argument("--server", default=None, metavar="HOST:PORT",
                   help="caption through a running `tpucap serve` "
                   "endpoint instead of restoring a model locally "
                   "(tpucap.client SDK; no checkpoint/device needed "
                   "here). --prefix/--include-words pass through "
                   "per request; model-shaped flags are the server's")
    p.add_argument("--server-model", default=None, metavar="NAME",
                   help="with --server: pick a named model on a "
                   "multi-model server (?model=NAME routing)")
    p.add_argument("--checkpoint-dir", default="checkpoints")
    p.add_argument("--method", default="beam",
                   choices=["greedy", "beam", "speculative", "diverse",
                            "mbr"])
    p.add_argument("--beam-width", type=int, default=3)
    p.add_argument("--dump-attention", default=None, metavar="OUT.npz",
                   help="also write per-token attention maps "
                   "(alphas/lengths/captions/spatial_positions) for "
                   "heatmap overlays — attention/adaptive/transformer "
                   "decoders, --method greedy|beam")
    p.add_argument("--mbr-candidates", type=int, default=5,
                   help="--method mbr: candidate pool size per image")
    p.add_argument("--mbr-from", default="sample",
                   choices=["sample", "beam", "diverse"],
                   help="--method mbr: candidate pool source")
    p.add_argument("--mbr-metric", default="cider",
                   choices=["cider", "bleu4"],
                   help="--method mbr: consensus utility")
    p.add_argument("--diverse-groups", type=int, default=2,
                   help="--method diverse: number of beam groups; each "
                   "group is --beam-width wide and prints its own "
                   "caption line")
    p.add_argument("--diversity", type=float, default=0.5,
                   help="--method diverse: Hamming penalty strength "
                   "pushing later groups off earlier groups' words "
                   "(0 = independent exact beams)")
    p.add_argument("--prefix", default=None,
                   help="forced caption opening ('a dog'): the decoder "
                   "is teacher-forced through it, then greedy/beam "
                   "continues — guided captioning / completion")
    p.add_argument("--include-words", default=None, metavar="W1,W2",
                   help="words the caption MUST contain (constrained "
                   "beam search, Anderson et al. 2017; up to 4 — each "
                   "word doubles the decode batch). Applies to every "
                   "image; --method beam only. Prints the achieved "
                   "satisfaction per image on stderr when full "
                   "satisfaction was unreachable within --max-len")
    p.add_argument("--draft-bundle", default=None,
                   help="pipeline.save() bundle of a cheap draft model "
                   "(same tokenizer/features) for --method speculative — "
                   "output is token-identical to greedy on the target")
    p.add_argument("--gamma", type=int, default=4,
                   help="speculative draft length per round")
    p.add_argument("--ensemble-with", action="append", default=None,
                   metavar="BUNDLE",
                   help="pipeline.save() bundle of another trained "
                   "model (repeatable); decode combines all models' "
                   "per-step distributions as a product of experts "
                   "(greedy|beam). Members may use different decoder "
                   "families/encoders but must share the tokenizer; "
                   "each member's features come from its own encoder")
    p.add_argument("--ensemble-weights", default=None,
                   help="comma-separated per-model weights (first = "
                   "the --checkpoint-dir model), normalized to sum 1; "
                   "default uniform")
    p.add_argument("--approx-topk", action="store_true",
                   help="TPU approx_max_k for the vocab top-k (faster, "
                   "~0.95 recall per step; merge stage stays exact)")
    p.add_argument("--keras-h5", default=None,
                   help="pretrained Keras .h5 encoder weights — use the "
                   "same file `extract` used, or captions come from a "
                   "random encoder")
    _add_restore_flags(p)
    p.set_defaults(fn=cmd_caption)

    p = sub.add_parser(
        "score",
        help="score given captions against images (teacher-forced "
        "log-prob / perplexity — reranking & data filtering)",
    )
    _add_common_model_flags(p)
    _add_optimizer_flags(p)
    p.add_argument("--image", nargs="+", required=True)
    p.add_argument("--caption", action="append", default=None,
                   help="caption text to score (repeat once per "
                   "--image, in order), or give --captions-file")
    p.add_argument("--captions-file", default=None,
                   help="file with one caption per line, paired with "
                   "--image order")
    p.add_argument("--checkpoint-dir", default="checkpoints")
    p.add_argument("--keras-h5", default=None,
                   help="pretrained Keras .h5 encoder weights — use the "
                   "same file `extract` used, or scores come from a "
                   "random encoder")
    _add_restore_flags(p)
    p.set_defaults(fn=cmd_score)

    p = sub.add_parser(
        "evaluate", help="BLEU-1..4 (+ CIDEr-D/ROUGE-L) over a split"
    )
    _add_common_model_flags(p)
    _add_optimizer_flags(p)
    p.add_argument("--tokens", required=False, default=None,
                   help="Flickr8k token file (or use --karpathy-json)")
    p.add_argument("--karpathy-json", default=None,
                   help="Karpathy dataset_*.json with embedded splits; "
                   "--split/--val-split then name splits "
                   "(train|val|test) instead of files")
    p.add_argument("--split", default=None)
    p.add_argument("--features", required=True)
    p.add_argument("--checkpoint-dir", default="checkpoints")
    p.add_argument("--method", default="greedy", choices=["greedy", "beam"])
    p.add_argument("--beam-width", type=int, default=3)
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--parallelism", default=None,
                   choices=["none", "dp", "tp", "dp_tp"],
                   help="mesh-sharded decode: dp (batch), tp (vocab), "
                   "dp_tp (2-D batch x vocab)")
    p.add_argument("--model-devices", type=int, default=0,
                   help="model-axis width for --parallelism dp_tp")
    p.add_argument("--dump-captions", default=None,
                   help="also write per-image JSONL (image_id, caption, "
                   "references, sentence BLEU-4) for error analysis")
    p.add_argument("--metrics", default="bleu",
                   help="comma list from bleu,cider,rouge_l,meteor,"
                   "diversity (default "
                   "bleu = the reference-parity BLEU-1..4; diversity "
                   "adds reference-free distinct-1/2, vocab_used, "
                   "unique_captions, mean_len)")
    p.add_argument("--coco-results", default=None,
                   help="also write coco-caption results JSON "
                   "([{image_id, caption}, ...], numeric ids as ints) "
                   "for pycocoevalcap / external leaderboards")
    p.add_argument("--meteor-synonyms", default=None, metavar="FILE",
                   help="synonym-groups file (one group per line, "
                   "words split on whitespace/commas, # comments) "
                   "enabling METEOR's synonym stage from local data — "
                   "e.g. a list derived from a local WordNet install; "
                   "without it METEOR is the exact+stem lower bound")
    _add_restore_flags(p)
    p.set_defaults(fn=cmd_evaluate)

    p = sub.add_parser(
        "compare",
        help="paired bootstrap significance test between two "
        "`evaluate --dump-captions` files (Koehn 2004)",
    )
    p.add_argument("file_a", help="baseline system's --dump-captions JSONL")
    p.add_argument("file_b", help="candidate system's --dump-captions JSONL")
    p.add_argument("--metric", default="bleu4",
                   choices=["bleu1", "bleu2", "bleu3", "bleu4",
                            "cider", "rouge_l", "meteor"],
                   help="corpus metric to compare (same conventions as "
                   "evaluate --metrics)")
    p.add_argument("--bootstrap", type=int, default=1000,
                   help="number of bootstrap resamples")
    p.add_argument("--seed", type=int, default=0)
    p.set_defaults(fn=cmd_compare)

    p = sub.add_parser(
        "export",
        help="export the trained decoder to a Keras .h5 (migration exit "
        "ramp) or an AOT StableHLO serving bundle (--format aot)",
    )
    _add_common_model_flags(p)
    _add_optimizer_flags(p)
    p.add_argument("--checkpoint-dir", default="checkpoints")
    p.add_argument("--out", required=True,
                   help="output path: .h5 file (--format h5) or bundle "
                   "directory (--format aot)")
    p.add_argument("--method", default=None,
                   choices=["greedy", "beam"],
                   help="decode method baked into an AOT bundle "
                   "(default: the config's — greedy)")
    p.add_argument("--beam-width", type=int, default=None,
                   help="beam width baked into an AOT bundle")
    p.add_argument("--format", default="h5", choices=["h5", "aot"],
                   help="h5 = Keras exit ramp; aot = jax.export "
                   "StableHLO decode program + pipeline bundle, loaded "
                   "by tpucap.checkpoint.AotCaptioner without any model "
                   "code")
    p.add_argument("--aot-batch-size", type=int, default=64,
                   help="static batch shape baked into the AOT program")
    p.add_argument("--aot-ladder", action="store_true",
                   help="export the full serving bucket ladder "
                   "(1,2,4,...,--aot-batch-size) so `serve --aot-bundle` "
                   "can micro-batch")
    p.add_argument("--include-encoder", action="store_true",
                   help="also export the encoder program (AOT "
                   "caption_images path)")
    p.add_argument("--bundle-out", default=None,
                   help="also write a pipeline.save() bundle here")
    p.add_argument("--keras-h5", default=None, help=argparse.SUPPRESS)
    _add_restore_flags(p)
    p.set_defaults(fn=cmd_export)

    p = sub.add_parser(
        "serve", help="HTTP caption server (micro-batched TPU serving)"
    )
    _add_common_model_flags(p)
    _add_optimizer_flags(p)
    p.add_argument("--model-dir", default=None,
                   help="a pipeline.save() bundle; overrides "
                   "--checkpoint-dir restore")
    p.add_argument("--aot-bundle", default=None,
                   help="an `export --format aot --aot-ladder` bundle: "
                   "serve the serialized StableHLO programs directly "
                   "(no model code, no tracing at startup); overrides "
                   "--model-dir/--checkpoint-dir")
    p.add_argument("--checkpoint-dir", default="checkpoints")
    p.add_argument("--keras-h5", default=None,
                   help="pretrained Keras .h5 encoder weights for the "
                   "image path (as in `caption`)")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--max-batch", type=int, default=64)
    p.add_argument("--max-delay-ms", type=float, default=5.0)
    p.add_argument("--max-queue", type=int, default=None,
                   help="bounded admission: reject (HTTP 503) when this "
                   "many requests are queued (default unbounded)")
    p.add_argument("--max-body-mb", type=float, default=64.0,
                   help="request-body ceiling in MiB (HTTP 413 over it, "
                   "checked before the body is read; 0 disables)")
    p.add_argument("--engine", default="batch",
                   choices=["batch", "continuous"],
                   help="feature-serving engine: micro-batched (default) "
                   "or continuous slot-recycling (greedy, or beam with "
                   "--method beam)")
    p.add_argument("--no-warmup", dest="warmup", action="store_false",
                   help="skip pre-compiling the batch buckets at startup "
                   "(first requests then pay the compiles)")
    p.add_argument("--method", default="beam", choices=["greedy", "beam"])
    p.add_argument("--beam-width", type=int, default=3)
    p.add_argument("--allow-reload", action="store_true",
                   help="enable POST /reload {'bundle': path}: "
                   "zero-downtime weight hot-swap from a pipeline "
                   "bundle (admin surface — off by default)")
    p.add_argument("--extra-model", action="append", default=None,
                   metavar="NAME=BUNDLE_DIR",
                   help="serve an additional pipeline bundle behind the "
                   "same port (repeatable); requests route with "
                   "?model=NAME or a 'model' JSON field — each model "
                   "gets its own micro-batcher (engine batch only)")
    _add_restore_flags(p)
    p.set_defaults(fn=cmd_serve)

    p = sub.add_parser(
        "doctor",
        help="environment diagnostics (platform, devices, versions, "
        "JPEG extension, device smoke)",
    )
    p.add_argument("--no-device-smoke", action="store_true",
                   help="skip the compile+matmul probe (instant report)")
    p.set_defaults(fn=cmd_doctor)

    p = sub.add_parser(
        "profile",
        help="capture a TensorBoard device trace of a decode/train/"
        "encoder workload",
    )
    _add_common_model_flags(p)
    _add_optimizer_flags(p)
    p.add_argument("--workload", default="decode",
                   choices=["decode", "train", "encoder"])
    p.add_argument("--method", default="greedy",
                   choices=["greedy", "beam"])
    p.add_argument("--beam-width", type=int, default=3)
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--steps", type=int, default=3,
                   help="traced iterations (after an untraced warmup)")
    p.add_argument("--dtype", default="bf16", choices=["f32", "bf16"])
    p.add_argument("--out", required=True, help="trace log dir")
    p.set_defaults(fn=cmd_profile)

    p = sub.add_parser("bench", help="run the benchmark harness")
    p.set_defaults(fn=None)

    args, extra = ap.parse_known_args(argv)
    if args.cmd == "bench":
        cmd_bench(args, extra)
        return
    if extra:
        ap.error(f"unrecognized arguments: {extra}")
    args.fn(args)
