"""Frozen config tree covering the five judged configurations.

Replaces the reference's hard-coded module-top constants (SURVEY.md §5.6)
with one dataclass tree overridable from the CLI
(``--encoder=resnet50 --decoder=lstm2 --beam-width=5``).

The five BASELINE.json configs map to presets at the bottom of this module:
1. vgg16 + lstm1 merge, greedy                          -> CONFIG_1
2. inception_v3 + lstm1, beam 3, batch 32               -> CONFIG_2
3. resnet50 + lstm2, beam 5                             -> CONFIG_3
4. soft-attention decoder over 14x14 maps               -> CONFIG_4
5. batched e2e jpeg->encoder->beam, batch 256, dp mesh  -> CONFIG_5
"""

from __future__ import annotations

import dataclasses
from typing import Literal

EncoderName = Literal[
    "vgg16", "inception_v3", "resnet50", "tiny_cnn", "vit_b16", "vit_tiny"
]
DecoderName = Literal[
    "lstm1", "lstm2", "gru1", "gru2", "inject", "attention", "adaptive",
    "transformer",
]
DecodeMethod = Literal["greedy", "beam"]


@dataclasses.dataclass(frozen=True)
class EncoderConfig:
    name: EncoderName = "vgg16"
    # Feature kind: 'pooled' (global vector) or 'spatial' (14x14 grid for
    # the attention decoder, reference's block5_conv3-style map).
    features: Literal["pooled", "spatial"] = "pooled"
    # include_top=True fc2 features (vgg16 -> 4096) vs avg-pool (-> 2048).
    feature_dim: int = 4096


@dataclasses.dataclass(frozen=True)
class DecoderConfig:
    name: DecoderName = "lstm1"
    embed_dim: int = 256
    hidden_dim: int = 256
    num_layers: int = 1
    dropout_rate: float = 0.5
    attention_dim: int = 256  # attention MLP width (attention decoder only)
    # Transformer family only (name == "transformer"):
    num_heads: int = 4
    mlp_dim: int = 1024
    # Positional table + KV-cache capacity; must cover decode.max_len + 1
    # (start token + generated tokens). Default covers max_len=34.
    max_positions: int = 40
    # Mixture-of-experts MLP (transformer family only): 0 = dense MLP;
    # >0 = that many experts per layer with top-k routing
    # (models/decoders/transformer.py; expert-parallel training via
    # parallel/ep.py).
    num_experts: int = 0
    moe_top_k: int = 2


@dataclasses.dataclass(frozen=True)
class DecodeConfig:
    method: DecodeMethod = "greedy"
    beam_width: int = 3
    max_len: int = 34  # Flickr8k max caption length (SURVEY.md §2.1 #4)
    # Length floor: endseq is excluded from the candidate vocabulary at
    # decode steps t < min_len, guaranteeing at least min_len real
    # tokens per caption (all engines: greedy/beam/sample/TP). 0 = off
    # (the reference has no floor).
    min_len: int = 0
    length_normalize: bool = True
    alpha: float = 1.0  # length-normalization exponent
    # Ranking denominator: 'simple' = len^alpha (the reference genre's
    # convention) | 'gnmt' = ((5+len)/6)^alpha (Wu et al. 2016 — the
    # production MT convention, gentler on short captions).
    length_penalty: str = "simple"
    # Opt-in TPU approx_max_k for the per-beam vocab top-k (stage 1 only;
    # the merge stage stays exact). Faster at large vocab, ~0.95 recall
    # per step — captions may rarely differ from the exact engine.
    approx_topk: bool = False
    # Words that must never be generated (the production profanity /
    # blocklist control): excluded from the candidate vocabulary at
    # every decode step of greedy/beam/sample/diverse and the TP
    # vocab-sharded scorer. Lowercased against the tokenizer vocabulary;
    # out-of-vocabulary entries are ignored (they can never be
    # generated anyway). Static — part of the compiled program.
    bad_words: tuple = ()
    # No-repeat-ngram blocking (the anti-repetition dial): tokens that
    # would complete an n-gram the sequence already generated leave the
    # candidate vocabulary (greedy/beam/sample; selection-only in
    # greedy/beam, renormalizing in sampling — decode/ngram.py). 1 =
    # never repeat a token; 0 = off (the reference has no blocking).
    # Supported everywhere except speculative decode (which raises a
    # clear error): greedy/beam/sample/diverse, the TP vocab-sharded
    # scorer, and both continuous serving engines all honor it.
    no_repeat_ngram_size: int = 0


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    batch_size: int = 64
    learning_rate: float = 1e-3  # Keras Adam default
    epochs: int = 20
    seed: int = 0
    checkpoint_dir: str = "checkpoints"
    max_to_keep: int = 3
    label_smoothing: float = 0.0
    # Show-Attend-Tell doubly-stochastic attention regularizer weight
    # (SURVEY.md §2.1 #8); applies to the attention decoder only, warned
    # about at step-build time for non-attention decoders.
    attention_reg: float = 0.0
    # Stop training when val_loss hasn't improved for this many epochs
    # (Keras EarlyStopping(monitor='val_loss', patience=N) semantics;
    # 0 = disabled). Needs fit(val_data=...); the best-val checkpoint is
    # already retained by the CheckpointManager, mirroring
    # restore_best_weights via restore-from-best.
    early_stopping_patience: int = 0
    # What the best-checkpoint keying and early stopping monitor when a
    # dev split is given (Keras ModelCheckpoint/EarlyStopping monitor=/
    # mode=): 'loss' (val_loss, min — the reference's choice) | 'bleu4'
    # | 'cider' | 'rouge_l' | 'meteor' (greedy-decode the dev split each
    # epoch, corpus metric, max). Decode-metric monitoring needs
    # parallelism 'none'|'dp'.
    val_metric: str = "loss"
    # Switch load-balance aux weight for MoE decoders trained with
    # fit(parallelism='ep'|'dp_ep') / parallel/ep.py.
    moe_aux_weight: float = 0.01
    # Optimizer surface (the Keras compile(optimizer=...) contract the
    # rebuild re-owns — SURVEY.md §2.2 "fit loop"). Defaults reproduce
    # the reference exactly (plain Adam, constant lr, no clipping) and
    # keep the opt_state pytree unchanged for checkpoint compatibility.
    optimizer: str = "adam"  # adam | adamw | sgd | rmsprop | adagrad
    momentum: float = 0.0  # sgd momentum (Keras SGD default 0)
    weight_decay: float = 0.0  # adamw decoupled weight decay
    # Learning-rate schedule: constant | cosine (decay to 0 over the
    # run) | exponential (x lr_decay_rate every lr_decay_steps).
    lr_schedule: str = "constant"
    lr_decay_rate: float = 0.96
    lr_decay_steps: int = 1000
    warmup_steps: int = 0  # linear warmup prepended to any schedule
    grad_clip_norm: float = 0.0  # global-norm clip; 0 = off
    # Exponential moving average of the weights: shadow params updated
    # ema = d*ema + (1-d)*params after every step (initialized AT the
    # starting params, so no zero-debias term is needed). 0 = off.
    # The averaged weights land on pipeline.ema_params; swap them in for
    # eval/serving with pipeline.use_ema_weights(). Training itself is
    # untouched — the trajectory is identical with EMA on or off.
    ema_decay: float = 0.0
    # Training compute dtype (mixed precision): 'f32' (default — exact
    # Keras-parity numerics) | 'bf16' (forward/backward matmuls in
    # bfloat16 with f32 master params/optimizer state and f32 loss
    # reductions; no loss scaling needed — bf16 keeps f32's exponent
    # range, which is why it is THE TPU training dtype). Distinct from
    # Config.precision, the inference-path policy. Supported by
    # parallelism 'none'|'dp' and fit_finetune.
    precision: str = "f32"
    # Gradient accumulation: scan each step's batch as A microbatches
    # (per shard under DP), cutting peak activation memory A-fold while
    # producing the EXACT full-batch update (sum-form accumulation,
    # tpucap.train.loop.accumulated_sum_grads). batch_size (per shard)
    # must divide by it. Supported by parallelism 'none' and 'dp'.
    grad_accum_steps: int = 1
    # Step-interval checkpointing: additionally checkpoint every N
    # optimizer steps (0 = epoch boundaries only). Mid-epoch step
    # checkpoints carry a never-best sentinel for the tracked metric,
    # so best-checkpoint selection stays epoch-driven; fit(resume=True)
    # restores them at the exact epoch/batch position (the preemption
    # machinery), bounding a hard kill's lost work to < N steps
    # instead of an epoch. Long-epoch (COCO-scale) insurance.
    checkpoint_every_steps: int = 0
    # Scheduled sampling (Bengio et al. 2015; parallel two-pass form —
    # tpucap/train/scheduled.py): maximum probability of replacing each
    # teacher-forcing input token (position >= 1, non-pad) with the
    # model's own gradient-free first-pass prediction, attacking
    # exposure bias. 0 = off (exact teacher forcing). The per-epoch
    # probability ramps by ss_schedule and is passed to the step as a
    # traced scalar (no retrace). Parallelism 'none' | 'dp'.
    scheduled_sampling: float = 0.0
    # 'linear' (0 -> max over the run) | 'inv_sigmoid' (Bengio's
    # S-curve, near-0 for the first ~5 epochs) | 'constant'.
    ss_schedule: str = "linear"
    # Multi-step dispatch: lax.scan N optimizer steps inside ONE
    # compiled program call, amortizing per-dispatch host overhead
    # (the dominant cost once the device step is a few ms — e.g. over
    # a remote-TPU link) across N steps. The update sequence is
    # EXACTLY the per-step sequence (the scan body IS the single
    # step); epoch tails shorter than N run through the single-step
    # program. Parallelism 'none' | 'dp'; ema_decay (a per-step
    # shadow) is not supported. Preemption/interval-checkpoint
    # granularity becomes N steps. 1 = one program call per step.
    steps_per_dispatch: int = 1


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    n_devices: int | None = None  # None = all local devices
    axis_name: str = "data"
    # Model-axis width for the 2-D DPxTP serving layout
    # (parallelism='dp_tp'): the mesh is (n_devices // model_devices,
    # model_devices) over ("data", "model"). 1 = no tensor parallelism.
    model_devices: int = 1


@dataclasses.dataclass(frozen=True)
class Config:
    encoder: EncoderConfig = EncoderConfig()
    decoder: DecoderConfig = DecoderConfig()
    decode: DecodeConfig = DecodeConfig()
    train: TrainConfig = TrainConfig()
    mesh: MeshConfig = MeshConfig()
    vocab_size: int = 7580  # typical Flickr8k vocab+1; overridden per run
    # Inference precision policy:
    #   'bf16'  - params/activations cast to bf16 (fastest, ~34% on e2e)
    #   'mixed' - f32 tensors, XLA DEFAULT matmul (bf16 MXU passes) [default]
    #   'f32'   - highest-precision matmuls, exact caption parity with CPU
    precision: Literal["bf16", "mixed", "f32"] = "mixed"

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)


def config_from_dict(d: dict) -> Config:
    """Rebuild a Config from its ``dataclasses.asdict`` form (the
    ``config.json`` written by pipeline.save) — shared by
    CaptioningPipeline.load and the AOT bundle loader."""
    return Config(
        encoder=EncoderConfig(**d["encoder"]),
        decoder=DecoderConfig(**d["decoder"]),
        decode=DecodeConfig(**d["decode"]),
        train=TrainConfig(**d["train"]),
        mesh=MeshConfig(**d["mesh"]),
        vocab_size=d["vocab_size"],
        precision=d["precision"],
    )


#: Channel count of each encoder's feature output per feature kind —
#: pooled: VGG16 fc2 4096-d, InceptionV3/ResNet-50 global-avg 2048-d;
#: spatial: VGG16 block5_conv3 512-ch, InceptionV3 mixed7 768-ch,
#: ResNet-50 conv4 1024-ch (the 14x14-grid attention contracts,
#: SURVEY.md §2.1 #2). Single source of truth — the CLI builds its
#: configs through encoder_config() too.
FEATURE_DIMS = {
    ("vgg16", "pooled"): 4096,
    ("vgg16", "spatial"): 512,
    ("inception_v3", "pooled"): 2048,
    ("inception_v3", "spatial"): 768,
    ("resnet50", "pooled"): 2048,
    ("resnet50", "spatial"): 1024,
    ("tiny_cnn", "pooled"): 128,
    ("tiny_cnn", "spatial"): 128,
    # ViT family (beyond parity): feature width == d_model either way
    # (pooled = token mean, spatial = the g x g token grid).
    ("vit_b16", "pooled"): 768,
    ("vit_b16", "spatial"): 768,
    ("vit_tiny", "pooled"): 64,
    ("vit_tiny", "spatial"): 64,
}


def encoder_config(name: EncoderName, features="pooled") -> EncoderConfig:
    return EncoderConfig(
        name=name, features=features, feature_dim=FEATURE_DIMS[name, features]
    )


_enc = encoder_config


CONFIG_1 = Config(
    encoder=_enc("vgg16"),
    decoder=DecoderConfig(name="lstm1"),
    decode=DecodeConfig(method="greedy"),
)
CONFIG_2 = Config(
    encoder=_enc("inception_v3"),
    decoder=DecoderConfig(name="lstm1"),
    decode=DecodeConfig(method="beam", beam_width=3),
    train=TrainConfig(batch_size=32),
)
CONFIG_3 = Config(
    encoder=_enc("resnet50"),
    decoder=DecoderConfig(name="lstm2", num_layers=2),
    decode=DecodeConfig(method="beam", beam_width=5),
)
CONFIG_4 = Config(
    encoder=_enc("vgg16", features="spatial"),
    decoder=DecoderConfig(name="attention"),
    decode=DecodeConfig(method="beam", beam_width=3),
)
CONFIG_5 = Config(
    encoder=_enc("inception_v3"),
    decoder=DecoderConfig(name="lstm1"),
    decode=DecodeConfig(method="beam", beam_width=3),
    train=TrainConfig(batch_size=256),
)

PRESETS = {
    "config1": CONFIG_1,
    "config2": CONFIG_2,
    "config3": CONFIG_3,
    "config4": CONFIG_4,
    "config5": CONFIG_5,
}
