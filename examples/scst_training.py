"""Self-critical sequence training (SCST) walkthrough.

The reference trains teacher-forced cross-entropy only; captioning
practice then fine-tunes directly on the evaluation metric with
REINFORCE, using the model's own greedy decode as the baseline (Rennie
et al. 2017). tpucap ships that as `pipeline.fit_scst`: reward is
per-image CIDEr-D with corpus-fixed IDF, the rollout (sample + greedy
baseline) is ONE jitted device program per batch, and the update is a
second jitted program over the sampled rows — the only host work is the
n-gram reward math.

This example CE-trains a tiny model on a memorizable corpus, then runs
SCST and prints the greedy-baseline reward climbing — the directly
optimized quantity.

Run: JAX_PLATFORMS=cpu python examples/scst_training.py
(CPU-safe at fixture scale; on a TPU host drop the env var.)
"""

import dataclasses
import os
import sys

if "JAX_PLATFORMS" in os.environ:
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from tpucap.config import (
    Config,
    DecodeConfig,
    DecoderConfig,
    EncoderConfig,
    TrainConfig,
)
from tpucap.pipeline import CaptioningPipeline

CORPUS = [
    "startseq a black dog runs across the green grass endseq",
    "startseq two children play soccer in the park endseq",
    "startseq a man rides a red bicycle down the street endseq",
    "startseq a woman in a blue shirt climbs a rock wall endseq",
    "startseq boats rest in a quiet harbor at sunset endseq",
    "startseq the sun rises over red hills and a river endseq",
    "startseq people walk through a busy market square endseq",
    "startseq a climber scales the gray rock face alone endseq",
]


def main():
    cfg = Config(
        encoder=EncoderConfig(name="tiny_cnn", feature_dim=128),
        decoder=DecoderConfig(embed_dim=16, hidden_dim=32, dropout_rate=0.0),
        decode=DecodeConfig(max_len=12),
        train=TrainConfig(batch_size=8, epochs=50, learning_rate=5e-3),
        precision="f32",
    )
    pipe = CaptioningPipeline(cfg)

    desc = {f"img{k}": [c] for k, c in enumerate(CORPUS)}
    pipe.fit_tokenizer(desc)
    pipe.build()
    rng = np.random.default_rng(0)
    feats = {i: rng.normal(size=(128,)).astype(np.float32) for i in desc}

    print("== phase 1: cross-entropy pretraining")
    pipe.fit(desc, feats, log=None)
    ce_scores = pipe.evaluate(
        desc, feats, batch_size=8, metrics=("bleu", "cider")
    )
    print(f"after CE: BLEU-4 {ce_scores['bleu4']:.3f} "
          f"CIDEr-D {ce_scores['cider']:.3f}")

    print("== phase 2: SCST (REINFORCE on CIDEr-D, greedy baseline)")
    # REINFORCE is lr-sensitive: run the policy-gradient phase
    # ~20-50x below the CE lr (too high and the negative-advantage
    # updates smear the greedy mode faster than the positive ones
    # sharpen it — watch the baseline column, it must climb).
    pipe.config = dataclasses.replace(
        pipe.config,
        train=dataclasses.replace(pipe.config.train, learning_rate=1e-4),
    )
    history = pipe.fit_scst(
        desc, feats, epochs=10, batch_size=8, temperature=1.0, log=None
    )
    for h in history:
        print(f"  epoch {h['epoch']}: baseline reward "
              f"{h['baseline']:.3f} (sampled {h['reward']:.3f})")

    scores = pipe.evaluate(
        desc, feats, batch_size=8, metrics=("bleu", "cider")
    )
    print(f"after SCST: BLEU-4 {scores['bleu4']:.3f} "
          f"CIDEr-D {scores['cider']:.3f}")


if __name__ == "__main__":
    main()
