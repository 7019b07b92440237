"""End-to-end encoder fine-tuning example.

The reference freezes its CNN behind a one-shot feature extraction, so
captions on out-of-domain images (medical, aerial, sketches) are stuck
with ImageNet features. tpucap trains the encoder THROUGH the
captioning loss: `pipeline.fit_finetune(descriptions, images)`.

Run: JAX_PLATFORMS=cpu python examples/finetune_encoder.py
(CPU-safe at fixture scale; on a TPU host drop the env var.)
"""

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

CORPUS = {
    "sunrise": "startseq the sun rises over red hills endseq",
    "harbor": "startseq boats rest in a quiet harbor endseq",
    "meadow": "startseq a green meadow under white clouds endseq",
    "market": "startseq people walk through a busy market endseq",
}


def main():
    cfg = Config(
        encoder=EncoderConfig(name="tiny_cnn", feature_dim=128),
        decoder=DecoderConfig(embed_dim=16, hidden_dim=32, dropout_rate=0.0),
        decode=DecodeConfig(max_len=10),
        # grad_accum_steps also works here — encoder activations dominate
        # memory, so accumulation buys A-times larger image batches.
        train=TrainConfig(batch_size=4, epochs=150, learning_rate=1e-2),
        precision="f32",
    )
    pipe = CaptioningPipeline(cfg)
    desc = {k: [v] for k, v in CORPUS.items()}
    pipe.fit_tokenizer(desc)
    pipe.build()

    # Visually distinct images (distinct dominant colors + noise) so the
    # encoder has a real signal to carry into the decoder.
    rng = np.random.default_rng(0)
    colors = [(2, 0, 0), (0, 2, 0), (0, 0, 2), (2, 2, 0)]
    images = {
        k: (
            np.asarray(c, np.float32)
            + 0.3 * rng.normal(size=(32, 32, 3))
        ).astype(np.float32)
        for k, c in zip(CORPUS, colors)
    }

    import jax

    enc_before = jax.device_get(pipe.params["encoder"])
    # encoder_lr_scale=0.1 is the pretrained-backbone recipe; this demo
    # encoder is random, so train it at full rate.
    history = pipe.fit_finetune(
        desc, images, encoder_lr_scale=1.0, log=None
    )
    print(
        f"loss {history[0]['loss']:.3f} -> {history[-1]['loss']:.3f} "
        f"over {len(history)} epochs"
    )
    moved = sum(
        float(np.abs(np.asarray(a) - np.asarray(b)).sum())
        for a, b in zip(
            jax.tree.leaves(enc_before),
            jax.tree.leaves(jax.device_get(pipe.params["encoder"])),
        )
    )
    print(f"encoder weights moved (L1): {moved:.2f} — trained end-to-end")

    # The tuned pipeline captions its own training images correctly:
    feats = pipe.encode_images(np.stack([images[k] for k in CORPUS]))
    for k, cap in zip(CORPUS, pipe.generate(np.asarray(feats))):
        print(f"{k:>8}: {cap}")


if __name__ == "__main__":
    main()
