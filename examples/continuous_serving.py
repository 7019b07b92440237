"""Continuous-batching serving example: beam decode with lane recycling.

Run: JAX_PLATFORMS=cpu python examples/continuous_serving.py
(CPU-safe; on a TPU host just drop the env var.)
"""

import os
import sys

if "JAX_PLATFORMS" in os.environ:
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from tpucap.config import Config, DecodeConfig, DecoderConfig, EncoderConfig
from tpucap.pipeline import CaptioningPipeline
from tpucap.serve import ContinuousCaptionServer


def main():
    cfg = Config(
        encoder=EncoderConfig(name="tiny_cnn", feature_dim=128),
        decoder=DecoderConfig(embed_dim=16, hidden_dim=32, dropout_rate=0.0),
        decode=DecodeConfig(method="beam", beam_width=3, max_len=10),
    )
    pipe = CaptioningPipeline(cfg)
    pipe.fit_tokenizer(
        {"a": ["startseq a dog runs in the park endseq"],
         "b": ["startseq a man rides a red bike endseq"]}
    )
    pipe.build()  # untrained weights — captions arbitrary but stable

    rng = np.random.default_rng(0)
    feats = rng.normal(size=(10, 128)).astype(np.float32)

    # 4 request groups (4 x beam_width lanes on device); 10 requests
    # flow through as groups retire and refill.
    with ContinuousCaptionServer(
        pipe, slots=4, ticks_per_sync=2, beam_width=3
    ) as srv:
        futs = [srv.submit(f) for f in feats]
        caps = [f.result(timeout=300) for f in futs]
        print("captions:", caps[:3], "...")
        print("stats:", srv.stats())
    # Parity check against the offline batch path:
    assert caps == pipe.generate(feats, method="beam", beam_width=3)
    print("continuous serving example OK (matches batch beam decode)")

    # Streaming (greedy engine): words arrive as the caption decodes,
    # at ticks_per_sync granularity; the future still resolves with the
    # full caption. (HTTP analog: POST /caption_stream.)
    greedy = pipe.generate(feats, method="greedy")
    row = int(np.argmax([len(c.split()) for c in greedy]))
    with ContinuousCaptionServer(pipe, slots=4, ticks_per_sync=2) as srv:
        spans = []
        fut = srv.submit_stream(feats[row], on_words=spans.append)
        cap = fut.result(timeout=300)
    assert cap == greedy[row]
    assert " ".join(w for s in spans for w in s) == cap
    print(f"streamed {len(spans)} spans -> {cap!r}")


if __name__ == "__main__":
    main()
