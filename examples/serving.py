"""Minimal online-serving example: micro-batched captioning.

Run: JAX_PLATFORMS=cpu python examples/serving.py
(CPU-safe; on a TPU host just drop the env var.)
"""

import os
import sys

if "JAX_PLATFORMS" in os.environ:
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import threading

import numpy as np

from tpucap.config import Config, DecodeConfig, DecoderConfig, EncoderConfig
from tpucap.pipeline import CaptioningPipeline
from tpucap.serve import CaptionServer
from tpucap.text import Tokenizer


def main():
    cfg = Config(
        encoder=EncoderConfig(name="tiny_cnn", feature_dim=128),
        decoder=DecoderConfig(embed_dim=16, hidden_dim=32, dropout_rate=0.0),
        decode=DecodeConfig(method="beam", beam_width=3, max_len=10),
    )
    pipe = CaptioningPipeline(cfg)
    tok = Tokenizer()
    tok.fit_on_texts(
        ["startseq a dog runs in the park endseq",
         "startseq a man rides a red bike endseq"]
    )
    pipe.tokenizer = tok
    pipe.build()  # untrained weights — captions are arbitrary but stable

    # Features generated BEFORE spawning threads: np.random.Generator is
    # not thread-safe, and this example is the pattern load generators
    # copy.
    rng = np.random.default_rng(0)
    all_feats = rng.normal(size=(12, 128)).astype(np.float32)
    with CaptionServer(pipe, max_batch=8, max_delay_ms=20) as srv:
        srv.warmup()

        # 12 concurrent clients; the batcher coalesces them into a few
        # bucket-padded TPU batches.
        results = [None] * 12

        def client(i):
            results[i] = srv.caption(all_feats[i])

        threads = [threading.Thread(target=client, args=(i,))
                   for i in range(12)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        print("captions:", results[:3], "...")
        print("stats:", srv.stats())

    # The same thing over HTTP with the client SDK (tpucap.client):
    # an application that holds no model, no device, no jax — just a
    # host:port. caption_features_many ships all rows in ONE request
    # and the server's micro-batcher coalesces them on-device.
    from tpucap.client import CaptionClient
    from tpucap.serve_http import CaptionHTTPServer

    with CaptionHTTPServer(pipe, port=0, max_batch=8) as http_srv:
        http_srv.serve_background()
        client = CaptionClient(*http_srv.address)
        caps = client.caption_features_many(all_feats[:4])
        assert caps[0] == results[0]
        print("client SDK captions:", caps[:2], "...")
        print("healthz:", client.healthz())
    print("serving example OK")


if __name__ == "__main__":
    main()
