"""Config-5-style batched serving demo: JPEG directory -> C++ decode ->
fused on-device preprocess -> encoder -> beam search, with the whole batch
sharded over the device mesh (parallelism='dp') and an optional int8
encoder.

Runs anywhere: on a TPU slice it uses the real mesh; on CPU export
``XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu``
to demo the identical sharded program on 8 virtual devices. (With
--int8 the dynamic activation scales are computed per shard under --dp,
so int8+dp captions may differ in borderline cases from single-device
int8 — see models/encoders/quantize.py.)

Usage:
    python examples/serve_dataset.py [--images DIR] [--batch 8] [--dp]
                                     [--int8]
"""

import argparse
import os
import sys
import tempfile


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", default=None, help="directory of .jpg files")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--dp", action="store_true", help="shard over the mesh")
    ap.add_argument("--int8", action="store_true", help="int8 encoder")
    args = ap.parse_args()

    import jax

    from tpucap.config import (
        Config,
        DecodeConfig,
        DecoderConfig,
        EncoderConfig,
    )
    from tpucap.pipeline import CaptioningPipeline
    from tpucap.text import Tokenizer

    if args.images is None:
        from tpucap.data import generate_fixture_dataset

        root = os.path.join(tempfile.gettempdir(), "tpucap_serve_demo")
        img_dir, *_ = generate_fixture_dataset(
            root, n_images=2 * args.batch, image_size=64, seed=0
        )
        args.images = img_dir
    paths = sorted(
        os.path.join(args.images, f)
        for f in os.listdir(args.images)
        if f.endswith(".jpg")
    )
    print(f"{len(paths)} images, {jax.device_count()} devices", file=sys.stderr)

    # A real deployment would CaptioningPipeline.load(...) a trained
    # bundle; the demo builds a random-weight pipeline to show the flow.
    cfg = Config(
        encoder=EncoderConfig(name="tiny_cnn", feature_dim=128),
        decoder=DecoderConfig(embed_dim=16, hidden_dim=32),
        decode=DecodeConfig(method="beam", beam_width=3, max_len=10),
    )
    tok = Tokenizer()
    tok.fit_on_texts(
        ["startseq a dog runs on grass endseq",
         "startseq a man rides a bike endseq"]
    )
    pipe = CaptioningPipeline(cfg, tokenizer=tok)
    pipe.build()
    if args.int8:
        pipe.quantize_encoder()

    caps = pipe.caption_dataset(
        paths,
        batch_size=args.batch,
        parallelism="dp" if args.dp else None,
    )
    for p, c in zip(paths[:5], caps[:5]):
        print(f"{os.path.basename(p)}\t{c}")
    print(f"... {len(caps)} captions total")


if __name__ == "__main__":
    main()
