"""Trained-model serving A/B: batch micro-batching vs continuous batching.

The bench's serve mode uses random weights, where every caption runs to
max_len and slot recycling has nothing to recycle. This script trains the
fixture model first (captions then end at ~5-8 tokens against the padded
cap), then drives BOTH serving engines with the same closed-loop load and
reports captions/s + latency + occupancy — the mixed-/short-length regime
continuous batching exists for. Runs on whatever device is attached
(CPU-safe; minutes on the TPU including compiles).

Usage: python scripts/serving_ab.py [--requests 512] [--clients 64]
       [--slots 64] [--max-len 20]
"""

import argparse
import sys
import tempfile
import threading
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--requests", type=int, default=512)
    ap.add_argument("--clients", type=int, default=64)
    ap.add_argument("--slots", type=int, default=64)
    ap.add_argument("--max-len", type=int, default=20)
    ap.add_argument("--epochs", type=int, default=40)
    ap.add_argument("--ticks-per-sync", type=int, default=4)
    args = ap.parse_args()

    sys.path.insert(0, ".")
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", 1.0
        )
    except Exception:
        pass

    from tpucap.config import (
        Config,
        DecodeConfig,
        DecoderConfig,
        EncoderConfig,
        TrainConfig,
    )
    from tpucap.data import (
        generate_fixture_dataset,
        load_descriptions,
        load_split,
        prepare_descriptions,
    )
    from tpucap.pipeline import CaptioningPipeline
    from tpucap.serve import CaptionServer, ContinuousCaptionServer

    print(f"# devices: {jax.devices()}", flush=True)
    root = tempfile.mkdtemp(prefix="serving_ab_")
    img_dir, token_file, train_file, _ = generate_fixture_dataset(
        root, n_images=24, image_size=32, seed=0
    )
    cfg = Config(
        encoder=EncoderConfig(name="tiny_cnn", feature_dim=128),
        decoder=DecoderConfig(embed_dim=32, hidden_dim=64, dropout_rate=0.0),
        decode=DecodeConfig(method="greedy", max_len=args.max_len),
        train=TrainConfig(batch_size=16, epochs=args.epochs,
                          learning_rate=3e-3),
    )
    pipe = CaptioningPipeline(cfg)
    desc = prepare_descriptions(
        load_descriptions(token_file), load_split(train_file)
    )
    pipe.fit_tokenizer(desc)
    pipe.build()
    import glob
    import os

    paths = sorted(glob.glob(os.path.join(str(img_dir), "*.jpg")))
    feats_arr = np.asarray(pipe.extract_features(paths, batch_size=8))
    ids = [os.path.splitext(os.path.basename(p))[0] for p in paths]
    features = dict(zip(ids, feats_arr))
    pipe.fit(desc, features, log=None)

    # Caption lengths after training (the regime under test).
    caps = pipe.generate(feats_arr, method="greedy")
    lens = [len(c.split()) for c in caps]
    print(
        f"# trained caption lengths: mean={np.mean(lens):.1f} "
        f"min={min(lens)} max={max(lens)} (cap {args.max_len})",
        flush=True,
    )

    rng = np.random.default_rng(1)
    req_feats = feats_arr[
        rng.integers(0, len(feats_arr), size=args.requests)
    ] + rng.normal(scale=0.01, size=(args.requests, 128)).astype(
        np.float32
    )

    def drive(srv, label):
        # closed-loop: --clients threads, submit->wait each
        results = {}

        def client(i):
            for j in range(i, args.requests, args.clients):
                results[j] = srv.caption(
                    req_feats[j].astype(np.float32), timeout=300
                )

        srv.warmup(timeout=600)  # compile every bucket BEFORE the clock
        t0 = time.perf_counter()
        threads = [
            threading.Thread(target=client, args=(i,))
            for i in range(args.clients)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        wall = time.perf_counter() - t0
        s = srv.stats()
        srv.close()
        extra = (
            f" occupancy={s['mean_occupancy']:.1f}/{args.slots} "
            f"ticks={s['ticks']}"
            if "ticks" in s
            else f" mean_batch={s['mean_batch']:.1f}"
        )
        print(
            f"{label}: {args.requests / wall:.0f} captions/s "
            f"p50={s['p50_ms']:.1f}ms p99={s['p99_ms']:.1f}ms{extra}",
            flush=True,
        )
        return args.requests / wall

    batch_rate = drive(
        CaptionServer(
            pipe, max_batch=args.slots, max_delay_ms=5, method="greedy"
        ),
        "batch      ",
    )
    cont_rate = drive(
        ContinuousCaptionServer(
            pipe, slots=args.slots, ticks_per_sync=args.ticks_per_sync
        ),
        "continuous ",
    )
    print(
        f"continuous/batch = {cont_rate / batch_rate:.2f}x "
        f"(trained lengths, {args.clients} closed-loop clients)",
        flush=True,
    )


if __name__ == "__main__":
    main()
