"""Benchmark harness — prints ONE JSON line with the headline metric.

Headline (BASELINE.md): captions/sec at beam width 3 through the full
device pipeline (preprocessed images -> CNN encoder -> merge-LSTM
decoder -> vectorized beam search -> token ids), Flickr8k-shaped workload:
batch 256, vocab ~7.6k, max caption length 34. The default encoder is
ResNet-50 — the fastest production encoder in the zoo (config 3's
encoder; the north-star config 5 does not pin one) and measured 57%
faster end-to-end than InceptionV3 on v5e (docs/PERF.md). Run
`--encoder inception_v3` for the config-2 encoder; every metric line is
labeled with the encoder it used.

vs_baseline is measured against the north-star per-chip rate: 10,000
captions/sec on v5e-8 => 1250 captions/sec/chip [BASELINE.json:2,5].

Usage: python bench.py [--batch 256] [--beam 3] [--iters 5] [--no-encoder]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def time_fn(run, sync, *, iters, inner, warmup):
    """Shared measurement scaffold for every device mode: one timed
    compile+warmup call, ``warmup-1`` further warmup syncs, then
    ``iters`` samples of ``inner`` async dispatches drained by a single
    host sync (the tunnel-RTT amortization described on --inner).
    -> (compile_seconds, median_seconds_per_call, per_sample_times)."""
    t0 = time.perf_counter()
    sync(run())
    compile_s = time.perf_counter() - t0
    for _ in range(warmup - 1):
        sync(run())
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        for _ in range(inner - 1):
            run()
        sync(run())
        times.append((time.perf_counter() - t0) / inner)
    return compile_s, float(np.median(times)), times


def fit_device_step(run, sync, med, inner, *, iters):
    """Fit the ``med(inner) = step + RTT/inner`` model FOR THIS RUN by
    taking one extra (cheaper) sample at a shallower dispatch depth and
    solving the two-point system — so the residual sync-RTT share of
    the reported median is quantified per run instead of footnoted
    (docs/PERF.md r4 fit, made self-verifying; a locally-attached-TPU
    rerun should show rtt_ms ~ 0 and device_step ~ the median).

    -> {"device_step_ms_fit", "rtt_ms_fit", "rtt_share_of_median"} or
    None when the fit is unusable (inner == 1, negative RTT from noise).
    """
    shallow = max(1, inner // 8)
    if shallow >= inner:
        return None
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        for _ in range(shallow - 1):
            run()
        sync(run())
        times.append((time.perf_counter() - t0) / shallow)
    med_s = float(np.median(times))
    # med_s = step + RTT/shallow ; med = step + RTT/inner
    rtt = (med_s - med) / (1.0 / shallow - 1.0 / inner)
    step = med - rtt / inner
    if not (np.isfinite(rtt) and np.isfinite(step)) or rtt < 0 or step <= 0:
        return None  # noise inverted the two points; don't report junk
    return {
        "device_step_ms_fit": round(step * 1000, 3),
        "rtt_ms_fit": round(rtt * 1000, 3),
        "rtt_share_of_median": round((rtt / inner) / med, 4),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--beam", type=int, default=3)
    ap.add_argument("--method", default="beam", choices=["beam", "greedy"])
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument(
        "--inner",
        type=int,
        default=32,
        help="async runs queued per timing sample; amortizes the host<->TPU "
        "round-trip latency (each sample pays ONE sync whose tunnel RTT "
        "~30-38ms divides by inner: measured headline medians 26.4/24.0/"
        "23.2 ms at inner 8/16/32 fit step + RTT/inner with a device step "
        "of ~22 ms — the r3 default of 8 was leaving ~2.4 ms/call of "
        "measurement artifact in the headline; docs/PERF.md r4)",
    )
    ap.add_argument("--warmup", type=int, default=2)
    ap.add_argument(
        "--threads",
        default="",
        help="--mode host-decode: comma list of decoder pool sizes to "
        "sweep (0 = auto); prints a per-size line and reports the best. "
        "Run --threads 1,2,4,8,... on a multi-core host to measure the "
        "input-stage scaling curve (unverifiable on this 1-vCPU VM)",
    )
    ap.add_argument("--vocab", type=int, default=7579)
    ap.add_argument("--max-len", type=int, default=34)
    ap.add_argument(
        "--encoder",
        default="resnet50",
        help="encoder for the e2e pipeline (default: resnet50, the "
        "fastest production encoder measured on v5e — docs/PERF.md; "
        "inception_v3/vgg16 are the config-2/-1 encoders)",
    )
    ap.add_argument(
        "--decoder",
        default="lstm1",
        choices=["lstm1", "lstm2", "gru1", "gru2", "inject", "attention",
                 "adaptive", "transformer"],
        help="attention/adaptive imply spatial encoder features (config 4 and the visual-sentinel variant); "
        "transformer is the beyond-parity KV-cached family; gru1/gru2 "
        "the 3-gate merge variant",
    )
    ap.add_argument("--dtype", default="bf16", choices=["f32", "bf16"])
    ap.add_argument(
        "--no-fold-bn",
        action="store_true",
        help="keep BatchNorm unfolded (folding into conv weights is the "
        "default for frozen inference)",
    )
    ap.add_argument(
        "--no-encoder",
        action="store_true",
        help="bench decode only (features -> captions)",
    )
    ap.add_argument(
        "--exact-topk",
        action="store_true",
        help="use the exact two-stage top-k in beam decode. The serving "
        "bench defaults to TPU approx_max_k for the per-beam vocab "
        "top-k (stage-1 only; merge stays exact; +5-6%% e2e measured) — "
        "the library default remains exact (DecodeConfig.approx_topk)",
    )
    ap.add_argument(
        "--no-repeat-ngram",
        type=int,
        default=0,
        help="decode with no-repeat-ngram blocking of this size "
        "(DecodeConfig.no_repeat_ngram_size) — measures the dial's "
        "cost in the default caption mode",
    )
    ap.add_argument(
        "--constraints",
        type=int,
        default=0,
        help="decode with C must-include word constraints (constrained "
        "beam search — decode/constrained.py); the 2^C satisfaction "
        "banks multiply the step batch, so this measures the dial's "
        "cost scaling. beam method only; exact top-k (the bank engine "
        "has no approx stage); excludes --no-repeat-ngram/--unroll",
    )
    ap.add_argument(
        "--int8",
        action="store_true",
        help="quantize the encoder to int8 serving weights (per-channel "
        "kernel scales, dynamic activation scales) before benching",
    )
    ap.add_argument(
        "--int8-vocab",
        action="store_true",
        help="quantize the decoder's output (vocab) projection to int8 — "
        "the decode loop re-reads that (hidden x vocab) kernel from HBM "
        "every step, so this targets small-batch/latency serving",
    )
    ap.add_argument(
        "--unroll",
        type=int,
        default=1,
        help="decode-loop unroll factor (steps per while_loop iteration; "
        "token-exact — the launch-overhead experiment, docs/PERF.md)",
    )
    ap.add_argument(
        "--gamma",
        type=int,
        default=4,
        help="--mode speculative: draft tokens proposed per verify round",
    )
    ap.add_argument(
        "--no-latency",
        action="store_true",
        help="skip the batch-1 p50 latency measurement appended to the "
        "headline caption mode (saves one extra program compile)",
    )
    ap.add_argument(
        "--encoder-only",
        action="store_true",
        help="bench the encoder alone (images -> features), no decode",
    )
    ap.add_argument(
        "--num-experts",
        type=int,
        default=0,
        help="transformer decoder only: MoE experts per layer (0 = dense "
        "MLP); dense top-k dispatch (models/decoders/transformer.py)",
    )
    ap.add_argument(
        "--vit-flash",
        action="store_true",
        help="ViT encoders only: token-grid attention through the stock "
        "TPU Pallas flash kernel instead of XLA sdpa (grid padded to a "
        "block multiple + segment-id masking; docs/PERF.md)",
    )
    ap.add_argument(
        "--fused-blocks",
        default="",
        help="resnet50 only: comma list of stages (conv2,conv3,conv4,"
        "conv5) to run through the Pallas fused bottleneck kernel "
        "(ops/pallas/bottleneck.py) — the r2 'wins standalone, loses "
        "embedded' experiment, re-runnable per stage at the clean r4 "
        "measurement depth; requires folded BN (the default)",
    )
    ap.add_argument(
        "--scheduled-sampling",
        type=float,
        default=None,
        help="--mode train: measure the scheduled-sampling step at this "
        "mixing probability (two-pass cost — the extra gradient-free "
        "forward; tpucap/train/scheduled.py)",
    )
    ap.add_argument(
        "--steps-per-dispatch",
        type=int,
        default=1,
        help="--mode train: run N optimizer steps per program call "
        "(lax.scan over N stacked batches — TrainConfig."
        "steps_per_dispatch). Amortizes per-dispatch host overhead; "
        "the update sequence is exactly the per-step one.",
    )
    ap.add_argument(
        "--train-mixed",
        action="store_true",
        help="--mode train only: MIXED-precision step (f32 master "
        "params/opt-state, bf16 compute via TrainConfig.precision's "
        "compute_dtype path) instead of the default wholesale param "
        "cast per --dtype. Use with --dtype f32.",
    )
    ap.add_argument(
        "--mode",
        default="caption",
        choices=[
            "caption",
            "train",
            "e2e-jpeg",
            "host-decode",
            "pallas-lstm",
            "serve",
            "speculative",
        ],
        help="caption throughput (headline; device-resident inputs), "
        "teacher-forced training throughput, the full JPEG->caption "
        "path (e2e-jpeg; only meaningful with locally-attached TPU — "
        "over the axon tunnel host->device runs at ~2MB/s and dominates), "
        "host-decode (C++ JPEG decode MB/s + images/s, the host half of "
        "the e2e claim), pallas-lstm (fused Pallas cell vs the XLA "
        "scan cell, microbench), serve (CaptionServer micro-batching "
        "layer under concurrent clients: captions/s + request p50/p99), "
        "or speculative (draft/verify decode at the acceptance envelope: "
        "self-draft ceiling + random-draft floor vs plain greedy)",
    )
    ap.add_argument(
        "--assert-scaling",
        action="store_true",
        help="with --mode host-decode --threads 1,2,4,...: FAIL (exit 4) "
        "unless decode throughput scales across the swept pool sizes "
        "(>=60%% parallel efficiency between consecutive counts, up to "
        "the host's core count) — the self-verifying form of the "
        "config-5 input-stage scaling claim for a real multi-core host "
        "(this 1-vCPU box can only run the no-regression end; see "
        "docs/OPERATIONS.md)",
    )
    ap.add_argument(
        "--serve-requests",
        type=int,
        default=4096,
        help="total requests for --mode serve",
    )
    ap.add_argument(
        "--serve-clients",
        type=int,
        default=32,
        help="concurrent client threads for --mode serve",
    )
    ap.add_argument(
        "--serve-delay-ms",
        type=float,
        default=2.0,
        help="micro-batcher window for --mode serve",
    )
    ap.add_argument(
        "--serve-depth",
        type=int,
        default=1,
        help="batches in flight (pipeline_depth) for --mode serve",
    )
    ap.add_argument(
        "--serve-ticks",
        type=int,
        default=8,
        help="ticks_per_sync for --serve-engine continuous",
    )
    ap.add_argument(
        "--serve-engine",
        default="batch",
        choices=["batch", "continuous"],
        help="--mode serve engine: 'batch' (CaptionServer micro-batches) "
        "or 'continuous' (slot-recycling engine; greedy by default, "
        "beam when --method beam — each request then holds a "
        "--beam-lane group)",
    )
    args = ap.parse_args()

    if args.assert_scaling and args.mode != "host-decode":
        # A CI gate wired to the wrong mode must fail loudly, not
        # exit 0 having asserted nothing.
        raise SystemExit(
            f"--assert-scaling only applies to --mode host-decode "
            f"(got --mode {args.mode})"
        )

    import os

    if args.mode != "host-decode" and os.environ.get(
        "JAX_PLATFORMS", ""
    ).lower() not in ("cpu",):
        # Device reachability probe, timeout-bounded in a subprocess:
        # jax device init HANGS indefinitely in-process when the
        # remote-TPU tunnel is down (observed 2026-08-17) — a fast,
        # honest failure beats wedging the caller for hours. No fake
        # 0-value JSON is printed: a dead tunnel is not a measurement.
        import subprocess
        import sys as _sys

        try:
            probe = subprocess.run(
                [
                    _sys.executable,
                    "-c",
                    "import jax, sys; "
                    "sys.stdout.write(str(len(jax.devices())))",
                ],
                capture_output=True,
                timeout=180,
            )
            ok = probe.returncode == 0 and int(probe.stdout) >= 1
        except (subprocess.TimeoutExpired, ValueError):
            ok = False
        if not ok:
            print(
                "bench: TPU backend unreachable (device probe timed "
                "out/failed) — not printing a metric; fix the tunnel "
                "and re-run. --mode host-decode works without a device.",
                file=sys.stderr,
            )
            raise SystemExit(3)

    if args.mode == "host-decode":
        # Pure host-side benchmark (no device): the C++ threaded JPEG
        # decode feeding config 5. Recorded so the e2e throughput claim
        # has measured legs on the host half even when the device half
        # is tunnel-bound (VERDICT r1 weak #5). ``--threads N[,M,...]``
        # sweeps explicit pool sizes — the runnable scaling measurement
        # a real multi-core host executes as-is (this 1-vCPU VM can
        # only witness the no-regression end of the curve; the
        # cores-scaling claim is otherwise extrapolated — docs/PERF.md
        # r4, VERDICT r3 weak #6).
        import io
        import os

        from PIL import Image

        from tpucap.ops import jpeg as jpeg_ops

        rng = np.random.default_rng(0)
        blobs = []
        for i in range(args.batch):
            arr = rng.integers(0, 256, (375, 500, 3), dtype=np.uint8)
            buf = io.BytesIO()
            Image.fromarray(arr).save(buf, format="JPEG", quality=90)
            blobs.append(buf.getvalue())
        total_mb = sum(len(b) for b in blobs) / 1e6
        size = 299

        def measure(n_threads: int):
            out = jpeg_ops.decode_jpeg_batch(
                blobs, size, n_threads=n_threads
            )  # warmup/threadpool
            assert out.shape == (args.batch, size, size, 3)
            times = []
            for _ in range(args.iters):
                t0 = time.perf_counter()
                jpeg_ops.decode_jpeg_batch(
                    blobs, size, n_threads=n_threads
                )
                times.append(time.perf_counter() - t0)
            return float(np.median(times))

        sweep = [
            int(t) for t in (args.threads or "0").split(",") if t.strip()
        ]
        best_med, best_n = None, 0
        meds: dict[int, float] = {}
        for n in sweep:
            med = measure(n)
            meds[n] = med
            print(
                f"# threads={n or 'auto'}: {med * 1000:.1f}ms/batch = "
                f"{args.batch / med:.0f} img/s, {total_mb / med:.0f}MB/s "
                "compressed",
                file=sys.stderr,
            )
            if best_med is None or med < best_med:
                best_med, best_n = med, n
        if args.assert_scaling:
            # Self-verifying scaling claim: between consecutive explicit
            # pool sizes (both within the host's core budget) demand
            # >=60% parallel efficiency; oversubscribed points must at
            # least not regress >15% (thread overhead bound). Exit 4 on
            # failure so CI treats it as a real assertion.
            cores = os.cpu_count() or 1
            explicit = sorted(n for n in meds if n > 0)
            usable = [n for n in explicit if n <= cores]
            if len(usable) < 2:
                print(
                    f"# --assert-scaling: only {usable or explicit} "
                    f"thread counts fit this host's {cores} core(s) — "
                    "scaling cannot be asserted here; run on a "
                    "multi-core host (docs/OPERATIONS.md recipe)",
                    file=sys.stderr,
                )
                raise SystemExit(4)
            failures = []
            for a, b in zip(usable, usable[1:]):
                speedup = meds[a] / meds[b]
                need = 0.6 * (b / a)
                tag = "ok" if speedup >= need else "FAIL"
                print(
                    f"# scaling {a}->{b} threads: speedup "
                    f"{speedup:.2f}x (need >= {need:.2f}x) {tag}",
                    file=sys.stderr,
                )
                if speedup < need:
                    failures.append((a, b, speedup, need))
            for n in (x for x in explicit if x > cores):
                if meds[n] > 1.15 * best_med:
                    failures.append((best_n, n, best_med / meds[n], 0.87))
                    print(
                        f"# oversubscribed threads={n} regressed "
                        f"{meds[n] / best_med:.2f}x vs best FAIL",
                        file=sys.stderr,
                    )
            if failures:
                print(
                    f"# --assert-scaling FAILED: {failures}",
                    file=sys.stderr,
                )
                raise SystemExit(4)
            print(
                f"# --assert-scaling PASSED across threads={usable} "
                f"on {cores} cores",
                file=sys.stderr,
            )
        ips = args.batch / best_med
        result = {
            "metric": f"host JPEG decode (batch {args.batch}, 500x375 "
            f"q90 -> {size}px, C++ threaded, "
            f"threads={best_n or 'auto'})",
            "value": round(ips, 2),
            "unit": "images/sec/host",
            "vs_baseline": round(ips / (10000.0 / 8.0), 4),
        }
        print(
            f"# decode={best_med * 1000:.1f}ms/batch "
            f"{total_mb / best_med:.0f}MB/s compressed "
            f"({total_mb:.1f}MB total, {os.cpu_count()} host cores "
            "visible; run --threads 1,2,4,8,... on a multi-core host "
            "to measure the scaling curve)",
            file=sys.stderr,
        )
        print(json.dumps(result))
        return

    import jax

    # Persistent compilation cache: programs survive across bench processes.
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp

    from tpucap.decode import beam_decode, greedy_decode
    from tpucap.models.decoders import build_decoder
    from tpucap.models.encoders import build_encoder

    print(
        f"# devices: {jax.devices()} backend={jax.default_backend()}",
        file=sys.stderr,
    )

    spatial = args.decoder in ("attention", "adaptive")
    encoder = build_encoder(
        args.encoder, "spatial" if spatial else "pooled"
    )
    if args.vit_flash:
        import dataclasses as _dc

        encoder = _dc.replace(encoder, attention_impl="flash")
    if args.fused_blocks:
        import dataclasses as _dc

        if args.encoder != "resnet50":
            raise SystemExit("--fused-blocks is resnet50-only")
        if args.no_fold_bn:
            raise SystemExit(
                "--fused-blocks needs folded BN (drop --no-fold-bn)"
            )
        stages = tuple(
            s.strip() for s in args.fused_blocks.split(",") if s.strip()
        )
        bad = set(stages) - {"conv2", "conv3", "conv4", "conv5"}
        if bad:
            raise SystemExit(f"--fused-blocks: unknown stages {bad}")
        encoder = _dc.replace(
            encoder, fused_blocks=True, fused_stages=stages
        )
    decoder = build_decoder(
        args.decoder,
        vocab_size=args.vocab,
        feature_dim=encoder.feature_dim,
        embed_dim=256,
        hidden_dim=256,
        num_layers=2 if args.decoder in ("lstm2", "transformer") else 1,
        max_positions=max(40, args.max_len + 2),
        num_experts=args.num_experts,
    )

    def encode(ep, images):
        feats = encoder.apply(ep, images)
        if spatial:
            b, h, w, c = feats.shape
            feats = feats.reshape(b, h * w, c)
        return feats
    rng = jax.random.key(0)
    k_enc, k_dec = jax.random.split(rng)
    enc_params = None if args.no_encoder else encoder.init(k_enc)
    if enc_params is not None and not args.no_fold_bn:
        from tpucap.models.encoders.fold_bn import fold_batch_norms

        # fold_batch_norms computes on host (numpy); device_put the result
        # or every call would re-ship ~50MB of weights through the tunnel.
        enc_params = jax.device_put(
            fold_batch_norms(args.encoder, enc_params)
        )
    if enc_params is not None and args.int8:
        from tpucap.models.encoders.quantize import quantize_encoder_params

        enc_params = jax.device_put(
            quantize_encoder_params(jax.device_get(enc_params))
        )
    dec_params = decoder.init(k_dec)
    if args.int8_vocab:
        from tpucap.models.encoders.quantize import (
            quantize_decoder_projection,
        )

        dec_params = jax.device_put(
            quantize_decoder_projection(jax.device_get(dec_params))
        )
    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    if args.dtype == "bf16":
        from tpucap.models.encoders.quantize import (
            cast_bf16_preserving_quant as cast,
        )

        if enc_params is not None:
            enc_params = cast(enc_params)
        dec_params = cast(dec_params)

    START, END = 1, 2

    if args.mode == "e2e-jpeg":
        # Config 5 end-to-end: JPEG bytes -> C++ multithreaded decode ->
        # uint8 device transfer -> fused on-device preprocess -> encoder ->
        # beam search -> caption strings, host decode overlapped with
        # device compute (pipeline.caption_dataset).
        import os
        import tempfile

        from tpucap.config import (
            Config,
            DecodeConfig,
            DecoderConfig,
            EncoderConfig,
        )
        from tpucap.data.fixtures import generate_fixture_dataset
        from tpucap.pipeline import CaptioningPipeline
        from tpucap.text import Tokenizer

        root = os.path.join(tempfile.gettempdir(), "tpucap_bench_ds")
        n_images = args.batch * 2
        img_dir = os.path.join(root, "images")
        if (
            not os.path.isdir(img_dir)
            or len(os.listdir(img_dir)) < n_images
        ):
            generate_fixture_dataset(
                root, n_images=n_images, image_size=375, seed=0
            )
        paths = sorted(
            os.path.join(img_dir, f) for f in os.listdir(img_dir)
        )[:n_images]

        from tpucap.config import encoder_config

        if args.decoder in ("attention", "adaptive"):
            raise SystemExit(
                "e2e-jpeg does not support spatial decoders (spatial "
                "feature plumbing); use the default caption mode"
            )
        cfg = Config(
            encoder=encoder_config(args.encoder),
            decoder=DecoderConfig(
                name=args.decoder,
                num_layers=2
                if args.decoder in ("lstm2", "transformer")
                else 1,
                max_positions=max(40, args.max_len + 2),
            ),
            decode=DecodeConfig(
                method=args.method,
                beam_width=args.beam,
                max_len=args.max_len,
                approx_topk=not args.exact_topk,
            ),
            vocab_size=args.vocab,
            precision="bf16" if args.dtype == "bf16" else "f32",
        )
        tok = Tokenizer()
        tok.word_index = {"startseq": 1, "endseq": 2}
        tok.word_index.update(
            {f"w{i}": i for i in range(3, args.vocab)}
        )
        tok.index_word = {i: w for w, i in tok.word_index.items()}
        pipe = CaptioningPipeline(cfg, tokenizer=tok)
        pipe.build()
        if args.int8:
            pipe.quantize_encoder()
        if args.int8_vocab:
            pipe.quantize_vocab_projection()

        # Warmup (includes compile).
        t0 = time.perf_counter()
        pipe.caption_dataset(
            paths[: args.batch], batch_size=args.batch,
            method=args.method, beam_width=args.beam,
        )
        compile_s = time.perf_counter() - t0

        times = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            caps = pipe.caption_dataset(
                paths, batch_size=args.batch,
                method=args.method, beam_width=args.beam,
            )
            times.append((time.perf_counter() - t0) / len(paths))
        assert len(caps) == len(paths)
        med = float(np.median(times))
        cps = 1.0 / med
        result = {
            "metric": f"captions/sec e2e-jpeg ({args.method} {args.beam}"
            f"{' exact-topk' if args.exact_topk else ' approx-topk'}, "
            f"batch {args.batch}, {args.decoder}, {args.encoder}, "
            f"{args.dtype}"
            f"{', int8' if args.int8 else ''}"
            f"{', int8-vocab' if args.int8_vocab else ''})",
            "value": round(cps, 2),
            "unit": "captions/sec/chip",
            "vs_baseline": round(cps / (10000.0 / 8.0), 4),
        }
        print(
            f"# compile={compile_s:.1f}s per_image={med * 1000:.3f}ms "
            f"(includes host JPEG decode, overlapped)",
            file=sys.stderr,
        )
        print(json.dumps(result))
        return

    if args.mode == "pallas-lstm":
        # Head-to-head: Pallas fused LSTM cell vs the XLA-fused scan cell
        # at decode-hot-loop shapes. Round 1 measured XLA faster on v5e
        # (docs/PERF.md), which is why the Pallas kernel is opt-in; this
        # mode keeps that decision re-checkable as shapes/toolchains move.
        from tpucap.models.layers import lstm_cell_step
        from tpucap.ops.pallas.lstm_step import fused_lstm_step

        H = 256
        B = args.batch * args.beam  # decode loop runs at batch*beam rows
        key = jax.random.key(0)
        p = {
            "kernel": jax.random.normal(key, (H, 4 * H), dtype) * 0.05,
            "recurrent": jax.random.normal(key, (H, 4 * H), dtype) * 0.05,
            "bias": jnp.zeros((4 * H,), dtype),
        }
        x = jax.random.normal(key, (B, H), dtype)
        h = jnp.zeros((B, H), dtype)
        c = jnp.zeros((B, H), dtype)

        xla_step = jax.jit(lstm_cell_step)
        if jax.default_backend() != "tpu":
            # Pallas TPU kernels only run natively on TPU; interpret mode
            # keeps the bench runnable (numerics check, not a perf number).
            from functools import partial

            fused = partial(fused_lstm_step, interpret=True)
        else:
            fused = fused_lstm_step

        def timeit(fn):
            # sync via a host transfer (axon block_until_ready is a no-op)
            _, med, _ = time_fn(
                lambda: fn(p, x, h, c),
                lambda out: np.asarray(out[0]),
                iters=args.iters,
                inner=args.inner,
                warmup=args.warmup,
            )
            return med

        t_xla = timeit(xla_step)
        t_pallas = timeit(fused)
        result = {
            "metric": f"pallas fused LSTM step speedup vs XLA "
            f"(B {B}, H {H}, {args.dtype})",
            "value": round(t_xla / t_pallas, 4),
            "unit": "x (>1 = pallas faster)",
            "vs_baseline": round(t_xla / t_pallas, 4),
        }
        print(
            f"# xla={t_xla * 1e6:.1f}us pallas={t_pallas * 1e6:.1f}us",
            file=sys.stderr,
        )
        print(json.dumps(result))
        return

    if args.mode == "serve":
        # The online serving layer under closed-loop concurrent clients:
        # --serve-clients threads each submit their share of
        # --serve-requests feature rows one at a time (submit -> wait),
        # so the micro-batcher sees realistic concurrency (batch sizes
        # track the client count, not max_batch). Features-mode serving
        # (the reference's pickled-features shape) keeps the tunnel out
        # of the measurement; the images path adds the encoder cost
        # measured by the headline bench.
        import threading

        from tpucap.config import (
            Config,
            DecodeConfig,
            DecoderConfig,
            encoder_config,
        )
        from tpucap.pipeline import CaptioningPipeline
        from tpucap.serve import CaptionServer, ContinuousCaptionServer
        from tpucap.text import Tokenizer

        if args.decoder in ("attention", "adaptive"):
            raise SystemExit("--mode serve benches pooled-feature serving")
        cfg = Config(
            encoder=encoder_config(args.encoder),
            decoder=DecoderConfig(
                name=args.decoder,
                num_layers=2
                if args.decoder in ("lstm2", "transformer")
                else 1,
                max_positions=max(40, args.max_len + 2),
            ),
            decode=DecodeConfig(
                method=args.method,
                beam_width=args.beam,
                max_len=args.max_len,
                approx_topk=not args.exact_topk,
            ),
            vocab_size=args.vocab,
            precision="bf16" if args.dtype == "bf16" else "f32",
        )
        tok = Tokenizer()
        tok.word_index = {"startseq": 1, "endseq": 2}
        tok.word_index.update({f"w{i}": i for i in range(3, args.vocab)})
        tok.index_word = {i: w for w, i in tok.word_index.items()}
        pipe = CaptioningPipeline(cfg, tokenizer=tok)
        pipe.build()

        rng = np.random.default_rng(0)
        feat_dim = cfg.encoder.feature_dim
        n, k = args.serve_requests, args.serve_clients
        if n < k:
            raise SystemExit(
                f"--serve-requests ({n}) must be >= --serve-clients "
                f"({k}): each client runs requests//clients requests, "
                f"so fewer requests than clients serves nothing"
            )
        feats = rng.normal(size=(k, feat_dim)).astype(np.float32)

        def _ms(v):  # percentiles are None when no request completed
            return f"{v:.1f}ms" if v is not None else "n/a"

        if args.serve_engine == "continuous":
            cont_bw = args.beam if args.method == "beam" else 1
            srv = ContinuousCaptionServer(
                pipe,
                slots=args.batch,
                ticks_per_sync=args.serve_ticks,
                beam_width=cont_bw,
            )
            t0 = time.perf_counter()
            srv.warmup(timeout=900)  # all admit buckets + tick/collect
            compile_s = time.perf_counter() - t0
            warmed = srv.stats()["requests"]  # 0 after warmup reset
        else:
            srv = CaptionServer(
                pipe,
                max_batch=args.batch,
                max_delay_ms=args.serve_delay_ms,
                method=args.method,
                beam_width=args.beam,
                pipeline_depth=args.serve_depth,
            )
            t0 = time.perf_counter()
            srv.warmup()
            compile_s = time.perf_counter() - t0

        def client(i, count):
            for _ in range(count):
                srv.caption(feats[i], timeout=300)

        threads = [
            threading.Thread(target=client, args=(i, n // k))
            for i in range(k)
        ]
        t0 = time.perf_counter()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        wall = time.perf_counter() - t0
        stats = srv.stats()
        srv.close()
        served = stats["requests"] - (
            warmed if args.serve_engine == "continuous" else 0
        )
        cps = served / wall
        if args.serve_engine == "continuous":
            cont_label = (
                f"beam {args.beam}" if cont_bw > 1 else "greedy"
            )
            result = {
                "metric": f"serving captions/sec (continuous {cont_label}, "
                f"{k} clients, {args.batch} slots, {args.decoder}, "
                f"features-mode, {args.dtype})",
                "value": round(cps, 2),
                "unit": "captions/sec/chip",
                "vs_baseline": round(cps / (10000.0 / 8.0), 4),
            }
            print(
                f"# compile={compile_s:.1f}s served={served} "
                f"ticks={stats['ticks']} "
                f"occupancy={stats['mean_occupancy']:.1f}/{args.batch} "
                f"p50={_ms(stats['p50_ms'])} p99={_ms(stats['p99_ms'])}",
                file=sys.stderr,
            )
            print(json.dumps(result))
            return
        result = {
            "metric": f"serving captions/sec ({args.method} {args.beam}, "
            f"{k} clients, window {args.serve_delay_ms}ms, "
            f"depth {args.serve_depth}, "
            f"max_batch {args.batch}, {args.decoder}, features-mode, "
            f"{args.dtype})",
            "value": round(cps, 2),
            "unit": "captions/sec/chip",
            "vs_baseline": round(cps / (10000.0 / 8.0), 4),
        }
        print(
            f"# compile={compile_s:.1f}s served={served} "
            f"batches={stats['batches']} "
            f"mean_batch={stats['mean_batch']:.1f} "
            f"p50={_ms(stats['p50_ms'])} p99={_ms(stats['p99_ms'])}",
            file=sys.stderr,
        )
        print(json.dumps(result))
        return

    if args.mode == "train":
        if args.int8_vocab:
            raise SystemExit(
                "--int8-vocab is a serving-only quantization; gradients "
                "with respect to int8 kernels are undefined — drop the "
                "flag for --mode train"
            )
        import optax

        from tpucap.train import TrainState, make_train_step

        optimizer = optax.adam(1e-3)
        state = TrainState.create(dec_params, optimizer, jax.random.key(2))
        spd = max(1, args.steps_per_dispatch)
        step = make_train_step(
            decoder,
            optimizer,
            compute_dtype=jnp.bfloat16 if args.train_mixed else None,
            scheduled_sampling=args.scheduled_sampling is not None,
            multi_steps=spd,
        )
        feat_shape = (
            (args.batch, 196, encoder.feature_dim)
            if spatial
            else (args.batch, encoder.feature_dim)
        )
        tok_shape = (args.batch, args.max_len + 1)
        if spd > 1:
            # Multi-step dispatch: stacks of spd batches per program call.
            feat_shape = (spd,) + feat_shape
            tok_shape = (spd,) + tok_shape
        feats = jax.random.normal(jax.random.key(1), feat_shape, dtype)
        tokens = jax.random.randint(
            jax.random.key(3), tok_shape, 1, args.vocab
        ).astype(jnp.int32)

        ss_args = (
            (jnp.float32(args.scheduled_sampling),)
            if args.scheduled_sampling is not None
            else ()
        )

        def run_train():
            nonlocal state
            state, m = step(state, feats, tokens, *ss_args)
            return m

        compile_s, med, _ = time_fn(
            run_train,
            lambda m: float(np.asarray(m["loss"])),
            iters=args.iters,
            inner=args.inner,
            warmup=args.warmup,
        )
        sps = spd * args.batch / med
        result = {
            "metric": f"training samples/sec (batch {args.batch}, "
            f"T {args.max_len}, "
            f"{'mixed-bf16' if args.train_mixed else args.dtype}"
            + (
                f", ss={args.scheduled_sampling}"
                if args.scheduled_sampling is not None
                else ""
            )
            + (f", spd={spd}" if spd > 1 else "")
            + ")",
            "value": round(sps, 2),
            "unit": "samples/sec/chip",
            "vs_baseline": 0.0,
        }
        print(
            f"# compile={compile_s:.1f}s "
            f"median_step={med * 1000 / spd:.1f}ms "
            f"(dispatch={med * 1000:.1f}ms/{spd} steps) "
            f"tokens/sec={sps * args.max_len:.0f}",
            file=sys.stderr,
        )
        print(json.dumps(result))
        return

    if args.mode == "speculative":
        # Speculative decode measured at the ACCEPTANCE ENVELOPE: the
        # realized speedup depends on how well the draft imitates the
        # target (a training question — `tpucap distill`), so the bench
        # pins the machinery's two bounds instead:
        #   ceiling — an ORACLE draft that replays the target's own
        #     greedy stream from a device buffer (acceptance 1.0 at
        #     ~zero draft cost): pure verify-side machinery win, the
        #     best any perfectly-distilled free draft could do;
        #   floor — a random tiny LSTM draft (acceptance ~0): all the
        #     engine overhead, none of the acceptance. The engine is
        #     token-exact either way, so the floor is the worst case
        #     ever deployable.
        # Both are decode-only (device-resident features), comparable
        # to `--no-encoder --method greedy`.
        from tpucap.decode import speculative_greedy_decode

        if args.decoder != "transformer":
            raise SystemExit(
                "--mode speculative needs --decoder transformer (the "
                "verifier is the chunked KV forward step_chunk)"
            )
        # step_chunk writes gamma+1 positions past max_len in the worst
        # round; the stock bench decoder has no gamma headroom, and the
        # learned positional table sizes with max_positions — so build
        # (and init) the speculative target fresh.
        decoder_sp = build_decoder(
            args.decoder,
            vocab_size=args.vocab,
            feature_dim=encoder.feature_dim,
            embed_dim=256,
            hidden_dim=256,
            num_layers=2,
            max_positions=args.max_len + args.gamma + 2,
            num_experts=args.num_experts,
        )
        dec_params_sp = decoder_sp.init(k_dec)
        if args.dtype == "bf16":
            dec_params_sp = cast(dec_params_sp)
        draft = build_decoder(
            "lstm1",
            vocab_size=args.vocab,
            feature_dim=encoder.feature_dim,
            embed_dim=128,
            hidden_dim=128,
        )
        draft_params = draft.init(jax.random.key(7))
        if args.dtype == "bf16":
            draft_params = cast(draft_params)
        feats = jax.random.normal(
            jax.random.key(1), (args.batch, encoder.feature_dim), dtype
        )

        @jax.jit
        def run_plain(dp, f):
            state = decoder_sp.init_state(dp, f)
            return greedy_decode(
                decoder_sp.step,
                dp,
                state,
                start_id=START,
                end_id=END,
                max_len=args.max_len,
            )

        def make_spec(draft_dec):
            @jax.jit
            def run(tp, dpd, f):
                t_state = decoder_sp.init_state(tp, f)
                d_state = draft_dec.init_state(dpd, f)
                return speculative_greedy_decode(
                    decoder_sp.step_chunk,
                    tp,
                    t_state,
                    draft_dec.step,
                    dpd,
                    d_state,
                    start_id=START,
                    end_id=END,
                    max_len=args.max_len,
                    gamma=args.gamma,
                )

            return run

        # Oracle draft: replays the target's own greedy tokens from a
        # device buffer — one gather + one one-hot per step. Its state
        # (pos, the token buffer) is batch-leading, so the engine's
        # family-generic stack-gather rewind applies unchanged.
        class OracleDraft:
            def init_state(self, params, toks):
                B = toks.shape[0]
                return {"pos": jnp.zeros((B,), jnp.int32), "toks": toks}

            def step(self, params, state, token):
                del params, token
                pos, tk = state["pos"], state["toks"]
                nxt = jnp.take_along_axis(
                    tk,
                    jnp.minimum(pos, tk.shape[1] - 1)[:, None],
                    axis=1,
                )[:, 0]
                logits = jax.nn.one_hot(nxt, args.vocab, dtype=jnp.float32)
                return logits, {"pos": pos + 1, "toks": tk}

        oracle = OracleDraft()

        @jax.jit
        def run_ceiling(tp, f, toks):
            t_state = decoder_sp.init_state(tp, f)
            d_state = oracle.init_state(None, toks)
            return speculative_greedy_decode(
                decoder_sp.step_chunk,
                tp,
                t_state,
                oracle.step,
                None,
                d_state,
                start_id=START,
                end_id=END,
                max_len=args.max_len,
                gamma=args.gamma,
            )

        run_floor = make_spec(draft)
        # The oracle's replay buffer is computed ONCE outside the timed
        # region — the ceiling program being timed is exactly the
        # speculative engine with a free always-right draft. One
        # fixed-point refinement replaces the step-path greedy stream
        # with the engine's own emission: the chunked verify's argmax
        # can differ from the sequential step path at bf16 ties, and a
        # desynced replay silently understates the ceiling (acc 0.86
        # and 27 rounds instead of ~1.0 and ~T/(gamma+1) when first
        # measured).
        oracle_toks = jax.block_until_ready(
            run_plain(dec_params_sp, feats).tokens
        )
        oracle_toks = jax.block_until_ready(
            run_ceiling(dec_params_sp, feats, oracle_toks)[0].tokens
        )

        sync = lambda r: np.asarray(r[0].lengths)  # noqa: E731
        _, med_plain, _ = time_fn(
            lambda: (run_plain(dec_params_sp, feats), None),
            sync,
            iters=args.iters,
            inner=args.inner,
            warmup=args.warmup,
        )
        _, med_ceil, _ = time_fn(
            lambda: run_ceiling(dec_params_sp, feats, oracle_toks),
            sync,
            iters=args.iters,
            inner=args.inner,
            warmup=args.warmup,
        )
        _, med_floor, _ = time_fn(
            lambda: run_floor(dec_params_sp, draft_params, feats),
            sync,
            iters=args.iters,
            inner=args.inner,
            warmup=args.warmup,
        )
        _, stats_ceil = jax.tree_util.tree_map(
            np.asarray, run_ceiling(dec_params_sp, feats, oracle_toks)
        )
        _, stats_floor = jax.tree_util.tree_map(
            np.asarray, run_floor(dec_params_sp, draft_params, feats)
        )
        acc_ceil = float(stats_ceil.accepted) / max(
            1, int(stats_ceil.drafted)
        )
        acc_floor = float(stats_floor.accepted) / max(
            1, int(stats_floor.drafted)
        )
        ceil = med_plain / med_ceil
        floor = med_plain / med_floor
        result = {
            "metric": f"speculative decode speedup ceiling (gamma "
            f"{args.gamma}, oracle draft acc {acc_ceil:.2f}, batch "
            f"{args.batch}, T {args.max_len}, {args.dtype})",
            "value": round(ceil, 3),
            "unit": "x vs plain greedy",
            "vs_baseline": round(ceil, 3),
        }
        print(
            f"# plain={med_plain * 1000:.1f}ms "
            f"oracle-draft={med_ceil * 1000:.1f}ms ({ceil:.2f}x, "
            f"acc={acc_ceil:.2f}, rounds={int(stats_ceil.rounds)}) "
            f"random-draft={med_floor * 1000:.1f}ms "
            f"({floor:.2f}x, acc={acc_floor:.2f}) — realized speedup "
            f"lands between floor and ceiling per the draft's "
            f"acceptance rate (train one with `tpucap distill`)",
            file=sys.stderr,
        )
        print(json.dumps(result))
        return

    if args.encoder_only:
        run_enc = jax.jit(encode)
        size = encoder.input_size
        images = jax.random.uniform(
            jax.random.key(1),
            (args.batch, size, size, 3),
            dtype,
            minval=-1,
            maxval=1,
        )

        compile_s, med, _ = time_fn(
            lambda: run_enc(enc_params, images),
            lambda res: np.asarray(res[:1, :1]),
            iters=args.iters,
            inner=args.inner,
            warmup=args.warmup,
        )
        ips = args.batch / med
        result = {
            "metric": f"encoder images/sec ({args.encoder}, batch "
            f"{args.batch}, {args.dtype}"
            f"{', int8' if args.int8 else ''})",
            "value": round(ips, 2),
            "unit": "images/sec/chip",
            "vs_baseline": round(ips / (10000.0 / 8.0), 4),
        }
        print(
            f"# compile={compile_s:.1f}s median_step={med * 1000:.1f}ms",
            file=sys.stderr,
        )
        print(json.dumps(result))
        return

    if args.constraints:
        if (
            args.method != "beam"
            or args.no_repeat_ngram
            or args.unroll > 1
        ):
            raise SystemExit(
                "--constraints needs --method beam without "
                "--no-repeat-ngram/--unroll"
            )
        from tpucap.decode import constrained_beam_decode

        # Distinct synthetic mid-vocab ids (any ids work for a cost
        # measurement; avoiding START/END/pad keeps semantics real).
        constraint_ids = np.arange(
            5, 5 + 4 * args.constraints, 4, dtype=np.int32
        )

    def decode(dp, state):
        if args.constraints:
            return constrained_beam_decode(
                decoder.step,
                dp,
                state,
                start_id=START,
                end_id=END,
                max_len=args.max_len,
                beam_width=args.beam,
                constraint_ids=constraint_ids,
                decoder=decoder,
            )
        if args.method == "greedy":
            return greedy_decode(
                decoder.step,
                dp,
                state,
                start_id=START,
                end_id=END,
                max_len=args.max_len,
                no_repeat_ngram_size=args.no_repeat_ngram,
                unroll=args.unroll,
            )
        return beam_decode(
            decoder.step,
            dp,
            state,
            start_id=START,
            end_id=END,
            max_len=args.max_len,
            beam_width=args.beam,
            decoder=decoder,
            approx_topk=not args.exact_topk,
            no_repeat_ngram_size=args.no_repeat_ngram,
            unroll=args.unroll,
        )

    if args.no_encoder:

        @jax.jit
        def run(dp, feats):
            state = decoder.init_state(dp, feats)
            return decode(dp, state)

        feat_shape = (
            (args.batch, 196, encoder.feature_dim)
            if spatial
            else (args.batch, encoder.feature_dim)
        )
        feats = jax.random.normal(jax.random.key(1), feat_shape, dtype)
        inputs = (dec_params, feats)
    else:

        @jax.jit
        def run(ep, dp, images):
            feats = encode(ep, images)
            state = decoder.init_state(dp, feats)
            return decode(dp, state)

        size = encoder.input_size
        images = jax.random.uniform(
            jax.random.key(1),
            (args.batch, size, size, 3),
            dtype,
            minval=-1,
            maxval=1,
        )
        inputs = (enc_params, dec_params, images)

    # time_fn synchronizes via a small host transfer: on the remote-TPU
    # (axon) platform block_until_ready returns before execution finishes;
    # only a device_get truly drains the queue.
    compile_s, med, times = time_fn(
        lambda: run(*inputs),
        lambda res: np.asarray(res.lengths),
        iters=args.iters,
        inner=args.inner,
        warmup=args.warmup,
    )
    cps = args.batch / med
    per_chip_target = 10000.0 / 8.0  # north-star on v5e-8, per chip

    # Per-run step+RTT/inner fit: quantify how much of the median is
    # residual tunnel-sync artifact (BASELINE metric honesty; VERDICT r4
    # next-8). One extra shallow-depth sample set, solved two-point.
    step_fit = fit_device_step(
        lambda: run(*inputs),
        lambda res: np.asarray(res.lengths),
        med,
        args.inner,
        iters=args.iters,
    )

    # True per-image latency: a batch-1 program timed per-call with a
    # host sync each call (BASELINE.md "p50 per-image latency" row).
    # Distinct from the amortized number below — med/batch is batch
    # *throughput time* per image, ~27x smaller than what one request
    # actually waits (VERDICT r2 weak #1).
    p50_batch1_ms = None
    if not args.no_latency:
        lat_inputs = inputs[:-1] + (inputs[-1][:1],)  # batch-1 slice
        _, lat_med, _ = time_fn(
            lambda: run(*lat_inputs),
            lambda res: np.asarray(res.lengths),
            iters=max(args.iters, 5),
            inner=1,  # per-call sync: each sample IS one request wait
            warmup=args.warmup,
        )
        p50_batch1_ms = lat_med * 1000
    result = {
        "metric": f"captions/sec ({args.method}"
        f"{f' {args.beam}' if args.method == 'beam' else ''}"
        f"{'' if args.method != 'beam' else (' exact-topk' if args.exact_topk or args.constraints else ' approx-topk')}, "
        f"batch {args.batch}, "
        f"{args.decoder}, "
        f"{'decode-only' if args.no_encoder else args.encoder + '+decode'}, "
        f"{args.dtype}"
        f"{', int8' if args.int8 and not args.no_encoder else ''}"
        f"{', int8-vocab' if args.int8_vocab else ''}"
        f"{f', fused {args.fused_blocks}' if args.fused_blocks else ''}"
        f"{f', unroll {args.unroll}' if args.unroll > 1 else ''}"
        f"{f', no-repeat-{args.no_repeat_ngram}gram' if args.no_repeat_ngram else ''}"
        f"{f', {args.constraints} constraints' if args.constraints else ''})",
        "value": round(cps, 2),
        "unit": "captions/sec/chip",
        "vs_baseline": round(cps / per_chip_target, 4),
    }
    if p50_batch1_ms is not None:
        result["p50_batch1_latency_ms"] = round(p50_batch1_ms, 3)
    if step_fit is not None:
        result.update(step_fit)
    print(
        f"# compile={compile_s:.1f}s median_step={med * 1000:.1f}ms "
        f"amortized_ms_per_image={med / args.batch * 1000:.3f}ms "
        + (
            f"p50_batch1_latency={p50_batch1_ms:.2f}ms "
            if p50_batch1_ms is not None
            else ""
        )
        + (
            f"device_step_fit={step_fit['device_step_ms_fit']:.1f}ms "
            f"rtt_fit={step_fit['rtt_ms_fit']:.1f}ms "
            if step_fit is not None
            else ""
        )
        + f"times={[round(t, 4) for t in times]}",
        file=sys.stderr,
    )
    print(json.dumps(result))


if __name__ == "__main__":
    main()
