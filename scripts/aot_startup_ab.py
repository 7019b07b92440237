"""A/B: time-to-first-caption — live pipeline vs AOT StableHLO bundle.

The AOT artifact's pitch is startup: a serving process should not pay
Python model construction + engine tracing before its first caption.
This script builds ONE bundle (bench-shape decoder, random weights,
synthetic vocab), then times two COLD subprocesses:

  A) import tpucap.pipeline -> CaptioningPipeline.load -> generate(64)
  B) import tpucap.checkpoint.aot -> AotCaptioner.load -> caption(64)

Each phase is timed inside the subprocess (import / load / first call)
and printed as one JSON line. Run on the target platform (TPU via the
default env, or JAX_PLATFORMS=cpu):

    python scripts/aot_startup_ab.py [--batch 64] [--method beam]
"""

import argparse
import json
import os
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CHILD = r"""
import json, os, sys, time
t0 = time.perf_counter()
mode = sys.argv[1]
bundle = sys.argv[2]
batch = int(sys.argv[3])
method = sys.argv[4]
sys.path.insert(0, {repo!r})
import numpy as np
if mode == "pipeline":
    from tpucap.pipeline import CaptioningPipeline
    t_import = time.perf_counter() - t0
    t1 = time.perf_counter()
    cap = CaptioningPipeline.load(bundle)
    t_load = time.perf_counter() - t1
    dim = cap.config.encoder.feature_dim
    feats = np.random.default_rng(0).normal(size=(batch, dim)).astype(np.float32)
    t2 = time.perf_counter()
    out = cap.generate(feats, method=method)
    t_first = time.perf_counter() - t2
else:
    from tpucap.checkpoint.aot import AotCaptioner
    t_import = time.perf_counter() - t0
    t1 = time.perf_counter()
    cap = AotCaptioner.load(bundle)
    t_load = time.perf_counter() - t1
    dim = cap.manifest["feature_shape"][0]
    feats = np.random.default_rng(0).normal(size=(batch, dim)).astype(np.float32)
    t2 = time.perf_counter()
    out = cap.caption(feats)
    t_first = time.perf_counter() - t2
assert len(out) == batch
print(json.dumps({{
    "mode": mode,
    "import_s": round(t_import, 3),
    "load_s": round(t_load, 3),
    "first_caption_s": round(t_first, 3),
    "total_s": round(time.perf_counter() - t0, 3),
}}))
"""


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--method", default="beam", choices=["greedy", "beam"])
    ap.add_argument("--vocab", type=int, default=7579)
    ap.add_argument("--runs", type=int, default=2,
                    help="cold subprocesses per arm (report each)")
    args = ap.parse_args()

    from tpucap.checkpoint import export_decode
    from tpucap.config import (
        Config,
        DecodeConfig,
        DecoderConfig,
        encoder_config,
    )
    from tpucap.pipeline import CaptioningPipeline
    from tpucap.text import Tokenizer

    root = tempfile.mkdtemp(prefix="tpucap_aot_ab_")
    bundle = os.path.join(root, "bundle")
    cfg = Config(
        encoder=encoder_config("resnet50"),
        decoder=DecoderConfig(name="lstm1"),
        decode=DecodeConfig(method=args.method, beam_width=3),
        vocab_size=args.vocab,
    )
    pipe = CaptioningPipeline(cfg)
    tok = Tokenizer()
    tok.fit_on_texts(
        ["startseq endseq " + " ".join(f"w{i}" for i in range(args.vocab - 3))]
    )
    pipe.tokenizer = tok
    pipe.build()
    print("exporting bundle...", file=sys.stderr)
    export_decode(pipe, bundle, batch_size=args.batch, method=args.method)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = CHILD.format(repo=repo)
    for run in range(args.runs):
        for mode in ("pipeline", "aot"):
            r = subprocess.run(
                [sys.executable, "-c", script, mode, bundle,
                 str(args.batch), args.method],
                capture_output=True, text=True, timeout=1200,
            )
            if r.returncode != 0:
                print(r.stderr[-2000:], file=sys.stderr)
                raise SystemExit(f"{mode} child failed")
            print(f"run{run} {r.stdout.strip()}")


if __name__ == "__main__":
    main()
