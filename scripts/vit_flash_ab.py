"""On-chip A/B: ViT attention via XLA sdpa vs the stock Pallas flash kernel.

Runs the full ViT-B/16 spatial forward in bf16 on the attached TPU,
checks numeric parity (flash is segment-masked over the 196->256 padded
token grid, so real rows must match sdpa), then times both at serving
batch sizes. Tunnel-safe: inputs are generated on-device and the only
host sync per timing step is a scalar device_get.

Usage:  python scripts/vit_flash_ab.py [--batches 64,256] [--iters 30]
"""

import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tpucap.models.encoders import build_encoder

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")


def sync_scalar(x):
    return float(jax.device_get(jnp.sum(x[..., 0, 0])))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="64,256")
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()
    batches = [int(b) for b in args.batches.split(",")]

    print(f"backend={jax.default_backend()} devices={jax.devices()}",
          flush=True)

    enc = build_encoder("vit_b16", features="spatial")
    enc_f = dataclasses.replace(enc, attention_impl="flash")
    params = enc.init(jax.random.key(0))
    p16 = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)

    apply_x = jax.jit(enc.apply)
    apply_f = jax.jit(enc_f.apply)

    # Parity at batch 2 (device-side input; full-array device_get is OK
    # once at this size: 2*14*14*768 floats).
    x2 = jax.random.normal(
        jax.random.key(1), (2, 224, 224, 3), dtype=jnp.bfloat16
    )
    ref = np.asarray(apply_x(p16, x2), dtype=np.float32)
    got = np.asarray(apply_f(p16, x2), dtype=np.float32)
    err = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
    print(f"parity: max rel err {err:.4f}", flush=True)
    assert err < 0.05, f"flash mismatch: {err}"

    print(f"{'batch':>6} {'xla ms':>9} {'flash ms':>9} {'speedup':>8}",
          flush=True)
    for b in batches:
        x = jax.random.normal(
            jax.random.key(2), (b, 224, 224, 3), dtype=jnp.bfloat16
        )
        row = []
        for name, fn in (("xla", apply_x), ("flash", apply_f)):
            sync_scalar(fn(p16, x))  # compile + warm
            sync_scalar(fn(p16, x))
            t0 = time.perf_counter()
            for _ in range(args.iters):
                out = fn(p16, x)
            sync_scalar(out)
            ms = (time.perf_counter() - t0) / args.iters * 1e3
            row.append(ms)
        print(f"{b:>6} {row[0]:>9.3f} {row[1]:>9.3f} "
              f"{row[0] / row[1]:>7.2f}x", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
