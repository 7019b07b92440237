"""Measure int8 vs bf16 conv/matmul throughput at InceptionV3-like shapes
on the attached TPU — the go/no-go experiment for an int8-quantized
encoder serving path (docs/PERF.md round-2 encoder workstream).

v5e MXU peak is ~394 TOPS int8 vs ~197 TFLOP/s bf16; if XLA lowers
int8 convs (int8 inputs, preferred_element_type=int32) onto the int8
MXU path, encoder-bound serving gains up to 2x. This probe times a
representative set of inception layers both ways.

Usage: python scripts/int8_probe.py [--batch 256] [--iters 5] [--inner 8]
"""

import argparse
import sys
import time
from functools import partial

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--inner", type=int, default=8)
    ap.add_argument(
        "--cases",
        default=None,
        help="comma-separated substring filter over case names (run a "
        "subset — each case costs two uncached remote compiles)",
    )
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    print(f"devices: {jax.devices()}", file=sys.stderr)
    B = args.batch

    # Representative InceptionV3 conv shapes (NHWC, HWIO), heavy by FLOPs:
    #   (input H W C, kernel h w, out C)
    cases = [
        ("stem3x3_64", (B, 147, 147, 64), (3, 3, 64, 80)),
        ("mixed_5x5", (B, 35, 35, 48), (5, 5, 48, 64)),
        ("grid3x3_288", (B, 35, 35, 288), (3, 3, 288, 384)),
        ("mid1x1_768", (B, 17, 17, 768), (1, 1, 768, 192)),
        ("fact7x1_160", (B, 17, 17, 160), (7, 1, 160, 160)),
        ("tail3x3_448", (B, 8, 8, 448), (3, 3, 448, 384)),
        ("fc_2048x1k", (B, 1, 1, 2048), (1, 1, 2048, 1000)),
    ]

    @partial(jax.jit, static_argnames=("ptype",))
    def conv(x, k, ptype):
        return lax.conv_general_dilated(
            x,
            k,
            window_strides=(1, 1),
            padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=ptype,
        )

    @jax.jit
    def first_elem(out):
        # Sync via ONE scalar: np.asarray(out) would device_get the
        # whole ~0.9 GB activation over the tunnel per sync.
        return out.ravel()[0]

    def timeit(fn, *a):
        out = fn(*a)
        np.asarray(first_elem(out))  # sync (block_until_ready is a no-op)
        ts = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            for _ in range(args.inner - 1):
                fn(*a)
            out = fn(*a)
            np.asarray(first_elem(out))
            ts.append((time.perf_counter() - t0) / args.inner)
        return float(np.median(ts))

    if args.cases:
        wanted = [w.strip() for w in args.cases.split(",") if w.strip()]
        cases = [c for c in cases if any(w in c[0] for w in wanted)]
    # flush per row: over the tunnel one case can take tens of minutes,
    # and a timeout-killed buffered run would lose every completed row.
    print(
        f"{'case':>14} {'bf16 ms':>9} {'int8 ms':>9} {'speedup':>8}",
        flush=True,
    )
    total_bf16 = total_int8 = 0.0
    # Inputs are generated ON DEVICE: materializing these on the host
    # and device_put-ing them would ship ~0.7 GB per case over the axon
    # tunnel (~2 MB/s host->device) — the actual reason earlier full
    # runs never produced a row, not the compiles.
    key = jax.random.key(0)
    for name, xs, ks in cases:
        k1, k2, k3, k4, key = jax.random.split(key, 5)
        xf = jax.random.normal(k1, xs, jnp.bfloat16)
        kf = jax.random.normal(k2, ks, jnp.bfloat16) * 0.05
        xi = jax.random.randint(k3, xs, -127, 128).astype(jnp.int8)
        ki = jax.random.randint(k4, ks, -127, 128).astype(jnp.int8)
        t_bf = timeit(conv, xf, kf, jnp.bfloat16)
        t_i8 = timeit(conv, xi, ki, jnp.int32)
        total_bf16 += t_bf
        total_int8 += t_i8
        print(
            f"{name:>14} {t_bf * 1e3:9.3f} {t_i8 * 1e3:9.3f} "
            f"{t_bf / t_i8:8.2f}x",
            flush=True,
        )
    print(
        f"{'TOTAL':>14} {total_bf16 * 1e3:9.3f} {total_int8 * 1e3:9.3f} "
        f"{total_bf16 / total_int8:8.2f}x"
    )


if __name__ == "__main__":
    main()
