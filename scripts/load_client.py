"""Remote load generator for a running `tpucap serve` endpoint.

`bench.py --mode serve` load-tests an IN-PROCESS server (it builds the
pipeline itself — the apples-to-apples device measurement). This script
is the ops-side companion: it points the stdlib client SDK
(tpucap.client) at any HOST:PORT already serving — across the network,
in another container, on another machine — and reports end-to-end
request latency and throughput as the CLIENT sees them, network
included. Use it to validate a deployment, size client concurrency, or
watch p99 while tuning server flags; use bench --mode serve to measure
the serving stack itself.

Usage:
  python scripts/load_client.py HOST:PORT --clients 8 --requests 256 \
      [--feature-dim 4096 | --jpeg PATH] [--model NAME] [--warmup 4]

Prints one JSON line: {"captions_per_sec", "p50_ms", "p99_ms",
"errors", ...}. Requires only the Python stdlib (the SDK imports no ML
stack) — copy this file plus tpucap/client.py anywhere.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from tpucap.client import CaptionClient, ServerError  # noqa: E402


def main(argv=None):
    ap = argparse.ArgumentParser(
        description="closed-loop load generator against tpucap serve"
    )
    ap.add_argument("server", metavar="HOST:PORT")
    ap.add_argument("--clients", type=int, default=8,
                    help="concurrent closed-loop clients (each sends "
                    "its next request when the previous resolves)")
    ap.add_argument("--requests", type=int, default=128,
                    help="total requests (split across clients)")
    ap.add_argument("--feature-dim", type=int, default=None,
                    help="load /caption_features with random rows of "
                    "this dimension (default: probe /healthz then "
                    "require --feature-dim or --jpeg)")
    ap.add_argument("--spatial", type=int, default=0, metavar="L",
                    help="with --feature-dim: send (L, dim) spatial "
                    "grids instead of pooled rows")
    ap.add_argument("--jpeg", default=None,
                    help="load /caption with these JPEG bytes instead "
                    "of feature rows")
    ap.add_argument("--model", default="",
                    help="named model on a multi-model server")
    ap.add_argument("--warmup", type=int, default=4,
                    help="untimed warmup requests (compile + caches)")
    ap.add_argument("--timeout", type=float, default=300.0)
    ap.add_argument(
        "--max-error-rate", type=float, default=0.0, metavar="FRAC",
        help="exit nonzero when errors/requests exceeds this fraction "
        "(default 0.0: any error fails the run — scripted deployment "
        "checks must not pass on a partially failing endpoint)")
    args = ap.parse_args(argv)

    host, _, port = args.server.rpartition(":")
    if not port.isdigit():
        ap.error(f"server wants HOST:PORT, got {args.server!r}")
    if args.requests < args.clients:
        ap.error(
            f"--requests ({args.requests}) must be >= --clients "
            f"({args.clients})"
        )
    if bool(args.feature_dim) == bool(args.jpeg):
        ap.error("give exactly one of --feature-dim or --jpeg")

    client = CaptionClient(
        host or "127.0.0.1", int(port),
        model=args.model, timeout=args.timeout,
    )
    hz = client.healthz()
    print(f"# target {args.server} backend={hz.get('backend')}",
          file=sys.stderr)

    if args.jpeg:
        with open(args.jpeg, "rb") as f:
            blob = f.read()

        def one_request(i):
            return client.caption(blob)
    else:
        # Deterministic pseudo-random rows WITHOUT numpy (stdlib-only
        # by design): per-client payloads differ so the server can't
        # dedupe, values in a normalize-friendly range.
        import random

        rows = []
        for i in range(args.clients):
            r = random.Random(i)
            vec = [r.uniform(-1.0, 1.0) for _ in range(args.feature_dim)]
            rows.append(
                [vec] * args.spatial if args.spatial else vec
            )

        def one_request(i):
            return client.caption_features(rows[i])

    for i in range(min(args.warmup, args.clients)):
        one_request(i)

    # Spread the remainder over the first (requests % clients) threads
    # so exactly --requests requests are sent, not a rounded-down count.
    base, extra = divmod(args.requests, args.clients)
    counts = [
        base + (1 if i < extra else 0) for i in range(args.clients)
    ]
    latencies_ms: list[float] = []
    errors: list[str] = []
    lock = threading.Lock()

    def run_client(i):
        for _ in range(counts[i]):
            t0 = time.perf_counter()
            try:
                one_request(i)
            except (ServerError, OSError) as e:
                with lock:
                    errors.append(str(e))
                continue
            dt = (time.perf_counter() - t0) * 1000.0
            with lock:
                latencies_ms.append(dt)

    threads = [
        threading.Thread(target=run_client, args=(i,))
        for i in range(args.clients)
    ]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0

    done = len(latencies_ms)
    latencies_ms.sort()

    def pct(p):
        return (
            round(latencies_ms[min(done - 1, int(done * p))], 2)
            if done
            else None
        )

    out = {
        "captions_per_sec": round(done / wall, 2) if wall else 0.0,
        "requests": done,
        "errors": len(errors),
        "clients": args.clients,
        "wall_s": round(wall, 3),
        "p50_ms": pct(0.50),
        "p99_ms": pct(0.99),
        "mean_ms": round(sum(latencies_ms) / done, 2) if done else None,
    }
    if errors:
        out["first_error"] = errors[0]
    print(json.dumps(out))
    # Nonzero exit when the error rate exceeds the tolerance (default:
    # ANY error) — a deployment check must not pass on a partially
    # failing endpoint (ADVICE r3).
    total = done + len(errors)
    rate = len(errors) / total if total else 1.0
    return 1 if rate > args.max_error_rate else 0


if __name__ == "__main__":
    raise SystemExit(main())
