"""Multi-host (DCN) launch walkthrough — the same mesh code, N processes.

On a real multi-host TPU slice you run ONE copy of your training script
per host; each copy calls ``initialize_distributed()`` first and then
uses the exact same tpucap mesh/shard_map code as single-host — JAX's
runtime stitches the per-host devices into one global mesh, and the
psum/all_gather collectives ride ICI/DCN (SURVEY.md §2.5 seam;
tests/test_multiprocess_dcn.py asserts cross-process equality with the
single-process run).

This example demonstrates the full launch shape WITHOUT a slice: run it
with no arguments and it spawns TWO worker copies of itself (4 virtual
CPU devices each) against a local coordinator, i.e. exactly the command
a real launcher (GKE/xmanager/mpirun) would run per host:

    python examples/multihost_launch.py                      # launcher
    python examples/multihost_launch.py worker <coord> <pid> # per host

On a TPU pod slice you would skip the launcher: just run the worker
body on every host with the coordinator address of host 0 (or no args
at all — ``initialize_distributed()`` self-configures from TPU
metadata when launched by a pod-aware runner).
"""

from __future__ import annotations

import os
import subprocess
import sys

N_PROCESSES = 2
DEVICES_PER_PROCESS = 4


def worker(coordinator: str, process_id: int) -> None:
    # Runnable from anywhere: the repo root is this file's parent dir.
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    import jax

    # A sitecustomize hook may pin a TPU backend; this demo runs on CPU.
    jax.config.update("jax_platforms", "cpu")

    import numpy as np
    import optax

    from tpucap.core import make_mesh, replicate_tree, shard_batch
    from tpucap.models.decoders import build_decoder
    from tpucap.parallel import (
        initialize_distributed,
        process_info,
        shard_for_host,
    )
    from tpucap.parallel import make_dp_train_step
    from tpucap.train import TrainState

    # 1. Rendezvous. Must happen before any other JAX device use.
    initialize_distributed(
        coordinator_address=coordinator,
        num_processes=N_PROCESSES,
        process_id=process_id,
    )
    pid, nproc = process_info()
    print(
        f"[host {pid}] joined: {nproc} processes, "
        f"{jax.local_device_count()} local / {jax.device_count()} global "
        f"devices"
    )

    # 2. The SAME mesh + train-step code as single host.
    mesh = make_mesh(jax.device_count())
    dec = build_decoder(
        "lstm1", vocab_size=64, feature_dim=16, embed_dim=16, hidden_dim=32
    )
    params = jax.device_get(dec.init(jax.random.key(0)))
    opt = optax.adam(1e-2)
    state = replicate_tree(
        mesh, TrainState.create(params, opt, jax.random.key(1))
    )
    step = make_dp_train_step(dec, opt, mesh, deterministic=True)

    # 3. Per-host data: every host loads its own slice of the WORK LIST
    # (paths, ids — shard_for_host), but device batches are logically
    # global: every host materializes the same full batch and
    # shard_batch places only its addressable shards.
    all_ids = [f"img{i:03d}" for i in range(32)]
    mine = shard_for_host(all_ids)
    print(f"[host {pid}] my work slice: {mine[0]}..{mine[-1]}")

    rng = np.random.default_rng(0)  # same seed -> same global batch
    feats = rng.normal(size=(32, 16)).astype(np.float32)
    tokens = rng.integers(1, 64, size=(32, 8)).astype(np.int32)
    fs, ts = shard_batch(mesh, (feats, tokens))

    # 4. One step: the gradient psum crosses the process boundary.
    for i in range(3):
        state, metrics = step(state, fs, ts)
        loss = float(np.asarray(jax.device_get(metrics["loss"])))
        print(f"[host {pid}] step {i}: loss={loss:.4f}")


def launcher() -> None:
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    # Direct module import: multihost.py has no jax at module level,
    # so the launcher process never initializes a backend.
    from tpucap.parallel.multihost import (
        free_coordinator_address,
        local_worker_env,
    )

    coord = free_coordinator_address()
    env = local_worker_env(DEVICES_PER_PROCESS)
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "worker", coord, str(i)],
            env=env,
        )
        for i in range(N_PROCESSES)
    ]
    try:
        codes = [p.wait(timeout=600) for p in procs]
    finally:
        for p in procs:  # a dead worker must not leak its sibling
            if p.poll() is None:
                p.kill()
    if any(codes):
        raise SystemExit(f"worker exit codes: {codes}")
    print(
        "multi-host demo: all workers finished (identical per-step "
        "losses printed above; equality is asserted in "
        "tests/test_multiprocess_dcn.py)"
    )


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "worker":
        worker(sys.argv[2], int(sys.argv[3]))
    else:
        launcher()
