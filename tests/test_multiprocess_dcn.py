"""The DCN seam, executed for real: two OS processes, one global mesh.

VERDICT r2 #2: `parallel/multihost.py` declared the multi-host story
(SURVEY.md §2.5 — "jax.distributed.initialize + same mesh code scales")
but no test had ever run a psum across a process boundary. This test
does: two subprocesses each with 4 virtual CPU devices call
``initialize_distributed`` against a shared coordinator, build the SAME
global 8-device mesh through ``core.make_mesh`` (jax.devices() is
global after init), and run the UNCHANGED shard_map programs —
``make_dp_train_step`` (gradient psum crosses the process boundary:
lanes 0-3 live on process 0, lanes 4-7 on process 1) and
``make_dp_decode_fn(gather_results=True)`` (cross-process all_gather).
Losses and tokens are asserted equal to the single-process 8-device run
in the parent, so the "same mesh code scales" claim is now executed,
not declared. CPU cross-process collectives ride gloo (JAX's default
``jax_cpu_collectives_implementation``), standing in for DCN.
"""

import json
import os
import subprocess
import sys

import jax
import numpy as np
import optax
import pytest

from tpucap.core import make_mesh, shard_batch
from tpucap.decode import greedy_decode
from tpucap.models.decoders import build_decoder
from tpucap.parallel import (
    free_coordinator_address,
    local_worker_env,
    make_dp_decode_fn,
    make_dp_train_step,
)
from tpucap.train import TrainState

# Model/workload constants — the worker re-derives identical values from
# the same seeds, so parent and workers compare like against like.
VOCAB, FEAT, EMB, HID = 21, 9, 8, 16
B, START, END, MAXLEN = 16, 1, 2, 10

WORKER = r"""
import json, os, sys
import jax
# A sitecustomize hook may pin a TPU backend regardless of JAX_PLATFORMS.
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, os.environ["TPUCAP_REPO"])
import numpy as np
import optax

from tpucap.parallel import initialize_distributed, process_info

coord, pid = sys.argv[1], int(sys.argv[2])
assert initialize_distributed(
    coordinator_address=coord, num_processes=2, process_id=pid
) is True, "distributed init should run, not no-op"
assert process_info() == (pid, 2)
assert jax.local_device_count() == 4, jax.local_device_count()
assert jax.device_count() == 8, jax.device_count()

from tpucap.core import make_mesh, replicate_tree, shard_batch
from tpucap.decode import greedy_decode
from tpucap.models.decoders import build_decoder
from tpucap.parallel import make_dp_decode_fn, make_dp_train_step
from tpucap.train import TrainState

VOCAB, FEAT, EMB, HID = 21, 9, 8, 16
B, START, END, MAXLEN = 16, 1, 2, 10

dec = build_decoder(
    "lstm1", vocab_size=VOCAB, feature_dim=FEAT, embed_dim=EMB, hidden_dim=HID
)
params = jax.device_get(dec.init(jax.random.key(0)))
rng = np.random.default_rng(0)
feats = rng.normal(size=(B, FEAT)).astype(np.float32)
tokens = rng.integers(1, VOCAB, size=(B, 8)).astype(np.int32)
tokens[:, 0] = START
tokens[:, -2:] = 0

mesh = make_mesh(8)  # global: 4 devices from each process
optimizer = optax.sgd(0.5)
state = replicate_tree(
    mesh, TrainState.create(params, optimizer, jax.random.key(1))
)
dp = make_dp_train_step(dec, optimizer, mesh, deterministic=True)
fs, ts = shard_batch(mesh, (feats, tokens))
state, metrics = dp(state, fs, ts)  # gradient psum crosses processes
loss = float(np.asarray(jax.device_get(metrics["loss"])))
p0 = np.asarray(
    jax.device_get(jax.tree_util.tree_leaves(state.params)[0])
)

dp_fn = make_dp_decode_fn(
    dec,
    greedy_decode,
    mesh,
    gather_results=True,  # cross-process all_gather
    start_id=START,
    end_id=END,
    max_len=MAXLEN,
)
out = dp_fn(replicate_tree(mesh, params), shard_batch(mesh, feats))
toks = np.asarray(jax.device_get(out.tokens))

print("RESULT " + json.dumps({
    "pid": pid,
    "loss": loss,
    "param0_sum": float(p0.sum()),
    "tokens": toks.tolist(),
}))
"""


@pytest.mark.slow
def test_two_process_mesh_matches_single_process(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = tmp_path / "dcn_worker.py"
    worker.write_text(WORKER)

    # 4 virtual devices per process; env-preparation rules centralized
    # in parallel.multihost (strip parent device-count flag, scrub
    # ambient distributed vars).
    env = local_worker_env(4)
    env["TPUCAP_REPO"] = repo

    coord = free_coordinator_address()
    # Worker output goes to FILES, not PIPEs: a worker blocked in a
    # cross-process collective must not also be blocked writing a full
    # pipe the parent isn't reading yet (and vice versa).
    logs = [open(tmp_path / f"worker{i}.log", "w+") for i in range(2)]
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), coord, str(i)],
            env=env,
            cwd=repo,
            stdout=logs[i],
            stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(2)
    ]
    results = {}
    try:
        for p in procs:
            p.wait(timeout=600)
    finally:
        # One worker dying (or the wait timing out) must not leak its
        # sibling parked in the gloo rendezvous.
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, p in enumerate(procs):
        logs[i].seek(0)
        out = logs[i].read()
        logs[i].close()
        assert p.returncode == 0, f"worker {i} failed:\n{out}"
        line = [l for l in out.splitlines() if l.startswith("RESULT ")][-1]
        r = json.loads(line[len("RESULT "):])
        results[r["pid"]] = r
    assert set(results) == {0, 1}

    # Single-process 8-device reference (the conftest virtual mesh).
    dec = build_decoder(
        "lstm1",
        vocab_size=VOCAB,
        feature_dim=FEAT,
        embed_dim=EMB,
        hidden_dim=HID,
    )
    params = dec.init(jax.random.key(0))
    rng = np.random.default_rng(0)
    feats = rng.normal(size=(B, FEAT)).astype(np.float32)
    tokens = rng.integers(1, VOCAB, size=(B, 8)).astype(np.int32)
    tokens[:, 0] = START
    tokens[:, -2:] = 0

    mesh = make_mesh(8)
    optimizer = optax.sgd(0.5)
    state = TrainState.create(params, optimizer, jax.random.key(1))
    dp = make_dp_train_step(dec, optimizer, mesh, deterministic=True)
    fs, ts = shard_batch(mesh, (feats, tokens))
    state, metrics = dp(state, fs, ts)
    ref_loss = float(metrics["loss"])
    ref_p0 = np.asarray(jax.tree_util.tree_leaves(state.params)[0])

    dp_fn = make_dp_decode_fn(
        dec,
        greedy_decode,
        mesh,
        gather_results=True,
        start_id=START,
        end_id=END,
        max_len=MAXLEN,
    )
    ref_tokens = np.asarray(dp_fn(params, shard_batch(mesh, feats)).tokens)

    for pid in (0, 1):
        r = results[pid]
        # Both processes computed the identical replicated result, and it
        # matches the single-process mesh bit-for-bit-ish (f32 psum
        # reduction order is fixed by the mesh layout).
        np.testing.assert_allclose(r["loss"], ref_loss, rtol=1e-6)
        np.testing.assert_allclose(
            r["param0_sum"], float(ref_p0.sum()), rtol=1e-5
        )
        np.testing.assert_array_equal(np.asarray(r["tokens"]), ref_tokens)
