"""Fault injection (SURVEY.md §5.3): SIGKILL a training process mid-run,
resume from the last orbax checkpoint, and assert the loss trajectory is
identical to an uninterrupted run — the reference's restart-from-.h5 policy
done with real crash semantics."""

import json
import os
import signal
import subprocess
import sys
import time

import numpy as np

TRAINER = r"""
import json, os, sys
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
import optax

sys.path.insert(0, os.environ["TPUCAP_REPO"])
from tpucap.checkpoint import CheckpointManager
from tpucap.models.decoders import build_decoder
from tpucap.train import TrainState, make_train_step

VOCAB, FEAT = 17, 6
TOTAL_STEPS = 12

dec = build_decoder("lstm1", vocab_size=VOCAB, feature_dim=FEAT,
                    embed_dim=8, hidden_dim=8)
params = dec.init(jax.random.key(0))
optimizer = optax.adam(1e-2)
step = make_train_step(dec, optimizer, deterministic=True)

rng = np.random.default_rng(0)
feats = jnp.asarray(rng.normal(size=(4, FEAT)).astype(np.float32))
tokens = jnp.asarray(rng.integers(1, VOCAB, size=(4, 6)).astype(np.int32))

ckpt_dir = os.environ["TPUCAP_CKPT"]
log_path = os.environ["TPUCAP_LOG"]
mgr = CheckpointManager(ckpt_dir, best_metric=None, max_to_keep=2)

state = TrainState.create(params, optimizer, jax.random.key(1))
start = 0
if mgr.latest_step() is not None:
    state = mgr.restore(state)
    start = int(jax.device_get(state.step))

with open(log_path, "a") as log:
    for i in range(start, TOTAL_STEPS):
        state, metrics = step(state, feats, tokens)
        log.write(json.dumps({"step": i + 1,
                              "loss": float(metrics["loss"])}) + "\n")
        log.flush()
        mgr.save(state)
        if os.environ.get("TPUCAP_HANG_AFTER") and \
                i + 1 == int(os.environ["TPUCAP_HANG_AFTER"]):
            print("READY_TO_DIE", flush=True)
            import time as _t
            _t.sleep(300)  # wait to be SIGKILLed
mgr.close()
print("DONE", flush=True)
"""


def run_trainer(tmp_path, tag, hang_after=None, wait_kill=False):
    env = dict(
        os.environ,
        TPUCAP_REPO=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        TPUCAP_CKPT=str(tmp_path / f"ckpt_{tag}"),
        TPUCAP_LOG=str(tmp_path / f"log_{tag}.jsonl"),
    )
    env.pop("JAX_PLATFORMS", None)
    if hang_after:
        env["TPUCAP_HANG_AFTER"] = str(hang_after)
    proc = subprocess.Popen(
        [sys.executable, "-c", TRAINER],
        env=env,
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
        text=True,
    )
    if wait_kill:
        # Wait for the sentinel then SIGKILL — a real mid-run crash.
        # select() enforces the deadline even if the trainer hangs
        # without writing anything (a bare readline() would block past
        # the deadline forever).
        import select

        deadline = time.time() + 120
        while time.time() < deadline:
            ready, _, _ = select.select(
                [proc.stdout], [], [], max(0.0, deadline - time.time())
            )
            if not ready:
                break  # timed out with no output: kill anyway, fail below
            line = proc.stdout.readline()
            if not line or "READY_TO_DIE" in line:
                break
        os.kill(proc.pid, signal.SIGKILL)
        proc.wait(timeout=30)
        return None
    out, _ = proc.communicate(timeout=300)
    assert "DONE" in out
    return out


def read_losses(tmp_path, tag):
    path = tmp_path / f"log_{tag}.jsonl"
    return {
        r["step"]: r["loss"]
        for r in map(json.loads, path.read_text().splitlines())
    }


def test_crash_resume_loss_curve_continuity(tmp_path):
    # Uninterrupted run.
    run_trainer(tmp_path, "full")
    full = read_losses(tmp_path, "full")
    assert len(full) == 12

    # Crashed at step 5 (SIGKILL), then resumed to completion.
    run_trainer(tmp_path, "crash", hang_after=5, wait_kill=True)
    partial = read_losses(tmp_path, "crash")
    assert max(partial) == 5
    run_trainer(tmp_path, "crash")
    resumed = read_losses(tmp_path, "crash")
    assert len(resumed) == 12

    for step in range(1, 13):
        np.testing.assert_allclose(
            resumed[step], full[step], rtol=1e-6,
            err_msg=f"loss diverged at step {step} after crash-resume",
        )
