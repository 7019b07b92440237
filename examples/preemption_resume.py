"""Preemption-safe training: checkpoint, interrupt, resume — exactly.

The recipe every training surface shares (fit / fit_finetune /
fit_scst): an orbax CheckpointManager on a directory, mid-epoch
insurance saves every N steps, SIGTERM handled as a graceful rescue
(``handle_preemption=True``), and ``resume=True`` continuing the EXACT
trajectory — the resumed run's final params are bit-identical to an
uninterrupted one (the resume position comes from the checkpoint's step
counter; shuffle permutations are replayed).

This example simulates the interruption by training 2 of 5 epochs, then
"restarting the job" (a fresh pipeline, same config/seed) with
resume=True. In production the same two commands are literally the same
command rerun:

    tpucap train ... --handle-preemption --checkpoint-every-steps 50
    tpucap train ... --handle-preemption --checkpoint-every-steps 50 --resume

Runs on CPU in ~1 min:  python examples/preemption_resume.py
"""

import os
import sys
import tempfile

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

# Honor JAX_PLATFORMS even where a sitecustomize hook force-registers a
# TPU plugin (the env var alone is overridden there) — this example is
# CPU-friendly by design.
if os.environ.get("JAX_PLATFORMS"):
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import numpy as np

from tpucap.checkpoint import CheckpointManager
from tpucap.config import (
    Config,
    DecodeConfig,
    DecoderConfig,
    EncoderConfig,
    TrainConfig,
)
from tpucap.pipeline import CaptioningPipeline

CFG = Config(
    encoder=EncoderConfig(name="tiny_cnn", feature_dim=64),
    decoder=DecoderConfig(embed_dim=16, hidden_dim=32, dropout_rate=0.0),
    train=TrainConfig(
        batch_size=8,
        learning_rate=5e-3,
        seed=0,
        # Mid-epoch insurance: a hard kill loses < 2 steps of work.
        checkpoint_every_steps=2,
    ),
    decode=DecodeConfig(max_len=12),
)

WORDS = "red green blue dog cat bird runs sits flies".split()


def make_pipe():
    pipe = CaptioningPipeline(CFG)
    desc = {
        f"im{i}": [
            f"startseq a {WORDS[i % 3]} {WORDS[3 + i % 3]} "
            f"{WORDS[6 + i % 3]} endseq"
        ]
        for i in range(16)
    }
    pipe.fit_tokenizer(desc)
    pipe.build()
    rng = np.random.default_rng(1)
    feats = {k: rng.normal(size=(64,)).astype(np.float32) for k in desc}
    return pipe, desc, feats


ckpt_dir = tempfile.mkdtemp(prefix="tpucap_preempt_")

# --- run A: the reference trajectory, never interrupted ---------------
pipe_a, desc, feats = make_pipe()
pipe_a.fit(desc, feats, epochs=5, log=None)

# --- run B: "preempted" after 2 epochs --------------------------------
# handle_preemption=True would additionally latch a real SIGTERM,
# finish the in-flight step, and write a rescue checkpoint before
# returning (history's last entry then carries "preempted": True).
pipe_b, desc, feats = make_pipe()
mgr = CheckpointManager(ckpt_dir, best_metric=None)
pipe_b.fit(
    desc, feats, epochs=2, checkpoint_manager=mgr,
    handle_preemption=True, log=None,
)
print(f"interrupted at checkpoint step {mgr.latest_step()}")

# --- run B resumed: a fresh process picks up the exact position -------
pipe_c, desc, feats = make_pipe()
history = pipe_c.fit(
    desc, feats, epochs=5, checkpoint_manager=mgr,
    handle_preemption=True, resume=True,
    log=print,  # prints "resumed from step N (epoch E, batch B)"
)
mgr.close()
assert [h["epoch"] for h in history] == [2, 3, 4]

# --- the resumed trajectory is the uninterrupted one, bit for bit -----
import jax

for a, c in zip(
    jax.tree.leaves(pipe_a.params["decoder"]),
    jax.tree.leaves(pipe_c.params["decoder"]),
    strict=True,
):
    np.testing.assert_array_equal(np.asarray(a), np.asarray(c))
print("resumed params are BIT-IDENTICAL to the uninterrupted run")

# The same dials exist on fit_finetune (joint encoder+decoder) and
# fit_scst (CIDEr REINFORCE), including under parallelism='fsdp' with
# sharded_checkpoints=True for gather-free ZeRO saves.
