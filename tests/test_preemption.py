"""Graceful preemption + exact resume (train/preemption.py, fit(resume=)).

The trajectory contract: interrupted-then-resumed training produces
BIT-IDENTICAL params to an uninterrupted run — the resume position is
derived from the checkpoint's step counter and the shuffle rng is
fast-forwarded by replaying consumed permutations.
"""

import os
import signal
import subprocess
import sys
import time

import jax
import numpy as np
import pytest

from tpucap.checkpoint import CheckpointManager
from tpucap.config import (
    Config,
    DecodeConfig,
    DecoderConfig,
    EncoderConfig,
    TrainConfig,
)
from tpucap.pipeline import CaptioningPipeline


def _pipe(**train_overrides):
    cfg = Config(
        encoder=EncoderConfig(name="tiny_cnn", feature_dim=32),
        decoder=DecoderConfig(
            embed_dim=16, hidden_dim=16, dropout_rate=0.0
        ),
        train=TrainConfig(
            epochs=1, batch_size=4, seed=0, learning_rate=1e-2,
            **train_overrides,
        ),
        decode=DecodeConfig(max_len=8),
    )
    pipe = CaptioningPipeline(cfg)
    words = "a b c d e f g h".split()
    desc = {
        f"im{i}": [f"startseq {words[i]} {words[(i+3) % 8]} endseq"] * 2
        for i in range(8)
    }
    pipe.fit_tokenizer(desc)
    pipe.build()
    rng = np.random.default_rng(1)
    feats = {
        k: rng.normal(size=(32,)).astype(np.float32) for k in desc
    }
    return pipe, desc, feats


def _params(pipe):
    return jax.device_get(pipe.params["decoder"])


def _assert_trees_equal(a, b):
    for x, y in zip(
        jax.tree.leaves(a), jax.tree.leaves(b), strict=True
    ):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_epoch_boundary_resume_is_exact(tmp_path):
    # Uninterrupted: 4 epochs.
    pipe_a, desc, feats = _pipe()
    mgr_a = CheckpointManager(str(tmp_path / "a"), best_metric=None)
    hist_a = pipe_a.fit(
        desc, feats, epochs=4, batch_size=4,
        checkpoint_manager=mgr_a, log=None,
    )
    mgr_a.close()

    # Interrupted at the epoch-2 boundary, resumed for the rest.
    pipe_b, desc, feats = _pipe()
    mgr_b = CheckpointManager(str(tmp_path / "b"), best_metric=None)
    pipe_b.fit(
        desc, feats, epochs=2, batch_size=4,
        checkpoint_manager=mgr_b, log=None,
    )
    pipe_c, desc, feats = _pipe()
    hist_c = pipe_c.fit(
        desc, feats, epochs=4, batch_size=4,
        checkpoint_manager=mgr_b, resume=True, log=None,
    )
    mgr_b.close()
    _assert_trees_equal(_params(pipe_a), _params(pipe_c))
    # Resumed history covers exactly the remaining epochs, same losses.
    assert [h["epoch"] for h in hist_c] == [2, 3]
    np.testing.assert_allclose(
        [h["loss"] for h in hist_a[2:]],
        [h["loss"] for h in hist_c],
        rtol=1e-6,
    )


class _FakeGuard:
    """Duck-typed guard that fires after N queries of .fired —
    deterministic mid-epoch preemption without signals."""

    def __init__(self, after: int):
        self.after = after
        self.calls = 0

    @property
    def fired(self) -> bool:
        self.calls += 1
        return self.calls >= self.after

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return None


def test_mid_epoch_preemption_resume_is_exact(tmp_path):
    # 8 rows / batch 4 = 2 steps per epoch; fire after 3 steps ->
    # mid-epoch-1 rescue checkpoint at step 3.
    pipe_a, desc, feats = _pipe()
    hist_a = pipe_a.fit(desc, feats, epochs=3, batch_size=4, log=None)

    pipe_b, desc, feats = _pipe()
    mgr = CheckpointManager(str(tmp_path / "c"), best_metric=None)
    hist_b = pipe_b.fit(
        desc, feats, epochs=3, batch_size=4,
        checkpoint_manager=mgr,
        preemption_guard=_FakeGuard(3),
        log=None,
    )
    assert hist_b[-1]["preempted"] is True
    assert mgr.latest_step() == 3  # mid-epoch rescue save

    pipe_c, desc, feats = _pipe()
    hist_c = pipe_c.fit(
        desc, feats, epochs=3, batch_size=4,
        checkpoint_manager=mgr, resume=True, log=None,
    )
    mgr.close()
    _assert_trees_equal(_params(pipe_a), _params(pipe_c))
    # The resumed partial epoch averages only its remaining step; the
    # final epoch's loss matches the uninterrupted run exactly.
    np.testing.assert_allclose(
        hist_c[-1]["loss"], hist_a[-1]["loss"], rtol=1e-6
    )


def test_rescue_survives_best_metric_retention(tmp_path):
    """Review-found bug: with best-metric retention active
    (best_metric='val_loss', max_to_keep=N — the CLI defaults), a
    rescue checkpoint saved with a never-best sentinel METRIC was
    classified worst-of-N by orbax's best-fn policy and deleted inside
    its own save call once N better checkpoints existed — preemption
    and step-interval checkpointing silently stopped working after N
    epochs. Rescues are now METRIC-LESS (exempt from best-N eviction)."""
    pipe_a, desc, feats = _pipe()
    pipe_a.fit(desc, feats, epochs=5, batch_size=4, log=None)

    # 16 rows / batch 4 = 4 steps/epoch; fire after step 19 ->
    # mid-epoch-4 rescue, with 4 finite-metric epoch saves (4,8,12,16)
    # already competing under max_to_keep=2.
    pipe_b, desc, feats = _pipe()
    mgr = CheckpointManager(
        str(tmp_path / "r"), best_metric="val_loss", max_to_keep=2
    )
    hist_b = pipe_b.fit(
        desc, feats, epochs=5, batch_size=4,
        checkpoint_manager=mgr,
        preemption_guard=_FakeGuard(19),
        log=None,
    )
    assert hist_b[-1]["preempted"] is True
    assert mgr.latest_step() == 19  # the rescue was NOT evicted

    pipe_c, desc, feats = _pipe()
    pipe_c.fit(
        desc, feats, epochs=5, batch_size=4,
        checkpoint_manager=mgr, resume=True, log=None,
    )
    mgr.close()
    _assert_trees_equal(_params(pipe_a), _params(pipe_c))


def test_fsdp_rescue_saves_canonical_layout(tmp_path):
    """Review-found gap: the preemption rescue saved the RAW
    fsdp-sharded state (the epoch-boundary path gathers first). The
    rescue must carry the canonical layout so it restores through the
    standard template like any other checkpoint."""
    pipe, desc, feats = _pipe()
    mgr = CheckpointManager(str(tmp_path / "f"), best_metric=None)
    hist = pipe.fit(
        desc, feats, epochs=2, batch_size=8,
        parallelism="fsdp",
        checkpoint_manager=mgr,
        preemption_guard=_FakeGuard(1),
        log=None,
    )
    assert hist[-1]["preempted"] is True
    step = mgr.latest_step()
    assert step is not None
    # Restores into the canonical (un-sharded) template and matches the
    # pipeline's post-fit canonical params exactly.
    from tpucap.train import TrainState, build_optimizer

    opt = build_optimizer(pipe.config.train)
    template = TrainState.create(
        pipe.params["decoder"], opt, jax.random.key(0)
    )
    restored = mgr.restore(template, step=step)
    mgr.close()
    _assert_trees_equal(
        jax.device_get(restored.params), _params(pipe)
    )


def test_rescue_cleanup_keeps_one(tmp_path):
    """Metric-less rescues are exempt from best-N eviction, so
    save_rescue bounds them itself: a new rescue deletes older
    metric-less steps; metric-carrying (epoch-boundary) steps are never
    touched by the sweep."""
    import jax.numpy as jnp

    from tpucap.train import TrainState

    def st(s):
        return TrainState(
            step=jnp.asarray(s, jnp.int32),
            params={"w": jnp.ones(2)},
            opt_state={"m": jnp.zeros(2)},
            rng=jax.random.key(0),
        )

    mgr = CheckpointManager(
        str(tmp_path / "k"), best_metric="val_loss", max_to_keep=2
    )
    mgr.save(st(2), metrics={"val_loss": 0.5})
    mgr.save(st(4), metrics={"val_loss": 0.4})
    mgr.save_rescue(st(5))
    assert mgr.all_steps() == [2, 4, 5]
    mgr.save_rescue(st(7))  # older rescue (5) swept, boundaries kept
    assert mgr.all_steps() == [2, 4, 7]
    mgr.save(st(8), metrics={"val_loss": 0.3})  # best-N evicts step 2
    assert mgr.all_steps() == [4, 7, 8]
    # Same-step dedup: rescue at an existing latest step is a no-op.
    mgr.save_rescue(st(8))
    assert mgr.all_steps() == [4, 7, 8]
    mgr.close()


def test_resume_validations(tmp_path):
    pipe, desc, feats = _pipe()
    with pytest.raises(ValueError, match="checkpoint_manager"):
        pipe.fit(desc, feats, epochs=1, resume=True, log=None)
    mgr = CheckpointManager(str(tmp_path / "v"), best_metric=None)
    with pytest.raises(NotImplementedError, match="canonical"):
        pipe.fit(
            desc, feats, epochs=1, resume=True, parallelism="tp",
            checkpoint_manager=mgr, log=None,
        )
    mgr.close()


def test_resume_with_empty_dir_starts_fresh(tmp_path):
    pipe, desc, feats = _pipe()
    mgr = CheckpointManager(str(tmp_path / "e"), best_metric=None)
    hist = pipe.fit(
        desc, feats, epochs=2, batch_size=4,
        checkpoint_manager=mgr, resume=True, log=None,
    )
    mgr.close()
    assert [h["epoch"] for h in hist] == [0, 1]


def test_guard_sigterm_sets_flag():
    from tpucap.train import PreemptionGuard

    with PreemptionGuard() as g:
        assert not g.fired
        os.kill(os.getpid(), signal.SIGTERM)
        # Give the interpreter a tick to run the handler.
        for _ in range(100):
            if g.fired:
                break
            time.sleep(0.01)
        assert g.fired
    # Handler restored: a second guard starts clean.
    with PreemptionGuard() as g2:
        assert not g2.fired


def test_step_interval_checkpoint_schedule(tmp_path):
    # 16 training rows (8 images x 2 captions) / batch 4 = 4
    # steps/epoch, 2 epochs, every 3 steps: interval saves land
    # mid-epoch at steps 3 and 6; epoch-boundary saves at 4 and 8 (the
    # epoch's LAST step is never double-saved by the interval path).
    pipe, desc, feats = _pipe(checkpoint_every_steps=3)
    mgr = CheckpointManager(
        str(tmp_path / "s"), best_metric=None, max_to_keep=20
    )
    pipe.fit(
        desc, feats, epochs=2, batch_size=4,
        checkpoint_manager=mgr, log=None,
    )
    assert mgr.all_steps() == [3, 4, 6, 8]
    mgr.close()


def test_step_checkpoint_rescue_dedup_and_resume(tmp_path):
    """A preemption landing exactly on an interval-save step must not
    double-save, and resume from the interval checkpoint is exact."""
    pipe_a, desc, feats = _pipe()
    pipe_a.fit(desc, feats, epochs=2, batch_size=2, log=None)

    pipe_b, desc, feats = _pipe(checkpoint_every_steps=3)
    mgr = CheckpointManager(
        str(tmp_path / "d"), best_metric=None, max_to_keep=20
    )
    hist_b = pipe_b.fit(
        desc, feats, epochs=2, batch_size=2,
        checkpoint_manager=mgr,
        preemption_guard=_FakeGuard(3),
        log=None,
    )
    assert hist_b[-1]["preempted"] is True
    # Step 3 was just written by the interval path; the rescue save
    # must no-op instead of attempting a duplicate step.
    assert mgr.all_steps() == [3]

    pipe_c, desc, feats = _pipe()
    pipe_c.fit(
        desc, feats, epochs=2, batch_size=2,
        checkpoint_manager=mgr, resume=True, log=None,
    )
    mgr.close()
    _assert_trees_equal(_params(pipe_a), _params(pipe_c))


def test_step_checkpoint_validations(tmp_path):
    pipe, desc, feats = _pipe(checkpoint_every_steps=2)
    mgr = CheckpointManager(str(tmp_path / "vv"), best_metric=None)
    with pytest.raises(
        NotImplementedError, match="checkpoint_every_steps"
    ):
        pipe.fit(
            desc, feats, epochs=1, parallelism="tp",
            checkpoint_manager=mgr, log=None,
        )
    mgr.close()


TRAINER = r"""
import os, sys
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
sys.path.insert(0, os.environ["TPUCAP_REPO"])
from tpucap.checkpoint import CheckpointManager
from tpucap.config import (Config, DecodeConfig, DecoderConfig,
                           EncoderConfig, TrainConfig)
from tpucap.pipeline import CaptioningPipeline

cfg = Config(
    encoder=EncoderConfig(name="tiny_cnn", feature_dim=32),
    decoder=DecoderConfig(embed_dim=16, hidden_dim=16, dropout_rate=0.0),
    train=TrainConfig(epochs=1, batch_size=4, seed=0, learning_rate=1e-2),
    decode=DecodeConfig(max_len=8),
)
pipe = CaptioningPipeline(cfg)
words = "a b c d e f g h".split()
desc = {f"im{i}": [f"startseq {words[i]} {words[(i+3) % 8]} endseq"] * 2
        for i in range(8)}
pipe.fit_tokenizer(desc)
pipe.build()
rng = np.random.default_rng(1)
feats = {k: rng.normal(size=(32,)).astype(np.float32) for k in desc}

mgr = CheckpointManager(os.environ["TPUCAP_CKPT"], best_metric=None)

def slow_log(msg):
    # Stretch each epoch so the parent can land a SIGTERM mid-run.
    print(msg, flush=True)
    import time
    time.sleep(0.4)

resume = bool(os.environ.get("TPUCAP_RESUME"))
hist = pipe.fit(
    desc, feats, epochs=40,
    batch_size=int(os.environ.get("TPUCAP_BS", "4")),
    parallelism=os.environ.get("TPUCAP_PAR", "none"),
    checkpoint_manager=mgr,
    handle_preemption=True,
    resume=resume,
    log=slow_log,
)
mgr.close()
if hist and hist[-1].get("preempted"):
    print("PREEMPTED_CLEANLY", flush=True)
else:
    print("FINISHED", flush=True)
"""


@pytest.mark.slow
@pytest.mark.parametrize("par,bs", [("none", 4), ("fsdp", 8)])
def test_sigterm_end_to_end(tmp_path, par, bs):
    """Real OS semantics: SIGTERM a training process; it must exit 0
    after writing a rescue checkpoint; the rerun resumes past it.
    The fsdp cell proves the at-scale (ZeRO) path has the same
    preemption story as dp: rescue gathers to canonical layout,
    resume re-materializes it sharded (restore_sharded)."""
    env = dict(
        os.environ,
        TPUCAP_REPO=os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))
        ),
        TPUCAP_CKPT=str(tmp_path / "ckpt"),
        TPUCAP_PAR=par,
        TPUCAP_BS=str(bs),
    )
    env.pop("JAX_PLATFORMS", None)
    proc = subprocess.Popen(
        [sys.executable, "-c", TRAINER],
        env=env,
        stdout=subprocess.PIPE,
        text=True,
    )
    # Wait until training is underway (first epoch line), then SIGTERM.
    line = proc.stdout.readline()
    assert "epoch" in line or "clamping" in line, line
    while "epoch" not in line:
        line = proc.stdout.readline()
    proc.send_signal(signal.SIGTERM)
    out, _ = proc.communicate(timeout=120)
    assert proc.returncode == 0
    assert "PREEMPTED_CLEANLY" in out

    mgr = CheckpointManager(str(tmp_path / "ckpt"), best_metric=None)
    rescued = mgr.latest_step()
    mgr.close()
    assert rescued and rescued > 0

    env["TPUCAP_RESUME"] = "1"
    proc2 = subprocess.Popen(
        [sys.executable, "-c", TRAINER],
        env=env,
        stdout=subprocess.PIPE,
        text=True,
    )
    # Resume announcement, then terminate again — we only need to see
    # that it picked up past the rescue step.
    deadline = time.time() + 120
    resumed = False
    while time.time() < deadline:
        line = proc2.stdout.readline()
        if not line:
            break
        if "resumed from step" in line:
            resumed = True
            proc2.send_signal(signal.SIGTERM)
            break
    out2, _ = proc2.communicate(timeout=120)
    assert resumed, out2
    assert proc2.returncode == 0


TRAINER_KILL = r"""
import os, sys
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
sys.path.insert(0, os.environ["TPUCAP_REPO"])
from tpucap.checkpoint import CheckpointManager
from tpucap.config import (Config, DecodeConfig, DecoderConfig,
                           EncoderConfig, TrainConfig)
from tpucap.pipeline import CaptioningPipeline

cfg = Config(
    encoder=EncoderConfig(name="tiny_cnn", feature_dim=32),
    decoder=DecoderConfig(embed_dim=16, hidden_dim=16, dropout_rate=0.0),
    train=TrainConfig(epochs=1, batch_size=2, seed=0, learning_rate=1e-2,
                      checkpoint_every_steps=1),
    decode=DecodeConfig(max_len=8),
)
pipe = CaptioningPipeline(cfg)
words = "a b c d e f g h".split()
desc = {f"im{i}": [f"startseq {words[i]} {words[(i+3) % 8]} endseq"] * 2
        for i in range(8)}
pipe.fit_tokenizer(desc)
pipe.build()
rng = np.random.default_rng(1)
feats = {k: rng.normal(size=(32,)).astype(np.float32) for k in desc}

mgr = CheckpointManager(os.environ["TPUCAP_CKPT"], best_metric=None,
                        max_to_keep=50)

def slow_log(msg):
    # Stretch epochs so the parent's SIGKILL lands mid-run.
    print(msg, flush=True)
    import time
    time.sleep(0.2)

hist = pipe.fit(
    desc, feats, epochs=12,
    batch_size=int(os.environ.get("TPUCAP_BS", "2")),
    parallelism=os.environ.get("TPUCAP_PAR", "none"),
    checkpoint_manager=mgr,
    resume=bool(os.environ.get("TPUCAP_RESUME")),
    log=slow_log,
)
mgr.close()
print("FINAL %.10f" % hist[-1]["loss"], flush=True)
"""


@pytest.mark.slow
@pytest.mark.parametrize("par,bs", [("none", 2), ("fsdp", 8)])
def test_sigkill_step_checkpoint_resume(tmp_path, par, bs):
    """The feature's whole point: a HARD kill (SIGKILL — no grace, no
    rescue save) loses < checkpoint_every_steps steps; the resumed run
    lands on the exact same final loss as an uninterrupted one. The
    fsdp cell exercises the sharded-state interval saves (gather to
    canonical) + restore_sharded resume on the 8-device CPU mesh."""
    base_env = dict(
        os.environ,
        TPUCAP_REPO=os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))
        ),
        TPUCAP_PAR=par,
        TPUCAP_BS=str(bs),
    )
    base_env.pop("JAX_PLATFORMS", None)

    env_a = dict(base_env, TPUCAP_CKPT=str(tmp_path / "ref"))
    ra = subprocess.run(
        [sys.executable, "-c", TRAINER_KILL], env=env_a,
        capture_output=True, text=True, timeout=300,
    )
    assert ra.returncode == 0, ra.stderr[-2000:]
    final_a = [
        ln for ln in ra.stdout.splitlines() if ln.startswith("FINAL")
    ][-1]

    env_b = dict(base_env, TPUCAP_CKPT=str(tmp_path / "k"))
    p = subprocess.Popen(
        [sys.executable, "-c", TRAINER_KILL], env=env_b,
        stdout=subprocess.PIPE, text=True,
    )
    while True:
        line = p.stdout.readline()
        assert line, "trainer exited before epoch 3"
        if line.startswith("epoch 3:"):
            p.send_signal(signal.SIGKILL)
            break
    p.wait(timeout=60)
    assert p.returncode != 0  # hard kill, no clean exit

    mgr = CheckpointManager(str(tmp_path / "k"), best_metric=None)
    rescued = mgr.latest_step()
    mgr.close()
    # 16 rows / bs steps per epoch, killed during/after epoch 3's log
    # line: per-step checkpoints mean at most 1 step of work is lost.
    assert rescued is not None and rescued >= 3 * (16 // bs)

    env_b["TPUCAP_RESUME"] = "1"
    rb = subprocess.run(
        [sys.executable, "-c", TRAINER_KILL], env=env_b,
        capture_output=True, text=True, timeout=300,
    )
    assert rb.returncode == 0, rb.stderr[-2000:]
    assert "resumed from step" in rb.stdout
    final_b = [
        ln for ln in rb.stdout.splitlines() if ln.startswith("FINAL")
    ][-1]
    assert final_b == final_a


def test_fsdp_epoch_boundary_resume_is_exact(tmp_path):
    """Resume parity for the at-scale (ZeRO) path: an interrupted-then-
    resumed fsdp run lands on params bit-identical to an uninterrupted
    fsdp run. Checkpoints carry the canonical layout (the epoch save
    gathers); restore_sharded re-materializes them directly in the 1/N
    layout of the live state."""
    pipe_a, desc, feats = _pipe()
    hist_a = pipe_a.fit(
        desc, feats, epochs=4, batch_size=8, parallelism="fsdp",
        log=None,
    )

    pipe_b, desc, feats = _pipe()
    mgr = CheckpointManager(str(tmp_path / "fb"), best_metric=None)
    pipe_b.fit(
        desc, feats, epochs=2, batch_size=8, parallelism="fsdp",
        checkpoint_manager=mgr, log=None,
    )
    pipe_c, desc, feats = _pipe()
    hist_c = pipe_c.fit(
        desc, feats, epochs=4, batch_size=8, parallelism="fsdp",
        checkpoint_manager=mgr, resume=True, log=None,
    )
    mgr.close()
    _assert_trees_equal(_params(pipe_a), _params(pipe_c))
    assert [h["epoch"] for h in hist_c] == [2, 3]
    np.testing.assert_allclose(
        [h["loss"] for h in hist_a[2:]],
        [h["loss"] for h in hist_c],
        rtol=1e-6,
    )


def test_fsdp_mid_epoch_preemption_resume_is_exact(tmp_path):
    """Mid-epoch rescue + resume under fsdp: the rescue gathers to the
    canonical layout, the resume re-shards, and the trajectory matches
    an uninterrupted fsdp run bit-exactly."""
    pipe_a, desc, feats = _pipe()
    pipe_a.fit(
        desc, feats, epochs=3, batch_size=8, parallelism="fsdp",
        log=None,
    )

    # 16 rows / batch 8 = 2 steps/epoch; fire after 3 steps ->
    # mid-epoch-1 rescue at step 3.
    pipe_b, desc, feats = _pipe()
    mgr = CheckpointManager(str(tmp_path / "fm"), best_metric=None)
    hist_b = pipe_b.fit(
        desc, feats, epochs=3, batch_size=8, parallelism="fsdp",
        checkpoint_manager=mgr,
        preemption_guard=_FakeGuard(3),
        log=None,
    )
    assert hist_b[-1]["preempted"] is True
    assert mgr.latest_step() == 3

    pipe_c, desc, feats = _pipe()
    pipe_c.fit(
        desc, feats, epochs=3, batch_size=8, parallelism="fsdp",
        checkpoint_manager=mgr, resume=True, log=None,
    )
    mgr.close()
    _assert_trees_equal(_params(pipe_a), _params(pipe_c))


def test_fsdp_step_interval_checkpoints(tmp_path):
    """checkpoint_every_steps under fsdp: interval saves carry the
    canonical layout (restorable through the standard template), and
    resuming from one is exact."""
    pipe_a, desc, feats = _pipe()
    pipe_a.fit(
        desc, feats, epochs=2, batch_size=8, parallelism="fsdp",
        log=None,
    )

    pipe_b, desc, feats = _pipe(checkpoint_every_steps=1)
    mgr = CheckpointManager(
        str(tmp_path / "fs"), best_metric=None, max_to_keep=20
    )
    pipe_b.fit(
        desc, feats, epochs=1, batch_size=8, parallelism="fsdp",
        checkpoint_manager=mgr, log=None,
    )
    # 2 steps/epoch: interval save at 1, epoch-boundary save at 2.
    assert mgr.all_steps() == [1, 2]
    # The interval save restores into a canonical (un-sharded)
    # template — proof it was gathered before hitting disk.
    from tpucap.train import TrainState, build_optimizer

    pipe_t, _, _ = _pipe()
    opt = build_optimizer(pipe_t.config.train)
    template = TrainState.create(
        pipe_t.params["decoder"], opt, jax.random.key(0)
    )
    mgr.restore(template, step=1)

    pipe_c, desc, feats = _pipe()
    pipe_c.fit(
        desc, feats, epochs=2, batch_size=8, parallelism="fsdp",
        checkpoint_manager=mgr, resume=True, log=None,
    )
    mgr.close()
    _assert_trees_equal(_params(pipe_a), _params(pipe_c))


def test_fsdp_sharded_checkpoints_resume_exact(tmp_path):
    """fit(sharded_checkpoints=True): every save hands orbax the live
    1/N ZeRO layout (no gather) — the disk format is unchanged, so a
    canonical-template restore works AND resume lands bit-identical to
    the canonical-checkpoint fsdp run."""
    pipe_a, desc, feats = _pipe()
    pipe_a.fit(
        desc, feats, epochs=4, batch_size=8, parallelism="fsdp",
        log=None,
    )

    pipe_b, desc, feats = _pipe()
    mgr = CheckpointManager(str(tmp_path / "z"), best_metric=None)
    pipe_b.fit(
        desc, feats, epochs=2, batch_size=8, parallelism="fsdp",
        sharded_checkpoints=True, checkpoint_manager=mgr, log=None,
    )
    # Layout-agnostic disk proof: the sharded-written checkpoint
    # restores through the CANONICAL template.
    from tpucap.train import TrainState, build_optimizer

    pipe_t, _, _ = _pipe()
    opt = build_optimizer(pipe_t.config.train)
    template = TrainState.create(
        pipe_t.params["decoder"], opt, jax.random.key(0)
    )
    restored = mgr.restore(template)
    assert int(jax.device_get(restored.step)) == 4  # 2 epochs x 2 steps

    pipe_c, desc, feats = _pipe()
    pipe_c.fit(
        desc, feats, epochs=4, batch_size=8, parallelism="fsdp",
        sharded_checkpoints=True, checkpoint_manager=mgr, resume=True,
        log=None,
    )
    mgr.close()
    _assert_trees_equal(_params(pipe_a), _params(pipe_c))


def test_fsdp_sharded_rescue_and_interval(tmp_path):
    """Sharded-layout mid-epoch saves: the FakeGuard rescue and the
    step-interval checkpoints write without gathering and restore
    through the canonical template."""
    pipe, desc, feats = _pipe(checkpoint_every_steps=1)
    mgr = CheckpointManager(
        str(tmp_path / "zr"), best_metric=None, max_to_keep=20
    )
    hist = pipe.fit(
        desc, feats, epochs=2, batch_size=8, parallelism="fsdp",
        sharded_checkpoints=True, checkpoint_manager=mgr,
        preemption_guard=_FakeGuard(3),
        log=None,
    )
    assert hist[-1]["preempted"] is True
    assert mgr.latest_step() == 3  # mid-epoch-1 rescue, sharded-written
    from tpucap.train import TrainState, build_optimizer

    pipe_t, _, _ = _pipe()
    opt = build_optimizer(pipe_t.config.train)
    template = TrainState.create(
        pipe_t.params["decoder"], opt, jax.random.key(0)
    )
    mgr.restore(template, step=3)
    mgr.close()


def test_sharded_checkpoints_guards(tmp_path):
    pipe, desc, feats = _pipe()
    with pytest.raises(ValueError, match="sharded_checkpoints"):
        pipe.fit(
            desc, feats, epochs=1, batch_size=8, parallelism="dp",
            sharded_checkpoints=True, log=None,
        )


# ---------------------------------------------------------- fit_finetune


def _ft_pipe(**train_overrides):
    # feature_dim must be TinyCNN's actual output width (128) — the
    # joint step feeds REAL encoder features to the decoder.
    cfg = Config(
        encoder=EncoderConfig(name="tiny_cnn", feature_dim=128),
        decoder=DecoderConfig(
            embed_dim=16, hidden_dim=16, dropout_rate=0.0
        ),
        train=TrainConfig(
            epochs=1, batch_size=4, seed=0, learning_rate=1e-2,
            **train_overrides,
        ),
        decode=DecodeConfig(max_len=8),
    )
    pipe = CaptioningPipeline(cfg)
    words = "a b c d e f g h".split()
    desc = {
        f"im{i}": [f"startseq {words[i]} {words[(i+3) % 8]} endseq"] * 2
        for i in range(8)
    }
    pipe.fit_tokenizer(desc)
    pipe.build()
    rng = np.random.default_rng(1)
    images = {
        k: rng.normal(size=(32, 32, 3)).astype(np.float32) for k in desc
    }
    return pipe, desc, images


def _joint_params(pipe):
    return jax.device_get(
        {"encoder": pipe.params["encoder"],
         "decoder": pipe.params["decoder"]}
    )


@pytest.mark.parametrize("par", ["none", "fsdp"])
def test_finetune_resume_is_exact(tmp_path, par):
    """fit_finetune resume parity (r5): interrupted-then-resumed joint
    fine-tuning lands on encoder AND decoder params bit-identical to
    the uninterrupted run — single-device and ZeRO-sharded."""
    bs = 4 if par == "none" else 8
    pipe_a, desc, images = _ft_pipe()
    pipe_a.fit_finetune(
        desc, images, epochs=4, batch_size=bs, parallelism=par,
        log=None,
    )

    pipe_b, desc, images = _ft_pipe()
    mgr = CheckpointManager(str(tmp_path / f"ft{par}"), best_metric=None)
    pipe_b.fit_finetune(
        desc, images, epochs=2, batch_size=bs, parallelism=par,
        checkpoint_manager=mgr, log=None,
    )
    pipe_c, desc, images = _ft_pipe()
    hist = pipe_c.fit_finetune(
        desc, images, epochs=4, batch_size=bs, parallelism=par,
        checkpoint_manager=mgr, resume=True, log=None,
    )
    mgr.close()
    assert [h["epoch"] for h in hist] == [2, 3]
    _assert_trees_equal(_joint_params(pipe_a), _joint_params(pipe_c))


def test_finetune_mid_epoch_rescue_and_resume(tmp_path):
    """FakeGuard preemption mid-fine-tune: rescue checkpoint written,
    'preempted' history entry, resumed run matches uninterrupted."""
    pipe_a, desc, images = _ft_pipe()
    pipe_a.fit_finetune(desc, images, epochs=3, batch_size=4, log=None)

    pipe_b, desc, images = _ft_pipe()
    mgr = CheckpointManager(str(tmp_path / "ftm"), best_metric=None)
    hist = pipe_b.fit_finetune(
        desc, images, epochs=3, batch_size=4,
        checkpoint_manager=mgr, preemption_guard=_FakeGuard(3),
        log=None,
    )
    assert hist[-1]["preempted"] is True
    assert mgr.latest_step() == 3

    pipe_c, desc, images = _ft_pipe()
    pipe_c.fit_finetune(
        desc, images, epochs=3, batch_size=4,
        checkpoint_manager=mgr, resume=True, log=None,
    )
    mgr.close()
    _assert_trees_equal(_joint_params(pipe_a), _joint_params(pipe_c))


def test_finetune_step_interval_and_sharded(tmp_path):
    """checkpoint_every_steps during fine-tuning (interval saves land
    mid-epoch) and the fsdp ZeRO (sharded_checkpoints) format, which
    must still restore through a canonical template."""
    pipe, desc, images = _ft_pipe(checkpoint_every_steps=1)
    mgr = CheckpointManager(
        str(tmp_path / "fts"), best_metric=None, max_to_keep=20
    )
    # encoder_lr_scale=1.0 keeps the optimizer bare so the canonical
    # template below shares its opt_state structure.
    pipe.fit_finetune(
        desc, images, epochs=1, batch_size=8, parallelism="fsdp",
        encoder_lr_scale=1.0,
        sharded_checkpoints=True, checkpoint_manager=mgr, log=None,
    )
    # 16 rows / bs 8 = 2 steps: interval at 1, epoch boundary at 2.
    assert mgr.all_steps() == [1, 2]
    from tpucap.train import TrainState, build_optimizer

    pipe_t, _, _ = _ft_pipe()
    opt = build_optimizer(pipe_t.config.train)
    template = TrainState.create(
        {"encoder": pipe_t.params["encoder"],
         "decoder": pipe_t.params["decoder"]},
        opt,
        jax.random.key(0),
    )
    mgr.restore(template, step=2)
    mgr.close()


def test_finetune_checkpoint_guards(tmp_path):
    pipe, desc, images = _ft_pipe()
    with pytest.raises(ValueError, match="checkpoint_manager"):
        pipe.fit_finetune(
            desc, images, epochs=1, resume=True, log=None
        )
    with pytest.raises(NotImplementedError, match="save_lora"):
        mgr = CheckpointManager(
            str(tmp_path / "ftg"), best_metric=None
        )
        pipe.fit_finetune(
            desc, images, epochs=1, lora_rank=2,
            checkpoint_manager=mgr, log=None,
        )
    with pytest.raises(ValueError, match="sharded_checkpoints"):
        pipe.fit_finetune(
            desc, images, epochs=1, parallelism="dp",
            sharded_checkpoints=True, log=None,
        )
