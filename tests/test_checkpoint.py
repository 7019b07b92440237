"""Checkpoint/resume tests (SURVEY.md §5.3-5.4): atomic orbax saves,
best-metric retention, resume continuity (the fault-injection policy)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from tpucap.checkpoint import CheckpointManager
from tpucap.models.decoders import build_decoder
from tpucap.train import TrainState, make_train_step

VOCAB, FEAT = 17, 6


def make_setup():
    dec = build_decoder(
        "lstm1", vocab_size=VOCAB, feature_dim=FEAT, embed_dim=8, hidden_dim=8
    )
    params = dec.init(jax.random.key(0))
    optimizer = optax.adam(1e-3)
    state = TrainState.create(params, optimizer, jax.random.key(1))
    step = make_train_step(dec, optimizer, deterministic=True)
    rng = np.random.default_rng(0)
    feats = rng.normal(size=(4, FEAT)).astype(np.float32)
    tokens = rng.integers(1, VOCAB, size=(4, 6)).astype(np.int32)
    return dec, optimizer, state, step, feats, tokens


def test_save_restore_round_trip(tmp_path):
    dec, optimizer, state, step, feats, tokens = make_setup()
    state, _ = step(state, feats, tokens)

    mgr = CheckpointManager(str(tmp_path / "ckpt"), best_metric=None)
    mgr.save(state)
    assert mgr.latest_step() == 1

    fresh = TrainState.create(state.params, optimizer, jax.random.key(9))
    restored = mgr.restore(fresh)
    for a, b in zip(
        jax.tree_util.tree_leaves(state.params),
        jax.tree_util.tree_leaves(restored.params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(restored.step) == 1
    mgr.close()


def test_resume_continues_identically(tmp_path):
    """Kill-and-resume yields the same trajectory as an uninterrupted run."""
    dec, optimizer, state, step, feats, tokens = make_setup()

    # Uninterrupted: 4 steps.
    s = state
    for _ in range(4):
        s, m = step(s, feats, tokens)
    loss_full = float(m["loss"])

    # Interrupted: 2 steps, checkpoint, "crash", restore, 2 more.
    s2 = state
    for _ in range(2):
        s2, _ = step(s2, feats, tokens)
    mgr = CheckpointManager(str(tmp_path / "ckpt"), best_metric=None)
    mgr.save(s2)
    del s2

    fresh = TrainState.create(state.params, optimizer, jax.random.key(42))
    resumed = mgr.restore(fresh)
    for _ in range(2):
        resumed, m2 = step(resumed, feats, tokens)
    np.testing.assert_allclose(float(m2["loss"]), loss_full, rtol=1e-6)
    for a, b in zip(
        jax.tree_util.tree_leaves(s.params),
        jax.tree_util.tree_leaves(resumed.params),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-7
        )
    mgr.close()


def test_best_metric_retention(tmp_path):
    dec, optimizer, state, step, feats, tokens = make_setup()
    mgr = CheckpointManager(
        str(tmp_path / "ckpt"), max_to_keep=2, best_metric="val_loss"
    )
    losses = [3.0, 1.0, 2.0]
    for loss in losses:
        state, _ = step(state, feats, tokens)
        mgr.save(state, metrics={"val_loss": loss})
    assert mgr.best_step() == 2  # the step with val_loss 1.0
    mgr.close()


def test_async_save_round_trip(tmp_path):
    """async_save=True: save returns without blocking on the write;
    every read path barriers, so the restored state is bit-identical to
    the synchronous manager's."""
    dec, optimizer, state, step, feats, tokens = make_setup()
    state, _ = step(state, feats, tokens)

    mgr = CheckpointManager(
        str(tmp_path / "ckpt"), best_metric=None, async_save=True
    )
    mgr.save(state)
    mgr.save(
        TrainState(
            step=state.step + 1,
            params=state.params,
            opt_state=state.opt_state,
            rng=state.rng,
        )
    )
    # Reads barrier on the in-flight writes.
    assert mgr.all_steps() == [1, 2]
    fresh = TrainState.create(state.params, optimizer, jax.random.key(9))
    restored = mgr.restore(fresh, step=1)
    for a, b in zip(
        jax.tree_util.tree_leaves(state.params),
        jax.tree_util.tree_leaves(restored.params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    mgr.close()

    # A fresh synchronous manager over the same directory sees the
    # completed checkpoints (no torn state on disk).
    mgr2 = CheckpointManager(str(tmp_path / "ckpt"), best_metric=None)
    assert mgr2.latest_step() == 2
    mgr2.close()
