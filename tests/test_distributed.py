"""Distributed-without-a-cluster tests on the 8-device virtual CPU mesh.

SURVEY.md §4: (a) real shard_map code on a faked 8-device mesh;
(b) DP-8 gradient/update == single-device update on the concatenated batch;
(c) sharded decode == single-device decode.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from tpucap.core import make_mesh, shard_batch
from tpucap.decode import beam_decode, greedy_decode
from tpucap.models.decoders import build_decoder
from tpucap.parallel import make_dp_decode_fn, make_dp_train_step
from tpucap.train import TrainState, make_train_step

VOCAB, FEAT, EMB, HID = 21, 9, 8, 16
B = 16  # divisible by 8
START, END, MAXLEN = 1, 2, 10


@pytest.fixture(scope="module")
def mesh():
    assert jax.device_count() == 8, "conftest must provide 8 virtual devices"
    return make_mesh(8)


def setup(name="lstm1"):
    dec = build_decoder(
        name, vocab_size=VOCAB, feature_dim=FEAT, embed_dim=EMB, hidden_dim=HID
    )
    params = dec.init(jax.random.key(0))
    rng = np.random.default_rng(0)
    feats = rng.normal(size=(B, FEAT)).astype(np.float32)
    tokens = rng.integers(1, VOCAB, size=(B, 8)).astype(np.int32)
    tokens[:, 0] = START
    tokens[:, -2:] = 0  # some padding
    return dec, params, feats, tokens


@pytest.mark.parametrize("name", ["lstm1", "transformer"])
def test_dp_update_matches_single_device(mesh, name):
    # SGD so the param delta is proportional to the gradient — a direct
    # gradient-equivalence check without Adam's 1/sqrt(v) amplification of
    # f32 reduction-order noise. Parametrized over the recurrent family
    # AND the KV-cached transformer (its causal mask + position handling
    # must shard cleanly under shard_map).
    dec, params, feats, tokens = setup(name)
    optimizer = optax.sgd(0.5)

    single = make_train_step(dec, optimizer, deterministic=True)
    state1 = TrainState.create(params, optimizer, jax.random.key(1))
    state1, m1 = single(state1, jnp.asarray(feats), jnp.asarray(tokens))

    dp = make_dp_train_step(dec, optimizer, mesh, deterministic=True)
    state8 = TrainState.create(params, optimizer, jax.random.key(1))
    fs, ts = shard_batch(mesh, (feats, tokens))
    state8, m8 = dp(state8, fs, ts)

    np.testing.assert_allclose(
        float(m1["loss"]), float(m8["loss"]), rtol=1e-6
    )
    for p1, p8 in zip(
        jax.tree_util.tree_leaves(state1.params),
        jax.tree_util.tree_leaves(state8.params),
        strict=True,
    ):
        np.testing.assert_allclose(
            np.asarray(p1), np.asarray(p8), atol=1e-6
        )


def test_dp_multi_step_training_descends(mesh):
    dec, params, feats, tokens = setup()
    optimizer = optax.adam(1e-2)
    dp = make_dp_train_step(dec, optimizer, mesh, deterministic=False)
    state = TrainState.create(params, optimizer, jax.random.key(2))
    fs, ts = shard_batch(mesh, (feats, tokens))
    first = None
    for _ in range(20):
        state, metrics = dp(state, fs, ts)
        if first is None:
            first = float(metrics["loss"])
    assert float(metrics["loss"]) < first


@pytest.mark.parametrize("name", ["lstm1", "transformer"])
def test_dp_greedy_decode_matches_single(mesh, name):
    # The transformer step's fused one-hot KV-cache write runs inside
    # shard_map here — per-shard lane indexing must stay local.
    dec, params, feats, _ = setup(name)
    state = dec.init_state(params, jnp.asarray(feats))
    ref = greedy_decode(
        dec.step, params, state, start_id=START, end_id=END, max_len=MAXLEN
    )

    dp_fn = make_dp_decode_fn(
        dec,
        greedy_decode,
        mesh,
        start_id=START,
        end_id=END,
        max_len=MAXLEN,
    )
    out = dp_fn(params, shard_batch(mesh, feats))
    np.testing.assert_array_equal(
        np.asarray(ref.tokens), np.asarray(out.tokens)
    )
    np.testing.assert_array_equal(
        np.asarray(ref.lengths), np.asarray(out.lengths)
    )


def test_dp_beam_decode_matches_single(mesh):
    dec, params, feats, _ = setup()
    state = dec.init_state(params, jnp.asarray(feats))
    ref = beam_decode(
        dec.step,
        params,
        state,
        start_id=START,
        end_id=END,
        max_len=MAXLEN,
        beam_width=3,
    )
    dp_fn = make_dp_decode_fn(
        dec,
        beam_decode,
        mesh,
        start_id=START,
        end_id=END,
        max_len=MAXLEN,
        beam_width=3,
    )
    out = dp_fn(params, shard_batch(mesh, feats))
    np.testing.assert_array_equal(
        np.asarray(ref.tokens), np.asarray(out.tokens)
    )
    np.testing.assert_allclose(
        np.asarray(ref.scores), np.asarray(out.scores), atol=1e-5
    )


def test_dp_decode_gathered_results(mesh):
    """gather_results=True: every shard returns the full batch (all_gather
    over ICI inside the compiled program)."""
    dec, params, feats, _ = setup()
    state = dec.init_state(params, jnp.asarray(feats))
    ref = greedy_decode(
        dec.step, params, state, start_id=START, end_id=END, max_len=MAXLEN
    )
    dp_fn = make_dp_decode_fn(
        dec,
        greedy_decode,
        mesh,
        gather_results=True,
        start_id=START,
        end_id=END,
        max_len=MAXLEN,
    )
    out = dp_fn(params, shard_batch(mesh, feats))
    assert out.tokens.shape == (B, MAXLEN)
    np.testing.assert_array_equal(
        np.asarray(ref.tokens), np.asarray(out.tokens)
    )


def test_dp_attention_decode_matches_single(mesh):
    """Attention decoder under shard_map: the (B, L, D) spatial state
    shards over batch like everything else."""
    dec = build_decoder(
        "attention",
        vocab_size=VOCAB,
        feature_dim=FEAT,
        embed_dim=EMB,
        hidden_dim=HID,
    )
    params = dec.init(jax.random.key(0))
    rng = np.random.default_rng(1)
    feats = rng.normal(size=(B, 5, FEAT)).astype(np.float32)
    state = dec.init_state(params, jnp.asarray(feats))
    ref = beam_decode(
        dec.step,
        params,
        state,
        start_id=START,
        end_id=END,
        max_len=MAXLEN,
        beam_width=3,
    )
    dp_fn = make_dp_decode_fn(
        dec,
        beam_decode,
        mesh,
        start_id=START,
        end_id=END,
        max_len=MAXLEN,
        beam_width=3,
    )
    out = dp_fn(params, shard_batch(mesh, feats))
    np.testing.assert_array_equal(
        np.asarray(ref.tokens), np.asarray(out.tokens)
    )


class TestMultihostSeam:
    """parallel/multihost.py — the DCN seam (SURVEY §2.5): single-process
    no-op semantics and per-host work sharding."""

    def test_single_process_is_noop(self):
        from tpucap.parallel import initialize_distributed, process_info

        assert initialize_distributed() is False
        assert process_info() == (0, 1)

    def test_env_partial_config_single(self, monkeypatch):
        from tpucap.parallel import initialize_distributed

        monkeypatch.setenv("JAX_NUM_PROCESSES", "1")
        assert initialize_distributed() is False

    def test_shard_for_host_single_process_identity(self):
        from tpucap.parallel import shard_for_host

        items = list(range(10))
        assert shard_for_host(items) == items

    def test_shard_for_host_splits(self, monkeypatch):
        import tpucap.parallel.multihost as mh

        monkeypatch.setattr(mh, "process_info", lambda: (1, 4))
        assert mh.shard_for_host(list(range(9))) == [2, 3]  # 9//4=2 each
        # drop_remainder=False spreads the remainder one-per-host
        # (host 0 takes the extra; no host is ever empty) and the
        # slices stay contiguous + disjoint + exhaustive.
        expect = {0: [0, 1, 2], 1: [3, 4], 2: [5, 6], 3: [7, 8]}
        for host, want in expect.items():
            monkeypatch.setattr(
                mh, "process_info", lambda h=host: (h, 4)
            )
            assert (
                mh.shard_for_host(list(range(9)), drop_remainder=False)
                == want
            )

    def test_shard_for_host_too_few_items_raises(self, monkeypatch):
        """< process_count items cannot give every host work — an empty
        host would skip its collectives and deadlock the slice."""
        import tpucap.parallel.multihost as mh

        monkeypatch.setattr(mh, "process_info", lambda: (3, 4))
        for drop in (True, False):
            with pytest.raises(ValueError, match="empty slice"):
                mh.shard_for_host(list(range(3)), drop_remainder=drop)

    def test_shard_for_host_invariants_fuzz(self, monkeypatch):
        """Across random (n_items, process_count): slices are disjoint,
        contiguous, exhaustive, and sized within 1 of each other
        (drop_remainder=False), or exactly n//count (True)."""
        import random

        import tpucap.parallel.multihost as mh

        rng = random.Random(0)
        for _ in range(200):
            count = rng.randint(2, 9)
            n = rng.randint(count, 50)
            items = list(range(n))
            for drop in (True, False):
                slices = []
                for host in range(count):
                    monkeypatch.setattr(
                        mh, "process_info", lambda h=host: (h, count)
                    )
                    slices.append(
                        mh.shard_for_host(items, drop_remainder=drop)
                    )
                sizes = {len(s) for s in slices}
                assert all(s for s in slices), "no host may be empty"
                flat = [x for s in slices for x in s]
                assert flat == sorted(flat)  # contiguous + ordered
                assert len(set(flat)) == len(flat)  # disjoint
                if drop:
                    assert sizes == {n // count}
                else:
                    assert flat == items  # exhaustive
                    assert max(sizes) - min(sizes) <= 1
