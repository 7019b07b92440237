"""FSDP (ZeRO-style fully-sharded data parallel) on the 8-device mesh.

SURVEY.md §2.4/§4: the memory-scaling member of the parallelism matrix
must be UPDATE-EXACT vs the single-device step (sum-form loss, psum'd
counts), with params/grads/optimizer state actually living sharded
(1/N per device) and the gather round-trip exact.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from tpucap.core import make_mesh, shard_batch
from tpucap.models.decoders import build_decoder
from tpucap.parallel import (
    fsdp_gather_tree,
    make_fsdp_train_step,
    shard_fsdp_tree,
)
from tpucap.parallel.fsdp import fsdp_dims, shard_dim
from tpucap.train import TrainState, make_train_step

VOCAB, FEAT, EMB, HID = 24, 9, 16, 16
B = 16
START = 1
# Test-scale leaves are tiny; drop the production min-size floor so the
# sharded layout actually exercises (asserted below).
MIN_SIZE = 8


@pytest.fixture(scope="module")
def mesh():
    assert jax.device_count() == 8, "conftest must provide 8 virtual devices"
    return make_mesh(8)


def setup(name="lstm1", seed=0):
    dec = build_decoder(
        name, vocab_size=VOCAB, feature_dim=FEAT, embed_dim=EMB, hidden_dim=HID
    )
    params = dec.init(jax.random.key(0))
    rng = np.random.default_rng(seed)
    feats = rng.normal(size=(B, FEAT)).astype(np.float32)
    tokens = rng.integers(1, VOCAB, size=(B, 8)).astype(np.int32)
    tokens[:, 0] = START
    tokens[:, -2:] = 0  # ragged padding
    return dec, params, feats, tokens


def fsdp_state(params, optimizer, mesh, key=1):
    state = TrainState.create(params, optimizer, jax.random.key(key))
    return shard_fsdp_tree(state, mesh, min_size=MIN_SIZE)


def assert_update_matches_single(
    mesh, name, *, optimizer_fn, fsdp_kwargs=None, single_kwargs=None
):
    dec, params, feats, tokens = setup(name)

    single = make_train_step(
        dec, optimizer_fn(), deterministic=True, **(single_kwargs or {})
    )
    state1 = TrainState.create(params, optimizer_fn(), jax.random.key(1))
    state1, m1 = single(state1, jnp.asarray(feats), jnp.asarray(tokens))

    opt = optimizer_fn()
    state8 = fsdp_state(params, opt, mesh)
    step = make_fsdp_train_step(
        dec,
        opt,
        mesh,
        state8,
        deterministic=True,
        min_size=MIN_SIZE,
        **(fsdp_kwargs or {}),
    )
    fs, ts = shard_batch(mesh, (feats, tokens))
    state8, m8 = step(state8, fs, ts)

    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]), rtol=1e-6)
    full = fsdp_gather_tree(state8.params, mesh)
    for p1, p8 in zip(
        jax.tree_util.tree_leaves(state1.params),
        jax.tree_util.tree_leaves(full),
        strict=True,
    ):
        np.testing.assert_allclose(np.asarray(p1), np.asarray(p8), atol=1e-6)


class TestShardDim:
    def test_rule(self):
        n = 8
        assert shard_dim((), n) == -1
        assert shard_dim((16,), n, min_size=8) == 0
        assert shard_dim((9, 16), n, min_size=8) == 1  # only dim1 divides
        # Largest divisible dim wins; lowest index on ties.
        assert shard_dim((16, 64), n, min_size=8) == 1
        assert shard_dim((64, 64), n, min_size=8) == 0
        assert shard_dim((7, 9), n, min_size=8) == -1  # nothing divides
        # Below the size floor: replicated even though divisible.
        assert shard_dim((16,), n, min_size=1024) == -1

    def test_opt_state_mirrors_params(self, mesh):
        dec, params, *_ = setup()
        state = fsdp_state(params, optax.adam(1e-3), mesh)
        pd = fsdp_dims(state.params, 8, min_size=MIN_SIZE)
        # adam mu/nu leaves shard exactly like their params.
        mu = state.opt_state[0].mu
        md = fsdp_dims(mu, 8, min_size=MIN_SIZE)
        assert jax.tree_util.tree_leaves(pd) == jax.tree_util.tree_leaves(md)


class TestLayout:
    def test_params_actually_sharded(self, mesh):
        dec, params, *_ = setup()
        state = fsdp_state(params, optax.adam(1e-3), mesh)
        dims = fsdp_dims(state.params, 8, min_size=MIN_SIZE)
        sharded = 0
        for p, d in zip(
            jax.tree_util.tree_leaves(state.params),
            jax.tree_util.tree_leaves(dims),
            strict=True,
        ):
            shard = p.addressable_shards[0].data
            if d >= 0:
                sharded += 1
                assert shard.shape[d] * 8 == p.shape[d]
            else:
                assert shard.shape == p.shape
        assert sharded >= 4, "test model must exercise the sharded path"
        # Optimizer state (mu/nu) carries the same 1/N layout: the ZeRO
        # memory claim.
        mu = state.opt_state[0].mu
        for p, d in zip(
            jax.tree_util.tree_leaves(mu),
            jax.tree_util.tree_leaves(fsdp_dims(mu, 8, min_size=MIN_SIZE)),
            strict=True,
        ):
            if d >= 0:
                assert (
                    p.addressable_shards[0].data.shape[d] * 8 == p.shape[d]
                )

    def test_gather_round_trip_exact(self, mesh):
        dec, params, *_ = setup()
        state = fsdp_state(params, optax.adam(1e-3), mesh)
        full = fsdp_gather_tree(state.params, mesh)
        for p0, p1 in zip(
            jax.tree_util.tree_leaves(params),
            jax.tree_util.tree_leaves(full),
            strict=True,
        ):
            np.testing.assert_array_equal(np.asarray(p0), np.asarray(p1))


@pytest.mark.parametrize("name", ["lstm1", "transformer"])
def test_fsdp_update_matches_single_device(mesh, name):
    # SGD isolates gradient equivalence (no Adam 1/sqrt(v) noise
    # amplification), same as the dp.py exactness test.
    assert_update_matches_single(mesh, name, optimizer_fn=lambda: optax.sgd(0.5))


def test_fsdp_adam_update_matches_single_device(mesh):
    # Adam exercises the sharded optimizer STATE update (mu/nu slices).
    assert_update_matches_single(
        mesh, "lstm1", optimizer_fn=lambda: optax.adam(1e-2)
    )


def test_fsdp_label_smoothing_matches_single(mesh):
    assert_update_matches_single(
        mesh,
        "lstm1",
        optimizer_fn=lambda: optax.sgd(0.5),
        fsdp_kwargs={"label_smoothing": 0.1},
        single_kwargs={"label_smoothing": 0.1},
    )


def test_fsdp_grad_accum_matches_single(mesh):
    # A=2 microbatches per shard: the in-scan gather/reduce-scatter path.
    assert_update_matches_single(
        mesh,
        "lstm1",
        optimizer_fn=lambda: optax.sgd(0.5),
        fsdp_kwargs={"grad_accum_steps": 2},
    )


def test_fsdp_global_norm_clip_matches_single(mesh):
    # The clip must use the psum'd GLOBAL norm — compare against the
    # single-device optax.chain(clip_by_global_norm, sgd) with a
    # threshold low enough to actually trigger.
    clip = 0.05
    dec, params, feats, tokens = setup()

    single = make_train_step(
        dec,
        optax.chain(optax.clip_by_global_norm(clip), optax.sgd(0.5)),
        deterministic=True,
    )
    state1 = TrainState.create(
        params,
        optax.chain(optax.clip_by_global_norm(clip), optax.sgd(0.5)),
        jax.random.key(1),
    )
    state1, _ = single(state1, jnp.asarray(feats), jnp.asarray(tokens))

    opt = optax.sgd(0.5)  # bare: the fsdp step owns the clip
    state8 = fsdp_state(params, opt, mesh)
    step = make_fsdp_train_step(
        dec,
        opt,
        mesh,
        state8,
        deterministic=True,
        grad_clip_norm=clip,
        min_size=MIN_SIZE,
    )
    fs, ts = shard_batch(mesh, (feats, tokens))
    state8, _ = step(state8, fs, ts)
    full = fsdp_gather_tree(state8.params, mesh)
    for p1, p8 in zip(
        jax.tree_util.tree_leaves(state1.params),
        jax.tree_util.tree_leaves(full),
        strict=True,
    ):
        np.testing.assert_allclose(np.asarray(p1), np.asarray(p8), atol=1e-6)


def test_fsdp_bf16_compute_matches_dp_bf16(mesh):
    # Mixed precision: bf16 gathers/forward/backward over f32 master
    # shards. Parity target is the single-device bf16 step (identical
    # compute dtype), tolerance at bf16 resolution.
    from tpucap.parallel import make_dp_train_step

    dec, params, feats, tokens = setup()
    optimizer = optax.sgd(0.5)
    single = make_train_step(
        dec, optimizer, deterministic=True, compute_dtype=jnp.bfloat16
    )
    state1 = TrainState.create(params, optimizer, jax.random.key(1))
    state1, m1 = single(state1, jnp.asarray(feats), jnp.asarray(tokens))

    state8 = fsdp_state(params, optimizer, mesh)
    step = make_fsdp_train_step(
        dec,
        optimizer,
        mesh,
        state8,
        deterministic=True,
        compute_dtype=jnp.bfloat16,
        min_size=MIN_SIZE,
    )
    fs, ts = shard_batch(mesh, (feats, tokens))
    state8, m8 = step(state8, fs, ts)
    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]), rtol=2e-2)
    full = fsdp_gather_tree(state8.params, mesh)
    for p1, p8 in zip(
        jax.tree_util.tree_leaves(state1.params),
        jax.tree_util.tree_leaves(full),
        strict=True,
    ):
        assert p8.dtype == jnp.float32  # master shards stay f32
        np.testing.assert_allclose(
            np.asarray(p1), np.asarray(p8), atol=5e-3
        )


def test_fsdp_multi_step_training_descends(mesh):
    dec, params, feats, tokens = setup()
    optimizer = optax.adam(1e-2)
    state = fsdp_state(params, optimizer, mesh, key=2)
    step = make_fsdp_train_step(
        dec, optimizer, mesh, state, min_size=MIN_SIZE
    )
    fs, ts = shard_batch(mesh, (feats, tokens))
    first = None
    for _ in range(20):
        state, metrics = step(state, fs, ts)
        if first is None:
            first = float(metrics["loss"])
    assert float(metrics["loss"]) < first


def test_fsdp_attention_decoder_reg_matches_single(mesh):
    # SAT decoder with the doubly-stochastic regularizer: the reg head
    # flows through the same gather/scatter path.
    dec = build_decoder(
        "attention",
        vocab_size=VOCAB,
        feature_dim=FEAT,
        embed_dim=EMB,
        hidden_dim=HID,
        attention_dim=HID,
    )
    params = dec.init(jax.random.key(0))
    rng = np.random.default_rng(3)
    feats = rng.normal(size=(B, 4, FEAT)).astype(np.float32)
    tokens = rng.integers(1, VOCAB, size=(B, 8)).astype(np.int32)
    tokens[:, 0] = START
    tokens[:, -2:] = 0

    optimizer = optax.sgd(0.5)
    single = make_train_step(
        dec, optimizer, deterministic=True, attention_reg=0.3
    )
    state1 = TrainState.create(params, optimizer, jax.random.key(1))
    state1, _ = single(state1, jnp.asarray(feats), jnp.asarray(tokens))

    state8 = fsdp_state(params, optimizer, mesh)
    step = make_fsdp_train_step(
        dec,
        optimizer,
        mesh,
        state8,
        deterministic=True,
        attention_reg=0.3,
        min_size=MIN_SIZE,
    )
    fs, ts = shard_batch(mesh, (feats, tokens))
    state8, _ = step(state8, fs, ts)
    full = fsdp_gather_tree(state8.params, mesh)
    for p1, p8 in zip(
        jax.tree_util.tree_leaves(state1.params),
        jax.tree_util.tree_leaves(full),
        strict=True,
    ):
        np.testing.assert_allclose(np.asarray(p1), np.asarray(p8), atol=1e-6)


class TestShardedCheckpoint:
    """ZeRO checkpointing: save the FSDP layout without a host gather,
    restore directly INTO the sharded layout, and stay disk-compatible
    with the canonical restore path."""

    def _trained(self, mesh, steps=2):
        dec, params, feats, tokens = setup()
        opt = optax.adam(1e-2)
        state = fsdp_state(params, opt, mesh, key=3)
        step = make_fsdp_train_step(dec, opt, mesh, state, min_size=MIN_SIZE)
        fs, ts = shard_batch(mesh, (feats, tokens))
        for _ in range(steps):
            state, _ = step(state, fs, ts)
        return dec, params, opt, state, step, (fs, ts)

    def test_save_sharded_restore_sharded_round_trip(self, mesh, tmp_path):
        from tpucap.checkpoint import CheckpointManager

        dec, params, opt, state, step, batch = self._trained(mesh)
        mgr = CheckpointManager(str(tmp_path / "z"), best_metric=None)
        mgr.save_sharded(state)
        mgr.close()

        mgr2 = CheckpointManager(str(tmp_path / "z"), best_metric=None)
        template = fsdp_state(params, opt, mesh, key=0)
        restored = mgr2.restore_sharded(template)
        mgr2.close()

        # Restored leaves carry the FSDP layout (no full copy anywhere).
        dims = fsdp_dims(restored.params, 8, min_size=MIN_SIZE)
        for p, d in zip(
            jax.tree_util.tree_leaves(restored.params),
            jax.tree_util.tree_leaves(dims),
            strict=True,
        ):
            if d >= 0:
                assert p.addressable_shards[0].data.shape[d] * 8 == p.shape[d]
        # Values identical to the live state (params AND opt state).
        for a, b in zip(
            jax.tree_util.tree_leaves(
                fsdp_gather_tree(
                    {"p": restored.params, "o": restored.opt_state}, mesh
                )
            ),
            jax.tree_util.tree_leaves(
                fsdp_gather_tree(
                    {"p": state.params, "o": state.opt_state}, mesh
                )
            ),
            strict=True,
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

        # Resume continuity: one more step from the restored state equals
        # one more step from the live state.
        s1, _ = step(state, *batch)
        s2, _ = step(restored, *batch)
        for a, b in zip(
            jax.tree_util.tree_leaves(fsdp_gather_tree(s1.params, mesh)),
            jax.tree_util.tree_leaves(fsdp_gather_tree(s2.params, mesh)),
            strict=True,
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_sharded_save_restores_through_canonical_path(
        self, mesh, tmp_path
    ):
        # Same disk format: a ZeRO save must restore via the standard
        # host-template restore() (and thus feed averaging/h5 export).
        from tpucap.checkpoint import CheckpointManager

        dec, params, opt, state, _, _ = self._trained(mesh)
        mgr = CheckpointManager(str(tmp_path / "z"), best_metric=None)
        mgr.save_sharded(state)
        mgr.close()

        mgr2 = CheckpointManager(str(tmp_path / "z"), best_metric=None)
        template = TrainState.create(params, opt, jax.random.key(0))
        restored = mgr2.restore(template)
        mgr2.close()
        for a, b in zip(
            jax.tree_util.tree_leaves(restored.params),
            jax.tree_util.tree_leaves(fsdp_gather_tree(state.params, mesh)),
            strict=True,
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestPipelineFsdp:
    @staticmethod
    def _make_pipe(toy_corpus):
        from tpucap.config import (
            Config,
            DecodeConfig,
            DecoderConfig,
            EncoderConfig,
        )
        from tpucap.pipeline import CaptioningPipeline
        from tpucap.text import Tokenizer

        cfg = Config(
            encoder=EncoderConfig(name="tiny_cnn", feature_dim=128),
            decoder=DecoderConfig(
                embed_dim=16, hidden_dim=32, dropout_rate=0.0
            ),
            decode=DecodeConfig(max_len=10),
        )
        pipe = CaptioningPipeline(cfg)
        tok = Tokenizer()
        tok.fit_on_texts(toy_corpus)
        pipe.tokenizer = tok
        pipe.build()
        return pipe

    def test_fit_fsdp_matches_fit_none(self, toy_corpus, rng):
        ids = [f"i{k}" for k in range(16)]
        desc = {
            i: [toy_corpus[k % len(toy_corpus)]]
            for k, i in enumerate(ids)
        }
        features = {
            i: rng.normal(size=(128,)).astype(np.float32) for i in ids
        }

        def run(parallelism):
            p = self._make_pipe(toy_corpus)
            hist = p.fit(
                desc,
                features,
                epochs=3,
                batch_size=16,
                parallelism=parallelism,
                log=None,
            )
            return p, hist

        p1, h1 = run("none")
        p8, h8 = run("fsdp")
        np.testing.assert_allclose(
            h1[-1]["loss"], h8[-1]["loss"], rtol=1e-4
        )
        # Post-fit params are gathered back to the canonical layout:
        # decode must produce identical captions through the public API.
        f4 = np.stack([features[i] for i in ids[:4]])
        assert p1.generate(f4) == p8.generate(f4)

    def test_fit_fsdp_checkpoint_and_val(self, toy_corpus, rng, tmp_path):
        # Exercises both per-epoch gather paths: eval_step on gathered
        # params (val_data) and checkpoint save of the gathered
        # TrainState (incl. the typed PRNG key leaf) — checkpoints must
        # restore through the standard canonical-layout template.
        from tpucap.checkpoint import CheckpointManager
        from tpucap.train import TrainState, build_optimizer

        ids = [f"i{k}" for k in range(16)]
        desc = {
            i: [toy_corpus[k % len(toy_corpus)]]
            for k, i in enumerate(ids)
        }
        features = {
            i: rng.normal(size=(128,)).astype(np.float32) for i in ids
        }
        p = self._make_pipe(toy_corpus)
        mgr = CheckpointManager(str(tmp_path / "c"), best_metric=None)
        hist = p.fit(
            desc,
            features,
            epochs=2,
            batch_size=16,
            parallelism="fsdp",
            checkpoint_manager=mgr,
            val_data=(desc, features),
            log=None,
        )
        mgr.close()
        assert "val_loss" in hist[-1]

        mgr2 = CheckpointManager(str(tmp_path / "c"), best_metric=None)
        template = TrainState.create(
            p.params["decoder"],
            build_optimizer(p.config.train),
            jax.random.key(0),
        )
        restored = mgr2.restore(template)
        mgr2.close()
        for a, b in zip(
            jax.tree_util.tree_leaves(restored.params),
            jax.tree_util.tree_leaves(p.params["decoder"]),
            strict=True,
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-6
            )

    def test_fit_fsdp_batch_divisibility(self, toy_corpus, rng):
        ids = [f"i{k}" for k in range(14)]
        desc = {
            i: [toy_corpus[k % len(toy_corpus)]]
            for k, i in enumerate(ids)
        }
        features = {
            i: rng.normal(size=(128,)).astype(np.float32) for i in ids
        }
        p = self._make_pipe(toy_corpus)
        with pytest.raises(ValueError, match="divide"):
            p.fit(
                desc,
                features,
                epochs=1,
                batch_size=14,
                parallelism="fsdp",
                log=None,
            )
