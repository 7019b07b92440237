"""Sequence-parallel ring attention (parallel/sp.py) on the virtual
8-device CPU mesh: the ring's online-softmax causal attention + local
CE must reproduce the single-device teacher-forced step (loss AND SGD
parameter update) up to f32 softmax reassociation."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import Mesh

from tpucap.models.decoders import build_decoder
from tpucap.parallel.sp import make_sp_train_step
from tpucap.train import TrainState, make_train_step

VOCAB, FEAT, HID = 21, 9, 16
B, T = 6, 17  # teacher-forced length 16 divides 8/4/2-way rings
START, PAD = 1, 0


def setup(spatial=False):
    dec = build_decoder(
        "transformer",
        vocab_size=VOCAB,
        feature_dim=FEAT,
        hidden_dim=HID,
        num_layers=2,
        num_heads=2,
        mlp_dim=32,
        max_positions=T,
    )
    params = dec.init(jax.random.key(0))
    rng = np.random.default_rng(0)
    shape = (B, 3, FEAT) if spatial else (B, FEAT)
    feats = rng.normal(size=shape).astype(np.float32)
    tokens = rng.integers(1, VOCAB, size=(B, T)).astype(np.int32)
    tokens[:, 0] = START
    tokens[:, -3:] = PAD  # ragged tail: pads fall in the LAST ring block
    return dec, params, feats, tokens


def seq_mesh(n):
    return Mesh(np.asarray(jax.devices()[:n]), ("seq",))


@pytest.mark.parametrize("n_shards", [2, 4, 8])
@pytest.mark.parametrize("spatial", [False, True])
def test_sp_update_matches_single_device(n_shards, spatial):
    dec, params, feats, tokens = setup(spatial=spatial)
    optimizer = optax.sgd(0.5)
    single = make_train_step(dec, optimizer, deterministic=True)
    s1 = TrainState.create(params, optimizer, jax.random.key(1))
    s1, m1 = single(s1, jnp.asarray(feats), jnp.asarray(tokens))

    sp = make_sp_train_step(
        dec, optimizer, seq_mesh(n_shards), deterministic=True
    )
    s8 = TrainState.create(params, optimizer, jax.random.key(1))
    s8, m8 = sp(s8, jnp.asarray(feats), jnp.asarray(tokens))

    np.testing.assert_allclose(
        float(m1["loss"]), float(m8["loss"]), rtol=1e-5
    )
    np.testing.assert_allclose(
        float(m1["tokens"]), float(m8["tokens"])
    )
    for a, b in zip(
        jax.tree.leaves(s1.params),
        jax.tree.leaves(jax.device_get(s8.params)),
        strict=True,
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)


def test_sp_2d_data_seq_mesh():
    dec, params, feats, tokens = setup()
    optimizer = optax.sgd(0.5)
    single = make_train_step(dec, optimizer, deterministic=True)
    s1 = TrainState.create(params, optimizer, jax.random.key(1))
    s1, m1 = single(s1, jnp.asarray(feats), jnp.asarray(tokens))

    mesh = Mesh(
        np.asarray(jax.devices()[:8]).reshape(2, 4), ("data", "seq")
    )
    sp = make_sp_train_step(
        dec, optimizer, mesh, data_axis="data", deterministic=True
    )
    s8 = TrainState.create(params, optimizer, jax.random.key(1))
    s8, m8 = sp(s8, jnp.asarray(feats), jnp.asarray(tokens))
    np.testing.assert_allclose(
        float(m1["loss"]), float(m8["loss"]), rtol=1e-5
    )
    for a, b in zip(
        jax.tree.leaves(s1.params),
        jax.tree.leaves(jax.device_get(s8.params)),
        strict=True,
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)


def test_sp_multi_step_descends_with_dropout():
    dec, params, feats, tokens = setup()
    optimizer = optax.adam(1e-2)
    sp = make_sp_train_step(dec, optimizer, seq_mesh(4), deterministic=False)
    state = TrainState.create(params, optimizer, jax.random.key(2))
    first = None
    for _ in range(15):
        state, metrics = sp(state, jnp.asarray(feats), jnp.asarray(tokens))
        loss = float(metrics["loss"])
        assert np.isfinite(loss)
        if first is None:
            first = loss
    assert loss < first


def test_fit_sp_non_transformer_friendly_error():
    """fit(parallelism='sp') with an LSTM decoder raises the designed
    family ValueError (not an AttributeError from the pad block)."""
    from tpucap.config import (
        Config,
        DecodeConfig,
        DecoderConfig,
        EncoderConfig,
    )
    from tpucap.pipeline import CaptioningPipeline
    from tpucap.text.tokenizer import Tokenizer

    cfg = Config(
        encoder=EncoderConfig(name="tiny_cnn", feature_dim=32),
        decoder=DecoderConfig(name="lstm1", embed_dim=8, hidden_dim=16),
        decode=DecodeConfig(max_len=10),
        precision="f32",
    )
    pipe = CaptioningPipeline(cfg)
    tok = Tokenizer()
    tok.fit_on_texts(["startseq a dog runs endseq"])
    pipe.tokenizer = tok
    pipe.build()
    desc = {"i0": ["startseq a dog runs endseq"]}
    feats = {"i0": np.zeros((32,), np.float32)}
    with pytest.raises(ValueError, match="transformer decoder"):
        pipe.fit(desc, feats, epochs=1, batch_size=1, parallelism="sp",
                 log=None)


def test_sp_validation_errors():
    dec, params, feats, tokens = setup()
    mesh = seq_mesh(8)
    lstm = build_decoder(
        "lstm1", vocab_size=VOCAB, feature_dim=FEAT, embed_dim=8,
        hidden_dim=HID,
    )
    with pytest.raises(ValueError, match="sequence axis"):
        make_sp_train_step(lstm, optax.sgd(0.1), mesh)
    moe = build_decoder(
        "transformer", vocab_size=VOCAB, feature_dim=FEAT, hidden_dim=HID,
        num_heads=2, mlp_dim=32, max_positions=T, num_experts=4,
    )
    with pytest.raises(NotImplementedError, match="load-balance"):
        make_sp_train_step(moe, optax.sgd(0.1), mesh)
    # T-1 not divisible by the ring -> trace-time error
    sp = make_sp_train_step(dec, optax.sgd(0.1), mesh)
    state = TrainState.create(params, optax.sgd(0.1), jax.random.key(1))
    bad = np.concatenate([tokens, tokens[:, -1:]], axis=1)  # Tin = 17
    with pytest.raises(ValueError, match="not"):
        sp(state, jnp.asarray(feats), jnp.asarray(bad))
