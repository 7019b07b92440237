"""Pipeline-parallel training (parallel/pp.py) on the virtual 8-device
CPU mesh: the GPipe microbatch schedule + stage-sharded layer stack must
reproduce the single-device teacher-forced step exactly (loss AND the
SGD parameter update), for 1-D stage meshes and 2-D (data, stage) meshes,
across microbatch counts including the degenerate M=1.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import Mesh

from tpucap.models.decoders import build_decoder
from tpucap.parallel.pp import (
    make_pp_train_step,
    stack_pp_layers,
    unstack_pp_layers,
)
from tpucap.train import TrainState, make_train_step

VOCAB, FEAT, HID = 21, 9, 16
B, T = 16, 8
START, PAD = 1, 0


def setup(num_layers=4, spatial=False):
    dec = build_decoder(
        "transformer",
        vocab_size=VOCAB,
        feature_dim=FEAT,
        hidden_dim=HID,
        num_layers=num_layers,
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
    tokens[:, -2:] = PAD  # some padding
    return dec, params, feats, tokens


def stage_mesh(n):
    return Mesh(np.asarray(jax.devices()[:n]), ("stage",))


def test_stack_unstack_roundtrip():
    dec, params, _, _ = setup()
    stacked = stack_pp_layers(params)
    leaf = jax.tree_util.tree_leaves(stacked["layers"])[0]
    assert leaf.shape[0] == dec.num_layers
    back = unstack_pp_layers(stacked)
    assert jax.tree_util.tree_structure(
        back
    ) == jax.tree_util.tree_structure(params)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("num_microbatches", [1, 2, 4, 8])
@pytest.mark.parametrize("spatial", [False, True])
def test_pp_update_matches_single_device(num_microbatches, spatial):
    """4 stages x 1 layer each; SGD so the post-step param delta is the
    gradient itself — pipeline AD (through scan + ppermute) must equal
    the plain teacher-forced backward."""
    dec, params, feats, tokens = setup(num_layers=4, spatial=spatial)
    optimizer = optax.sgd(0.5)

    single = make_train_step(dec, optimizer, deterministic=True)
    s1 = TrainState.create(params, optimizer, jax.random.key(1))
    s1, m1 = single(s1, jnp.asarray(feats), jnp.asarray(tokens))

    mesh = stage_mesh(4)
    pp = make_pp_train_step(
        dec,
        optimizer,
        mesh,
        num_microbatches=num_microbatches,
        deterministic=True,
    )
    sp = TrainState.create(
        stack_pp_layers(params), optimizer, jax.random.key(1)
    )
    sp, mp = pp(sp, jnp.asarray(feats), jnp.asarray(tokens))

    np.testing.assert_allclose(
        float(m1["loss"]), float(mp["loss"]), rtol=1e-5
    )
    np.testing.assert_allclose(
        float(m1["accuracy"]), float(mp["accuracy"]), rtol=1e-6
    )
    got = unstack_pp_layers(jax.device_get(sp.params))
    for p1, p8 in zip(
        jax.tree_util.tree_leaves(s1.params),
        jax.tree_util.tree_leaves(got),
        strict=True,
    ):
        np.testing.assert_allclose(
            np.asarray(p1), np.asarray(p8), atol=2e-5
        )


def test_pp_eight_stages_two_layers_each():
    """Full-width pipeline: 8 stages, 16 layers (2 per stage)."""
    dec, params, feats, tokens = setup(num_layers=16)
    optimizer = optax.sgd(0.1)
    single = make_train_step(dec, optimizer, deterministic=True)
    s1 = TrainState.create(params, optimizer, jax.random.key(1))
    s1, m1 = single(s1, jnp.asarray(feats), jnp.asarray(tokens))

    pp = make_pp_train_step(
        dec, optimizer, stage_mesh(8), deterministic=True
    )
    sp = TrainState.create(
        stack_pp_layers(params), optimizer, jax.random.key(1)
    )
    sp, mp = pp(sp, jnp.asarray(feats), jnp.asarray(tokens))
    np.testing.assert_allclose(
        float(m1["loss"]), float(mp["loss"]), rtol=1e-5
    )
    got = unstack_pp_layers(jax.device_get(sp.params))
    for p1, p8 in zip(
        jax.tree.leaves(s1.params), jax.tree.leaves(got), strict=True
    ):
        np.testing.assert_allclose(np.asarray(p1), np.asarray(p8), atol=2e-5)


def test_pp_2d_data_stage_mesh():
    """(data=2, stage=4): each data shard pipelines its half of the batch;
    reductions cross both axes. Must still equal single-device."""
    dec, params, feats, tokens = setup(num_layers=4)
    optimizer = optax.sgd(0.5)
    single = make_train_step(dec, optimizer, deterministic=True)
    s1 = TrainState.create(params, optimizer, jax.random.key(1))
    s1, m1 = single(s1, jnp.asarray(feats), jnp.asarray(tokens))

    mesh = Mesh(
        np.asarray(jax.devices()[:8]).reshape(2, 4), ("data", "stage")
    )
    pp = make_pp_train_step(
        dec,
        optimizer,
        mesh,
        data_axis="data",
        num_microbatches=2,
        deterministic=True,
    )
    sp = TrainState.create(
        stack_pp_layers(params), optimizer, jax.random.key(1)
    )
    sp, mp = pp(sp, jnp.asarray(feats), jnp.asarray(tokens))
    np.testing.assert_allclose(
        float(m1["loss"]), float(mp["loss"]), rtol=1e-5
    )
    got = unstack_pp_layers(jax.device_get(sp.params))
    for p1, p8 in zip(
        jax.tree.leaves(s1.params), jax.tree.leaves(got), strict=True
    ):
        np.testing.assert_allclose(np.asarray(p1), np.asarray(p8), atol=2e-5)


def test_pp_multi_step_descends_with_dropout():
    """adam + dropout: the pipeline step trains (loss decreases) and the
    dropout path stays finite across steps."""
    dec, params, feats, tokens = setup(num_layers=4)
    optimizer = optax.adam(1e-2)
    pp = make_pp_train_step(
        dec, optimizer, stage_mesh(4), deterministic=False
    )
    state = TrainState.create(
        stack_pp_layers(params), optimizer, jax.random.key(2)
    )
    first = None
    for _ in range(15):
        state, metrics = pp(state, jnp.asarray(feats), jnp.asarray(tokens))
        loss = float(metrics["loss"])
        assert np.isfinite(loss)
        if first is None:
            first = loss
    assert loss < first


def test_pp_validation_errors():
    dec, params, feats, tokens = setup(num_layers=4)
    with pytest.raises(ValueError, match="not divisible"):
        make_pp_train_step(dec, optax.sgd(0.1), stage_mesh(3))
    with pytest.raises(ValueError, match="num_microbatches"):
        make_pp_train_step(
            dec, optax.sgd(0.1), stage_mesh(4), num_microbatches=0
        )
    # batch not divisible by microbatches -> raises at trace time
    pp = make_pp_train_step(
        dec, optax.sgd(0.1), stage_mesh(4), num_microbatches=5
    )
    state = TrainState.create(
        stack_pp_layers(params), optax.sgd(0.1), jax.random.key(1)
    )
    with pytest.raises(ValueError, match="microbatch"):
        pp(state, jnp.asarray(feats), jnp.asarray(tokens))
