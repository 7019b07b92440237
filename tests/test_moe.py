"""Mixture-of-experts transformer decoder + expert-parallel training
(models/decoders/transformer.py MoE blocks, parallel/ep.py) on the
virtual 8-device CPU mesh. The load-bearing contract: the EP-sharded
step must reproduce the single-device MoE update exactly, and the MoE
decode step must stay consistent with the teacher-forced forward (the
same incremental-equals-full contract the dense family pins)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import Mesh

from tpucap.decode import beam_decode, greedy_decode
from tpucap.models.decoders import TransformerDecoder, build_decoder
from tpucap.parallel.ep import make_ep_train_step
from tpucap.train import TrainState
from tpucap.train.loss import masked_cross_entropy_sums

VOCAB, FEAT, HID = 21, 9, 16
B, T = 16, 8
START, END, PAD = 1, 2, 0
AUX_W = 0.01


def make_moe(num_experts=8, top_k=2, num_layers=2):
    return build_decoder(
        "transformer",
        vocab_size=VOCAB,
        feature_dim=FEAT,
        hidden_dim=HID,
        num_layers=num_layers,
        num_heads=2,
        mlp_dim=32,
        max_positions=T,
        num_experts=num_experts,
        moe_top_k=top_k,
    )


def data(seed=0):
    rng = np.random.default_rng(seed)
    feats = rng.normal(size=(B, FEAT)).astype(np.float32)
    tokens = rng.integers(1, VOCAB, size=(B, T)).astype(np.int32)
    tokens[:, 0] = START
    tokens[:, -2:] = PAD
    return feats, tokens


def single_device_moe_step(dec, params, optimizer, feats, tokens):
    """Oracle: one SGD step on CE + AUX_W * switch-aux, no mesh."""

    def loss_fn(p):
        logits, aux = dec.forward_train_with_moe_aux(
            p, feats, tokens[:, :-1], deterministic=True
        )
        nll, n_tok, _ = masked_cross_entropy_sums(
            logits, tokens[:, 1:], pad_id=PAD
        )
        return nll / jnp.maximum(n_tok, 1.0) + AUX_W * aux

    loss, grads = jax.value_and_grad(loss_fn)(params)
    updates, _ = optimizer.update(grads, optimizer.init(params), params)
    return loss, optax.apply_updates(params, updates)


def test_moe_param_tree_and_validation():
    dec = make_moe(num_experts=4, top_k=2)
    params = dec.init(jax.random.key(0))
    layer = params["layers"][0]
    assert layer["moe_in"]["kernel"].shape == (4, HID, 32)
    assert layer["moe_out"]["kernel"].shape == (4, 32, HID)
    assert layer["router"]["kernel"].shape == (HID, 4)
    assert "mlp_in" not in layer
    with pytest.raises(ValueError, match="moe_top_k"):
        TransformerDecoder(
            vocab_size=VOCAB,
            feature_dim=FEAT,
            num_experts=4,
            moe_top_k=5,
        )


def test_moe_top1_equals_manual_expert_pick():
    """top_k=1: the block's output must be exactly the argmax expert's
    MLP output (gate renormalizes to 1.0), token by token."""
    dec = make_moe(num_experts=4, top_k=1)
    params = dec.init(jax.random.key(1))
    layer = params["layers"][0]
    h = jax.random.normal(jax.random.key(2), (5, 3, HID))
    y, aux = dec._mlp_block(layer, h)
    from tpucap.models.layers import dense

    logits = dense(layer["router"], h)
    pick = np.asarray(jnp.argmax(logits, axis=-1))
    w_in, b_in = layer["moe_in"]["kernel"], layer["moe_in"]["bias"]
    w_out, b_out = layer["moe_out"]["kernel"], layer["moe_out"]["bias"]
    y = np.asarray(y)
    for i in range(5):
        for t in range(3):
            e = pick[i, t]
            act = jax.nn.gelu(h[i, t] @ w_in[e] + b_in[e])
            want = np.asarray(act @ w_out[e] + b_out[e])
            np.testing.assert_allclose(y[i, t], want, atol=1e-5)
    assert float(aux) > 0.0


def test_moe_decode_step_matches_forward():
    """Incremental KV-cached stepping == teacher-forced forward for the
    MoE family (same contract as the dense transformer)."""
    dec = make_moe()
    params = dec.init(jax.random.key(3))
    feats, tokens = data(seed=4)
    feats, tokens = jnp.asarray(feats), jnp.asarray(tokens)
    full = dec.forward_train(params, feats, tokens[:, :-1])

    state = dec.init_state(params, feats)
    for t in range(T - 1):
        logits, state = dec.step(params, state, tokens[:, t])
        np.testing.assert_allclose(
            np.asarray(logits), np.asarray(full[:, t]), atol=1e-4
        )


def test_moe_greedy_and_beam_decode_run():
    dec = make_moe()
    params = dec.init(jax.random.key(5))
    feats, _ = data(seed=6)
    state = dec.init_state(params, jnp.asarray(feats))
    g = greedy_decode(
        dec.step, params, state, start_id=START, end_id=END, max_len=T
    )
    assert g.tokens.shape == (B, T)
    state = dec.init_state(params, jnp.asarray(feats))
    b = beam_decode(
        dec.step,
        params,
        state,
        start_id=START,
        end_id=END,
        max_len=T,
        beam_width=3,
    )
    assert b.tokens.shape == (B, T)


@pytest.mark.parametrize("n_shards,num_experts", [(8, 8), (4, 8), (2, 4)])
def test_ep_update_matches_single_device(n_shards, num_experts):
    dec = make_moe(num_experts=num_experts)
    params = dec.init(jax.random.key(7))
    feats, tokens = data(seed=8)
    optimizer = optax.sgd(0.5)
    loss1, p1 = single_device_moe_step(
        dec, params, optimizer, jnp.asarray(feats), jnp.asarray(tokens)
    )

    mesh = Mesh(np.asarray(jax.devices()[:n_shards]), ("expert",))
    ep = make_ep_train_step(
        dec, optimizer, mesh, moe_aux_weight=AUX_W, deterministic=True
    )
    state = TrainState.create(params, optimizer, jax.random.key(9))
    state, metrics = ep(state, jnp.asarray(feats), jnp.asarray(tokens))

    np.testing.assert_allclose(
        float(loss1), float(metrics["loss"]), rtol=1e-5
    )
    assert float(metrics["moe_aux"]) > 0.0
    for a, b in zip(
        jax.tree.leaves(p1), jax.tree.leaves(jax.device_get(state.params)),
        strict=True,
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_ep_2d_data_expert_mesh():
    dec = make_moe(num_experts=4)
    params = dec.init(jax.random.key(10))
    feats, tokens = data(seed=11)
    optimizer = optax.sgd(0.5)
    loss1, p1 = single_device_moe_step(
        dec, params, optimizer, jnp.asarray(feats), jnp.asarray(tokens)
    )

    mesh = Mesh(
        np.asarray(jax.devices()[:8]).reshape(2, 4), ("data", "expert")
    )
    ep = make_ep_train_step(
        dec,
        optimizer,
        mesh,
        data_axis="data",
        moe_aux_weight=AUX_W,
        deterministic=True,
    )
    state = TrainState.create(params, optimizer, jax.random.key(12))
    state, metrics = ep(state, jnp.asarray(feats), jnp.asarray(tokens))
    np.testing.assert_allclose(
        float(loss1), float(metrics["loss"]), rtol=1e-5
    )
    for a, b in zip(
        jax.tree.leaves(p1), jax.tree.leaves(jax.device_get(state.params)),
        strict=True,
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_ep_multi_step_descends_with_dropout():
    dec = make_moe(num_experts=4)
    params = dec.init(jax.random.key(13))
    feats, tokens = data(seed=14)
    optimizer = optax.adam(1e-2)
    mesh = Mesh(np.asarray(jax.devices()[:4]), ("expert",))
    ep = make_ep_train_step(dec, optimizer, mesh, deterministic=False)
    state = TrainState.create(params, optimizer, jax.random.key(15))
    first = None
    for _ in range(15):
        state, metrics = ep(state, jnp.asarray(feats), jnp.asarray(tokens))
        loss = float(metrics["loss"])
        assert np.isfinite(loss)
        if first is None:
            first = loss
    assert loss < first


def test_ep_validation_errors():
    dense_dec = build_decoder(
        "transformer",
        vocab_size=VOCAB,
        feature_dim=FEAT,
        hidden_dim=HID,
        num_heads=2,
        mlp_dim=32,
        max_positions=T,
    )
    mesh = Mesh(np.asarray(jax.devices()[:4]), ("expert",))
    with pytest.raises(ValueError, match="dense MLP"):
        make_ep_train_step(dense_dec, optax.sgd(0.1), mesh)
    with pytest.raises(ValueError, match="not divisible"):
        make_ep_train_step(make_moe(num_experts=6), optax.sgd(0.1), mesh)


def test_pp_rejects_moe():
    from tpucap.parallel.pp import make_pp_train_step

    mesh = Mesh(np.asarray(jax.devices()[:2]), ("stage",))
    with pytest.raises(NotImplementedError, match="load-balance"):
        make_pp_train_step(make_moe(num_experts=4), optax.sgd(0.1), mesh)
