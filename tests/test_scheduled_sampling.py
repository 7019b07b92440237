"""Scheduled sampling (train/scheduled.py — Bengio et al. 2015 in the
parallel two-pass form): mixing contracts (eps=0 exactness, eps=1 full
replacement, startseq/pad invariants, pad-prediction guard), the ramp
schedules, step-level exactness at eps=0 (plain / grad-accum / DP), and
the pipeline fit surface incl. the per-epoch ramp in history."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from tpucap.core import make_mesh
from tpucap.models.decoders import build_decoder
from tpucap.parallel import make_dp_train_step
from tpucap.train import TrainState, make_train_step
from tpucap.train.scheduled import epsilon_for_epoch, scheduled_inputs

VOCAB, FEAT = 23, 12
B, T = 8, 11
START, PAD = 1, 0


def setup(name="lstm1", **kw):
    dec = build_decoder(
        name,
        vocab_size=VOCAB,
        feature_dim=FEAT,
        embed_dim=8,
        hidden_dim=16,
        dropout_rate=0.0,
        **kw,
    )
    params = dec.init(jax.random.key(0))
    rng = np.random.default_rng(0)
    feats = rng.normal(size=(B, FEAT)).astype(np.float32)
    tokens = rng.integers(2, VOCAB, size=(B, T)).astype(np.int32)
    tokens[:, 0] = START
    for i in range(B):  # ragged padding
        tokens[i, max(2, T - 1 - i) :] = PAD
    return dec, params, feats, tokens


# -- mixing contracts ------------------------------------------------------


def test_eps0_is_identity():
    dec, params, feats, tokens = setup()
    inputs = jnp.asarray(tokens[:, :-1])
    mixed = scheduled_inputs(
        dec, params, jnp.asarray(feats), inputs,
        eps=jnp.float32(0.0), rng=jax.random.key(7),
    )
    np.testing.assert_array_equal(np.asarray(mixed), np.asarray(inputs))


def test_eps1_replaces_every_eligible_position():
    dec, params, feats, tokens = setup()
    inputs = jnp.asarray(tokens[:, :-1])
    logits = dec.forward_train(
        params, jnp.asarray(feats), inputs, deterministic=True
    )
    preds = np.asarray(jnp.argmax(logits, axis=-1))
    mixed = np.asarray(
        scheduled_inputs(
            dec, params, jnp.asarray(feats), inputs,
            eps=jnp.float32(1.0), rng=jax.random.key(7),
        )
    )
    gold = np.asarray(inputs)
    # position 0 (startseq) never replaced
    np.testing.assert_array_equal(mixed[:, 0], gold[:, 0])
    for b in range(B):
        for t in range(1, gold.shape[1]):
            if gold[b, t] == PAD:
                assert mixed[b, t] == PAD  # pads stay pad
            elif preds[b, t - 1] == PAD:
                assert mixed[b, t] == gold[b, t]  # pad preds never injected
            else:
                assert mixed[b, t] == preds[b, t - 1]


def test_pad_prediction_guard():
    """Force the head to argmax the reserved pad column everywhere: with
    eps=1 the mix must leave the gold inputs untouched (a fabricated
    mid-sequence pad would corrupt masking downstream)."""
    dec, params, feats, tokens = setup()
    params = jax.tree_util.tree_map(lambda x: x, params)
    params["out"] = dict(params["out"])
    params["out"]["bias"] = (
        params["out"]["bias"].at[PAD].set(1e9)
    )
    inputs = jnp.asarray(tokens[:, :-1])
    mixed = scheduled_inputs(
        dec, params, jnp.asarray(feats), inputs,
        eps=jnp.float32(1.0), rng=jax.random.key(3),
    )
    np.testing.assert_array_equal(np.asarray(mixed), np.asarray(inputs))


def test_intermediate_eps_mixes_some():
    """At eps=0.5 some eligible positions flip and some stay — and every
    value is either the gold token or the model's prediction."""
    dec, params, feats, tokens = setup()
    inputs = jnp.asarray(tokens[:, :-1])
    logits = dec.forward_train(
        params, jnp.asarray(feats), inputs, deterministic=True
    )
    preds = np.asarray(jnp.argmax(logits, axis=-1))
    mixed = np.asarray(
        scheduled_inputs(
            dec, params, jnp.asarray(feats), inputs,
            eps=jnp.float32(0.5), rng=jax.random.key(11),
        )
    )
    gold = np.asarray(inputs)
    flipped = kept = 0
    for b in range(B):
        for t in range(1, gold.shape[1]):
            if gold[b, t] == PAD:
                continue
            assert mixed[b, t] in (gold[b, t], preds[b, t - 1])
            if mixed[b, t] == gold[b, t]:
                kept += 1
            else:
                flipped += 1
    assert flipped > 0 and kept > 0


# -- schedules -------------------------------------------------------------


def test_schedules():
    lin = [
        epsilon_for_epoch(e, 5, max_eps=0.4, schedule="linear")
        for e in range(5)
    ]
    assert lin[0] == 0.0 and abs(lin[-1] - 0.4) < 1e-12
    assert all(b > a for a, b in zip(lin, lin[1:]))

    const = epsilon_for_epoch(0, 5, max_eps=0.3, schedule="constant")
    assert const == 0.3

    sig = [
        epsilon_for_epoch(e, 40, max_eps=0.5, schedule="inv_sigmoid")
        for e in range(40)
    ]
    assert sig[0] == 0.0  # epoch 0 is pure teacher forcing, exactly
    assert all(b > a for a, b in zip(sig, sig[1:]))  # monotone
    assert all(s < 0.5 for s in sig)  # asymptotes below max

    with pytest.raises(ValueError, match="ss_schedule"):
        epsilon_for_epoch(0, 5, max_eps=0.1, schedule="bogus")


# -- step-level exactness at eps=0 ------------------------------------------


def _run(step, params, feats, tokens, optimizer, *extra):
    state = TrainState.create(params, optimizer, jax.random.key(1))
    state, metrics = step(
        state, jnp.asarray(feats), jnp.asarray(tokens), *extra
    )
    return jax.device_get(state.params), jax.device_get(metrics)


@pytest.mark.parametrize("accum", [1, 2])
def test_eps0_step_matches_plain_teacher_forcing(accum):
    """With eps=0 the mixed inputs equal the gold inputs, so the ss step
    must produce the plain step's update exactly (dropout_rate=0 — the
    extra rng split cannot matter)."""
    dec, params, feats, tokens = setup()
    optimizer = optax.sgd(0.5)
    plain = make_train_step(
        dec, optimizer, deterministic=True, grad_accum_steps=accum
    )
    ss = make_train_step(
        dec, optimizer, deterministic=True, grad_accum_steps=accum,
        scheduled_sampling=True,
    )
    p1, m1 = _run(plain, params, feats, tokens, optimizer)
    p2, m2 = _run(ss, params, feats, tokens, optimizer, jnp.float32(0.0))
    np.testing.assert_allclose(m1["loss"], m2["loss"], rtol=1e-6)
    for a, b in zip(
        jax.tree.leaves(p1), jax.tree.leaves(p2), strict=True
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-6)


def test_eps1_step_changes_loss():
    """Full self-prediction feeds different inputs, so the loss differs
    from teacher forcing (sanity that the traced eps actually reaches
    the mix — same compiled program, different scalar)."""
    dec, params, feats, tokens = setup()
    optimizer = optax.sgd(0.1)
    ss = make_train_step(
        dec, optimizer, deterministic=True, scheduled_sampling=True
    )
    _, m0 = _run(ss, params, feats, tokens, optimizer, jnp.float32(0.0))
    _, m1 = _run(ss, params, feats, tokens, optimizer, jnp.float32(1.0))
    assert np.isfinite(m1["loss"])
    assert abs(float(m0["loss"]) - float(m1["loss"])) > 1e-6


def test_dp_eps0_matches_single_device():
    dec, params, feats, tokens = setup()
    optimizer = optax.sgd(0.5)
    mesh = make_mesh(8)
    dp = make_dp_train_step(
        dec, optimizer, mesh, deterministic=True, scheduled_sampling=True
    )
    single = make_train_step(dec, optimizer, deterministic=True)
    p1, m1 = _run(single, params, feats, tokens, optimizer)
    p2, m2 = _run(dp, params, feats, tokens, optimizer, jnp.float32(0.0))
    np.testing.assert_allclose(m1["loss"], m2["loss"], rtol=1e-6)
    for a, b in zip(
        jax.tree.leaves(p1), jax.tree.leaves(p2), strict=True
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-6)


def test_dp_eps_positive_runs():
    dec, params, feats, tokens = setup()
    optimizer = optax.adam(1e-3)
    # 4-way mesh: per-shard batch 2 splits into 2 accumulation
    # microbatches — ss + accum + dp composed.
    mesh = make_mesh(4)
    dp = make_dp_train_step(
        dec, optimizer, mesh, scheduled_sampling=True, grad_accum_steps=2
    )
    _, m = _run(dp, params, feats, tokens, optimizer, jnp.float32(0.7))
    assert np.isfinite(m["loss"])


def test_fsdp_eps0_matches_single_device():
    """ss under fsdp (r4): eps=0 is exactly teacher forcing — the fsdp
    step equals the plain single-device step, the dp recipe's bar."""
    from tpucap.parallel import make_fsdp_train_step, shard_fsdp_tree
    from tpucap.parallel.fsdp import fsdp_gather_tree

    dec, params, feats, tokens = setup()
    optimizer = optax.sgd(0.5)
    mesh = make_mesh(8)
    single = make_train_step(dec, optimizer, deterministic=True)
    p1, m1 = _run(single, params, feats, tokens, optimizer)

    template = TrainState.create(params, optimizer, jax.random.key(1))
    fsdp = make_fsdp_train_step(
        dec, optimizer, mesh, template, deterministic=True,
        scheduled_sampling=True, min_size=64,
    )
    from tpucap.core import shard_batch

    state = shard_fsdp_tree(template, mesh, min_size=64)
    bf, bt = shard_batch(mesh, (jnp.asarray(feats), jnp.asarray(tokens)))
    state, m2 = fsdp(state, bf, bt, jnp.float32(0.0))
    np.testing.assert_allclose(m1["loss"], m2["loss"], rtol=1e-6)
    for a, b in zip(
        jax.tree.leaves(p1),
        jax.tree.leaves(jax.device_get(fsdp_gather_tree(state.params, mesh))),
        strict=True,
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-6)


def test_fsdp_eps_positive_runs_and_accum_refuses(toy_corpus, rng):
    from tpucap.parallel import make_fsdp_train_step, shard_fsdp_tree

    dec, params, feats, tokens = setup()
    optimizer = optax.adam(1e-3)
    mesh = make_mesh(4)
    template = TrainState.create(params, optimizer, jax.random.key(1))
    fsdp = make_fsdp_train_step(
        dec, optimizer, mesh, template, scheduled_sampling=True,
        min_size=64,
    )
    from tpucap.core import shard_batch

    state = shard_fsdp_tree(template, mesh, min_size=64)
    bf, bt = shard_batch(mesh, (jnp.asarray(feats), jnp.asarray(tokens)))
    _, m = fsdp(state, bf, bt, jnp.float32(0.7))
    assert np.isfinite(float(m["loss"]))
    with pytest.raises(NotImplementedError, match="grad_accum"):
        make_fsdp_train_step(
            dec, optimizer, mesh, template, scheduled_sampling=True,
            grad_accum_steps=2,
        )
    # fit-level: the ramp trains under fsdp (8 rows for the 8-mesh).
    ids = [f"img{i}" for i in range(8)]
    descs = {
        i: [toy_corpus[k % len(toy_corpus)]] for k, i in enumerate(ids)
    }
    featmap = {
        i: rng.normal(size=(128,)).astype(np.float32) for i in ids
    }
    p = _pipe(toy_corpus, scheduled_sampling=0.5)
    hist = p.fit(
        descs, featmap, epochs=2, batch_size=8,
        parallelism="fsdp", log=None,
    )
    assert np.isfinite(hist[-1]["loss"]) and "ss_eps" in hist[-1]


@pytest.mark.parametrize("name", ["attention", "transformer"])
def test_other_families_smoke(name):
    """The two-pass recipe is decoder-agnostic: the SAT-regularized and
    transformer forwards train under full self-prediction."""
    kw = {"attention_dim": 12} if name == "attention" else {}
    dec, params, _, tokens = setup(name, **kw)
    rng = np.random.default_rng(2)
    feats = rng.normal(size=(B, 5, FEAT)).astype(np.float32)
    optimizer = optax.adam(1e-3)
    reg = 0.5 if name == "attention" else 0.0
    step = make_train_step(
        dec, optimizer, scheduled_sampling=True, attention_reg=reg
    )
    _, m = _run(step, params, feats, tokens, optimizer, jnp.float32(1.0))
    assert np.isfinite(m["loss"])


# -- pipeline surface --------------------------------------------------------


def _pipe(toy_corpus, **train_kw):
    from tpucap.config import (
        Config, DecodeConfig, DecoderConfig, EncoderConfig, TrainConfig,
    )
    from tpucap.pipeline import CaptioningPipeline
    from tpucap.text import Tokenizer

    cfg = Config(
        encoder=EncoderConfig(name="tiny_cnn", feature_dim=128),
        decoder=DecoderConfig(
            name="lstm1", embed_dim=8, hidden_dim=16, dropout_rate=0.0
        ),
        decode=DecodeConfig(max_len=8),
        train=TrainConfig(seed=0, **train_kw),
    )
    p = CaptioningPipeline(cfg)
    tok = Tokenizer()
    tok.fit_on_texts(toy_corpus)
    p.tokenizer = tok
    p.build()
    return p


def _toy_data(toy_corpus, rng):
    ids = [f"img{i}" for i in range(4)]
    feats = {i: rng.normal(size=(128,)).astype(np.float32) for i in ids}
    descs = {
        i: [toy_corpus[j % len(toy_corpus)]] for j, i in enumerate(ids)
    }
    return descs, feats


def test_fit_ramps_and_trains(toy_corpus, rng):
    p = _pipe(toy_corpus, scheduled_sampling=0.5, ss_schedule="linear")
    descs, feats = _toy_data(toy_corpus, rng)
    hist = p.fit(descs, feats, epochs=3, batch_size=2, log=None)
    assert [h["ss_eps"] for h in hist] == [0.0, 0.25, 0.5]
    assert all(np.isfinite(h["loss"]) for h in hist)
    caps = p.generate(np.stack([feats[i] for i in list(feats)[:2]]))
    assert len(caps) == 2


def test_fit_guards(toy_corpus, rng):
    descs, feats = _toy_data(toy_corpus, rng)
    p = _pipe(toy_corpus, scheduled_sampling=0.5)
    with pytest.raises(NotImplementedError, match="scheduled_sampling"):
        p.fit(descs, feats, epochs=1, batch_size=2,
              parallelism="tp", log=None)
    p2 = _pipe(toy_corpus, scheduled_sampling=1.5)
    with pytest.raises(ValueError, match="probability"):
        p2.fit(descs, feats, epochs=1, batch_size=2, log=None)
    p3 = _pipe(toy_corpus, scheduled_sampling=0.5, ss_schedule="bogus")
    with pytest.raises(ValueError, match="ss_schedule"):
        p3.fit(descs, feats, epochs=1, batch_size=2, log=None)


def test_loss_requires_rng():
    from tpucap.train.loss import caption_loss

    dec, params, feats, tokens = setup()
    with pytest.raises(ValueError, match="ss_rng"):
        caption_loss(
            dec, params, jnp.asarray(feats), jnp.asarray(tokens),
            ss_eps=jnp.float32(0.5),
        )
