"""Multi-step dispatch (make_*_train_step(multi_steps=N) /
TrainConfig.steps_per_dispatch): lax.scanning N optimizer steps inside
one compiled program must reproduce the EXACT per-step update sequence
(including rng threading for dropout and scheduled sampling) — only the
per-dispatch host overhead changes. Covers the single-device step, the
data-parallel shard_map step, composition with grad accumulation and
scheduled sampling, the fit-level trajectory (with an epoch tail shorter
than the group), and the CLI/config plumbing."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from tpucap.config import (
    Config,
    DecodeConfig,
    DecoderConfig,
    EncoderConfig,
    TrainConfig,
)
from tpucap.core import make_mesh, shard_batch, shard_stacked_batch
from tpucap.models.decoders import build_decoder
from tpucap.parallel import make_dp_train_step
from tpucap.pipeline import CaptioningPipeline
from tpucap.text import Tokenizer
from tpucap.train import TrainState, make_train_step

VOCAB, FEAT = 23, 12
N, B, T = 4, 8, 11
START, PAD = 1, 0


def setup(name="lstm1", **kw):
    dec = build_decoder(
        name,
        vocab_size=VOCAB,
        feature_dim=FEAT,
        embed_dim=8,
        hidden_dim=16,
        **kw,
    )
    params = dec.init(jax.random.key(0))
    rng = np.random.default_rng(0)
    feats = rng.normal(size=(N, B, FEAT)).astype(np.float32)
    tokens = rng.integers(1, VOCAB, size=(N, B, T)).astype(np.int32)
    tokens[:, :, 0] = START
    for i in range(B):  # ragged padding
        tokens[:, i, max(2, T - 1 - i) :] = PAD
    return dec, params, feats, tokens


def _assert_trees_equal(a, b, atol=0.0):
    for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b), strict=True):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=atol)


def _sequential(step, state, feats, tokens, ss_args=()):
    sums = {}
    for i in range(feats.shape[0]):
        state, m = step(
            state, jnp.asarray(feats[i]), jnp.asarray(tokens[i]), *ss_args
        )
        for k, v in m.items():
            sums[k] = sums.get(k, 0.0) + float(v)
    return state, sums


@pytest.mark.parametrize("dropout", [False, True])
def test_multistep_matches_sequential(dropout):
    """One scanned dispatch == N separate step calls: identical params,
    step counter, rng head, and summed metrics. dropout=True proves the
    per-step rng threading is the same sequence."""
    dec, params, feats, tokens = setup()
    opt = optax.adam(1e-3)
    single = make_train_step(dec, opt, deterministic=not dropout)
    multi = make_train_step(
        dec, opt, deterministic=not dropout, multi_steps=N
    )

    s1 = TrainState.create(params, opt, jax.random.key(1))
    s1, sums1 = _sequential(single, s1, feats, tokens)
    s2 = TrainState.create(params, opt, jax.random.key(1))
    s2, m2 = multi(s2, jnp.asarray(feats), jnp.asarray(tokens))

    assert int(s1.step) == int(s2.step) == N
    _assert_trees_equal(s1.params, s2.params, atol=1e-6)
    np.testing.assert_array_equal(
        jax.random.key_data(s1.rng), jax.random.key_data(s2.rng)
    )
    for k, v in sums1.items():
        np.testing.assert_allclose(float(m2[k]), v, rtol=1e-5)


def test_multistep_grad_accum_composes():
    dec, params, feats, tokens = setup()
    opt = optax.sgd(0.3)
    single = make_train_step(dec, opt, deterministic=True)
    multi = make_train_step(
        dec, opt, deterministic=True, grad_accum_steps=2, multi_steps=N
    )
    s1 = TrainState.create(params, opt, jax.random.key(1))
    s1, _ = _sequential(single, s1, feats, tokens)
    s2 = TrainState.create(params, opt, jax.random.key(1))
    s2, _ = multi(s2, jnp.asarray(feats), jnp.asarray(tokens))
    _assert_trees_equal(s1.params, s2.params, atol=2e-6)


def test_multistep_scheduled_sampling_matches():
    """ss coins are drawn from the carried state.rng — the scanned
    program must flip exactly the coins the per-step programs flip."""
    dec, params, feats, tokens = setup()
    opt = optax.sgd(0.3)
    kw = dict(deterministic=True, scheduled_sampling=True)
    single = make_train_step(dec, opt, **kw)
    multi = make_train_step(dec, opt, multi_steps=N, **kw)
    eps = (jnp.asarray(0.7, jnp.float32),)
    s1 = TrainState.create(params, opt, jax.random.key(1))
    s1, _ = _sequential(single, s1, feats, tokens, ss_args=eps)
    s2 = TrainState.create(params, opt, jax.random.key(1))
    s2, _ = multi(s2, jnp.asarray(feats), jnp.asarray(tokens), *eps)
    _assert_trees_equal(s1.params, s2.params, atol=1e-6)


def test_multistep_dp_matches_sequential():
    """DP multi-step: (N, B, ...) stacks sharded over the SECOND axis,
    scan inside shard_map — same updates as N dp dispatches."""
    mesh = make_mesh(8)
    dec, params, feats, tokens = setup()
    opt = optax.adam(1e-3)
    single = make_dp_train_step(dec, opt, mesh, deterministic=True)
    multi = make_dp_train_step(
        dec, opt, mesh, deterministic=True, multi_steps=N
    )
    s1 = TrainState.create(params, opt, jax.random.key(1))
    sums1 = {}
    for i in range(N):
        bf, bt = shard_batch(mesh, (feats[i], tokens[i]))
        s1, m = single(s1, bf, bt)
        for k, v in m.items():
            sums1[k] = sums1.get(k, 0.0) + float(v)
    s2 = TrainState.create(params, opt, jax.random.key(1))
    gf, gt = shard_stacked_batch(mesh, (feats, tokens))
    s2, m2 = multi(s2, gf, gt)
    assert int(s1.step) == int(s2.step) == N
    _assert_trees_equal(s1.params, s2.params, atol=1e-6)
    for k, v in sums1.items():
        np.testing.assert_allclose(float(m2[k]), v, rtol=1e-5)


def test_multistep_fsdp_matches_sequential():
    """FSDP multi-step (r4): the scan body is the sharded-state step —
    same updates and summed metrics as N fsdp dispatches."""
    from tpucap.parallel import (
        fsdp_gather_tree,
        make_fsdp_train_step,
        shard_fsdp_tree,
    )

    mesh = make_mesh(8)
    dec, params, feats, tokens = setup()
    opt = optax.adam(1e-3)
    template = TrainState.create(params, opt, jax.random.key(1))
    single = make_fsdp_train_step(
        dec, opt, mesh, template, deterministic=True, min_size=64
    )
    multi = make_fsdp_train_step(
        dec, opt, mesh, template, deterministic=True, min_size=64,
        multi_steps=N,
    )
    s1 = shard_fsdp_tree(template, mesh, min_size=64)
    sums1 = {}
    for i in range(N):
        bf, bt = shard_batch(mesh, (feats[i], tokens[i]))
        s1, m = single(s1, bf, bt)
        for k, v in m.items():
            sums1[k] = sums1.get(k, 0.0) + float(v)
    s2 = shard_fsdp_tree(template, mesh, min_size=64)
    gf, gt = shard_stacked_batch(mesh, (feats, tokens))
    s2, m2 = multi(s2, gf, gt)
    assert int(s1.step) == int(s2.step) == N
    _assert_trees_equal(
        jax.device_get(fsdp_gather_tree(s1.params, mesh)),
        jax.device_get(fsdp_gather_tree(s2.params, mesh)),
        atol=1e-6,
    )
    for k, v in sums1.items():
        np.testing.assert_allclose(float(m2[k]), v, rtol=1e-5)


def test_multistep_tp_matches_sequential():
    """tp multi-step (r5): scanning the vocab-parallel step body — the
    in-scan pmax/psum collectives are iteration-invariant — gives the
    same updates and summed metrics as N tp dispatches."""
    from jax.sharding import Mesh

    from tpucap.parallel.tp import make_tp_train_step

    mesh = Mesh(np.asarray(jax.devices()).reshape(8), ("model",))
    V8 = 32  # divisible by the 8-way vocab shard
    dec = build_decoder(
        "lstm1", vocab_size=V8, feature_dim=FEAT, embed_dim=8,
        hidden_dim=16,
    )
    params = dec.init(jax.random.key(0))
    rng = np.random.default_rng(0)
    feats = rng.normal(size=(N, B, FEAT)).astype(np.float32)
    tokens = rng.integers(1, V8, size=(N, B, T)).astype(np.int32)
    tokens[:, :, 0] = START
    tokens[:, :, -2:] = PAD
    opt = optax.adam(1e-3)
    single = make_tp_train_step(dec, opt, mesh, deterministic=True)
    multi = make_tp_train_step(
        dec, opt, mesh, deterministic=True, multi_steps=N
    )
    s1 = TrainState.create(params, opt, jax.random.key(1))
    s1, sums1 = _sequential(single, s1, feats, tokens)
    s2 = TrainState.create(params, opt, jax.random.key(1))
    s2, m2 = multi(s2, jnp.asarray(feats), jnp.asarray(tokens))
    assert int(s1.step) == int(s2.step) == N
    _assert_trees_equal(s1.params, s2.params, atol=1e-6)
    for k, v in sums1.items():
        np.testing.assert_allclose(float(m2[k]), v, rtol=1e-5)


def test_multistep_2d_dp_tp_matches_sequential():
    """2-D DPxTP multi-step: (N, B, ...) stacks sharded on the batch
    axis over 'data' while the CE shards vocab over 'model' — same
    updates as N 2-D dispatches."""
    from jax.sharding import Mesh

    from tpucap.parallel.tp import make_tp_train_step

    mesh = Mesh(
        np.asarray(jax.devices()).reshape(4, 2), ("data", "model")
    )
    V2 = 32
    dec = build_decoder(
        "lstm1", vocab_size=V2, feature_dim=FEAT, embed_dim=8,
        hidden_dim=16,
    )
    params = dec.init(jax.random.key(0))
    rng = np.random.default_rng(0)
    feats = rng.normal(size=(N, B, FEAT)).astype(np.float32)
    tokens = rng.integers(1, V2, size=(N, B, T)).astype(np.int32)
    tokens[:, :, 0] = START
    tokens[:, :, -2:] = PAD
    opt = optax.adam(1e-3)
    kw = dict(data_axis="data", deterministic=True)
    single = make_tp_train_step(dec, opt, mesh, **kw)
    multi = make_tp_train_step(dec, opt, mesh, multi_steps=N, **kw)
    s1 = TrainState.create(params, opt, jax.random.key(1))
    s1, sums1 = _sequential(single, s1, feats, tokens)
    s2 = TrainState.create(params, opt, jax.random.key(1))
    s2, m2 = multi(s2, jnp.asarray(feats), jnp.asarray(tokens))
    assert int(s1.step) == int(s2.step) == N
    _assert_trees_equal(s1.params, s2.params, atol=1e-6)
    for k, v in sums1.items():
        np.testing.assert_allclose(float(m2[k]), v, rtol=1e-5)


# ---------------------------------------------------------------- fit


FEAT_P = 32


def _pipe(toy_corpus, batch_size=4, **train_kw):
    cfg = Config(
        encoder=EncoderConfig(name="tiny_cnn", feature_dim=FEAT_P),
        decoder=DecoderConfig(embed_dim=16, hidden_dim=32),
        decode=DecodeConfig(max_len=10),
        train=TrainConfig(batch_size=batch_size, epochs=2, **train_kw),
    )
    pipe = CaptioningPipeline(cfg)
    tok = Tokenizer()
    tok.fit_on_texts(toy_corpus)
    pipe.tokenizer = tok
    pipe.build()
    return pipe


def _data(toy_corpus, rng, n=24):
    ids = [f"i{k}" for k in range(n)]
    desc = {
        i: [toy_corpus[k % len(toy_corpus)]] for k, i in enumerate(ids)
    }
    feats = {i: rng.normal(size=(FEAT_P,)).astype(np.float32) for i in ids}
    return desc, feats


@pytest.mark.parametrize("parallelism", ["none", "dp", "fsdp", "tp"])
def test_fit_steps_per_dispatch_trajectory(toy_corpus, parallelism):
    """fit(steps_per_dispatch=4) over epochs whose length is NOT a
    multiple of 4 (tail through the single-step program) reproduces the
    spd=1 trajectory: same per-epoch losses, same final params. The tp
    cell (r5) exercises the vocab-padded, vocab-parallel scan."""
    rng = np.random.default_rng(7)
    # 6 steps/epoch either way: one full group of 4 + a 2-step tail.
    bs = 4 if parallelism in ("none", "tp") else 8  # dp/fsdp: 8-mesh
    desc, feats = _data(toy_corpus, rng, n=6 * bs)

    base = _pipe(toy_corpus, batch_size=bs)
    h1 = base.fit(desc, feats, parallelism=parallelism, log=None)
    spd = _pipe(toy_corpus, batch_size=bs, steps_per_dispatch=4)
    h2 = spd.fit(desc, feats, parallelism=parallelism, log=None)

    assert [e.get("steps") for e in h1] == [e.get("steps") for e in h2]
    for a, b in zip(h1, h2, strict=True):
        np.testing.assert_allclose(a["loss"], b["loss"], rtol=1e-6)
    _assert_trees_equal(
        base.params["decoder"], spd.params["decoder"], atol=1e-6
    )


def test_fit_steps_per_dispatch_validation(toy_corpus):
    rng = np.random.default_rng(7)
    desc, feats = _data(toy_corpus, rng, n=8)
    with pytest.raises(NotImplementedError, match="steps_per_dispatch"):
        # pp amortizes dispatch over its own microbatch scan — the
        # composition is refused with that reason (tp composes as of
        # r5 and is covered by the trajectory test above).
        _pipe(toy_corpus, steps_per_dispatch=2).fit(
            desc, feats, parallelism="pp", log=None
        )
    with pytest.raises(NotImplementedError, match="ema_decay"):
        _pipe(toy_corpus, steps_per_dispatch=2, ema_decay=0.99).fit(
            desc, feats, log=None
        )
    with pytest.raises(ValueError, match="steps_per_dispatch"):
        _pipe(toy_corpus, steps_per_dispatch=0).fit(desc, feats, log=None)


def test_cli_train_flags_reach_trainconfig():
    """Regression for a dropped-knob class bug: on the non-preset CLI
    path --scheduled-sampling/--ss-schedule/--checkpoint-every-steps
    (and the new --steps-per-dispatch) were parsed but never copied
    into TrainConfig — training silently ran without them."""
    import importlib

    m = importlib.import_module("tpucap.cli.main")
    parser_args = [
        "--encoder", "tiny_cnn", "--max-len", "12",
        "--scheduled-sampling", "0.3", "--ss-schedule", "inv_sigmoid",
        "--checkpoint-every-steps", "7", "--steps-per-dispatch", "4",
    ]
    # Reuse the real parser by driving main() up to config construction.
    captured = {}
    orig = m._build_config

    def grab(args):
        captured["cfg"] = orig(args)
        raise SystemExit(0)

    from unittest import mock

    with mock.patch.object(m, "_build_config", grab):
        with pytest.raises(SystemExit):
            m.main(
                ["train", *parser_args, "--tokens", "x",
                 "--features", "y", "--checkpoint-dir", "z"]
            )
    t = captured["cfg"].train
    assert t.scheduled_sampling == 0.3
    assert t.ss_schedule == "inv_sigmoid"
    assert t.checkpoint_every_steps == 7
    assert t.steps_per_dispatch == 4


def test_multistep_tp_grad_accum_composes():
    """spd x grad-accum under tp: the steps-axis scan wraps the
    microbatch-accumulating body unchanged — N dispatches of the
    accumulating step equal one multi-step dispatch."""
    from jax.sharding import Mesh

    from tpucap.parallel.tp import make_tp_train_step

    mesh = Mesh(np.asarray(jax.devices()).reshape(8), ("model",))
    V8 = 32
    dec = build_decoder(
        "lstm1", vocab_size=V8, feature_dim=FEAT, embed_dim=8,
        hidden_dim=16,
    )
    params = dec.init(jax.random.key(0))
    rng = np.random.default_rng(0)
    feats = rng.normal(size=(N, B, FEAT)).astype(np.float32)
    tokens = rng.integers(1, V8, size=(N, B, T)).astype(np.int32)
    tokens[:, :, 0] = START
    tokens[:, :, -2:] = PAD
    opt = optax.adam(1e-3)
    kw = dict(deterministic=True, grad_accum_steps=2)
    single = make_tp_train_step(dec, opt, mesh, **kw)
    multi = make_tp_train_step(dec, opt, mesh, multi_steps=N, **kw)
    s1 = TrainState.create(params, opt, jax.random.key(1))
    s1, sums1 = _sequential(single, s1, feats, tokens)
    s2 = TrainState.create(params, opt, jax.random.key(1))
    s2, m2 = multi(s2, jnp.asarray(feats), jnp.asarray(tokens))
    _assert_trees_equal(s1.params, s2.params, atol=1e-6)
    for k, v in sums1.items():
        np.testing.assert_allclose(float(m2[k]), v, rtol=1e-5)
