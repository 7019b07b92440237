"""Tensor-parallel vocab-sharded beam decode: token-exact vs the
single-device engine on the virtual 8-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpucap.core.mesh import Mesh
from tpucap.decode import beam_decode
from tpucap.models.decoders import build_decoder
from tpucap.parallel.tp import make_tp_beam_fn

VOCAB, FEAT, EMB, HID = 32, 9, 8, 16  # vocab divisible by 8 shards
B, START, END, MAXLEN = 6, 1, 2, 11


@pytest.fixture(scope="module")
def model_mesh():
    import numpy as _np

    devices = jax.devices()
    assert len(devices) == 8
    return Mesh(_np.asarray(devices), ("model",))


@pytest.mark.parametrize(
    "name",
    ["lstm1", "lstm2", "inject", "attention", "adaptive", "transformer"],
)
@pytest.mark.parametrize("k", [1, 3])
def test_tp_beam_matches_single_device(model_mesh, name, k):
    # The spatial families ride the same step_hidden seam; their
    # beam-shared feature grids stay untiled under the TP scorer too.
    spatial = name in ("attention", "adaptive")
    kw = {"attention_dim": 8} if spatial else {}
    dec = build_decoder(
        name, vocab_size=VOCAB, feature_dim=FEAT, embed_dim=EMB,
        hidden_dim=HID, **kw,
    )
    params = dec.init(jax.random.key(0))
    shape = (B, 9, FEAT) if spatial else (B, FEAT)
    feats = jax.random.normal(jax.random.key(1), shape)

    ref = beam_decode(
        dec.step,
        params,
        dec.init_state(params, feats),
        start_id=START,
        end_id=END,
        max_len=MAXLEN,
        beam_width=k,
        decoder=dec,
    )

    tp_fn = make_tp_beam_fn(
        dec,
        model_mesh,
        start_id=START,
        end_id=END,
        max_len=MAXLEN,
        beam_width=k,
    )
    out = tp_fn(params, feats)

    np.testing.assert_array_equal(
        np.asarray(ref.tokens), np.asarray(out.tokens)
    )
    np.testing.assert_array_equal(
        np.asarray(ref.lengths), np.asarray(out.lengths)
    )
    np.testing.assert_allclose(
        np.asarray(ref.scores), np.asarray(out.scores), atol=1e-5
    )


def test_tp_step_equals_full_projection():
    """step == step_hidden + out projection (the TP seam is lossless)."""
    from tpucap.models.layers import dense

    dec = build_decoder(
        "lstm1", vocab_size=VOCAB, feature_dim=FEAT, embed_dim=EMB,
        hidden_dim=HID,
    )
    params = dec.init(jax.random.key(0))
    feats = jax.random.normal(jax.random.key(2), (3, FEAT))
    state = dec.init_state(params, feats)
    tok = jnp.array([3, 4, 5])

    logits_ref, st_ref = dec.step(params, state, tok)
    hidden, st = dec.step_hidden(params, state, tok)
    logits = dense(params["out"], hidden)
    np.testing.assert_allclose(
        np.asarray(logits), np.asarray(logits_ref), atol=1e-6
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(st_ref),
        jax.tree_util.tree_leaves(st),
        strict=True,
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_2d_mesh_dp_x_tp_decode():
    """Full 2-D serving layout: batch sharded over 'data' (4) x vocab
    sharded over 'model' (2), token-exact vs single device."""
    import numpy as _np

    devices = _np.asarray(jax.devices()).reshape(4, 2)
    mesh2d = Mesh(devices, ("data", "model"))

    dec = build_decoder(
        "lstm1", vocab_size=VOCAB, feature_dim=FEAT, embed_dim=EMB,
        hidden_dim=HID,
    )
    params = dec.init(jax.random.key(0))
    feats = jax.random.normal(jax.random.key(3), (8, FEAT))  # 4 x 2 rows

    ref = beam_decode(
        dec.step,
        params,
        dec.init_state(params, feats),
        start_id=START,
        end_id=END,
        max_len=MAXLEN,
        beam_width=3,
    )
    tp_fn = make_tp_beam_fn(
        dec,
        mesh2d,
        data_axis="data",
        start_id=START,
        end_id=END,
        max_len=MAXLEN,
        beam_width=3,
    )
    out = tp_fn(params, feats)
    np.testing.assert_array_equal(
        np.asarray(ref.tokens), np.asarray(out.tokens)
    )
    np.testing.assert_allclose(
        np.asarray(ref.scores), np.asarray(out.scores), atol=1e-5
    )


@pytest.mark.parametrize("name", ["lstm1", "transformer"])
def test_tp_train_matches_single_device(model_mesh, name):
    """Vocab-parallel CE training step == single-device step (SGD so the
    param delta is the gradient)."""
    import optax

    from tpucap.parallel.tp import make_tp_train_step
    from tpucap.train import TrainState, make_train_step

    dec = build_decoder(
        name, vocab_size=VOCAB, feature_dim=FEAT, embed_dim=EMB,
        hidden_dim=HID,
    )
    params = dec.init(jax.random.key(0))
    optimizer = optax.sgd(0.5)
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.normal(size=(B, FEAT)).astype(np.float32))
    tokens = jnp.asarray(
        rng.integers(1, VOCAB, size=(B, 7)).astype(np.int32)
    )
    tokens = tokens.at[:, -2:].set(0)

    single = make_train_step(dec, optimizer, deterministic=True)
    s1 = TrainState.create(params, optimizer, jax.random.key(1))
    s1, m1 = single(s1, feats, tokens)

    tp_step = make_tp_train_step(
        dec, optimizer, model_mesh, deterministic=True
    )
    s8 = TrainState.create(params, optimizer, jax.random.key(1))
    s8, m8 = tp_step(s8, feats, tokens)

    np.testing.assert_allclose(
        float(m1["loss"]), float(m8["loss"]), rtol=1e-5
    )
    np.testing.assert_allclose(
        float(m1["accuracy"]), float(m8["accuracy"]), rtol=1e-5
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(s1.params),
        jax.tree_util.tree_leaves(s8.params),
        strict=True,
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-6
        )


@pytest.mark.parametrize("vocab", [VOCAB, 29])
def test_tp_train_label_smoothing_matches(model_mesh, vocab):
    """Smoothed vocab-parallel CE == single-device smoothed CE. vocab=29
    exercises the padded path: ls/V and the smoothing logit-sum must use
    the TRUE 29-word vocabulary, not the 32 padded columns (whose -1e9
    biases would poison a naive sum)."""
    import optax

    from tpucap.parallel.tp import make_tp_train_step, pad_vocab_params
    from tpucap.train import TrainState, make_train_step

    LS = 0.1
    dec = build_decoder(
        "lstm1", vocab_size=vocab, feature_dim=FEAT, embed_dim=EMB,
        hidden_dim=HID,
    )
    params = dec.init(jax.random.key(0))
    optimizer = optax.sgd(0.5)
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.normal(size=(B, FEAT)).astype(np.float32))
    tokens = jnp.asarray(
        rng.integers(1, vocab, size=(B, 7)).astype(np.int32)
    )
    tokens = tokens.at[:, -2:].set(0)

    single = make_train_step(
        dec, optimizer, deterministic=True, label_smoothing=LS
    )
    s1 = TrainState.create(params, optimizer, jax.random.key(1))
    s1, m1 = single(s1, feats, tokens)

    padded, new_v = pad_vocab_params(params, 8)
    import dataclasses

    dec_p = dataclasses.replace(dec, vocab_size=new_v)
    tp_step = make_tp_train_step(
        dec_p, optimizer, model_mesh, deterministic=True,
        label_smoothing=LS, true_vocab=vocab,
    )
    s8 = TrainState.create(padded, optimizer, jax.random.key(1))
    s8, m8 = tp_step(s8, feats, tokens)

    np.testing.assert_allclose(
        float(m1["loss"]), float(m8["loss"]), rtol=1e-5
    )
    # Compare the shared (unpadded) slices of every param.
    p8 = jax.device_get(s8.params)
    p8["embedding"] = {"table": p8["embedding"]["table"][:vocab]}
    p8["out"] = {
        "kernel": p8["out"]["kernel"][:, :vocab],
        "bias": p8["out"]["bias"][:vocab],
    }
    for a, b in zip(
        jax.tree_util.tree_leaves(jax.device_get(s1.params)),
        jax.tree_util.tree_leaves(p8),
        strict=True,
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-6
        )


def test_tp_beam_attention_with_shared_grids(model_mesh):
    """TP vocab-sharded beam decode over the attention decoder (shared
    per-image grids + sharded projection together), token-exact."""
    dec = build_decoder(
        "attention", vocab_size=VOCAB, feature_dim=FEAT, embed_dim=EMB,
        hidden_dim=HID,
    )
    params = dec.init(jax.random.key(0))
    feats = jax.random.normal(jax.random.key(4), (B, 5, FEAT))

    ref = beam_decode(
        dec.step,
        params,
        dec.init_state(params, feats),
        start_id=START,
        end_id=END,
        max_len=MAXLEN,
        beam_width=3,
        decoder=dec,
    )
    tp_fn = make_tp_beam_fn(
        dec,
        model_mesh,
        start_id=START,
        end_id=END,
        max_len=MAXLEN,
        beam_width=3,
    )
    out = tp_fn(params, feats)
    np.testing.assert_array_equal(
        np.asarray(ref.tokens), np.asarray(out.tokens)
    )


def test_2d_dp_x_tp_train_matches_single_device():
    """2-D training: batch over 'data' (4) x vocab over 'model' (2) == the
    single-device step on the concatenated batch."""
    import numpy as _np
    import optax

    from tpucap.parallel.tp import make_tp_train_step
    from tpucap.train import TrainState, make_train_step

    devices = _np.asarray(jax.devices()).reshape(4, 2)
    mesh2d = Mesh(devices, ("data", "model"))

    dec = build_decoder(
        "lstm1", vocab_size=VOCAB, feature_dim=FEAT, embed_dim=EMB,
        hidden_dim=HID,
    )
    params = dec.init(jax.random.key(0))
    optimizer = optax.sgd(0.5)
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.normal(size=(8, FEAT)).astype(np.float32))
    tokens = jnp.asarray(rng.integers(1, VOCAB, size=(8, 7)).astype(np.int32))
    tokens = tokens.at[:, -2:].set(0)

    single = make_train_step(dec, optimizer, deterministic=True)
    s1 = TrainState.create(params, optimizer, jax.random.key(1))
    s1, m1 = single(s1, feats, tokens)

    step2d = make_tp_train_step(
        dec, optimizer, mesh2d, data_axis="data", deterministic=True
    )
    s2 = TrainState.create(params, optimizer, jax.random.key(1))
    s2, m2 = step2d(s2, feats, tokens)

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(s1.params),
        jax.tree_util.tree_leaves(s2.params),
        strict=True,
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-6)


def test_pad_vocab_params_preserves_decode(model_mesh):
    """Padding the vocab to shard evenly must not change any caption: the
    padded columns carry a -1e9 bias and can never win."""
    import dataclasses

    from tpucap.parallel.tp import pad_vocab_params

    V0 = 29  # not divisible by 8
    dec = build_decoder(
        "lstm1", vocab_size=V0, feature_dim=FEAT, embed_dim=EMB,
        hidden_dim=HID,
    )
    params = dec.init(jax.random.key(0))
    feats = jax.random.normal(jax.random.key(1), (4, FEAT))

    ref = beam_decode(
        dec.step, params, dec.init_state(params, feats),
        start_id=START, end_id=END, max_len=MAXLEN, beam_width=3,
    )

    padded, V1 = pad_vocab_params(params, 8)
    assert V1 % 8 == 0 and V1 > V0
    dec_p = dataclasses.replace(dec, vocab_size=V1)
    tp_fn = make_tp_beam_fn(
        dec_p, model_mesh,
        start_id=START, end_id=END, max_len=MAXLEN, beam_width=3,
    )
    out = tp_fn(padded, feats)
    np.testing.assert_array_equal(
        np.asarray(ref.tokens), np.asarray(out.tokens)
    )
    np.testing.assert_allclose(
        np.asarray(ref.scores), np.asarray(out.scores), atol=1e-4
    )

    # No-op when already aligned.
    same, V2 = pad_vocab_params(padded, 8)
    assert V2 == V1 and same is padded


def test_tp_beam_approx_topk_small_vocab_matches_exact(model_mesh):
    """approx_topk in the tp scorer (per-shard approx_max_k over V/p=4
    columns — degenerate-exact at this size) must reproduce the exact
    engine's tokens; plumbing check for the serving opt-in."""
    dec = build_decoder(
        "lstm1", vocab_size=VOCAB, feature_dim=FEAT, embed_dim=EMB,
        hidden_dim=HID,
    )
    params = dec.init(jax.random.key(0))
    feats = jax.random.normal(jax.random.key(1), (B, FEAT))
    kw = dict(start_id=START, end_id=END, max_len=MAXLEN, beam_width=3)
    ref = make_tp_beam_fn(dec, model_mesh, **kw)(params, feats)
    approx = make_tp_beam_fn(dec, model_mesh, approx_topk=True, **kw)(
        params, feats
    )
    np.testing.assert_array_equal(
        np.asarray(ref.tokens), np.asarray(approx.tokens)
    )


def test_tp_beam_narrow_shards_v_local_lt_k(model_mesh):
    """Tiny vocab over many shards (v_local < beam width): each shard
    contributes all of its columns and the merge stays token-exact vs the
    single-device engine."""
    dec = build_decoder(
        "lstm1", vocab_size=16, feature_dim=FEAT, embed_dim=EMB,
        hidden_dim=HID,
    )  # 16 / 8 shards = 2 columns/shard < k=3
    params = dec.init(jax.random.key(0))
    feats = jax.random.normal(jax.random.key(1), (B, FEAT))
    ref = beam_decode(
        dec.step, params, dec.init_state(params, feats),
        start_id=START, end_id=END, max_len=MAXLEN, beam_width=3,
    )
    out = make_tp_beam_fn(
        dec, model_mesh, start_id=START, end_id=END, max_len=MAXLEN,
        beam_width=3,
    )(params, feats)
    np.testing.assert_array_equal(
        np.asarray(ref.tokens), np.asarray(out.tokens)
    )


def test_tp_beam_min_len_matches_single_device(model_mesh):
    """The length floor shards correctly: endseq lives in exactly one
    vocab slice, and the TP scorer's (cols == end) & (t < min_len) mask
    must reproduce the single-device min_len beam token-for-token."""
    dec = build_decoder(
        "lstm1", vocab_size=VOCAB, feature_dim=FEAT, embed_dim=EMB,
        hidden_dim=HID,
    )
    params = dec.init(jax.random.key(0))
    feats = jax.random.normal(jax.random.key(5), (B, FEAT))
    ref = beam_decode(
        dec.step, params, dec.init_state(params, feats),
        start_id=START, end_id=END, max_len=MAXLEN, beam_width=3,
        min_len=4,
    )
    tp_fn = make_tp_beam_fn(
        dec, model_mesh, start_id=START, end_id=END, max_len=MAXLEN,
        beam_width=3, min_len=4,
    )
    out = tp_fn(params, feats)
    np.testing.assert_array_equal(
        np.asarray(ref.tokens), np.asarray(out.tokens)
    )
    assert (np.asarray(out.tokens)[:, :4] != END).all()
    assert (np.asarray(out.lengths) >= 4).all()
