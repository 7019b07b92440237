"""Mixed-precision (bf16) training — TrainConfig.precision.

The contract: forward/backward matmuls run in bfloat16 while the master
params, optimizer state, and loss reductions stay f32 (the standard TPU
master-weight recipe, no loss scaling). These tests pin:

- the bf16 step keeps master params/opt_state in f32 and produces a loss
  close to the f32 step's (bf16 has ~8 mantissa bits: tolerances are
  percent-scale, not ulp-scale);
- DP-bf16 matches single-device-bf16 closely (the sum-form identity is
  unchanged; only bf16 reassociation differs);
- gradient accumulation composes;
- a bf16 run still learns (loss drops hard on a memorizable fixture);
- fit(precision='bf16') works end-to-end through the pipeline and guards
  the unsupported parallelisms;
- the joint finetune step accepts compute_dtype (encoder in bf16).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import Mesh

from tpucap.config import (
    Config,
    DecodeConfig,
    DecoderConfig,
    EncoderConfig,
    TrainConfig,
)
from tpucap.models.decoders import build_decoder
from tpucap.parallel import make_dp_train_step
from tpucap.pipeline import CaptioningPipeline
from tpucap.text import Tokenizer
from tpucap.train import TrainState, make_train_step
from tpucap.train.loss import cast_floats

VOCAB, FEAT = 23, 12
B, T = 8, 11
START, PAD = 1, 0


def make_pipe(toy_corpus, precision="bf16", batch=4):
    cfg = Config(
        encoder=EncoderConfig(name="tiny_cnn", feature_dim=128),
        decoder=DecoderConfig(embed_dim=8, hidden_dim=16, dropout_rate=0.0),
        decode=DecodeConfig(max_len=10),
        train=TrainConfig(
            batch_size=batch,
            learning_rate=1e-2,
            epochs=2,
            seed=0,
            precision=precision,
        ),
        precision="f32",
    )
    pipe = CaptioningPipeline(cfg)
    tok = Tokenizer()
    tok.fit_on_texts(toy_corpus)
    pipe.tokenizer = tok
    pipe.build()
    return pipe


def pipe_data(toy_corpus, rng, n=8):
    desc = {f"i{k}": [toy_corpus[k % len(toy_corpus)]] for k in range(n)}
    feats = {i: rng.normal(size=(128,)).astype(np.float32) for i in desc}
    return desc, feats


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
    feats = rng.normal(size=(B, FEAT)).astype(np.float32)
    tokens = rng.integers(1, VOCAB, size=(B, T)).astype(np.int32)
    tokens[:, 0] = START
    for i in range(B):
        tokens[i, max(2, T - 1 - i) :] = PAD
    return dec, params, feats, tokens


def _run(step, params, feats, tokens, optimizer):
    state = TrainState.create(params, optimizer, jax.random.key(1))
    state, metrics = step(state, jnp.asarray(feats), jnp.asarray(tokens))
    return jax.device_get(state.params), jax.device_get(metrics), state


def test_cast_floats_leaves_ints_alone():
    tree = {"w": jnp.ones((3,), jnp.float32), "ids": jnp.arange(3)}
    out = cast_floats(tree, jnp.bfloat16)
    assert out["w"].dtype == jnp.bfloat16
    assert out["ids"].dtype == tree["ids"].dtype
    assert cast_floats(tree, None) is tree


def test_bf16_step_keeps_f32_master_state():
    dec, params, feats, tokens = setup()
    opt = optax.adam(1e-3)
    step = make_train_step(
        dec, opt, deterministic=True, compute_dtype=jnp.bfloat16
    )
    p, m, state = _run(step, params, feats, tokens, opt)
    for leaf in jax.tree.leaves(p):
        assert np.asarray(leaf).dtype == np.float32
    for leaf in jax.tree.leaves(state.opt_state):
        if jnp.issubdtype(jnp.asarray(leaf).dtype, jnp.floating):
            assert jnp.asarray(leaf).dtype == jnp.float32
    assert np.isfinite(m["loss"])


@pytest.mark.parametrize("name", ["lstm1", "attention", "transformer"])
def test_bf16_loss_close_to_f32(name):
    kw = {"num_heads": 2, "mlp_dim": 32} if name == "transformer" else {}
    dec, params, feats, tokens = setup(name, **kw)
    if name == "attention":
        feats = (
            np.random.default_rng(1)
            .normal(size=(B, 5, FEAT))
            .astype(np.float32)
        )
    opt = optax.sgd(0.1)
    s32 = make_train_step(dec, opt, deterministic=True)
    s16 = make_train_step(
        dec, opt, deterministic=True, compute_dtype=jnp.bfloat16
    )
    _, m32, _ = _run(s32, params, feats, tokens, opt)
    _, m16, _ = _run(s16, params, feats, tokens, opt)
    np.testing.assert_allclose(
        float(m16["loss"]), float(m32["loss"]), rtol=2e-2
    )
    assert float(m16["tokens"]) == float(m32["tokens"])


def test_dp_bf16_matches_single_device_bf16():
    dec, params, feats, tokens = setup()
    opt = optax.sgd(0.5)
    mesh = Mesh(np.asarray(jax.devices()[:4]), ("data",))
    single = make_train_step(
        dec, opt, deterministic=True, compute_dtype=jnp.bfloat16
    )
    dp = make_dp_train_step(
        dec,
        opt,
        mesh,
        deterministic=True,
        compute_dtype=jnp.bfloat16,
    )
    p1, m1, _ = _run(single, params, feats, tokens, opt)
    p2, m2, _ = _run(dp, params, feats, tokens, opt)
    np.testing.assert_allclose(
        float(m1["loss"]), float(m2["loss"]), rtol=1e-3
    )
    for a, b in zip(
        jax.tree.leaves(p1), jax.tree.leaves(p2), strict=True
    ):
        # Identical math in sum space; only bf16 matmul partial-sum
        # order can differ between the one-batch and sharded programs.
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-3, rtol=5e-3
        )


def test_bf16_with_grad_accum_runs_and_matches():
    dec, params, feats, tokens = setup()
    opt = optax.sgd(0.5)
    full = make_train_step(
        dec, opt, deterministic=True, compute_dtype=jnp.bfloat16
    )
    acc = make_train_step(
        dec,
        opt,
        deterministic=True,
        compute_dtype=jnp.bfloat16,
        grad_accum_steps=4,
    )
    p1, m1, _ = _run(full, params, feats, tokens, opt)
    p2, m2, _ = _run(acc, params, feats, tokens, opt)
    np.testing.assert_allclose(
        float(m1["loss"]), float(m2["loss"]), rtol=1e-3
    )
    for a, b in zip(
        jax.tree.leaves(p1), jax.tree.leaves(p2), strict=True
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-3, rtol=5e-3
        )


def test_bf16_learns():
    """30 Adam steps on one repeated batch must crush the loss — the
    canary for broken mixed-precision gradients (a bad cast boundary
    typically stalls learning immediately)."""
    dec, params, feats, tokens = setup()
    opt = optax.adam(1e-2)
    step = make_train_step(
        dec, opt, deterministic=True, compute_dtype=jnp.bfloat16
    )
    state = TrainState.create(params, opt, jax.random.key(1))
    f, t = jnp.asarray(feats), jnp.asarray(tokens)
    state, m0 = step(state, f, t)
    first = float(m0["loss"])
    for _ in range(59):
        state, m = step(state, f, t)
    # Measured on this fixture: f32 reaches 0.53, bf16 0.58 from 3.23.
    assert float(m["loss"]) < 0.3 * first


def test_pipeline_fit_bf16(toy_corpus, rng):
    pipe = make_pipe(toy_corpus, precision="bf16")
    desc, feats = pipe_data(toy_corpus, rng)
    hist = pipe.fit(desc, feats, log=None)
    assert np.isfinite(hist[-1]["loss"])
    # Captions still decode from the f32 master params.
    cap = pipe.generate(np.asarray(list(feats.values())[:2]))
    assert len(cap) == 2


def test_pipeline_fit_bf16_tp_runs(toy_corpus, rng):
    """bf16 now trains on the promoted beyond-parity paths too (r4 —
    the bench's default precision must be trainable everywhere);
    step-level closeness per family is pinned below."""
    pipe = make_pipe(toy_corpus, precision="bf16", batch=8)
    desc, feats = pipe_data(toy_corpus, rng)
    hist = pipe.fit(desc, feats, parallelism="tp", log=None)
    assert np.isfinite(hist[-1]["loss"])


def _assert_bf16_close(m1, m2, p1, p2, atol=5e-3, rtol=5e-3):
    """bf16 closeness bar: identical math in sum space, only bf16
    matmul partial-sum order differs between the one-device and
    sharded programs (same tolerances as the DP-bf16 test unless the
    sharded program reassociates more — see the PP caller)."""
    np.testing.assert_allclose(
        float(m1["loss"]), float(m2["loss"]), rtol=1e-3
    )
    for a, b in zip(
        jax.tree.leaves(p1), jax.tree.leaves(p2), strict=True
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=atol, rtol=rtol
        )


def test_tp_bf16_matches_single_device_bf16():
    from tpucap.parallel.tp import make_tp_train_step

    dec = build_decoder(
        "lstm1", vocab_size=32, feature_dim=FEAT, embed_dim=8,
        hidden_dim=16,
    )
    params = dec.init(jax.random.key(0))
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.normal(size=(B, FEAT)), jnp.float32)
    tokens = jnp.asarray(rng.integers(1, 32, size=(B, 7)), jnp.int32)
    tokens = tokens.at[:, -2:].set(0)
    opt = optax.sgd(0.5)
    single = make_train_step(
        dec, opt, deterministic=True, compute_dtype=jnp.bfloat16
    )
    tp = make_tp_train_step(
        dec,
        opt,
        Mesh(np.asarray(jax.devices()), ("model",)),
        deterministic=True,
        compute_dtype=jnp.bfloat16,
    )
    s1 = TrainState.create(params, opt, jax.random.key(1))
    s1, m1 = single(s1, feats, tokens)
    s2 = TrainState.create(params, opt, jax.random.key(1))
    s2, m2 = tp(s2, feats, tokens)
    _assert_bf16_close(m1, m2, s1.params, s2.params)


def _transformer(num_layers=2, max_positions=17, **kw):
    return build_decoder(
        "transformer",
        vocab_size=VOCAB,
        feature_dim=FEAT,
        hidden_dim=16,
        num_layers=num_layers,
        num_heads=2,
        mlp_dim=32,
        max_positions=max_positions,
        **kw,
    )


def _tf_data(T, seed=0):
    rng = np.random.default_rng(seed)
    feats = jnp.asarray(rng.normal(size=(B, FEAT)), jnp.float32)
    tokens = np.asarray(rng.integers(1, VOCAB, size=(B, T)), np.int32)
    tokens[:, 0] = START
    tokens[:, -2:] = PAD
    return feats, jnp.asarray(tokens)


def test_pp_bf16_matches_single_device_bf16():
    from jax.sharding import Mesh as JMesh

    from tpucap.parallel import stack_pp_layers
    from tpucap.parallel.pp import make_pp_train_step, unstack_pp_layers

    dec = _transformer(num_layers=4, max_positions=8)
    params = dec.init(jax.random.key(0))
    feats, tokens = _tf_data(8)
    opt = optax.sgd(0.5)
    single = make_train_step(
        dec, opt, deterministic=True, compute_dtype=jnp.bfloat16
    )
    s1 = TrainState.create(params, opt, jax.random.key(1))
    s1, m1 = single(s1, feats, tokens)
    pp = make_pp_train_step(
        dec,
        opt,
        JMesh(np.asarray(jax.devices()[:4]), ("stage",)),
        deterministic=True,
        compute_dtype=jnp.bfloat16,
    )
    sp_state = TrainState.create(
        stack_pp_layers(params), opt, jax.random.key(1)
    )
    sp_state, m2 = pp(sp_state, feats, tokens)
    # PP reassociates MORE than the other shardings in bf16: the batch
    # sum is split into M sequential microbatch matmuls AND activations
    # round-trip through bf16 at every stage hop, so single elements
    # land a few more ulp out than under DP (measured: 1/128 leaves at
    # 2.5% relative with the 5e-3 bar; the f32 PP test pins 2e-5, so
    # this is bf16 rounding, not a recipe error).
    _assert_bf16_close(
        m1, m2, s1.params, unstack_pp_layers(sp_state.params),
        atol=2e-2, rtol=2e-2,
    )


def test_sp_bf16_matches_single_device_bf16():
    from jax.sharding import Mesh as JMesh

    from tpucap.parallel.sp import make_sp_train_step

    dec = _transformer(num_layers=2, max_positions=17)
    params = dec.init(jax.random.key(0))
    feats, tokens = _tf_data(17)
    opt = optax.sgd(0.5)
    single = make_train_step(
        dec, opt, deterministic=True, compute_dtype=jnp.bfloat16
    )
    s1 = TrainState.create(params, opt, jax.random.key(1))
    s1, m1 = single(s1, feats, tokens)
    sp = make_sp_train_step(
        dec,
        opt,
        JMesh(np.asarray(jax.devices()[:4]), ("seq",)),
        deterministic=True,
        compute_dtype=jnp.bfloat16,
    )
    s2 = TrainState.create(params, opt, jax.random.key(1))
    s2, m2 = sp(s2, feats, tokens)
    _assert_bf16_close(m1, m2, s1.params, s2.params)


def test_ep_bf16_matches_single_device_bf16():
    from jax.sharding import Mesh as JMesh

    from tpucap.parallel.ep import make_ep_train_step
    from tpucap.train.loss import masked_cross_entropy_sums

    AUX_W = 0.01
    dec = _transformer(
        num_layers=2, max_positions=8, num_experts=4, moe_top_k=2
    )
    params = dec.init(jax.random.key(0))
    feats, tokens = _tf_data(8)
    opt = optax.sgd(0.5)

    def loss_fn(p):
        # Single-device bf16 oracle: same cast boundary as the step
        # builders (f32 master params, bf16 forward, f32 reductions).
        p = cast_floats(p, jnp.bfloat16)
        logits, aux = dec.forward_train_with_moe_aux(
            p, cast_floats(feats, jnp.bfloat16), tokens[:, :-1],
            deterministic=True,
        )
        nll, n_tok, _ = masked_cross_entropy_sums(
            logits, tokens[:, 1:], pad_id=PAD
        )
        return nll / jnp.maximum(n_tok, 1.0) + AUX_W * aux

    loss1, grads = jax.value_and_grad(loss_fn)(params)
    updates, _ = opt.update(grads, opt.init(params), params)
    p1 = optax.apply_updates(params, updates)

    ep = make_ep_train_step(
        dec,
        opt,
        JMesh(np.asarray(jax.devices()[:4]), ("expert",)),
        deterministic=True,
        moe_aux_weight=AUX_W,
        compute_dtype=jnp.bfloat16,
    )
    s2 = TrainState.create(params, opt, jax.random.key(1))
    s2, m2 = ep(s2, feats, tokens)
    np.testing.assert_allclose(
        float(loss1), float(m2["loss"]), rtol=1e-3
    )
    for a, b in zip(
        jax.tree.leaves(p1), jax.tree.leaves(s2.params), strict=True
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-3, rtol=5e-3
        )


def test_pipeline_fit_rejects_unknown_precision(toy_corpus, rng):
    pipe = make_pipe(toy_corpus, precision="fp8")
    desc, feats = pipe_data(toy_corpus, rng)
    with pytest.raises(ValueError, match="precision"):
        pipe.fit(desc, feats, log=None)


def test_joint_finetune_step_bf16():
    from tpucap.models.encoders import build_encoder
    from tpucap.train.finetune import make_joint_train_step

    enc = build_encoder("tiny_cnn")
    dec = build_decoder(
        "lstm1",
        vocab_size=VOCAB,
        feature_dim=enc.feature_dim,
        embed_dim=8,
        hidden_dim=16,
    )
    enc_params = enc.init(jax.random.key(0))
    dec_params = dec.init(jax.random.key(1))
    params = {"encoder": enc_params, "decoder": dec_params}
    opt = optax.adam(1e-3)
    rng = np.random.default_rng(0)
    images = rng.normal(size=(4, 32, 32, 3)).astype(np.float32)
    tokens = rng.integers(1, VOCAB, size=(4, T)).astype(np.int32)
    tokens[:, 0] = START
    step16 = make_joint_train_step(
        enc,
        dec,
        opt,
        deterministic=True,
        compute_dtype=jnp.bfloat16,
    )
    step32 = make_joint_train_step(enc, dec, opt, deterministic=True)
    state = TrainState.create(params, opt, jax.random.key(2))
    s16, m16 = step16(state, jnp.asarray(images), jnp.asarray(tokens))
    _, m32 = step32(state, jnp.asarray(images), jnp.asarray(tokens))
    np.testing.assert_allclose(
        float(m16["loss"]), float(m32["loss"]), rtol=3e-2
    )
    for leaf in jax.tree.leaves(jax.device_get(s16.params)):
        assert np.asarray(leaf).dtype == np.float32
