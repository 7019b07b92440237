"""End-to-end encoder fine-tuning (train/finetune.py +
pipeline.fit_finetune): joint gradients reach the encoder, the
freeze_encoder dial reproduces feature-based training exactly, the
encoder-lr scaling works, and grad accumulation composes."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from tpucap.models.decoders import build_decoder
from tpucap.models.encoders import build_encoder
from tpucap.train import TrainState, make_train_step
from tpucap.train.finetune import (
    encode_for_decoder,
    encoder_learning_rate_optimizer,
    make_joint_train_step,
)

VOCAB, B, T, SIZE = 19, 8, 9, 32
START, PAD = 1, 0


def setup(decoder_name="lstm1", features="pooled"):
    enc = build_encoder("tiny_cnn", features)
    dec = build_decoder(
        decoder_name,
        vocab_size=VOCAB,
        feature_dim=enc.feature_dim,
        embed_dim=8,
        hidden_dim=16,
    )
    params = {
        "encoder": enc.init(jax.random.key(0)),
        "decoder": dec.init(jax.random.key(1)),
    }
    rng = np.random.default_rng(0)
    images = rng.normal(size=(B, SIZE, SIZE, 3)).astype(np.float32)
    tokens = rng.integers(1, VOCAB, size=(B, T)).astype(np.int32)
    tokens[:, 0] = START
    tokens[:, -2:] = PAD
    return enc, dec, params, images, tokens


def leaves_equal(a, b):
    return all(
        np.array_equal(np.asarray(x), np.asarray(y))
        for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b), strict=True)
    )


def test_freeze_encoder_matches_feature_training():
    """freeze_encoder=True: decoder updates == make_train_step on the
    precomputed features; encoder params bit-identical."""
    enc, dec, params, images, tokens = setup()
    optimizer = optax.sgd(0.5)
    feats = encode_for_decoder(enc, params["encoder"], jnp.asarray(images))

    ref_state = TrainState.create(
        params["decoder"], optimizer, jax.random.key(2)
    )
    ref_step = make_train_step(dec, optimizer, deterministic=True)
    ref_state, ref_m = ref_step(ref_state, feats, jnp.asarray(tokens))

    joint = make_joint_train_step(
        enc, dec, optimizer, deterministic=True, freeze_encoder=True
    )
    state = TrainState.create(params, optimizer, jax.random.key(2))
    state, m = joint(state, jnp.asarray(images), jnp.asarray(tokens))

    np.testing.assert_allclose(
        float(ref_m["loss"]), float(m["loss"]), rtol=1e-6
    )
    assert leaves_equal(state.params["encoder"], params["encoder"])
    for a, b in zip(
        jax.tree.leaves(ref_state.params),
        jax.tree.leaves(jax.device_get(state.params["decoder"])),
        strict=True,
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_joint_training_updates_encoder_and_descends():
    enc, dec, params, images, tokens = setup()
    optimizer = optax.adam(1e-2)
    joint = make_joint_train_step(enc, dec, optimizer, deterministic=True)
    state = TrainState.create(params, optimizer, jax.random.key(2))
    first = None
    for _ in range(12):
        state, m = joint(state, jnp.asarray(images), jnp.asarray(tokens))
        loss = float(m["loss"])
        assert np.isfinite(loss)
        if first is None:
            first = loss
    assert loss < first
    assert not leaves_equal(state.params["encoder"], params["encoder"])


def test_encoder_lr_scale_zero_freezes_encoder_updates():
    enc, dec, params, images, tokens = setup()
    optimizer = encoder_learning_rate_optimizer(
        optax.sgd(0.5), encoder_lr_scale=0.0
    )
    joint = make_joint_train_step(enc, dec, optimizer, deterministic=True)
    state = TrainState.create(params, optimizer, jax.random.key(2))
    state, _ = joint(state, jnp.asarray(images), jnp.asarray(tokens))
    assert leaves_equal(state.params["encoder"], params["encoder"])
    assert not leaves_equal(state.params["decoder"], params["decoder"])


def test_freeze_encoder_holds_under_adamw_weight_decay():
    """Frozen must mean frozen for EVERY optimizer: adamw's decoupled
    weight decay is grad-independent, so zeroed gradients alone would
    still shrink the encoder — the step masks the updates."""
    enc, dec, params, images, tokens = setup()
    optimizer = optax.adamw(1e-2, weight_decay=1e-2)
    joint = make_joint_train_step(
        enc, dec, optimizer, deterministic=True, freeze_encoder=True
    )
    state = TrainState.create(params, optimizer, jax.random.key(2))
    for _ in range(3):
        state, _ = joint(state, jnp.asarray(images), jnp.asarray(tokens))
    assert leaves_equal(state.params["encoder"], params["encoder"])
    assert not leaves_equal(state.params["decoder"], params["decoder"])


def test_encoder_lr_scale_one_is_identity_even_with_clipping():
    """The lr-scale wrapper chains AFTER the base optimizer, so joint
    global-norm clipping semantics are preserved: at scale 1.0 the
    wrapped run's params equal the unwrapped run's exactly (a
    multi_transform split would clip each subtree separately and
    diverge)."""
    enc, dec, params, images, tokens = setup()

    def base():
        return optax.chain(
            optax.clip_by_global_norm(0.01), optax.adam(1e-2)
        )

    plain = base()
    s1 = TrainState.create(params, plain, jax.random.key(2))
    step1 = make_joint_train_step(enc, dec, plain, deterministic=True)
    s1, _ = step1(s1, jnp.asarray(images), jnp.asarray(tokens))

    wrapped = encoder_learning_rate_optimizer(
        base(), encoder_lr_scale=1.0
    )
    s2 = TrainState.create(params, wrapped, jax.random.key(2))
    step2 = make_joint_train_step(enc, dec, wrapped, deterministic=True)
    s2, _ = step2(s2, jnp.asarray(images), jnp.asarray(tokens))
    for a, b in zip(
        jax.tree.leaves(jax.device_get(s1.params)),
        jax.tree.leaves(jax.device_get(s2.params)),
        strict=True,
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_joint_grad_accum_matches_full_batch():
    enc, dec, params, images, tokens = setup()
    optimizer = optax.sgd(0.5)
    full = make_joint_train_step(enc, dec, optimizer, deterministic=True)
    acc = make_joint_train_step(
        enc, dec, optimizer, deterministic=True, grad_accum_steps=4
    )
    s1 = TrainState.create(params, optimizer, jax.random.key(2))
    s1, m1 = full(s1, jnp.asarray(images), jnp.asarray(tokens))
    s2 = TrainState.create(params, optimizer, jax.random.key(2))
    s2, m2 = acc(s2, jnp.asarray(images), jnp.asarray(tokens))
    np.testing.assert_allclose(
        float(m1["loss"]), float(m2["loss"]), rtol=1e-6
    )
    for a, b in zip(
        jax.tree.leaves(jax.device_get(s1.params)),
        jax.tree.leaves(jax.device_get(s2.params)),
        strict=True,
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-6)


def test_remat_encoder_update_is_exact():
    """remat_encoder=True is a recompute SCHEDULE, not an approximation:
    loss and updated params must match the plain step exactly (same
    primal values, same gradient — jax.checkpoint's contract), with and
    without grad accumulation composed."""
    enc, dec, params, images, tokens = setup()
    optimizer = optax.sgd(0.5)
    for accum in (1, 4):
        plain = make_joint_train_step(
            enc, dec, optimizer, deterministic=True,
            grad_accum_steps=accum,
        )
        remat = make_joint_train_step(
            enc, dec, optimizer, deterministic=True,
            grad_accum_steps=accum, remat_encoder=True,
        )
        s1 = TrainState.create(params, optimizer, jax.random.key(2))
        s1, m1 = plain(s1, jnp.asarray(images), jnp.asarray(tokens))
        s2 = TrainState.create(params, optimizer, jax.random.key(2))
        s2, m2 = remat(s2, jnp.asarray(images), jnp.asarray(tokens))
        np.testing.assert_allclose(
            float(m1["loss"]), float(m2["loss"]), rtol=1e-6
        )
        for a, b in zip(
            jax.tree.leaves(jax.device_get(s1.params)),
            jax.tree.leaves(jax.device_get(s2.params)),
            strict=True,
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=5e-6
            )


def test_remat_encoder_rewrites_the_backward():
    """Structural proof the recompute schedule is actually in the traced
    program: the gradient jaxpr of the remat step carries a remat/
    checkpoint call; the plain step's does not. (The memory effect
    itself is a compiler outcome, measured on hardware — see
    docs/PERF.md.)"""
    from tpucap.train.loss import caption_loss_sums
    from tpucap.train.finetune import encode_for_decoder

    enc, dec, params, images, tokens = setup()

    def loss(p, use_remat):
        f = lambda ep, im: encode_for_decoder(enc, ep, im)  # noqa: E731
        if use_remat:
            f = jax.checkpoint(f)
        feats = f(p["encoder"], jnp.asarray(images))
        sums = caption_loss_sums(
            dec, p["decoder"], feats, jnp.asarray(tokens),
            deterministic=True,
        )
        return sums["nll_sum"]

    plain_jaxpr = str(jax.make_jaxpr(
        jax.grad(lambda p: loss(p, False))
    )(params))
    remat_jaxpr = str(jax.make_jaxpr(
        jax.grad(lambda p: loss(p, True))
    )(params))
    assert "remat" in remat_jaxpr or "checkpoint" in remat_jaxpr
    assert "remat" not in plain_jaxpr and "checkpoint" not in plain_jaxpr


def test_remat_composes_with_dp():
    from jax.sharding import Mesh

    enc, dec, params, images, tokens = setup()
    optimizer = optax.sgd(0.5)
    single = make_joint_train_step(enc, dec, optimizer, deterministic=True)
    s1 = TrainState.create(params, optimizer, jax.random.key(2))
    s1, m1 = single(s1, jnp.asarray(images), jnp.asarray(tokens))

    mesh = Mesh(np.asarray(jax.devices()[:4]), ("data",))
    dp = make_joint_train_step(
        enc, dec, optimizer, deterministic=True, mesh=mesh,
        remat_encoder=True,
    )
    s2 = TrainState.create(params, optimizer, jax.random.key(2))
    s2, m2 = dp(s2, jnp.asarray(images), jnp.asarray(tokens))
    np.testing.assert_allclose(
        float(m1["loss"]), float(m2["loss"]), rtol=1e-6
    )
    for a, b in zip(
        jax.tree.leaves(jax.device_get(s1.params)),
        jax.tree.leaves(jax.device_get(s2.params)),
        strict=True,
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-6)


def test_joint_spatial_attention_decoder():
    """Spatial grid flows into the SAT decoder with the attention
    regularizer's second head active."""
    enc, dec, params, images, tokens = setup("attention", "spatial")
    optimizer = optax.adam(1e-2)
    joint = make_joint_train_step(
        enc, dec, optimizer, deterministic=True, attention_reg=0.05
    )
    state = TrainState.create(params, optimizer, jax.random.key(2))
    first = None
    for _ in range(8):
        state, m = joint(state, jnp.asarray(images), jnp.asarray(tokens))
        loss = float(m["loss"])
        assert np.isfinite(loss)
        if first is None:
            first = loss
    assert loss < first
    assert "attention_reg" in m


def test_dp_joint_matches_single_device():
    """mesh= shards the image batch; pure-sum-space psum + global
    normalization makes the DP update exactly the single-device one."""
    from jax.sharding import Mesh

    enc, dec, params, images, tokens = setup()
    optimizer = optax.sgd(0.5)
    single = make_joint_train_step(enc, dec, optimizer, deterministic=True)
    s1 = TrainState.create(params, optimizer, jax.random.key(2))
    s1, m1 = single(s1, jnp.asarray(images), jnp.asarray(tokens))

    mesh = Mesh(np.asarray(jax.devices()[:4]), ("data",))
    dp = make_joint_train_step(
        enc, dec, optimizer, deterministic=True, mesh=mesh,
        grad_accum_steps=2,  # composes: per-shard batch 2 -> microbatch 1
    )
    s2 = TrainState.create(params, optimizer, jax.random.key(2))
    s2, m2 = dp(s2, jnp.asarray(images), jnp.asarray(tokens))
    np.testing.assert_allclose(
        float(m1["loss"]), float(m2["loss"]), rtol=1e-6
    )
    for a, b in zip(
        jax.tree.leaves(jax.device_get(s1.params)),
        jax.tree.leaves(jax.device_get(s2.params)),
        strict=True,
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-6)


def test_fsdp_joint_matches_single_device():
    """fsdp_state_template= : the joint {'encoder','decoder'} params +
    adam state live 1/N per device, gathered just-in-time — update
    EXACTLY equal to the single-device step (incl. the sharded-mu/nu
    optimizer update and the psum'd global-norm clip)."""
    from jax.sharding import Mesh

    from tpucap.parallel import fsdp_gather_tree, shard_fsdp_tree

    enc, dec, params, images, tokens = setup()
    clip = 0.05  # low enough to trigger

    single = make_joint_train_step(
        enc,
        dec,
        optax.chain(optax.clip_by_global_norm(clip), optax.adam(1e-2)),
        deterministic=True,
    )
    s1 = TrainState.create(
        params,
        optax.chain(optax.clip_by_global_norm(clip), optax.adam(1e-2)),
        jax.random.key(2),
    )
    s1, m1 = single(s1, jnp.asarray(images), jnp.asarray(tokens))

    mesh = Mesh(np.asarray(jax.devices()[:4]), ("data",))
    opt = optax.adam(1e-2)  # bare: the fsdp step owns the clip
    s2 = shard_fsdp_tree(
        TrainState.create(params, opt, jax.random.key(2)),
        mesh,
        min_size=8,
    )
    fsdp = make_joint_train_step(
        enc,
        dec,
        opt,
        deterministic=True,
        mesh=mesh,
        grad_accum_steps=2,  # composes: per-shard batch 2 -> microbatch 1
        fsdp_state_template=s2,
        grad_clip_norm=clip,
        fsdp_min_size=8,
    )
    s2, m2 = fsdp(s2, jnp.asarray(images), jnp.asarray(tokens))
    np.testing.assert_allclose(
        float(m1["loss"]), float(m2["loss"]), rtol=1e-6
    )
    # Params AND optimizer state actually sharded (the memory claim).
    from tpucap.parallel.fsdp import fsdp_dims

    dims = fsdp_dims(s2.params, 4, min_size=8)
    sharded = sum(
        1 for d in jax.tree_util.tree_leaves(dims) if d >= 0
    )
    assert sharded >= 4
    for a, b in zip(
        jax.tree.leaves(jax.device_get(s1.params)),
        jax.tree.leaves(jax.device_get(fsdp_gather_tree(s2.params, mesh))),
        strict=True,
    ):
        # atol 5e-5 not 5e-6: the psum'd global norm sums shard squares
        # in a different order than the single-device full-tree sum, and
        # the last-ulp norm difference amplifies through Adam's rescale.
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)


def test_fsdp_joint_freeze_encoder_matches_dp():
    """freeze_encoder under the ZeRO layout: encoder shards bit-frozen."""
    from jax.sharding import Mesh

    from tpucap.parallel import fsdp_gather_tree, shard_fsdp_tree

    enc, dec, params, images, tokens = setup()
    opt = optax.sgd(0.5)
    mesh = Mesh(np.asarray(jax.devices()[:4]), ("data",))
    s = shard_fsdp_tree(
        TrainState.create(params, opt, jax.random.key(2)), mesh, min_size=8
    )
    step = make_joint_train_step(
        enc,
        dec,
        opt,
        deterministic=True,
        mesh=mesh,
        freeze_encoder=True,
        fsdp_state_template=s,
        fsdp_min_size=8,
    )
    s, _ = step(s, jnp.asarray(images), jnp.asarray(tokens))
    got = jax.device_get(fsdp_gather_tree(s.params, mesh))
    assert leaves_equal(got["encoder"], params["encoder"])
    assert not leaves_equal(got["decoder"], params["decoder"])


def test_pipeline_fit_finetune_fsdp_matches_dp(toy_corpus, rng):
    from tpucap.config import (
        Config,
        DecodeConfig,
        DecoderConfig,
        EncoderConfig,
        TrainConfig,
    )
    from tpucap.pipeline import CaptioningPipeline
    from tpucap.text import Tokenizer

    def run(parallelism):
        cfg = Config(
            encoder=EncoderConfig(name="tiny_cnn", feature_dim=128),
            decoder=DecoderConfig(
                embed_dim=8, hidden_dim=16, dropout_rate=0.0
            ),
            decode=DecodeConfig(max_len=10),
            train=TrainConfig(batch_size=8, learning_rate=1e-2),
            precision="f32",
        )
        pipe = CaptioningPipeline(cfg)
        tok = Tokenizer()
        tok.fit_on_texts(toy_corpus)
        pipe.tokenizer = tok
        pipe.build()
        desc = {
            f"i{k}": [toy_corpus[k % len(toy_corpus)]] for k in range(8)
        }
        r = np.random.default_rng(0)
        images = {
            i: r.normal(size=(32, 32, 3)).astype(np.float32) for i in desc
        }
        hist = pipe.fit_finetune(
            desc, images, epochs=4, parallelism=parallelism, log=None
        )
        return pipe, hist

    p_dp, h_dp = run("dp")
    p_fs, h_fs = run("fsdp")
    np.testing.assert_allclose(
        h_dp[-1]["loss"], h_fs[-1]["loss"], rtol=1e-5
    )
    # Post-fit params gathered back to the canonical layout.
    for a, b in zip(
        jax.tree.leaves(p_dp.params["encoder"]),
        jax.tree.leaves(p_fs.params["encoder"]),
        strict=True,
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-6)


def test_pipeline_fit_finetune_dp(toy_corpus, rng):
    from tpucap.config import (
        Config,
        DecodeConfig,
        DecoderConfig,
        EncoderConfig,
        TrainConfig,
    )
    from tpucap.pipeline import CaptioningPipeline
    from tpucap.text import Tokenizer

    cfg = Config(
        encoder=EncoderConfig(name="tiny_cnn", feature_dim=128),
        decoder=DecoderConfig(embed_dim=8, hidden_dim=16, dropout_rate=0.0),
        decode=DecodeConfig(max_len=10),
        train=TrainConfig(batch_size=8, learning_rate=1e-2),
        precision="f32",
    )
    pipe = CaptioningPipeline(cfg)
    tok = Tokenizer()
    tok.fit_on_texts(toy_corpus)
    pipe.tokenizer = tok
    pipe.build()
    desc = {f"i{k}": [toy_corpus[k % len(toy_corpus)]] for k in range(8)}
    images = {
        i: rng.normal(size=(32, 32, 3)).astype(np.float32) for i in desc
    }
    hist = pipe.fit_finetune(
        desc, images, epochs=8, parallelism="dp", log=None
    )
    assert hist[-1]["loss"] < hist[0]["loss"]
    with pytest.raises(NotImplementedError, match="parallelism"):
        pipe.fit_finetune(desc, images, epochs=1, parallelism="tp", log=None)


def test_pipeline_fit_finetune(toy_corpus, rng):
    from tpucap.config import (
        Config,
        DecodeConfig,
        DecoderConfig,
        EncoderConfig,
        TrainConfig,
    )
    from tpucap.pipeline import CaptioningPipeline
    from tpucap.text import Tokenizer

    cfg = Config(
        encoder=EncoderConfig(name="tiny_cnn", feature_dim=128),
        decoder=DecoderConfig(embed_dim=8, hidden_dim=16, dropout_rate=0.0),
        decode=DecodeConfig(max_len=10),
        train=TrainConfig(batch_size=8, learning_rate=1e-2),
        precision="f32",
    )
    pipe = CaptioningPipeline(cfg)
    tok = Tokenizer()
    tok.fit_on_texts(toy_corpus)
    pipe.tokenizer = tok
    pipe.build()
    enc_before = jax.device_get(pipe.params["encoder"])
    desc = {f"i{k}": [toy_corpus[k % len(toy_corpus)]] for k in range(8)}
    images = {
        i: rng.normal(size=(32, 32, 3)).astype(np.float32) for i in desc
    }
    hist = pipe.fit_finetune(desc, images, epochs=8, log=None)
    assert hist[-1]["loss"] < hist[0]["loss"]
    assert not leaves_equal(pipe.params["encoder"], enc_before)
    # the tuned pipeline still captions (decode caches were invalidated)
    caps = pipe.generate(
        rng.normal(size=(2, 128)).astype(np.float32), method="greedy"
    )
    assert len(caps) == 2
