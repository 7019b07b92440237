"""On-device augmentation (data/augment.py): permutation semantics,
determinism, and the fine-tune step hook."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from tpucap.data.augment import augment_images, make_augment_fn

B, H, W = 6, 16, 16


def batch(seed=0):
    return jax.random.normal(
        jax.random.key(seed), (B, H, W, 3), jnp.float32
    )


def test_identity_when_everything_off():
    x = batch()
    assert augment_images(x, jax.random.key(0), flip=False) is x
    assert make_augment_fn(flip=False, max_shift=0) is None


def test_deterministic_by_key():
    x = batch()
    a = augment_images(x, jax.random.key(1), flip=True, max_shift=2)
    b = augment_images(x, jax.random.key(1), flip=True, max_shift=2)
    c = augment_images(x, jax.random.key(2), flip=True, max_shift=2)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert not np.array_equal(np.asarray(a), np.asarray(c))


def test_flip_is_exact_mirror_or_identity():
    """Every output row is either the input image or its exact
    horizontal mirror — augmentation is a pixel permutation, never an
    interpolation."""
    x = np.asarray(batch(3))
    out = np.asarray(augment_images(jnp.asarray(x), jax.random.key(5)))
    flipped = mirrored = 0
    for i in range(B):
        if np.array_equal(out[i], x[i]):
            mirrored += 0
        elif np.array_equal(out[i], x[i][:, ::-1, :]):
            flipped += 1
        else:
            raise AssertionError(f"image {i} is neither identity nor mirror")
    # With 6 coins the chance of all-identical outcomes is 2/64; the
    # fixed key above produces a mix (pinned by determinism).
    assert 0 < flipped < B


def test_shift_preserves_multiset_of_interior_pixels():
    """A reflect-padded translation keeps shapes and dtype and is a
    permutation of padded content: values in the output all come from
    the input image."""
    x = batch(4)
    out = augment_images(
        x, jax.random.key(7), flip=False, max_shift=3
    )
    assert out.shape == x.shape and out.dtype == x.dtype
    vals = set(np.round(np.asarray(x).ravel(), 5).tolist())
    outvals = set(np.round(np.asarray(out).ravel(), 5).tolist())
    assert outvals <= vals


def test_shift_bounds_validated():
    with pytest.raises(ValueError, match="max_shift"):
        augment_images(
            batch(), jax.random.key(0), flip=False, max_shift=16
        )


def test_augment_runs_inside_jitted_finetune_step():
    from tpucap.models.decoders import build_decoder
    from tpucap.models.encoders import build_encoder
    from tpucap.train import TrainState
    from tpucap.train.finetune import make_joint_train_step

    enc = build_encoder("tiny_cnn")
    dec = build_decoder(
        "lstm1", vocab_size=19, feature_dim=enc.feature_dim,
        embed_dim=8, hidden_dim=16,
    )
    params = {
        "encoder": enc.init(jax.random.key(0)),
        "decoder": dec.init(jax.random.key(1)),
    }
    opt = optax.adam(1e-3)
    rng = np.random.default_rng(0)
    images = rng.normal(size=(4, 32, 32, 3)).astype(np.float32)
    tokens = rng.integers(1, 19, size=(4, 7)).astype(np.int32)
    tokens[:, 0] = 1
    step = make_joint_train_step(
        enc, dec, opt, deterministic=True,
        augment_fn=make_augment_fn(flip=True, max_shift=2),
    )
    state = TrainState.create(params, opt, jax.random.key(2))
    s1, m1 = step(state, jnp.asarray(images), jnp.asarray(tokens))
    s2, m2 = step(s1, jnp.asarray(images), jnp.asarray(tokens))
    assert np.isfinite(float(m1["loss"])) and np.isfinite(float(m2["loss"]))
    # Different step -> different augmentation draw -> (generically)
    # different loss on the SAME batch even with deterministic dropout.
    # (Params also moved; this is a smoke check that the hook is live.)
    no_aug = make_joint_train_step(enc, dec, opt, deterministic=True)
    _, m_plain = no_aug(state, jnp.asarray(images), jnp.asarray(tokens))
    assert float(m1["loss"]) != float(m_plain["loss"])


def test_pipeline_fit_finetune_augment_smoke(toy_corpus, rng):
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
        train=TrainConfig(batch_size=4, epochs=1, seed=0),
        precision="f32",
    )
    pipe = CaptioningPipeline(cfg)
    tok = Tokenizer()
    tok.fit_on_texts(toy_corpus)
    pipe.tokenizer = tok
    pipe.build()
    desc = {f"i{k}": [toy_corpus[k % len(toy_corpus)]] for k in range(4)}
    images = {
        i: rng.normal(size=(32, 32, 3)).astype(np.float32) for i in desc
    }
    hist = pipe.fit_finetune(
        desc, images, augment=True, augment_shift=2, log=None
    )
    assert np.isfinite(hist[-1]["loss"])
