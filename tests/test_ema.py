"""EMA weight averaging (TrainConfig.ema_decay): hand-checked shadow
update, training-trajectory invariance, the use_ema_weights swap, and
the layout guard."""

import jax
import numpy as np
import pytest

from tpucap.config import (
    Config,
    DecodeConfig,
    DecoderConfig,
    EncoderConfig,
    TrainConfig,
)
from tpucap.pipeline import CaptioningPipeline
from tpucap.text import Tokenizer

DECAY = 0.9


def make_pipe(toy_corpus, ema=0.0, batch=8):
    cfg = Config(
        encoder=EncoderConfig(name="tiny_cnn", feature_dim=128),
        decoder=DecoderConfig(embed_dim=8, hidden_dim=16, dropout_rate=0.0),
        decode=DecodeConfig(max_len=10),
        train=TrainConfig(
            batch_size=batch, learning_rate=1e-2, ema_decay=ema, seed=0
        ),
        precision="f32",
    )
    pipe = CaptioningPipeline(cfg)
    tok = Tokenizer()
    tok.fit_on_texts(toy_corpus)
    pipe.tokenizer = tok
    pipe.build()
    return pipe


def data(toy_corpus, rng, n=8):
    desc = {f"i{k}": [toy_corpus[k % len(toy_corpus)]] for k in range(n)}
    feats = {i: rng.normal(size=(128,)).astype(np.float32) for i in desc}
    return desc, feats


def test_ema_one_step_hand_value(toy_corpus, rng):
    """One epoch of one batch = one step: ema must be exactly
    d*p0 + (1-d)*p1."""
    pipe = make_pipe(toy_corpus, ema=DECAY)
    desc, feats = data(toy_corpus, rng)
    p0 = jax.device_get(pipe.params["decoder"])
    pipe.fit(desc, feats, epochs=1, log=None)
    p1 = jax.device_get(pipe.params["decoder"])
    ema = jax.device_get(pipe.ema_params["decoder"])
    for a0, a1, e in zip(
        jax.tree.leaves(p0),
        jax.tree.leaves(p1),
        jax.tree.leaves(ema),
        strict=True,
    ):
        np.testing.assert_allclose(
            np.asarray(e),
            DECAY * np.asarray(a0) + (1 - DECAY) * np.asarray(a1),
            atol=1e-6,
        )


def test_ema_does_not_change_training(toy_corpus, rng):
    desc, feats = data(toy_corpus, rng)
    plain = make_pipe(toy_corpus)
    plain.fit(desc, feats, epochs=3, log=None)
    with_ema = make_pipe(toy_corpus, ema=DECAY)
    with_ema.fit(desc, feats, epochs=3, log=None)
    for a, b in zip(
        jax.tree.leaves(jax.device_get(plain.params["decoder"])),
        jax.tree.leaves(jax.device_get(with_ema.params["decoder"])),
        strict=True,
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_use_ema_weights_swap_and_restore(toy_corpus, rng):
    pipe = make_pipe(toy_corpus, ema=DECAY)
    desc, feats = data(toy_corpus, rng)
    pipe.fit(desc, feats, epochs=2, log=None)
    raw = jax.device_get(pipe.params["decoder"])
    replaced = pipe.use_ema_weights()
    for a, b in zip(
        jax.tree.leaves(pipe.params["decoder"]),
        jax.tree.leaves(pipe.ema_params["decoder"]),
        strict=True,
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # decode works on the averaged weights
    caps = pipe.generate(
        rng.normal(size=(2, 128)).astype(np.float32), method="greedy"
    )
    assert len(caps) == 2
    # and the returned trees restore the raw iterate
    pipe.params.update(replaced)
    for a, b in zip(
        jax.tree.leaves(pipe.params["decoder"]),
        jax.tree.leaves(raw),
        strict=True,
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_ema_guards(toy_corpus, rng):
    desc, feats = data(toy_corpus, rng)
    pipe = make_pipe(toy_corpus, ema=DECAY)
    with pytest.raises(NotImplementedError, match="ema_decay"):
        pipe.fit(desc, feats, epochs=1, parallelism="tp", log=None)
    bad = make_pipe(toy_corpus, ema=1.5)
    with pytest.raises(ValueError, match="ema_decay"):
        bad.fit(desc, feats, epochs=1, log=None)
    fresh = make_pipe(toy_corpus)
    with pytest.raises(ValueError, match="no EMA"):
        fresh.use_ema_weights()


def test_ema_finetune_tracks_both_trees(toy_corpus, rng):
    pipe = make_pipe(toy_corpus, ema=DECAY)
    desc, _ = data(toy_corpus, rng)
    images = {
        i: rng.normal(size=(32, 32, 3)).astype(np.float32) for i in desc
    }
    pipe.fit_finetune(desc, images, epochs=2, log=None)
    assert set(pipe.ema_params) == {"encoder", "decoder"}
    pipe.use_ema_weights()
    caps = pipe.generate(
        rng.normal(size=(2, 128)).astype(np.float32), method="greedy"
    )
    assert len(caps) == 2


def test_ema_composes_with_fsdp(toy_corpus, rng):
    """EMA under FSDP (r4): the shadow tracks the SHARDED leaves (their
    shapes are canonical — only placement is sharded), is gathered with
    the params at the end, and equals the dp-EMA trajectory."""
    desc, feats = data(toy_corpus, rng)
    ref = make_pipe(toy_corpus, ema=DECAY)
    ref.fit(desc, feats, epochs=2, parallelism="dp", log=None)
    pipe = make_pipe(toy_corpus, ema=DECAY)
    pipe.fit(desc, feats, epochs=2, parallelism="fsdp", log=None)
    assert "decoder" in pipe.ema_params
    for a, b in zip(
        jax.tree.leaves(ref.ema_params["decoder"]),
        jax.tree.leaves(pipe.ema_params["decoder"]),
        strict=True,
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-6
        )
    # The swap surface works on the gathered shadow.
    pipe.use_ema_weights()
    caps = pipe.generate(
        np.stack([feats["i0"], feats["i1"]]), method="greedy"
    )
    assert len(caps) == 2


def test_ema_finetune_composes_with_fsdp(toy_corpus, rng):
    """fit_finetune's ema x fsdp cell (r5, aligning with fit's r4
    support): the joint {'encoder','decoder'} shadow tracks the
    ZeRO-sharded leaves and is gathered with the params at the end;
    the trajectory equals the dp run's."""
    desc, _ = data(toy_corpus, rng)
    images = {
        i: rng.normal(size=(32, 32, 3)).astype(np.float32) for i in desc
    }
    ref = make_pipe(toy_corpus, ema=DECAY)
    ref.fit_finetune(desc, images, epochs=2, parallelism="dp", log=None)
    pipe = make_pipe(toy_corpus, ema=DECAY)
    pipe.fit_finetune(
        desc, images, epochs=2, parallelism="fsdp", log=None
    )
    assert set(pipe.ema_params) == {"encoder", "decoder"}
    for tree in ("encoder", "decoder"):
        for a, b in zip(
            jax.tree.leaves(ref.ema_params[tree]),
            jax.tree.leaves(pipe.ema_params[tree]),
            strict=True,
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=5e-6
            )
    pipe.use_ema_weights()
    caps = pipe.generate(
        rng.normal(size=(2, 128)).astype(np.float32), method="greedy"
    )
    assert len(caps) == 2
