"""Buffer donation on the train steps (donate=True).

The pipeline loops donate the input TrainState each step so XLA
updates params + optimizer state in place instead of holding old and
new trees live simultaneously (the peak-memory moment of a training
step). Contracts pinned here:

- donated updates are bit-identical to the non-donated step;
- the donated input really is consumed (so the memory claim is real);
- own_state protects trees the caller still exposes (the pipeline's
  self.params aliases the fresh TrainState);
- the pipeline surface (fit / fit_finetune with donation inside)
  leaves self.params usable — generate works right after fit.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from tpucap.models.decoders import build_decoder
from tpucap.train import TrainState, make_train_step, own_state


def _setup():
    dec = build_decoder(
        "lstm1", vocab_size=50, feature_dim=32, embed_dim=16,
        hidden_dim=16,
    )
    params = dec.init(jax.random.key(0))
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.normal(size=(8, 32)).astype(np.float32))
    toks = jnp.asarray(
        rng.integers(1, 50, size=(8, 13)).astype(np.int32)
    )
    return dec, params, feats, toks


def test_donated_step_matches_plain():
    dec, params, feats, toks = _setup()
    opt = optax.adam(1e-2)
    plain = make_train_step(dec, opt, deterministic=True)
    donated = make_train_step(dec, opt, deterministic=True, donate=True)

    s_a = TrainState.create(params, opt, jax.random.key(2))
    s_b = own_state(TrainState.create(params, opt, jax.random.key(2)))
    for _ in range(3):
        s_a, m_a = plain(s_a, feats, toks)
        s_b, m_b = donated(s_b, feats, toks)
    np.testing.assert_allclose(
        float(m_a["loss"]), float(m_b["loss"]), rtol=1e-7
    )
    for a, b in zip(
        jax.tree.leaves(s_a.params), jax.tree.leaves(s_b.params),
        strict=True,
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_donation_consumes_input_and_own_state_protects():
    dec, params, feats, toks = _setup()
    opt = optax.adam(1e-2)
    donated = make_train_step(dec, opt, deterministic=True, donate=True)

    # own_state: the caller's params tree survives the donated step.
    s = own_state(TrainState.create(params, opt, jax.random.key(2)))
    donated(s, feats, toks)
    np.asarray(jax.tree.leaves(params)[0])  # must not raise

    # Without the copy the aliased input is deleted — the in-place
    # update is real, not a no-op flag.
    s2 = TrainState.create(params, opt, jax.random.key(2))
    leaf = jax.tree.leaves(s2.params)[0]
    donated(s2, feats, toks)
    with pytest.raises(RuntimeError):
        np.asarray(leaf)


def test_distill_single_device_donates():
    """Review-found gap: make_distill_step honored donate= only on the
    mesh branch; the single-device jit dropped it (double-allocating
    params+opt-state every step while fit_distill paid the own_state
    copy for nothing). The donated input must really be consumed."""
    from tpucap.train.distill import make_distill_step

    dec, params, feats, toks = _setup()
    teacher = build_decoder(
        "lstm1", vocab_size=50, feature_dim=32, embed_dim=16,
        hidden_dim=16,
    )
    t_params = teacher.init(jax.random.key(9))
    opt = optax.adam(1e-2)
    step = make_distill_step(
        teacher, dec, opt, deterministic=True, donate=True
    )
    plain = make_distill_step(teacher, dec, opt, deterministic=True)

    s_a = TrainState.create(params, opt, jax.random.key(2))
    s_b = own_state(TrainState.create(params, opt, jax.random.key(2)))
    s_a, m_a = plain(s_a, t_params, feats, toks)
    leaf = jax.tree.leaves(s_b.params)[0]
    s_b, m_b = step(s_b, t_params, feats, toks)
    np.testing.assert_allclose(
        float(m_a["loss"]), float(m_b["loss"]), rtol=1e-7
    )
    with pytest.raises(RuntimeError):
        np.asarray(leaf)  # input consumed -> donation is real


def test_dp_donated_matches_single_device():
    from jax.sharding import Mesh

    from tpucap.core import replicate_tree
    from tpucap.parallel import make_dp_train_step

    dec, params, feats, toks = _setup()
    opt = optax.adam(1e-2)
    plain = make_train_step(dec, opt, deterministic=True)
    s1 = TrainState.create(params, opt, jax.random.key(2))
    s1, m1 = plain(s1, feats, toks)

    mesh = Mesh(np.asarray(jax.devices()[:4]), ("data",))
    dp = make_dp_train_step(
        dec, opt, mesh, deterministic=True, donate=True
    )
    s2 = own_state(
        replicate_tree(
            mesh, TrainState.create(params, opt, jax.random.key(2))
        )
    )
    s2, m2 = dp(s2, feats, toks)
    np.testing.assert_allclose(
        float(m1["loss"]), float(m2["loss"]), rtol=1e-6
    )
    for a, b in zip(
        jax.tree.leaves(s1.params), jax.tree.leaves(s2.params),
        strict=True,
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-6
        )


def test_fit_leaves_pipeline_usable():
    """fit donates internally; self.params must stay readable and
    generate must run right after (the own_state contract end-to-end),
    including a second fit on the same pipeline."""
    from tpucap.config import (
        Config,
        DecodeConfig,
        DecoderConfig,
        EncoderConfig,
        TrainConfig,
    )
    from tpucap.pipeline import CaptioningPipeline

    cfg = Config(
        encoder=EncoderConfig(name="tiny_cnn", feature_dim=32),
        decoder=DecoderConfig(
            embed_dim=16, hidden_dim=16, dropout_rate=0.0
        ),
        train=TrainConfig(
            epochs=1, batch_size=4, seed=0, ema_decay=0.99
        ),
        decode=DecodeConfig(max_len=8),
    )
    pipe = CaptioningPipeline(cfg)
    rng = np.random.default_rng(0)
    desc = {
        f"im{i}": ["startseq a b c endseq"] * 2 for i in range(4)
    }
    pipe.fit_tokenizer(desc)
    pipe.build()
    feats = {
        k: rng.normal(size=(32,)).astype(np.float32) for k in desc
    }
    pipe.fit(desc, feats, epochs=1, batch_size=4, log=None)
    # self.params survived the donated loop (own_state) — and a second
    # fit re-donates the same (now state-shared) tree safely.
    pipe.fit(desc, feats, epochs=1, batch_size=4, log=None)
    caps = pipe.generate(
        np.stack([feats["im0"], feats["im1"]]), method="greedy"
    )
    assert len(caps) == 2
