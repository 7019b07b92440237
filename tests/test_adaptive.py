"""Adaptive attention decoder (visual sentinel — Lu et al. 2017).

Greedy/beam token-exactness vs the Python oracles is covered by the
DECODERS parametrization in tests/test_decode.py; this file pins the
family-specific contracts: step == forward_train consistency, the
extended alphas distribution (spatial + sentinel sums to 1; step and
teacher-forced paths agree), beam-shared grids, and the pipeline
surface (fit / generate / generate_with_attention / score_captions).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpucap.models.decoders import AdaptiveAttentionDecoder, build_decoder

VOCAB = 23
FEAT = 11
L = 9  # 3x3 grid
B = 4


@pytest.fixture(scope="module")
def dec_params():
    dec = build_decoder(
        "adaptive",
        vocab_size=VOCAB,
        feature_dim=FEAT,
        embed_dim=8,
        hidden_dim=16,
        attention_dim=12,
        dropout_rate=0.0,
    )
    assert isinstance(dec, AdaptiveAttentionDecoder)
    return dec, dec.init(jax.random.key(0))


@pytest.fixture(scope="module")
def grid(rng):
    return jnp.asarray(
        rng.normal(size=(B, L, FEAT)).astype(np.float32)
    )


def test_step_matches_forward_train(dec_params, grid, rng):
    """Stepping token-by-token reproduces the teacher-forced scan —
    the consistency every decode engine relies on."""
    dec, params = dec_params
    T = 6
    tokens = jnp.asarray(
        rng.integers(1, VOCAB, size=(B, T)).astype(np.int32)
    )
    full = dec.forward_train(params, grid, tokens, deterministic=True)

    state = dec.init_state(params, grid)
    for t in range(T):
        logits, state = dec.step(params, state, tokens[:, t])
        np.testing.assert_allclose(
            np.asarray(logits), np.asarray(full[:, t]), atol=1e-5
        )


def test_alphas_extended_distribution(dec_params, grid, rng):
    """alphas are (B, T, L+1): a proper distribution per step whose
    last column is the sentinel weight beta in (0, 1)."""
    dec, params = dec_params
    T = 5
    tokens = jnp.asarray(
        rng.integers(1, VOCAB, size=(B, T)).astype(np.int32)
    )
    _, alphas = dec.forward_hidden_with_alphas(
        params, grid, tokens, deterministic=True
    )
    alphas = np.asarray(alphas)
    assert alphas.shape == (B, T, L + 1)
    np.testing.assert_allclose(alphas.sum(-1), 1.0, atol=1e-5)
    beta = alphas[..., -1]
    assert np.all(beta > 0) and np.all(beta < 1)


def test_step_alphas_match_forward(dec_params, grid, rng):
    dec, params = dec_params
    T = 4
    tokens = jnp.asarray(
        rng.integers(1, VOCAB, size=(B, T)).astype(np.int32)
    )
    _, fwd_alphas = dec.forward_hidden_with_alphas(
        params, grid, tokens, deterministic=True
    )
    state = dec.init_state(params, grid)
    for t in range(T):
        _, state, alpha = dec._step_full(params, state, tokens[:, t])
        np.testing.assert_allclose(
            np.asarray(alpha), np.asarray(fwd_alphas[:, t]), atol=1e-5
        )


def test_beam_shared_grid_matches_tiled(dec_params, grid):
    """_attend with untiled (B, L, *) grids and (B*k, H) hypotheses must
    equal the explicitly tiled computation — the beam engine's
    beam_shared_keys contract."""
    dec, params = dec_params
    k = 3
    state = dec.init_state(params, grid)
    key = jax.random.key(7)
    h = jax.random.normal(key, (B * k, 16))
    s = jax.random.normal(jax.random.key(8), (B * k, 16))

    shared = {"val": state["val"], "att_feat": state["att_feat"]}
    ctx_shared, a_shared = dec._attend(params, shared, h, s)

    tiled = {
        "val": jnp.repeat(state["val"], k, axis=0),
        "att_feat": jnp.repeat(state["att_feat"], k, axis=0),
    }
    # repeat is beam-major per image: row b*k+j of h pairs with image b.
    ctx_tiled, a_tiled = dec._attend(params, tiled, h, s)
    np.testing.assert_allclose(
        np.asarray(ctx_shared), np.asarray(ctx_tiled), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(a_shared), np.asarray(a_tiled), atol=1e-5
    )


def _pipe(toy_corpus):
    from tpucap.config import (
        Config, DecodeConfig, DecoderConfig, EncoderConfig,
    )
    from tpucap.pipeline import CaptioningPipeline
    from tpucap.text import Tokenizer

    cfg = Config(
        encoder=EncoderConfig(
            name="tiny_cnn", features="spatial", feature_dim=128
        ),
        decoder=DecoderConfig(
            name="adaptive", embed_dim=8, hidden_dim=16,
            attention_dim=12, dropout_rate=0.0,
        ),
        decode=DecodeConfig(max_len=8),
    )
    p = CaptioningPipeline(cfg)
    tok = Tokenizer()
    tok.fit_on_texts(toy_corpus)
    p.tokenizer = tok
    p.build()
    return p


def test_pipeline_e2e(toy_corpus, rng):
    """fit a couple of epochs on synthetic spatial features, then
    generate / generate_with_attention / score through the pipeline."""
    p = _pipe(toy_corpus)
    g = p.encoder.spatial_positions
    ids = [f"img{i}" for i in range(4)]
    feats = {
        i: rng.normal(size=(g, 128)).astype(np.float32) for i in ids
    }
    descs = {i: [toy_corpus[j % len(toy_corpus)]] for j, i in enumerate(ids)}
    hist = p.fit(descs, feats, epochs=2, batch_size=2)
    losses = [h["loss"] for h in hist]
    assert len(losses) == 2
    assert np.isfinite(losses[-1])
    assert losses[-1] <= losses[0] * 1.5  # trains, not NaN

    x = np.stack([feats[i] for i in ids[:2]])
    caps = p.generate(x, method="beam", beam_width=3)
    assert len(caps) == 2
    caps_g, alphas, lengths = p.generate_with_attention(
        x, method="greedy"
    )
    assert alphas.shape[0] == 2 and alphas.shape[2] == g + 1
    np.testing.assert_allclose(alphas.sum(-1), 1.0, atol=1e-4)
    scores = p.score_captions(x, caps_g)
    assert all(s["logp"] < 0 for s in scores)
