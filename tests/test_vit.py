"""ViT encoder family (models/encoders/vit.py) — the beyond-parity
transformer encoder. Numeric tests run the test-scale `vit_tiny`; the
ViT-B/16 production shape is contract-checked via eval_shape in
tests/test_encoders.py::test_spatial_positions_matches_apply.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpucap.config import (
    Config,
    DecodeConfig,
    DecoderConfig,
    FEATURE_DIMS,
    encoder_config,
)
from tpucap.models.encoders import ViT, build_encoder, vit_tiny
from tpucap.pipeline import CaptioningPipeline


def _x(b=2, size=32, seed=0):
    return jax.random.normal(jax.random.key(seed), (b, size, size, 3))


def test_shapes_pooled_and_spatial():
    enc = vit_tiny()
    params = enc.init(jax.random.key(1))
    pooled = enc.apply(params, _x())
    assert pooled.shape == (2, enc.hidden_dim)

    enc_s = vit_tiny(features="spatial")
    grid = enc_s.apply(params, _x())
    g = enc_s.grid
    assert grid.shape == (2, g, g, enc_s.hidden_dim)
    assert g * g == enc_s.spatial_positions


def test_pooled_is_mean_of_spatial_grid():
    """'pooled' must be exactly the token-grid mean — the two feature
    kinds are views of one forward pass, not different models."""
    enc = vit_tiny()
    enc_s = vit_tiny(features="spatial")
    params = enc.init(jax.random.key(2))
    x = _x(seed=3)
    pooled = enc.apply(params, x)
    grid = enc_s.apply(params, x)
    np.testing.assert_allclose(
        np.asarray(pooled),
        np.asarray(grid.reshape(2, -1, enc.hidden_dim).mean(axis=1)),
        atol=1e-6,
    )


def test_registry_and_tables():
    enc = build_encoder("vit_b16", features="spatial")
    assert isinstance(enc, ViT)
    assert (enc.input_size, enc.preprocess_mode) == (224, "tf")
    assert enc.spatial_positions == 196
    for name in ("vit_b16", "vit_tiny"):
        for kind in ("pooled", "spatial"):
            cfg = encoder_config(name, features=kind)
            assert cfg.feature_dim == FEATURE_DIMS[name, kind]
    assert build_encoder("vit_tiny").feature_dim == 64


def test_validation_errors():
    with pytest.raises(ValueError, match="patch_size"):
        ViT(input_size=224, patch_size=15)
    with pytest.raises(ValueError, match="num_heads"):
        ViT(hidden_dim=64, num_heads=5)
    with pytest.raises(ValueError, match="attention_impl"):
        ViT(attention_impl="fused")


def test_flash_variant_constructs_and_shares_params():
    """attention_impl is an apply-time dispatch only: the flash variant
    must expose identical init/param structure (so a checkpoint trained
    with one impl loads under the other)."""
    enc = vit_tiny()
    enc_f = dataclasses.replace(enc, attention_impl="flash")
    assert enc_f.attention_impl == "flash"
    p = enc.init(jax.random.key(11))
    pf = enc_f.init(jax.random.key(11))
    assert jax.tree_util.tree_structure(p) == jax.tree_util.tree_structure(
        pf
    )
    for a, b in zip(jax.tree.leaves(p), jax.tree.leaves(pf)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="stock Pallas flash kernel lowers on TPU only "
    "(the suite pins CPU; run manually on the chip)",
)
def test_flash_matches_xla_on_tpu():
    """Numerics gate for the opt-in flash path: the padded+segment-masked
    flash attention must match XLA sdpa through a full ViT-B/16 forward
    (pad tokens are fenced by segment ids, so real rows are unaffected)."""
    enc = build_encoder("vit_b16", features="spatial")
    enc_f = dataclasses.replace(enc, attention_impl="flash")
    params = enc.init(jax.random.key(12))
    p16 = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)
    x = _x(b=2, size=224, seed=13).astype(jnp.bfloat16)
    ref = np.asarray(jax.jit(enc.apply)(p16, x), dtype=np.float32)
    got = np.asarray(jax.jit(enc_f.apply)(p16, x), dtype=np.float32)
    np.testing.assert_allclose(got, ref, atol=0.1, rtol=0.05)


def test_jit_and_bf16():
    """One trace; bf16 inputs stay bf16 out (the serving dtype flow)."""
    enc = vit_tiny()
    params = enc.init(jax.random.key(4))
    traces = 0

    @jax.jit
    def f(p, x):
        nonlocal traces
        traces += 1
        return enc.apply(p, x)

    p16 = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)
    out = f(p16, _x().astype(jnp.bfloat16))
    out2 = f(p16, _x(seed=9).astype(jnp.bfloat16))
    assert traces == 1
    assert out.dtype == jnp.bfloat16 and out2.shape == (2, 64)


def test_int8_quantization_drift():
    """The generic PTQ walk covers the ViT (patchify conv + all dense
    kernels); int8 features stay close to float."""
    from tpucap.models.encoders.quantize import quantize_encoder_params

    enc = vit_tiny()
    params = enc.init(jax.random.key(5))
    x = _x(seed=6)
    ref = np.asarray(enc.apply(params, x))
    qp = quantize_encoder_params(params)
    kernels = [
        k for k in jax.tree_util.tree_leaves(qp) if k.dtype == jnp.int8
    ]
    # patch_embed + 2 blocks x (qkv, o, mlp_in, mlp_out)
    assert len(kernels) == 1 + 2 * 4
    got = np.asarray(enc.apply(qp, x))
    err = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
    assert err < 0.15, err


def test_pipeline_e2e_all_transformer(toy_corpus):
    """The all-transformer captioner: vit_tiny spatial grid feeding the
    transformer decoder's cross-attention, through fit + both engines."""
    cfg = Config(
        encoder=encoder_config("vit_tiny", features="spatial"),
        decoder=DecoderConfig(
            name="transformer", hidden_dim=32, num_layers=1, num_heads=2,
            mlp_dim=64, max_positions=16, dropout_rate=0.0,
        ),
        decode=DecodeConfig(max_len=12),
        precision="f32",
    )
    pipe = CaptioningPipeline(cfg)
    desc = {f"im{i}": [c] for i, c in enumerate(toy_corpus)}
    pipe.fit_tokenizer(desc)
    pipe.build()

    rng = np.random.default_rng(7)
    n = len(desc)
    images = rng.normal(size=(n, 32, 32, 3)).astype(np.float32)
    feats = np.asarray(
        pipe._apply_encoder(pipe.params["encoder"], jnp.asarray(images))
    )
    assert feats.shape == (n, pipe.encoder.spatial_positions, 64)

    hist = pipe.fit(
        desc, {f"im{i}": feats[i] for i in range(n)}, epochs=2, log=None
    )
    assert np.isfinite(hist[-1]["loss"])

    greedy = pipe.generate(feats[:3], method="greedy")
    beam = pipe.generate(feats[:3], method="beam", beam_width=2)
    assert len(greedy) == len(beam) == 3
    assert all(isinstance(c, str) for c in greedy)
