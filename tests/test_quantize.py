"""int8 post-training quantization of frozen encoders (docs/PERF.md round-2
encoder workstream): kernel round-trip, conv/dense numerics vs f32,
whole-encoder feature drift, caption parity through the pipeline, and
survival of the bf16 inference cast."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpucap.models.encoders.common import conv
from tpucap.models.encoders.quantize import (
    _quantize_kernel,
    quantize_encoder_params,
    quantize_input,
)


def test_kernel_roundtrip_error_bounded(rng):
    k = rng.normal(size=(3, 3, 16, 32)).astype(np.float32)
    q, scale = _quantize_kernel(k)
    assert q.dtype == np.int8 and scale.shape == (32,)
    dq = q.astype(np.float32) * scale
    # Symmetric rounding: per-element error <= scale/2 for that channel.
    err = np.abs(dq - k)
    assert np.all(err <= scale / 2 + 1e-7)


def test_quantize_input_scale():
    x = jnp.asarray([[0.5, -2.0, 1.0]], jnp.float32)
    q, s = quantize_input(x)
    assert q.dtype == jnp.int8
    np.testing.assert_allclose(float(s), 2.0 / 127.0, rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(q, np.float32) * float(s), np.asarray(x), atol=float(s)
    )


def test_int8_conv_close_to_f32(rng):
    x = jnp.asarray(rng.normal(size=(2, 16, 16, 8)), jnp.float32)
    kern = rng.normal(size=(3, 3, 8, 16)).astype(np.float32) * 0.1
    bias = rng.normal(size=(16,)).astype(np.float32) * 0.01
    p = {"kernel": jnp.asarray(kern), "bias": jnp.asarray(bias)}
    ref = np.asarray(conv(p, x))
    pq = quantize_encoder_params(p)
    assert pq["kernel"].dtype == jnp.int8
    out = np.asarray(conv(pq, x))
    # ~8-bit relative accuracy on both operands.
    denom = np.abs(ref).max()
    assert np.abs(out - ref).max() / denom < 0.03


def test_int8_dense_close_to_f32(rng):
    from tpucap.models.layers import dense

    x = jnp.asarray(rng.normal(size=(4, 64)), jnp.float32)
    p = {
        "kernel": jnp.asarray(
            rng.normal(size=(64, 32)).astype(np.float32) * 0.1
        ),
        "bias": jnp.zeros((32,), jnp.float32),
    }
    ref = np.asarray(dense(p, x))
    out = np.asarray(dense(quantize_encoder_params(p), x))
    assert np.abs(out - ref).max() / np.abs(ref).max() < 0.03


def test_tiny_encoder_features_drift_small(rng):
    from tpucap.models.encoders import build_encoder

    enc = build_encoder("tiny_cnn")
    params = enc.init(jax.random.key(0))
    x = jnp.asarray(rng.normal(size=(4, 32, 32, 3)), jnp.float32)
    ref = np.asarray(enc.apply(params, x))
    out = np.asarray(enc.apply(quantize_encoder_params(params), x))
    # Three stacked quantized convs: feature vectors stay ~1% close.
    rel = np.linalg.norm(out - ref) / np.linalg.norm(ref)
    assert rel < 0.05, rel
    cos = np.sum(out * ref) / (
        np.linalg.norm(out) * np.linalg.norm(ref)
    )
    assert cos > 0.999, cos


def test_int8_vocab_projection_logits_close(rng):
    """Quantizing only the output head must keep step logits ~8-bit close
    and preserve the argmax on (nearly) every row."""
    import jax

    from tpucap.models.decoders import build_decoder
    from tpucap.models.encoders.quantize import quantize_decoder_projection

    dec = build_decoder(
        "lstm1", vocab_size=211, feature_dim=32, embed_dim=16, hidden_dim=32
    )
    params = dec.init(jax.random.key(0))
    qparams = quantize_decoder_projection(params)
    assert qparams["out"]["kernel"].dtype == jnp.int8
    assert qparams["out"]["kernel_scale"].shape == (211,)
    # Everything but the head is untouched (same objects).
    assert qparams["embedding"] is params["embedding"]
    assert qparams["cells"] is params["cells"]

    feats = jnp.asarray(rng.normal(size=(8, 32)), jnp.float32)
    tok = jnp.asarray(rng.integers(1, 211, size=(8,)), jnp.int32)
    state = dec.init_state(params, feats)
    ref, _ = dec.step(params, state, tok)
    out, _ = dec.step(qparams, dec.init_state(qparams, feats), tok)
    ref, out = np.asarray(ref), np.asarray(out)
    assert np.abs(out - ref).max() / np.abs(ref).max() < 0.03
    same = (ref.argmax(-1) == out.argmax(-1)).mean()
    assert same >= 7 / 8, same


def test_pad_vocab_params_rejects_int8_head():
    import jax

    from tpucap.models.decoders import build_decoder
    from tpucap.models.encoders.quantize import quantize_decoder_projection
    from tpucap.parallel import pad_vocab_params

    dec = build_decoder(
        "lstm1", vocab_size=16, feature_dim=8, embed_dim=8, hidden_dim=8
    )
    q = quantize_decoder_projection(dec.init(jax.random.key(0)))
    with pytest.raises(NotImplementedError, match="int8"):
        pad_vocab_params(q, 8)  # even the aligned (pad==0) case refuses


def test_pipeline_quantize_encoder_caption_parity(tmp_path, rng):
    """Trained fixture pipeline: quantizing the encoder must leave the
    (overfit) captions essentially unchanged."""
    from tpucap.config import (
        Config,
        DecodeConfig,
        DecoderConfig,
        EncoderConfig,
        TrainConfig,
    )
    from tpucap.data import (
        generate_fixture_dataset,
        load_descriptions,
        load_split,
        prepare_descriptions,
    )
    from tpucap.pipeline import CaptioningPipeline

    img_dir, token_file, train_file, _ = generate_fixture_dataset(
        tmp_path / "ds", n_images=8, image_size=32, seed=21
    )
    desc = load_descriptions(token_file)
    train_ids = load_split(train_file)
    prepared = prepare_descriptions(desc, train_ids)

    cfg = Config(
        encoder=EncoderConfig(name="tiny_cnn", feature_dim=128),
        decoder=DecoderConfig(embed_dim=16, hidden_dim=32, dropout_rate=0.0),
        decode=DecodeConfig(max_len=12),
        train=TrainConfig(batch_size=8, learning_rate=5e-3, seed=0),
    )
    pipe = CaptioningPipeline(cfg)
    pipe.fit_tokenizer(prepared)
    pipe.build()
    paths = [f"{img_dir}/{i}.jpg" for i in train_ids]
    feats_arr = pipe.extract_features(paths)
    pipe.fit(prepared, dict(zip(train_ids, feats_arr)), epochs=25, log=None)

    from PIL import Image

    images = np.stack(
        [
            np.asarray(Image.open(p).resize((32, 32)), np.float32) / 127.5
            - 1.0
            for p in paths
        ]
    )
    ref_caps = pipe.generate(pipe.encode_images(images), method="greedy")
    pipe.quantize_encoder()
    q_caps = pipe.generate(pipe.encode_images(images), method="greedy")
    same = sum(a == b for a, b in zip(ref_caps, q_caps))
    assert same >= len(ref_caps) - 1, (ref_caps, q_caps)


def test_pipeline_quantize_vocab_projection_caption_parity(toy_corpus):
    """int8 vocab projection on a model with real logit margins.

    The image-fixture pipelines are a poor testbed for the head: the tiny
    encoder barely separates the synthetic images, so the trained logits sit
    on data-inherent near-ties that ANY perturbation (int8 rounding, bf16,
    batch composition) can flip, and one flipped token cascades through the
    autoregressive decode. Here the decoder is overfit on distinct,
    well-separated features with distinct captions — margins far exceed the
    8-bit rounding noise — so caption parity must be exact."""
    import jax

    from tpucap.config import (
        Config,
        DecodeConfig,
        DecoderConfig,
        EncoderConfig,
        TrainConfig,
    )
    from tpucap.pipeline import CaptioningPipeline

    cfg = Config(
        encoder=EncoderConfig(name="tiny_cnn", feature_dim=128),
        decoder=DecoderConfig(embed_dim=16, hidden_dim=32, dropout_rate=0.0),
        decode=DecodeConfig(max_len=12),
        train=TrainConfig(batch_size=8, learning_rate=1e-2, seed=0),
    )
    ids = [f"img{i}" for i in range(len(toy_corpus))]
    descriptions = {i: [c] for i, c in zip(ids, toy_corpus)}
    # Distinct, well-separated features: scaled one-hot directions.
    feats = np.eye(len(ids), 128, dtype=np.float32) * 4.0
    pipe = CaptioningPipeline(cfg)
    pipe.fit_tokenizer(descriptions)
    pipe.build()
    pipe.fit(
        descriptions, dict(zip(ids, feats)), epochs=150, log=None
    )
    ref_greedy = pipe.generate(feats, method="greedy")
    ref_beam = pipe.generate(feats, method="beam", beam_width=3)
    pipe.quantize_vocab_projection()
    assert pipe.params["decoder"]["out"]["kernel"].dtype == jnp.int8
    q_greedy = pipe.generate(feats, method="greedy")
    q_beam = pipe.generate(feats, method="beam", beam_width=3)
    n = len(ids)
    assert sum(a == b for a, b in zip(ref_greedy, q_greedy)) >= n - 1, (
        ref_greedy,
        q_greedy,
    )
    assert sum(a == b for a, b in zip(ref_beam, q_beam)) >= n - 1, (
        ref_beam,
        q_beam,
    )


def test_bf16_inference_cast_preserves_int8(toy_corpus):
    from tpucap.config import Config, DecoderConfig, EncoderConfig
    from tpucap.pipeline import CaptioningPipeline
    from tpucap.text import Tokenizer

    cfg = Config(
        encoder=EncoderConfig(name="tiny_cnn", feature_dim=128),
        decoder=DecoderConfig(embed_dim=16, hidden_dim=32),
        precision="bf16",
    )
    tok = Tokenizer()
    tok.fit_on_texts(toy_corpus)
    pipe = CaptioningPipeline(cfg, tokenizer=tok)
    pipe.build()
    pipe.quantize_encoder()
    inf = pipe._inference_params()
    enc = inf["encoder"]
    assert enc["conv1"]["kernel"].dtype == jnp.int8
    assert enc["conv1"]["kernel_scale"].dtype == jnp.float32
    assert enc["conv1"]["bias"].dtype == jnp.bfloat16
    # And the quantized encoder still runs under the bf16 flow.
    feats = pipe.encode_images(np.zeros((2, 32, 32, 3), np.float32))
    assert feats.shape == (2, 128)


def test_quantized_bundle_save_load_roundtrip(tmp_path, toy_corpus, rng):
    """save() then load() of a quantized pipeline must preserve int8
    kernels + scales and reproduce features exactly (load restores the
    raw saved tree, not build()'s float template)."""
    from tpucap.config import Config, DecodeConfig, DecoderConfig, EncoderConfig
    from tpucap.pipeline import CaptioningPipeline
    from tpucap.text import Tokenizer

    cfg = Config(
        encoder=EncoderConfig(name="tiny_cnn", feature_dim=128),
        decoder=DecoderConfig(embed_dim=16, hidden_dim=32),
        decode=DecodeConfig(max_len=10),
    )
    tok = Tokenizer()
    tok.fit_on_texts(toy_corpus)
    pipe = CaptioningPipeline(cfg, tokenizer=tok)
    pipe.build()
    pipe.quantize_encoder()
    pipe.quantize_vocab_projection()
    imgs = rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32)
    ref = np.asarray(pipe.encode_images(imgs), np.float32)
    ref_caps = pipe.generate(pipe.encode_images(imgs))
    pipe.save(str(tmp_path / "bundle"))
    pipe2 = CaptioningPipeline.load(str(tmp_path / "bundle"))
    assert pipe2.params["encoder"]["conv1"]["kernel"].dtype == jnp.int8
    assert pipe2.params["decoder"]["out"]["kernel"].dtype == jnp.int8
    assert pipe2.generate(pipe2.encode_images(imgs)) == ref_caps
    assert (
        pipe2.params["encoder"]["conv1"]["kernel_scale"].dtype
        == jnp.float32
    )
    out = np.asarray(pipe2.encode_images(imgs), np.float32)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)
