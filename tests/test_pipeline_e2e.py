"""End-to-end integration (SURVEY.md §4): fixtures -> tokenizer -> encoder
-> train -> decode -> BLEU, on CPU with the tiny encoder (config-1 shape)."""

import numpy as np
import pytest

from tpucap.config import Config, DecodeConfig, DecoderConfig, EncoderConfig, TrainConfig
from tpucap.data import (
    generate_fixture_dataset,
    load_descriptions,
    load_split,
    prepare_descriptions,
)
from tpucap.pipeline import CaptioningPipeline


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("fixture_ds")
    img_dir, token_file, train_file, test_file = generate_fixture_dataset(
        root, n_images=8, image_size=32, seed=7
    )
    desc = load_descriptions(token_file)
    train_ids = load_split(train_file)
    test_ids = load_split(test_file)
    return img_dir, desc, train_ids, test_ids


def make_pipeline():
    cfg = Config(
        encoder=EncoderConfig(name="tiny_cnn", feature_dim=128),
        decoder=DecoderConfig(embed_dim=16, hidden_dim=32, dropout_rate=0.0),
        decode=DecodeConfig(max_len=12),
        train=TrainConfig(batch_size=8, learning_rate=5e-3, epochs=1, seed=0),
    )
    return CaptioningPipeline(cfg)


def test_end_to_end_overfits_and_scores(dataset):
    img_dir, desc, train_ids, test_ids = dataset
    pipe = make_pipeline()

    prepared = prepare_descriptions(desc, train_ids)
    pipe.fit_tokenizer(prepared)
    assert pipe.tokenizer.word_index["startseq"]
    pipe.build()

    paths = [f"{img_dir}/{i}.jpg" for i in train_ids]
    feats_arr = pipe.extract_features(paths, batch_size=4)
    assert feats_arr.shape == (len(train_ids), 128)
    feats = dict(zip(train_ids, feats_arr))

    history = pipe.fit(prepared, feats, epochs=40, log=None)
    assert history[-1]["loss"] < history[0]["loss"] * 0.5

    # Greedy and beam generation produce non-empty captions from the vocab.
    caps_g = pipe.generate(feats_arr[:4], method="greedy")
    caps_b = pipe.generate(feats_arr[:4], method="beam", beam_width=3)
    vocab = set(pipe.tokenizer.word_index)
    for c in caps_g + caps_b:
        assert c, "empty caption"
        assert set(c.split()) <= vocab

    # BLEU on the training set after overfitting should be well above zero.
    scores = pipe.evaluate(prepared, feats, method="greedy")
    assert set(scores) == {"bleu1", "bleu2", "bleu3", "bleu4"}
    assert scores["bleu1"] > 0.2, scores

    # Single-image demo path (reference §2.1 #13).
    [cap] = pipe.caption_images(paths[:1], method="beam", beam_width=3)
    assert isinstance(cap, str) and cap


def test_generation_deterministic(dataset):
    img_dir, desc, train_ids, _ = dataset
    pipe = make_pipeline()
    prepared = prepare_descriptions(desc, train_ids)
    pipe.fit_tokenizer(prepared)
    pipe.build()
    feats = np.random.default_rng(0).normal(size=(3, 128)).astype(np.float32)
    a = pipe.generate(feats, method="beam", beam_width=3)
    b = pipe.generate(feats, method="beam", beam_width=3)
    assert a == b


def test_caption_dataset_full_pipeline(dataset):
    """Config-5 path: JPEG bytes -> C++ decode -> on-device normalize ->
    encoder -> beam decode, with tail-batch padding and overlap."""
    img_dir, desc, train_ids, test_ids = dataset
    pipe = make_pipeline()
    prepared = __import__(
        "tpucap.data", fromlist=["prepare_descriptions"]
    ).prepare_descriptions(desc, train_ids)
    pipe.fit_tokenizer(prepared)
    pipe.build()

    all_ids = train_ids + test_ids
    paths = [f"{img_dir}/{i}.jpg" for i in all_ids]
    # fast_scale=False: bit-exact PIL decode parity, so the caption
    # comparison below cannot flip on scaled-IDCT pixel differences.
    caps = pipe.caption_dataset(
        paths, batch_size=3, method="beam", beam_width=2, fast_scale=False
    )
    assert len(caps) == len(paths)
    assert all(isinstance(c, str) for c in caps)

    # Must agree with the two-stage extract+generate path on a full batch.
    feats = pipe.extract_features(paths[:3])
    ref = pipe.generate(feats, method="beam", beam_width=2)
    assert caps[:3] == ref


def test_pipeline_save_load_round_trip(dataset, tmp_path):
    from tpucap.pipeline import CaptioningPipeline

    img_dir, desc, train_ids, _ = dataset
    pipe = make_pipeline()
    prepared = prepare_descriptions(desc, train_ids)
    pipe.fit_tokenizer(prepared)
    pipe.build()

    feats = np.random.default_rng(1).normal(size=(3, 128)).astype(np.float32)
    ref_caps = pipe.generate(feats, method="beam", beam_width=2)

    bundle = str(tmp_path / "bundle")
    pipe.save(bundle)
    loaded = CaptioningPipeline.load(bundle)
    assert loaded.tokenizer.word_index == pipe.tokenizer.word_index
    assert loaded.config.encoder.name == "tiny_cnn"
    caps = loaded.generate(feats, method="beam", beam_width=2)
    assert caps == ref_caps


def test_bf16_inference_precision(dataset):
    """config.precision='bf16' casts the inference flow; captions remain
    coherent and the API contract (strings out) is unchanged."""
    img_dir, desc, train_ids, _ = dataset
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
        train=TrainConfig(batch_size=8, seed=0),
        precision="bf16",
    )
    pipe = CaptioningPipeline(cfg)
    prepared = prepare_descriptions(desc, train_ids)
    pipe.fit_tokenizer(prepared)
    pipe.build()

    paths = [f"{img_dir}/{i}.jpg" for i in train_ids[:4]]
    feats = pipe.extract_features(paths, batch_size=4)
    assert feats.dtype == np.float32  # features returned in f32 for storage
    caps = pipe.generate(feats, method="beam", beam_width=2)
    assert len(caps) == 4 and all(isinstance(c, str) for c in caps)
    caps2 = pipe.caption_dataset(paths, batch_size=4, method="greedy")
    assert len(caps2) == 4


def test_bf16_param_cache_invalidated_after_fit(dataset):
    """Training must refresh the bf16 inference-param cache (regression:
    in-place params mutation left a stale cast copy)."""
    img_dir, desc, train_ids, _ = dataset
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
        train=TrainConfig(batch_size=8, learning_rate=5e-3, seed=0),
        precision="bf16",
    )
    pipe = CaptioningPipeline(cfg)
    prepared = prepare_descriptions(desc, train_ids)
    pipe.fit_tokenizer(prepared)
    pipe.build()
    before = np.asarray(
        pipe._inference_params()["decoder"]["out"]["kernel"], np.float32
    )
    rng = np.random.default_rng(0)
    feats = {i: rng.normal(size=(128,)).astype(np.float32) for i in train_ids}
    pipe.fit(prepared, feats, epochs=2, log=None)
    after = np.asarray(
        pipe._inference_params()["decoder"]["out"]["kernel"], np.float32
    )
    assert not np.array_equal(before, after), "stale bf16 param cache"


def test_generate_sample_method(dataset):
    img_dir, desc, train_ids, _ = dataset
    pipe = make_pipeline()
    prepared = prepare_descriptions(desc, train_ids)
    pipe.fit_tokenizer(prepared)
    pipe.build()
    feats = np.random.default_rng(2).normal(size=(3, 128)).astype(np.float32)
    a = pipe.generate(feats, method="sample", temperature=0.8, seed=1)
    b = pipe.generate(feats, method="sample", temperature=0.8, seed=1)
    c = pipe.generate(feats, method="sample", temperature=0.8, seed=2)
    assert a == b
    assert a != c
    vocab = set(pipe.tokenizer.word_index)
    for cap in a:
        assert set(cap.split()) <= vocab


def test_inject_decoder_through_pipeline(dataset):
    """Config with the inject decoder variant (SURVEY §2.1 #7) trains and
    decodes through the public pipeline."""
    img_dir, desc, train_ids, _ = dataset
    cfg = Config(
        encoder=EncoderConfig(name="tiny_cnn", feature_dim=128),
        decoder=DecoderConfig(
            name="inject", embed_dim=16, hidden_dim=32, dropout_rate=0.0
        ),
        decode=DecodeConfig(max_len=12),
        train=TrainConfig(batch_size=8, learning_rate=5e-3, seed=0),
    )
    pipe = CaptioningPipeline(cfg)
    prepared = prepare_descriptions(desc, train_ids)
    pipe.fit_tokenizer(prepared)
    pipe.build()
    paths = [f"{img_dir}/{i}.jpg" for i in train_ids]
    feats_arr = pipe.extract_features(paths)
    history = pipe.fit(
        prepared, dict(zip(train_ids, feats_arr)), epochs=6, log=None
    )
    assert history[-1]["loss"] < history[0]["loss"]
    caps = pipe.generate(feats_arr[:3], method="beam", beam_width=3)
    assert len(caps) == 3 and all(isinstance(c, str) for c in caps)
