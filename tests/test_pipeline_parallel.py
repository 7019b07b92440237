"""Mesh-sharded serving through the PUBLIC pipeline API (VERDICT r1 #2):
generate/caption_dataset/evaluate with parallelism='dp'|'tp'|'dp_tp' on the
8-virtual-device mesh must produce captions identical to the single-device
path, and evaluate must compile exactly one program per (batch, beam)
shape (tail batches are padded — VERDICT r1 #5)."""

import numpy as np
import pytest

from tpucap.config import (
    Config,
    DecodeConfig,
    DecoderConfig,
    EncoderConfig,
    MeshConfig,
)
from tpucap.pipeline import CaptioningPipeline
from tpucap.text import Tokenizer


def make_pipe(corpus, *, model_devices=1, precision="mixed"):
    cfg = Config(
        encoder=EncoderConfig(name="tiny_cnn", feature_dim=128),
        decoder=DecoderConfig(embed_dim=16, hidden_dim=32, dropout_rate=0.0),
        decode=DecodeConfig(max_len=10),
        mesh=MeshConfig(model_devices=model_devices),
        precision=precision,
    )
    pipe = CaptioningPipeline(cfg)
    tok = Tokenizer()
    tok.fit_on_texts(corpus)
    pipe.tokenizer = tok
    pipe.build()
    return pipe


@pytest.fixture(scope="module")
def feats(rng):
    # 10 rows: NOT divisible by the 8-device mesh, exercising the pad+trim
    # path in generate(parallelism=...).
    return rng.normal(size=(10, 128)).astype(np.float32)


def test_generate_dp_matches_single(toy_corpus, feats):
    pipe = make_pipe(toy_corpus)
    for method, kw in [("greedy", {}), ("beam", {"beam_width": 3})]:
        ref = pipe.generate(feats, method=method, **kw)
        dp = pipe.generate(feats, method=method, parallelism="dp", **kw)
        assert dp == ref, method


def test_generate_tp_matches_single(toy_corpus, feats):
    # Vocab (toy corpus ~40 words) is NOT divisible by 8: the tp path must
    # auto-pad the vocab without changing any caption.
    pipe = make_pipe(toy_corpus)
    assert pipe.decoder.vocab_size % 8 != 0
    ref = pipe.generate(feats, method="beam", beam_width=3)
    tp = pipe.generate(feats, method="beam", beam_width=3, parallelism="tp")
    assert tp == ref
    # Greedy under tp runs the beam engine at width 1 — token-identical.
    refg = pipe.generate(feats, method="greedy")
    tpg = pipe.generate(feats, method="greedy", parallelism="tp")
    assert tpg == refg


def test_generate_dp_tp_2d_mesh(toy_corpus, feats):
    pipe = make_pipe(toy_corpus, model_devices=2)  # mesh (4, 2)
    ref = pipe.generate(feats, method="beam", beam_width=3)
    out = pipe.generate(
        feats, method="beam", beam_width=3, parallelism="dp_tp"
    )
    assert out == ref


def test_generate_sample_rejects_parallelism(toy_corpus, feats):
    pipe = make_pipe(toy_corpus)
    with pytest.raises(ValueError, match="sampl"):
        pipe.generate(feats, method="sample", parallelism="dp")


def test_caption_dataset_dp_matches_single(toy_corpus, tmp_path):
    from tpucap.data import generate_fixture_dataset

    img_dir, *_ = generate_fixture_dataset(
        tmp_path / "ds", n_images=10, image_size=48, seed=3
    )
    import os

    paths = sorted(
        os.path.join(img_dir, f) for f in os.listdir(img_dir)
    )
    pipe = make_pipe(toy_corpus)
    ref = pipe.caption_dataset(paths, batch_size=8, method="beam")
    dp = pipe.caption_dataset(
        paths, batch_size=8, method="beam", parallelism="dp"
    )
    assert dp == ref
    with pytest.raises(ValueError, match="divide"):
        pipe.caption_dataset(
            paths, batch_size=6, method="greedy", parallelism="dp"
        )


def _eval_data(pipe, rng, n=10):
    ids = [f"img{i}" for i in range(n)]
    desc = {
        i: ["startseq a dog runs endseq", "startseq the dog is running endseq"]
        for i in ids
    }
    features = {
        i: rng.normal(size=(128,)).astype(np.float32) for i in ids
    }
    return desc, features


def test_evaluate_pads_tail_single_trace(toy_corpus, rng):
    pipe = make_pipe(toy_corpus)
    desc, features = _eval_data(pipe, rng, n=10)
    scores = pipe.evaluate(desc, features, batch_size=8, method="beam")
    assert set(scores) >= {"bleu1", "bleu2", "bleu3", "bleu4"}
    # 10 ids at batch 8 = chunks of 8 and 2(padded to 8): exactly ONE
    # compiled program for the (8, beam) shape.
    fn = pipe._decode_cache[("beam", pipe.config.decode.beam_width)]
    assert fn._cache_size() == 1


def test_evaluate_dp_matches_single(toy_corpus, rng):
    pipe = make_pipe(toy_corpus)
    desc, features = _eval_data(pipe, rng, n=10)
    ref = pipe.evaluate(desc, features, batch_size=8, method="greedy")
    dp = pipe.evaluate(
        desc, features, batch_size=8, method="greedy", parallelism="dp"
    )
    assert dp == ref


def test_fit_dp_tp_2d_training(toy_corpus, rng):
    """fit(parallelism='dp_tp') trains on the 2-D batch x vocab mesh
    (make_tp_train_step with data_axis) and descends."""
    pipe = make_pipe(toy_corpus, model_devices=2)  # mesh (4, 2)
    ids = [f"i{k}" for k in range(8)]
    desc = {i: [toy_corpus[k % len(toy_corpus)]] for k, i in enumerate(ids)}
    features = {i: rng.normal(size=(128,)).astype(np.float32) for i in ids}
    history = pipe.fit(
        desc, features, epochs=6, batch_size=8, parallelism="dp_tp",
        log=None,
    )
    assert history[-1]["loss"] < history[0]["loss"]

    with pytest.raises(ValueError, match="divide"):
        pipe.fit(
            desc, features, epochs=1, batch_size=7, parallelism="dp_tp",
            log=None,
        )


def make_transformer_pipe(corpus, *, num_layers, model_devices=1):
    cfg = Config(
        encoder=EncoderConfig(name="tiny_cnn", feature_dim=128),
        decoder=DecoderConfig(
            name="transformer",
            hidden_dim=32,
            num_layers=num_layers,
            num_heads=2,
            mlp_dim=64,
            max_positions=16,
            dropout_rate=0.0,
        ),
        decode=DecodeConfig(max_len=10),
        mesh=MeshConfig(model_devices=model_devices),
        precision="f32",
    )
    pipe = CaptioningPipeline(cfg)
    tok = Tokenizer()
    tok.fit_on_texts(corpus)
    pipe.tokenizer = tok
    pipe.build()
    return pipe


def test_fit_pp_pipeline_training(toy_corpus, rng):
    """fit(parallelism='pp'): 8-stage GPipe pipeline over the full mesh,
    with a val split (exercising the stacked->canonical eval conversion);
    the pipeline hands back CANONICAL params that still decode."""
    pipe = make_transformer_pipe(toy_corpus, num_layers=8)
    ids = [f"i{k}" for k in range(8)]
    desc = {i: [toy_corpus[k % len(toy_corpus)]] for k, i in enumerate(ids)}
    features = {i: rng.normal(size=(128,)).astype(np.float32) for i in ids}
    history = pipe.fit(
        desc,
        features,
        epochs=6,
        batch_size=8,
        parallelism="pp",
        val_data=(desc, features),
        log=None,
    )
    assert history[-1]["loss"] < history[0]["loss"]
    assert "val_loss" in history[-1]
    assert isinstance(pipe.params["decoder"]["layers"], list)
    caps = pipe.generate(
        rng.normal(size=(2, 128)).astype(np.float32), method="greedy"
    )
    assert len(caps) == 2


def test_fit_dp_pp_2d_training(toy_corpus, rng):
    """fit(parallelism='dp_pp') trains on the 2-D (data=4, stage=2) mesh."""
    pipe = make_transformer_pipe(toy_corpus, num_layers=2, model_devices=2)
    ids = [f"i{k}" for k in range(8)]
    desc = {i: [toy_corpus[k % len(toy_corpus)]] for k, i in enumerate(ids)}
    features = {i: rng.normal(size=(128,)).astype(np.float32) for i in ids}
    history = pipe.fit(
        desc, features, epochs=6, batch_size=8, parallelism="dp_pp",
        log=None,
    )
    assert history[-1]["loss"] < history[0]["loss"]


def test_fit_ep_moe_training(toy_corpus, rng):
    """fit(parallelism='ep'): 8-way expert-parallel MoE training through
    the public surface; the trained MoE decoder still decodes."""
    cfg = Config(
        encoder=EncoderConfig(name="tiny_cnn", feature_dim=128),
        decoder=DecoderConfig(
            name="transformer",
            hidden_dim=32,
            num_layers=1,
            num_heads=2,
            mlp_dim=64,
            max_positions=16,
            dropout_rate=0.0,
            num_experts=8,
        ),
        decode=DecodeConfig(max_len=10),
        precision="f32",
    )
    pipe = CaptioningPipeline(cfg)
    tok = Tokenizer()
    tok.fit_on_texts(toy_corpus)
    pipe.tokenizer = tok
    pipe.build()
    ids = [f"i{k}" for k in range(8)]
    desc = {i: [toy_corpus[k % len(toy_corpus)]] for k, i in enumerate(ids)}
    features = {i: rng.normal(size=(128,)).astype(np.float32) for i in ids}
    history = pipe.fit(
        desc, features, epochs=6, batch_size=8, parallelism="ep", log=None
    )
    assert history[-1]["loss"] < history[0]["loss"]
    assert history[-1]["moe_aux"] > 0.0
    caps = pipe.generate(
        rng.normal(size=(2, 128)).astype(np.float32), method="greedy"
    )
    assert len(caps) == 2


def test_fit_sp_ring_attention_training(toy_corpus, rng):
    """fit(parallelism='sp'): 8-way ring-attention sequence parallelism
    through the public surface. max_len=10 gives a teacher-forced length
    of 10, which fit auto-pads to 16 (the next 8-ring multiple) with
    loss-masked pad columns; trained params still decode."""
    cfg = Config(
        encoder=EncoderConfig(name="tiny_cnn", feature_dim=128),
        decoder=DecoderConfig(
            name="transformer",
            hidden_dim=32,
            num_layers=1,
            num_heads=2,
            mlp_dim=64,
            max_positions=20,
            dropout_rate=0.0,
        ),
        decode=DecodeConfig(max_len=10),
        precision="f32",
    )
    pipe = CaptioningPipeline(cfg)
    tok = Tokenizer()
    tok.fit_on_texts(toy_corpus)
    pipe.tokenizer = tok
    pipe.build()
    ids = [f"i{k}" for k in range(8)]
    desc = {i: [toy_corpus[k % len(toy_corpus)]] for k, i in enumerate(ids)}
    features = {i: rng.normal(size=(128,)).astype(np.float32) for i in ids}
    history = pipe.fit(
        desc, features, epochs=6, batch_size=8, parallelism="sp", log=None
    )
    assert history[-1]["loss"] < history[0]["loss"]
    caps = pipe.generate(
        rng.normal(size=(2, 128)).astype(np.float32), method="greedy"
    )
    assert len(caps) == 2


def test_fit_pp_rejects_non_transformer(toy_corpus, rng):
    pipe = make_pipe(toy_corpus)  # merge-LSTM decoder
    ids = [f"i{k}" for k in range(8)]
    desc = {i: [toy_corpus[k % len(toy_corpus)]] for k, i in enumerate(ids)}
    features = {i: rng.normal(size=(128,)).astype(np.float32) for i in ids}
    with pytest.raises(ValueError, match="layer stages"):
        pipe.fit(
            desc, features, epochs=1, batch_size=8, parallelism="pp",
            log=None,
        )


def test_extract_features_dp_matches_single(toy_corpus, tmp_path):
    from tpucap.data import generate_fixture_dataset

    img_dir, *_ = generate_fixture_dataset(
        tmp_path / "ds2", n_images=10, image_size=48, seed=9
    )
    import os

    paths = sorted(os.path.join(img_dir, f) for f in os.listdir(img_dir))
    pipe = make_pipe(toy_corpus)
    ref = pipe.extract_features(paths, batch_size=8)
    dp = pipe.extract_features(paths, batch_size=8, parallelism="dp")
    np.testing.assert_allclose(dp, ref, rtol=1e-5, atol=1e-5)
    assert dp.shape[0] == 10  # tail padded then trimmed
    with pytest.raises(ValueError, match="divide"):
        pipe.extract_features(paths, batch_size=6, parallelism="dp")


def test_tp_fit_unpads_vocab_after_training(toy_corpus, rng):
    """fit(parallelism='tp') pads the vocab to shard evenly but must hand
    back TRUE-vocab params and decoder (VERDICT-style consistency: bundles
    and pipeline state never leak sharding padding)."""
    pipe = make_pipe(toy_corpus)
    orig_vocab = pipe.decoder.vocab_size
    assert orig_vocab % 8 != 0
    ids = [f"i{k}" for k in range(8)]
    desc = {i: [toy_corpus[k % len(toy_corpus)]] for k, i in enumerate(ids)}
    features = {i: rng.normal(size=(128,)).astype(np.float32) for i in ids}
    pipe.fit(desc, features, epochs=2, batch_size=8, parallelism="tp",
             log=None)
    assert pipe.decoder.vocab_size == orig_vocab
    assert (
        pipe.params["decoder"]["out"]["kernel"].shape[-1] == orig_vocab
    )
    assert (
        pipe.params["decoder"]["embedding"]["table"].shape[0]
        == orig_vocab
    )
    # And the unpadded model still decodes.
    caps = pipe.generate(
        rng.normal(size=(2, 128)).astype(np.float32), method="greedy"
    )
    assert len(caps) == 2
