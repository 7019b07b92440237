"""Config-4 shape e2e: spatial features -> soft-attention decoder, plus
val-loss-keyed best checkpointing through the pipeline."""

import numpy as np
import pytest

from tpucap.checkpoint import CheckpointManager
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


def test_attention_pipeline_end_to_end(tmp_path):
    img_dir, token_file, train_file, test_file = generate_fixture_dataset(
        tmp_path / "ds", n_images=8, image_size=32, seed=11
    )
    desc = load_descriptions(token_file)
    train_ids = load_split(train_file)
    test_ids = load_split(test_file)

    cfg = Config(
        encoder=EncoderConfig(
            name="tiny_cnn", features="spatial", feature_dim=128
        ),
        decoder=DecoderConfig(
            name="attention", embed_dim=16, hidden_dim=32, dropout_rate=0.0
        ),
        decode=DecodeConfig(method="beam", beam_width=3, max_len=12),
        train=TrainConfig(batch_size=8, learning_rate=5e-3, seed=0),
    )
    pipe = CaptioningPipeline(cfg)
    prepared = prepare_descriptions(desc, train_ids)
    val_prepared = prepare_descriptions(
        load_descriptions(token_file), test_ids
    )
    pipe.fit_tokenizer(prepared)
    pipe.build()

    paths = [f"{img_dir}/{i}.jpg" for i in train_ids]
    feats_arr = pipe.extract_features(paths, batch_size=4)
    assert feats_arr.shape == (len(train_ids), 16, 128)  # 4x4 grid flattened
    feats = dict(zip(train_ids, feats_arr))

    val_paths = [f"{img_dir}/{i}.jpg" for i in test_ids]
    val_feats = dict(zip(test_ids, pipe.extract_features(val_paths)))

    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    history = pipe.fit(
        prepared,
        feats,
        epochs=8,
        val_data=(val_prepared, val_feats),
        checkpoint_manager=mgr,
        log=None,
    )
    assert history[-1]["loss"] < history[0]["loss"]
    assert "val_loss" in history[-1]
    assert mgr.best_step() is not None
    mgr.close()

    caps = pipe.generate(feats_arr[:3], method="beam", beam_width=3)
    assert len(caps) == 3 and all(isinstance(c, str) for c in caps)

    scores = pipe.evaluate(prepared, feats, method="greedy")
    assert 0.0 <= scores["bleu1"] <= 1.0


def test_tp_parallelism_through_pipeline(tmp_path):
    """fit(parallelism='tp') trains with the vocab-parallel CE step."""
    import numpy as np

    img_dir, token_file, train_file, _ = generate_fixture_dataset(
        tmp_path / "ds2", n_images=6, image_size=32, seed=13
    )
    desc = load_descriptions(token_file)
    train_ids = load_split(train_file)

    cfg = Config(
        encoder=EncoderConfig(name="tiny_cnn", feature_dim=128),
        decoder=DecoderConfig(embed_dim=16, hidden_dim=32, dropout_rate=0.0),
        decode=DecodeConfig(max_len=12),
        train=TrainConfig(batch_size=4, learning_rate=5e-3, seed=0),
    )
    pipe = CaptioningPipeline(cfg)
    prepared = prepare_descriptions(desc, train_ids)
    pipe.fit_tokenizer(prepared)
    pipe.build()
    # fit(parallelism='tp') auto-pads the vocab to shard evenly.

    rng = np.random.default_rng(0)
    feats = {
        i: rng.normal(size=(128,)).astype(np.float32) for i in train_ids
    }
    history = pipe.fit(
        prepared, feats, epochs=6, parallelism="tp", log=None
    )
    assert history[-1]["loss"] < history[0]["loss"]


def test_attention_reg_exposed_through_fit(tmp_path):
    """TrainConfig.attention_reg reaches the loss (VERDICT r1 #4): the
    doubly-stochastic coverage metric is reported per epoch and FALLS as
    training pushes per-location coverage toward 1."""
    img_dir, token_file, train_file, _ = generate_fixture_dataset(
        tmp_path / "ds3", n_images=8, image_size=32, seed=17
    )
    desc = load_descriptions(token_file)
    train_ids = load_split(train_file)

    cfg = Config(
        encoder=EncoderConfig(
            name="tiny_cnn", features="spatial", feature_dim=128
        ),
        decoder=DecoderConfig(
            name="attention", embed_dim=16, hidden_dim=32, dropout_rate=0.0
        ),
        decode=DecodeConfig(method="greedy", max_len=12),
        train=TrainConfig(
            batch_size=8, learning_rate=5e-3, seed=0, attention_reg=0.5
        ),
    )
    pipe = CaptioningPipeline(cfg)
    prepared = prepare_descriptions(desc, train_ids)
    pipe.fit_tokenizer(prepared)
    pipe.build()

    paths = [f"{img_dir}/{i}.jpg" for i in train_ids]
    feats = dict(zip(train_ids, pipe.extract_features(paths, batch_size=4)))

    history = pipe.fit(prepared, feats, epochs=8, log=None)
    assert "attention_reg" in history[0]
    assert history[-1]["attention_reg"] < history[0]["attention_reg"]
    assert history[-1]["loss"] < history[0]["loss"]

    # And through the DP step (make_dp_train_step carries the reg too).
    pipe2 = CaptioningPipeline(cfg)
    pipe2.fit_tokenizer(prepared)
    pipe2.build()
    h2 = pipe2.fit(prepared, feats, epochs=2, parallelism="dp", log=None)
    assert "attention_reg" in h2[0]


def _attention_pipe():
    import tpucap.text as text

    cfg = Config(
        encoder=EncoderConfig(
            name="tiny_cnn", features="spatial", feature_dim=128
        ),
        decoder=DecoderConfig(
            name="attention", embed_dim=16, hidden_dim=32, dropout_rate=0.0
        ),
        decode=DecodeConfig(max_len=10),
        precision="f32",
    )
    pipe = CaptioningPipeline(cfg)
    tok = text.Tokenizer()
    tok.fit_on_texts(
        ["startseq a dog runs endseq", "startseq a man rides a horse endseq"]
    )
    pipe.tokenizer = tok
    pipe.build()
    return pipe


def test_generate_with_attention_maps():
    """Show-Attend-Tell visualization surface: alphas are (B, T, L)
    per-token softmax maps over the spatial grid, exactly the weights
    the decode loop used (verified against a manual step-by-step
    oracle), and captions match generate()."""
    import jax.numpy as jnp

    pipe = _attention_pipe()
    rng = np.random.default_rng(3)
    L = pipe.encoder.spatial_positions
    feats = rng.normal(size=(3, L, 128)).astype(np.float32)

    caps, alphas, lengths = pipe.generate_with_attention(
        feats, method="greedy"
    )
    assert caps == pipe.generate(feats, method="greedy")
    B, T, L2 = alphas.shape
    assert (B, T, L2) == (3, pipe.config.decode.max_len, L)
    for b in range(B):
        for t in range(int(lengths[b])):
            np.testing.assert_allclose(alphas[b, t].sum(), 1.0, atol=1e-5)

    # Oracle: manual incremental decode collecting _step_full's alphas.
    params = pipe._inference_params()["decoder"]
    start_id, end_id = pipe._token_ids()
    dec = pipe.decoder
    state = dec.init_state(params, jnp.asarray(feats))
    last = jnp.full((3,), start_id, jnp.int32)
    done = np.zeros((3,), bool)
    from tpucap.models.layers import dense

    for t in range(int(lengths.max())):
        hidden, state, alpha = dec._step_full(params, state, last)
        logits = dense(params["out"], hidden)
        nxt = np.asarray(
            jnp.argmax(logits.at[:, 0].set(-jnp.inf), axis=-1)
        ).astype(np.int32)
        for b in range(3):
            if t < int(lengths[b]):
                np.testing.assert_allclose(
                    alphas[b, t], np.asarray(alpha)[b], atol=1e-5
                )
        last = jnp.asarray(np.where(done, 0, nxt))
        done |= nxt == end_id


def test_generate_with_attention_beam_and_errors():
    pipe = _attention_pipe()
    rng = np.random.default_rng(4)
    L = pipe.encoder.spatial_positions
    feats = rng.normal(size=(2, L, 128)).astype(np.float32)
    caps, alphas, lengths = pipe.generate_with_attention(
        feats, method="beam", beam_width=2
    )
    assert caps == pipe.generate(feats, method="beam", beam_width=2)
    for b in range(2):
        for t in range(int(lengths[b])):
            np.testing.assert_allclose(alphas[b, t].sum(), 1.0, atol=1e-5)
    with pytest.raises(ValueError, match="greedy|beam"):
        pipe.generate_with_attention(feats, method="sample")


def test_generate_with_attention_rejects_non_attention():
    import tpucap.text as text

    cfg = Config(
        encoder=EncoderConfig(name="tiny_cnn", feature_dim=128),
        decoder=DecoderConfig(embed_dim=16, hidden_dim=32),
    )
    pipe = CaptioningPipeline(cfg)
    tok = text.Tokenizer()
    tok.fit_on_texts(["startseq a dog endseq"])
    pipe.tokenizer = tok
    pipe.build()
    rng = np.random.default_rng(0)
    with pytest.raises(ValueError, match="forward_hidden_with_alphas"):
        pipe.generate_with_attention(
            rng.normal(size=(1, 128)).astype(np.float32)
        )
