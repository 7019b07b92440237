"""Speculative greedy decoding (decode/speculative.py) and the chunked
verify forward (TransformerDecoder.step_chunk).

The load-bearing contracts:

- step_chunk is numerically the teacher-forced forward / the sequential
  incremental steps (same causal visibility, chunk K/V written before
  attention);
- the target KV cache SELF-HEALS after a rejected suffix: rewinding pos
  and re-chunking reproduces a clean run exactly (the invariant the
  engine's no-rollback design rests on);
- speculative_greedy_decode is TOKEN-IDENTICAL to greedy_decode on the
  target at every acceptance rate — a random draft (~0%), the target
  itself (100%), and a different decoder family (merge LSTM) as draft;
- stats account for the work honestly (self-draft accepts everything and
  runs ~emitted/(gamma+1) rounds).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpucap.config import (
    Config,
    DecodeConfig,
    DecoderConfig,
    EncoderConfig,
    TrainConfig,
)
from tpucap.decode import greedy_decode, speculative_greedy_decode
from tpucap.models.decoders import MergeDecoder, TransformerDecoder
from tpucap.pipeline import CaptioningPipeline

VOCAB = 29
FEAT = 11
START, END = 1, 2
B = 5
MAX_LEN = 12


def make_target(**kw):
    cfg = dict(
        vocab_size=VOCAB,
        feature_dim=FEAT,
        hidden_dim=32,
        num_layers=2,
        num_heads=4,
        mlp_dim=48,
        max_positions=MAX_LEN + 6,
        dropout_rate=0.0,
    )
    cfg.update(kw)
    dec = TransformerDecoder(**cfg)
    return dec, dec.init(jax.random.key(0))


def feats_for(shape_key=7, spatial=False):
    shape = (B, 9, FEAT) if spatial else (B, FEAT)
    return jax.random.normal(jax.random.key(shape_key), shape)


@pytest.mark.parametrize("spatial", [False, True])
def test_step_chunk_matches_forward_train(spatial):
    dec, params = make_target()
    feats = feats_for(spatial=spatial)
    toks = jax.random.randint(jax.random.key(1), (B, 7), 2, VOCAB)
    chunk_logits, st = dec.step_chunk(
        params, dec.init_state(params, feats), toks
    )
    full = dec.forward_train(params, feats, toks)
    np.testing.assert_allclose(
        np.asarray(chunk_logits), np.asarray(full), atol=2e-5
    )
    assert (np.asarray(st["pos"]) == 7).all()


def test_step_chunk_matches_sequential_steps():
    dec, params = make_target()
    feats = feats_for()
    toks = jax.random.randint(jax.random.key(2), (B, 6), 2, VOCAB)
    chunk_logits, st_chunk = dec.step_chunk(
        params, dec.init_state(params, feats), toks
    )
    st = dec.init_state(params, feats)
    cols = []
    for t in range(6):
        lg, st = dec.step(params, st, toks[:, t])
        cols.append(lg)
    np.testing.assert_allclose(
        np.asarray(chunk_logits),
        np.asarray(jnp.stack(cols, axis=1)),
        atol=2e-5,
    )
    np.testing.assert_array_equal(
        np.asarray(st_chunk["pos"]), np.asarray(st["pos"])
    )
    for leaf in ("cache_k", "cache_v"):
        np.testing.assert_allclose(
            np.asarray(st_chunk[leaf]), np.asarray(st[leaf]), atol=2e-5
        )


def test_kv_self_healing_after_rewind():
    """Reject a chunk suffix (rewind pos), re-chunk over the stale region:
    logits must equal a clean run that never saw the rejected tokens —
    the invariant that lets the engine skip cache rollback entirely."""
    dec, params = make_target()
    feats = feats_for()
    real = jax.random.randint(jax.random.key(3), (B, 4), 2, VOCAB)
    garbage = jax.random.randint(jax.random.key(4), (B, 2), 2, VOCAB)

    # Dirty path: consume [real0, g0, g1], accept only real0 (pos -> 1),
    # then verify the next chunk [real1, real2, real3].
    st = dec.init_state(params, feats)
    first = jnp.concatenate([real[:, :1], garbage], axis=1)
    _, st = dec.step_chunk(params, st, first)
    st = dict(st, pos=jnp.ones((B,), jnp.int32))
    dirty_logits, _ = dec.step_chunk(params, st, real[:, 1:])

    # Clean path: the accepted history only.
    st2 = dec.init_state(params, feats)
    _, st2 = dec.step(params, st2, real[:, 0])
    clean_logits, _ = dec.step_chunk(params, st2, real[:, 1:])

    np.testing.assert_allclose(
        np.asarray(dirty_logits), np.asarray(clean_logits), atol=2e-5
    )


def _draft(kind, target, target_params):
    if kind == "self":
        return target, target_params
    if kind == "transformer":
        dec = TransformerDecoder(
            vocab_size=VOCAB,
            feature_dim=FEAT,
            hidden_dim=16,
            num_layers=1,
            num_heads=2,
            mlp_dim=32,
            max_positions=MAX_LEN + 6,
            dropout_rate=0.0,
        )
        return dec, dec.init(jax.random.key(11))
    dec = MergeDecoder(
        vocab_size=VOCAB,
        feature_dim=FEAT,
        embed_dim=16,
        hidden_dim=16,
        dropout_rate=0.0,
    )
    return dec, dec.init(jax.random.key(12))


@pytest.mark.parametrize("kind", ["transformer", "self", "lstm"])
@pytest.mark.parametrize("gamma", [1, 3, 4])
def test_speculative_matches_greedy(kind, gamma):
    target, t_params = make_target()
    d_dec, d_params = _draft(kind, target, t_params)
    feats = feats_for()

    g = greedy_decode(
        target.step,
        t_params,
        target.init_state(t_params, feats),
        start_id=START,
        end_id=END,
        max_len=MAX_LEN,
    )
    res, stats = speculative_greedy_decode(
        target.step_chunk,
        t_params,
        target.init_state(t_params, feats),
        d_dec.step,
        d_params,
        d_dec.init_state(d_params, feats),
        start_id=START,
        end_id=END,
        max_len=MAX_LEN,
        gamma=gamma,
    )
    np.testing.assert_array_equal(np.asarray(res.tokens), np.asarray(g.tokens))
    np.testing.assert_array_equal(
        np.asarray(res.lengths), np.asarray(g.lengths)
    )
    np.testing.assert_allclose(
        np.asarray(res.scores), np.asarray(g.scores), atol=1e-4
    )
    assert int(stats.emitted) == int(np.asarray(g.lengths).sum())
    if kind == "self":
        # A perfect draft accepts every proposal and needs only
        # ~emitted/(gamma+1) rounds vs greedy's per-token steps.
        assert int(stats.accepted) == int(stats.drafted)
        assert int(stats.rounds) <= -(-MAX_LEN // (gamma + 1))


def test_min_len_parity():
    target, t_params = make_target()
    d_dec, d_params = _draft("lstm", target, t_params)
    feats = feats_for()
    min_len = 6
    g = greedy_decode(
        target.step,
        t_params,
        target.init_state(t_params, feats),
        start_id=START,
        end_id=END,
        max_len=MAX_LEN,
        min_len=min_len,
    )
    res, _ = speculative_greedy_decode(
        target.step_chunk,
        t_params,
        target.init_state(t_params, feats),
        d_dec.step,
        d_params,
        d_dec.init_state(d_params, feats),
        start_id=START,
        end_id=END,
        max_len=MAX_LEN,
        min_len=min_len,
        gamma=3,
    )
    np.testing.assert_array_equal(np.asarray(res.tokens), np.asarray(g.tokens))
    assert (np.asarray(res.lengths) >= min_len).all()


def test_validation_errors():
    target, t_params = make_target()
    d_dec, d_params = _draft("lstm", target, t_params)
    feats = feats_for()
    with pytest.raises(ValueError, match="gamma"):
        speculative_greedy_decode(
            target.step_chunk,
            t_params,
            target.init_state(t_params, feats),
            d_dec.step,
            d_params,
            d_dec.init_state(d_params, feats),
            start_id=START,
            end_id=END,
            max_len=MAX_LEN,
            gamma=0,
        )
    with pytest.raises(ValueError, match="pos"):
        # An LSTM target state has no 'pos' — no KV cache to verify with.
        speculative_greedy_decode(
            target.step_chunk,
            t_params,
            d_dec.init_state(d_params, feats),
            d_dec.step,
            d_params,
            d_dec.init_state(d_params, feats),
            start_id=START,
            end_id=END,
            max_len=MAX_LEN,
        )


def _toy_pipeline(toy_corpus, decoder_cfg, seed=0, epochs=0):
    cfg = Config(
        encoder=EncoderConfig(name="tiny_cnn", feature_dim=64),
        decoder=decoder_cfg,
        decode=DecodeConfig(max_len=12),
        train=TrainConfig(
            batch_size=8, learning_rate=3e-3, epochs=1, seed=seed
        ),
    )
    pipe = CaptioningPipeline(cfg)
    desc = {f"im{i}": [c] for i, c in enumerate(toy_corpus)}
    pipe.fit_tokenizer(desc)
    pipe.build()
    rng = np.random.default_rng(3)
    feats = {k: rng.normal(size=(64,)).astype(np.float32) for k in desc}
    if epochs:
        pipe.fit(desc, feats, epochs=epochs, log=None)
    arr = np.stack([feats[k] for k in desc])
    return pipe, desc, feats, arr


def test_pipeline_generate_speculative(toy_corpus):
    target_cfg = DecoderConfig(
        name="transformer",
        hidden_dim=32,
        num_layers=2,
        num_heads=4,
        mlp_dim=64,
        max_positions=18,
        dropout_rate=0.0,
    )
    pipe, desc, feats, arr = _toy_pipeline(
        toy_corpus, target_cfg, epochs=25
    )
    draft_cfg = DecoderConfig(
        name="lstm1", hidden_dim=16, embed_dim=16, dropout_rate=0.0
    )
    draft = CaptioningPipeline(
        Config(
            encoder=EncoderConfig(name="tiny_cnn", feature_dim=64),
            decoder=draft_cfg,
            decode=DecodeConfig(max_len=12),
            train=TrainConfig(batch_size=8, learning_rate=3e-3, epochs=1),
        )
    )
    draft.fit_tokenizer(desc)
    draft.build()
    draft.fit(desc, feats, epochs=10, log=None)

    caps, stats = pipe.generate_speculative(arr, draft=draft, gamma=3)
    assert caps == pipe.generate(arr, method="greedy")
    assert stats["emitted"] > 0 and stats["rounds"] >= 1
    assert 0.0 <= stats["acceptance_rate"] <= 1.0

    # (decoder, params) draft form — the target drafting for itself.
    caps2, stats2 = pipe.generate_speculative(
        arr,
        draft=(pipe.decoder, pipe._inference_params()["decoder"]),
        gamma=3,
    )
    assert caps2 == caps
    assert stats2["acceptance_rate"] == 1.0

    # Tokenizer mismatch is rejected.
    other = CaptioningPipeline(
        Config(
            encoder=EncoderConfig(name="tiny_cnn", feature_dim=64),
            decoder=draft_cfg,
            decode=DecodeConfig(max_len=12),
            train=TrainConfig(batch_size=8),
        )
    )
    other.fit_tokenizer({"x": ["startseq completely different words endseq"]})
    other.build()
    with pytest.raises(ValueError, match="tokenizer"):
        pipe.generate_speculative(arr, draft=other)

    # KV capacity is validated up front (max_len + gamma > max_positions).
    with pytest.raises(ValueError, match="max_positions"):
        pipe.generate_speculative(arr, draft=draft, gamma=7)


def test_pipeline_rejects_non_kv_target(toy_corpus):
    pipe, _, _, arr = _toy_pipeline(
        toy_corpus,
        DecoderConfig(name="lstm1", hidden_dim=16, embed_dim=16),
    )
    with pytest.raises(ValueError, match="step_chunk"):
        pipe.generate_speculative(
            arr, draft=(pipe.decoder, pipe.params["decoder"])
        )


def test_cli_speculative_requires_draft_bundle(tmp_path):
    from tpucap.cli.main import main

    with pytest.raises(SystemExit, match="draft-bundle"):
        main(
            [
                "caption",
                "--encoder",
                "tiny_cnn",
                "--decoder",
                "transformer",
                "--method",
                "speculative",
                "--image",
                "nonexistent.jpg",
                "--checkpoint-dir",
                str(tmp_path),
            ]
        )


@pytest.mark.slow
def test_cli_speculative_end_to_end(tmp_path, capsys):
    """CLI caption --method speculative: train a transformer target via
    the CLI, save a draft bundle, and check the output is identical to
    --method greedy on the same checkpoint."""
    import os

    from tpucap.cli.main import main
    from tpucap.data import generate_fixture_dataset

    img_dir, token_file, train_file, _ = generate_fixture_dataset(
        tmp_path, n_images=6, image_size=32, seed=3
    )
    feats = str(tmp_path / "features.npz")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(ckpt, exist_ok=True)
    common = [
        "--encoder", "tiny_cnn", "--decoder", "transformer",
        "--hidden-dim", "32", "--num-heads", "2", "--mlp-dim", "64",
        "--max-len", "12",
    ]
    main(["extract", "--encoder", "tiny_cnn", "--max-len", "12",
          "--images", str(img_dir), "--out", feats, "--batch-size", "4"])
    capsys.readouterr()
    main(["train", *common, "--tokens", token_file, "--split", train_file,
          "--features", feats, "--checkpoint-dir", ckpt,
          "--epochs", "2", "--batch-size", "4"])
    capsys.readouterr()

    # Draft bundle: a tiny merge LSTM sharing the tokenizer + encoder.
    from tpucap.text import Tokenizer

    tok = Tokenizer.load(os.path.join(ckpt, "tokenizer.json"))
    draft = CaptioningPipeline(
        Config(
            encoder=EncoderConfig(name="tiny_cnn", feature_dim=128),
            decoder=DecoderConfig(
                name="lstm1", hidden_dim=16, embed_dim=16
            ),
            decode=DecodeConfig(max_len=12),
            train=TrainConfig(batch_size=4),
        ),
        tokenizer=tok,
    )
    draft.build()
    bundle = str(tmp_path / "draft_bundle")
    draft.save(bundle)

    img0 = os.path.join(str(img_dir), sorted(os.listdir(str(img_dir)))[0])
    main(["caption", *common, "--image", img0, "--checkpoint-dir", ckpt,
          "--method", "greedy"])
    greedy_out = capsys.readouterr().out
    main(["caption", *common, "--image", img0, "--checkpoint-dir", ckpt,
          "--method", "speculative", "--draft-bundle", bundle,
          "--gamma", "3"])
    spec = capsys.readouterr()
    assert spec.out == greedy_out
    assert "acceptance" in spec.err
