"""Caption scoring (pipeline.score_captions): teacher-forced log-prob
of GIVEN captions — the reranking / data-filtering surface.

Contracts pinned here:
- hand oracle: logp equals a numpy log-softmax walk over forward_train;
- engine consistency: scoring generate()'s own captions reproduces the
  greedy engine's reported scores (the shared full-softmax convention);
- sentinels are stripped (generate output scores directly);
- OOV words raise on the word tokenizer (a silently-dropped word would
  score a different caption than the one asked about).
"""

import numpy as np
import pytest

from tpucap.config import Config, DecodeConfig, DecoderConfig, EncoderConfig
from tpucap.pipeline import CaptioningPipeline
from tpucap.text import Tokenizer


def _pipe(toy_corpus, decoder_kw=None):
    kw = dict(embed_dim=8, hidden_dim=16, dropout_rate=0.0)
    kw.update(decoder_kw or {})
    cfg = Config(
        encoder=EncoderConfig(name="tiny_cnn", feature_dim=32),
        decoder=DecoderConfig(**kw),
        decode=DecodeConfig(max_len=10),
    )
    p = CaptioningPipeline(cfg)
    tok = Tokenizer()
    tok.fit_on_texts(toy_corpus)
    p.tokenizer = tok
    p.build()
    return p


@pytest.fixture(scope="module")
def score_pipe(toy_corpus):
    return _pipe(toy_corpus)


def test_score_matches_numpy_oracle(score_pipe, rng, toy_corpus):
    import jax.nn

    p = score_pipe
    feats = rng.normal(size=(2, 32)).astype(np.float32)
    caps = [
        "a black dog runs",
        "two children play soccer in the park",
    ]
    got = p.score_captions(feats, caps)

    start_id = p.tokenizer.word_index["startseq"]
    end_id = p.tokenizer.word_index["endseq"]
    for i, cap in enumerate(caps):
        seq = p.tokenizer.texts_to_sequences([cap])[0]
        full = [start_id, *seq, end_id]
        inputs = np.asarray([full[:-1]], np.int32)
        logits = np.asarray(
            p.decoder.forward_train(
                p.params["decoder"],
                feats[i : i + 1],
                inputs,
                deterministic=True,
            ),
            np.float32,
        )
        logp = np.asarray(jax.nn.log_softmax(logits, axis=-1))
        want = sum(
            logp[0, t, tok] for t, tok in enumerate(full[1:])
        )
        assert got[i]["tokens"] == len(full) - 1
        np.testing.assert_allclose(got[i]["logp"], want, atol=1e-4)
        np.testing.assert_allclose(
            got[i]["perplexity"],
            np.exp(-want / (len(full) - 1)),
            rtol=1e-4,
        )


def _bias_endseq(p, bump=4.0):
    """Nudge the vocab head toward endseq so the untrained model's
    greedy decode terminates before max_len (the engine only scores
    tokens it GENERATED — a row that never emits endseq has no endseq
    term, while score_captions always closes the caption)."""
    import jax.numpy as jnp

    end_id = p.tokenizer.word_index["endseq"]
    out = p.params["decoder"]["out"]
    out["bias"] = jnp.asarray(out["bias"]).at[end_id].add(bump)


def test_score_of_generated_equals_engine_score(toy_corpus, rng):
    """The greedy engine reports sum-of-logp scores; teacher-forced
    scoring of its own output must land on the same numbers."""
    p = _pipe(toy_corpus)
    _bias_endseq(p)
    feats = rng.normal(size=(3, 32)).astype(np.float32)
    fn = p._decode_fn("greedy", 1)
    res = fn(p._inference_params()["decoder"], np.asarray(feats))
    caps = p.generate(feats, method="greedy")
    # Guard: every row must have emitted endseq, or the engine score
    # has no closing term to compare against.
    assert all(len(c.split()) < p.config.decode.max_len for c in caps)
    scores = p.score_captions(feats, caps)
    np.testing.assert_allclose(
        [s["logp"] for s in scores],
        np.asarray(res.scores, np.float32),
        atol=1e-3,
    )


def test_score_strips_sentinels(score_pipe, rng):
    p = score_pipe
    feats = rng.normal(size=(1, 32)).astype(np.float32)
    a = p.score_captions(feats, ["a black dog runs"])
    b = p.score_captions(feats, ["startseq a black dog runs endseq"])
    assert a == b


def test_score_oov_raises(score_pipe, rng):
    feats = rng.normal(size=(1, 32)).astype(np.float32)
    with pytest.raises(ValueError, match="outside the tokenizer"):
        score_pipe.score_captions(feats, ["zzzunknownword dog"])


def test_score_count_mismatch_raises(score_pipe, rng):
    feats = rng.normal(size=(2, 32)).astype(np.float32)
    with pytest.raises(ValueError, match="captions for"):
        score_pipe.score_captions(feats, ["a black dog"])


def test_score_single_string_broadcasts(score_pipe, rng):
    feats = rng.normal(size=(2, 32)).astype(np.float32)
    one = score_pipe.score_captions(feats, "a black dog runs")
    two = score_pipe.score_captions(
        feats, ["a black dog runs", "a black dog runs"]
    )
    assert one == two


def test_score_bucket_reuse(score_pipe, rng):
    """Different caption lengths in the same pow-2 bucket share one
    compiled program (the decode-cache key is the padded T)."""
    p = score_pipe
    feats = rng.normal(size=(1, 32)).astype(np.float32)
    p.score_captions(feats, ["a black dog"])
    n_before = len(p._decode_cache)
    p.score_captions(feats, ["a dog"])  # shorter, same bucket
    assert len(p._decode_cache) == n_before


@pytest.mark.parametrize(
    "decoder_kw",
    [
        {"name": "gru1"},
        {
            "name": "transformer",
            "embed_dim": 16,
            "num_layers": 1,
            "num_heads": 2,
            "mlp_dim": 32,
            "max_positions": 24,
        },
    ],
    ids=["gru1", "transformer"],
)
def test_score_engine_consistency_other_families(
    toy_corpus, rng, decoder_kw
):
    p = _pipe(toy_corpus, decoder_kw)
    _bias_endseq(p)
    feats = rng.normal(size=(2, 32)).astype(np.float32)
    fn = p._decode_fn("greedy", 1)
    res = fn(p._inference_params()["decoder"], np.asarray(feats))
    caps = p.generate(feats, method="greedy")
    assert all(len(c.split()) < p.config.decode.max_len for c in caps)
    scores = p.score_captions(feats, caps)
    np.testing.assert_allclose(
        [s["logp"] for s in scores],
        np.asarray(res.scores, np.float32),
        atol=1e-3,
    )


def test_cli_score(tmp_path, capsys):
    """extract -> train -> score e2e through the CLI."""
    import os

    from tpucap.cli.main import main
    from tpucap.data import generate_fixture_dataset

    img_dir, token_file, train_file, _ = generate_fixture_dataset(
        tmp_path, n_images=4, image_size=32, seed=5
    )
    feats = str(tmp_path / "features.npz")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(ckpt, exist_ok=True)
    common = ["--encoder", "tiny_cnn", "--max-len", "12"]
    main(["extract", *common, "--images", str(img_dir), "--out", feats,
          "--batch-size", "4"])
    main(["train", *common, "--tokens", token_file, "--split", train_file,
          "--features", feats, "--checkpoint-dir", ckpt,
          "--epochs", "1", "--batch-size", "4"])
    capsys.readouterr()

    img0 = os.path.join(str(img_dir), sorted(os.listdir(img_dir))[0])
    # A caption made of fixture-vocabulary words.
    with open(token_file) as f:
        first = f.readline().split("\t")[1].split()
    # Mirror the training-side cleaning (1-char words and numerals are
    # stripped before tokenizer fit) so every word is in-vocabulary.
    cap = " ".join(
        [
            w
            for w in first
            if w not in ("startseq", "endseq")
            and len(w) > 1
            and w.isalpha()
        ][:3]
    )
    main(["score", *common, "--image", img0, "--caption", cap,
          "--checkpoint-dir", ckpt])
    out = capsys.readouterr().out
    assert "logp=" in out and "ppl=" in out and img0 in out

    with pytest.raises(SystemExit, match="exactly one"):
        main(["score", *common, "--image", img0,
              "--checkpoint-dir", ckpt])
