"""Pretrained word embeddings (tpucap.text.embeddings): GloVe-format
parsing, embedding-matrix assembly against the tokenizer index, the
pipeline's set_pretrained_embeddings surface, and the frozen-table
training contract (updates masked, not just gradients)."""

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
from tpucap.text import Tokenizer, build_embedding_matrix, load_word_vectors

EMBED = 8


def write_vectors(path, rows, header=None):
    with open(path, "w", encoding="utf-8") as fh:
        if header is not None:
            fh.write(header + "\n")
        for word, vec in rows:
            fh.write(word + " " + " ".join(f"{v:.6f}" for v in vec) + "\n")


def make_pipe(toy_corpus, train=None, dropout=0.0):
    cfg = Config(
        encoder=EncoderConfig(name="tiny_cnn", feature_dim=128),
        decoder=DecoderConfig(
            embed_dim=EMBED, hidden_dim=16, dropout_rate=dropout
        ),
        decode=DecodeConfig(max_len=10),
        train=train
        or TrainConfig(batch_size=8, learning_rate=1e-2, seed=0),
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


# -- parser -----------------------------------------------------------------


def test_load_word_vectors_roundtrip(tmp_path, rng):
    rows = [(w, rng.normal(size=EMBED)) for w in ["dog", "grass", "runs"]]
    path = tmp_path / "vec.txt"
    write_vectors(path, rows)
    vecs = load_word_vectors(path)
    assert set(vecs) == {"dog", "grass", "runs"}
    for w, v in rows:
        np.testing.assert_allclose(vecs[w], v.astype(np.float32), atol=1e-6)
        assert vecs[w].dtype == np.float32


def test_load_word_vectors_skips_word2vec_header(tmp_path, rng):
    rows = [(w, rng.normal(size=EMBED)) for w in ["a", "b"]]
    path = tmp_path / "vec.txt"
    write_vectors(path, rows, header=f"2 {EMBED}")
    assert set(load_word_vectors(path)) == {"a", "b"}


def test_load_word_vectors_dim_mismatch_raises(tmp_path):
    path = tmp_path / "vec.txt"
    path.write_text("a 1.0 2.0\nb 1.0 2.0 3.0\n")
    with pytest.raises(ValueError, match="dims"):
        load_word_vectors(path)


def test_load_word_vectors_first_duplicate_wins(tmp_path):
    path = tmp_path / "vec.txt"
    path.write_text("a 1.0 2.0\na 9.0 9.0\n")
    np.testing.assert_allclose(load_word_vectors(path)["a"], [1.0, 2.0])


# -- matrix assembly ----------------------------------------------------------


def test_build_embedding_matrix_rows(toy_corpus, rng):
    tok = Tokenizer()
    tok.fit_on_texts(toy_corpus)
    covered = ["dog", "grass", "man"]
    vecs = {w: rng.normal(size=EMBED).astype(np.float32) for w in covered}
    vecs["notinvocab"] = rng.normal(size=EMBED).astype(np.float32)
    matrix, hits = build_embedding_matrix(tok, vecs, embed_dim=EMBED)
    assert matrix.shape == (tok.vocab_size, EMBED)
    assert hits == len(covered)
    np.testing.assert_array_equal(matrix[0], 0)  # padding row
    for w in covered:
        np.testing.assert_allclose(matrix[tok.word_index[w]], vecs[w])
    # A vocab word without a vector stays zero (the reference idiom).
    np.testing.assert_array_equal(matrix[tok.word_index["startseq"]], 0)


def test_build_embedding_matrix_num_words_cutoff(toy_corpus, rng):
    tok = Tokenizer(num_words=4)
    tok.fit_on_texts(toy_corpus)
    # Words with index >= 4 are skipped even if covered.
    rare = [w for w, i in tok.word_index.items() if i >= 4][0]
    vecs = {rare: rng.normal(size=EMBED).astype(np.float32)}
    matrix, hits = build_embedding_matrix(tok, vecs, embed_dim=EMBED)
    assert matrix.shape == (4, EMBED)
    assert hits == 0
    np.testing.assert_array_equal(matrix, 0)


def test_build_embedding_matrix_dim_mismatch_raises(toy_corpus, rng):
    tok = Tokenizer()
    tok.fit_on_texts(toy_corpus)
    vecs = {"dog": rng.normal(size=EMBED + 1).astype(np.float32)}
    with pytest.raises(ValueError, match="dim"):
        build_embedding_matrix(tok, vecs, embed_dim=EMBED)


# -- pipeline surface ---------------------------------------------------------


def test_set_pretrained_embeddings_from_dict(toy_corpus, rng):
    pipe = make_pipe(toy_corpus)
    vecs = {
        w: rng.normal(size=EMBED).astype(np.float32)
        for w in ["dog", "grass", "man", "startseq", "endseq"]
    }
    hits = pipe.set_pretrained_embeddings(vecs, log=None)
    assert hits == len(vecs)
    table = np.asarray(pipe.params["decoder"]["embedding"]["table"])
    for w, v in vecs.items():
        np.testing.assert_allclose(
            table[pipe.tokenizer.word_index[w]], v, atol=1e-6
        )
    np.testing.assert_array_equal(table[0], 0)
    # The pipeline still decodes (table is just different numbers).
    feats = rng.normal(size=(2, 128)).astype(np.float32)
    caps = pipe.generate(feats, method="greedy")
    assert len(caps) == 2


def test_set_pretrained_embeddings_from_file(toy_corpus, tmp_path, rng):
    pipe = make_pipe(toy_corpus)
    rows = [("dog", rng.normal(size=EMBED)), ("man", rng.normal(size=EMBED))]
    path = tmp_path / "glove.txt"
    write_vectors(path, rows)
    assert pipe.set_pretrained_embeddings(str(path), log=None) == 2


def test_set_pretrained_embeddings_shape_guard(toy_corpus, rng):
    pipe = make_pipe(toy_corpus)
    with pytest.raises(ValueError, match="shape"):
        pipe.set_pretrained_embeddings(
            np.zeros((3, EMBED), np.float32), log=None
        )


# -- frozen-table training -----------------------------------------------------


def fit_once(toy_corpus, rng, *, freeze, train=None, parallelism=None):
    pipe = make_pipe(toy_corpus, train=train)
    vecs = {
        w: np.asarray(rng.normal(size=EMBED), np.float32)
        for w in list(pipe.tokenizer.word_index)[:6]
    }
    pipe.set_pretrained_embeddings(vecs, freeze=freeze, log=None)
    before = np.asarray(pipe.params["decoder"]["embedding"]["table"]).copy()
    out_before = np.asarray(pipe.params["decoder"]["out"]["kernel"]).copy()
    desc, feats = data(toy_corpus, rng)
    pipe.fit(desc, feats, epochs=2, log=None, parallelism=parallelism)
    after = np.asarray(pipe.params["decoder"]["embedding"]["table"])
    out_after = np.asarray(pipe.params["decoder"]["out"]["kernel"])
    return before, after, out_before, out_after


def test_frozen_embeddings_do_not_move(toy_corpus, rng):
    before, after, out_b, out_a = fit_once(toy_corpus, rng, freeze=True)
    np.testing.assert_array_equal(before, after)
    assert np.abs(out_a - out_b).max() > 0  # the rest trained


def test_unfrozen_embeddings_do_move(toy_corpus, rng):
    before, after, _, _ = fit_once(toy_corpus, rng, freeze=False)
    assert np.abs(after - before).max() > 0


def test_frozen_embeddings_survive_adamw_weight_decay(toy_corpus, rng):
    """Decoupled weight decay moves zero-gradient params — masking the
    UPDATES (not the gradients) is what makes frozen mean frozen."""
    train = TrainConfig(
        batch_size=8,
        learning_rate=1e-2,
        optimizer="adamw",
        weight_decay=0.1,
        seed=0,
    )
    before, after, _, _ = fit_once(toy_corpus, rng, freeze=True, train=train)
    np.testing.assert_array_equal(before, after)


def test_frozen_embeddings_under_dp(toy_corpus, rng):
    before, after, out_b, out_a = fit_once(
        toy_corpus, rng, freeze=True, parallelism="dp"
    )
    np.testing.assert_array_equal(before, after)
    assert np.abs(out_a - out_b).max() > 0


def test_freeze_rejected_on_transformed_layouts(toy_corpus, rng):
    pipe = make_pipe(toy_corpus)
    vecs = {"dog": np.zeros(EMBED, np.float32)}
    pipe.set_pretrained_embeddings(vecs, freeze=True, log=None)
    desc, feats = data(toy_corpus, rng)
    with pytest.raises(NotImplementedError, match="freeze_embeddings"):
        pipe.fit(desc, feats, epochs=1, log=None, parallelism="tp")


def test_frozen_embeddings_finetune(toy_corpus, rng):
    """fit_finetune masks decoder/embedding in the joint two-tree
    layout."""
    pipe = make_pipe(toy_corpus)
    vecs = {
        w: np.asarray(rng.normal(size=EMBED), np.float32)
        for w in list(pipe.tokenizer.word_index)[:4]
    }
    pipe.set_pretrained_embeddings(vecs, freeze=True, log=None)
    before = np.asarray(pipe.params["decoder"]["embedding"]["table"]).copy()
    desc = {f"i{k}": [toy_corpus[k]] for k in range(4)}
    size = pipe.encoder.input_size
    images = {
        i: rng.normal(size=(size, size, 3)).astype(np.float32) for i in desc
    }
    pipe.fit_finetune(desc, images, epochs=1, batch_size=4, log=None)
    after = np.asarray(pipe.params["decoder"]["embedding"]["table"])
    np.testing.assert_array_equal(before, after)


def test_cli_freeze_flag_requires_embeddings():
    from tpucap.cli.main import main

    with pytest.raises(SystemExit, match="--embeddings"):
        main(
            ["train", "--encoder", "tiny_cnn", "--tokens", "x",
             "--features", "y", "--freeze-embeddings"]
        )
