"""Differential tests: tpucap.text.Tokenizer vs tf_keras Tokenizer.

These pin the compat traps from SURVEY.md §2.1 #4: index-0 reserve, oov at
index 1, frequency-sorted vocab with stable ties, num_words applied at encode
time, and the default filter set.
"""

import pytest

from tpucap.text import Tokenizer, text_to_word_sequence

tf_keras_text = pytest.importorskip("tf_keras.src.preprocessing.text")

CORPORA = [
    ["the cat sat on the mat", "the dog ate the cat", "a cat! a CAT? yes."],
    ["startseq a black dog runs endseq", "startseq a dog runs fast endseq"],
    ["it's a don't-stop world", "punct: [a](b){c}|d~e`f", "tabs\tand\nnewlines"],
    ["x " * 50 + "y", "y " * 50 + "x", "z"],
    [""],
]


def make_pair(**kwargs):
    ours = Tokenizer(**kwargs)
    theirs = tf_keras_text.Tokenizer(**kwargs)
    return ours, theirs


@pytest.mark.parametrize("corpus", CORPORA)
@pytest.mark.parametrize(
    "kwargs",
    [
        {},
        {"num_words": 5},
        {"oov_token": "<unk>"},
        {"num_words": 4, "oov_token": "<unk>"},
        {"lower": False},
    ],
)
def test_tokenizer_matches_tf_keras(corpus, kwargs):
    ours, theirs = make_pair(**kwargs)
    ours.fit_on_texts(corpus)
    theirs.fit_on_texts(corpus)

    assert ours.word_index == theirs.word_index
    assert dict(ours.word_counts) == dict(theirs.word_counts)
    assert ours.texts_to_sequences(corpus) == theirs.texts_to_sequences(corpus)

    seqs = theirs.texts_to_sequences(corpus)
    assert ours.sequences_to_texts(seqs) == theirs.sequences_to_texts(seqs)


def test_index_zero_reserved(toy_corpus):
    tok = Tokenizer()
    tok.fit_on_texts(toy_corpus)
    assert 0 not in tok.index_word
    assert min(tok.word_index.values()) == 1


def test_oov_forced_to_index_one(toy_corpus):
    tok = Tokenizer(oov_token="<unk>")
    tok.fit_on_texts(toy_corpus)
    assert tok.word_index["<unk>"] == 1
    # Unknown words encode to 1.
    [seq] = tok.texts_to_sequences(["zzz unknownword"])
    assert seq == [1, 1]


def test_num_words_applied_at_encode_time(toy_corpus):
    tok = Tokenizer(num_words=3)
    tok.fit_on_texts(toy_corpus)
    # Full vocab retained in word_index...
    assert len(tok.word_index) > 3
    # ...but encoded indices are < num_words.
    for seq in tok.texts_to_sequences(toy_corpus):
        assert all(i < 3 for i in seq)


def test_text_to_word_sequence_matches():
    for text in ["Hello, World! it's ME.", "a-b c_d e'f", "", "  spaced  out  "]:
        assert text_to_word_sequence(text) == tf_keras_text.text_to_word_sequence(
            text
        )


def test_json_round_trip(toy_corpus):
    tok = Tokenizer(num_words=10, oov_token="<unk>")
    tok.fit_on_texts(toy_corpus)
    tok2 = Tokenizer.from_json(tok.to_json())
    assert tok2.word_index == tok.word_index
    assert tok2.texts_to_sequences(toy_corpus) == tok.texts_to_sequences(
        toy_corpus
    )
    assert tok2.num_words == tok.num_words
    assert tok2.vocab_size == tok.vocab_size


def test_word_for_id(toy_corpus):
    tok = Tokenizer()
    tok.fit_on_texts(toy_corpus)
    for w, i in tok.word_index.items():
        assert tok.word_for_id(i) == w
    assert tok.word_for_id(0) is None
    assert tok.word_for_id(10**9) is None


def test_tokenizer_fuzz_matches_tf_keras():
    """Seeded randomized corpora (mixed casing, punctuation from the filter
    set, unicode, frequency ties, long/empty docs) — the differential net
    behind the hand-picked CORPORA cases. 20 corpora x 3 tokenizer configs,
    fit + encode + decode round-trip all bit-identical to tf_keras."""
    import random

    alphabet = [
        "cat", "Cat", "CAT", "dog", "a", "the", "don't", "it's",
        "x", "y", "z", "naïve", "café", "word-with-dash", "under_score",
        "tab\tsep", "semi;colon", "quote\"d", "brack[et]", "pipe|d",
        "tilde~d", "back`tick", "caret^d", "star*d", "plus+d",
    ]
    rng = random.Random(42)
    for trial in range(20):
        n_docs = rng.randint(1, 12)
        corpus = []
        for _ in range(n_docs):
            n_words = rng.randint(0, 30)
            corpus.append(" ".join(rng.choices(alphabet, k=n_words)))
        for kwargs in (
            {},
            {"num_words": rng.randint(2, 10)},
            {"oov_token": "<unk>", "num_words": rng.randint(2, 10)},
        ):
            ours, theirs = make_pair(**kwargs)
            ours.fit_on_texts(corpus)
            theirs.fit_on_texts(corpus)
            assert ours.word_index == theirs.word_index, (trial, kwargs)
            assert ours.texts_to_sequences(corpus) == (
                theirs.texts_to_sequences(corpus)
            ), (trial, kwargs, corpus)
            seqs = theirs.texts_to_sequences(corpus)
            assert ours.sequences_to_texts(seqs) == (
                theirs.sequences_to_texts(seqs)
            ), (trial, kwargs)


class TestMatrixAPI:
    """texts_to_matrix / sequences_to_matrix / fit_on_sequences —
    differential vs tf_keras (VERDICT r2 missing #5: the last tokenizer
    surface gap; tfidf exercises index_docs)."""

    @pytest.mark.parametrize("mode", ["binary", "count", "freq", "tfidf"])
    @pytest.mark.parametrize(
        "kwargs", [{}, {"num_words": 5}, {"oov_token": "<unk>"}]
    )
    def test_texts_to_matrix_matches(self, mode, kwargs):
        import numpy as np

        corpus = CORPORA[0]
        ours, theirs = make_pair(**kwargs)
        ours.fit_on_texts(corpus)
        theirs.fit_on_texts(corpus)
        texts = corpus + ["the unknown zebra", ""]
        np.testing.assert_allclose(
            ours.texts_to_matrix(texts, mode=mode),
            theirs.texts_to_matrix(texts, mode=mode),
        )

    def test_fit_on_sequences_tfidf_matches(self):
        import numpy as np

        seqs = [[1, 2, 2, 3], [2, 4], [1, 1, 5], []]
        ours, theirs = make_pair(num_words=6)
        ours.fit_on_sequences(seqs)
        theirs.fit_on_sequences(seqs)
        assert ours.document_count == theirs.document_count
        assert ours.index_docs == dict(theirs.index_docs)
        for mode in ("binary", "count", "freq", "tfidf"):
            np.testing.assert_allclose(
                ours.sequences_to_matrix(seqs, mode=mode),
                theirs.sequences_to_matrix(seqs, mode=mode),
            )

    def test_unfit_matrix_raises(self):
        ours, theirs = make_pair()
        with pytest.raises(ValueError, match="num_words"):
            ours.sequences_to_matrix([[1]])
        with pytest.raises(ValueError):
            theirs.sequences_to_matrix([[1]])
        ours2, _ = make_pair(num_words=4)
        with pytest.raises(ValueError, match="tfidf"):
            ours2.sequences_to_matrix([[1]], mode="tfidf")
        with pytest.raises(ValueError, match="Unknown vectorization"):
            ours2.sequences_to_matrix([[1]], mode="l2")

    def test_index_docs_json_round_trip(self):
        from tpucap.text import Tokenizer

        seqs = [[1, 2], [2, 3]]
        tok = Tokenizer(num_words=5)
        tok.fit_on_sequences(seqs)
        back = Tokenizer.from_json(tok.to_json())
        assert back.index_docs == tok.index_docs
        assert back.document_count == tok.document_count
