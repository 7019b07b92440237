"""Pure-Python tokenizer with tf_keras-parity semantics.

The reference pipeline fits a ``keras.preprocessing.text.Tokenizer`` on the
training captions and relies on several subtle behaviors that this class
reproduces exactly (differentially tested against tf_keras 2.21 in
tests/test_tokenizer.py):

- index 0 is reserved for padding and never assigned to a word
  [tf_keras/src/preprocessing/text.py:316-322]
- vocabulary is sorted by descending frequency with ties broken by first-seen
  order (Python's stable sort over an insertion-ordered dict)
  [tf_keras/src/preprocessing/text.py:310-313]
- ``oov_token``, if set, is forced to index 1 [text.py:314-315]
- ``num_words`` is applied at *encode* time: indices ``>= num_words`` are
  dropped (or mapped to OOV) while ``word_index`` keeps the full vocabulary
  [text.py:395-404]
- the filter set is all ASCII punctuation plus tab/newline, minus ``'``
  [text.py:243]

No TensorFlow import is required at runtime.
"""

from __future__ import annotations

import json
from collections import OrderedDict
from typing import Iterable, Sequence

DEFAULT_FILTERS = '!"#$%&()*+,-./:;<=>?@[\\]^_`{|}~\t\n'


def text_to_word_sequence(
    input_text: str,
    filters: str = DEFAULT_FILTERS,
    lower: bool = True,
    split: str = " ",
) -> list[str]:
    """Split a text into words, Keras-style [tf_keras text.py:39-84]."""
    if lower:
        input_text = input_text.lower()
    translate_map = str.maketrans({c: split for c in filters})
    input_text = input_text.translate(translate_map)
    return [w for w in input_text.split(split) if w]


class Tokenizer:
    """Word <-> index vocabulary with tf_keras.Tokenizer-identical semantics.

    Only the text (not char-level / analyzer) path is implemented — the
    reference uses the defaults. ``word_counts`` preserves first-seen order so
    frequency ties sort identically to tf_keras.
    """

    def __init__(
        self,
        num_words: int | None = None,
        filters: str = DEFAULT_FILTERS,
        lower: bool = True,
        split: str = " ",
        oov_token: str | None = None,
    ):
        self.num_words = num_words
        self.filters = filters
        self.lower = lower
        self.split = split
        self.oov_token = oov_token
        self.word_counts: OrderedDict[str, int] = OrderedDict()
        self.word_docs: dict[str, int] = {}
        self.index_docs: dict[int, int] = {}  # doc freq by word INDEX
        self.document_count = 0
        self.word_index: dict[str, int] = {}
        self.index_word: dict[int, str] = {}

    # -- fitting -----------------------------------------------------------

    def _analyze(self, text: str) -> list[str]:
        return text_to_word_sequence(
            text, filters=self.filters, lower=self.lower, split=self.split
        )

    def fit_on_texts(self, texts: Iterable[str]) -> None:
        for text in texts:
            self.document_count += 1
            seq = self._analyze(text)
            for w in seq:
                self.word_counts[w] = self.word_counts.get(w, 0) + 1
            for w in set(seq):
                self.word_docs[w] = self.word_docs.get(w, 0) + 1

        wcounts = list(self.word_counts.items())
        # Stable sort: frequency desc, ties keep first-seen order.
        wcounts.sort(key=lambda x: x[1], reverse=True)
        sorted_voc = [] if self.oov_token is None else [self.oov_token]
        sorted_voc.extend(w for w, _ in wcounts)
        # Index 0 reserved for padding — never assigned.
        self.word_index = {w: i for i, w in enumerate(sorted_voc, start=1)}
        self.index_word = {i: w for w, i in self.word_index.items()}
        for w, c in self.word_docs.items():
            self.index_docs[self.word_index[w]] = c

    def fit_on_sequences(self, sequences: Iterable[Sequence[int]]) -> None:
        """Update document frequencies from already-encoded sequences —
        the tfidf statistics path when no raw text exists
        [tf_keras text.py fit_on_sequences]."""
        sequences = list(sequences)
        self.document_count += len(sequences)
        for seq in sequences:
            for i in set(seq):
                self.index_docs[i] = self.index_docs.get(i, 0) + 1

    # -- encoding / decoding ----------------------------------------------

    def texts_to_sequences(self, texts: Iterable[str]) -> list[list[int]]:
        num_words = self.num_words
        oov_index = self.word_index.get(self.oov_token)
        out = []
        for text in texts:
            vect: list[int] = []
            for w in self._analyze(text):
                i = self.word_index.get(w)
                if i is not None:
                    if num_words and i >= num_words:
                        if oov_index is not None:
                            vect.append(oov_index)
                    else:
                        vect.append(i)
                elif self.oov_token is not None:
                    vect.append(oov_index)
            out.append(vect)
        return out

    def sequences_to_texts(self, sequences: Iterable[Sequence[int]]) -> list[str]:
        num_words = self.num_words
        oov_index = self.word_index.get(self.oov_token)
        out = []
        for seq in sequences:
            vect: list[str] = []
            for num in seq:
                word = self.index_word.get(num)
                if word is not None:
                    if num_words and num >= num_words:
                        if oov_index is not None:
                            vect.append(self.index_word[oov_index])
                    else:
                        vect.append(word)
                elif self.oov_token is not None:
                    vect.append(self.index_word[oov_index])
            out.append(" ".join(vect))
        return out

    def word_for_id(self, index: int) -> str | None:
        """Reverse lookup used by the reference's generation loop."""
        return self.index_word.get(index)

    # -- bag-of-words matrices --------------------------------------------

    def sequences_to_matrix(self, sequences, mode: str = "binary"):
        """Encoded sequences -> (N, num_words) bag-of-words matrix;
        modes binary/count/freq/tfidf with tf_keras-identical numerics
        (tfidf: (1+log c) * log(1 + D/(1+df)), weighting scheme 2)
        [tf_keras text.py sequences_to_matrix]."""
        import numpy as np

        if not self.num_words:
            if self.word_index:
                num_words = len(self.word_index) + 1
            else:
                raise ValueError(
                    "Specify a dimension (`num_words` argument), "
                    "or fit on some text data first."
                )
        else:
            num_words = self.num_words
        if mode == "tfidf" and not self.document_count:
            raise ValueError(
                "Fit the Tokenizer on some data before using tfidf mode."
            )
        sequences = list(sequences)
        x = np.zeros((len(sequences), num_words))
        for i, seq in enumerate(sequences):
            if not seq:
                continue
            counts: dict[int, int] = {}
            for j in seq:
                if j < num_words:
                    counts[j] = counts.get(j, 0) + 1
            for j, c in counts.items():
                if mode == "count":
                    x[i][j] = c
                elif mode == "freq":
                    x[i][j] = c / len(seq)
                elif mode == "binary":
                    x[i][j] = 1
                elif mode == "tfidf":
                    tf = 1 + np.log(c)
                    idf = np.log(
                        1
                        + self.document_count
                        / (1 + self.index_docs.get(j, 0))
                    )
                    x[i][j] = tf * idf
                else:
                    raise ValueError("Unknown vectorization mode:", mode)
        return x

    def texts_to_matrix(self, texts: Iterable[str], mode: str = "binary"):
        """Raw texts -> bag-of-words matrix (encode then vectorize)."""
        return self.sequences_to_matrix(
            self.texts_to_sequences(texts), mode=mode
        )

    # -- sizes -------------------------------------------------------------

    @property
    def vocab_size(self) -> int:
        """Model vocab size: +1 for the reserved padding index 0.

        Mirrors the reference's ``len(tokenizer.word_index) + 1`` idiom,
        clipped by num_words the way Keras Embedding users must.
        """
        full = len(self.word_index) + 1
        if self.num_words:
            return min(full, self.num_words)
        return full

    # -- persistence (replaces the reference's pickle artifact) ------------

    def to_json(self) -> str:
        return json.dumps(
            {
                "num_words": self.num_words,
                "filters": self.filters,
                "lower": self.lower,
                "split": self.split,
                "oov_token": self.oov_token,
                "word_counts": list(self.word_counts.items()),
                "word_docs": self.word_docs,
                "index_docs": self.index_docs,
                "document_count": self.document_count,
                "word_index": self.word_index,
            }
        )

    @classmethod
    def from_json(cls, payload) -> "Tokenizer":
        """``payload``: JSON string, or an already-parsed dict (see
        tpucap.text.bpe.load_tokenizer — one parse for multi-MB
        artifacts)."""
        d = json.loads(payload) if isinstance(payload, str) else payload
        tok = cls(
            num_words=d["num_words"],
            filters=d["filters"],
            lower=d["lower"],
            split=d["split"],
            oov_token=d["oov_token"],
        )
        tok.word_counts = OrderedDict(
            (w, int(c)) for w, c in d["word_counts"]
        )
        tok.word_docs = {w: int(c) for w, c in d["word_docs"].items()}
        # index_docs keys are ints (JSON stringifies them); absent in
        # pre-round-3 artifacts — rebuilt from word_docs after word_index.
        tok.index_docs = {
            int(i): int(c) for i, c in d.get("index_docs", {}).items()
        }
        tok.document_count = d["document_count"]
        tok.word_index = {w: int(i) for w, i in d["word_index"].items()}
        tok.index_word = {i: w for w, i in tok.word_index.items()}
        if not tok.index_docs and tok.word_docs:
            tok.index_docs = {
                tok.word_index[w]: c
                for w, c in tok.word_docs.items()
                if w in tok.word_index
            }
        return tok

    def save(self, path) -> None:
        with open(path, "w") as f:
            f.write(self.to_json())

    @classmethod
    def load(cls, path) -> "Tokenizer":
        with open(path) as f:
            return cls.from_json(f.read())
