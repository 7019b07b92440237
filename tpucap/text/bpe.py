"""Subword (byte-pair-encoding) tokenizer — beyond-parity text layer.

The reference genre is word-level (tpucap.text.Tokenizer reproduces the
Keras Tokenizer bit-for-bit); a subword vocabulary is the production
alternative when the corpus outgrows a closed word list: no OOV words
(any unseen word decomposes into seen pieces), a bounded embedding
table, and better sharing across morphology — the natural pairing for
the beyond-parity transformer decoder family.

Algorithm: classic word-level BPE (Sennrich et al. 2016). Fit counts
word frequencies under the SAME normalization as the word tokenizer
(lowercase + the Keras filter set, so captions tokenize consistently
across both), seeds each word as characters with an end-of-word marker
on the last piece, then greedily merges the most frequent adjacent
symbol pair until the target vocabulary size is reached. Encoding
replays the learned merges in order (cached per word); decoding joins
pieces and splits words at the end-of-word marker.

Drop-in interface: exposes the surface the pipeline consumes from the
word tokenizer — ``word_index`` / ``index_word`` (with ``startseq`` /
``endseq`` as ATOMIC special tokens), ``vocab_size``, ``word_for_id``,
``texts_to_sequences`` / ``sequences_to_texts``, ``save`` / ``load`` —
plus ``decode_ids`` which ``tpucap.decode.ids_to_captions`` prefers
when present (subword pieces must be concatenated, not space-joined).
Index 0 stays reserved for padding, like everywhere else in the stack.
"""

from __future__ import annotations

import json
from collections import Counter

from tpucap.text.tokenizer import DEFAULT_FILTERS, text_to_word_sequence

# Last piece of every word carries this marker, so decoding knows where
# words end without a separate space symbol.
EOW = "</w>"

SPECIALS = ("startseq", "endseq")


class BpeTokenizer:
    def __init__(
        self,
        vocab_size: int = 1024,
        *,
        min_frequency: int = 2,
        filters: str = DEFAULT_FILTERS,
        lower: bool = True,
        specials: tuple = SPECIALS,
    ):
        if vocab_size < len(specials) + 2:
            raise ValueError(f"vocab_size {vocab_size} too small")
        if min_frequency < 1:
            raise ValueError(
                f"min_frequency must be >= 1, got {min_frequency}"
            )
        self.target_vocab_size = vocab_size
        self.min_frequency = min_frequency
        self.filters = filters
        self.lower = lower
        self.specials = tuple(specials)
        self.merges: list[tuple[str, str]] = []
        self.word_index: dict[str, int] = {}
        self.index_word: dict[int, str] = {}
        self._encode_cache: dict[str, list[int]] = {}

    # -- fitting -------------------------------------------------------------

    def _words(self, text: str) -> list[str]:
        return text_to_word_sequence(
            text, filters=self.filters, lower=self.lower, split=" "
        )

    def fit_on_texts(self, texts) -> None:
        word_freq: Counter = Counter()
        for t in texts:
            for w in self._words(t):
                if w not in self.specials:
                    word_freq[w] += 1

        # Seed: each word is a tuple of symbols, last one marked EOW.
        def seed(w):
            return tuple(list(w[:-1]) + [w[-1] + EOW])

        corpus = {seed(w): c for w, c in word_freq.items()}
        symbols = Counter()
        for sym_word, c in corpus.items():
            for s in sym_word:
                symbols[s] += c

        # Reserved: 0 pad, then specials, then the alphabet, then merges.
        alphabet = sorted(symbols)
        budget = self.target_vocab_size - 1 - len(self.specials)
        if len(alphabet) > budget:
            # The "bounded table" contract must not be violated
            # silently: the seed alphabet (chars + char</w> variants)
            # alone already exceeds the target.
            raise ValueError(
                f"vocab_size {self.target_vocab_size} is below the "
                f"minimum for this corpus: its character alphabet needs "
                f"{len(alphabet) + 1 + len(self.specials)} entries "
                "(pad + specials + alphabet) before any merge"
            )
        merges: list[tuple[str, str]] = []
        merged_tokens: list[str] = []
        while len(alphabet) + len(merges) < budget:
            pairs: Counter = Counter()
            for sym_word, c in corpus.items():
                for a, b in zip(sym_word, sym_word[1:]):
                    pairs[(a, b)] += c
            if not pairs:
                break
            # Deterministic: max count, ties broken lexicographically.
            best, count = max(
                pairs.items(), key=lambda kv: (kv[1], kv[0][0], kv[0][1])
            )
            if count < self.min_frequency:
                break
            merges.append(best)
            merged_tokens.append(best[0] + best[1])
            new_corpus = {}
            a, b = best
            for sym_word, c in corpus.items():
                out, i = [], 0
                while i < len(sym_word):
                    if (
                        i + 1 < len(sym_word)
                        and sym_word[i] == a
                        and sym_word[i + 1] == b
                    ):
                        out.append(a + b)
                        i += 2
                    else:
                        out.append(sym_word[i])
                        i += 1
                new_corpus[tuple(out)] = new_corpus.get(tuple(out), 0) + c
            corpus = new_corpus

        self.merges = merges
        self.word_index = {}
        idx = 1
        for s in self.specials:
            self.word_index[s] = idx
            idx += 1
        for tok in alphabet + merged_tokens:
            if tok not in self.word_index:
                self.word_index[tok] = idx
                idx += 1
        self.index_word = {i: w for w, i in self.word_index.items()}
        self._encode_cache = {}

    # -- encoding ------------------------------------------------------------

    def _encode_word(self, w: str) -> list[int]:
        cached = self._encode_cache.get(w)
        if cached is not None:
            return cached
        if w in self.specials:
            ids = [self.word_index[w]]
        else:
            pieces = list(w[:-1]) + [w[-1] + EOW]
            for a, b in self.merges:
                out, i = [], 0
                while i < len(pieces):
                    if (
                        i + 1 < len(pieces)
                        and pieces[i] == a
                        and pieces[i + 1] == b
                    ):
                        out.append(a + b)
                        i += 2
                    else:
                        out.append(pieces[i])
                        i += 1
                pieces = out
            # Unknown characters (absent from the fit alphabet) drop —
            # the word-tokenizer analog of an un-set oov_token.
            ids = [
                self.word_index[p] for p in pieces if p in self.word_index
            ]
        self._encode_cache[w] = ids
        return ids

    def texts_to_sequences(self, texts) -> list[list[int]]:
        return [
            [i for w in self._words(t) for i in self._encode_word(w)]
            for t in texts
        ]

    # -- decoding ------------------------------------------------------------

    def word_for_id(self, index: int):
        return self.index_word.get(int(index))

    def decode_ids(self, ids) -> str:
        """Subword ids -> text: concatenate pieces, split words at the
        end-of-word marker; specials render as their own words (callers
        strip startseq/endseq like they do for the word tokenizer)."""
        words, buf = [], ""
        for i in ids:
            tok = self.index_word.get(int(i))
            if tok is None:
                continue
            if tok in self.specials:
                if buf:
                    words.append(buf)
                    buf = ""
                words.append(tok)
            elif tok.endswith(EOW):
                words.append(buf + tok[: -len(EOW)])
                buf = ""
            else:
                buf += tok
        if buf:
            words.append(buf)
        return " ".join(words)

    def sequences_to_texts(self, sequences) -> list[str]:
        return [self.decode_ids(seq) for seq in sequences]

    @property
    def vocab_size(self) -> int:
        return len(self.word_index) + 1  # index 0 reserved for padding

    # -- persistence ---------------------------------------------------------

    def to_json(self) -> str:
        return json.dumps(
            {
                "kind": "bpe",
                "target_vocab_size": self.target_vocab_size,
                "min_frequency": self.min_frequency,
                "filters": self.filters,
                "lower": self.lower,
                "specials": list(self.specials),
                "merges": [list(m) for m in self.merges],
                "word_index": self.word_index,
            }
        )

    @classmethod
    def from_json(cls, payload) -> "BpeTokenizer":
        """``payload``: JSON string, or an already-parsed dict (the
        dispatching ``load_tokenizer`` parses once and hands the dict
        through rather than re-parsing a multi-MB artifact)."""
        d = json.loads(payload) if isinstance(payload, str) else payload
        tok = cls(
            d["target_vocab_size"],
            min_frequency=d["min_frequency"],
            filters=d["filters"],
            lower=d["lower"],
            specials=tuple(d["specials"]),
        )
        tok.merges = [tuple(m) for m in d["merges"]]
        tok.word_index = {w: int(i) for w, i in d["word_index"].items()}
        tok.index_word = {i: w for w, i in tok.word_index.items()}
        return tok

    def save(self, path) -> None:
        with open(path, "w") as f:
            f.write(self.to_json())

    @classmethod
    def load(cls, path) -> "BpeTokenizer":
        with open(path) as f:
            return cls.from_json(f.read())


def load_tokenizer(path):
    """Open a tokenizer artifact of either kind: BPE files carry a
    ``"kind": "bpe"`` tag; anything else is the word-level
    Keras-parity Tokenizer (pre-existing artifacts have no tag)."""
    with open(path) as f:
        d = json.load(f)
    if d.get("kind") == "bpe":
        return BpeTokenizer.from_json(d)
    from tpucap.text.tokenizer import Tokenizer

    return Tokenizer.from_json(d)
