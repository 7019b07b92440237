"""CIDEr-D and ROUGE-L caption metrics (pure numpy/stdlib).

The reference evaluates BLEU-1..4 only (SURVEY.md §2.1 #12 —
train/evaluate.py keeps that parity path on NLTK). Captioning practice
standardized on the coco-caption toolkit's additional metrics; these are
clean-room implementations of its conventions so offline evaluation
reports the numbers the field expects:

- **CIDEr-D** (Vedantam et al., CVPR 2015, the -D variant): TF-IDF
  weighted n-gram (n=1..4) cosine similarity between the candidate and
  each reference, with count clipping (``min(cand, ref)`` against the
  reference vector — repetitions can't inflate the score) and a Gaussian
  length penalty ``exp(-(len_c - len_r)^2 / (2 * 6^2))``; per-image
  score = mean over n, averaged over references, x10; corpus score =
  mean over images. IDF is ``log(N_images) - log(max(1, DF))`` with DF
  counting images whose reference SET contains the n-gram.
- **ROUGE-L** (Lin 2004, coco-caption convention): LCS-based
  precision/recall per reference, max over references taken separately
  for P and R, F-beta with beta=1.2; corpus score = mean over images.

Both take the same (references, hypotheses) token-list layout as
train/evaluate.bleu_scores and are exposed through
``evaluate_captions(metrics=...)`` / ``pipeline.evaluate`` / the CLI.
"""

from __future__ import annotations

import math
from collections import Counter

_CIDER_N = 4
_CIDER_SIGMA = 6.0
_ROUGE_BETA = 1.2


def _ngram_counts(tokens: list, n: int) -> Counter:
    return Counter(
        tuple(tokens[i : i + n]) for i in range(len(tokens) - n + 1)
    )


def _counts_to_vec(tokens: list, doc_freq: dict, log_n: float):
    """-> (per-n {ngram: tfidf}, per-n L2 norm, length)."""
    vecs, norms = [], []
    for n in range(1, _CIDER_N + 1):
        vec = {}
        for ngram, count in _ngram_counts(tokens, n).items():
            idf = log_n - math.log(max(1.0, doc_freq.get(ngram, 0.0)))
            vec[ngram] = count * idf
        vecs.append(vec)
        norms.append(math.sqrt(sum(v * v for v in vec.values())))
    return vecs, norms, len(tokens)


class CiderDScorer:
    """Per-sentence CIDEr-D against a FIXED corpus IDF.

    Document frequencies (and the IDF base ``log(N_images)``) are
    computed ONCE from the reference sets handed to the constructor;
    ``score(refs, hyp)`` then evaluates an individual candidate. This is
    the SCST reward convention (Rennie et al. 2017: per-image CIDEr-D
    with training-corpus statistics) and exactly the corpus metric's
    inner loop — ``cider_d`` delegates here, so the two can never drift.
    """

    def __init__(self, corpus_references: list[list[list[str]]]):
        if not corpus_references:
            raise ValueError("empty corpus")
        # Document frequency: an n-gram counts once per image whose
        # reference set contains it anywhere.
        doc_freq: Counter = Counter()
        for refs in corpus_references:
            seen = set()
            for ref in refs:
                for n in range(1, _CIDER_N + 1):
                    seen.update(_ngram_counts(ref, n))
            doc_freq.update(seen)
        self.doc_freq = doc_freq
        self.log_n = math.log(float(len(corpus_references)))

    def score(
        self, references: list[list[str]], hypothesis: list[str]
    ) -> float:
        """One image: tokenized reference captions + tokenized candidate
        -> CIDEr-D (x10, coco-caption scale)."""
        vec_h, norm_h, len_h = _counts_to_vec(
            hypothesis, self.doc_freq, self.log_n
        )
        per_n = [0.0] * _CIDER_N
        for ref in references:
            vec_r, norm_r, len_r = _counts_to_vec(
                ref, self.doc_freq, self.log_n
            )
            penalty = math.exp(
                -((len_h - len_r) ** 2) / (2.0 * _CIDER_SIGMA**2)
            )
            for n in range(_CIDER_N):
                # Clipped dot product: candidate counts can't exceed
                # the reference's (the -D anti-gaming term).
                val = sum(
                    min(w, vec_r[n].get(g, 0.0)) * vec_r[n].get(g, 0.0)
                    for g, w in vec_h[n].items()
                )
                if norm_h[n] != 0.0 and norm_r[n] != 0.0:
                    val /= norm_h[n] * norm_r[n]
                per_n[n] += val * penalty
        return (
            sum(per_n) / _CIDER_N / max(1, len(references)) * 10.0
        )


def cider_d(
    references: list[list[list[str]]], hypotheses: list[list[str]]
) -> float:
    """references: per-image list of tokenized reference captions;
    hypotheses: per-image tokenized candidate. -> corpus CIDEr-D.

    Matches the coco-caption CiderScorer (sigma 6.0, n 1..4, DF over
    reference sets, corpus-level IDF base log(N_images))."""
    if len(references) != len(hypotheses):
        raise ValueError(
            f"{len(references)} reference sets vs "
            f"{len(hypotheses)} hypotheses"
        )
    scorer = CiderDScorer(references)
    scores = [
        scorer.score(refs, hyp)
        for refs, hyp in zip(references, hypotheses)
    ]
    return float(sum(scores) / len(scores))


def _lcs_len(a: list, b: list) -> int:
    """Classic O(len(a)*len(b)) LCS table, one rolling row."""
    if not a or not b:
        return 0
    prev = [0] * (len(b) + 1)
    for x in a:
        cur = [0]
        for j, y in enumerate(b, 1):
            cur.append(
                prev[j - 1] + 1 if x == y else max(prev[j], cur[j - 1])
            )
        prev = cur
    return prev[-1]


def rouge_l(
    references: list[list[list[str]]], hypotheses: list[list[str]]
) -> float:
    """Corpus ROUGE-L, coco-caption convention: per image take the MAX
    precision and MAX recall over references (independently), combine
    with F-beta (beta=1.2), average over images."""
    if len(references) != len(hypotheses):
        raise ValueError(
            f"{len(references)} reference sets vs "
            f"{len(hypotheses)} hypotheses"
        )
    if not references:
        raise ValueError("empty corpus")
    beta2 = _ROUGE_BETA**2
    scores = []
    for refs, hyp in zip(references, hypotheses):
        prec_max = rec_max = 0.0
        for ref in refs:
            lcs = _lcs_len(hyp, ref)
            if hyp:
                prec_max = max(prec_max, lcs / len(hyp))
            if ref:
                rec_max = max(rec_max, lcs / len(ref))
        if prec_max and rec_max:
            f = ((1 + beta2) * prec_max * rec_max) / (
                rec_max + beta2 * prec_max
            )
        else:
            f = 0.0
        scores.append(f)
    return float(sum(scores) / len(scores))


class _NoWordnet:
    """Empty synonym module for NLTK's METEOR alignment: ``synsets``
    always returns [] so the wordnet stage matches nothing. This makes
    METEOR runnable offline (the WordNet corpus is a downloaded NLTK
    resource that does not exist in a no-network environment) at the
    cost of the synonym stage — scores are a strict LOWER BOUND of full
    METEOR, exactly the exact+stem configuration."""

    def synsets(self, word):  # noqa: D401 - NLTK duck-type
        del word
        return []


class _Lemma:
    __slots__ = ("_name",)

    def __init__(self, name):
        self._name = name

    def name(self):  # NLTK duck-type
        return self._name


class _Synset:
    __slots__ = ("_lemmas",)

    def __init__(self, words):
        self._lemmas = [_Lemma(w) for w in words]

    def lemmas(self):  # NLTK duck-type
        return self._lemmas


class SynonymTable:
    """User-supplied synonym table duck-typing NLTK's wordnet corpus
    reader for the METEOR synonym stage (``synsets(word)`` ->
    [synset], ``synset.lemmas()`` -> [lemma], ``lemma.name()`` -> str
    — the exact surface nltk.translate.meteor_score touches).

    Built from either a mapping ``{word: [synonyms...]}`` or a text
    file of synonym GROUPS: one group per line, words separated by
    whitespace or commas, ``#`` comments — e.g. a line
    ``dog canine hound`` makes the three mutually matchable. Symmetry
    is applied (membership in a group is enough; direction does not
    matter, matching WordNet synset semantics). This is the offline
    stand-in for the real WordNet corpus: point it at a list derived
    from a local WordNet installation to recover full METEOR, or at a
    small domain table for a cheap upper step over exact+stem."""

    def __init__(self, groups_or_map):
        # NLTK's align pipeline runs exact -> stem -> synonym, and the
        # stem stage REPLACES leftover surface forms with their Porter
        # stems before the synonym lookup sees them ('canine' arrives
        # as 'canin', and the reference side is stemmed too). So each
        # group is expanded with the stems of its members, as keys and
        # as lemma names, or the stage would never fire.
        from nltk.stem.porter import PorterStemmer

        stem = PorterStemmer().stem
        if hasattr(groups_or_map, "items"):
            groups = [
                {str(w), *map(str, syns)}
                for w, syns in groups_or_map.items()
            ]
        else:
            groups = [set(map(str, g)) for g in groups_or_map]
        self._syns: dict[str, set] = {}
        for group in groups:
            group = group | {stem(w) for w in group}
            for word in group:
                self._syns.setdefault(word, set()).update(group)

    @classmethod
    def from_file(cls, path) -> "SynonymTable":
        groups = []
        with open(path, encoding="utf-8") as f:
            for line in f:
                line = line.split("#", 1)[0].strip()
                if not line:
                    continue
                words = [
                    w for w in line.replace(",", " ").split() if w
                ]
                if len(words) >= 2:
                    groups.append(words)
        return cls(groups)

    def synsets(self, word):  # NLTK duck-type
        group = self._syns.get(word)
        return [_Synset(sorted(group))] if group else []


def meteor(
    references: list[list[list[str]]],
    hypotheses: list[list[str]],
    synonyms=None,
) -> float:
    """Corpus METEOR (Banerjee & Lavie 2005 via
    nltk.translate.meteor_score's alignment/chunk machinery, Porter
    stemmer): per image the max sentence score over references (NLTK's
    convention), averaged over images.

    ``synonyms`` drives the synonym stage: None (default) stubs it
    (see _NoWordnet) — scores are the exact+stem LOWER BOUND, the only
    option in a no-network environment with no local WordNet. Pass a
    path to a synonym-groups file, a ``{word: [synonyms]}`` mapping,
    or a prebuilt SynonymTable to enable the stage with local data.
    NOT jar-identical to coco-caption's METEOR 1.5 either way (no
    paraphrase tables); with a WordNet-derived table this matches
    NLTK's full configuration."""
    from nltk.translate.meteor_score import meteor_score

    if len(references) != len(hypotheses):
        raise ValueError(
            f"{len(references)} reference sets vs "
            f"{len(hypotheses)} hypotheses"
        )
    if not references:
        raise ValueError("empty corpus")
    if synonyms is None:
        wn = _NoWordnet()
    elif isinstance(synonyms, SynonymTable):
        wn = synonyms
    elif isinstance(synonyms, (str, bytes)) or hasattr(
        synonyms, "__fspath__"
    ):
        wn = SynonymTable.from_file(synonyms)
    else:
        wn = SynonymTable(synonyms)
    scores = [
        meteor_score(refs, hyp, wordnet=wn)
        for refs, hyp in zip(references, hypotheses)
    ]
    return float(sum(scores) / len(scores))


def caption_stats(hypotheses: list[list[str]]) -> dict[str, float]:
    """Reference-free diversity/length diagnostics of a generated
    caption set — the standard companions to the overlap metrics for
    spotting mode collapse (a beam-search model can hold its BLEU while
    emitting the same five captions for everything; these numbers
    can't miss that):

    - ``distinct_1`` / ``distinct_2`` (Li et al., NAACL 2016): unique
      n-grams / total n-grams across the corpus, n=1,2.
    - ``vocab_used``: number of distinct words emitted.
    - ``unique_captions``: fraction of images whose caption string is
      unique in the set (1.0 = no two images share a caption).
    - ``mean_len``: mean caption length in words.

    Takes the hypotheses in the same token-list layout as the overlap
    metrics (sentinels already stripped by evaluate_captions)."""
    if not hypotheses:
        raise ValueError("empty corpus")
    total = {1: 0, 2: 0}
    uniq: dict[int, set] = {1: set(), 2: set()}
    for hyp in hypotheses:
        for n in (1, 2):
            grams = [tuple(hyp[i : i + n]) for i in range(len(hyp) - n + 1)]
            total[n] += len(grams)
            uniq[n].update(grams)
    caps = Counter(tuple(h) for h in hypotheses)
    # A corpus with zero n-grams at some n (e.g. all single-word
    # captions -> no bigrams) leaves that distinct_n UNDEFINED — None,
    # not 0.0, which would read as maximal mode collapse (ADVICE r3;
    # the 'absent until meaningful' convention of the latency summary).
    return {
        "distinct_1": len(uniq[1]) / total[1] if total[1] else None,
        "distinct_2": len(uniq[2]) / total[2] if total[2] else None,
        "vocab_used": float(len(uniq[1])),
        "unique_captions": sum(
            1 for c in caps.values() if c == 1
        ) / len(hypotheses),
        "mean_len": sum(len(h) for h in hypotheses) / len(hypotheses),
    }
