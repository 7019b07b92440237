"""Minimum-Bayes-risk (consensus) reranking of candidate captions.

The genre's classic post-decode quality lever (Devlin et al. 2015's
CIDEr consensus; MBR decoding in NMT): generate N candidates per image,
then pick the one with the highest EXPECTED UTILITY against the other
candidates — the candidate that agrees most with the rest of the pool.
Model probability finds a high-likelihood caption; consensus finds the
caption the model's whole distribution keeps circling, which correlates
better with human metrics than raw log-prob.

Selection is pure host-side post-processing over decoded strings (the
device work is the N decodes, which the pipeline gets from the existing
engines: sampling, n-best beam, or diverse beam groups). Utilities:

- 'cider': per-sentence CIDEr-D (train/metrics.CiderDScorer) with IDF
  fixed over the candidate pools themselves — each candidate is scored
  with the OTHER candidates of its image as the reference set, exactly
  the consensus-reranking construction.
- 'bleu4': smoothed sentence BLEU-4 against the other candidates
  (NLTK, method1 smoothing — the evaluate --dump-captions convention).
"""

from __future__ import annotations


def mbr_select(
    candidates: list[list[str]], *, metric: str = "cider"
) -> tuple[list[int], list[float]]:
    """candidates: per-image list of caption strings (N >= 1 each).
    Returns (per-image index of the consensus pick, its expected
    utility). Ties resolve to the lowest index; single-candidate pools
    pick index 0 with utility 0."""
    if metric not in ("cider", "bleu4"):
        raise ValueError(f"unknown MBR metric {metric!r}; cider|bleu4")
    if not candidates:
        return [], []
    tokenized = [[c.split() for c in pool] for pool in candidates]

    if metric == "cider":
        from tpucap.train.metrics import CiderDScorer

        # IDF over the candidate pools (each pool = one "image"): the
        # only corpus that exists at decode time. Uninformative n-grams
        # shared by every candidate are down-weighted exactly as in the
        # corpus metric.
        scorer = CiderDScorer(tokenized)

        def utility(others, hyp):
            if not others:
                return 0.0
            return scorer.score(others, hyp)

    else:
        from nltk.translate.bleu_score import (
            SmoothingFunction,
            sentence_bleu,
        )

        smooth = SmoothingFunction().method1

        def utility(others, hyp):
            if not others:
                return 0.0
            return float(
                sentence_bleu(others, hyp, smoothing_function=smooth)
            )

    picks, utils = [], []
    for pool in tokenized:
        best_i, best_u = 0, float("-inf")
        for i, hyp in enumerate(pool):
            others = pool[:i] + pool[i + 1:]
            u = utility(others, hyp)
            if u > best_u:  # strict: ties keep the lowest index
                best_i, best_u = i, u
        picks.append(best_i)
        utils.append(best_u if len(pool) > 1 else 0.0)
    return picks, utils
