"""BLEU evaluation (SURVEY.md §2.1 #12, §3.5).

Batched sharded decode produces all test captions in a few device programs;
the corpus BLEU-1..4 computation itself uses NLTK's corpus_bleu — the same
function the reference calls — so the ±0.1 BLEU-4 parity gate compares like
with like [nltk/translate/bleu_score.py:137].
"""

from __future__ import annotations



def bleu_scores(
    references: list[list[list[str]]], hypotheses: list[list[str]]
) -> dict[str, float]:
    """references: per-image list of tokenized reference captions;
    hypotheses: per-image tokenized generated caption. -> BLEU-1..4."""
    from nltk.translate.bleu_score import SmoothingFunction, corpus_bleu

    smoothing = SmoothingFunction().method0  # reference default: none
    weights = {
        "bleu1": (1.0, 0, 0, 0),
        "bleu2": (0.5, 0.5, 0, 0),
        "bleu3": (1 / 3, 1 / 3, 1 / 3, 0),
        "bleu4": (0.25, 0.25, 0.25, 0.25),
    }
    return {
        k: float(
            corpus_bleu(
                references, hypotheses, weights=w, smoothing_function=smoothing
            )
        )
        for k, w in weights.items()
    }


def evaluate_captions(
    descriptions: dict[str, list[str]],
    generated: dict[str, str],
    *,
    strip_sentinels: bool = True,
    metrics: tuple = ("bleu",),
    meteor_synonyms=None,
) -> dict[str, float]:
    """Reference-parity evaluate_model: compare generated captions against
    the 5 reference captions per image, corpus-level BLEU-1..4.

    descriptions values are the cleaned, wrapped captions; sentinels are
    stripped from both sides (the reference keeps them in the refs it
    compares against — controlled by strip_sentinels=False for strict
    compat). ``metrics`` selects from 'bleu' (the reference-parity
    default), 'cider' (CIDEr-D), 'rouge_l', 'meteor' (exact+stem
    modules — offline lower bound of METEOR 1.5), and 'diversity'
    (reference-free distinct-1/2, vocab_used, unique_captions,
    mean_len — the mode-collapse diagnostics) — extras come from
    tpucap.train.metrics. ``meteor_synonyms`` enables METEOR's synonym
    stage from local data (a synonym-groups file path, mapping, or
    SynonymTable — tpucap.train.metrics.meteor)."""
    refs, hyps = [], []
    for image_id, hyp in generated.items():
        caps = descriptions[image_id]
        ref_tokens = [c.split() for c in caps]
        hyp_tokens = hyp.split()
        if strip_sentinels:
            ref_tokens = [
                [w for w in r if w not in ("startseq", "endseq")]
                for r in ref_tokens
            ]
            hyp_tokens = [
                w for w in hyp_tokens if w not in ("startseq", "endseq")
            ]
        refs.append(ref_tokens)
        hyps.append(hyp_tokens)
    unknown = set(metrics) - {
        "bleu", "cider", "rouge_l", "meteor", "diversity",
    }
    if unknown:
        raise ValueError(
            f"unknown metrics {sorted(unknown)}; "
            "have bleu|cider|rouge_l|meteor|diversity"
        )
    out: dict[str, float] = {}
    if "bleu" in metrics:
        out.update(bleu_scores(refs, hyps))
    if "cider" in metrics:
        from tpucap.train.metrics import cider_d

        out["cider"] = cider_d(refs, hyps)
    if "rouge_l" in metrics:
        from tpucap.train.metrics import rouge_l

        out["rouge_l"] = rouge_l(refs, hyps)
    if "meteor" in metrics:
        from tpucap.train.metrics import meteor

        out["meteor"] = meteor(refs, hyps, synonyms=meteor_synonyms)
    if "diversity" in metrics:
        from tpucap.train.metrics import caption_stats

        out.update(caption_stats(hyps))
    return out
