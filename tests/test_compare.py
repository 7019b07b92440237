"""Paired bootstrap comparison (train/compare.py): the sufficient-stats
corpus BLEU is pinned EQUAL to NLTK's corpus_bleu (the evaluate-surface
metric) by randomized differential testing; the bootstrap itself is
checked on identical, clearly-different, and mean-convention systems;
the dump-file front-end and CLI are exercised end-to-end."""

import json

import numpy as np
import pytest

from tpucap.train.compare import (
    compare_caption_files,
    corpus_bleu_from_stats,
    corpus_stats,
    load_caption_dump,
    paired_bootstrap,
)

WORDS = "a b c d e f g h i j".split()


def _rand_corpus(rng, n_images, min_len=1, max_len=12):
    refs, hyps = [], []
    for _ in range(n_images):
        rs = [
            [WORDS[rng.integers(0, len(WORDS))]
             for _ in range(rng.integers(min_len, max_len))]
            for _ in range(rng.integers(1, 4))
        ]
        hyp = [
            WORDS[rng.integers(0, len(WORDS))]
            for _ in range(rng.integers(min_len, max_len))
        ]
        refs.append(rs)
        hyps.append(hyp)
    return refs, hyps


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
@pytest.mark.parametrize(
    "weights",
    [
        (1.0, 0, 0, 0),
        (0.5, 0.5, 0, 0),
        (1 / 3, 1 / 3, 1 / 3, 0),
        (0.25, 0.25, 0.25, 0.25),
    ],
)
def test_bleu_stats_match_nltk(seed, weights):
    """Differential vs the installed NLTK across random corpora —
    including short hypotheses whose higher-order precisions are zero
    (method0's float_info.min substitution)."""
    from nltk.translate.bleu_score import SmoothingFunction, corpus_bleu

    rng = np.random.default_rng(seed)
    refs, hyps = _rand_corpus(rng, 25)
    want = corpus_bleu(
        refs, hyps, weights=weights,
        smoothing_function=SmoothingFunction().method0,
    )
    got = float(corpus_bleu_from_stats(corpus_stats(refs, hyps), weights))
    np.testing.assert_allclose(got, float(want), rtol=1e-9, atol=1e-300)


def test_bleu_stats_match_nltk_degenerate():
    """No matches at all -> 0 (NLTK's early return)."""
    refs = [[["a", "b"]], [["c", "d"]]]
    hyps = [["x"], ["y", "z"]]
    got = float(
        corpus_bleu_from_stats(
            corpus_stats(refs, hyps), (0.25, 0.25, 0.25, 0.25)
        )
    )
    assert got == 0.0


def test_bleu_stats_resample_axis():
    """A resample index matrix scores every resample in one shot and
    agrees with scoring each resampled corpus separately."""
    rng = np.random.default_rng(7)
    refs, hyps = _rand_corpus(rng, 12)
    stats = corpus_stats(refs, hyps)
    idx = rng.integers(0, 12, size=(5, 12))
    batch = corpus_bleu_from_stats(
        {k: v[idx] for k, v in stats.items()}
    )
    for r in range(5):
        one = corpus_bleu_from_stats(
            {k: v[idx[r]] for k, v in stats.items()}
        )
        np.testing.assert_allclose(batch[r], one, rtol=1e-12)


def test_identical_systems_not_significant():
    rng = np.random.default_rng(3)
    refs, hyps = _rand_corpus(rng, 30)
    res = paired_bootstrap(refs, hyps, hyps, n_resamples=200, seed=0)
    assert res["delta"] == 0.0
    assert res["p_value"] == 1.0
    assert not res["significant_at_05"]
    assert res["wins_a"] == res["wins_b"] == 0


def test_clearly_better_system_is_significant():
    """B echoes a reference (BLEU ~1 per image), A is random — the
    paired test must call it."""
    rng = np.random.default_rng(4)
    refs, hyps_a = _rand_corpus(rng, 40, min_len=5)
    hyps_b = [r[0] for r in refs]
    res = paired_bootstrap(
        refs, hyps_a, hyps_b, metric="bleu4", n_resamples=300, seed=1
    )
    assert res["score_b"] > res["score_a"]
    assert res["delta"] > 0
    assert res["significant_at_05"]
    assert res["wins_b"] > res["wins_a"]
    assert res["delta_ci95"][0] > 0


def test_mean_metric_path_matches_corpus_function():
    """The per-sentence path's full-set score must equal the corpus
    metric in train.metrics (corpus CIDEr-D/ROUGE-L are means)."""
    from tpucap.train.metrics import cider_d, rouge_l

    rng = np.random.default_rng(5)
    refs, hyps = _rand_corpus(rng, 15, min_len=3)
    other = [list(reversed(h)) for h in hyps]
    res = paired_bootstrap(
        refs, hyps, other, metric="cider", n_resamples=50, seed=2
    )
    np.testing.assert_allclose(res["score_a"], cider_d(refs, hyps), rtol=1e-9)
    res2 = paired_bootstrap(
        refs, hyps, other, metric="rouge_l", n_resamples=50, seed=2
    )
    np.testing.assert_allclose(
        res2["score_a"], rouge_l(refs, hyps), rtol=1e-9
    )


def test_validation():
    refs, hyps = _rand_corpus(np.random.default_rng(6), 4)
    with pytest.raises(ValueError, match="aligned"):
        paired_bootstrap(refs, hyps[:-1], hyps)
    with pytest.raises(ValueError, match="metric"):
        paired_bootstrap(refs, hyps, hyps, metric="spice")
    with pytest.raises(ValueError, match="empty"):
        paired_bootstrap([], [], [])


# -- dump-file front-end + CLI ------------------------------------------------


def _write_dump(path, rows):
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def _dump_rows(ids, caps, refs):
    return [
        {
            "image_id": i,
            "caption": c,
            "references": r,
            "bleu4": 0.0,
        }
        for i, c, r in zip(ids, caps, refs)
    ]


def test_compare_files(tmp_path):
    rng = np.random.default_rng(8)
    refs_tok, hyps_tok = _rand_corpus(rng, 20, min_len=4)
    ids = [f"img{i}" for i in range(20)]
    refs = [
        ["startseq " + " ".join(r) + " endseq" for r in rs]
        for rs in refs_tok
    ]
    caps_a = [" ".join(h) for h in hyps_tok]
    caps_b = [r[0].replace("startseq ", "").replace(" endseq", "")
              for r in refs]
    pa, pb = tmp_path / "a.jsonl", tmp_path / "b.jsonl"
    _write_dump(pa, _dump_rows(ids, caps_a, refs))
    _write_dump(pb, _dump_rows(ids, caps_b, refs))

    dump = load_caption_dump(str(pa))
    assert set(dump) == set(ids)

    res = compare_caption_files(
        str(pa), str(pb), metric="bleu4", n_resamples=200, seed=0
    )
    assert res["score_b"] > res["score_a"]
    assert res["significant_at_05"]

    # mismatched id sets refuse
    _write_dump(pb, _dump_rows(ids[:-1], caps_b[:-1], refs[:-1]))
    with pytest.raises(ValueError, match="image sets differ"):
        compare_caption_files(str(pa), str(pb))

    # diverging references refuse
    bad_refs = [list(r) for r in refs]
    bad_refs[0] = ["startseq something else endseq"]
    _write_dump(pb, _dump_rows(ids, caps_b, bad_refs))
    with pytest.raises(ValueError, match="references"):
        compare_caption_files(str(pa), str(pb))

    # malformed rows refuse with a pointer
    (tmp_path / "c.jsonl").write_text('{"image_id": "x"}\n')
    with pytest.raises(ValueError, match="caption"):
        load_caption_dump(str(tmp_path / "c.jsonl"))

    # a duplicate image_id (e.g. two evaluate runs appended to one
    # path) refuses instead of silently comparing a smaller corpus
    dup = _dump_rows(ids, caps_a, refs) + _dump_rows(
        ids[:1], caps_a[:1], refs[:1]
    )
    _write_dump(tmp_path / "dup.jsonl", dup)
    with pytest.raises(ValueError, match="duplicate image_id"):
        load_caption_dump(str(tmp_path / "dup.jsonl"))

    # an empty references list refuses naming the row (it would
    # otherwise crash deep inside the BLEU stats)
    empty = _dump_rows(ids[:2], caps_a[:2], [refs[0], []])
    _write_dump(tmp_path / "er.jsonl", empty)
    with pytest.raises(ValueError, match="no references"):
        load_caption_dump(str(tmp_path / "er.jsonl"))


def test_compare_cli(tmp_path, capsys):
    from tpucap.cli.main import main

    rng = np.random.default_rng(9)
    refs_tok, hyps_tok = _rand_corpus(rng, 10, min_len=4)
    ids = [f"img{i}" for i in range(10)]
    refs = [[" ".join(r) for r in rs] for rs in refs_tok]
    caps = [" ".join(h) for h in hyps_tok]
    pa, pb = tmp_path / "a.jsonl", tmp_path / "b.jsonl"
    _write_dump(pa, _dump_rows(ids, caps, refs))
    _write_dump(pb, _dump_rows(ids, caps, refs))
    main(["compare", str(pa), str(pb), "--metric", "bleu4",
          "--bootstrap", "50"])
    out = capsys.readouterr().out
    res = json.loads(out.strip().splitlines()[-1])
    assert res["p_value"] == 1.0 and res["delta"] == 0.0
