"""CIDEr-D and ROUGE-L (tpucap/train/metrics.py): hand-computed values,
the coco-caption conventions (count clipping, Gaussian length penalty,
separate max-P/max-R over references), and the evaluate_captions
plumbing."""

import math

import numpy as np
import pytest

from tpucap.train.evaluate import evaluate_captions
from tpucap.train.metrics import _lcs_len, cider_d, rouge_l


class TestCider:
    def test_perfect_match_hand_value(self):
        """2 images, single 2-token refs, candidates identical: unigram
        and bigram cosines are 1, tri/4-gram vectors empty -> per-image
        score = mean([1,1,0,0]) * 10 = 5.0 exactly."""
        refs = [[["a", "b"]], [["c", "d"]]]
        hyps = [["a", "b"], ["c", "d"]]
        assert cider_d(refs, hyps) == pytest.approx(5.0, abs=1e-12)

    def test_perfect_match_long_captions(self):
        """>=4-token identical captions: all four n-gram cosines are 1
        and the length penalty is 1 -> exactly 10.0."""
        refs = [
            [["a", "b", "c", "d", "e"]],
            [["f", "g", "h", "i"]],
        ]
        hyps = [["a", "b", "c", "d", "e"], ["f", "g", "h", "i"]]
        assert cider_d(refs, hyps) == pytest.approx(10.0, abs=1e-12)

    def test_idf_discounts_corpus_wide_ngrams(self):
        """A unigram appearing in EVERY image's refs has DF = N -> IDF
        log(N/N) = 0: matching only it scores 0."""
        refs = [[["the", "dog"]], [["the", "cat"]]]
        hyps = [["the"], ["the"]]
        assert cider_d(refs, hyps) == pytest.approx(0.0, abs=1e-12)

    def test_count_clipping_blocks_repetition_gaming(self):
        """Repeating a high-IDF word must not raise the score: the
        candidate's count is clipped at the reference's."""
        refs = [[["dog", "runs", "fast"]], [["cat", "sits", "still"]]]
        honest = cider_d(refs, [["dog", "runs", "fast"], ["cat"]])
        gamed = cider_d(
            refs, [["dog", "runs", "fast"], ["cat", "cat", "cat"]]
        )
        assert gamed < honest

    def test_length_penalty(self):
        """Same n-gram overlap, increasingly wrong length -> the
        Gaussian penalty exp(-delta^2/72) bites."""
        refs = [[["a", "b", "c", "d"]], [["w", "x", "y", "z"]]]
        exact = cider_d(refs, [["a", "b", "c", "d"], ["w", "x", "y", "z"]])
        padded = cider_d(
            refs,
            [["a", "b", "c", "d", "q", "q"], ["w", "x", "y", "z"]],
        )
        assert padded < exact
        # The penalty factor on image 1 (delta=2): exp(-4/72); its n-gram
        # cosines also drop (extra q n-grams in the candidate norm).
        assert padded > 0.0

    def test_shape_errors(self):
        with pytest.raises(ValueError, match="reference sets"):
            cider_d([[["a"]]], [])
        with pytest.raises(ValueError, match="empty"):
            cider_d([], [])


class TestRougeL:
    def test_lcs(self):
        assert _lcs_len(list("abcd"), list("abcd")) == 4
        assert _lcs_len(list("ac"), list("abcd")) == 2
        assert _lcs_len(list("axbycz"), list("abc")) == 3
        assert _lcs_len([], list("abc")) == 0

    def test_hand_value(self):
        """ref 'a b c d', hyp 'a c': LCS 2 -> P=1, R=1/2,
        F = (1+1.44)*1*0.5 / (0.5 + 1.44*1) = 1.22/1.94."""
        got = rouge_l([[["a", "b", "c", "d"]]], [["a", "c"]])
        assert got == pytest.approx(1.22 / 1.94, abs=1e-12)

    def test_perfect_and_disjoint(self):
        assert rouge_l([[["a", "b"]]], [["a", "b"]]) == 1.0
        assert rouge_l([[["a", "b"]]], [["x", "y"]]) == 0.0

    def test_max_p_and_max_r_taken_separately(self):
        """coco-caption convention: prec_max and rec_max come from
        DIFFERENT references when that helps — here ref1 gives R=1,
        ref2 gives P=1, so F=1 even though no single ref matches."""
        refs = [[["a"], ["a", "b", "c", "d"]]]
        assert rouge_l(refs, [["a", "b"]]) == pytest.approx(1.0)

    def test_corpus_mean(self):
        one = rouge_l([[["a", "b", "c", "d"]]], [["a", "c"]])
        mixed = rouge_l(
            [[["a", "b", "c", "d"]], [["x", "y"]]],
            [["a", "c"], ["x", "y"]],
        )
        assert mixed == pytest.approx((one + 1.0) / 2.0, abs=1e-12)


def test_evaluate_captions_metrics_plumbing():
    desc = {
        "i1": ["startseq a dog runs endseq"],
        "i2": ["startseq the cat sits endseq"],
    }
    generated = {
        "i1": "a dog runs",
        "i2": "the cat sits",
    }
    scores = evaluate_captions(
        desc, generated, metrics=("bleu", "cider", "rouge_l")
    )
    assert set(scores) == {
        "bleu1", "bleu2", "bleu3", "bleu4", "cider", "rouge_l",
    }
    assert scores["rouge_l"] == pytest.approx(1.0)
    assert scores["cider"] > 5.0  # identical 3-token captions
    # default stays reference-parity BLEU only
    assert set(evaluate_captions(desc, generated)) == {
        "bleu1", "bleu2", "bleu3", "bleu4",
    }
    with pytest.raises(ValueError, match="unknown metrics"):
        evaluate_captions(desc, generated, metrics=("bleu", "spice"))


def test_pipeline_evaluate_metrics(toy_corpus, rng):
    from tpucap.config import (
        Config,
        DecodeConfig,
        DecoderConfig,
        EncoderConfig,
    )
    from tpucap.pipeline import CaptioningPipeline
    from tpucap.text import Tokenizer

    cfg = Config(
        encoder=EncoderConfig(name="tiny_cnn", feature_dim=32),
        decoder=DecoderConfig(embed_dim=8, hidden_dim=16, dropout_rate=0.0),
        decode=DecodeConfig(max_len=8),
        precision="f32",
    )
    pipe = CaptioningPipeline(cfg)
    tok = Tokenizer()
    tok.fit_on_texts(toy_corpus)
    pipe.tokenizer = tok
    pipe.build()
    desc = {f"i{k}": [toy_corpus[k % len(toy_corpus)]] for k in range(4)}
    feats = {i: rng.normal(size=(32,)).astype(np.float32) for i in desc}
    scores = pipe.evaluate(
        desc, feats, batch_size=4, metrics=("bleu", "cider", "rouge_l")
    )
    assert "cider" in scores and "rouge_l" in scores
    assert 0.0 <= scores["rouge_l"] <= 1.0
    assert scores["cider"] >= 0.0


class TestMeteor:
    def test_identical_near_one(self):
        from tpucap.train.metrics import meteor

        refs = [[["a", "dog", "runs", "fast"]]]
        hyps = [["a", "dog", "runs", "fast"]]
        # m=4, P=R=1, F=1, chunks=1 -> penalty 0.5*(1/4)^3 = 1/128.
        assert meteor(refs, hyps) == pytest.approx(1 - 1 / 128, abs=1e-9)

    def test_stem_stage_matches_inflections(self):
        """'running' aligns to 'runs' through the Porter stem stage —
        the score equals the identical-sentence score."""
        from tpucap.train.metrics import meteor

        refs = [[["a", "dog", "runs", "fast"]]]
        exact = meteor(refs, [["a", "dog", "runs", "fast"]])
        stemmed = meteor(refs, [["a", "dog", "running", "fast"]])
        assert stemmed == pytest.approx(exact, abs=1e-9)

    def test_orders_hypotheses_sanely(self):
        from tpucap.train.metrics import meteor

        refs = [[["the", "dog", "runs", "on", "grass"]]]
        good = meteor(refs, [["the", "dog", "runs", "on", "grass"]])
        ok = meteor(refs, [["the", "dog", "runs"]])
        bad = meteor(refs, [["purple", "elephants"]])
        assert good > ok > bad == 0.0

    def test_max_over_references(self):
        from tpucap.train.metrics import meteor

        refs = [[["x", "y", "z"], ["the", "dog", "runs"]]]
        hyp = [["the", "dog", "runs"]]
        solo = meteor([[["the", "dog", "runs"]]], hyp)
        assert meteor(refs, hyp) == pytest.approx(solo, abs=1e-9)

    def test_shape_errors(self):
        from tpucap.train.metrics import meteor

        with pytest.raises(ValueError):
            meteor([], [])
        with pytest.raises(ValueError):
            meteor([[["a"]]], [])

    def test_evaluate_captions_plumbs_meteor(self):
        desc = {"i1": ["startseq a dog runs endseq"]}
        gen = {"i1": "a dog runs"}
        out = evaluate_captions(
            desc, gen, metrics=("bleu", "meteor")
        )
        assert "meteor" in out and 0.0 < out["meteor"] <= 1.0
        with pytest.raises(ValueError, match="unknown metrics"):
            evaluate_captions(desc, gen, metrics=("spice",))

    def test_synonym_stage_from_fixture_file(self):
        """With the bundled synonym fixture, 'canine' aligns to 'dog'
        through the synonym stage — scoring exactly like the identical
        sentence — while the no-synonyms default stays the exact+stem
        lower bound."""
        import os

        from tpucap.train.metrics import SynonymTable, meteor

        path = os.path.join(
            os.path.dirname(__file__), "fixtures", "synonyms.txt"
        )
        refs = [[["a", "dog", "runs", "fast"]]]
        hyp = [["a", "canine", "runs", "fast"]]
        exact = meteor(refs, [["a", "dog", "runs", "fast"]])
        assert meteor(refs, hyp, synonyms=path) == pytest.approx(
            exact, abs=1e-9
        )
        assert meteor(refs, hyp) < exact  # lower bound without it
        # Mapping form, symmetry (group membership is enough), and
        # comment/comma parsing in the fixture.
        table = SynonymTable.from_file(path)
        assert table.synsets("sprints")  # comma-separated group
        assert not table.synsets("lonelyword")  # 1-word group dropped
        assert not table.synsets("zebra")
        assert meteor(
            refs, hyp, synonyms={"dog": ["canine"]}
        ) == pytest.approx(exact, abs=1e-9)

    def test_synonym_stage_plumbs_through_evaluate(self):
        desc = {"i1": ["startseq a dog runs endseq"]}
        gen = {"i1": "a canine runs"}
        plain = evaluate_captions(desc, gen, metrics=("meteor",))
        syn = evaluate_captions(
            desc,
            gen,
            metrics=("meteor",),
            meteor_synonyms={"dog": ["canine"]},
        )
        assert syn["meteor"] > plain["meteor"]


class TestCaptionStats:
    def test_hand_values(self):
        from tpucap.train.metrics import caption_stats

        hyps = [
            ["a", "dog", "runs"],
            ["a", "cat", "sits"],
        ]
        s = caption_stats(hyps)
        # unigrams: 6 total, 5 unique ("a" repeats).
        assert s["distinct_1"] == pytest.approx(5 / 6)
        # bigrams: 4 total, all unique.
        assert s["distinct_2"] == pytest.approx(1.0)
        assert s["vocab_used"] == 5.0
        assert s["unique_captions"] == 1.0
        assert s["mean_len"] == 3.0

    def test_mode_collapse_is_visible(self):
        """The failure mode these metrics exist for: identical captions
        for every image crater distinct-n and unique_captions while an
        overlap metric could stay flat."""
        from tpucap.train.metrics import caption_stats

        collapsed = caption_stats([["a", "dog", "runs"]] * 10)
        diverse = caption_stats(
            [["a", "dog", "runs"], ["two", "cats", "sit"],
             ["the", "bird", "flies"]]
        )
        assert collapsed["unique_captions"] == 0.0
        assert diverse["unique_captions"] == 1.0
        assert collapsed["distinct_1"] < diverse["distinct_1"]
        assert collapsed["vocab_used"] < diverse["vocab_used"]

    def test_duplicate_pair_counts_neither(self):
        from tpucap.train.metrics import caption_stats

        s = caption_stats([["a"], ["a"], ["b"]])
        assert s["unique_captions"] == pytest.approx(1 / 3)

    def test_zero_bigrams_is_undefined_not_collapse(self):
        """All-single-word captions have NO bigrams: distinct_2 must be
        None (undefined), not 0.0 (which reads as maximal mode
        collapse)."""
        from tpucap.train.metrics import caption_stats

        s = caption_stats([["a"], ["b"], ["c"]])
        assert s["distinct_2"] is None
        assert s["distinct_1"] == pytest.approx(1.0)

    def test_empty_corpus_raises(self):
        from tpucap.train.metrics import caption_stats

        with pytest.raises(ValueError):
            caption_stats([])

    def test_evaluate_captions_plumbs_diversity(self):
        desc = {
            "i1": ["startseq a dog runs endseq"],
            "i2": ["startseq a cat sits endseq"],
        }
        gen = {"i1": "a dog runs", "i2": "a cat sits"}
        out = evaluate_captions(desc, gen, metrics=("bleu", "diversity"))
        assert out["distinct_1"] == pytest.approx(5 / 6)
        assert out["unique_captions"] == 1.0
        assert "bleu4" in out  # composes with the parity default
