"""Banned-word (blocklist) decoding: DecodeConfig.bad_words excludes
words from the candidate vocabulary at every step of every engine —
greedy, beam, sampling, diverse, the TP vocab-sharded scorer, and the
continuous serving engines — selection-only (scores stay true
log-probs). Also pins the newly-plumbed min_len on the continuous
engines and the dp-path min_len/length_penalty kwargs.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpucap.config import (
    Config,
    DecodeConfig,
    DecoderConfig,
    EncoderConfig,
    MeshConfig,
)
from tpucap.pipeline import CaptioningPipeline
from tpucap.text import Tokenizer

FEAT = 32


def make_pipe(toy_corpus, **decode_overrides):
    cfg = Config(
        encoder=EncoderConfig(name="tiny_cnn", feature_dim=FEAT),
        decoder=DecoderConfig(embed_dim=16, hidden_dim=32, dropout_rate=0.0),
        decode=DecodeConfig(max_len=10, **decode_overrides),
        mesh=MeshConfig(),
    )
    pipe = CaptioningPipeline(cfg)
    tok = Tokenizer()
    tok.fit_on_texts(toy_corpus)
    pipe.tokenizer = tok
    pipe.build()
    return pipe


def reban(pipe, words, **decode_overrides):
    """Same params/tokenizer, a new frozen config with bad_words set."""
    cfg = dataclasses.replace(
        pipe.config,
        decode=dataclasses.replace(
            pipe.config.decode, bad_words=tuple(words), **decode_overrides
        ),
    )
    out = CaptioningPipeline(cfg, tokenizer=pipe.tokenizer)
    out.decoder = pipe.decoder
    out.params = pipe.params
    return out


@pytest.fixture(scope="module")
def pipe(toy_corpus):
    return make_pipe(toy_corpus)


@pytest.fixture(scope="module")
def feats(rng_module):
    return rng_module.normal(size=(4, FEAT)).astype(np.float32)


@pytest.fixture(scope="module")
def rng_module():
    return np.random.default_rng(0)


def first_words(captions):
    return {c.split()[0] for c in captions if c.split()}


@pytest.mark.parametrize("method", ["greedy", "beam"])
def test_banned_word_never_generated(pipe, feats, method):
    base = pipe.generate(feats, method=method)
    target = sorted(first_words(base))[0]
    banned = reban(pipe, [target])
    out = banned.generate(feats, method=method)
    for cap in out:
        assert target not in cap.split()
    # The blocklist actually bit: at least one caption changed.
    assert out != base


def test_banned_ids_are_sorted_lowercased_and_oov_dropped(pipe):
    known = next(iter(pipe.tokenizer.word_index))
    p = reban(pipe, [known.upper(), "zzzunknownzzz", known])
    assert p._banned_ids() == (pipe.tokenizer.word_index[known],)
    # OOV-only blocklists are a no-op, not an error.
    assert reban(pipe, ["zzzunknownzzz"])._banned_ids() == ()


def test_blocklist_entries_normalize_like_captions(pipe):
    """Review-found bug: entries were only lowercased, so 'Damn!' or a
    two-word line was silently dropped while the vocabulary word it
    contains kept being generated. Entries now run through the same
    filter/split pipeline captions did."""
    words = sorted(pipe.tokenizer.word_index)
    w1, w2 = words[0], words[1]
    p = reban(pipe, [f"{w1.upper()}!", f"  {w1},{w2} "])
    assert p._banned_ids() == tuple(
        sorted({pipe.tokenizer.word_index[w1], pipe.tokenizer.word_index[w2]})
    )


def test_oov_blocklist_is_identity(pipe, feats):
    assert reban(pipe, ["zzzunknownzzz"]).generate(feats) == pipe.generate(
        feats
    )


def test_scores_stay_true_logprobs(pipe, feats):
    """Selection-only contract: banned captions' scores are finite
    full-softmax log-probs (never -inf from the mask)."""
    target = sorted(first_words(pipe.generate(feats)))[0]
    banned = reban(pipe, [target])
    fn = banned._decode_fn("greedy", 1)
    res = fn(
        banned._inference_params()["decoder"],
        jnp.asarray(feats),
    )
    scores = np.asarray(res.scores)
    assert np.all(np.isfinite(scores)) and np.all(scores < 0)


def test_sampling_never_emits_banned(pipe, feats):
    base = pipe.generate(feats, method="sample", temperature=1.5, seed=7)
    words = sorted({w for c in base for w in c.split()})
    target = words[0]
    out = reban(pipe, [target]).generate(
        feats, method="sample", temperature=1.5, seed=7
    )
    for cap in out:
        assert target not in cap.split()


def test_diverse_never_emits_banned(pipe, feats):
    base = pipe.generate_diverse(feats, num_groups=2, group_width=2)
    target = sorted(
        {w for groups in base for c, _ in groups for w in c.split()}
    )[0]
    out = reban(pipe, [target]).generate_diverse(
        feats, num_groups=2, group_width=2
    )
    for groups in out:
        for c, _ in groups:
            assert target not in c.split()


def test_speculative_guard(pipe, feats):
    banned = reban(pipe, [next(iter(pipe.tokenizer.word_index))])
    with pytest.raises(NotImplementedError, match="bad_words"):
        banned.generate_speculative(feats, draft=(pipe.decoder, {}))


class TestParallel:
    def test_dp_banned_matches_single_device(self, pipe, feats):
        target = sorted(first_words(pipe.generate(feats, method="beam")))[0]
        banned = reban(pipe, [target])
        want = banned.generate(feats, method="beam")
        got = banned.generate(feats, method="beam", parallelism="dp")
        assert got == want

    def test_dp_min_len_and_gnmt_reach_engine(self, pipe, feats):
        """Regression: the dp kwargs dropped min_len and length_penalty
        entirely — dp-sharded decode silently ignored both knobs."""
        cfgd = dict(min_len=4, length_penalty="gnmt", alpha=2.0)
        single = reban(pipe, [], **cfgd)
        sharded = reban(pipe, [], **cfgd)
        want = single.generate(feats, method="beam")
        got = sharded.generate(feats, method="beam", parallelism="dp")
        assert got == want
        # And the floor is real: every caption has >= 4 words.
        assert all(len(c.split()) >= 4 for c in want)

    def test_tp_banned_matches_single_device(self, pipe, feats):
        target = sorted(first_words(pipe.generate(feats, method="beam")))[0]
        banned = reban(pipe, [target])
        want = banned.generate(feats, method="beam")
        got = banned.generate(feats, method="beam", parallelism="tp")
        assert got == want
        for cap in got:
            assert target not in cap.split()


class TestContinuous:
    def test_continuous_greedy_banned_and_min_len(self, pipe, feats):
        from tpucap.serve import ContinuousCaptionServer

        target = sorted(first_words(pipe.generate(feats)))[0]
        banned = reban(pipe, [target], min_len=3)
        want = banned.generate(feats)
        srv = ContinuousCaptionServer(banned, slots=2, ticks_per_sync=2)
        try:
            futs = [srv.submit(f) for f in feats]
            got = [f.result(timeout=300) for f in futs]
        finally:
            srv.close()
        assert got == want
        assert all(
            target not in c.split() and len(c.split()) >= 3 for c in got
        )

    def test_continuous_beam_banned_and_min_len(self, pipe, feats):
        from tpucap.serve import ContinuousCaptionServer

        target = sorted(first_words(pipe.generate(feats, method="beam")))[0]
        banned = reban(pipe, [target], min_len=3)
        want = banned.generate(feats, method="beam")
        srv = ContinuousCaptionServer(
            banned, slots=2, beam_width=3, ticks_per_sync=2
        )
        try:
            futs = [srv.submit(f) for f in feats]
            got = [f.result(timeout=300) for f in futs]
        finally:
            srv.close()
        assert got == want
        assert all(
            target not in c.split() and len(c.split()) >= 3 for c in got
        )
