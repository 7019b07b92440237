"""Decode-metric validation monitoring (TrainConfig.val_metric):
per-epoch greedy-decode BLEU-4/CIDEr-D on the dev split, max-mode
best-checkpoint keying, and direction-aware early stopping."""

import numpy as np
import pytest

from tpucap.checkpoint import CheckpointManager
from tpucap.config import (
    Config,
    DecodeConfig,
    DecoderConfig,
    EncoderConfig,
    TrainConfig,
)
from tpucap.pipeline import CaptioningPipeline
from tpucap.text import Tokenizer


def make_pipe(toy_corpus, **train_kw):
    cfg = Config(
        encoder=EncoderConfig(name="tiny_cnn", feature_dim=128),
        decoder=DecoderConfig(embed_dim=8, hidden_dim=16, dropout_rate=0.0),
        decode=DecodeConfig(max_len=10),
        train=TrainConfig(
            batch_size=8, learning_rate=5e-3, seed=0, **train_kw
        ),
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


def test_val_metric_recorded_and_best_keyed(toy_corpus, rng, tmp_path):
    """History carries val_cider per epoch; a max-keyed manager's
    best_step lands on the best-metric epoch."""
    pipe = make_pipe(toy_corpus, val_metric="cider")
    desc, feats = data(toy_corpus, rng)
    mgr = CheckpointManager(
        str(tmp_path), best_metric="val_cider", best_mode="max"
    )
    hist = pipe.fit(
        desc,
        feats,
        epochs=4,
        log=None,
        val_data=(desc, feats),
        checkpoint_manager=mgr,
    )
    vals = [h["val_cider"] for h in hist]
    assert all(np.isfinite(v) and v >= 0.0 for v in vals)
    assert all("val_loss" in h for h in hist)
    # Steps are 1-indexed after each epoch's single batch. Ties are
    # possible on this tiny fixture (early epochs can emit identical
    # degenerate captions -> equal CIDEr), and orbax's tie-break among
    # equal-best steps is its own; assert the keyed step IS a best one
    # rather than pinning argmax's first-of-ties.
    best = mgr.best_step()
    assert best is not None
    np.testing.assert_allclose(vals[best - 1], max(vals), rtol=1e-12)
    mgr.close()


def test_val_metric_bleu4_on_memorizing_run(toy_corpus, rng):
    """Training to memorization must drive val_bleu4 (on the training
    split as dev) upward from epoch 0 to the end."""
    pipe = make_pipe(toy_corpus, val_metric="bleu4")
    desc, feats = data(toy_corpus, rng)
    hist = pipe.fit(
        desc, feats, epochs=30, log=None, val_data=(desc, feats)
    )
    assert hist[-1]["val_bleu4"] > hist[0]["val_bleu4"]


def test_val_metric_early_stopping_max_direction(toy_corpus, rng):
    """A dev split the model can't caption (features uncorrelated with
    the refs) keeps the decode metric flat at ~0 — max-mode early
    stopping must fire at patience."""
    pipe = make_pipe(
        toy_corpus, val_metric="cider", early_stopping_patience=2
    )
    desc, feats = data(toy_corpus, rng)
    val_desc = {f"v{k}": [toy_corpus[k]] for k in range(4)}
    val_feats = {
        i: np.zeros((128,), np.float32) for i in val_desc
    }
    hist = pipe.fit(
        desc,
        feats,
        epochs=20,
        log=None,
        val_data=(val_desc, val_feats),
    )
    assert len(hist) < 20


def test_val_metric_rejected_on_transformed_layouts(toy_corpus, rng):
    pipe = make_pipe(toy_corpus, val_metric="bleu4")
    desc, feats = data(toy_corpus, rng)
    with pytest.raises(NotImplementedError, match="val_metric"):
        pipe.fit(
            desc,
            feats,
            epochs=1,
            log=None,
            val_data=(desc, feats),
            parallelism="tp",
        )


def test_val_metric_unknown_raises(toy_corpus, rng):
    pipe = make_pipe(toy_corpus, val_metric="rouge")
    desc, feats = data(toy_corpus, rng)
    with pytest.raises(ValueError, match="val_metric"):
        pipe.fit(desc, feats, epochs=1, log=None, val_data=(desc, feats))


def test_cli_val_metric_reaches_config():
    import argparse

    from tpucap.cli.main import (
        _add_common_model_flags,
        _add_optimizer_flags,
        _build_config,
        _monitor_keying,
    )

    p = argparse.ArgumentParser()
    _add_common_model_flags(p)
    _add_optimizer_flags(p)
    args = p.parse_args(["--val-metric", "bleu4"])
    args.max_len = 12
    cfg = _build_config(args)
    assert cfg.train.val_metric == "bleu4"
    assert _monitor_keying(args) == ("val_bleu4", "max")
    args2 = p.parse_args([])
    args2.max_len = 12
    assert _build_config(args2).train.val_metric == "loss"
    assert _monitor_keying(args2) == ("val_loss", "min")


@pytest.mark.parametrize("metric", ["rouge_l", "meteor"])
def test_val_metric_rouge_and_meteor(toy_corpus, rng, metric):
    """The monitor accepts every corpus metric evaluate_captions knows;
    the recorded value is a sane [0, 1] score keyed val_<metric>."""
    pipe = make_pipe(toy_corpus, val_metric=metric)
    desc, feats = data(toy_corpus, rng)
    hist = pipe.fit(
        desc, feats, epochs=2, val_data=(desc, feats), log=None
    )
    key = f"val_{metric}"
    assert key in hist[-1]
    assert 0.0 <= hist[-1][key] <= 1.0
