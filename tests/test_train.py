"""Training-layer tests: masked CE oracle, reference-prefix equivalence,
and end-to-end loss descent on a toy corpus."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from tpucap.models import layers as L
from tpucap.models.decoders import build_decoder
from tpucap.text import Tokenizer, pad_sequences
from tpucap.train import (
    TrainState,
    build_training_batch,
    make_train_step,
)
from tpucap.train.loss import caption_loss, masked_cross_entropy
from tpucap.train.sequences import batch_iterator, build_prefix_samples

VOCAB, FEAT, EMB, HID = 19, 7, 8, 16


def test_masked_ce_numpy_oracle(rng):
    B, T, V = 3, 5, VOCAB
    logits = rng.normal(size=(B, T, V)).astype(np.float32)
    targets = rng.integers(1, V, size=(B, T)).astype(np.int32)
    targets[0, 3:] = 0
    targets[2, 1:] = 0

    loss, metrics = masked_cross_entropy(jnp.asarray(logits), jnp.asarray(targets))

    # numpy oracle
    x = logits - logits.max(-1, keepdims=True)
    logp = x - np.log(np.exp(x).sum(-1, keepdims=True))
    mask = targets != 0
    nll = -np.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    expected = (nll * mask).sum() / mask.sum()
    np.testing.assert_allclose(float(loss), expected, rtol=1e-5)
    assert float(metrics["tokens"]) == mask.sum()


def test_sequence_loss_equals_reference_prefix_loss(toy_corpus):
    """The rebuilt per-timestep loss == the reference's per-prefix-sample CE.

    Reference construction (SURVEY.md §2.1 #5): each caption w1..wn yields
    samples (feat, pre-padded w1..wk) -> w(k+1); total CE = mean over
    samples. Our form: one row per caption, post-padded, masked mean over
    token positions. Same prediction set => equal means.
    """
    tok = Tokenizer()
    tok.fit_on_texts(toy_corpus)
    V = tok.vocab_size
    max_len = max(len(s) for s in tok.texts_to_sequences(toy_corpus))

    dec = build_decoder(
        "lstm1", vocab_size=V, feature_dim=FEAT, embed_dim=EMB, hidden_dim=HID
    )
    params = dec.init(jax.random.key(0))

    ids = [f"img{i}" for i in range(len(toy_corpus))]
    rng = np.random.default_rng(1)
    feats = {i: rng.normal(size=(FEAT,)).astype(np.float32) for i in ids}
    desc = {i: [c] for i, c in zip(ids, toy_corpus)}

    # Our sequence form.
    F, T = build_training_batch(tok, desc, feats, max_len)
    loss_seq, metrics = caption_loss(
        dec, params, jnp.asarray(F), jnp.asarray(T), deterministic=True
    )

    # Reference per-prefix form, evaluated with the masked LSTM forward the
    # parity tests pinned (pre-padded prefix -> last hidden -> merge head).
    Xf, Xs, y = build_prefix_samples(tok, desc, feats, max_len)
    fe = L.dense(params["feat_proj"], jnp.asarray(Xf), jax.nn.relu)
    xs = L.embed(params["embedding"], jnp.asarray(Xs))
    mask = jnp.asarray(Xs != 0)
    h, _ = L.lstm_forward(params["cells"][0], xs, mask=mask)
    merged = L.dense(params["pre_out"], fe + h, jax.nn.relu)
    logits = L.dense(params["out"], merged)  # (N, V)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, jnp.asarray(y)[:, None], axis=-1)[:, 0]
    loss_ref = jnp.mean(nll)

    np.testing.assert_allclose(float(loss_seq), float(loss_ref), rtol=1e-5)


@pytest.mark.parametrize("name", ["lstm1", "inject", "attention"])
def test_training_reduces_loss(name, toy_corpus):
    tok = Tokenizer()
    tok.fit_on_texts(toy_corpus)
    V = tok.vocab_size
    max_len = max(len(s) for s in tok.texts_to_sequences(toy_corpus))

    spatial = name == "attention"
    dec = build_decoder(
        name, vocab_size=V, feature_dim=FEAT, embed_dim=EMB, hidden_dim=HID
    )
    params = dec.init(jax.random.key(0))

    ids = [f"img{i}" for i in range(len(toy_corpus))]
    rng = np.random.default_rng(2)
    shape = (4, FEAT) if spatial else (FEAT,)
    feats = {i: rng.normal(size=shape).astype(np.float32) for i in ids}
    desc = {i: [c] for i, c in zip(ids, toy_corpus)}
    F, T = build_training_batch(tok, desc, feats, max_len)

    optimizer = optax.adam(1e-2)
    state = TrainState.create(params, optimizer, jax.random.key(3))
    step = make_train_step(
        dec,
        optimizer,
        attention_reg=0.1 if spatial else 0.0,
        deterministic=False,
    )

    first = None
    for _ in range(60):
        state, metrics = step(state, jnp.asarray(F), jnp.asarray(T))
        if first is None:
            first = float(metrics["loss"])
    last = float(metrics["loss"])
    assert last < first * 0.7, (first, last)


def test_batch_iterator_shapes():
    a = np.arange(10)
    b = np.arange(20).reshape(10, 2)
    batches = list(batch_iterator((a, b), 4))
    assert len(batches) == 2
    for xa, xb in batches:
        assert xa.shape == (4,)
        assert xb.shape == (4, 2)


def test_prefix_samples_layout(toy_corpus):
    tok = Tokenizer()
    tok.fit_on_texts(toy_corpus)
    desc = {"a": [toy_corpus[0]]}
    feats = {"a": np.zeros((FEAT,), np.float32)}
    seq = tok.texts_to_sequences([toy_corpus[0]])[0]
    Xf, Xs, y = build_prefix_samples(tok, desc, feats, max_len=20)
    assert Xf.shape[0] == len(seq) - 1
    # Pre-padding: first sample is [0...0, w1] -> w2.
    np.testing.assert_array_equal(Xs[0, :-1], 0)
    assert Xs[0, -1] == seq[0]
    assert y[0] == seq[1]


def test_early_stopping_patience(tmp_path):
    """TrainConfig.early_stopping_patience halts fit when val_loss stops
    improving (Keras EarlyStopping semantics); disabled by default."""
    import numpy as np

    from tpucap.config import (
        Config,
        DecodeConfig,
        DecoderConfig,
        EncoderConfig,
        TrainConfig,
    )
    from tpucap.pipeline import CaptioningPipeline
    from tpucap.text import Tokenizer

    corpus = [
        "startseq a dog runs endseq",
        "startseq a man rides endseq",
    ]
    cfg = Config(
        encoder=EncoderConfig(name="tiny_cnn", feature_dim=128),
        decoder=DecoderConfig(embed_dim=8, hidden_dim=16, dropout_rate=0.0),
        decode=DecodeConfig(max_len=10),
        # Huge LR so val_loss diverges fast -> patience trips early.
        train=TrainConfig(
            batch_size=4, learning_rate=5.0, seed=0,
            early_stopping_patience=2,
        ),
    )
    tok = Tokenizer()
    tok.fit_on_texts(corpus)
    pipe = CaptioningPipeline(cfg, tokenizer=tok)
    pipe.build()
    rng = np.random.default_rng(0)
    ids = [f"i{k}" for k in range(4)]
    desc = {i: [corpus[k % 2]] for k, i in enumerate(ids)}
    feats = {i: rng.normal(size=(128,)).astype(np.float32) for i in ids}
    history = pipe.fit(
        desc, feats, epochs=30, val_data=(desc, feats), log=None
    )
    assert len(history) < 30, "early stopping never triggered"

    # Without val_data the patience setting is inert (nothing to monitor).
    pipe2 = CaptioningPipeline(cfg, tokenizer=tok)
    pipe2.build()
    h2 = pipe2.fit(desc, feats, epochs=3, log=None)
    assert len(h2) == 3


def test_fit_clamps_batch_size_to_tiny_dataset():
    """A dataset smaller than batch_size must still train (the
    drop-remainder iterator would otherwise run ZERO steps per epoch and
    crash at checkpoint time with no 'loss' metric)."""
    import numpy as np

    from tpucap.config import (
        Config,
        DecodeConfig,
        DecoderConfig,
        EncoderConfig,
        TrainConfig,
    )
    from tpucap.pipeline import CaptioningPipeline
    from tpucap.text import Tokenizer

    corpus = ["startseq a dog runs endseq", "startseq a man rides endseq"]
    cfg = Config(
        encoder=EncoderConfig(name="tiny_cnn", feature_dim=128),
        decoder=DecoderConfig(embed_dim=8, hidden_dim=16, dropout_rate=0.0),
        decode=DecodeConfig(max_len=10),
        train=TrainConfig(batch_size=64, learning_rate=1e-2, seed=0),
    )
    tok = Tokenizer()
    tok.fit_on_texts(corpus)
    pipe = CaptioningPipeline(cfg, tokenizer=tok)
    pipe.build()
    rng = np.random.default_rng(0)
    ids = ["a", "b"]
    desc = {i: [corpus[k]] for k, i in enumerate(ids)}
    feats = {i: rng.normal(size=(128,)).astype(np.float32) for i in ids}
    history = pipe.fit(desc, feats, epochs=2, log=None)  # 2 rows << 64
    assert len(history) == 2
    assert np.isfinite(history[-1]["loss"]) and history[-1]["loss"] > 0


def test_chunked_val_loss_is_exact(toy_corpus):
    """Sum-form chunked evaluation (what fit uses for val_loss, so a big
    dev split never materializes (N, T, V) logits in one program) equals
    the unbatched loss exactly — including zero-padded tail rows."""
    import jax.numpy as jnp
    import numpy as np

    from tpucap.models.decoders import build_decoder
    from tpucap.text import Tokenizer
    from tpucap.train.loop import make_eval_step, make_eval_sums_step
    from tpucap.train.loss import loss_from_sums
    from tpucap.train.sequences import build_training_batch

    tok = Tokenizer()
    tok.fit_on_texts(toy_corpus)
    ids = [f"i{k}" for k in range(len(toy_corpus))]
    desc = {i: [c] for i, c in zip(ids, toy_corpus)}
    rng = np.random.default_rng(1)
    feats = {i: rng.normal(size=(32,)).astype(np.float32) for i in ids}
    F, T = build_training_batch(tok, desc, feats, 12)

    dec = build_decoder(
        "lstm1", vocab_size=tok.vocab_size, feature_dim=32,
        embed_dim=8, hidden_dim=16,
    )
    params = dec.init(jax.random.key(0))

    whole = make_eval_step(dec, pad_id=0)(params, jnp.asarray(F), jnp.asarray(T))

    chunk = 3  # 8 rows -> chunks of 3, 3, 2 (tail zero-padded to 3)
    sums_step = make_eval_sums_step(dec, pad_id=0)
    totals: dict = {}
    for s in range(0, F.shape[0], chunk):
        cf, ct = F[s : s + chunk], T[s : s + chunk]
        pad = chunk - cf.shape[0]
        if pad:
            cf = np.concatenate([cf, np.zeros((pad,) + cf.shape[1:], cf.dtype)])
            ct = np.concatenate([ct, np.zeros((pad,) + ct.shape[1:], ct.dtype)])
        piece = sums_step(params, jnp.asarray(cf), jnp.asarray(ct))
        for k, v in piece.items():
            totals[k] = totals.get(k, 0.0) + v
    _, chunked = loss_from_sums(jax.device_get(totals))

    np.testing.assert_allclose(
        float(chunked["loss"]), float(whole["loss"]), rtol=1e-6
    )
    np.testing.assert_allclose(
        float(chunked["accuracy"]), float(whole["accuracy"]), rtol=1e-6
    )


def test_label_smoothing_matches_keras():
    """Smoothed CE uses Keras's y*(1-ls)+ls/V convention — differential
    vs tf_keras CategoricalCrossentropy on identical logits."""
    import numpy as np

    from tpucap.train.loss import masked_cross_entropy_sums

    tf = pytest.importorskip("tensorflow")
    tf_keras = pytest.importorskip("tf_keras")

    rng = np.random.default_rng(0)
    B, T, V = 2, 5, 11
    logits = rng.normal(size=(B, T, V)).astype(np.float32)
    targets = rng.integers(1, V, size=(B, T)).astype(np.int32)  # no pad
    ls = 0.1

    nll_sum, n_tok, _ = masked_cross_entropy_sums(
        logits, targets, label_smoothing=ls
    )
    ours = float(nll_sum) / float(n_tok)

    cce = tf_keras.losses.CategoricalCrossentropy(
        from_logits=True, label_smoothing=ls
    )
    onehot = tf.one_hot(targets.reshape(-1), V)
    theirs = float(cce(onehot, logits.reshape(-1, V)).numpy())
    np.testing.assert_allclose(ours, theirs, rtol=1e-5)


def test_build_training_batch_truncation_keeps_endseq(toy_corpus):
    """Captions longer than max_len+1 keep their endseq as the final kept
    token instead of training the model to never terminate."""
    import numpy as np

    from tpucap.text import Tokenizer
    from tpucap.text.clean import END_TOKEN
    from tpucap.train.sequences import build_training_batch

    tok = Tokenizer()
    tok.fit_on_texts(toy_corpus)
    end_id = tok.word_index[END_TOKEN]
    long_cap = "startseq " + "a dog runs " * 10 + "endseq"
    desc = {"img0": [long_cap]}
    feats = {"img0": np.zeros((4,), np.float32)}
    F, T = build_training_batch(tok, desc, feats, max_len=8)
    assert T.shape == (1, 9)
    assert T[0, -1] == end_id
    assert (T[0] != 0).all()  # fully packed row, sentinel last


def test_sample_decode_rejects_bad_params():
    import jax

    from tpucap.decode import sample_decode
    from tpucap.models.decoders import build_decoder

    dec = build_decoder(
        "lstm1", vocab_size=16, feature_dim=8, embed_dim=4, hidden_dim=8
    )
    params = dec.init(jax.random.key(0))
    feats = jax.numpy.zeros((2, 8))
    state = dec.init_state(params, feats)
    kw = dict(rng=jax.random.key(1), start_id=1, end_id=2, max_len=6)
    with pytest.raises(ValueError, match="temperature"):
        sample_decode(dec.step, params, state, temperature=0.0, **kw)
    with pytest.raises(ValueError, match="top_k"):
        sample_decode(dec.step, params, state, top_k=0, **kw)


class TestBuildOptimizer:
    """train/loop.py::build_optimizer — the Keras compile(optimizer=...)
    surface. The all-defaults path must stay bit-compatible with round-1
    checkpoints (plain optax.adam, no chain wrapper)."""

    def _grads_params(self, rng):
        import jax.numpy as jnp

        params = {"w": jnp.asarray(rng.normal(size=(4, 4)), jnp.float32)}
        grads = {"w": jnp.asarray(rng.normal(size=(4, 4)), jnp.float32)}
        return params, grads

    def test_defaults_are_plain_adam(self, rng):
        import jax
        import optax

        from tpucap.config import TrainConfig
        from tpucap.train import build_optimizer

        params, grads = self._grads_params(rng)
        opt = build_optimizer(TrainConfig(), total_steps=100)
        ref = optax.adam(1e-3)
        # identical opt_state STRUCTURE (checkpoint compatibility) ...
        assert jax.tree_util.tree_structure(
            opt.init(params)
        ) == jax.tree_util.tree_structure(ref.init(params))
        # ... and identical updates.
        u1, _ = opt.update(grads, opt.init(params), params)
        u2, _ = ref.update(grads, ref.init(params), params)
        np.testing.assert_array_equal(
            np.asarray(u1["w"]), np.asarray(u2["w"])
        )

    def test_grad_clip_bounds_update(self, rng):
        import jax.numpy as jnp
        import optax

        from tpucap.config import TrainConfig
        from tpucap.train import build_optimizer

        params, _ = self._grads_params(rng)
        huge = {"w": jnp.full((4, 4), 1e6, jnp.float32)}
        opt = build_optimizer(
            TrainConfig(optimizer="sgd", grad_clip_norm=1.0)
        )
        u, _ = opt.update(huge, opt.init(params), params)
        # sgd(lr) on a norm-1 gradient: update norm == lr.
        assert float(optax.global_norm(u)) == pytest.approx(1e-3, rel=1e-4)

    def test_cosine_schedule_decays_lr(self, rng):
        import jax.numpy as jnp
        import optax

        from tpucap.config import TrainConfig
        from tpucap.train import build_optimizer

        params, grads = self._grads_params(rng)
        opt = build_optimizer(
            TrainConfig(optimizer="sgd", lr_schedule="cosine"),
            total_steps=10,
        )
        state = opt.init(params)
        norms = []
        for _ in range(10):
            u, state = opt.update(grads, state, params)
            norms.append(float(optax.global_norm(u)))
        assert norms[-1] < norms[0] * 0.1  # cosine -> ~0 at horizon

    def test_every_optimizer_choice_builds_and_steps(self, rng):
        import optax

        from tpucap.config import TrainConfig
        from tpucap.train import build_optimizer

        params, grads = self._grads_params(rng)
        for name in ("adam", "adamw", "sgd", "rmsprop", "adagrad"):
            opt = build_optimizer(
                TrainConfig(
                    optimizer=name,
                    momentum=0.9,
                    weight_decay=1e-4,
                    warmup_steps=2,
                ),
                total_steps=10,
            )
            u, _ = opt.update(grads, opt.init(params), params)
            assert np.isfinite(float(optax.global_norm(u))), name

    def test_unknown_choices_raise(self):
        from tpucap.config import TrainConfig
        from tpucap.train import build_optimizer

        with pytest.raises(ValueError, match="unknown optimizer"):
            build_optimizer(TrainConfig(optimizer="lion"))
        with pytest.raises(ValueError, match="unknown lr_schedule"):
            build_optimizer(TrainConfig(lr_schedule="linear"))

    def test_fit_trains_with_nondefault_optimizer(self, toy_corpus, rng):
        """Integration: sgd + cosine + clipping through pipeline.fit
        reduces the loss on the fixture corpus."""
        import dataclasses

        from tpucap.config import (
            Config,
            DecodeConfig,
            DecoderConfig,
            EncoderConfig,
            TrainConfig,
        )
        from tpucap.pipeline import CaptioningPipeline

        cfg = Config(
            encoder=EncoderConfig(name="tiny_cnn", feature_dim=32),
            decoder=DecoderConfig(embed_dim=8, hidden_dim=16,
                                  dropout_rate=0.0),
            decode=DecodeConfig(max_len=10),
            train=TrainConfig(
                batch_size=8,
                epochs=8,
                learning_rate=0.1,
                optimizer="sgd",
                momentum=0.9,
                lr_schedule="cosine",
                grad_clip_norm=5.0,
            ),
        )
        pipe = CaptioningPipeline(cfg)
        desc = {f"im{i}": [toy_corpus[i % len(toy_corpus)]]
                for i in range(8)}
        feats = {k: rng.normal(size=(32,)).astype(np.float32)
                 for k in desc}
        pipe.fit_tokenizer(desc)
        pipe.build()
        hist = pipe.fit(desc, feats, log=None)
        losses = [h["loss"] for h in hist]
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0]  # cosine lr -> modest but real drop
