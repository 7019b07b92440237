"""Self-critical sequence training (tpucap.train.scst): per-sentence
CiderDScorer consistency with the corpus metric, the hand-checked
policy-gradient loss, the REINFORCE direction property, and the
pipeline.fit_scst surface."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from tpucap.config import (
    Config,
    DecodeConfig,
    DecoderConfig,
    EncoderConfig,
    TrainConfig,
)
from tpucap.models.decoders import MergeDecoder
from tpucap.pipeline import CaptioningPipeline
from tpucap.text import Tokenizer
from tpucap.train import TrainState, make_scst_rollout, make_scst_step
from tpucap.train.metrics import CiderDScorer, cider_d
from tpucap.train.scst import scst_loss

FEAT, EMBED, HID = 16, 8, 16


def tiny_decoder(vocab=11, seed=0):
    dec = MergeDecoder(
        vocab_size=vocab,
        feature_dim=FEAT,
        embed_dim=EMBED,
        hidden_dim=HID,
        dropout_rate=0.0,
    )
    return dec, dec.init(jax.random.key(seed))


# -- scorer -------------------------------------------------------------------


def test_cider_scorer_matches_corpus_metric(toy_corpus):
    refs = [[c.split()[1:-1]] for c in toy_corpus]  # strip sentinels
    hyps = [c.split()[1:-1][:4] for c in toy_corpus]
    scorer = CiderDScorer(refs)
    per_image = [scorer.score(r, h) for r, h in zip(refs, hyps)]
    np.testing.assert_allclose(
        np.mean(per_image), cider_d(refs, hyps), rtol=1e-12
    )


def test_cider_scorer_perfect_match_beats_mismatch(toy_corpus):
    refs = [[c.split()[1:-1]] for c in toy_corpus]
    scorer = CiderDScorer(refs)
    exact = scorer.score(refs[0], refs[0][0])
    wrong = scorer.score(refs[0], refs[3][0])
    assert exact > wrong >= 0.0


# -- loss ---------------------------------------------------------------------


def test_scst_loss_hand_value(rng):
    """Loss == -(1/Ntok) sum_b adv_b * sum_t logp(sampled_bt) computed
    by hand from the same forward."""
    dec, params = tiny_decoder()
    B, T = 3, 5
    feats = jnp.asarray(rng.normal(size=(B, FEAT)), jnp.float32)
    sampled = jnp.asarray(
        [[4, 5, 2, 0, 0], [3, 3, 3, 3, 2], [7, 2, 0, 0, 0]], jnp.int32
    )
    adv = jnp.asarray([0.5, -1.0, 2.0], jnp.float32)
    loss, metrics = scst_loss(
        dec, params, feats, sampled, adv, start_id=1
    )

    inputs = jnp.concatenate(
        [jnp.full((B, 1), 1, jnp.int32), sampled[:, :-1]], axis=1
    )
    logits = dec.forward_train(params, feats, inputs, deterministic=True)
    logp = jax.nn.log_softmax(np.asarray(logits, np.float64), axis=-1)
    total, n_tok = 0.0, 0
    for b in range(B):
        for t in range(T):
            w = int(sampled[b, t])
            if w == 0:
                continue
            total += float(adv[b]) * logp[b, t, w]
            n_tok += 1
    np.testing.assert_allclose(float(loss), -total / n_tok, rtol=1e-5)
    assert float(metrics["tokens"]) == n_tok


def test_scst_pad_rows_contribute_nothing(rng):
    """A zero-padded tail row (all-pad sampled tokens, advantage 0)
    leaves loss AND gradients identical to the unpadded batch."""
    dec, params = tiny_decoder()
    feats = jnp.asarray(rng.normal(size=(2, FEAT)), jnp.float32)
    sampled = jnp.asarray([[4, 5, 2, 0], [3, 6, 2, 0]], jnp.int32)
    adv = jnp.asarray([1.0, -0.5], jnp.float32)

    def loss_of(params, f, s, a):
        return scst_loss(dec, params, f, s, a, start_id=1)[0]

    g = jax.grad(loss_of)(params, feats, sampled, adv)
    feats_p = jnp.concatenate([feats, jnp.zeros((1, FEAT))], axis=0)
    sampled_p = jnp.concatenate(
        [sampled, jnp.zeros((1, 4), jnp.int32)], axis=0
    )
    adv_p = jnp.concatenate([adv, jnp.zeros((1,))])
    g_p = jax.grad(loss_of)(params, feats_p, sampled_p, adv_p)
    for a, b in zip(
        jax.tree.leaves(g), jax.tree.leaves(g_p), strict=True
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-6
        )


def test_scst_step_reinforce_direction():
    """One update with positive advantage on a sampled sequence raises
    its log-likelihood; negative advantage lowers it. Local rng: the
    property holds for small steps but sgd(0.5) can overshoot on
    unlucky draws, so the data must not depend on how many draws other
    tests consumed from the shared session rng."""
    local = np.random.default_rng(7)
    dec, params = tiny_decoder()
    feats = jnp.asarray(local.normal(size=(1, FEAT)), jnp.float32)
    sampled = jnp.asarray([[4, 5, 2, 0, 0]], jnp.int32)

    def seq_logp(params):
        loss, m = scst_loss(
            dec,
            params,
            feats,
            sampled,
            jnp.ones((1,), jnp.float32),
            start_id=1,
        )
        return float(m["sample_logp"])

    for sign in (1.0, -1.0):
        opt = optax.sgd(0.5)
        state = TrainState.create(params, opt, jax.random.key(0))
        step = make_scst_step(dec, opt, start_id=1)
        before = seq_logp(state.params)
        state, _ = step(
            state, feats, sampled, jnp.asarray([sign], jnp.float32)
        )
        after = seq_logp(state.params)
        if sign > 0:
            assert after > before
        else:
            assert after < before


def test_scst_rollout_shapes_and_greedy_parity(toy_corpus, rng):
    """The rollout's greedy half is exactly greedy_decode; the sampled
    half is reproducible under the same key."""
    dec, params = tiny_decoder(vocab=30)
    rollout = make_scst_rollout(
        dec, start_id=1, end_id=2, max_len=7, temperature=1.0
    )
    feats = jnp.asarray(rng.normal(size=(4, FEAT)), jnp.float32)
    key = jax.random.key(7)
    s1, g1 = rollout(params, feats, key)
    s2, g2 = rollout(params, feats, key)
    assert s1.tokens.shape == (4, 7) and g1.tokens.shape == (4, 7)
    np.testing.assert_array_equal(
        np.asarray(s1.tokens), np.asarray(s2.tokens)
    )
    from tpucap.decode import greedy_decode

    ref = greedy_decode(
        dec.step,
        params,
        dec.init_state(params, feats),
        start_id=1,
        end_id=2,
        max_len=7,
    )
    np.testing.assert_array_equal(
        np.asarray(g1.tokens), np.asarray(ref.tokens)
    )


@pytest.mark.parametrize(
    "family", ["merge2", "inject", "attention", "adaptive", "transformer"]
)
def test_scst_all_decoder_families(family, rng):
    """The rollout/step pair is decoder-agnostic (uniform
    init_state/step/forward_train interface) — one SCST update on every
    family must produce a finite loss and move the params."""
    from tpucap.models.decoders import (
        AdaptiveAttentionDecoder,
        AttentionDecoder,
        InjectDecoder,
        TransformerDecoder,
    )

    V = 13
    if family == "merge2":
        dec = MergeDecoder(
            vocab_size=V, feature_dim=FEAT, embed_dim=EMBED,
            hidden_dim=HID, num_layers=2, dropout_rate=0.0,
        )
        feats = rng.normal(size=(2, FEAT))
    elif family == "inject":
        dec = InjectDecoder(
            vocab_size=V, feature_dim=FEAT, embed_dim=EMBED,
            hidden_dim=HID, dropout_rate=0.0,
        )
        feats = rng.normal(size=(2, FEAT))
    elif family == "attention":
        dec = AttentionDecoder(
            vocab_size=V, feature_dim=FEAT, embed_dim=EMBED,
            hidden_dim=HID, attention_dim=8, dropout_rate=0.0,
        )
        feats = rng.normal(size=(2, 9, FEAT))  # 3x3 spatial grid
    elif family == "adaptive":
        dec = AdaptiveAttentionDecoder(
            vocab_size=V, feature_dim=FEAT, embed_dim=EMBED,
            hidden_dim=HID, attention_dim=8, dropout_rate=0.0,
        )
        feats = rng.normal(size=(2, 9, FEAT))
    else:
        dec = TransformerDecoder(
            vocab_size=V, feature_dim=FEAT, hidden_dim=HID,
            num_layers=1, num_heads=2, mlp_dim=32,
            max_positions=12, dropout_rate=0.0,
        )
        feats = rng.normal(size=(2, FEAT))
    params = dec.init(jax.random.key(0))
    feats = jnp.asarray(feats, jnp.float32)

    rollout = make_scst_rollout(
        dec, start_id=1, end_id=2, max_len=8, temperature=1.0
    )
    sampled, baseline = rollout(params, feats, jax.random.key(3))
    assert sampled.tokens.shape == (2, 8)

    opt = optax.adam(1e-3)
    state = TrainState.create(params, opt, jax.random.key(0))
    step = make_scst_step(dec, opt, start_id=1)
    state, metrics = step(
        state,
        feats,
        sampled.tokens,
        jnp.asarray([0.7, -0.3], jnp.float32),
    )
    assert np.isfinite(float(metrics["loss"]))
    moved = any(
        np.abs(np.asarray(a) - np.asarray(b)).max() > 0
        for a, b in zip(
            jax.tree.leaves(params), jax.tree.leaves(state.params)
        )
    )
    assert moved


# -- data parallel -------------------------------------------------------------


def test_scst_dp_step_update_exact(rng):
    """The DP SCST update (raw-sum gradients psum'd, normalized once by
    the global token count) equals the single-device update on the
    concatenated batch."""
    from tpucap.core import make_mesh

    dec, params = tiny_decoder(vocab=17)
    B = 8
    feats = jnp.asarray(rng.normal(size=(B, FEAT)), jnp.float32)
    sampled = jnp.asarray(
        rng.integers(3, 17, size=(B, 6)), jnp.int32
    )
    # Ragged lengths: pad the tails so normalization is exercised.
    for b in range(B):
        sampled = sampled.at[b, 3 + b % 3 :].set(0)
    adv = jnp.asarray(rng.normal(size=(B,)), jnp.float32)

    opt = optax.adam(1e-2)
    single = make_scst_step(dec, opt, start_id=1)
    s0 = TrainState.create(params, opt, jax.random.key(0))
    s1, m1 = single(s0, feats, sampled, adv)

    mesh = make_mesh(8)
    dp = make_scst_step(dec, opt, start_id=1, mesh=mesh)
    s0b = TrainState.create(params, opt, jax.random.key(0))
    s2, m2 = dp(s0b, feats, sampled, adv)

    np.testing.assert_allclose(
        float(m1["loss"]), float(m2["loss"]), rtol=1e-6
    )
    for a, b in zip(
        jax.tree.leaves(s1.params), jax.tree.leaves(s2.params), strict=True
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-6
        )


def test_scst_dp_rollout_greedy_matches_single_device(rng):
    """The DP rollout's greedy half must equal the single-device greedy
    decode (sampling is decorrelated per shard by design, so only the
    deterministic half is compared)."""
    from tpucap.core import make_mesh

    dec, params = tiny_decoder(vocab=29)
    feats = jnp.asarray(rng.normal(size=(8, FEAT)), jnp.float32)
    single = make_scst_rollout(
        dec, start_id=1, end_id=2, max_len=7
    )
    dp = make_scst_rollout(
        dec, start_id=1, end_id=2, max_len=7, mesh=make_mesh(8)
    )
    _, g1 = single(params, feats, jax.random.key(0))
    s2, g2 = dp(params, feats, jax.random.key(0))
    np.testing.assert_array_equal(
        np.asarray(g1.tokens), np.asarray(g2.tokens)
    )
    assert s2.tokens.shape == (8, 7)


def test_fit_scst_dp_runs(toy_corpus, rng):
    pipe = make_pipe(toy_corpus)
    desc = {f"i{k}": [toy_corpus[k]] for k in range(8)}
    feats = {i: rng.normal(size=(128,)).astype(np.float32) for i in desc}
    pipe.fit(desc, feats, epochs=2, log=None)
    hist = pipe.fit_scst(
        desc, feats, epochs=1, batch_size=8, parallelism="dp", log=None
    )
    assert len(hist) == 1 and np.isfinite(hist[0]["loss"])
    with pytest.raises(NotImplementedError, match="parallelism"):
        pipe.fit_scst(desc, feats, epochs=1, parallelism="tp", log=None)


# -- pipeline surface -----------------------------------------------------------


def make_pipe(toy_corpus, lr=1e-3):
    cfg = Config(
        encoder=EncoderConfig(name="tiny_cnn", feature_dim=128),
        decoder=DecoderConfig(embed_dim=8, hidden_dim=16, dropout_rate=0.0),
        decode=DecodeConfig(max_len=10),
        train=TrainConfig(batch_size=8, learning_rate=lr, seed=0),
        precision="f32",
    )
    pipe = CaptioningPipeline(cfg)
    tok = Tokenizer()
    tok.fit_on_texts(toy_corpus)
    pipe.tokenizer = tok
    pipe.build()
    return pipe


def test_fit_scst_runs_and_updates(toy_corpus, rng):
    pipe = make_pipe(toy_corpus)
    desc = {f"i{k}": [toy_corpus[k]] for k in range(8)}
    feats = {i: rng.normal(size=(128,)).astype(np.float32) for i in desc}
    pipe.fit(desc, feats, epochs=3, log=None)
    before = np.asarray(pipe.params["decoder"]["out"]["kernel"]).copy()
    hist = pipe.fit_scst(desc, feats, epochs=2, batch_size=4, log=None)
    after = np.asarray(pipe.params["decoder"]["out"]["kernel"])
    assert len(hist) == 2
    for h in hist:
        assert set(h) >= {"loss", "reward", "baseline", "advantage"}
        assert np.isfinite(h["loss"]) and np.isfinite(h["reward"])
        assert h["reward"] >= 0.0 and h["baseline"] >= 0.0
    assert np.abs(after - before).max() > 0
    caps = pipe.generate(
        np.stack([feats["i0"], feats["i1"]]), method="greedy"
    )
    assert len(caps) == 2


def test_fit_scst_improves_reward_on_memorizable_fixture(rng):
    """On a partially-CE-trained model, SCST's greedy baseline reward —
    the directly optimized quantity — must strictly improve. The recipe
    (corpus included) is EXACTLY examples/scst_training.py: CE to a
    decent-but-imperfect start, then the policy-gradient phase at ~50x
    lower lr (REINFORCE at too high an lr smears the greedy mode
    instead — measured, see the example's comment)."""
    import dataclasses

    corpus = [
        "startseq a black dog runs across the green grass endseq",
        "startseq two children play soccer in the park endseq",
        "startseq a man rides a red bicycle down the street endseq",
        "startseq a woman in a blue shirt climbs a rock wall endseq",
        "startseq boats rest in a quiet harbor at sunset endseq",
        "startseq the sun rises over red hills and a river endseq",
        "startseq people walk through a busy market square endseq",
        "startseq a climber scales the gray rock face alone endseq",
    ]
    cfg = Config(
        encoder=EncoderConfig(name="tiny_cnn", feature_dim=128),
        decoder=DecoderConfig(
            embed_dim=16, hidden_dim=32, dropout_rate=0.0
        ),
        decode=DecodeConfig(max_len=12),
        train=TrainConfig(batch_size=8, learning_rate=5e-3, seed=0),
        precision="f32",
    )
    pipe = CaptioningPipeline(cfg)
    tok = Tokenizer()
    tok.fit_on_texts(corpus)
    pipe.tokenizer = tok
    pipe.build()
    desc = {f"img{k}": [c] for k, c in enumerate(corpus)}
    rng = np.random.default_rng(0)
    feats = {i: rng.normal(size=(128,)).astype(np.float32) for i in desc}
    pipe.fit(desc, feats, epochs=50, log=None)

    pipe.config = dataclasses.replace(
        pipe.config,
        train=dataclasses.replace(
            pipe.config.train, learning_rate=1e-4
        ),
    )
    hist = pipe.fit_scst(
        desc, feats, epochs=10, batch_size=8, temperature=1.0, log=None
    )
    assert hist[-1]["baseline"] > hist[0]["baseline"]


def test_scst_fsdp_step_update_exact(rng):
    """The FSDP SCST update (params/opt state 1/N per device, gather
    differentiated just-in-time) equals the single-device update on the
    concatenated batch — the SURVEY §2.4 DP-row exactness standard
    applied to the ZeRO layout."""
    from tpucap.core import make_mesh
    from tpucap.parallel import fsdp_gather_tree, shard_fsdp_tree

    dec, params = tiny_decoder(vocab=17)
    B = 8
    feats = jnp.asarray(rng.normal(size=(B, FEAT)), jnp.float32)
    sampled = jnp.asarray(
        rng.integers(3, 17, size=(B, 6)), jnp.int32
    )
    for b in range(B):
        sampled = sampled.at[b, 3 + b % 3 :].set(0)
    adv = jnp.asarray(rng.normal(size=(B,)), jnp.float32)

    opt = optax.adam(1e-2)
    single = make_scst_step(dec, opt, start_id=1)
    s0 = TrainState.create(params, opt, jax.random.key(0))
    s1, m1 = single(s0, feats, sampled, adv)

    mesh = make_mesh(8)
    template = TrainState.create(params, opt, jax.random.key(0))
    fsdp = make_scst_step(
        dec, opt, start_id=1, mesh=mesh,
        fsdp_state_template=template, min_size=64,
    )
    sh = shard_fsdp_tree(template, mesh, min_size=64)
    s2, m2 = fsdp(sh, feats, sampled, adv)

    np.testing.assert_allclose(
        float(m1["loss"]), float(m2["loss"]), rtol=1e-6
    )
    for a, b in zip(
        jax.tree.leaves(s1.params),
        jax.tree.leaves(
            jax.device_get(fsdp_gather_tree(s2.params, mesh))
        ),
        strict=True,
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-6
        )


def test_scst_fsdp_rollout_greedy_matches_single_device(rng):
    """The FSDP rollout gathers the sharded params in-program; its
    greedy half must equal the single-device greedy decode on canonical
    params (sampling stays decorrelated per shard by design)."""
    from tpucap.core import make_mesh
    from tpucap.parallel import shard_fsdp_tree

    dec, params = tiny_decoder(vocab=29)
    feats = jnp.asarray(rng.normal(size=(8, FEAT)), jnp.float32)
    mesh = make_mesh(8)
    single = make_scst_rollout(
        dec, start_id=1, end_id=2, max_len=7
    )
    fsdp = make_scst_rollout(
        dec, start_id=1, end_id=2, max_len=7, mesh=mesh,
        fsdp_params_template=params, min_size=64,
    )
    sharded = shard_fsdp_tree(params, mesh, min_size=64)
    _, g1 = single(params, feats, jax.random.key(0))
    s2, g2 = fsdp(sharded, feats, jax.random.key(0))
    np.testing.assert_array_equal(
        np.asarray(g1.tokens), np.asarray(g2.tokens)
    )
    assert s2.tokens.shape == (8, 7)


def test_fit_scst_fsdp_matches_dp(toy_corpus, rng):
    """fit_scst(parallelism='fsdp') walks the same trajectory as 'dp':
    rollouts shard the batch identically (same decorrelated sample
    keys), the update is exact in both layouts, and the final params
    come back canonical."""
    desc = {f"i{k}": [toy_corpus[k]] for k in range(8)}
    feats = {i: rng.normal(size=(128,)).astype(np.float32) for i in desc}

    ref = make_pipe(toy_corpus)
    ref.fit(desc, feats, epochs=2, log=None)
    h_dp = ref.fit_scst(
        desc, feats, epochs=1, batch_size=8, parallelism="dp", log=None
    )

    pipe = make_pipe(toy_corpus)
    pipe.fit(desc, feats, epochs=2, log=None)
    h_fs = pipe.fit_scst(
        desc, feats, epochs=1, batch_size=8, parallelism="fsdp",
        log=None,
    )
    np.testing.assert_allclose(
        h_dp[0]["loss"], h_fs[0]["loss"], rtol=1e-5
    )
    np.testing.assert_allclose(
        h_dp[0]["reward"], h_fs[0]["reward"], rtol=1e-6
    )
    for a, b in zip(
        jax.tree.leaves(ref.params["decoder"]),
        jax.tree.leaves(pipe.params["decoder"]),
        strict=True,
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-6
        )
    caps = pipe.generate(
        np.stack([feats["i0"], feats["i1"]]), method="greedy"
    )
    assert len(caps) == 2


def test_fit_scst_resume_is_exact(toy_corpus, rng, tmp_path):
    """SCST checkpoint/resume (r5): rollout keys derive from the
    restored step counter and epoch permutations replay, so an
    interrupted-then-resumed run lands on params bit-identical to an
    uninterrupted one."""
    from tpucap.checkpoint import CheckpointManager

    desc = {f"i{k}": [toy_corpus[k]] for k in range(8)}
    feats = {i: rng.normal(size=(128,)).astype(np.float32) for i in desc}

    pipe_a = make_pipe(toy_corpus)
    pipe_a.fit(desc, feats, epochs=2, log=None)
    pipe_a.fit_scst(desc, feats, epochs=4, batch_size=4, log=None)

    pipe_b = make_pipe(toy_corpus)
    pipe_b.fit(desc, feats, epochs=2, log=None)
    mgr = CheckpointManager(str(tmp_path / "sr"), best_metric=None)
    pipe_b.fit_scst(
        desc, feats, epochs=2, batch_size=4,
        checkpoint_manager=mgr, log=None,
    )
    pipe_c = make_pipe(toy_corpus)
    pipe_c.fit(desc, feats, epochs=2, log=None)
    hist = pipe_c.fit_scst(
        desc, feats, epochs=4, batch_size=4,
        checkpoint_manager=mgr, resume=True, log=None,
    )
    mgr.close()
    assert [h["epoch"] for h in hist] == [2, 3]
    for a, b in zip(
        jax.tree.leaves(pipe_a.params["decoder"]),
        jax.tree.leaves(pipe_c.params["decoder"]),
        strict=True,
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fit_scst_preemption_rescue(toy_corpus, rng, tmp_path):
    """FakeGuard mid-SCST: rescue written, 'preempted' entry, resumed
    run matches the uninterrupted trajectory bit-exactly."""
    from tpucap.checkpoint import CheckpointManager

    class _FakeGuard:
        def __init__(self, after):
            self.after, self.calls = after, 0

        @property
        def fired(self):
            self.calls += 1
            return self.calls >= self.after

        def __enter__(self):
            return self

        def __exit__(self, *exc):
            return None

    desc = {f"i{k}": [toy_corpus[k]] for k in range(8)}
    feats = {i: rng.normal(size=(128,)).astype(np.float32) for i in desc}

    pipe_a = make_pipe(toy_corpus)
    pipe_a.fit(desc, feats, epochs=2, log=None)
    pipe_a.fit_scst(desc, feats, epochs=3, batch_size=4, log=None)

    pipe_b = make_pipe(toy_corpus)
    pipe_b.fit(desc, feats, epochs=2, log=None)
    mgr = CheckpointManager(str(tmp_path / "sp"), best_metric=None)
    hist = pipe_b.fit_scst(
        desc, feats, epochs=3, batch_size=4,
        checkpoint_manager=mgr, preemption_guard=_FakeGuard(3),
        log=None,
    )
    assert hist[-1]["preempted"] is True
    assert mgr.latest_step() == 3  # 2 steps/epoch; rescue mid-epoch-1

    pipe_c = make_pipe(toy_corpus)
    pipe_c.fit(desc, feats, epochs=2, log=None)
    pipe_c.fit_scst(
        desc, feats, epochs=3, batch_size=4,
        checkpoint_manager=mgr, resume=True, log=None,
    )
    mgr.close()
    for a, b in zip(
        jax.tree.leaves(pipe_a.params["decoder"]),
        jax.tree.leaves(pipe_c.params["decoder"]),
        strict=True,
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_scst_fsdp_global_norm_clip_matches_single(rng):
    """grad_clip_norm under SCST fsdp must clip on the GLOBAL psum'd
    norm (the optax chain wrapper would see only shard-local slices) —
    update equals the single-device chained-clip update."""
    import optax

    from tpucap.core import make_mesh
    from tpucap.parallel import fsdp_gather_tree, shard_fsdp_tree

    CLIP = 0.05  # small so clipping actually engages
    dec, params = tiny_decoder(vocab=17)
    B = 8
    feats = jnp.asarray(rng.normal(size=(B, FEAT)), jnp.float32)
    sampled = jnp.asarray(rng.integers(3, 17, size=(B, 6)), jnp.int32)
    adv = jnp.asarray(rng.normal(size=(B,)) * 10, jnp.float32)

    single_opt = optax.chain(
        optax.clip_by_global_norm(CLIP), optax.adam(1e-2)
    )
    single = make_scst_step(dec, single_opt, start_id=1)
    s0 = TrainState.create(params, single_opt, jax.random.key(0))
    s1, _ = single(s0, feats, sampled, adv)

    mesh = make_mesh(8)
    bare = optax.adam(1e-2)
    template = TrainState.create(params, bare, jax.random.key(0))
    fsdp = make_scst_step(
        dec, bare, start_id=1, mesh=mesh,
        fsdp_state_template=template, min_size=64,
        grad_clip_norm=CLIP,
    )
    sh = shard_fsdp_tree(template, mesh, min_size=64)
    s2, _ = fsdp(sh, feats, sampled, adv)

    for a, b in zip(
        jax.tree.leaves(s1.params),
        jax.tree.leaves(
            jax.device_get(fsdp_gather_tree(s2.params, mesh))
        ),
        strict=True,
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-6
        )
