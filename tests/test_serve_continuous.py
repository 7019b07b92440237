"""Continuous batching (decode/continuous.py + ContinuousCaptionServer):
slot-recycled greedy decode is token-identical to greedy_decode, lanes
retire early and refill under mixed lengths (the utilization win), and
the server surface behaves (parity with generate, recycling beyond slot
count, backpressure, drain-on-close)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpucap.config import Config, DecodeConfig, DecoderConfig, EncoderConfig
from tpucap.decode import greedy_decode
from tpucap.decode.continuous import ContinuousDecodeEngine
from tpucap.pipeline import CaptioningPipeline
from tpucap.serve import ContinuousCaptionServer, Overloaded
from tpucap.text import Tokenizer

START, END, PAD = 1, 2, 0


class ScriptedDecoder:
    """Deterministic fake decoder: the 'features' row IS the token script
    (padded with END); step emits one-hot logits of script[ptr]."""

    feature_dim = 8  # script length

    def init_state(self, params, features):
        B = features.shape[0]
        return {
            "script": features.astype(jnp.int32),
            "ptr": jnp.zeros((B,), jnp.int32),
        }

    def step(self, params, state, token):
        tok = jnp.take_along_axis(
            state["script"], state["ptr"][:, None], axis=1
        )[:, 0]
        logits = jax.nn.one_hot(tok, 16) * 10.0
        return logits, {
            "script": state["script"],
            "ptr": jnp.minimum(state["ptr"] + 1, self.feature_dim - 1),
        }


def _script(tokens):
    row = np.full((8,), END, np.float32)
    row[: len(tokens)] = tokens
    return row


class TestEngine:
    def _engine(self, slots, max_len=8):
        return ContinuousDecodeEngine(
            ScriptedDecoder(),
            params={},
            slots=slots,
            start_id=START,
            end_id=END,
            max_len=max_len,
            feature_shape=(8,),
        )

    def test_single_lane_scripted_caption(self):
        eng = self._engine(slots=2)
        st = eng.init_state()
        idx, feats = eng.pad_admission([0], [_script([5, 7, 2])])
        st = eng.admit(st, idx, feats)
        st = eng.tick(st, 8)
        fin, act, lens = jax.device_get(eng.flags(st))
        assert fin[0] and not act[0]
        assert not fin[1]  # empty lane untouched
        (tokens, lengths, _), st = eng.collect(st, jnp.asarray([0, 0]))
        assert lengths[0] == 3  # 5, 7, end
        np.testing.assert_array_equal(
            np.asarray(tokens)[0][:3], [5, 7, 2]
        )
        fin, _, _ = jax.device_get(eng.flags(st))
        assert not fin[0]  # cleared by collect

    def test_slot_recycling_under_mixed_lengths(self):
        """4 scripted requests (lengths 2,2,2,7) through 2 lanes: early
        finishers free their lanes for waiting work; total ticks stay
        well under the padded-batch equivalent (2 rounds x max_len)."""
        eng = self._engine(slots=2)
        st = eng.init_state()
        scripts = {
            "a": [5, 2],
            "b": [6, 2],
            "c": [7, 2],
            "d": [3, 4, 5, 6, 7, 8, 2],
        }
        waiting = list(scripts.items())
        free, live, got, ticks = [0, 1], {}, {}, 0
        while waiting or live:
            if waiting and free:
                admit = []
                while waiting and free:
                    name, sc = waiting.pop(0)
                    slot = free.pop()
                    live[slot] = name
                    admit.append((slot, _script(sc)))
                idx, feats = eng.pad_admission(
                    [s for s, _ in admit], [f for _, f in admit]
                )
                st = eng.admit(st, idx, feats)
            st = eng.tick(st, 1)
            ticks += 1
            fin, _, _ = jax.device_get(eng.flags(st))
            ids = [int(i) for i in np.where(fin)[0]]
            if ids:
                pad = ids + [ids[0]] * (eng.admit_bucket(len(ids)) - len(ids))
                (tokens, lengths, _), st = eng.collect(
                    st, jnp.asarray(pad)
                )
                for j, slot in enumerate(ids):
                    name = live.pop(slot)
                    got[name] = list(
                        np.asarray(tokens)[j][: int(lengths[j])]
                    )
                    free.append(slot)
            assert ticks < 50, "engine failed to converge"
        for name, sc in scripts.items():
            assert got[name] == sc, name
        # padded-batch equivalent: ceil(4/2) rounds x slowest-in-round;
        # worst scheduling = 2 x 8 = 16. Recycling: ~2 + 7 + overhead.
        assert ticks <= 10

    def test_admit_padding_rows_are_dropped(self):
        eng = self._engine(slots=4)
        st = eng.init_state()
        idx, feats = eng.pad_admission([2], [_script([5, 2])])
        assert idx.shape == (1,)  # bucket 1 — no padding needed
        idx, feats = eng.pad_admission(
            [1, 3, 0], [_script([5, 2])] * 3
        )
        assert idx.shape == (4,) and int(idx[3]) == 4  # OOB pad row
        st = eng.admit(st, idx, feats)
        _, act, _ = jax.device_get(eng.flags(st))
        assert list(act) == [True, True, False, True]  # slot 2 untouched


@pytest.fixture(scope="module")
def pipe(toy_corpus):
    cfg = Config(
        encoder=EncoderConfig(name="tiny_cnn", feature_dim=128),
        decoder=DecoderConfig(embed_dim=16, hidden_dim=32, dropout_rate=0.0),
        decode=DecodeConfig(max_len=10),
    )
    p = CaptioningPipeline(cfg)
    tok = Tokenizer()
    tok.fit_on_texts(toy_corpus)
    p.tokenizer = tok
    p.build()
    return p


def test_engine_matches_greedy_decode(pipe, rng):
    """Real decoder through the engine == greedy_decode, token-exact."""
    feats = rng.normal(size=(3, 128)).astype(np.float32)
    params = pipe.params["decoder"]
    ref = greedy_decode(
        pipe.decoder.step,
        params,
        pipe.decoder.init_state(params, jnp.asarray(feats)),
        start_id=1,
        end_id=2,
        max_len=10,
    )
    eng = ContinuousDecodeEngine(
        pipe.decoder, params, slots=4, start_id=1, end_id=2, max_len=10,
        feature_shape=(128,),
    )
    st = eng.init_state()
    idx, f = eng.pad_admission([0, 1, 2], list(feats))
    st = eng.admit(st, idx, f)
    st = eng.tick(st, 10)
    (tokens, lengths, scores), _ = eng.collect(
        st, jnp.asarray([0, 1, 2, 0])
    )
    np.testing.assert_array_equal(
        np.asarray(tokens)[:3], np.asarray(ref.tokens)
    )
    np.testing.assert_array_equal(
        np.asarray(lengths)[:3], np.asarray(ref.lengths)
    )
    np.testing.assert_allclose(
        np.asarray(scores)[:3], np.asarray(ref.scores), atol=1e-5
    )


def test_server_matches_generate(pipe, rng):
    feats = rng.normal(size=(9, 128)).astype(np.float32)
    ref = pipe.generate(feats, method="greedy")
    with ContinuousCaptionServer(pipe, slots=4, ticks_per_sync=2) as srv:
        futs = [srv.submit(f) for f in feats]  # 9 requests > 4 slots
        got = [f.result(timeout=180) for f in futs]
    assert got == ref
    s = srv.stats()
    assert s["requests"] == 9
    assert s["ticks"] > 0 and s["mean_occupancy"] > 0


def test_server_backpressure_and_shape_check(pipe, rng):
    with ContinuousCaptionServer(
        pipe, slots=2, ticks_per_sync=2, max_queue=0
    ) as srv:
        with pytest.raises(ValueError, match="request shape"):
            srv.submit(np.zeros((3,), np.float32))
        with pytest.raises(Overloaded):
            # queue cap 0 with the batcher busy-waiting: first submit
            # may be grabbed instantly, so fill until it trips.
            for _ in range(50):
                srv.submit(
                    rng.normal(size=(128,)).astype(np.float32)
                )


def test_server_close_resolves_outstanding(pipe, rng):
    feats = rng.normal(size=(5, 128)).astype(np.float32)
    srv = ContinuousCaptionServer(pipe, slots=2, ticks_per_sync=3)
    futs = [srv.submit(f) for f in feats]
    srv.close()
    caps = [f.result(timeout=180) for f in futs]
    assert caps == pipe.generate(feats, method="greedy")
    with pytest.raises(RuntimeError, match="closed"):
        srv.submit(feats[0])


class TestContinuousBeam:
    """Continuous beam engine (decode/continuous_beam.py): group results
    identical to beam_decode, independent of admission time."""

    def _engine(self, pipe, slots=3, k=3):
        from tpucap.decode.continuous_beam import ContinuousBeamEngine

        return ContinuousBeamEngine(
            pipe.decoder,
            pipe.params["decoder"],
            slots=slots,
            beam_width=k,
            start_id=1,
            end_id=2,
            max_len=10,
            feature_shape=(128,),
        )

    def _beam_ref(self, pipe, feats, k=3):
        from tpucap.decode import beam_decode

        params = pipe.params["decoder"]
        return beam_decode(
            pipe.decoder.step,
            params,
            pipe.decoder.init_state(params, jnp.asarray(feats)),
            start_id=1,
            end_id=2,
            max_len=10,
            beam_width=k,
        )

    def test_matches_beam_decode(self, pipe, rng):
        feats = rng.normal(size=(3, 128)).astype(np.float32)
        ref = self._beam_ref(pipe, feats)
        eng = self._engine(pipe)
        st = eng.init_state()
        idx, f = eng.pad_admission([0, 1, 2], list(feats))
        st = eng.admit(st, idx, f)
        st = eng.tick(st, 10)
        fin, act, _ = jax.device_get(eng.flags(st))
        assert fin.all() and not act.any()
        (tokens, lengths, scores), _ = eng.collect(
            st, jnp.asarray([0, 1, 2])
        )
        np.testing.assert_array_equal(
            np.asarray(tokens), np.asarray(ref.tokens)
        )
        np.testing.assert_array_equal(
            np.asarray(lengths), np.asarray(ref.lengths)
        )
        np.testing.assert_allclose(
            np.asarray(scores), np.asarray(ref.scores), atol=1e-5
        )

    def test_length_penalty_ranks_collect(self, pipe):
        """Review-found bug: the engine hardcoded the 'simple' len^alpha
        ranking in collect(), silently ignoring
        DecodeConfig.length_penalty='gnmt' on the continuous serving
        path. Pin the ranking deterministically: a hand-built beam state
        where the two penalties provably pick DIFFERENT winners (lens
        2 vs 6, scores -1.0 vs -2.4, alpha=1: simple -0.50 vs -0.40
        picks the long beam; gnmt -0.857 vs -1.309 picks the short
        one), collected under each penalty."""
        import dataclasses

        from tpucap.decode.continuous_beam import ContinuousBeamEngine

        def make(penalty):
            return ContinuousBeamEngine(
                pipe.decoder, pipe.params["decoder"],
                slots=1, beam_width=2, start_id=1, end_id=2, max_len=6,
                feature_shape=(128,), alpha=1.0, length_penalty=penalty,
            )

        eng = make("simple")
        st = eng.init_state()
        # Identity backpointers: lane j's caption is words[:, j] verbatim.
        words = jnp.stack(
            [jnp.full((6,), 7, jnp.int32), jnp.full((6,), 9, jnp.int32)],
            axis=1,
        )[None]  # (1, L=6, k=2)
        parents = jnp.broadcast_to(
            jnp.arange(2, dtype=jnp.int32)[None, None, :], (1, 6, 2)
        )
        st = dataclasses.replace(
            st,
            words=words,
            parents=parents,
            lengths=jnp.asarray([[2, 6]], jnp.int32),
            scores=jnp.asarray([[-1.0, -2.4]], jnp.float32),
        )
        g = jnp.asarray([0])
        (tok_simple, len_simple, _), _ = make("simple").collect(st, g)
        (tok_gnmt, len_gnmt, _), _ = make("gnmt").collect(st, g)
        assert int(len_simple[0]) == 6 and int(tok_simple[0, 0]) == 9
        assert int(len_gnmt[0]) == 2 and int(tok_gnmt[0, 0]) == 7

    def test_server_plumbs_length_penalty(self, toy_corpus):
        """ContinuousCaptionServer must hand DecodeConfig.length_penalty
        to the beam engine (the config knob was silently dropped)."""
        import dataclasses

        cfg = Config(
            encoder=EncoderConfig(name="tiny_cnn", feature_dim=128),
            decoder=DecoderConfig(
                embed_dim=8, hidden_dim=8, dropout_rate=0.0
            ),
            decode=DecodeConfig(max_len=8, length_penalty="gnmt"),
        )
        p = CaptioningPipeline(cfg)
        tok = Tokenizer()
        tok.fit_on_texts(toy_corpus)
        p.tokenizer = tok
        p.build()
        srv = ContinuousCaptionServer(p, slots=2, beam_width=2)
        try:
            assert srv._engine.length_penalty == "gnmt"
        finally:
            srv.close()

    def test_staggered_admission_is_equivalent(self, pipe, rng):
        """A request admitted at tick 5 into a recycled group produces
        the SAME beams as one admitted at tick 0 — per-group state is
        lane-local."""
        feats = rng.normal(size=(2, 128)).astype(np.float32)
        ref = self._beam_ref(pipe, feats[1:2])
        eng = self._engine(pipe, slots=1)
        st = eng.init_state()
        idx, f = eng.pad_admission([0], [feats[0]])
        st = eng.admit(st, idx, f)
        st = eng.tick(st, 5)
        # Recycle group 0 mid-flight with request 1 (server would only
        # readmit after retirement; admit overwrites regardless).
        idx, f = eng.pad_admission([0], [feats[1]])
        st = eng.admit(st, idx, f)
        st = eng.tick(st, 10)
        (tokens, lengths, scores), _ = eng.collect(st, jnp.asarray([0]))
        np.testing.assert_array_equal(
            np.asarray(tokens), np.asarray(ref.tokens)
        )
        np.testing.assert_allclose(
            np.asarray(scores), np.asarray(ref.scores), atol=1e-5
        )

    def test_server_beam_mode_matches_generate(self, pipe, rng):
        feats = rng.normal(size=(7, 128)).astype(np.float32)
        ref = pipe.generate(feats, method="beam", beam_width=3)
        with ContinuousCaptionServer(
            pipe, slots=3, ticks_per_sync=2, beam_width=3
        ) as srv:
            futs = [srv.submit(f) for f in feats]  # 7 requests > 3 groups
            got = [f.result(timeout=180) for f in futs]
        assert got == ref


class TestContinuousBeamAttention:
    """Shared-keys (attention) and approx_topk paths of the continuous
    beam engine."""

    def _attn_pipe(self, toy_corpus):
        cfg = Config(
            encoder=EncoderConfig(
                name="tiny_cnn", feature_dim=32, features="spatial"
            ),
            decoder=DecoderConfig(
                name="attention", embed_dim=16, hidden_dim=32,
                dropout_rate=0.0,
            ),
            decode=DecodeConfig(max_len=10),
        )
        p = CaptioningPipeline(cfg)
        tok = Tokenizer()
        tok.fit_on_texts(toy_corpus)
        p.tokenizer = tok
        p.build()
        return p

    def test_attention_shared_keys_match_beam_decode(self, toy_corpus, rng):
        """The attention decoder's per-image grids are stored one row
        per group (beam_shared_keys); results still exactly match
        beam_decode."""
        from tpucap.decode import beam_decode
        from tpucap.decode.continuous_beam import ContinuousBeamEngine

        p = self._attn_pipe(toy_corpus)
        feats = rng.normal(size=(2, 16, 32)).astype(np.float32)
        params = p.params["decoder"]
        ref = beam_decode(
            p.decoder.step,
            params,
            p.decoder.init_state(params, jnp.asarray(feats)),
            start_id=1, end_id=2, max_len=10, beam_width=3,
            decoder=p.decoder,
        )
        eng = ContinuousBeamEngine(
            p.decoder, params, slots=2, beam_width=3,
            start_id=1, end_id=2, max_len=10, feature_shape=(16, 32),
        )
        st = eng.init_state()
        # shared keys stored per-GROUP (leading dim 2, not 2*3)
        assert st.dec["features"].shape[0] == 2
        assert st.dec["h"].shape[0] == 6
        idx, f = eng.pad_admission([0, 1], list(feats))
        st = eng.admit(st, idx, f)
        st = eng.tick(st, 10)
        (tokens, lengths, scores), _ = eng.collect(st, jnp.asarray([0, 1]))
        np.testing.assert_array_equal(
            np.asarray(tokens), np.asarray(ref.tokens)
        )
        np.testing.assert_allclose(
            np.asarray(scores), np.asarray(ref.scores), atol=1e-5
        )

    def test_attention_server_beam_matches_generate(self, toy_corpus, rng):
        p = self._attn_pipe(toy_corpus)
        feats = rng.normal(size=(5, 16, 32)).astype(np.float32)
        ref = p.generate(feats, method="beam", beam_width=3)
        with ContinuousCaptionServer(
            p, slots=2, ticks_per_sync=3, beam_width=3
        ) as srv:
            futs = [srv.submit(f) for f in feats]
            got = [f.result(timeout=180) for f in futs]
        assert got == ref

class TestContinuousTransformer:
    """The KV-cached transformer through the continuous engines: its
    per-lane ``pos`` and one-hot cache writes were designed so lanes can
    sit at different generation depths in one state — this pins that
    claim (models/decoders/transformer.py docstring) token-exactly."""

    def _tf_pipe(self, toy_corpus):
        cfg = Config(
            encoder=EncoderConfig(name="tiny_cnn", feature_dim=32),
            decoder=DecoderConfig(
                name="transformer", hidden_dim=32, num_layers=2,
                num_heads=2, mlp_dim=64, max_positions=16,
                dropout_rate=0.0,
            ),
            decode=DecodeConfig(max_len=10),
        )
        p = CaptioningPipeline(cfg)
        tok = Tokenizer()
        tok.fit_on_texts(toy_corpus)
        p.tokenizer = tok
        p.build()
        return p

    def test_greedy_staggered_recycle_matches(self, toy_corpus, rng):
        """A lane recycled mid-flight resets pos to 0 and must not see
        the evicted request's stale KV rows (the causal visibility mask
        is per-lane): captions match a fresh greedy_decode exactly."""
        p = self._tf_pipe(toy_corpus)
        params = p.params["decoder"]
        feats = rng.normal(size=(2, 32)).astype(np.float32)
        ref = greedy_decode(
            p.decoder.step,
            params,
            p.decoder.init_state(params, jnp.asarray(feats[1:2])),
            start_id=1, end_id=2, max_len=10,
        )
        eng = ContinuousDecodeEngine(
            p.decoder, params, slots=1, start_id=1, end_id=2, max_len=10,
            feature_shape=(32,),
        )
        st = eng.init_state()
        idx, f = eng.pad_admission([0], [feats[0]])
        st = eng.admit(st, idx, f)
        st = eng.tick(st, 5)  # lane 0 is 5 tokens deep
        idx, f = eng.pad_admission([0], [feats[1]])
        st = eng.admit(st, idx, f)  # recycle mid-flight
        st = eng.tick(st, 10)
        (tokens, lengths, _), _ = eng.collect(st, jnp.asarray([0]))
        np.testing.assert_array_equal(
            np.asarray(tokens), np.asarray(ref.tokens)
        )
        np.testing.assert_array_equal(
            np.asarray(lengths), np.asarray(ref.lengths)
        )

    def test_beam_shared_keys_match_beam_decode(self, toy_corpus, rng):
        """mem_k/mem_v are beam_shared_keys: stored once per group, not
        per hypothesis; beams still exactly match beam_decode."""
        from tpucap.decode import beam_decode
        from tpucap.decode.continuous_beam import ContinuousBeamEngine

        p = self._tf_pipe(toy_corpus)
        params = p.params["decoder"]
        feats = rng.normal(size=(2, 32)).astype(np.float32)
        ref = beam_decode(
            p.decoder.step,
            params,
            p.decoder.init_state(params, jnp.asarray(feats)),
            start_id=1, end_id=2, max_len=10, beam_width=3,
            decoder=p.decoder,
        )
        eng = ContinuousBeamEngine(
            p.decoder, params, slots=2, beam_width=3,
            start_id=1, end_id=2, max_len=10, feature_shape=(32,),
        )
        st = eng.init_state()
        assert st.dec["mem_k"].shape[0] == 2  # per GROUP
        assert st.dec["cache_k"].shape[0] == 6  # per hypothesis
        idx, f = eng.pad_admission([0, 1], list(feats))
        st = eng.admit(st, idx, f)
        st = eng.tick(st, 10)
        (tokens, lengths, scores), _ = eng.collect(st, jnp.asarray([0, 1]))
        np.testing.assert_array_equal(
            np.asarray(tokens), np.asarray(ref.tokens)
        )
        np.testing.assert_allclose(
            np.asarray(scores), np.asarray(ref.scores), atol=1e-5
        )

    def test_server_matches_generate_transformer(self, toy_corpus, rng):
        p = self._tf_pipe(toy_corpus)
        feats = rng.normal(size=(5, 32)).astype(np.float32)
        ref = p.generate(feats, method="greedy")
        with ContinuousCaptionServer(
            p, slots=2, ticks_per_sync=2
        ) as srv:
            futs = [srv.submit(f) for f in feats]  # 5 requests > 2 slots
            got = [f.result(timeout=180) for f in futs]
        assert got == ref


def test_approx_topk_small_vocab_matches_exact(pipe, rng):
    """approx_max_k at tiny vocab selects the same candidates —
    the flag is honored without changing small-scale results."""
    from tpucap.decode.continuous_beam import ContinuousBeamEngine

    feats = rng.normal(size=(2, 128)).astype(np.float32)
    params = pipe.params["decoder"]
    outs = []
    for approx in (False, True):
        eng = ContinuousBeamEngine(
            pipe.decoder, params, slots=2, beam_width=3,
            start_id=1, end_id=2, max_len=10, feature_shape=(128,),
            approx_topk=approx,
        )
        st = eng.init_state()
        idx, f = eng.pad_admission([0, 1], list(feats))
        st = eng.admit(st, idx, f)
        st = eng.tick(st, 10)
        (tokens, _, _), _ = eng.collect(st, jnp.asarray([0, 1]))
        outs.append(np.asarray(tokens))
    np.testing.assert_array_equal(outs[0], outs[1])


def test_warmup_compiles_every_admit_bucket(pipe):
    """ADVICE r2 (medium): warmup must trace admit/collect at EVERY
    bucket on the admission ladder deterministically — the old
    through-the-queue warmup raced the engine loop's admission batching
    and typically compiled only buckets 1 and `slots`, leaving the
    intermediate shapes to compile during live traffic."""
    from tpucap.decode.continuous import ContinuousDecodeEngine as Eng

    admit0 = Eng.admit._cache_size()
    collect0 = Eng.collect._cache_size()
    srv = ContinuousCaptionServer(pipe, slots=8, ticks_per_sync=2)
    try:
        srv.warmup()
        n_buckets = len(srv._engine._admit_buckets)  # 1,2,4,8
        assert n_buckets == 4
        admit_delta = Eng.admit._cache_size() - admit0
        collect_delta = Eng.collect._cache_size() - collect0
        assert admit_delta == n_buckets
        assert collect_delta == n_buckets
        assert srv.stats()["requests"] == 0  # warmup is not traffic
        # Intermediate-bucket traffic after warmup: no new programs.
        feats = np.zeros((3, 128), np.float32)
        futs = [srv.submit(f) for f in feats]
        for f in futs:
            f.result(timeout=180)
        assert Eng.admit._cache_size() - admit0 == admit_delta
        assert Eng.collect._cache_size() - collect0 == collect_delta
    finally:
        srv.close()


def test_close_fails_pending_futures_when_wedged(pipe, rng):
    """A wedged engine loop (stuck in device dispatch) must not leave
    accepted requests' futures unresolved forever: close(timeout=...)
    fails them with TimeoutError (ADVICE r2 low #4)."""
    import time as _time

    srv = ContinuousCaptionServer(pipe, slots=2, ticks_per_sync=2)
    srv.warmup()
    orig_tick = srv._engine.tick
    release = []

    def wedged_tick(state, n=1):
        while not release:  # park the loop thread like a hung compile
            _time.sleep(0.02)
        return orig_tick(state, n)

    srv._engine.tick = wedged_tick
    fut = srv.submit(rng.normal(size=(128,)).astype(np.float32))
    srv.close(timeout=0.5)
    with pytest.raises(TimeoutError, match="did not drain"):
        fut.result(timeout=10)
    # Recovery: close() re-put the shutdown sentinel after draining, so
    # the unparked loop terminates instead of spinning forever.
    release.append(True)
    srv._thread.join(timeout=30)
    assert not srv._thread.is_alive()


class TestImagesMode:
    """mode='images': the encoder joins the admission path (each
    admitted wave is padded to the bucket, encoded on device, and the
    feature rows scattered into lanes) — the config-5 online analog
    with the encoder in the loop (VERDICT r2 missing #4)."""

    def test_matches_offline_path_greedy(self, pipe, rng):
        size = pipe.encoder.input_size
        imgs = rng.normal(size=(7, size, size, 3)).astype(np.float32)
        ref = pipe.generate(pipe.encode_images(imgs), method="greedy")
        with ContinuousCaptionServer(
            pipe, slots=4, ticks_per_sync=2, mode="images"
        ) as srv:
            futs = [srv.submit(im) for im in imgs]  # 7 requests > 4 slots
            got = [f.result(timeout=180) for f in futs]
        assert got == ref
        assert srv.stats()["requests"] == 7

    def test_matches_offline_path_beam(self, pipe, rng):
        size = pipe.encoder.input_size
        imgs = rng.normal(size=(3, size, size, 3)).astype(np.float32)
        ref = pipe.generate(
            pipe.encode_images(imgs), method="beam", beam_width=2
        )
        with ContinuousCaptionServer(
            pipe, slots=2, ticks_per_sync=2, mode="images", beam_width=2
        ) as srv:
            futs = [srv.submit(im) for im in imgs]
            got = [f.result(timeout=180) for f in futs]
        assert got == ref

    def test_shape_check_wants_images(self, pipe, rng):
        with ContinuousCaptionServer(
            pipe, slots=2, mode="images"
        ) as srv:
            with pytest.raises(ValueError, match="mode='images'"):
                srv.submit(rng.normal(size=(128,)).astype(np.float32))

    def test_warmup_compiles_encoder_buckets(self, pipe):
        """warmup in images mode must trace the encoder at every
        admission bucket (no encode compile during live traffic)."""
        srv = ContinuousCaptionServer(
            pipe, slots=4, ticks_per_sync=2, mode="images"
        )
        try:
            srv.warmup()
            enc = pipe._encode_fn
            assert enc is not None
            base = enc._cache_size()
            size = pipe.encoder.input_size
            futs = [
                srv.submit(np.zeros((size, size, 3), np.float32))
                for _ in range(3)
            ]
            for f in futs:
                f.result(timeout=180)
            assert enc._cache_size() == base  # no new encoder programs
        finally:
            srv.close()

    def test_bad_mode_rejected(self, pipe):
        with pytest.raises(ValueError, match="mode"):
            ContinuousCaptionServer(pipe, mode="jpeg")


def test_engine_loop_crash_fails_pending_futures(pipe, rng):
    """If the engine loop DIES (not wedges — e.g. device OOM on a fresh
    admission bucket), pending futures get the error and the server
    closes, instead of a dead thread leaving clients blocked."""
    srv = ContinuousCaptionServer(pipe, slots=2, ticks_per_sync=2)
    srv.warmup()

    def crashing_tick(state, n=1):
        raise RuntimeError("synthetic device OOM")

    srv._engine.tick = crashing_tick
    fut = srv.submit(rng.normal(size=(128,)).astype(np.float32))
    with pytest.raises(RuntimeError, match="synthetic device OOM"):
        fut.result(timeout=30)
    srv._thread.join(timeout=30)
    assert not srv._thread.is_alive()
    with pytest.raises(RuntimeError, match="closed"):
        srv.submit(rng.normal(size=(128,)).astype(np.float32))
    srv.close()  # idempotent no-op after the crash path
