"""Constrained beam search (decode/constrained.py,
pipeline.generate_constrained).

Contracts:
- all-padded constraint slots ARE standard beam search (token/length/
  score-exact vs beam_decode — the row starts fully pre-satisfied, the
  extra banks stay unreachable);
- C=1 and C=2 runs match a per-step Python oracle implementing the
  bank-FSM selection (tokens + scores + satisfied masks);
- a satisfiable constraint word appears in the returned caption and the
  satisfied mask reads True;
- when full satisfaction is unreachable (max_len too short for C
  transitions), the engine returns the most-satisfied bank's best
  hypothesis (the paper's fallback);
- per-row constraints, min_len and banned_ids compose;
- shared-key (attention) decoders compose;
- the pipeline layer validates words (OOV / phrase / duplicate / BPE /
  sentinel / ngram collisions raise) and surfaces details.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpucap.decode import beam_decode, constrained_beam_decode
from tpucap.decode.beam import normalized_scores
from tpucap.models.decoders import AttentionDecoder, MergeDecoder

VOCAB = 17
FEAT = 8
START, END = 1, 2
B = 3
MAX_LEN = 8
NEG = np.float32(-1e30)


def make_model(seed=0):
    dec = MergeDecoder(
        vocab_size=VOCAB, feature_dim=FEAT, embed_dim=10,
        hidden_dim=12, dropout_rate=0.0,
    )
    return dec, dec.init(jax.random.key(seed))


def feats(seed=5, spatial=False):
    shape = (B, 6, FEAT) if spatial else (B, FEAT)
    return jax.random.normal(jax.random.key(seed), shape)


def _engine(dec, params, f, cids, k=2, **kw):
    fn = jax.jit(
        lambda p, x, c: constrained_beam_decode(
            dec.step, p, dec.init_state(p, x),
            start_id=START, end_id=END, max_len=MAX_LEN,
            beam_width=k, constraint_ids=c, decoder=dec, **kw,
        )
    )
    return fn(params, f, jnp.asarray(cids, jnp.int32))


def cbs_oracle(
    step_fn, params, state, *, cids, beam_width, max_len=MAX_LEN,
    pad_id=0, min_len=0, banned_ids=(),
):
    """Per-step host mirror of the bank-FSM beam: per target bank,
    candidates are assembled in the documented order (each parent's
    stage-1 top-k block, then arrivals per ascending constraint bit)
    and python-sorted by (-score, assembly index) — the lax.top_k tie
    rule. State rides (B*S*k) jnp arrays gathered by GLOBAL parents."""
    k = beam_width
    cids = np.asarray(cids, np.int32)
    if cids.ndim == 1:
        cids = np.broadcast_to(cids[None], (B, cids.shape[0])).copy()
    C = cids.shape[1]
    S = 1 << C
    Bn = jax.tree_util.tree_leaves(state)[0].shape[0]
    state = jax.tree_util.tree_map(
        lambda x: jnp.repeat(x, S * k, axis=0), state
    )

    pre = cids == pad_id
    bank0 = (pre.astype(np.int32) * (1 << np.arange(C))).sum(-1)
    scores = np.full((Bn, S, k), NEG, np.float32)
    for b in range(Bn):
        scores[b, bank0[b], 0] = 0.0
    tokens = np.full((Bn, S, k, max_len), pad_id, np.int32)
    lengths = np.zeros((Bn, S, k), np.int32)
    finished = np.zeros((Bn, S, k), bool)
    last = np.full((Bn * S * k,), START, np.int32)

    for t in range(max_len):
        live = ~(finished | (scores < NEG / 2))
        if not live.any():
            break
        logits, new_state = step_fn(params, state, jnp.asarray(last))
        V = logits.shape[-1]
        lf = np.asarray(logits, np.float32).reshape(Bn, S, k, V)
        lse = np.asarray(
            jax.scipy.special.logsumexp(
                jnp.asarray(logits).astype(jnp.float32), axis=-1
            )
        ).reshape(Bn, S, k)
        base = lf.copy()
        base[..., pad_id] = NEG
        for w in banned_ids:
            base[..., w] = NEG
        if t < min_len:
            base[..., END] = NEG

        new_scores = np.full_like(scores, NEG)
        new_tokens = np.zeros_like(tokens)
        new_lengths = np.zeros_like(lengths)
        new_finished = np.zeros_like(finished)
        words = np.zeros((Bn, S, k), np.int32)
        gparents = np.zeros((Bn, S, k), np.int64)

        for b in range(Bn):
            for tbank in range(S):
                cands = []  # (score, order, gparent, word)
                idx = 0
                for j in range(k):
                    g = tbank * k + j
                    sc = scores[b, tbank, j]
                    if finished[b, tbank, j]:
                        vals = [np.float32(sc + np.float32(0.0))] + [
                            np.float32(sc + NEG)
                        ] * (k - 1)
                        ws = [pad_id] * k
                    else:
                        row = base[b, tbank, j].copy()
                        for i in range(C):
                            if not tbank & (1 << i):
                                row[cids[b, i]] = NEG
                        order = np.lexsort((np.arange(V), -row))[:k]
                        vals = [
                            np.float32(
                                sc + np.float32(row[w] - lse[b, tbank, j])
                            )
                            for w in order
                        ]
                        ws = [int(w) for w in order]
                    for v, w in zip(vals, ws):
                        cands.append((v, idx, g, w))
                        idx += 1
                for i in range(C):
                    if not tbank & (1 << i):
                        continue
                    sbank = tbank & ~(1 << i)
                    wi = int(cids[b, i])
                    for j in range(k):
                        g = sbank * k + j
                        if finished[b, sbank, j]:
                            v = NEG
                        else:
                            v = np.float32(
                                scores[b, sbank, j]
                                + np.float32(
                                    lf[b, sbank, j, wi]
                                    - lse[b, sbank, j]
                                )
                            )
                        cands.append((v, idx, g, wi))
                        idx += 1
                cands.sort(key=lambda x: (-x[0], x[1]))
                for slot, (v, _, g, w) in enumerate(cands[:k]):
                    ps, pj = divmod(g, k)
                    pf = finished[b, ps, pj]
                    new_scores[b, tbank, slot] = v
                    new_tokens[b, tbank, slot] = tokens[b, ps, pj]
                    new_lengths[b, tbank, slot] = lengths[b, ps, pj]
                    gparents[b, tbank, slot] = g
                    if pf:
                        words[b, tbank, slot] = pad_id
                        new_finished[b, tbank, slot] = True
                    else:
                        words[b, tbank, slot] = w
                        new_tokens[b, tbank, slot, t] = w
                        new_lengths[b, tbank, slot] += 1
                        new_finished[b, tbank, slot] = w == END

        scores, tokens = new_scores, new_tokens
        lengths, finished = new_lengths, new_finished

        def gather(x):
            xn = np.asarray(x)
            xr = xn.reshape((Bn, S * k) + xn.shape[1:])
            out = np.stack(
                [xr[b][gparents[b].reshape(-1)] for b in range(Bn)]
            )
            return jnp.asarray(out.reshape((Bn * S * k,) + xn.shape[1:]))

        state = jax.tree_util.tree_map(gather, new_state)
        last = words.reshape(Bn * S * k)

    # Two-stage final ranking (matches the engine): max satisfaction
    # count among reachable slots, then argmax norm at that count.
    norm = np.asarray(normalized_scores(scores, lengths))
    pop = np.array([bin(s).count("1") for s in range(S)], np.int32)
    reach = scores > NEG / 2
    pcb = np.broadcast_to(pop[None, :, None], scores.shape)
    best_pop = np.where(reach, pcb, -1).reshape(Bn, -1).max(1)
    rank = np.where(
        reach & (pcb == best_pop[:, None, None]), norm, NEG
    )
    best = rank.reshape(Bn, S * k).argmax(1)
    bb, bk = best // k, best % k
    bi = np.arange(Bn)
    sat = ((bb[:, None] >> np.arange(C)[None, :]) & 1).astype(bool)
    return (
        tokens[bi, bb, bk],
        lengths[bi, bb, bk],
        scores[bi, bb, bk],
        sat,
        (scores, lengths, tokens),
    )


class TestReduction:
    def test_all_padded_slots_equal_beam(self):
        dec, params = make_model()
        f = feats()
        res = _engine(dec, params, f, np.zeros((B, 2), np.int32), k=3)
        ref = jax.jit(
            lambda p, x: beam_decode(
                dec.step, p, dec.init_state(p, x),
                start_id=START, end_id=END, max_len=MAX_LEN,
                beam_width=3, decoder=dec,
            )
        )(params, f)
        np.testing.assert_array_equal(
            np.asarray(res.tokens), np.asarray(ref.tokens)
        )
        np.testing.assert_array_equal(
            np.asarray(res.lengths), np.asarray(ref.lengths)
        )
        np.testing.assert_allclose(
            np.asarray(res.scores), np.asarray(ref.scores), atol=1e-5
        )
        assert np.asarray(res.satisfied).all()
        # The pre-satisfied bank is the FULL bank; its beams are the
        # standard ones.
        np.testing.assert_array_equal(
            np.asarray(res.beam_tokens)[:, -1], np.asarray(ref.beam_tokens)
        )


class TestOracleParity:
    @pytest.mark.parametrize(
        "seed,k,words",
        [(0, 2, [5]), (1, 3, [7]), (2, 2, [5, 9]), (3, 3, [4, 11])],
    )
    def test_matches_oracle(self, seed, k, words):
        dec, params = make_model(seed)
        f = feats(seed + 10)
        cids = np.asarray(words, np.int32)
        res = _engine(dec, params, f, cids, k=k)
        toks, lens, scs, sat, (oscores, olens, otoks) = cbs_oracle(
            dec.step, params, dec.init_state(params, f),
            cids=cids, beam_width=k,
        )
        etoks = np.asarray(res.tokens)
        elens = np.asarray(res.lengths)
        for b in range(B):
            assert list(etoks[b][: elens[b]]) == list(
                toks[b][: lens[b]]
            ), b
        np.testing.assert_allclose(
            np.asarray(res.scores), scs, atol=2e-4
        )
        np.testing.assert_array_equal(np.asarray(res.satisfied), sat)
        # Reachable bank beams agree (dead slots are garbage by design).
        escores = np.asarray(res.beam_scores)
        reach = oscores > NEG / 2
        np.testing.assert_allclose(
            escores[reach], oscores[reach], atol=2e-4
        )
        ebt = np.asarray(res.beam_tokens)
        ebl = np.asarray(res.beam_lengths)
        rb, rs, rk = np.nonzero(reach)
        for b, s, j in zip(rb, rs, rk):
            assert list(ebt[b, s, j][: ebl[b, s, j]]) == list(
                otoks[b, s, j][: olens[b, s, j]]
            ), (b, s, j)

    def test_per_row_constraints_match_oracle(self):
        dec, params = make_model(4)
        f = feats(20)
        cids = np.asarray([[5, 9], [7, 0], [11, 3]], np.int32)
        res = _engine(dec, params, f, cids, k=2)
        toks, lens, scs, sat, _ = cbs_oracle(
            dec.step, params, dec.init_state(params, f),
            cids=cids, beam_width=2,
        )
        etoks, elens = np.asarray(res.tokens), np.asarray(res.lengths)
        for b in range(B):
            assert list(etoks[b][: elens[b]]) == list(toks[b][: lens[b]])
        np.testing.assert_array_equal(np.asarray(res.satisfied), sat)

    def test_min_len_and_banned_compose(self):
        dec, params = make_model(5)
        f = feats(30)
        kw = dict(min_len=3, banned_ids=(6, 13))
        res = _engine(dec, params, f, np.asarray([5], np.int32), k=2, **kw)
        toks, lens, scs, sat, _ = cbs_oracle(
            dec.step, params, dec.init_state(params, f),
            cids=np.asarray([5], np.int32), beam_width=2, **kw,
        )
        etoks, elens = np.asarray(res.tokens), np.asarray(res.lengths)
        for b in range(B):
            assert list(etoks[b][: elens[b]]) == list(toks[b][: lens[b]])
            row = list(etoks[b][: elens[b]])
            assert 6 not in row and 13 not in row
        np.testing.assert_allclose(np.asarray(res.scores), scs, atol=2e-4)


class TestSemantics:
    def test_constraint_word_appears(self):
        dec, params = make_model(6)
        f = feats(40)
        for w in (4, 9, 12):
            res = _engine(dec, params, f, np.asarray([w], np.int32), k=3)
            assert np.asarray(res.satisfied).all(), w
            toks = np.asarray(res.tokens)
            lens = np.asarray(res.lengths)
            for b in range(B):
                assert w in toks[b][: lens[b]], (w, b)

    def test_two_words_both_appear(self):
        dec, params = make_model(7)
        f = feats(50)
        res = _engine(dec, params, f, np.asarray([4, 9], np.int32), k=3)
        assert np.asarray(res.satisfied).all()
        toks, lens = np.asarray(res.tokens), np.asarray(res.lengths)
        for b in range(B):
            row = set(toks[b][: lens[b]].tolist())
            assert {4, 9} <= row, (b, row)

    def test_unreachable_falls_back_to_most_satisfied(self):
        dec, params = make_model(8)
        f = feats(60)
        # max_len=1: only one emission, so at most one of two
        # constraints can ever be satisfied.
        fn = jax.jit(
            lambda p, x, c: constrained_beam_decode(
                dec.step, p, dec.init_state(p, x),
                start_id=START, end_id=END, max_len=1,
                beam_width=2, constraint_ids=c, decoder=dec,
            )
        )
        res = fn(params, f, jnp.asarray([4, 9], jnp.int32))
        ns = np.asarray(res.num_satisfied)
        assert (ns == 1).all(), ns
        toks = np.asarray(res.tokens)
        sat = np.asarray(res.satisfied)
        for b in range(B):
            want = 4 if sat[b, 0] else 9
            assert toks[b, 0] == want

    def test_shared_key_attention_decoder(self):
        att = AttentionDecoder(
            vocab_size=VOCAB, feature_dim=FEAT, embed_dim=10,
            hidden_dim=12, attention_dim=8, dropout_rate=0.0,
        )
        pa = att.init(jax.random.key(0))
        res = _engine(att, pa, feats(spatial=True), np.asarray([5]), k=2)
        assert np.asarray(res.satisfied).all()
        toks, lens = np.asarray(res.tokens), np.asarray(res.lengths)
        for b in range(B):
            assert 5 in toks[b][: lens[b]]

    def test_bf16_native_dtype_stage1(self):
        # Stage-1 top_k runs in the model dtype (beam.py discipline);
        # the engine must stay well-formed on bf16 logits (NEG_INF
        # masks overflow to -inf there, which the reachability guard
        # and frozen-slot absorption both tolerate).
        dec, params = make_model(9)
        pb = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16), params
        )
        f = feats(70).astype(jnp.bfloat16)
        res = _engine(dec, pb, f, np.asarray([5], np.int32), k=2)
        assert np.asarray(res.satisfied).all()
        toks, lens = np.asarray(res.tokens), np.asarray(res.lengths)
        scs = np.asarray(res.scores)
        for b in range(B):
            assert 5 in toks[b][: lens[b]]
            assert scs[b] > NEG / 2 and np.isfinite(scs[b])

    def test_c_bounds(self):
        dec, params = make_model()
        with pytest.raises(ValueError, match="constraint slots"):
            _engine(dec, params, feats(), np.zeros((B, 5), np.int32))


def _pipe(seed=0):
    from tpucap.config import (
        Config,
        DecodeConfig,
        DecoderConfig,
        EncoderConfig,
        TrainConfig,
    )
    from tpucap.pipeline import CaptioningPipeline

    cfg = Config(
        encoder=EncoderConfig(name="tiny_cnn", feature_dim=FEAT),
        decoder=DecoderConfig(
            name="lstm1", embed_dim=10, hidden_dim=12, dropout_rate=0.0
        ),
        train=TrainConfig(seed=seed, epochs=1, batch_size=4),
        decode=DecodeConfig(max_len=MAX_LEN),
    )
    pipe = CaptioningPipeline(cfg)
    words = "red blue green old new big".split()
    desc = {
        f"im{i}": [f"startseq {words[i]} {words[(i + 1) % 6]} endseq"]
        for i in range(6)
    }
    pipe.fit_tokenizer(desc)
    pipe.build()
    return pipe, np.asarray(feats()), words


@pytest.mark.slow
def test_cli_caption_include_words(tmp_path, capsys):
    import os

    from tpucap.cli.main import main
    from tpucap.data import generate_fixture_dataset
    from tpucap.data.flickr8k import load_descriptions

    img_dir, token_file, train_file, _ = generate_fixture_dataset(
        tmp_path, n_images=6, image_size=32, seed=3
    )
    feats_file = str(tmp_path / "f.npz")
    ckpt = str(tmp_path / "ckpt")
    common = ["--encoder", "tiny_cnn", "--max-len", "12"]
    main(["extract", *common, "--images", str(img_dir),
          "--out", feats_file, "--batch-size", "4"])
    main(["train", *common, "--tokens", token_file,
          "--split", train_file, "--features", feats_file,
          "--checkpoint-dir", ckpt, "--epochs", "1",
          "--batch-size", "4"])
    capsys.readouterr()

    # Pick a real corpus word to constrain on.
    descs = load_descriptions(token_file)
    word = next(
        w
        for caps in descs.values()
        for w in caps[0].split()
        # Corpus cleaning drops 1-char words and non-alpha tokens.
        if w not in ("startseq", "endseq") and len(w) > 1 and w.isalpha()
    )
    img0 = os.path.join(str(img_dir), sorted(os.listdir(img_dir))[0])
    main(["caption", *common, "--image", img0,
          "--checkpoint-dir", ckpt, "--method", "beam",
          "--beam-width", "2", "--include-words", word])
    out = capsys.readouterr().out
    line = next(ln for ln in out.splitlines() if ln.startswith(img0))
    assert word in line.split("\t")[1].split()

    with pytest.raises(SystemExit, match="method beam"):
        main(["caption", *common, "--image", img0,
              "--checkpoint-dir", ckpt, "--method", "greedy",
              "--include-words", word])


class TestPipeline:
    @pytest.fixture(scope="class")
    def pipe(self):
        return _pipe()

    def test_generate_constrained_e2e(self, pipe):
        pipe_, feats_, words = pipe
        caps = pipe_.generate_constrained(feats_, [words[0]])
        assert all(words[0] in c.split() for c in caps)
        details = pipe_.generate_constrained(
            feats_, [words[0]], return_details=True
        )
        for d in details:
            assert d["satisfied"] == {words[0]: True}
            assert d["num_satisfied"] == 1
            assert isinstance(d["score"], float)

    def test_per_image_words(self, pipe):
        pipe_, feats_, words = pipe
        rows = [[words[i % len(words)]] for i in range(feats_.shape[0])]
        caps = pipe_.generate_constrained(feats_, rows)
        for cap, row in zip(caps, rows):
            assert row[0] in cap.split()

    def test_validation(self, pipe):
        pipe_, feats_, words = pipe
        with pytest.raises(ValueError, match="not in the vocabulary"):
            pipe_.generate_constrained(feats_, ["zzzunknownzzz"])
        with pytest.raises(ValueError, match="phrase"):
            pipe_.generate_constrained(feats_, [f"{words[0]} {words[1]}"])
        with pytest.raises(ValueError, match="duplicate"):
            pipe_.generate_constrained(feats_, [words[0], words[0]])
        with pytest.raises(ValueError, match="sentinel"):
            pipe_.generate_constrained(feats_, ["endseq"])
        with pytest.raises(ValueError, match="include_words per image"):
            pipe_.generate_constrained(feats_, list(words[:5]))
        with pytest.raises(ValueError, match="empty"):
            pipe_.generate_constrained(feats_, [])

    def test_num_words_capped_id_raises(self, pipe):
        # A num_words-capped tokenizer keeps the full word_index while
        # the model head is capped — an id >= V must raise, not reach
        # the engine as an out-of-bounds gather (NaN scores + a
        # fabricated satisfied=True caption).
        pipe_, feats_, words = pipe
        tok = pipe_.tokenizer
        high_word = max(tok.word_index, key=tok.word_index.get)
        assert tok.num_words is None
        try:
            tok.num_words = tok.word_index[high_word]  # caps V below it
            with pytest.raises(ValueError, match="num_words cap"):
                pipe_.generate_constrained(feats_, [high_word])
        finally:
            tok.num_words = None

    def test_ngram_refused(self, pipe):
        import dataclasses

        pipe_, feats_, words = pipe
        old = pipe_.config
        try:
            pipe_.config = dataclasses.replace(
                old,
                decode=dataclasses.replace(
                    old.decode, no_repeat_ngram_size=2
                ),
            )
            with pytest.raises(NotImplementedError, match="ngram"):
                pipe_.generate_constrained(feats_, [words[0]])
        finally:
            pipe_.config = old


# ---------------------------------------------------------------------------
# Serving layer: per-request include_words through the micro-batcher
# ---------------------------------------------------------------------------


class TestServing:
    @pytest.fixture(scope="class")
    def pipe(self):
        return _pipe()

    def test_mixed_batch_matches_offline(self, pipe):
        """Constrained and plain requests submitted into one window:
        the batcher splits them into separate dispatches (the 2^C
        multiplier must not tax plain riders) and each matches its
        individual offline result — including the C bucket padding
        (row 0's single word rides a 2-slot program because row 2
        brought two; the padded slot is pre-satisfied, which the
        offline comparison below proves is caption-identical)."""
        from tpucap.serve import CaptionServer

        pipe_, feats_, words = pipe
        ref_plain = pipe_.generate(feats_, method="beam", beam_width=2)
        ref_c0 = pipe_.generate_constrained(
            feats_[0:1], [[words[0]]], beam_width=2
        )
        ref_c2 = pipe_.generate_constrained(
            feats_[2:3], [[words[1], words[2]]], beam_width=2
        )
        with CaptionServer(
            pipe_, max_batch=4, max_delay_ms=50, method="beam",
            beam_width=2,
        ) as srv:
            futs = [
                srv.submit(feats_[0], include_words=[words[0]]),
                srv.submit(feats_[1]),
                srv.submit(feats_[2], include_words=[words[1], words[2]]),
            ]
            got = [f.result(timeout=180) for f in futs]
        assert got[0] == ref_c0[0]
        assert got[1] == ref_plain[1]
        assert got[2] == ref_c2[0]
        assert words[0] in got[0].split()

    def test_submit_validation(self, pipe):
        """Bad constraints fail their own request at submit time, never
        the batch; the server keeps serving afterwards."""
        from tpucap.serve import CaptionServer

        pipe_, feats_, words = pipe
        f = np.asarray(feats_[0])
        with CaptionServer(
            pipe_, max_batch=2, method="beam", beam_width=2
        ) as srv:
            with pytest.raises(ValueError, match="not in the vocab"):
                srv.submit(f, include_words=["zzzunknownzzz"])
            with pytest.raises(ValueError, match="not both"):
                srv.submit(f, prefix=words[0], include_words=[words[1]])
            with pytest.raises(ValueError, match="include_words per"):
                srv.submit(f, include_words=list(words[:5]))
            # A bare string must fail loudly — iterating it would
            # constrain on single characters ("dog" -> 'd','o','g').
            with pytest.raises(ValueError, match="list of words"):
                srv.submit(f, include_words=words[0])
            # Server still healthy after rejected submits.
            assert isinstance(
                srv.submit(f, include_words=[words[0]]).result(
                    timeout=180
                ),
                str,
            )
        with CaptionServer(pipe_, max_batch=2, method="greedy") as srv:
            with pytest.raises(ValueError, match="method beam"):
                srv.submit(f, include_words=[words[0]])

    def test_http_include_words(self, pipe):
        """HTTP field/query routes through the constrained program on a
        beam server; the greedy streaming route rejects it."""
        import json as _json

        from tpucap.serve_http import CaptionHTTPServer

        pipe_, feats_, words = pipe

        def req(srv, method, path, body=None):
            import http.client

            host, port = srv.address
            conn = http.client.HTTPConnection(host, port, timeout=120)
            conn.request(method, path, body=body)
            resp = conn.getresponse()
            payload = _json.loads(resp.read())
            conn.close()
            return resp.status, payload

        ref = pipe_.generate_constrained(
            feats_[0:1], [[words[0]]], beam_width=2
        )[0]
        with CaptionHTTPServer(
            pipe_, port=0, max_batch=2, max_delay_ms=5, method="beam",
            beam_width=2,
        ) as srv:
            srv.serve_background()
            body = _json.dumps(
                {
                    "features": np.asarray(feats_[0]).tolist(),
                    "include_words": [words[0]],
                }
            ).encode()
            status, payload = req(srv, "POST", "/caption_features", body)
            assert status == 200
            assert payload["caption"] == ref
            # Query-param form on the same route.
            body2 = _json.dumps(
                {"features": np.asarray(feats_[0]).tolist()}
            ).encode()
            status, payload = req(
                srv,
                "POST",
                f"/caption_features?include_words={words[0]}",
                body2,
            )
            assert status == 200 and payload["caption"] == ref
            # Streaming route rejects constraints loudly.
            status, payload = req(
                srv,
                "POST",
                f"/caption_stream_features?include_words={words[0]}",
                body2,
            )
            assert status == 400
            # OOV -> 400, not a batcher crash.
            status, payload = req(
                srv,
                "POST",
                "/caption_features?include_words=zzzunknownzzz",
                body2,
            )
            assert status == 400
